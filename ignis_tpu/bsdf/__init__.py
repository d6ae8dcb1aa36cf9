from ignis_tpu.bsdf.union import (  # noqa: F401
    bsdf_eval, bsdf_pdf, bsdf_sample, bsdf_specular_mask, sample_draw_counts,
)
