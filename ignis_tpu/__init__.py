"""Ignis-TPU: a TPU-native differentiable wavefront path tracer.

A from-scratch reimplementation of the capabilities of the Ignis renderer
(SLebailly/Ignis-MasterThesis) designed for TPUs: scenes compile to flat JAX
arrays instead of JIT-specialized Artic shaders, the wavefront loop is a
`lax.while_loop` over fixed-capacity SoA ray arrays, hot kernels are Pallas,
and rays/pixels shard over a `jax.sharding.Mesh`.

Reference architecture documented in SURVEY.md; parity targets in BASELINE.md.
"""

__version__ = "0.1.0"

from ignis_tpu.api import Runtime, load_scene  # noqa: F401
