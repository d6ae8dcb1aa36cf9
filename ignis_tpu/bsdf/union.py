"""Batched BSDF union: one switched kernel over material types.

The reference sorts rays per material and JIT-compiles one hit shader per
material (src/runtime/shader/HitShader.cpp).  On TPU we instead evaluate the
small, bounded union of BSDF types present in the scene for all lanes with
masked selects — divergence-free vector code the VPU digests directly.  Only
the types that actually appear in the compiled scene are emitted (static
`bsdf_types` list), so `jit` still specializes per scene like the reference's
codegen did.

Math mirrors src/artic/bsdf/{diffuse,dielectric,conductor,common}.art.

Conventions (driver/bsdf.art:1-20):
  * eval(in_dir, out_dir) returns reflectance WITH the cosine term applied.
  * sample returns (in_dir, pdf, weight, eta) where weight = eval/pdf with
    cosine applied.
  * out_dir points AWAY from the surface (toward the previous vertex);
    in_dir is the sampled/next direction.
"""

from __future__ import annotations

import jax.numpy as jnp

from ignis_tpu.core import rng
from ignis_tpu.core.vec import (
    FLT_EPS, INV_PI, absolute_cos, dot, mulf, positive_cos, reflect, refract,
    safe_div, to_world, vec3,
)
from ignis_tpu.core.warp import cosine_hemisphere_pdf, sample_cosine_hemisphere
from ignis_tpu.scene.compile import (
    BSDF_CONDUCTOR, BSDF_DIELECTRIC, BSDF_DIFFUSE, BSDF_PASSTHROUGH,
    BSDF_PHONG,
)

# rnd draws consumed by each type's sample() — must match the artic call order
_SAMPLE_DRAWS = {
    BSDF_DIFFUSE: 2,
    BSDF_DIELECTRIC: 1,   # fresnel branch pick (dielectric.art:12)
    BSDF_CONDUCTOR: 0,
    BSDF_PHONG: 2,
    BSDF_PASSTHROUGH: 0,
}

_SPECULAR = {BSDF_DIELECTRIC, BSDF_CONDUCTOR, BSDF_PASSTHROUGH}


def sample_draw_counts(bsdf_types):
    return [_SAMPLE_DRAWS.get(t, 2) for t in bsdf_types]


def bsdf_specular_mask(bsdf_types, mat_type):
    """Per-lane is_specular (smooth variants; rough=non-specular comes later)."""
    mask = jnp.zeros(mat_type.shape, dtype=bool)
    for t in set(bsdf_types):
        if t in _SPECULAR:
            mask = mask | (mat_type == t)
    return mask


def _mat_gather(tables, mat_id):
    colors = tables["mat_colors"][mat_id]    # (N, 4, 3)
    scalars = tables["mat_scalars"][mat_id]  # (N, 8)
    return colors, scalars


# ------------------------------------------------------------------ diffuse

def _diffuse_eval(colors, scalars, surf, in_dir, out_dir):
    kd = colors[:, 0]
    alpha = scalars[:, 0]
    n = surf["n"]
    lam = mulf(kd, absolute_cos(in_dir, n) * INV_PI)
    # Oren-Nayar (diffuse.art:15-39) when alpha > 0
    a2 = alpha * alpha
    p1 = absolute_cos(in_dir, n)
    p2 = absolute_cos(out_dir, n)
    s = -p1 * p2 + positive_cos(out_dir, in_dir)
    t = jnp.where(s <= FLT_EPS, 1.0, jnp.maximum(FLT_EPS, jnp.maximum(p1, p2)))
    A = 1.0 - 0.5 * a2 / (a2 + 0.33)
    B = 0.45 * a2 / (a2 + 0.09)
    C = 0.17 * a2 / (a2 + 0.13)
    on = (mulf(kd, (A + B * s / t) * INV_PI) + kd * kd * (C * INV_PI)[..., None]) * p1[..., None]
    return jnp.where((alpha <= FLT_EPS)[..., None], lam, on)


def _diffuse_pdf(colors, scalars, surf, in_dir, out_dir):
    return cosine_hemisphere_pdf(positive_cos(in_dir, surf["n"]))


def _diffuse_sample(colors, scalars, surf, u1, u2, out_dir):
    local, pdf = sample_cosine_hemisphere(u1, u2)
    gdir = to_world(local, surf["t"], surf["b"], surf["n"])
    kd = colors[:, 0]
    alpha = scalars[:, 0]
    # lambert fast path: weight = kd exactly (cos/pi/pdf == 1)
    w_lam = kd
    ev = _diffuse_eval(colors, scalars, {"n": surf["n"]}, gdir, out_dir)
    w_on = ev * safe_div(1.0, pdf)[..., None]
    weight = jnp.where((alpha <= FLT_EPS)[..., None], w_lam, w_on)
    eta = jnp.ones_like(pdf)
    valid = pdf > 0
    return gdir, pdf, weight, eta, valid


# ---------------------------------------------------------------- dielectric

def _fresnel(eta, cos_i):
    """fresnel (core/fresnel.art:15-27): returns (cos_t signed, factor, total)."""
    eta2 = jnp.where(cos_i < 0.0, 1.0 / eta, eta)
    cos2_t = 1.0 - (1.0 - cos_i * cos_i) * eta2 * eta2
    total = cos2_t <= 0.0
    cos_t = jnp.sqrt(jnp.maximum(cos2_t, 0.0))
    cos_t_s = jnp.where(cos_i < 0.0, -cos_t, cos_t)
    aci = jnp.abs(cos_i)
    r_s = safe_div(eta2 * aci - cos_t, eta2 * aci + cos_t)
    r_p = safe_div(aci - eta2 * cos_t, aci + eta2 * cos_t)
    factor = jnp.clip((r_s * r_s + r_p * r_p) * 0.5, 0.0, 1.0)
    factor = jnp.where(total, 1.0, factor)
    return cos_t_s, factor, total


def _dielectric_sample(colors, scalars, surf, u1, out_dir, adjoint=False):
    """make_pure_dielectric_bsdf.sample (dielectric.art:2-23).

    thin flag in scalars[3] switches to the thin-interface variant.
    """
    ks = colors[:, 0]
    kt = colors[:, 1]
    n1 = scalars[:, 1]
    n2 = scalars[:, 2]
    thin = scalars[:, 3] > 0.5
    n = surf["n"]

    # --- solid variant
    k = jnp.where(surf["is_entering"], n1 / n2, n2 / n1)
    cos_o = dot(out_dir, n)
    cos_t, factor, _total = _fresnel(k, cos_o)
    refr = u1 > factor
    t_dir = refract(out_dir, n, k, cos_o, cos_t)
    adj = jnp.where(refr & jnp.bool_(adjoint), k * k, 1.0)
    d_solid = jnp.where(refr[..., None], t_dir, reflect(out_dir, n))
    c_solid = jnp.where(refr[..., None], kt * adj[..., None], ks)
    eta_solid = jnp.where(refr, k, 1.0)

    # --- thin variant (dielectric.art:27-48)
    kthin = n1 / n2
    cos_o_a = absolute_cos(out_dir, n)
    f_d = _fresnel_dielectric(kthin, cos_o_a)
    F = f_d + (1.0 - f_d) * f_d / (f_d + 1.0)
    refr_t = u1 > F
    d_thin = jnp.where(refr_t[..., None], -out_dir,
                       _normalize(reflect(out_dir, n)))
    c_thin = jnp.where(refr_t[..., None], kt, ks)

    in_dir = jnp.where(thin[..., None], d_thin, d_solid)
    weight = jnp.where(thin[..., None], c_thin, c_solid)
    eta = jnp.where(thin, 1.0, eta_solid)
    pdf = jnp.ones_like(eta)
    valid = jnp.ones(eta.shape, dtype=bool)
    return in_dir, pdf, weight, eta, valid


def _normalize(v):
    from ignis_tpu.core.vec import normalize
    return normalize(v)


def _fresnel_dielectric(eta, cos_i):
    """math::fresnel_dielectric — unpolarized fresnel for |cos| input."""
    cos_t, factor, total = _fresnel(eta, cos_i)
    return factor


# ---------------------------------------------------------------- conductor

def _conductor_factor(n, k, cos_i):
    f = n * n + k * k
    d1 = f * cos_i * cos_i
    d2 = 2.0 * n * cos_i
    r_s = safe_div(d1 - d2, d1 + d2)
    r_p = safe_div(f - d2 + cos_i * cos_i, f + d2 + cos_i * cos_i)
    return jnp.clip((r_s * r_s + r_p * r_p) * 0.5, 0.0, 1.0)


def _conductor_sample(colors, scalars, surf, out_dir):
    ks = colors[:, 0]
    eta = colors[:, 1]
    kap = colors[:, 2]
    n = surf["n"]
    cos_i = dot(out_dir, n)
    f = jnp.stack([_conductor_factor(eta[:, c], kap[:, c], cos_i) for c in range(3)], axis=-1)
    weight = ks * f
    in_dir = reflect(out_dir, n)
    pdf = jnp.ones(cos_i.shape, dtype=jnp.float32)
    one = jnp.ones_like(pdf)
    return in_dir, pdf, weight, one, jnp.ones(pdf.shape, dtype=bool)


# ------------------------------------------------------------------- phong

def _phong_eval(colors, scalars, surf, in_dir, out_dir):
    ks = colors[:, 0]
    ex = scalars[:, 0]
    n = surf["n"]
    cos_i = absolute_cos(in_dir, n)
    cos_r = positive_cos(reflect(out_dir, n), in_dir)
    f = jnp.power(cos_r, ex) * (ex + 2.0) * jnp.float32(1.0 / (2.0 * 3.14159265358979)) * cos_i
    return mulf(ks, f)


def _phong_pdf(colors, scalars, surf, in_dir, out_dir):
    from ignis_tpu.core.warp import cosine_power_hemisphere_pdf
    ex = scalars[:, 0]
    cos_r = positive_cos(reflect(out_dir, surf["n"]), in_dir)
    return cosine_power_hemisphere_pdf(cos_r, ex)


def _phong_sample(colors, scalars, surf, u1, u2, out_dir):
    from ignis_tpu.core.vec import orthonormal_basis
    from ignis_tpu.core.warp import sample_cosine_power_hemisphere
    ex = scalars[:, 0]
    r = _normalize(reflect(out_dir, surf["n"]))
    local, pdf = sample_cosine_power_hemisphere(ex, u1, u2)
    t, b = orthonormal_basis(r)
    gdir = to_world(local, t, b, r)
    ev = _phong_eval(colors, scalars, surf, gdir, out_dir)
    weight = ev * safe_div(1.0, pdf)[..., None]
    valid = (pdf > FLT_EPS) & (dot(gdir, surf["n"]) > 0)
    return gdir, pdf, weight, jnp.ones_like(pdf), valid


# ------------------------------------------------------------------- union

def bsdf_eval(bsdf_types, tables, mat_type, surf, in_dir, out_dir):
    colors, scalars = _mat_gather(tables, surf["mat_id"])
    out = jnp.zeros(in_dir.shape, dtype=jnp.float32)
    for t in set(bsdf_types):
        if t == BSDF_DIFFUSE:
            v = _diffuse_eval(colors, scalars, surf, in_dir, out_dir)
        elif t == BSDF_PHONG:
            v = _phong_eval(colors, scalars, surf, in_dir, out_dir)
        else:
            continue  # specular types eval to black
        out = jnp.where((mat_type == t)[..., None], v, out)
    return out


def bsdf_pdf(bsdf_types, tables, mat_type, surf, in_dir, out_dir):
    colors, scalars = _mat_gather(tables, surf["mat_id"])
    out = jnp.zeros(mat_type.shape, dtype=jnp.float32)
    for t in set(bsdf_types):
        if t == BSDF_DIFFUSE:
            v = _diffuse_pdf(colors, scalars, surf, in_dir, out_dir)
        elif t == BSDF_PHONG:
            v = _phong_pdf(colors, scalars, surf, in_dir, out_dir)
        else:
            continue
        out = jnp.where(mat_type == t, v, out)
    return out


def bsdf_sample(bsdf_types, tables, mat_type, surf, seed, counter, out_dir,
                active=None, adjoint=False):
    """Sample the union; advances counters by each lane's type draw count.

    Returns (in_dir, pdf, weight, eta, valid, new_counter).
    """
    if active is None:
        active = jnp.ones(mat_type.shape, dtype=bool)
    colors, scalars = _mat_gather(tables, surf["mat_id"])

    # Pre-draw the max number of uniforms from each lane's counter base;
    # lanes advance only by their own type's draw count.
    max_draws = max([_SAMPLE_DRAWS.get(t, 2) for t in set(bsdf_types)] + [0])
    us = []
    c = counter
    for _ in range(max_draws):
        u, c = rng.next_f32(seed, c)
        us.append(u)
    while len(us) < 2:
        us.append(jnp.zeros(mat_type.shape, dtype=jnp.float32))

    in_dir = jnp.zeros(out_dir.shape, dtype=jnp.float32)
    pdf = jnp.zeros(mat_type.shape, dtype=jnp.float32)
    weight = jnp.zeros(out_dir.shape, dtype=jnp.float32)
    eta = jnp.ones(mat_type.shape, dtype=jnp.float32)
    valid = jnp.zeros(mat_type.shape, dtype=bool)
    draws = jnp.zeros(mat_type.shape, dtype=jnp.uint32)

    for t in set(bsdf_types):
        if t == BSDF_DIFFUSE:
            r = _diffuse_sample(colors, scalars, surf, us[0], us[1], out_dir)
        elif t == BSDF_DIELECTRIC:
            r = _dielectric_sample(colors, scalars, surf, us[0], out_dir, adjoint)
        elif t == BSDF_CONDUCTOR:
            r = _conductor_sample(colors, scalars, surf, out_dir)
        elif t == BSDF_PHONG:
            r = _phong_sample(colors, scalars, surf, us[0], us[1], out_dir)
        elif t == BSDF_PASSTHROUGH:
            r = (-out_dir, jnp.ones(mat_type.shape, jnp.float32),
                 jnp.ones(out_dir.shape, jnp.float32),
                 jnp.ones(mat_type.shape, jnp.float32),
                 jnp.ones(mat_type.shape, dtype=bool))
        else:
            continue
        m = mat_type == t
        mc = m[..., None]
        in_dir = jnp.where(mc, r[0], in_dir)
        pdf = jnp.where(m, r[1], pdf)
        weight = jnp.where(mc, r[2], weight)
        eta = jnp.where(m, r[3], eta)
        valid = jnp.where(m, r[4], valid)
        draws = jnp.where(m, jnp.uint32(_SAMPLE_DRAWS.get(t, 2)), draws)

    new_counter = jnp.where(active, counter + draws, counter)
    valid = valid & active
    return in_dir, pdf, weight, eta, valid, new_counter
