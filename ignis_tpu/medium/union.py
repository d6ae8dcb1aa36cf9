"""Participating media union (src/artic/medium/ + phase/).

Batched per-lane medium functions dispatching over the scene's static medium
list.  Homogeneous media use the closed forms of medium/homogeneous.art;
medium id -1 is vacuum.  Coefficients may be PExpr expressions evaluated at
the current shading context (the reference evaluates them once per medium
closure at the hit context, src/runtime/medium/HomogeneousMedium.cpp).

Phase functions: Henyey-Greenstein + isotropic (src/artic/phase/) — note the
reference's anisotropic HG sampler emits the direction in the canonical frame
without rotating around out_dir (phase/henyeygreenstein.art:19-35); we
reproduce that faithfully for parity.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ignis_tpu.core import rng
from ignis_tpu.core.vec import FLT_EPS, absolute_cos, length, safe_div, vec3
from ignis_tpu.core.warp import sample_uniform_sphere, uniform_sphere_pdf

_EPS = jnp.float32(1e-3)


def medium_coefficients(scene, tables, medium_id, ctx):
    """Per-lane (sigma_a, sigma_s, g) for the lane's medium id (-1 → zeros).

    ctx supplies the PExpr lane context for expression-valued coefficients.
    """
    n = medium_id.shape[0]
    sa = jnp.zeros((n, 3), jnp.float32)
    ss = jnp.zeros((n, 3), jnp.float32)
    g = jnp.zeros((n,), jnp.float32)
    for mi, med in enumerate(scene.media):
        m = medium_id == mi
        if med["type"] == "vacuum":
            continue
        data = tables["medium_data"][mi]
        msa = jnp.broadcast_to(data[0:3], (n, 3))
        mss = jnp.broadcast_to(data[3:6], (n, 3))
        if med.get("sigma_a_expr"):
            from ignis_tpu.texture.pexpr import eval_pexpr_color
            msa = eval_pexpr_color(scene, tables, med["sigma_a_expr"],
                                   ctx["uv"], ctx)
        if med.get("sigma_s_expr"):
            from ignis_tpu.texture.pexpr import eval_pexpr_color
            mss = eval_pexpr_color(scene, tables, med["sigma_s_expr"],
                                   ctx["uv"], ctx)
        sa = jnp.where(m[..., None], msa, sa)
        ss = jnp.where(m[..., None], mss, ss)
        g = jnp.where(m, data[6], g)
    return sa, ss, g


def medium_eval(sigma_a, sigma_s, medium_id, p_start, p_end):
    """Transmittance between two points (homogeneous closed form)."""
    sigma_t = sigma_a + sigma_s
    dist = length(p_end - p_start)
    tr = jnp.exp(-sigma_t * dist[..., None])
    return jnp.where((medium_id >= 0)[..., None], tr, 1.0)


def medium_eval_inf(sigma_a, sigma_s, medium_id, p_start, direction):
    """Transmittance to infinity: white iff extinction ~ 0."""
    sigma_t = sigma_a + sigma_s
    black_t = jnp.all(sigma_t <= 1e-4, axis=-1)
    val = jnp.where(black_t[..., None], 1.0, 0.0)
    return jnp.where((medium_id >= 0)[..., None], val, 1.0)


def medium_sample(sigma_a, sigma_s, medium_id, seed, counter, p_start, p_end,
                  active):
    """Homogeneous distance sampling (medium/homogeneous.art:40-60).

    Scattering media consume 1 draw; non-scattering and vacuum consume 0.
    Returns dict(valid, pos, pdf, color, sigma_a, sigma_s at sample) + counter.
    """
    n = medium_id.shape[0]
    sigma_t = sigma_a + sigma_s
    has_scatter = jnp.any(sigma_s > 1e-4, axis=-1) & (medium_id >= 0)
    sigma_ind = jnp.argmin(sigma_t, axis=-1)
    lanes = jnp.arange(n)
    sigma_t_p = sigma_t[lanes, sigma_ind]

    u, counter_next = rng.next_f32(seed, counter)
    counter = jnp.where(active & has_scatter, counter_next, counter)

    dir_u = p_end - p_start
    dist = length(dir_u)
    ndist = jnp.minimum(dist, -jnp.log(jnp.maximum(1.0 - u * 0.99999, 1e-30))
                        / jnp.maximum(sigma_t_p, 1e-30))
    valid = (has_scatter & active
             & (jnp.abs(dist - ndist) > _EPS))
    d = dir_u * safe_div(1.0, dist)[..., None]
    pos = p_start + d * ndist[..., None]
    tr = jnp.exp(-sigma_t * ndist[..., None])
    pdf = tr[lanes, sigma_ind] * sigma_t_p
    color = tr * safe_div(1.0, pdf)[..., None]
    return dict(valid=valid, pos=pos, pdf=pdf, color=color), counter


def phase_sample(g, seed, counter, out_dir, active):
    """HG / isotropic sampling; 2 draws (phase/*.art).  Returns
    (in_dir, pdf, weight, counter)."""
    u1, c = rng.next_f32(seed, counter)
    u2, c = rng.next_f32(seed, c)
    counter = jnp.where(active, c, counter)

    iso_dir, iso_pdf = sample_uniform_sphere(u1, u2)

    g_ = g
    sqr = (1.0 - g_ * g_) / jnp.maximum(1.0 + g_ - 2.0 * g_ * u1, 1e-20)
    cos_t = -(1.0 + g_ * g_ - sqr * sqr) / jnp.maximum(2.0 * g_, 1e-20)
    sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
    phi = 2.0 * jnp.pi * u2
    hg_dir = vec3(sin_t * jnp.cos(phi), sin_t * jnp.sin(phi), cos_t)
    hg_pdf = _hg(g_, absolute_cos(hg_dir, out_dir))

    is_iso = jnp.abs(g_) <= 1e-3
    in_dir = jnp.where(is_iso[..., None], iso_dir, hg_dir)
    pdf = jnp.where(is_iso, iso_pdf, hg_pdf)
    weight = jnp.ones_like(pdf)
    return in_dir, pdf, weight, counter


def phase_eval(g, in_dir, out_dir):
    iso = jnp.broadcast_to(jnp.float32(1.0 / (4.0 * np.pi)),
                           g.shape)
    hg = _hg(g, absolute_cos(in_dir, out_dir))
    return jnp.where(jnp.abs(g) <= 1e-3, iso, hg)


def _hg(g, cos_theta):
    denom = 1.0 + g * g + 2.0 * g * cos_theta
    return safe_div(jnp.float32(1.0 / np.pi) * (1.0 - g * g),
                    4.0 * denom * jnp.sqrt(jnp.maximum(denom, 1e-20)))
