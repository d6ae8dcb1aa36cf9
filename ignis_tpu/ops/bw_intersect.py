"""Baldwin–Weber precomputed-triangle intersection kernel (Pallas TPU).

Replaces the Möller–Trumbore sweep of ops/pallas_intersect.py for the
brute-force path.  Per-triangle precomputation (host, float64) moves the
cross products and barycentric solves out of the inner loop:

  n  = e1 x e2,   d0 = -n.v0          (plane)
  B1 = (e2 x n) / ((e2 x n).e1), b1 = -B1.v0   (u functional)
  B2 = (n x e1) / ((n x e1).e2), b2 = -B2.v0   (v functional)

Per ray-triangle test:  m = n.o + d0, k = n.d, t = -m/k,
u = (B1.o + b1) + t (B1.d), v = (B2.o + b2) + t (B2.d); hit iff
u >= -tol, v >= -tol, u+v <= 1+tol, tmin <= t <= t_best, k != 0 —
~45 VPU ops/test vs ~58 for the in-loop Möller–Trumbore (measured 1.3x).

Same table/kernel structure as pallas_intersect: the whole soup lives in
VMEM as one (Tpad, 128) f32 table (row = triangle, 13 used lanes), rays
stream through in (8, 128) register blocks; visibility maskbits ride in
lane 12 so per-ray-class masking needs no gathers (LoaderEntity.cpp
flag semantics, SURVEY.md §8.3).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
BLOCK = LANES * SUBLANES
TRI_TILE = 8
VMEM_LIMIT = 100 * 1024 * 1024


def bw_tables(v0, e1, e2, maskbits):
    """Precompute the (Tpad, 128) Baldwin–Weber triangle table.

    maskbits: (T,) int visibility bits per triangle (camera=1, light=2,
    bounce=4, shadow=8).  Degenerate triangles get maskbits 0.
    """
    v0 = np.asarray(v0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    t = v0.shape[0]
    n = np.cross(e1, e2)
    nn = np.einsum("ij,ij->i", n, n)
    degen = nn < 1e-30
    c1 = np.cross(e2, n)
    c2 = np.cross(n, e1)
    den1 = np.einsum("ij,ij->i", c1, e1)
    den2 = np.einsum("ij,ij->i", c2, e2)
    bad = degen | (np.abs(den1) < 1e-30) | (np.abs(den2) < 1e-30)
    den1 = np.where(bad, 1.0, den1)
    den2 = np.where(bad, 1.0, den2)
    B1 = c1 / den1[:, None]
    B2 = c2 / den2[:, None]
    d0 = -np.einsum("ij,ij->i", n, v0)
    b1 = -np.einsum("ij,ij->i", B1, v0)
    b2 = -np.einsum("ij,ij->i", B2, v0)
    mask = np.where(bad, 0, np.asarray(maskbits, np.int64) & 0xF)

    pad = (-t) % TRI_TILE
    tp = t + pad
    tab = np.zeros((max(tp, TRI_TILE), LANES), np.float32)
    tab[:t, 0:3] = n
    tab[:t, 3] = d0
    tab[:t, 4:7] = B1
    tab[:t, 7] = b1
    tab[:t, 8:11] = B2
    tab[:t, 11] = b2
    tab[:t, 12] = mask.astype(np.float32)
    return {"bw_tris": tab, "bw_ntris": np.int32(t)}


def _bw_loop(tri_ref, mask_bit, ox, oy, oz, dx, dy, dz, tmin, tmax,
             *, any_hit):
    ntiles = tri_ref.shape[0] // TRI_TILE
    tol = jnp.float32(1.1920928955078125e-07)

    def tile_test(jt, best):
        blk = tri_ref[pl.ds(jt * TRI_TILE, TRI_TILE), :]
        bt, bu, bv, bi = best
        for kk in range(TRI_TILE):
            nx, ny, nz = blk[kk, 0], blk[kk, 1], blk[kk, 2]
            d0 = blk[kk, 3]
            b1x, b1y, b1z, b1c = blk[kk, 4], blk[kk, 5], blk[kk, 6], blk[kk, 7]
            b2x, b2y, b2z, b2c = blk[kk, 8], blk[kk, 9], blk[kk, 10], blk[kk, 11]
            mb = blk[kk, 12].astype(jnp.int32)
            vis = (mb & mask_bit) != 0

            m = (nx * ox + ny * oy) + (nz * oz + d0)
            k = nx * dx + ny * dy + nz * dz
            inv_k = jnp.where(k == 0.0, 0.0,
                              1.0 / jnp.where(k == 0.0, 1.0, k))
            tt = -m * inv_k
            s1 = (b1x * ox + b1y * oy) + (b1z * oz + b1c)
            r1 = b1x * dx + b1y * dy + b1z * dz
            u = s1 + tt * r1
            s2 = (b2x * ox + b2y * oy) + (b2z * oz + b2c)
            r2 = b2x * dx + b2y * dy + b2z * dz
            v = s2 + tt * r2
            ok = (vis & (k != 0.0) & (u >= -tol) & (v >= -tol)
                  & (u + v <= 1.0 + tol) & (tt >= tmin) & (tt <= bt))
            bt = jnp.where(ok, tt, bt)
            if not any_hit:
                bu = jnp.where(ok, jnp.maximum(u, 0.0), bu)
                bv = jnp.where(ok, jnp.maximum(v, 0.0), bv)
            bi = jnp.where(ok, jt * TRI_TILE + kk, bi)
        return bt, bu, bv, bi

    init = (tmax, jnp.zeros_like(tmax), jnp.zeros_like(tmax),
            jnp.full(tmax.shape, -1, jnp.int32))
    # NOTE: an any-hit early-exit (while_loop + jnp.any over the block per
    # tile) was measured a net LOSS at ~10^3 tris — the cross-lane
    # reduction per tile costs more than the skipped tiles save.  Both
    # variants run the plain unconditional sweep.
    return jax.lax.fori_loop(0, ntiles, tile_test, init)


def _kernel(mask_ref, tris, ox, oy, oz, dx, dy, dz, tmn, tmx,
            out_t, out_u, out_v, out_i, *, any_hit):
    bt, bu, bv, bi = _bw_loop(tris, mask_ref[0], ox[:], oy[:], oz[:],
                              dx[:], dy[:], dz[:], tmn[:], tmx[:],
                              any_hit=any_hit)
    out_t[:] = bt
    out_u[:] = bu
    out_v[:] = bv
    out_i[:] = bi


def _pad_rays(a, n, rows, fill=0.0):
    pad = rows * LANES - n
    if pad:
        a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
    return a.reshape(rows, LANES)


def _call(tables, org, d, tmin, tmax, mask_bit, any_hit, interpret=False):
    org, d, tmin, tmax = map(jax.lax.stop_gradient, (org, d, tmin, tmax))
    n = org.shape[0]
    tmin = jnp.broadcast_to(tmin, (n,)).astype(jnp.float32)
    tmax = jnp.broadcast_to(tmax, (n,)).astype(jnp.float32)
    npad = n + ((-n) % BLOCK)
    rows = npad // LANES
    rays = (
        _pad_rays(org[:, 0].astype(jnp.float32), n, rows),
        _pad_rays(org[:, 1].astype(jnp.float32), n, rows),
        _pad_rays(org[:, 2].astype(jnp.float32), n, rows),
        _pad_rays(d[:, 0].astype(jnp.float32), n, rows),
        _pad_rays(d[:, 1].astype(jnp.float32), n, rows),
        _pad_rays(d[:, 2].astype(jnp.float32), n, rows),
        _pad_rays(tmin, n, rows),
        _pad_rays(tmax, n, rows, fill=-1.0),
    )
    grid = rows // SUBLANES
    ray_spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec(memory_space=pltpu.SMEM)
    shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    ishape = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
    mask_arr = jnp.asarray(mask_bit, jnp.int32).reshape(1)

    out = pl.pallas_call(
        functools.partial(_kernel, any_hit=any_hit),
        grid=(grid,),
        in_specs=[smem1, full] + [ray_spec] * 8,
        out_specs=(ray_spec, ray_spec, ray_spec, ray_spec),
        out_shape=(shape, shape, shape, ishape),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(mask_arr, tables["bw_tris"], *rays)
    flat = lambda a: a.reshape(-1)[:n]
    t, u, v, i = (flat(a) for a in out)
    return t, u, v, i


def bw_closest(tables, org, d, tmin, tmax, mask_bit=0xF, interpret=False):
    """Closest hit over the soup: (t, u, v, prim), prim -1 on miss."""
    return _call(tables, org, d, tmin, tmax, mask_bit, any_hit=False,
                 interpret=interpret)


def bw_any(tables, org, d, tmin, tmax, mask_bit=0xF, interpret=False):
    """Occlusion: True where any visible triangle blocks the segment."""
    _, _, _, i = _call(tables, org, d, tmin, tmax, mask_bit, any_hit=True,
                       interpret=interpret)
    return i >= 0
