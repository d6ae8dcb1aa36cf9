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
import os

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
# triangle records as SMEM scalars: a scalar operand against an (8, 128)
# vector op costs nothing on the VPU (it rides the scalar unit), unlike a
# VMEM lane extract + broadcast; budget chosen well under the core's SMEM
_SMEM_BUDGET_TRIS = 3072


def bw_tables(v0, e1, e2, maskbits, order=None):
    """Precompute the Baldwin–Weber triangle + cluster tables.

    maskbits: (T,) int visibility bits per triangle (camera=1, light=2,
    bounce=4, shadow=8).  Degenerate triangles get maskbits 0.

    order: optional (T,) permutation (e.g. the SAH BVH's tri_order) —
    triangles are stored permuted so consecutive TRI_TILE-sized clusters
    are spatially tight, and each cluster gets an AABB; the kernel slab-
    tests the cluster box against the whole ray block and skips the eight
    triangle tests when no ray can hit (a two-level BVH flattened into a
    dense sweep + conditional skip, the TPU-shaped replacement for
    stack-based traversal at this scale).  Reported prim ids are always
    ORIGINAL indices.
    """
    v0 = np.asarray(v0, np.float64)
    e1 = np.asarray(e1, np.float64)
    e2 = np.asarray(e2, np.float64)
    t = v0.shape[0]
    if order is None:
        order = np.arange(t)
    else:
        order = np.asarray(order, np.int64)
    v0 = v0[order]
    e1 = e1[order]
    e2 = e2[order]
    maskbits = np.asarray(maskbits, np.int64)[order]
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
    tp = max(t + pad, TRI_TILE)
    tab = np.zeros((tp, 16), np.float32)
    tab[:t, 0:3] = n
    tab[:t, 3] = d0
    tab[:t, 4:7] = B1
    tab[:t, 7] = b1
    tab[:t, 8:11] = B2
    tab[:t, 11] = b2
    tab[:t, 12] = mask.astype(np.float32)
    tab[:t, 13] = order.astype(np.float32)     # original id, exact < 2^24

    # per-cluster AABBs; lane 6 = valid flag (empty padding clusters skip)
    nclust = tp // TRI_TILE
    va = np.asarray(v0, np.float32)
    vb = np.asarray(v0 + e1, np.float32)
    vc = np.asarray(v0 + e2, np.float32)
    cb = np.zeros((nclust, 8), np.float32)
    for ci in range(nclust):
        lo, hi = ci * TRI_TILE, min((ci + 1) * TRI_TILE, t)
        if lo >= t:
            continue
        pts = np.concatenate([va[lo:hi], vb[lo:hi], vc[lo:hi]])
        cb[ci, 0:3] = pts.min(axis=0)
        cb[ci, 3:6] = pts.max(axis=0)
        cb[ci, 6] = 1.0
    bounds = np.zeros(8, np.float32)
    if t:
        bounds[0:3] = np.concatenate([va, vb, vc]).min(axis=0)
        bounds[3:6] = np.concatenate([va, vb, vc]).max(axis=0)
    else:
        bounds[3:6] = 1.0
    return {"bw_tris": tab, "bw_clusters": cb, "bw_bounds": bounds,
            "bw_ntris": np.int32(t)}


def _tri_test(scal, mask_bit, ox, oy, oz, dx, dy, dz, tmin, best,
              any_hit):
    """One triangle (14 scalars incl. original id) vs the whole ray block."""
    tol = jnp.float32(1.1920928955078125e-07)
    (nx, ny, nz, d0, b1x, b1y, b1z, b1c, b2x, b2y, b2z, b2c, mbf, oi) = scal
    bt, bu, bv, bi = best
    vis = (mbf.astype(jnp.int32) & mask_bit) != 0
    m = (nx * ox + ny * oy) + (nz * oz + d0)
    k = nx * dx + ny * dy + nz * dz
    inv_k = jnp.where(k == 0.0, 0.0, 1.0 / jnp.where(k == 0.0, 1.0, k))
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
    bi = jnp.where(ok, oi.astype(jnp.int32), bi)
    return (bt, bu, bv, bi), ok


def _bw_loop(tri_ref, cl_ref, mask_bit, ox, oy, oz, dx, dy, dz, tmin, tmax,
             *, any_hit, smem):
    ntiles = tri_ref.shape[0] // TRI_TILE
    init = (tmax, jnp.zeros_like(tmax), jnp.zeros_like(tmax),
            jnp.full(tmax.shape, -1, jnp.int32))
    big = jnp.float32(1e30)
    ix = jnp.where(dx == 0.0, big, 1.0 / jnp.where(dx == 0.0, 1.0, dx))
    iy = jnp.where(dy == 0.0, big, 1.0 / jnp.where(dy == 0.0, 1.0, dy))
    iz = jnp.where(dz == 0.0, big, 1.0 / jnp.where(dz == 0.0, 1.0, dz))

    def tile_test(jt, best):
        if smem:
            # SMEM scalar loads: free against the vector pipeline
            row = lambda kk, c: tri_ref[jt * TRI_TILE + kk, c]
            crow = lambda c: cl_ref[jt, c]
        else:
            blk = tri_ref[pl.ds(jt * TRI_TILE, TRI_TILE), :]
            cblk = cl_ref[pl.ds(jt, 1), :]
            row = lambda kk, c: blk[kk, c]
            crow = lambda c: cblk[0, c]

        # cluster AABB slab vs every ray; skip the 8 triangles when no
        # ray's [tmin, best] window crosses the box.  Rays are sorted by
        # octant+direction+origin (see _sort_perm) so blocks are coherent
        # and the skip actually fires.
        t0x = (crow(0) - ox) * ix
        t1x = (crow(3) - ox) * ix
        t0y = (crow(1) - oy) * iy
        t1y = (crow(4) - oy) * iy
        t0z = (crow(2) - oz) * iz
        t1z = (crow(5) - oz) * iz
        bt = best[0]
        near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                       jnp.minimum(t0y, t1y)),
                           jnp.maximum(jnp.minimum(t0z, t1z), tmin))
        far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                      jnp.maximum(t0y, t1y)),
                          jnp.minimum(jnp.maximum(t0z, t1z), bt))
        anyhit = jnp.any(near <= far) & (crow(6) > 0.0)

        def do(best):
            for kk in range(TRI_TILE):
                scal = tuple(row(kk, c) for c in range(14))
                best, _ = _tri_test(scal, mask_bit, ox, oy, oz, dx, dy, dz,
                                    tmin, best, any_hit)
            return best

        if os.environ.get("IGNIS_TPU_BW_CLUSTER", "1") == "0":
            return do(best)
        return jax.lax.cond(anyhit, do, lambda b: b, best)

    return jax.lax.fori_loop(0, ntiles, tile_test, init)


def _kernel(mask_ref, tris, clusters, ox, oy, oz, dx, dy, dz, tmn, tmx,
            out_t, out_u, out_v, out_i, *, any_hit, smem):
    bt, bu, bv, bi = _bw_loop(tris, clusters, mask_ref[0], ox[:], oy[:],
                              oz[:], dx[:], dy[:], dz[:], tmn[:], tmx[:],
                              any_hit=any_hit, smem=smem)
    out_t[:] = bt
    out_u[:] = bu
    out_v[:] = bv
    out_i[:] = bi


def _pad_rays(a, n, rows, fill=0.0):
    pad = rows * LANES - n
    if pad:
        a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
    return a.reshape(rows, LANES)


def _part1by2(x):
    x = x & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def _sort_perm(tables, org, d, tmin, tmax):
    """Coherence permutation: octant | direction-morton | origin-morton.

    The cluster skip fires only when a whole (8, 128) block misses a
    cluster box, so blocks must hold rays with similar lines.  Direction
    bits dominate (camera waves share one origin); origin bits order
    bounce waves.  Dead lanes key to the max so terminated rays pack."""
    bmin = tables["bw_bounds"][0:3]
    ext = jnp.maximum(tables["bw_bounds"][3:6] - bmin, 1e-6)
    oq = jnp.clip((org - bmin) / ext * 1023.0, 0.0, 1023.0).astype(jnp.uint32)
    omort = (_part1by2(oq[:, 0]) | (_part1by2(oq[:, 1]) << 1)
             | (_part1by2(oq[:, 2]) << 2))            # 30 bits
    dq = jnp.clip((d * 0.5 + 0.5) * 31.0, 0.0, 31.0).astype(jnp.uint32)
    dmort = (_part1by2(dq[:, 0]) | (_part1by2(dq[:, 1]) << 1)
             | (_part1by2(dq[:, 2]) << 2)) & jnp.uint32(0x7FFF)  # 15 bits
    key = (dmort << 17) | (omort >> 13)
    key = jnp.where(tmax <= tmin, jnp.uint32(0xFFFFFFFF), key)
    nn = org.shape[0]
    _, perm = jax.lax.sort_key_val(key, jnp.arange(nn, dtype=jnp.int32))
    inv = jnp.zeros(nn, jnp.int32).at[perm].set(
        jnp.arange(nn, dtype=jnp.int32))
    return perm, inv


def _call(tables, org, d, tmin, tmax, mask_bit, any_hit, interpret=False):
    org, d, tmin, tmax = map(jax.lax.stop_gradient, (org, d, tmin, tmax))
    n = org.shape[0]
    tmin = jnp.broadcast_to(tmin, (n,)).astype(jnp.float32)
    tmax = jnp.broadcast_to(tmax, (n,)).astype(jnp.float32)
    # Per-call ray sorting is DEFAULT-OFF: the permutation (and its
    # inverse on four outputs) are 65536-lane XLA gathers at ~374 us each
    # — measured a net 1.8x regression on the production wavefront.  The
    # cluster skip still fires on naturally coherent camera blocks.
    sort = (n >= 2 * BLOCK and not interpret
            and os.environ.get("IGNIS_TPU_BW_SORT", "0") == "1")
    if sort:
        perm, inv = _sort_perm(tables, org, d, tmin, tmax)
        org, d = org[perm], d[perm]
        tmin, tmax = tmin[perm], tmax[perm]
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
    smem1 = pl.BlockSpec(memory_space=pltpu.SMEM)
    smem = tables["bw_tris"].shape[0] <= _SMEM_BUDGET_TRIS
    tri_spec = pl.BlockSpec(memory_space=pltpu.SMEM if smem
                            else pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    ishape = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
    mask_arr = jnp.asarray(mask_bit, jnp.int32).reshape(1)

    out = pl.pallas_call(
        functools.partial(_kernel, any_hit=any_hit, smem=smem),
        grid=(grid,),
        in_specs=[smem1, tri_spec, tri_spec] + [ray_spec] * 8,
        out_specs=(ray_spec, ray_spec, ray_spec, ray_spec),
        out_shape=(shape, shape, shape, ishape),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(mask_arr, tables["bw_tris"], tables["bw_clusters"], *rays)
    flat = lambda a: a.reshape(-1)[:n]
    out = tuple(flat(a) for a in out)
    if sort:
        out = tuple(a[inv] for a in out)
    return out


def bw_closest(tables, org, d, tmin, tmax, mask_bit=0xF, interpret=False):
    """Closest hit over the soup: (t, u, v, prim), prim -1 on miss."""
    return _call(tables, org, d, tmin, tmax, mask_bit, any_hit=False,
                 interpret=interpret)


def bw_any(tables, org, d, tmin, tmax, mask_bit=0xF, interpret=False):
    """Occlusion: True where any visible triangle blocks the segment."""
    _, _, _, i = _call(tables, org, d, tmin, tmax, mask_bit, any_hit=True,
                       interpret=interpret)
    return i >= 0
