"""Pallas TPU kernels for ray/triangle intersection.

The XLA brute-force sweep (ops/intersect.py) materializes (N, T)-shaped
intermediates in HBM; these kernels instead keep the WHOLE triangle soup in
VMEM (a (10, T) f32 table — 16k triangles is ~0.6 MB) and stream rays
through in (8, 128) register blocks.  The in-kernel loop visits TRI_TILE
triangles per iteration via a dynamic slice + static unroll, carrying
best-hit state in registers; bandwidth is rays-in + hits-out only, the
speed-of-light design for small/medium scenes on TPU (SURVEY.md §7.3).

Same intersection predicate as ops/intersect.py `_mt_block` (matching
traversal/intersection.art:70-101 with standard-edge sign convention).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
SUBLANES = 8
BLOCK = LANES * SUBLANES  # rays per grid step
TRI_TILE = 8              # triangles per loop iteration (static unroll)


def _pack_tris(v0, e1, e2, tri_mask, t):
    """(Tpad, 128) f32: row j = triangle j, lanes 0..9 = v0.xyz|e1.xyz|e2.xyz|mask.

    Row-major triangle records keep dynamic slices on the SUBLANE axis
    (8-aligned), which Mosaic supports; the lane axis stays static.
    """
    if tri_mask is None:
        mask = jnp.ones((t,), jnp.float32)
    else:
        mask = tri_mask.astype(jnp.float32)
    comps = [v0[:, 0], v0[:, 1], v0[:, 2],
             e1[:, 0], e1[:, 1], e1[:, 2],
             e2[:, 0], e2[:, 1], e2[:, 2], mask]
    packed = jnp.stack([c.astype(jnp.float32) for c in comps], axis=1)  # (T,10)
    pad = (-t) % TRI_TILE
    if pad:
        packed = jnp.concatenate(
            [packed, jnp.zeros((pad, 10), jnp.float32)])
    lanes_pad = jnp.zeros((packed.shape[0], LANES - 10), jnp.float32)
    return jnp.concatenate([packed, lanes_pad], axis=1)


def _mt_loop(tri_ref, ox, oy, oz, dx, dy, dz, tmin, tmax):
    ntiles = tri_ref.shape[0] // TRI_TILE
    tol = jnp.float32(-1.1920928955078125e-07)

    def tile_test(jt, best):
        blk = tri_ref[pl.ds(jt * TRI_TILE, TRI_TILE), :]  # (TRI_TILE, 128)
        bt, bu, bv, bi = best
        for k in range(TRI_TILE):
            av0x, av0y, av0z = blk[k, 0], blk[k, 1], blk[k, 2]
            ae1x, ae1y, ae1z = blk[k, 3], blk[k, 4], blk[k, 5]
            ae2x, ae2y, ae2z = blk[k, 6], blk[k, 7], blk[k, 8]
            m = blk[k, 9]

            nx = ae1y * ae2z - ae1z * ae2y
            ny = ae1z * ae2x - ae1x * ae2z
            nz = ae1x * ae2y - ae1y * ae2x
            cx = av0x - ox
            cy = av0y - oy
            cz = av0z - oz
            rx = dy * cz - dz * cy
            ry = dz * cx - dx * cz
            rz = dx * cy - dy * cx

            det = nx * dx + ny * dy + nz * dz
            inv_det = jnp.where(det == 0.0, 0.0,
                                1.0 / jnp.where(det == 0.0, 1.0, det))
            u = -(rx * ae2x + ry * ae2y + rz * ae2z) * inv_det
            v = (rx * ae1x + ry * ae1y + rz * ae1z) * inv_det
            w = 1.0 - u - v
            tt = (cx * nx + cy * ny + cz * nz) * inv_det
            ok = ((det != 0.0) & (u >= tol) & (v >= tol) & (w >= tol)
                  & (tt >= tmin) & (tt <= bt) & (m > 0.0))
            bt = jnp.where(ok, tt, bt)
            bu = jnp.where(ok, jnp.maximum(u, 0.0), bu)
            bv = jnp.where(ok, jnp.maximum(v, 0.0), bv)
            bi = jnp.where(ok, jt * TRI_TILE + k, bi)
        return bt, bu, bv, bi

    init = (tmax, jnp.zeros_like(tmax), jnp.zeros_like(tmax),
            jnp.full(tmax.shape, -1, jnp.int32))
    return jax.lax.fori_loop(0, ntiles, tile_test, init)


def _closest_kernel(tri_ref, ox, oy, oz, dx, dy, dz, tmin, tmax,
                    out_t, out_u, out_v, out_i):
    bt, bu, bv, bi = _mt_loop(tri_ref, ox[:], oy[:], oz[:],
                              dx[:], dy[:], dz[:], tmin[:], tmax[:])
    out_t[:] = bt
    out_u[:] = bu
    out_v[:] = bv
    out_i[:] = bi


def _any_kernel(tri_ref, ox, oy, oz, dx, dy, dz, tmin, tmax, out_occ):
    _, _, _, bi = _mt_loop(tri_ref, ox[:], oy[:], oz[:],
                           dx[:], dy[:], dz[:], tmin[:], tmax[:])
    out_occ[:] = (bi >= 0).astype(jnp.int32)


def _pad_rays(a, n, rows, fill=0.0):
    pad = rows * LANES - n
    if pad:
        a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
    return a.reshape(rows, LANES)


def _prep(org, d, tmin, tmax, n):
    npad = n + ((-n) % BLOCK)
    rows = npad // LANES
    ox = _pad_rays(org[:, 0].astype(jnp.float32), n, rows)
    oy = _pad_rays(org[:, 1].astype(jnp.float32), n, rows)
    oz = _pad_rays(org[:, 2].astype(jnp.float32), n, rows)
    dx = _pad_rays(d[:, 0].astype(jnp.float32), n, rows)
    dy = _pad_rays(d[:, 1].astype(jnp.float32), n, rows)
    dz = _pad_rays(d[:, 2].astype(jnp.float32), n, rows)
    tmin_b = _pad_rays(jnp.broadcast_to(tmin, (n,)).astype(jnp.float32), n, rows)
    tmax_b = _pad_rays(jnp.broadcast_to(tmax, (n,)).astype(jnp.float32), n, rows,
                       fill=-1.0)
    return (ox, oy, oz, dx, dy, dz, tmin_b, tmax_b), rows


def pallas_intersect_closest(org, d, tmin, tmax, v0, e1, e2, tri_mask=None):
    """Closest hit; returns (t, u, v, prim) with prim==-1 on miss."""
    n = org.shape[0]
    rays, rows = _prep(org, d, tmin, tmax, n)
    tri = _pack_tris(v0, e1, e2, tri_mask, v0.shape[0])

    grid = rows // SUBLANES
    ray_spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    ishape = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)

    out_t, out_u, out_v, out_i = pl.pallas_call(
        _closest_kernel,
        grid=(grid,),
        in_specs=[tri_spec] + [ray_spec] * 8,
        out_specs=(ray_spec, ray_spec, ray_spec, ray_spec),
        out_shape=(shape, shape, shape, ishape),
    )(tri, *rays)

    flat = lambda a: a.reshape(-1)[:n]
    return flat(out_t), flat(out_u), flat(out_v), flat(out_i)


def pallas_intersect_any(org, d, tmin, tmax, v0, e1, e2, tri_mask=None):
    n = org.shape[0]
    rays, rows = _prep(org, d, tmin, tmax, n)
    tri = _pack_tris(v0, e1, e2, tri_mask, v0.shape[0])

    grid = rows // SUBLANES
    ray_spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    tri_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    ishape = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)

    occ = pl.pallas_call(
        _any_kernel,
        grid=(grid,),
        in_specs=[tri_spec] + [ray_spec] * 8,
        out_specs=ray_spec,
        out_shape=ishape,
    )(tri, *rays)
    return occ.reshape(-1)[:n] > 0
