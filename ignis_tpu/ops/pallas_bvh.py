"""Pallas TPU packet BVH traversal — the speed-of-light traversal kernel.

TPU-first redesign of the reference's SIMD packet traversal
(src/artic/traversal/mapping_cpu.art:260-512): instead of per-lane stacks
(which force per-lane HBM gathers of node data — the reason the XLA
`ops/bvh.py` path is latency-bound), each packet of PACKET=1024 rays shares
ONE traversal stack held in SMEM scratch.  Node fetches are scalar dynamic
slices from a VMEM-resident node table, and every box/triangle test runs as
full-width (8, 128) VPU ops over the whole packet.  Divergence costs extra
node visits (the packet traverses the union of its rays' paths) but every
visit is a handful of vector instructions — the classic packet-tracing
trade, which coherent camera/shadow waves win decisively.

Host-side layout (built in `build_packet_bvh` from the binary SAH BVH of
ops/bvh.py, mirroring the reference's node collapse in bvh/NArityBvh.h):

* nodes_f (M, 16) f32 — per inner node, both children's slabs:
  [lmin.xyz, lmax.xyz, rmin.xyz, rmax.xyz, pad x4]
* nodes_i (M, 8) i32 — [l_enc, r_enc, pad...]; enc >= 0 = inner-node id,
  enc < 0 = ~leaf_row, EMPTY = INT32_MIN = missing child
* leaves (NL, 64) f32 — 4 triangle records of 16:
  [v0.xyz, e1.xyz, e2.xyz, maskbits, orig_idx, pad x5]; degenerate fill has
  maskbits = 0.  maskbits packs per-ray-class visibility (bit0 camera,
  bit1 bounce, bit2 shadow) from ent_flags so the kernel needs no per-lane
  gathers (LoaderEntity.cpp:123-131 semantics).

Intersection predicate matches ops/intersect.py `_mt_block`
(traversal/intersection.art:70-101, standard-edge sign convention).
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
PACKET = LANES * SUBLANES     # rays per packet / grid step
LEAF_TRIS = 4
STACK_DEPTH = 96
EMPTY = np.int32(-2147483648)

# ray-class bits for the packed per-triangle visibility mask — identical to
# the reference's ray flags (LoaderEntity.cpp:123-131) so a ray's flag value
# can be passed straight through as mask_bit.
MASK_CAMERA = 0x1
MASK_LIGHT = 0x2
MASK_BOUNCE = 0x4
MASK_SHADOW = 0x8


# --------------------------------------------------------------------- build
def build_packet_bvh(bvh, tri_v0, tri_e1, tri_e2, ent_flags_per_tri):
    """Convert a binary `ops.bvh.BVH` into the packet kernel's tables.

    ent_flags_per_tri: (T,) uint8 of reference visibility flags
    (camera=0x1, light=0x2, bounce=0x4, shadow=0x8) per ORIGINAL triangle.
    Returns dict of numpy arrays (pb_nodes_f, pb_nodes_i, pb_leaves).
    """
    order = bvh.tri_order
    t = order.shape[0]
    v0 = np.asarray(tri_v0, np.float32)
    e1 = np.asarray(tri_e1, np.float32)
    e2 = np.asarray(tri_e2, np.float32)
    fl = np.asarray(ent_flags_per_tri, np.int64)
    maskbits = (fl & 0xF).astype(np.float32)

    nm, nx = bvh.node_min, bvh.node_max
    nl, nr, nc = bvh.node_left, bvh.node_right, bvh.node_count
    m = nm.shape[0]

    leaves = []          # each: (start, count) into `order`
    inner_ids = {}       # binary node idx -> packed inner row
    nodes_f, nodes_i = [], []

    def leaf_row(bidx):
        leaves.append((int(nl[bidx]), int(nc[bidx])))
        return np.int32(~(len(leaves) - 1))

    # BFS over inner nodes
    is_inner = nc == 0
    if not is_inner.any() or t == 0:
        # whole tree is one leaf: synthesize a root inner node
        nodes_f.append(np.concatenate([nm[0], nx[0], nm[0], nx[0],
                                       np.zeros(4, np.float32)]))
        enc_l = leaf_row(0) if t else EMPTY
        nodes_i.append(np.array([enc_l, EMPTY, 0, 0, 0, 0, 0, 0], np.int32))
    else:
        queue = [0]
        inner_ids[0] = 0
        nodes_f.append(None)
        nodes_i.append(None)
        while queue:
            b = queue.pop()
            row = inner_ids[b]
            l, r = int(nl[b]), int(nr[b])
            encs = []
            for c in (l, r):
                if nc[c] == 0:
                    inner_ids[c] = len(nodes_f)
                    nodes_f.append(None)
                    nodes_i.append(None)
                    queue.append(c)
                    encs.append(np.int32(inner_ids[c]))
                else:
                    encs.append(leaf_row(c))
            nodes_f[row] = np.concatenate([nm[l], nx[l], nm[r], nx[r],
                                           np.zeros(4, np.float32)])
            nodes_i[row] = np.array([encs[0], encs[1], 0, 0, 0, 0, 0, 0],
                                    np.int32)

    nodes_f = np.stack(nodes_f).astype(np.float32)
    nodes_i = np.stack(nodes_i).astype(np.int32)

    nlv = max(1, len(leaves))
    leaf_tab = np.zeros((nlv, LEAF_TRIS * 16), np.float32)
    for li, (start, count) in enumerate(leaves):
        for k in range(min(count, LEAF_TRIS)):
            oi = int(order[start + k])
            rec = np.zeros(16, np.float32)
            rec[0:3] = v0[oi]
            rec[3:6] = e1[oi]
            rec[6:9] = e2[oi]
            rec[9] = maskbits[oi] if maskbits.size else 7.0
            rec[10] = np.float32(oi)       # exact for oi < 2^24
            leaf_tab[li, k * 16:(k + 1) * 16] = rec
    if t >= (1 << 24):
        raise ValueError("packet BVH supports < 2^24 triangles per soup")
    return {"pb_nodes_f": nodes_f, "pb_nodes_i": nodes_i,
            "pb_leaves": leaf_tab}


# -------------------------------------------------------------------- kernel
def _slab_pk(ox, oy, oz, ix, iy, iz, tmn, lim, bmin, bmax):
    """Packet slab test vs one box given as 6 scalars.  Returns (8,128) hit."""
    t0x = (bmin[0] - ox) * ix
    t1x = (bmax[0] - ox) * ix
    t0y = (bmin[1] - oy) * iy
    t1y = (bmax[1] - oy) * iy
    t0z = (bmin[2] - oz) * iz
    t1z = (bmax[2] - oz) * iz
    near = jnp.maximum(jnp.maximum(jnp.minimum(t0x, t1x),
                                   jnp.minimum(t0y, t1y)),
                       jnp.maximum(jnp.minimum(t0z, t1z), tmn))
    far = jnp.minimum(jnp.minimum(jnp.maximum(t0x, t1x),
                                  jnp.maximum(t0y, t1y)),
                      jnp.minimum(jnp.maximum(t0z, t1z), lim))
    return near, near <= far


def _leaf_test(row, mask_bit, ox, oy, oz, dx, dy, dz, tmn, best):
    """Intersect the packet against a (1, 64) leaf row (4 triangles)."""
    tol = jnp.float32(-1.1920928955078125e-07)
    bt, bu, bv, bi = best
    for k in range(LEAF_TRIS):
        o = k * 16
        v0x, v0y, v0z = row[0, o + 0], row[0, o + 1], row[0, o + 2]
        e1x, e1y, e1z = row[0, o + 3], row[0, o + 4], row[0, o + 5]
        e2x, e2y, e2z = row[0, o + 6], row[0, o + 7], row[0, o + 8]
        mbits = row[0, o + 9].astype(jnp.int32)
        oi = row[0, o + 10].astype(jnp.int32)
        vis = (mbits & mask_bit) != 0

        nx = e1y * e2z - e1z * e2y
        ny = e1z * e2x - e1x * e2z
        nz = e1x * e2y - e1y * e2x
        cx = v0x - ox
        cy = v0y - oy
        cz = v0z - oz
        rx = dy * cz - dz * cy
        ry = dz * cx - dx * cz
        rz = dx * cy - dy * cx
        det = nx * dx + ny * dy + nz * dz
        inv_det = jnp.where(det == 0.0, 0.0,
                            1.0 / jnp.where(det == 0.0, 1.0, det))
        u = -(rx * e2x + ry * e2y + rz * e2z) * inv_det
        v = (rx * e1x + ry * e1y + rz * e1z) * inv_det
        w = 1.0 - u - v
        tt = (cx * nx + cy * ny + cz * nz) * inv_det
        ok = (vis & (det != 0.0) & (u >= tol) & (v >= tol) & (w >= tol)
              & (tt >= tmn) & (tt <= bt))
        bt = jnp.where(ok, tt, bt)
        bu = jnp.where(ok, jnp.maximum(u, 0.0), bu)
        bv = jnp.where(ok, jnp.maximum(v, 0.0), bv)
        bi = jnp.where(ok, oi, bi)
    return bt, bu, bv, bi


def _traverse_kernel(mask_ref, nodes_f, nodes_i, leaves, ox, oy, oz, dx, dy,
                     dz, tmin, tmax, out_t, out_u, out_v, out_i, stack,
                     *, any_hit):
    mask_bit = mask_ref[0]
    o = (ox[:], oy[:], oz[:])
    d = (dx[:], dy[:], dz[:])
    big = jnp.float32(1e30)
    ix = jnp.where(d[0] == 0.0, big, 1.0 / jnp.where(d[0] == 0.0, 1.0, d[0]))
    iy = jnp.where(d[1] == 0.0, big, 1.0 / jnp.where(d[1] == 0.0, 1.0, d[1]))
    iz = jnp.where(d[2] == 0.0, big, 1.0 / jnp.where(d[2] == 0.0, 1.0, d[2]))
    tmn = tmin[:]

    stack[0] = jnp.int32(0)

    def cond(carry):
        sp, bt, bu, bv, bi = carry
        if any_hit:
            return (sp > 0) & jnp.any((bi < 0) & (bt >= 0.0))
        return sp > 0

    def body(carry):
        sp, bt, bu, bv, bi = carry
        enc = stack[sp - 1]
        sp = sp - 1
        lim = bt  # per-ray search window shrinks with best hit

        def inner_case(args):
            sp, bt, bu, bv, bi = args
            ni = enc
            fr = nodes_f[pl.ds(ni, 1), :]        # (1, 16)
            ir = nodes_i[ni, 0], nodes_i[ni, 1]
            lmin = (fr[0, 0], fr[0, 1], fr[0, 2])
            lmax = (fr[0, 3], fr[0, 4], fr[0, 5])
            rmin = (fr[0, 6], fr[0, 7], fr[0, 8])
            rmax = (fr[0, 9], fr[0, 10], fr[0, 11])
            lnear, lhit = _slab_pk(*o, ix, iy, iz, tmn, lim, lmin, lmax)
            rnear, rhit = _slab_pk(*o, ix, iy, iz, tmn, lim, rmin, rmax)
            if any_hit:
                act = bi < 0
                lhit = lhit & act
                rhit = rhit & act
            l_any = jnp.any(lhit) & (ir[0] != EMPTY)
            r_any = jnp.any(rhit) & (ir[1] != EMPTY)
            # near-ordering by packet vote: push far child first
            vote = jnp.sum(jnp.where(
                lhit & rhit, jnp.where(lnear <= rnear, 1, -1), 0))
            left_first = vote >= 0
            fst = jnp.where(left_first, ir[0], ir[1])
            sec = jnp.where(left_first, ir[1], ir[0])
            fst_p = jnp.where(left_first, l_any, r_any)
            sec_p = jnp.where(left_first, r_any, l_any)
            pos2 = jnp.where(sec_p, sp, STACK_DEPTH)
            stack[pos2] = sec
            sp = sp + sec_p.astype(jnp.int32)
            pos1 = jnp.where(fst_p, sp, STACK_DEPTH)
            stack[pos1] = fst
            sp = sp + fst_p.astype(jnp.int32)
            return sp, bt, bu, bv, bi

        def leaf_case(args):
            sp, bt, bu, bv, bi = args
            row = leaves[pl.ds(~enc, 1), :]      # (1, 64)
            bt, bu, bv, bi = _leaf_test(row, mask_bit, *o, *d, tmn,
                                        (bt, bu, bv, bi))
            return sp, bt, bu, bv, bi

        return jax.lax.cond(enc >= 0, inner_case, leaf_case,
                            (sp, bt, bu, bv, bi))

    init = (jnp.int32(1), tmax[:], jnp.zeros_like(tmn), jnp.zeros_like(tmn),
            jnp.full(tmn.shape, -1, jnp.int32))
    _, bt, bu, bv, bi = jax.lax.while_loop(cond, body, init)
    out_t[:] = bt
    out_u[:] = bu
    out_v[:] = bv
    out_i[:] = bi


# ------------------------------------------------------------------- wrapper
def _pad_rays(a, n, rows, fill=0.0):
    pad = rows * LANES - n
    if pad:
        a = jnp.concatenate([a, jnp.full((pad,), fill, a.dtype)])
    return a.reshape(rows, LANES)


def _prep(org, d, tmin, tmax, n):
    npad = n + ((-n) % PACKET)
    rows = npad // LANES
    return (
        _pad_rays(org[:, 0].astype(jnp.float32), n, rows),
        _pad_rays(org[:, 1].astype(jnp.float32), n, rows),
        _pad_rays(org[:, 2].astype(jnp.float32), n, rows),
        _pad_rays(d[:, 0].astype(jnp.float32), n, rows),
        _pad_rays(d[:, 1].astype(jnp.float32), n, rows),
        _pad_rays(d[:, 2].astype(jnp.float32), n, rows),
        _pad_rays(jnp.broadcast_to(tmin, (n,)).astype(jnp.float32), n, rows),
        _pad_rays(jnp.broadcast_to(tmax, (n,)).astype(jnp.float32), n, rows,
                  fill=-1.0),
    ), rows


def _call(tables, org, d, tmin, tmax, mask_bit, any_hit, interpret=False):
    # Traversal is non-differentiable by design (visibility discontinuities
    # are out of the parameter set, SURVEY.md §7.1); detaching the inputs
    # keeps reverse AD from requiring a pallas_call transpose.
    org, d, tmin, tmax = map(jax.lax.stop_gradient, (org, d, tmin, tmax))
    n = org.shape[0]
    rays, rows = _prep(org, d, tmin, tmax, n)
    grid = rows // SUBLANES
    ray_spec = pl.BlockSpec((SUBLANES, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec(memory_space=pltpu.SMEM)
    shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    ishape = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
    mask_arr = jnp.asarray(mask_bit, jnp.int32).reshape(1)

    out = pl.pallas_call(
        functools.partial(_traverse_kernel, any_hit=any_hit),
        grid=(grid,),
        in_specs=[smem1, full, full, full] + [ray_spec] * 8,
        out_specs=(ray_spec, ray_spec, ray_spec, ray_spec),
        out_shape=(shape, shape, shape, ishape),
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH + 1,), jnp.int32)],
        interpret=interpret,
    )(mask_arr, tables["pb_nodes_f"], tables["pb_nodes_i"],
      tables["pb_leaves"], *rays)
    flat = lambda a: a.reshape(-1)[:n]
    return tuple(flat(a) for a in out)


def packet_bvh_closest(tables, org, d, tmin, tmax, mask_bit=MASK_BOUNCE,
                       interpret=False):
    """Closest hit: (t, u, v, prim) with prim = ORIGINAL tri index, -1 miss."""
    t, u, v, i = _call(tables, org, d, tmin, tmax, mask_bit, any_hit=False,
                       interpret=interpret)
    return t, u, v, i


def packet_bvh_any(tables, org, d, tmin, tmax, mask_bit=MASK_SHADOW,
                   interpret=False):
    """Occlusion query: True where any visible triangle blocks the segment."""
    _, _, _, i = _call(tables, org, d, tmin, tmax, mask_bit, any_hit=True,
                       interpret=interpret)
    return i >= 0
