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

The tree is EIGHT-wide (the reference collapses its binary SAH tree to
N-wide nodes the same way, src/runtime/shape/TriMeshProvider.cpp:556-560 /
bvh/NArityBvh.h): one node visit tests 8 child boxes, one leaf visit tests
8 triangles.  Both tables are laid out as dense (rows, 128) f32 so VMEM
tiling wastes nothing (TPU tiles are (8, 128); an (N, 16) array would pad
its minor dim to 128 and burn 8x the capacity — measured: 47 MB scoped VMEM
for 11 MB of data).

Host-side layout (built in `build_packet_bvh` from the binary SAH BVH of
ops/bvh.py):

* nodes (M, 128) f32 — child c in [0,8): box slab at lanes [6c, 6c+6)
  as [min.xyz, max.xyz]; child encoding at lane 64+c as an exact-integer
  float: enc >= 0 = inner row id, enc in [-2^24, -1] = -(leaf_row+1),
  enc <= MISSING_F = no child.
* leaves (NL, 128) f32 — 8 triangle records of 16 lanes:
  [v0.xyz, e1.xyz, e2.xyz, maskbits, orig_idx, pad x5]; degenerate fill has
  maskbits = 0.  maskbits packs per-ray-class visibility (bit0 camera,
  bit1 light, bit2 bounce, bit3 shadow) from ent_flags so the kernel needs
  no per-lane gathers (LoaderEntity.cpp:123-131 semantics).

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
WIDTH = 8                     # children per node / triangles per leaf row
STACK_DEPTH = 128
MISSING_F = np.float32(-1e9)  # child-slot sentinel in the enc lane
# scoped-VMEM budget requested from Mosaic for the traversal kernel; the
# node+leaf tables must fit here together with the double-buffered ray
# windows (v5e has 128 MB of VMEM total).
VMEM_LIMIT = 100 * 1024 * 1024

# ray-class bits for the packed per-triangle visibility mask — identical to
# the reference's ray flags (LoaderEntity.cpp:123-131) so a ray's flag value
# can be passed straight through as mask_bit.
MASK_CAMERA = 0x1
MASK_LIGHT = 0x2
MASK_BOUNCE = 0x4
MASK_SHADOW = 0x8

# Batcher odd-even merge sort network for 8 elements (19 comparators)
_SORT8 = [(0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3), (4, 6), (5, 7),
          (1, 2), (5, 6), (0, 4), (1, 5), (2, 6), (3, 7), (2, 4), (3, 5),
          (1, 2), (3, 4), (5, 6)]


# --------------------------------------------------------------------- build
def build_packet_bvh(bvh, tri_v0, tri_e1, tri_e2, ent_flags_per_tri):
    """Collapse a binary `ops.bvh.BVH` into 8-wide packet-kernel tables.

    Children of an 8-wide node are gathered by repeatedly expanding the
    largest-subtree inner child; subtrees of <= 8 triangles collapse into a
    single 8-triangle leaf row (their tri_order range is contiguous by
    construction of the recursive SAH partition).

    ent_flags_per_tri: (T,) uint8 of reference visibility flags
    (camera=0x1, light=0x2, bounce=0x4, shadow=0x8) per ORIGINAL triangle.
    Returns dict of numpy arrays (pb_nodes, pb_leaves).
    """
    order = np.asarray(bvh.tri_order)
    t = order.shape[0]
    if t >= (1 << 24):
        raise ValueError("packet BVH supports < 2^24 triangles per soup")
    v0 = np.asarray(tri_v0, np.float32)
    e1 = np.asarray(tri_e1, np.float32)
    e2 = np.asarray(tri_e2, np.float32)
    fl = np.asarray(ent_flags_per_tri, np.int64)
    maskbits = (fl & 0xF).astype(np.float32)

    nm, nx = bvh.node_min, bvh.node_max
    nl, nr, nc = bvh.node_left, bvh.node_right, bvh.node_count
    m = nm.shape[0]

    # subtree triangle counts + contiguous start offsets into tri_order
    size = np.zeros(m, np.int64)
    start = np.zeros(m, np.int64)
    st = [(0, False)] if m else []
    while st:
        b, done = st.pop()
        if nc[b] > 0:
            size[b] = nc[b]
            start[b] = nl[b]
        elif done:
            size[b] = size[nl[b]] + size[nr[b]]
            start[b] = min(start[nl[b]], start[nr[b]])
        else:
            st.append((b, True))
            st.append((int(nl[b]), False))
            st.append((int(nr[b]), False))

    rows = []      # per 8-wide node: list of (bmin, bmax, enc_float)
    leaves = []    # per leaf row: array of <= 8 original tri indices
    depth_of = {0: 1}   # 8-wide row depth (root = 1); single-row trees stay 1

    def make_leaf(b):
        lo, n = int(start[b]), int(size[b])
        leaves.append(order[lo:lo + n])
        return np.float32(-len(leaves))     # -(leaf_row + 1)

    if t == 0 or m == 0:
        rows.append([])
    elif nc[0] > 0 or size[0] <= WIDTH:
        # whole tree is one leaf row: synthesize a root
        rows.append([(nm[0], nx[0], make_leaf(0))])
    else:
        row_of = {0: 0}
        rows.append(None)
        work = [0]
        while work:
            b = work.pop()
            kids = [int(nl[b]), int(nr[b])]
            while len(kids) < WIDTH:
                cand = [k for k in kids if nc[k] == 0 and size[k] > WIDTH]
                if not cand:
                    break
                big = max(cand, key=lambda k: size[k])
                kids.remove(big)
                kids += [int(nl[big]), int(nr[big])]
            entries = []
            for k in kids:
                if nc[k] > 0 or size[k] <= WIDTH:
                    entries.append((nm[k], nx[k], make_leaf(k)))
                else:
                    row_of[k] = len(rows)
                    depth_of[k] = depth_of[b] + 1
                    rows.append(None)
                    work.append(k)
                    entries.append((nm[k], nx[k], np.float32(row_of[k])))
            rows[row_of[b]] = entries

    node_tab = np.zeros((len(rows), LANES), np.float32)
    node_tab[:, 64:64 + WIDTH] = MISSING_F
    for ri, entries in enumerate(rows):
        for c, (bmin, bmax, enc) in enumerate(entries):
            node_tab[ri, 6 * c:6 * c + 3] = bmin
            node_tab[ri, 6 * c + 3:6 * c + 6] = bmax
            node_tab[ri, 64 + c] = enc

    nlv = max(1, len(leaves))
    leaf_tab = np.zeros((nlv, LANES), np.float32)
    for li, tris in enumerate(leaves):
        for k, oi in enumerate(tris[:WIDTH]):
            oi = int(oi)
            o = 16 * k
            leaf_tab[li, o:o + 3] = v0[oi]
            leaf_tab[li, o + 3:o + 6] = e1[oi]
            leaf_tab[li, o + 6:o + 9] = e2[oi]
            leaf_tab[li, o + 9] = maskbits[oi] if maskbits.size else 7.0
            leaf_tab[li, o + 10] = np.float32(oi)   # exact for oi < 2^24
    bounds = np.zeros(8, np.float32)
    if m:
        bounds[0:3] = nm[0]
        bounds[3:6] = nx[0]
    else:
        bounds[3:6] = 1.0
    # worst-case traversal stack need: every inner visit pops 1 and pushes
    # up to WIDTH children (net +7), so a root-to-leaf chain of depth D can
    # occupy 7*D + 1 slots.  Recorded so packet_tables_fit can refuse tables
    # a degenerate SAH tree could overflow (kernel clamps as backstop).
    return {"pb_nodes": node_tab, "pb_leaves": leaf_tab,
            "pb_bounds": bounds, "pb_depth": np.int32(max(depth_of.values()))}


def packet_tables_fit(tables) -> bool:
    """True when the node+leaf tables fit the kernel's scoped-VMEM budget
    and the worst-case traversal stack (7*depth + 1) fits STACK_DEPTH."""
    b = tables["pb_nodes"].size * 4 + tables["pb_leaves"].size * 4
    if 7 * int(tables.get("pb_depth", 1)) + 1 > STACK_DEPTH:
        return False
    return b <= VMEM_LIMIT - (8 << 20)   # headroom for ray windows


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
    """Intersect the packet against a (1, 128) leaf row (8 triangles)."""
    tol = jnp.float32(-1.1920928955078125e-07)
    bt, bu, bv, bi = best
    for k in range(WIDTH):
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


def _traverse_kernel(mask_ref, nodes, leaves, ox, oy, oz, dx, dy,
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
            # NOTE: children are pushed in build order, not near-ordered.  A
            # 19-comparator packet-vote ordering network was measured SLOWER
            # on both coherent (-7%) and incoherent (-29%) waves: the ~57
            # scalar selects per visit cost more than the early-termination
            # culling saves (the builder already emits children in SAH
            # partition order, which is spatially sorted).
            sp, bt, bu, bv, bi = args
            fr = nodes[pl.ds(enc, 1), :]         # (1, 128)
            act = (bi < 0) if any_hit else None
            for c in range(WIDTH):
                b = 6 * c
                bmin = (fr[0, b], fr[0, b + 1], fr[0, b + 2])
                bmax = (fr[0, b + 3], fr[0, b + 4], fr[0, b + 5])
                _, hit = _slab_pk(*o, ix, iy, iz, tmn, lim, bmin, bmax)
                if any_hit:
                    hit = hit & act
                ev = fr[0, 64 + c]
                push = jnp.any(hit) & (ev > (MISSING_F * 0.5))
                # overflow guard: drop the push (not the write bounds) when
                # the stack is full; build_packet_bvh refuses to emit tables
                # whose worst-case depth could hit this, so the clamp is a
                # belt-and-braces bound, not a correctness path.
                can = push & (sp < STACK_DEPTH)
                pos = jnp.where(can, sp, STACK_DEPTH)
                stack[pos] = ev.astype(jnp.int32)
                sp = sp + can.astype(jnp.int32)
            return sp, bt, bu, bv, bi

        def leaf_case(args):
            sp, bt, bu, bv, bi = args
            row = leaves[pl.ds(~enc, 1), :]      # (1, 128)
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


# ---------------------------------------------------------------- ray sort
def _part1by2(x):
    """Spread 10 bits of x over 30 (standard 32-bit 3D morton expansion)."""
    x = x & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def _sort_perm(tables, org, d, tmin, tmax):
    """Coherence permutation: direction octant (major) then 29-bit origin
    morton.  Bounce/shadow waves are direction- and origin-incoherent; the
    shared-stack packet traverses the UNION of its rays' node paths, so
    clustering rays cuts visits multiplicatively (mapping_cpu.art sorts by
    octant for the same reason).  Dead lanes (tmax <= tmin) key to the max
    so whole packets of terminated rays cost one visit."""
    bmin = tables["pb_bounds"][0:3]
    ext = jnp.maximum(tables["pb_bounds"][3:6] - bmin, 1e-6)
    q = jnp.clip((org - bmin) / ext * 1023.0, 0.0, 1023.0).astype(jnp.uint32)
    morton = (_part1by2(q[:, 0]) | (_part1by2(q[:, 1]) << 1)
              | (_part1by2(q[:, 2]) << 2))
    octant = ((d[:, 0] < 0).astype(jnp.uint32)
              + 2 * (d[:, 1] < 0).astype(jnp.uint32)
              + 4 * (d[:, 2] < 0).astype(jnp.uint32))
    key = (octant << 29) | (morton >> 1)
    key = jnp.where(tmax <= tmin, jnp.uint32(0xFFFFFFFF), key)
    n = org.shape[0]
    _, perm = jax.lax.sort_key_val(key, jnp.arange(n, dtype=jnp.int32))
    inv = jnp.zeros(n, jnp.int32).at[perm].set(jnp.arange(n, dtype=jnp.int32))
    return perm, inv


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
    tmin = jnp.broadcast_to(tmin, (n,)).astype(jnp.float32)
    tmax = jnp.broadcast_to(tmax, (n,)).astype(jnp.float32)
    sort = n >= 2 * PACKET
    if sort:
        perm, inv = _sort_perm(tables, org, d, tmin, tmax)
        org, d = org[perm], d[perm]
        tmin, tmax = tmin[perm], tmax[perm]
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
        in_specs=[smem1, full, full] + [ray_spec] * 8,
        out_specs=(ray_spec, ray_spec, ray_spec, ray_spec),
        out_shape=(shape, shape, shape, ishape),
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH + 1,), jnp.int32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(mask_arr, tables["pb_nodes"], tables["pb_leaves"], *rays)
    flat = lambda a: a.reshape(-1)[:n]
    out = tuple(flat(a) for a in out)
    if sort:
        out = tuple(a[inv] for a in out)
    return out


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
