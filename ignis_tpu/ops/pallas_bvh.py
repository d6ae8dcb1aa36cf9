"""Pallas TPU packet BVH traversal — the speed-of-light traversal kernel.

TPU-first redesign of the reference's SIMD packet traversal
(src/artic/traversal/mapping_cpu.art:260-512): instead of per-lane stacks
(which force per-lane HBM gathers of node data — the reason the XLA
`ops/bvh.py` path is latency-bound), each packet of PACKET=1024 rays shares
ONE traversal stack held in SMEM scratch, and every box/triangle test runs
as a full-width (8, 128) VPU op over the whole packet.  Divergence costs
extra row visits (the packet traverses the union of its rays' paths) but
every visit is a handful of vector instructions — the classic packet-tracing
trade, which coherent camera/shadow waves win decisively.

The tree is EIGHT-wide (the reference collapses its binary SAH tree to
N-wide nodes the same way, src/runtime/shape/TriMeshProvider.cpp:556-560 /
bvh/NArityBvh.h): one row visit tests 8 child boxes or 8 triangles.

r5 redesign — the r4 kernel visited one row per while-loop trip and read
its 56+ operands as VMEM lane extracts, measured ~2500 cycles/visit (the
extract, not the math, was the visit).  This version:

* keeps ONE unified row table (inner nodes and leaves share the index
  space; lane 126 is the row-type flag), so a visit is a single fetch;
* pops a BATCH of up to PB_BATCH rows per trip and DMAs them VMEM->SMEM
  concurrently — SMEM scalar operands ride the scalar pipe for free
  against vector ops (the ops/bw_intersect lesson), and the batch overlaps
  the DMA latencies with each other and with the previous row's math;
* collapses stack-overflow handling into a batch throttle: when the stack
  passes half depth the batch narrows to 1 row (classic DFS, net growth
  <= 7 per trip), so pushes are NEVER dropped and deep trees stay correct.

Measured on the 512k-tri field scene (v5e, honest marginal timing):
coherent 5.8 -> 170 Mrays/s, incoherent 0.65 -> 1.72 Mrays/s vs the r4
kernel.  The coherent ~30x came in two steps: the SMEM-DMA visit
(5.8 -> 12) and discovering that the always-on ray sort's 12 permutation
gathers (~6 ns/lane serial on TPU) had been charging every call ~20 ms —
far above the actual traversal work of a coherent wave (sort is opt-in
now, and rides multi-operand lax.sort when on).  A single 636 reading
seen during development FAILED re-measurement (168.8/170.0) and was
rejected — the async-escape class the r4 timing audit exists for.  A
host simulation counts ~5 row visits per coherent 1024-ray packet vs
~1950 per incoherent packet: incoherent waves are genuinely visit-bound
(~350 cycles/visit), which is the union-of-paths cost, not overhead.  Negative results kept for the record: an
8-element packet-vote child ordering network (r4: -7% coherent, -29%
incoherent); replacing the 8 jnp.any reductions with a roll-based
OR-reduce to one lane extract (r5: -42% incoherent — Mosaic scalar
reductions are already cheap; operand delivery was the whole story);
PB_BATCH=8 (coherent +4%, incoherent -5%).

Host-side layout (built in `build_packet_bvh` from the binary SAH BVH of
ops/bvh.py), one dense (R, 128) f32 table so VMEM tiling wastes nothing:

* inner row — child c in [0,8): box slab at lanes [6c, 6c+6) as
  [min.xyz, max.xyz]; child row id at lane 64+c as an exact-integer float
  (MISSING_F = no child); lane 126 = 0.
* leaf row — 8 triangle records of 16 lanes:
  [v0.xyz, e1.xyz, e2.xyz, maskbits, orig_idx, pad x5]; degenerate fill
  has maskbits = 0; lane 126 = 1.  maskbits packs per-ray-class visibility
  (bit0 camera, bit1 light, bit2 bounce, bit3 shadow) from ent_flags so
  the kernel needs no per-lane gathers (LoaderEntity.cpp:123-131).

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
PB_BATCH = 4                  # rows popped + DMA'd per while-loop trip
STACK_DEPTH = 1024            # SMEM ints; throttle keeps sp < DEPTH always
MISSING_F = np.float32(-1e9)  # child-slot sentinel in the enc lane
TYPE_LANE = 126               # row-type flag lane: 0 = inner, 1 = leaf
# scoped-VMEM budget requested from Mosaic for the traversal kernel; the
# row table must fit here together with the double-buffered ray windows
# (v5e has 128 MB of VMEM total).
VMEM_LIMIT = 100 * 1024 * 1024

# ray-class bits for the packed per-triangle visibility mask — identical to
# the reference's ray flags (LoaderEntity.cpp:123-131) so a ray's flag value
# can be passed straight through as mask_bit.
MASK_CAMERA = 0x1
MASK_LIGHT = 0x2
MASK_BOUNCE = 0x4
MASK_SHADOW = 0x8


# --------------------------------------------------------------------- build
def build_packet_bvh(bvh, tri_v0, tri_e1, tri_e2, ent_flags_per_tri):
    """Collapse a binary `ops.bvh.BVH` into the unified 8-wide row table.

    Children of an 8-wide node are gathered by repeatedly expanding the
    largest-subtree inner child; subtrees of <= 8 triangles collapse into a
    single 8-triangle leaf row (their tri_order range is contiguous by
    construction of the recursive SAH partition).

    ent_flags_per_tri: (T,) uint8 of reference visibility flags
    (camera=0x1, light=0x2, bounce=0x4, shadow=0x8) per ORIGINAL triangle.
    Returns dict of numpy arrays (pb_rows, pb_bounds, pb_depth).
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

    # rows: list of ("inner", entries) | ("leaf", tri_index_array); inner
    # and leaf rows SHARE one index space (unified table)
    rows = []
    depth_of = {0: 1}   # 8-wide row depth (root = 1); single-row trees = 1

    def make_leaf(b):
        lo, n = int(start[b]), int(size[b])
        rows.append(("leaf", order[lo:lo + n]))
        return np.float32(len(rows) - 1)

    if t == 0 or m == 0:
        rows.append(("inner", []))
    elif nc[0] > 0 or size[0] <= WIDTH:
        # whole tree is one leaf row: synthesize a root pointing at it
        rows.append(None)
        rows[0] = ("inner", [(nm[0], nx[0], make_leaf(0))])
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
            rows[row_of[b]] = ("inner", entries)

    tab = np.zeros((len(rows), LANES), np.float32)
    for ri, (kind, payload) in enumerate(rows):
        if kind == "inner":
            tab[ri, 64:64 + WIDTH] = MISSING_F
            for c, (bmin, bmax, enc) in enumerate(payload):
                tab[ri, 6 * c:6 * c + 3] = bmin
                tab[ri, 6 * c + 3:6 * c + 6] = bmax
                tab[ri, 64 + c] = enc
        else:
            tab[ri, TYPE_LANE] = 1.0
            for k, oi in enumerate(payload[:WIDTH]):
                oi = int(oi)
                o = 16 * k
                tab[ri, o:o + 3] = v0[oi]
                tab[ri, o + 3:o + 6] = e1[oi]
                tab[ri, o + 6:o + 9] = e2[oi]
                tab[ri, o + 9] = maskbits[oi] if maskbits.size else 7.0
                tab[ri, o + 10] = np.float32(oi)   # exact for oi < 2^24
            # record 7 pads end at lane 127; TYPE_LANE sits in that pad
            assert TYPE_LANE >= 16 * 7 + 11
    bounds = np.zeros(8, np.float32)
    if m:
        bounds[0:3] = nm[0]
        bounds[3:6] = nx[0]
    else:
        bounds[3:6] = 1.0
    return {"pb_rows": tab, "pb_bounds": bounds,
            "pb_depth": np.int32(max(depth_of.values()))}


def packet_tables_fit(tables) -> bool:
    """True when the row table fits the kernel's scoped-VMEM budget and a
    1-row-per-trip DFS of the tree fits the stack with throttle margin (the
    batch throttle narrows to 1 row past half depth; from there a DFS
    descent can still grow by 7*depth plus one batch worth of pushes).
    SAH trees of 512k tris are ~depth 8, nowhere near the bound."""
    b = tables["pb_rows"].size * 4
    if 7 * int(tables.get("pb_depth", 1)) + 1 > (STACK_DEPTH // 2
                                                 - 8 * PB_BATCH):
        return False
    return b <= VMEM_LIMIT - (8 << 20)   # headroom for ray windows


# -------------------------------------------------------------------- kernel
def _leaf_test(rd, mask_bit, ox, oy, oz, dx, dy, dz, tmn, best):
    """Intersect the packet against one leaf row; rd(i) yields lane i."""
    tol = jnp.float32(-1.1920928955078125e-07)
    bt, bu, bv, bi = best
    for k in range(WIDTH):
        o = k * 16
        v0x, v0y, v0z = rd(o + 0), rd(o + 1), rd(o + 2)
        e1x, e1y, e1z = rd(o + 3), rd(o + 4), rd(o + 5)
        e2x, e2y, e2z = rd(o + 6), rd(o + 7), rd(o + 8)
        mbits = rd(o + 9).astype(jnp.int32)
        oi = rd(o + 10).astype(jnp.int32)
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


def _traverse_kernel(mask_ref, rows_tab, ox, oy, oz, dx, dy,
                     dz, tmin, tmax, out_t, out_u, out_v, out_i, stack,
                     rows_s, sem, *, any_hit, use_dma):
    """Grid-free: ALL packets loop inside one kernel invocation.  A grid
    would re-stage the full row table per grid step (Mosaic pipelines
    non-blocked VMEM operands too) — measured 46 us/packet of pure HBM
    traffic on a 37 MB table, 16x the cost of a coherent packet's actual
    traversal.  One invocation stages the table once."""
    mask_bit = mask_ref[0]
    npackets = ox.shape[0] // SUBLANES

    def packet_body(p, _):
        _traverse_packet(p, mask_bit, rows_tab, ox, oy, oz, dx, dy, dz,
                         tmin, tmax, out_t, out_u, out_v, out_i, stack,
                         rows_s, sem, any_hit=any_hit, use_dma=use_dma)
        return 0

    jax.lax.fori_loop(0, npackets, packet_body, 0)


def _traverse_packet(p, mask_bit, rows_tab, ox, oy, oz, dx, dy, dz,
                     tmin, tmax, out_t, out_u, out_v, out_i, stack,
                     rows_s, sem, *, any_hit, use_dma):
    sl = pl.ds(p * SUBLANES, SUBLANES)
    o = (ox[sl, :], oy[sl, :], oz[sl, :])
    d = (dx[sl, :], dy[sl, :], dz[sl, :])
    big = jnp.float32(1e30)
    ix = jnp.where(d[0] == 0.0, big, 1.0 / jnp.where(d[0] == 0.0, 1.0, d[0]))
    iy = jnp.where(d[1] == 0.0, big, 1.0 / jnp.where(d[1] == 0.0, 1.0, d[1]))
    iz = jnp.where(d[2] == 0.0, big, 1.0 / jnp.where(d[2] == 0.0, 1.0, d[2]))
    tmn = tmin[sl, :]

    stack[0] = jnp.int32(0)

    def cond(carry):
        sp, bt, bu, bv, bi = carry
        if any_hit:
            return (sp > 0) & jnp.any((bi < 0) & (bt >= 0.0))
        return sp > 0

    def body(carry):
        sp, bt, bu, bv, bi = carry
        # batch throttle: past half depth narrow to 1 row/trip (classic
        # DFS, future growth <= 7*depth) so pushes are never dropped for
        # any tree packet_tables_fit admits; the per-push sp guard below
        # is a belt-and-braces backstop, not a correctness path
        batch = jnp.where(sp > STACK_DEPTH // 2,
                          jnp.int32(1), jnp.int32(PB_BATCH))
        k = jnp.minimum(sp, batch)
        nrows = rows_tab.shape[0]
        encs = []
        for j in range(PB_BATCH):
            # clamp: slots beyond k carry garbage (masked out downstream);
            # the clamp keeps speculative fetches in bounds
            e = jnp.clip(stack[jnp.maximum(sp - 1 - j, 0)], 0, nrows - 1)
            encs.append(e)
            if use_dma:
                @pl.when(j < k)
                def _start(j=j, e=e):
                    pltpu.make_async_copy(
                        rows_tab.at[pl.ds(e, 1), :],
                        rows_s.at[pl.ds(j, 1), :],
                        sem.at[j]).start()
        sp = sp - k

        for j in range(PB_BATCH):
            valid = j < k
            if use_dma:
                @pl.when(valid)
                def _wait(j=j, e=encs[j]):
                    pltpu.make_async_copy(
                        rows_tab.at[pl.ds(e, 1), :],
                        rows_s.at[pl.ds(j, 1), :],
                        sem.at[j]).wait()
                rd = lambda i, j=j: rows_s[j, i]
            else:
                fr = rows_tab[pl.ds(encs[j], 1), :]
                rd = lambda i, fr=fr: fr[0, i]
            is_leaf = rd(TYPE_LANE) > 0.5

            def leaf_fn(best, rd=rd):
                return _leaf_test(rd, mask_bit, *o, *d, tmn, best)

            bt, bu, bv, bi = jax.lax.cond(
                valid & is_leaf, leaf_fn, lambda b: b, (bt, bu, bv, bi))

            def inner_fn(rd=rd, bt=bt, bi=bi):
                # NOTE: children are pushed in build order, not
                # near-ordered.  A packet-vote ordering network measured
                # SLOWER on both coherent (-7%) and incoherent (-29%)
                # waves in r4 (the builder already emits children in SAH
                # partition order, which is spatially sorted).
                lim = bt
                act = (bi < 0) if any_hit else None
                anyh = []
                for c in range(WIDTH):
                    b = 6 * c
                    t0x = (rd(b + 0) - o[0]) * ix
                    t1x = (rd(b + 3) - o[0]) * ix
                    t0y = (rd(b + 1) - o[1]) * iy
                    t1y = (rd(b + 4) - o[1]) * iy
                    t0z = (rd(b + 2) - o[2]) * iz
                    t1z = (rd(b + 5) - o[2]) * iz
                    near = jnp.maximum(
                        jnp.maximum(jnp.minimum(t0x, t1x),
                                    jnp.minimum(t0y, t1y)),
                        jnp.maximum(jnp.minimum(t0z, t1z), tmn))
                    far = jnp.minimum(
                        jnp.minimum(jnp.maximum(t0x, t1x),
                                    jnp.maximum(t0y, t1y)),
                        jnp.minimum(jnp.maximum(t0z, t1z), lim))
                    hit = near <= far
                    if any_hit:
                        hit = hit & act
                    anyh.append(jnp.any(hit))
                return tuple(anyh)

            hits = jax.lax.cond(valid & jnp.logical_not(is_leaf), inner_fn,
                                lambda: (jnp.bool_(False),) * WIDTH)
            for c in range(WIDTH):
                ev = rd(64 + c)
                can = (hits[c] & (ev > (MISSING_F * 0.5))
                       & (sp < STACK_DEPTH))

                @pl.when(can)
                def _push(ev=ev, sp=sp):
                    stack[sp] = ev.astype(jnp.int32)
                sp = sp + can.astype(jnp.int32)
        return sp, bt, bu, bv, bi

    init = (jnp.int32(1), tmax[sl, :], jnp.zeros_like(tmn),
            jnp.zeros_like(tmn), jnp.full(tmn.shape, -1, jnp.int32))
    _, bt, bu, bv, bi = jax.lax.while_loop(cond, body, init)
    out_t[sl, :] = bt
    out_u[sl, :] = bu
    out_v[sl, :] = bv
    out_i[sl, :] = bi


# ---------------------------------------------------------------- ray sort
def _part1by2(x):
    """Spread 10 bits of x over 30 (standard 32-bit 3D morton expansion)."""
    x = x & jnp.uint32(0x3FF)
    x = (x | (x << 16)) & jnp.uint32(0x030000FF)
    x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x09249249)
    return x


def _coherence_key(tables, org, d, tmin, tmax):
    """Coherence sort key: direction octant (major) then 29-bit origin
    morton.  Bounce/shadow waves are direction- and origin-incoherent; the
    shared-stack packet traverses the UNION of its rays' node paths, so
    clustering rays cuts visits multiplicatively (mapping_cpu.art sorts by
    octant for the same reason).  Dead lanes (tmax <= tmin) key to the max
    so whole packets of terminated rays cost ONE root visit — on late
    bounce waves that alone halves the live packet count."""
    bmin = tables["pb_bounds"][0:3]
    ext = jnp.maximum(tables["pb_bounds"][3:6] - bmin, 1e-6)
    q = jnp.clip((org - bmin) / ext * 1023.0, 0.0, 1023.0).astype(jnp.uint32)
    morton = (_part1by2(q[:, 0]) | (_part1by2(q[:, 1]) << 1)
              | (_part1by2(q[:, 2]) << 2))
    octant = ((d[:, 0] < 0).astype(jnp.uint32)
              + 2 * (d[:, 1] < 0).astype(jnp.uint32)
              + 4 * (d[:, 2] < 0).astype(jnp.uint32))
    key = (octant << 29) | (morton >> 1)
    # (6 extra direction bits below the octant displaced origin-morton
    # bits and measured -20% incoherent — origin locality dominates once
    # the octant is fixed; negative result kept for the record)
    return jnp.where(tmax <= tmin, jnp.uint32(0xFFFFFFFF), key)


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


def _call(tables, org, d, tmin, tmax, mask_bit, any_hit, interpret=False,
          sort=False):
    # Traversal is non-differentiable by design (visibility discontinuities
    # are out of the parameter set, SURVEY.md §7.1); detaching the inputs
    # keeps reverse AD from requiring a pallas_call transpose.
    org, d, tmin, tmax = map(jax.lax.stop_gradient, (org, d, tmin, tmax))
    n = org.shape[0]
    tmin = jnp.broadcast_to(tmin, (n,)).astype(jnp.float32)
    tmax = jnp.broadcast_to(tmax, (n,)).astype(jnp.float32)
    # grid-free kernel holds all rays in VMEM at once; chunk huge batches
    # so rays (12 arrays * n * 4 B) stay well under the table's headroom
    chunk = 1 << 18
    if n > chunk:
        outs = [_call(tables, org[i:i + chunk], d[i:i + chunk],
                      tmin[i:i + chunk], tmax[i:i + chunk], mask_bit,
                      any_hit, interpret, sort)
                for i in range(0, n, chunk)]
        return tuple(jnp.concatenate([o[k] for o in outs])
                     for k in range(4))
    # Coherence sort rides MULTI-OPERAND lax.sort, NOT permutation
    # gathers.  An index-gather permutation is 12 serial TPU gathers
    # (~6 ns/lane; ~20 ms per 2^18-ray call) — r5 measured it dominating
    # every coherent call (12.5 -> 170 Mrays/s with it off).
    # lax.sort carrying the 8 ray columns + original index
    # (and a second 5-operand sort to restore output order) costs 0.13 ms
    # per 65536 rays on the same chip — the visit savings and dead-lane
    # clustering come essentially for free.
    if sort:
        cols = (org[:, 0], org[:, 1], org[:, 2],
                d[:, 0], d[:, 1], d[:, 2], tmin, tmax)
        cols = tuple(c.astype(jnp.float32) for c in cols)
        key = _coherence_key(tables, org, d, tmin, tmax)
        idx0 = jnp.arange(n, dtype=jnp.int32)
        srt = jax.lax.sort([key, idx0, *cols], num_keys=1)
        idx_s = srt[1]
        org = jnp.stack(srt[2:5], axis=1)
        d = jnp.stack(srt[5:8], axis=1)
        tmin, tmax = srt[8], srt[9]
    rays, rows = _prep(org, d, tmin, tmax, n)
    full = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec(memory_space=pltpu.SMEM)
    shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    ishape = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
    mask_arr = jnp.asarray(mask_bit, jnp.int32).reshape(1)

    out = pl.pallas_call(
        functools.partial(_traverse_kernel, any_hit=any_hit,
                          use_dma=not interpret),
        in_specs=[smem1, full] + [full] * 8,
        out_specs=(full, full, full, full),
        out_shape=(shape, shape, shape, ishape),
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH + 1,), jnp.int32),
                        pltpu.SMEM((PB_BATCH, LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA((PB_BATCH,))],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=VMEM_LIMIT),
        interpret=interpret,
    )(mask_arr, tables["pb_rows"], *rays)
    flat = lambda a: a.reshape(-1)[:n]
    out = tuple(flat(a) for a in out)
    if sort:
        # restore caller order by sorting outputs on the carried original
        # index (lax.sort handles mixed f32/int32 operand dtypes)
        back = jax.lax.sort([idx_s, *out], num_keys=1)
        out = tuple(back[1:])
    return out


def _auto_sort(sort, mask_bit, n):
    """Default policy: coherence-sort bounce/shadow waves (they carry
    dead lanes and scattered octants), skip static pure-camera waves
    (already coherent, no dead lanes — sorting is pure overhead there).
    A TRACED mask_bit means a regenerating wave that mixes fresh camera
    rays with bounces mid-iteration — those sort."""
    if sort is not None:
        return sort
    if n < 2 * PACKET:
        return False
    if isinstance(mask_bit, (int, np.integer)):
        return int(mask_bit) != MASK_CAMERA
    return True


def packet_bvh_closest(tables, org, d, tmin, tmax, mask_bit=MASK_BOUNCE,
                       interpret=False, sort=None):
    """Closest hit: (t, u, v, prim) with prim = ORIGINAL tri index, -1 miss."""
    t, u, v, i = _call(tables, org, d, tmin, tmax, mask_bit, any_hit=False,
                       interpret=interpret,
                       sort=_auto_sort(sort, mask_bit, org.shape[0]))
    return t, u, v, i


def packet_bvh_any(tables, org, d, tmin, tmax, mask_bit=MASK_SHADOW,
                   interpret=False, sort=None):
    """Occlusion query: True where any visible triangle blocks the segment."""
    _, _, _, i = _call(tables, org, d, tmin, tmax, mask_bit, any_hit=True,
                       interpret=interpret,
                       sort=_auto_sort(sort, mask_bit, org.shape[0]))
    return i >= 0
