"""BVH build (host, binned SAH) and batched stack traversal (XLA).

The reference builds spatial-split SAH BVHs with N-wide nodes
(src/runtime/bvh/, src/runtime/shape/TriMeshProvider.cpp:556-560) and
traverses them with SIMD packets (src/artic/traversal/mapping_cpu.art).  On
TPU the equivalent design is: a single-level world-space BVH over the flat
triangle soup (entity transforms are baked, so no two-level re-transform),
traversed by the whole ray wave in lockstep — each lane owns a short stack in
registers and every `while_loop` step does one node visit (slab test + leaf
batch intersection), fully masked with no data-dependent shapes.

Build: binned SAH (16 bins, largest axis, leaf<=4) — same cost model as the
reference's builders, minus spatial splits (TODO).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

LEAF_SIZE = 4
STACK_DEPTH = 48
N_BINS = 16


@dataclass
class BVH:
    node_min: np.ndarray    # (M, 3)
    node_max: np.ndarray    # (M, 3)
    node_left: np.ndarray   # (M,) child idx (inner) or tri start (leaf)
    node_right: np.ndarray  # (M,) child idx (inner); unused for leaf
    node_count: np.ndarray  # (M,) 0 = inner, >0 = leaf tri count
    tri_order: np.ndarray   # (T,) permutation into the original soup


def build_bvh(v0: np.ndarray, e1: np.ndarray, e2: np.ndarray,
              leaf_size: int = LEAF_SIZE) -> BVH:
    t = v0.shape[0]
    if t == 0:
        return BVH(np.zeros((1, 3), np.float32), np.zeros((1, 3), np.float32),
                   np.zeros(1, np.int32), np.zeros(1, np.int32),
                   np.zeros(1, np.int32), np.zeros(0, np.int32))
    p0, p1, p2 = v0, v0 + e1, v0 + e2
    tri_min = np.minimum(np.minimum(p0, p1), p2).astype(np.float32)
    tri_max = np.maximum(np.maximum(p0, p1), p2).astype(np.float32)
    cent = (tri_min + tri_max) * 0.5

    order = np.arange(t, dtype=np.int32)
    node_min, node_max = [], []
    node_left, node_right, node_count = [], [], []

    def new_node():
        node_min.append(None)
        node_max.append(None)
        node_left.append(0)
        node_right.append(0)
        node_count.append(0)
        return len(node_min) - 1

    stack = [(new_node(), 0, t)]
    while stack:
        ni, lo, hi = stack.pop()
        idx = order[lo:hi]
        bmin = tri_min[idx].min(axis=0)
        bmax = tri_max[idx].max(axis=0)
        node_min[ni] = bmin
        node_max[ni] = bmax
        n = hi - lo
        if n <= leaf_size:
            node_left[ni] = lo
            node_count[ni] = n
            continue

        c = cent[idx]
        cmin = c.min(axis=0)
        cmax = c.max(axis=0)
        ext = cmax - cmin
        axis = int(np.argmax(ext))
        if ext[axis] <= 1e-12:
            # degenerate spread: median split
            mid = n // 2
            part = np.argsort(c[:, axis], kind="stable")
            order[lo:hi] = idx[part]
            split = lo + mid
        else:
            # binned SAH
            scale = N_BINS * (1.0 - 1e-6) / ext[axis]
            bins = np.minimum(((c[:, axis] - cmin[axis]) * scale).astype(np.int32),
                              N_BINS - 1)
            counts = np.bincount(bins, minlength=N_BINS)
            bin_min = np.full((N_BINS, 3), np.inf, np.float32)
            bin_max = np.full((N_BINS, 3), -np.inf, np.float32)
            for b in range(N_BINS):
                sel = bins == b
                if counts[b]:
                    bin_min[b] = tri_min[idx[sel]].min(axis=0)
                    bin_max[b] = tri_max[idx[sel]].max(axis=0)
            # prefix/suffix areas
            lmin = np.minimum.accumulate(bin_min, axis=0)
            lmax = np.maximum.accumulate(bin_max, axis=0)
            rmin = np.minimum.accumulate(bin_min[::-1], axis=0)[::-1]
            rmax = np.maximum.accumulate(bin_max[::-1], axis=0)[::-1]
            lcnt = np.cumsum(counts)
            rcnt = np.cumsum(counts[::-1])[::-1]

            def area(mn, mx):
                d = np.maximum(mx - mn, 0)
                return d[:, 0] * d[:, 1] + d[:, 1] * d[:, 2] + d[:, 2] * d[:, 0]

            cost = (area(lmin, lmax)[:-1] * lcnt[:-1]
                    + area(rmin[1:], rmax[1:]) * rcnt[1:])
            cost = np.where((lcnt[:-1] == 0) | (rcnt[1:] == 0), np.inf, cost)
            best = int(np.argmin(cost))
            if not np.isfinite(cost[best]):
                mid = n // 2
                part = np.argsort(c[:, axis], kind="stable")
                order[lo:hi] = idx[part]
                split = lo + mid
            else:
                sel = bins <= best
                part = np.concatenate([np.nonzero(sel)[0], np.nonzero(~sel)[0]])
                order[lo:hi] = idx[part]
                split = lo + int(sel.sum())

        li = new_node()
        ri = new_node()
        node_left[ni] = li
        node_right[ni] = ri
        stack.append((ri, split, hi))
        stack.append((li, lo, split))

    return BVH(np.asarray(node_min, np.float32), np.asarray(node_max, np.float32),
               np.asarray(node_left, np.int32), np.asarray(node_right, np.int32),
               np.asarray(node_count, np.int32), order)


def bvh_tables(bvh: BVH, tables: dict) -> dict:
    """Attach node tables + BVH-ordered geometry copies.

    Shading arrays (tri_n*, tri_uv*, tri_ent, …) stay in ORIGINAL order so
    entity-contiguous ranges (area-light triangle spans,
    LoaderEntity-grouping semantics) keep working; traversal uses its own
    reordered v0/e1/e2 copies and maps hits back through bvh_tri_to_orig.
    """
    out = dict(tables)
    o = bvh.tri_order
    for k in ("tri_v0", "tri_e1", "tri_e2"):
        if k in tables and tables[k].shape[0] == o.shape[0]:
            out["bvh_" + k] = np.asarray(tables[k])[o]
        else:
            out["bvh_" + k] = np.zeros((max(1, o.shape[0]), 3), np.float32)
    out["bvh_node_min"] = bvh.node_min
    out["bvh_node_max"] = bvh.node_max
    out["bvh_node_left"] = bvh.node_left
    out["bvh_node_right"] = bvh.node_right
    out["bvh_node_count"] = bvh.node_count
    out["bvh_tri_to_orig"] = (o if o.size else np.zeros(1, np.int32))
    return out


def _slab(org, inv_d, tmin, tmax, bmin, bmax):
    t0 = (bmin - org) * inv_d
    t1 = (bmax - org) * inv_d
    tn = jnp.minimum(t0, t1)
    tf = jnp.maximum(t0, t1)
    near = jnp.maximum(jnp.max(tn, axis=-1), tmin)
    far = jnp.minimum(jnp.min(tf, axis=-1), tmax)
    return near, far, near <= far


def _leaf_intersect(tables, start, count, org, d, tmin, best_t, leaf_size):
    """Intersect up to leaf_size triangles at tri rows [start, start+count)."""
    from ignis_tpu.ops.intersect import _mt_block
    n = org.shape[0]
    offs = jnp.arange(leaf_size, dtype=jnp.int32)
    rows = start[:, None] + offs[None, :]              # (N, L)
    valid = offs[None, :] < count[:, None]
    rows = jnp.clip(rows, 0, tables["bvh_tri_v0"].shape[0] - 1)
    v0 = tables["bvh_tri_v0"][rows]                    # (N, L, 3)
    e1 = tables["bvh_tri_e1"][rows]
    e2 = tables["bvh_tri_e2"][rows]
    t, u, v, ok = _mt_row(org, d, tmin, best_t, v0, e1, e2)
    ok = ok & valid
    t_masked = jnp.where(ok, t, jnp.inf)
    j = jnp.argmin(t_masked, axis=1)
    lanes = jnp.arange(n)
    tj = t_masked[lanes, j]
    hit = tj < best_t
    return hit, tj, u[lanes, j], v[lanes, j], rows[lanes, j]


def _mt_row(org, direction, tmin, tmax, v0, e1, e2):
    """Möller–Trumbore with per-lane triangle batches (N, L, 3)."""
    # sign convention note: see ops/intersect.py _mt_block
    tol = jnp.float32(-1.1920928955078125e-07)
    o = org[:, None, :]
    d = direction[:, None, :]
    tn = jnp.cross(e1, e2)
    c = v0 - o
    r = jnp.cross(d, c)
    det = jnp.sum(tn * d, axis=-1)
    inv_det = jnp.where(det == 0.0, 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det))
    u = -jnp.sum(r * e2, axis=-1) * inv_det
    v = jnp.sum(r * e1, axis=-1) * inv_det
    w = 1.0 - u - v
    t = jnp.sum(c * tn, axis=-1) * inv_det
    ok = ((det != 0.0) & (u >= tol) & (v >= tol) & (w >= tol)
          & (t >= tmin[:, None]) & (t <= tmax[:, None]))
    return t, jnp.maximum(u, 0.0), jnp.maximum(v, 0.0), ok


def bvh_closest(tables, org, d, tmin, tmax, tri_mask=None,
                leaf_size=LEAF_SIZE, stack_depth=STACK_DEPTH):
    """Closest-hit via per-lane short-stack traversal.

    Returns (t, u, v, prim_row) in REORDERED rows; -1 for miss.
    """
    n = org.shape[0]
    inv_d = jnp.where(d == 0.0, jnp.float32(1e30), 1.0 / jnp.where(d == 0.0, 1.0, d))

    stack = jnp.zeros((n, stack_depth), jnp.int32)
    sp = jnp.ones((n,), jnp.int32)  # root pushed at slot 0

    best_t = jnp.broadcast_to(tmax, (n,)).astype(jnp.float32)
    best_u = jnp.zeros((n,), jnp.float32)
    best_v = jnp.zeros((n,), jnp.float32)
    best_i = jnp.full((n,), -1, jnp.int32)

    node_min = tables["bvh_node_min"]
    node_max = tables["bvh_node_max"]
    node_left = tables["bvh_node_left"]
    node_right = tables["bvh_node_right"]
    node_count = tables["bvh_node_count"]

    to_orig = tables["bvh_tri_to_orig"]
    if tri_mask is not None:
        tri_mask = jnp.asarray(tri_mask)[to_orig]  # reordered-space mask

    def cond(s):
        return jnp.any(s[0] > 0)

    def body(s):
        sp, stack, best_t, best_u, best_v, best_i = s
        active = sp > 0
        top = jnp.maximum(sp - 1, 0)
        node = stack[jnp.arange(n), top]
        sp = jnp.where(active, sp - 1, sp)

        bmin = node_min[node]
        bmax = node_max[node]
        near, far, box_hit = _slab(org, inv_d, tmin, best_t, bmin, bmax)
        box_hit = box_hit & active

        count = node_count[node]
        is_leaf = count > 0
        left = node_left[node]
        right = node_right[node]

        # ---- leaf: batched triangle tests
        do_leaf = box_hit & is_leaf
        lhit, lt, lu, lv, lrow = _leaf_intersect(
            tables, left, jnp.where(do_leaf, count, 0), org, d, tmin, best_t,
            leaf_size)
        if tri_mask is not None:
            lhit = lhit & tri_mask[jnp.clip(lrow, 0, tri_mask.shape[0] - 1)]
        best_u = jnp.where(lhit, lu, best_u)
        best_v = jnp.where(lhit, lv, best_v)
        best_i = jnp.where(lhit, lrow, best_i)
        best_t = jnp.where(lhit, lt, best_t)

        # ---- inner: push children, near child on top
        do_inner = box_hit & ~is_leaf
        lnear, _, lhitb = _slab(org, inv_d, tmin, best_t, node_min[left], node_max[left])
        rnear, _, rhitb = _slab(org, inv_d, tmin, best_t, node_min[right], node_max[right])
        left_first = lnear <= rnear
        first = jnp.where(left_first, left, right)
        second = jnp.where(left_first, right, left)
        first_hit = jnp.where(left_first, lhitb, rhitb) & do_inner
        second_hit = jnp.where(left_first, rhitb, lhitb) & do_inner

        # push far (second) then near (first) so near pops first
        lanes = jnp.arange(n)
        slot = jnp.minimum(sp, stack_depth - 1)
        stack = stack.at[lanes, slot].set(
            jnp.where(second_hit, second, stack[lanes, slot]))
        sp = jnp.where(second_hit, jnp.minimum(sp + 1, stack_depth), sp)
        slot = jnp.minimum(sp, stack_depth - 1)
        stack = stack.at[lanes, slot].set(
            jnp.where(first_hit, first, stack[lanes, slot]))
        sp = jnp.where(first_hit, jnp.minimum(sp + 1, stack_depth), sp)

        return sp, stack, best_t, best_u, best_v, best_i

    sp, stack, best_t, best_u, best_v, best_i = jax.lax.while_loop(
        cond, body, (sp, stack, best_t, best_u, best_v, best_i))
    prim = jnp.where(best_i >= 0, to_orig[jnp.maximum(best_i, 0)], -1)
    return best_t, best_u, best_v, prim


def bvh_any(tables, org, d, tmin, tmax, tri_mask=None,
            leaf_size=LEAF_SIZE, stack_depth=STACK_DEPTH):
    """Occlusion query: returns bool per lane.  Early-outs by clearing the
    lane's stack once any hit is found."""
    n = org.shape[0]
    inv_d = jnp.where(d == 0.0, jnp.float32(1e30), 1.0 / jnp.where(d == 0.0, 1.0, d))
    stack = jnp.zeros((n, stack_depth), jnp.int32)
    sp = jnp.ones((n,), jnp.int32)
    occluded = jnp.zeros((n,), bool)
    tmax_b = jnp.broadcast_to(tmax, (n,)).astype(jnp.float32)

    node_min = tables["bvh_node_min"]
    node_max = tables["bvh_node_max"]
    node_left = tables["bvh_node_left"]
    node_right = tables["bvh_node_right"]
    node_count = tables["bvh_node_count"]
    if tri_mask is not None:
        tri_mask = jnp.asarray(tri_mask)[tables["bvh_tri_to_orig"]]

    def cond(s):
        return jnp.any(s[0] > 0)

    def body(s):
        sp, stack, occluded = s
        active = (sp > 0) & ~occluded
        sp = jnp.where(occluded, 0, sp)  # drop remaining work for done lanes
        top = jnp.maximum(sp - 1, 0)
        node = stack[jnp.arange(n), top]
        sp = jnp.where(active, sp - 1, sp)

        bmin = node_min[node]
        bmax = node_max[node]
        _, _, box_hit = _slab(org, inv_d, tmin, tmax_b, bmin, bmax)
        box_hit = box_hit & active

        count = node_count[node]
        is_leaf = count > 0
        left = node_left[node]
        right = node_right[node]

        do_leaf = box_hit & is_leaf
        lhit, _, _, _, lrow = _leaf_intersect(
            tables, left, jnp.where(do_leaf, count, 0), org, d, tmin, tmax_b,
            leaf_size)
        if tri_mask is not None:
            lhit = lhit & tri_mask[jnp.clip(lrow, 0, tri_mask.shape[0] - 1)]
        occluded = occluded | lhit

        do_inner = box_hit & ~is_leaf
        lanes = jnp.arange(n)
        for child in (right, left):
            _, _, chit = _slab(org, inv_d, tmin, tmax_b,
                               node_min[child], node_max[child])
            push = do_inner & chit & ~occluded
            slot = jnp.minimum(sp, stack_depth - 1)
            stack = stack.at[lanes, slot].set(
                jnp.where(push, child, stack[lanes, slot]))
            sp = jnp.where(push, jnp.minimum(sp + 1, stack_depth), sp)

        return sp, stack, occluded

    sp, stack, occluded = jax.lax.while_loop(cond, body, (sp, stack, occluded))
    return occluded
