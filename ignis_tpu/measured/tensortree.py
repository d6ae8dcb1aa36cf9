"""Tensor-tree measured BSDF loader + batched evaluation.

Loader ports src/runtime/measured/TensorTreeLoader.cpp: Radiance TensorTree3/4
XML with Shirley-Chiu parameterized adaptive quad/oct trees, flattened to a
node int array (inner: child block start; leaf: -(value offset)-1) and a value
float array (negative sign bit = single-value leaf).

Evaluation ports src/artic/bsdf/tensortree.art: per-lane tree climb as a
bounded loop with masked descent — the flattened breadth-first layout keeps
the gathers coherent (SURVEY.md §7.3 "measured-BSDF gather locality").
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

_MAX_DEPTH = 16


def _strip_ns(tag):
    return tag.split("}")[-1]


def _find(el, name):
    for c in el.iter():
        if _strip_ns(c.tag) == name:
            return c
    return None


def _findall(el, name):
    return [c for c in el.iter() if _strip_ns(c.tag) == name]


class _Node:
    __slots__ = ("children", "values")

    def __init__(self):
        self.children = []
        self.values = []

    def total(self, depth):
        area = 1.0 / (depth * (len(self.values) + len(self.children)))
        t = sum(c.total(depth + 1) for c in self.children)
        t += sum(np.pi * v * area for v in self.values)
        return t


def _parse_scatter(text, max_vals):
    root = _Node()
    stack = [root]
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "{":
            child = _Node()
            stack[-1].children.append(child)
            stack.append(child)
            i += 1
        elif c == "}":
            stack.pop()
            i += 1
        elif c in ", \t\r\n":
            i += 1
        else:
            node = stack[-1]
            while i < n and len(node.values) < max_vals:
                while i < n and text[i] in ", \t\r\n":
                    i += 1
                if i >= n or text[i] == "}":
                    break
                j = i
                while j < n and text[j] not in ", \t\r\n}{":
                    j += 1
                node.values.append(abs(float(text[i:j])))
                i = j
    return root


def _flatten(root, ndim):
    max_vals = 1 << ndim
    nodes = []
    values = []
    root_is_leaf = not root.children

    def add(node, parent_slot):
        if not node.children:
            off = len(values)
            if parent_slot is not None:
                nodes[parent_slot] = -(off + 1)
            if len(node.values) == 1:
                values.append(-abs(node.values[0]))  # signbit = single value
            else:
                values.extend(node.values)
        else:
            off = len(nodes)
            if parent_slot is not None:
                nodes[parent_slot] = off
            nodes.extend([0] * len(node.children))
            for i, ch in enumerate(node.children):
                add(ch, off + i)

    import sys
    old = sys.getrecursionlimit()
    sys.setrecursionlimit(100000)
    try:
        add(root, None)
    finally:
        sys.setrecursionlimit(old)
    if not nodes:
        nodes = [-1] * max_vals
    # use copysign to preserve -0.0 single-value leaves
    vals = np.asarray(values, np.float32) if values else np.asarray([-0.0], np.float32)
    return (np.asarray(nodes, np.int32), vals, root_is_leaf)


def load_tensortree_xml(path: str | Path):
    tree = ET.parse(path)
    root = tree.getroot()
    layer = _find(root, "Layer")
    datadef = _find(layer, "DataDefinition")
    struct = _find(datadef, "IncidentDataStructure").text.strip()
    ndim = 4 if struct == "TensorTree4" else 3
    max_vals = 1 << ndim

    comps = {}
    for wd in _findall(layer, "WavelengthData"):
        block = _find(wd, "WavelengthDataBlock")
        if block is None:
            continue
        scat = _find(block, "ScatteringData")
        if scat is None:
            continue
        proot = _parse_scatter(scat.text, max_vals)
        if len(proot.children) == 1:
            only = proot.children[0]
            proot.values, proot.children = only.values, only.children
        total = proot.total(1)
        nodes, values, root_is_leaf = _flatten(proot, ndim)
        comp = dict(nodes=nodes, values=values, root_is_leaf=root_is_leaf,
                    total=float(total), ndim=ndim)
        direction = (_find(block, "WavelengthDataDirection").text.strip()
                     if _find(block, "WavelengthDataDirection") is not None
                     else "Transmission Front")
        if direction == "Transmission Front":
            comps["back_transmission"] = comp
        elif direction in ("Scattering Back", "Reflection Back"):
            comps["front_reflection"] = comp
        elif direction == "Transmission Back":
            comps["front_transmission"] = comp
        else:
            comps["back_reflection"] = comp

    black = dict(nodes=np.full(max_vals, -1, np.int32),
                 values=np.asarray([-0.0], np.float32),
                 root_is_leaf=False, total=0.0, ndim=ndim)
    comps.setdefault("front_reflection", black)
    comps.setdefault("back_reflection", black)
    ft = comps.get("front_transmission")
    bt = comps.get("back_transmission")
    if bt is None or (ft is not None and bt["total"] <= 1e-7):
        bt = ft
    if ft is None or (bt is not None and ft["total"] <= 1e-7):
        ft = bt
    comps["front_transmission"] = ft or black
    comps["back_transmission"] = bt or black
    comps["ndim"] = ndim
    return comps


_COMP_ORDER = ("front_reflection", "front_transmission",
               "back_reflection", "back_transmission")


def tensortree_tables(comps, prefix):
    tables = {}
    info = {"totals": [comps[k]["total"] for k in _COMP_ORDER],
            "ndim": comps["ndim"],
            "root_is_leaf": [comps[k]["root_is_leaf"] for k in _COMP_ORDER]}
    for k in _COMP_ORDER:
        tables[f"{prefix}_{k}_nodes"] = comps[k]["nodes"]
        tables[f"{prefix}_{k}_vals"] = comps[k]["values"]
    return tables, info


def _concentric_disk_to_square(p):
    """concentric_disk_to_square (core/warp.art:24-41)."""
    x, y = p[..., 0], p[..., 1]
    quadrant = jnp.abs(x) > jnp.abs(y)
    r_sign = jnp.where(quadrant, x, y)
    r = jnp.copysign(jnp.sqrt(x * x + y * y), r_sign)
    phi = jnp.arctan2(y * jnp.sign(r_sign), x * jnp.sign(r_sign))
    c = 4.0 * phi / np.pi
    t = jnp.where(quadrant, c, 2.0 - c) * r
    a = jnp.where(quadrant, r, t)
    b = jnp.where(quadrant, t, r)
    return jnp.stack([(a + 1.0) * 0.5, (b + 1.0) * 0.5], axis=-1)


def tt_eval_component(tables, prefix, comp, info_idx, info, in_dir, out_dir):
    """tt_eval_component (tensortree.art:82-117), batched tree climb."""
    ndim = info["ndim"]
    nodes = tables[f"{prefix}_{comp}_nodes"]
    vals = tables[f"{prefix}_{comp}_vals"]
    root_is_leaf = info["root_is_leaf"][info_idx]

    out_pos = _concentric_disk_to_square(out_dir[..., :2])
    if ndim == 3:
        in_t = ((0.5 - 1.1920929e-07)
                - 0.5 * jnp.sqrt(in_dir[..., 0] ** 2 + in_dir[..., 1] ** 2))
        pos = jnp.stack([in_t, out_pos[..., 0], out_pos[..., 1],
                         jnp.zeros_like(in_t)], axis=-1)
    else:
        in_pos = _concentric_disk_to_square(-in_dir[..., :2])
        pos = jnp.stack([in_pos[..., 0], in_pos[..., 1],
                         out_pos[..., 0], out_pos[..., 1]], axis=-1)
    pos = jnp.clip(pos, 0.0, 1.0 - 1e-7)

    def grid_step(p):
        # tt_lookup_grid: child index from the high bit per dimension
        p2 = 2.0 * p[..., :ndim]
        t = (p2 >= 1.0).astype(jnp.int32)
        shifts = np.arange(ndim, dtype=np.int32)
        nidx = jnp.sum(t << shifts[None, :], axis=-1)
        rem = p2 - t.astype(jnp.float32)
        if ndim == 3:
            rem = jnp.concatenate([rem, p[..., 3:4]], axis=-1)
        return nidx, rem

    if root_is_leaf:
        v0 = vals[0]
        single = jnp.signbit(v0)
        nidx = _leaf_index(pos, ndim)
        return jnp.where(single, -v0, vals[jnp.clip(nidx, 0,
                                                    vals.shape[0] - 1)])

    def cond(state):
        _, _, done, _ = state
        return ~jnp.all(done)

    def body(state):
        node, p, done, leaf = state
        nidx, rem = grid_step(p)
        nv = nodes[jnp.clip(node + nidx, 0, nodes.shape[0] - 1)]
        is_leaf = nv < 0
        leaf = jnp.where(is_leaf & ~done, -nv - 1, leaf)
        node = jnp.where(is_leaf | done, node, nv)
        p = jnp.where(done[..., None], p, rem)
        done = done | is_leaf
        return node, p, done, leaf

    n = pos.shape[0]
    state = (jnp.zeros((n,), jnp.int32), pos, jnp.zeros((n,), bool),
             jnp.zeros((n,), jnp.int32))
    _, p_fin, _, leaf = jax.lax.while_loop(cond, body, state)

    lv = vals[jnp.clip(leaf, 0, vals.shape[0] - 1)]
    single = jnp.signbit(lv)
    nidx = _leaf_index(p_fin, ndim)
    full = vals[jnp.clip(leaf + nidx, 0, vals.shape[0] - 1)]
    return jnp.where(single, -lv, full)


def _leaf_index(pos, ndim):
    """tt_lookup_leaf with log2gr = 1 (tensortree.art:53-66).

    NOTE the shift order is reversed w.r.t. the grid lookup: the loop walks
    dims high→low while incrementing the shift, so dim (ndim-1) lands in the
    lowest bits."""
    shifts = (np.arange(ndim, dtype=np.int32))[::-1].copy()
    comp = (2.0 * pos[..., :ndim]).astype(jnp.int32)
    return jnp.sum(comp << shifts[None, :], axis=-1)
