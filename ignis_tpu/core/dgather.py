"""Differentiation-friendly row gathers for parameter tables.

`table[idx]` transposes to an XLA scatter-add, which the TPU backend
serializes when indices may collide — measured ~3500x slower than the
forward gather for the wavefront bounce programs.  `gather_rows` keeps the
forward gather but rewrites the VJP as a one-hot matmul (MXU work,
embarrassingly parallel): dtable = onehot(idx, M)^T @ g.

Intended for the *small* differentiable tables (materials, lights) where
M is at most a few thousand; the one-hot factor is chunked over the lane
dimension so peak memory stays bounded.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# max elements of the (chunk, M) one-hot factor materialized at once
_CHUNK_BUDGET = 1 << 24

# One-hot-matmul FORWARD thresholds: XLA's per-lane gather on TPU runs a
# serial scalar loop (~6 ns/row — measured 374 us for 65536 rows), while
# onehot(idx) @ table rides the MXU (~25-75 us).  Only worth it for small
# tables; Precision.HIGHEST keeps the f32 selection exact.
_OH_MAX_ROWS = 1024
_OH_MAX_COLS = 64


def _use_onehot(m, k, idx_ndim):
    ov = os.environ.get("IGNIS_TPU_ONEHOT_GATHER")
    if ov == "0":
        return False
    if ov == "1":
        return idx_ndim == 1 and m <= _OH_MAX_ROWS and k <= _OH_MAX_COLS
    return (jax.default_backend() == "tpu" and idx_ndim == 1
            and m <= _OH_MAX_ROWS and k <= _OH_MAX_COLS)


def _onehot_gather(table, idx):
    m = table.shape[0]
    k = 1
    for s in table.shape[1:]:
        k *= s
    # jnp index semantics: negatives wrap, out-of-range clamps
    ix = idx.astype(jnp.int32)
    ix = jnp.where(ix < 0, ix + m, ix)
    ix = jnp.clip(ix, 0, m - 1)
    iota = jnp.arange(m, dtype=jnp.int32)
    oh = (ix[:, None] == iota[None, :]).astype(jnp.float32)
    tf = table.reshape(m, k)
    if jnp.issubdtype(table.dtype, jnp.floating):
        src = tf.astype(jnp.float32)
    else:
        src = tf.astype(jnp.float32)  # ints/bools < 2^24 are exact in f32
    out = jnp.dot(oh, src, precision=jax.lax.Precision.HIGHEST)
    out = out.reshape((idx.shape[0],) + table.shape[1:])
    if jnp.issubdtype(table.dtype, jnp.floating):
        return out.astype(table.dtype)
    if table.dtype == jnp.bool_:
        return out > 0.5
    return jnp.round(out).astype(table.dtype)


@jax.custom_vjp
def gather_rows(table, idx):
    """table[idx] with an MXU-friendly transpose.  idx rows outside [0, M)
    contribute no gradient (forward clamps like jnp indexing).  On TPU the
    forward itself is a one-hot matmul for small tables (XLA's native
    gather serializes; measured 15x)."""
    if _use_onehot(table.shape[0], int(jnp.size(table) // max(
            table.shape[0], 1)), idx.ndim):
        return _onehot_gather(table, idx)
    return table[idx]


def _fwd(table, idx):
    # the table itself rides in the residuals only for its shape/dtype
    # (dtype objects are not valid pytree leaves)
    if _use_onehot(table.shape[0], int(jnp.size(table) // max(
            table.shape[0], 1)), idx.ndim):
        return _onehot_gather(table, idx), (idx, table)
    return table[idx], (idx, table)


def _bwd(res, g):
    idx, table = res
    tshape, tdtype = table.shape, table.dtype
    m = tshape[0]
    n = idx.shape[0]
    k = 1
    for s in g.shape[1:]:
        k *= s
    gf = g.reshape(n, k).astype(jnp.float32)
    iota = jnp.arange(m, dtype=jnp.int32)

    chunk = max(1, min(n, _CHUNK_BUDGET // max(m, 1)))
    if chunk >= n:
        oh = (idx[:, None].astype(jnp.int32) == iota[None, :])
        dt = jnp.einsum("nm,nk->mk", oh.astype(jnp.float32), gf)
    else:
        nchunks = -(-n // chunk)
        pad = nchunks * chunk - n
        idx_p = jnp.pad(idx.astype(jnp.int32), (0, pad), constant_values=-1)
        gf_p = jnp.pad(gf, ((0, pad), (0, 0)))

        def body(c, acc):
            i0 = c * chunk
            ic = jax.lax.dynamic_slice_in_dim(idx_p, i0, chunk)
            gc = jax.lax.dynamic_slice_in_dim(gf_p, i0, chunk)
            oh = (ic[:, None] == iota[None, :]).astype(jnp.float32)
            return acc + jnp.einsum("nm,nk->mk", oh, gc)

        dt = jax.lax.fori_loop(
            0, nchunks, body, jnp.zeros((m, k), jnp.float32))
    return dt.reshape(tshape).astype(tdtype), None


gather_rows.defvjp(_fwd, _bwd)
