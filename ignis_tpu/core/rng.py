"""Counter-based RNG matching the reference renderer's sampling discipline.

The reference (src/artic/core/random.art:1-92) seeds each ray with an FNV-1a
hash of (sample, iter, frame, x, y, user_seed) and draws numbers with a
4-round TEA block cipher over (seed, counter++).  The counter is persisted
per-ray across bounces, which is exactly what makes bit-stable path replay
(and therefore replay-based backprop) possible.  We reproduce the same
construction with vectorized uint32 ops so that, given identical draw order,
our sample sequences match the reference bit-for-bit.

All functions are elementwise over arbitrary-shaped uint32 arrays and safe
under `jit`/`vmap`/`shard_map`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

_FNV_INIT = np.uint32(0x811C9DC5)
_FNV_PRIME = np.uint32(16777619)


def _u32(x):
    return jnp.asarray(x).astype(jnp.uint32)


def hash_init():
    return _FNV_INIT


def hash_combine(h, d):
    """FNV-1a over the 4 bytes of d (little-endian byte order as in the ref)."""
    h = _u32(h)
    d = _u32(d)
    h = (h * _FNV_PRIME) ^ (d & jnp.uint32(0xFF))
    h = (h * _FNV_PRIME) ^ ((d >> 8) & jnp.uint32(0xFF))
    h = (h * _FNV_PRIME) ^ ((d >> 16) & jnp.uint32(0xFF))
    h = (h * _FNV_PRIME) ^ ((d >> 24) & jnp.uint32(0xFF))
    return h


def create_seed(sample, iteration, frame, x, y, user):
    """Per-ray seed: FNV-1a of (sample, iter, frame, x, y, user).

    Mirrors create_random_seed (core/random.art:35-44).
    """
    h = hash_init()
    for d in (sample, iteration, frame, x, y, user):
        h = hash_combine(h, d)
    return h


def sample_tea_u32(v0, v1):
    """4-round TEA; returns v1 (core/random.art:16-25)."""
    v0 = _u32(v0)
    v1 = _u32(v1)
    total = jnp.uint32(0)
    for _ in range(4):
        total = total + jnp.uint32(0x9E3779B9)
        v0 = v0 + (((v1 << 4) + jnp.uint32(0xA341316C))
                   ^ (v1 + total)
                   ^ ((v1 >> 5) + jnp.uint32(0xC8013EA4)))
        v1 = v1 + (((v0 << 4) + jnp.uint32(0xAD90777D))
                   ^ (v0 + total)
                   ^ ((v0 >> 5) + jnp.uint32(0x7E95761E)))
    return v1


def next_u32(seed, counter):
    """Draw raw 32 bits; returns (bits, counter + 1)."""
    bits = sample_tea_u32(seed, counter)
    return bits, _u32(counter) + jnp.uint32(1)


def u32_to_f32(bits):
    """[0, 1) float from the top of the mantissa (core/random.art:66-71).

    Builds a float in [1, 2) from 23 mantissa bits and subtracts 1.
    """
    mant = (bits & jnp.uint32(0x7FFFFF)) | jnp.uint32(0x3F800000)
    return jax.lax.bitcast_convert_type(mant, jnp.float32) - jnp.float32(1.0)


def next_f32(seed, counter):
    bits, counter = next_u32(seed, counter)
    return u32_to_f32(bits), counter


def next_f32_n(seed, counter, n):
    """Draw n consecutive floats; returns (tuple of floats, counter)."""
    outs = []
    for _ in range(n):
        f, counter = next_f32(seed, counter)
        outs.append(f)
    return tuple(outs), counter


def next_u32_range(seed, counter, rng_range, active=None):
    """Uniform integer in [0, rng_range] inclusive, rejection-sampled.

    Mirrors next_u32_range (core/random.art:47-63): scaling-division with a
    redraw loop on the biased tail.  Vectorized: lanes that have already
    accepted stop advancing their counter.  `active` masks lanes that should
    not draw at all (their counter is untouched and result is 0).
    """
    rng_range = _u32(rng_range)
    if active is None:
        active = jnp.ones(jnp.shape(counter), dtype=bool)

    full = rng_range == jnp.uint32(0xFFFFFFFF)
    erange = rng_range + jnp.uint32(1)  # wraps to 0 when full; guarded below
    safe_erange = jnp.where(full, jnp.uint32(1), erange)
    scaling = jnp.uint32(0xFFFFFFFF) // safe_erange
    past = safe_erange * scaling

    def cond(state):
        _, _, pending = state
        return jnp.any(pending)

    def body(state):
        ret, ctr, pending = state
        bits = sample_tea_u32(seed, ctr)
        ret = jnp.where(pending, bits, ret)
        ctr = jnp.where(pending, ctr + jnp.uint32(1), ctr)
        pending = pending & (~full) & (ret >= past)
        return ret, ctr, pending

    ret0 = jnp.zeros(jnp.shape(counter), dtype=jnp.uint32)
    ret, counter, _ = jax.lax.while_loop(cond, body, (ret0, _u32(counter), active))
    value = jnp.where(full, ret, ret // scaling)
    return jnp.where(active, value, jnp.uint32(0)), counter


def next_i32(seed, counter, lo, hi, active=None):
    """Uniform int in [lo, hi] inclusive (core/random.art:73-75)."""
    rng_range = _u32(jnp.int32(hi) - jnp.int32(lo))
    v, counter = next_u32_range(seed, counter, rng_range, active)
    return v.astype(jnp.int32) + jnp.int32(lo), counter


def hash_rndf(seed_f32):
    """Deterministic [0,1) float keyed on a float (core/random.art:87-92)."""
    bits = jax.lax.bitcast_convert_type(jnp.asarray(seed_f32, jnp.float32), jnp.uint32)
    seed = hash_combine(hash_init(), bits)
    f, _ = next_f32(seed, jnp.uint32(1))
    return f
