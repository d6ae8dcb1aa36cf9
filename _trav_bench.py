"""Traversal-only microbench: rays/s of packet_bvh_closest at various
coherence levels, isolating the kernel from shading.

Honest protocol (see _bench_phase.py header): rep loop inside one jit
chained through a carry, forced transfer ends the timed region, marginal
(t_hi - t_lo) / (hi - lo) throughput."""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from ignis_tpu.api import Runtime
from ignis_tpu.ops.pallas_bvh import packet_bvh_closest
from _big_bench import make_scene


def _marginal(make, lo, hi):
    f_lo, f_hi = make(lo), make(hi)

    def run(f):
        t = time.perf_counter()
        _ = np.asarray(f())
        return time.perf_counter() - t

    run(f_lo)
    run(f_hi)
    t_lo = min(run(f_lo), run(f_lo))
    t_hi = min(run(f_hi), run(f_hi))
    if t_hi - t_lo < 1e-4:
        # marginal below dispatch noise: the kernel is too fast for this
        # rep spread — report None rather than a floor-divided artifact
        return None
    return (t_hi - t_lo) / (hi - lo)


def main():
    rt = Runtime(make_scene(), use_bvh=True)
    tables = rt.tables
    ntris = tables["tri_v0"].shape[0]
    n = 1 << 18
    rng = np.random.default_rng(0)

    # coherent: camera-like grid from one origin
    px = (np.arange(n) % 512) / 512.0 - 0.5
    py = (np.arange(n) // 512 % 512) / 512.0 - 0.5
    d_coh = np.stack([px, -0.5 + 0 * px, py + 1e-3], 1)
    d_coh /= np.linalg.norm(d_coh, axis=1, keepdims=True)
    o_coh = np.tile(np.float32([0, 8, -14]), (n, 1))

    # incoherent: random origins in the scene, random directions
    o_inc = rng.uniform(-6, 6, (n, 3)).astype(np.float32)
    d_inc = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d_inc /= np.linalg.norm(d_inc, axis=1, keepdims=True)

    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, 1e30, jnp.float32)

    for name, o, d in [("coherent", o_coh, d_coh),
                       ("incoherent", o_inc, d_inc)]:
        o = jnp.asarray(o, jnp.float32)
        d = jnp.asarray(d, jnp.float32)

        def make(reps):
            def body(i, c):
                t, u, v, p = packet_bvh_closest(
                    tables, o + c * jnp.float32(1e-12), d, tmin, tmax)
                return c + jnp.sum(t * 0.0) + jnp.float32(1e-12) * jnp.sum(
                    p.astype(jnp.float32))
            return jax.jit(lambda: jax.lax.fori_loop(
                0, reps, body, jnp.float32(0.0)))

        dt = _marginal(make, 1, 4)
        if dt is None:
            dt = _marginal(make, 2, 16)   # widen the spread and retry
        hits = np.asarray(packet_bvh_closest(tables, o, d, tmin, tmax)[3])
        print(json.dumps({"rays": name, "ntris": int(ntris),
                          "mrays_s": (round(n / dt / 1e6, 3)
                                      if dt else None),
                          "note": (None if dt else
                                   "below dispatch-noise floor"),
                          "hit_frac": round(float(np.mean(hits >= 0)), 3)}),
              flush=True)


if __name__ == "__main__":
    main()
