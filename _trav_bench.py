"""Traversal-only microbench: rays/s of packet_bvh_closest at various
coherence levels, isolating the kernel from shading."""
import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

from ignis_tpu.api import Runtime
from ignis_tpu.ops.pallas_bvh import packet_bvh_closest
from _big_bench import make_scene


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
    f = jax.jit(lambda o, d: packet_bvh_closest(tables, o, d, tmin, tmax))

    for name, o, d in [("coherent", o_coh, d_coh), ("incoherent", o_inc, d_inc)]:
        o = jnp.asarray(o, jnp.float32)
        d = jnp.asarray(d, jnp.float32)
        r = f(o, d)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(3):
            r = f(o, d)
        jax.block_until_ready(r)
        dt = time.perf_counter() - t0
        print(json.dumps({"rays": name, "ntris": int(ntris),
                          "mrays_s": round(n * 3 / dt / 1e6, 3),
                          "hit_frac": round(float(np.mean(np.asarray(r[3]) >= 0)), 3)}))


if __name__ == "__main__":
    main()
