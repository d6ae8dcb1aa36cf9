#!/usr/bin/env python3
"""Isolate why differentiable-scan forward is ~350x slower than production.

Times, in one fresh process (printed as JSON lines):
  backend            — jax.default_backend()
  scan_n16           — trace_wave differentiable=True, n=2^16
  while_n19          — trace_wave differentiable=False, n=2^19
  pallas_isect_n19   — pallas_intersect_closest alone at n=2^19 (if tpu)
  xla_isect_n19      — XLA intersect_closest alone at n=2^19
"""
import json
import time
from pathlib import Path

import numpy as np

SCENE = Path("/root/reference/scenes/diamond_scene.json")


def timeit(fn, *a, reps=3):
    import jax
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    import jax
    import jax.numpy as jnp
    from ignis_tpu.api import Runtime
    from ignis_tpu.scene.parser import load_scene_dict
    from ignis_tpu.render.integrator import trace_wave

    print(json.dumps({"backend": jax.default_backend()}), flush=True)

    src = json.loads(SCENE.read_text())
    src.setdefault("technique", {})["max_depth"] = 6
    size = 512
    rt = Runtime(load_scene_dict(src, base_dir=SCENE.parent),
                 width=size, height=size)
    scene = rt.scene
    tables = rt.tables

    def mk(n, diff):
        idx = np.arange(n, dtype=np.int32)
        x = jnp.asarray(idx % size)
        y = jnp.asarray((idx // size) % size)
        f = jax.jit(lambda t: trace_wave(scene, t, x, y, jnp.uint32(0),
                                         jnp.uint32(0), jnp.uint32(0), 0,
                                         differentiable=diff))
        return f, n

    for name, n, diff in [("scan_n16", 1 << 16, True),
                          ("while_n19", 1 << 19, False)]:
        f, nn = mk(n, diff)
        t0 = time.perf_counter()
        dt = timeit(f, tables)
        print(json.dumps({"mode": name, "msps": round(nn / dt / 1e6, 3),
                          "compile_s": round(time.perf_counter() - t0, 1)}),
              flush=True)

    # raw intersection kernels
    n = 1 << 19
    rng = np.random.default_rng(0)
    org = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, 1e30, jnp.float32)
    v0, e1, e2 = tables["tri_v0"], tables["tri_e1"], tables["tri_e2"]

    if jax.default_backend() == "tpu":
        from ignis_tpu.ops.pallas_intersect import pallas_intersect_closest
        f = jax.jit(lambda o, dd: pallas_intersect_closest(
            o, dd, tmin, tmax, v0, e1, e2))
        dt = timeit(f, org, d)
        print(json.dumps({"mode": "pallas_isect_n19",
                          "mrays_s": round(n / dt / 1e6, 3)}), flush=True)

    from ignis_tpu.ops.intersect import intersect_closest
    f = jax.jit(lambda o, dd: intersect_closest(o, dd, tmin, tmax, v0, e1, e2))
    dt = timeit(f, org, d)
    print(json.dumps({"mode": "xla_isect_n19",
                      "mrays_s": round(n / dt / 1e6, 3)}), flush=True)


if __name__ == "__main__":
    main()
