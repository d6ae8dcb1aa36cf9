#!/usr/bin/env python3
"""Isolated fwd+bwd measurement for the diamond gate (fresh-process probe).

Usage: python _grad_bench.py [mode]
  mode = "grad"    : jit(grad(loss)) timing            (the headline path)
         "fwd"     : jit(loss) timing (scan forward only, no AD)
         "vag"     : jit(value_and_grad(loss)) timing
Prints one JSON line {"mode", "msps", "compile_s"}.
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

SCENE = Path("/root/reference/scenes/diamond_scene.json")


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "grad"
    import jax
    import jax.numpy as jnp
    from ignis_tpu.api import Runtime
    from ignis_tpu.scene.parser import load_scene_dict
    from ignis_tpu.render.integrator import trace_wave

    src = json.loads(SCENE.read_text())
    src.setdefault("technique", {})["max_depth"] = 6
    size = 512
    rt = Runtime(load_scene_dict(src, base_dir=SCENE.parent),
                 width=size, height=size)
    scene = rt.scene

    n = 1 << 19
    idx = np.arange(n, dtype=np.int32)
    x = jnp.asarray(idx % size)
    y = jnp.asarray((idx // size) % size)

    def loss(mc, tables):
        t = dict(tables)
        t["mat_colors"] = mc
        c = trace_wave(scene, t, x, y, jnp.uint32(0), jnp.uint32(0),
                       jnp.uint32(0), 0, differentiable=True)
        return jnp.sum(c)

    if mode == "fwd":
        fn = jax.jit(loss)
    elif mode == "vag":
        fn = jax.jit(jax.value_and_grad(loss))
    else:
        fn = jax.jit(jax.grad(loss))

    t0 = time.perf_counter()
    out = fn(rt.tables["mat_colors"], rt.tables)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    reps = 5
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(rt.tables["mat_colors"], rt.tables)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    msps = n * reps / dt / 1e6
    leaves = jax.tree_util.tree_leaves(out)
    finite = all(bool(np.isfinite(np.asarray(l)).all()) for l in leaves)
    print(json.dumps({"mode": mode, "msps": round(msps, 4),
                      "compile_s": round(compile_s, 1),
                      "finite": finite}), flush=True)


if __name__ == "__main__":
    main()
