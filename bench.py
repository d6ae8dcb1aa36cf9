#!/usr/bin/env python3
"""Benchmark: path-tracing throughput on diamond_scene (BASELINE.md metric).

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Metric: samples/sec/chip on diamond_scene.json forward render (a "sample" is
one full camera path incl. NEE shadow rays, the reference's Msamples/s unit
from igcli, src/frontend/cli/main.cpp:172-179).  The reference publishes no
numbers (BASELINE.md), so vs_baseline is reported against a fixed floor of
1.0 Msamples/s (igcli-on-CPU ballpark for this scene class).
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

SCENE = Path("/root/reference/scenes/diamond_scene.json")
BASELINE_MSPS = 1.0  # reference publishes nothing; fixed comparison floor


def main():
    import jax
    import jax.numpy as jnp

    from ignis_tpu.api import Runtime

    size = 512
    spi = 1
    if SCENE.exists():
        rt = Runtime(str(SCENE), width=size, height=size)
    else:
        from __graft_entry__ import _demo_scene
        rt = Runtime(_demo_scene(), width=size, height=size)

    # ---- forward throughput (wavefront renderer); steps are async so the
    # accumulation buffer is materialized inside the timed region
    rt.step(spi=1)  # warm-up (compile)
    jax.block_until_ready(rt._accum)
    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        rt.step(spi=spi)
    jax.block_until_ready(rt._accum)
    dt = time.perf_counter() - t0
    samples = size * size * spi * iters
    fwd_msps = samples / dt / 1e6
    img = rt.currentFrame()
    ok = bool(np.isfinite(img).all())

    # ---- forward+backward throughput (path-replay scan, grads w.r.t.
    # material colors) on a smaller wave; metric per BASELINE.json
    from ignis_tpu.render.integrator import trace_wave
    scene = rt.scene
    n = 1 << 15
    idx = np.arange(n, dtype=np.int32)
    x = jnp.asarray(idx % size)
    y = jnp.asarray((idx // size) % size)

    def loss(mc, tables):
        t = dict(tables)
        t["mat_colors"] = mc
        c = trace_wave(scene, t, x, y, jnp.uint32(0), jnp.uint32(0),
                       jnp.uint32(0), 0, differentiable=True)
        return jnp.sum(c)

    grad_fn = jax.jit(jax.grad(loss))
    g = grad_fn(rt.tables["mat_colors"], rt.tables)
    jax.block_until_ready(g)  # compile warm-up
    t0 = time.perf_counter()
    reps = 3
    for _ in range(reps):
        g = grad_fn(rt.tables["mat_colors"], rt.tables)
    jax.block_until_ready(g)
    dt_b = (time.perf_counter() - t0)
    fwdbwd_msps = n * reps / dt_b / 1e6
    grad_ok = bool(np.isfinite(np.asarray(g)).all())

    print(json.dumps({
        "metric": "diamond_scene samples/sec/chip (fwd+bwd)",
        "value": round(fwdbwd_msps, 4),
        "unit": "Msamples/s",
        "vs_baseline": round(fwdbwd_msps / BASELINE_MSPS, 4),
        "fwd_msps": round(fwd_msps, 4),
        "finite": ok,
        "grad_finite": grad_ok,
    }))


if __name__ == "__main__":
    main()
