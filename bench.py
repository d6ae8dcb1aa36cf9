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

    # warm-up (compile)
    rt.step(spi=1)

    iters = 3
    t0 = time.perf_counter()
    for _ in range(iters):
        rt.step(spi=spi)
    dt = time.perf_counter() - t0

    samples = size * size * spi * iters
    msps = samples / dt / 1e6
    img = rt.currentFrame()
    ok = bool(np.isfinite(img).all())

    print(json.dumps({
        "metric": "diamond_scene samples/sec/chip (fwd)",
        "value": round(msps, 4),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / BASELINE_MSPS, 4),
        "finite": ok,
    }))


if __name__ == "__main__":
    main()
