#!/usr/bin/env python3
"""Benchmark: path-tracing throughput on diamond_scene (BASELINE.md metric).

Prints JSON lines of the form {"metric", "value", "unit", "vs_baseline"}.
The FORWARD line is printed as soon as it is measured so a timeout still
records a result; the final line is the headline fwd+bwd metric
(BASELINE.json: rays/sec/chip forward+backward on diamond_scene, depth 6,
NEE + env map — gate config 2).  A "sample" is one full camera path incl.
NEE shadow rays (the reference's Msamples/s unit from igcli,
src/frontend/cli/main.cpp:172-179).  The reference publishes no numbers
(BASELINE.md), so vs_baseline is reported against a fixed floor of
1.0 Msamples/s (igcli-on-CPU ballpark for this scene class).
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

SCENE = Path("/root/reference/scenes/diamond_scene.json")
BASELINE_MSPS = 1.0  # reference publishes nothing; fixed comparison floor


def _load_depth6(size):
    """diamond_scene pinned to the BASELINE gate config (depth 6)."""
    from ignis_tpu.api import Runtime
    from ignis_tpu.scene.parser import load_scene_dict
    if SCENE.exists():
        src = json.loads(SCENE.read_text())
        base = SCENE.parent
    else:
        from __graft_entry__ import _demo_scene
        src = json.loads(json.dumps(_demo_scene()))
        base = Path(".")
    src.setdefault("technique", {})["max_depth"] = 6
    return Runtime(load_scene_dict(src, base_dir=base),
                   width=size, height=size)


def main():
    t_start = time.perf_counter()
    import jax
    import jax.numpy as jnp

    # ---- packet-BVH big-scene forward (the Pallas kernel's driver-captured
    # number; brute force does not even compile at this scale — TRAVBENCH).
    # Runs in a SUBPROCESS, and FIRST — the TPU is single-tenant, so the
    # child must own the device before this process attaches it.  (Sharing
    # a process with the diamond programs was measured to produce a
    # ~700x-slower executable for this scene — same jaxpr, same idle
    # host; a fresh process reproducibly measures 370-530 Msamples/s,
    # matching TRAVBENCH.json.)
    big_msps = None
    try:
        import subprocess
        r = subprocess.run(
            [sys.executable, "_big_bench.py", "bvh"],
            capture_output=True, text=True, timeout=600,
            cwd=str(Path(__file__).parent))
        for line in r.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                rec = json.loads(line)
                big_msps = rec.get("msps")
                print(json.dumps({
                    "metric": f"packet-BVH {rec.get('ntris')}-tri scene (fwd)",
                    "value": round(big_msps, 4),
                    "unit": "Msamples/s",
                    "vs_baseline": round(big_msps / BASELINE_MSPS, 4),
                }), flush=True)
                break
    except Exception as e:  # noqa: BLE001 — bench must still record fwd+bwd
        print(json.dumps({"metric": "packet-BVH big scene", "error": str(e)[:200]}),
              flush=True)


    size = 512
    spi = 1
    rt = _load_depth6(size)
    t_load = time.perf_counter() - t_start

    # ---- forward throughput (wavefront renderer); steps are async so the
    # accumulation buffer is materialized inside the timed region
    t0 = time.perf_counter()
    rt.step(spi=1)  # warm-up (compile)
    jax.block_until_ready(rt._accum)
    t_compile_fwd = time.perf_counter() - t0
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        rt.step(spi=spi)
    jax.block_until_ready(rt._accum)
    dt = time.perf_counter() - t0
    samples = size * size * spi * iters
    fwd_msps = samples / dt / 1e6
    img = rt.currentFrame()
    ok = bool(np.isfinite(img).all())

    # a timeout downstream must still record the forward number
    print(json.dumps({
        "metric": "diamond_scene samples/sec/chip (fwd)",
        "value": round(fwd_msps, 4),
        "unit": "Msamples/s",
        "vs_baseline": round(fwd_msps / BASELINE_MSPS, 4),
        "finite": ok,
        "load_s": round(t_load, 1),
        "compile_fwd_s": round(t_compile_fwd, 1),
    }), flush=True)

    # ---- forward+backward throughput (path-replay scan, grads w.r.t.
    # material colors) — the BASELINE.json headline metric
    from ignis_tpu.render.integrator import trace_wave
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

    grad_fn = jax.jit(jax.grad(loss))
    t0 = time.perf_counter()
    g = grad_fn(rt.tables["mat_colors"], rt.tables)
    jax.block_until_ready(g)  # compile warm-up
    t_compile_bwd = time.perf_counter() - t0
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
        "bigscene_fwd_msps": round(big_msps, 4) if big_msps else None,
        "finite": ok,
        "grad_finite": grad_ok,
        "load_s": round(t_load, 1),
        "compile_fwd_s": round(t_compile_fwd, 1),
        "compile_bwd_s": round(t_compile_bwd, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
