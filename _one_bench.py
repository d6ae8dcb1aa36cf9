#!/usr/bin/env python3
"""One measurement per process (the process-level executable anomaly makes
multi-measurement processes unreliable — see memory/tpu-axon-operations).

Usage: python _one_bench.py MODE
  rw    — production render_wavefront step timing + device wave stats
  tw    — trace_wave differentiable=False, n=2^19
  scan  — trace_wave differentiable=True, n=2^19
  pi    — pallas_intersect_closest alone, n=2^19
  pi16  — pallas_intersect_closest alone, n=2^16
"""
import json
import sys
import time
from pathlib import Path

import numpy as np

SCENE = Path("/root/reference/scenes/diamond_scene.json")


def main():
    mode = sys.argv[1]
    import jax
    import jax.numpy as jnp
    from ignis_tpu.api import Runtime
    from ignis_tpu.scene.parser import load_scene_dict

    src = json.loads(SCENE.read_text())
    src.setdefault("technique", {})["max_depth"] = 6
    size = 512
    rt = Runtime(load_scene_dict(src, base_dir=SCENE.parent),
                 width=size, height=size)
    scene, tables = rt.scene, rt.tables

    if mode == "rw":
        rt.step(spi=1)
        jax.block_until_ready(rt._accum)
        s0 = np.asarray(rt._dev_stats).copy()
        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            rt.step(spi=1)
        jax.block_until_ready(rt._accum)
        dt = time.perf_counter() - t0
        s1 = np.asarray(rt._dev_stats)
        ds = s1 - s0
        msps = size * size * iters / dt / 1e6
        print(json.dumps({
            "mode": mode, "msps": round(float(msps), 3),
            "wave_iters": float(ds[0]), "lane_visits": float(ds[1]),
            "tail_iters": float(ds[2]),
            "ms_per_wave_iter": round(float(dt / max(float(ds[0] + ds[2]), 1) * 1e3), 3),
            "mean": float(np.mean(rt.currentFrame())),
        }), flush=True)
        return

    if mode == "rw1":
        # one synchronous render_wavefront call, timed standalone
        w, h = size, size
        npix = w * h
        total = npix
        idx = np.arange(total, dtype=np.int64)
        pix = (idx % npix).astype(np.int32)
        wx = jnp.asarray(pix % w)
        wy = jnp.asarray(pix // w)
        ws = jnp.asarray((idx // npix).astype(np.uint32))
        cap = 65536
        f = lambda it: rt._render_wavefront(
            tables, wx, wy, ws, jnp.uint32(it), jnp.uint32(0), 0,
            capacity=cap, spi=1)
        fb, st = f(0)
        jax.block_until_ready(fb)
        t0 = time.perf_counter()
        fb2, st2 = f(1)
        jax.block_until_ready((fb2, st2))
        dt = time.perf_counter() - t0
        print(json.dumps({
            "mode": mode, "msps": round(total / dt / 1e6, 3),
            "dt_ms": round(dt * 1e3, 2),
            "stats": [float(v) for v in np.asarray(st2)],
            "mean": float(np.mean(np.asarray(fb))) ,
        }), flush=True)
        return

    if mode in ("tw", "scan"):
        from ignis_tpu.render.integrator import trace_wave
        n = 1 << 19
        idx = np.arange(n, dtype=np.int32)
        x = jnp.asarray(idx % size)
        y = jnp.asarray((idx // size) % size)
        f = jax.jit(lambda t: trace_wave(
            scene, t, x, y, jnp.uint32(0), jnp.uint32(0), jnp.uint32(0), 0,
            differentiable=(mode == "scan")))
        out = f(tables)
        jax.block_until_ready(out)
        reps = 3
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(tables)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"mode": mode, "msps": round(n / dt / 1e6, 3),
                          "mean": float(jnp.mean(out))}), flush=True)
        return

    if mode == "surf":
        # _surface_at (12 per-lane gathers + surface math) at n=2^16
        from ignis_tpu.render.integrator import _surface_at
        n = 1 << 16
        rng = np.random.default_rng(0)
        prim = jnp.asarray(rng.integers(
            0, int(tables["tri_v0"].shape[0]), n).astype(np.int32))
        org = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
        d = rng.normal(0, 1, (n, 3)).astype(np.float32)
        d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
        t = jnp.ones((n,), jnp.float32)
        u = jnp.full((n,), 0.3, jnp.float32)
        v = jnp.full((n,), 0.3, jnp.float32)
        f = jax.jit(lambda p: _surface_at(tables, p, org, d, t, u, v))
        out = f(prim)
        jax.block_until_ready(out)
        reps = 10
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(prim)
            _ = float(jnp.sum(out["point"][0]))
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"mode": mode, "mlanes_s": round(n / dt / 1e6, 3),
                          "ms": round(dt * 1e3, 3)}), flush=True)
        return

    if mode == "ga":
        # a single (n,) gather from a (T,3) table — the primitive cost
        n = 1 << 16
        rng = np.random.default_rng(0)
        prim = jnp.asarray(rng.integers(
            0, int(tables["tri_v0"].shape[0]), n).astype(np.int32))
        tv = tables["tri_v0"]
        f = jax.jit(lambda p: tv[p])
        out = f(prim)
        jax.block_until_ready(out)
        reps = 20
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(prim)
            _ = float(jnp.sum(out[0]))
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"mode": mode, "mlanes_s": round(n / dt / 1e6, 3),
                          "us": round(dt * 1e6, 1)}), flush=True)
        return

    if mode.startswith("pb"):
        # packet-BVH closest on the diamond soup (force-build pb tables)
        from ignis_tpu.ops.bvh import build_bvh
        from ignis_tpu.ops.pallas_bvh import (build_packet_bvh,
                                              packet_bvh_closest)
        v0 = np.asarray(tables["tri_v0"])
        bvh = build_bvh(v0, np.asarray(tables["tri_e1"]),
                        np.asarray(tables["tri_e2"]))
        ent_flags = np.asarray(tables["ent_flags"])
        tri_flags = ent_flags[np.asarray(tables["tri_ent"])]
        pb = build_packet_bvh(bvh, tables["tri_v0"], tables["tri_e1"],
                              tables["tri_e2"], tri_flags)
        pb = {k: jnp.asarray(v) for k, v in pb.items()}
        n = (1 << 16) if "16" in mode else (1 << 19)
        rng = np.random.default_rng(0)
        if "c" in mode[2:]:  # pbc / pbc16: coherent camera-like grid
            px = (np.arange(n) % 512) / 512.0 - 0.5
            py = (np.arange(n) // 512 % 512) / 512.0 - 0.5
            dd = np.stack([px, py, np.full_like(px, 1.2)], 1)
            dd /= np.linalg.norm(dd, axis=1, keepdims=True)
            org = jnp.asarray(np.tile(np.float32([0, 0.5, -4]), (n, 1)))
            d = jnp.asarray(dd.astype(np.float32))
        else:
            org = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
            d = rng.normal(0, 1, (n, 3)).astype(np.float32)
            d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
        tmin = jnp.zeros(n, jnp.float32)
        tmax = jnp.full(n, 1e30, jnp.float32)
        f = jax.jit(lambda o, dd: packet_bvh_closest(pb, o, dd, tmin, tmax))
        out = f(org, d)
        jax.block_until_ready(out)
        reps = 5
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(reps):
            out = f(org, d)
            acc += float(jnp.sum(out[0] * 0))  # forced transfer each rep
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"mode": mode, "mrays_s": round(n / dt / 1e6, 3),
                          "nodes": int(pb["pb_nodes"].shape[0]),
                          "leaves": int(pb["pb_leaves"].shape[0])}),
              flush=True)
        return

    if mode.startswith("pi"):
        from ignis_tpu.ops.pallas_intersect import pallas_intersect_closest
        n = (1 << 16) if mode == "pi16" else (1 << 19)
        rng = np.random.default_rng(0)
        org = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
        d = rng.normal(0, 1, (n, 3)).astype(np.float32)
        d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
        tmin = jnp.zeros(n, jnp.float32)
        tmax = jnp.full(n, 1e30, jnp.float32)
        v0, e1, e2 = tables["tri_v0"], tables["tri_e1"], tables["tri_e2"]
        f = jax.jit(lambda o, dd: pallas_intersect_closest(
            o, dd, tmin, tmax, v0, e1, e2))
        out = f(org, d)
        jax.block_until_ready(out)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(org, d)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({"mode": mode, "mrays_s": round(n / dt / 1e6, 3),
                          "ntris": int(v0.shape[0])}), flush=True)
        return


if __name__ == "__main__":
    main()
