#!/usr/bin/env python3
"""Differential-timing TPU probe: one measurement per process.

The axon tunnel adds large, variable per-dispatch overhead, and
block_until_ready has been observed to return early (the r1-r3 bench
inflation).  Protocol here:

  * every rep feeds a slightly different input, chained on the previous
    rep's output (defeats any relay caching / CSE / elision),
  * the timed region ends with an np.asarray of real result bytes,
  * throughput = marginal time between two rep counts (cancels fixed
    dispatch overhead): (t_hi - t_lo) / (hi - lo).

Usage: python tools/tpu_probe.py MODE
Modes: ga, ga_oh, surf, pi, pi16, rw, bw, bw16, scan  (see below)
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

SCENE = Path("/root/reference/scenes/diamond_scene.json")


def diff_time(body, lo=2, hi=12):
    """body(i, carry_f32_scalar) -> carry, traced.  The rep loop runs
    INSIDE one jit (lax.fori_loop), so per-dispatch tunnel overhead is a
    single fixed cost; marginal device time/rep = (t_hi - t_lo)/(hi - lo).
    The carry chains reps (no elision); np.asarray forces completion."""
    import jax
    import jax.numpy as jnp

    def make(n):
        return jax.jit(lambda: jax.lax.fori_loop(
            0, n, body, jnp.float32(0.0)))

    f_lo, f_hi = make(lo), make(hi)

    def run(f):
        t0 = time.perf_counter()
        _ = np.asarray(f())
        return time.perf_counter() - t0

    run(f_lo)  # compile both before timing
    run(f_hi)
    t_lo = min(run(f_lo), run(f_lo))
    t_hi = min(run(f_hi), run(f_hi))
    return max((t_hi - t_lo) / (hi - lo), 1e-9), t_lo, t_hi


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
    rng = np.random.default_rng(0)
    T = int(tables["tri_v0"].shape[0])

    def rand_rays(n):
        org = jnp.asarray(rng.uniform(-3, 3, (n, 3)).astype(np.float32))
        d = rng.normal(0, 1, (n, 3)).astype(np.float32)
        d = jnp.asarray(d / np.linalg.norm(d, axis=1, keepdims=True))
        return org, d

    if mode in ("ga", "ga_oh"):
        n = 1 << 16
        prim = jnp.asarray(rng.integers(0, T, n).astype(np.int32))
        tv = tables["tri_v0"]
        iota = jnp.arange(T, dtype=jnp.int32)

        def body(i, c):
            p = (prim + i + (0.0 * c).astype(jnp.int32)) % T
            if mode == "ga":
                out = tv[p]
            else:
                oh = (p[:, None] == iota[None, :]).astype(jnp.bfloat16)
                out = jnp.dot(oh, tv.astype(jnp.bfloat16),
                              preferred_element_type=jnp.float32)
            return c + jnp.sum(out) * jnp.float32(1e-12)
        dt, tl, th = diff_time(body)
        print(json.dumps({"mode": mode, "mlanes_s": round(n / dt / 1e6, 2),
                          "us_per_call": round(dt * 1e6, 1)}), flush=True)
        return

    if mode == "surf":
        from ignis_tpu.render.integrator import _surface_at
        n = 1 << 16
        prim = jnp.asarray(rng.integers(0, T, n).astype(np.int32))
        org, d = rand_rays(n)
        t = jnp.ones((n,), jnp.float32)
        u = jnp.full((n,), 0.3, jnp.float32)
        v = jnp.full((n,), 0.3, jnp.float32)

        def body(i, c):
            p = (prim + i + (0.0 * c).astype(jnp.int32)) % T
            s = _surface_at(tables, p, org, d, t, u, v)
            return c + jnp.float32(1e-12) * (
                jnp.sum(s["point"]) + jnp.sum(s["n"]) + jnp.sum(s["tex"])
                + jnp.sum(s["mat_id"].astype(jnp.float32)))
        dt, tl, th = diff_time(body)
        print(json.dumps({"mode": mode, "mlanes_s": round(n / dt / 1e6, 2),
                          "ms_per_call": round(dt * 1e3, 2)}), flush=True)
        return

    if mode.startswith("pi") or mode.startswith("bw"):
        if mode.startswith("bw"):
            from ignis_tpu.ops.bw_intersect import bw_tables, bw_closest
            bw = {k: jnp.asarray(v) for k, v in bw_tables(
                np.asarray(tables["tri_v0"]), np.asarray(tables["tri_e1"]),
                np.asarray(tables["tri_e2"]),
                np.full((T,), 0xF, np.int64)).items()}
            kern = lambda o, dd, tmn, tmx: bw_closest(bw, o, dd, tmn, tmx)
        else:
            from ignis_tpu.ops.pallas_intersect import (
                pallas_intersect_closest)
            v0, e1, e2 = (tables["tri_v0"], tables["tri_e1"],
                          tables["tri_e2"])
            kern = lambda o, dd, tmn, tmx: pallas_intersect_closest(
                o, dd, tmn, tmx, v0, e1, e2)
        n = (1 << 16) if "16" in mode else (1 << 19)
        org, d = rand_rays(n)
        tmin = jnp.zeros(n, jnp.float32)
        tmax = jnp.full(n, 1e30, jnp.float32)

        def body(i, c):
            o2 = org + (0.0 * c + 1e-6 * i.astype(jnp.float32))
            t_, u_, v_, pr = kern(o2, d, tmin, tmax)
            return c + (jnp.sum(t_ * 0) + t_[0]) * jnp.float32(1e-6)
        dt, tl, th = diff_time(body)
        print(json.dumps({"mode": mode, "mrays_s": round(n / dt / 1e6, 2),
                          "ms_per_call": round(dt * 1e3, 2), "ntris": T}),
              flush=True)
        return

    if mode == "rw":
        from ignis_tpu.render.integrator import render_wavefront
        w = h = size
        npix = w * h
        idx = np.arange(npix, dtype=np.int64)
        pix = (idx % npix).astype(np.int32)
        wx = jnp.asarray(pix % w)
        wy = jnp.asarray(pix // w)
        ws = jnp.asarray((idx // npix).astype(np.uint32))

        def body(i, c):
            fb, st = render_wavefront(
                scene, tables, None, None, None,
                i.astype(jnp.uint32) + (0.0 * c).astype(jnp.uint32), jnp.uint32(0),
                0, capacity=65536, spi=1, work_mode="arith",
                work_total=npix)
            return c + jnp.sum(fb) * jnp.float32(1e-12)
        dt, tl, th = diff_time(body, lo=1, hi=4)
        print(json.dumps({"mode": mode,
                          "msps": round(npix / dt / 1e6, 3),
                          "ms_per_step": round(dt * 1e3, 1)}), flush=True)
        return

    if mode == "tlas1000":
        # 1000 instances of a 320-tri icosphere: end-to-end wavefront rate
        from ignis_tpu.api import Runtime as RT
        from ignis_tpu.render.integrator import render_wavefront
        rng2 = np.random.default_rng(4)
        ents = [{"name": "floor", "shape": "floor", "bsdf": "white"}]
        shapes2 = [{"type": "rectangle", "name": "floor", "width": 120,
                    "height": 120, "transform": [{"rotate": [-90, 0, 0]},
                                                 {"translate": [0, -1, 0]}]},
                   {"type": "icosphere", "name": "ball", "radius": 0.45,
                    "subdivisions": 2}]
        for i2 in range(1000):
            gx2, gz2 = i2 % 32, i2 // 32
            ents.append({"name": f"b{i2}", "shape": "ball", "bsdf": "white",
                         "transform": [{"translate": [
                             gx2 * 1.5 - 24.0,
                             float(rng2.uniform(0, 0.4)),
                             gz2 * 1.5 - 24.0]}]})
        sc2 = {"technique": {"type": "path", "max_depth": 4},
               "camera": {"type": "perspective", "fov": 60,
                          "transform": {"rotate": [30, 0, 0],
                                        "translate": [0, 14, -26]}},
               "film": {"size": [512, 512]},
               "bsdfs": [{"type": "diffuse", "name": "white",
                          "reflectance": [0.7, 0.7, 0.7]}],
               "shapes": shapes2, "entities": ents,
               "lights": [{"type": "env", "name": "sky",
                           "radiance": [1.0, 1.0, 1.0]}]}
        rt2 = RT(sc2)
        sc, tb = rt2.scene, rt2.tables
        ntl = int(tb["tl_inst"].shape[0])
        npx = sc.width * sc.height

        def body(i, c):
            fb, _ = render_wavefront(
                sc, tb, None, None, None,
                i.astype(jnp.uint32) + (0.0 * c).astype(jnp.uint32),
                jnp.uint32(0), 0, capacity=65536, spi=1,
                work_mode="arith", work_total=npx)
            return c + jnp.sum(fb) * jnp.float32(1e-12)
        dt, tl_, th_ = diff_time(body, lo=1, hi=3)
        rt2.step(spi=1)
        fin = bool(np.isfinite(rt2.currentFrame()).all())
        print(json.dumps({"mode": mode, "instances": ntl,
                          "pool_tris": int(tb["tl_tris"].shape[0]),
                          "soup_tris": int(tb["tri_v0"].shape[0]),
                          "msps": round(npx / dt / 1e6, 3),
                          "finite": fin}), flush=True)
        return

    if mode == "rwstub":
        # render_wavefront with traversal stubbed -> refill + shading +
        # scatter cost only; (rw - rwstub) isolates real traversal time
        import ignis_tpu.render.integrator as integ
        from ignis_tpu.render.integrator import render_wavefront
        rng3 = np.random.default_rng(9)
        Tn = int(tables["tri_v0"].shape[0])
        prim_fix = jnp.asarray(rng3.integers(0, Tn, 65536).astype(np.int32))

        def fake_closest(scene_, tables_, org, d, tmn, tmx, tri_mask,
                         mask_bit=None):
            nl = org.shape[0]
            z = (0.0 * org[:, 0]).astype(jnp.int32)
            t_ = 1.3 + 0.0 * org[:, 0]
            uu = jnp.full((nl,), 0.3, jnp.float32)
            return (t_, uu, uu, prim_fix[:nl] + z)

        def fake_any(scene_, tables_, org, d, tmn, tmx, tri_mask,
                     mask_bit=None):
            return (org[:, 0] * 0.0) > 1.0

        integ._traverse_closest = fake_closest
        integ._traverse_any = fake_any
        w = h = size
        npix = w * h

        def body(i, c):
            fb, _ = render_wavefront(
                scene, tables, None, None, None,
                i.astype(jnp.uint32) + (0.0 * c).astype(jnp.uint32),
                jnp.uint32(0), 0, capacity=65536, spi=1,
                work_mode="arith", work_total=npix)
            return c + jnp.sum(fb) * jnp.float32(1e-12)
        dt, tl_, th_ = diff_time(body, lo=1, hi=4)
        print(json.dumps({"mode": mode,
                          "msps_stubbed": round(npix / dt / 1e6, 3),
                          "ms_per_step": round(dt * 1e3, 1)}), flush=True)
        return

    if mode == "shade":
        # _bounce_core with traversal stubbed out: the pure shading cost
        # of one wave iteration at 65536 lanes
        import ignis_tpu.render.integrator as integ
        n = 1 << 16
        rng2 = np.random.default_rng(3)
        Tn = int(tables["tri_v0"].shape[0])
        prim_fix = jnp.asarray(rng2.integers(0, Tn, n).astype(np.int32))
        t_fix = jnp.full((n,), 1.3, jnp.float32)
        uvv = jnp.full((n,), 0.3, jnp.float32)

        def fake_closest(scene_, tables_, org, d, tmn, tmx, tri_mask,
                         mask_bit=None):
            z = (0.0 * org[:, 0]).astype(jnp.int32)
            return (t_fix + 0.0 * org[:, 0], uvv, uvv, prim_fix + z)

        def fake_any(scene_, tables_, org, d, tmn, tmx, tri_mask,
                     mask_bit=None):
            return (org[:, 0] * 0.0) > 1.0

        integ._traverse_closest = fake_closest
        integ._traverse_any = fake_any
        org, d = rand_rays(n)

        def body(i, c):
            st = dict(
                org=org + 1e-6 * i.astype(jnp.float32) + 0.0 * c,
                dir=d, tmin=jnp.zeros((n,), jnp.float32),
                tmax=jnp.full((n,), 1e30, jnp.float32),
                alive=jnp.ones((n,), bool),
                seed=jnp.full((n,), 7, jnp.uint32),
                counter=jnp.ones((n,), jnp.uint32),
                inv_pdf=jnp.zeros((n,), jnp.float32),
                contrib=jnp.ones((n, 3), jnp.float32),
                depth=jnp.ones((n,), jnp.int32),
                eta=jnp.ones((n,), jnp.float32),
                medium=jnp.full((n,), -1, jnp.int32),
                voldepth=jnp.zeros((n,), jnp.int32),
                nullfl=jnp.zeros((n,), bool),
            )
            splat, st2 = integ._bounce_core(scene, tables, st, None, None)
            return c + jnp.float32(1e-12) * (
                jnp.sum(splat) + jnp.sum(st2["contrib"]))
        dt, tl, th = diff_time(body, lo=2, hi=8)
        print(json.dumps({"mode": mode,
                          "mlanes_s": round(n / dt / 1e6, 2),
                          "ms_per_iter": round(dt * 1e3, 2)}), flush=True)
        return

    if mode in ("bigrw", "bigstub", "bigd1"):
        # big-scene step decomposition: full step (bigrw), traversal
        # stubbed (bigstub -> refill+shade+scatter cost), depth-1
        # (bigd1 -> camera+NEE only); differences isolate bounce cost
        from _big_bench import make_scene
        import ignis_tpu.render.integrator as integ
        from ignis_tpu.render.integrator import render_wavefront
        sc2 = make_scene()
        if mode == "bigd1":
            sc2["technique"]["max_depth"] = 1
        rt2 = Runtime(sc2, use_bvh=True)
        scene2, tables2 = rt2.scene, rt2.tables
        if mode == "bigstub":
            rng3 = np.random.default_rng(9)
            Tn = int(tables2["tri_v0"].shape[0])
            prim_fix = jnp.asarray(
                rng3.integers(0, Tn, 65536).astype(np.int32))

            def fake_closest(scene_, tables_, org, d, tmn, tmx, tri_mask,
                             mask_bit=None):
                nl = org.shape[0]
                z = (0.0 * org[:, 0]).astype(jnp.int32)
                t_ = 1.3 + 0.0 * org[:, 0]
                uu = jnp.full((nl,), 0.3, jnp.float32)
                return (t_, uu, uu, prim_fix[:nl] + z)

            def fake_any(scene_, tables_, org, d, tmn, tmx, tri_mask,
                         mask_bit=None):
                return (org[:, 0] * 0.0) > 1.0

            integ._traverse_closest = fake_closest
            integ._traverse_any = fake_any
        npix2 = scene2.width * scene2.height

        def body(i, c):
            fb, _ = render_wavefront(
                scene2, tables2, None, None, None,
                i.astype(jnp.uint32) + (0.0 * c).astype(jnp.uint32),
                jnp.uint32(0), 0, capacity=65536, spi=1,
                work_mode="arith", work_total=npix2)
            return c + jnp.sum(fb) * jnp.float32(1e-12)
        dt, tl_, th_ = diff_time(body, lo=1, hi=3)
        print(json.dumps({"mode": mode,
                          "msps": round(npix2 / dt / 1e6, 3),
                          "ms_per_step": round(dt * 1e3, 1)}), flush=True)
        return

    if mode == "scan":
        from ignis_tpu.render.integrator import trace_wave
        n = 1 << 19
        idx = np.arange(n, dtype=np.int32)
        x = jnp.asarray(idx % size)
        y = jnp.asarray((idx // size) % size)

        def body(i, c):
            out = trace_wave(
                scene, tables, x, y, jnp.uint32(0),
                i.astype(jnp.uint32) + (0.0 * c).astype(jnp.uint32), jnp.uint32(0),
                0, differentiable=True)
            return c + jnp.sum(out) * jnp.float32(1e-12)
        dt, tl, th = diff_time(body, lo=1, hi=4)
        print(json.dumps({"mode": mode, "msps": round(n / dt / 1e6, 3),
                          "ms_per_call": round(dt * 1e3, 1)}), flush=True)
        return

    raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
