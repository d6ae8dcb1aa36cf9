"""Big-scene BVH-vs-brute-force timing on TPU (VERDICT item 1 done-criterion)."""
import json
import sys
import time

import numpy as np


def make_scene(n_spheres=25, subdiv=5):
    rng = np.random.default_rng(7)
    bsdfs = [{"type": "diffuse", "name": "white", "reflectance": [0.7, 0.7, 0.7]}]
    shapes, entities = [], []
    grid = int(np.ceil(np.sqrt(n_spheres)))
    for i in range(n_spheres):
        gx, gz = i % grid, i // grid
        c = [float(gx * 2.2 - grid), float(rng.uniform(0, 0.5)), float(gz * 2.2 - grid)]
        shapes.append({"type": "icosphere", "name": f"s{i}", "center": c,
                       "radius": 0.9, "subdivisions": subdiv})
        entities.append({"name": f"s{i}", "shape": f"s{i}", "bsdf": "white"})
    shapes.append({"type": "rectangle", "name": "floor", "width": 60, "height": 60,
                   "transform": {"rotate": [-90, 0, 0], "translate": [0, -1, 0]}})
    entities.append({"name": "floor", "shape": "floor", "bsdf": "white"})
    return {
        "technique": {"type": "path", "max_depth": 4},
        "camera": {"type": "perspective", "fov": 60,
                   "transform": {"rotate": [25, 0, 0], "translate": [0, 8, -14]}},
        "film": {"size": [512, 512]},
        "bsdfs": bsdfs, "shapes": shapes, "entities": entities,
        "lights": [{"type": "env", "name": "sky", "radiance": [1.0, 1.0, 1.0]}],
    }


def run(mode):
    import jax
    from ignis_tpu.api import Runtime
    scene = make_scene()
    rt = Runtime(scene, use_bvh=(mode == "bvh"))
    if mode == "brute":
        # strip the packet tables so the integrator falls back
        rt.tables = {k: v for k, v in rt.tables.items() if not k.startswith("pb_")}
        rt._render_wavefront = jax.jit(
            __import__("functools").partial(
                __import__("ignis_tpu.render.integrator", fromlist=["render_wavefront"]).render_wavefront,
                rt.scene), static_argnames=("capacity", "spi"))
    ntris = rt.tables["tri_v0"].shape[0]
    rt.step(spi=1)
    jax.block_until_ready(rt._accum)
    t0 = time.perf_counter()
    iters = 2
    for _ in range(iters):
        rt.step(spi=1)
    jax.block_until_ready(rt._accum)
    dt = time.perf_counter() - t0
    msps = 512 * 512 * iters / dt / 1e6
    img = rt.currentFrame()
    print(json.dumps({"mode": mode, "ntris": int(ntris), "msps": round(msps, 4),
                      "mean": float(np.mean(img)), "finite": bool(np.isfinite(img).all())}))


if __name__ == "__main__":
    run(sys.argv[1])
