"""Analytic light-transport oracles.

Ported from the reference integrator suite (src/tests/integrator/
test_lights.py:5-44) but with the expected values re-derived against the
CURRENT reference light code: the bundled test constants divide point/spot
intensity by 4pi, while the shipped loaders pass `intensity` through as W/sr
(src/runtime/light/PointLight.cpp:33-52, docs/src/scene/lights.rst
"Intensity of the point light given in radiometric [W/sr]").  We follow the
code, so our oracles are the stale constants x 4pi — re-derived here by
numerical quadrature of the same closed-form integrals.

Scene: unit camera at (0,0,-1) looking +z with fov 90 onto a white lambertian
plane spanning [-1,1]^2 at z=0 (flat scene of the reference suite).
"""

import numpy as np
import pytest

from conftest import compute_scene_average, create_flat_scene


def _quad(fn, n=2000):
    """Average of fn(x, y) over [-1,1]^2 (plane-average of radiance)."""
    xs = (np.arange(n) + 0.5) / n * 2.0 - 1.0
    x, y = np.meshgrid(xs, xs)
    return float(np.mean(fn(x, y)))


def test_no_light():
    scene = create_flat_scene()
    value = compute_scene_average(scene, spp=1, size=64)
    assert value == pytest.approx(0, abs=1e-8)


def test_point_light():
    # L(x,y) = I * cos(theta_surf) / (pi * d^2); I = 1 W/sr,
    # cos = 2/d, d^2 = x^2+y^2+4 (delta light: NEE only, MIS weight 1).
    expected = _quad(lambda x, y: 2.0 / (np.pi * (x * x + y * y + 4.0) ** 1.5))
    scene = create_flat_scene()
    scene["lights"].append(
        {"type": "point", "name": "_light", "position": [0, 0, -2],
         "intensity": [1, 1, 1]})
    value = compute_scene_average(scene, spp=4, size=200)
    assert value == pytest.approx(expected, rel=3e-3)


def test_spot_light():
    # Spot adds the light-side cosine through the area-measure pdf
    # (light/spot.art:31-41: pdf=make_area_pdf(1), cos=-dot(dir, axis)):
    # L = I * cos_l * cos_surf / (pi d^2), cos_l = cos_surf = 2/d.
    # cutoff=falloff=45deg covers the whole plane (max angle < 45).
    expected = _quad(lambda x, y: 4.0 / (np.pi * (x * x + y * y + 4.0) ** 2))
    scene = create_flat_scene()
    scene["lights"].append(
        {"type": "spot", "name": "_light", "cutoff": 45, "falloff": 45,
         "position": [0, 0, -2], "direction": [0, 0, 1],
         "intensity": [1, 1, 1]})
    value = compute_scene_average(scene, spp=4, size=200)
    assert value == pytest.approx(expected, rel=3e-3)


def test_env_light_bsdf_sampling():
    # Furnace: white two-sided lambertian plane inside radiance-1 env.
    # With pure BSDF sampling (nee off) the estimator is exactly 1 per path.
    scene = create_flat_scene()
    scene["technique"]["nee"] = False
    scene["lights"].append(
        {"type": "env", "name": "_light", "radiance": [1, 1, 1]})
    value = compute_scene_average(scene, spp=2, size=64)
    assert value == pytest.approx(1, rel=1e-4)


def test_env_light_nee_one_sided():
    # DELIBERATE deviation from bsdf/diffuse.art:3 (absolute_cos): the
    # reference's two-sided lambertian eval collects the lower hemisphere
    # of the sphere-sampled env through the sheet (scene average 2), which
    # all three offline golden renderers contradict.  Our diffuse eval is
    # clamped to the shading hemisphere, so a unit-reflectance sheet under
    # a unit env converges to 1 (see union._diffuse_eval).
    scene = create_flat_scene()
    scene["lights"].append(
        {"type": "env", "name": "_light", "radiance": [1, 1, 1]})
    value = compute_scene_average(scene, spp=24, size=96)
    assert value == pytest.approx(1, rel=2e-2)


def test_two_sided_diffuse_constant_env_furnace():
    """Furnace: a diffuse sheet under a constant env converges to rho*L for
    BOTH estimator halves (BSDF-only and NEE+MIS) with the hemisphere
    clamp; the reference's absolute_cos eval would give ~2*rho under NEE
    (back-lit transmission through an opaque sheet)."""
    import json

    import numpy as np

    from ignis_tpu.api import load_scene
    base = {
        "technique": {"type": "path", "max_depth": 3},
        "camera": {"type": "perspective", "fov": 40,
                   "transform": [1, 0, 0, 0, 0, 0, 1, -5,
                                 0, -1, 0, 0, 0, 0, 0, 1]},
        "film": {"size": [24, 24]},
        "bsdfs": [{"type": "diffuse", "name": "m", "reflectance": 0.8}],
        "shapes": [{"type": "rectangle", "name": "p", "width": 60,
                    "height": 60, "transform": [{"rotate": [-90, 0, 0]}]}],
        "entities": [{"name": "p", "shape": "p", "bsdf": "m"}],
        "lights": [{"type": "constant", "name": "sky", "radiance": 1}],
    }
    vals = {}
    for nee in (False, True):
        sc = json.loads(json.dumps(base))
        sc["technique"]["nee"] = nee
        rt = load_scene(json.dumps(sc))
        for _ in range(24):
            rt.step(spi=4)
        img = np.asarray(rt.currentFrame())
        vals[nee] = float(img[8:16, 8:16, 0].mean())
    assert vals[False] == pytest.approx(0.8, rel=0.02)
    assert vals[True] == pytest.approx(0.8, rel=0.05)
