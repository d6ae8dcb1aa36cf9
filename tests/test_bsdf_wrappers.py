"""Wrapper/modifier BSDF oracles: mix/blend, add, mask, cutoff, normalmap,
bumpmap, transform, twosided.

Semantics matched against the reference closure wrappers
(src/artic/bsdf/mix.art, map.art; src/runtime/bsdf/{BlendBSDF,MaskBSDF}.cpp;
loader/LoaderBSDF.cpp:82-151).  Oracles are the flat-scene point-light
quadrature of the integrator suite: for a lambertian plane with reflectance r,
the scene average is r * E where E = mean over the plane of
2 / (pi (x^2+y^2+4)^(3/2)); mix(a, b, k) evals to lerp, add to sum.
"""

import numpy as np
import pytest

from conftest import compute_scene_average, create_flat_scene


def _point_light_expected(refl=1.0):
    n = 2000
    xs = (np.arange(n) + 0.5) / n * 2.0 - 1.0
    x, y = np.meshgrid(xs, xs)
    return refl * float(np.mean(2.0 / (np.pi * (x * x + y * y + 4.0) ** 1.5)))


def _with_point_light(scene):
    scene["lights"].append(
        {"type": "point", "name": "_light", "position": [0, 0, -2],
         "intensity": [1, 1, 1]})
    return scene


def _set_ground(scene, bsdfs, ground_name):
    scene["bsdfs"] = bsdfs
    scene["entities"][0]["bsdf"] = ground_name
    return scene


def test_mix_weights_second_lobe():
    # mix(white, black, 0.25) -> eval = 0.75 * white (mix.art:10-13; the
    # weight k scales the SECOND lobe, BlendBSDF.cpp make_mix_bsdf order)
    scene = _with_point_light(create_flat_scene())
    _set_ground(scene, [
        {"type": "diffuse", "name": "white", "reflectance": [1, 1, 1]},
        {"type": "diffuse", "name": "black", "reflectance": [0, 0, 0]},
        {"type": "mix", "name": "ground", "first": "white",
         "second": "black", "weight": 0.25},
    ], "ground")
    value = compute_scene_average(scene, spp=4, size=200)
    assert value == pytest.approx(_point_light_expected(0.75), rel=5e-3)


def test_add_sums_lobes():
    # add(d(0.3), d(0.4)) -> eval = 0.7 * white (mix.art make_add_bsdf)
    scene = _with_point_light(create_flat_scene())
    _set_ground(scene, [
        {"type": "diffuse", "name": "a", "reflectance": [0.3, 0.3, 0.3]},
        {"type": "diffuse", "name": "b", "reflectance": [0.4, 0.4, 0.4]},
        {"type": "add", "name": "ground", "first": "a", "second": "b"},
    ], "ground")
    value = compute_scene_average(scene, spp=4, size=200)
    assert value == pytest.approx(_point_light_expected(0.7), rel=5e-3)


def test_mask_weight_is_transparency():
    # mask(bsdf, weight) = mix(bsdf, passthrough, weight) (MaskBSDF.cpp:38-47)
    # -> NEE eval drops by (1 - weight)
    scene = _with_point_light(create_flat_scene())
    _set_ground(scene, [
        {"type": "diffuse", "name": "inner", "reflectance": [1, 1, 1]},
        {"type": "mask", "name": "ground", "bsdf": "inner", "weight": 0.4},
    ], "ground")
    value = compute_scene_average(scene, spp=4, size=200)
    assert value == pytest.approx(_point_light_expected(0.6), rel=6e-3)


def test_mask_inverted():
    # inverted swaps the lobes: mix(passthrough, bsdf, weight)
    scene = _with_point_light(create_flat_scene())
    _set_ground(scene, [
        {"type": "diffuse", "name": "inner", "reflectance": [1, 1, 1]},
        {"type": "mask", "name": "ground", "bsdf": "inner", "weight": 0.4,
         "inverted": True},
    ], "ground")
    value = compute_scene_average(scene, spp=4, size=200)
    assert value == pytest.approx(_point_light_expected(0.4), rel=6e-3)


def test_cutoff_below_threshold_keeps_inner():
    # cutoff: k = select(weight < cutoff, 0, 1) (MaskBSDF.cpp:49-54)
    scene = _with_point_light(create_flat_scene())
    _set_ground(scene, [
        {"type": "diffuse", "name": "inner", "reflectance": [1, 1, 1]},
        {"type": "cutoff", "name": "ground", "bsdf": "inner",
         "weight": 0.3, "cutoff": 0.5},
    ], "ground")
    value = compute_scene_average(scene, spp=4, size=200)
    assert value == pytest.approx(_point_light_expected(1.0), rel=5e-3)


def test_cutoff_above_threshold_is_passthrough():
    scene = _with_point_light(create_flat_scene())
    _set_ground(scene, [
        {"type": "diffuse", "name": "inner", "reflectance": [1, 1, 1]},
        {"type": "cutoff", "name": "ground", "bsdf": "inner",
         "weight": 0.7, "cutoff": 0.5},
    ], "ground")
    value = compute_scene_average(scene, spp=2, size=64)
    assert value == pytest.approx(0.0, abs=1e-6)


def test_twosided_is_ignored_wrapper():
    # twosided -> IgnoreBSDF: serialize the inner bsdf unchanged
    scene = _with_point_light(create_flat_scene())
    _set_ground(scene, [
        {"type": "diffuse", "name": "inner", "reflectance": [1, 1, 1]},
        {"type": "twosided", "name": "ground", "bsdf": "inner"},
    ], "ground")
    value = compute_scene_average(scene, spp=4, size=200)
    assert value == pytest.approx(_point_light_expected(1.0), rel=5e-3)


def test_mix_furnace_estimator_consistency():
    # Furnace with BSDF sampling only: mix of two white diffuse lobes must
    # still integrate to exactly 1 per path — validates the one-sample MIS
    # combine (mix.art:33-47) leaves the estimator unbiased.
    scene = create_flat_scene()
    scene["technique"]["nee"] = False
    _set_ground(scene, [
        {"type": "diffuse", "name": "a", "reflectance": [1, 1, 1]},
        {"type": "diffuse", "name": "b", "reflectance": [1, 1, 1]},
        {"type": "mix", "name": "ground", "first": "a", "second": "b",
         "weight": 0.3},
    ], "ground")
    scene["lights"].append(
        {"type": "env", "name": "_light", "radiance": [1, 1, 1]})
    value = compute_scene_average(scene, spp=2, size=64)
    assert value == pytest.approx(1, rel=1e-4)


def test_normalmap_identity_normal_is_noop():
    # normal map (0.5, 0.5, 1) decodes to +z: shading frame unchanged
    scene = _with_point_light(create_flat_scene())
    _set_ground(scene, [
        {"type": "diffuse", "name": "inner", "reflectance": [1, 1, 1]},
        {"type": "normalmap", "name": "ground", "bsdf": "inner",
         "map": [0.5, 0.5, 1.0]},
    ], "ground")
    value = compute_scene_average(scene, spp=4, size=200)
    assert value == pytest.approx(_point_light_expected(1.0), rel=5e-3)


def test_bumpmap_constant_height_is_noop():
    # constant height field -> zero forward differences -> unperturbed normal
    scene = _with_point_light(create_flat_scene())
    scene["textures"] = [
        {"type": "constant", "name": "flat_h", "value": 0.25}]
    _set_ground(scene, [
        {"type": "diffuse", "name": "inner", "reflectance": [1, 1, 1]},
        {"type": "bumpmap", "name": "ground", "bsdf": "inner",
         "map": "flat_h"},
    ], "ground")
    value = compute_scene_average(scene, spp=4, size=200)
    assert value == pytest.approx(_point_light_expected(1.0), rel=5e-3)


def test_transform_tilted_normal_changes_shading():
    # normal-set to a 45-degree tilted normal: NEE cos term becomes
    # cos(theta') = dot(light_dir, n') per pixel; check against quadrature.
    tilt = np.float64([1.0, 0.0, -1.0])
    tilt /= np.linalg.norm(tilt)

    def integrand(x, y):
        d = np.stack([-x, -y, -2.0 * np.ones_like(x)], axis=-1)
        dist = np.linalg.norm(d, axis=-1)
        ldir = d / dist[..., None]
        cos_l = np.maximum(ldir @ tilt, 0.0)
        return cos_l / (np.pi * dist * dist)

    n = 2000
    xs = (np.arange(n) + 0.5) / n * 2.0 - 1.0
    gx, gy = np.meshgrid(xs, xs)
    expected = float(np.mean(integrand(gx, gy)))

    scene = _with_point_light(create_flat_scene())
    _set_ground(scene, [
        {"type": "diffuse", "name": "inner", "reflectance": [1, 1, 1]},
        {"type": "transform", "name": "ground", "bsdf": "inner",
         "normal": [float(tilt[0]), float(tilt[1]), float(tilt[2])]},
    ], "ground")
    value = compute_scene_average(scene, spp=4, size=200)
    assert value == pytest.approx(expected, rel=2e-2)
