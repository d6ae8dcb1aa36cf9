"""8-wide packet-BVH traversal (ops/pallas_bvh.py) vs brute-force oracle.

Runs the Pallas kernel in interpret mode on CPU: random triangle soups and
random rays, asserting identical closest-hit (t, prim) and any-hit results
against the fused Möller-Trumbore sweep of ops/intersect.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ignis_tpu.ops.bvh import build_bvh
from ignis_tpu.ops.intersect import intersect_closest
from ignis_tpu.ops.pallas_bvh import (
    MASK_SHADOW, build_packet_bvh, packet_bvh_any, packet_bvh_closest,
)


def _random_soup(n_tris, seed=0, spread=4.0):
    rng = np.random.default_rng(seed)
    c = rng.uniform(-spread, spread, (n_tris, 3)).astype(np.float32)
    v0 = c + rng.normal(0, 0.3, (n_tris, 3)).astype(np.float32)
    e1 = rng.normal(0, 0.5, (n_tris, 3)).astype(np.float32)
    e2 = rng.normal(0, 0.5, (n_tris, 3)).astype(np.float32)
    return v0, e1, e2


def _random_rays(n, seed=1, spread=6.0):
    rng = np.random.default_rng(seed)
    org = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return org, d


def _tables(v0, e1, e2, flags=None):
    bvh = build_bvh(v0, e1, e2)
    if flags is None:
        flags = np.full(v0.shape[0], 0xF, np.uint8)
    return build_packet_bvh(bvh, v0, e1, e2, flags)


@pytest.mark.parametrize("n_tris,n_rays", [(3, 64), (37, 256), (500, 1500)])
def test_closest_matches_brute(n_tris, n_rays):
    v0, e1, e2 = _random_soup(n_tris, seed=n_tris)
    org, d = _random_rays(n_rays, seed=n_rays)
    tmin = jnp.zeros(n_rays, jnp.float32)
    tmax = jnp.full(n_rays, 1e30, jnp.float32)

    tb, ub, vb, pb = map(np.asarray, intersect_closest(
        jnp.asarray(org), jnp.asarray(d), tmin, tmax,
        jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2)))
    tables = _tables(v0, e1, e2)
    tk, uk, vk, pk = map(np.asarray, packet_bvh_closest(
        tables, jnp.asarray(org), jnp.asarray(d), tmin, tmax,
        interpret=True))

    np.testing.assert_array_equal(pk, pb)
    hit = pb >= 0
    np.testing.assert_allclose(tk[hit], tb[hit], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(uk[hit], ub[hit], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(vk[hit], vb[hit], rtol=1e-4, atol=1e-5)


def test_any_hit_matches_brute():
    v0, e1, e2 = _random_soup(200, seed=9)
    org, d = _random_rays(700, seed=10)
    n = org.shape[0]
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, 3.0, jnp.float32)   # finite segments: some blocked

    _, _, _, pb = map(np.asarray, intersect_closest(
        jnp.asarray(org), jnp.asarray(d), tmin, tmax,
        jnp.asarray(v0), jnp.asarray(e1), jnp.asarray(e2)))
    tables = _tables(v0, e1, e2)
    blocked = np.asarray(packet_bvh_any(
        tables, jnp.asarray(org), jnp.asarray(d), tmin, tmax,
        mask_bit=MASK_SHADOW, interpret=True))
    np.testing.assert_array_equal(blocked, pb >= 0)


def test_visibility_mask_respected():
    # triangle 0 visible to shadow rays only, triangle 1 to camera only;
    # same quad-ish geometry stacked along z so closest differs per class
    v0 = np.float32([[-5, -5, 1], [-5, -5, 2]])
    e1 = np.float32([[10, 0, 0], [10, 0, 0]])
    e2 = np.float32([[0, 10, 0], [0, 10, 0]])
    flags = np.array([0x8, 0x1], np.uint8)   # shadow-only, camera-only
    tables = _tables(v0, e1, e2, flags)
    org = jnp.asarray(np.float32([[0, 0, 0]]))
    d = jnp.asarray(np.float32([[0, 0, 1]]))
    tmin = jnp.zeros(1, jnp.float32)
    tmax = jnp.full(1, 1e30, jnp.float32)

    t_cam, _, _, p_cam = packet_bvh_closest(tables, org, d, tmin, tmax,
                                            mask_bit=0x1, interpret=True)
    assert int(np.asarray(p_cam)[0]) == 1
    np.testing.assert_allclose(np.asarray(t_cam)[0], 2.0, rtol=1e-6)
    t_sh, _, _, p_sh = packet_bvh_closest(tables, org, d, tmin, tmax,
                                          mask_bit=0x8, interpret=True)
    assert int(np.asarray(p_sh)[0]) == 0
    np.testing.assert_allclose(np.asarray(t_sh)[0], 1.0, rtol=1e-6)


@pytest.mark.tpu
def test_packet_bvh_on_tpu_hardware():
    """Mosaic-compiled kernel (interpret=False) vs the brute oracle on the
    real chip — the rest of this file runs in interpret mode on CPU.

    Run with: IGNIS_TPU_TEST_TPU=1 python -m pytest -m tpu tests/test_pallas_bvh.py
    (the default suite pins the CPU backend via conftest)."""
    import os

    import jax
    if not os.environ.get("IGNIS_TPU_TEST_TPU"):
        pytest.skip("TPU hardware test (set IGNIS_TPU_TEST_TPU=1)")
    if jax.default_backend() != "tpu":
        pytest.skip("no TPU backend")
    v0, e1, e2 = _random_soup(6000, seed=3)
    pb = _tables(v0, e1, e2)
    tables = {k: jnp.asarray(v) for k, v in pb.items()}
    tables.update(tri_v0=jnp.asarray(v0), tri_e1=jnp.asarray(e1),
                  tri_e2=jnp.asarray(e2))
    org, d = _random_rays(2048, seed=4)
    tmin = jnp.zeros(org.shape[0], jnp.float32)
    tmax = jnp.full(org.shape[0], 1e30, jnp.float32)
    t, prim, u, v = packet_bvh_closest(
        tables, jnp.asarray(org), jnp.asarray(d), tmin, tmax)
    bt, bprim, bu, bv = intersect_closest(
        jnp.asarray(org), jnp.asarray(d), tmin, tmax,
        tables["tri_v0"], tables["tri_e1"], tables["tri_e2"])
    hit = np.asarray(bprim) >= 0
    assert (np.asarray(prim) >= 0).sum() == hit.sum()
    np.testing.assert_array_equal(np.asarray(prim), np.asarray(bprim))
    np.testing.assert_allclose(np.asarray(t)[hit], np.asarray(bt)[hit],
                               rtol=1e-5)
