"""Baldwin–Weber brute kernel vs the Möller–Trumbore oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from ignis_tpu.ops.bw_intersect import bw_tables, bw_closest, bw_any
from ignis_tpu.ops.intersect import intersect_any, intersect_closest


def _random_soup(t, seed=0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-2, 2, (t, 3)).astype(np.float32)
    e1 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    e2 = rng.uniform(-1, 1, (t, 3)).astype(np.float32)
    return v0, e1, e2


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    org = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


@pytest.mark.parametrize("t", [5, 100, 733])
def test_bw_closest_matches_mt(t):
    v0, e1, e2 = _random_soup(t)
    tab = {k: jnp.asarray(v) for k, v in
           bw_tables(v0, e1, e2, np.full(t, 0xF)).items()}
    n = 256
    org, d = _rays(n)
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, 1e30, jnp.float32)
    bt, bu, bv, bi = bw_closest(tab, org, d, tmin, tmax, interpret=True)
    rt, ru, rv, ri = intersect_closest(org, d, tmin, tmax,
                                       jnp.asarray(v0), jnp.asarray(e1),
                                       jnp.asarray(e2))
    bi, ri = np.asarray(bi), np.asarray(ri)
    bt, rt = np.asarray(bt), np.asarray(rt)
    # same hit/miss classification; near-tangent edge cases may differ on a
    # couple of rays due to the algebraically different predicates
    agree = bi == ri
    assert agree.mean() > 0.99, (bi[~agree], ri[~agree])
    np.testing.assert_allclose(bt[agree & (bi >= 0)], rt[agree & (ri >= 0)],
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(bu)[agree & (bi >= 0)],
                               np.asarray(ru)[agree & (ri >= 0)],
                               rtol=5e-3, atol=2e-3)


def test_bw_any_matches_mt():
    t = 200
    v0, e1, e2 = _random_soup(t, seed=3)
    tab = {k: jnp.asarray(v) for k, v in
           bw_tables(v0, e1, e2, np.full(t, 0xF)).items()}
    n = 512
    org, d = _rays(n, seed=4)
    tmin = jnp.full(n, 1e-3, jnp.float32)
    tmax = jnp.full(n, 2.5, jnp.float32)
    occ = bw_any(tab, org, d, tmin, tmax, interpret=True)
    ref = intersect_any(org, d, tmin, tmax, jnp.asarray(v0),
                        jnp.asarray(e1), jnp.asarray(e2))
    assert (np.asarray(occ) == np.asarray(ref)).mean() > 0.995


def test_bw_maskbits():
    t = 64
    v0, e1, e2 = _random_soup(t, seed=5)
    bits = np.full(t, 0xF)
    bits[::2] = 0x1  # half the soup camera-only
    tab = {k: jnp.asarray(v) for k, v in
           bw_tables(v0, e1, e2, bits).items()}
    n = 128
    org, d = _rays(n, seed=6)
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, 1e30, jnp.float32)
    _, _, _, pi_shadow = bw_closest(tab, org, d, tmin, tmax, mask_bit=0x8,
                                    interpret=True)
    pi_shadow = np.asarray(pi_shadow)
    hit = pi_shadow >= 0
    assert hit.any()
    assert np.all(pi_shadow[hit] % 2 == 1)  # even tris invisible to shadow


def test_bw_degenerate_triangles_never_hit():
    t = 16
    v0, e1, e2 = _random_soup(t, seed=7)
    e2[3] = e1[3]  # degenerate
    e1[9] = 0.0
    tab = {k: jnp.asarray(v) for k, v in
           bw_tables(v0, e1, e2, np.full(t, 0xF)).items()}
    n = 256
    org, d = _rays(n, seed=8)
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, 1e30, jnp.float32)
    _, _, _, pi = bw_closest(tab, org, d, tmin, tmax, interpret=True)
    pi = np.asarray(pi)
    assert not np.isin(pi, [3, 9]).any()


def test_bw_cluster_order_reports_original_ids():
    """SAH-order clustering must not change reported prim ids."""
    t = 300
    v0, e1, e2 = _random_soup(t, seed=11)
    rng = np.random.default_rng(12)
    order = rng.permutation(t)
    tab = {k: jnp.asarray(v) for k, v in
           bw_tables(v0, e1, e2, np.full(t, 0xF), order=order).items()}
    tab_id = {k: jnp.asarray(v) for k, v in
              bw_tables(v0, e1, e2, np.full(t, 0xF)).items()}
    n = 256
    org, d = _rays(n, seed=13)
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, 1e30, jnp.float32)
    a = bw_closest(tab, org, d, tmin, tmax, interpret=True)
    b = bw_closest(tab_id, org, d, tmin, tmax, interpret=True)
    assert (np.asarray(a[3]) == np.asarray(b[3])).mean() > 0.99
