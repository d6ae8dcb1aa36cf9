"""Pallas kernels under sharding (VERDICT r3 #6).

The production TPU path routes traversal through the Pallas kernels, but
the multi-device dryrun pins CPU where `_use_pallas` is off — so the
packet-BVH/bw kernels were never exercised under a sharded mesh.  These
tests run them in interpret mode inside `shard_map` over the virtual
8-device CPU mesh and assert the sharded result equals the unsharded one.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from ignis_tpu.ops.bvh import build_bvh
from ignis_tpu.ops.bw_intersect import bw_closest, bw_tables
from ignis_tpu.ops.pallas_bvh import (MASK_BOUNCE, build_packet_bvh,
                                      packet_bvh_closest)


def _soup(t=6000, seed=0):
    rng = np.random.default_rng(seed)
    v0 = rng.uniform(-4, 4, (t, 3)).astype(np.float32)
    e1 = rng.uniform(-0.5, 0.5, (t, 3)).astype(np.float32)
    e2 = rng.uniform(-0.5, 0.5, (t, 3)).astype(np.float32)
    return v0, e1, e2


def _rays(n, seed=1):
    rng = np.random.default_rng(seed)
    org = rng.uniform(-5, 5, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(org), jnp.asarray(d)


def _mesh():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs the virtual 8-device CPU mesh")
    return jax.sharding.Mesh(np.array(devs[:8]), ("rays",))


@pytest.mark.parametrize("kernel", ["packet", "bw"])
def test_pallas_kernel_sharded_matches_single(kernel):
    v0, e1, e2 = _soup()
    t = v0.shape[0]
    n = 2048
    org, d = _rays(n)
    tmin = jnp.zeros(n, jnp.float32)
    tmax = jnp.full(n, 1e30, jnp.float32)

    if kernel == "packet":
        bvh = build_bvh(v0, e1, e2)
        tab = build_packet_bvh(bvh, jnp.asarray(v0), jnp.asarray(e1),
                               jnp.asarray(e2), np.full(t, 0xF))
        tab = {k: jnp.asarray(v) for k, v in tab.items()}
        call = lambda o, dd, tn, tx: packet_bvh_closest(
            tab, o, dd, tn, tx, mask_bit=MASK_BOUNCE, interpret=True)
    else:
        tab = {k: jnp.asarray(v) for k, v in
               bw_tables(v0, e1, e2, np.full(t, 0xF)).items()}
        call = lambda o, dd, tn, tx: bw_closest(
            tab, o, dd, tn, tx, interpret=True)

    ref = call(org, d, tmin, tmax)

    mesh = _mesh()
    sharded_call = jax.shard_map(
        call, mesh=mesh,
        in_specs=(P("rays"), P("rays"), P("rays"), P("rays")),
        out_specs=(P("rays"), P("rays"), P("rays"), P("rays")),
        check_vma=False)
    out = jax.jit(sharded_call)(org, d, tmin, tmax)

    np.testing.assert_array_equal(np.asarray(out[3]), np.asarray(ref[3]))
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               rtol=1e-6, atol=1e-6)
