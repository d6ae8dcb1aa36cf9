"""Multi-device sharding of the render/training step.

The reference is single-process (SURVEY.md §2.5); this module is the
TPU-native scaling layer it lacks: rays/pixels shard over the `rays` axis of
a `jax.sharding.Mesh`, scene tables are replicated, and XLA inserts the
collectives (parameter-gradient psum rides ICI, overlapped with backward by
the latency-hiding scheduler).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices=None, axis="rays", devices=None):
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"Requested a {n_devices}-device mesh but only "
                f"{len(devices)} devices are visible; for virtual CPU "
                f"meshes set XLA_FLAGS=--xla_force_host_platform_device_count"
                f"=<n> and pin jax.config.update('jax_platforms', 'cpu') "
                f"before first jax use")
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_wave(mesh, *arrays, axis="rays"):
    """Place per-ray arrays with the lane dim sharded over the mesh."""
    out = []
    for a in arrays:
        spec = P(axis) if a.ndim >= 1 else P()
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


def replicate(mesh, tree):
    return jax.device_put(tree, NamedSharding(mesh, P()))


def sharded_render_fn(scene, mesh, differentiable=False, axis="rays"):
    """jit-compiled render step with ray-dim sharding annotations.

    Returns fn(tables, x, y, sample, iteration, frame, seed) -> (N,3)
    radiance, with x/y sharded over `axis` and tables replicated.  Pixel work
    is embarrassingly parallel; XLA partitions everything downstream of the
    sharded inputs, no collectives needed in forward.
    """
    from ignis_tpu.render.integrator import trace_wave

    def fn(tables, x, y, sample, iteration, frame, seed):
        return trace_wave(scene, tables, x, y, sample, iteration, frame,
                          seed, differentiable=differentiable)

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))
    return jax.jit(fn,
                   in_shardings=(repl, shard, shard, None, None, None, None),
                   out_shardings=shard)


def sharded_train_step(scene, mesh, param_keys=("mat_colors", "light_data"),
                       lr=1e-2, axis="rays"):
    """One inverse-rendering SGD step, sharded over rays.

    loss = mean over lanes of |render - target|^2; gradients w.r.t. the
    chosen parameter tables are psum-reduced across shards by XLA (ICI), and
    parameters stay replicated.
    """
    from ignis_tpu.render.integrator import trace_wave

    def loss_fn(params, tables, x, y, sample, iteration, frame, seed, target):
        t = dict(tables)
        t.update(params)
        color = trace_wave(scene, t, x, y, sample, iteration, frame, seed,
                           differentiable=True)
        return jnp.mean((color - target) ** 2)

    def step(tables, x, y, sample, iteration, frame, seed, target):
        params = {k: tables[k] for k in param_keys}
        rest = {k: v for k, v in tables.items() if k not in param_keys}
        loss, grads = jax.value_and_grad(loss_fn)(
            params, rest, x, y, sample, iteration, frame, seed, target)
        new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
        out = dict(rest)
        out.update(new_params)
        return loss, out

    repl = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(axis))
    return jax.jit(step,
                   in_shardings=(repl, shard, shard, None, None, None, None,
                                 shard),
                   out_shardings=(repl, repl))
