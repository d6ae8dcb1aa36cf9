"""Ignis-TPU: a TPU-native differentiable wavefront path tracer.

A from-scratch reimplementation of the capabilities of the Ignis renderer
(SLebailly/Ignis-MasterThesis) designed for TPUs: scenes compile to flat JAX
arrays instead of JIT-specialized Artic shaders, the wavefront loop is a
`lax.while_loop` over fixed-capacity SoA ray arrays, hot kernels are Pallas,
and rays/pixels shard over a `jax.sharding.Mesh`.

Reference architecture documented in SURVEY.md; parity targets in BASELINE.md.
"""

__version__ = "0.1.0"

# Platform override must run before ANY submodule import can touch the JAX
# backend (some TPU plugins ignore the JAX_PLATFORMS env var, so this goes
# through the config API; it must land before backend initialization).
import os as _os

import jax as _jax

if _os.environ.get("IGNIS_TPU_PLATFORM"):
    try:
        _jax.config.update("jax_platforms",
                           _os.environ["IGNIS_TPU_PLATFORM"])
    except Exception:
        pass

from ignis_tpu.api import Runtime, load_scene  # noqa: F401,E402
