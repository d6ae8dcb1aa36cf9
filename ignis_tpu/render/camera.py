"""Camera ray generation (mirrors src/artic/camera/perspective.art and
driver/camera.art pixel-coordinate conventions)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ignis_tpu.core.vec import normalize, vec3
from ignis_tpu.scene.compile import CameraConfig


def pixel_coord_from_xy(x, y, w, h, sx, sy):
    """make_pixelcoord_from_xy (driver/camera.art:21-29): nx,ny in [-1,1],
    y flipped."""
    nx = 2.0 * (x.astype(jnp.float32) + sx) / w - 1.0
    ny = 1.0 - 2.0 * (y.astype(jnp.float32) + sy) / h
    return nx, ny


def camera_frame(cam: CameraConfig):
    """view matrix columns (right, up, dir) — perspective.art:30-32."""
    d = np.asarray(cam.dir, dtype=np.float64)
    up = np.asarray(cam.up, dtype=np.float64)
    right = np.cross(d, up)
    right = right / max(np.linalg.norm(right), 1e-20)
    return (jnp.asarray(right, jnp.float32), jnp.asarray(cam.up, jnp.float32),
            jnp.asarray(cam.dir, jnp.float32))


def generate_rays(cam: CameraConfig, nx, ny):
    """Perspective: dir = normalize(view @ (sx*nx, sy*ny, 1))."""
    right, up, d = camera_frame(cam)
    sw, sh = float(cam.scale[0]), float(cam.scale[1])
    world = (right[None, :] * (sw * nx)[..., None]
             + up[None, :] * (sh * ny)[..., None]
             + d[None, :])
    dirs = normalize(world)
    org = jnp.broadcast_to(jnp.asarray(cam.eye, jnp.float32), dirs.shape)
    tmin = jnp.full(nx.shape, cam.tmin, jnp.float32)
    tmax = jnp.full(nx.shape, cam.tmax, jnp.float32)
    return org, dirs, tmin, tmax
