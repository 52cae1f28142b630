"""Learnable environment background — the TPU analog of the reference's
``enableBg`` separate sky model (closed trainer feature; SURVEY §2.9).

An equirectangular radiance grid sampled by per-pixel ray direction,
composited behind the splats with the residual transmittance:
img = splat_rgb + T · env(dir). Trained jointly via its own Adam moments.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from divshot_tpu.splat.camera import Camera


def init_envmap(height: int = 64, width: int = 128,
                init_color=(0.5, 0.5, 0.5)) -> jax.Array:
    """(H, W, 3) logit-space radiance grid."""
    c = jnp.asarray(init_color, jnp.float32).clip(1e-3, 1 - 1e-3)
    logit = jnp.log(c) - jnp.log1p(-c)
    return jnp.broadcast_to(logit, (height, width, 3)).copy()


def pixel_ray_dirs(camera: Camera) -> jnp.ndarray:
    """(H, W, 3) world-space unit ray directions."""
    H, W = camera.height, camera.width
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5 - camera.cx) / camera.fx
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5 - camera.cy) / camera.fy
    gx, gy = jnp.meshgrid(xs, ys)
    d_cam = jnp.stack([gx, gy, jnp.ones_like(gx)], -1)
    R = camera.viewmat[:3, :3]
    from divshot_tpu.splat.math import matvec3
    d_world = matvec3(R.T, d_cam)
    return d_world / jnp.linalg.norm(d_world, axis=-1, keepdims=True).clip(1e-8)


def sample_envmap(envmap: jax.Array, dirs: jnp.ndarray) -> jnp.ndarray:
    """Bilinear equirect sample -> (..., 3) rgb in [0, 1]."""
    He, We = envmap.shape[:2]
    theta = jnp.arccos(jnp.clip(dirs[..., 1], -1, 1))          # [0, pi]
    phi = jnp.arctan2(dirs[..., 2], dirs[..., 0])              # [-pi, pi]
    u = (phi / (2 * jnp.pi) + 0.5) * We - 0.5
    v = theta / jnp.pi * (He - 1)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, He - 2)
    au = (u - u0)[..., None]
    av = (v - v0)[..., None]
    u0m = jnp.mod(u0, We)
    u1m = jnp.mod(u0 + 1, We)
    p00 = envmap[v0, u0m]
    p01 = envmap[v0, u1m]
    p10 = envmap[v0 + 1, u0m]
    p11 = envmap[v0 + 1, u1m]
    logit = ((1 - au) * (1 - av) * p00 + (1 - au) * av * p01
             + au * (1 - av) * p10 + au * av * p11)
    return jax.nn.sigmoid(logit)


def render_background(envmap: jax.Array, camera: Camera) -> jnp.ndarray:
    """(H, W, 3) background image for a camera."""
    return sample_envmap(envmap, pixel_ray_dirs(camera))
