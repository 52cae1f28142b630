"""Geometry losses for 2DGS / mesh-oriented training (reference:
``modelType {0:3DGS, 1:2DGS}`` and ``normalConsistencyLoss`` — forced on
when exportMesh, ``gs_train.cpp:82-86``; algorithmic source: 2DGS/SuGaR).

2DGS mode flattens the third scale axis (surfel splats) and supervises
splat normals against depth-derived normals. The v1 rasterization path
composites flattened 3D gaussians through the shared EWA rasterizer
(exact 2DGS ray-splat intersection is a planned kernel variant).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from divshot_tpu.splat.camera import Camera
from divshot_tpu.splat.gaussians import GaussianParams
from divshot_tpu.splat.math import quat_to_rotmat

FLAT_LOG_SCALE = -9.0   # exp(-9) ≈ 1e-4 — surfel thickness


def flatten_to_surfels(params: GaussianParams) -> GaussianParams:
    """2DGS: clamp the smallest-variance axis to (near) zero thickness."""
    s = params.scales
    flat = jnp.concatenate(
        [s[:, :2], jnp.full_like(s[:, 2:3], FLAT_LOG_SCALE)], axis=1)
    return params.replace(scales=flat)


def splat_normals(params: GaussianParams, camera: Camera) -> jnp.ndarray:
    """(C, 3) world-space unit normals (rotated z-axis), flipped toward the
    camera."""
    R = quat_to_rotmat(params.quats)
    n = R[..., :, 2]                       # third column
    view_dir = params.means - camera.campos[None, :]
    flip = jnp.sign(-jnp.sum(n * view_dir, -1, keepdims=True))
    flip = jnp.where(flip == 0, 1.0, flip)
    return n * flip


def normals_from_depth(depth: jnp.ndarray, camera: Camera,
                       alpha: jnp.ndarray) -> jnp.ndarray:
    """(H, W, 3) camera-space normals from the expected-depth map via
    unprojected finite differences (2DGS normal supervision target)."""
    H, W = depth.shape
    xs = (jnp.arange(W, dtype=jnp.float32) + 0.5 - camera.cx) / camera.fx
    ys = (jnp.arange(H, dtype=jnp.float32) + 0.5 - camera.cy) / camera.fy
    gx, gy = jnp.meshgrid(xs, ys)
    pts = jnp.stack([gx * depth, gy * depth, depth], -1)   # (H, W, 3)
    ddx = jnp.diff(pts, axis=1, append=pts[:, -1:])
    ddy = jnp.diff(pts, axis=0, append=pts[-1:])
    from divshot_tpu.splat.math import safe_normalize
    n = safe_normalize(jnp.cross(ddx, ddy))
    # orient toward camera (−z in camera space since +z is forward)
    flip = jnp.sign(-n[..., 2:3])
    flip = jnp.where(flip == 0, 1.0, flip)
    return n * flip * (alpha[..., None] > 0.5)


def normal_consistency_loss(
    rendered_normal_cam: jnp.ndarray,  # (H, W, 3) camera-space normals
    depth: jnp.ndarray,                # (H, W) expected depth
    alpha: jnp.ndarray,                # (H, W)
    camera: Camera,
) -> jnp.ndarray:
    """2DGS eq. (13)-style: 1 − n_render · n_depth over confident pixels."""
    from divshot_tpu.splat.math import safe_normalize
    n_r = safe_normalize(rendered_normal_cam, eps=1e-12)
    n_d = normals_from_depth(depth, camera, alpha)
    w = (alpha > 0.5).astype(jnp.float32)
    dots = jnp.sum(n_r * n_d, -1)
    return jnp.sum(w * (1.0 - dots)) / jnp.maximum(jnp.sum(w), 1.0)
