"""Camera model for training + rendering.

Convention: COLMAP / standard-3DGS — view space looks down **+Z**, viewmat is
world-to-camera (R|t), pixel (0,0) at top-left, principal point (cx, cy) in
pixels. (The reference's Vulkan viewer uses a -Z reverse-Z convention,
``gsplat_viewz_cs.hlsl:195-196``; the trainer path we rebuild is the
COLMAP-convention one — conversion helpers handle the difference at I/O.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class Camera:
    """A single pinhole camera. Static image size lives in aux data so cameras
    with equal resolution batch cleanly under vmap."""

    viewmat: jax.Array  # (4, 4) world-to-camera
    fx: jax.Array       # () focal in px
    fy: jax.Array
    cx: jax.Array       # () principal point in px
    cy: jax.Array
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)

    @property
    def campos(self) -> jax.Array:
        """Camera center in world space: -R^T t."""
        R = self.viewmat[..., :3, :3]
        t = self.viewmat[..., :3, 3]
        return -jnp.einsum("...ji,...j->...i", R, t)

    @property
    def tan_fovx(self) -> jax.Array:
        return 0.5 * self.width / self.fx

    @property
    def tan_fovy(self) -> jax.Array:
        return 0.5 * self.height / self.fy

    @classmethod
    def from_Rt(cls, R: np.ndarray, t: np.ndarray, fx, fy, cx, cy,
                width: int, height: int) -> "Camera":
        viewmat = np.eye(4, dtype=np.float32)
        viewmat[:3, :3] = R
        viewmat[:3, 3] = t
        return cls(
            viewmat=jnp.asarray(viewmat),
            fx=jnp.float32(fx), fy=jnp.float32(fy),
            cx=jnp.float32(cx), cy=jnp.float32(cy),
            width=int(width), height=int(height),
        )

    @classmethod
    def look_at(cls, eye, target, up, fov_y_deg: float, width: int,
                height: int) -> "Camera":
        eye = np.asarray(eye, np.float64)
        fwd = np.asarray(target, np.float64) - eye
        fwd /= np.linalg.norm(fwd)
        right = np.cross(fwd, np.asarray(up, np.float64))
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        R = np.stack([right, down, fwd])  # rows: cam axes in world
        t = -R @ eye
        fy = 0.5 * height / np.tan(np.radians(fov_y_deg) / 2)
        return cls.from_Rt(R, t, fy, fy, width / 2, height / 2, width, height)


def batch_cameras(cams: list[Camera]) -> Camera:
    """Stack equal-resolution cameras into one vmappable Camera pytree."""
    w, h = cams[0].width, cams[0].height
    assert all(c.width == w and c.height == h for c in cams), \
        "batch_cameras requires uniform resolution"
    return jax.tree.map(lambda *xs: jnp.stack(xs), *cams)
