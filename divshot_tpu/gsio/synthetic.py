"""Synthetic ground-truth scenes for tests and benchmarks.

No real datasets ship in this environment, so integration tests and bench
configs render a known gaussian scene to ground-truth images with our own
renderer and train a fresh model against them (self-consistency oracle:
trainer must recover the radiance field to high PSNR).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from divshot_tpu.splat.camera import Camera
from divshot_tpu.splat.gaussians import GaussianParams
from divshot_tpu.raster.render import render


def random_scene(rng: np.random.Generator, n: int, *, sh_degree: int = 0,
                 radius: float = 1.2, capacity: int | None = None,
                 scale_range: tuple[float, float] = (0.02, 0.09),
                 ) -> GaussianParams:
    """Blob-cluster scene: gaussians clumped around a few centers, colorful.

    ``scale_range``: linear splat scale bounds; converged real scenes have
    mostly small splats (≈0.002-0.02 of scene units) — use that for
    realistic instance-duplication factors in benchmarks."""
    k = 12
    centers = rng.uniform(-radius, radius, (k, 3))
    which = rng.integers(0, k, n)
    means = centers[which] + 0.25 * rng.standard_normal((n, 3))
    scales = rng.uniform(np.log(scale_range[0]), np.log(scale_range[1]),
                         (n, 3))
    quats = rng.standard_normal((n, 4))
    opacity = rng.uniform(0.5, 3.0, (n,))
    base = rng.uniform(0, 1, (k, 3))
    sh0 = (base[which] + 0.15 * rng.standard_normal((n, 3)) - 0.5) / 0.2821
    n_sh = {0: 0, 1: 3, 2: 8, 3: 15}[sh_degree]
    shN = 0.08 * rng.standard_normal((n, n_sh, 3)) if n_sh else None
    return GaussianParams.create(
        means.astype(np.float32), scales=scales.astype(np.float32),
        quats=quats.astype(np.float32), opacity=opacity.astype(np.float32),
        sh0=sh0.astype(np.float32),
        shN=None if shN is None else shN.astype(np.float32),
        sh_degree=sh_degree, capacity=capacity)


def orbit_cameras(num: int, *, radius: float = 4.0, height: float = 1.0,
                  width: int = 128, fov_y_deg: float = 50.0,
                  height_px: int | None = None) -> list[Camera]:
    cams = []
    h = height_px if height_px is not None else width
    for i in range(num):
        a = 2 * np.pi * i / num
        eye = [radius * np.cos(a), height * np.sin(2 * a), radius * np.sin(a)]
        cams.append(Camera.look_at(eye, [0, 0, 0], [0, -1, 0],
                                   fov_y_deg, width, h))
    return cams


def render_gt_images(params: GaussianParams, cams: list[Camera],
                     background=None, **render_kw) -> np.ndarray:
    """Render ground-truth u8 images for each camera."""
    kw = dict(backend="tiles", tile_capacity=1024, chunk=32)
    kw.update(render_kw)
    bg = jnp.zeros((3,)) if background is None else jnp.asarray(background)

    @jax.jit
    def one(cam_leaves):
        cam = jax.tree.unflatten(treedef, cam_leaves)
        out = render(params, cam, background=bg, **kw)
        return out.image

    imgs = []
    leaves, treedef = jax.tree.flatten(cams[0])
    for c in cams:
        leaves, treedef = jax.tree.flatten(c)
        img = np.asarray(one(leaves))
        imgs.append((img.clip(0, 1) * 255).astype(np.uint8))
    return np.stack(imgs)
