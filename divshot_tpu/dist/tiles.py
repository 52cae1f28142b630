"""Tile-sharded rendering: one large frame split across chips.

The second parallel axis from SURVEY §2.10: for frames too expensive for a
single chip (or latency-critical previews), the *tile grid* is sharded —
parameters are replicated, each chip rasterizes a horizontal band of the
image through the normal single-chip pipeline (the band is expressed as a
principal-point-shifted sub-viewport, so projection math is untouched and
binning naturally culls out-of-band tiles), and the bands are concatenated.
Collectives: none in the forward (pure spatial decomposition); gradients of
replicated params all-reduce over ICI automatically when differentiated
under the same sharding."""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from divshot_tpu.splat.camera import Camera
from divshot_tpu.splat.gaussians import GaussianParams
from divshot_tpu.raster.render import render


def band_camera(camera: Camera, band: jax.Array, band_h: int) -> Camera:
    """Sub-viewport camera for horizontal band ``band`` (0-based, top to
    bottom): identical intrinsics with the principal point shifted so the
    band renders rows [band*band_h, (band+1)*band_h)."""
    return camera.replace(cy=camera.cy - band.astype(jnp.float32) * band_h,
                          height=band_h)


def render_tiled(
    params: GaussianParams,
    camera: Camera,
    mesh: Mesh,
    *,
    axis: str = "data",
    tile_size: int = 16,
    **render_kwargs: Any,
):
    """Render one frame with the tile/row axis sharded over ``axis``.

    The image height must be divisible by (devices * tile_size).
    Returns (image (H, W, 3), alpha (H, W)) fully replicated."""
    n_dev = mesh.shape[axis]
    H, W = camera.height, camera.width
    assert H % (n_dev * tile_size) == 0, (
        f"height {H} must divide into {n_dev} bands of whole tiles")
    band_h = H // n_dev

    from jax import shard_map

    bands = jnp.arange(n_dev, dtype=jnp.int32)

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis)),
        out_specs=(P(axis), P(axis)), check_vma=False)
    def _render_band(p, band):
        cam = band_camera(camera, band[0], band_h)
        # EWA clamp must stay relative to the FULL frame fov
        clamp = (0.5 * W / camera.fx, 0.5 * H / camera.fy)
        out = render(p, cam, tile_size=tile_size, fov_clamp=clamp,
                     **render_kwargs)
        return out.image[None], out.alpha[None]

    img, alpha = _render_band(params, bands)
    img = img.reshape(H, W, 3)
    alpha = alpha.reshape(H, W)
    return img, alpha
