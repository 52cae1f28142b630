"""Top-level differentiable render: params + camera -> image.

Pipeline (the TPU analog of the reference viewer's
clear -> viewz cull -> sort -> raster chain, ``renderer/gaussian.cpp:272-502``,
and of the closed trainer's tile rasterizer):

  project (EWA) -> SH eval -> tile binning + (tile, depth) sort -> tiled
  alpha compositing with analytic VJP.

Backends:
  - "tiles": production path (static-shape XLA tile rasterizer).
  - "dense": O(N·pixels) oracle for tests/small scenes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from divshot_tpu.splat.camera import Camera
from divshot_tpu.splat.gaussians import GaussianParams
from divshot_tpu.splat.sh import eval_sh_color
from divshot_tpu.raster.project import project_gaussians, Projection
from divshot_tpu.raster import tiles as _tiles
from divshot_tpu.raster import dense as _dense


class RenderOutput(NamedTuple):
    image: jax.Array       # (H, W, 3)
    alpha: jax.Array       # (H, W)
    proj: Projection
    means2d: jax.Array     # the projected means the compositor consumed —
                           # differentiate w.r.t. these for densify stats
    absgrad_sink: jax.Array
    extra: jax.Array | None = None   # (H, W, E) extra composited planes
    # capacity diagnostics — true (pre-cap) instance count and the largest
    # per-tile instance list; callers surface overflow vs the static
    # capacities (binning silently drops the excess otherwise)
    num_instances: jax.Array | None = None   # () int32
    max_tile_count: jax.Array | None = None  # () int32


def render(
    params: GaussianParams,
    camera: Camera,
    *,
    sh_degree: int | None = None,
    background: jax.Array | None = None,
    backend: str = "tiles",
    tile_size: int = 16,
    tile_capacity: int = 1024,
    instance_capacity: int | None = None,
    instance_capacity_mult: float = 8.0,
    max_tiles_per_gaussian: int = 64,
    chunk: int = 32,
    eps2d: float = 0.3,
    antialiased: bool = False,
    radius_clip: float = 0.0,
    t_eps: float = 1e-4,
    absgrad_sink: jax.Array | None = None,
    means2d_sink: jax.Array | None = None,
    npix_sink: jax.Array | None = None,
    override_colors: jax.Array | None = None,
    extra_colors: jax.Array | None = None,
    cull_sh_radius: float = 0.0,
    fov_clamp: tuple | None = None,
    with_absgrad: bool = True,
    binning: str = "pallas",
) -> RenderOutput:
    """``absgrad_sink`` / ``means2d_sink`` are zero (N, 2) inputs whose
    cotangents harvest the AbsGS absolute and the signed screen-space
    gradients per gaussian (densification statistics).

    ``override_colors`` (N, 3) replaces SH shading — used to composite
    arbitrary per-splat quantities (depth maps, normals, ids) through the
    same transmittance weighting (the analog of the reference's
    Depth/Normal render types, ``gaussian_component.h:7-16``).

    ``extra_colors`` (N, E<=4) appends aux channels composited in the SAME
    pass as rgb (pallas backend): depth / depth^2 / camera normals for the
    2DGS losses — no second rasterization needed. Returned as
    ``out.extra``."""
    if sh_degree is None:
        sh_degree = params.sh_degree

    if backend == "surfel":
        # exact 2DGS ray-splat intersection (modelType=1, editor.cpp:1847)
        from divshot_tpu.raster import surfel as _sf
        out, _npix = _sf.render_surfels(
            params, camera, sh_degree=sh_degree, background=background,
            tile_size=tile_size, tile_capacity=tile_capacity,
            instance_capacity=instance_capacity,
            instance_capacity_mult=instance_capacity_mult,
            max_tiles_per_gaussian=max_tiles_per_gaussian, chunk=chunk,
            t_eps=t_eps, absgrad_sink=absgrad_sink,
            means2d_sink=means2d_sink, npix_sink=npix_sink,
            override_colors=override_colors, with_geometry=False)
        return out

    if backend == "surfel_pallas":
        # Pallas twin of the surfel path (production on TPU; interpret mode
        # elsewhere so tests exercise the same kernels)
        from divshot_tpu.raster import pallas_surfel as _sp
        import jax as _jax
        out, _npix = _sp.render_surfels_pallas(
            params, camera, sh_degree=sh_degree, background=background,
            tile_size=tile_size, instance_capacity=instance_capacity,
            instance_capacity_mult=instance_capacity_mult,
            max_tiles_per_gaussian=max_tiles_per_gaussian, t_eps=t_eps,
            absgrad_sink=absgrad_sink, means2d_sink=means2d_sink,
            npix_sink=npix_sink, override_colors=override_colors,
            with_geometry=False,
            interpret=_jax.default_backend() != "tpu")
        return out

    proj = project_gaussians(
        params.means, params.scales, params.quats, camera,
        eps2d=eps2d, antialiased=antialiased, fov_clamp=fov_clamp,
        opacities=jax.lax.stop_gradient(params.effective_opacity()),
    )
    if radius_clip > 0.0:
        # radiusClip: cull splats whose projected radius is below the
        # threshold (reference RasterConfig.radius_clip semantics)
        proj = proj._replace(radii=jnp.where(proj.radii > radius_clip,
                                             proj.radii, 0.0))

    if override_colors is not None:
        colors = override_colors
    else:
        # view-dependent color: SH evaluated along camera->splat direction
        from divshot_tpu.splat.math import safe_normalize
        dirs = safe_normalize(params.means - camera.campos[None, :])
        shN = params.shN
        if cull_sh_radius > 0.0:
            # cullSH: splats below a few pixels keep only their DC color
            # (reference cullSH flag; LightGaussian-style SH culling)
            keep = (proj.radii > cull_sh_radius)[:, None, None]
            shN = shN * keep.astype(shN.dtype)
        colors = eval_sh_color(params.sh0, shN, dirs, sh_degree)

    opac = params.effective_opacity() * proj.comp
    if background is None:
        background = jnp.zeros((3,), jnp.float32)

    if extra_colors is not None and backend != "pallas":
        raise ValueError("extra_colors requires the pallas backend")

    if backend == "dense":
        proj_for_comp = Projection(
            means2d=proj.means2d, conics=proj.conics, depths=proj.depths,
            radii=proj.radii, comp=jnp.ones_like(proj.comp), cov2d=proj.cov2d)
        img, alpha = _dense.composite_dense(
            proj_for_comp, colors, opac, camera.width, camera.height,
            background=background)
        sink = jnp.zeros((params.capacity, 2), jnp.float32) \
            if absgrad_sink is None else absgrad_sink
        return RenderOutput(img, alpha, proj, proj.means2d, sink)

    if instance_capacity is None:
        instance_capacity = max(1 << 16,
                                int(instance_capacity_mult * params.capacity))

    if backend == "pallas" and binning == "pallas":
        # round-5 path: one-hot window-decode expansion + feature-riding
        # sort, binning inside the custom VJP (pallas_bin.py)
        from divshot_tpu.raster import pallas_raster as _pr
        interp = jax.default_backend() != "tpu"
        if absgrad_sink is None:
            absgrad_sink = jnp.zeros((params.capacity, 2), jnp.float32)
        means2d = proj.means2d if means2d_sink is None \
            else proj.means2d + means2d_sink
        cols = colors if extra_colors is None \
            else jnp.concatenate([colors, extra_colors], axis=1)
        img, alpha, n_inst, max_tc = _pr.rasterize_pallas_binned(
            means2d, proj.conics, cols, opac, proj,
            width=camera.width, height=camera.height, tile_size=tile_size,
            instance_capacity=instance_capacity,
            max_tiles_per_gaussian=max_tiles_per_gaussian,
            background=background, absgrad_sink=absgrad_sink,
            npix_sink=npix_sink, t_eps=t_eps, interpret=interp,
            with_absgrad=with_absgrad)
        extra = None
        if extra_colors is not None:
            img, extra = img[..., :3], img[..., 3:]
        return RenderOutput(img, alpha, proj, proj.means2d, absgrad_sink,
                            extra, n_inst, max_tc)

    bins = _tiles.bin_gaussians(
        jax.lax.stop_gradient(proj.means2d),
        jax.lax.stop_gradient(proj.depths),
        jax.lax.stop_gradient(proj.radii),
        camera.width, camera.height,
        tile_size=tile_size, tile_capacity=tile_capacity,
        instance_capacity=instance_capacity,
        max_tiles_per_gaussian=max_tiles_per_gaussian,
        build_ids_mat=(backend != "pallas"),
        radii_xy=jax.lax.stop_gradient(proj.radii_xy),
        rad2=jax.lax.stop_gradient(proj.rad2),
    )
    if absgrad_sink is None:
        absgrad_sink = jnp.zeros((params.capacity, 2), jnp.float32)
    means2d = proj.means2d if means2d_sink is None \
        else proj.means2d + means2d_sink
    max_tile_count = jnp.max(bins.tile_counts)

    if backend == "pallas":
        from divshot_tpu.raster import pallas_raster as _pr
        interp = jax.default_backend() != "tpu"   # interpret off-TPU (tests)
        cols = colors if extra_colors is None \
            else jnp.concatenate([colors, extra_colors], axis=1)
        img, alpha = _pr.rasterize_pallas(
            means2d, proj.conics, cols, opac, bins,
            width=camera.width, height=camera.height, tile_size=tile_size,
            background=background, absgrad_sink=absgrad_sink,
            npix_sink=npix_sink, t_eps=t_eps, interpret=interp,
            with_absgrad=with_absgrad)
        extra = None
        if extra_colors is not None:
            img, extra = img[..., :3], img[..., 3:]
        return RenderOutput(img, alpha, proj, proj.means2d, absgrad_sink,
                            extra, bins.num_instances, max_tile_count)

    img, alpha = _tiles.composite_tiles(
        means2d, proj.conics, colors, opac, bins.ids_mat,
        camera.width, camera.height, tile_size=tile_size, chunk=chunk,
        background=background, absgrad_sink=absgrad_sink, t_eps=t_eps,
    )
    return RenderOutput(img, alpha, proj, proj.means2d, absgrad_sink, None,
                        bins.num_instances, max_tile_count)


def _pallas_bin_mod():
    from divshot_tpu.raster import pallas_bin
    return pallas_bin


class FastBins(NamedTuple):
    """Prepared per-frame state ``render_fast`` can reuse while the camera
    and splats are static (the viewer's dominant regime — the reference's
    editor resorts per frame only because its params stream in live).

    ``token``: caller-supplied generation stamp. Pass the same
    ``params_token`` to ``render_fast`` on reuse — a mismatch raises,
    catching the stale-bins bug (params updated, bins not re-built) at the
    call site instead of silently rendering stale geometry."""
    table: jax.Array
    tile_start: jax.Array
    num_instances: jax.Array
    token: int | None = None


def render_fast(
    params: GaussianParams,
    camera: Camera,
    *,
    sh_degree: int | None = None,
    background: jax.Array | None = None,
    tile_size: int = 16,
    instance_capacity: int = 1 << 23,
    max_tiles_per_gaussian: int = 64,
    eps2d: float = 0.3,
    antialiased: bool = False,
    bins: FastBins | None = None,
    t_eps: float = 1e-4,
    binning: str = "pallas",
    params_token: int | None = None,
) -> tuple[jax.Array, jax.Array, FastBins]:
    """Inference-only viewer path: -> (image, alpha, FastBins).

    Differences from ``render``: forward kernel only (no VJP residuals, no
    gradient bookkeeping), Pallas one-hot expansion binning (r5 — the
    moving-camera path re-bins every frame, so binning cost IS the frame
    cost), and the (table, tile ranges) can be passed back in while the
    scene/camera are static so repeat frames run ONLY the compositing
    kernel — the analog of the reference viewer's sort-then-raster split
    (``renderer/gaussian.cpp:272-502``). Stale-bins guard: pass
    ``params_token`` (any int the caller bumps on each param update);
    reusing bins built under a different token raises ValueError."""
    from divshot_tpu.raster import pallas_raster as _pr
    from divshot_tpu.splat.math import safe_normalize
    if sh_degree is None:
        sh_degree = params.sh_degree
    if background is None:
        background = jnp.zeros((3,), jnp.float32)

    if bins is not None and not isinstance(bins.token, jax.core.Tracer) \
            and bins.token != params_token:
        raise ValueError(
            f"stale FastBins: bins were built under params_token="
            f"{bins.token!r} but the caller now passes {params_token!r}; "
            f"re-bin after updating splat params (pass bins=None)")

    if bins is None:
        opac_raw = params.effective_opacity()
        proj = project_gaussians(
            params.means, params.scales, params.quats, camera,
            eps2d=eps2d, antialiased=antialiased, opacities=opac_raw)
        dirs = safe_normalize(params.means - camera.campos[None, :])
        colors = eval_sh_color(params.sh0, params.shN, dirs, sh_degree)
        opac = opac_raw * proj.comp
        if binning == "pallas":
            sb = _pallas_bin_mod().expand_sorted(
                proj.means2d, proj.conics, proj.depths, proj.radii,
                proj.radii_xy, proj.rad2, colors, opac,
                width=camera.width, height=camera.height,
                tile_size=tile_size, instance_capacity=instance_capacity,
                mt=min(max_tiles_per_gaussian, 256),
                interpret=jax.default_backend() != "tpu")
            bins = FastBins(table=sb.table, tile_start=sb.tile_start,
                            num_instances=sb.num_instances,
                            token=params_token)
        else:
            b = _tiles.bin_gaussians(
                proj.means2d, proj.depths, proj.radii,
                camera.width, camera.height, tile_size=tile_size,
                instance_capacity=instance_capacity,
                max_tiles_per_gaussian=max_tiles_per_gaussian,
                build_ids_mat=False, radii_xy=proj.radii_xy,
                rad2=proj.rad2)
            table = _pr.build_feature_table(proj.means2d, proj.conics,
                                            colors, opac, b.inst_gauss)
            bins = FastBins(table=table, tile_start=b.tile_start,
                            num_instances=b.num_instances,
                            token=params_token)

    interp = jax.default_backend() != "tpu"
    out = _pr.rasterize_forward(
        bins.table, bins.tile_start, width=camera.width,
        height=camera.height, tile_size=tile_size, nch=3,
        interpret=interp, t_eps=t_eps)
    tiles_x = (camera.width + tile_size - 1) // tile_size
    tiles_y = (camera.height + tile_size - 1) // tile_size
    img = _pr._tiles_to_image(out[:, 0:3, :], tiles_x, tiles_y, tile_size,
                              camera.width, camera.height)
    T_px = _pr._tiles_to_image(out[:, 7:8, :], tiles_x, tiles_y, tile_size,
                               camera.width, camera.height)[..., 0]
    img = img + T_px[..., None] * background[None, None, :]
    return img, 1.0 - T_px, bins
