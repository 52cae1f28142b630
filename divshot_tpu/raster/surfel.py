"""Exact 2DGS (surfel) rasterization — ray-splat intersection.

The reference exposes ``modelType {0:3DGS, 1:2DGS}`` (``editor.cpp:1847``;
algorithm credited at ``README.md:108-131``: "2D Gaussian Splatting for
Geometrically Accurate Radiance Fields"). This module implements the exact
2DGS response — the gaussian is evaluated in the splat's own (u, v) tangent
frame at the true per-pixel ray-plane intersection — replacing the earlier
flattened-3DGS approximation (``train/geometry.py``).

Per splat the (u, v, 1) -> pixel-homogeneous map is the 3x3 matrix

    T = K' . [s_u R r1 | s_v R r2 | R mu + t],   K' = [[fx,0,cx],[0,fy,cy],[0,0,1]]

For pixel (x, y) the intersection solves two homogeneous plane equations
(2DGS paper, eq. 9-10):

    h_u = x.T_row3 - T_row1,  h_v = y.T_row3 - T_row2,  p = h_u x h_v,
    (u, v) = (p_x / p_z, p_y / p_z),      rho3d = u^2 + v^2

with the object-space low-pass of Botsch et al. (the 2DGS anti-aliasing
rule): rho = min(rho3d, 2.|pix - center|^2), G = exp(-0.5 rho).

The per-pixel intersection DEPTH z(u, v) = zplane . (u, v, 1) is linear in
(u, v) (third row of the view-space map) and is composited as a channel —
the exact-depth input the 2DGS distortion + normal-consistency losses need.

Compositing runs as a checkpointed ``lax.scan`` over per-tile depth-sorted
chunks (same binning as the 3DGS path, ``tiles.bin_gaussians``); the
backward comes from JAX autodiff through the rematerialized scan — exact
gradients to all geometry (T is a smooth function of means/scales/quats, so
means/scale/rotation gradients flow through the true intersection, unlike
the flattened approximation).

Densification statistics: a per-splat virtual screen-space shift ``s`` is
subtracted from the pixel coordinate in BOTH branches (x - s_x).T_row3 -
T_row1 and the low-pass distance; dL/ds is then exactly the sensitivity of
the loss to the splat's apparent screen position — the 2DGS analog of the
3DGS means2d gradient. (The AbsGS per-pixel |grad| accumulator is
approximated by |dL/ds| here — signed-sum magnitude, documented weaker.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from divshot_tpu.splat.camera import Camera
from divshot_tpu.splat.math import quat_to_rotmat, matvec3

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.999
T_EPS = 1e-4
FILTER_INV_SQ = 2.0        # 2DGS low-pass: rho2d = 2 |d|^2 (0.707 px filter)
DETACH_DEPTH_W = True      # distortion gradients flow to z, not to weights


class SurfelProjection:
    """Plain container (pytree via tuple use) — fields documented inline."""


def project_surfels(
    means: jax.Array,        # (N, 3)
    log_scales: jax.Array,   # (N, 3) — only the first two axes are used
    quats: jax.Array,        # (N, 4) wxyz
    camera: Camera,
    *,
    near: float = 0.01,
    far: float = 1e10,
):
    """-> dict with per-splat:
    Tmat (N, 3, 3) pixel-homogeneous map, zplane (N, 3) view-depth plane,
    center2d (N, 2), depths (N,) center view z, radii (N,) (0 = culled),
    normal_cam (N, 3) camera-facing unit normals in camera space.
    """
    R_v = camera.viewmat[:3, :3]
    t_v = camera.viewmat[:3, 3]
    Rw = quat_to_rotmat(quats)                       # (N, 3, 3)
    su = jnp.exp(log_scales[:, 0])
    sv = jnp.exp(log_scales[:, 1])
    # view-space tangent frame + center
    tu = matvec3(R_v, Rw[:, :, 0]) * su[:, None]
    tv = matvec3(R_v, Rw[:, :, 1]) * sv[:, None]
    cv = matvec3(R_v, means) + t_v

    fx, fy, cx, cy = camera.fx, camera.fy, camera.cx, camera.cy

    def kp(p):  # K' . p for view-space p: (N, 3) -> (N, 3)
        return jnp.stack([fx * p[:, 0] + cx * p[:, 2],
                          fy * p[:, 1] + cy * p[:, 2],
                          p[:, 2]], axis=1)

    Tmat = jnp.stack([kp(tu), kp(tv), kp(cv)], axis=2)   # columns u, v, 1
    zplane = jnp.stack([tu[:, 2], tv[:, 2], cv[:, 2]], axis=1)

    # dual-conic AABB (2DGS computeAABB): M* = T diag(1,1,-1) T^T
    T0 = Tmat[:, 0, :]      # row 0: (u,v,1) -> x~
    T1 = Tmat[:, 1, :]
    T2 = Tmat[:, 2, :]
    w = jnp.array([1.0, 1.0, -1.0], jnp.float32)
    dist = jnp.sum(T2 * T2 * w, axis=1)
    dist_ok = jnp.abs(dist) > 1e-7
    dist_safe = jnp.where(dist_ok, dist, 1.0)
    f = w[None, :] / dist_safe[:, None]
    cx2 = jnp.sum(f * T0 * T2, axis=1)
    cy2 = jnp.sum(f * T1 * T2, axis=1)
    ex = cx2 * cx2 - jnp.sum(f * T0 * T0, axis=1)
    ey = cy2 * cy2 - jnp.sum(f * T1 * T1, axis=1)
    ext = jnp.maximum(jnp.maximum(ex, ey), 0.0)
    # low-pass disc contributes up to ~2.4 px (alpha cutoff at rho2d=11)
    radius = jnp.ceil(jnp.maximum(3.0 * jnp.sqrt(ext), 2.5))

    z = cv[:, 2]
    Wd, Hd = camera.width, camera.height
    inside = ((cx2 + radius > 0) & (cx2 - radius < Wd)
              & (cy2 + radius > 0) & (cy2 - radius < Hd))
    valid = (z > near) & (z < far) & dist_ok & (ext > 0) & inside
    radii = jnp.where(valid, radius, 0.0)

    # camera-facing normal (third rotation column), camera space
    n_cam = matvec3(R_v, Rw[:, :, 2])
    view = cv  # direction camera->splat in camera space
    flip = jnp.sign(-jnp.sum(n_cam * view, axis=1, keepdims=True))
    flip = jnp.where(flip == 0, 1.0, flip)
    n_cam = n_cam * flip

    return {
        "Tmat": Tmat, "zplane": zplane,
        "center2d": jnp.stack([cx2, cy2], axis=1),
        "depths": z, "radii": radii, "normal_cam": n_cam,
    }


def _surfel_alpha(Trows, zpl, c2d, shift, op, ids, pix):
    """Per-(tile, slot, pixel) alpha + intersection depth.

    Trows (T, CH, 9), zpl (T, CH, 3), c2d (T, CH, 2), shift (T, CH, 2),
    op (T, CH), ids (T, CH), pix (T, px, 2) -> alpha, z_px (T, CH, px).
    """
    x = pix[:, None, :, 0] - shift[:, :, None, 0]        # (T, CH, px)
    y = pix[:, None, :, 1] - shift[:, :, None, 1]
    T0 = Trows[..., 0:3]                                  # (T, CH, 3)
    T1 = Trows[..., 3:6]
    T2 = Trows[..., 6:9]
    # h_u = x.T2 - T0 ; h_v = y.T2 - T1 ; p = h_u x h_v  (per pixel)
    hu = x[..., None] * T2[:, :, None, :] - T0[:, :, None, :]
    hv = y[..., None] * T2[:, :, None, :] - T1[:, :, None, :]
    p = jnp.cross(hu, hv)                                 # (T, CH, px, 3)
    pz = p[..., 2]
    pz_ok = jnp.abs(pz) > 1e-9
    pz_safe = jnp.where(pz_ok, pz, 1.0)
    u = p[..., 0] / pz_safe
    v = p[..., 1] / pz_safe
    rho3d = u * u + v * v
    dx = x - c2d[:, :, None, 0]
    dy = y - c2d[:, :, None, 1]
    rho2d = FILTER_INV_SQ * (dx * dx + dy * dy)
    rho = jnp.minimum(rho3d, rho2d)
    z_px = (zpl[:, :, None, 0] * u + zpl[:, :, None, 1] * v
            + zpl[:, :, None, 2])
    alpha = op[..., None] * jnp.exp(-0.5 * rho)
    valid = (ids[..., None] >= 0) & pz_ok & (alpha >= ALPHA_MIN) \
        & (z_px > 0.01)
    alpha = jnp.where(valid, jnp.minimum(alpha, ALPHA_MAX), 0.0)
    return alpha, jnp.where(valid, z_px, 0.0)


@functools.lru_cache(maxsize=None)
def _make_surfel_compositor(width: int, height: int, tile_size: int,
                            chunk: int, nch_const: int,
                            t_eps: float = T_EPS):
    """Forward compositor (autodiff backward via checkpointed scan).

    Channels: rgb+const channels are per-splat constants; z and z^2 are
    per-PIXEL (true intersection depth). Output image layout:
    (H, W, 3 + nch_const + 2): [rgb..., const..., z, z2].
    """
    from divshot_tpu.raster.tiles import _pixel_coords, _tile_grid
    pix_np = _pixel_coords(width, height, tile_size)
    tw, th = _tile_grid(width, height, tile_size)
    num_tiles = tw * th
    px = tile_size * tile_size
    nco = 3 + nch_const

    def _tiles_to_image(tile_img):
        c = tile_img.shape[-1]
        img = tile_img.reshape(th, tw, tile_size, tile_size, c)
        img = img.transpose(0, 2, 1, 3, 4).reshape(
            th * tile_size, tw * tile_size, c)
        return img[:height, :width]

    def forward(Tmat, zplane, center2d, shift, colors, opacities, npix_sink,
                background, ids_mat):
        pix = jnp.asarray(pix_np)
        K = ids_mat.shape[1]
        num_chunks = K // chunk
        ids_chunks = ids_mat.reshape(
            num_tiles, num_chunks, chunk).transpose(1, 0, 2)
        Tflat = Tmat.reshape(-1, 9)
        n = Tflat.shape[0]

        def step(carry, ids):
            accum, zacc, T, done, npix = carry
            safe = jnp.maximum(ids, 0)
            alpha, z_px = _surfel_alpha(
                Tflat[safe], zplane[safe], center2d[safe], shift[safe],
                opacities[safe], ids, pix)
            one_m = 1.0 - alpha
            q = T[:, None, :] * jnp.cumprod(one_m, axis=1)
            applied = (q >= t_eps) & ~done[:, None, :]
            a_eff = jnp.where(applied, alpha, 0.0)
            om_eff = 1.0 - a_eff
            T_excl = T[:, None, :] * jnp.concatenate(
                [jnp.ones_like(om_eff[:, :1]),
                 jnp.cumprod(om_eff, axis=1)[:, :-1]], axis=1)
            w = a_eff * T_excl                             # (T, CH, px)
            accum = accum + jnp.einsum("tcp,tcd->tpd", w, colors[safe])
            wz = jax.lax.stop_gradient(w) if DETACH_DEPTH_W else w
            zacc = zacc + jnp.stack(
                [jnp.sum(wz * z_px, axis=1),
                 jnp.sum(wz * z_px * z_px, axis=1)], axis=-1)
            T = T * jnp.prod(om_eff, axis=1)
            done = done | jnp.any(q < t_eps, axis=1)
            # per-splat applied-pixel counts (PixelGS statistic) — only
            # pixels the splat actually contributes to (alpha > 0), not
            # every pixel of every tile it was binned into
            cnt = jnp.sum(applied & (alpha > 0),
                          axis=2).astype(jnp.float32)  # (T, CH)
            sids = jnp.where(ids >= 0, ids, n).reshape(-1)
            npix = npix.at[sids].add(cnt.reshape(-1), mode="drop")
            return (accum, zacc, T, done, npix), None

        init = (
            jnp.zeros((num_tiles, px, nco), jnp.float32),
            jnp.zeros((num_tiles, px, 2), jnp.float32),
            jnp.ones((num_tiles, px), jnp.float32),
            jnp.zeros((num_tiles, px), bool),
            jnp.zeros((n + 1,), jnp.float32),
        )
        (accum, zacc, T, _done, npix), _ = jax.lax.scan(
            jax.checkpoint(step), init, ids_chunks)
        rgb = accum[..., :3] + T[..., None] * background[None, None, :]
        tile_img = jnp.concatenate([rgb, accum[..., 3:], zacc], axis=-1)
        img = _tiles_to_image(tile_img)
        alpha_img = _tiles_to_image(1.0 - T[..., None])[..., 0]
        npix_out = npix[:-1] + npix_sink
        return img, alpha_img, jax.lax.stop_gradient(npix_out)

    return forward


def render_surfels(
    params,                  # GaussianParams
    camera: Camera,
    *,
    sh_degree: int | None = None,
    background: jax.Array | None = None,
    tile_size: int = 16,
    tile_capacity: int = 1024,
    instance_capacity: int | None = None,
    instance_capacity_mult: float = 8.0,
    max_tiles_per_gaussian: int = 64,
    chunk: int = 32,
    t_eps: float = T_EPS,
    absgrad_sink: jax.Array | None = None,
    means2d_sink: jax.Array | None = None,
    npix_sink: jax.Array | None = None,
    override_colors: jax.Array | None = None,
    with_geometry: bool = True,
    **_ignored,
):
    """Exact-2DGS differentiable render. Returns a ``RenderOutput`` whose
    ``extra`` is (H, W, 4): [z, z^2, nx, ny] — per-pixel intersection depth
    moments + composited camera-space normals, premultiplied by compositing
    weight (same contract as the pallas aux-channel path in
    ``train/trainer.py``)."""
    from divshot_tpu.raster.render import RenderOutput
    from divshot_tpu.raster import tiles as _tiles
    from divshot_tpu.splat.sh import eval_sh_color
    from divshot_tpu.splat.math import safe_normalize

    if sh_degree is None:
        sh_degree = params.sh_degree
    if background is None:
        background = jnp.zeros((3,), jnp.float32)

    proj = project_surfels(params.means, params.scales, params.quats, camera)

    if override_colors is not None:
        colors = override_colors
    else:
        dirs = safe_normalize(params.means - camera.campos[None, :])
        colors = eval_sh_color(params.sh0, params.shN, dirs, sh_degree)
    if with_geometry:
        colors = jnp.concatenate([colors, proj["normal_cam"][:, :2]], axis=1)

    opac = params.effective_opacity()

    if instance_capacity is None:
        instance_capacity = max(
            1 << 16, int(instance_capacity_mult * params.capacity))
    bins = _tiles.bin_gaussians(
        jax.lax.stop_gradient(proj["center2d"]),
        jax.lax.stop_gradient(proj["depths"]),
        jax.lax.stop_gradient(proj["radii"]),
        camera.width, camera.height,
        tile_size=tile_size, tile_capacity=tile_capacity,
        instance_capacity=instance_capacity,
        max_tiles_per_gaussian=max_tiles_per_gaussian,
        build_ids_mat=True)

    cap = params.capacity
    if absgrad_sink is None:
        absgrad_sink = jnp.zeros((cap, 2), jnp.float32)
    if means2d_sink is None:
        means2d_sink = jnp.zeros((cap, 2), jnp.float32)
    if npix_sink is None:
        npix_sink = jnp.zeros((cap,), jnp.float32)
    # the virtual screen shift harvests position-sensitivity gradients for
    # densification; both sinks ride the same shift (see module docstring)
    shift = means2d_sink + absgrad_sink

    nch_const = colors.shape[1] - 3
    comp = _make_surfel_compositor(camera.width, camera.height, tile_size,
                                   chunk, nch_const, t_eps)
    img, alpha, npix = comp(
        proj["Tmat"], proj["zplane"], proj["center2d"], shift, colors, opac,
        npix_sink, background, bins.ids_mat)

    rgb = img[..., :3]
    extra = None
    if with_geometry:
        # reorder to [z, z2, nx, ny] (z planes are appended last)
        nxy = img[..., 3:3 + nch_const]
        zz = img[..., 3 + nch_const:]
        extra = jnp.concatenate([zz, nxy], axis=-1)

    from divshot_tpu.raster.project import Projection
    proj_out = Projection(
        means2d=proj["center2d"],
        conics=jnp.zeros((cap, 3), jnp.float32),
        depths=proj["depths"], radii=proj["radii"],
        comp=jnp.ones((cap,), jnp.float32),
        cov2d=jnp.zeros((cap, 3), jnp.float32))
    return RenderOutput(
        rgb, alpha, proj_out, proj["center2d"], absgrad_sink, extra,
        bins.num_instances, jnp.max(bins.tile_counts)), npix
