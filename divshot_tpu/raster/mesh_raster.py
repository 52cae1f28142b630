"""Mesh G-buffer rasterization + splat compositing (XLA).

The reference renders meshes through a deferred G-buffer pass and
composites gaussians over them with depth testing
(``diverse/source/renderer/defered_renderer.cpp:551-735``; picking buffer
ibid). TPU-native take: triangles are binned to 16×16 tiles with the SAME
scatter-free machinery as splats (a triangle's screen AABB is a
center+radius), then a per-tile ``lax.scan`` z-buffers (depth, triangle id)
and interpolates attributes — fully static shapes, no atomics.

Outputs (the G-buffer): depth (inf = miss), camera-space normal, albedo,
triangle id (-1 = miss; the PICKING buffer — ``editor.cpp`` object picking
reads exactly this).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from divshot_tpu.splat.camera import Camera
from divshot_tpu.splat.math import matvec3
from divshot_tpu.raster import tiles as T


class GBuffer(NamedTuple):
    depth: jax.Array    # (H, W) view z, +inf on miss
    normal: jax.Array   # (H, W, 3) camera-space
    albedo: jax.Array   # (H, W, 3)
    tri_id: jax.Array   # (H, W) int32, -1 on miss


def _project_tris(positions, faces, camera: Camera):
    """-> per-face screen vertices (F, 3, 2), view-space z (F, 3),
    cam-space vertex positions (F, 3, 3)."""
    R = camera.viewmat[:3, :3]
    t = camera.viewmat[:3, 3]
    pv = matvec3(R, positions) + t                     # (V, 3) camera space
    z = jnp.maximum(pv[:, 2], 1e-6)
    u = camera.fx * pv[:, 0] / z + camera.cx
    v = camera.fy * pv[:, 1] / z + camera.cy
    scr = jnp.stack([u, v], -1)                        # (V, 2)
    return scr[faces], pv[faces][..., 2], pv[faces]


def rasterize_mesh(
    positions: jax.Array,      # (V, 3) world
    faces: jax.Array,          # (F, 3) int32
    camera: Camera,
    *,
    normals: jax.Array | None = None,      # (V, 3) world, per-vertex
    colors: jax.Array | None = None,       # (V, 3) per-vertex albedo
    face_colors: jax.Array | None = None,  # (F, 3) per-face albedo
    tile_size: int = 16,
    tile_capacity: int = 256,
    instance_capacity: int = 1 << 18,
    chunk: int = 16,
) -> GBuffer:
    """Z-buffered G-buffer rasterization of a triangle mesh."""
    W, H = camera.width, camera.height
    tw, th = T._tile_grid(W, H, tile_size)
    num_tiles = tw * th
    px = tile_size * tile_size
    F = faces.shape[0]

    scr, zf, pvf = _project_tris(positions, faces, camera)  # (F,3,2),(F,3)
    front = jnp.all(zf > 1e-4, axis=1)
    lo = jnp.min(scr, axis=1)
    hi = jnp.max(scr, axis=1)
    center = 0.5 * (lo + hi)
    radius = jnp.ceil(0.5 * jnp.max(hi - lo, axis=1)) + 1.0
    radius = jnp.where(front, radius, 0.0)
    depth_c = jnp.mean(zf, axis=1)

    bins = T.bin_gaussians(center, depth_c, radius, W, H,
                           tile_size=tile_size, tile_capacity=tile_capacity,
                           instance_capacity=instance_capacity,
                           max_tiles_per_gaussian=256, build_ids_mat=True)
    ids_mat = bins.ids_mat                              # (T, K)

    R = camera.viewmat[:3, :3]
    if normals is not None:
        ncam = matvec3(R, normals)                      # (V, 3) camera
        nrm_f = ncam[faces]                             # (F, 3v, 3)
    else:
        e1 = pvf[:, 1] - pvf[:, 0]
        e2 = pvf[:, 2] - pvf[:, 0]
        fn = jnp.cross(e1, e2)
        fn = fn / jnp.maximum(jnp.linalg.norm(fn, axis=1, keepdims=True),
                              1e-12)
        nrm_f = jnp.repeat(fn[:, None, :], 3, axis=1)
    if colors is not None:
        col_f = colors[faces]                           # (F, 3v, 3)
    elif face_colors is not None:
        col_f = jnp.repeat(face_colors[:, None, :], 3, axis=1)
    else:
        col_f = jnp.full((F, 3, 3), 0.8, jnp.float32)

    pix = jnp.asarray(T._pixel_coords(W, H, tile_size))   # (T, px, 2)
    K = ids_mat.shape[1]
    nchunk = K // chunk
    ids_c = ids_mat.reshape(num_tiles, nchunk, chunk).transpose(1, 0, 2)

    def step(carry, ids):
        zb, nb, ab, ib = carry
        safe = jnp.maximum(ids, 0)                      # (T, C)
        v2 = scr[safe]                                  # (T, C, 3, 2)
        zc = zf[safe]                                   # (T, C, 3)
        # barycentric via edge functions, per pixel
        ax = v2[..., 0, 0][..., None]
        ay = v2[..., 0, 1][..., None]
        bx = v2[..., 1, 0][..., None]
        by = v2[..., 1, 1][..., None]
        cx = v2[..., 2, 0][..., None]
        cy = v2[..., 2, 1][..., None]
        pxx = pix[:, None, :, 0]
        pyy = pix[:, None, :, 1]
        den = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
        den_ok = jnp.abs(den) > 1e-12
        den_s = jnp.where(den_ok, den, 1.0)
        w0 = ((by - cy) * (pxx - cx) + (cx - bx) * (pyy - cy)) / den_s
        w1 = ((cy - ay) * (pxx - cx) + (ax - cx) * (pyy - cy)) / den_s
        w2 = 1.0 - w0 - w1
        inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0) & den_ok \
            & (ids[..., None] >= 0)
        # perspective-correct: interpolate 1/z and attr/z
        iz = w0 / zc[..., 0:1] + w1 / zc[..., 1:2] + w2 / zc[..., 2:3]
        zpx = 1.0 / jnp.maximum(iz, 1e-12)              # (T, C, px)
        zpx = jnp.where(inside, zpx, jnp.inf)
        # nearest triangle in this chunk per pixel
        arg = jnp.argmin(zpx, axis=1)                   # (T, px)
        zbest = jnp.take_along_axis(zpx, arg[:, None, :], axis=1)[:, 0]
        better = zbest < zb                             # (T, px)

        # interpolate normal + albedo of the chunk-winning triangle
        a_n = nrm_f[safe]                               # (T, C, 3, 3)
        a_c = col_f[safe]
        wst = jnp.stack([w0, w1, w2], axis=-1)          # (T, C, px, 3)
        izc = 1.0 / zc                                  # (T, C, 3)
        wz = wst * izc[:, :, None, :]                   # (T, C, px, 3)
        n_px = jnp.einsum("tcpv,tcvd->tcpd", wz, a_n) * zpx[..., None]
        c_px = jnp.einsum("tcpv,tcvd->tcpd", wz, a_c) * zpx[..., None]
        nbest = jnp.take_along_axis(
            n_px, arg[:, None, :, None], axis=1)[:, 0]
        cbest = jnp.take_along_axis(
            c_px, arg[:, None, :, None], axis=1)[:, 0]
        ibest = jnp.take_along_axis(
            jnp.where(jnp.isfinite(zpx), safe[..., None], -1),
            arg[:, None, :], axis=1)[:, 0]

        zb = jnp.where(better, zbest, zb)
        nb = jnp.where(better[..., None], nbest, nb)
        ab = jnp.where(better[..., None], cbest, ab)
        ib = jnp.where(better, ibest, ib)
        return (zb, nb, ab, ib), None

    init = (jnp.full((num_tiles, px), jnp.inf),
            jnp.zeros((num_tiles, px, 3)),
            jnp.zeros((num_tiles, px, 3)),
            jnp.full((num_tiles, px), -1, jnp.int32))
    (zb, nb, ab, ib), _ = jax.lax.scan(step, init, ids_c)

    def to_img(rows, c):
        img = rows.reshape(th, tw, tile_size, tile_size, c)
        img = img.transpose(0, 2, 1, 3, 4).reshape(
            th * tile_size, tw * tile_size, c)
        return img[:H, :W]

    return GBuffer(
        depth=to_img(zb[..., None], 1)[..., 0],
        normal=to_img(nb, 3),
        albedo=to_img(ab, 3),
        tri_id=to_img(ib[..., None].astype(jnp.float32), 1)[..., 0]
        .astype(jnp.int32),
    )


def shade_gbuffer(gb: GBuffer, *, light_dir=(0.4, -0.7, -0.6),
                  ambient: float = 0.35) -> jax.Array:
    """Simple lambertian shade of the G-buffer (camera-space light)."""
    ld = jnp.asarray(light_dir, jnp.float32)
    ld = ld / jnp.linalg.norm(ld)
    ndl = jnp.clip(-jnp.sum(gb.normal * ld, axis=-1), 0.0, 1.0)
    hit = jnp.isfinite(gb.depth)
    rgb = gb.albedo * (ambient + (1 - ambient) * ndl)[..., None]
    return jnp.where(hit[..., None], rgb, 0.0)


def shade_gbuffer_lights(gb: GBuffer, camera, lights, *,
                         ambient: float = 0.15) -> jax.Array:
    """Shade the G-buffer with the scene's analytic Light descriptors
    (``scene/component/light/*`` analog): DIRECTIONAL, POINT (smooth range
    falloff), SPOT (inner/outer cone); RECT/DISK/CYLINDER approximate as
    point lights at their center with area-scaled intensity — the same
    class of approximation the reference's raster lighting combine uses
    for area lights outside the RT path.

    ``lights`` is a list of ``scene.components.Light``. Positions and
    directions are world-space; the G-buffer normal is camera-space, so
    shading happens in world space via the camera rotation."""
    from divshot_tpu.scene.components import LightType
    H, W = gb.depth.shape
    hit = jnp.isfinite(gb.depth)
    # world-space reconstruction (shared with the path tracer)
    x = (jnp.arange(W, dtype=jnp.float32) + 0.5 - camera.cx) / camera.fx
    y = (jnp.arange(H, dtype=jnp.float32) + 0.5 - camera.cy) / camera.fy
    d = jnp.where(hit, gb.depth, 0.0)
    pos_cam = jnp.stack([x[None, :] * d, y[:, None] * d, d], axis=-1)
    R = camera.viewmat[:3, :3]
    t = camera.viewmat[:3, 3]
    pos_w = jnp.einsum("ji,hwj->hwi", R, pos_cam - t[None, None, :])
    n_w = jnp.einsum("ji,hwj->hwi", R, gb.normal)

    radiance = jnp.full((H, W, 3), ambient, jnp.float32)
    for lt in lights:
        col = jnp.asarray(lt.color, jnp.float32) * float(lt.intensity)
        if lt.type == LightType.DIRECTIONAL:
            ld = jnp.asarray(lt.direction, jnp.float32)
            ld = ld / jnp.maximum(jnp.linalg.norm(ld), 1e-8)
            ndl = jnp.clip(-jnp.sum(n_w * ld, axis=-1), 0.0, 1.0)
            radiance = radiance + ndl[..., None] * col
            continue
        if lt.type in (LightType.RECT, LightType.DISK,
                       LightType.CYLINDER):
            area = max(float(lt.size[0]) * float(lt.size[1]), 1e-4)
            col = col * area
        lp = jnp.asarray(lt.position, jnp.float32)
        to_l = lp[None, None, :] - pos_w
        dist = jnp.maximum(jnp.linalg.norm(to_l, axis=-1), 1e-6)
        ldir = to_l / dist[..., None]
        ndl = jnp.clip(jnp.sum(n_w * ldir, axis=-1), 0.0, 1.0)
        rng = max(float(lt.range), 1e-3)
        # UE-style smooth range window over inverse-square falloff
        win = jnp.clip(1.0 - (dist / rng) ** 4, 0.0, 1.0) ** 2
        atten = win / (1.0 + dist * dist)
        if lt.type == LightType.SPOT:
            sd = jnp.asarray(lt.direction, jnp.float32)
            sd = sd / jnp.maximum(jnp.linalg.norm(sd), 1e-8)
            cos = jnp.sum(-ldir * sd[None, None, :], axis=-1)
            ci = float(np.cos(lt.inner_angle))
            co = float(np.cos(lt.outer_angle))
            cone = jnp.clip((cos - co) / max(ci - co, 1e-4), 0.0, 1.0)
            atten = atten * cone * cone
        radiance = radiance + (ndl * atten)[..., None] * col

    rgb = gb.albedo * radiance
    return jnp.where(hit[..., None], rgb, 0.0)


def composite_splats_over_mesh(splat_rgb, splat_alpha, splat_depth,
                               gb: GBuffer, mesh_rgb, background=None):
    """Hybrid composite (deferred_renderer depth-test analog): where the
    mesh surface is closer than the splat volume's mean depth, mesh shades
    in front; otherwise splats blend over the mesh (which replaces the
    background for rays that hit it)."""
    if background is None:
        background = jnp.zeros((3,), jnp.float32)
    hit = jnp.isfinite(gb.depth)
    mesh_col = jnp.where(hit[..., None], mesh_rgb,
                         background[None, None, :])
    splat_front = (~hit) | (splat_depth <= gb.depth)
    # splats in front: standard over; mesh in front: mesh occludes
    over = splat_rgb + (1.0 - splat_alpha)[..., None] * mesh_col
    return jnp.where(splat_front[..., None], over, mesh_col)


def pick_triangle(gb: GBuffer, x: int, y: int) -> int:
    """Object/face picking: the triangle id under a pixel (-1 = none)."""
    return int(gb.tri_id[y, x])
