"""Minimal path-traced render mode for mesh + splat scenes.

The reference's default render mode is a path tracer
(``RenderMode::PT``, ``render_settings.h:34``; ``path_tracing.cpp``) over
its RT acceleration structures. The TPU-native analog here: primary
visibility comes from the z-buffered G-buffer raster (``mesh_raster.py`` —
on TPU, rasterization IS the fast primary-ray query), and secondary rays
(one cosine-sampled environment bounce + a sun shadow ray) run as batched
Möller–Trumbore intersection tests scanned over the triangle list — fully
static shapes, VPU-friendly, no BVH (XLA has no pointer chasing; for the
scene sizes the hybrid editor composites, brute-force chunked
intersection is bandwidth-trivial).

Splats composite over the path-traced surface through the shared hybrid
depth test (``composite_splats_over_mesh``), mirroring
``defered_renderer.cpp:786,806`` (PT pipeline then splats).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from divshot_tpu.splat.camera import Camera
from divshot_tpu.raster.mesh_raster import (GBuffer, rasterize_mesh,
                                            composite_splats_over_mesh)
from divshot_tpu.models.background import sample_envmap

_EPS = 1e-4


def ray_occluded(origins: jax.Array,      # (M, 3)
                 dirs: jax.Array,         # (M, 3) normalized
                 positions: jax.Array,    # (V, 3)
                 faces: jax.Array,        # (F, 3)
                 *, t_min: float = 1e-3, chunk: int = 256,
                 t_max: jax.Array | None = None) -> jax.Array:
    """-> (M,) bool: does any triangle block the ray in (t_min, t_max)?
    Möller–Trumbore, scanned over face chunks (static shapes). ``t_max``
    (scalar or (M,)) bounds shadow rays toward area/point lights (gi.py);
    None = unbounded."""
    F = faces.shape[0]
    pad = (-F) % chunk
    tri = positions[faces]                               # (F, 3, 3)
    if pad:
        tri = jnp.concatenate(
            [tri, jnp.zeros((pad, 3, 3), tri.dtype)], axis=0)
    tri_c = tri.reshape(-1, chunk, 3, 3)

    def step(occ, t3):
        v0, e1, e2 = (t3[:, 0], t3[:, 1] - t3[:, 0], t3[:, 2] - t3[:, 0])
        # (M, C, 3) broadcasts
        h = jnp.cross(dirs[:, None, :], e2[None, :, :])
        det = jnp.sum(e1[None] * h, axis=-1)             # (M, C)
        inv = jnp.where(jnp.abs(det) > 1e-12, 1.0 / det, 0.0)
        s = origins[:, None, :] - v0[None, :, :]
        u = jnp.sum(s * h, axis=-1) * inv
        q = jnp.cross(s, e1[None, :, :])
        v = jnp.sum(dirs[:, None, :] * q, axis=-1) * inv
        t = jnp.sum(e2[None] * q, axis=-1) * inv
        hit = ((jnp.abs(det) > 1e-12) & (u >= 0) & (v >= 0)
               & (u + v <= 1) & (t > t_min))
        if t_max is not None:
            tm = t_max if jnp.ndim(t_max) == 0 else t_max[:, None]
            hit = hit & (t < tm)
        return occ | jnp.any(hit, axis=1), None

    occ, _ = jax.lax.scan(step, jnp.zeros(origins.shape[0], bool), tri_c)
    return occ


def _gbuffer_world(gb: GBuffer, camera: Camera):
    """Reconstruct world-space hit positions and normals from the
    camera-space G-buffer."""
    H, W = gb.depth.shape
    x = (jnp.arange(W, dtype=jnp.float32) + 0.5 - camera.cx) / camera.fx
    y = (jnp.arange(H, dtype=jnp.float32) + 0.5 - camera.cy) / camera.fy
    d = jnp.where(jnp.isfinite(gb.depth), gb.depth, 0.0)
    pos_cam = jnp.stack(
        [x[None, :] * d, y[:, None] * d, d], axis=-1)    # (H, W, 3)
    R = camera.viewmat[:3, :3]
    t = camera.viewmat[:3, 3]
    pos_w = jnp.einsum("ji,hwj->hwi", R, pos_cam - t[None, None, :])
    n_w = jnp.einsum("ji,hwj->hwi", R, gb.normal)
    return pos_w, n_w


def _cosine_dirs(n: jax.Array, key: jax.Array):
    """Cosine-weighted hemisphere directions around normals n (..., 3)."""
    k1, k2 = jax.random.split(key)
    u1 = jax.random.uniform(k1, n.shape[:-1])
    u2 = jax.random.uniform(k2, n.shape[:-1])
    r = jnp.sqrt(u1)
    phi = 2.0 * jnp.pi * u2
    lx = r * jnp.cos(phi)
    ly = r * jnp.sin(phi)
    lz = jnp.sqrt(jnp.maximum(1.0 - u1, 0.0))
    # build a tangent basis (Frisvad-style, branchless)
    up = jnp.where(jnp.abs(n[..., 2:3]) < 0.9,
                   jnp.asarray([0.0, 0.0, 1.0]),
                   jnp.asarray([1.0, 0.0, 0.0]))
    tgt = jnp.cross(up, n)
    tgt = tgt / jnp.maximum(
        jnp.linalg.norm(tgt, axis=-1, keepdims=True), 1e-8)
    btg = jnp.cross(n, tgt)
    return (tgt * lx[..., None] + btg * ly[..., None]
            + n * lz[..., None])


class PTOutput(NamedTuple):
    image: jax.Array     # (H, W, 3) path-traced mesh radiance (0 on miss)
    gbuffer: GBuffer


def path_trace_mesh(positions: jax.Array, faces: jax.Array, camera: Camera,
                    envmap: jax.Array, key: jax.Array, *,
                    normals: jax.Array | None = None,
                    colors: jax.Array | None = None,
                    face_colors: jax.Array | None = None,
                    n_samples: int = 8,
                    sun_dir=(0.4, -0.8, 0.45),
                    sun_radiance: float = 2.0,
                    instance_capacity: int = 1 << 18) -> PTOutput:
    """One-bounce Monte Carlo: per G-buffer hit, cosine-sampled env
    irradiance with triangle-occluded visibility + a sun shadow ray.
    Lo = albedo * (1/N sum_s vis_s * env(dir_s)  +  vis_sun * sun * n.l)
    (the cosine pdf cancels the n.l factor of the env term)."""
    gb = rasterize_mesh(positions, faces, camera, normals=normals,
                        colors=colors, face_colors=face_colors,
                        instance_capacity=instance_capacity)
    pos_w, n_w = _gbuffer_world(gb, camera)
    H, W = gb.depth.shape
    hit = jnp.isfinite(gb.depth)
    org = (pos_w + n_w * 1e-3).reshape(-1, 3)

    def sample(carry, k):
        dirs = _cosine_dirs(n_w, k)
        occ = ray_occluded(org, dirs.reshape(-1, 3), positions, faces)
        vis = jnp.where(occ.reshape(H, W) | ~hit, 0.0, 1.0)
        rad = sample_envmap(envmap, dirs)
        return carry + vis[..., None] * rad, None

    keys = jax.random.split(key, n_samples)
    amb, _ = jax.lax.scan(sample, jnp.zeros((H, W, 3)), keys)
    amb = amb / n_samples

    sd = jnp.asarray(sun_dir, jnp.float32)
    sd = sd / jnp.linalg.norm(sd)
    ndl = jnp.clip(jnp.sum(n_w * sd[None, None, :], axis=-1), 0.0, 1.0)
    occ_sun = ray_occluded(org, jnp.broadcast_to(sd, org.shape),
                           positions, faces)
    vis_sun = jnp.where(occ_sun.reshape(H, W) | ~hit, 0.0, 1.0)
    direct = (vis_sun * ndl * sun_radiance)[..., None]

    img = gb.albedo * (amb + direct)
    return PTOutput(image=jnp.where(hit[..., None], img, 0.0), gbuffer=gb)


def render_hybrid_pt(splat_out, positions, faces, camera, envmap, key, *,
                     splat_depth, n_samples: int = 8, background=None,
                     **mesh_kw):
    """Full PT-mode frame: path-traced mesh surface + splats composited
    over with the hybrid depth test (PT analog of scene_render's
    raster-mode composite)."""
    pt = path_trace_mesh(positions, faces, camera, envmap, key,
                         n_samples=n_samples, **mesh_kw)
    img = composite_splats_over_mesh(
        splat_out.image, splat_out.alpha, splat_depth, pt.gbuffer,
        pt.image, background=background)
    return img, pt
