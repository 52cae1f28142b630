"""Global-illumination analogs over the deferred G-buffer (SURVEY §2.4 L3).

TPU-shaped replacement for the reference's GI stack
(``restir_gi.cpp``, ``renderer/rtxdi/*``, ``irache.cpp``, SSGI —
``defered_renderer.cpp:551-735``). The reference builds on RT cores +
per-pixel compute shaders; on TPU the same estimators vectorize over the
whole G-buffer as dense (H, W, ...) array ops:

- **ReSTIR-style direct lighting** (`restir_direct`): resampled importance
  sampling over the scene's analytic lights with per-pixel weighted
  reservoirs, temporal reservoir reuse (carried state pytree) and spatial
  neighbor reuse. One shadow ray per PIXEL (against the chosen reservoir
  sample only — the RTXDI economy) instead of one per light, traced with
  the path tracer's Möller–Trumbore occlusion test.
- **SSGI / irradiance-from-screen** (`ssgi`): horizon-style screen-space
  ambient occlusion + one-bounce indirect from the lit G-buffer, the
  screen-space half of the reference's ircache+SSGI combine.
- `deferred_shade_gi` composes both over `mesh_raster.rasterize_mesh`
  output.

The estimators are unbiased (ReSTIR weights) resp. standard-biased (SSGI
screen-space approximation) — tested against brute-force per-light
integration in ``tests/test_gi.py``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from divshot_tpu.splat.camera import Camera
from divshot_tpu.raster.mesh_raster import GBuffer
from divshot_tpu.raster.path_trace import _gbuffer_world, ray_occluded


class LightsSoA(NamedTuple):
    """Scene lights as dense arrays (L, ...) for vectorized sampling."""
    position: jax.Array    # (L, 3)
    direction: jax.Array   # (L, 3) normalized (spot/directional)
    color: jax.Array       # (L, 3) color * intensity (area-scaled)
    range: jax.Array       # (L,)
    cos_inner: jax.Array   # (L,)
    cos_outer: jax.Array   # (L,)
    is_dir: jax.Array      # (L,) bool
    is_spot: jax.Array     # (L,) bool


def lights_to_soa(lights) -> LightsSoA:
    from divshot_tpu.scene.components import LightType
    pos, dirn, col, rng_, ci, co, isd, iss = [], [], [], [], [], [], [], []
    for lt in lights:
        c = np.asarray(lt.color, np.float32) * float(lt.intensity)
        if lt.type in (LightType.RECT, LightType.DISK, LightType.CYLINDER):
            c = c * max(float(lt.size[0]) * float(lt.size[1]), 1e-4)
        d = np.asarray(lt.direction, np.float32)
        d = d / max(np.linalg.norm(d), 1e-8)
        pos.append(np.asarray(lt.position, np.float32))
        dirn.append(d)
        col.append(c)
        rng_.append(max(float(lt.range), 1e-3))
        ci.append(float(np.cos(getattr(lt, "inner_angle", 0.3))))
        co.append(float(np.cos(getattr(lt, "outer_angle", 0.6))))
        isd.append(lt.type == LightType.DIRECTIONAL)
        iss.append(lt.type == LightType.SPOT)
    f = lambda x, dt=jnp.float32: jnp.asarray(np.stack(x), dt)
    return LightsSoA(f(pos), f(dirn), f(col), jnp.asarray(rng_),
                     jnp.asarray(ci), jnp.asarray(co),
                     jnp.asarray(isd), jnp.asarray(iss))


def _eval_light(soa: LightsSoA, idx, pos_w, n_w):
    """Unshadowed radiance of light ``idx`` (..., int32) at surface points
    pos_w/n_w (..., 3) -> (rgb (..., 3), light_dir (..., 3), dist (...))."""
    lp = soa.position[idx]
    col = soa.color[idx]
    ld_spot = soa.direction[idx]
    to_l = lp - pos_w
    dist = jnp.maximum(jnp.linalg.norm(to_l, axis=-1), 1e-6)
    ldir_pt = to_l / dist[..., None]
    # directional lights: fixed direction, no falloff, "infinite" distance
    ldir = jnp.where(soa.is_dir[idx][..., None], -ld_spot, ldir_pt)
    ndl = jnp.clip(jnp.sum(n_w * ldir, axis=-1), 0.0, 1.0)
    rng_ = soa.range[idx]
    win = jnp.clip(1.0 - (dist / rng_) ** 4, 0.0, 1.0) ** 2
    atten = win / (1.0 + dist * dist)
    cos = jnp.sum(-ldir_pt * ld_spot, axis=-1)
    cone = jnp.clip((cos - soa.cos_outer[idx])
                    / jnp.maximum(soa.cos_inner[idx] - soa.cos_outer[idx],
                                  1e-4), 0.0, 1.0)
    atten = jnp.where(soa.is_spot[idx], atten * cone * cone, atten)
    atten = jnp.where(soa.is_dir[idx], 1.0, atten)
    rgb = col * (ndl * atten)[..., None]
    sh_dist = jnp.where(soa.is_dir[idx], 1e8, dist)
    return rgb, ldir, sh_dist


def _lum(rgb):
    return (0.2126 * rgb[..., 0] + 0.7152 * rgb[..., 1]
            + 0.0722 * rgb[..., 2])


class Reservoir(NamedTuple):
    """Per-pixel weighted reservoir (Bitterli et al. 2020)."""
    y: jax.Array       # (H, W) int32 chosen light index
    w_sum: jax.Array   # (H, W) sum of RIS weights
    m: jax.Array       # (H, W) candidate count
    p_hat: jax.Array   # (H, W) target pdf of the chosen sample


def _reservoir_merge(a: Reservoir, b: Reservoir, u) -> Reservoir:
    """Merge reservoir b into a (standard ReSTIR combine)."""
    w_sum = a.w_sum + b.w_sum
    take_b = u * jnp.maximum(w_sum, 1e-12) < b.w_sum
    return Reservoir(
        y=jnp.where(take_b, b.y, a.y),
        w_sum=w_sum,
        m=a.m + b.m,
        p_hat=jnp.where(take_b, b.p_hat, a.p_hat))


def restir_direct(
    gb: GBuffer,
    camera: Camera,
    soa: LightsSoA,
    key: jax.Array,
    *,
    state: Reservoir | None = None,
    n_candidates: int = 8,
    spatial_taps: int = 2,
    spatial_radius: int = 8,
    m_cap: int = 160,
    occluders: tuple | None = None,    # (positions (V,3), faces (F,3))
    ambient: float = 0.0,
) -> tuple[jax.Array, Reservoir]:
    """ReSTIR direct lighting over the G-buffer.

    -> (shaded rgb (H, W, 3), reservoir state to feed back next frame).
    Temporal reuse assumes a static camera between frames (the viewer
    invalidates state on camera moves); ``m_cap`` bounds temporal history
    so lighting changes still propagate. With ``occluders`` one shadow ray
    per pixel is traced against the chosen sample."""
    H, W = gb.depth.shape
    L = soa.position.shape[0]
    hit = jnp.isfinite(gb.depth)
    pos_w, n_w = _gbuffer_world(gb, camera)

    k_cand, k_res, k_t, k_s = jax.random.split(key, 4)

    # --- candidate generation: M uniform light picks per pixel (RIS) ---
    cand = jax.random.randint(k_cand, (n_candidates, H, W), 0, L)
    us = jax.random.uniform(k_res, (n_candidates, H, W))

    def body(res, inp):
        idx, u = inp
        rgb, _, _ = _eval_light(soa, idx, pos_w, n_w)
        p_hat = _lum(rgb)
        w = p_hat * L                      # p = 1/L uniform source pdf
        w_sum = res.w_sum + w
        take = u * jnp.maximum(w_sum, 1e-12) < w
        return Reservoir(
            y=jnp.where(take, idx, res.y),
            w_sum=w_sum,
            m=res.m + 1,
            p_hat=jnp.where(take, p_hat, res.p_hat)), None

    init = Reservoir(y=jnp.zeros((H, W), jnp.int32),
                     w_sum=jnp.zeros((H, W), jnp.float32),
                     m=jnp.zeros((H, W), jnp.int32),
                     p_hat=jnp.zeros((H, W), jnp.float32))
    res, _ = jax.lax.scan(body, init, (cand, us))

    # --- temporal reuse (clamped history) ---
    if state is not None:
        prev = state
        scale = jnp.minimum(prev.m, m_cap - n_candidates).astype(
            jnp.float32) / jnp.maximum(prev.m.astype(jnp.float32), 1.0)
        prev = Reservoir(y=prev.y, w_sum=prev.w_sum * scale,
                         m=jnp.minimum(prev.m, m_cap - n_candidates),
                         p_hat=prev.p_hat)
        res = _reservoir_merge(res, prev, jax.random.uniform(k_t, (H, W)))

    out_state = res

    # --- spatial reuse (fixed taps; neighbor target re-evaluated here) ---
    if spatial_taps > 0:
        offs = [(spatial_radius, 0), (0, spatial_radius),
                (-spatial_radius, 3), (5, -spatial_radius)][:spatial_taps]
        ks = jax.random.split(k_s, len(offs))
        for (dy, dx), kk in zip(offs, ks):
            nb = Reservoir(
                y=jnp.roll(res.y, (dy, dx), (0, 1)),
                w_sum=jnp.roll(res.w_sum, (dy, dx), (0, 1)),
                m=jnp.roll(res.m, (dy, dx), (0, 1)),
                p_hat=jnp.roll(res.p_hat, (dy, dx), (0, 1)))
            # re-evaluate the neighbor's sample at OUR surface point
            rgb_n, _, _ = _eval_light(soa, nb.y, pos_w, n_w)
            p_here = _lum(rgb_n)
            ratio = p_here / jnp.maximum(nb.p_hat, 1e-12)
            nb = Reservoir(y=nb.y, w_sum=nb.w_sum * ratio, m=nb.m,
                           p_hat=p_here)
            res = _reservoir_merge(res, nb,
                                   jax.random.uniform(kk, (H, W)))

    # --- final shading: W_Y = w_sum / (M * p_hat(Y)) ---
    rgb_y, ldir, sh_dist = _eval_light(soa, res.y, pos_w, n_w)
    W_y = res.w_sum / jnp.maximum(
        res.m.astype(jnp.float32) * res.p_hat, 1e-12)
    radiance = rgb_y * W_y[..., None]

    if occluders is not None:
        positions, faces = occluders
        origins = (pos_w + n_w * 1e-3).reshape(-1, 3)
        occ = ray_occluded(
            origins, ldir.reshape(-1, 3), positions, faces,
            t_max=jnp.minimum(sh_dist, 1e7).reshape(-1) - 2e-3
        ).reshape(H, W)
        radiance = jnp.where(occ[..., None], 0.0, radiance)

    img = gb.albedo * (radiance + ambient)
    return jnp.where(hit[..., None], img, 0.0), out_state


def ssgi(
    gb: GBuffer,
    camera: Camera,
    lit: jax.Array,            # (H, W, 3) direct-lit radiance (pre-albedo
                               # or post — bled as-is)
    key: jax.Array,
    *,
    taps: int = 8,
    radius_px: int = 24,
    indirect_strength: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Screen-space AO + one-bounce indirect (the SSGI half of the
    reference's GI combine). -> (ao (H, W) in [0,1], indirect (H, W, 3)).

    For each pixel, ``taps`` spiral samples fetch neighbor position,
    normal and lit radiance; the horizon term gives occlusion, the
    form-factor-weighted neighbor radiance gives one bounce of color
    bleed. Pure gathers over dense images — no rays, fully fused."""
    H, W = gb.depth.shape
    hit = jnp.isfinite(gb.depth)
    pos_w, n_w = _gbuffer_world(gb, camera)

    ang0 = jax.random.uniform(key, (H, W)) * (2.0 * np.pi)
    yy = jnp.arange(H)[:, None]
    xx = jnp.arange(W)[None, :]

    ao_acc = jnp.zeros((H, W), jnp.float32)
    ind_acc = jnp.zeros((H, W, 3), jnp.float32)
    for t in range(taps):
        ang = ang0 + (t * 2.399963)             # golden-angle spiral
        r = radius_px * float((t + 0.7) / taps)
        sy = jnp.clip((yy + (r * jnp.sin(ang))).astype(jnp.int32), 0, H - 1)
        sx = jnp.clip((xx + (r * jnp.cos(ang))).astype(jnp.int32), 0, W - 1)
        p_s = pos_w[sy, sx]
        n_s = n_w[sy, sx]
        lit_s = lit[sy, sx]
        hit_s = hit[sy, sx]
        d = p_s - pos_w
        dist2 = jnp.sum(d * d, axis=-1)
        dist = jnp.sqrt(jnp.maximum(dist2, 1e-12))
        dirn = d / dist[..., None]
        cos_i = jnp.clip(jnp.sum(n_w * dirn, axis=-1), 0.0, 1.0)
        cos_j = jnp.clip(-jnp.sum(n_s * dirn, axis=-1), 0.0, 1.0)
        # horizon occlusion: nearby sample above the tangent plane occludes
        occ = cos_i * jnp.clip(1.0 - dist / 0.8, 0.0, 1.0)
        ao_acc = ao_acc + jnp.where(hit_s, occ, 0.0)
        # one-bounce form factor (clamped to tame the 1/r^2 singularity)
        ff = cos_i * cos_j / (1.0 + dist2 * 4.0)
        ind_acc = ind_acc + jnp.where(
            hit_s[..., None], lit_s * ff[..., None], 0.0)

    ao = jnp.clip(1.0 - ao_acc / taps, 0.0, 1.0)
    indirect = ind_acc * (indirect_strength / taps)
    ao = jnp.where(hit, ao, 1.0)
    return ao, jnp.where(hit[..., None], indirect, 0.0)


def deferred_shade_gi(
    gb: GBuffer,
    camera: Camera,
    lights,
    key: jax.Array,
    *,
    state: Reservoir | None = None,
    occluders: tuple | None = None,
    with_ssgi: bool = True,
    ambient: float = 0.05,
) -> tuple[jax.Array, Reservoir]:
    """Full GI combine over a G-buffer: ReSTIR direct + SSGI AO/indirect.
    -> (rgb (H, W, 3), reservoir state)."""
    soa = lights_to_soa(lights)
    k1, k2 = jax.random.split(key)
    direct, res = restir_direct(gb, camera, soa, k1, state=state,
                                occluders=occluders, ambient=ambient)
    if with_ssgi:
        ao, indirect = ssgi(gb, camera, direct, k2)
        img = direct * ao[..., None] + gb.albedo * indirect
    else:
        img = direct
    return img, res
