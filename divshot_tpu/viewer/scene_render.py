"""Scene rendering — walks entities like the reference's DeferedRenderer
ECS pass (``defered_renderer.cpp:263-320``): per-entity transform baking,
color grading, crop masks, render types (Splat/Point/Depth/Normal/Rings/
Ellipsoids/Centers, ``gaussian_component.h:7-16``), environment background
compositing."""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from divshot_tpu.scene import (
    Scene, Entity, GaussianComponent, GaussianRenderType, Environment)
from divshot_tpu.splat.camera import Camera
from divshot_tpu.splat.gaussians import GaussianParams
from divshot_tpu.raster.render import render
from divshot_tpu.raster.project import project_gaussians
from divshot_tpu.raster import dense as _dense
from divshot_tpu.splat.sh import eval_sh_color, rotate_sh
from divshot_tpu.splat.math import quat_multiply


def transform_params(params: GaussianParams, m: np.ndarray) -> GaussianParams:
    """Bake a rigid(+uniform scale) 4x4 transform into splat params,
    rotating quats and SH (gaussian_model.cpp:407 SHRotation semantics)."""
    m = np.asarray(m, np.float64)
    if np.allclose(m, np.eye(4)):
        return params
    A = m[:3, :3]
    u, _sv, vt = np.linalg.svd(A)
    Rm = u @ vt
    if np.linalg.det(Rm) < 0:
        u[:, -1] *= -1
        Rm = u @ vt
    s = float(np.cbrt(max(abs(np.linalg.det(A)), 1e-12)))

    from divshot_tpu.edit.ops import _rotmat_to_quat_np
    rq = jnp.asarray(
        np.tile(_rotmat_to_quat_np(Rm), (params.capacity, 1)), jnp.float32)
    from divshot_tpu.splat.math import matvec3
    means = matvec3(jnp.asarray(m[:3, :3], jnp.float32), params.means) \
        + jnp.asarray(m[:3, 3], jnp.float32)
    shN = params.shN
    if shN.shape[1]:
        shN = rotate_sh(shN, Rm)
    return params.replace(
        means=means, quats=quat_multiply(rq, params.quats),
        scales=params.scales + float(np.log(max(s, 1e-12))), shN=shN)


def _depth_image(params, camera, **rk):
    """Alpha-normalized composite of camera-space depth -> grayscale."""
    Rv = camera.viewmat[:3, :3]
    tz = camera.viewmat[2, 3]
    from divshot_tpu.splat.math import dot3
    z = dot3(Rv[2], params.means) + tz
    aux = jnp.tile(z[:, None], (1, 3))
    out = render(params, camera, override_colors=aux, **rk)
    alpha = jnp.maximum(out.alpha, 1e-6)
    depth = out.image[..., 0] / alpha
    lo = jnp.nanpercentile(jnp.where(out.alpha > 0.1, depth, jnp.nan), 5)
    hi = jnp.nanpercentile(jnp.where(out.alpha > 0.1, depth, jnp.nan), 95)
    lo = jnp.nan_to_num(lo, nan=0.0)
    hi = jnp.nan_to_num(hi, nan=1.0)
    g = jnp.clip((depth - lo) / jnp.maximum(hi - lo, 1e-6), 0, 1)
    g = jnp.where(out.alpha > 1e-3, g, 1.0)
    return jnp.stack([g, g, g], -1), out.alpha


def _normal_image(params, camera, **rk):
    from divshot_tpu.train import geometry as G
    n_world = G.splat_normals(params, camera)
    aux = n_world * 0.5 + 0.5
    out = render(params, camera, override_colors=aux, **rk)
    alpha = jnp.maximum(out.alpha, 1e-6)
    img = jnp.clip(out.image / alpha[..., None], 0, 1)
    img = jnp.where(out.alpha[..., None] > 1e-3, img, 0.0)
    return img, out.alpha


def _debug_ellipse_image(params, camera, falloff, color=None, **_rk):
    """Rings / Ellipsoids / Centers debug modes via the dense compositor
    (editor debug views — clarity over speed)."""
    proj = project_gaussians(params.means, params.scales, params.quats,
                             camera)
    if color is None:
        from divshot_tpu.splat.math import safe_normalize
        dirs = safe_normalize(params.means - camera.campos[None, :])
        colors = eval_sh_color(params.sh0, params.shN, dirs, 0)
    else:
        colors = jnp.tile(jnp.asarray(color, jnp.float32)[None, :],
                          (params.capacity, 1))
    img, alpha = _dense.composite_dense(
        proj, colors, params.effective_opacity(), camera.width,
        camera.height, falloff=falloff)
    return img, alpha


def render_component(comp: GaussianComponent, camera: Camera,
                     world: np.ndarray | None = None,
                     **rk) -> tuple[jax.Array, jax.Array]:
    """-> (rgb, alpha) for one gaussian component honoring its settings."""
    params = comp.graded_params()
    if world is not None:
        params = transform_params(params, world)
    ty = comp.render_type
    rk.setdefault("sh_degree", min(comp.sh_degree, params.sh_degree))

    if ty == GaussianRenderType.SPLAT:
        out = render(params, camera, **rk)
        return out.image, out.alpha
    if ty == GaussianRenderType.DEPTH:
        return _depth_image(params, camera, **rk)
    if ty == GaussianRenderType.NORMAL:
        return _normal_image(params, camera, **rk)
    if ty in (GaussianRenderType.POINT, GaussianRenderType.CENTERS):
        # splat centers as small fixed-size dots (gs_point_vs overlays)
        tiny = params.replace(
            scales=jnp.full_like(params.scales, np.log(1e-3)),
            opacity=jnp.full_like(params.opacity, 8.0))
        color = (1.0, 1.0, 1.0) if ty == GaussianRenderType.CENTERS else None
        return _debug_ellipse_image(tiny, camera, "solid", color=color)
    if ty == GaussianRenderType.RINGS:
        return _debug_ellipse_image(params, camera, "ring")
    if ty == GaussianRenderType.ELLIPSOIDS:
        return _debug_ellipse_image(params, camera, "solid")
    raise ValueError(f"unknown render type {ty}")


def render_scene(scene: Scene, camera: Camera, **rk) -> np.ndarray:
    """Render all active gaussian entities back-to-front over the scene's
    environment background. -> (H, W, 3) float image."""
    env = None
    for e in scene.entities_with(Environment):
        if e.active:
            env = e.get(Environment)
            break
    bg = env.sample_background(camera.width, camera.height) if env \
        else np.zeros((camera.height, camera.width, 3), np.float32)

    layers = []
    for e in scene.entities_with(GaussianComponent):
        comp = e.get(GaussianComponent)
        if not e.active or comp.skip_render or not comp.participate_render:
            continue
        world = e.world_transform(scene)
        img, alpha = render_component(comp, camera, world, **rk)
        # entity ordering by camera distance of the splat centroid
        params = comp.load()
        centroid = np.asarray(
            jnp.mean(jnp.where(params.alive[:, None], params.means, 0.0),
                     axis=0))
        dist = float(np.linalg.norm(centroid - np.asarray(camera.campos)))
        layers.append((dist, np.asarray(img), np.asarray(alpha)))

    out = np.asarray(bg, np.float32).copy()
    for _dist, img, alpha in sorted(layers, key=lambda t: -t[0]):
        out = img + (1.0 - alpha[..., None]) * out
    return out


# -- selection overlays ------------------------------------------------------
# gsplat_vs.hlsl:362-369: selected splats tint toward the highlight color
# in-shader; the editor draws an outline pass around the selection.


SELECT_TINT = np.asarray([1.0, 0.45, 0.05], np.float32)   # editor orange


def render_with_selection(params: GaussianParams, camera: Camera,
                          selected: jnp.ndarray, *,
                          tint_strength: float = 0.55,
                          **rk) -> tuple[jax.Array, jax.Array]:
    """Splat render with selected splats tinted toward the highlight color
    (per-splat color override through the shared compositor — the in-shader
    ``selected ? lerp(color, tint)`` of the reference)."""
    from divshot_tpu.splat.sh import eval_sh_color
    from divshot_tpu.splat.math import safe_normalize

    dirs = safe_normalize(params.means - camera.campos[None, :])
    colors = eval_sh_color(params.sh0, params.shN, dirs,
                           rk.pop("sh_degree", params.sh_degree))
    tint = jnp.asarray(SELECT_TINT)
    colors = jnp.where(selected[:, None],
                       (1 - tint_strength) * colors + tint_strength * tint,
                       colors)
    out = render(params, camera, override_colors=colors, **rk)
    return out.image, out.alpha


def selection_outline(params: GaussianParams, camera: Camera,
                      selected: jnp.ndarray, *,
                      thickness: int = 2, **rk) -> jax.Array:
    """(H, W) outline mask of the selection silhouette: render the selected
    subset's alpha, threshold, and take the morphological edge (dilate —
    erode) — the editor's outline pass."""
    sub = params.replace(alive=params.alive & selected)
    out = render(sub, camera, **rk)
    hard = (out.alpha > 0.35).astype(jnp.float32)[None, :, :, None]
    k = 2 * thickness + 1
    window = (1, k, k, 1)
    dil = jax.lax.reduce_window(hard, -jnp.inf, jax.lax.max, window,
                                (1, 1, 1, 1), "SAME")
    ero = -jax.lax.reduce_window(-hard, -jnp.inf, jax.lax.max, window,
                                 (1, 1, 1, 1), "SAME")
    return (dil - ero)[0, :, :, 0]


def composite_outline(image: jax.Array, outline: jax.Array,
                      color=(1.0, 0.6, 0.1)) -> jax.Array:
    """Draw the outline mask over an image."""
    c = jnp.asarray(color, jnp.float32)
    return image * (1.0 - outline[..., None]) + outline[..., None] * c
