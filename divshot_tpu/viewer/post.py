"""Post-processing stack: tonemapping + anti-aliasing (TAA) + sharpen.

The reference's L3 post chain (``diverse/source/renderer``: TAA pass +
tonemap/post shaders) rebuilt for the headless renderer:

- tonemap operators: linear (clamp), Reinhard, ACES (Narkowicz fit),
  exposure + gamma;
- TAA: history exponential blend with camera-jittered renders — the
  offline analog accumulates N jittered frames (same estimator as the
  realtime pass at steady state); ``taa_blend`` is the per-frame history
  update for the player loop;
- post sharpen (unsharp mask), the editor's final-output touch-up.

All pure jnp image ops — they fuse into the render epilogue under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


# -- tonemap -----------------------------------------------------------------


def tonemap_linear(img: jax.Array) -> jax.Array:
    return jnp.clip(img, 0.0, 1.0)


def tonemap_reinhard(img: jax.Array) -> jax.Array:
    x = jnp.maximum(img, 0.0)
    return x / (1.0 + x)


def tonemap_aces(img: jax.Array) -> jax.Array:
    """Narkowicz ACES filmic fit."""
    x = jnp.maximum(img, 0.0)
    a, b, c, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    return jnp.clip((x * (a * x + b)) / (x * (c * x + d) + e), 0.0, 1.0)


_TONEMAPS = {"linear": tonemap_linear, "reinhard": tonemap_reinhard,
             "aces": tonemap_aces}


def apply_tonemap(img: jax.Array, operator: str = "linear", *,
                  exposure: float = 0.0, gamma: float = 1.0) -> jax.Array:
    """exposure in stops (2^e), gamma applied after the operator."""
    x = img * (2.0 ** exposure)
    x = _TONEMAPS[operator](x)
    if gamma != 1.0:
        x = jnp.power(jnp.maximum(x, 1e-8), 1.0 / gamma)
    return x


# -- TAA ---------------------------------------------------------------------

# Halton(2,3) jitter sequence — the standard TAA subpixel pattern
def halton(i: int, base: int) -> float:
    f, r = 1.0, 0.0
    while i > 0:
        f /= base
        r += f * (i % base)
        i //= base
    return r


def taa_jitter(frame: int) -> tuple[float, float]:
    """Subpixel jitter in [-0.5, 0.5]² for frame index."""
    return halton(frame % 8 + 1, 2) - 0.5, halton(frame % 8 + 1, 3) - 0.5


def jitter_camera(camera, frame: int):
    """Camera with the TAA subpixel offset applied to the principal
    point (equivalent to a projection-matrix jitter)."""
    jx, jy = taa_jitter(frame)
    return camera.replace(cx=camera.cx + jx, cy=camera.cy + jy)


def taa_blend(history: jax.Array, current: jax.Array,
              alpha: float = 0.1) -> jax.Array:
    """Per-frame TAA history update with neighborhood clamping: the
    history sample is clamped to the 3×3 min/max of the current frame
    (standard ghosting control) before the exponential blend."""
    cur4 = current[None]
    window = (1, 3, 3, 1)
    mx = jax.lax.reduce_window(cur4, -jnp.inf, jax.lax.max, window,
                               (1, 1, 1, 1), "SAME")[0]
    mn = -jax.lax.reduce_window(-cur4, -jnp.inf, jax.lax.max, window,
                                (1, 1, 1, 1), "SAME")[0]
    hist = jnp.clip(history, mn, mx)
    return alpha * current + (1.0 - alpha) * hist


def render_taa(render_fn, camera, n_frames: int = 8) -> jax.Array:
    """Offline TAA: average ``n_frames`` camera-jittered renders (the
    steady state of the realtime accumulation). ``render_fn(camera) ->
    (H, W, C)``."""
    acc = None
    for i in range(n_frames):
        img = render_fn(jitter_camera(camera, i))
        acc = img if acc is None else acc + img
    return acc / n_frames


# -- sharpen -----------------------------------------------------------------


def sharpen(img: jax.Array, amount: float = 0.25) -> jax.Array:
    """Unsharp mask with a 3×3 box blur."""
    x = img[None]
    k = jnp.ones((3, 3, 1, 1), img.dtype) / 9.0
    c = img.shape[-1]
    blur = jax.lax.conv_general_dilated(
        x, jnp.tile(k, (1, 1, 1, c)), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c)[0]
    return jnp.clip(img + amount * (img - blur), 0.0, 1.0)


def post_process(img: jax.Array, *, tonemap: str = "linear",
                 exposure: float = 0.0, gamma: float = 1.0,
                 sharpen_amount: float = 0.0) -> jax.Array:
    """The full post chain in reference order: tonemap -> sharpen."""
    out = apply_tonemap(img, tonemap, exposure=exposure, gamma=gamma)
    if sharpen_amount > 0:
        out = sharpen(out, sharpen_amount)
    return out
