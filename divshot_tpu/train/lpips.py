"""LPIPS perceptual distance (Zhang et al. 2018), JAX implementation.

The metric is a channel-normalized, linearly-weighted L2 over VGG-16 conv
feature stacks. The NETWORK here is complete and jit-compatible; the
pretrained VGG-16 + LPIPS linear weights cannot ship with this repo (the
build container has no network egress and no cached torchvision/lpips
checkpoints — see BASELINE.md "LPIPS availability"). Drop a weights file at
``DIVSHOT_LPIPS_WEIGHTS`` (or pass ``weights_path``) to enable it:

    weights.npz with arrays
      features.<i>.weight / features.<i>.bias   (torchvision VGG-16 conv
                                                 layout, i in VGG16_CONV)
      lin.<k>.weight                            (LPIPS linear heads, k 0..4)

``lpips_fn(weights)`` then returns a jittable (img_a, img_b) -> scalar in
[0, ~1). ``evaluate()`` reports the metric automatically when weights are
present.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# torchvision VGG-16 conv indices and the slice boundaries after which
# LPIPS taps features (relu1_2, relu2_2, relu3_3, relu4_3, relu5_3)
VGG16_CONV = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
_TAPS = (2, 7, 14, 21, 28)          # conv index whose relu output is tapped
_POOL_AFTER = (2, 7, 14, 21)        # maxpool after these taps

# ImageNet normalization LPIPS uses (on [-1, 1]-scaled input)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_weights(path: str) -> dict:
    """weights.npz -> {conv_idx: (w (kh,kw,cin,cout), b), "lin": [5 x (c,)]}"""
    z = np.load(path)
    out = {}
    for i in VGG16_CONV:
        w = z[f"features.{i}.weight"]          # torch (cout, cin, kh, kw)
        out[i] = (jnp.asarray(w.transpose(2, 3, 1, 0)),
                  jnp.asarray(z[f"features.{i}.bias"]))
    out["lin"] = [jnp.asarray(z[f"lin.{k}.weight"].reshape(-1))
                  for k in range(5)]
    return out


def _conv(x, w, b):
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + b[None, None, None, :]


def _features(img, weights):
    """img (H, W, 3) in [0, 1] -> list of 5 tapped feature maps."""
    x = img[None] * 2.0 - 1.0
    x = (x - _SHIFT[None, None, None, :]) / _SCALE[None, None, None, :]
    feats = []
    for i in VGG16_CONV:
        w, b = weights[i]
        x = jax.nn.relu(_conv(x, w, b))
        if i in _TAPS:
            feats.append(x)
        if i in _POOL_AFTER:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID")
    return feats


def _unit_norm(f, eps=1e-10):
    return f * jax.lax.rsqrt(jnp.sum(f * f, axis=-1, keepdims=True) + eps)


def lpips_fn(weights: dict):
    """-> jittable (img_a (H,W,3), img_b (H,W,3)) -> scalar LPIPS."""

    def fn(a, b):
        fa = _features(a, weights)
        fb = _features(b, weights)
        total = 0.0
        for k, (x, y) in enumerate(zip(fa, fb)):
            d = _unit_norm(x) - _unit_norm(y)
            d2 = jnp.sum(d * d * weights["lin"][k][None, None, None, :],
                         axis=-1)
            total = total + jnp.mean(d2)
        return total

    return fn


@functools.lru_cache(maxsize=1)
def default_lpips():
    """The metric from $DIVSHOT_LPIPS_WEIGHTS, or None when no pretrained
    weights are available (this build container — see module docstring)."""
    path = os.environ.get("DIVSHOT_LPIPS_WEIGHTS", "")
    if path and os.path.exists(path):
        return lpips_fn(load_weights(path))
    return None
