"""Training losses: L1 + SSIM (weights per reference default ssimWeight=0.2,
SURVEY §2.9), PSNR metric, optional normal-consistency (2DGS) hooks.

SSIM follows the standard 11×11 Gaussian-window formulation used by 3DGS
(sigma 1.5, K1 0.01, K2 0.03) — implemented as two separable depthwise
convolutions, which XLA maps onto the TPU convolution units.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _gauss_window(size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _band_matrix(n: int, size: int, sigma: float) -> np.ndarray:
    """(n, n) banded Toeplitz blur matrix (zero 'SAME' padding semantics).
    Separable blur as two MXU matmuls beats a C=3 depthwise conv on TPU."""
    w = _gauss_window(size, sigma)
    m = np.zeros((n, n), np.float32)
    half = size // 2
    for j, wj in enumerate(w):
        off = j - half
        idx = np.arange(max(0, -off), min(n, n - off))
        m[idx, idx + off] = wj
    return m


def _blur(img: jax.Array, size: int = 11, sigma: float = 1.5) -> jax.Array:
    """Separable gaussian blur of (H, W, C) with SAME padding, on the MXU."""
    h, w = img.shape[0], img.shape[1]
    bh = jnp.asarray(_band_matrix(h, size, sigma))
    bw = jnp.asarray(_band_matrix(w, size, sigma))
    x = jnp.einsum("hk,kwc->hwc", bh, img, precision="highest")
    return jnp.einsum("wk,hkc->hwc", bw, x, precision="highest")


def ssim(img1: jax.Array, img2: jax.Array, *, size: int = 11,
         sigma: float = 1.5) -> jax.Array:
    """Mean SSIM over an (H, W, C) pair in [0, 1]."""
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    mu1 = _blur(img1, size, sigma)
    mu2 = _blur(img2, size, sigma)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _blur(img1 * img1, size, sigma) - mu1_sq
    s2 = _blur(img2 * img2, size, sigma) - mu2_sq
    s12 = _blur(img1 * img2, size, sigma) - mu12
    m = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return jnp.mean(m)


def l1(img1: jax.Array, img2: jax.Array) -> jax.Array:
    return jnp.mean(jnp.abs(img1 - img2))


def photometric_loss(pred: jax.Array, gt: jax.Array,
                     ssim_weight: float | jax.Array = 0.2,
                     use_ssim: bool | None = None) -> jax.Array:
    """(1-w)·L1 + w·(1-SSIM) — the reference trainer's loss (SURVEY §3.3).

    ``ssim_weight`` may be a traced scalar (live config); the structural
    decision to compute SSIM at all is then taken from ``use_ssim``."""
    if use_ssim is None:
        use_ssim = isinstance(ssim_weight, jax.Array) or ssim_weight > 0
    loss = (1.0 - ssim_weight) * l1(pred, gt)
    if use_ssim:
        loss = loss + ssim_weight * (1.0 - ssim(pred, gt))
    return loss


def psnr(pred: jax.Array, gt: jax.Array) -> jax.Array:
    mse = jnp.mean((pred - gt) ** 2)
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-10))
