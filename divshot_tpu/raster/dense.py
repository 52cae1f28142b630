"""Dense reference rasterizer: exact front-to-back alpha compositing of every
gaussian against every pixel, as a ``lax.scan`` over depth-sorted chunks.

This is the test oracle for the tiled/Pallas rasterizer (SURVEY §4.2:
"Pallas rasterizer forward vs pure-jnp dense reference") and a usable
fallback renderer for small scenes. Differentiable by autodiff through the
scan; no custom VJP needed.

Compositing math identical to the reference's fragment path
(``gsplat_ps.hlsl``: alpha = min(0.99, a·exp(falloff)), skip < 1/255,
front-to-back premultiplied blend) but with the trainer's gaussian falloff
exp(-0.5 xᵀ Σ⁻¹ x) rather than the viewer's quad-uv approximation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from divshot_tpu.raster.project import Projection

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.999


def composite_dense(
    proj: Projection,
    colors: jax.Array,      # (N, 3) per-splat RGB (SH already evaluated)
    opacities: jax.Array,   # (N,) post-sigmoid
    width: int,
    height: int,
    *,
    chunk: int = 256,
    background: jax.Array | None = None,
    falloff: str = "gaussian",
) -> tuple[jax.Array, jax.Array]:
    """Returns (image (H, W, 3), alpha (H, W)).

    ``falloff`` selects the fragment response (the analog of the
    reference's gsplat_ps pixel-shader modes): "gaussian" (default),
    "ring" (ellipse outlines at the 2σ contour — Rings render type) or
    "solid" (opaque inside 2σ — Ellipsoids render type)."""
    n = proj.means2d.shape[0]
    n_pad = (n + chunk - 1) // chunk * chunk

    visible = proj.radii > 0
    op_eff = jnp.where(visible, opacities * proj.comp, 0.0)

    # front-to-back order; culled splats get +inf depth so they land at the end
    order = jnp.argsort(jnp.where(visible, proj.depths, jnp.inf))

    def pad_gather(x, fill=0.0):
        x = x[order]
        return jnp.pad(x, [(0, n_pad - n)] + [(0, 0)] * (x.ndim - 1),
                       constant_values=fill)

    means2d = pad_gather(proj.means2d)
    conics = pad_gather(proj.conics)
    cols = pad_gather(colors)
    ops = pad_gather(op_eff)

    px = jnp.arange(width, dtype=jnp.float32) + 0.5
    py = jnp.arange(height, dtype=jnp.float32) + 0.5
    gx, gy = jnp.meshgrid(px, py)            # (H, W)
    pix = jnp.stack([gx, gy], -1).reshape(-1, 2)  # (P, 2)

    def step(carry, inp):
        accum, T = carry                      # (P, 3), (P,)
        m2d, con, col, op = inp               # (chunk, ...)
        d = pix[None, :, :] - m2d[:, None, :]           # (chunk, P, 2)
        dx, dy = d[..., 0], d[..., 1]
        power = -0.5 * (con[:, None, 0] * dx * dx + con[:, None, 2] * dy * dy) \
            - con[:, None, 1] * dx * dy
        if falloff == "ring":
            r = jnp.sqrt(jnp.maximum(-2.0 * power, 0.0))   # mahalanobis dist
            alpha = jnp.where((jnp.abs(r - 2.0) < 0.15) & (op[:, None] > 0),
                              ALPHA_MAX, 0.0)
        elif falloff == "solid":
            alpha = jnp.where((power >= -2.0) & (op[:, None] > 0),
                              ALPHA_MAX, 0.0)
        else:
            alpha = jnp.minimum(op[:, None] * jnp.exp(power), ALPHA_MAX)
            alpha = jnp.where((power <= 0) & (alpha >= ALPHA_MIN), alpha, 0.0)

        # sequential front-to-back inside the chunk, vectorized over pixels:
        # T_within[i] = prod_{j<i}(1-alpha_j)
        one_m = 1.0 - alpha                               # (chunk, P)
        # exclusive prefix product of (1 - alpha) down the depth order
        T_excl = jnp.concatenate(
            [jnp.ones_like(one_m[:1]), jnp.cumprod(one_m, axis=0)[:-1]], axis=0)
        w = alpha * T_excl * T[None, :]                   # (chunk, P)
        accum = accum + jnp.einsum("cp,cd->pd", w, col)
        T = T * jnp.prod(one_m, axis=0)
        return (accum, T), None

    init = (jnp.zeros((pix.shape[0], 3)), jnp.ones((pix.shape[0],)))
    chunks = jax.tree.map(
        lambda x: x.reshape(n_pad // chunk, chunk, *x.shape[1:]),
        (means2d, conics, cols, ops),
    )
    (accum, T), _ = jax.lax.scan(step, init, chunks)

    img = accum.reshape(height, width, 3)
    alpha_img = (1.0 - T).reshape(height, width)
    if background is not None:
        img = img + T.reshape(height, width, 1) * background
    return img, alpha_img
