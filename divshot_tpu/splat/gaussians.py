"""The Gaussian splat model as a JAX pytree.

Mirrors the reference's in-memory splat SoA (``assets/gaussian_model.h:134-150``:
pos, shs_0, shs_n, opacities(logit), scales(log), rot(quat wxyz), splat_state)
but laid out TPU-first: capacity-padded static-shape arrays with an alive mask,
so densify/prune never changes array shapes under jit (the reference similarly
pre-allocates ``max_splats``-scaled GPU buffers, ``gaussian_model.cpp:249-256``).

Storage conventions (identical to reference / standard 3DGS PLY):
  - ``scales`` stores log-scale; world scale = exp(scales)
    (``gaussian_model.cpp:148-152``).
  - ``opacity`` stores logits; alpha = sigmoid(opacity).
  - ``quats`` stored (w, x, y, z), NOT pre-normalized
    (``gsplat_vs.hlsl:189-193`` reads r=q.x x=q.y y=q.z z=q.w).
  - ``sh0`` is the DC term f_dc (3,), ``shN`` the 15 higher coeffs, each RGB —
    coefficient-major (``tiny_gsplat.hpp:262-269``).
  - ``state`` is the editing bitfield: op_state(8b: 1=SELECT 2=HIDE 4=DELETE
    8=PAINT) | op_flag(8b) | transform_index(16b)
    (``assets/gaussian_model.h:9-39``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

# Editing state bits (assets/gaussian_model.h:9-13)
STATE_SELECT = 0x1
STATE_HIDE = 0x2
STATE_DELETE = 0x4
STATE_PAINT = 0x8

SH_C0 = 0.28209479177387814


@struct.dataclass
class GaussianParams:
    """Capacity-padded splat parameters. All arrays have leading dim = capacity.

    ``alive`` marks real splats; padded tail rows are dead (alive=False) and are
    forced to zero-opacity before rasterization so they never contribute.
    """

    means: jax.Array      # (C, 3) f32 world positions
    scales: jax.Array     # (C, 3) f32 log-scales
    quats: jax.Array      # (C, 4) f32 (w, x, y, z), unnormalized
    opacity: jax.Array    # (C,)   f32 logits
    sh0: jax.Array        # (C, 3) f32 DC SH coeff (f_dc)
    shN: jax.Array        # (C, 15, 3) f32 higher SH coeffs
    alive: jax.Array      # (C,)   bool

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def num_alive(self) -> jax.Array:
        return jnp.sum(self.alive.astype(jnp.int32))

    @property
    def sh_degree(self) -> int:
        n = self.shN.shape[1]
        return {0: 0, 3: 1, 8: 2, 15: 3}[n]

    def effective_opacity(self) -> jax.Array:
        """Sigmoid opacity with dead splats zeroed."""
        return jnp.where(self.alive, jax.nn.sigmoid(self.opacity), 0.0)

    @classmethod
    def create(
        cls,
        means: np.ndarray | jax.Array,
        *,
        scales: np.ndarray | jax.Array | None = None,
        quats: np.ndarray | jax.Array | None = None,
        opacity: np.ndarray | jax.Array | None = None,
        sh0: np.ndarray | jax.Array | None = None,
        shN: np.ndarray | jax.Array | None = None,
        sh_degree: int = 3,
        capacity: int | None = None,
    ) -> "GaussianParams":
        """Build params from (possibly partial) raw arrays, padding to capacity."""
        means = jnp.asarray(means, jnp.float32)
        n = means.shape[0]
        cap = capacity if capacity is not None else n
        if cap < n:
            raise ValueError(f"capacity {cap} < num splats {n}")
        n_sh = {0: 0, 1: 3, 2: 8, 3: 15}[sh_degree]

        def mk(x, shape, fill=0.0):
            if x is None:
                x = jnp.full((n, *shape), fill, jnp.float32)
            else:
                x = jnp.asarray(x, jnp.float32).reshape((n, *shape))
            return x

        scales = mk(scales, (3,), np.log(0.01))
        quats_ = mk(quats, (4,))
        if quats is None:
            quats_ = quats_.at[:, 0].set(1.0)
        opacity_ = mk(opacity, ()).reshape(n)
        sh0 = mk(sh0, (3,))
        shN = mk(shN, (n_sh, 3)) if n_sh else jnp.zeros((n, 0, 3), jnp.float32)
        alive = jnp.ones((n,), bool)

        def pad(x, fill=0.0):
            if cap == n:
                return x
            pad_width = [(0, cap - n)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, pad_width, constant_values=fill)

        # padded (dead) slots must stay numerically benign: identity quats
        # (zero quats have NaN normalize grads), far-negative opacity logits
        quats_pad = pad(quats_)
        if cap > n:
            quats_pad = quats_pad.at[n:, 0].set(1.0)
        return cls(
            means=pad(means), scales=pad(scales, float(np.log(0.01))),
            quats=quats_pad,
            opacity=pad(opacity_, -15.0), sh0=pad(sh0), shN=pad(shN),
            alive=pad(alive),
        )

    def compact_numpy(self) -> dict[str, np.ndarray]:
        """Host-side view with dead/padded splats removed (for export)."""
        alive = np.asarray(self.alive)
        out = {}
        for k in ("means", "scales", "quats", "opacity", "sh0", "shN"):
            # f32 view regardless of training-buffer packing (packLevel)
            out[k] = np.asarray(getattr(self, k)).astype(
                np.float32, copy=False)[alive]
        return out


def init_from_points(
    points: np.ndarray,
    colors: np.ndarray,
    *,
    sh_degree: int = 3,
    capacity: int | None = None,
    init_opacity: float = 0.1,
) -> GaussianParams:
    """Initialize splats from an SfM sparse cloud, 3DGS-paper style:

    scale = log(mean distance to 3 nearest neighbors) isotropic, identity
    rotation, opacity logit of ``init_opacity``, DC SH from RGB.
    """
    points = np.asarray(points, np.float32)
    colors = np.asarray(colors, np.float32)
    n = points.shape[0]

    # kNN mean distance (3 neighbors) via KD-tree (the reference's
    # simple_knn CUDA kernel equivalent; host-side here — init is one-shot)
    try:
        from scipy.spatial import cKDTree
        knn_d, _idx = cKDTree(points).query(points, k=4, workers=-1)
        d2_mean = (knn_d[:, 1:4].astype(np.float32) ** 2).mean(axis=1)
    except ImportError:  # chunked O(n^2) fallback
        d2_mean = np.empty((n,), np.float32)
        chunk = 4096
        for s in range(0, n, chunk):
            e = min(s + chunk, n)
            d2 = (
                np.sum(points[s:e, None, :] ** 2, -1).astype(np.float32)
                + np.sum(points[None, :, :] ** 2, -1)
                - 2.0 * points[s:e] @ points.T
            )
            np.maximum(d2, 1e-10, out=d2)
            idx = np.argpartition(d2, 3, axis=1)[:, :4]
            vals = np.take_along_axis(d2, idx, axis=1)
            vals.sort(axis=1)
            d2_mean[s:e] = vals[:, 1:4].mean(axis=1)  # skip self (dist 0)
    dist = np.sqrt(np.maximum(d2_mean, 1e-7))
    log_scales = np.repeat(np.log(dist)[:, None], 3, axis=1)

    sh0 = (colors - 0.5) / SH_C0
    opacity = np.full((n,), float(np.log(init_opacity / (1 - init_opacity))), np.float32)
    return GaussianParams.create(
        points, scales=log_scales, opacity=opacity, sh0=sh0,
        sh_degree=sh_degree, capacity=capacity,
    )
