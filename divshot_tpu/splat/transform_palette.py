"""SplatTransformPalette — deferred 16-bit-indexed per-splat transforms.

Reference: ``diverse/source/assets/splat_transform_palette.h:13-39`` — the
editor stores a palette of affine transforms and a per-splat u16 palette
index; splats render through their palette entry without rewriting the
model until a bake is requested. TPU take: entries live on the host (edits
are host events), ``apply`` lowers to one masked pass per non-identity
entry (palettes are small; a (N, 15, 15) SH-rotation gather would burn
~1 GB at 1M splats, the per-entry ``where`` passes are free).

Entry 0 is always the identity. Indices are stored i32 but the palette is
capped at 65536 entries (u16 semantics, same as the reference).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from divshot_tpu.splat.gaussians import GaussianParams
from divshot_tpu.splat.math import matvec3
from divshot_tpu.splat.sh import rotate_sh

MAX_ENTRIES = 65536


def _polar_decompose(m: np.ndarray):
    """4x4 affine -> (R (3,3), uniform log-scale, t (3,))."""
    A = np.asarray(m, np.float64)[:3, :3]
    t = np.asarray(m, np.float64)[:3, 3]
    u, _s, vt = np.linalg.svd(A)
    R = u @ vt
    if np.linalg.det(R) < 0:
        u[:, -1] *= -1
        R = u @ vt
    log_s = np.log(max(np.cbrt(max(np.linalg.det(A), 1e-12)), 1e-12))
    return R.astype(np.float32), np.float32(log_s), t.astype(np.float32)


class SplatTransformPalette:
    """Host-side palette + device-side per-splat indices."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.matrices: list[np.ndarray] = [np.eye(4, dtype=np.float32)]
        self.indices = jnp.zeros((capacity,), jnp.int32)

    @property
    def num_entries(self) -> int:
        return len(self.matrices)

    def add(self, matrix: np.ndarray) -> int:
        """-> palette slot for ``matrix`` (new or existing identical)."""
        m = np.asarray(matrix, np.float32).reshape(4, 4)
        for i, e in enumerate(self.matrices):
            if np.array_equal(e, m):
                return i
        if len(self.matrices) >= MAX_ENTRIES:
            raise ValueError("transform palette full (65536 entries)")
        self.matrices.append(m)
        return len(self.matrices) - 1

    def assign(self, mask: jax.Array, slot: int) -> None:
        """Point splats under ``mask`` at palette entry ``slot``."""
        if not 0 <= slot < len(self.matrices):
            raise IndexError(slot)
        self.indices = jnp.where(mask, jnp.int32(slot), self.indices)

    def clear(self) -> None:
        self.matrices = [np.eye(4, dtype=np.float32)]
        self.indices = jnp.zeros((self.capacity,), jnp.int32)

    def apply(self, params: GaussianParams) -> GaussianParams:
        """Deferred transforms applied (render-time view; params on disk
        stay untouched until a bake)."""
        from divshot_tpu.edit.ops import quat_multiply, _rotmat_to_quat_np

        means, quats, scales, shN = (params.means, params.quats,
                                     params.scales, params.shN)
        degree = {0: 0, 3: 1, 8: 2, 15: 3}[shN.shape[1]]
        for slot in range(1, len(self.matrices)):
            m = self.matrices[slot]
            R, log_s, t = _polar_decompose(m)
            sel = self.indices == slot
            nm = matvec3(jnp.asarray(m[:3, :3]), means) + jnp.asarray(
                m[:3, 3])
            rq = jnp.asarray(_rotmat_to_quat_np(R), jnp.float32)
            nq = quat_multiply(jnp.tile(rq[None], (self.capacity, 1)),
                               quats)
            ns = scales + log_s
            means = jnp.where(sel[:, None], nm, means)
            quats = jnp.where(sel[:, None], nq, quats)
            scales = jnp.where(sel[:, None], ns, scales)
            if degree > 0:
                nsh = rotate_sh(shN, R, degree)
                shN = jnp.where(sel[:, None, None], nsh, shN)
        return params.replace(means=means, quats=quats, scales=scales,
                              shN=shN)

    def bake(self, params: GaussianParams) -> GaussianParams:
        """Materialize all entries into the params and reset the palette
        (the reference's palette flatten)."""
        out = self.apply(params)
        self.clear()
        return out
