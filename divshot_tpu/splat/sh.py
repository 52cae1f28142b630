"""Real spherical-harmonics evaluation (degree 0..3) and SH rotation.

Constants and basis ordering identical to the reference
(``gsplat_sh.hlsl:40-63``, graphdeco sh_utils): coefficient index k maps to
(l, m) in the order [ (1,-1),(1,0),(1,1), (2,-2)..(2,2), (3,-3)..(3,3) ] with
the graphdeco sign conventions baked into the constants.

SH rotation (used when baking entity transforms into saved splats — reference
``utility/sh_utils.h:9-14`` SHRotation, callers ``gaussian_model.cpp:407``)
is implemented by the exact projection method: per band l, solve the (2l+1)²
rotation block from SH values at fixed sample directions.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

SH_C0 = 0.28209479177387814
SH_C1 = 0.4886025119029199
SH_C2 = (1.0925484305920792, -1.0925484305920792, 0.31539156525252005,
         -1.0925484305920792, 0.5462742152960396)
SH_C3 = (-0.5900435899266435, 2.890611442640554, -0.4570457994644658,
         0.3731763325901154, -0.4570457994644658, 1.445305721320277,
         -0.5900435899266435)

NUM_SH_REST = {0: 0, 1: 3, 2: 8, 3: 15}


def eval_sh_basis(dirs: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Evaluate SH basis funcs (without DC) at unit dirs (..., 3).

    Returns (..., NUM_SH_REST[degree]) basis values matching
    ``gsplat_sh.hlsl:66-112`` term-for-term, so
    color = 0.5 + SH_C0*sh0 + sum_k basis[k] * shN[k].
    """
    if degree == 0:
        return jnp.zeros((*dirs.shape[:-1], 0), dirs.dtype)
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        out += [
            SH_C2[0] * xy,
            SH_C2[1] * yz,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * xz,
            SH_C2[4] * (xx - yy),
        ]
    if degree >= 3:
        out += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * xy * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return jnp.stack(out, -1)


def eval_sh_color(sh0: jnp.ndarray, shN: jnp.ndarray, dirs: jnp.ndarray,
                  degree: int | None = None) -> jnp.ndarray:
    """color = 0.5 + SH_C0*sh0 + basis·shN, clamped >= 0 (3DGS convention)."""
    if degree is None:
        degree = {0: 0, 3: 1, 8: 2, 15: 3}[shN.shape[-2]]
    color = 0.5 + SH_C0 * sh0
    if degree > 0:
        basis = eval_sh_basis(dirs, degree)  # (..., K)
        n = NUM_SH_REST[degree]
        color = color + jnp.einsum("...k,...kc->...c", basis, shN[..., :n, :])
    return jnp.maximum(color, 0.0)


# ---------------------------------------------------------------------------
# SH rotation


def _sh_basis_np(dirs: np.ndarray, degree: int) -> np.ndarray:
    """float64 numpy twin of eval_sh_basis (for exact rotation solves)."""
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    out = [-SH_C1 * y, SH_C1 * z, -SH_C1 * x]
    if degree >= 2:
        xx, yy, zz = x * x, y * y, z * z
        out += [
            SH_C2[0] * x * y, SH_C2[1] * y * z,
            SH_C2[2] * (2.0 * zz - xx - yy),
            SH_C2[3] * x * z, SH_C2[4] * (xx - yy),
        ]
    if degree >= 3:
        out += [
            SH_C3[0] * y * (3.0 * xx - yy),
            SH_C3[1] * x * y * z,
            SH_C3[2] * y * (4.0 * zz - xx - yy),
            SH_C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            SH_C3[4] * x * (4.0 * zz - xx - yy),
            SH_C3[5] * z * (xx - yy),
            SH_C3[6] * x * (xx - 3.0 * yy),
        ]
    return np.stack(out, -1)


_BAND_SLICE = {1: slice(0, 3), 2: slice(3, 8), 3: slice(8, 15)}

# Fixed well-conditioned sample directions per band (any set generic enough
# to make the per-band basis matrix invertible works).
_SAMPLES = {
    1: np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float64),
    2: np.array(
        [[1, 2, 3], [-2, 1, 2], [3, -1, 2], [1, 1, -1], [2, -3, 1]],
        np.float64,
    ),
    3: np.array(
        [[1, 2, 3], [-2, 1, 2], [3, -1, 2], [1, 1, -1], [2, -3, 1],
         [-1, -2, 2], [3, 2, -1]], np.float64,
    ),
}
for _k, _v in _SAMPLES.items():
    _SAMPLES[_k] = _v / np.linalg.norm(_v, axis=1, keepdims=True)


def sh_rotation_matrix(R: np.ndarray, degree: int = 3) -> np.ndarray:
    """Block-diagonal rotation matrix M (K, K) over the rest coefficients such
    that sh'_new = M @ sh_rest rotates the radiance field by world rotation R.

    Exact for each band: with basis row-vector b(d), invariance requires
    b(R^T d') @ sh = b(d') @ sh'; solving over samples gives
    M_l = (b(samples))^-1 @ b(samples @ R)  — note b(s @ R) rows are
    b(R^T s_i) since s_i are row vectors.
    """
    R = np.asarray(R, np.float64)
    K = NUM_SH_REST[degree]
    M = np.zeros((K, K))
    for band in range(1, degree + 1):
        s = _SAMPLES[band]
        A = _sh_basis_np(s, band)[:, _BAND_SLICE[band]]
        B = _sh_basis_np(s @ R, band)[:, _BAND_SLICE[band]]
        M_l = np.linalg.solve(A, B)
        M[_BAND_SLICE[band], _BAND_SLICE[band]] = M_l
    return M


def rotate_sh(shN: jnp.ndarray, R: np.ndarray, degree: int | None = None) -> jnp.ndarray:
    """Rotate rest SH coeffs (N, K, 3) by world-space rotation R (3, 3)."""
    if degree is None:
        degree = {0: 0, 3: 1, 8: 2, 15: 3}[shN.shape[-2]]
    if degree == 0:
        return shN
    K = NUM_SH_REST[degree]
    M = jnp.asarray(sh_rotation_matrix(np.asarray(R), degree), shN.dtype)
    out = jnp.einsum("jk,nkc->njc", M, shN[..., :K, :])
    if shN.shape[-2] > K:
        out = jnp.concatenate([out, shN[..., K:, :]], axis=-2)
    return out
