"""Core splat geometry math: quaternions, 3D covariances.

Formulas match the reference's ``gsplat_vs.hlsl:169-209`` (computeCov3D) /
standard 3DGS conventions. Vectorized over the leading splat axis — pure VPU
work under XLA.
"""

from __future__ import annotations

import jax.numpy as jnp
import jax


def quat_to_rotmat(quats: jnp.ndarray, normalize: bool = True) -> jnp.ndarray:
    """(..., 4) wxyz quaternions -> (..., 3, 3) rotation matrices.

    Matches ``gsplat_vs.hlsl:189-205`` (r=q.w-component first).
    """
    if normalize:
        # sqrt(max(s, eps)) keeps the backward finite at q == 0 (padded
        # slots) — jnp.linalg.norm's vjp is NaN exactly at zero
        s = jnp.sum(quats * quats, axis=-1, keepdims=True)
        quats = quats / jnp.sqrt(jnp.maximum(s, 1e-12))
    w, x, y, z = (quats[..., i] for i in range(4))
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ],
        -2,
    )


def build_cov3d(log_scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """log-scales (..., 3) + quats (..., 4) -> full cov3D (..., 3, 3).

    cov = R S S^T R^T  with S = diag(exp(log_scales)); reference
    ``gsplat_vs.hlsl:207-209`` (M = R*S; cov = M M^T).
    """
    R = quat_to_rotmat(quats)
    S = jnp.exp(log_scales)
    M = R * S[..., None, :]  # R @ diag(S)
    # precision="highest": TPU MXU would otherwise run this f32 matmul in
    # bf16, which is far too coarse for covariance geometry.
    return jnp.einsum("...ij,...kj->...ik", M, M, precision="highest")


def quat_rotmat_components(quats: jnp.ndarray, normalize: bool = True):
    """(..., 4) wxyz -> the 9 rotation-matrix entries as (...,) arrays
    (row-major). Scalar-component form: at reference scale a materialized
    (N, 3, 3) f32 pads (3, 3) -> the (4, 128)-tile on TPU — a 56.9x memory
    blowup (measured 5.7 GB per intermediate at N = 3M)."""
    if normalize:
        s = jnp.sum(quats * quats, axis=-1, keepdims=True)
        quats = quats / jnp.sqrt(jnp.maximum(s, 1e-12))
    w, x, y, z = (quats[..., i] for i in range(4))
    return (1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y))


def cov3d_flat(log_scales: jnp.ndarray, quats: jnp.ndarray):
    """cov3D = R S S^T R^T in flat symmetric form: 6 (...,) components
    (xx, xy, xz, yy, yz, zz) computed scalar-wise — no (N, 3, 3)
    materialization (see quat_rotmat_components)."""
    r = quat_rotmat_components(quats)
    s2 = jnp.exp(2.0 * log_scales)
    s0, s1, s2_ = s2[..., 0], s2[..., 1], s2[..., 2]

    def dot_rows(a, b):
        return (r[3 * a] * r[3 * b] * s0 + r[3 * a + 1] * r[3 * b + 1] * s1
                + r[3 * a + 2] * r[3 * b + 2] * s2_)

    return (dot_rows(0, 0), dot_rows(0, 1), dot_rows(0, 2),
            dot_rows(1, 1), dot_rows(1, 2), dot_rows(2, 2))


def cov3d_packed(log_scales: jnp.ndarray, quats: jnp.ndarray) -> jnp.ndarray:
    """Upper-triangular packing (..., 6): xx, xy, xz, yy, yz, zz."""
    return jnp.stack(cov3d_flat(log_scales, quats), -1)


def safe_normalize(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Unit-normalize with a NaN-free vjp at x == 0 (sqrt(max(s, eps)))."""
    s = jnp.sum(x * x, axis=-1, keepdims=True)
    return x / jnp.sqrt(jnp.maximum(s, eps))


def normalize_quats(quats: jnp.ndarray) -> jnp.ndarray:
    s = jnp.sum(quats * quats, axis=-1, keepdims=True)
    return quats / jnp.sqrt(jnp.maximum(s, 1e-12))


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) wxyz. Branch-free Shepperd via jnp.where."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def case0():
        s = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2
        return jnp.stack([0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s], -1)

    def case1():
        s = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2
        return jnp.stack([(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s], -1)

    def case2():
        s = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-12)) * 2
        return jnp.stack([(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s], -1)

    def case3():
        s = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-12)) * 2
        return jnp.stack([(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s], -1)

    q0, q1, q2, q3 = case0(), case1(), case2(), case3()
    c1 = (m00 > m11) & (m00 > m22)
    c2 = m11 > m22
    q_neg = jnp.where(c1[..., None], q1, jnp.where(c2[..., None], q2, q3))
    q = jnp.where((tr > 0)[..., None], q0, q_neg)
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)


def quat_multiply(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of wxyz quaternions."""
    aw, ax, ay, az = (a[..., i] for i in range(4))
    bw, bx, by, bz = (b[..., i] for i in range(4))
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        -1,
    )


def matvec3(R, x):
    """Batched 3-vector rotation: out[..., i] = Σ_j R[i, j] · x[..., j].

    Written elementwise on purpose — an (N, 3) × (3, 3) ``dot`` at
    ``precision="highest"`` takes XLA MINUTES to compile at N ≈ 10⁶ on both
    the TPU and CPU backends (measured: 300-470 s at N = 2^19 for the
    single einsum, vs ~1 s for this form), and elementwise FMA is exact
    f32 anyway."""
    return jnp.stack(
        [R[0, 0] * x[..., 0] + R[0, 1] * x[..., 1] + R[0, 2] * x[..., 2],
         R[1, 0] * x[..., 0] + R[1, 1] * x[..., 1] + R[1, 2] * x[..., 2],
         R[2, 0] * x[..., 0] + R[2, 1] * x[..., 1] + R[2, 2] * x[..., 2]],
        axis=-1)


def dot3(r, x):
    """Batched dot with one 3-vector: out[...] = Σ_j r[j] · x[..., j]
    (same compile-time rationale as ``matvec3``)."""
    return r[0] * x[..., 0] + r[1] * x[..., 1] + r[2] * x[..., 2]
