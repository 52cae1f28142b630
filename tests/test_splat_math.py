"""Unit tests for quaternion / covariance / SH math (SURVEY §4.1)."""

import numpy as np
import jax
import jax.numpy as jnp

from divshot_tpu.splat.math import (
    quat_to_rotmat, build_cov3d, rotmat_to_quat, quat_multiply)
from divshot_tpu.splat.sh import (
    eval_sh_basis, eval_sh_color, rotate_sh, sh_rotation_matrix, SH_C0)


def random_quats(rng, n):
    q = rng.standard_normal((n, 4))
    return q / np.linalg.norm(q, axis=1, keepdims=True)


def test_quat_to_rotmat_orthonormal(rng):
    q = random_quats(rng, 64)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_quat_identity():
    R = np.asarray(quat_to_rotmat(jnp.asarray([1.0, 0, 0, 0])))
    np.testing.assert_allclose(R, np.eye(3), atol=1e-6)


def test_quat_90deg_z():
    # 90° about +z: w = cos(45°), z = sin(45°)
    c = np.cos(np.pi / 4)
    R = np.asarray(quat_to_rotmat(jnp.asarray([c, 0, 0, c])))
    expect = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float64)
    np.testing.assert_allclose(R, expect, atol=1e-6)


def test_rotmat_quat_roundtrip(rng):
    q = random_quats(rng, 128)
    R = quat_to_rotmat(jnp.asarray(q, jnp.float32))
    q2 = np.asarray(rotmat_to_quat(R))
    # q and -q are the same rotation
    sign = np.sign(np.sum(q2 * q, axis=1, keepdims=True))
    np.testing.assert_allclose(q2 * sign, q, atol=1e-4)


def test_quat_multiply_matches_rotmat(rng):
    a, b = random_quats(rng, 8), random_quats(rng, 8)
    Rab = np.asarray(quat_to_rotmat(quat_multiply(jnp.asarray(a), jnp.asarray(b))))
    RaRb = np.asarray(quat_to_rotmat(jnp.asarray(a))) @ np.asarray(
        quat_to_rotmat(jnp.asarray(b)))
    np.testing.assert_allclose(Rab, RaRb, atol=1e-5)


def test_cov3d_matches_numpy(rng):
    n = 32
    q = random_quats(rng, n)
    s = rng.uniform(-2, 0.5, (n, 3))
    cov = np.asarray(build_cov3d(jnp.asarray(s, jnp.float32), jnp.asarray(q, jnp.float32)))
    for i in range(n):
        w, x, y, z = q[i]
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        S = np.diag(np.exp(s[i]))
        M = R @ S
        np.testing.assert_allclose(cov[i], M @ M.T, atol=1e-5)


def test_sh_constants_match_reference():
    """Spot-check basis values against gsplat_sh.hlsl:40-63 formulas."""
    d = np.array([0.0, 0.0, 1.0])
    basis = np.asarray(eval_sh_basis(jnp.asarray(d), 3))
    # deg1 at +z: (-C1*y, C1*z, -C1*x) = (0, 0.4886..., 0)
    np.testing.assert_allclose(basis[0], 0.0, atol=1e-7)
    np.testing.assert_allclose(basis[1], 0.4886025119029199, atol=1e-6)
    # deg2 m=0 term: C2_2*(2z²-x²-y²) = 0.31539...*2
    np.testing.assert_allclose(basis[5], 0.31539156525252005 * 2, atol=1e-6)
    # deg3 m=0: C3_3*z*(2z²-3x²-3y²) = 0.37317...*2
    np.testing.assert_allclose(basis[11], 0.3731763325901154 * 2, atol=1e-6)


def test_sh_dc_color():
    sh0 = jnp.asarray([[0.2, -0.1, 0.4]])
    shN = jnp.zeros((1, 15, 3))
    c = np.asarray(eval_sh_color(sh0, shN, jnp.asarray([[0.0, 0, 1]])))
    np.testing.assert_allclose(c[0], 0.5 + SH_C0 * np.array([0.2, -0.1, 0.4]),
                               atol=1e-6)


def test_sh_rotation_matrix_orthogonal(rng):
    from divshot_tpu.splat.math import quat_to_rotmat as q2r
    q = random_quats(rng, 1)[0]
    R = np.asarray(q2r(jnp.asarray(q)))
    M = sh_rotation_matrix(R, degree=3)
    np.testing.assert_allclose(M @ M.T, np.eye(15), atol=1e-4)


def test_sh_rotation_field_invariance(rng):
    """Rotating coeffs by R then evaluating at R·d must equal evaluating the
    original coeffs at d — the defining property of SH rotation."""
    q = random_quats(rng, 1)[0]
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    shN = jnp.asarray(rng.standard_normal((4, 15, 3)), jnp.float32)
    sh0 = jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)
    dirs = rng.standard_normal((16, 3))
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)

    shN_rot = rotate_sh(shN, R)
    for i in range(4):
        c_orig = np.asarray(eval_sh_color(
            sh0[i], shN[i], jnp.asarray(dirs, jnp.float32)))
        c_rot = np.asarray(eval_sh_color(
            sh0[i], shN_rot[i], jnp.asarray(dirs @ R.T, jnp.float32)))
        np.testing.assert_allclose(c_rot, c_orig, atol=2e-4)
