"""EWA projection of 3D Gaussians to screen space.

Math matches the reference trainer's convention (graphdeco 3DGS; the viewer's
copy of the same formulas is ``gsplat_vs.hlsl:74-166``): perspective Jacobian
with view-space clamping to ±1.3·tan_fov, +eps2d low-pass dilation on the 2D
covariance diagonal, optional Mip-Splatting AA opacity compensation
(``gsplat_vs.hlsl:296-301,371-374``).

All functions are batched over the splat axis — pure VPU elementwise work that
XLA fuses into a handful of kernels.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from divshot_tpu.splat.camera import Camera
from divshot_tpu.splat.math import cov3d_flat, matvec3


class Projection(NamedTuple):
    means2d: jax.Array   # (N, 2) pixel centers
    conics: jax.Array    # (N, 3) inverse cov2d upper-tri (a, b, c):
                         #        G = exp(-0.5(a dx² + 2b dx dy + c dy²))
    depths: jax.Array    # (N,) view-space z
    radii: jax.Array     # (N,) conservative pixel radius (0 = culled)
    comp: jax.Array      # (N,) AA opacity compensation factor (1 if off)
    cov2d: jax.Array     # (N, 3) dilated 2D covariance (xx, xy, yy)
    # tight-binning extras (None when ``opacities`` not given):
    radii_xy: jax.Array | None = None  # (N, 2) ellipse AABB half-extents
    rad2: jax.Array | None = None      # (N,) squared circum-radius of the
                                       # alpha >= 1/255 ellipse (un-ceiled)


def project_gaussians(
    means: jax.Array,        # (N, 3)
    log_scales: jax.Array,   # (N, 3)
    quats: jax.Array,        # (N, 4)
    camera: Camera,
    *,
    eps2d: float = 0.3,
    antialiased: bool = False,
    near: float = 0.01,
    far: float = 1e10,
    fov_clamp: tuple | None = None,   # (tan_fovx, tan_fovy) override —
                                      # band/sub-viewport rendering keeps
                                      # the FULL frame's EWA clamp
    opacities: jax.Array | None = None,  # (N,) effective opacity: enables
                                      # opacity-aware tight extents
) -> Projection:
    viewmat = camera.viewmat
    R = viewmat[:3, :3]
    t = viewmat[:3, 3]
    # precision="highest" throughout: world-space geometry must not round
    # through bf16 on the TPU MXU.
    p_view = matvec3(R, means) + t
    z = p_view[..., 2]

    tan_fovx, tan_fovy = camera.tan_fovx, camera.tan_fovy
    # clamp view-space xy as in gsplat_vs.hlsl:82-87 to bound the Jacobian
    zc = jnp.maximum(z, near)
    if fov_clamp is not None:
        tan_fovx, tan_fovy = fov_clamp
    tx = jnp.clip(p_view[..., 0] / zc, -1.3 * tan_fovx, 1.3 * tan_fovx) * zc
    ty = jnp.clip(p_view[..., 1] / zc, -1.3 * tan_fovy, 1.3 * tan_fovy) * zc

    fx, fy = camera.fx, camera.fy
    rz = 1.0 / zc
    rz2 = rz * rz
    # J = [[fx/z, 0, -fx x/z²], [0, fy/z, -fy y/z²]]
    # cov3d and the view transform run in FLAT symmetric-component form:
    # an (N, 3, 3) intermediate pads (3, 3) onto the (4, 128) TPU tile — a
    # 56.9x memory blowup that OOMs HBM at the reference's 3M capMax
    # (measured 3 x 5.7 GB in the autodiff graph). Scalar math with the
    # camera rotation entries as host constants is exact and 100x smaller.
    c00, c01, c02, c11, c12, c22 = cov3d_flat(log_scales, quats)
    cm = ((c00, c01, c02), (c01, c11, c12), (c02, c12, c22))
    # T = R_view @ C  (R entries are per-camera scalars)
    t_rows = [[sum(R[i, k] * cm[k][j] for k in range(3)) for j in range(3)]
              for i in range(3)]
    # V = T @ R_view^T, symmetric — six unique components
    def v_entry(i, l):
        return sum(t_rows[i][j] * R[l, j] for j in range(3))

    v00, v01, v02 = v_entry(0, 0), v_entry(0, 1), v_entry(0, 2)
    v11, v12, v22 = v_entry(1, 1), v_entry(1, 2), v_entry(2, 2)

    j00 = fx * rz
    j02 = -fx * tx * rz2
    j11 = fy * rz
    j12 = -fy * ty * rz2
    # cov2d = J V J^T, expanded (J rows: [j00,0,j02], [0,j11,j12])
    cxx = j00 * j00 * v00 + 2 * j00 * j02 * v02 + j02 * j02 * v22
    cxy = j00 * j11 * v01 + j00 * j12 * v02 + j02 * j11 * v12 + j02 * j12 * v22
    cyy = j11 * j11 * v11 + 2 * j11 * j12 * v12 + j12 * j12 * v22

    det_raw = cxx * cyy - cxy * cxy
    cxx_d = cxx + eps2d
    cyy_d = cyy + eps2d
    det = cxx_d * cyy_d - cxy * cxy
    det_safe = jnp.maximum(det, 1e-12)

    # Mip-Splatting AA factor sqrt(det/det_dilated) (gsplat_vs.hlsl:296-301)
    comp = jnp.sqrt(jnp.maximum(det_raw, 0.0) / det_safe) if antialiased \
        else jnp.ones_like(det)

    inv_det = 1.0 / det_safe
    conic_a = cyy_d * inv_det
    conic_b = -cxy * inv_det
    conic_c = cxx_d * inv_det

    # conservative radius: coeff * sigma of the major eigenvalue. Without
    # opacity the classic 3-sigma; with opacity the alpha >= 1/255 level
    # set {0.5 d^T conic d <= L}, L = ln(255*op_eff), capped at 3-sigma.
    # Below the cap (op_eff < ~0.35) the level set is exact and the
    # compositor's alpha cull guarantees an identical image; above it the
    # 3-sigma cap matches the CUDA reference's convention (tail alpha up to
    # ~op*e^-4.5 ~ 1.1% is truncated, same as diff-gaussian-rasterization).
    mid = 0.5 * (cxx_d + cyy_d)
    disc = jnp.sqrt(jnp.maximum(mid * mid - det_safe, 0.1))
    lambda1 = mid + disc
    if opacities is not None:
        op_eff = opacities * comp
        L = jnp.log(jnp.maximum(op_eff, 1e-12) * 255.0)
        coeff = jnp.minimum(3.0, jnp.sqrt(2.0 * jnp.maximum(L, 0.0)))
        op_ok = L > 0.0
    else:
        coeff = 3.0
        op_ok = True
    rad2 = coeff * coeff * jnp.maximum(lambda1, 0.0)
    radius = jnp.ceil(jnp.sqrt(rad2))
    # ellipse AABB half-extents: the level set's x-extent is
    # sqrt(2L*cov_xx) = coeff*sqrt(cov_xx) — much tighter than the
    # circum-radius square for anisotropic splats
    rx = jnp.ceil(coeff * jnp.sqrt(jnp.maximum(cxx_d, 0.0)))
    ry = jnp.ceil(coeff * jnp.sqrt(jnp.maximum(cyy_d, 0.0)))

    # pixel-space center
    u = fx * p_view[..., 0] * rz + camera.cx
    v = fy * p_view[..., 1] * rz + camera.cy

    # cull: behind near plane, beyond far, degenerate cov, or fully offscreen
    W, H = camera.width, camera.height
    valid = (z > near) & (z < far) & (det > 0) & op_ok
    inside = (
        (u + rx > 0) & (u - rx < W) & (v + ry > 0) & (v - ry < H)
    )
    keep = valid & inside
    radii = jnp.where(keep, radius, 0.0)

    return Projection(
        means2d=jnp.stack([u, v], -1),
        conics=jnp.stack([conic_a, conic_b, conic_c], -1),
        depths=z,
        radii=radii,
        comp=comp,
        cov2d=jnp.stack([cxx_d, cxy, cyy_d], -1),
        radii_xy=jnp.where(keep[:, None], jnp.stack([rx, ry], -1), 0.0),
        rad2=rad2,
    )
