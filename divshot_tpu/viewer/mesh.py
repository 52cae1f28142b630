"""Splat -> mesh extraction (the reference's exportMesh capability,
``gs_train.cpp:170-171`` — closed SuGaR-style implementation).

TPU-native pipeline: render per-view expected depth through the shared
compositor -> TSDF fusion into a voxel grid (JAX, chunked) -> marching
tetrahedra (tiny case table derived on the fly, no 256-entry MC tables) ->
OBJ export.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from divshot_tpu.splat.gaussians import GaussianParams
from divshot_tpu.splat.camera import Camera
from divshot_tpu.raster.render import render


def render_depth(params: GaussianParams, camera: Camera,
                 **render_kw) -> tuple[np.ndarray, np.ndarray]:
    """-> (expected depth (H, W), alpha (H, W)). Depth composited as a
    per-splat 'color' channel; normalized by alpha."""
    R = camera.viewmat[:3, :3]
    t = camera.viewmat[:3, 3]
    from divshot_tpu.splat.math import dot3
    z = dot3(R[2], params.means) + t[2]
    depth_colors = jnp.stack([z, z, z], -1)
    out = render(params, camera, override_colors=depth_colors, **render_kw)
    alpha = np.asarray(out.alpha)
    depth = np.asarray(out.image)[..., 0] / np.maximum(alpha, 1e-6)
    return depth, alpha


def tsdf_fuse(
    depths: list[np.ndarray], alphas: list[np.ndarray],
    cameras: list[Camera], *,
    resolution: int = 128,
    bounds: tuple[np.ndarray, np.ndarray] | None = None,
    trunc: float | None = None,
    alpha_thresh: float = 0.5,
) -> tuple[np.ndarray, np.ndarray, float]:
    """Fuse depth maps into a TSDF grid. -> (tsdf (R,R,R), grid_min, cell)."""
    if bounds is None:
        # scene bounds from camera positions
        centers = np.stack([np.asarray(c.campos) for c in cameras])
        mid = centers.mean(0)
        rad = np.linalg.norm(centers - mid, axis=1).max() * 0.7
        lo, hi = mid - rad, mid + rad
    else:
        lo, hi = bounds
    lo = np.asarray(lo, np.float32)
    hi = np.asarray(hi, np.float32)
    cell = float((hi - lo).max() / resolution)
    if trunc is None:
        trunc = 4.0 * cell

    r = resolution
    ii = np.arange(r, dtype=np.float32) + 0.5
    gx, gy, gz = np.meshgrid(ii, ii, ii, indexing="ij")
    pts = np.stack([lo[0] + gx * (hi[0] - lo[0]) / r,
                    lo[1] + gy * (hi[1] - lo[1]) / r,
                    lo[2] + gz * (hi[2] - lo[2]) / r], -1).reshape(-1, 3)
    pts_j = jnp.asarray(pts)

    @jax.jit
    def fuse_one(viewmat, fx, fy, cx, cy, depth, alpha, acc, wacc):
        R = viewmat[:3, :3]
        t = viewmat[:3, 3]
        from divshot_tpu.splat.math import matvec3
        p = matvec3(R, pts_j) + t
        z = p[:, 2]
        H, W = depth.shape
        u = (fx * p[:, 0] / jnp.maximum(z, 1e-6) + cx).astype(jnp.int32)
        v = (fy * p[:, 1] / jnp.maximum(z, 1e-6) + cy).astype(jnp.int32)
        inside = (z > 0.01) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
        uu = jnp.clip(u, 0, W - 1)
        vv = jnp.clip(v, 0, H - 1)
        d = depth[vv, uu]
        a = alpha[vv, uu]
        sdf = (d - z) / trunc
        valid = inside & (a > alpha_thresh) & (sdf > -1.0)
        sdf = jnp.clip(sdf, -1.0, 1.0)
        w = valid.astype(jnp.float32)
        return acc + w * sdf, wacc + w

    acc = jnp.zeros((pts.shape[0],), jnp.float32)
    wacc = jnp.zeros((pts.shape[0],), jnp.float32)
    for cam, depth, alpha in zip(cameras, depths, alphas):
        acc, wacc = fuse_one(cam.viewmat, cam.fx, cam.fy, cam.cx, cam.cy,
                             jnp.asarray(depth), jnp.asarray(alpha),
                             acc, wacc)
    tsdf = np.asarray(jnp.where(wacc > 0, acc / jnp.maximum(wacc, 1e-6), 1.0))
    return tsdf.reshape(r, r, r), lo, cell


# ---------------------------------------------------------------------------
# marching tetrahedra

# six tetrahedra per cube (corner indices into the 8 cube corners)
_TETS = np.array([
    [0, 5, 1, 6], [0, 1, 2, 6], [0, 2, 3, 6],
    [0, 3, 7, 6], [0, 7, 4, 6], [0, 4, 5, 6],
])
_CUBE_OFFS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
])


def marching_tetrahedra(tsdf: np.ndarray, grid_min: np.ndarray,
                        cell: float) -> tuple[np.ndarray, np.ndarray]:
    """Extract the zero isosurface. -> (vertices (V, 3), faces (F, 3))."""
    r = tsdf.shape[0]
    # corner values per cube: (r-1)^3 cubes × 8
    base = np.stack(np.meshgrid(np.arange(r - 1), np.arange(r - 1),
                                np.arange(r - 1), indexing="ij"),
                    -1).reshape(-1, 3)
    verts_out = []
    # tet edge list: all 6 edges of a 4-vertex tet
    tet_edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]

    corner_idx = base[:, None, :] + _CUBE_OFFS[None, :, :]   # (C, 8, 3)
    vals = tsdf[corner_idx[..., 0], corner_idx[..., 1], corner_idx[..., 2]]
    pos = grid_min[None, None, :] + corner_idx.astype(np.float32) * cell

    for tet in _TETS:
        tv = vals[:, tet]                    # (C, 4)
        tp = pos[:, tet]                     # (C, 4, 3)
        inside = tv < 0                      # (C, 4) bool
        case = (inside[:, 0].astype(int) | (inside[:, 1].astype(int) << 1)
                | (inside[:, 2].astype(int) << 2)
                | (inside[:, 3].astype(int) << 3))

        def edge_pt(ei):
            a, b = tet_edges[ei]
            va, vb = tv[:, a], tv[:, b]
            t = va / np.where(np.abs(va - vb) < 1e-12, 1e-12, va - vb)
            t = np.clip(t, 0.0, 1.0)[:, None]
            return tp[:, a] * (1 - t) + tp[:, b] * t

        # case table for marching tets: triangles as edge-index triples
        tri_table = {
            0b0001: [(0, 1, 2)], 0b1110: [(0, 2, 1)],
            0b0010: [(0, 4, 3)], 0b1101: [(0, 3, 4)],
            0b0100: [(1, 3, 5)], 0b1011: [(1, 5, 3)],
            0b1000: [(2, 5, 4)], 0b0111: [(2, 4, 5)],
            0b0011: [(1, 2, 4), (2, 3, 4)], 0b1100: [(1, 4, 2), (2, 4, 3)],
            0b0101: [(0, 3, 2), (2, 3, 5)], 0b1010: [(0, 2, 3), (2, 5, 3)],
            0b0110: [(0, 4, 1), (1, 4, 5)], 0b1001: [(0, 1, 4), (1, 5, 4)],
        }
        epts = None
        for code, tris in tri_table.items():
            m = case == code
            if not m.any():
                continue
            if epts is None:
                epts = [edge_pt(e) for e in range(6)]
            for (e0, e1, e2) in tris:
                verts_out.append(np.stack(
                    [epts[e0][m], epts[e1][m], epts[e2][m]], 1))

    if not verts_out:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    tris = np.concatenate(verts_out)          # (F, 3, 3)
    flat = tris.reshape(-1, 3)
    uniq, inv = np.unique(np.round(flat / (cell * 1e-4)).astype(np.int64),
                          axis=0, return_inverse=True)
    # representative positions
    verts = np.zeros((len(uniq), 3), np.float32)
    verts[inv] = flat
    faces = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces
    ok = ((faces[:, 0] != faces[:, 1]) & (faces[:, 1] != faces[:, 2])
          & (faces[:, 0] != faces[:, 2]))
    return verts, faces[ok]


def save_obj(path: str, verts: np.ndarray, faces: np.ndarray) -> None:
    with open(path, "w") as f:
        f.write("# divshot_tpu mesh export\n")
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for face in faces + 1:
            f.write(f"f {face[0]} {face[1]} {face[2]}\n")


def extract_mesh(params: GaussianParams, cameras: list[Camera], *,
                 resolution: int = 128, out_path: str | None = None,
                 render_kw: dict | None = None
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Full splat->mesh pipeline (exportMesh parity)."""
    rk = render_kw or {}
    depths, alphas = [], []
    for cam in cameras:
        d, a = render_depth(params, cam, **rk)
        depths.append(d)
        alphas.append(a)
    tsdf, lo, cell = tsdf_fuse(depths, alphas, cameras,
                               resolution=resolution)
    verts, faces = marching_tetrahedra(tsdf, lo, cell)
    if out_path:
        save_obj(out_path, verts, faces)
    return verts, faces
