"""Mesh extraction tests: marching tetrahedra on an analytic SDF, depth
rendering, and the full splat->mesh pipeline."""

import numpy as np

from divshot_tpu.viewer.mesh import (
    marching_tetrahedra, tsdf_fuse, render_depth, extract_mesh, save_obj)
from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras


def test_marching_tets_sphere():
    r = 32
    ii = np.linspace(-1, 1, r)
    gx, gy, gz = np.meshgrid(ii, ii, ii, indexing="ij")
    sdf = np.sqrt(gx ** 2 + gy ** 2 + gz ** 2) - 0.6
    cell = 2.0 / (r - 1)
    verts, faces = marching_tetrahedra(sdf.astype(np.float32),
                                       np.array([-1.0, -1, -1]), cell)
    assert len(verts) > 100 and len(faces) > 100
    radii = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.6, atol=0.05)
    assert radii.std() < 0.05
    assert faces.max() < len(verts)


def test_render_depth(rng):
    params = random_scene(rng, 200, sh_degree=0)
    cam = orbit_cameras(1, width=64)[0]
    depth, alpha = render_depth(params, cam, tile_capacity=256,
                                instance_capacity=1 << 13)
    m = alpha > 0.5
    assert m.any()
    # camera orbits at radius 4; scene at origin radius ~2
    assert 1.0 < depth[m].mean() < 7.0


def test_extract_mesh_smoke(rng, tmp_path):
    params = random_scene(rng, 400, sh_degree=0)
    cams = orbit_cameras(6, width=64)
    verts, faces = extract_mesh(
        params, cams, resolution=48, out_path=str(tmp_path / "m.obj"),
        render_kw={"tile_capacity": 256, "instance_capacity": 1 << 13})
    assert len(verts) > 0 and len(faces) > 0
    txt = open(tmp_path / "m.obj").read()
    assert txt.count("\nv ") + txt.startswith("v ") == len(verts)
    assert txt.count("\nf ") == len(faces)
