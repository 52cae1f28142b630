"""Format round-trip tests (SURVEY §4.1/§4.3: byte-exact pack/unpack,
interop as test oracle)."""

import json
import os

import numpy as np

from divshot_tpu.gsio import ply as P
from divshot_tpu.gsio import colmap as C
from divshot_tpu.gsio.synthetic import random_scene


def test_ply_roundtrip(rng, tmp_path):
    params = random_scene(rng, 100, sh_degree=3)
    path = str(tmp_path / "test.ply")
    P.save_ply(path, params, antialiased=True)
    loaded, meta = P.load_ply(path)
    assert meta["antialiased"] is True
    for f in ("means", "scales", "quats", "opacity", "sh0", "shN"):
        np.testing.assert_array_equal(
            np.asarray(getattr(params, f)), np.asarray(getattr(loaded, f)),
            err_msg=f)


def test_ply_bytes_stable(rng, tmp_path):
    """Saving the same params twice is byte-identical (determinism)."""
    params = random_scene(rng, 50, sh_degree=1)
    p1, p2 = str(tmp_path / "a.ply"), str(tmp_path / "b.ply")
    P.save_ply(p1, params)
    P.save_ply(p2, params)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_ply_record_size(rng, tmp_path):
    """59 f32 = 236 B per splat after the header (reference layout,
    editor.cpp:1578 VRAM model)."""
    params = random_scene(rng, 64, sh_degree=0)
    path = str(tmp_path / "sz.ply")
    P.save_ply(path, params)
    raw = open(path, "rb").read()
    body = raw.split(b"end_header\n", 1)[1]
    assert len(body) == 64 * 236


def test_graphdeco_ply_with_normals(tmp_path, rng):
    """Loader accepts graphdeco-style PLYs that include nx/ny/nz."""
    n = 10
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n}"]
    names = (["x", "y", "z", "nx", "ny", "nz", "f_dc_0", "f_dc_1", "f_dc_2"]
             + [f"f_rest_{i}" for i in range(45)]
             + ["opacity", "scale_0", "scale_1", "scale_2",
                "rot_0", "rot_1", "rot_2", "rot_3"])
    header += [f"property float {nm}" for nm in names]
    header += ["end_header", ""]
    data = rng.standard_normal((n, len(names))).astype(np.float32)
    path = tmp_path / "gd.ply"
    with open(path, "wb") as f:
        f.write("\n".join(header).encode())
        f.write(data.tobytes())
    loaded, _ = P.load_ply(str(path))
    np.testing.assert_allclose(np.asarray(loaded.means), data[:, 0:3])
    np.testing.assert_allclose(np.asarray(loaded.sh0), data[:, 6:9])
    np.testing.assert_allclose(np.asarray(loaded.opacity), data[:, 54])


def test_splat_roundtrip(rng, tmp_path):
    params = random_scene(rng, 80, sh_degree=0)
    path = str(tmp_path / "m.splat")
    P.save_splat(path, params)
    assert os.path.getsize(path) == 80 * 32
    loaded = P.load_splat(path)
    np.testing.assert_allclose(np.asarray(loaded.means),
                               np.asarray(params.means), atol=1e-6)
    # quantized fields: coarse agreement
    np.testing.assert_allclose(np.exp(np.asarray(loaded.scales)),
                               np.exp(np.asarray(params.scales)), rtol=1e-5)
    a0 = 1 / (1 + np.exp(-np.asarray(params.opacity)))
    a1 = 1 / (1 + np.exp(-np.asarray(loaded.opacity)))
    np.testing.assert_allclose(a0, a1, atol=1 / 255 + 1e-3)


def test_colmap_bin_roundtrip(tmp_path, rng):
    cams = {1: C.ColmapCamera("PINHOLE", 640, 480,
                              np.array([500.0, 501.0, 320.0, 240.0]))}
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    imgs = {1: C.ColmapImage("img001.png", 1, q, np.array([0.1, -0.2, 3.0]))}
    pts = rng.standard_normal((20, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (20, 3)).astype(np.float32)

    C.write_cameras_bin(str(tmp_path / "cameras.bin"), cams)
    C.write_images_bin(str(tmp_path / "images.bin"), imgs)
    C.write_points3d_bin(str(tmp_path / "points3D.bin"), pts, cols)

    cams2, imgs2, pts2, cols2 = C.load_sparse_model(str(tmp_path))
    assert cams2[1].model == "PINHOLE"
    np.testing.assert_allclose(cams2[1].params, cams[1].params)
    np.testing.assert_allclose(imgs2[1].qvec, q)
    assert imgs2[1].name == "img001.png"
    np.testing.assert_allclose(pts2, pts, atol=1e-6)
    np.testing.assert_allclose(cols2, cols, atol=1 / 255)


def test_blender_loader(tmp_path, rng):
    from PIL import Image
    os.makedirs(tmp_path / "train")
    frames = []
    for i in range(3):
        arr = (rng.uniform(0, 1, (64, 64, 4)) * 255).astype(np.uint8)
        Image.fromarray(arr, "RGBA").save(tmp_path / "train" / f"r_{i}.png")
        c2w = np.eye(4)
        c2w[2, 3] = 4.0 + i
        frames.append({"file_path": f"./train/r_{i}",
                       "transform_matrix": c2w.tolist()})
    json.dump({"camera_angle_x": 0.7, "frames": frames},
              open(tmp_path / "transforms_train.json", "w"))

    from divshot_tpu.gsio.datasets import load_dataset
    ds, evald = load_dataset(str(tmp_path), white_background=True)
    assert evald is None
    assert ds.num_views == 3
    assert ds.images.shape == (3, 64, 64, 3)
    # +Z-forward convention: camera at z=4 looking back at origin has
    # positive depth for origin point
    vm = np.asarray(ds.cameras.viewmat)[0]
    p = vm[:3, :3] @ np.zeros(3) + vm[:3, 3]
    assert p[2] > 0


def test_compressed_ply_roundtrip(rng, tmp_path):
    from divshot_tpu.gsio.compressed import (
        save_compressed_ply, load_compressed_ply)
    params = random_scene(rng, 600, sh_degree=3)
    path = str(tmp_path / "m.compressed.ply")
    save_compressed_ply(path, params, antialiased=True)
    loaded, meta = load_compressed_ply(path)
    assert meta["antialiased"]

    # compare against Morton-reordered original (within quantization error)
    from divshot_tpu.gsio.compressed import morton_order
    d = params.compact_numpy()
    order = morton_order(d["means"])
    scene_size = d["means"].max() - d["means"].min()
    np.testing.assert_allclose(np.asarray(loaded.means), d["means"][order],
                               atol=scene_size / 500)
    # quat up to sign; 10-bit quantization
    q0 = d["quats"][order]
    q0 /= np.linalg.norm(q0, axis=1, keepdims=True)
    q1 = np.asarray(loaded.quats)
    sign = np.sign(np.sum(q0 * q1, 1, keepdims=True))
    np.testing.assert_allclose(q1, q0 * sign, atol=0.01)
    a0 = 1 / (1 + np.exp(-d["opacity"][order]))
    a1 = 1 / (1 + np.exp(-np.asarray(loaded.opacity)))
    np.testing.assert_allclose(a1, a0, atol=1 / 255 + 1e-3)


def test_spz_roundtrip(rng, tmp_path):
    from divshot_tpu.gsio.spz import save_spz, load_spz
    params = random_scene(rng, 400, sh_degree=3)
    path = str(tmp_path / "m.spz")
    save_spz(path, params, antialiased=True)
    loaded, meta = load_spz(path)
    assert meta["antialiased"]
    d = params.compact_numpy()
    np.testing.assert_allclose(np.asarray(loaded.means), d["means"],
                               atol=2.0 ** -12 + 1e-6)
    np.testing.assert_allclose(np.asarray(loaded.scales), d["scales"],
                               atol=1 / 16 + 1e-6)
    q0 = d["quats"] / np.linalg.norm(d["quats"], axis=1, keepdims=True)
    q1 = np.asarray(loaded.quats)
    sign = np.sign(np.sum(q0 * q1, 1, keepdims=True))
    np.testing.assert_allclose(q1, q0 * sign, atol=0.005)
    np.testing.assert_allclose(np.asarray(loaded.sh0), d["sh0"],
                               atol=1 / (0.15 * 255) + 1e-5)
    # SH rest quantized to 5/4 bits
    np.testing.assert_allclose(np.asarray(loaded.shN), d["shN"], atol=0.07)


def test_io_dispatch(rng, tmp_path):
    from divshot_tpu.gsio.io import save_model, load_model
    params = random_scene(rng, 50, sh_degree=1)
    for name in ("a.ply", "b.splat", "c.spz", "d.compressed.ply"):
        p = str(tmp_path / name)
        save_model(p, params)
        loaded, _meta = load_model(p)
        assert loaded.capacity == 50


def test_reduced_ply_roundtrip(rng, tmp_path):
    from divshot_tpu.gsio.reduced import save_reduced_ply, load_reduced_ply
    params = random_scene(rng, 300, sh_degree=3)
    path = str(tmp_path / "m.reduced.ply")
    save_reduced_ply(path, params, kmeans_iters=5)
    loaded, _ = load_reduced_ply(path)
    assert loaded.capacity == 300
    d = params.compact_numpy()
    # order preserved within degree buckets; positions exact f32
    lm = np.asarray(loaded.means)
    assert set(map(tuple, np.round(lm, 4))) == set(
        map(tuple, np.round(d["means"], 4)))
    # codebook quantization: opacity within coarse tolerance, matched by pos
    order_orig = np.lexsort(d["means"].T)
    order_load = np.lexsort(lm.T)
    a0 = 1 / (1 + np.exp(-d["opacity"][order_orig]))
    a1 = 1 / (1 + np.exp(-np.asarray(loaded.opacity)[order_load]))
    assert np.abs(a0 - a1).mean() < 0.05


def test_dvsplat_roundtrip(rng, tmp_path):
    from divshot_tpu.gsio.dvsplat import save_dvsplat, load_dvsplat
    params = random_scene(rng, 500, sh_degree=3)
    path = str(tmp_path / "m.dvsplat")
    save_dvsplat(path, params)
    loaded, _ = load_dvsplat(path)
    assert loaded.capacity == 500
    d = params.compact_numpy()
    # writer reorders splats: match loaded->original by nearest neighbor
    from scipy.spatial import cKDTree
    lm = np.asarray(loaded.means)
    tree = cKDTree(d["means"])
    dist, idx = tree.query(lm)
    scene = d["means"].max() - d["means"].min()
    assert dist.max() < scene / 200, f"position error {dist.max()}"
    assert len(np.unique(idx)) > 0.95 * len(lm)  # near-bijective match
    np.testing.assert_allclose(
        np.asarray(loaded.scales), d["scales"][idx], atol=0.1)


def test_kmeans_1d(rng):
    from divshot_tpu.gsio.kmeans import kmeans_1d
    import jax.numpy as jnp
    # three well-separated clusters -> centers recover them
    vals = np.concatenate([rng.normal(-5, 0.1, 1000),
                           rng.normal(0, 0.1, 1000),
                           rng.normal(5, 0.1, 1000)]).astype(np.float32)
    centers, ids = kmeans_1d(jnp.asarray(vals), k=8, iters=15)
    centers = np.asarray(centers)
    recon = centers[np.asarray(ids)]
    assert np.abs(recon - vals).mean() < 0.15
