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
