"""Native C++ module: build, and parity with the pure-python fallbacks."""

import numpy as np
import pytest

from divshot_tpu.core import native


def test_native_builds():
    lib = native.get_lib()
    assert lib is not None, "g++ build of native module failed"


def test_morton_parity(rng):
    pos = rng.standard_normal((2000, 3)).astype(np.float32)
    codes = native.morton_codes(pos)
    assert codes is not None
    # python reference (compressed.py fallback path)
    pmin, pmax = pos.min(0), pos.max(0)
    rel = (pos - pmin) / np.where(pmax - pmin > 0, pmax - pmin, 1.0)
    xyz = (rel * ((1 << 21) - 1)).astype(np.uint64)
    ref = np.zeros(len(pos), np.uint64)
    for i in range(21):
        ref |= (xyz[:, 0] & np.uint64(1 << i)) << np.uint64(2 * i)
        ref |= (xyz[:, 1] & np.uint64(1 << i)) << np.uint64(2 * i + 1)
        ref |= (xyz[:, 2] & np.uint64(1 << i)) << np.uint64(2 * i + 2)
    # identical up to float rounding at bucket edges: orders must agree for
    # the overwhelming majority
    agree = (codes == ref).mean()
    assert agree > 0.999, f"agreement {agree}"


def test_colmap_native_parity(rng, tmp_path):
    from divshot_tpu.gsio import colmap as C
    cams = {1: C.ColmapCamera("PINHOLE", 64, 48,
                              np.array([50.0, 51.0, 32.0, 24.0]))}
    imgs = {}
    for i in range(5):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        imgs[i + 1] = C.ColmapImage(f"im_{i:03d}.png", 1, q,
                                    rng.standard_normal(3))
    pts = rng.standard_normal((500, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (500, 3)).astype(np.float32)
    C.write_cameras_bin(str(tmp_path / "cameras.bin"), cams)
    C.write_images_bin(str(tmp_path / "images.bin"), imgs)
    C.write_points3d_bin(str(tmp_path / "points3D.bin"), pts, cols)

    # native path
    imgs2 = C.read_images_bin(str(tmp_path / "images.bin"))
    pts2, cols2 = C.read_points3d_bin(str(tmp_path / "points3D.bin"))
    assert len(imgs2) == 5
    for i in range(5):
        np.testing.assert_allclose(imgs2[i + 1].qvec, imgs[i + 1].qvec)
        assert imgs2[i + 1].name == imgs[i + 1].name
    np.testing.assert_allclose(pts2, pts, atol=1e-6)
    np.testing.assert_allclose(cols2, cols, atol=1 / 255)


def test_ply_native_pack_parity(rng, tmp_path):
    """save_ply through the native packer must be byte-identical to the
    numpy fallback."""
    from divshot_tpu.gsio import ply as P
    from divshot_tpu.gsio.synthetic import random_scene
    params = random_scene(rng, 100, sh_degree=2)
    p1 = str(tmp_path / "native.ply")
    P.save_ply(p1, params)

    # force fallback
    d = params.compact_numpy()
    n, k = 100, d["shN"].shape[1]
    rec = np.zeros((n, 59), np.float32)
    rec[:, 0:3] = d["means"]
    rec[:, 3:6] = d["sh0"]
    rest = np.zeros((n, 3, 15), np.float32)
    rest[:, :, :k] = d["shN"].transpose(0, 2, 1)
    rec[:, 6:51] = rest.reshape(n, 45)
    rec[:, 51] = d["opacity"]
    rec[:, 52:55] = d["scales"]
    rec[:, 55:59] = d["quats"]

    body = open(p1, "rb").read().split(b"end_header\n", 1)[1]
    assert body == rec.tobytes()
