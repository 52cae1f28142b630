"""Dataset readers beyond COLMAP/blender (nerfstudio / OpenSfM /
RealityCapture / Metashape — reference datasetType set, editor.cpp:1770) and
useMask loading (masks folder / PNG alpha, userGuide.md:54)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from divshot_tpu.gsio.datasets import load_dataset, sniff_dataset_type


def _write_img(path, w=32, h=24, alpha=None, seed=0):
    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    if alpha is not None:
        a = (np.clip(alpha, 0, 1) * 255).astype(np.uint8)
        arr = np.concatenate([arr, a[..., None]], -1)
        Image.fromarray(arr, "RGBA").save(path)
    else:
        Image.fromarray(arr, "RGB").save(path)


def _gl_c2w(eye):
    eye = np.asarray(eye, np.float64)
    back = eye / np.linalg.norm(eye)
    up = np.array([0.0, 1.0, 0.0])
    right = np.cross(up, back)
    right /= np.linalg.norm(right)
    up2 = np.cross(back, right)
    m = np.eye(4)
    m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = right, up2, back, eye
    return m


# ---------------------------------------------------------------------------


def test_nerfstudio_reader(tmp_path):
    root = tmp_path / "ns"
    (root / "images").mkdir(parents=True)
    frames = []
    eyes = [[3, 1, 0], [0, 1.5, 3]]
    for i, eye in enumerate(eyes):
        name = f"images/frame_{i:05d}.png"
        _write_img(str(root / name), seed=i)
        frames.append({"file_path": name,
                       "transform_matrix": _gl_c2w(eye).tolist()})
    meta = {"fl_x": 40.0, "fl_y": 41.0, "cx": 16.0, "cy": 12.0,
            "w": 32, "h": 24, "frames": frames}
    json.dump(meta, open(root / "transforms.json", "w"))

    assert sniff_dataset_type(str(root)) == "nerfstudio"
    train, _ = load_dataset(str(root), "nerfstudio")
    assert train.num_views == 2
    # camera center recovered == eye
    campos = np.asarray(train.cameras.campos)
    np.testing.assert_allclose(campos[0], eyes[0], atol=1e-4)
    np.testing.assert_allclose(float(train.cameras.fx[0]), 40.0, rtol=1e-6)


def test_nerfstudio_integer_type_code(tmp_path):
    root = tmp_path / "ns2"
    (root / "images").mkdir(parents=True)
    _write_img(str(root / "images/a.png"))
    json.dump({"fl_x": 30.0, "w": 32, "h": 24, "frames": [
        {"file_path": "images/a.png",
         "transform_matrix": _gl_c2w([2, 1, 2]).tolist()}]},
        open(root / "transforms.json", "w"))
    train, _ = load_dataset(str(root), 0)   # reference enum 0
    assert train.num_views == 1


def test_opensfm_reader(tmp_path):
    root = tmp_path / "osfm"
    (root / "images").mkdir(parents=True)
    for n in ("a.jpg", "b.jpg"):
        _write_img(str(root / "images" / n))
    rec = [{
        "cameras": {"cam1": {"projection_type": "perspective",
                             "width": 32, "height": 24, "focal": 0.9}},
        "shots": {
            "a.jpg": {"camera": "cam1", "rotation": [0.0, 0.0, 0.0],
                      "translation": [0.0, 0.0, 4.0]},
            "b.jpg": {"camera": "cam1", "rotation": [0.0, 0.3, 0.0],
                      "translation": [0.5, 0.0, 4.0]},
        },
        "points": {
            "1": {"coordinates": [0, 0, 0], "color": [255, 0, 0]},
            "2": {"coordinates": [1, 0, 0], "color": [0, 255, 0]},
        },
    }]
    json.dump(rec, open(root / "reconstruction.json", "w"))

    assert sniff_dataset_type(str(root)) == "opensfm"
    train, _ = load_dataset(str(root), "opensfm")
    assert train.num_views == 2
    assert train.points.shape == (2, 3)
    np.testing.assert_allclose(float(train.cameras.fx[0]), 0.9 * 32)
    # shot a: identity rotation, t=(0,0,4) -> campos (0,0,-4)
    np.testing.assert_allclose(np.asarray(train.cameras.campos)[0],
                               [0, 0, -4], atol=1e-5)


def test_realitycapture_reader(tmp_path):
    root = tmp_path / "rc"
    root.mkdir()
    for n in ("i1.png", "i2.png"):
        _write_img(str(root / n))
    csv = ("#name,x,y,z,heading,pitch,roll,f,px,py\n"
           "i1.png,1.0,2.0,3.0,0.0,0.0,0.0,36.0,0.0,0.0\n"
           "i2.png,-1.0,2.0,3.0,90.0,10.0,0.0,36.0,0.01,-0.01\n")
    (root / "cameras.csv").write_text(csv)

    train, _ = load_dataset(str(root / "cameras.csv"), "realitycapture")
    assert train.num_views == 2
    campos = np.asarray(train.cameras.campos)
    np.testing.assert_allclose(campos[0], [1, 2, 3], atol=1e-4)
    # f=36mm on a 36mm sensor -> focal == max(w, h) px
    np.testing.assert_allclose(float(train.cameras.fx[0]), 32.0, rtol=1e-6)


def test_metashape_reader(tmp_path):
    root = tmp_path / "ms"
    (root / "images").mkdir(parents=True)
    for n in ("c0.png", "c1.png"):
        _write_img(str(root / "images" / n))
    c2w0 = np.eye(4); c2w0[:3, 3] = [0, 0, -5]
    c2w1 = np.eye(4); c2w1[:3, 3] = [1, 0, -5]
    xml = f"""<?xml version="1.0"?>
<document>
 <chunk>
  <sensors>
   <sensor id="0">
    <calibration>
     <resolution width="32" height="24"/>
     <f>40.0</f><cx>0.5</cx><cy>-0.5</cy>
    </calibration>
   </sensor>
  </sensors>
  <cameras>
   <camera id="0" sensor_id="0" label="c0.png">
    <transform>{' '.join(str(v) for v in c2w0.ravel())}</transform>
   </camera>
   <camera id="1" sensor_id="0" label="c1.png">
    <transform>{' '.join(str(v) for v in c2w1.ravel())}</transform>
   </camera>
  </cameras>
 </chunk>
</document>"""
    (root / "cameras.xml").write_text(xml)

    train, _ = load_dataset(str(root / "cameras.xml"), "metashape")
    assert train.num_views == 2
    campos = np.asarray(train.cameras.campos)
    np.testing.assert_allclose(campos[0], [0, 0, -5], atol=1e-5)
    np.testing.assert_allclose(float(train.cameras.cx[0]), 16.5, rtol=1e-6)


# ---------------------------------------------------------------------------
# useMask


def test_mask_from_masks_folder(tmp_path):
    root = tmp_path / "scene"
    (root / "train").mkdir(parents=True)
    (root / "train" / "masks").mkdir()
    frames = []
    for i in range(2):
        _write_img(str(root / "train" / f"r_{i}.png"), seed=i)
        m = np.zeros((24, 32), np.float32)
        m[:, : 16 * (i + 1) // 2 + 8] = 1.0
        Image.fromarray((m * 255).astype(np.uint8), "L").save(
            root / "train" / "masks" / f"r_{i}.png")
        frames.append({"file_path": f"./train/r_{i}",
                       "transform_matrix": _gl_c2w([2, 1, 2 + i]).tolist()})
    json.dump({"camera_angle_x": 0.7, "frames": frames},
              open(root / "transforms_train.json", "w"))

    train, _ = load_dataset(str(root), "blender", use_mask=True)
    assert train.masks is not None and train.masks.shape == (2, 24, 32)
    m0 = np.asarray(train.masks[0]).astype(np.float32) / 255.0
    assert m0[:, 0].mean() == 1.0 and m0[:, -1].mean() == 0.0


def test_mask_from_png_alpha(tmp_path):
    root = tmp_path / "scene_a"
    (root / "train").mkdir(parents=True)
    alpha = np.zeros((24, 32), np.float32)
    alpha[:12] = 1.0
    _write_img(str(root / "train" / "r_0.png"), alpha=alpha)
    json.dump({"camera_angle_x": 0.7, "frames": [
        {"file_path": "./train/r_0",
         "transform_matrix": _gl_c2w([2, 1, 2]).tolist()}]},
        open(root / "transforms_train.json", "w"))

    train, _ = load_dataset(str(root), "blender", use_mask=True)
    m = np.asarray(train.masks[0]).astype(np.float32) / 255.0
    assert m[:12].mean() == 1.0 and m[12:].mean() == 0.0


def test_masked_training_from_disk(tmp_path, rng):
    """End-to-end: masks read from disk flow into the loss (weak #5/#48)."""
    from divshot_tpu.core.config import TrainConfig
    from divshot_tpu.splat.gaussians import init_from_points
    from divshot_tpu.train.trainer import Trainer

    root = tmp_path / "scene_m"
    (root / "train" / "masks").mkdir(parents=True)
    frames = []
    for i in range(2):
        _write_img(str(root / "train" / f"r_{i}.png"), w=32, h=32, seed=i)
        Image.fromarray(np.full((32, 32), 255, np.uint8), "L").save(
            root / "train" / "masks" / f"r_{i}.png")
        frames.append({"file_path": f"./train/r_{i}",
                       "transform_matrix": _gl_c2w([0, 1, 3]).tolist()})
    json.dump({"camera_angle_x": 0.7, "frames": frames},
              open(root / "transforms_train.json", "w"))
    train, _ = load_dataset(str(root), "blender", use_mask=True)

    pts = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (64, 3)).astype(np.float32)
    params = init_from_points(pts, cols, sh_degree=0, capacity=128)
    cfg = TrainConfig(sh_degree=0, use_mask=True, ssim_weight=0.0)
    tr = Trainer(cfg, train, params,
                 render_kwargs={"backend": "tiles", "chunk": 32})
    m = tr.step_once()
    assert np.isfinite(float(m["loss"]))
