"""Dataset loading: COLMAP scenes and Blender/NeRF-synthetic scenes into the
trainer's ``Dataset`` (images + batched cameras + SfM seed points).

Mirrors the reference's data path (``load_train_data``, datasetType colmap
bin/txt | nerfstudio/blender, maxImageWidth/Height caps, eval holdout,
useMask alpha/masks-folder — SURVEY §2.9). White background compositing for
blender scenes follows graphdeco.
"""

from __future__ import annotations

import json
import os

import numpy as np

from divshot_tpu.splat.camera import Camera
from divshot_tpu.gsio import colmap as C
from divshot_tpu.train.trainer import Dataset


def _load_image(path: str, max_w: int, max_h: int,
                white_bg: bool = False) -> np.ndarray:
    from PIL import Image
    img = Image.open(path)
    w, h = img.size
    scale = min(1.0, max_w / w, max_h / h)
    if scale < 1.0:
        img = img.resize((round(w * scale), round(h * scale)),
                         Image.LANCZOS)
    arr = np.asarray(img).astype(np.float32) / 255.0
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, -1)
    if arr.shape[-1] == 4:
        rgb, a = arr[..., :3], arr[..., 3:4]
        arr = rgb * a + (1.0 - a) * (1.0 if white_bg else 0.0)
    return arr


def load_colmap_dataset(
    source: str, *, images_dir: str = "images", max_width: int = 2048,
    max_height: int = 2048, eval_holdout: int = 0, max_images: int = 0,
) -> tuple[Dataset, Dataset | None]:
    """-> (train_ds, eval_ds or None)."""
    sparse = C.find_sparse_dir(source)
    cams, imgs, pts, cols = C.load_sparse_model(sparse)
    img_root = os.path.join(source, images_dir)

    cameras, images = [], []
    items = sorted(imgs.items(), key=lambda kv: kv[1].name)
    if max_images:
        items = items[:max_images]
    for _iid, im in items:
        cc = cams[im.camera_id]
        fx, fy, cx, cy = C.intrinsics(cc)
        path = os.path.join(img_root, im.name)
        if not os.path.exists(path):
            continue
        arr = _load_image(path, max_width, max_height)
        sx = arr.shape[1] / cc.width
        sy = arr.shape[0] / cc.height
        R = C.qvec_to_rotmat(im.qvec)
        cameras.append(Camera.from_Rt(
            R, im.tvec, fx * sx, fy * sy, cx * sx, cy * sy,
            arr.shape[1], arr.shape[0]))
        images.append((arr * 255).astype(np.uint8))

    if not cameras:
        raise FileNotFoundError(f"no images found under {img_root}")
    images = np.stack(images)

    train_idx = [i for i in range(len(cameras))
                 if not eval_holdout or i % eval_holdout != 0]
    eval_idx = [i for i in range(len(cameras))
                if eval_holdout and i % eval_holdout == 0]

    train = Dataset.from_views([cameras[i] for i in train_idx],
                               images[train_idx], points=pts, colors=cols)
    evald = None
    if eval_idx:
        evald = Dataset.from_views([cameras[i] for i in eval_idx],
                                   images[eval_idx], points=pts, colors=cols)
    return train, evald


def load_blender_dataset(
    source: str, *, split: str = "train", white_background: bool = False,
    max_width: int = 2048, max_height: int = 2048, max_images: int = 0,
) -> Dataset:
    """NeRF-synthetic transforms_{split}.json loader. Blender cameras are
    OpenGL-convention c2w (look down -Z); converted to our COLMAP-style
    +Z-forward world-to-camera."""
    meta = json.load(open(os.path.join(source, f"transforms_{split}.json")))
    frames = meta["frames"]
    if max_images:
        frames = frames[:max_images]

    cameras, images = [], []
    times = []
    for fr in frames:
        fp = fr["file_path"]
        path = os.path.join(source, fp)
        for ext in ("", ".png", ".jpg", ".JPG", ".jpeg"):
            if os.path.exists(path + ext):
                path = path + ext
                break
        arr = _load_image(path, max_width, max_height, white_bg=white_background)
        h, w = arr.shape[:2]
        if "camera_angle_x" in meta:
            fx = 0.5 * w / np.tan(0.5 * float(meta["camera_angle_x"]))
            fy = fx
        else:
            fx, fy = float(fr["fl_x"]), float(fr["fl_y"])
        c2w = np.array(fr["transform_matrix"], np.float64)
        c2w[:3, 1:3] *= -1.0  # OpenGL -> COLMAP axes
        w2c = np.linalg.inv(c2w)
        cameras.append(Camera.from_Rt(
            w2c[:3, :3], w2c[:3, 3], fx, fy, w / 2, h / 2, w, h))
        images.append((arr * 255).astype(np.uint8))
        if "time" in fr:   # D-NeRF dynamic scenes
            times.append(float(fr["time"]))

    ds = Dataset.from_views(cameras, np.stack(images))
    if times and len(times) == len(cameras):
        ds.times = np.asarray(times, np.float32)
    return ds


def load_dataset(source: str, dataset_type: str = "auto", **kw):
    """Dispatch on dataset type; 'auto' sniffs the directory layout."""
    if dataset_type == "auto":
        if os.path.exists(os.path.join(source, "transforms_train.json")):
            dataset_type = "blender"
        else:
            dataset_type = "colmap"
    if dataset_type == "blender":
        wb = kw.pop("white_background", False)
        kw.pop("eval_holdout", None)
        train = load_blender_dataset(source, split="train",
                                     white_background=wb, **kw)
        evald = None
        if os.path.exists(os.path.join(source, "transforms_test.json")):
            try:
                evald = load_blender_dataset(source, split="test",
                                             white_background=wb, **kw)
            except FileNotFoundError:
                pass
        return train, evald
    kw.pop("white_background", None)
    return load_colmap_dataset(source, **kw)
