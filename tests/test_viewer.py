"""Viewer tests: keyframe interpolation, offscreen render, MJPEG export."""

import os

import numpy as np

from divshot_tpu.viewer.keyframes import CameraKeyFrame, KeyFrameTimeline
from divshot_tpu.viewer.offline import render_path, render_views
from divshot_tpu.viewer.video import MJPEGWriter
from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras


def make_timeline():
    tl = KeyFrameTimeline()
    for i, t in enumerate([0.0, 1.0, 2.0]):
        a = t * np.pi / 4
        tl.add(CameraKeyFrame(
            time=t, quat=np.array([np.cos(a / 2), 0, np.sin(a / 2), 0]),
            pos=np.array([np.sin(a) * 4, 0, -np.cos(a) * 4]),
            fov_y_deg=50 + 10 * i))
    return tl


def test_keyframe_interpolation():
    tl = make_timeline()
    kf = tl.sample(0.5)
    assert 0 < kf.fov_y_deg - 50 < 10
    assert np.isclose(np.linalg.norm(kf.quat), 1, atol=1e-6)
    # endpoints exact
    np.testing.assert_allclose(tl.sample(0.0).pos, tl.frames[0].pos)
    np.testing.assert_allclose(tl.sample(2.0).pos, tl.frames[-1].pos)
    # camera_at produces a valid camera looking roughly at the scene
    cam = tl.camera_at(1.0, 64, 64)
    assert cam.width == 64


def test_render_path_video(rng, tmp_path):
    params = random_scene(rng, 150, sh_degree=0)
    tl = make_timeline()
    video = str(tmp_path / "fly.avi")
    frames = render_path(params, tl, width=64, height=64, fps=4,
                         video_path=video, tile_capacity=256,
                         instance_capacity=1 << 13)
    assert len(frames) == 9
    assert os.path.getsize(video) > 1000
    raw = open(video, "rb").read()
    assert raw[:4] == b"RIFF" and raw[8:12] == b"AVI "
    # frames differ as the camera moves
    assert np.abs(frames[0] - frames[-1]).mean() > 1e-3


def test_render_views_pngs(rng, tmp_path):
    params = random_scene(rng, 100, sh_degree=0)
    cams = orbit_cameras(3, width=48)
    out = str(tmp_path / "shots")
    imgs = render_views(params, cams, out_dir=out, tile_capacity=256,
                        instance_capacity=1 << 13)
    assert len(imgs) == 3
    assert sorted(os.listdir(out)) == ["00000.png", "00001.png", "00002.png"]
    from PIL import Image
    im = Image.open(os.path.join(out, "00000.png"))
    assert im.size == (48, 48)


def test_histogram_and_levels(rng):
    from divshot_tpu.viewer.histogram import (
        image_histogram, suggest_levels, apply_levels)
    img = rng.uniform(0.2, 0.8, (32, 32, 3)).astype(np.float32)
    h = image_histogram(img, bins=64)
    assert h["luma"].sum() == 32 * 32
    assert all(h[c].sum() == 32 * 32 for c in "rgb")
    lv = suggest_levels(img)
    assert 0.0 <= lv["black_point"] < lv["white_point"] <= 1.0
    out = apply_levels(img, **lv)
    # auto-levels stretches contrast
    assert out.max() > img.max() - 1e-3
    assert out.min() < img.min() + 1e-3


def test_cmdvars():
    from divshot_tpu.core.cmdvars import CmdVarRegistry, cvar
    reg = CmdVarRegistry.instance()
    v = cvar("test.someFlag", 3, "doc")
    seen = []
    v.on_change(seen.append)
    reg.set("test.someFlag", "7")
    assert v.value == 7 and seen == [7]
    reg.apply_cli(["test.someFlag=9"])
    assert v.value == 9
    assert cvar("test.someFlag", 0) is v    # re-register returns same


def test_step_timer():
    from divshot_tpu.core.profiling import StepTimer, profile_scope
    t = StepTimer()
    with t.scope("step"):
        with profile_scope("inner"):
            _ = sum(range(1000))
    s = t.summary()
    assert "step" in s and s["step"]["count"] == 1


def test_live_viewer_server():
    """LiveViewerServer over a training TrainerSession: page, status JSON,
    and .splat payload respond; generation advances with snapshots."""
    import json
    import urllib.request

    import numpy as np
    from divshot_tpu.core.config import TrainConfig
    from divshot_tpu.train.session import TrainerSession
    from divshot_tpu.train.trainer import Dataset
    from divshot_tpu.gsio.synthetic import (
        random_scene, orbit_cameras, render_gt_images)
    from divshot_tpu.viewer.live import LiveViewerServer

    rng = np.random.default_rng(0)
    gt = random_scene(rng, 128, sh_degree=0)
    cams = orbit_cameras(2, width=32)
    images = render_gt_images(gt, cams, backend="tiles")
    cfg = TrainConfig(sh_degree=0, num_iters=6)
    cfg.densify.cap_max = 128
    session = TrainerSession(cfg, render_kwargs={"backend": "tiles"},
                             snapshot_every=2)
    session.load_synthetic(Dataset.from_views(cams, images),
                           params=random_scene(rng, 128, sh_degree=0,
                                               capacity=128))
    server = LiveViewerServer(session, port=0).start()
    try:
        base = f"http://127.0.0.1:{server.port}"
        page = urllib.request.urlopen(f"{base}/").read().decode()
        assert "loadSplatBytes" in page and "splats?gen=" in page

        st0 = json.loads(urllib.request.urlopen(f"{base}/status").read())
        assert st0["max_iterations"] == 6
        gen0 = st0["generation"]

        raw = urllib.request.urlopen(f"{base}/splats").read()
        assert len(raw) % 32 == 0 and len(raw) // 32 == 128

        session.start_train()
        session.terminate(join=True)
        st1 = json.loads(urllib.request.urlopen(f"{base}/status").read())
        assert st1["generation"] > gen0
        raw1 = urllib.request.urlopen(f"{base}/splats").read()
        assert len(raw1) % 32 == 0 and len(raw1) > 0
    finally:
        server.stop()


def test_selection_tint_and_outline():
    """Selected splats tint toward the highlight color; the outline pass
    produces a closed edge around the selection silhouette."""
    import numpy as np
    import jax.numpy as jnp
    from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras
    from divshot_tpu.viewer.scene_render import (
        render_with_selection, selection_outline, composite_outline)

    rng = np.random.default_rng(0)
    params = random_scene(rng, 120, sh_degree=0)
    cam = orbit_cameras(1, width=64)[0]
    sel = jnp.arange(params.capacity) < 60

    rgb_sel, _ = render_with_selection(params, cam, sel, backend="tiles")
    rgb_none, _ = render_with_selection(
        params, cam, jnp.zeros_like(sel), backend="tiles")
    diff = np.abs(np.asarray(rgb_sel) - np.asarray(rgb_none)).max()
    assert diff > 0.05  # tint visibly changes the image

    ol = np.asarray(selection_outline(params, cam, sel, backend="tiles"))
    assert ol.shape == (64, 64) and 0 < ol.sum() < 64 * 64 * 0.5
    out = composite_outline(rgb_none, jnp.asarray(ol))
    assert np.isfinite(np.asarray(out)).all()


def test_settings_store(tmp_path):
    from divshot_tpu.core.settings import SettingsStore

    p = str(tmp_path / "cfg" / "editor.ini")
    s = SettingsStore(p)
    s.set("window", "width", 1920)
    s.set("window", "vsync", True)
    s.set("paths", "last_scene", "/data/lego")
    # reload from disk
    s2 = SettingsStore(p)
    assert s2.get("window", "width", 0) == 1920
    assert s2.get("window", "vsync", False) is True
    assert s2.get("paths", "last_scene", "") == "/data/lego"
    assert s2.get("window", "missing", 7) == 7
    s2.remove("window", "vsync")
    assert SettingsStore(p).get("window", "vsync", False) is False


def test_post_stack():
    """Tonemap operators, TAA accumulation (edge AA effect), sharpen."""
    import numpy as np
    import jax.numpy as jnp
    from divshot_tpu.viewer import post as P
    from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras
    from divshot_tpu.raster.render import render

    img = jnp.asarray(np.random.default_rng(0).uniform(0, 4, (16, 16, 3)),
                      jnp.float32)
    for op in ("linear", "reinhard", "aces"):
        out = np.asarray(P.apply_tonemap(img, op, exposure=0.5, gamma=2.2))
        assert out.min() >= 0 and out.max() <= 1 + 1e-6, op
    # reinhard preserves order
    a = float(P.tonemap_reinhard(jnp.asarray(0.3)))
    b = float(P.tonemap_reinhard(jnp.asarray(2.0)))
    assert a < b

    rng = np.random.default_rng(1)
    params = random_scene(rng, 80, sh_degree=0)
    cam = orbit_cameras(1, width=48)[0]

    taa = P.render_taa(
        lambda c: render(params, c, backend="tiles").image, cam, n_frames=4)
    single = render(params, cam, backend="tiles").image
    assert np.isfinite(np.asarray(taa)).all()
    assert np.abs(np.asarray(taa) - np.asarray(single)).max() > 1e-4

    hist = P.taa_blend(single, taa, alpha=0.2)
    assert np.isfinite(np.asarray(hist)).all()

    sh = P.post_process(jnp.clip(single, 0, 1), tonemap="aces",
                        sharpen_amount=0.3)
    assert np.asarray(sh).shape == (48, 48, 3)
