"""TrainerSession (GaussianTrainerScene-parity API), SfM helpers, and the
progressive-resolution / PixelGS / cullSH trainer options."""

import time

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from divshot_tpu.core.config import TrainConfig
from divshot_tpu.core.metrics import TrainingStatus


def _tiny_dataset(rng, views=4, res=64, n=400):
    from divshot_tpu.gsio.synthetic import (
        random_scene, orbit_cameras, render_gt_images)
    from divshot_tpu.train.trainer import Dataset
    gt = random_scene(rng, n, sh_degree=0)
    cams = orbit_cameras(views, width=res)
    images = render_gt_images(gt, cams, tile_capacity=256,
                              instance_capacity=1 << 13)
    return Dataset.from_views(cams, images), gt


def _session_cfg(num_iters=30, **kw):
    cfg = TrainConfig(sh_degree=0, num_iters=num_iters, **kw)
    cfg.densify.cap_max = 1024
    cfg.densify.warmup_length = 10_000   # no refine in this short run
    return cfg


def _session_rk():
    return {"backend": "tiles", "tile_capacity": 256,
            "instance_capacity": 1 << 13}


def test_session_lifecycle(rng):
    from divshot_tpu.train.session import TrainerSession
    from divshot_tpu.gsio.synthetic import random_scene

    sess = TrainerSession(_session_cfg(), render_kwargs=_session_rk(),
                          snapshot_every=10)
    ds, _ = _tiny_dataset(rng)
    params = random_scene(rng, 300, sh_degree=0, capacity=1024)
    sess.load_synthetic(ds, params)
    assert sess.status == TrainingStatus.PREPROCESS_DONE
    assert sess.num_cameras == 4
    assert sess.get_camera(0).width == 64

    sess.start_train()
    deadline = time.time() + 120
    while not sess.is_terminated() and time.time() < deadline:
        time.sleep(0.1)
    assert sess.status == TrainingStatus.TRAINING_DONE, sess.error
    assert sess.current_iteration == 30
    assert np.isfinite(sess.current_loss)
    assert sess.num_gaussians > 0

    pos = sess.get_gaussian_positions()
    assert pos.shape[1] == 3 and pos.shape[0] > 0
    assert sess.get_gaussian_rotations().shape[1] == 4
    snap = sess.get_params_snapshot()
    assert snap.means.shape[0] == pos.shape[0]


def test_session_pause_resume_and_config_queue(rng):
    from divshot_tpu.train.session import TrainerSession
    from divshot_tpu.gsio.synthetic import random_scene

    cfg = _session_cfg(num_iters=10_000)
    sess = TrainerSession(cfg, render_kwargs=_session_rk(),
                          snapshot_every=0)
    ds, _ = _tiny_dataset(rng)
    sess.load_synthetic(ds, random_scene(rng, 200, sh_degree=0,
                                         capacity=1024))
    sess.start_train()
    deadline = time.time() + 120
    while sess.current_iteration < 3 and time.time() < deadline:
        time.sleep(0.05)
    assert sess.is_training()

    sess.pause_train()
    time.sleep(0.3)
    it = sess.current_iteration
    time.sleep(0.3)
    assert sess.current_iteration == it          # paused = no progress
    assert not sess.is_training()

    # queue a config change: stop at the next iteration boundary
    sess.update_config(lambda c: c.replace(num_iters=it + 2))
    sess.resume()
    deadline = time.time() + 120
    while not sess.is_terminated() and time.time() < deadline:
        time.sleep(0.1)
    assert sess.status == TrainingStatus.TRAINING_DONE, sess.error
    sess.terminate()


def test_session_save_model(rng, tmp_path):
    from divshot_tpu.train.session import TrainerSession
    from divshot_tpu.gsio.synthetic import random_scene
    from divshot_tpu.gsio.io import load_model

    sess = TrainerSession(_session_cfg(), render_kwargs=_session_rk())
    ds, _ = _tiny_dataset(rng)
    sess.load_synthetic(ds, random_scene(rng, 200, sh_degree=0,
                                         capacity=1024))
    out = str(tmp_path / "live.ply")
    sess.save_model(out)
    loaded, _meta = load_model(out)
    assert loaded.means.shape[0] > 0

    pc = str(tmp_path / "sparse.ply")
    sess._sfm_points = np.zeros((5, 3), np.float32)
    sess.export_sparse_point_cloud(pc)
    assert (tmp_path / "sparse.ply").stat().st_size > 0


def test_needs_sfm(tmp_path):
    from divshot_tpu.gsio import sfm

    # bare image dir -> needs sfm
    d = tmp_path / "scene"
    (d / "images").mkdir(parents=True)
    assert sfm.needs_sfm(str(d))
    # blender transforms -> no sfm
    (d / "transforms_train.json").write_text("{}")
    assert not sfm.needs_sfm(str(d))
    # colmap sparse -> no sfm
    d2 = tmp_path / "scene2"
    (d2 / "sparse" / "0").mkdir(parents=True)
    (d2 / "sparse" / "0" / "cameras.bin").write_bytes(b"")
    assert not sfm.needs_sfm(str(d2))
    # video file -> needs sfm
    v = tmp_path / "clip.mp4"
    v.write_bytes(b"x")
    assert sfm.needs_sfm(str(v))


def test_sfm_raises_without_binary(tmp_path, monkeypatch):
    from divshot_tpu.gsio import sfm
    monkeypatch.setenv("PATH", "")
    monkeypatch.delenv("DIVSHOT_COLMAP", raising=False)
    with pytest.raises(RuntimeError, match="COLMAP"):
        sfm.run_sfm(str(tmp_path))


def test_video_frame_extraction_strategies(tmp_path):
    from divshot_tpu.gsio import sfm

    # synthesize a frame stream: moving gradient + noise (no codec needed)
    frames = []
    rng = np.random.default_rng(0)
    for i in range(40):
        base = np.zeros((48, 64, 3), np.uint8)
        base[:, (i * 2) % 64] = 255
        base += rng.integers(0, 30, base.shape, dtype=np.uint8)
        frames.append(base)

    for strat in (sfm.VideoStrategy.UNIFORM, sfm.VideoStrategy.QUALITY_BASED,
                  sfm.VideoStrategy.DIVERSITY_BASED, sfm.VideoStrategy.HYBRID):
        out = tmp_path / f"frames_{strat}"
        saved = sfm.extract_video_frames(
            "unused.mp4", str(out), strategy=strat, fps=5.0, max_frames=20,
            _frames=iter(frames), _src_fps=10.0)
        assert len(saved) > 0, f"strategy {strat} extracted nothing"
        assert (out / sorted(p.split("/")[-1] for p in saved)[0]).exists()


def test_progressive_resolution_steps(rng):
    from divshot_tpu.gsio.synthetic import random_scene
    from divshot_tpu.train.trainer import (
        Trainer, TrainState)

    cfg = _session_cfg(num_iters=9)
    cfg = cfg.replace(progressive_train=True, resolution_schedule=3)
    ds, _ = _tiny_dataset(rng, res=64)
    params = random_scene(rng, 200, sh_degree=0, capacity=1024)
    tr = Trainer(cfg, ds, params, render_kwargs=_session_rk())
    for _ in range(9):
        m = tr.step_once()
    assert np.isfinite(float(m["loss"]))
    assert tr._host_step == 9


def test_pixelgs_and_cullsh_step(rng):
    from divshot_tpu.gsio.synthetic import random_scene
    from divshot_tpu.train.trainer import Trainer

    cfg = _session_cfg(num_iters=3)
    cfg = cfg.replace(pixel_grad_scale=0.5, cull_sh=True)
    ds, _ = _tiny_dataset(rng, res=64)
    params = random_scene(rng, 200, sh_degree=0, capacity=1024)
    rk = dict(_session_rk())
    rk["backend"] = "pallas"
    tr = Trainer(cfg, ds, params, render_kwargs=rk)
    for _ in range(3):
        m = tr.step_once()
    assert np.isfinite(float(m["loss"]))
    # pixel counts accumulated into the densify weighting
    assert float(jnp.sum(tr.state.dstate.count)) > 0


def test_2dgs_distortion_single_pass(rng):
    """2DGS with normal + distortion losses trains through the shared
    multi-channel pass (pallas backend)."""
    from divshot_tpu.gsio.synthetic import random_scene
    from divshot_tpu.train.trainer import Trainer

    cfg = _session_cfg(num_iters=3)
    cfg = cfg.replace(model_type=1, normal_consistency_loss=True,
                      normal_start_iter=0, dist_loss_weight=1.0,
                      dist_start_iter=0)
    ds, _ = _tiny_dataset(rng, res=64)
    params = random_scene(rng, 150, sh_degree=0, capacity=512)
    rk = dict(_session_rk())
    rk["backend"] = "pallas"
    tr = Trainer(cfg, ds, params, render_kwargs=rk)
    losses = [float(tr.step_once()["loss"]) for _ in range(3)]
    assert all(np.isfinite(losses))
