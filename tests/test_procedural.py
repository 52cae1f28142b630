"""Procedural ray-traced dataset: generation, blender-format round trip
through the standard loader, and a short end-to-end fit + evaluate."""

import numpy as np
import pytest

from divshot_tpu.gsio.procedural import (
    make_scene, render_view, _hemisphere_c2w, generate_dataset)


def test_tracer_renders_geometry():
    spec = make_scene()
    c2w = _hemisphere_c2w(0.8, 0.5, 3.6)
    img = render_view(spec, c2w, 64, 64, 0.5 * 64 / np.tan(np.deg2rad(20)))
    assert img.shape == (64, 64, 4)
    a = img[..., 3]
    assert 0.2 < a.mean() < 0.95          # object + background both visible
    rgb = img[..., :3]
    assert rgb.max() > 0.8 and rgb.std() > 0.1   # colorful, shaded


def test_tracer_views_differ():
    spec = make_scene()
    f = 0.5 * 48 / np.tan(np.deg2rad(20))
    a = render_view(spec, _hemisphere_c2w(0.0, 0.4, 3.6), 48, 48, f)
    b = render_view(spec, _hemisphere_c2w(2.0, 0.4, 3.6), 48, 48, f)
    assert np.abs(a - b).mean() > 0.02


def test_dataset_roundtrip_and_fit(tmp_path):
    """generate -> load through gsio.datasets -> few steps -> evaluate."""
    out = str(tmp_path / "bricks")
    generate_dataset(out, n_train=4, n_test=2, width=48, height=48)

    from divshot_tpu.gsio.datasets import load_dataset
    train, test = load_dataset(out, "auto", white_background=True)
    assert train.num_views == 4 and test.num_views == 2
    assert train.images.shape[1:] == (48, 48, 3)

    from divshot_tpu.core.config import TrainConfig
    from divshot_tpu.splat.gaussians import init_from_points
    from divshot_tpu.train.trainer import Trainer
    from divshot_tpu.train.evaluate import evaluate
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.5, 1.5, (400, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (400, 3)).astype(np.float32)
    params = init_from_points(pts, cols, sh_degree=0, capacity=512)
    cfg = TrainConfig(sh_degree=0, white_background=True, ssim_weight=0.0)
    tr = Trainer(cfg, train, params,
                 render_kwargs={"backend": "tiles", "chunk": 32})
    for _ in range(3):
        m = tr.step_once()
    assert np.isfinite(float(m["loss"]))

    ev = evaluate(tr.state.params, test,
                  render_kwargs={"backend": "tiles", "chunk": 32},
                  background=jnp.ones((3,), jnp.float32))
    assert np.isfinite(ev["psnr"]) and ev["n_views"] == 2
    assert 0.0 <= ev["ssim"] <= 1.0
