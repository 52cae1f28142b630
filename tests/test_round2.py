"""Round-2 fixes: capacity overflow surfacing, live config application,
previously-dead RasterConfig fields, batched steps, exact MCMC relocation.

Covers the VERDICT round-1 weak items #1 (silent overflow), #3 (update_config
no-op), #4 (dead config fields / batch_size), #7 (MCMC relocation math).
"""

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from divshot_tpu.core.config import TrainConfig, DensifyStrategy
from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras
from divshot_tpu.raster.render import render
from divshot_tpu.train.trainer import (
    Dataset, Trainer, hypers_from_config, _structure_key)


def _tiny_dataset(rng, n=200, res=32, views=4):
    params = random_scene(rng, n, capacity=n + 56)
    cams = orbit_cameras(views, width=res)
    imgs = np.stack([
        np.asarray(render(params, c, backend="dense").image) for c in cams])
    return params, Dataset.from_views(cams, imgs)


# ---------------------------------------------------------------------------
# overflow surfacing


def test_num_instances_reports_true_demand(rng):
    """bin_gaussians must report the PRE-cap instance count so callers can
    detect dropped work (VERDICT weak #1)."""
    params = random_scene(rng, 500, capacity=500,
                          scale_range=(0.3, 0.8))   # huge splats, many tiles
    cam = orbit_cameras(1, width=128)[0]
    tiny_cap = 256
    out = render(params, cam, backend="tiles", tile_capacity=64,
                 instance_capacity=tiny_cap, chunk=32)
    n_inst = int(out.num_instances)
    assert n_inst > tiny_cap, "test scene must actually overflow"
    assert out.max_tile_count is not None


def test_trainer_overflow_warning(rng):
    params, ds = _tiny_dataset(rng)
    cfg = TrainConfig(sh_degree=0, num_iters=2, ssim_weight=0.0)
    # r4: auto_instance_capacity grows the buffer instead of warning; the
    # DROPPED warning is the fallback when auto-growth is disabled
    cfg.raster.auto_instance_capacity = False
    tr = Trainer(cfg, ds, params,
                 render_kwargs={"backend": "tiles", "instance_capacity": 256,
                                "tile_capacity": 32, "chunk": 32})
    assert tr._instance_capacity == 256
    with pytest.warns(RuntimeWarning, match="DROPPED"):
        tr.check_overflow({"num_instances": 9999, "max_tile_count": 1})
    # warns only once
    tr.check_overflow({"num_instances": 9999, "max_tile_count": 1})


def test_metrics_carry_instance_counts(rng):
    params, ds = _tiny_dataset(rng)
    cfg = TrainConfig(sh_degree=0, num_iters=2, ssim_weight=0.0)
    tr = Trainer(cfg, ds, params, render_kwargs={"backend": "tiles",
                                                 "chunk": 32})
    m = tr.step_once()
    assert int(m["num_instances"]) > 0
    assert int(m["max_tile_count"]) > 0


# ---------------------------------------------------------------------------
# live config (lrs / loss weights traced into the compiled step)


def test_live_lr_change_applies_without_recompile(rng):
    params, ds = _tiny_dataset(rng)
    cfg = TrainConfig(sh_degree=0, ssim_weight=0.2, seed=7)
    copy = jax.tree.map(jnp.copy, params)   # steps donate their state
    tr = Trainer(cfg, ds, copy, render_kwargs={"backend": "tiles",
                                               "chunk": 32})
    step_obj = tr._step_full
    m0 = tr.step_once()
    means_before = np.asarray(tr.state.params.means)

    # crank position lr 100x — hyper-only change, same compiled step
    new_cfg = cfg.replace(optim=dataclasses.replace(
        cfg.optim, pos_lr_init=cfg.optim.pos_lr_init * 100,
        pos_lr_final=cfg.optim.pos_lr_final * 100))
    tr.apply_config(new_cfg)
    assert tr._step_full is step_obj, "hyper change must not rebuild"
    tr.step_once()
    delta_hot = np.abs(np.asarray(tr.state.params.means) - means_before).max()

    # replay with the original lr from a fresh trainer for comparison
    tr2 = Trainer(cfg, ds, params, render_kwargs={"backend": "tiles",
                                                  "chunk": 32})
    tr2.step_once()
    base = np.asarray(tr2.state.params.means)
    tr2.step_once()
    delta_cold = np.abs(np.asarray(tr2.state.params.means) - base).max()
    assert delta_hot > 5.0 * delta_cold, (delta_hot, delta_cold)


def test_structural_change_rebuilds(rng):
    params, ds = _tiny_dataset(rng)
    cfg = TrainConfig(sh_degree=0, ssim_weight=0.2)
    tr = Trainer(cfg, ds, params, render_kwargs={"backend": "tiles",
                                                 "chunk": 32})
    step_obj = tr._step_full
    tr.apply_config(cfg.replace(ssim_weight=0.0))   # structural: drops SSIM
    assert tr._step_full is not step_obj


def test_structure_key_separates_hypers():
    cfg = TrainConfig()
    hyper = cfg.replace(ssim_weight=0.35, optim=dataclasses.replace(
        cfg.optim, opacity_lr=0.42))
    assert _structure_key(cfg) == _structure_key(hyper)
    structural = cfg.replace(sh_degree=1)
    assert _structure_key(cfg) != _structure_key(structural)
    h = hypers_from_config(hyper)
    assert float(h["ssim_weight"]) == pytest.approx(0.35)
    assert float(h["opacity_lr"]) == pytest.approx(0.42)


def test_session_update_config_reaches_step(rng):
    """The queued change must actually alter trainer hypers (weak #3)."""
    from divshot_tpu.train.session import TrainerSession
    params, ds = _tiny_dataset(rng)
    cfg = TrainConfig(sh_degree=0, num_iters=6, ssim_weight=0.0)
    sess = TrainerSession(cfg, render_kwargs={"backend": "tiles",
                                              "chunk": 32})
    sess.load_synthetic(ds, params)
    sess.update_config(lambda c: c.replace(optim=dataclasses.replace(
        c.optim, opacity_lr=0.5)))
    sess.start_train()
    sess._thread.join(timeout=300)
    assert sess.status.name == "TRAINING_DONE", sess.error
    assert float(sess._trainer._hypers["opacity_lr"]) == pytest.approx(0.5)


# ---------------------------------------------------------------------------
# batch_size and radius_clip


def test_batched_step(rng):
    params, ds = _tiny_dataset(rng)
    cfg = TrainConfig(sh_degree=0, batch_size=3, ssim_weight=0.0)
    tr = Trainer(cfg, ds, params, render_kwargs={"backend": "tiles",
                                                 "chunk": 32})
    m = tr.step_once()
    assert np.isfinite(float(m["loss"]))
    assert int(tr.state.opt.step) == 1


def test_radius_clip_culls(rng):
    params = random_scene(rng, 300, capacity=300,
                          scale_range=(0.002, 0.004))  # sub-pixel splats
    cam = orbit_cameras(1, width=64)[0]
    out_all = render(params, cam, backend="tiles", chunk=32)
    out_clip = render(params, cam, backend="tiles", chunk=32,
                      radius_clip=4.0)
    vis_all = int(jnp.sum(out_all.proj.radii > 0))
    vis_clip = int(jnp.sum(out_clip.proj.radii > 0))
    assert vis_clip < vis_all
    assert vis_clip == int(jnp.sum(out_all.proj.radii > 4.0))


def test_t_eps_changes_early_stop(rng):
    params = random_scene(rng, 400, capacity=400, scale_range=(0.1, 0.3))
    cam = orbit_cameras(1, width=64)[0]
    a = render(params, cam, backend="tiles", chunk=32, t_eps=1e-4).image
    b = render(params, cam, backend="tiles", chunk=32, t_eps=0.5).image
    assert float(jnp.abs(a - b).max()) > 1e-4


# ---------------------------------------------------------------------------
# exact MCMC relocation (binomial rule)


def _reloc_reference(alpha, scale, n):
    """Direct double-sum transcription of gsplat's relocation.cu."""
    a_new = 1.0 - (1.0 - alpha) ** (1.0 / n)
    denom = 0.0
    for i in range(1, n + 1):
        for k in range(i):
            denom += (math.comb(i - 1, k) * (-1.0) ** k
                      * a_new ** (k + 1) / math.sqrt(k + 1))
    return a_new, scale * (alpha / denom)


def test_mcmc_relocation_matches_binomial_reference():
    from divshot_tpu.train.strategy import _relocation_rescale
    alphas = np.array([0.9, 0.5, 0.1, 0.02], np.float32)
    scales = np.log(np.array([[0.3], [0.1], [0.05], [0.7]], np.float32))
    for n in (1, 2, 3, 7, 20, 51):
        logits = np.log(alphas) - np.log1p(-alphas)
        o_new, s_new = _relocation_rescale(
            jnp.asarray(logits), jnp.asarray(scales),
            jnp.full((4,), n, jnp.int32))
        a_got = jax.nn.sigmoid(o_new)
        s_got = np.exp(np.asarray(s_new))[:, 0]
        for i in range(4):
            a_ref, s_ref = _reloc_reference(float(alphas[i]),
                                            float(np.exp(scales[i, 0])), n)
            np.testing.assert_allclose(float(a_got[i]), a_ref,
                                       rtol=2e-3, atol=2e-5)
            np.testing.assert_allclose(s_got[i], s_ref, rtol=5e-3)


def test_default_strategy_is_mcmc():
    assert TrainConfig().densify.strategy == DensifyStrategy.MCMC
