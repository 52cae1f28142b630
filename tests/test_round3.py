"""Round-3 features: periodic prune strategies (pruneStrategy/pruneInterval,
``editor.cpp:2008-2016``), and config fields that must change behavior."""

import numpy as np
import jax
import jax.numpy as jnp

from divshot_tpu.core.config import DensifyConfig, TrainConfig, PruneStrategy
from divshot_tpu.splat.gaussians import GaussianParams
from divshot_tpu.train import strategy as S
from divshot_tpu.train.optim import AdamState


def _params(n=64, cap=64, seed=0):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    scales = rng.uniform(np.log(0.01), np.log(0.1), (n, 3)).astype(np.float32)
    opac = rng.uniform(-2, 2, (n,)).astype(np.float32)
    return GaussianParams.create(means, scales=scales, opacity=opac,
                                 sh_degree=0, capacity=cap)


def test_periodic_prune_reduce_drops_transparent():
    params = _params()
    # make 10 splats nearly transparent
    op = np.array(params.opacity)
    op[:10] = -8.0   # sigmoid ~ 3e-4 < prune_opacity 0.005
    params = params.replace(opacity=jnp.asarray(op))
    opt = AdamState.init(params)
    dstate = S.DensifyState.init(params.capacity)
    cfg = DensifyConfig(prune_strategy=PruneStrategy.REDUCE)
    p2, opt2 = S.periodic_prune(cfg, params, opt, dstate, scene_extent=1.0)
    alive = np.asarray(p2.alive)
    assert not alive[:10].any()
    assert alive[10:64].all()


def test_periodic_prune_light_culls_lowest_scores():
    params = _params()
    opt = AdamState.init(params)
    dstate = S.DensifyState.init(params.capacity)
    # give splats graded visibility counts; lowest-count+lowest-opacity
    # should be culled first
    counts = np.linspace(1, 100, params.capacity).astype(np.float32)
    dstate = dstate.replace(count=jnp.asarray(counts))
    cfg = DensifyConfig(prune_strategy=PruneStrategy.LIGHT)
    p2, _ = S.periodic_prune(cfg, params, opt, dstate, scene_extent=1.0)
    alive = np.asarray(p2.alive)
    n_culled = 64 - alive.sum()
    assert n_culled == int(64 * S.LIGHT_PRUNE_RATIO)
    # the culled set must have lower mean score proxy than the survivors
    alpha = 1 / (1 + np.exp(-np.asarray(params.opacity)))
    score = counts * alpha
    assert score[~alive[:64]].mean() < score[alive[:64]].mean()


def test_trainer_prune_interval_changes_behavior():
    """prune_interval + prune_strategy consumed by the compiled step: a tiny
    interval visibly shrinks the alive set vs the default (off)."""
    from divshot_tpu.train.trainer import Trainer, Dataset
    from divshot_tpu.gsio.synthetic import (
        random_scene, orbit_cameras, render_gt_images)

    rng = np.random.default_rng(0)
    gt = random_scene(rng, 128, sh_degree=0)
    cams = orbit_cameras(2, width=48)
    images = render_gt_images(gt, cams, backend="tiles")
    ds = Dataset.from_views(cams, images)

    def run(prune_interval):
        cfg = TrainConfig(sh_degree=0, num_iters=4)
        cfg.densify.cap_max = 128
        cfg.densify.warmup_length = 100     # no refine in this window
        cfg.densify.prune_interval = prune_interval
        cfg.densify.prune_strategy = PruneStrategy.LIGHT
        params = random_scene(rng, 128, sh_degree=0, capacity=128)
        tr = Trainer(cfg, ds, params)
        for _ in range(3):
            m = tr.step_once()
        return int(np.asarray(m["num_alive"]))

    base = run(prune_interval=0)
    pruned = run(prune_interval=2)
    assert pruned < base
