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


def test_init_scales_match_knn_spacing():
    """init_from_points scales come from true kNN distances (regression:
    a swapped (distance, index) unpack once produced log-scales of ~10 —
    splats thousands of units across — and collapsed training)."""
    from divshot_tpu.splat.gaussians import init_from_points
    rng = np.random.default_rng(0)
    pts = rng.uniform(-1.3, 1.3, (5000, 3)).astype(np.float32)
    cols = rng.uniform(0, 1, (5000, 3)).astype(np.float32)
    p = init_from_points(pts, cols, sh_degree=1)
    s = np.asarray(p.scales)[np.asarray(p.alive)]
    # 5000 uniform points in a 2.6-cube: spacing ~0.1; all scales must be
    # well under one scene unit and above float noise
    assert s.max() < 0.0, s.max()
    assert s.min() > np.log(1e-4), s.min()


def test_mcmc_relocation_stable_at_large_n():
    """The tabulated relocation denominator must stay sane for every
    (alpha, N) — the closed-form alternating sum is catastrophically
    unstable in f32 at N ≳ 20 (regression for the round-3 collapse)."""
    from divshot_tpu.train.strategy import _relocation_rescale
    alphas = np.linspace(1e-4, 1 - 1e-4, 101).astype(np.float32)
    logits = np.log(alphas) - np.log1p(-alphas)
    scales = np.zeros((101, 3), np.float32)
    for n in (1, 7, 23, 37, 51):
        o_new, s_new = _relocation_rescale(
            jnp.asarray(logits), jnp.asarray(scales),
            jnp.full((101,), n, jnp.int32))
        o_new, s_new = np.asarray(o_new), np.asarray(s_new)
        assert np.isfinite(o_new).all() and np.isfinite(s_new).all()
        # splitting never grows a splat, and never shrinks it to nothing
        assert (s_new <= 1e-6).all(), (n, s_new.max())
        assert (s_new > np.log(1e-3)).all(), (n, s_new.min())
        if n == 1:
            np.testing.assert_array_equal(s_new, scales)
            np.testing.assert_array_equal(o_new, logits)


def test_pack_level_bf16_training():
    """packLevel bit 1: SH-band buffers + Adam moments go bf16; training
    still converges to within a whisker of the f32 run."""
    from divshot_tpu.train.trainer import Trainer, Dataset
    from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras, \
        render_gt_images

    rng = np.random.default_rng(0)
    gt = random_scene(rng, 192, sh_degree=1)
    cams = orbit_cameras(3, width=48)
    images = render_gt_images(gt, cams, backend="tiles")
    ds = Dataset.from_views(cams, images)

    def run(pack):
        cfg = TrainConfig(sh_degree=1, num_iters=40)
        cfg.pack_level = pack
        cfg.densify.cap_max = 256
        cfg.densify.warmup_length = 1000
        params = random_scene(np.random.default_rng(1), 256, sh_degree=1,
                              capacity=256)
        tr = Trainer(cfg, ds, params)
        for _ in range(40):
            m = tr.step_once()
        return tr, float(m["loss"])

    tr0, l0 = run(0)
    tr1, l1 = run(1)
    assert tr1.state.params.shN.dtype == jnp.bfloat16
    assert tr1.state.opt.mu["shN"].dtype == jnp.bfloat16
    assert tr0.state.params.shN.dtype == jnp.float32
    # both converge; packed run within 20% of f32 loss after 40 steps
    assert l1 < 0.9 * 0.6 and abs(l1 - l0) / max(l0, 1e-6) < 0.2, (l0, l1)
    # exports stay f32 regardless of packing
    assert tr1.state.params.compact_numpy()["shN"].dtype == np.float32


def test_pack_level_auto_raise():
    """The reference VRAM guard raises packLevel when buffers would exceed
    half of device memory (editor.cpp:1577-1582)."""
    from divshot_tpu.train import trainer as TR

    orig = TR._device_memory_bytes
    TR._device_memory_bytes = lambda: 200 * 236 * 10  # tiny fake HBM
    try:
        from divshot_tpu.train.trainer import Trainer, Dataset
        from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras, \
            render_gt_images
        rng = np.random.default_rng(0)
        gt = random_scene(rng, 64, sh_degree=1)
        cams = orbit_cameras(2, width=32)
        images = render_gt_images(gt, cams, backend="tiles")
        ds = Dataset.from_views(cams, images)
        cfg = TrainConfig(sh_degree=1, num_iters=2)
        cfg.densify.cap_max = 256
        params = random_scene(rng, 256, sh_degree=1, capacity=256)
        tr = Trainer(cfg, ds, params)
        assert tr.pack_level & 1
        assert tr.state.params.shN.dtype == jnp.bfloat16
    finally:
        TR._device_memory_bytes = orig
