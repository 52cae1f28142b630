"""Training integration tests (SURVEY §4.3, scaled down for CI):
loss/PSNR must improve when fitting a synthetic ground-truth scene; the
densification strategies must run under jit without shape changes."""

import numpy as np
import jax
import jax.numpy as jnp

from divshot_tpu.core.config import TrainConfig, DensifyStrategy
from divshot_tpu.gsio.synthetic import (
    random_scene, orbit_cameras, render_gt_images)
from divshot_tpu.splat.gaussians import GaussianParams, init_from_points
from divshot_tpu.train.trainer import Trainer, Dataset
from divshot_tpu.train.losses import ssim, psnr


def small_setup(rng, strategy, n_gt=400, capacity=1200, res=64, n_views=10):
    gt = random_scene(rng, n_gt, sh_degree=0)
    cams = orbit_cameras(n_views, width=res)
    images = render_gt_images(gt, cams, tile_capacity=512)
    ds = Dataset.from_views(cams, images)

    # init from noisy subset of GT points (stand-in for an SfM cloud)
    pts = np.asarray(gt.means)[:200] + 0.05 * rng.standard_normal((200, 3))
    cols = rng.uniform(0.2, 0.8, (200, 3))
    params = init_from_points(pts, cols, sh_degree=0, capacity=capacity)

    cfg = TrainConfig(sh_degree=0, ssim_weight=0.2)
    cfg.densify.strategy = strategy
    cfg.densify.warmup_length = 30
    cfg.densify.refine_every = 40
    cfg.densify.reset_alpha_every = 10_000   # no reset in short test
    cfg.densify.refine_stop_iter = 10_000
    cfg.densify.cap_max = capacity
    return cfg, ds, params


def run_short(cfg, ds, params, iters=150):
    tr = Trainer(cfg, ds, params,
                 render_kwargs={"tile_capacity": 512, "chunk": 32,
                                "instance_capacity": 1 << 15})
    losses = []
    tr.run(iters, log_every=0,
           callback=lambda i, s, m: losses.append(float(m["loss"])))
    return tr, losses


def test_adc_training_improves(rng):
    cfg, ds, params = small_setup(rng, DensifyStrategy.ADC_PLUS)
    cfg.densify.revised_opacity = True
    tr, losses = run_short(cfg, ds, params)
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert last < 0.6 * first, f"loss did not improve: {first} -> {last}"
    assert np.isfinite(losses).all()
    alive = int(np.asarray(tr.state.params.alive).sum())
    assert 0 < alive <= params.capacity


def test_mcmc_training_improves(rng):
    cfg, ds, params = small_setup(rng, DensifyStrategy.MCMC)
    cfg.densify.cap_max = 800
    tr, losses = run_short(cfg, ds, params)
    first = np.mean(losses[:10])
    last = np.mean(losses[-10:])
    assert last < 0.7 * first, f"loss did not improve: {first} -> {last}"
    alive = int(np.asarray(tr.state.params.alive).sum())
    assert alive <= 800


def test_ssim_basics(rng):
    a = jnp.asarray(rng.uniform(0, 1, (64, 64, 3)), jnp.float32)
    assert float(ssim(a, a)) > 0.999
    b = jnp.clip(a + 0.2 * jnp.asarray(rng.standard_normal((64, 64, 3)),
                                       jnp.float32), 0, 1)
    assert float(ssim(a, b)) < 0.9
    assert float(psnr(a, a)) >= 99.0


def test_strategy_shapes_static(rng):
    """refine must not change any array shape (jit safety)."""
    from divshot_tpu.train import strategy as S
    from divshot_tpu.train.optim import AdamState
    from divshot_tpu.core.config import DensifyConfig

    params = random_scene(rng, 100, capacity=300)
    opt = AdamState.init(params)
    dstate = S.DensifyState.init(300)
    dstate = dstate.replace(
        grad_accum=jnp.asarray(rng.uniform(0, 1e-3, (300,)), jnp.float32),
        count=jnp.ones((300,)))
    cfg = DensifyConfig(grow_grad2d=1e-4)
    for strat in (DensifyStrategy.ADC, DensifyStrategy.MCMC):
        c = DensifyConfig(grow_grad2d=1e-4, strategy=strat, cap_max=300)
        p2, o2, d2 = jax.jit(
            lambda p, o, d, k: S.refine(c, p, o, d, k, jnp.int32(500), 1.0)
        )(params, opt, dstate, jax.random.PRNGKey(0))
        assert p2.means.shape == params.means.shape
        assert int(p2.alive.sum()) > 0


def test_2dgs_with_normal_loss(rng):
    """modelType=1 (2DGS surfels) + normal consistency loss trains stably."""
    from divshot_tpu.core.config import ModelType
    cfg, ds, params = small_setup(rng, DensifyStrategy.ADC_PLUS, res=48,
                                  n_views=6)
    cfg = cfg.replace(model_type=ModelType.GS2D,
                      normal_consistency_loss=True,
                      normal_start_iter=0)
    tr, losses = run_short(cfg, ds, params, iters=60)
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])


def test_normals_from_depth_plane(rng):
    """Depth of a fronto-parallel plane -> normals straight at the camera."""
    from divshot_tpu.train.geometry import normals_from_depth
    from divshot_tpu.gsio.synthetic import orbit_cameras
    cam = orbit_cameras(1, width=32)[0]
    depth = jnp.full((32, 32), 3.0)
    alpha = jnp.ones((32, 32))
    n = np.asarray(normals_from_depth(depth, cam, alpha))
    inner = n[4:-4, 4:-4]
    np.testing.assert_allclose(inner[..., 2], -1.0, atol=1e-4)


def test_enable_bg_training(rng):
    """Learnable environment background: train a scene composited over a
    non-trivial sky; envmap must move toward the data."""
    cfg, ds, params = small_setup(rng, DensifyStrategy.ADC_PLUS, res=48,
                                  n_views=6)
    cfg = cfg.replace(enable_bg=True)
    tr, losses = run_short(cfg, ds, params, iters=80)
    assert np.isfinite(losses).all()
    assert tr.state.bg is not None
    # bg params received updates
    assert float(jnp.abs(tr.state.bg["mu"]).sum()) > 0


def test_masked_training(rng):
    cfg, ds, params = small_setup(rng, DensifyStrategy.ADC_PLUS, res=48,
                                  n_views=4)
    masks = np.ones((ds.num_views, 48, 48), np.float32)
    masks[:, :, :24] = 0.0   # ignore the left half
    ds.masks = jnp.asarray(masks)
    tr, losses = run_short(cfg, ds, params, iters=40)
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_streamed_dataset_matches_device(rng):
    """Host-streamed images (gsio.loader prefetch) give the same training
    trajectory as HBM-resident images."""
    import jax.numpy as jnp
    from divshot_tpu.core.config import TrainConfig
    from divshot_tpu.gsio.synthetic import (
        random_scene, orbit_cameras, render_gt_images)
    from divshot_tpu.train.trainer import Dataset, Trainer

    gt = random_scene(rng, 300, sh_degree=0)
    cams = orbit_cameras(4, width=64)
    images = render_gt_images(gt, cams, tile_capacity=256,
                              instance_capacity=1 << 13)
    cfg = TrainConfig(sh_degree=0, num_iters=5, seed=3)
    cfg.densify.cap_max = 512
    cfg.densify.warmup_length = 10_000
    rk = {"backend": "tiles", "tile_capacity": 256,
          "instance_capacity": 1 << 13}

    params = random_scene(rng, 200, sh_degree=0, capacity=512)
    t_dev = Trainer(cfg, Dataset.from_views(cams, images), params,
                    render_kwargs=rk)
    losses_dev = [float(t_dev.step_once()["loss"]) for _ in range(5)]

    params2 = random_scene(np.random.default_rng(0), 200, sh_degree=0,
                           capacity=512)
    ds_stream = Dataset.from_views(cams, images, stream=True)
    assert ds_stream.streamed
    t_str = Trainer(cfg, ds_stream, params2, render_kwargs=rk)
    losses_str = [float(t_str.step_once()["loss"]) for _ in range(5)]
    # same seed -> same view order -> same losses (params2 init differs by
    # rng state; recreate identically instead)
    assert all(np.isfinite(losses_str))


def test_streamed_identical_losses(rng):
    """Bitwise-identical losses between streamed and device datasets when
    everything else matches."""
    from divshot_tpu.core.config import TrainConfig
    from divshot_tpu.gsio.synthetic import (
        random_scene, orbit_cameras, render_gt_images)
    from divshot_tpu.train.trainer import Dataset, Trainer

    gt = random_scene(rng, 200, sh_degree=0)
    cams = orbit_cameras(3, width=64)
    images = render_gt_images(gt, cams, tile_capacity=256,
                              instance_capacity=1 << 13)
    cfg = TrainConfig(sh_degree=0, num_iters=4, seed=11)
    cfg.densify.cap_max = 512
    cfg.densify.warmup_length = 10_000
    rk = {"backend": "tiles", "tile_capacity": 256,
          "instance_capacity": 1 << 13}

    def make_params():
        return random_scene(np.random.default_rng(7), 150, sh_degree=0,
                            capacity=512)

    t1 = Trainer(cfg, Dataset.from_views(cams, images), make_params(),
                 render_kwargs=rk)
    l1 = [float(t1.step_once()["loss"]) for _ in range(4)]
    t2 = Trainer(cfg, Dataset.from_views(cams, images, stream=True),
                 make_params(), render_kwargs=rk)
    l2 = [float(t2.step_once()["loss"]) for _ in range(4)]
    np.testing.assert_allclose(l1, l2, rtol=1e-6)
