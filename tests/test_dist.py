"""Multi-chip SPMD tests on the 8-device virtual CPU mesh (SURVEY §4.4):
the data-parallel train step must compile, run, and match the single-device
step numerically at fixed seed."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from divshot_tpu.core.config import TrainConfig, DensifyStrategy
from divshot_tpu.gsio.synthetic import (
    random_scene, orbit_cameras, render_gt_images)
from divshot_tpu.splat.gaussians import init_from_points
from divshot_tpu.train.trainer import Trainer, Dataset, TrainState
from divshot_tpu.train.optim import AdamState
from divshot_tpu.train import strategy as S
from divshot_tpu.dist.mesh import (
    make_mesh, make_parallel_train_step, shard_train_state)


def setup(rng, capacity=1024):
    gt = random_scene(rng, 300, sh_degree=0)
    cams = orbit_cameras(8, width=64)
    images = render_gt_images(gt, cams, tile_capacity=512)
    ds = Dataset.from_views(cams, images)
    pts = np.asarray(gt.means)[:150]
    params = init_from_points(pts, rng.uniform(0.2, 0.8, (150, 3)),
                              sh_degree=0, capacity=capacity)
    cfg = TrainConfig(sh_degree=0)
    cfg.densify.warmup_length = 10
    cfg.densify.refine_every = 25
    cfg.densify.cap_max = capacity
    return cfg, ds, params


def make_state(cfg, params):
    return TrainState(
        params=params, opt=AdamState.init(params),
        dstate=S.DensifyState.init(params.capacity),
        key=jax.random.PRNGKey(0))


def test_parallel_step_runs(rng):
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    cfg, ds, params = setup(rng)
    mesh = make_mesh(n_data=4, n_model=2)
    compile_for = make_parallel_train_step(
        cfg, ds, mesh,
        render_kwargs={"tile_capacity": 256, "chunk": 32,
                       "instance_capacity": 1 << 14})
    state = shard_train_state(make_state(cfg, params), mesh)
    step = compile_for(state)
    views = jnp.arange(4, dtype=jnp.int32)
    for _ in range(3):
        state, metrics = step(state, views)
    assert np.isfinite(float(metrics["loss"]))
    assert int(metrics["num_alive"]) > 0


def test_parallel_matches_serial_loss(rng):
    """One batched step (4 views on 4 chips) == serial mean over the same
    4 views, to float tolerance."""
    cfg, ds, params = setup(rng)
    cfg.densify.warmup_length = 10_000  # no refine during the check

    from divshot_tpu.train.trainer import make_train_step
    rk = {"tile_capacity": 256, "chunk": 32, "instance_capacity": 1 << 14}

    # serial first: the parallel step donates (and deletes) its input buffers
    step_b = jax.jit(make_train_step(cfg, ds, rk, batch_size=4))
    state_b, metrics_b = step_b(make_state(cfg, params),
                                jnp.arange(4, dtype=jnp.int32))

    mesh = make_mesh(n_data=4, n_model=2)
    compile_for = make_parallel_train_step(cfg, ds, mesh, rk)
    state_p = shard_train_state(make_state(cfg, params), mesh)
    step_p = compile_for(state_p)
    state_p, metrics_p = step_p(state_p, jnp.arange(4, dtype=jnp.int32))

    np.testing.assert_allclose(float(metrics_p["loss"]),
                               float(metrics_b["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(state_p.params.means), np.asarray(state_b.params.means),
        atol=1e-5)


def test_tile_sharded_render_matches_single(rng):
    """Tile-banded multi-chip render == single-device render."""
    import jax.numpy as jnp
    from divshot_tpu.dist.mesh import make_mesh
    from divshot_tpu.dist.tiles import render_tiled
    from divshot_tpu.gsio.synthetic import random_scene
    from divshot_tpu.splat.camera import Camera
    from divshot_tpu.raster.render import render

    params = random_scene(rng, 300, sh_degree=0)
    cam = Camera.look_at([0, 0, -4.0], [0, 0, 0], [0, -1, 0], 50.0,
                         128, 128)
    mesh = make_mesh(n_data=8, n_model=1)
    rk = dict(tile_capacity=512, instance_capacity=1 << 13,
              backend="tiles")
    img_t, alpha_t = render_tiled(params, cam, mesh, **rk)
    out = render(params, cam, **rk)
    np.testing.assert_allclose(np.asarray(img_t), np.asarray(out.image),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(alpha_t), np.asarray(out.alpha),
                               atol=2e-3)
