"""Dynamic gaussians (deformable MLP + HexPlane) integration tests:
a moving synthetic scene must be fit better WITH the deformation field
than a static model can."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from divshot_tpu.core.config import TrainConfig
from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras, render_gt_images
from divshot_tpu.models.dynamic import (
    DeformationMLP, HexPlaneField, apply_deformation, make_dynamic_train_step)
from divshot_tpu.train.trainer import Dataset


def dynamic_setup(rng, res=48, n_times=5):
    """GT: cluster scene translated along +x over time."""
    gt = random_scene(rng, 300, sh_degree=0)
    base_cams = orbit_cameras(4, width=res)
    cams, images, times = [], [], []
    for ti in range(n_times):
        t = ti / (n_times - 1)
        moved = gt.replace(means=gt.means + jnp.asarray([0.6 * t, 0, 0]))
        imgs = render_gt_images(moved, base_cams, tile_capacity=512,
                                instance_capacity=1 << 14)
        for c, im in zip(base_cams, imgs):
            cams.append(c)
            images.append(im)
            times.append(t)
    ds = Dataset.from_views(cams, np.stack(images))
    ds.times = np.asarray(times, np.float32)
    # init params near the t=0 GT
    params = gt.replace(
        means=gt.means + 0.03 * jnp.asarray(
            rng.standard_normal(gt.means.shape), jnp.float32))
    return ds, params


@pytest.mark.parametrize("net_cls", [DeformationMLP, HexPlaneField])
def test_dynamic_training_improves(rng, net_cls):
    ds, params = dynamic_setup(rng)
    cfg = TrainConfig(sh_degree=0)
    cfg.densify.warmup_length = 20      # deformation kicks in at 20
    cfg.densify.refine_every = 10_000   # no refine in short test
    cfg.densify.cap_max = params.capacity

    net = net_cls(width=64, depth=3) if net_cls is DeformationMLP \
        else net_cls(resolution=32, time_resolution=16, features=8)
    init_fn, step_fn = make_dynamic_train_step(
        cfg, ds, net,
        render_kwargs={"tile_capacity": 512, "instance_capacity": 1 << 14},
        net_lr=2e-3)
    state = init_fn(params, jax.random.PRNGKey(0))
    step_fn = jax.jit(step_fn, donate_argnums=(0,))

    rng_np = np.random.default_rng(0)
    # grid fields train slower than the MLP in few iterations
    iters, factor = (150, 0.75) if net_cls is DeformationMLP else (300, 0.85)
    losses = []
    for i in range(iters):
        v = int(rng_np.integers(ds.num_views))
        state, m = step_fn(state, jnp.int32(v))
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-15:]) < factor * np.mean(losses[:15]), \
        f"{np.mean(losses[:15])} -> {np.mean(losses[-15:])}"

    # deformation must be time-dependent: deltas at t=0 vs t=1 differ
    d0 = net.apply(state.net_params, state.params.means[:100], jnp.float32(0.0))
    d1 = net.apply(state.net_params, state.params.means[:100], jnp.float32(1.0))
    diff = float(jnp.abs(d0["dxyz"] - d1["dxyz"]).mean())
    assert diff > 1e-4, f"deformation not time-dependent ({diff})"


def test_apply_deformation_shapes(rng):
    params = random_scene(rng, 64, sh_degree=0)
    net = DeformationMLP(width=32, depth=2)
    p = net.init(jax.random.PRNGKey(0), params.means, jnp.zeros(()))
    deltas = net.apply(p, params.means, jnp.float32(0.5))
    out = apply_deformation(params, deltas)
    assert out.means.shape == params.means.shape
    # zero-init heads: identity at initialization
    np.testing.assert_allclose(np.asarray(out.means),
                               np.asarray(params.means), atol=1e-6)


def _write_dnerf_dataset(tmp, rng, res=40, n_times=4):
    """Tiny D-NeRF-layout blender dataset on disk (time per frame)."""
    import json
    import os
    from PIL import Image
    from divshot_tpu.splat.camera import Camera

    gt = random_scene(rng, 200, sh_degree=0)
    fov = np.deg2rad(50.0)
    frames = []
    os.makedirs(os.path.join(tmp, "train"), exist_ok=True)
    base_cams = orbit_cameras(n_times * 2, width=res)
    for k, cam in enumerate(base_cams):
        t = (k % n_times) / (n_times - 1)
        moved = gt.replace(means=gt.means + jnp.asarray([0.5 * t, 0, 0]))
        img = render_gt_images(moved, [cam], tile_capacity=512,
                               instance_capacity=1 << 14)[0]
        name = f"r_{k}"
        Image.fromarray(img).save(os.path.join(tmp, "train", name + ".png"))
        # invert our w2c back to blender OpenGL c2w
        w2c = np.eye(4)
        w2c[:3, :3] = np.asarray(cam.viewmat[:3, :3])
        w2c[:3, 3] = np.asarray(cam.viewmat[:3, 3])
        c2w = np.linalg.inv(w2c)
        c2w[:3, 1:3] *= -1.0
        frames.append({"file_path": f"./train/{name}", "time": t,
                       "transform_matrix": c2w.tolist()})
    with open(os.path.join(tmp, "transforms_train.json"), "w") as f:
        json.dump({"camera_angle_x": float(fov), "frames": frames}, f)
    # test split = same views (smoke-scale)
    with open(os.path.join(tmp, "transforms_test.json"), "w") as f:
        json.dump({"camera_angle_x": float(fov), "frames": frames[:2]}, f)


def test_dynamic_cli_end_to_end(rng, tmp_path):
    """--model_type 2 drives the dynamic loop: trains from a D-NeRF-layout
    dataset, writes eval_curve.json, checkpoints, canonical PLY."""
    import os
    from divshot_tpu.apps.train import main

    src = str(tmp_path / "scene")
    out = str(tmp_path / "out")
    os.makedirs(src)
    _write_dnerf_dataset(src, rng)
    rc = main(["--source_path", src, "--model_path", out,
               "--model_type", "2", "--iterations", "6",
               "--eval_every", "3", "--checkpoint_every", "4",
               "--sh_degree", "0", "--cap_max", "512"])
    assert rc == 0
    assert os.path.exists(os.path.join(out, "point_cloud.ply"))
    assert os.path.exists(os.path.join(out, "eval_curve.json"))
    assert os.path.isdir(os.path.join(out, "iteration_4"))
    import json
    curve = json.load(open(os.path.join(out, "eval_curve.json")))
    assert len(curve) >= 2 and np.isfinite(curve[-1]["psnr"])


def test_dynamic_checkpoint_roundtrip(rng):
    """DynTrainState (net params + optax state included) survives orbax."""
    import tempfile
    from divshot_tpu.models.dynamic import DynamicTrainer
    from divshot_tpu.train import checkpoint as CK
    from divshot_tpu.core.config import TrainConfig

    ds, params = dynamic_setup(rng, res=32, n_times=3)
    cfg = TrainConfig(sh_degree=0, num_iters=4, model_type=2)
    cfg.densify.cap_max = params.capacity
    tr = DynamicTrainer(cfg, ds, params,
                        render_kwargs={"backend": "tiles",
                                       "instance_capacity": 1 << 14})
    tr.step_once()
    with tempfile.TemporaryDirectory() as tmp:
        CK.save_checkpoint_pytree(tmp, tr.state, step=1)
        restored = CK.load_checkpoint_pytree(tmp, 1, tr.state)
    np.testing.assert_array_equal(np.asarray(restored.params.means),
                                  np.asarray(tr.state.params.means))
    a = jax.tree.leaves(restored.net_params)
    b = jax.tree.leaves(tr.state.net_params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
