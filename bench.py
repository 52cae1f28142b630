"""Round benchmark: steady-state training throughput of the full train step
(forward raster + backward + Adam + densify stats) on the flagship tiled
rasterizer, single chip.

Scene: synthetic ground truth (no datasets ship in this container), 100K
splats at 128K capacity, 16 views at 800×800 — the scale class of the
reference's default runs (≤2-3M splats, SURVEY §6).

Baseline: the reference publishes no numbers (BASELINE.md); the anchor is
the original 3DGS CUDA trainer ≈ 30K iters in ~30 min on an A6000-class GPU
≈ 16.7 iters/s average. vs_baseline = ours / 16.7.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from divshot_tpu.core.config import TrainConfig
    from divshot_tpu.gsio.synthetic import (
        random_scene, orbit_cameras, render_gt_images)
    from divshot_tpu.train.trainer import (
        Dataset, TrainState, make_train_step)
    from divshot_tpu.train.optim import AdamState
    from divshot_tpu.train import strategy as S

    rng = np.random.default_rng(0)
    capacity = 1 << 17          # 131072
    n_alive = 100_000
    res = 800

    gt = random_scene(rng, n_alive, sh_degree=3, scale_range=(0.004, 0.025))
    cams = orbit_cameras(16, width=res)
    images = render_gt_images(
        gt, cams, backend="pallas", instance_capacity=1 << 20)
    ds = Dataset.from_views(cams, images)
    params = random_scene(rng, n_alive, sh_degree=3, capacity=capacity,
                          scale_range=(0.004, 0.025))

    cfg = TrainConfig(sh_degree=3)
    cfg.densify.cap_max = capacity
    cfg.densify.refine_every = 100
    cfg.densify.warmup_length = 500

    step_fn = jax.jit(
        make_train_step(
            cfg, ds,
            render_kwargs={"backend": "pallas",
                           "instance_capacity": 1 << 20}),
        donate_argnums=(0,))

    state = TrainState(params=params, opt=AdamState.init(params),
                       dstate=S.DensifyState.init(capacity),
                       key=jax.random.PRNGKey(0))

    # warmup/compile
    state, m = step_fn(state, jnp.int32(0))
    jax.block_until_ready(m["loss"])

    iters = 30
    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step_fn(state, jnp.int32(i % ds.num_views))
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    iters_per_s = iters / dt

    baseline = 16.7  # 3DGS CUDA trainer anchor (BASELINE.md)
    print(json.dumps({
        "metric": "train_iters_per_s_100k_splats_800px",
        "value": round(iters_per_s, 3),
        "unit": "iters/s",
        "vs_baseline": round(iters_per_s / baseline, 3),
    }))


if __name__ == "__main__":
    main()
