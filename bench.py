"""Round benchmark: steady-state training throughput + scale/roofline
evidence, single chip.

Entries (all on the real chip; auxiliary results go to stderr, the driver
contract line — ONE JSON object — to stdout):

1. full train step (fwd raster + bwd + Adam + densify stats) at 100K alive
   splats, 800x800 — the primary metric, comparable across rounds;
2. scale points: 1M and 3M alive splats at 1920x1080 (the reference's
   default capMax class, ``gs_train.cpp:89``; capacity claim
   ``docs/userGuide.md:11``) — train iters/s + instance demand;
3. render FPS (forward only) at 1080p / 1M splats — the viewer path
   (``gpu_sort.cpp`` + ``gaussian.cpp`` equivalent);
4. Pallas kernel wall-times vs the HBM roofline: the fwd/bwd kernels are
   bandwidth-bound (one (FEAT, I) table read fwd; read + (NGRAD, I) write
   bwd); %SoL = achieved bytes/s over ~819 GB/s (v5e HBM).

Baseline: the reference publishes no numbers (BASELINE.md); the anchor is
the original 3DGS CUDA trainer ~= 30K iters in ~30 min on an A6000-class
GPU ~= 16.7 iters/s average. vs_baseline = ours / 16.7.
"""

import json
import sys
import time

import numpy as np

V5E_HBM_GBPS = 819.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def time_it(fn, *args, iters=20, warmup=2, block=None):
    import jax
    for _ in range(warmup):
        r = fn(*args)
    (block or jax.block_until_ready)(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    (block or jax.block_until_ready)(r)
    return (time.perf_counter() - t0) / iters, r


def make_state(params, cfg):
    import jax
    from divshot_tpu.train.trainer import TrainState
    from divshot_tpu.train.optim import AdamState
    from divshot_tpu.train import strategy as S
    return TrainState(params=params, opt=AdamState.init(params),
                      dstate=S.DensifyState.init(params.capacity),
                      key=jax.random.PRNGKey(0))


def bench_train(n_alive, capacity, res_w, res_h, n_views=4, iters=30,
                instance_capacity=1 << 20, scale_range=(0.004, 0.025)):
    """-> (iters_per_s, max_instance_demand)."""
    import jax
    import jax.numpy as jnp
    from divshot_tpu.core.config import TrainConfig
    from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras, \
        render_gt_images
    from divshot_tpu.train.trainer import Dataset, make_train_step

    rng = np.random.default_rng(0)
    gt = random_scene(rng, min(n_alive, 50_000), sh_degree=3,
                      scale_range=scale_range)
    cams = orbit_cameras(n_views, width=res_w, height_px=res_h)
    images = render_gt_images(gt, cams, backend="pallas",
                              instance_capacity=1 << 20)
    ds = Dataset.from_views(cams, images)
    params = random_scene(rng, n_alive, sh_degree=3, capacity=capacity,
                          scale_range=scale_range)

    cfg = TrainConfig(sh_degree=3)
    cfg.densify.cap_max = capacity
    cfg.densify.refine_every = 100
    cfg.densify.warmup_length = 500

    step_fn = jax.jit(
        make_train_step(cfg, ds,
                        render_kwargs={"backend": "pallas",
                                       "instance_capacity":
                                       instance_capacity}),
        donate_argnums=(0,))
    state = make_state(params, cfg)
    state, m = step_fn(state, jnp.int32(0))
    jax.block_until_ready(m["loss"])
    demand = int(m["num_instances"])

    t0 = time.perf_counter()
    for i in range(iters):
        state, m = step_fn(state, jnp.int32(i % ds.num_views))
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0
    del state
    return iters / dt, demand


def bench_render_fps(n_alive, res_w, res_h, instance_capacity, iters=50):
    import jax
    from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras
    from divshot_tpu.raster.render import render

    rng = np.random.default_rng(0)
    params = random_scene(rng, n_alive, sh_degree=3,
                          scale_range=(0.004, 0.025))
    cam = orbit_cameras(1, width=res_w, height_px=res_h)[0]
    fn = jax.jit(lambda p: render(
        p, cam, backend="pallas",
        instance_capacity=instance_capacity).image)
    dt, _ = time_it(fn, params, iters=iters)
    return 1.0 / dt


def bench_kernel_roofline(n_alive, res_w, res_h, instance_capacity):
    """Time the Pallas fwd and bwd kernels in isolation; compare against
    the HBM roofline from the bytes each must move."""
    import jax
    import jax.numpy as jnp
    from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras
    from divshot_tpu.raster.project import project_gaussians
    from divshot_tpu.raster import tiles as T
    from divshot_tpu.raster import pallas_raster as PR
    from divshot_tpu.splat.sh import eval_sh_color
    from divshot_tpu.splat.math import safe_normalize

    rng = np.random.default_rng(0)
    params = random_scene(rng, n_alive, sh_degree=3,
                          scale_range=(0.004, 0.025))
    cam = orbit_cameras(1, width=res_w, height_px=res_h)[0]

    @jax.jit
    def prepare(p):
        proj = project_gaussians(p.means, p.scales, p.quats, cam)
        bins = T.bin_gaussians(
            proj.means2d, proj.depths, proj.radii, res_w, res_h,
            instance_capacity=instance_capacity, build_ids_mat=False)
        dirs = safe_normalize(p.means - cam.campos[None, :])
        colors = eval_sh_color(p.sh0, p.shN, dirs, 3)
        op = p.effective_opacity() * proj.comp
        table = PR.build_feature_table(proj.means2d, proj.conics, colors,
                                       op, bins.inst_gauss)
        return table, bins

    table, bins = jax.block_until_ready(prepare(params))
    icap = table.shape[1]
    n_inst = int(bins.tile_start[-1])

    fwd = jax.jit(lambda t, s: PR.rasterize_forward(
        t, s, width=res_w, height=res_h, nch=3))
    dt_f, out = time_it(fwd, table, bins.tile_start, iters=20)

    cot = jnp.ones_like(out)
    bwd = jax.jit(lambda t, s, c, o: PR.rasterize_backward(
        t, s, c, o, width=res_w, height=res_h, nch=3))
    dt_b, _ = time_it(bwd, table, bins.tile_start, cot, out, iters=20)

    # bytes: fwd reads the live instance span of the (FEAT, I) table once
    # (+ per-tile (8, px) outputs); bwd reads it and writes (NGRAD, I)
    feat_rows = PR._feat_rows(3)
    ngrad_rows = PR._ngrad_rows(3)
    tiles = ((res_w + 15) // 16) * ((res_h + 15) // 16)
    px_bytes = tiles * 8 * 256 * 4
    fwd_bytes = n_inst * feat_rows * 4 + px_bytes
    bwd_bytes = n_inst * (feat_rows + ngrad_rows) * 4 + 2 * px_bytes \
        + icap * ngrad_rows * 4  # zero-fill of the full grad table
    sol_f = fwd_bytes / dt_f / 1e9 / V5E_HBM_GBPS
    sol_b = bwd_bytes / dt_b / 1e9 / V5E_HBM_GBPS
    return {"n_instances": n_inst, "fwd_ms": dt_f * 1e3,
            "bwd_ms": dt_b * 1e3, "fwd_pct_sol": 100 * sol_f,
            "bwd_pct_sol": 100 * sol_b}


def main():
    from divshot_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    results = {}

    # 1. primary (comparable with BENCH_r01/r02)
    it100k, d100k = bench_train(100_000, 1 << 17, 800, 800, n_views=16,
                                instance_capacity=1 << 20)
    results["train_100k_800px"] = {"iters_per_s": round(it100k, 3),
                                   "instance_demand": d100k}
    log(f"train 100K@800px: {it100k:.2f} it/s (demand {d100k})")

    # 2. scale points at 1080p
    for n, cap_i in ((1_000_000, 1 << 23), (3_000_000, 1 << 24)):
        try:
            it, d = bench_train(n, n, 1920, 1080, n_views=2, iters=15,
                                instance_capacity=cap_i)
            results[f"train_{n//1_000_000}m_1080p"] = {
                "iters_per_s": round(it, 3), "instance_demand": d}
            log(f"train {n/1e6:.0f}M@1080p: {it:.2f} it/s (demand {d})")
        except Exception as e:
            log(f"scale point {n} failed: {e}")
            results[f"train_{n//1_000_000}m_1080p"] = {"error": str(e)[:200]}

    # 3. render FPS
    try:
        fps = bench_render_fps(1_000_000, 1920, 1080, 1 << 23)
        results["render_fps_1m_1080p"] = round(fps, 1)
        log(f"render 1M@1080p: {fps:.1f} FPS")
    except Exception as e:
        log(f"render bench failed: {e}")

    # 4. kernel roofline
    try:
        rl = bench_kernel_roofline(1_000_000, 1920, 1080, 1 << 23)
        results["kernel_roofline_1m_1080p"] = {
            k: round(v, 2) if isinstance(v, float) else v
            for k, v in rl.items()}
        log(f"kernels 1M@1080p: fwd {rl['fwd_ms']:.2f} ms "
            f"({rl['fwd_pct_sol']:.0f}% SoL), bwd {rl['bwd_ms']:.2f} ms "
            f"({rl['bwd_pct_sol']:.0f}% SoL), {rl['n_instances']} inst")
    except Exception as e:
        log(f"roofline bench failed: {e}")

    baseline = 16.7  # 3DGS CUDA trainer anchor (BASELINE.md)
    print(json.dumps({
        "metric": "train_iters_per_s_100k_splats_800px",
        "value": round(it100k, 3),
        "unit": "iters/s",
        "vs_baseline": round(it100k / baseline, 3),
        "aux": results,
    }))


if __name__ == "__main__":
    main()
