"""Headless trainer CLI — the TPU rebuild of diverseshot-cli
(``application/diverseshot-cli/source/{main.cpp,gs_train.cpp}``):
flag-compatible superset, phase state machine, tqdm progress, periodic
checkpoints past the alpha-reset warmup, final PLY save.

Usage:
  python -m divshot_tpu.apps.train --source_path <scene> --model_path out/
  python -m divshot_tpu.apps.train --demo  (synthetic scene, no dataset)
"""

from __future__ import annotations

import os
import sys

import numpy as np


def main(argv=None):
    import jax
    from divshot_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    from divshot_tpu.core.config import config_from_flags, auto_tune_config
    from divshot_tpu.core.metrics import (
        MetricsWriter, PhaseTracker, TrainingStatus)
    from divshot_tpu.splat.gaussians import init_from_points
    from divshot_tpu.gsio.datasets import load_dataset
    from divshot_tpu.gsio.synthetic import (
        random_scene, orbit_cameras, render_gt_images)
    from divshot_tpu.train.trainer import Trainer, Dataset
    from divshot_tpu.train import checkpoint as CK
    from divshot_tpu.gsio import ply as P
    from tqdm import tqdm
    import jax.numpy as jnp

    argv = argv if argv is not None else sys.argv[1:]
    demo = "--demo" in argv
    argv = [a for a in argv if a != "--demo"]
    cfg = config_from_flags(argv)
    if cfg.debug_nan:
        # SURVEY §5.2 debug mode: fail at the op that produces NaN
        jax.config.update("jax_debug_nans", True)
    phase = PhaseTracker()
    phase.set(TrainingStatus.LOADING_PREPARE)

    # ---- data ----
    if demo:
        rng = np.random.default_rng(cfg.seed)
        gt = random_scene(rng, 20_000, sh_degree=cfg.sh_degree,
                          scale_range=(0.004, 0.03))
        cams = orbit_cameras(32, width=400)
        images = render_gt_images(gt, cams, backend="pallas",
                                  instance_capacity=1 << 19)
        ds = Dataset.from_views(cams, images)
        points = np.asarray(gt.means)[::4]
        colors = np.full((points.shape[0], 3), 0.5, np.float32)
        eval_ds = None
    else:
        if not cfg.source_path:
            print("error: --source_path required (or --demo)")
            return 2
        ds, eval_ds = load_dataset(
            cfg.source_path, cfg.dataset_type,
            max_width=cfg.max_image_width, max_height=cfg.max_image_height,
            eval_holdout=cfg.eval_holdout, max_images=cfg.max_image_count,
            white_background=cfg.white_background, use_mask=cfg.use_mask)
        points, colors = ds.points, ds.colors
        if points is None:
            # no SfM cloud (e.g. blender): random init in the camera bbox
            rng = np.random.default_rng(cfg.seed)
            n0 = min(100_000, int(cfg.densify.cap_max))
            points = rng.uniform(-1.3, 1.3, (n0, 3)).astype(np.float32)
            colors = rng.uniform(0, 1, (n0, 3)).astype(np.float32)

    cfg = auto_tune_config(cfg, ds.num_views)
    phase.set(TrainingStatus.GS)

    capacity = int(cfg.densify.cap_max)
    params = init_from_points(points, colors, sh_degree=cfg.sh_degree,
                              capacity=capacity)
    phase.set(TrainingStatus.PREPROCESS_DONE)

    model_path = cfg.model_path or "output"
    os.makedirs(model_path, exist_ok=True)

    from divshot_tpu.core.config import ModelType
    if cfg.model_type in (ModelType.DEFORM, ModelType.HEXPLANE):
        return _train_dynamic(cfg, ds, eval_ds, params, model_path, phase)

    # instance buffers sized from RasterConfig (instance_capacity_mult x
    # cap_max) by Trainer._build_steps — a fixed literal here silently
    # overflows at reference-scale cap_max (round-2 weak #6).
    # Backend is model-type aware: forcing "pallas" for modelType=1 made
    # r4's 2DGS leg train through the flattened-3D approximation AND eval
    # the raw params as thick 3D slabs (train PSNR 30.7 vs eval 18.2 —
    # the whole r4 "2DGS quality gap" was this eval-path bug).
    surfel2d = cfg.model_type == ModelType.GS2D
    backend = "surfel_pallas" if (surfel2d and cfg.surfel_exact) \
        else "pallas"
    trainer = Trainer(cfg, ds, params, render_kwargs={"backend": backend})

    # resume (reference: create_splat(config, load_itr))
    load_itr = getattr(cfg, "load_itr", -1)
    if load_itr == -2:  # latest
        load_itr = CK.latest_step(model_path) or -1
    if load_itr > 0:
        trainer.state = CK.load_checkpoint(model_path, load_itr,
                                           trainer.state)
        trainer._host_step = load_itr
        print(f"resumed from iteration_{load_itr}")

    phase.set(TrainingStatus.TRAINING)
    metrics_csv = MetricsWriter(os.path.join(model_path, "metrics.csv"))
    start = int(np.asarray(trainer.state.opt.step))
    pbar = tqdm(total=cfg.num_iters, initial=start, desc="train")

    from divshot_tpu.train.evaluate import evaluate
    bg = jnp.ones((3,), jnp.float32) if cfg.white_background else None
    # NOTE: instance_capacity is read per-eval (not captured once) —
    # auto_instance_capacity grows the training buffer mid-run and eval
    # renders must track it or they silently drop instances (ADVICE r4)
    def eval_rk():
        return {"backend": trainer._render_kwargs.get("backend", "pallas"),
                "instance_capacity": trainer._instance_capacity,
                "antialiased": cfg.raster.mip_antialiased}
    eval_curve: list[dict] = []
    # on resume, keep the earlier curve entries (the eval history is the
    # quality record — never drop it)
    _curve_path = os.path.join(model_path, "eval_curve.json")
    if start > 0 and os.path.exists(_curve_path):
        import json as _json
        with open(_curve_path) as f:
            eval_curve = [e for e in _json.load(f) if e["step"] <= start]

    def run_eval(step):
        if eval_ds is None:
            return None
        p_eval = trainer.state.params
        if surfel2d and not cfg.surfel_exact:
            # flattened mode renders through the 3D kernels: eval must use
            # the surfel convention (third axis clamped), exactly as the
            # train step does — evaluating the raw params as 3D slabs was
            # the r4 quality-gap bug
            from divshot_tpu.train.geometry import flatten_to_surfels
            p_eval = flatten_to_surfels(p_eval)
        ev = evaluate(p_eval, eval_ds,
                      render_kwargs=eval_rk(), background=bg)
        entry = {"step": step, "psnr": ev["psnr"], "ssim": ev["ssim"],
                 "num_alive": int(np.asarray(jnp.sum(
                     trainer.state.params.alive.astype(jnp.int32))))}
        if "lpips" in ev:
            entry["lpips"] = ev["lpips"]
        eval_curve.append(entry)
        metrics_csv.write(step, {"eval_psnr": ev["psnr"],
                                 "eval_ssim": ev["ssim"]})
        import json as _json
        with open(os.path.join(model_path, "eval_curve.json"), "w") as f:
            _json.dump(eval_curve, f, indent=1)
        return ev

    def callback(i, state, m):
        step = start + i + 1
        pbar.update(1)
        if step % 100 == 0:
            metrics_csv.write(step, {k: v for k, v in m.items()})
            pbar.set_postfix(loss=f"{float(m['loss']):.4f}",
                             alive=int(m["num_alive"]))
            trainer.check_overflow(m)
        # checkpoint cadence: every checkpoint_every past warmup
        # (gs_train.cpp:165-166)
        if (step % cfg.checkpoint_every == 0
                and step > cfg.densify.reset_alpha_every):
            CK.save_checkpoint(model_path, state, step=step)
        if cfg.eval_every and step % cfg.eval_every == 0:
            ev = run_eval(step)
            if ev:
                pbar.write(f"[eval @ {step}] PSNR {ev['psnr']:.2f} dB  "
                           f"SSIM {ev['ssim']:.4f}")
        phase.progress = step / cfg.num_iters

    trainer.run(cfg.num_iters - start, log_every=0, callback=callback)
    pbar.close()
    phase.set(TrainingStatus.TRAINING_DONE, 1.0)

    # final save
    CK.save_checkpoint(model_path, trainer.state, step=int(cfg.num_iters))
    out_ply = os.path.join(model_path, "point_cloud.ply")
    save_params = trainer.state.params
    if cfg.model_type == ModelType.GS2D:
        # persist the surfel convention: third axis at the flat log-scale,
        # so the PLY renders identically through any 3DGS consumer
        from divshot_tpu.train.geometry import flatten_to_surfels
        save_params = flatten_to_surfels(save_params)
    P.save_ply(out_ply, save_params,
               antialiased=cfg.raster.mip_antialiased)
    print(f"saved {out_ply}")

    # final eval PSNR/SSIM on the test split
    ev = run_eval(int(cfg.num_iters))
    if ev is not None:
        print(f"final eval over {ev['n_views']} views: "
              f"PSNR {ev['psnr']:.2f} dB  SSIM {ev['ssim']:.4f}")
    metrics_csv.close()
    return 0


def _train_dynamic(cfg, ds, eval_ds, params, model_path, phase):
    """Dynamic-variant training loop (model_type DEFORM/HEXPLANE —
    BASELINE configs #4/#5): tqdm progress, periodic full-pytree
    checkpoints, eval curve at each view's own timestamp, final canonical
    PLY."""
    import json

    import jax
    import numpy as np
    from tqdm import tqdm

    from divshot_tpu.core.metrics import MetricsWriter, TrainingStatus
    from divshot_tpu.models.dynamic import DynamicTrainer, evaluate_dynamic
    from divshot_tpu.train import checkpoint as CK
    from divshot_tpu.gsio import ply as P

    backend = "pallas" if jax.default_backend() == "tpu" else "tiles"
    trainer = DynamicTrainer(cfg, ds, params,
                             render_kwargs={"backend": backend})
    phase.set(TrainingStatus.TRAINING)
    metrics_csv = MetricsWriter(os.path.join(model_path, "metrics.csv"))
    pbar = tqdm(total=cfg.num_iters, desc="train[dyn]")
    eval_curve: list[dict] = []

    def run_eval(step):
        if eval_ds is None or eval_ds.times is None:
            return None
        ev = evaluate_dynamic(trainer.state, trainer.net, eval_ds,
                              render_kwargs={
                                  "backend": backend,
                                  "instance_capacity":
                                  trainer._instance_capacity})
        eval_curve.append({"step": step, **ev})
        with open(os.path.join(model_path, "eval_curve.json"), "w") as f:
            json.dump(eval_curve, f, indent=1)
        return ev

    def callback(i, state, m):
        step = i + 1
        pbar.update(1)
        if step % 100 == 0:
            metrics_csv.write(step, {k: v for k, v in m.items()})
            pbar.set_postfix(loss=f"{float(m['loss']):.4f}",
                             alive=int(m["num_alive"]))
        if step % cfg.checkpoint_every == 0:
            CK.save_checkpoint_pytree(model_path, state, step=step)
        if cfg.eval_every and step % cfg.eval_every == 0:
            ev = run_eval(step)
            if ev:
                pbar.write(f"[eval @ {step}] PSNR {ev['psnr']:.2f} dB")

    trainer.run(cfg.num_iters, callback=callback)
    pbar.close()
    phase.set(TrainingStatus.TRAINING_DONE, 1.0)
    CK.save_checkpoint_pytree(model_path, trainer.state,
                              step=int(cfg.num_iters))
    out_ply = os.path.join(model_path, "point_cloud.ply")
    P.save_ply(out_ply, trainer.state.params)
    print(f"saved canonical {out_ply}")
    ev = run_eval(int(cfg.num_iters))
    if ev is not None:
        print(f"final eval over {ev['n_views']} views: "
              f"PSNR {ev['psnr']:.2f} dB  SSIM {ev['ssim']:.4f}")
    metrics_csv.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
