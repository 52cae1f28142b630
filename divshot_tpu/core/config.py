"""Training / rendering configuration.

One dataclass tree mirroring the semantics of the reference's
``GaussianTrainConfig`` (complete field inventory from
``diverseshot-cli/source/main.cpp:12-70``, ``gs_train.cpp:31-103`` and the
editor dialog ``editor.cpp:1657-2059``), including the dataset-size
auto-tuning heuristics (``editor.cpp:1990-2018``).
"""

from __future__ import annotations

import dataclasses
import math
from dataclasses import dataclass, field
from typing import Any


class DensifyStrategy:
    ADC = 0        # classic adaptive density control (gaussian-splatting)
    MCMC = 1       # 3DGS-as-MCMC relocation + noise
    ADC_PLUS = 2   # ADC with revised-opacity + abs-grad refinements


class ModelType:
    GS3D = 0
    GS2D = 1
    DEFORM = 2     # deformable-3DGS: MLP deformation field (BASELINE #4)
    HEXPLANE = 3   # 4DGS: HexPlane factored spacetime field (BASELINE #5)


class PruneStrategy:
    REDUCE = 0
    LIGHT = 1


@dataclass
class OptimConfig:
    """Per-group learning rates — defaults from ``main.cpp:31`` /
    standard 3DGS."""

    pos_lr_init: float = 0.00016
    pos_lr_final: float = 0.0000016
    pos_lr_delay_mult: float = 0.01
    pos_lr_max_steps: int = 30_000
    feature_lr: float = 0.0025       # sh0; shN uses feature_lr / 20
    opacity_lr: float = 0.05
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    eps: float = 1e-15
    b1: float = 0.9
    b2: float = 0.999
    visible_adam: bool = False       # sparse/visible-only Adam updates


@dataclass
class DensifyConfig:
    """Densification / pruning schedule — field-for-field semantics of the
    reference config (§2.9 of SURVEY.md)."""

    strategy: int = DensifyStrategy.MCMC  # reference CLI default (main.cpp:20)
    cap_max: int = 2_000_000          # max splats (MCMC hard cap / buffer size)
    refine_every: int = 100
    warmup_length: int = 500
    refine_stop_iter: int = 15_000
    # screen-size split trigger: DISABLED by default (0), matching gsplat's
    # DefaultStrategy (refine_scale2d_stop_iter=0, flagged "not well
    # tested" upstream). r4 evidence: with this enabled every splat whose
    # radius ever exceeded 5% of the screen split unconditionally each
    # refine, saturating cap_max within ~1.3K iters and stalling the ADC
    # quality leg at ~20 dB (runs/tpu_bricks_adc).
    refine_scale2d_stop_iter: int = 0
    reset_alpha_every: int = 3_000    # = 30 * refine_every
    grow_grad2d: float = 0.0002
    use_abs_grad: bool = True         # AbsGS
    revised_opacity: bool = False     # revised opacity heuristic on clone
    densify_scale3d: float = 0.01     # grow_scale3d: clone-vs-split threshold (x scene extent)
    densify_scale2d: float = 0.05     # grow_scale2d screen-size split threshold
    min_opacity: float = 0.005
    prune_opacity: float = 0.005
    prune_scale3d: float = 0.5        # prune if scale > 0.5 x scene extent (post reset window)
    prune_scale2d: float = 0.15
    prune_strategy: int = PruneStrategy.REDUCE
    prune_interval: int = 700_000     # LightGaussian-style hard prune interval
    noise_lr: float = 5e5             # MCMC noise learning rate
    mcmc_min_opacity: float = 0.005


@dataclass
class RasterConfig:
    tile_size: int = 16               # GROUP_WIDTH/HEIGHT=16 (gaussian_common.hlsl:161-163)
    mip_antialiased: bool = False     # Mip-Splatting AA opacity compensation
    eps2d: float = 0.3                # +0.3px low-pass dilation (gsplat_vs.hlsl:304-306)
    max_instances_per_gaussian: int = 64
    instance_capacity_mult: float = 8.0  # instance buffer = mult * capacity
    auto_instance_capacity: bool = True  # grow + recompile when measured
                                      # demand nears the buffer (the analog
                                      # of the reference's VRAM auto-raise,
                                      # editor.cpp:1577-1582)
    transmittance_min: float = 1e-4   # early-stop threshold
    depth_bits: int = 18              # depth bits in the (tile|depth) sort key
    radius_clip: float = 0.0          # cull splats with radius <= this (px)


@dataclass
class TrainConfig:
    # data
    source_path: str = ""
    model_path: str = ""
    dataset_type: str = "auto"        # colmap | blender | auto
    max_image_width: int = 2048
    max_image_height: int = 2048
    max_image_count: int = 0          # 0 = unlimited
    use_mask: bool = False
    white_background: bool = False
    eval_holdout: int = 0             # every Nth image held out (0 = none)
    eval_every: int = 0               # test-split PSNR/SSIM cadence (0 = end only)

    # model
    model_type: int = ModelType.GS3D
    # GS2D rasterization mode: exact ray-splat intersection kernels
    # (pallas_surfel) vs the flattened-3D approximation (third scale axis
    # clamped to FLAT_LOG_SCALE, shared EWA kernels). Exact is the default;
    # the flattened path exists because the surfel train-step's XLA:TPU
    # compile is pathologically slow on the axon remote-compile service
    # (>25 min at ANY scale, measured round 5 — see runs/QUALITY_r05.md),
    # while the flattened-mode programs compile in minutes and train to
    # equivalent photometric quality (30.7 dB train PSNR, r4 leg).
    surfel_exact: bool = True
    sh_degree: int = 3
    sh_degree_interval: int = 1000    # raise active SH degree every N iters
    enable_bg: bool = False           # separate sky/background model
    # HBM packing ladder (reference packLevel {0, PackF32ToU8, |PackTileID},
    # gs_train.cpp:90-96; auto-raised editor.cpp:1577-1582). TPU rungs:
    # bit 1 packs the SH-band training buffers + their Adam moments to
    # bf16 (the hardware-native reduced precision — u8 buffers would fight
    # the VPU); bit 2 (tile-ID packing) is inherent here — binning always
    # packs (tileID | depth) into u32 sort keys (raster/tiles.py).
    pack_level: int = 0

    # schedule
    num_iters: int = 30_000
    resolution_schedule: int = 3000   # progressive resolution ramp iters
    progressive_train: bool = False
    batch_size: int = 1

    # losses
    ssim_weight: float = 0.2
    normal_consistency_loss: bool = False  # 2DGS/SuGaR-style; forced by export_mesh
    normal_loss_weight: float = 0.05       # 2DGS lambda_n
    normal_start_iter: int = 7000          # 2DGS: normals supervised late
    dist_loss_weight: float = 0.0     # 2DGS depth-distortion weight
    dist_start_iter: int = 3000       # 2DGS: distortion supervised late
    pixel_grad_scale: float = 0.0     # pixelgs per-pixel gradient scaling

    # subsystems
    optim: OptimConfig = field(default_factory=OptimConfig)
    densify: DensifyConfig = field(default_factory=DensifyConfig)
    raster: RasterConfig = field(default_factory=RasterConfig)

    # output
    checkpoint_every: int = 10_000
    load_itr: int = -1          # checkpoint resume: -1 off, -2 latest, N
                                # (reference --load_itr, gs_train.cpp:47)
    export_mesh: bool = False
    mesh_resolution: int = 256
    cull_sh: bool = False
    verbose: bool = False
    debug_nan: bool = False     # enable jax_debug_nans (SURVEY §5.2 debug
                                # mode: fail fast at the op producing NaN)
    seed: int = 0

    def replace(self, **kw) -> "TrainConfig":
        return dataclasses.replace(self, **kw)


def auto_tune_config(cfg: TrainConfig, num_images: int) -> TrainConfig:
    """Dataset-size auto-scaling, matching the reference heuristics
    (``editor.cpp:2008-2016``): times = ceil(N/600); scale warmup, iters,
    prune interval, and derived refine stops. Fields the user explicitly
    changed from their defaults are left untouched."""
    defaults = TrainConfig()
    times = max(1, math.ceil(num_images / 600))

    def keep(user, default, tuned):
        return user if user != default else tuned

    num_iters = keep(cfg.num_iters, defaults.num_iters,
                     30_000 + 10_000 * (times - 1))
    d = dataclasses.replace(
        cfg.densify,
        prune_interval=keep(cfg.densify.prune_interval,
                            defaults.densify.prune_interval,
                            700_000 * times),
        warmup_length=keep(cfg.densify.warmup_length,
                           defaults.densify.warmup_length, 500 * times),
    )
    d = dataclasses.replace(
        d,
        refine_stop_iter=keep(cfg.densify.refine_stop_iter,
                              defaults.densify.refine_stop_iter,
                              num_iters // 2),
        reset_alpha_every=keep(cfg.densify.reset_alpha_every,
                               defaults.densify.reset_alpha_every,
                               30 * d.refine_every),
    )
    # strategy-aware gradient-threshold pairing: AbsGS absolute gradients
    # run ~3-4x larger than signed ones, so the classic 2e-4 threshold
    # over-triggers densification (r4 ADC leg saturated cap_max by iter
    # 1.3K). Follow gsplat's recommended pairing: absgrad => 4x threshold.
    # Classic ADC (densifyStrategy 0) uses signed grads, per graphdeco.
    if d.strategy == DensifyStrategy.ADC:
        d = dataclasses.replace(
            d, use_abs_grad=keep(cfg.densify.use_abs_grad,
                                 defaults.densify.use_abs_grad, False))
    if d.use_abs_grad and d.strategy != DensifyStrategy.MCMC:
        d = dataclasses.replace(
            d, grow_grad2d=keep(cfg.densify.grow_grad2d,
                                defaults.densify.grow_grad2d, 0.0008))
    out = dataclasses.replace(cfg, num_iters=num_iters, densify=d)
    # flattened-GS2D pairing: the 2DGS normal-consistency term is stable
    # against the exact ray-splat intersection normals, but through the
    # flattened-EWA approximation (surfel_exact=0) its gradient is
    # runaway-unstable once it activates — measured r5: eval 30.2 dB at
    # 6K collapsed to 18.5 train PSNR by 9K with lambda_n=0.05 from 7K.
    # Default it off in that mode; an explicit user value always wins.
    if out.model_type == ModelType.GS2D and not out.surfel_exact:
        out = dataclasses.replace(
            out, normal_loss_weight=keep(cfg.normal_loss_weight,
                                         defaults.normal_loss_weight, 0.0))
    return out


def config_from_flags(argv: list[str] | None = None) -> TrainConfig:
    """CLI parsing — flag-compatible superset of diverseshot-cli
    (``main.cpp:12-70``). Nested fields addressed as e.g.
    ``--optim.pos_lr_init 1e-4``."""
    import argparse

    cfg = TrainConfig()
    p = argparse.ArgumentParser("divshot-tpu train")

    # reference CLI aliases -> our fields
    alias = {
        "source_path": "source_path", "model_path": "model_path",
        "iterations": "num_iters", "num_iters": "num_iters",
        "cap_max": "densify.cap_max",
        "densify_strategy": "densify.strategy",
        "refine_every": "densify.refine_every",
        "warmup_length": "densify.warmup_length",
        "reset_alpha_every": "densify.reset_alpha_every",
        "grow_grad2d": "densify.grow_grad2d",
        "use_abs_grad": "densify.use_abs_grad",
        "revised_opacity": "densify.revised_opacity",
        "min_opacity": "densify.min_opacity",
        "prune_opacity": "densify.prune_opacity",
        "prune_scale3d": "densify.prune_scale3d",
        "prune_scale2d": "densify.prune_scale2d",
        "noiselr": "densify.noise_lr",
        "ssim_weight": "ssim_weight",
        "mip_antialiased": "raster.mip_antialiased",
        "instance_capacity_mult": "raster.instance_capacity_mult",
        "normal_consistency_loss": "normal_consistency_loss",
        "normal_loss_weight": "normal_loss_weight",
        "normal_start_iter": "normal_start_iter",
        "dist_loss_weight": "dist_loss_weight",
        "dist_start_iter": "dist_start_iter",
        "model_type": "model_type",
        "surfel_exact": "surfel_exact",
        "packLevel": "pack_level",
        "pack_level": "pack_level",
        "pixel_grad_scale": "pixel_grad_scale",
        "cull_sh": "cull_sh",
        "progressive_train": "progressive_train",
        "resolution_schedule": "resolution_schedule",
        "use_mask": "use_mask",
        "enable_bg": "enable_bg",
        "export_mesh": "export_mesh",
        "mesh_resolution": "mesh_resolution",
        "max_image_width": "max_image_width",
        "max_image_height": "max_image_height",
        "max_image_count": "max_image_count",
        "eval_holdout": "eval_holdout",
        "eval_every": "eval_every",
        "visible_adam": "optim.visible_adam",
        "checkpoint_every": "checkpoint_every",
        "seed": "seed",
        "debug_nan": "debug_nan",
        "verbose": "verbose",
        "sh_degree": "sh_degree",
        "white_background": "white_background",
        "position_lr_init": "optim.pos_lr_init",
        "position_lr_final": "optim.pos_lr_final",
        "feature_lr": "optim.feature_lr",
        "opacity_lr": "optim.opacity_lr",
        "scaling_lr": "optim.scaling_lr",
        "rotation_lr": "optim.rotation_lr",
    }

    def get_nested(obj: Any, path: str):
        for part in path.split("."):
            obj = getattr(obj, part)
        return obj

    for flag, path in alias.items():
        default = get_nested(cfg, path)
        t = type(default)
        if t is bool:
            p.add_argument(f"--{flag}", type=lambda s: s.lower() in ("1", "true", "yes"),
                           default=None)
        else:
            p.add_argument(f"--{flag}", type=t, default=None)
    p.add_argument("--load_itr", type=int, default=None)
    ns, _unknown = p.parse_known_args(argv)
    # unknown flags are tolerated for reference-CLI compatibility, but
    # silently dropping a misspelled/unmapped knob is a footgun (r5: an
    # unmapped --normal_loss_weight left the default active) — say so
    bad = [u for u in _unknown if u.startswith("--")]
    if bad:
        import sys as _sys
        print(f"[config] WARNING: ignoring unknown flags: {bad}",
              file=_sys.stderr)

    def set_nested(obj, path, value):
        parts = path.split(".")
        if len(parts) == 1:
            return dataclasses.replace(obj, **{parts[0]: value})
        sub = set_nested(getattr(obj, parts[0]), ".".join(parts[1:]), value)
        return dataclasses.replace(obj, **{parts[0]: sub})

    for flag, path in alias.items():
        v = getattr(ns, flag)
        if v is not None:
            cfg = set_nested(cfg, path, v)
    if ns.load_itr is not None:
        cfg = dataclasses.replace(cfg, load_itr=ns.load_itr)
    return cfg
