"""Training loop: one jit-compiled train step serving every iteration.

The TPU rebuild of the reference's ``train_step`` hot loop
(``diverseshot-cli/source/gs_train.cpp:152-167`` — sample camera →
differentiable rasterize → L1+SSIM → backward → Adam → densify/prune →
MCMC noise), expressed as a pure function over a TrainState pytree. All
schedule branches (refine / alpha reset / noise) run under ``lax.cond`` so
the step compiles once; densification edits fixed-capacity buffers in place.
"""

from __future__ import annotations

import functools
import time
import warnings
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from divshot_tpu.core.config import TrainConfig, DensifyStrategy
from divshot_tpu.splat.camera import Camera, batch_cameras
from divshot_tpu.splat.gaussians import GaussianParams
from divshot_tpu.raster.render import render
from divshot_tpu.train.losses import photometric_loss, psnr
from divshot_tpu.train.optim import AdamState, adam_update, PARAM_FIELDS
from divshot_tpu.train import strategy as S


@struct.dataclass
class TrainState:
    params: GaussianParams
    opt: AdamState
    dstate: S.DensifyState
    key: jax.Array
    bg: Any = None   # {"params", "mu", "nu"} envmap state when enable_bg

    @property
    def step(self) -> jax.Array:
        return self.opt.step


@dataclass
class Dataset:
    """In-memory training views. Images stored u8 on device to save HBM."""
    cameras: Camera          # batched pytree, leading dim V
    images: jax.Array        # (V, H, W, 3) uint8
    scene_extent: float
    points: np.ndarray | None = None   # SfM seed cloud
    colors: np.ndarray | None = None
    eval_cameras: Camera | None = None
    eval_images: jax.Array | None = None
    times: np.ndarray | None = None    # (V,) in [0,1] — dynamic datasets
    masks: jax.Array | None = None     # (V, H, W) float/u8 — useMask

    @property
    def num_views(self) -> int:
        return self.images.shape[0]

    @property
    def streamed(self) -> bool:
        """True when images live in host RAM (streamed per step) instead
        of HBM — the large-dataset mode (gsio.loader)."""
        return isinstance(self.images, np.ndarray)

    @classmethod
    def from_views(cls, cams: list[Camera], images: np.ndarray,
                   points=None, colors=None, stream: bool = False,
                   masks=None, **kw) -> "Dataset":
        camb = batch_cameras(cams)
        # one batched host transfer (a per-camera ``np.asarray(c.campos)``
        # loop costs a device round-trip each — minutes behind a busy
        # remote-compile queue)
        vms = np.asarray(jnp.stack([c.viewmat for c in cams]))
        centers = -np.einsum("nij,ni->nj", vms[:, :3, :3], vms[:, :3, 3])
        center = centers.mean(0)
        extent = float(np.linalg.norm(centers - center, axis=1).max()) * 1.1
        if images.dtype != np.uint8:
            images = (np.clip(images, 0, 1) * 255).astype(np.uint8)
        images = np.asarray(images) if stream else jnp.asarray(images)
        if masks is not None:
            masks = np.asarray(masks) if stream else jnp.asarray(masks)
        return cls(cameras=camb, images=images,
                   scene_extent=max(extent, 1e-3), points=points,
                   colors=colors, masks=masks, **kw)


def sh_band_mask(num_coeffs: int, degree: jax.Array) -> jax.Array:
    """(1, K, 1) mask enabling SH bands up to ``degree``."""
    band = jnp.asarray([1, 1, 1, 2, 2, 2, 2, 2, 3, 3, 3, 3, 3, 3, 3],
                       jnp.int32)[:num_coeffs]
    return (band[None, :, None] <= degree).astype(jnp.float32)


def hypers_from_config(cfg: TrainConfig) -> dict[str, jax.Array]:
    """Runtime-adjustable scalars passed as TRACED step inputs, so queued
    ``TrainerSession.update_config`` changes (lrs, loss weights — the
    reference's live-training contract, ``editor.cpp:1610-1618``) apply on
    the very next step without recompiling."""
    f32 = jnp.float32
    return {
        "pos_lr_init": f32(cfg.optim.pos_lr_init),
        "pos_lr_final": f32(cfg.optim.pos_lr_final),
        "scaling_lr": f32(cfg.optim.scaling_lr),
        "rotation_lr": f32(cfg.optim.rotation_lr),
        "opacity_lr": f32(cfg.optim.opacity_lr),
        "feature_lr": f32(cfg.optim.feature_lr),
        "ssim_weight": f32(cfg.ssim_weight),
        "normal_loss_weight": f32(cfg.normal_loss_weight),
        "dist_loss_weight": f32(cfg.dist_loss_weight),
        "noise_lr": f32(cfg.densify.noise_lr),
        "grow_grad2d": f32(cfg.densify.grow_grad2d),
    }


def _structure_key(cfg: TrainConfig) -> TrainConfig:
    """The part of the config baked into the compiled step: everything
    except the live hypers (whose *values* are traced inputs). Loss weights
    that structurally gate extra compute keep only their >0 bit."""
    import dataclasses as _dc
    o = _dc.replace(cfg.optim, pos_lr_init=0.0, pos_lr_final=0.0,
                    scaling_lr=0.0, rotation_lr=0.0, opacity_lr=0.0,
                    feature_lr=0.0)
    d = _dc.replace(cfg.densify, noise_lr=0.0, grow_grad2d=0.0)
    return _dc.replace(
        cfg, optim=o, densify=d,
        ssim_weight=float(cfg.ssim_weight > 0),
        normal_loss_weight=0.0,
        dist_loss_weight=float(cfg.dist_loss_weight > 0))


def make_train_step(cfg: TrainConfig, dataset: Dataset,
                    render_kwargs: dict[str, Any] | None = None,
                    batch_size: int = 1, res_scale: int = 1,
                    streamed: bool = False,
                    grad_psum_axis: str | None = None) -> Callable:
    """Build the (state, view_idx) -> (state, metrics) step function.

    ``view_idx`` is () for batch_size=1 or (B,) for batched steps; the batch
    axis is the data-parallel axis — shard it over a mesh (dist/) and XLA
    inserts the gradient psum over ICI.

    ``res_scale`` > 1 trains at 1/res_scale resolution (gt average-pooled
    on device, camera intrinsics scaled) — the progressive-resolution
    schedule compiles one step per scale (reference resolutionSchedule)."""
    rcfg = cfg.raster
    rk = dict(
        # Pallas kernels are the production path on TPU; the XLA tile
        # rasterizer stays the oracle (and the CPU/test default, where
        # Pallas would run in slow interpret mode)
        backend=(("surfel_pallas" if jax.default_backend() == "tpu"
                  else "surfel") if cfg.model_type == 1
                 else ("pallas" if jax.default_backend() == "tpu"
                       else "tiles")),
        tile_size=rcfg.tile_size,
        antialiased=rcfg.mip_antialiased,
        eps2d=rcfg.eps2d,
        radius_clip=rcfg.radius_clip,
        t_eps=rcfg.transmittance_min,
        max_tiles_per_gaussian=rcfg.max_instances_per_gaussian,
        instance_capacity_mult=rcfg.instance_capacity_mult,
        cull_sh_radius=3.0 if cfg.cull_sh else 0.0,
        # AbsGS |du|/|dv| rows cost ~8 extra VPU ops per (pixel, instance)
        # in the Pallas backward; only ADC-family strategies with
        # useAbsGrad consume them (MCMC densifies by opacity sampling)
        with_absgrad=bool(cfg.densify.use_abs_grad
                          and cfg.densify.strategy != 1),
    )
    if render_kwargs:
        rk.update(render_kwargs)
    extent = dataset.scene_extent
    dcfg = cfg.densify
    bg = jnp.ones((3,), jnp.float32) if cfg.white_background \
        else jnp.zeros((3,), jnp.float32)
    W = dataset.cameras.width // res_scale
    H = dataset.cameras.height // res_scale
    ndc_scale = jnp.asarray([W / 2.0, H / 2.0], jnp.float32)

    def pool(img):
        """(h, w, C) -> average-pooled to (H, W, C)."""
        if res_scale == 1:
            return img
        c = img.shape[-1]
        img = img[: H * res_scale, : W * res_scale]
        return img.reshape(H, res_scale, W, res_scale, c).mean((1, 3))

    def train_step(state: TrainState, view_idx: jax.Array,
                   gt_stream: jax.Array | None = None,
                   mask_stream: jax.Array | None = None,
                   hypers: dict[str, jax.Array] | None = None):
        """``streamed`` mode: gt (and mask) arrive per step from the host
        pipeline (gsio.loader) instead of living in HBM. ``hypers``: traced
        live-config scalars (see hypers_from_config)."""
        hyp = hypers if hypers is not None else hypers_from_config(cfg)
        batched = view_idx.ndim == 1
        cameras = jax.tree.map(lambda x: x[view_idx], dataset.cameras)
        if res_scale != 1:
            s = 1.0 / res_scale
            cameras = cameras.replace(fx=cameras.fx * s, fy=cameras.fy * s,
                                      cx=cameras.cx * s, cy=cameras.cy * s)
        raw = gt_stream if streamed else dataset.images[view_idx]
        gts = raw.astype(jnp.float32) / 255.0
        gts = jax.vmap(pool)(gts) if batched else pool(gts)
        masks = None
        raw_mask = mask_stream if streamed else dataset.masks
        if raw_mask is not None:
            masks = raw_mask if streamed else raw_mask[view_idx]
            masks = masks.astype(jnp.float32)
            if masks.dtype == jnp.float32 and raw_mask.dtype == jnp.uint8:
                masks = masks / 255.0
            if res_scale != 1:
                pm = lambda m: pool(m[..., None])[..., 0]
                masks = jax.vmap(pm)(masks) if batched else pm(masks)

        key, k_refine, k_noise = jax.random.split(state.key, 3)
        step = state.opt.step
        deg = jnp.minimum(step // cfg.sh_degree_interval, cfg.sh_degree)
        shmask = sh_band_mask(state.params.shN.shape[1], deg)
        cap = state.params.capacity

        surfel = (cfg.model_type == 1
                  and rk.get("backend") not in ("tiles", "dense", "pallas"))

        def one_view(fields, bg_p, abs_sink, m2d_sink, npix_sink,
                     camera, gt, mask):
            p = state.params.replace(**fields)
            p = p.replace(shN=p.shN * shmask)
            if cfg.model_type == 1 and not surfel:
                # legacy approximation: flattened 3D gaussians through the
                # shared EWA kernel (exact path: raster/surfel.py)
                from divshot_tpu.train import geometry as G
                p = G.flatten_to_surfels(p)
            camera = camera.replace(width=W, height=H)
            need_geom = (cfg.normal_consistency_loss or cfg.model_type == 1
                         or cfg.dist_loss_weight > 0)
            aux = None
            if need_geom and not surfel:
                # camera-space depth + normals; camera-facing => nz < 0, so
                # nz is recoverable from (nx, ny); z and z^2 feed the depth
                # distortion moments. One extra set of composited planes.
                from divshot_tpu.train import geometry as G
                Rv = camera.viewmat[:3, :3]
                tz = camera.viewmat[2, 3]
                from divshot_tpu.splat.math import dot3
                z = dot3(Rv[2], p.means) + tz
                n_world = G.splat_normals(p, camera)
                from divshot_tpu.splat.math import matvec3
                n_cam = matvec3(Rv, n_world)
                aux = jnp.concatenate(
                    [z[:, None], (z * z)[:, None], n_cam[:, :2]], axis=1)
            single_pass = need_geom and (
                rk.get("backend") == "pallas" or surfel)
            if surfel:
                # exact 2DGS: ray-splat intersection kernel; per-pixel
                # intersection depth feeds the geometry losses. Pallas
                # kernels (pallas_surfel) are the TPU production path; the
                # XLA scan compositor (raster/surfel) is the oracle.
                srk = {k: v for k, v in rk.items()
                       if k in ("tile_size", "tile_capacity",
                                "instance_capacity",
                                "instance_capacity_mult",
                                "max_tiles_per_gaussian", "chunk", "t_eps")}
                if rk.get("backend") == "surfel_pallas":
                    from divshot_tpu.raster.pallas_surfel import \
                        render_surfels_pallas
                    srk.pop("tile_capacity", None)
                    srk.pop("chunk", None)
                    render_fn = functools.partial(
                        render_surfels_pallas, npix_sink=npix_sink,
                        interpret=jax.default_backend() != "tpu")
                else:
                    from divshot_tpu.raster.surfel import render_surfels
                    render_fn = functools.partial(
                        render_surfels, npix_sink=npix_sink)
                out, npix_fwd = render_fn(
                    p, camera,
                    background=jnp.zeros((3,)) if cfg.enable_bg else bg,
                    absgrad_sink=abs_sink, means2d_sink=m2d_sink,
                    with_geometry=need_geom, **srk)
            else:
                out = render(p, camera,
                             background=jnp.zeros((3,))
                             if cfg.enable_bg else bg,
                             absgrad_sink=abs_sink,
                             extra_colors=aux if single_pass else None,
                             means2d_sink=m2d_sink, npix_sink=npix_sink,
                             **rk)
            img = out.image
            if cfg.enable_bg:
                from divshot_tpu.models.background import render_background
                bg_px = render_background(bg_p, camera)
                img = img + (1.0 - out.alpha)[..., None] * bg_px
            if mask is not None:
                img = img * mask[..., None]
                gt = gt * mask[..., None]
            loss = photometric_loss(img, gt, hyp["ssim_weight"],
                                    use_ssim=cfg.ssim_weight > 0)
            if surfel:
                # zero-valued term whose npix_sink cotangent is the forward
                # per-splat applied-pixel count (the sink-gradient contract
                # the pallas backward provides natively)
                loss = loss + jnp.sum(npix_sink * npix_fwd)
            if need_geom:
                from divshot_tpu.train import geometry as G
                if single_pass:
                    planes, alpha_g = out.extra, out.alpha
                else:
                    out2 = render(p, camera, override_colors=aux[:, :3],
                                  **rk)
                    out3 = render(p, camera, override_colors=jnp.stack(
                        [aux[:, 1], aux[:, 3], aux[:, 3]], axis=1), **rk)
                    # out2 composites [z, z2, nx]; out3 [z2, ny, ny]
                    planes = jnp.concatenate(
                        [out2.image[..., 0:1], out3.image[..., 0:1],
                         out2.image[..., 2:3], out3.image[..., 1:2]], -1)
                    alpha_g = out2.alpha
                alpha_s = jnp.maximum(alpha_g, 1e-6)
                depth = planes[..., 0] / alpha_s
                if cfg.normal_consistency_loss or cfg.model_type == 1:
                    nx = planes[..., 2] / alpha_s
                    ny = planes[..., 3] / alpha_s
                    nz = -jnp.sqrt(
                        jnp.clip(1.0 - nx ** 2 - ny ** 2, 1e-6, 1.0))
                    n_render = jnp.stack([nx, ny, nz], -1)
                    nloss = G.normal_consistency_loss(
                        n_render, depth, alpha_g, camera)
                    w = jnp.where(step >= cfg.normal_start_iter,
                                  hyp["normal_loss_weight"], 0.0)
                    loss = loss + w * nloss
                if cfg.dist_loss_weight > 0:
                    # depth distortion (2DGS): sum_ij w_i w_j (z_i - z_j)^2
                    # = 2(sum wz^2 * sum w - (sum wz)^2) per pixel — all
                    # three moments come out of the shared compositing pass
                    dist = (planes[..., 1] * alpha_g - planes[..., 0] ** 2)
                    dloss = jnp.mean(jnp.maximum(dist, 0.0))
                    wd = jnp.where(step >= cfg.dist_start_iter,
                                   hyp["dist_loss_weight"], 0.0)
                    loss = loss + wd * dloss
            ni = out.num_instances if out.num_instances is not None \
                else jnp.int32(0)
            mtc = out.max_tile_count if out.max_tile_count is not None \
                else jnp.int32(0)
            return loss, (out.image, out.proj.radii, ni, mtc)

        bg_p = state.bg["params"] if cfg.enable_bg \
            else jnp.zeros((1, 1, 3), jnp.float32)

        if batched:
            def loss_fn(fields, bg_p, abs_sink, m2d_sink, npix_sink):
                losses, aux = jax.vmap(
                    one_view, in_axes=(None, None, None, None, None, 0, 0,
                                       0 if masks is not None else None))(
                        fields, bg_p, abs_sink, m2d_sink, npix_sink,
                        cameras, gts, masks)
                return jnp.mean(losses), aux
        else:
            def loss_fn(fields, bg_p, abs_sink, m2d_sink, npix_sink):
                return one_view(fields, bg_p, abs_sink, m2d_sink, npix_sink,
                                cameras, gts, masks)

        fields = {f: getattr(state.params, f) for f in PARAM_FIELDS}
        zeros2 = jnp.zeros((cap, 2), jnp.float32)
        zeros1 = jnp.zeros((cap,), jnp.float32)

        if grad_psum_axis is not None:
            # early cross-chip reduction of the SH gradients: identity in
            # the forward, pmean in the backward. The SH grads are final
            # right after the rasterizer color-grad segment reduce — long
            # before the projection backward of means/covariances — so
            # this all-reduce (~60% of gradient bytes at sh_degree 3)
            # overlaps the rest of the backward on real hardware
            # (runs/dist_overlap_note.md; BASELINE north star).
            @jax.custom_vjp
            def _gate(x):
                return x

            def _gate_fwd(x):
                return x, None

            def _gate_bwd(_, g):
                return (jax.lax.pmean(g, grad_psum_axis),)

            _gate.defvjp(_gate_fwd, _gate_bwd)
            inner_loss_fn = loss_fn

            def loss_fn(fields, bg_p, abs_sink, m2d_sink, npix_sink):
                fields = {**fields, "sh0": _gate(fields["sh0"]),
                          "shN": _gate(fields["shN"])}
                return inner_loss_fn(fields, bg_p, abs_sink, m2d_sink,
                                     npix_sink)

        (loss, (img, radii, n_inst, max_tc)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True)(
                fields, bg_p, zeros2, zeros2, zeros1)
        g_fields, g_bg, g_abs, g_m2d, g_npix = grads
        if grad_psum_axis is not None:
            # remaining grads + stats reduce at the end (sh0/shN already
            # reduced by the early gate)
            g_fields = {k: (v if k in ("sh0", "shN")
                            else jax.lax.pmean(v, grad_psum_axis))
                        for k, v in g_fields.items()}
            g_bg = jax.lax.pmean(g_bg, grad_psum_axis)
            g_abs = jax.lax.pmean(g_abs, grad_psum_axis)
            g_m2d = jax.lax.pmean(g_m2d, grad_psum_axis)
            g_npix = jax.lax.pmean(g_npix, grad_psum_axis)
            loss = jax.lax.pmean(loss, grad_psum_axis)
            radii = jax.lax.pmax(radii, grad_psum_axis)
            n_inst = jax.lax.pmax(n_inst, grad_psum_axis)
            max_tc = jax.lax.pmax(max_tc, grad_psum_axis)
        if batched:
            img = img[0]
            radii = jnp.max(radii, axis=0)  # visible in any view of the batch
            n_inst = jnp.max(n_inst)
            max_tc = jnp.max(max_tc)
            gts = gts[0]
        gt = gts

        obs = S.DensifyObs(
            grad2d=jnp.linalg.norm(g_m2d * ndc_scale, axis=-1),
            absgrad2d=jnp.linalg.norm(g_abs * ndc_scale, axis=-1),
            radii=radii, npix=g_npix, width=W, height=H)
        dstate = S.update_stats(state.dstate, obs, dcfg.use_abs_grad,
                                cfg.pixel_grad_scale)

        visible = radii > 0
        params, opt = adam_update(cfg.optim, state.params, g_fields,
                                  state.opt, extent, visible, hypers=hyp)
        params = params.replace(
            opacity=jnp.where(params.alive, params.opacity, -15.0))

        # periodic hard prune (pruneStrategy reduce|light at pruneInterval —
        # editor.cpp:2008-2016); default interval 700K => off for std runs.
        # Runs BEFORE refine so LIGHT scores see the accumulated visibility
        # counts (refine resets dstate).
        if dcfg.prune_interval > 0:
            do_prune = (step > 0) & (step % dcfg.prune_interval == 0)
            params, opt = jax.lax.cond(
                do_prune,
                lambda a: S.periodic_prune(dcfg, a[0], a[1], dstate, extent),
                lambda a: a,
                (params, opt))

        in_window = (step >= dcfg.warmup_length) & (step < dcfg.refine_stop_iter)
        do_refine = in_window & (step % dcfg.refine_every == 0) & (step > 0)

        params, opt, dstate = jax.lax.cond(
            do_refine,
            lambda a: S.refine(dcfg, a[0], a[1], a[2], k_refine, step, extent,
                               hypers=hyp),
            lambda a: a,
            (params, opt, dstate))

        if dcfg.strategy != DensifyStrategy.MCMC:
            do_reset = in_window & (step % dcfg.reset_alpha_every == 0) & (step > 0)
            params, opt = jax.lax.cond(
                do_reset,
                lambda a: S.alpha_reset(dcfg, a[0], a[1]),
                lambda a: a,
                (params, opt))
        else:
            params = S.mcmc_noise(dcfg, cfg.optim, params, k_noise, step,
                                  extent, hypers=hyp)

        new_bg = state.bg
        if cfg.enable_bg:
            b1b, b2b, lr_bg = 0.9, 0.999, 0.01
            mu = state.bg["mu"] * b1b + (1 - b1b) * g_bg
            nu = state.bg["nu"] * b2b + (1 - b2b) * g_bg * g_bg
            new_bg = {"params": state.bg["params"]
                      - lr_bg * mu / (jnp.sqrt(nu) + 1e-8),
                      "mu": mu, "nu": nu}

        psnr_val = psnr(img, gt)
        if grad_psum_axis is not None:
            psnr_val = jax.lax.pmean(psnr_val, grad_psum_axis)
        metrics = {
            "loss": loss,
            "psnr": psnr_val,
            "num_alive": jnp.sum(params.alive.astype(jnp.int32)),
            # capacity diagnostics: demanded (tile|depth) instances vs the
            # static buffers — overflow means binning silently dropped work
            "num_instances": n_inst,
            "max_tile_count": max_tc,
        }
        return TrainState(params=params, opt=opt, dstate=dstate, key=key,
                          bg=new_bg), metrics

    return train_step


def _device_memory_bytes() -> int:
    """Best-effort per-device memory (v5e HBM default when unqueryable)."""
    try:
        stats = jax.devices()[0].memory_stats() or {}
        return int(stats.get("bytes_limit", 16 * 1024 ** 3))
    except Exception:
        return 16 * 1024 ** 3


class Trainer:
    """Host-side loop driving the jitted step; mirrors the reference CLI
    semantics (progress logging, periodic checkpoints —
    ``gs_train.cpp:129-169``)."""

    def __init__(self, cfg: TrainConfig, dataset: Dataset,
                 params: GaussianParams,
                 render_kwargs: dict[str, Any] | None = None):
        self.cfg = cfg
        self.dataset = dataset
        # packLevel: auto-raise with the reference's VRAM guard
        # (splats × 236 B × 10 > 50% of device memory, editor.cpp:1577-1582)
        pack = cfg.pack_level
        if params.capacity * 236 * 10 > 0.5 * _device_memory_bytes():
            pack |= 3
        self.pack_level = pack
        if pack & 1 and params.shN.dtype != jnp.bfloat16:
            # bit 1: SH bands (the bulk of the payload: 45 of 59 floats l3)
            # + their Adam moments live in bf16 (moments inherit the dtype
            # via AdamState.init's zeros_like)
            params = params.replace(shN=params.shN.astype(jnp.bfloat16))
        bg_state = None
        if cfg.enable_bg:
            from divshot_tpu.models.background import init_envmap
            env = init_envmap(
                init_color=(1, 1, 1) if cfg.white_background else (0, 0, 0))
            bg_state = {"params": env, "mu": jnp.zeros_like(env),
                        "nu": jnp.zeros_like(env)}
        self.state = TrainState(
            params=params,
            opt=AdamState.init(params),
            dstate=S.DensifyState.init(params.capacity),
            key=jax.random.PRNGKey(cfg.seed),
            bg=bg_state,
        )
        self._streamed = dataset.streamed
        self._render_kwargs = render_kwargs
        self._hypers = hypers_from_config(cfg)
        self._build_steps()
        self._loader = None
        if self._streamed:
            from divshot_tpu.gsio.loader import HostImageStore, Prefetcher
            self._store = HostImageStore(images=dataset.images)
            self._prefetch = Prefetcher(
                self._store, depth=2,
                masks=np.asarray(dataset.masks)
                if dataset.masks is not None else None)
            self._pending: list[int] = []
        self._np_rng = np.random.default_rng(cfg.seed)
        self.metrics_history: list[dict] = []
        self.last_metrics: dict | None = None
        self._host_step = 0   # host-side mirror of opt.step (avoids syncs)

    def _build_steps(self) -> None:
        """(Re)compile the jitted step functions from the current config."""
        rk = self._render_kwargs or {}
        rcfg = self.cfg.raster
        cap = self.state.params.capacity
        mult = rk.get("instance_capacity_mult", rcfg.instance_capacity_mult)
        self._instance_capacity = rk.get("instance_capacity") \
            or max(1 << 16, int(mult * cap))
        backend = rk.get("backend",
                         "pallas" if jax.default_backend() == "tpu"
                         else "tiles")
        # per-tile truncation only exists in the ids_mat (tiles) path
        self._tile_capacity = rk.get("tile_capacity", 1024) \
            if backend == "tiles" else None
        self._warned_instance_overflow = False
        self._warned_tile_overflow = False
        self._step_full = jax.jit(
            make_train_step(self.cfg, self.dataset, self._render_kwargs,
                            streamed=self._streamed), donate_argnums=(0,))
        # progressive resolution (resolutionSchedule): one compiled step per
        # scale, switched on the host by iteration — x4 then x2 then full
        self._step_scaled: dict[int, Any] = {}
        if self.cfg.progressive_train and self.cfg.resolution_schedule > 0:
            for s in (4, 2):
                self._step_scaled[s] = jax.jit(
                    make_train_step(self.cfg, self.dataset,
                                    self._render_kwargs, res_scale=s,
                                    streamed=self._streamed),
                    donate_argnums=(0,))

    def apply_config(self, new_cfg: TrainConfig) -> None:
        """Apply a (possibly live-updated) config. Hyper-only changes (lrs,
        loss weights) reach the compiled step on the next call as traced
        inputs; structural changes rebuild the step functions."""
        rebuild = _structure_key(new_cfg) != _structure_key(self.cfg)
        self.cfg = new_cfg
        self._hypers = hypers_from_config(new_cfg)
        if rebuild:
            self._build_steps()

    def _step_fn(self, state, view, *stream_args):
        it = self._host_step
        self._host_step += 1
        if self._step_scaled:
            sched = self.cfg.resolution_schedule
            if it < sched:
                return self._step_scaled[4](state, view, *stream_args,
                                            hypers=self._hypers)
            if it < 2 * sched:
                return self._step_scaled[2](state, view, *stream_args,
                                            hypers=self._hypers)
        return self._step_full(state, view, *stream_args,
                               hypers=self._hypers)

    def step_once(self) -> dict:
        """Run one training step on random view(s) (TrainerSession hook);
        samples ``cfg.batch_size`` views per step when > 1."""
        bsz = max(1, self.cfg.batch_size)
        if self._streamed:
            if bsz > 1:
                raise NotImplementedError(
                    "batch_size > 1 requires in-HBM images (stream=False)")
            # keep 2 host->device transfers in flight ahead of compute
            while len(self._pending) < 2:
                v = int(self._np_rng.integers(self.dataset.num_views))
                self._prefetch.schedule(v)
                self._pending.append(v)
            view, gt_dev, mask_dev = self._prefetch.get()
            self._pending.pop(0)
            self.state, metrics = self._step_fn(
                self.state, view, gt_dev, mask_dev)
        else:
            if bsz > 1:
                view = jnp.asarray(self._np_rng.integers(
                    self.dataset.num_views, size=bsz), jnp.int32)
            else:
                view = int(self._np_rng.integers(self.dataset.num_views))
            self.state, metrics = self._step_fn(self.state, view, None, None)
        self.last_metrics = metrics
        return metrics

    def run(self, num_iters: int | None = None,
            log_every: int = 500,
            callback: Callable | None = None) -> None:
        n = num_iters if num_iters is not None else self.cfg.num_iters
        t0 = time.time()
        for i in range(n):
            metrics = self.step_once()
            if log_every and (i + 1) % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                m["iters_per_s"] = (i + 1) / (time.time() - t0)
                self.metrics_history.append(m)
                self.check_overflow(m)
                if self.cfg.verbose:
                    print(f"[{i+1}/{n}] loss={m['loss']:.4f} "
                          f"psnr={m['psnr']:.2f} alive={int(m['num_alive'])} "
                          f"({m['iters_per_s']:.1f} it/s)")
            if callback is not None:
                callback(i, self.state, metrics)

    def check_overflow(self, metrics: dict) -> None:
        """Surface silent capacity overflow and, when
        ``raster.auto_instance_capacity`` is on (default), grow the
        instance buffer from MEASURED demand and recompile — the analog of
        the reference's VRAM-pressure auto-raise (``editor.cpp:1577-1582``).
        Stock configs then train correctly at reference scale without a
        hand-tuned instance_capacity_mult."""
        ni = int(metrics.get("num_instances", 0))
        icap = self._instance_capacity
        auto = self.cfg.raster.auto_instance_capacity
        if auto and ni > 0.9 * icap:
            new_cap = 1 << max(int(np.ceil(np.log2(max(ni, 1) * 1.3))),
                               int(np.log2(icap)) + 1)
            print(f"[capacity] tile-instance demand {ni} near/over "
                  f"instance_capacity {icap}: growing to {new_cap}, "
                  f"recompiling the train step", flush=True)
            self._render_kwargs = dict(self._render_kwargs or {})
            self._render_kwargs["instance_capacity"] = new_cap
            self._build_steps()
            return
        # the Pallas path clamps tile ranges at icap - guard_lanes (the
        # mega-DMA guard band, tiles.bin_gaussians) — warn from that
        # threshold, not only at ni > icap (ADVICE r4)
        if ni > icap - 2048 and not self._warned_instance_overflow:
            self._warned_instance_overflow = True
            warnings.warn(
                f"tile-instance demand {ni} reaches the instance_capacity "
                f"{icap} guard band; excess instances are DROPPED "
                f"(image corruption). Raise raster.instance_capacity_mult.",
                RuntimeWarning, stacklevel=2)
        mtc = int(metrics.get("max_tile_count", 0))
        if self._tile_capacity is not None and mtc > self._tile_capacity \
                and not self._warned_tile_overflow:
            self._warned_tile_overflow = True
            warnings.warn(
                f"densest tile holds {mtc} instances > tile_capacity "
                f"{self._tile_capacity}; the tile's farthest splats are "
                f"DROPPED. Raise tile_capacity.",
                RuntimeWarning, stacklevel=2)
