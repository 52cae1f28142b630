"""Training loop: one jit-compiled train step serving every iteration.

The TPU rebuild of the reference's ``train_step`` hot loop
(``diverseshot-cli/source/gs_train.cpp:152-167`` — sample camera →
differentiable rasterize → L1+SSIM → backward → Adam → densify/prune →
MCMC noise), expressed as a pure function over a TrainState pytree. All
schedule branches (refine / alpha reset / noise) run under ``lax.cond`` so
the step compiles once; densification edits fixed-capacity buffers in place.
"""

from __future__ import annotations

import time
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
                   **kw) -> "Dataset":
        camb = batch_cameras(cams)
        centers = np.stack([np.asarray(c.campos) for c in cams])
        center = centers.mean(0)
        extent = float(np.linalg.norm(centers - center, axis=1).max()) * 1.1
        if images.dtype != np.uint8:
            images = (np.clip(images, 0, 1) * 255).astype(np.uint8)
        images = np.asarray(images) if stream else jnp.asarray(images)
        return cls(cameras=camb, images=images,
                   scene_extent=max(extent, 1e-3), points=points,
                   colors=colors, **kw)


def sh_band_mask(num_coeffs: int, degree: jax.Array) -> jax.Array:
    """(1, K, 1) mask enabling SH bands up to ``degree``."""
    band = jnp.asarray([1, 1, 1, 2, 2, 2, 2, 2, 3, 3, 3, 3, 3, 3, 3],
                       jnp.int32)[:num_coeffs]
    return (band[None, :, None] <= degree).astype(jnp.float32)


def make_train_step(cfg: TrainConfig, dataset: Dataset,
                    render_kwargs: dict[str, Any] | None = None,
                    batch_size: int = 1, res_scale: int = 1,
                    streamed: bool = False) -> Callable:
    """Build the (state, view_idx) -> (state, metrics) step function.

    ``view_idx`` is () for batch_size=1 or (B,) for batched steps; the batch
    axis is the data-parallel axis — shard it over a mesh (dist/) and XLA
    inserts the gradient psum over ICI.

    ``res_scale`` > 1 trains at 1/res_scale resolution (gt average-pooled
    on device, camera intrinsics scaled) — the progressive-resolution
    schedule compiles one step per scale (reference resolutionSchedule)."""
    rk = dict(
        backend="tiles",
        tile_size=cfg.raster.tile_size,
        antialiased=cfg.raster.mip_antialiased,
        eps2d=cfg.raster.eps2d,
        cull_sh_radius=3.0 if cfg.cull_sh else 0.0,
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
                   mask_stream: jax.Array | None = None):
        """``streamed`` mode: gt (and mask) arrive per step from the host
        pipeline (gsio.loader) instead of living in HBM."""
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

        def one_view(fields, bg_p, abs_sink, m2d_sink, npix_sink,
                     camera, gt, mask):
            p = state.params.replace(**fields)
            p = p.replace(shN=p.shN * shmask)
            if cfg.model_type == 1:   # 2DGS: surfel splats
                from divshot_tpu.train import geometry as G
                p = G.flatten_to_surfels(p)
            camera = camera.replace(width=W, height=H)
            need_geom = (cfg.normal_consistency_loss or cfg.model_type == 1
                         or cfg.dist_loss_weight > 0)
            aux = None
            if need_geom:
                # camera-space depth + normals; camera-facing => nz < 0, so
                # nz is recoverable from (nx, ny); z and z^2 feed the depth
                # distortion moments. One extra set of composited planes.
                from divshot_tpu.train import geometry as G
                Rv = camera.viewmat[:3, :3]
                tz = camera.viewmat[2, 3]
                z = jnp.einsum("nj,j->n", p.means, Rv[2],
                               precision="highest") + tz
                n_world = G.splat_normals(p, camera)
                n_cam = jnp.einsum("nj,ij->ni", n_world, Rv,
                                   precision="highest")
                aux = jnp.concatenate(
                    [z[:, None], (z * z)[:, None], n_cam[:, :2]], axis=1)
            single_pass = need_geom and rk.get("backend") == "pallas"
            out = render(p, camera,
                         background=jnp.zeros((3,)) if cfg.enable_bg else bg,
                         absgrad_sink=abs_sink,
                         extra_colors=aux if single_pass else None,
                         means2d_sink=m2d_sink, npix_sink=npix_sink, **rk)
            img = out.image
            if cfg.enable_bg:
                from divshot_tpu.models.background import render_background
                bg_px = render_background(bg_p, camera)
                img = img + (1.0 - out.alpha)[..., None] * bg_px
            if mask is not None:
                img = img * mask[..., None]
                gt = gt * mask[..., None]
            loss = photometric_loss(img, gt, cfg.ssim_weight)
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
                                  cfg.normal_loss_weight, 0.0)
                    loss = loss + w * nloss
                if cfg.dist_loss_weight > 0:
                    # depth distortion (2DGS): sum_ij w_i w_j (z_i - z_j)^2
                    # = 2(sum wz^2 * sum w - (sum wz)^2) per pixel — all
                    # three moments come out of the shared compositing pass
                    dist = (planes[..., 1] * alpha_g - planes[..., 0] ** 2)
                    dloss = jnp.mean(jnp.maximum(dist, 0.0))
                    wd = jnp.where(step >= cfg.dist_start_iter,
                                   cfg.dist_loss_weight, 0.0)
                    loss = loss + wd * dloss
            return loss, (out.image, out.proj.radii)

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
        (loss, (img, radii)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3, 4), has_aux=True)(
                fields, bg_p, zeros2, zeros2, zeros1)
        g_fields, g_bg, g_abs, g_m2d, g_npix = grads
        if batched:
            img = img[0]
            radii = jnp.max(radii, axis=0)  # visible in any view of the batch
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
                                  state.opt, extent, visible)
        params = params.replace(
            opacity=jnp.where(params.alive, params.opacity, -15.0))

        in_window = (step >= dcfg.warmup_length) & (step < dcfg.refine_stop_iter)
        do_refine = in_window & (step % dcfg.refine_every == 0) & (step > 0)

        params, opt, dstate = jax.lax.cond(
            do_refine,
            lambda a: S.refine(dcfg, a[0], a[1], a[2], k_refine, step, extent),
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
            params = S.mcmc_noise(dcfg, cfg.optim, params, k_noise, step, extent)

        new_bg = state.bg
        if cfg.enable_bg:
            b1b, b2b, lr_bg = 0.9, 0.999, 0.01
            mu = state.bg["mu"] * b1b + (1 - b1b) * g_bg
            nu = state.bg["nu"] * b2b + (1 - b2b) * g_bg * g_bg
            new_bg = {"params": state.bg["params"]
                      - lr_bg * mu / (jnp.sqrt(nu) + 1e-8),
                      "mu": mu, "nu": nu}

        metrics = {
            "loss": loss,
            "psnr": psnr(img, gt),
            "num_alive": jnp.sum(params.alive.astype(jnp.int32)),
        }
        return TrainState(params=params, opt=opt, dstate=dstate, key=key,
                          bg=new_bg), metrics

    return train_step


class Trainer:
    """Host-side loop driving the jitted step; mirrors the reference CLI
    semantics (progress logging, periodic checkpoints —
    ``gs_train.cpp:129-169``)."""

    def __init__(self, cfg: TrainConfig, dataset: Dataset,
                 params: GaussianParams,
                 render_kwargs: dict[str, Any] | None = None):
        self.cfg = cfg
        self.dataset = dataset
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
        self._step_full = jax.jit(
            make_train_step(cfg, dataset, render_kwargs,
                            streamed=self._streamed), donate_argnums=(0,))
        # progressive resolution (resolutionSchedule): one compiled step per
        # scale, switched on the host by iteration — x4 then x2 then full
        self._step_scaled: dict[int, Any] = {}
        if cfg.progressive_train and cfg.resolution_schedule > 0:
            for s in (4, 2):
                self._step_scaled[s] = jax.jit(
                    make_train_step(cfg, dataset, render_kwargs, res_scale=s,
                                    streamed=self._streamed),
                    donate_argnums=(0,))
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

    def _step_fn(self, state, view, *stream_args):
        it = self._host_step
        self._host_step += 1
        if self._step_scaled:
            sched = self.cfg.resolution_schedule
            if it < sched:
                return self._step_scaled[4](state, view, *stream_args)
            if it < 2 * sched:
                return self._step_scaled[2](state, view, *stream_args)
        return self._step_full(state, view, *stream_args)

    def step_once(self) -> dict:
        """Run one training step on a random view (TrainerSession hook)."""
        if self._streamed:
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
            view = int(self._np_rng.integers(self.dataset.num_views))
            self.state, metrics = self._step_fn(self.state, view)
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
                if self.cfg.verbose:
                    print(f"[{i+1}/{n}] loss={m['loss']:.4f} "
                          f"psnr={m['psnr']:.2f} alive={int(m['num_alive'])} "
                          f"({m['iters_per_s']:.1f} it/s)")
            if callback is not None:
                callback(i, self.state, metrics)
