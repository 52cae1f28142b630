"""Dynamic gaussian variants: deformable-3DGS (D-NeRF-style deformation
MLP) and 4D gaussians (HexPlane spatio-temporal field) in front of the
shared rasterizer (BASELINE.json configs #4-5; credited sources in the
reference README: deformable/4D/spacetime gaussians).

A deformation network maps (canonical mean, time) -> deltas on mean /
rotation / scale. Canonical splats stay a capacity-padded GaussianParams;
the network is a small flax module whose params train jointly (optax Adam)
with the per-splat parameters (our custom Adam).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax
from flax import struct

from divshot_tpu.splat.gaussians import GaussianParams


def posenc(x: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """NeRF positional encoding, (..., D) -> (..., D·2·n_freqs)."""
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=jnp.float32)
    ang = x[..., None] * freqs                     # (..., D, F)
    enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return enc.reshape(*x.shape[:-1], -1)


class DeformationMLP(nn.Module):
    """D-NeRF-style deformation field d(x, t) -> (dxyz, drot, dscale)."""
    width: int = 128
    depth: int = 6
    x_freqs: int = 10
    t_freqs: int = 6
    skip_at: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray):
        """x (N, 3) canonical means; t scalar or (N,). Returns dict of
        deltas."""
        if t.ndim == 0:
            t = jnp.broadcast_to(t, (x.shape[0],))
        h_in = jnp.concatenate(
            [posenc(x, self.x_freqs), posenc(t[:, None], self.t_freqs)],
            axis=-1)
        h = h_in
        for i in range(self.depth):
            h = nn.Dense(self.width, name=f"dense_{i}")(h)
            h = nn.relu(h)
            if i == self.skip_at:
                h = jnp.concatenate([h, h_in], axis=-1)
        dx = nn.Dense(3, name="head_xyz",
                      kernel_init=nn.initializers.zeros)(h)
        dr = nn.Dense(4, name="head_rot",
                      kernel_init=nn.initializers.zeros)(h)
        ds = nn.Dense(3, name="head_scale",
                      kernel_init=nn.initializers.zeros)(h)
        return {"dxyz": dx, "drot": dr, "dscale": ds}


class HexPlaneField(nn.Module):
    """4DGS-style HexPlane: six feature planes over the (x,y,z,t) pairs;
    spatial and spatio-temporal features multiplied, decoded by a small
    MLP into deformation deltas."""
    resolution: int = 64
    time_resolution: int = 32
    features: int = 16
    width: int = 64
    depth: int = 2
    bounds: float = 1.6     # normalizing half-extent of the scene

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray):
        if t.ndim == 0:
            t = jnp.broadcast_to(t, (x.shape[0],))
        xn = jnp.clip(x / self.bounds, -1, 1) * 0.5 + 0.5      # [0,1]
        tn = jnp.clip(t, 0.0, 1.0)
        coords = {
            "xy": (xn[:, 0], xn[:, 1], self.resolution, self.resolution),
            "xz": (xn[:, 0], xn[:, 2], self.resolution, self.resolution),
            "yz": (xn[:, 1], xn[:, 2], self.resolution, self.resolution),
            "xt": (xn[:, 0], tn, self.resolution, self.time_resolution),
            "yt": (xn[:, 1], tn, self.resolution, self.time_resolution),
            "zt": (xn[:, 2], tn, self.resolution, self.time_resolution),
        }

        def sample(name, u, v, ru, rv):
            plane = self.param(
                f"plane_{name}",
                nn.initializers.uniform(0.1) if "t" in name
                else nn.initializers.ones_init(),
                (ru, rv, self.features))
            fu = u * (ru - 1)
            fv = v * (rv - 1)
            u0 = jnp.clip(jnp.floor(fu).astype(jnp.int32), 0, ru - 2)
            v0 = jnp.clip(jnp.floor(fv).astype(jnp.int32), 0, rv - 2)
            au = (fu - u0)[:, None]
            av = (fv - v0)[:, None]
            p00 = plane[u0, v0]
            p01 = plane[u0, v0 + 1]
            p10 = plane[u0 + 1, v0]
            p11 = plane[u0 + 1, v0 + 1]
            return ((1 - au) * (1 - av) * p00 + (1 - au) * av * p01
                    + au * (1 - av) * p10 + au * av * p11)

        feats = None
        for name, (u, v, ru, rv) in coords.items():
            f = sample(name, u, v, ru, rv)
            feats = f if feats is None else feats * f

        h = feats
        for i in range(self.depth):
            h = nn.Dense(self.width, name=f"dense_{i}")(h)
            h = nn.relu(h)
        dx = nn.Dense(3, name="head_xyz",
                      kernel_init=nn.initializers.zeros)(h)
        dr = nn.Dense(4, name="head_rot",
                      kernel_init=nn.initializers.zeros)(h)
        ds = nn.Dense(3, name="head_scale",
                      kernel_init=nn.initializers.zeros)(h)
        return {"dxyz": dx, "drot": dr, "dscale": ds}


def apply_deformation(params: GaussianParams,
                      deltas: dict[str, jnp.ndarray]) -> GaussianParams:
    """Canonical -> deformed splats at one timestep."""
    return params.replace(
        means=params.means + deltas["dxyz"],
        quats=params.quats + deltas["drot"],
        scales=params.scales + deltas["dscale"],
    )


# ---------------------------------------------------------------------------
# dynamic training


@struct.dataclass
class DynTrainState:
    params: GaussianParams
    opt: Any            # AdamState for splats
    dstate: Any         # DensifyState
    net_params: Any     # flax params
    net_opt: Any        # optax state
    key: jax.Array


def make_dynamic_train_step(cfg, dataset, net: nn.Module,
                            render_kwargs: dict | None = None,
                            net_lr: float = 8e-4) -> tuple[Callable, Callable]:
    """-> (init_fn(params, key) -> DynTrainState,
           step_fn(state, view_idx) -> (state, metrics)).

    ``dataset.times`` (V,) in [0, 1] supplies per-view timestamps (D-NeRF
    layout)."""
    from divshot_tpu.raster.render import render
    from divshot_tpu.train.losses import photometric_loss, psnr
    from divshot_tpu.train.optim import AdamState, adam_update, PARAM_FIELDS
    from divshot_tpu.train import strategy as S
    from divshot_tpu.train.trainer import sh_band_mask

    # production kernels on TPU, XLA tile rasterizer elsewhere — same
    # platform dispatch as the static trainer (trainer.py make_train_step)
    rk = dict(backend="pallas" if jax.default_backend() == "tpu"
              else "tiles",
              with_absgrad=bool(cfg.densify.use_abs_grad
                                and cfg.densify.strategy != 1))
    if render_kwargs:
        rk.update(render_kwargs)
    extent = dataset.scene_extent
    dcfg = cfg.densify
    bg = jnp.ones((3,), jnp.float32) if cfg.white_background \
        else jnp.zeros((3,), jnp.float32)
    W, H = dataset.cameras.width, dataset.cameras.height
    ndc_scale = jnp.asarray([W / 2.0, H / 2.0], jnp.float32)
    times = jnp.asarray(dataset.times, jnp.float32)
    tx = optax.adam(net_lr)

    def init_fn(params: GaussianParams, key: jax.Array) -> DynTrainState:
        k1, k2 = jax.random.split(key)
        net_params = net.init(k1, params.means[:8], jnp.zeros((8,)))
        return DynTrainState(
            params=params, opt=AdamState.init(params),
            dstate=S.DensifyState.init(params.capacity),
            net_params=net_params, net_opt=tx.init(net_params), key=k2)

    def step_fn(state: DynTrainState, view_idx: jax.Array):
        camera = jax.tree.map(lambda x: x[view_idx], dataset.cameras)
        camera = camera.replace(width=W, height=H)
        gt = dataset.images[view_idx].astype(jnp.float32) / 255.0
        t = times[view_idx]

        key, k_refine, k_noise = jax.random.split(state.key, 3)
        step = state.opt.step
        deg = jnp.minimum(step // cfg.sh_degree_interval, cfg.sh_degree)
        shmask = sh_band_mask(state.params.shN.shape[1], deg)
        cap = state.params.capacity

        def loss_fn(fields, net_params, abs_sink, m2d_sink):
            p = state.params.replace(**fields)
            p = p.replace(shN=p.shN * shmask)
            # warmup: static canonical splats for the first iterations
            deltas = net.apply(net_params, p.means, t)
            zero_warm = (step >= cfg.densify.warmup_length).astype(jnp.float32)
            deltas = {k: v * zero_warm for k, v in deltas.items()}
            p = apply_deformation(p, deltas)
            out = render(p, camera, background=bg, absgrad_sink=abs_sink,
                         means2d_sink=m2d_sink, **rk)
            loss = photometric_loss(out.image, gt, cfg.ssim_weight)
            return loss, (out.image, out.proj.radii)

        fields = {f: getattr(state.params, f) for f in PARAM_FIELDS}
        zeros2 = jnp.zeros((cap, 2), jnp.float32)
        (loss, (img, radii)), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3), has_aux=True)(
                fields, state.net_params, zeros2, zeros2)
        g_fields, g_net, g_abs, g_m2d = grads

        obs = S.DensifyObs(
            grad2d=jnp.linalg.norm(g_m2d * ndc_scale, axis=-1),
            absgrad2d=jnp.linalg.norm(g_abs * ndc_scale, axis=-1),
            radii=radii, width=W, height=H)
        dstate = S.update_stats(state.dstate, obs, dcfg.use_abs_grad)

        visible = radii > 0
        params, opt = adam_update(cfg.optim, state.params, g_fields,
                                  state.opt, extent, visible)
        params = params.replace(
            opacity=jnp.where(params.alive, params.opacity, -15.0))

        upd, net_opt = tx.update(g_net, state.net_opt, state.net_params)
        net_params = optax.apply_updates(state.net_params, upd)

        in_window = (step >= dcfg.warmup_length) & (step < dcfg.refine_stop_iter)
        do_refine = in_window & (step % dcfg.refine_every == 0) & (step > 0)
        params, opt, dstate = jax.lax.cond(
            do_refine,
            lambda a: S.refine(dcfg, a[0], a[1], a[2], k_refine, step, extent),
            lambda a: a, (params, opt, dstate))

        # strategy branches mirror the static trainer: MCMC explores with
        # covariance-shaped noise each step; ADC periodically resets alpha
        from divshot_tpu.core.config import DensifyStrategy as _DS
        if dcfg.strategy == _DS.MCMC:
            params = S.mcmc_noise(dcfg, cfg.optim, params, k_noise, step,
                                  extent)
        else:
            do_reset = (in_window & (step % dcfg.reset_alpha_every == 0)
                        & (step > 0))
            params, opt = jax.lax.cond(
                do_reset,
                lambda a: S.alpha_reset(dcfg, a[0], a[1]),
                lambda a: a, (params, opt))

        metrics = {"loss": loss, "psnr": psnr(img, gt),
                   "num_alive": jnp.sum(params.alive.astype(jnp.int32))}
        return DynTrainState(params=params, opt=opt, dstate=dstate,
                             net_params=net_params, net_opt=net_opt,
                             key=key), metrics

    return init_fn, step_fn


# ---------------------------------------------------------------------------
# first-class host loop (CLI / checkpoint surface, BASELINE configs #4-5)


def net_for_model_type(model_type: int) -> nn.Module:
    from divshot_tpu.core.config import ModelType
    if model_type == ModelType.HEXPLANE:
        return HexPlaneField()
    return DeformationMLP()


class DynamicTrainer:
    """Host-side loop for the dynamic variants — the ``Trainer`` analog the
    CLI drives when ``model_type`` is DEFORM/HEXPLANE. Same surface:
    ``state``, ``step_once()``, ``run()``; checkpoints are the full
    DynTrainState pytree (orbax, like the static path)."""

    def __init__(self, cfg, dataset, params: GaussianParams,
                 render_kwargs: dict | None = None):
        if dataset.times is None:
            raise ValueError(
                "dynamic training needs per-view times (D-NeRF layout: "
                "'time' in transforms frames)")
        self.cfg = cfg
        self.dataset = dataset
        self.net = net_for_model_type(cfg.model_type)
        rk = render_kwargs or {}
        if "instance_capacity" not in rk:
            rk["instance_capacity"] = max(
                1 << 16,
                int(cfg.raster.instance_capacity_mult * params.capacity))
        self._instance_capacity = rk["instance_capacity"]
        init_fn, step_fn = make_dynamic_train_step(
            cfg, dataset, self.net, render_kwargs=rk)
        self.state = init_fn(params, jax.random.PRNGKey(cfg.seed))
        self._step_fn = jax.jit(step_fn, donate_argnums=(0,))
        self._np_rng = np.random.default_rng(cfg.seed)
        self.last_metrics: dict | None = None
        self._host_step = 0

    def step_once(self) -> dict:
        view = jnp.int32(self._np_rng.integers(self.dataset.num_views))
        self.state, m = self._step_fn(self.state, view)
        self._host_step += 1
        self.last_metrics = m
        return m

    def run(self, num_iters: int | None = None, callback=None) -> None:
        n = num_iters if num_iters is not None else self.cfg.num_iters
        for i in range(n):
            m = self.step_once()
            if callback is not None:
                callback(i, self.state, m)

    def deformed_params(self, t: float) -> GaussianParams:
        """Canonical splats deformed to time ``t`` (viewer/export path)."""
        deltas = self.net.apply(self.state.net_params,
                                self.state.params.means, jnp.float32(t))
        return apply_deformation(self.state.params, deltas)


def evaluate_dynamic(state: DynTrainState, net: nn.Module, eval_ds, *,
                     render_kwargs: dict | None = None,
                     background=None) -> dict:
    """Test-split PSNR/SSIM for dynamic scenes: each view renders the
    canonical splats deformed to that view's timestamp."""
    from divshot_tpu.raster.render import render
    from divshot_tpu.train.losses import psnr, ssim

    rk = dict(render_kwargs or {})
    times = np.asarray(eval_ds.times)

    @jax.jit
    def _metrics(params, net_params, cam, t, gt):
        deltas = net.apply(net_params, params.means, t)
        p = apply_deformation(params, deltas)
        out = render(p, cam, background=background, **rk)
        return psnr(out.image, gt), ssim(out.image, gt)

    psnrs, ssims = [], []
    for i in range(eval_ds.num_views):
        cam = jax.tree.map(lambda x: x[i], eval_ds.cameras)
        cam = cam.replace(width=eval_ds.cameras.width,
                          height=eval_ds.cameras.height)
        gt = jnp.asarray(eval_ds.images[i]).astype(jnp.float32) / 255.0
        p, s = _metrics(state.params, state.net_params, cam,
                        jnp.float32(times[i]), gt)
        psnrs.append(float(p))
        ssims.append(float(s))
    return {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims)),
            "n_views": eval_ds.num_views}
