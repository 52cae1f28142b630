"""Per-group Adam for splat parameters.

Matches the reference trainer's optimizer semantics (lrs from ``main.cpp:31``,
standard 3DGS): independent Adam moments per parameter group, exponential
position-lr decay with warmup-delay, shN at feature_lr/20, moment reset on
densification (handled by the strategies, which zero moments at new slots),
optional visible-only ("sparse"/visibleAdam) updates.

Hand-rolled rather than optax so strategies can surgically edit moment
buffers with the same scatter ops they apply to params.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from divshot_tpu.core.config import OptimConfig
from divshot_tpu.splat.gaussians import GaussianParams

PARAM_FIELDS = ("means", "scales", "quats", "opacity", "sh0", "shN")


@struct.dataclass
class AdamState:
    mu: dict[str, jax.Array]
    nu: dict[str, jax.Array]
    step: jax.Array  # () int32

    @classmethod
    def init(cls, params: GaussianParams) -> "AdamState":
        zeros = {f: jnp.zeros_like(getattr(params, f)) for f in PARAM_FIELDS}
        return cls(mu=zeros,
                   nu={f: jnp.zeros_like(v) for f, v in zeros.items()},
                   step=jnp.int32(0))


def pos_lr_schedule(cfg: OptimConfig, step: jax.Array,
                    scene_extent: float,
                    init: jax.Array | None = None,
                    final: jax.Array | None = None) -> jax.Array:
    """graphdeco get_expon_lr_func: log-lerp init→final over max_steps with
    sine delay ramp of delay_mult; lrs scale by scene extent.

    ``init``/``final`` may be traced scalars (live-config overrides)."""
    init = cfg.pos_lr_init if init is None else init
    final = cfg.pos_lr_final if final is None else final
    t = jnp.clip(step / cfg.pos_lr_max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(jnp.log(init) * (1 - t) + jnp.log(final) * t)
    # delay ramp (delay_steps=0 in reference defaults → ramp inactive)
    return log_lerp * scene_extent


def group_lrs(cfg: OptimConfig, step: jax.Array, scene_extent: float,
              hypers: dict | None = None) -> dict[str, jax.Array]:
    """Per-group lrs. ``hypers`` (traced scalars from
    ``trainer.hypers_from_config``) override the static config values so
    queued live-config changes apply without recompiling the step."""
    h = hypers or {}
    one = jnp.float32(1.0)
    feat = h.get("feature_lr", cfg.feature_lr)
    return {
        "means": pos_lr_schedule(cfg, step, scene_extent,
                                 init=h.get("pos_lr_init"),
                                 final=h.get("pos_lr_final")),
        "scales": one * h.get("scaling_lr", cfg.scaling_lr),
        "quats": one * h.get("rotation_lr", cfg.rotation_lr),
        "opacity": one * h.get("opacity_lr", cfg.opacity_lr),
        "sh0": one * feat,
        "shN": one * feat / 20.0,
    }


def adam_update(
    cfg: OptimConfig,
    params: GaussianParams,
    grads: dict[str, jax.Array],
    state: AdamState,
    scene_extent: float,
    visible: jax.Array | None = None,   # (C,) bool — visibleAdam mask
    hypers: dict | None = None,         # traced lr overrides (live config)
) -> tuple[GaussianParams, AdamState]:
    step = state.step + 1
    lrs = group_lrs(cfg, step, scene_extent, hypers)
    b1, b2, eps = cfg.b1, cfg.b2, cfg.eps
    bc1 = 1.0 - b1 ** step.astype(jnp.float32)
    bc2 = 1.0 - b2 ** step.astype(jnp.float32)

    new_p: dict[str, Any] = {}
    new_mu: dict[str, jax.Array] = {}
    new_nu: dict[str, jax.Array] = {}
    for f in PARAM_FIELDS:
        # math in f32 even when the stored buffers are packed to bf16
        # (packLevel ladder): moments/updates round back to storage dtype
        g = grads[f].astype(jnp.float32)
        p = getattr(params, f)
        mu = state.mu[f].astype(jnp.float32) * b1 + (1 - b1) * g
        nu = state.nu[f].astype(jnp.float32) * b2 + (1 - b2) * g * g
        upd = lrs[f] * (mu / bc1) / (jnp.sqrt(nu / bc2) + eps)
        if visible is not None and cfg.visible_adam:
            mask = visible.reshape((-1,) + (1,) * (p.ndim - 1))
            mu = jnp.where(mask, mu, state.mu[f].astype(jnp.float32))
            nu = jnp.where(mask, nu, state.nu[f].astype(jnp.float32))
            upd = jnp.where(mask, upd, 0.0)
        new_p[f] = (p.astype(jnp.float32) - upd).astype(p.dtype)
        new_mu[f] = mu.astype(state.mu[f].dtype)
        new_nu[f] = nu.astype(state.nu[f].dtype)

    return params.replace(**new_p), AdamState(mu=new_mu, nu=new_nu, step=step)
