"""Densification / pruning strategies under static shapes.

Reimplements the behavior of the reference trainer's three strategies
(``densifyStrategy {0:SplatADC, 1:SplatMCMC, 2:SplatADC+}``, SURVEY §2.9)
TPU-first: the splat arrays are capacity-padded with an ``alive`` mask, so
clone/split/prune/relocate are pure scatter ops on fixed-shape buffers —
no reallocation, fully jit-compatible, executed under ``lax.cond`` on the
refine schedule so one compiled train step serves every iteration.

ADC  — classic gaussian-splatting adaptive density control: clone small /
       split large splats whose accumulated NDC positional gradient exceeds
       grow_grad2d; prune transparent/oversized; periodic alpha reset.
ADC+ — ADC with AbsGS absolute gradients (useAbsGrad) and revised opacity
       on clone (revisedOpacity), per the reference's defaults.
MCMC — 3DGS-as-MCMC: dead splats teleport onto samples of live ones with
       opacity/scale rescaled by the N-way split relocation rule; live set
       grows toward cap_max; covariance-shaped position noise each step.
"""

from __future__ import annotations

import math as _math

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from divshot_tpu.core.config import DensifyConfig, DensifyStrategy
from divshot_tpu.splat.gaussians import GaussianParams
from divshot_tpu.splat.math import quat_to_rotmat
from divshot_tpu.train.optim import AdamState, PARAM_FIELDS, pos_lr_schedule


@struct.dataclass
class DensifyObs:
    """Per-step observations fed to the strategy."""
    grad2d: jax.Array      # (C,) ‖dL/dmeans2d‖ in NDC units this step
    absgrad2d: jax.Array   # (C,) AbsGS |dL/dmeans2d| norm (NDC)
    radii: jax.Array       # (C,) pixel radii (0 = not visible)
    npix: jax.Array | None = None  # (C,) pixels contributed to (Pixel-GS)
    width: int = struct.field(pytree_node=False, default=0)
    height: int = struct.field(pytree_node=False, default=0)


@struct.dataclass
class DensifyState:
    grad_accum: jax.Array   # (C,)
    count: jax.Array        # (C,)
    max_radii: jax.Array    # (C,) max radius as fraction of max(W, H)

    @classmethod
    def init(cls, capacity: int) -> "DensifyState":
        # distinct buffers (donation requires no aliasing between leaves)
        return cls(grad_accum=jnp.zeros((capacity,), jnp.float32),
                   count=jnp.zeros((capacity,), jnp.float32),
                   max_radii=jnp.zeros((capacity,), jnp.float32))


def update_stats(state: DensifyState, obs: DensifyObs,
                 use_abs_grad: bool = True,
                 pixel_grad_scale: float = 0.0) -> DensifyState:
    """Accumulate per-splat screen-grad stats; AbsGS selects the absolute
    gradient accumulator (reference default useAbsGrad=true).

    ``pixel_grad_scale`` > 0 enables Pixel-GS weighted averaging (the
    reference's pixelGradScale): each view contributes with weight
    proportional to the pixels the splat covered, so large splats seen up
    close aren't diluted by many low-signal distant views."""
    visible = obs.radii > 0
    g = jnp.where(visible, obs.absgrad2d if use_abs_grad else obs.grad2d, 0.0)
    w = visible.astype(jnp.float32)
    if pixel_grad_scale > 0.0 and obs.npix is not None:
        npix = jnp.maximum(obs.npix, 0.0)
        mean_npix = jnp.sum(npix * w) / jnp.maximum(jnp.sum(w), 1.0)
        pw = npix / jnp.maximum(mean_npix, 1.0)
        w = w * ((1.0 - pixel_grad_scale) + pixel_grad_scale * pw)
        g = g * ((1.0 - pixel_grad_scale)
                 + pixel_grad_scale * jnp.where(visible, pw, 0.0))
    return DensifyState(
        grad_accum=state.grad_accum + g,
        count=state.count + w,
        max_radii=jnp.maximum(
            state.max_radii,
            jnp.where(visible, obs.radii / max(obs.width, obs.height), 0.0)),
    )


def _zero_moments_at(opt: AdamState, mask: jax.Array) -> AdamState:
    def z(d):
        out = {}
        for f in PARAM_FIELDS:
            v = d[f]
            m = mask.reshape((-1,) + (1,) * (v.ndim - 1))
            out[f] = jnp.where(m, 0.0, v)
        return out
    return AdamState(mu=z(opt.mu), nu=z(opt.nu), step=opt.step)


def _gather_fields(params: GaussianParams, idx: jax.Array) -> dict:
    return {f: getattr(params, f)[idx] for f in PARAM_FIELDS}


def _scatter_fields(params: GaussianParams, dest: jax.Array, values: dict,
                    ok: jax.Array) -> GaussianParams:
    """Scatter value rows to dest slots where ok (dest clamped+dropped)."""
    cap = params.capacity
    dest_safe = jnp.where(ok, dest, cap)
    upd = {}
    for f in PARAM_FIELDS:
        upd[f] = getattr(params, f).at[dest_safe].set(values[f], mode="drop")
    return params.replace(**upd)


def _sample_from_gaussian(key: jax.Array, params: GaussianParams) -> jax.Array:
    """One sample per splat from N(mean, cov): mean + R·(exp(s)·eps)."""
    eps = jax.random.normal(key, params.means.shape)
    R = quat_to_rotmat(params.quats)
    return params.means + jnp.einsum(
        "nij,nj->ni", R, jnp.exp(params.scales) * eps, precision="highest")


# ---------------------------------------------------------------------------
# ADC / ADC+


def adc_refine(
    cfg: DensifyConfig,
    params: GaussianParams,
    opt: AdamState,
    state: DensifyState,
    key: jax.Array,
    step: jax.Array,
    scene_extent: float,
    hypers: dict | None = None,
) -> tuple[GaussianParams, AdamState, DensifyState]:
    cap = params.capacity
    alive = params.alive
    h = hypers or {}
    avg_grad = state.grad_accum / jnp.maximum(state.count, 1.0)
    is_grad_high = (avg_grad > h.get("grow_grad2d", cfg.grow_grad2d)) & alive

    max_scale = jnp.max(jnp.exp(params.scales), axis=-1)
    is_small = max_scale <= cfg.densify_scale3d * scene_extent
    is_dupli = is_grad_high & is_small
    is_split = is_grad_high & ~is_small
    # screen-size split (refineScale2d window)
    is_split = is_split | (
        (state.max_radii > cfg.densify_scale2d) & alive
        & (step < cfg.refine_scale2d_stop_iter))
    is_dupli = is_dupli & ~is_split

    # --- allocate free slots: dead slots ordered first ---
    req = is_dupli | is_split
    free_order = jnp.argsort(alive)              # dead slots first
    num_free = cap - jnp.sum(alive.astype(jnp.int32))
    req_rank = jnp.cumsum(req.astype(jnp.int32)) - 1
    ok = req & (req_rank < num_free)
    dest = free_order[jnp.clip(req_rank, 0, cap - 1)]

    k1, k2 = jax.random.split(key)
    sample_a = _sample_from_gaussian(k1, params)
    sample_b = _sample_from_gaussian(k2, params)
    split_scales = params.scales - jnp.log(1.6)   # /1.6 in linear units

    # values written to the NEW slot:
    new_vals = _gather_fields(params, jnp.arange(cap))
    split_ok = is_split & ok
    dupli_ok = is_dupli & ok
    new_vals["means"] = jnp.where(split_ok[:, None], sample_b, new_vals["means"])
    new_vals["scales"] = jnp.where(split_ok[:, None], split_scales,
                                   new_vals["scales"])
    if cfg.revised_opacity:
        # ADC+ (gsplat revised_opacity): each of the duplicated pair gets
        # alpha' = 1 - sqrt(1 - alpha) so the blended opacity is preserved
        alpha_cur = jax.nn.sigmoid(params.opacity)
        x = jnp.clip(1.0 - jnp.sqrt(jnp.clip(1 - alpha_cur, 1e-6, 1.0)),
                     1e-5, 1 - 1e-5)
        rev = jnp.log(x) - jnp.log1p(-x)
        new_vals["opacity"] = jnp.where(dupli_ok, rev, new_vals["opacity"])

    params2 = _scatter_fields(params, dest, new_vals, ok)
    # in-place edits on the ORIGINAL slot for splits (and revised-opacity dups)
    new_opacity = params2.opacity
    if cfg.revised_opacity:
        new_opacity = jnp.where(dupli_ok, new_vals["opacity"], new_opacity)
    params2 = params2.replace(
        means=jnp.where(split_ok[:, None], sample_a, params2.means),
        scales=jnp.where(split_ok[:, None], split_scales, params2.scales),
        opacity=new_opacity,
        alive=params2.alive.at[jnp.where(ok, dest, cap)].set(
            True, mode="drop"),
    )

    # zero Adam moments at new slots + modified originals
    touched = jnp.zeros((cap,), bool).at[jnp.where(ok, dest, cap)].set(
        True, mode="drop") | split_ok
    opt2 = _zero_moments_at(opt, touched)

    # --- prune ---
    alpha = jax.nn.sigmoid(params2.opacity)
    too_transparent = alpha < cfg.prune_opacity
    is_huge_3d = max_scale > cfg.prune_scale3d * scene_extent
    is_huge_2d = state.max_radii > cfg.prune_scale2d
    # size pruning only after first alpha reset (graphdeco: iter > reset)
    size_prune = (is_huge_3d | is_huge_2d) & (step > cfg.reset_alpha_every)
    dead = too_transparent | size_prune
    params2 = params2.replace(alive=params2.alive & ~dead)

    return params2, opt2, DensifyState.init(cap)


def alpha_reset(cfg: DensifyConfig, params: GaussianParams,
                opt: AdamState) -> tuple[GaussianParams, AdamState]:
    """Clamp opacities to ≤ 2·min_opacity (graphdeco reset_opacity) and zero
    the opacity Adam moments."""
    target = 2.0 * cfg.min_opacity
    logit = jnp.log(target) - jnp.log1p(-target)
    new_op = jnp.minimum(params.opacity, logit)
    opt2 = AdamState(
        mu={**opt.mu, "opacity": jnp.zeros_like(opt.mu["opacity"])},
        nu={**opt.nu, "opacity": jnp.zeros_like(opt.nu["opacity"])},
        step=opt.step)
    return params.replace(opacity=new_op), opt2


# ---------------------------------------------------------------------------
# MCMC


_RELOC_N_MAX = 51  # matches gsplat's relocation n_max

# denom(a, N) = Σ_{i=1..N} Σ_{k=0..i-1} C(i-1,k)(-1)^k a^{k+1}/√(k+1)
# (hockey-stick-reduced to Σ_{j=1..N} C(N,j)(-1)^{j-1} a^j/√j). The
# alternating binomial sum is CATASTROPHICALLY unstable in f32 for N ≳ 20
# (C(51,26) ≈ 2.5e14 ⇒ rounding error ~1e7 against an O(1) result) — a
# corrupted denominator explodes or implodes the rescaled log-scales of the
# most popular relocation targets and collapses training at the first
# refine. Stable form via 1/√j = (1/√π)∫ t^(-1/2) e^{-jt} dt:
#     denom(a, N) = (2/√π) ∫_0^∞ [1 - (1 - a·e^{-u²})^N] du
# (positive integrand, no cancellation; N=1 → a exactly). Precomputed in
# f64 on a (N, logit(a)) grid at import; runtime is a gather + lerp.
_RELOC_LOGIT_LO, _RELOC_LOGIT_HI, _RELOC_GRID = -11.6, 11.6, 256


def _reloc_denom_table() -> np.ndarray:
    u = np.linspace(0.0, 8.0, 4096)
    logits = np.linspace(_RELOC_LOGIT_LO, _RELOC_LOGIT_HI, _RELOC_GRID)
    a = 1.0 / (1.0 + np.exp(-logits))                     # (G,)
    n = np.arange(0, _RELOC_N_MAX + 1, dtype=np.float64)  # (N+1,)
    inner = 1.0 - a[None, :, None] * np.exp(-u[None, None, :] ** 2)
    g = 1.0 - np.power(np.clip(inner, 1e-300, None),
                       np.maximum(n, 1.0)[:, None, None])
    return ((2.0 / np.sqrt(np.pi))
            * np.trapezoid(g, x=u, axis=-1)).astype(np.float32)


_RELOC_DENOM = _reloc_denom_table()                       # (N_MAX+1, G)


def _relocation_rescale(opacity_logit: jax.Array, scales_log: jax.Array,
                        n_split: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Exact MCMC N-way split rule (Kheradmand et al., "3DGS as MCMC"):
    alpha_new = 1-(1-alpha)^(1/N), scale_new = scale · alpha/denom(a_new, N)
    with the stable tabulated denominator (see _RELOC_DENOM)."""
    alpha = jax.nn.sigmoid(opacity_logit)
    n = jnp.clip(n_split, 1, _RELOC_N_MAX)
    nf = n.astype(jnp.float32)
    a_new = 1.0 - jnp.power(jnp.clip(1.0 - alpha, 1e-6, 1.0), 1.0 / nf)
    a_new = jnp.clip(a_new, 1e-5, 1 - 1e-5)
    o_new = jnp.log(a_new) - jnp.log1p(-a_new)

    t = (o_new - _RELOC_LOGIT_LO) / (_RELOC_LOGIT_HI - _RELOC_LOGIT_LO) \
        * (_RELOC_GRID - 1)
    t = jnp.clip(t, 0.0, _RELOC_GRID - 1.0)
    i0 = jnp.floor(t).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, _RELOC_GRID - 1)
    frac = t - i0.astype(jnp.float32)
    tab = jnp.asarray(_RELOC_DENOM)
    denom = tab[n, i0] * (1.0 - frac) + tab[n, i1] * frac
    # alpha <= denom holds analytically (N-way splits never grow a splat);
    # the clamp is a hard safety net against interpolation slack
    coeff = jnp.minimum(alpha / jnp.maximum(denom, 1e-12), 1.0)
    s_new = scales_log + jnp.log(jnp.maximum(coeff, 1e-12))[:, None]
    # N == 1 is the identity analytically — make it exact (no interp slack)
    one = n == 1
    return (jnp.where(one, opacity_logit, o_new),
            jnp.where(one[:, None], scales_log, s_new))


def mcmc_refine(
    cfg: DensifyConfig,
    params: GaussianParams,
    opt: AdamState,
    state: DensifyState,
    key: jax.Array,
    step: jax.Array,
    scene_extent: float,
) -> tuple[GaussianParams, AdamState, DensifyState]:
    del scene_extent
    cap = params.capacity
    alive = params.alive
    alpha = jnp.where(alive, jax.nn.sigmoid(params.opacity), 0.0)

    # dead = transparent-but-alive splats to relocate; plus grow 5% of cap
    # from the dead pool toward cap_max
    relocate = alive & (alpha < cfg.mcmc_min_opacity)
    n_alive = jnp.sum(alive.astype(jnp.int32))
    target_alive = jnp.minimum(
        jnp.int32(cfg.cap_max),
        jnp.maximum(n_alive + 1,
                    (n_alive.astype(jnp.float32) * 1.05).astype(jnp.int32)))
    grow_budget = jnp.maximum(target_alive - n_alive, 0)
    dead_rank = jnp.cumsum((~alive).astype(jnp.int32)) - 1
    grow = ~alive & (dead_rank < grow_budget)

    req = relocate | grow
    # sample targets ∝ opacity among healthy alive splats
    probs = jnp.where(alive & ~relocate, alpha, 0.0)
    probs = probs / jnp.maximum(probs.sum(), 1e-8)
    k1, _ = jax.random.split(key)
    targets = jax.random.choice(k1, cap, shape=(cap,), p=probs)

    # how many requests landed on each target (+1 for the target itself)
    n_extra = jnp.zeros((cap,), jnp.int32).at[
        jnp.where(req, targets, cap)].add(1, mode="drop")
    n_split = 1 + n_extra

    o_new, s_new = _relocation_rescale(params.opacity, params.scales, n_split)

    # targets adopt their rescaled opacity/scale; requests copy the target
    tsel = jnp.where(req, targets, 0)
    new_vals = {
        "means": params.means[tsel],
        "scales": s_new[tsel],
        "quats": params.quats[tsel],
        "opacity": o_new[tsel],
        "sh0": params.sh0[tsel],
        "shN": params.shN[tsel],
    }
    touched_target = n_extra > 0
    params2 = params.replace(
        opacity=jnp.where(touched_target, o_new, params.opacity),
        scales=jnp.where(touched_target[:, None], s_new, params.scales),
    )
    upd = {}
    for f in PARAM_FIELDS:
        m = req.reshape((-1,) + (1,) * (new_vals[f].ndim - 1))
        upd[f] = jnp.where(m, new_vals[f], getattr(params2, f))
    params2 = params2.replace(**upd, alive=alive | grow)

    opt2 = _zero_moments_at(opt, req | touched_target)
    return params2, opt2, DensifyState.init(cap)


def mcmc_noise(
    cfg: DensifyConfig,
    opt_cfg,
    params: GaussianParams,
    key: jax.Array,
    step: jax.Array,
    scene_extent: float,
    hypers: dict | None = None,
) -> GaussianParams:
    """Per-step covariance-shaped position noise (MCMC exploration term),
    gated to ~transparent splats: eps ~ N(0, cov), scaled by
    pos_lr · noise_lr · sigmoid(-100·(alpha - 0.005))."""
    h = hypers or {}
    lr = pos_lr_schedule(opt_cfg, step, scene_extent,
                         init=h.get("pos_lr_init"),
                         final=h.get("pos_lr_final"))
    alpha = jax.nn.sigmoid(params.opacity)
    gate = jax.nn.sigmoid(-100.0 * (alpha - 0.005))
    eps = jax.random.normal(key, params.means.shape)
    R = quat_to_rotmat(params.quats)
    noise = jnp.einsum("nij,nj->ni", R, jnp.exp(params.scales) * eps,
                       precision="highest")
    noise = noise * (gate * lr * h.get("noise_lr", cfg.noise_lr))[:, None]
    noise = jnp.where(params.alive[:, None], noise, 0.0)
    return params.replace(means=params.means + noise)


def refine(
    cfg: DensifyConfig,
    params: GaussianParams,
    opt: AdamState,
    state: DensifyState,
    key: jax.Array,
    step: jax.Array,
    scene_extent: float,
    hypers: dict | None = None,
) -> tuple[GaussianParams, AdamState, DensifyState]:
    if cfg.strategy == DensifyStrategy.MCMC:
        return mcmc_refine(cfg, params, opt, state, key, step, scene_extent)
    return adc_refine(cfg, params, opt, state, key, step, scene_extent,
                      hypers)


# ---------------------------------------------------------------------------
# Periodic hard prune (pruneStrategy / pruneInterval)


LIGHT_PRUNE_RATIO = 0.1   # fraction of alive splats culled per LIGHT prune
LIGHT_VOLUME_BETA = 0.1   # LightGaussian gamma(Sigma) exponent


def periodic_prune(
    cfg: DensifyConfig,
    params: GaussianParams,
    opt: AdamState,
    state: DensifyState,
    scene_extent: float,
) -> tuple[GaussianParams, AdamState]:
    """The reference's ``pruneStrategy {0:reduce, 1:light}`` applied every
    ``pruneInterval`` steps (``editor.cpp:2008-2016``; LightGaussian credit
    ``README.md:108-131``).

    REDUCE: re-applies the transparency / oversize prune rules outside the
    ADC refine window (MCMC runs never otherwise drop splats, so long runs
    accrete near-dead ones).

    LIGHT: LightGaussian global-significance ranking — score each splat by
    hit count x opacity x volume^beta (GS_j = sum_rays 1(hit) sigma_j
    gamma(Sigma_j), gamma = normalized volume to the 0.1 power) and cull
    the lowest ``LIGHT_PRUNE_RATIO`` of the alive set."""
    alive = params.alive
    alpha = jax.nn.sigmoid(params.opacity)

    if cfg.prune_strategy == 1:  # PruneStrategy.LIGHT
        vol = jnp.exp(jnp.sum(params.scales, axis=-1))       # prod of scales
        v90 = jnp.quantile(jnp.where(alive, vol, 0.0), 0.9)
        gamma = jnp.power(jnp.clip(vol / jnp.maximum(v90, 1e-12), 1e-6, 1.0),
                          LIGHT_VOLUME_BETA)
        hits = jnp.maximum(state.count, 1e-3)
        score = jnp.where(alive, hits * alpha * gamma, jnp.inf)
        n_alive = jnp.sum(alive.astype(jnp.int32))
        k = (n_alive.astype(jnp.float32) * LIGHT_PRUNE_RATIO).astype(jnp.int32)
        order = jnp.argsort(score)                            # lowest first
        rank = jnp.zeros_like(order).at[order].set(
            jnp.arange(params.capacity, dtype=jnp.int32))
        dead = alive & (rank < k)
    else:                        # PruneStrategy.REDUCE
        max_scale = jnp.max(jnp.exp(params.scales), axis=-1)
        dead = alive & ((alpha < cfg.prune_opacity)
                        | (max_scale > cfg.prune_scale3d * scene_extent))

    params2 = params.replace(alive=alive & ~dead)
    opt2 = _zero_moments_at(opt, dead)
    return params2, opt2
