"""EAGLES-style compressed splats: per-splat quantized latents decoded by
small MLPs into color / opacity / scale+rotation.

The reference ships the inference side of this as trainer-provided shaders
(``gsplat_mlp_infer_{color,opacity,scale_rot}.hlsl`` +
``gsplat_mlp_combine.hlsl``, SURVEY §2.4) and credits EAGLES for the
quantization scheme. TPU-first realization: latents live as uint8 codes
(straight-through quantization during distillation), the decoders are
dense layers that XLA fuses into a handful of MXU matmuls over all splats
at once, and the decoded attributes feed the standard rasterizer.

Compression: means (3 f32) + quats? No — quats/scales decode from the
latent too. Stored per splat: 3 f32 position + D uint8 latent (default
D=16) ≈ 28 B vs 236 B raw (8.4x), before entropy coding.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn
import optax
from flax import struct

from divshot_tpu.splat.gaussians import GaussianParams


def _quantize_ste(x: jnp.ndarray) -> jnp.ndarray:
    """Straight-through uint8 quantization of latents in [-1, 1]."""
    q = jnp.round(jnp.clip(x, -1.0, 1.0) * 127.0) / 127.0
    return x + jax.lax.stop_gradient(q - x)


class ColorMLP(nn.Module):
    """latent + view direction -> rgb (the gsplat_mlp_infer_color analog).
    View dependence via a 4-band directional encoding."""
    width: int = 64

    @nn.compact
    def __call__(self, z, dirs):
        from divshot_tpu.models.dynamic import posenc
        h = jnp.concatenate([z, posenc(dirs, 4)], axis=-1)
        h = nn.relu(nn.Dense(self.width)(h))
        h = nn.relu(nn.Dense(self.width)(h))
        return nn.Dense(3)(h)


class OpacityMLP(nn.Module):
    width: int = 32

    @nn.compact
    def __call__(self, z):
        h = nn.relu(nn.Dense(self.width)(z))
        return nn.Dense(1)(h)[..., 0]


class ScaleRotMLP(nn.Module):
    width: int = 64

    @nn.compact
    def __call__(self, z):
        h = nn.relu(nn.Dense(self.width)(z))
        h = nn.relu(nn.Dense(self.width)(h))
        s = nn.Dense(3)(h)
        q = nn.Dense(4)(h)
        return s, q


@struct.dataclass
class CompressedSplats:
    """Positions + quantized latents + decoder parameters."""
    means: jax.Array          # (N, 3) f32
    codes: jax.Array          # (N, D) int8 codes (z = codes / 127)
    alive: jax.Array          # (N,) bool
    color_p: Any
    opacity_p: Any
    scalerot_p: Any
    latent_dim: int = struct.field(pytree_node=False, default=16)

    @property
    def latents(self) -> jax.Array:
        return self.codes.astype(jnp.float32) / 127.0

    def bytes_per_splat(self) -> int:
        return 12 + self.latent_dim

    def decode(self, campos: jax.Array) -> GaussianParams:
        """-> GaussianParams with sh_degree 0 (view dependence is baked
        into the decoded DC color for this camera position)."""
        from divshot_tpu.splat.math import safe_normalize
        z = self.latents
        dirs = safe_normalize(self.means - campos[None, :])
        rgb = ColorMLP().apply(self.color_p, z, dirs)
        # rgb (linear, pre-activation) -> SH0 domain: c = 0.5 + SH_C0*dc
        SH_C0 = 0.28209479177387814
        sh0 = (jax.nn.sigmoid(rgb) - 0.5) / SH_C0
        opacity = OpacityMLP().apply(self.opacity_p, z)
        scales, quats = ScaleRotMLP().apply(self.scalerot_p, z)
        return GaussianParams(
            means=self.means, scales=scales, quats=quats,
            opacity=opacity, sh0=sh0,
            shN=jnp.zeros((self.means.shape[0], 0, 3), jnp.float32),
            alive=self.alive)


def init_compressed(params: GaussianParams, key: jax.Array,
                    latent_dim: int = 16) -> CompressedSplats:
    n = params.capacity
    k1, k2, k3, k4 = jax.random.split(key, 4)
    z0 = jax.random.normal(k1, (n, latent_dim)) * 0.1
    dirs0 = jnp.zeros((1, 3)).at[:, 2].set(1.0)
    color_p = ColorMLP().init(k2, z0[:1], dirs0)
    opacity_p = OpacityMLP().init(k3, z0[:1])
    scalerot_p = ScaleRotMLP().init(k4, z0[:1])
    codes = jnp.round(jnp.clip(z0, -1, 1) * 127).astype(jnp.int8)
    return CompressedSplats(
        means=params.means, codes=codes, alive=params.alive,
        color_p=color_p, opacity_p=opacity_p, scalerot_p=scalerot_p,
        latent_dim=latent_dim)


def distill(params: GaussianParams, key: jax.Array, *,
            latent_dim: int = 16, steps: int = 2000, lr: float = 5e-3,
            batch_dirs: int = 8,
            log_every: int = 0) -> tuple[CompressedSplats, dict]:
    """Fit latents + decoders to reproduce the raw splat attributes
    (attribute-space distillation — the EAGLES training recipe minus the
    rendering fine-tune, which ``finetune_with_render`` adds).

    Returns (compressed, metrics)."""
    n = params.capacity
    comp = init_compressed(params, key, latent_dim)
    z = comp.latents
    SH_C0 = 0.28209479177387814

    from divshot_tpu.splat.sh import eval_sh_color
    from divshot_tpu.splat.math import safe_normalize

    opt = optax.adam(lr)
    train_vars = {"z": z, "color": comp.color_p,
                  "op": comp.opacity_p, "sr": comp.scalerot_p}
    opt_state = opt.init(train_vars)

    target_op = params.opacity
    target_scales = params.scales
    target_quats = params.quats / jnp.linalg.norm(
        params.quats, axis=1, keepdims=True).clip(1e-8)

    def loss_fn(tv, dirs):
        zq = _quantize_ste(tv["z"])
        # color supervision: match SH-evaluated color along random dirs
        tgt_rgb = jnp.clip(
            eval_sh_color(params.sh0, params.shN,
                          jnp.broadcast_to(dirs, (n, 3)),
                          params.sh_degree), 0.0, 1.0)
        pred = jax.nn.sigmoid(ColorMLP().apply(tv["color"], zq,
                                               jnp.broadcast_to(dirs, (n, 3))))
        l_rgb = jnp.mean(jnp.where(params.alive[:, None],
                                   (pred - tgt_rgb) ** 2, 0.0))
        l_op = jnp.mean(jnp.where(
            params.alive,
            (OpacityMLP().apply(tv["op"], zq) - target_op) ** 2, 0.0))
        s, q = ScaleRotMLP().apply(tv["sr"], zq)
        qn = q / jnp.linalg.norm(q, axis=1, keepdims=True).clip(1e-8)
        # quaternion sign-invariant distance
        l_q = jnp.mean(jnp.where(
            params.alive,
            1.0 - jnp.abs(jnp.sum(qn * target_quats, axis=1)), 0.0))
        l_s = jnp.mean(jnp.where(params.alive[:, None],
                                 (s - target_scales) ** 2, 0.0))
        return l_rgb + 0.1 * l_op + 0.1 * l_s + 0.1 * l_q

    @jax.jit
    def step(tv, opt_state, k):
        d = safe_normalize(jax.random.normal(k, (3,)))
        loss, g = jax.value_and_grad(loss_fn)(tv, d)
        upd, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(tv, upd), opt_state, loss

    loss = jnp.float32(0)
    for i in range(steps):
        key, k = jax.random.split(key)
        train_vars, opt_state, loss = step(train_vars, opt_state, k)
        if log_every and (i + 1) % log_every == 0:
            print(f"[distill {i+1}/{steps}] loss={float(loss):.5f}")

    codes = jnp.round(
        jnp.clip(train_vars["z"], -1, 1) * 127).astype(jnp.int8)
    out = CompressedSplats(
        means=params.means, codes=codes, alive=params.alive,
        color_p=train_vars["color"], opacity_p=train_vars["op"],
        scalerot_p=train_vars["sr"], latent_dim=latent_dim)
    return out, {"loss": float(loss),
                 "bytes_per_splat": out.bytes_per_splat()}


def save_compressed(path: str, comp: CompressedSplats) -> None:
    """NPZ container: positions f32, codes int8, decoder params."""
    flat = jax.tree_util.tree_flatten_with_path(
        (comp.color_p, comp.opacity_p, comp.scalerot_p))[0]
    arrays = {"means": np.asarray(comp.means),
              "codes": np.asarray(comp.codes),
              "alive": np.asarray(comp.alive),
              "latent_dim": np.asarray(comp.latent_dim)}
    for i, (pth, leaf) in enumerate(flat):
        arrays[f"w{i}|{jax.tree_util.keystr(pth)}"] = np.asarray(leaf)
    np.savez_compressed(path, **arrays)


def load_compressed(path: str) -> CompressedSplats:
    npz = np.load(path)
    latent_dim = int(npz["latent_dim"])
    n = npz["means"].shape[0]
    template = init_compressed(
        GaussianParams.create(np.zeros((n, 3), np.float32), sh_degree=0),
        jax.random.PRNGKey(0), latent_dim)
    tpl = (template.color_p, template.opacity_p, template.scalerot_p)
    flat, treedef = jax.tree_util.tree_flatten_with_path(tpl)
    leaves = []
    for i, (pth, leaf) in enumerate(flat):
        leaves.append(jnp.asarray(npz[f"w{i}|{jax.tree_util.keystr(pth)}"]))
    color_p, opacity_p, scalerot_p = jax.tree_util.tree_unflatten(
        treedef, leaves)
    return CompressedSplats(
        means=jnp.asarray(npz["means"]), codes=jnp.asarray(npz["codes"]),
        alive=jnp.asarray(npz["alive"]), color_p=color_p,
        opacity_p=opacity_p, scalerot_p=scalerot_p, latent_dim=latent_dim)
