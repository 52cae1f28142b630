"""Multi-chip SPMD training (SURVEY §2.10 / §5.8).

The reference is single-GPU; the TPU build scales by construction:

- **data axis**: camera views sharded across chips — each chip rasterizes
  its own view(s); parameter gradients are all-reduced (psum) over ICI,
  which XLA inserts automatically from the sharding annotations and
  overlaps with the backward where profitable.
- **model axis**: splat-axis sharding of the optimizer state and the
  elementwise Adam update (ZeRO-1-style) — parameters are replicated for
  rasterization, moments live sharded, the update runs sharded and the new
  parameters are all-gathered.

Multi-host: initialize ``jax.distributed`` before calling ``make_mesh``;
``jax.devices()`` then spans hosts and the same code runs SPMD over DCN+ICI.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from divshot_tpu.core.config import TrainConfig
from divshot_tpu.train.trainer import Dataset, TrainState, make_train_step


def make_mesh(n_data: int | None = None, n_model: int = 1,
              devices=None) -> Mesh:
    """(data, model) mesh. Defaults to all devices on the data axis."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    dev = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(dev, axis_names=("data", "model"))


def train_state_shardings(mesh: Mesh) -> tuple[Any, Any]:
    """(state_sharding, view_idx_sharding): params replicated, Adam moments
    sharded over the model axis on the splat dim, views over data."""
    repl = NamedSharding(mesh, P())
    model0 = NamedSharding(mesh, P("model"))

    def opt_leaf(x):
        return model0

    # TrainState structure: params (replicated), opt.mu/nu (model-sharded),
    # opt.step + dstate + key (replicated)
    def shard_state(state: TrainState):
        def assign(path, leaf):
            keys = [getattr(p, "key", getattr(p, "name", "")) for p in path]
            if "mu" in keys or "nu" in keys:
                return model0
            return repl
        return jax.tree_util.tree_map_with_path(assign, state)

    view_sh = NamedSharding(mesh, P("data"))
    return shard_state, view_sh


def make_parallel_train_step(cfg: TrainConfig, dataset: Dataset, mesh: Mesh,
                             render_kwargs: dict | None = None):
    """jit-compiled data-parallel train step over the mesh.

    Overlap note (r4, evidence in runs/dist_overlap_note.md): XLA emits ONE
    bundled gradient all-reduce after the full fused backward; on TPU the
    async-collective pass can only partially hide it since Adam consumes
    the grads immediately. The measured-schedule headroom is an early psum
    of the SH/color grads (final before the projection backward) via
    explicit shard_map — deferred until multi-chip hardware is available to
    measure it.

    view_idx has shape (B,) with B = mesh data-axis size (or a multiple);
    each chip renders its shard of views, XLA all-reduces the parameter
    gradients over ICI and runs the (model-sharded) Adam update.
    """
    B = mesh.shape["data"]
    step_fn = make_train_step(cfg, dataset, render_kwargs, batch_size=B)
    shard_state_fn, view_sh = train_state_shardings(mesh)

    def wrapped(state: TrainState, view_idx: jax.Array):
        return step_fn(state, view_idx)

    def compile_for(state: TrainState):
        state_sh = shard_state_fn(state)
        return jax.jit(
            wrapped,
            in_shardings=(state_sh, view_sh),
            out_shardings=(state_sh, NamedSharding(mesh, P())),
            donate_argnums=(0,),
        )

    return compile_for


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a host TrainState onto the mesh with the standard shardings."""
    shard_state_fn, _ = train_state_shardings(mesh)
    sh = shard_state_fn(state)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, s), state, sh,
        is_leaf=lambda x: isinstance(x, (jnp.ndarray, np.ndarray)))
