"""Checkpoint / resume (SURVEY §5.4).

The reference checkpoints the splat model every 10k iters past the alpha
warmup and resumes via ``create_splat(config, load_itr)`` loading
``modelPath/iteration_N`` (``gs_train.cpp:47,107,165-166``); the PLY is the
interchange artifact. Here: orbax saves the FULL train pytree {params, Adam
moments, densify accumulators, RNG, step} for exact resume, and a standard
PLY is exported alongside as the interoperable artifact.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from divshot_tpu.splat.gaussians import GaussianParams
from divshot_tpu.train.trainer import TrainState
from divshot_tpu.train.optim import AdamState
from divshot_tpu.train import strategy as S
from divshot_tpu.gsio import ply as P


def checkpoint_dir(model_path: str, step: int) -> str:
    return os.path.join(os.path.abspath(model_path), f"iteration_{step}")


def _strip_empty(tree):
    """orbax refuses zero-size arrays (shN at sh_degree 0); store None
    (an empty subtree) in their place and restore from the template."""
    return jax.tree.map(
        lambda x: None if np.asarray(x).size == 0 else np.asarray(x), tree)


def _merge_template(restored, template):
    def merge(r, t):
        if r is None and t is None:
            return None          # genuinely-empty field on both sides
        return jax.numpy.asarray(t if r is None else r)
    return jax.tree.map(merge, restored, template,
                        is_leaf=lambda x: x is None)


def save_checkpoint(model_path: str, state: TrainState, *, step: int,
                    export_ply: bool = True) -> str:
    path = checkpoint_dir(model_path, step)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.join(path, "state"), _strip_empty(state), force=True)
    if export_ply:
        P.save_ply(os.path.join(path, "point_cloud.ply"), state.params)
    return path


def latest_step(model_path: str) -> int | None:
    if not os.path.isdir(model_path):
        return None
    steps = []
    for d in os.listdir(model_path):
        if d.startswith("iteration_") and d[10:].isdigit():
            steps.append(int(d[10:]))
    return max(steps) if steps else None


def load_checkpoint(model_path: str, step: int,
                    template: TrainState) -> TrainState:
    """Restore with ``template`` providing structure/shapes."""
    path = os.path.join(checkpoint_dir(model_path, step), "state")
    ckpt = ocp.PyTreeCheckpointer()
    restored = ckpt.restore(path, item=_strip_empty(template))
    return _merge_template(restored, template)


def save_checkpoint_pytree(model_path: str, state, *, step: int) -> str:
    """Checkpoint an arbitrary train-state pytree (dynamic variants carry
    net params + optax state alongside the splat fields)."""
    path = checkpoint_dir(model_path, step)
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.join(path, "state"), _strip_empty(state), force=True)
    return path


def load_checkpoint_pytree(model_path: str, step: int, template):
    path = os.path.join(checkpoint_dir(model_path, step), "state")
    ckpt = ocp.PyTreeCheckpointer()
    restored = ckpt.restore(path, item=_strip_empty(template))
    return _merge_template(restored, template)
