"""Data-parallel train step with EXPLICIT early gradient all-reduce
(VERDICT r4 #6; design in runs/dist_overlap_note.md).

The jit-auto-psum step (dist/mesh.py) lets XLA bundle every parameter
gradient into ONE tuple all-reduce issued after the whole fused backward —
leaving almost no compute to hide the collective under. This variant runs
the step inside ``shard_map`` over the mesh's data axis and reduces in two
waves:

1. **early**: the SH gradients (sh0/shN — ~60% of gradient bytes at
   sh_degree 3) all-reduce via a custom-vjp gate the moment the rasterizer
   color-grad segment reduce produces them, dataflow-independent of the
   projection/means backward that follows, so XLA's async-collective pass
   can overlap the transfer with the remaining backward;
2. **late**: everything else (means/scales/quats/opacity, sinks, metrics)
   reduces after ``value_and_grad`` as before.

Numerically this computes the same per-view-mean gradients as the serial
batched step (pmean == mean over the equally-weighted view batch), to
float-association tolerance. Optimizer state is replicated here (use
dist/mesh.py's model axis when ZeRO sharding matters more than overlap).
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from divshot_tpu.core.config import TrainConfig
from divshot_tpu.train.trainer import Dataset, TrainState, make_train_step


def make_overlap_train_step(cfg: TrainConfig, dataset: Dataset, mesh: Mesh,
                            render_kwargs: dict | None = None):
    """-> compile_for(state) -> jitted (state, view_idx (B,)) step with the
    early-psum schedule. B must equal the mesh's data-axis size."""
    from jax.experimental.shard_map import shard_map

    step_fn = make_train_step(cfg, dataset, render_kwargs,
                              grad_psum_axis="data")

    def sharded(state: TrainState, view_idx: jax.Array):
        # per-shard view_idx has shape (1,): the batched (vmap) path with
        # one local view; grads/metrics reduce inside step_fn via the
        # early/late pmean waves
        return step_fn(state, view_idx)

    mapped = shard_map(
        sharded, mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P(), P()),
        check_rep=False)

    repl = NamedSharding(mesh, P())
    view_sh = NamedSharding(mesh, P("data"))

    def compile_for(state: TrainState):
        return jax.jit(mapped,
                       in_shardings=(repl, view_sh),
                       out_shardings=(repl, repl),
                       donate_argnums=(0,))

    return compile_for
