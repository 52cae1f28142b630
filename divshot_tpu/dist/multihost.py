"""Multi-host (DCN) training — SURVEY §5.8, BASELINE config #5.

The reference is single-process/single-GPU; the TPU build goes multi-host
the JAX-native way: ``jax.distributed.initialize`` brings every host's
chips into one global device set, a (data, model) ``Mesh`` spans them, and
the SAME jitted train step runs SPMD — gradient psum rides ICI within a
host and DCN across hosts, inserted by XLA from sharding annotations.

Host-sharded input: camera poses are tiny and replicated on every host;
images are loaded only by the host that owns the view (round-robin shard)
and enter the step as a process-local contribution to one global
``(B, H, W, 3)`` array (``jax.make_array_from_process_local_data``) — the
multi-host analog of the reference's single-process streaming dataset
(``gsio/loader.py``; docs/userGuide.md:11 capacity claim).

Launch (one process per host):
  python -m divshot_tpu.apps.train --dist_coordinator host0:1234 \
      --dist_nprocs 4 --dist_procid $I ...
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from divshot_tpu.core.config import TrainConfig
from divshot_tpu.train.trainer import Dataset, TrainState, make_train_step
from divshot_tpu.train import strategy as S
from divshot_tpu.train.optim import AdamState


def init_multihost(coordinator: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None) -> tuple[int, int]:
    """Initialize ``jax.distributed`` when launched multi-process; no-op
    for a single process. Returns (process_index, process_count)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()


def host_view_shard(num_views: int, process_id: int | None = None,
                    process_count: int | None = None) -> np.ndarray:
    """Round-robin shard of view indices this host loads images for."""
    pid = jax.process_index() if process_id is None else process_id
    pcount = jax.process_count() if process_count is None else process_count
    return np.arange(pid, num_views, pcount)


class MultiHostTrainer:
    """Data-parallel trainer across all hosts' devices.

    ``dataset`` carries the GLOBAL camera table (replicated, poses are
    bytes) and a HOST-LOCAL image store covering ``host_view_shard`` of the
    views (``local_images[i]`` is the image of global view
    ``local_views[i]``). Each step every host samples
    ``B_local = B / process_count`` views from its shard; the global batch
    is assembled from process-local shards and the jitted step runs SPMD
    over the (data, model) mesh.
    """

    def __init__(self, cfg: TrainConfig, dataset: Dataset,
                 params, local_views: np.ndarray,
                 local_images: np.ndarray,
                 local_masks: np.ndarray | None = None,
                 render_kwargs: dict[str, Any] | None = None,
                 batch_per_device: int = 1):
        self.cfg = cfg
        self.dataset = dataset
        devices = np.asarray(jax.devices())
        self.mesh = Mesh(devices.reshape(len(devices), 1), ("data", "model"))
        self.B = len(devices) * batch_per_device
        self.B_local = len(jax.local_devices()) * batch_per_device
        self.local_views = np.asarray(local_views)
        self.local_images = local_images
        self.local_masks = local_masks
        assert len(self.local_views) > 0, "host owns no views"

        self._data_sh = NamedSharding(self.mesh, P("data"))
        repl = NamedSharding(self.mesh, P())

        state = TrainState(
            params=params,
            opt=AdamState.init(params),
            dstate=S.DensifyState.init(params.capacity),
            key=jax.random.PRNGKey(cfg.seed),
        )
        self.state = jax.device_put(state, repl)

        step = make_train_step(cfg, dataset, render_kwargs,
                               batch_size=self.B, streamed=True)
        self._step = jax.jit(
            step,
            in_shardings=(repl, self._data_sh, self._data_sh, None),
            out_shardings=(repl, repl),
            donate_argnums=(0,))
        # every host uses the same seed stream => identical global batches
        # are assembled from disjoint per-host slices deterministically
        self._rng = np.random.default_rng(cfg.seed + jax.process_index())
        self._host_step = 0

    def step_once(self) -> dict:
        sel = self._rng.integers(len(self.local_views), size=self.B_local)
        views = self.local_views[sel].astype(np.int32)
        gts = np.stack([np.asarray(self.local_images[i]) for i in sel])
        view_g = jax.make_array_from_process_local_data(
            self._data_sh, views)
        gt_g = jax.make_array_from_process_local_data(self._data_sh, gts)
        self.state, metrics = self._step(self.state, view_g, gt_g, None)
        self._host_step += 1
        return metrics

    def run(self, num_iters: int, log_every: int = 0) -> list[dict]:
        out = []
        for i in range(num_iters):
            m = self.step_once()
            if log_every and (i + 1) % log_every == 0:
                out.append({k: float(v) for k, v in m.items()})
        return out
