"""Interactive training session — the TPU rebuild of the reference's
``GaussianTrainerScene`` editor-path API (SURVEY §2.9/§3.4; call sites
``editor.cpp:841-860,1416-1654``, ``inspector_panel.cpp:799-999``).

A ``TrainerSession`` owns a background training thread and exposes the same
contract the reference editor relies on:

- the ``TrainingStatus`` state machine (Loading_Prepare → [Colmap_Sfm] →
  GS → Preprocess_Done → Training → Training_Done, error exit
  Loading_Failed);
- ``start_train`` / ``pause_train`` / ``resume`` / ``terminate`` /
  ``is_training``;
- live parameter snapshots for visualization (``get_gaussian_*`` — the
  analog of ``getGaussian{Position,SH0,SHN,Opcaities,Scalings,Rotations}Cpu``,
  device→host copies every ``snapshot_every`` steps, the contract of
  ``editor.cpp:1556-1575``);
- camera accessors (``num_cameras``, ``get_camera``), SfM progress points
  (``get_points3d``);
- a config-update queue drained on the training thread between steps
  (mutex + queue, ``editor.cpp:1610-1618``);
- ``save_model`` / ``export_mesh`` / loss & phase progress accessors.
"""

from __future__ import annotations

import queue
import threading
import time
import traceback
from typing import Any, Callable

import numpy as np

from divshot_tpu.core.config import TrainConfig, auto_tune_config
from divshot_tpu.core.metrics import TrainingStatus


class TrainerSession:
    """Background-threaded trainer with live state introspection."""

    def __init__(self, cfg: TrainConfig, *,
                 render_kwargs: dict[str, Any] | None = None,
                 snapshot_every: int = 200):
        self.cfg = cfg
        self.render_kwargs = render_kwargs or {
            "backend": "pallas", "instance_capacity": 1 << 20}
        self.snapshot_every = snapshot_every

        self.status = TrainingStatus.LOADING_PREPARE
        self.progress = 0.0          # progress within the current phase
        self.error: str | None = None
        self.current_loss = float("nan")
        self.current_psnr = float("nan")
        self.num_gaussians = 0

        self._trainer = None
        self._dataset = None
        self._eval_dataset = None
        self._sfm_points: np.ndarray | None = None
        self._sfm_colors: np.ndarray | None = None
        self._snapshot: dict[str, np.ndarray] | None = None
        self._snapshot_lock = threading.Lock()
        self.snapshot_generation = 0   # bumps per snapshot (live viewer)
        self._config_queue: "queue.Queue[Callable]" = queue.Queue()
        self._pause = threading.Event()
        self._terminate = threading.Event()
        self._thread: threading.Thread | None = None
        self._step = 0

    # ---- phase / status surface (inspector_panel.cpp:997-999) ----

    @property
    def phase_name(self) -> str:
        return self.status.value

    def get_progress_on_current_phase(self) -> float:
        return self.progress

    def is_training(self) -> bool:
        return (self.status == TrainingStatus.TRAINING
                and not self._pause.is_set())

    def is_terminated(self) -> bool:
        return self._terminate.is_set() or self.status in (
            TrainingStatus.TRAINING_DONE, TrainingStatus.LOADING_FAILED)

    @property
    def current_iteration(self) -> int:
        return self._step

    @property
    def max_iterations(self) -> int:
        return self.cfg.num_iters

    # ---- data loading (load_train_data / trainSetup) ----

    def load_train_data(self, source_path: str | None = None,
                        run_sfm: bool = False) -> None:
        """Load (or SfM-reconstruct) the dataset. Mirrors
        ``loadTrainData`` + ``trainSetup``; raises nothing — errors land in
        ``status == LOADING_FAILED`` / ``self.error``."""
        try:
            self.status = TrainingStatus.LOADING_PREPARE
            src = source_path or self.cfg.source_path
            from divshot_tpu.gsio.datasets import load_dataset
            from divshot_tpu.gsio import sfm as SFM

            if run_sfm or SFM.needs_sfm(src):
                self.status = TrainingStatus.COLMAP_SFM
                result = SFM.run_sfm(
                    src, quality=getattr(self.cfg, "sfm_quality", 1),
                    progress_cb=self._on_sfm_progress)
                src = result.scene_dir

            ds, eval_ds = load_dataset(
                src, self.cfg.dataset_type,
                max_width=self.cfg.max_image_width,
                max_height=self.cfg.max_image_height,
                eval_holdout=self.cfg.eval_holdout,
                max_images=self.cfg.max_image_count,
                white_background=self.cfg.white_background,
                use_mask=self.cfg.use_mask)
            self._dataset = ds
            self._eval_dataset = eval_ds
            self._sfm_points = ds.points
            self._sfm_colors = ds.colors
            self.cfg = auto_tune_config(self.cfg, ds.num_views)
            self.status = TrainingStatus.GS
            self._setup()
            self.status = TrainingStatus.PREPROCESS_DONE
        except Exception as exc:           # contract: never throw across the
            self.error = f"{exc}\n{traceback.format_exc()}"   # thread edge
            self.status = TrainingStatus.LOADING_FAILED

    def load_synthetic(self, dataset, params=None) -> None:
        """Inject an in-memory Dataset (tests/demo path)."""
        self._dataset = dataset
        self.cfg = auto_tune_config(self.cfg, dataset.num_views)
        self._setup(params)
        self.status = TrainingStatus.PREPROCESS_DONE

    def _setup(self, params=None) -> None:
        from divshot_tpu.splat.gaussians import init_from_points
        from divshot_tpu.train.trainer import Trainer
        if params is None:
            pts, cols = self._dataset.points, self._dataset.colors
            if pts is None:
                rng = np.random.default_rng(self.cfg.seed)
                pts = rng.uniform(-1.3, 1.3, (100_000, 3)).astype(np.float32)
                cols = rng.uniform(0, 1, (100_000, 3)).astype(np.float32)
            params = init_from_points(
                pts, cols, sh_degree=self.cfg.sh_degree,
                capacity=int(self.cfg.densify.cap_max))
        self._trainer = Trainer(self.cfg, self._dataset, params,
                                render_kwargs=self.render_kwargs)
        self._take_snapshot()

    def _on_sfm_progress(self, stage: str, frac: float) -> None:
        self.progress = frac

    # ---- training control (startTrain/pauseTrain/...) ----

    def start_train(self) -> None:
        if self._thread is not None and self._thread.is_alive():
            self._pause.clear()
            return
        if self._trainer is None:
            raise RuntimeError("call load_train_data()/load_synthetic() first")
        self._terminate.clear()
        self._pause.clear()
        self._thread = threading.Thread(target=self._train_loop, daemon=True)
        self._thread.start()

    def pause_train(self) -> None:
        self._pause.set()

    def resume(self) -> None:
        self._pause.clear()

    def terminate(self, join: bool = True) -> None:
        self._terminate.set()
        self._pause.clear()
        if join and self._thread is not None:
            self._thread.join(timeout=120.0)

    def update_config(self, fn: Callable[[TrainConfig], TrainConfig]) -> None:
        """Queue a config mutation; applied on the training thread between
        steps (the reference's mutex+queue contract,
        ``editor.cpp:1610-1618``). Learning rates and loss weights flow into
        the already-compiled step as traced scalars (no recompile);
        structural changes rebuild the step functions transparently."""
        self._config_queue.put(fn)

    # ---- the training thread (run_train_gaussian, editor.cpp:1597-1654) ----

    def _train_loop(self) -> None:
        try:
            self.status = TrainingStatus.TRAINING
            trainer = self._trainer
            while (self._step < self.cfg.num_iters
                   and not self._terminate.is_set()):
                if self._pause.is_set():
                    time.sleep(0.05)
                    continue
                while not self._config_queue.empty():
                    try:
                        self.cfg = self._config_queue.get_nowait()(self.cfg)
                        # hyper changes (lrs/weights) reach the next step as
                        # traced inputs; structural changes recompile
                        trainer.apply_config(self.cfg)
                    except queue.Empty:
                        break
                n = self.cfg.num_iters
                trainer.step_once()
                self._step += 1
                self.progress = self._step / n
                if self._step % 50 == 0 or self._step == n:
                    m = trainer.last_metrics
                    if m is not None:
                        self.current_loss = float(m["loss"])
                        self.current_psnr = float(m["psnr"])
                        self.num_gaussians = int(m["num_alive"])
                if self.snapshot_every and \
                        self._step % self.snapshot_every == 0:
                    self._take_snapshot()
            self._take_snapshot()
            if not self._terminate.is_set():
                self.status = TrainingStatus.TRAINING_DONE
                self.progress = 1.0
        except Exception as exc:
            self.error = f"{exc}\n{traceback.format_exc()}"
            self.status = TrainingStatus.LOADING_FAILED

    # ---- live snapshots (getGaussian*Cpu) ----

    def _take_snapshot(self) -> None:
        p = self._trainer.state.params
        snap = {
            "means": np.asarray(p.means),
            "scales": np.asarray(p.scales),
            "quats": np.asarray(p.quats),
            "opacity": np.asarray(p.opacity),
            "sh0": np.asarray(p.sh0),
            "shN": np.asarray(p.shN),
            "alive": np.asarray(p.alive),
        }
        with self._snapshot_lock:
            self._snapshot = snap
            self.snapshot_generation += 1

    def _get(self, key: str) -> np.ndarray:
        with self._snapshot_lock:
            if self._snapshot is None:
                return np.zeros((0,))
            alive = self._snapshot["alive"]
            return self._snapshot[key][alive]

    def get_gaussian_positions(self) -> np.ndarray:
        return self._get("means")

    def get_gaussian_sh0(self) -> np.ndarray:
        return self._get("sh0")

    def get_gaussian_shn(self) -> np.ndarray:
        return self._get("shN")

    def get_gaussian_opacities(self) -> np.ndarray:
        return self._get("opacity")

    def get_gaussian_scalings(self) -> np.ndarray:
        return self._get("scales")

    def get_gaussian_rotations(self) -> np.ndarray:
        return self._get("quats")

    def get_params_snapshot(self):
        """Full alive-only GaussianParams (host)."""
        from divshot_tpu.splat.gaussians import GaussianParams
        with self._snapshot_lock:
            if self._snapshot is None:
                return None
            s = dict(self._snapshot)
        alive = s.pop("alive")
        means = s.pop("means")[alive]
        degree = {0: 0, 3: 1, 8: 2, 15: 3}[s["shN"].shape[1]]
        return GaussianParams.create(
            means, sh_degree=degree,
            **{k: v[alive] for k, v in s.items()})

    # ---- cameras / SfM progress ----

    @property
    def num_cameras(self) -> int:
        return 0 if self._dataset is None else self._dataset.num_views

    def get_camera(self, i: int):
        import jax
        cam = jax.tree.map(lambda x: x[i], self._dataset.cameras)
        return cam.replace(width=self._dataset.cameras.width,
                           height=self._dataset.cameras.height)

    def get_points3d(self) -> tuple[np.ndarray, np.ndarray]:
        """SfM sparse cloud for live point-cloud display during loading."""
        if self._sfm_points is None:
            return np.zeros((0, 3)), np.zeros((0, 3))
        return self._sfm_points, (
            self._sfm_colors if self._sfm_colors is not None
            else np.full_like(self._sfm_points, 0.5))

    # ---- persistence (saveGaussianModel / exportMesh) ----

    def save_model(self, path: str) -> None:
        from divshot_tpu.gsio.io import save_model
        params = self.get_params_snapshot()
        save_model(path, params,
                   antialiased=self.cfg.raster.mip_antialiased)

    def export_mesh(self, path: str) -> None:
        from divshot_tpu.viewer.mesh import extract_mesh
        params = self.get_params_snapshot()
        cams = [self.get_camera(i)
                for i in range(min(self.num_cameras, 32))]
        extract_mesh(params, cams, resolution=self.cfg.mesh_resolution,
                     out_path=path, render_kw=self.render_kwargs)

    def export_sparse_point_cloud(self, path: str) -> None:
        pts, cols = self.get_points3d()
        from divshot_tpu.gsio.ply import save_point_cloud_ply
        save_point_cloud_ply(path, pts, cols)
