"""Streaming host-side data pipeline for datasets too large for HBM.

The reference's capacity claim is 2,000 x 2K images on a 16 GB GPU
(``docs/userGuide.md:11``) — which only works because images stream from
host RAM. Device-resident ``Dataset`` keeps everything in HBM (fast, fine
up to a few hundred views); this module adds the host-resident variant:

- images stay in host memory as uint8 (optionally decoded lazily from
  disk with an LRU of decoded frames);
- a background prefetch thread pushes the next step's view to the device
  (``jax.device_put`` is async) one step ahead of the training loop, so
  the host->device copy overlaps the previous step's compute — the TPU
  analog of the reference's thread-pooled upload path
  (``gaussian_model.cpp:129,217``).
"""

from __future__ import annotations

import queue
import threading
from collections import OrderedDict
from dataclasses import dataclass, field
from typing import Any, Callable

import jax
import numpy as np


@dataclass
class HostImageStore:
    """Uint8 images on host; either materialized (V, H, W, 3) or decoded
    on demand from paths with a small LRU cache."""
    images: np.ndarray | None = None        # (V, H, W, 3) u8
    paths: list[str] | None = None
    decode: Callable[[str], np.ndarray] | None = None
    cache_size: int = 64
    _cache: OrderedDict = field(default_factory=OrderedDict)
    _lock: threading.Lock = field(default_factory=threading.Lock)

    @property
    def num_views(self) -> int:
        return len(self.paths) if self.paths is not None \
            else self.images.shape[0]

    def get(self, i: int) -> np.ndarray:
        if self.images is not None:
            return self.images[i]
        with self._lock:
            if i in self._cache:
                self._cache.move_to_end(i)
                return self._cache[i]
        img = self.decode(self.paths[i])
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        with self._lock:
            self._cache[i] = img
            if len(self._cache) > self.cache_size:
                self._cache.popitem(last=False)
        return img


class Prefetcher:
    """Background thread that keeps ``depth`` upcoming views resident on
    device. ``schedule(view)`` enqueues; ``get()`` returns
    (view, device_image) in schedule order."""

    def __init__(self, store: HostImageStore, depth: int = 2,
                 masks: np.ndarray | None = None):
        self.store = store
        self.masks = masks
        self._in: "queue.Queue[int | None]" = queue.Queue()
        self._out: "queue.Queue[tuple]" = queue.Queue(maxsize=depth)
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def _run(self) -> None:
        while True:
            view = self._in.get()
            if view is None:
                return
            img = jax.device_put(self.store.get(view))
            mask = None
            if self.masks is not None:
                mask = jax.device_put(self.masks[view])
            self._out.put((view, img, mask))

    def schedule(self, view: int) -> None:
        self._in.put(view)

    def get(self) -> tuple:
        return self._out.get()

    def close(self) -> None:
        self._in.put(None)


class StreamingLoop:
    """Drives a streamed training loop: the caller's step function takes
    (state, camera_idx, gt_u8 [, mask]) with gt passed per step instead of
    living in HBM."""

    def __init__(self, store: HostImageStore, rng: np.random.Generator,
                 masks: np.ndarray | None = None, depth: int = 2):
        self.store = store
        self.rng = rng
        self.prefetch = Prefetcher(store, depth=depth, masks=masks)
        self.depth = depth
        self._scheduled = 0

    def views(self, n_steps: int):
        """Yield (view, device_image, device_mask) for n_steps random
        views, keeping ``depth`` transfers in flight."""
        order = [int(self.rng.integers(self.store.num_views))
                 for _ in range(n_steps)]
        k = min(self.depth, n_steps)
        for v in order[:k]:
            self.prefetch.schedule(v)
        for i in range(n_steps):
            if i + k < n_steps:
                self.prefetch.schedule(order[i + k])
            yield self.prefetch.get()

    def close(self) -> None:
        self.prefetch.close()
