"""Splat paint-color palette — the reference's ``SplatPaintColorPalette``
(``assets/splat_color_palette.h:13-39``): painting assigns splats a 16-bit
palette INDEX instead of rewriting their SH data, so the editor can recolor
groups interactively and bake once. Index 0 = unpainted.

Mirrors ``transform_palette.py``: host-side color table + device-side
per-splat indices; ``apply`` gives the render-time view, ``bake`` flattens
into sh0/shN (DC set to the palette color, higher bands zeroed — the same
semantics as direct splat painting).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from divshot_tpu.splat.gaussians import GaussianParams

MAX_ENTRIES = 1 << 16
SH_C0 = 0.28209479177387814


class SplatPaintColorPalette:
    """Host-side palette + device-side per-splat color indices."""

    def __init__(self, capacity: int):
        self.capacity = capacity
        self.colors: list[np.ndarray] = [np.zeros(3, np.float32)]  # 0=none
        self.indices = jnp.zeros((capacity,), jnp.int32)

    @property
    def num_entries(self) -> int:
        return len(self.colors)

    def add(self, color) -> int:
        """-> palette slot for ``color`` (new or existing identical)."""
        c = np.asarray(color, np.float32).reshape(3)
        for i, e in enumerate(self.colors[1:], start=1):
            if np.array_equal(e, c):
                return i
        if len(self.colors) >= MAX_ENTRIES:
            raise ValueError("paint palette full (65536 entries)")
        self.colors.append(c)
        return len(self.colors) - 1

    def assign(self, mask: jnp.ndarray, slot: int) -> None:
        self.indices = jnp.where(mask, jnp.int32(slot), self.indices)

    def clear(self, mask: jnp.ndarray) -> None:
        self.indices = jnp.where(mask, 0, self.indices)

    def _table(self) -> jnp.ndarray:
        return jnp.asarray(np.stack(self.colors, axis=0))      # (K, 3)

    def apply(self, params: GaussianParams) -> GaussianParams:
        """Render-time view: painted splats show their palette color."""
        painted = self.indices > 0
        col = jnp.take(self._table(), self.indices, axis=0)     # (C, 3)
        sh0_new = (col - 0.5) / SH_C0                           # (C, 3)
        return params.replace(
            sh0=jnp.where(painted[:, None], sh0_new, params.sh0),
            shN=jnp.where(painted[:, None, None], 0.0, params.shN))

    def bake(self, params: GaussianParams) -> GaussianParams:
        """Flatten the palette into sh0/shN and reset all indices."""
        out = self.apply(params)
        self.indices = jnp.zeros_like(self.indices)
        self.colors = [np.zeros(3, np.float32)]
        return out
