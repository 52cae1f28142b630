"""Headless splat editing — the reference editor's edit semantics
(``application/editor``: GaussianEdit tools ``gaussian_edit.cpp:313-515``,
selection kernel ``gsplat_intersect.hlsl``, state bitfield
``assets/gaussian_model.h:9-39``, edit-op hierarchy ``splat_edit_op.h``,
undo/redo ``redo_undo_system``) rebuilt as a Python API over array ops.

State bitfield per splat (u32): op_state(8b: 1=SELECT 2=HIDE 4=DELETE
8=PAINT) | op_flag(8b) | transform_index(16b).

Selection modes Box/Sphere/Rect/Brush/Polygon/Lasso/Picker operate either
in world space or on screen-projected centers (the reference tests
projected splats); ops SET/ADD/REMOVE match ``gsplat_intersect.hlsl:7-25``.
Undo/redo is an op log of sparse reverse records.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from divshot_tpu.splat.gaussians import GaussianParams
from divshot_tpu.splat.camera import Camera
from divshot_tpu.splat.math import quat_to_rotmat, rotmat_to_quat, quat_multiply
from divshot_tpu.splat.sh import rotate_sh

STATE_SELECT = 0x1
STATE_HIDE = 0x2
STATE_DELETE = 0x4
STATE_PAINT = 0x8

OP_SET = 0
OP_ADD = 1
OP_REMOVE = 2


def _project_centers(params: GaussianParams, camera: Camera) -> jnp.ndarray:
    """(C, 3): screen x, y, view z of splat centers."""
    R = camera.viewmat[:3, :3]
    t = camera.viewmat[:3, 3]
    from divshot_tpu.splat.math import matvec3
    p = matvec3(R, params.means) + t
    z = jnp.maximum(p[:, 2], 1e-6)
    u = camera.fx * p[:, 0] / z + camera.cx
    v = camera.fy * p[:, 1] / z + camera.cy
    return jnp.stack([u, v, p[:, 2]], -1)


def _apply_mode(sel: jnp.ndarray, hit: jnp.ndarray, mode: int) -> jnp.ndarray:
    if mode == OP_SET:
        return hit
    if mode == OP_ADD:
        return sel | hit
    return sel & ~hit


@dataclass
class _UndoRecord:
    description: str
    restore: Callable[["EditSession"], None]


@dataclass
class EditSession:
    """Mutable editing session over a splat model (host-driven; each op is
    one device computation)."""

    params: GaussianParams
    state: jnp.ndarray = None        # (C,) uint32
    history: list = field(default_factory=list)
    redo_stack: list = field(default_factory=list)
    max_history: int = 64

    def __post_init__(self):
        if self.state is None:
            self.state = jnp.zeros((self.params.capacity,), jnp.uint32)

    # -- bitfield helpers --
    @property
    def selected(self) -> jnp.ndarray:
        return (self.state & STATE_SELECT) != 0

    @property
    def hidden(self) -> jnp.ndarray:
        return (self.state & STATE_HIDE) != 0

    @property
    def deleted(self) -> jnp.ndarray:
        return (self.state & STATE_DELETE) != 0

    def visible_params(self) -> GaussianParams:
        """Params with hidden/deleted splats masked out (for rendering)."""
        dead = self.hidden | self.deleted
        return self.params.replace(alive=self.params.alive & ~dead)

    def _push_undo(self, desc: str, restore: Callable) -> None:
        self.history.append(_UndoRecord(desc, restore))
        if len(self.history) > self.max_history:
            self.history.pop(0)
        self.redo_stack.clear()

    def _set_state(self, new_state: jnp.ndarray, desc: str) -> None:
        old = self.state

        def restore(s: "EditSession", old=old):
            s.state = old
        self._push_undo(desc, restore)
        self.state = new_state

    def _set_selected_bit(self, sel: jnp.ndarray, desc: str) -> None:
        ns = jnp.where(sel, self.state | STATE_SELECT,
                       self.state & ~jnp.uint32(STATE_SELECT))
        self._set_state(ns, desc)

    # -- selection tools (gaussian_edit.h:38-52 modes) --
    def select_all(self) -> None:
        self._set_selected_bit(self.params.alive, "select all")

    def select_none(self) -> None:
        self._set_selected_bit(jnp.zeros_like(self.selected), "select none")

    def select_inverse(self) -> None:
        self._set_selected_bit(~self.selected & self.params.alive,
                               "select inverse")

    def select_box(self, lo, hi, mode: int = OP_SET,
                   transform: np.ndarray | None = None) -> None:
        """World-space axis box, optionally in a transformed frame."""
        p = self.params.means
        if transform is not None:
            inv = jnp.asarray(np.linalg.inv(np.asarray(transform)))
            p = p @ inv[:3, :3].T + inv[:3, 3]
        hit = jnp.all((p >= jnp.asarray(lo)) & (p <= jnp.asarray(hi)), -1)
        hit = hit & self.params.alive
        self._set_selected_bit(_apply_mode(self.selected, hit, mode),
                               "select box")

    def select_sphere(self, center, radius: float, mode: int = OP_SET) -> None:
        d = jnp.linalg.norm(self.params.means - jnp.asarray(center), axis=-1)
        hit = (d <= radius) & self.params.alive
        self._set_selected_bit(_apply_mode(self.selected, hit, mode),
                               "select sphere")

    def select_rect(self, camera: Camera, x0, y0, x1, y1,
                    mode: int = OP_SET) -> None:
        s = _project_centers(self.params, camera)
        hit = ((s[:, 0] >= min(x0, x1)) & (s[:, 0] <= max(x0, x1))
               & (s[:, 1] >= min(y0, y1)) & (s[:, 1] <= max(y0, y1))
               & (s[:, 2] > 0) & self.params.alive)
        self._set_selected_bit(_apply_mode(self.selected, hit, mode),
                               "select rect")

    def select_brush(self, camera: Camera, stroke_xy: np.ndarray,
                     radius_px: float, mode: int = OP_SET) -> None:
        """Circle-brush along a screen-space stroke polyline."""
        s = _project_centers(self.params, camera)
        pts = jnp.asarray(stroke_xy, jnp.float32)       # (S, 2)
        d = jnp.linalg.norm(s[:, None, :2] - pts[None, :, :], axis=-1)
        hit = (jnp.min(d, axis=1) <= radius_px) & (s[:, 2] > 0) \
            & self.params.alive
        self._set_selected_bit(_apply_mode(self.selected, hit, mode),
                               "select brush")

    def select_polygon(self, camera: Camera, poly_xy: np.ndarray,
                       mode: int = OP_SET) -> None:
        """Point-in-polygon (lasso/polygon tools) on projected centers."""
        s = _project_centers(self.params, camera)
        poly = jnp.asarray(poly_xy, jnp.float32)        # (P, 2)
        x, y = s[:, 0], s[:, 1]
        x0, y0 = poly[:, 0], poly[:, 1]
        x1 = jnp.roll(x0, -1)
        y1 = jnp.roll(y0, -1)
        cond = ((y0[None] > y[:, None]) != (y1[None] > y[:, None]))
        xin = (x1 - x0)[None] * (y[:, None] - y0[None]) \
            / jnp.where(y1 - y0 == 0, 1e-9, y1 - y0)[None] + x0[None]
        crossings = jnp.sum(cond & (x[:, None] < xin), axis=1)
        hit = (crossings % 2 == 1) & (s[:, 2] > 0) & self.params.alive
        self._set_selected_bit(_apply_mode(self.selected, hit, mode),
                               "select polygon")

    def pick(self, camera: Camera, x: float, y: float,
             max_px: float = 12.0) -> int:
        """Picker: nearest projected center within max_px; -1 if none."""
        s = _project_centers(self.params, camera)
        d = jnp.linalg.norm(s[:, :2] - jnp.asarray([x, y]), axis=-1)
        d = jnp.where((s[:, 2] > 0) & self.params.alive, d, jnp.inf)
        i = int(jnp.argmin(d))
        return i if float(d[i]) <= max_px else -1

    # -- state ops (splat_edit_op.h hierarchy) --
    def hide_selected(self) -> None:
        ns = jnp.where(self.selected, self.state | STATE_HIDE, self.state)
        self._set_state(ns, "hide")

    def unhide_all(self) -> None:
        self._set_state(self.state & ~jnp.uint32(STATE_HIDE), "unhide all")

    def delete_selected(self) -> None:
        ns = jnp.where(self.selected, self.state | STATE_DELETE, self.state)
        self._set_state(ns, "delete")

    def reset_states(self) -> None:
        self._set_state(jnp.zeros_like(self.state), "reset states")

    def paint_selected(self, color) -> None:
        """Assign a flat color to selected splats (sets DC SH, zeroes rest,
        marks PAINT bit) — splat painting semantics."""
        sel = self.selected
        old_sh0, old_shN, old_state = self.params.sh0, self.params.shN, self.state

        def restore(s, a=old_sh0, b=old_shN, c=old_state):
            s.params = s.params.replace(sh0=a, shN=b)
            s.state = c
        self._push_undo("paint", restore)
        sh0_new = (jnp.asarray(color, jnp.float32) - 0.5) / 0.28209479177387814
        self.params = self.params.replace(
            sh0=jnp.where(sel[:, None], sh0_new[None, :], self.params.sh0),
            shN=jnp.where(sel[:, None, None], 0.0, self.params.shN))
        self.state = jnp.where(sel, self.state | STATE_PAINT, self.state)

    # -- transforms (SplatTransformPalette + bake with SH rotation) --
    def transform_selected(self, matrix: np.ndarray) -> None:
        """Apply a rigid(+scale) 4x4 transform to the selected splats,
        baking rotation into quats and SH (gaussian_model.cpp:407)."""
        m = np.asarray(matrix, np.float64)
        A = m[:3, :3]
        # polar decomposition: rotation + scale
        u, sv, vt = np.linalg.svd(A)
        Rm = u @ vt
        if np.linalg.det(Rm) < 0:
            u[:, -1] *= -1
            Rm = u @ vt
        scale_factor = float(np.cbrt(max(np.linalg.det(A), 1e-12)))

        sel = self.selected
        old = (self.params.means, self.params.quats, self.params.scales,
               self.params.shN)

        def restore(s, o=old):
            s.params = s.params.replace(
                means=o[0], quats=o[1], scales=o[2], shN=o[3])
        self._push_undo("transform", restore)

        p = self.params
        from divshot_tpu.splat.math import matvec3 as _mv3
        new_means = _mv3(jnp.asarray(m[:3, :3], jnp.float32), p.means) \
            + jnp.asarray(m[:3, 3], jnp.float32)
        rq = jnp.asarray(
            np.tile(_rotmat_to_quat_np(Rm), (p.capacity, 1)), jnp.float32)
        new_quats = quat_multiply(rq, p.quats)
        new_scales = p.scales + np.log(max(scale_factor, 1e-12))
        new_shN = rotate_sh(p.shN, Rm)
        self.params = p.replace(
            means=jnp.where(sel[:, None], new_means, p.means),
            quats=jnp.where(sel[:, None], new_quats, p.quats),
            scales=jnp.where(sel[:, None], new_scales, p.scales),
            shN=jnp.where(sel[:, None, None], new_shN, p.shN))

    # -- crop volumes (gaussian_crop.h: <=8 box/sphere per entity) --
    def apply_crop(self, volumes: list[dict]) -> None:
        """volumes: [{type: 'box'|'sphere', 'lo'/'hi' or 'center'/'radius',
        'op': 'keep'|'remove'}]; marks splats outside kept volumes /
        inside removed volumes as HIDE (gsplat_crop.hlsl semantics)."""
        p = self.params.means
        keep_any = None
        remove = jnp.zeros((self.params.capacity,), bool)
        for v in volumes[:8]:
            if v["type"] == "box":
                hit = jnp.all((p >= jnp.asarray(v["lo"]))
                              & (p <= jnp.asarray(v["hi"])), -1)
            else:
                hit = jnp.linalg.norm(
                    p - jnp.asarray(v["center"]), axis=-1) <= v["radius"]
            if v.get("op", "keep") == "keep":
                keep_any = hit if keep_any is None else (keep_any | hit)
            else:
                remove = remove | hit
        out = remove
        if keep_any is not None:
            out = out | ~keep_any
        ns = jnp.where(out & self.params.alive, self.state | STATE_HIDE,
                       self.state)
        self._set_state(ns, "crop")

    # -- structure ops --
    def compact(self) -> None:
        """Physically remove deleted splats (merge of remove op)."""
        old_params, old_state = self.params, self.state

        def restore(s, a=old_params, b=old_state):
            s.params = a
            s.state = b
        self._push_undo("compact", restore)
        dead = self.deleted
        self.params = self.params.replace(alive=self.params.alive & ~dead)
        self.state = jnp.where(dead, jnp.uint32(0), self.state)

    def merge(self, other: GaussianParams) -> None:
        """Append another model's alive splats, growing capacity if the
        free slots don't suffice (GaussianModel::merge parity)."""
        old_params, old_state = self.params, self.state

        def restore(s, a=old_params, b=old_state):
            s.params = a
            s.state = b
        self._push_undo("merge", restore)
        d = other.compact_numpy()
        n_new = d["means"].shape[0]
        free = np.nonzero(~np.asarray(self.params.alive))[0]
        if len(free) < n_new:
            grow = n_new - len(free)
            p = self.params
            cap = p.capacity

            def pad(x, fill=0.0):
                w = [(0, grow)] + [(0, 0)] * (x.ndim - 1)
                return jnp.pad(x, w, constant_values=fill)

            quats = pad(p.quats).at[cap:, 0].set(1.0)
            self.params = p.replace(
                means=pad(p.means),
                scales=pad(p.scales, float(np.log(0.01))),
                quats=quats, opacity=pad(p.opacity, -15.0),
                sh0=pad(p.sh0), shN=pad(p.shN),
                alive=pad(p.alive, False))
            self.state = jnp.pad(self.state, (0, grow))
            free = np.nonzero(~np.asarray(self.params.alive))[0]
        k = min(n_new, len(free))
        idx = jnp.asarray(free[:k])
        p = self.params
        upd = {}
        for f in ("means", "scales", "quats", "opacity", "sh0"):
            upd[f] = getattr(p, f).at[idx].set(jnp.asarray(d[f][:k]))
        shN_new = d["shN"][:k]
        kcoef = min(shN_new.shape[1], p.shN.shape[1])
        shN = p.shN.at[idx, :kcoef].set(jnp.asarray(shN_new[:, :kcoef]))
        self.params = p.replace(
            **upd, shN=shN, alive=p.alive.at[idx].set(True))

    # -- undo/redo --
    def undo(self) -> bool:
        if not self.history:
            return False
        rec = self.history.pop()
        cur_params, cur_state = self.params, self.state
        rec.restore(self)

        def redo_restore(s, a=cur_params, b=cur_state):
            s.params = a
            s.state = b
        self.redo_stack.append(_UndoRecord(rec.description, redo_restore))
        return True

    def redo(self) -> bool:
        if not self.redo_stack:
            return False
        rec = self.redo_stack.pop()
        cur_params, cur_state = self.params, self.state
        rec.restore(self)

        def undo_restore(s, a=cur_params, b=cur_state):
            s.params = a
            s.state = b
        self.history.append(_UndoRecord(rec.description, undo_restore))
        return True


def _rotmat_to_quat_np(R: np.ndarray) -> np.ndarray:
    return np.asarray(rotmat_to_quat(jnp.asarray(R, jnp.float32)))


# -- deferred transforms (SplatTransformPalette) --------------------------
# splat_transform_palette.h:13-39 — a u16-indexed palette of transforms so
# the editor can move splat groups without rewriting the model each frame.


def _session_palette(session: EditSession):
    if not hasattr(session, "_palette") or session._palette is None:
        from divshot_tpu.splat.transform_palette import SplatTransformPalette
        session._palette = SplatTransformPalette(session.params.capacity)
    return session._palette


def palette_transform_selected(session: EditSession,
                               matrix: np.ndarray) -> int:
    """Assign the selected splats a DEFERRED palette transform (they render
    through it; the model stays unbaked). -> palette slot."""
    pal = _session_palette(session)
    slot = pal.add(matrix)
    pal.assign(session.selected, slot)
    return slot


def _session_paint_palette(session: EditSession):
    if not hasattr(session, "_paint_palette") \
            or session._paint_palette is None:
        from divshot_tpu.splat.color_palette import SplatPaintColorPalette
        session._paint_palette = SplatPaintColorPalette(
            session.params.capacity)
    return session._paint_palette


def palette_paint_selected(session: EditSession, color) -> int:
    """Deferred splat painting via the indexed color palette
    (``splat_color_palette.h:13-39``): selected splats render with the
    palette color; the model's SH stays unbaked. -> palette slot."""
    pal = _session_paint_palette(session)
    slot = pal.add(color)
    old = pal.indices

    def restore(s, o=old):
        _session_paint_palette(s).indices = o
    session._push_undo("palette paint", restore)
    pal.assign(session.selected, slot)
    return slot


def bake_paint_palette(session: EditSession) -> None:
    """Flatten the paint palette into sh0/shN (undoable)."""
    pal = getattr(session, "_paint_palette", None)
    if pal is None or pal.num_entries == 1:
        return
    old = session.params
    old_idx = pal.indices

    def restore(s, o=old, oi=old_idx):
        s.params = o
        _session_paint_palette(s).indices = oi
    session._push_undo("bake paint", restore)
    session.params = pal.bake(old)


def effective_params(session: EditSession):
    """Render-time view of the session params: palette transforms + paint
    palette applied on the fly (identity-cost when both are empty)."""
    p = session.params
    pal = getattr(session, "_palette", None)
    if pal is not None and pal.num_entries > 1:
        p = pal.apply(p)
    ppal = getattr(session, "_paint_palette", None)
    if ppal is not None and ppal.num_entries > 1:
        p = ppal.apply(p)
    return p


def bake_palette(session: EditSession) -> None:
    """Flatten the palette into the model (undoable)."""
    pal = getattr(session, "_palette", None)
    if pal is None or pal.num_entries == 1:
        return
    old = session.params
    old_pal = (list(pal.matrices), pal.indices)

    def restore(s, o=old, op=old_pal):
        s.params = o
        p = _session_palette(s)
        p.matrices, p.indices = list(op[0]), op[1]
    session._push_undo("bake palette", restore)
    session.params = pal.bake(old)
