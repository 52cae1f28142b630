"""Tile-based differentiable rasterizer (XLA implementation).

The TPU-native analog of the reference trainer's tile rasterizer (evidence of
tile structure: ``gaussian_common.hlsl`` GaussianAuxi.min_tile/max_tile +
GROUP_WIDTH/HEIGHT=16; sort design ``gpu_sort.cpp:16-25``):

  1. tile binning — every projected gaussian expands to one *instance* per
     covered 16x16 tile (prefix-sum offsets into a static-capacity instance
     buffer, matching the reference's capacity-padded buffer philosophy);
  2. a (tileID, depth) two-key ``lax.sort`` replaces the CUDA radix sort —
     XLA lowers this to an efficient on-device sort, no atomics;
  3. instances are scattered into a dense (num_tiles, K) id matrix ordered
     front-to-back, so rasterization is a fully static-shape scan;
  4. compositing runs as a ``lax.scan`` over K-chunks with the exact
     early-stop semantics of diff-gaussian-rasterization (stop before the
     gaussian that would drop transmittance below 1e-4);
  5. the backward is the classic reverse-traversal recompute: forward saves
     only final transmittance + per-pixel contributor count, backward walks
     chunks back-to-front reconstructing per-gaussian transmittance by
     division — atomics-free: per-(tile,slot) grads are segment-summed to
     gaussians with one scatter-add.

Everything is static-shape and jit/vmap/shard_map friendly. The Pallas kernel
version (``pallas_raster.py``) mirrors stages 4-5 with manual VMEM pipelines.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.999
T_EPS = 1e-4


def pltpu_bitcast_u32(x: jax.Array) -> jax.Array:
    """f32 -> monotone-sortable u32 for non-negative floats (+inf maps to
    the maximum pattern class, keeping padded entries last)."""
    return jax.lax.bitcast_convert_type(x, jnp.uint32)


class TileBins(NamedTuple):
    ids_mat: jax.Array | None  # (num_tiles, K) int32 gaussian ids, -1 = empty,
                               # front-to-back within each tile row
    num_instances: jax.Array   # () int32 — diagnostics (pre-cap instance count)
    tile_counts: jax.Array     # (num_tiles,) int32 instances per tile
    inst_gauss: jax.Array      # (I,) int32 sorted instance gaussian ids (-1 pad)
    tile_start: jax.Array      # (num_tiles+1,) int32 instance ranges per tile
    inst_tile: jax.Array       # (I,) int32 sorted tile id per instance
    exp2sorted: jax.Array      # (I,) int32: expansion slot -> sorted position
    g_offsets: jax.Array       # (N,) int32 exclusive offsets in expansion order
    g_counts: jax.Array        # (N,) int32 emitted instances per gaussian


def _tile_grid(width: int, height: int, tile_size: int) -> tuple[int, int]:
    tw = (width + tile_size - 1) // tile_size
    th = (height + tile_size - 1) // tile_size
    return tw, th


def bin_gaussians(
    means2d: jax.Array,     # (N, 2)
    depths: jax.Array,      # (N,)
    radii: jax.Array,       # (N,) 0 = culled
    width: int,
    height: int,
    *,
    tile_size: int = 16,
    tile_capacity: int = 1024,        # K: max instances rasterized per tile
    instance_capacity: int = 1 << 20,
    max_tiles_per_gaussian: int = 64,
    build_ids_mat: bool = True,
    guard_lanes: int = 2048,
    radii_xy: jax.Array | None = None,  # (N, 2) per-axis AABB half-extents
    rad2: jax.Array | None = None,      # (N,) squared circum-radius of the
                                        # alpha >= 1/255 ellipse: enables the
                                        # per-(instance, tile) corner cull
) -> TileBins:
    """Expand gaussians into depth-sorted per-tile instance lists.

    TPU-native analog of the reference's expand + radix-sort binning
    (``gpu_sort.cpp:16-25``; tile structs ``gaussian_common.hlsl``): the
    expansion is scatter-free — per-gaussian geometry is broadcast to its
    instance slots with one boundary scatter (N elements), a cummax and a
    segment-start gather, then a single-key ``lax.sort`` on packed
    (tileID | depth-bits)
    keys orders instances front-to-back per tile."""
    n = means2d.shape[0]
    tw, th = _tile_grid(width, height, tile_size)
    num_tiles = tw * th
    assert num_tiles < (1 << 19), "tile grid too large for packed keys"
    mt = max_tiles_per_gaussian
    cap = instance_capacity

    visible = radii > 0
    u, v = means2d[:, 0], means2d[:, 1]
    # per-axis AABB: the ellipse's axis extents are far tighter than the
    # circum-radius square for anisotropic splats. Image-preserving up to
    # the 3-sigma cap convention (see project.py radius note): the
    # compositor culls alpha < 1/255, and the capped tail matches the CUDA
    # reference's own truncation.
    rx = radii_xy[:, 0] if radii_xy is not None else radii
    ry = radii_xy[:, 1] if radii_xy is not None else radii
    tmin_x = jnp.clip(jnp.floor((u - rx) / tile_size), 0, tw).astype(jnp.int32)
    tmax_x = jnp.clip(jnp.ceil((u + rx) / tile_size), 0, tw).astype(jnp.int32)
    tmin_y = jnp.clip(jnp.floor((v - ry) / tile_size), 0, th).astype(jnp.int32)
    tmax_y = jnp.clip(jnp.ceil((v + ry) / tile_size), 0, th).astype(jnp.int32)
    nx = tmax_x - tmin_x
    ny = tmax_y - tmin_y
    counts = jnp.minimum(jnp.where(visible, nx * ny, 0), mt)
    offsets = jnp.cumsum(counts) - counts                  # exclusive
    # TRUE demanded instance count — may exceed ``cap``; callers compare it
    # against instance_capacity to surface silent-drop overflow
    total = offsets[-1] + counts[-1]

    tile_bits = max(1, (num_tiles + 1).bit_length())
    depth_bits = 32 - tile_bits
    # chB packs the high depth bits with the per-gaussian instance count in
    # the low bits; the count field must hold mt, the key's depth field is
    # (32 - tile_bits) wide — decoupled so small tile grids keep fine depth
    lo_bits = max(tile_bits, mt.bit_length())

    # --- scatter-free expansion ---------------------------------------
    # One boundary scatter (N elements, distinct offsets since every valid
    # gaussian consumes >= 1 slot) marks each gaussian's first instance
    # slot; cummax gives the segment start, and per-gaussian geometry +
    # identity ride to instances through a segment-start gather.
    iota = jnp.arange(cap, dtype=jnp.int32)
    goff = jnp.where(counts > 0, offsets, cap)             # drop empty/overflow

    dbits = pltpu_bitcast_u32(jnp.where(depths > 0, depths, jnp.inf))
    tmin_lin = (tmin_y * tw + tmin_x).astype(jnp.uint32)
    nx_safe = jnp.maximum(nx, 1).astype(jnp.uint32)
    chA_g = (tmin_lin << 13) | nx_safe                     # nx >= 1 => != 0
    chB_g = ((dbits >> lo_bits) << lo_bits) | counts.astype(jnp.uint32)
    gid_g = jnp.arange(n, dtype=jnp.int32)

    # one fused row scatter for all three channels (row scatters cost the
    # same as scalar scatters on TPU; separate ones would triple it);
    # chA_g is never 0, so the scatter doubles as the boundary flag
    rows = jnp.stack([chA_g, chB_g,
                      gid_g.astype(jnp.uint32) + jnp.uint32(1)], axis=1)
    M = jnp.zeros((cap, 3), jnp.uint32).at[goff].set(rows, mode="drop")
    flag = M[:, 0] != 0
    start = jax.lax.cummax(jnp.where(flag, iota, 0))
    j = iota - start                                       # rank within gaussian
    # hold-last = gather at the segment start (start IS the latest flagged
    # index; M[0] handles the no-prior-flag prefix: zeros -> owner -1).
    # An associative_scan formulation compiles catastrophically on the TPU
    # backend (~70 s at 2^20 instances, ~20 min at 2^22 — measured); the
    # gather compiles in ~1 s and runs at HBM bandwidth.
    held = jnp.take(M, start, axis=0)                      # (cap, 3)
    chA, chB, own1 = held[:, 0], held[:, 1], held[:, 2]
    owner = own1.astype(jnp.int32) - 1            # 0 sentinel -> -1

    nx_i = (chA & jnp.uint32(0x1FFF)).astype(jnp.int32)
    tmin_i = (chA >> 13).astype(jnp.int32)
    cnt_i = (chB & jnp.uint32((1 << lo_bits) - 1)).astype(jnp.int32)
    # j < mt <= 256 and nx < 2^13, so f32 division is exact here
    jy = jnp.floor(j.astype(jnp.float32) /
                   jnp.maximum(nx_i, 1).astype(jnp.float32)).astype(jnp.int32)
    jx = j - jy * nx_i
    tile = tmin_i + jy * tw + jx

    real = (owner >= 0) & (j < cnt_i)
    if rad2 is not None:
        # corner cull: drop (instance, tile) pairs whose closest rect point
        # is outside the alpha >= 1/255 circum-radius. Exact lower bound
        # 0.5*d^T conic d >= 0.5*dist^2/lambda1, so a culled pair can never
        # contribute alpha >= 1/255 — image identical, instances fewer.
        packed = jnp.stack([u, v, rad2], axis=1)            # (N, 3)
        gi = jnp.take(packed, jnp.clip(owner, 0, n - 1), axis=0)
        ttx = (tile % tw).astype(jnp.float32) * tile_size
        tty = (tile // tw).astype(jnp.float32) * tile_size
        dx = jnp.maximum(jnp.maximum(ttx - gi[:, 0],
                                     gi[:, 0] - (ttx + tile_size)), 0.0)
        dy = jnp.maximum(jnp.maximum(tty - gi[:, 1],
                                     gi[:, 1] - (tty + tile_size)), 0.0)
        real = real & (dx * dx + dy * dy <= gi[:, 2])
    key = jnp.where(
        real,
        (tile.astype(jnp.uint32) << depth_bits)
        | ((chB >> lo_bits) << (lo_bits - tile_bits)),
        jnp.uint32(0xFFFFFFFF))

    s_key, s_gauss, s_exp = jax.lax.sort(
        (key, jnp.where(real, owner, -1), iota), num_keys=1)
    s_tile = jnp.minimum((s_key >> depth_bits).astype(jnp.int32), num_tiles)

    # expansion slot -> sorted position (permutation inverse; lets the
    # backward segment-reduce per-gaussian over contiguous ranges).
    # Inverting via a second sort is ~2x cheaper than a 1M random scatter.
    _, exp2sorted = jax.lax.sort((s_exp, iota), num_keys=1)

    # --- per-tile ranges (tile_start[T] == total real instances) ---
    # The trailing ``guard_lanes`` of the capacity are a guard band: the
    # Pallas kernels DMA G-block mega-chunks, so a tile range must never
    # start closer than one mega-chunk to the end of the table. In the
    # overflow regime (demand ~ capacity, already lossy + warned) this
    # drops at most guard_lanes extra instances.
    tile_bounds = jnp.searchsorted(
        s_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32)).astype(jnp.int32)
    if not build_ids_mat:
        # only the Pallas path needs the mega-DMA guard; the XLA 'tiles'
        # backend reads through ids_mat and keeps the full range
        tile_bounds = jnp.minimum(tile_bounds,
                                  max(cap - guard_lanes, cap // 2))
    tile_start = tile_bounds[:num_tiles]
    tile_counts = tile_bounds[1:] - tile_start

    ids_mat = None
    if build_ids_mat:
        rank = iota - tile_start[jnp.minimum(s_tile, num_tiles - 1)]
        ok = (s_tile < num_tiles) & (rank < tile_capacity)
        flat = jnp.where(ok, s_tile * tile_capacity + rank,
                         num_tiles * tile_capacity)
        ids_mat = jnp.full((num_tiles * tile_capacity,), -1, jnp.int32)
        ids_mat = ids_mat.at[flat].set(s_gauss, mode="drop")
        ids_mat = ids_mat.reshape(num_tiles, tile_capacity)

    return TileBins(ids_mat=ids_mat, num_instances=total,
                    tile_counts=tile_counts, inst_gauss=s_gauss,
                    tile_start=tile_bounds, inst_tile=s_tile,
                    exp2sorted=exp2sorted, g_offsets=offsets,
                    g_counts=counts)


# ---------------------------------------------------------------------------
# Compositor with analytic VJP


def _pixel_coords(width: int, height: int, tile_size: int) -> np.ndarray:
    """(num_tiles, tile_size², 2) pixel-center coordinates per tile."""
    tw, th = _tile_grid(width, height, tile_size)
    ty, tx = np.meshgrid(np.arange(th), np.arange(tw), indexing="ij")
    iy, ix = np.meshgrid(np.arange(tile_size), np.arange(tile_size), indexing="ij")
    x = (tx.reshape(-1, 1) * tile_size + ix.reshape(1, -1)) + 0.5
    y = (ty.reshape(-1, 1) * tile_size + iy.reshape(1, -1)) + 0.5
    return np.stack([x, y], -1).astype(np.float32)  # (T, px, 2)


def _chunk_alpha(m2d, con, op, ids, pix):
    """alpha (T, CH, px) for one chunk; masked to 0 where invalid."""
    d = pix[:, None, :, :] - m2d[:, :, None, :]          # (T, CH, px, 2)
    dx, dy = d[..., 0], d[..., 1]
    power = (-0.5 * (con[..., 0, None] * dx * dx + con[..., 2, None] * dy * dy)
             - con[..., 1, None] * dx * dy)
    alpha = op[..., None] * jnp.exp(power)
    valid = (ids[..., None] >= 0) & (power <= 0) & (alpha >= ALPHA_MIN)
    return jnp.where(valid, jnp.minimum(alpha, ALPHA_MAX), 0.0), dx, dy, power


@functools.lru_cache(maxsize=None)
def _make_compositor(width: int, height: int, tile_size: int, chunk: int,
                     t_eps: float = T_EPS):
    pix_np = _pixel_coords(width, height, tile_size)
    tw, th = _tile_grid(width, height, tile_size)
    num_tiles = tw * th
    px = tile_size * tile_size

    def _tiles_to_image(tile_img: jax.Array) -> jax.Array:
        c = tile_img.shape[-1] if tile_img.ndim == 3 else 1
        img = tile_img.reshape(th, tw, tile_size, tile_size, c)
        img = img.transpose(0, 2, 1, 3, 4).reshape(th * tile_size, tw * tile_size, c)
        return img[:height, :width]

    def _forward(means2d, conics, colors, opacities, background, ids_mat):
        pix = jnp.asarray(pix_np)
        K = ids_mat.shape[1]
        num_chunks = K // chunk
        ids_chunks = ids_mat.reshape(num_tiles, num_chunks, chunk).transpose(1, 0, 2)

        def step(carry, ids):
            accum, T, done, n_contrib = carry
            safe = jnp.maximum(ids, 0)
            m2d = means2d[safe]
            con = conics[safe]
            col = colors[safe]
            op = opacities[safe]
            alpha, _, _, _ = _chunk_alpha(m2d, con, op, ids, pix)
            one_m = 1.0 - alpha
            q = T[:, None, :] * jnp.cumprod(one_m, axis=1)       # (T, CH, px)
            applied = (q >= t_eps) & ~done[:, None, :]
            a_eff = jnp.where(applied, alpha, 0.0)
            om_eff = 1.0 - a_eff
            T_excl = T[:, None, :] * jnp.concatenate(
                [jnp.ones_like(om_eff[:, :1]), jnp.cumprod(om_eff, axis=1)[:, :-1]],
                axis=1)
            w = a_eff * T_excl                                    # (T, CH, px)
            accum = accum + jnp.einsum("tcp,tcd->tpd", w, col)
            T = T * jnp.prod(om_eff, axis=1)
            done = done | jnp.any(q < t_eps, axis=1)
            n_contrib = n_contrib + jnp.sum(applied, axis=1).astype(jnp.int32)
            return (accum, T, done, n_contrib), None

        init = (
            jnp.zeros((num_tiles, px, 3), jnp.float32),
            jnp.ones((num_tiles, px), jnp.float32),
            jnp.zeros((num_tiles, px), bool),
            jnp.zeros((num_tiles, px), jnp.int32),
        )
        (accum, T, _done, n_contrib), _ = jax.lax.scan(step, init, ids_chunks)
        tile_img = accum + T[..., None] * background[None, None, :]
        img = _tiles_to_image(tile_img)
        alpha_img = _tiles_to_image(1.0 - T[..., None])[..., 0]
        return img, alpha_img, (T, n_contrib)

    # ``absgrad_sink`` is an all-zeros (N, 2) input the forward ignores; its
    # cotangent carries the AbsGS per-gaussian |d mean2d| accumulator out of
    # the backward pass (jax.grad w.r.t. it harvests absgrad with no extra
    # rasterization work).
    @jax.custom_vjp
    def composite(means2d, conics, colors, opacities, background,
                  absgrad_sink, ids_mat):
        img, alpha_img, _ = _forward(
            means2d, conics, colors, opacities, background, ids_mat)
        return img, alpha_img

    def composite_fwd(means2d, conics, colors, opacities, background,
                     absgrad_sink, ids_mat):
        img, alpha_img, (T_final, n_contrib) = _forward(
            means2d, conics, colors, opacities, background, ids_mat)
        res = (means2d, conics, colors, opacities, background, ids_mat,
               T_final, n_contrib)
        return (img, alpha_img), res

    def composite_bwd(res, cotangents):
        (means2d, conics, colors, opacities, background, ids_mat,
         T_final, n_contrib) = res
        g_img, g_alpha = cotangents
        n = means2d.shape[0]
        pix = jnp.asarray(pix_np)
        K = ids_mat.shape[1]
        num_chunks = K // chunk

        # image-space cotangents back to (tiles, px) layout
        def img_to_tiles(im, c):
            pad_h = th * tile_size - height
            pad_w = tw * tile_size - width
            im = jnp.pad(im.reshape(height, width, c),
                         ((0, pad_h), (0, pad_w), (0, 0)))
            im = im.reshape(th, tile_size, tw, tile_size, c)
            return im.transpose(0, 2, 1, 3, 4).reshape(num_tiles, px, c)

        g_img_t = img_to_tiles(g_img, 3)                     # (T, px, 3)
        g_alpha_t = img_to_tiles(g_alpha[..., None], 1)[..., 0]

        # dL/dT_final = g_img·bg - g_alpha; dT_final/dalpha_i = -T/(1-a_i)
        # => dL/dalpha_i += (g_alpha - g_img·bg) * T_final/(1-a_i)
        g_T = g_alpha_t - jnp.einsum("tpd,d->tp", g_img_t, background)

        ids_chunks = ids_mat.reshape(num_tiles, num_chunks, chunk).transpose(1, 0, 2)
        rev_ids = ids_chunks[::-1]
        chunk_index = jnp.arange(num_chunks - 1, -1, -1)

        d_means2d = jnp.zeros((n, 2), jnp.float32)
        d_conics = jnp.zeros((n, 3), jnp.float32)
        d_colors = jnp.zeros((n, 3), jnp.float32)
        d_ops = jnp.zeros((n,), jnp.float32)
        d_abs = jnp.zeros((n, 2), jnp.float32)

        def step(carry, inp):
            T_end, rear, dm, dc, dcol, dop, dab = carry
            ids, c_idx = inp
            safe = jnp.maximum(ids, 0)
            m2d = means2d[safe]
            con = conics[safe]
            col = colors[safe]
            op = opacities[safe]
            alpha, dx, dy, power = _chunk_alpha(m2d, con, op, ids, pix)
            gidx = c_idx * chunk + jnp.arange(chunk, dtype=jnp.int32)
            applied = gidx[None, :, None] < n_contrib[:, None, :]
            a_eff = jnp.where(applied, alpha, 0.0)
            om_eff = 1.0 - a_eff
            T_start = jnp.minimum(
                T_end / jnp.prod(om_eff, axis=1).clip(1e-12), 1.0)
            T_excl = T_start[:, None, :] * jnp.concatenate(
                [jnp.ones_like(om_eff[:, :1]), jnp.cumprod(om_eff, axis=1)[:, :-1]],
                axis=1)
            w = a_eff * T_excl                                # (T, CH, px)
            wc = w[..., None] * col[:, :, None, :]            # (T, CH, px, 3)
            # rear_i = rear_end + sum_{j>i} w_j c_j  (reverse exclusive cumsum)
            suffix = jnp.flip(jnp.cumsum(jnp.flip(wc, 1), axis=1), 1)
            rear_i = rear[:, None, :, :] + suffix - wc

            inner = (col[:, :, None, :] * T_excl[..., None]
                     - rear_i / om_eff[..., None].clip(1e-3))
            d_alpha = (jnp.sum(g_img_t[:, None, :, :] * inner, -1)
                       + g_T[:, None, :] * T_final[:, None, :] / om_eff.clip(1e-3))
            live = applied & (alpha > 0) & (alpha < ALPHA_MAX)
            d_alpha = jnp.where(live, d_alpha, 0.0)

            G = jnp.exp(power)
            d_op_px = d_alpha * G                             # (T, CH, px)
            d_power = d_alpha * alpha                         # alpha = op*G
            d_a = -0.5 * dx * dx * d_power
            d_b = -dx * dy * d_power
            d_c = -0.5 * dy * dy * d_power
            d_u = (con[..., 0, None] * dx + con[..., 1, None] * dy) * d_power
            d_v = (con[..., 2, None] * dy + con[..., 1, None] * dx) * d_power

            # per-(tile, slot) reductions over pixels, then scatter to gaussians
            d_col_slot = jnp.einsum("tcp,tpd->tcd", w, g_img_t)
            d_m_slot = jnp.stack(
                [jnp.sum(d_u, -1), jnp.sum(d_v, -1)], -1)     # (T, CH, 2)
            d_abs_slot = jnp.stack(
                [jnp.sum(jnp.abs(d_u), -1), jnp.sum(jnp.abs(d_v), -1)], -1)
            d_con_slot = jnp.stack(
                [jnp.sum(d_a, -1), jnp.sum(d_b, -1), jnp.sum(d_c, -1)], -1)
            d_op_slot = jnp.sum(d_op_px, -1)                  # (T, CH)

            sids = jnp.where(ids >= 0, ids, n).reshape(-1)
            dm = dm.at[sids].add(d_m_slot.reshape(-1, 2), mode="drop")
            dc = dc.at[sids].add(d_con_slot.reshape(-1, 3), mode="drop")
            dcol = dcol.at[sids].add(d_col_slot.reshape(-1, 3), mode="drop")
            dop = dop.at[sids].add(d_op_slot.reshape(-1), mode="drop")
            dab = dab.at[sids].add(d_abs_slot.reshape(-1, 2), mode="drop")

            rear = rear + jnp.sum(wc, axis=1)
            return (T_start, rear, dm, dc, dcol, dop, dab), None

        init = (T_final, jnp.zeros((num_tiles, px, 3), jnp.float32),
                d_means2d, d_conics, d_colors, d_ops, d_abs)
        (T0, rear, dm, dc, dcol, dop, dab), _ = jax.lax.scan(
            step, init, (rev_ids, chunk_index))

        d_background = jnp.einsum("tpd,tp->d", g_img_t, T_final)
        return (dm, dc, dcol, dop, d_background, dab, None)

    composite.defvjp(composite_fwd, composite_bwd)

    def composite_autodiff(means2d, conics, colors, opacities, background,
                           absgrad_sink, ids_mat):
        """Same forward without the custom VJP — autodiff oracle for tests."""
        img, alpha_img, _ = _forward(
            means2d, conics, colors, opacities, background, ids_mat)
        return img, alpha_img

    return composite, composite_autodiff


def composite_tiles(
    means2d: jax.Array,
    conics: jax.Array,
    colors: jax.Array,
    opacities: jax.Array,
    ids_mat: jax.Array,
    width: int,
    height: int,
    *,
    tile_size: int = 16,
    chunk: int = 32,
    background: jax.Array | None = None,
    absgrad_sink: jax.Array | None = None,
    t_eps: float = T_EPS,
    _use_autodiff: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Composite binned gaussians into (image (H, W, 3), alpha (H, W)).

    Pass ``absgrad_sink`` (zeros (N, 2)) and take ``jax.grad`` with respect to
    it to harvest the AbsGS absolute screen-space gradient accumulator.
    """
    if background is None:
        background = jnp.zeros((3,), jnp.float32)
    if absgrad_sink is None:
        absgrad_sink = jnp.zeros((means2d.shape[0], 2), jnp.float32)
    assert ids_mat.shape[1] % chunk == 0, "tile_capacity must be divisible by chunk"
    composite, composite_ad = _make_compositor(width, height, tile_size,
                                                chunk, t_eps)
    fn = composite_ad if _use_autodiff else composite
    return fn(means2d, conics, colors, opacities, background,
              absgrad_sink, ids_mat)
