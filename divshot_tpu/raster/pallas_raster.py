"""Pallas TPU rasterization kernels (forward + backward), v2: MXU-centric.

TPU-native replacement for the CUDA tile rasterizer (the closed trainer's
``gsplatrast``; tile structure evidenced at ``gaussian_common.hlsl``
GROUP_WIDTH/HEIGHT=16). Design notes:

- **Feature-major instance table** ``(FEAT, I)``: instances live on lanes in
  depth-sorted order (from ``tiles.bin_gaussians``); kernels DMA 256-lane
  blocks. Tile ranges need no alignment: a tile's first partial block is
  lane-masked on read, and its gradients go to a small per-tile *boundary
  block* output that XLA scatter-adds back — every full block is written by
  exactly one tile, so there are no write hazards.
- **Gaussian evaluation on the MXU**: per chunk, log-alpha for all
  (pixel, instance) pairs is ONE matmul ``s = P^T(8,px) @ Q(8,BLK)`` of a
  per-tile quadratic pixel-feature matrix P = [gx², 2·gx·gy, gy², gx, gy,
  1, 0, 0] (tile-CENTERED coords — keeps every term < ~300 so f32 products
  carry ≥ 1e-4 absolute accuracy; global coords would cancel catastrophically
  for small splats) against per-chunk coefficient rows Q rebuilt from the raw
  (u, v, a, b, c, log-op) table rows in O(BLK) work. log(op) rides inside Q's
  constant row, so alpha = exp(s) and all CUDA culls collapse to compares on
  s (alpha ≥ 1/255 ⇔ s ≥ log(1/255); power ≤ 0 ⇔ s ≤ log op).
- **Prefix transmittance via 2-pass bf16 split matmuls**: the log-space
  triangular-matmul prefix runs as dot(hi, tri) + dot(lo, tri) with
  hi/lo = bf16 value + bf16 residual (tri is exactly representable in bf16).
  Error ≤ 2⁻¹⁷·Σ|log(1-αⱼ)| ≤ 7e-5 in log-T — versus the r3 f32-HIGHEST
  version this is 3× fewer MXU passes and was the single largest cost in the
  r3 kernels (measured 80/132 ms fwd/bwd at 8.4M instances; the HIGHEST
  prefix alone was ~25 ms/pass-pair per sweep).
- **Early-stop with exact CUDA semantics**: with q_i = T_in·prod_{j<=i}(1-a_j)
  the applied set is exactly {i : q_i >= 1e-4} — a prefix, since q is
  monotone — and for applied i the unmasked prefix equals the true exclusive
  transmittance.
- **Single-pass backward, forward order**: the CUDA reference walks
  back-to-front because atomics force it to; here the suffix color sum is
  recovered as ``rear_i = C_fin - C_incl,i`` from the forward's output, and
  all channels collapse onto the cotangent (one cdot matmul + ONE prefix
  sum per chunk regardless of channel count). The six quadratic-coefficient
  gradients come from ONE matmul ``dQ = P(8,px) @ d_s(px,BLK)`` and chain to
  (u, v, a, b, c, op) on (1, BLK) rows — no per-pixel du/dv materialization
  unless AbsGS absgrad rows are requested (``with_absgrad``).
- Per-instance gradients land in a ``(NGRAD, I)`` table and are
  segment-reduced to gaussians in expansion order: one permutation gather +
  a cumsum + boundary diffs — no scatter-add over millions of rows.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.999
T_EPS = 1e-4
LOG_AMIN = math.log(ALPHA_MIN)
LOG_AMAX = math.log(ALPHA_MAX)
LOGOP_FLOOR = -80.0

BLK = 256            # instances per block (= lanes)
MAX_CH = 7
ROW_LOGOP = 5
ROW_CH = 6           # first channel row in FEAT / first dcolor row in NGRAD
ROW_T = 7            # T row in the (T, 8, px) forward output / cotangent

_HI = jax.lax.Precision.HIGHEST


def _feat_rows(nch: int) -> int:
    """u v a b c log_op + nch channels, padded to the sublane tile (8) —
    Mosaic requires dim-0 DMA slices in multiples of 8."""
    return (6 + nch + 7) // 8 * 8


def _ngrad_rows(nch: int) -> int:
    """du dv da db dc dop + nch channel grads + |du| |dv| npix, padded to
    the sublane tile (8)."""
    return (9 + nch + 7) // 8 * 8


def _tri_lower():
    """(BLK, BLK) lower-triangular ones: dot(x, tri) = inclusive prefix sum
    along lanes (kept f32 for the surfel kernel; the 3DGS kernels consume a
    bf16 copy passed as a resident VMEM input)."""
    ii = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
    return (ii <= jj).astype(jnp.float32)


def _split2(x):
    """f32 -> (bf16 head, bf16 residual); head + residual carries ~16
    mantissa bits, so a dot against an exactly-bf16 matrix accumulated in
    f32 lands within 2^-16 relative of the f32 product."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _prefix_lanes_split(x, tri_bf):
    """Inclusive prefix sum along lanes: two bf16 MXU passes (see _split2).
    3x fewer passes than f32 HIGHEST at equal practical accuracy for
    compositing (error ~7e-5 in log-T worst case)."""
    hi, lo = _split2(x)
    return (jnp.dot(hi, tri_bf, preferred_element_type=jnp.float32)
            + jnp.dot(lo, tri_bf, preferred_element_type=jnp.float32))


# --- legacy helpers kept for pallas_surfel.py ------------------------------


def _prefix_prod_lanes(x, tri):
    """Inclusive prefix product along lanes via one MXU matmul in log space
    (x > 0 guaranteed: 1 - alpha with alpha <= ALPHA_MAX)."""
    return jnp.exp(jnp.dot(jnp.log(x), tri,
                           preferred_element_type=jnp.float32,
                           precision=_HI))


def _prefix_sum_lanes(x, tri):
    """Inclusive prefix sum along lanes via one MXU matmul."""
    return jnp.dot(x, tri, preferred_element_type=jnp.float32, precision=_HI)


def _pixel_grid(tile_size: int, t, tiles_x: int):
    """(px, 1) absolute pixel-center coords for tile t; px on sublanes."""
    px = tile_size * tile_size
    idx = jax.lax.broadcasted_iota(jnp.int32, (px, 1), 0)
    ix = (idx % tile_size).astype(jnp.float32) + 0.5
    iy = (idx // tile_size).astype(jnp.float32) + 0.5
    tile_x = (t % tiles_x).astype(jnp.float32)
    tile_y = (t // tiles_x).astype(jnp.float32)
    return tile_x * tile_size + ix, tile_y * tile_size + iy


# ---------------------------------------------------------------------------
# v3 in-kernel building blocks (mega-chunk structure)

FWD_MEGA = 4         # BLK-blocks per DMA mega-chunk (per kernel: the
BWD_MEGA = 4         # backward's working set is ~2.4x the forward's, so it
                     # runs a smaller mega to stay inside the 16MB VMEM);
                     # tiles.bin_gaussians keeps a max-mega*BLK guard band
                     # at the capacity end
LOGOP_DEAD = -1e38   # out-of-range lanes: f32 absorption makes
                     # s = quad + (-1e38) exactly -1e38 (|quad| < 1e7), so
                     # the single (s >= LOG_AMIN) compare rejects them with
                     # no dedicated per-pixel mask op


def _pixel_features(tile_size: int):
    """(8, px) tile-centered quadratic pixel features, px on lanes:
    rows [gx², 2·gx·gy, gy², gx, gy, 1, 0, 0] with gx, gy in (-ts/2, ts/2).
    The 2· on the cross term lets the whole conic row block be one -0.5×
    of the raw (a, b, c) table rows."""
    px = tile_size * tile_size
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, px), 1)
    half = tile_size * 0.5
    gx = (idx % tile_size).astype(jnp.float32) + 0.5 - half
    gy = (idx // tile_size).astype(jnp.float32) + 0.5 - half
    one = jnp.ones((1, px), jnp.float32)
    zero = jnp.zeros((1, px), jnp.float32)
    return jnp.concatenate(
        [gx * gx, 2.0 * gx * gy, gy * gy, gx, gy, one, zero, zero], axis=0)


def _tile_center(tile_size: int, t, tiles_x: int):
    """Scalar center coords of tile t in absolute pixel units."""
    half = tile_size * 0.5
    cx = (t % tiles_x).astype(jnp.float32) * tile_size + half
    cy = (t // tiles_x).astype(jnp.float32) * tile_size + half
    return cx, cy


def _mega_rows(mbuf, cx, cy, lstart, lo_idx, hi_idx):
    """Per-mega coefficient rows, all on (r, MEGA*BLK) lanes — built once
    per DMA so the O(lane) row work is issued MEGA× less often than the
    per-block compute.

    Rows: acb = [-a/2, -b/2, -c/2]; de = [D, E] with D = a·u_c + b·v_c,
    E = b·u_c + c·v_c (u_c, v_c tile-centered — keeps every quadratic term
    < ~300 so f32 carries >= 1e-4 absolute accuracy; global coords cancel
    catastrophically for small splats); fq = -(u_c·D + v_c·E)/2 + log_op.
    Out-of-range lanes (a tile's first/last mega carries real neighbor-tile
    instances whose alpha here can exceed 1/255) get log_op = LOGOP_DEAD,
    which the (s <= logop) & (s >= LOG_AMIN) mask pair rejects for free."""
    L = mbuf.shape[1]
    gl = lstart + jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
    valid = (gl >= lo_idx) & (gl < hi_idx)
    uc = mbuf[0:1, :] - cx
    vc = mbuf[1:2, :] - cy
    acb = -0.5 * mbuf[2:5, :]
    de = uc * mbuf[2:4, :] + vc * mbuf[3:5, :]
    logop = jnp.where(valid, mbuf[ROW_LOGOP:ROW_LOGOP + 1, :], LOGOP_DEAD)
    fq = -0.5 * (uc * de[0:1, :] + vc * de[1:2, :]) + logop
    return acb, de, fq, logop, uc, vc


def _mega_composite(pc, tri_bf, acb, de, fq, logop, t_px, t_eps):
    """Whole-mega compositing core on (px, MEGA*BLK) arrays.

    The T carry only enters as a per-pixel SCALE: within the mega the
    unmasked cumulative prefix of log(1-alpha) IS the true exclusive
    transmittance for every applied instance (q is monotone non-increasing
    along the sorted lane order, so the applied set {q >= eps} is a prefix
    of the whole mega). That lifts the sequential dependence from BLK to
    MEGA*BLK granularity: every element-wise op below runs once per mega on
    8x longer vectors (amortizing VPU op latency), the prefix matmuls stay
    per-block and chain through their last-column totals, and the T update
    is ONE lane-reduce per mega.

    -> (s, alpha, one_m, t_excl, w, q_incl, applied, mask, t_out)."""
    gx2, gxy2, gy2, gx, gy = pc
    L = acb.shape[1]
    s = ((gx2 * acb[0:1] + gxy2 * acb[1:2] + gy2 * acb[2:3])
         + (gx * de[0:1] + gy * de[1:2]) + fq)                 # (px, L)
    # CUDA's `power > 0 -> skip` guard is omitted: EWA conics here are PSD
    # by construction (det > 0 enforced at projection, +eps2d dilation), so
    # power <= 0 up to rounding and the guard would cost a dedicated
    # compare per element. The alpha >= 1/255 cull below is exact.
    mask = s >= LOG_AMIN
    alpha = jnp.where(mask, jnp.exp(jnp.minimum(s, LOG_AMAX)), 0.0)
    one_m = 1.0 - alpha
    lg = jnp.log(one_m)
    # per-block inclusive prefix + cross-block cumulative offsets
    segs = []
    off = None
    for g in range(L // BLK):
        sl = slice(g * BLK, (g + 1) * BLK)
        si = _prefix_lanes_split(lg[:, sl], tri_bf)
        if off is not None:
            si = si + off
        off = si[:, BLK - 1:BLK]
        segs.append(si)
    s_incl = jnp.concatenate(segs, axis=1) if len(segs) > 1 else segs[0]
    t_excl = t_px * jnp.exp(s_incl - lg)
    q_incl = t_excl * one_m
    applied = q_incl >= t_eps
    w = jnp.where(applied, alpha * t_excl, 0.0)
    t_out = jnp.min(jnp.where(applied, q_incl, t_px), axis=1, keepdims=True)
    return s, alpha, one_m, t_excl, w, q_incl, applied, mask, t_out


def _pc_cols(p_mat, px):
    """(px, 1) pixel feature columns [gx², 2gxgy, gy², gx, gy] from the
    (8, px) feature rows — one small transpose per tile."""
    pt = p_mat.T                                              # (px, 8)
    return tuple(pt[:, k:k + 1] for k in range(5))


def _chan_acc_split(chs_hi, chs_lo, w):
    """(ch, px) channel accumulation: 3 bf16 MXU passes (skip lo·lo) of
    (ch, BLK)x(px, BLK)^T — f32-practical accuracy at half the HIGHEST
    pass count."""
    w_hi, w_lo = _split2(w)
    dims = (((1,), (1,)), ((), ()))
    return (jax.lax.dot_general(chs_hi, w_hi, dims,
                                preferred_element_type=jnp.float32)
            + jax.lax.dot_general(chs_lo, w_hi, dims,
                                  preferred_element_type=jnp.float32)
            + jax.lax.dot_general(chs_hi, w_lo, dims,
                                  preferred_element_type=jnp.float32))


def _forward_kernel(tile_start_ref, inst_hbm, tri_ref, out_ref, scratch, sem,
                    *, tile_size: int, tiles_x: int, nch: int,
                    t_eps: float = T_EPS):
    MEGA = FWD_MEGA
    t = pl.program_id(0)
    s0 = tile_start_ref[t]
    e0 = tile_start_ref[t + 1]
    b0 = s0 // BLK
    px = tile_size * tile_size
    feat = scratch.shape[1]
    ch_rows = min(8, feat - ROW_CH)
    cx, cy = _tile_center(tile_size, t, tiles_x)
    pc = _pc_cols(_pixel_features(tile_size), px)
    tri_bf = tri_ref[...]
    nmega = jnp.where(e0 > s0, pl.cdiv(e0 - b0 * BLK, MEGA * BLK), 0)

    def dma(c):
        start = pl.multiple_of((b0 + c * MEGA) * BLK, BLK)
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds(start, MEGA * BLK)],
            scratch.at[c % 2], sem.at[c % 2])

    @pl.when(nmega > 0)
    def _():
        dma(0).start()

    def body(c, carry):
        t_px, acc = carry
        # double buffer: kick off the next mega-chunk's DMA before waiting
        @pl.when(c + 1 < nmega)
        def _():
            dma(c + 1).start()

        dma(c).wait()
        mbuf = scratch[c % 2]
        lstart = (b0 + c * MEGA) * BLK
        acb, de, fq, logop, _, _ = _mega_rows(
            mbuf, cx, cy, lstart, jnp.maximum(s0, lstart), e0)
        chs_hi, chs_lo = _split2(mbuf[ROW_CH:ROW_CH + ch_rows, :])
        (_s, _alpha, _one_m, _t_excl, w, _q, _applied, _mask,
         t_px) = _mega_composite(pc, tri_bf, acb, de, fq, logop, t_px,
                                 t_eps)
        acc = acc + _chan_acc_split(chs_hi, chs_lo, w)
        return t_px, acc

    def cond(state):
        c, (t_px, _a) = state
        return (c < nmega) & (jnp.max(t_px) >= t_eps)

    def wbody(state):
        c, carry = state
        return c + 1, body(c, carry)

    init = (jnp.ones((px, 1), jnp.float32),
            jnp.zeros((ch_rows, px), jnp.float32))
    c_exit, (t_px, acc) = jax.lax.while_loop(
        cond, wbody, (jnp.int32(0), init))

    # drain the in-flight prefetch if the T-threshold exited the loop early
    @pl.when(c_exit < nmega)
    def _():
        dma(c_exit).wait()

    t_row = t_px.reshape(1, px)
    top = min(ch_rows, 7)
    rows = [acc[:top]]
    if top < 7:
        rows.append(jnp.zeros((7 - top, px), jnp.float32))
    rows.append(t_row)
    out_ref[0, :, :] = jnp.concatenate(rows, axis=0)


def build_feature_table(means2d, conics, colors, opacities,
                        inst_gauss) -> jax.Array:
    """(6+nch, I) f32 feature-major table in depth-sorted instance order;
    rows [u, v, a, b, c, log(op), ch0..]. ``colors`` is (N, C) with C <= 7
    channels (rgb + aux planes). One lane-gather of the per-gaussian feature
    matrix — the only per-instance random memory op in the forward."""
    n = means2d.shape[0]
    nch = colors.shape[1]
    assert nch <= MAX_CH, f"at most {MAX_CH} channels"
    logop = jnp.maximum(jnp.log(jnp.maximum(opacities, 1e-35)), LOGOP_FLOOR)
    featT = jnp.concatenate([
        means2d.T, conics.T, logop[None, :], colors.T,
        jnp.zeros((_feat_rows(nch) - 6 - nch, n), jnp.float32),
    ], axis=0)                                    # (_feat_rows, N)
    safe = jnp.clip(inst_gauss, 0, n - 1)
    tab = jnp.take(featT, safe, axis=1)           # (FEAT, I)
    lo = jnp.where(inst_gauss >= 0, tab[ROW_LOGOP], LOGOP_FLOOR)
    return jax.lax.dynamic_update_slice(tab, lo[None, :], (ROW_LOGOP, 0))


def _tiles_to_image(rows: jax.Array, tiles_x: int, tiles_y: int,
                    tile_size: int, width: int, height: int) -> jax.Array:
    """(T, C, px) -> (H, W, C)."""
    c = rows.shape[1]
    img = rows.reshape(tiles_y, tiles_x, c, tile_size, tile_size)
    img = img.transpose(0, 3, 1, 4, 2).reshape(
        tiles_y * tile_size, tiles_x * tile_size, c)
    return img[:height, :width]


def _image_to_tiles(img: jax.Array, tiles_x: int, tiles_y: int,
                    tile_size: int) -> jax.Array:
    """(H, W, C) -> (T, C, px), zero-padding to the tile grid."""
    h, w, c = img.shape
    img = jnp.pad(img, ((0, tiles_y * tile_size - h),
                        (0, tiles_x * tile_size - w), (0, 0)))
    img = img.reshape(tiles_y, tile_size, tiles_x, tile_size, c)
    return img.transpose(0, 2, 4, 1, 3).reshape(
        tiles_y * tiles_x, c, tile_size * tile_size)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size", "nch", "interpret",
                     "t_eps"))
def rasterize_forward(
    inst_table: jax.Array,     # (FEAT, I)
    tile_start: jax.Array,     # (T+1,) int32 raw sorted offsets
    *,
    width: int,
    height: int,
    tile_size: int = 16,
    nch: int = 3,
    interpret: bool = False,
    t_eps: float = T_EPS,
) -> jax.Array:
    """-> per-tile rows (T, 8, px): channels at rows 0..nch-1, T at row 7,
    all pre-background."""
    tiles_x = (width + tile_size - 1) // tile_size
    tiles_y = (height + tile_size - 1) // tile_size
    num_tiles = tiles_x * tiles_y
    px = tile_size * tile_size

    kernel = functools.partial(
        _forward_kernel, tile_size=tile_size, tiles_x=tiles_x, nch=nch,
        t_eps=t_eps)
    tri_bf = _tri_lower().astype(jnp.bfloat16)

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((BLK, BLK), lambda t, *_: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 8, px), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, _feat_rows(nch), FWD_MEGA * BLK),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, px), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(tile_start, inst_table, tri_bf)


# ---------------------------------------------------------------------------
# Backward


def _backward_kernel(tile_start_ref, inst_hbm, tri_ref, cot_ref, fwd_ref,
                     grad_hbm, bnd_ref, scratch, gscratch, sem, gsem,
                     *, tile_size: int, tiles_x: int, nch: int,
                     with_absgrad: bool, t_eps: float = T_EPS):
    MEGA = BWD_MEGA
    """One front-to-back sweep per tile. The suffix color sum ("rear") is
    recovered from the forward's final accumulator: rear_i = C_fin - C_incl,i.

    cot_ref: (1, 8, px), channel cotangents at rows 0..nch-1, g_T at row 7
    (g_T = g_alpha - g_img·bg). fwd_ref: the forward's (1, 8, px) output.
    Gradient rows for a tile's first partial block go to ``bnd_ref`` (the
    per-tile boundary block); all full blocks are tile-exclusive writes to
    ``grad_hbm``."""
    t = pl.program_id(0)
    s0 = tile_start_ref[t]
    e0 = tile_start_ref[t + 1]
    b0 = s0 // BLK
    px = tile_size * tile_size
    feat = scratch.shape[1]
    ch_rows = min(8, feat - ROW_CH)
    cx, cy = _tile_center(tile_size, t, tiles_x)
    p_mat = _pixel_features(tile_size)
    pc = _pc_cols(p_mat, px)
    p_hi, p_lo = _split2(p_mat)
    tri_bf = tri_ref[...]
    nmega = jnp.where(e0 > s0, pl.cdiv(e0 - b0 * BLK, MEGA * BLK), 0)
    ngrad = gscratch.shape[1]
    # block 0 is boundary-owned when the tile range starts mid-block
    first_main = jnp.where(s0 % BLK == 0, 0, 1)

    bnd_ref[0] = jnp.zeros((ngrad, BLK), jnp.float32)

    g_rows = cot_ref[0]                                       # (8, px)
    g_hi, g_lo = _split2(g_rows)
    f_rows = fwd_ref[0]
    prod8 = g_rows * f_rows
    # all channels collapse onto the cotangent:
    # sum_ch g_ch * rear_ch = Cf_dot - C_dot_incl — ONE prefix sum per block
    cf_col = jnp.sum(prod8[:7], axis=0).reshape(px, 1)
    gt_tfin = prod8[ROW_T:ROW_T + 1].reshape(px, 1)
    gxc, gyc = pc[3], pc[4]

    def dma(c):
        start = pl.multiple_of((b0 + c * MEGA) * BLK, BLK)
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds(start, MEGA * BLK)],
            scratch.at[c % 2], sem.at[c % 2])

    # grad write-out: one DMA per mega, double-buffered on wsem so the
    # write overlaps the next mega's compute. Mega 0 skips block 0 when it
    # is boundary-owned (that block belongs to the previous tile's main
    # range; our contribution goes to bnd_ref and is scatter-added later).
    def wdma_full(c):
        start = pl.multiple_of((b0 + c * MEGA) * BLK, BLK)
        return pltpu.make_async_copy(
            gscratch.at[c % 2], grad_hbm.at[:, pl.ds(start, MEGA * BLK)],
            gsem.at[c % 2])

    def wdma_part(c):
        start = pl.multiple_of((b0 + c * MEGA) * BLK + BLK, BLK)
        return pltpu.make_async_copy(
            gscratch.at[c % 2, :, pl.ds(BLK, (MEGA - 1) * BLK)],
            grad_hbm.at[:, pl.ds(start, (MEGA - 1) * BLK)],
            gsem.at[c % 2])

    def write_op(c, go):
        @pl.when((c == 0) & (first_main == 1))
        def _():
            getattr(wdma_part(c), go)()

        @pl.when((c > 0) | (first_main == 0))
        def _():
            getattr(wdma_full(c), go)()

    @pl.when(nmega > 0)
    def _():
        dma(0).start()

    def body(c, carry):
        t_px, c_dot = carry

        @pl.when(c + 1 < nmega)
        def _():
            dma(c + 1).start()

        dma(c).wait()
        # before refilling this gscratch slot, drain its previous write
        @pl.when(c >= 2)
        def _():
            write_op(c - 2, "wait")
        mbuf = scratch[c % 2]
        lstart = (b0 + c * MEGA) * BLK
        acb, de, fq, logop, uc, vc = _mega_rows(
            mbuf, cx, cy, lstart, jnp.maximum(s0, lstart), e0)
        chs_hi, chs_lo = _split2(mbuf[ROW_CH:ROW_CH + ch_rows, :])

        (s, alpha, one_m, t_excl, w, _q, applied, mask,
         t_px) = _mega_composite(pc, tri_bf, acb, de, fq, logop, t_px,
                                 t_eps)
        # cdot = sum_ch g_ch·c_ch via 3 bf16 passes (contract channel)
        dims0 = (((0,), (0,)), ((), ()))
        cdot = (jax.lax.dot_general(
                    g_hi[:ch_rows], chs_hi, dims0,
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    g_lo[:ch_rows], chs_hi, dims0,
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    g_hi[:ch_rows], chs_lo, dims0,
                    preferred_element_type=jnp.float32))       # (px, L)
        wcd = w * cdot
        # per-block prefix sum chained through block totals (T-independent)
        segs = []
        off = None
        for g in range(MEGA):
            sl = slice(g * BLK, (g + 1) * BLK)
            si = _prefix_lanes_split(wcd[:, sl], tri_bf)
            if off is not None:
                si = si + off
            off = si[:, BLK - 1:BLK]
            segs.append(si)
        ps_wcd = jnp.concatenate(segs, axis=1) if MEGA > 1 else segs[0]
        rear = cf_col - (c_dot + ps_wcd)
        d_alpha = cdot * t_excl + (gt_tfin - rear) / one_m
        live = applied & mask & (s < LOG_AMAX)
        d_alpha = jnp.where(live, d_alpha, 0.0)
        d_s = d_alpha * alpha

        # six quadratic-coefficient grads + channel grads: one 3-pass
        # (8, px)x(px, L) matmul each for the whole mega
        ds_hi, ds_lo = _split2(d_s)
        dq = (jnp.dot(p_hi, ds_hi, preferred_element_type=jnp.float32)
              + jnp.dot(p_hi, ds_lo, preferred_element_type=jnp.float32)
              + jnp.dot(p_lo, ds_hi,
                        preferred_element_type=jnp.float32))   # (8, L)
        dims1 = (((1,), (0,)), ((), ()))
        w_hi, w_lo = _split2(w)
        d_ch = (jax.lax.dot_general(
                    g_hi[:max(nch, 1)], w_hi, dims1,
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    g_lo[:max(nch, 1)], w_hi, dims1,
                    preferred_element_type=jnp.float32)
                + jax.lax.dot_general(
                    g_hi[:max(nch, 1)], w_lo, dims1,
                    preferred_element_type=jnp.float32))       # (nch, L)
        npix = jnp.sum(live.astype(jnp.float32), axis=0, keepdims=True)
        if with_absgrad:
            a_c, b_c, c_c = mbuf[2:3, :], mbuf[3:4, :], mbuf[4:5, :]
            du_px = d_s * (gxc * a_c + gyc * b_c - de[0:1, :])
            dv_px = d_s * (gxc * b_c + gyc * c_c - de[1:2, :])
            au = jnp.sum(jnp.abs(du_px), axis=0, keepdims=True)
            av = jnp.sum(jnp.abs(dv_px), axis=0, keepdims=True)
        c_dot = c_dot + jnp.sum(wcd, axis=1, keepdims=True)

        # chain rule on (1, MEGA*BLK) rows — issued once per mega
        d_acb, d_cb2, d_ccb = dq[0:1], dq[1:2], dq[2:3]
        d_d, d_e, d_f = dq[3:4], dq[4:5], dq[5:6]
        a_r = mbuf[2:3, :]
        b_r = mbuf[3:4, :]
        c_r = mbuf[4:5, :]
        d_row, e_row = de[0:1, :], de[1:2, :]
        d_u = a_r * d_d + b_r * d_e - d_f * d_row
        d_v = b_r * d_d + c_r * d_e - d_f * e_row
        d_a = -0.5 * d_acb + uc * d_d - 0.5 * uc * uc * d_f
        d_b = -0.5 * d_cb2 + vc * d_d + uc * d_e - uc * vc * d_f
        d_c = -0.5 * d_ccb + vc * d_e - 0.5 * vc * vc * d_f
        # clamp: dead lanes carry LOGOP_DEAD and exp(200) would inf·0=NaN
        d_op = d_f * jnp.exp(-jnp.maximum(logop, LOGOP_FLOOR))
        if not with_absgrad:
            au = jnp.zeros((1, MEGA * BLK), jnp.float32)
            av = au

        rows = [d_u, d_v, d_a, d_b, d_c, d_op, d_ch[:nch], au, av, npix]
        pad_rows = ngrad - (9 + nch)
        if pad_rows:
            rows.append(jnp.zeros((pad_rows, MEGA * BLK), jnp.float32))
        packed = jnp.concatenate(rows, axis=0)
        gscratch[c % 2] = packed

        @pl.when((c == 0) & (first_main == 1))
        def _():
            bnd_ref[0] = packed[:, 0:BLK]

        write_op(c, "start")
        return t_px, c_dot

    def cond(state):
        c, (t_px, *_r) = state
        return (c < nmega) & (jnp.max(t_px) >= t_eps)

    def wbody(state):
        c, carry = state
        return c + 1, body(c, carry)

    c_exit, _ = jax.lax.while_loop(
        cond, wbody, (jnp.int32(0), (jnp.ones((px, 1), jnp.float32),
                                     jnp.zeros((px, 1), jnp.float32))))

    @pl.when(c_exit < nmega)
    def _():
        dma(c_exit).wait()

    # drain the (up to two) in-flight grad writes
    @pl.when(c_exit >= 1)
    def _():
        write_op(c_exit - 1, "wait")

    @pl.when(c_exit >= 2)
    def _():
        write_op(c_exit - 2, "wait")

    # zero-fill the tile-owned main megas the early stop skipped
    # (c >= c_exit >= 1 here, so block 0 is never in range)
    def zbody(c, _):
        gscratch[c % 2] = jnp.zeros((ngrad, MEGA * BLK), jnp.float32)
        cp = wdma_full(c)
        cp.start()
        cp.wait()
        return 0

    jax.lax.fori_loop(c_exit, nmega, zbody, 0)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size", "nch", "interpret",
                     "t_eps", "with_absgrad"))
def rasterize_backward(
    inst_table: jax.Array,     # (FEAT, I)
    tile_start: jax.Array,     # (T+1,) int32
    cot_tiles: jax.Array,      # (T, 8, px): channel cotangents + g_T
    fwd_tiles: jax.Array,      # (T, 8, px): forward output rows
    *,
    width: int,
    height: int,
    tile_size: int = 16,
    nch: int = 3,
    interpret: bool = False,
    t_eps: float = T_EPS,
    with_absgrad: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """-> (per-instance grads (NGRAD, I), boundary blocks (T, NGRAD, BLK)).
    Grad rows: [du dv da db dc dop dch0..dch{nch-1} .. |du| |dv| npix]."""
    tiles_x = (width + tile_size - 1) // tile_size
    tiles_y = (height + tile_size - 1) // tile_size
    num_tiles = tiles_x * tiles_y
    px = tile_size * tile_size
    icap = inst_table.shape[1]

    kernel = functools.partial(
        _backward_kernel, tile_size=tile_size, tiles_x=tiles_x, nch=nch,
        with_absgrad=with_absgrad, t_eps=t_eps)
    tri_bf = _tri_lower().astype(jnp.bfloat16)

    grads, bnd = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((BLK, BLK), lambda t, *_: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, px), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 8, px), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, _ngrad_rows(nch), BLK),
                             lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((2, _feat_rows(nch), BWD_MEGA * BLK),
                           jnp.float32),
                pltpu.VMEM((2, _ngrad_rows(nch), BWD_MEGA * BLK),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((_ngrad_rows(nch), icap), jnp.float32),
            jax.ShapeDtypeStruct((num_tiles, _ngrad_rows(nch), BLK),
                                 jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True),
        interpret=interpret,
    )(tile_start, inst_table, tri_bf, cot_tiles, fwd_tiles)
    return grads, bnd


def reduce_instance_grads(grads: jax.Array, bnd: jax.Array,
                          tile_start: jax.Array, exp2sorted: jax.Array,
                          g_offsets: jax.Array, g_counts: jax.Array,
                          nch: int = 3):
    """Per-instance grads -> per-gaussian sums, scatter-free.

    Boundary blocks are added at each tile's first block, the table is
    permuted to expansion order (where each gaussian's instances are
    contiguous), and segments reduce via one cumsum + boundary diffs.
    Sorted positions at or past tile_start[-1] (capacity padding and
    culled instances) are never written by any tile, so they are masked
    out of the gather rather than trusting the buffer contents.

    -> dict(means2d (N,2), conics (N,3), colors (N,nch), opacity (N,),
            absgrad (N,2), npix (N,))."""
    icap = grads.shape[1]
    ngrad = grads.shape[0]
    nb = icap // BLK
    bidx = tile_start[:-1] // BLK                        # (T,)
    gm = grads.reshape(ngrad, nb, BLK)
    gm = gm.at[:, bidx].add(bnd.transpose(1, 0, 2))
    g = gm.reshape(ngrad, icap)

    ge = jnp.take(g, exp2sorted, axis=1)                 # expansion order
    ge = jnp.where((exp2sorted < tile_start[-1])[None, :], ge, 0.0)
    S = jnp.cumsum(ge, axis=1)
    hi = jnp.clip(g_offsets + g_counts - 1, 0, icap - 1)
    lo = g_offsets - 1
    Shi = S[:, hi]
    Slo = jnp.where(lo[None, :] >= 0, S[:, jnp.clip(lo, 0, icap - 1)], 0.0)
    seg = jnp.where((g_counts > 0)[None, :], Shi - Slo, 0.0)   # (ngrad, N)
    return {
        "means2d": seg[0:2].T,
        "conics": seg[2:5].T,
        "opacity": seg[5],
        "colors": seg[ROW_CH:ROW_CH + nch].T,
        "absgrad": seg[6 + nch:8 + nch].T,
        "npix": seg[8 + nch],
    }


# ---------------------------------------------------------------------------
# Differentiable entry (custom VJP over the kernel pair)


@functools.lru_cache(maxsize=None)
def _make_raster(width: int, height: int, tile_size: int, nch: int,
                 interpret: bool, t_eps: float = T_EPS,
                 with_absgrad: bool = True):
    tiles_x = (width + tile_size - 1) // tile_size
    tiles_y = (height + tile_size - 1) // tile_size

    def _fwd_tiles(means2d, conics, colors, opacities, inst_gauss,
                   tile_start):
        table = build_feature_table(means2d, conics, colors, opacities,
                                    inst_gauss)
        out = rasterize_forward(
            table, tile_start, width=width, height=height,
            tile_size=tile_size, nch=nch, interpret=interpret, t_eps=t_eps)
        return table, out

    def _split(out, background):
        img = _tiles_to_image(out[:, 0:nch, :], tiles_x, tiles_y, tile_size,
                              width, height)
        T_px = _tiles_to_image(out[:, ROW_T:ROW_T + 1, :], tiles_x, tiles_y,
                               tile_size, width, height)[..., 0]
        # background composites onto the first 3 (rgb) channels only
        bg_full = jnp.concatenate(
            [background, jnp.zeros((nch - 3,), jnp.float32)]) \
            if nch > 3 else background
        img = img + T_px[..., None] * bg_full[None, None, :]
        return img, T_px

    @jax.custom_vjp
    def raster(means2d, conics, colors, opacities, background,
               absgrad_sink, npix_sink, inst_gauss, tile_start, exp2sorted,
               g_offsets, g_counts):
        _, out = _fwd_tiles(means2d, conics, colors, opacities, inst_gauss,
                            tile_start)
        img, T_px = _split(out, background)
        return img, 1.0 - T_px

    def fwd(means2d, conics, colors, opacities, background,
            absgrad_sink, npix_sink, inst_gauss, tile_start, exp2sorted,
            g_offsets, g_counts):
        table, out = _fwd_tiles(means2d, conics, colors, opacities,
                                inst_gauss, tile_start)
        img, T_px = _split(out, background)
        res = (table, out, background, T_px, tile_start, exp2sorted,
               g_offsets, g_counts)
        return (img, 1.0 - T_px), res

    def bwd(res, cot):
        (table, out, background, T_px, tile_start, exp2sorted,
         g_offsets, g_counts) = res
        g_img, g_alpha = cot
        # dL/dT enters via bg-composite (+g_rgb.bg) and alpha=1-T
        # (-g_alpha); the kernel applies dT/da_i = -T/(1-a_i) with a folded
        # sign: g_T row = g_alpha - g_rgb.bg
        g_T_img = g_alpha - jnp.einsum(
            "hwc,c->hw", g_img[..., :3], background)
        pad = jnp.zeros((*g_img.shape[:2], 7 - nch), jnp.float32)
        cot_img = jnp.concatenate(
            [g_img, pad, g_T_img[..., None]], axis=-1)
        cot_tiles = _image_to_tiles(cot_img, tiles_x, tiles_y, tile_size)
        grads, bnd = rasterize_backward(
            table, tile_start, cot_tiles, out, width=width, height=height,
            tile_size=tile_size, nch=nch, interpret=interpret, t_eps=t_eps,
            with_absgrad=with_absgrad)
        g = reduce_instance_grads(grads, bnd, tile_start, exp2sorted,
                                  g_offsets, g_counts, nch=nch)
        d_bg = jnp.einsum("hwc,hw->c", g_img[..., :3], T_px)
        return (g["means2d"], g["conics"], g["colors"], g["opacity"],
                d_bg, g["absgrad"], g["npix"], None, None, None, None, None)

    raster.defvjp(fwd, bwd)
    return raster


@functools.lru_cache(maxsize=None)
def _make_raster_binned(width: int, height: int, tile_size: int, nch: int,
                        interpret: bool, t_eps: float, with_absgrad: bool,
                        instance_capacity: int, mt: int):
    """Custom-VJP raster with the round-5 Pallas binning INSIDE: the
    per-instance features ride the (tile|depth) sort as payload (measured:
    sort payload cost saturates — key+12 words cost what key+4 does), so
    there is no feature gather in the forward and no permutation gather in
    the backward (grads ride ONE owner-keyed sort back to expansion
    order). See pallas_bin.py for the measured scaling laws."""
    from divshot_tpu.raster import pallas_bin as PB
    tiles_x = (width + tile_size - 1) // tile_size
    tiles_y = (height + tile_size - 1) // tile_size

    def _fwd(means2d, conics, colors, opacities, background,
             depths, radii, radii_xy, rad2):
        bins = PB.expand_sorted(
            means2d, conics, depths, radii, radii_xy, rad2, colors,
            opacities, width=width, height=height, tile_size=tile_size,
            instance_capacity=instance_capacity, mt=mt, interpret=interpret)
        out = rasterize_forward(
            bins.table, bins.tile_start, width=width, height=height,
            tile_size=tile_size, nch=nch, interpret=interpret, t_eps=t_eps)
        img = _tiles_to_image(out[:, 0:nch, :], tiles_x, tiles_y, tile_size,
                              width, height)
        T_px = _tiles_to_image(out[:, ROW_T:ROW_T + 1, :], tiles_x, tiles_y,
                               tile_size, width, height)[..., 0]
        bg_full = jnp.concatenate(
            [background, jnp.zeros((nch - 3,), jnp.float32)]) \
            if nch > 3 else background
        img = img + T_px[..., None] * bg_full[None, None, :]
        return bins, out, img, T_px

    @jax.custom_vjp
    def raster(means2d, conics, colors, opacities, background,
               absgrad_sink, npix_sink, depths, radii, radii_xy, rad2):
        bins, out, img, T_px = _fwd(means2d, conics, colors, opacities,
                                    background, depths, radii, radii_xy,
                                    rad2)
        return (img, 1.0 - T_px, bins.num_instances,
                jnp.max(bins.tile_counts))

    def fwd(means2d, conics, colors, opacities, background,
            absgrad_sink, npix_sink, depths, radii, radii_xy, rad2):
        bins, out, img, T_px = _fwd(means2d, conics, colors, opacities,
                                    background, depths, radii, radii_xy,
                                    rad2)
        res = (bins, out, background, T_px)
        outs = (img, 1.0 - T_px, bins.num_instances,
                jnp.max(bins.tile_counts))
        return outs, res

    def bwd(res, cot):
        bins, out, background, T_px = res
        g_img, g_alpha, _g_ni, _g_mtc = cot
        g_T_img = g_alpha - jnp.einsum(
            "hwc,c->hw", g_img[..., :3], background)
        pad = jnp.zeros((*g_img.shape[:2], 7 - nch), jnp.float32)
        cot_img = jnp.concatenate(
            [g_img, pad, g_T_img[..., None]], axis=-1)
        cot_tiles = _image_to_tiles(cot_img, tiles_x, tiles_y, tile_size)
        grads, bnd = rasterize_backward(
            bins.table, bins.tile_start, cot_tiles, out,
            width=width, height=height, tile_size=tile_size, nch=nch,
            interpret=interpret, t_eps=t_eps, with_absgrad=with_absgrad)
        g = PB.reduce_grads_sorted(grads, bnd, bins.tile_start,
                                   bins.s_owner, bins.g_offsets,
                                   bins.g_counts, nch=nch,
                                   with_absgrad=with_absgrad)
        d_bg = jnp.einsum("hwc,hw->c", g_img[..., :3], T_px)
        return (g["means2d"], g["conics"], g["colors"], g["opacity"],
                d_bg, g["absgrad"], g["npix"], None, None, None, None)

    raster.defvjp(fwd, bwd)
    return raster


def rasterize_pallas_binned(
    means2d, conics, colors, opacities, proj,
    *, width: int, height: int, tile_size: int = 16,
    instance_capacity: int = 1 << 20, max_tiles_per_gaussian: int = 64,
    background=None, absgrad_sink=None, npix_sink=None,
    t_eps: float = T_EPS, interpret: bool = False, with_absgrad: bool = True,
):
    """Differentiable raster with integrated Pallas binning (round 5):
    -> (img (H, W, C), alpha (H, W), num_instances, max_tile_count).

    ``proj`` supplies the stop-grad binning geometry (depths, radii,
    radii_xy, rad2)."""
    if background is None:
        background = jnp.zeros((3,), jnp.float32)
    if absgrad_sink is None:
        absgrad_sink = jnp.zeros((means2d.shape[0], 2), jnp.float32)
    if npix_sink is None:
        npix_sink = jnp.zeros((means2d.shape[0],), jnp.float32)
    nch = colors.shape[1]
    sg = jax.lax.stop_gradient
    fn = _make_raster_binned(width, height, tile_size, nch, interpret,
                             t_eps, with_absgrad, instance_capacity,
                             max_tiles_per_gaussian)
    return fn(means2d, conics, colors, opacities, background,
              absgrad_sink, npix_sink, sg(proj.depths), sg(proj.radii),
              sg(proj.radii_xy), sg(proj.rad2))


def rasterize_pallas(
    means2d, conics, colors, opacities, bins,
    *, width: int, height: int, tile_size: int = 16,
    background=None, absgrad_sink=None, npix_sink=None,
    t_eps: float = T_EPS, interpret: bool = False,
    with_absgrad: bool = True,
):
    """Differentiable Pallas rasterization: -> (img (H, W, C), alpha (H, W)).

    ``colors`` may carry up to 7 channels (rgb first; extra planes
    composite with the same weights — depth, depth², normals, ...).
    ``bins`` is the TileBins from ``tiles.bin_gaussians``. Pass
    ``with_absgrad=False`` to skip the AbsGS |du|/|dv| per-pixel rows in the
    backward (MCMC runs don't consume them)."""
    if background is None:
        background = jnp.zeros((3,), jnp.float32)
    if absgrad_sink is None:
        absgrad_sink = jnp.zeros((means2d.shape[0], 2), jnp.float32)
    if npix_sink is None:
        npix_sink = jnp.zeros((means2d.shape[0],), jnp.float32)
    nch = colors.shape[1]
    fn = _make_raster(width, height, tile_size, nch, interpret, t_eps,
                      with_absgrad)
    return fn(means2d, conics, colors, opacities, background,
              absgrad_sink, npix_sink, bins.inst_gauss, bins.tile_start,
              bins.exp2sorted, bins.g_offsets, bins.g_counts)
