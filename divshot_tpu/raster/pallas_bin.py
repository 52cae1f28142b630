"""Pallas TPU instance binning: one-hot window decode + feature-riding sort.

Round-5 rewrite of the capacity-scaled XLA binning glue. The r4 pipeline
(boundary scatter -> cummax -> hold-last gather -> corner-cull gather ->
sort -> feature gather) cost ~410 ms at 1M@1080p/2^23 because XLA HBM
gathers/scatters run at 5-35 ns per row on this chip (runs/glue_profile.py).
Measured scaling laws that shape this design:

- ``lax.sort`` payload cost SATURATES: key+12 f32 payloads cost the same
  27.9 ms at 2^23 as key+4 — so per-instance features RIDE THE SORT and no
  post-sort gather exists at all.
- the expansion itself (run-length decode of per-gaussian rows to instance
  slots) runs as a Pallas kernel: for each 256-instance block, the owning
  gaussians lie in a 272-row window of the gaussian table (every gaussian
  emits >= 1 instance), so a (272, 256) compare matrix against the
  exclusive-offset column gives an exact one-hot selection matrix D
  (adjacent difference of the monotone compare matrix), and ONE bf16 MXU
  pass ``window^T @ D`` decodes every per-gaussian channel to instance
  lanes. Exactness: D is exactly {0,1} in bf16 and each output column has
  exactly one nonzero product, so transport is bit-exact; f32 channels are
  pre-split into 3 bf16 components (8+8+8 = 24 mantissa bits) and int
  channels into 8-bit components.

The reference's analog is the expand + radix-sort in ``gpu_sort.cpp:16-25``;
this file is its TPU-native replacement (no atomics, no scatters).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

J = 256          # instances decoded per grid step (output lanes)
KW = 272         # gaussian window rows: J + 8 (sublane align) + 8 (slack)
NOUT = 16        # output rows: key, owner, u, v, a, b, c, logop, ch0..ch6, pad


class SortedBins(NamedTuple):
    """Depth-sorted per-tile instances with features already in place."""
    table: jax.Array        # (FEAT, I) f32 — raster kernel input rows
                            # [u v a b c logop ch...] (pallas_raster layout)
    tile_start: jax.Array   # (T+1,) int32
    s_owner: jax.Array      # (I,) int32 gaussian id per sorted instance
                            # (0x7FFFFFFF for out-of-range padding)
    g_offsets: jax.Array    # (N,) int32 exclusive instance offsets
    g_counts: jax.Array     # (N,) int32 instances per gaussian
    num_instances: jax.Array  # () int32 true (pre-cap) demand
    tile_counts: jax.Array  # (T,) int32


def _split3(x):
    """f32 -> 3 bf16 components summing exactly back to x (24 mantissa
    bits)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


ROW_F32 = 12        # first f32 3-split channel row in gdata


def _expand_kernel(gs8_ref, meta_ref, gdata_hbm, out_ref, gscr, gsem,
                   *, nch: int, tw: int, tile_size: int, depth_bits: int):
    """One grid step decodes J instances. See module docstring."""
    b = pl.program_id(0)
    nblk = pl.num_programs(0)
    total = meta_ref[0]

    def dma(c):
        start = pl.multiple_of(gs8_ref[c], 8)
        return pltpu.make_async_copy(
            gdata_hbm.at[pl.ds(start, KW), :], gscr.at[c % 2],
            gsem.at[c % 2])

    @pl.when(b == 0)
    def _():
        dma(0).start()

    @pl.when(b + 1 < nblk)
    def _():
        dma(b + 1).start()

    dma(b).wait()

    win = gscr[b % 2]                      # (KW, 128) bf16
    start8 = gs8_ref[b]

    i0 = b * J
    j_lane = jax.lax.broadcasted_iota(jnp.int32, (1, J), 1)
    i_col = i0 + j_lane                                        # (1, J)

    # exclusive offsets from their 7-bit components (each <= 127, exact in
    # bf16); reconstruction in INT32 — offsets reach ~2^25 at the 3M/2^24
    # scale point, beyond f32's exact-integer range
    w = win.astype(jnp.float32)
    o3 = w[:, 8:9].astype(jnp.int32)
    o2 = w[:, 9:10].astype(jnp.int32)
    o1 = w[:, 10:11].astype(jnp.int32)
    o0 = w[:, 11:12].astype(jnp.int32)
    offs = (((o3 << 7 | o2) << 7) | o1) << 7 | o0              # (KW, 1)

    # one-hot selection: C monotone non-increasing down k; D = C - C_next
    C = (offs <= i_col).astype(jnp.float32)                    # (KW, J)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (KW, 1), 0)
    C_next = jnp.where(k_iota < KW - 1, pltpu.roll(C, KW - 1, 0), 0.0)
    D = (C - C_next).astype(jnp.bfloat16)                      # (KW, J)

    dims = (((0,), (0,)), ((), ()))
    vals = jax.lax.dot_general(win, D, dims,
                               preferred_element_type=jnp.float32)

    # window-relative offset + rank channels (range-reduced so 2 exact
    # bf16 components suffice)
    offrel = jnp.clip(offs - i0, -300, 400) + 300              # [0, 700]
    aux = jnp.concatenate([
        (offrel // 256).astype(jnp.bfloat16),
        (offrel % 256).astype(jnp.bfloat16),
        (k_iota // 256).astype(jnp.bfloat16),
        (k_iota % 256).astype(jnp.bfloat16),
    ], axis=1)                                                 # (KW, 4)
    avals = jax.lax.dot_general(aux, D, dims,
                                preferred_element_type=jnp.float32)
    off_own = (avals[0:1] * 256.0 + avals[1:2]).astype(jnp.int32) - 300 + i0
    owner = start8 + (avals[2:3] * 256.0 + avals[3:4]).astype(jnp.int32)
    j_local = j_lane - (off_own - i0)                          # i - off_own

    counts = vals[0:1].astype(jnp.int32)
    nx = (vals[1:2] * 256.0 + vals[2:3]).astype(jnp.int32)
    tmx = vals[3:4].astype(jnp.int32)
    tmy = vals[4:5].astype(jnp.int32)
    top24 = ((vals[5:6] * 256.0 + vals[6:7]) * 256.0
             + vals[7:8]).astype(jnp.int32)                    # dbits >> 8

    def f32row(r):
        r = ROW_F32 + 3 * r
        return vals[r:r + 1] + vals[r + 1:r + 2] + vals[r + 2:r + 3]

    u = f32row(0)
    v = f32row(1)
    ca = f32row(2)
    cb = f32row(3)
    cc = f32row(4)
    logop = f32row(5)
    rad2 = f32row(6)
    chans = [f32row(7 + c) for c in range(nch)]

    # tile of this instance (j < 256, nx < 2^13: f32 floor-div is exact)
    nx_s = jnp.maximum(nx, 1)
    jy = jnp.floor(j_local.astype(jnp.float32)
                   / nx_s.astype(jnp.float32)).astype(jnp.int32)
    jx = j_local - jy * nx_s
    tx = tmx + jx
    ty = tmy + jy
    tile = ty * tw + tx

    # corner cull (exact lower bound on the quadratic over the tile rect)
    ts_f = float(tile_size)
    ttx = tx.astype(jnp.float32) * ts_f
    tty = ty.astype(jnp.float32) * ts_f
    dx = jnp.maximum(jnp.maximum(ttx - u, u - (ttx + ts_f)), 0.0)
    dy = jnp.maximum(jnp.maximum(tty - v, v - (tty + ts_f)), 0.0)
    near = dx * dx + dy * dy <= rad2

    in_range = (i_col < total) & (j_local >= 0) & (j_local < counts)
    valid = in_range & near

    # use every available depth bit: the key's depth field is depth_bits
    # wide and we transport the top 24 bits of the depth pattern
    db = min(depth_bits, 24)
    dval = (top24 >> (24 - db)).astype(jnp.uint32)
    key = jnp.where(
        valid,
        (tile.astype(jnp.uint32) << depth_bits)
        | (dval << (depth_bits - db)),
        jnp.uint32(0xFFFFFFFF))
    owner_out = jnp.where(in_range, owner, jnp.int32(0x7FFFFFFF))

    bc = lambda x: jax.lax.bitcast_convert_type(x, jnp.uint32)
    rows = [key, owner_out.astype(jnp.uint32),
            bc(u), bc(v), bc(ca), bc(cb), bc(cc), bc(logop)]
    rows += [bc(ch) for ch in chans]
    rows += [jnp.zeros((1, J), jnp.uint32)] * (NOUT - len(rows))
    out_ref[...] = jnp.concatenate(rows, axis=0)


def prep_gdata(means2d, conics, depths, radii, radii_xy, rad2, colors,
               opacities, width, height, tile_size, mt):
    """-> (gdata (Npad, n_rows) bf16, offs (Npad, 8) i32, counts, offsets,
    total, tw, th). Channel layout must match _expand_kernel."""
    n = means2d.shape[0]
    nch = colors.shape[1]
    tw = -(-width // tile_size)
    th = -(-height // tile_size)
    u, v = means2d[:, 0], means2d[:, 1]
    rx = radii_xy[:, 0] if radii_xy is not None else radii
    ry = radii_xy[:, 1] if radii_xy is not None else radii
    visible = radii > 0
    tmin_x = jnp.clip(jnp.floor((u - rx) / tile_size), 0, tw).astype(jnp.int32)
    tmax_x = jnp.clip(jnp.ceil((u + rx) / tile_size), 0, tw).astype(jnp.int32)
    tmin_y = jnp.clip(jnp.floor((v - ry) / tile_size), 0, th).astype(jnp.int32)
    tmax_y = jnp.clip(jnp.ceil((v + ry) / tile_size), 0, th).astype(jnp.int32)
    nx = tmax_x - tmin_x
    counts = jnp.minimum(jnp.where(visible, nx * (tmax_y - tmin_y), 0), mt)
    offsets = jnp.cumsum(counts) - counts
    total = offsets[-1] + counts[-1]

    from divshot_tpu.raster.pallas_raster import LOGOP_FLOOR
    logop = jnp.maximum(jnp.log(jnp.maximum(opacities, 1e-35)), LOGOP_FLOOR)
    dbits = jax.lax.bitcast_convert_type(
        jnp.where(depths > 0, depths, jnp.inf), jnp.uint32)
    top24 = (dbits >> 8).astype(jnp.int32)
    r2 = rad2 if rad2 is not None else jnp.full((n,), 1e30, jnp.float32)

    int_rows = [counts, nx // 256, nx % 256, tmin_x, tmin_y,
                top24 >> 16, (top24 >> 8) % 256, top24 % 256,
                # exclusive offsets as 4 exact 7-bit components (< 2^28 —
                # the 3M scale point reaches ~2^25 instances); padding
                # rows get the max pattern so compares stay false
                offsets >> 21, (offsets >> 14) % 128,
                (offsets >> 7) % 128, offsets % 128]
    f32_chans = [u, v, conics[:, 0], conics[:, 1], conics[:, 2], logop, r2]
    f32_chans += [colors[:, c] for c in range(nch)]

    rows = [r.astype(jnp.bfloat16) for r in int_rows]
    for ch in f32_chans:
        rows.extend(_split3(ch))
    n_rows = len(rows)                       # 12 + 3*(7 + nch) <= 54
    assert n_rows <= 128
    gdata = jnp.stack(rows, axis=1)          # (N, n_rows) bf16

    npad = -(-n // 8) * 8 + KW
    gdata = jnp.pad(gdata, ((0, npad - n), (0, 128 - n_rows)))
    # padding gaussians: offset components = 127 -> offs = 2^28 - 1 > any
    # real instance index, so they are never selected
    pad_mask = jnp.arange(npad) >= n
    for r in (8, 9, 10, 11):
        gdata = gdata.at[:, r].set(
            jnp.where(pad_mask, jnp.bfloat16(127.0), gdata[:, r]))
    return gdata, counts, offsets, total, tw, th


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size", "instance_capacity",
                     "mt", "nch", "interpret", "guard_lanes",
                     "ride_features", "build_table"))
def expand_sorted(
    means2d, conics, depths, radii, radii_xy, rad2, colors, opacities,
    *, width: int, height: int, tile_size: int = 16,
    instance_capacity: int = 1 << 20, mt: int = 64, nch: int | None = None,
    interpret: bool = False, guard_lanes: int = 2048,
    ride_features: bool = False, build_table: bool = True,
) -> SortedBins:
    """Full binning: expand -> (tile|depth) sort with features riding as
    payload -> per-tile ranges. Replaces ``tiles.bin_gaussians`` +
    ``pallas_raster.build_feature_table`` for the Pallas raster path."""
    n = means2d.shape[0]
    nch = colors.shape[1] if nch is None else nch
    assert nch <= 7
    assert mt <= 256
    cap = instance_capacity
    tw = -(-width // tile_size)
    th = -(-height // tile_size)
    num_tiles = tw * th
    assert num_tiles < (1 << 19), "tile grid too large for packed keys"
    tile_bits = max(1, (num_tiles + 1).bit_length())
    depth_bits = 32 - tile_bits

    gdata, counts, offsets, total, tw, th = prep_gdata(
        means2d, conics, depths, radii, radii_xy, rad2, colors, opacities,
        width, height, tile_size, mt)

    nblk = cap // J
    block_starts = jnp.arange(nblk, dtype=jnp.int32) * J
    gs = jnp.clip(
        jnp.searchsorted(offsets, block_starts, side="right").astype(
            jnp.int32) - 1, 0, max(n - 1, 0))
    gs8 = (gs // 8) * 8
    meta = jnp.asarray(total, jnp.int32).reshape(1)

    kernel = functools.partial(
        _expand_kernel, nch=nch, tw=tw, tile_size=tile_size,
        depth_bits=depth_bits)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nblk,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((NOUT, J), lambda b, *_: (0, b),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, KW, 128), jnp.bfloat16),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((NOUT, cap), jnp.uint32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(gs8, meta, gdata)

    key = out[0]
    if ride_features:
        # features ride the sort as payload — NO post-sort gather. Each
        # ridden word costs ~9 ms at 2^23 (the earlier "payload cost
        # saturates" measurement was DCE of unused outputs), so this wins
        # only when the gather alternative is slower (huge N).
        feat_rows = 6 + nch                    # u v a b c logop ch...
        sorted_ops = jax.lax.sort(
            (key, out[1]) + tuple(out[2 + r] for r in range(feat_rows)),
            num_keys=1)
        s_key = sorted_ops[0]
        s_owner = sorted_ops[1].astype(jnp.int32)
        table = jax.lax.bitcast_convert_type(
            jnp.stack(sorted_ops[2:], axis=0), jnp.float32)

        from divshot_tpu.raster.pallas_raster import _feat_rows, \
            LOGOP_FLOOR
        pad_rows = _feat_rows(nch) - feat_rows
        if pad_rows:
            table = jnp.concatenate(
                [table, jnp.zeros((pad_rows, cap), jnp.float32)], axis=0)
        # dead lanes must carry a dead log-opacity (kernel reads through
        # them in partial blocks)
        dead = s_key == jnp.uint32(0xFFFFFFFF)
        table = table.at[5].set(jnp.where(dead, LOGOP_FLOOR, table[5]))
    else:
        # default: 2-payload sort + one gather from the SMALL (rows, N)
        # per-gaussian feature matrix — cheaper than riding ~9 words
        # through the sort (gather scales with N, riding with capacity)
        s_key, s_own_u = jax.lax.sort((key, out[1]), num_keys=1)
        s_owner = s_own_u.astype(jnp.int32)
        if build_table:
            from divshot_tpu.raster.pallas_raster import \
                build_feature_table
            inst = jnp.where(s_key == jnp.uint32(0xFFFFFFFF), -1, s_owner)
            table = build_feature_table(means2d, conics, colors,
                                        opacities, inst)
        else:
            table = None         # caller builds its own (surfel path)

    s_tile = jnp.minimum((s_key >> depth_bits).astype(jnp.int32), num_tiles)
    tile_bounds = jnp.searchsorted(
        s_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32)).astype(jnp.int32)
    tile_bounds = jnp.minimum(tile_bounds,
                              max(cap - guard_lanes, cap // 2))
    return SortedBins(
        table=table, tile_start=tile_bounds, s_owner=s_owner,
        g_offsets=offsets, g_counts=counts, num_instances=total,
        tile_counts=tile_bounds[1:] - tile_bounds[:-1])


def segment_rows_sorted(grads, bnd, tile_start, s_owner, g_offsets,
                        g_counts, rows):
    """Generic owner-sorted segment reduce (the surfel path's variant of
    ``reduce_grads_sorted``): fold boundary blocks, zero dead lanes, ride
    the selected grad ``rows`` through ONE owner-keyed sort back to
    expansion order, cumsum + end-of-segment diff.

    -> (len(rows), N) per-gaussian sums, in ``rows`` order."""
    from divshot_tpu.raster.pallas_raster import BLK
    icap = grads.shape[1]
    ngrad = grads.shape[0]
    nb = icap // BLK
    bidx = tile_start[:-1] // BLK
    gm = grads.reshape(ngrad, nb, BLK)
    gm = gm.at[:, bidx].add(bnd.transpose(1, 0, 2), mode="drop")
    g = gm.reshape(ngrad, icap)

    iota = jnp.arange(icap, dtype=jnp.int32)
    live = iota < tile_start[-1]
    g = jnp.where(live[None, :], g, 0.0)
    okey = jnp.where(s_owner >= 0, s_owner, 0x7FFFFFFF).astype(jnp.uint32)
    sorted_ops = jax.lax.sort(
        (okey,) + tuple(g[r] for r in rows), num_keys=1)
    ge = jnp.stack(sorted_ops[1:], axis=0)
    S = jnp.cumsum(ge, axis=1)
    hi_raw = g_offsets + g_counts - 1
    nr = len(rows)
    E = jnp.where((hi_raw >= 0)[None, :],
                  jnp.take(S, jnp.clip(hi_raw, 0, icap - 1), axis=1), 0.0)
    Eprev = jnp.concatenate(
        [jnp.zeros((nr, 1), S.dtype), E[:, :-1]], axis=1)
    return jnp.where((g_counts > 0)[None, :], E - Eprev, 0.0)


def reduce_grads_sorted(grads, bnd, tile_start, s_owner, g_offsets,
                        g_counts, nch: int = 3, pack_grads: bool = False,
                        with_absgrad: bool = True):
    """Per-instance grads (sorted order) -> per-gaussian sums.

    Scatter-free: boundary blocks are added at tile starts, grads beyond
    the real instance range are zeroed, the table rides ONE
    (owner, grads...) sort back to expansion order (payload cost is free —
    measured sort saturation), and contiguous segments reduce via one
    cumsum + an end-of-segment gather E[g] = S[offsets[g] + counts[g] - 1]
    with E[g] - E[g-1] as the segment sum (prev-alive end == own start-1).

    -> dict(means2d (N,2), conics (N,3), colors (N,nch), opacity (N,),
            absgrad (N,2), npix (N,)); same contract as
    ``pallas_raster.reduce_instance_grads``."""
    from divshot_tpu.raster.pallas_raster import BLK, ROW_CH
    icap = grads.shape[1]
    ngrad = grads.shape[0]
    n = g_offsets.shape[0]
    nb = icap // BLK
    bidx = tile_start[:-1] // BLK
    gm = grads.reshape(ngrad, nb, BLK)
    gm = gm.at[:, bidx].add(bnd.transpose(1, 0, 2), mode="drop")
    g = gm.reshape(ngrad, icap)

    iota = jnp.arange(icap, dtype=jnp.int32)
    live = iota < tile_start[-1]
    g = jnp.where(live[None, :], g, 0.0)
    okey = jnp.where(s_owner >= 0, s_owner, 0x7FFFFFFF).astype(jnp.uint32)

    # only REAL grad rows ride the sort (each ridden word costs ~9 ms at
    # 2^23 — the padding rows and, for MCMC, the zero |du|/|dv| absgrad
    # rows would be pure waste). f16 pair-packing was tried and REVERTED:
    # du/dv accumulate with heavy cancellation (terms ~1e3 summing to
    # ~1e-1), so 10-bit mantissa per term corrupts the means gradient.
    rows = list(range(6 + nch))                   # du dv da db dc dop dch..
    if with_absgrad:
        rows += [6 + nch, 7 + nch]                # |du| |dv|
    rows.append(8 + nch)                          # npix
    sorted_ops = jax.lax.sort(
        (okey,) + tuple(g[r] for r in rows), num_keys=1)
    ge_rows = {r: sorted_ops[1 + i] for i, r in enumerate(rows)}
    zero = jnp.zeros((icap,), jnp.float32)
    ge = jnp.stack([ge_rows.get(r, zero) for r in range(9 + nch)], axis=0)
    S = jnp.cumsum(ge, axis=1)
    ngrad = 9 + nch

    # end-of-segment prefix: E[g] = S[offsets[g] + counts[g] - 1]. For
    # counts==0 this equals S[offsets[g] - 1] (offsets repeat), so
    # E[g-1] is ALWAYS the prefix just before gaussian g's segment —
    # one gather, one shift, no per-segment lo gather needed.
    hi_raw = g_offsets + g_counts - 1
    E = jnp.where((hi_raw >= 0)[None, :],
                  jnp.take(S, jnp.clip(hi_raw, 0, icap - 1), axis=1), 0.0)
    Eprev = jnp.concatenate(
        [jnp.zeros((ngrad, 1), S.dtype), E[:, :-1]], axis=1)
    seg = jnp.where((g_counts > 0)[None, :], E - Eprev, 0.0)
    return {
        "means2d": seg[0:2].T,
        "conics": seg[2:5].T,
        "opacity": seg[5],
        "colors": seg[ROW_CH:ROW_CH + nch].T,
        "absgrad": seg[6 + nch:8 + nch].T,
        "npix": seg[8 + nch],
    }
