"""Pallas TPU rasterization kernels (forward + backward).

TPU-native replacement for the CUDA tile rasterizer (the closed trainer's
``gsplatrast``; tile structure evidenced at ``gaussian_common.hlsl``
GROUP_WIDTH/HEIGHT=16). Key reformulation: per-pixel front-to-back alpha
compositing is an *associative* operation, so per-tile instance lists are
processed in 256-instance chunks whose prefix transmittances come from one
MXU matmul against a constant triangular matrix in log space — no
sequential per-gaussian loop, no atomics.

Early-stop is EXACT CUDA parity without sequential control flow: with
q_i = T_in·Π_{j≤i}(1-α_j) (unmasked running product), the applied set is
exactly {i : q_i ≥ 1e-4} (a prefix, q monotone), and for applied i the true
exclusive transmittance equals the unmasked prefix. Same derivation as the
XLA path (tiles.py).

Layout (Mosaic alignment rules, probed on v5e):
  - instance table: (num_blocks, 16, 256) f32 — feature rows
    [u v a b c r g b op], instances on lanes; whole (16, 256) blocks DMA'd.
  - tile ranges aligned to 256 (tiles.align_instances) so every block
    belongs to exactly one tile — forward DMAs and backward per-block
    gradient writes are tile-exclusive.
  - compute orientation: pixels on sublanes (256 = 16×16 tile), instances
    on lanes (256).
  - per-tile outputs (1, 8, 256): rows r,g,b, T — written via one
    (256, 8) -> (8, 256) transpose.

The backward runs two passes per tile: a cheap forward replay stashing
per-chunk entry transmittances in VMEM, then a reverse sweep computing
dL/d{mean2d, conic, color, opacity} per instance (suffix color sums via a
strict-upper-triangular MXU matmul), written to a per-block gradient table
and segment-summed to gaussians in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.999
T_EPS = 1e-4

BLK = 256            # instances per block (= lanes)
FEAT = 16            # feature rows: u v a b c r g b op (7 pad)
NGRAD = 16           # grad rows: du dv da db dc dr dg db dop |du| |dv| (5 pad)
MAX_CHUNKS = 128     # max blocks per tile in backward T-stash


def _tri_lower(px: int = BLK):
    ii = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
    return (ii <= jj).astype(jnp.float32)


def _prefix_prod_lanes(x):
    """Inclusive prefix product along the lane axis (Hillis-Steele,
    log2(BLK) shift-multiplies — far cheaper than the MXU triangular
    matmul and needs no log/exp round trip)."""
    d = 1
    n = x.shape[1]
    while d < n:
        x = x * jnp.concatenate(
            [jnp.ones_like(x[:, :d]), x[:, :-d]], axis=1)
        d *= 2
    return x


def _suffix_sum_lanes(x):
    """Strict suffix sum along lanes: out[:, i] = sum_{j>i} x[:, j]."""
    # inclusive suffix sum then subtract self
    y = x
    d = 1
    n = x.shape[1]
    while d < n:
        y = y + jnp.concatenate(
            [y[:, d:], jnp.zeros_like(y[:, :d])], axis=1)
        d *= 2
    return y - x


def _tri_upper_strict():
    ii = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (BLK, BLK), 1)
    return (ii > jj).astype(jnp.float32)


def _pixel_grid(tile_size: int, t, tiles_x: int):
    """(px, 1) absolute pixel-center coords for tile t; px on sublanes."""
    px = tile_size * tile_size
    idx = jax.lax.broadcasted_iota(jnp.int32, (px, 1), 0)
    ix = (idx % tile_size).astype(jnp.float32) + 0.5
    iy = (idx // tile_size).astype(jnp.float32) + 0.5
    tile_x = (t % tiles_x).astype(jnp.float32)
    tile_y = (t // tiles_x).astype(jnp.float32)
    return tile_x * tile_size + ix, tile_y * tile_size + iy


def _chunk_geometry(buf, gx, gy, gid_lo, gid_hi):
    """Common per-chunk math. buf (FEAT, BLK); returns alpha etc (px, BLK)."""
    u = buf[0:1, :]
    v = buf[1:2, :]
    ca = buf[2:3, :]
    cb = buf[3:4, :]
    cc = buf[4:5, :]
    op = buf[8:9, :]
    dx = gx - u                                   # (px, BLK)
    dy = gy - v
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
    in_rng = (lane >= gid_lo) & (lane < gid_hi)
    alpha = op * jnp.exp(power)
    valid = (power <= 0.0) & (alpha >= ALPHA_MIN) & in_rng
    alpha = jnp.where(valid, jnp.minimum(alpha, ALPHA_MAX), 0.0)
    return alpha, dx, dy, power


def _forward_kernel(tile_start_ref, inst_hbm, out_ref, scratch, sem,
                    *, tile_size: int, tiles_x: int):
    t = pl.program_id(0)
    start = tile_start_ref[t]          # multiples of BLK (aligned)
    end = tile_start_ref[t + 1]
    px = tile_size * tile_size
    gx, gy = _pixel_grid(tile_size, t, tiles_x)
    tri = _tri_lower()
    nchunks = pl.cdiv(end - start, BLK)

    def dma(c):
        return pltpu.make_async_copy(
            inst_hbm.at[start // BLK + c], scratch.at[c % 2], sem.at[c % 2])

    @pl.when(nchunks > 0)
    def _():
        dma(0).start()

    def body(c, carry):
        T_px, ar, ag, ab = carry
        # double buffer: kick off the next chunk's DMA before waiting
        @pl.when(c + 1 < nchunks)
        def _():
            dma(c + 1).start()

        dma(c).wait()
        buf = scratch[c % 2]
        alpha, _, _, _ = _chunk_geometry(
            buf, gx, gy, 0, end - (start + c * BLK))
        one_m = 1.0 - alpha
        L = jnp.log(one_m)
        incl = jnp.exp(jnp.dot(L, tri, preferred_element_type=jnp.float32))
        q_incl = T_px * incl
        applied = q_incl >= T_EPS
        w = jnp.where(applied, alpha * T_px * (incl / one_m), 0.0)
        cr = buf[5:6, :]
        cg = buf[6:7, :]
        cb2 = buf[7:8, :]
        ar = ar + jnp.sum(w * cr, axis=1, keepdims=True)
        ag = ag + jnp.sum(w * cg, axis=1, keepdims=True)
        ab = ab + jnp.sum(w * cb2, axis=1, keepdims=True)
        T_px = jnp.min(jnp.where(applied, q_incl, T_px), axis=1,
                       keepdims=True)
        return T_px, ar, ag, ab

    def cond(state):
        c, (T_px, *_r) = state
        return (c < nchunks) & (jnp.max(T_px) >= T_EPS)

    def wbody(state):
        c, carry = state
        return c + 1, body(c, carry)

    init = (jnp.ones((px, 1), jnp.float32),
            jnp.zeros((px, 1), jnp.float32),
            jnp.zeros((px, 1), jnp.float32),
            jnp.zeros((px, 1), jnp.float32))
    c_exit, (T_px, ar, ag, ab) = jax.lax.while_loop(
        cond, wbody, (jnp.int32(0), init))

    # drain the in-flight prefetch if the T-threshold exited the loop early
    @pl.when(c_exit < nchunks)
    def _():
        dma(c_exit).wait()

    ch = jax.lax.broadcasted_iota(jnp.int32, (px, 8), 1)
    packed = (jnp.where(ch == 0, ar, 0.0) + jnp.where(ch == 1, ag, 0.0)
              + jnp.where(ch == 2, ab, 0.0) + jnp.where(ch == 3, T_px, 0.0))
    out_ref[0, :, :] = packed.T                   # (8, px)


def build_instance_table(means2d, conics, colors, opacities,
                         inst_gauss) -> jax.Array:
    """(num_blocks, FEAT, BLK) f32 feature blocks in aligned sorted order."""
    n = means2d.shape[0]
    safe = jnp.clip(inst_gauss, 0, n - 1)
    op = jnp.where(inst_gauss >= 0, opacities[safe], 0.0)
    feat = jnp.concatenate([
        means2d[safe], conics[safe], colors[safe], op[:, None],
    ], axis=1)                                    # (I, 9)
    i = feat.shape[0]
    assert i % BLK == 0, "aligned instance buffer must be BLK-multiple"
    feat = jnp.pad(feat, ((0, 0), (0, FEAT - feat.shape[1])))
    return feat.reshape(i // BLK, BLK, FEAT).transpose(0, 2, 1)


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
    jax.jit, static_argnames=("width", "height", "tile_size", "interpret"))
def rasterize_forward(
    inst_table: jax.Array,     # (nb, FEAT, BLK)
    tile_start: jax.Array,     # (T+1,) int32, BLK-aligned
    *,
    width: int,
    height: int,
    tile_size: int = 16,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """-> (rgb (H, W, 3), transmittance T (H, W))."""
    tiles_x = (width + tile_size - 1) // tile_size
    tiles_y = (height + tile_size - 1) // tile_size
    num_tiles = tiles_x * tiles_y
    px = tile_size * tile_size

    kernel = functools.partial(
        _forward_kernel, tile_size=tile_size, tiles_x=tiles_x)

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, 8, px), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, FEAT, BLK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, px), jnp.float32),
        interpret=interpret,
    )(tile_start, inst_table)

    img = _tiles_to_image(out[:, 0:3, :], tiles_x, tiles_y, tile_size,
                          width, height)
    T_px = _tiles_to_image(out[:, 3:4, :], tiles_x, tiles_y, tile_size,
                           width, height)[..., 0]
    return img, T_px


# ---------------------------------------------------------------------------
# Backward


def _backward_kernel(tile_start_ref, inst_hbm, cot_ref, grad_hbm,
                     scratch, gscratch, tstash, sem, gsem,
                     *, tile_size: int, tiles_x: int):
    """Per tile: pass 1 replays the forward stashing per-chunk entry
    transmittance; pass 2 walks chunks in reverse emitting per-instance
    gradients into grad_hbm blocks (same block indexing as inst blocks).

    cot_ref: auto-blocked (1, 8, px) rows [g_r g_g g_b g_T]
    (g_T = g_alpha − g_img·bg, combined in XLA)."""
    t = pl.program_id(0)
    start = tile_start_ref[t]
    end = tile_start_ref[t + 1]
    px = tile_size * tile_size
    gx, gy = _pixel_grid(tile_size, t, tiles_x)
    tri = _tri_lower()
    triu = _tri_upper_strict()

    total_chunks = pl.cdiv(end - start, BLK)
    nchunks = jnp.minimum(total_chunks, MAX_CHUNKS)

    # ---- pass 1: forward replay, stash T at chunk entry ----
    def body1(state):
        c, T_px = state
        tstash[pl.ds(c, 1), :] = T_px.T
        b = start // BLK + c
        cp = pltpu.make_async_copy(inst_hbm.at[b], scratch, sem)
        cp.start()
        cp.wait()
        alpha, _, _, _ = _chunk_geometry(
            scratch[:], gx, gy, 0, end - (start + c * BLK))
        one_m = 1.0 - alpha
        L = jnp.log(one_m)
        incl = jnp.exp(jnp.dot(L, tri, preferred_element_type=jnp.float32))
        q_incl = T_px * incl
        applied = q_incl >= T_EPS
        T_px = jnp.min(jnp.where(applied, q_incl, T_px), axis=1,
                       keepdims=True)
        return c + 1, T_px

    def cond1(state):
        c, T_px = state
        return (c < nchunks) & (jnp.max(T_px) >= T_EPS)

    c_done, T_final = jax.lax.while_loop(
        cond1, body1, (jnp.int32(0), jnp.ones((px, 1), jnp.float32)))

    # cotangents for this tile (px to sublanes)
    g_r = cot_ref[0, 0:1, :].T
    g_g = cot_ref[0, 1:2, :].T
    g_b = cot_ref[0, 2:3, :].T
    g_T = cot_ref[0, 3:4, :].T

    # zero the grad blocks pass 2 will not visit (early-stopped tail)
    def zbody(c, _):
        b = start // BLK + c
        gscratch[:] = jnp.zeros((NGRAD, BLK), jnp.float32)
        cp = pltpu.make_async_copy(gscratch, grad_hbm.at[b], gsem)
        cp.start()
        cp.wait()
        return 0

    jax.lax.fori_loop(c_done, total_chunks, zbody, 0)

    # ---- pass 2: reverse sweep ----
    def body2(k, carry):
        rear_r, rear_g, rear_b = carry
        c = c_done - 1 - k
        b = start // BLK + c
        cp = pltpu.make_async_copy(inst_hbm.at[b], scratch, sem)
        cp.start()
        cp.wait()
        buf = scratch[:]
        T_in = tstash[pl.ds(c, 1), :].T               # (px, 1)
        alpha, dx, dy, power = _chunk_geometry(
            buf, gx, gy, 0, end - (start + c * BLK))
        one_m = 1.0 - alpha
        L = jnp.log(one_m)
        incl = jnp.exp(jnp.dot(L, tri, preferred_element_type=jnp.float32))
        q_incl = T_in * incl
        applied = q_incl >= T_EPS
        T_excl = T_in * (incl / one_m)
        w = jnp.where(applied, alpha * T_excl, 0.0)

        cr = buf[5:6, :]
        cg = buf[6:7, :]
        cb2 = buf[7:8, :]
        wc_r = w * cr
        wc_g = w * cg
        wc_b = w * cb2
        # rear_i = rear_carry + Σ_{j>i in chunk} wc_j  (strict suffix)
        suf_r = jnp.dot(wc_r, triu, preferred_element_type=jnp.float32)
        suf_g = jnp.dot(wc_g, triu, preferred_element_type=jnp.float32)
        suf_b = jnp.dot(wc_b, triu, preferred_element_type=jnp.float32)
        inv_om = 1.0 / one_m
        d_alpha = (
            g_r * (cr * T_excl - (rear_r + suf_r) * inv_om)
            + g_g * (cg * T_excl - (rear_g + suf_g) * inv_om)
            + g_b * (cb2 * T_excl - (rear_b + suf_b) * inv_om)
            + g_T * T_final * inv_om)
        live = applied & (alpha > 0.0) & (alpha < ALPHA_MAX)
        d_alpha = jnp.where(live, d_alpha, 0.0)

        op = buf[8:9, :]
        G = jnp.exp(power)
        d_op = d_alpha * G
        d_power = d_alpha * alpha
        ca = buf[2:3, :]
        cb = buf[3:4, :]
        cc = buf[4:5, :]
        d_a = -0.5 * dx * dx * d_power
        d_b = -dx * dy * d_power
        d_c = -0.5 * dy * dy * d_power
        d_u = (ca * dx + cb * dy) * d_power
        d_v = (cc * dy + cb * dx) * d_power
        d_cr = w * g_r
        d_cg = w * g_g
        d_cb = w * g_b

        # reduce over pixels (sublanes) -> (1, BLK) rows; pack (BLK, NGRAD)
        def red(x):
            return jnp.sum(x, axis=0, keepdims=True)   # (1, BLK)

        rows = [red(d_u), red(d_v), red(d_a), red(d_b), red(d_c),
                red(d_cr), red(d_cg), red(d_cb), red(d_op),
                red(jnp.abs(d_u)), red(jnp.abs(d_v))]
        for j, r in enumerate(rows):
            gscratch[pl.ds(j, 1), :] = r
        gscratch[pl.ds(11, 1), :] = jnp.zeros((1, BLK), jnp.float32)
        for j in range(12, NGRAD):
            gscratch[pl.ds(j, 1), :] = jnp.zeros((1, BLK), jnp.float32)
        cp2 = pltpu.make_async_copy(gscratch, grad_hbm.at[b], gsem)
        cp2.start()
        cp2.wait()

        rear_r = rear_r + jnp.sum(wc_r, axis=1, keepdims=True)
        rear_g = rear_g + jnp.sum(wc_g, axis=1, keepdims=True)
        rear_b = rear_b + jnp.sum(wc_b, axis=1, keepdims=True)
        return rear_r, rear_g, rear_b

    zero = jnp.zeros((px, 1), jnp.float32)
    jax.lax.fori_loop(0, c_done, body2, (zero, zero, zero))


@functools.partial(
    jax.jit, static_argnames=("width", "height", "tile_size", "interpret"))
def rasterize_backward(
    inst_table: jax.Array,     # (nb, FEAT, BLK)
    tile_start: jax.Array,     # (T+1,) int32, BLK-aligned
    cot_tiles: jax.Array,      # (T, 8, px): rows g_r g_g g_b g_T
    *,
    width: int,
    height: int,
    tile_size: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """-> per-instance gradient table (nb, NGRAD, BLK):
    rows [du dv da db dc dr dg db dop |du| |dv|]."""
    tiles_x = (width + tile_size - 1) // tile_size
    tiles_y = (height + tile_size - 1) // tile_size
    num_tiles = tiles_x * tiles_y
    px = tile_size * tile_size
    nb = inst_table.shape[0]

    kernel = functools.partial(
        _backward_kernel, tile_size=tile_size, tiles_x=tiles_x)

    grads = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, 8, px), lambda t, *_: (t, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[
                pltpu.VMEM((FEAT, BLK), jnp.float32),
                pltpu.VMEM((NGRAD, BLK), jnp.float32),
                pltpu.VMEM((MAX_CHUNKS, px), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nb, NGRAD, BLK), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(tile_start, inst_table, cot_tiles)
    return grads


def scatter_instance_grads(grad_table: jax.Array, inst_gauss: jax.Array,
                           num_gaussians: int):
    """Segment-sum per-instance grads back to gaussians (atomics-free).

    -> dict(means2d (N,2), conics (N,3), colors (N,3), opacity (N,),
            absgrad (N,2))."""
    nb = grad_table.shape[0]
    g = grad_table.transpose(0, 2, 1).reshape(nb * BLK, NGRAD)
    ids = inst_gauss[: nb * BLK]
    sids = jnp.where(ids >= 0, ids, num_gaussians)
    zeros = jnp.zeros((num_gaussians, NGRAD), jnp.float32)
    acc = zeros.at[sids].add(g, mode="drop")
    return {
        "means2d": acc[:, 0:2],
        "conics": acc[:, 2:5],
        "colors": acc[:, 5:8],
        "opacity": acc[:, 8],
        "absgrad": acc[:, 9:11],
    }


# ---------------------------------------------------------------------------
# Differentiable entry (custom VJP over the kernel pair)


@functools.lru_cache(maxsize=None)
def _make_raster(width: int, height: int, tile_size: int, interpret: bool):
    tiles_x = (width + tile_size - 1) // tile_size
    tiles_y = (height + tile_size - 1) // tile_size

    @jax.custom_vjp
    def raster(means2d, conics, colors, opacities, background,
               absgrad_sink, inst_gauss, tile_start):
        inst = build_instance_table(means2d, conics, colors, opacities,
                                    inst_gauss)
        img, T_px = rasterize_forward(
            inst, tile_start, width=width, height=height,
            tile_size=tile_size, interpret=interpret)
        img = img + T_px[..., None] * background[None, None, :]
        return img, 1.0 - T_px

    def fwd(means2d, conics, colors, opacities, background,
            absgrad_sink, inst_gauss, tile_start):
        out = raster(means2d, conics, colors, opacities, background,
                     absgrad_sink, inst_gauss, tile_start)
        img, alpha = out
        res = (means2d, conics, colors, opacities, background,
               inst_gauss, tile_start, 1.0 - alpha)
        return out, res

    def bwd(res, cot):
        (means2d, conics, colors, opacities, background,
         inst_gauss, tile_start, T_px) = res
        g_img, g_alpha = cot
        n = means2d.shape[0]
        inst = build_instance_table(means2d, conics, colors, opacities,
                                    inst_gauss)
        # dL/dT enters via bg-composite (+g_img·bg) and alpha=1-T (−g_alpha);
        # kernel applies dT/dα_i = −T/(1−α_i) with a folded sign:
        # g_T row = g_alpha − g_img·bg  (see tiles.py derivation)
        g_T_img = g_alpha - jnp.einsum("hwc,c->hw", g_img, background)
        cot_img = jnp.concatenate(
            [g_img, g_T_img[..., None],
             jnp.zeros((*g_img.shape[:2], 4), jnp.float32)], axis=-1)
        cot_tiles = _image_to_tiles(cot_img, tiles_x, tiles_y, tile_size)
        gt = rasterize_backward(
            inst, tile_start, cot_tiles, width=width, height=height,
            tile_size=tile_size, interpret=interpret)
        g = scatter_instance_grads(gt, inst_gauss, n)
        d_bg = jnp.einsum("hwc,hw->c", g_img, T_px)
        return (g["means2d"], g["conics"], g["colors"], g["opacity"],
                d_bg, g["absgrad"], None, None)

    raster.defvjp(fwd, bwd)
    return raster


def rasterize_pallas(
    means2d, conics, colors, opacities, inst_gauss, tile_start,
    *, width: int, height: int, tile_size: int = 16,
    background=None, absgrad_sink=None, interpret: bool = False,
):
    """Differentiable Pallas rasterization: -> (img (H,W,3), alpha (H,W)).

    inst_gauss/tile_start from bin_gaussians + align_instances."""
    if background is None:
        background = jnp.zeros((3,), jnp.float32)
    if absgrad_sink is None:
        absgrad_sink = jnp.zeros((means2d.shape[0], 2), jnp.float32)
    fn = _make_raster(width, height, tile_size, interpret)
    return fn(means2d, conics, colors, opacities, background,
              absgrad_sink, inst_gauss, tile_start)
