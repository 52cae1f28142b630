"""Sub-stage profile of the r5 Pallas-binned raster path at 1M@1080p."""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def slope_time(make_run, k_lo=2, k_hi=8, reps=3):
    def wall(fn):
        float(np.asarray(fn()))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(fn()))
            ts.append(time.perf_counter() - t0)
        return min(ts)
    t_lo = wall(make_run(k_lo))
    t_hi = wall(make_run(k_hi))
    return (t_hi - t_lo) / (k_hi - k_lo)


def main():
    import jax
    import jax.numpy as jnp
    from divshot_tpu.core.cache import enable_compile_cache
    from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras
    from divshot_tpu.raster.project import project_gaussians
    from divshot_tpu.raster import pallas_bin as PB
    from divshot_tpu.raster import pallas_raster as PR
    from divshot_tpu.splat.sh import eval_sh_color
    from divshot_tpu.splat.math import safe_normalize

    enable_compile_cache()
    CAP = 1 << 23
    W, H = 1920, 1080
    rng = np.random.default_rng(0)
    params = random_scene(rng, 1_000_000, sh_degree=3, capacity=1 << 20,
                          scale_range=(0.004, 0.025))
    cam = orbit_cameras(1, width=W, height_px=H)[0]

    @jax.jit
    def prepare(p):
        proj = project_gaussians(p.means, p.scales, p.quats, cam,
                                 opacities=p.effective_opacity())
        dirs = safe_normalize(p.means - cam.campos[None, :])
        colors = eval_sh_color(p.sh0, p.shN, dirs, 3)
        op = p.effective_opacity() * proj.comp
        return proj, colors, op

    proj, colors, op = prepare(params)
    jax.block_until_ready(colors)

    def report(name, sec):
        print(f"{name:44s} {sec*1e3:9.2f} ms", flush=True)

    def timer(body, *arrays):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(arrays, *, k):
            def sbody(acc, _):
                return body(acc, *arrays), ()
            acc, _ = jax.lax.scan(sbody, jnp.float32(0.0), None, length=k)
            return acc
        return slope_time(lambda k: (lambda: run(arrays, k=k)))

    def di(acc):
        return jnp.int32(acc * 1e-20)

    # 0. prep_gdata alone
    def f_prep(acc, m2d):
        gdata, counts, offsets, total, tw, th = PB.prep_gdata(
            m2d + acc * 1e-20, proj.conics, proj.depths, proj.radii,
            proj.radii_xy, proj.rad2, colors, op, W, H, 16, 64)
        return acc + gdata[0, 0].astype(jnp.float32) * 1e-9 \
            + total.astype(jnp.float32) * 1e-12
    report("prep_gdata (split + pad)", timer(f_prep, proj.means2d))

    # 1. full expand (kernel + prep + searchsorted gs), no sort
    gdata, counts, offsets, total, tw, th = jax.jit(
        functools.partial(PB.prep_gdata, width=W, height=H, tile_size=16,
                          mt=64))(
        proj.means2d, proj.conics, proj.depths, proj.radii, proj.radii_xy,
        proj.rad2, colors, op)
    jax.block_until_ready(gdata)
    tw, th = int(tw), int(th)
    n = proj.means2d.shape[0]

    nblk = CAP // PB.J
    block_starts = jnp.arange(nblk, dtype=jnp.int32) * PB.J
    gs = jnp.clip(jnp.searchsorted(offsets, block_starts,
                                   side="right").astype(jnp.int32) - 1,
                  0, n - 1)
    gs8 = (gs // 8) * 8
    meta = jnp.asarray(total, jnp.int32).reshape(1)

    def f_gs(acc, offsets):
        g2 = jnp.searchsorted(offsets + di(acc), block_starts,
                              side="right").astype(jnp.int32)
        return acc + g2[-1].astype(jnp.float32) * 1e-9
    report("searchsorted gs (nblk queries into N)", timer(f_gs, offsets))

    kernel = functools.partial(
        PB._expand_kernel, nch=3, tw=tw, tile_size=16, depth_bits=19)

    import jax.experimental.pallas as pl2
    from jax.experimental.pallas import tpu as pltpu2

    expand_call = pl2.pallas_call(
        kernel,
        grid_spec=pltpu2.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(nblk,),
            in_specs=[pl2.BlockSpec(memory_space=pl2.ANY)],
            out_specs=pl2.BlockSpec((PB.NOUT, PB.J), lambda b, *_: (0, b),
                                    memory_space=pltpu2.VMEM),
            scratch_shapes=[
                pltpu2.VMEM((2, PB.KW, 128), jnp.bfloat16),
                pltpu2.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((PB.NOUT, CAP), jnp.uint32),
        compiler_params=pltpu2.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )

    def f_kernel(acc, gdata, gs8, meta):
        out = expand_call(gs8, meta + di(acc), gdata)
        return acc + out[0, 0].astype(jnp.float32) * 1e-9 \
            + out[2, 0].astype(jnp.float32) * 1e-12
    report("expand kernel alone", timer(f_kernel, gdata, gs8, meta))

    out = jax.jit(lambda gs8, meta, gdata: expand_call(gs8, meta, gdata))(
        gs8, meta, gdata)
    jax.block_until_ready(out)

    def f_sort(acc, out):
        ops = jax.lax.sort(
            (out[0] + jnp.uint32(di(acc)),) + tuple(out[1 + r]
                                                    for r in range(10)),
            num_keys=1)
        return acc + ops[0][0].astype(jnp.float32) * 1e-9 \
            + ops[-1][0].astype(jnp.float32) * 1e-12
    report("sort key + 10 u32 (cap)", timer(f_sort, out))

    sorted_ops = jax.jit(lambda out: jax.lax.sort(
        (out[0],) + tuple(out[1 + r] for r in range(10)), num_keys=1))(out)
    jax.block_until_ready(sorted_ops[0])

    def f_unpack(acc, *ops):
        s_key = ops[0] + jnp.uint32(di(acc))
        table = jax.lax.bitcast_convert_type(
            jnp.stack(ops[2:], axis=0), jnp.float32)
        dead = s_key == jnp.uint32(0xFFFFFFFF)
        table = table.at[5].set(jnp.where(dead, PR.LOGOP_FLOOR, table[5]))
        s_tile = jnp.minimum((s_key >> 19).astype(jnp.int32), tw * th)
        tb = jnp.searchsorted(
            s_tile, jnp.arange(tw * th + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
        return acc + table[0, 0] * 1e-9 + tb[-1].astype(jnp.float32) * 1e-12
    report("unpack + tile_start", timer(f_unpack, *sorted_ops))

    # backward pieces
    ngrad = PR._ngrad_rows(3)
    grads = jnp.asarray(rng.standard_normal((ngrad, CAP)) * 1e-3,
                        jnp.float32)
    s_owner = sorted_ops[1].astype(jnp.int32)
    tile_start = jnp.asarray(np.linspace(0, int(total), tw * th + 1,
                                         dtype=np.int32))

    def f_gsort(acc, grads, s_owner):
        okey = jnp.where(s_owner >= 0, s_owner,
                         0x7FFFFFFF).astype(jnp.uint32)
        ops = jax.lax.sort(
            (okey + jnp.uint32(di(acc)),) + tuple(grads[r]
                                                  for r in range(ngrad)),
            num_keys=1)
        return acc + ops[1][0] * 1e-9 + ops[-1][0] * 1e-12
    report("grad sort owner + 16 f32 (cap)", timer(f_gsort, grads, s_owner))

    def f_cumsum(acc, grads):
        S = jnp.cumsum(grads + acc * 1e-20, axis=1)
        return acc + S[0, -1] * 1e-9
    report("cumsum (16, cap)", timer(f_cumsum, grads))

    S = jax.jit(lambda g: jnp.cumsum(g, axis=1))(grads)
    jax.block_until_ready(S)
    hi = jnp.clip(offsets + counts - 1, 0, CAP - 1)

    def f_E(acc, S, hi):
        E = jnp.take(S, jnp.clip(hi + di(acc), 0, CAP - 1), axis=1)
        return acc + E[0, 0] * 1e-9
    report("E gather (16, N) axis=1 from (16, cap)", timer(f_E, S, hi))

    # row-major alternative
    gT = jnp.asarray(rng.standard_normal((CAP, 16)), jnp.float32)

    def f_cs0(acc, gT):
        S0 = jnp.cumsum(gT + acc * 1e-20, axis=0)
        return acc + S0[-1, 0] * 1e-9
    report("cumsum (cap, 16) axis=0", timer(f_cs0, gT))

    ST = jax.jit(lambda g: jnp.cumsum(g, axis=0))(gT)
    jax.block_until_ready(ST)

    def f_E0(acc, ST, hi):
        E = jnp.take(ST, jnp.clip(hi + di(acc), 0, CAP - 1), axis=0)
        return acc + E[0, 0] * 1e-9
    report("E row-gather (N, 16) from (cap, 16)", timer(f_E0, ST, hi))

    def f_reduce(acc, grads, s_owner, tile_start):
        bnd = jnp.zeros((tw * th, ngrad, PR.BLK), jnp.float32)
        g = PB.reduce_grads_sorted(grads + acc * 1e-20, bnd, tile_start,
                                   s_owner, offsets, counts)
        return acc + g["means2d"][0, 0] * 1e-9
    report("reduce_grads_sorted total", timer(f_reduce, grads, s_owner,
                                              tile_start))


if __name__ == "__main__":
    main()
