"""Bisect expand_sorted's 134 ms (expected 60) at 1M@1080p."""

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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from divshot_tpu.core.cache import enable_compile_cache
    from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras
    from divshot_tpu.raster.project import project_gaussians
    from divshot_tpu.raster import pallas_bin as PB
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
        print(f"{name:40s} {sec*1e3:9.2f} ms", flush=True)

    def timer(body, *arrays):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(arrays, *, k):
            def sbody(acc, _):
                return body(acc, *arrays), ()
            acc, _ = jax.lax.scan(sbody, jnp.float32(0.0), None, length=k)
            return acc
        return slope_time(lambda k: (lambda: run(arrays, k=k)))

    n = proj.means2d.shape[0]
    tw, th = -(-W // 16), -(-H // 16)
    num_tiles = tw * th
    nblk = CAP // PB.J

    def upto(stage):
        def body(acc, m2d):
            gdata, counts, offsets, total, tw2, th2 = PB.prep_gdata(
                m2d + acc * 1e-20, proj.conics, proj.depths, proj.radii,
                proj.radii_xy, proj.rad2, colors, op, W, H, 16, 64)
            if stage == "prep":
                return acc + gdata[0, 0].astype(jnp.float32) * 1e-9
            block_starts = jnp.arange(nblk, dtype=jnp.int32) * PB.J
            gs = jnp.clip(jnp.searchsorted(
                offsets, block_starts, side="right").astype(jnp.int32) - 1,
                0, n - 1)
            gs8 = (gs // 8) * 8
            meta = jnp.asarray(total, jnp.int32).reshape(1)
            if stage == "gs":
                return acc + gs8[-1].astype(jnp.float32) * 1e-9 \
                    + gdata[0, 0].astype(jnp.float32) * 1e-9
            kernel = functools.partial(
                PB._expand_kernel, nch=3, tw=tw, tile_size=16,
                depth_bits=19)
            out = pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(nblk,),
                    in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                    out_specs=pl.BlockSpec((PB.NOUT, PB.J),
                                           lambda b, *_: (0, b),
                                           memory_space=pltpu.VMEM),
                    scratch_shapes=[
                        pltpu.VMEM((2, PB.KW, 128), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((2,)),
                    ],
                ),
                out_shape=jax.ShapeDtypeStruct((PB.NOUT, CAP), jnp.uint32),
                compiler_params=pltpu.CompilerParams(
                    dimension_semantics=("arbitrary",)),
            )(gs8, meta, gdata)
            if stage == "kernel":
                return acc + out[0, 0].astype(jnp.float32) * 1e-9 \
                    + out[5, 5].astype(jnp.float32) * 1e-12
            sorted_ops = jax.lax.sort(
                (out[0], out[1]) + tuple(out[2 + r] for r in range(9)),
                num_keys=1)
            if stage == "sort":
                return acc + sorted_ops[0][0].astype(jnp.float32) * 1e-9 \
                    + sorted_ops[-1][0].astype(jnp.float32) * 1e-12
            s_key = sorted_ops[0]
            table = jax.lax.bitcast_convert_type(
                jnp.stack(sorted_ops[2:], axis=0), jnp.float32)
            s_tile = jnp.minimum((s_key >> 19).astype(jnp.int32), num_tiles)
            tb = jnp.searchsorted(
                s_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32)
            ).astype(jnp.int32)
            return acc + table[0, 0] * 1e-9 \
                + tb[-1].astype(jnp.float32) * 1e-12
        return body

    for stage in ("prep", "gs", "kernel", "sort", "full"):
        report(f"up to {stage}", timer(upto(stage), proj.means2d))


if __name__ == "__main__":
    main()
