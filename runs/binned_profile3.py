"""Integrated-path breakdown: expand_sorted alone vs +forward kernel vs
full render vs full vjp, at 1M@1080p — finds glue the sub-stage profile
misses (copies, fusion breaks)."""

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

    # 1. expand_sorted alone
    def f_bins(acc, m2d):
        sb = PB.expand_sorted(
            m2d + acc * 1e-20, proj.conics, proj.depths, proj.radii,
            proj.radii_xy, proj.rad2, colors, op, width=W, height=H,
            instance_capacity=CAP)
        return acc + sb.table[0, 0] * 1e-9 \
            + sb.tile_start[-1].astype(jnp.float32) * 1e-12 \
            + sb.s_owner[0].astype(jnp.float32) * 1e-12
    report("expand_sorted full", timer(f_bins, proj.means2d))

    # 2. + forward kernel
    def f_fwd(acc, m2d):
        sb = PB.expand_sorted(
            m2d + acc * 1e-20, proj.conics, proj.depths, proj.radii,
            proj.radii_xy, proj.rad2, colors, op, width=W, height=H,
            instance_capacity=CAP)
        out = PR.rasterize_forward(sb.table, sb.tile_start, width=W,
                                   height=H, nch=3)
        return acc + out[0, 0, 0] * 1e-9
    report("expand_sorted + fwd kernel", timer(f_fwd, proj.means2d))

    # 3. full rasterize_pallas_binned forward (custom vjp primal)
    def f_full(acc, m2d):
        img, alpha, ni, mtc = PR.rasterize_pallas_binned(
            m2d + acc * 1e-20, proj.conics, colors, op, proj,
            width=W, height=H, instance_capacity=CAP, with_absgrad=False)
        return acc + img[0, 0, 0] * 1e-9 + alpha[0, 0] * 1e-12
    report("rasterize_pallas_binned fwd", timer(f_full, proj.means2d))

    # 4. vjp pieces: full bwd
    def f_vjp(acc, m2d):
        def loss(m):
            img, alpha, ni, mtc = PR.rasterize_pallas_binned(
                m, proj.conics, colors, op, proj,
                width=W, height=H, instance_capacity=CAP,
                with_absgrad=False)
            return jnp.sum(img[::8, ::8]) * 1e-9
        l, g = jax.value_and_grad(loss)(m2d + acc * 1e-20)
        return acc + l + g[0, 0] * 1e-9
    report("full fwd+bwd vjp", timer(f_vjp, proj.means2d))

    # 5. bwd kernel + reduce alone (no fwd recompute): precompute fwd parts
    sb = jax.jit(functools.partial(
        PB.expand_sorted, width=W, height=H, instance_capacity=CAP))(
        proj.means2d, proj.conics, proj.depths, proj.radii, proj.radii_xy,
        proj.rad2, colors, op)
    out = PR.rasterize_forward(sb.table, sb.tile_start, width=W, height=H,
                               nch=3)
    jax.block_until_ready(out)
    cot = jnp.ones_like(out)

    def f_bwdk(acc, table, tile_start, cot, out):
        g, bnd = PR.rasterize_backward(
            table, tile_start + jnp.int32(acc * 1e-20), cot, out,
            width=W, height=H, nch=3, with_absgrad=False)
        return acc + g[0, 0] * 1e-9 + bnd[0, 0, 0] * 1e-12
    report("bwd kernel alone", timer(f_bwdk, sb.table, sb.tile_start, cot,
                                     out))

    def f_reduce(acc, grads, bnd):
        gg = PB.reduce_grads_sorted(grads + acc * 1e-20, bnd, sb.tile_start,
                                    sb.s_owner, sb.g_offsets, sb.g_counts)
        return acc + gg["means2d"][0, 0] * 1e-9
    grads, bnd = PR.rasterize_backward(
        sb.table, sb.tile_start, cot, out, width=W, height=H, nch=3,
        with_absgrad=False)
    jax.block_until_ready(grads)
    report("reduce_grads_sorted", timer(f_reduce, grads, bnd))


if __name__ == "__main__":
    main()
