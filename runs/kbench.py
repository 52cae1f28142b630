"""Kernel iteration harness: times the Pallas raster fwd/bwd at the
1M-splat / 1080p scale point on the real chip.

Timing protocol (important): the axon backend defers execution and
`block_until_ready` can return before the device ran anything, so naive
batched timing reports fantasy numbers (measured up to "18 TB/s" HBM).
The only trustworthy measurement is SLOPE timing: run the kernel k times
*chained inside one jit* (each call consumes a runtime-varying scalar so
XLA cannot CSE the iterations), force completion by fetching the result
value, and report (t(k_hi) - t(k_lo)) / (k_hi - k_lo).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python runs/kbench.py [n] [WxH]
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from divshot_tpu.core.cache import enable_compile_cache

V5E_HBM_GBPS = 819.0


def slope_time(make_run, k_lo=2, k_hi=10, reps=3):
    """make_run(k) -> zero-arg fn returning a scalar; returns sec/exec."""
    def wall(fn):
        float(np.asarray(fn()))           # warm + force completion
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(fn()))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo = wall(make_run(k_lo))
    t_hi = wall(make_run(k_hi))
    return (t_hi - t_lo) / (k_hi - k_lo)


def kernel_roofline(n_alive, res_w, res_h, instance_capacity,
                    with_absgrad=True):
    from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras
    from divshot_tpu.raster.project import project_gaussians
    from divshot_tpu.raster import tiles as T
    from divshot_tpu.raster import pallas_raster as PR
    from divshot_tpu.splat.sh import eval_sh_color
    from divshot_tpu.splat.math import safe_normalize

    rng = np.random.default_rng(0)
    params = random_scene(rng, n_alive, sh_degree=3,
                          scale_range=(0.004, 0.025))
    cam = orbit_cameras(1, width=res_w, height_px=res_h)[0]

    @jax.jit
    def prepare(p):
        proj = project_gaussians(p.means, p.scales, p.quats, cam,
                                 opacities=p.effective_opacity())
        bins = T.bin_gaussians(
            proj.means2d, proj.depths, proj.radii, res_w, res_h,
            instance_capacity=instance_capacity, build_ids_mat=False,
            radii_xy=proj.radii_xy, rad2=proj.rad2)
        dirs = safe_normalize(p.means - cam.campos[None, :])
        colors = eval_sh_color(p.sh0, p.shN, dirs, 3)
        op = p.effective_opacity() * proj.comp
        table = PR.build_feature_table(proj.means2d, proj.conics, colors,
                                       op, bins.inst_gauss)
        return table, bins

    table, bins = prepare(params)
    n_inst = int(bins.tile_start[-1])
    icap = table.shape[1]

    # the per-iteration salt rides into tile_start so XLA cannot collapse
    # the chained executions into one
    @functools.partial(jax.jit, static_argnames=("k",))
    def run_fwd(table, tile_start, salts, *, k):
        def body(acc, salt):
            out = PR.rasterize_forward(
                table, tile_start + salt, width=res_w, height=res_h, nch=3)
            return acc + out[0, 0, 0], ()
        acc, _ = jax.lax.scan(body, jnp.float32(0), salts[:k])
        return acc

    fwd_out = PR.rasterize_forward(table, bins.tile_start,
                                   width=res_w, height=res_h, nch=3)
    cot = jnp.ones_like(fwd_out)

    @functools.partial(jax.jit, static_argnames=("k",))
    def run_bwd(table, tile_start, cot, fwd_out, salts, *, k):
        def body(acc, salt):
            g, bnd = PR.rasterize_backward(
                table, tile_start + salt, cot, fwd_out,
                width=res_w, height=res_h, nch=3,
                with_absgrad=with_absgrad)
            return acc + g[0, 0] + bnd[0, 0, 0], ()
        acc, _ = jax.lax.scan(body, jnp.float32(0), salts[:k])
        return acc

    salts = jnp.zeros((16,), jnp.int32)
    dt_f = slope_time(lambda k: (lambda: run_fwd(
        table, bins.tile_start, salts, k=k)))
    dt_b = slope_time(lambda k: (lambda: run_bwd(
        table, bins.tile_start, cot, fwd_out, salts, k=k)))

    feat_rows = PR._feat_rows(3)
    ngrad_rows = PR._ngrad_rows(3)
    tiles = ((res_w + 15) // 16) * ((res_h + 15) // 16)
    px_bytes = tiles * 8 * 256 * 4
    fwd_bytes = n_inst * feat_rows * 4 + px_bytes
    bwd_bytes = n_inst * (feat_rows + ngrad_rows) * 4 + 2 * px_bytes \
        + icap * ngrad_rows * 4
    sol_f = fwd_bytes / dt_f / 1e9 / V5E_HBM_GBPS
    sol_b = bwd_bytes / dt_b / 1e9 / V5E_HBM_GBPS
    return {"n_instances": n_inst, "fwd_ms": dt_f * 1e3,
            "bwd_ms": dt_b * 1e3, "fwd_pct_sol": 100 * sol_f,
            "bwd_pct_sol": 100 * sol_b}


def main():
    enable_compile_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    res = sys.argv[2] if len(sys.argv) > 2 else "1920x1080"
    w, h = (int(x) for x in res.split("x"))
    rl = kernel_roofline(n, w, h, 1 << 23)
    print({k: round(v, 2) if isinstance(v, float) else v
           for k, v in rl.items()})


if __name__ == "__main__":
    main()
