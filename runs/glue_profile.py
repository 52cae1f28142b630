"""Per-stage profile of the non-kernel train-step glue at 1M@1080p.

Times every capacity-scaled XLA op of the binning + grad-reduction path
separately (slope timing; see PERF.md protocol), plus microbenchmarks of
gather/scatter/sort throughput vs row width and index locality — the data
the round-5 glue rewrite is designed from.

Every stage body consumes the loop-carried accumulator (acc * 1e-20 cast
into its input) so XLA cannot hoist the body out of the timing scan —
`salt`-only perturbation gets CSE'd/hoisted and reads as ~0 ms.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


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
    from divshot_tpu.raster import tiles as T
    from divshot_tpu.raster import pallas_raster as PR
    from divshot_tpu.splat.sh import eval_sh_color
    from divshot_tpu.splat.math import safe_normalize

    enable_compile_cache()
    N = 1 << 20
    CAP = 1 << 23
    W, H = 1920, 1080
    rng = np.random.default_rng(0)
    params = random_scene(rng, 1_000_000, sh_degree=3, capacity=N,
                          scale_range=(0.004, 0.025))
    cam = orbit_cameras(1, width=W, height_px=H)[0]

    def scan_timer(body1):
        """body1(acc_scalar_f32) -> scalar. acc MUST feed the stage input."""
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(*, k):
            def body(acc, _):
                return body1(acc), ()
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
            return acc
        return slope_time(lambda k: (lambda: run(k=k)))

    results = {}

    def report(name, sec):
        results[name] = sec * 1e3
        log(f"{name:44s} {sec*1e3:9.2f} ms")

    def df(acc):
        return acc * 1e-20

    def di(acc):
        return jnp.int32(acc * 1e-20)

    # --- real inputs ------------------------------------------------------
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
    bins = jax.jit(functools.partial(
        T.bin_gaussians, width=W, height=H, instance_capacity=CAP,
        build_ids_mat=False))(proj.means2d, proj.depths, proj.radii,
                              radii_xy=proj.radii_xy, rad2=proj.rad2)
    demand = int(bins.tile_start[-1])
    log(f"instance demand {demand} / cap {CAP}")

    # 0. projection + SH
    def f_proj(acc):
        p2, c2, o2 = prepare(params.replace(means=params.means + df(acc)))
        return acc + p2.means2d[0, 0] * 1e-9 + c2[0, 0] * 1e-9 + o2[0] * 1e-9
    report("project+SH (N=2^20)", scan_timer(f_proj))

    # 1. full bin_gaussians
    def f_bin(acc):
        b = T.bin_gaussians(
            proj.means2d + df(acc), proj.depths, proj.radii, W, H,
            instance_capacity=CAP, build_ids_mat=False,
            radii_xy=proj.radii_xy, rad2=proj.rad2)
        return acc + b.tile_start[-1].astype(jnp.float32) * 1e-9 \
            + b.inst_gauss[0].astype(jnp.float32) * 1e-9 \
            + b.exp2sorted[0].astype(jnp.float32) * 1e-9
    report("bin_gaussians total", scan_timer(f_bin))

    # --- bin sub-stages (replicated from tiles.bin_gaussians) -------------
    means2d, depths, radii = proj.means2d, proj.depths, proj.radii
    rx, ry = proj.radii_xy[:, 0], proj.radii_xy[:, 1]
    tile_size = 16
    tw, th = (W + 15) // 16, (H + 15) // 16
    num_tiles = tw * th
    u, v = means2d[:, 0], means2d[:, 1]

    def counts_fn(salt_f):
        visible = radii > 0
        uu = u + salt_f
        tmin_x = jnp.clip(jnp.floor((uu - rx) / tile_size), 0, tw).astype(jnp.int32)
        tmax_x = jnp.clip(jnp.ceil((uu + rx) / tile_size), 0, tw).astype(jnp.int32)
        tmin_y = jnp.clip(jnp.floor((v - ry) / tile_size), 0, th).astype(jnp.int32)
        tmax_y = jnp.clip(jnp.ceil((v + ry) / tile_size), 0, th).astype(jnp.int32)
        nx = tmax_x - tmin_x
        counts = jnp.minimum(jnp.where(visible, nx * (tmax_y - tmin_y), 0), 64)
        offsets = jnp.cumsum(counts) - counts
        return counts, offsets, tmin_x, tmin_y, nx

    counts, offsets, tmin_x, tmin_y, nx = jax.jit(counts_fn)(0.0)
    jax.block_until_ready(counts)

    def f_counts(acc):
        c, o, *_ = counts_fn(df(acc))
        return acc + c[0].astype(jnp.float32) * 1e-9 \
            + o[-1].astype(jnp.float32) * 1e-9
    report("  counts+offsets cumsum (N)", scan_timer(f_counts))

    iota = jnp.arange(CAP, dtype=jnp.int32)
    goff = jnp.where(counts > 0, offsets, CAP)
    dbits = T.pltpu_bitcast_u32(jnp.where(depths > 0, depths, jnp.inf))
    tmin_lin = (tmin_y * tw + tmin_x).astype(jnp.uint32)
    chA_g = (tmin_lin << 13) | jnp.maximum(nx, 1).astype(jnp.uint32)
    chB_g = ((dbits >> 13) << 13) | counts.astype(jnp.uint32)
    rows = jnp.stack([chA_g, chB_g,
                      jnp.arange(N, dtype=jnp.uint32) + 1], axis=1)

    def scatter_fn(salt_i):
        return jnp.zeros((CAP, 3), jnp.uint32).at[goff + salt_i].set(
            rows, mode="drop")

    M = jax.jit(scatter_fn)(jnp.int32(0))
    jax.block_until_ready(M)

    def f_scatter(acc):
        Mx = scatter_fn(di(acc))
        return acc + Mx[0, 0].astype(jnp.float32) * 1e-9
    report("  boundary scatter (N rows -> cap)", scan_timer(f_scatter))

    def f_cummax(acc):
        flag = M[:, 0] != jnp.uint32(di(acc))
        s = jax.lax.cummax(jnp.where(flag, iota, 0))
        return acc + s[-1].astype(jnp.float32) * 1e-9
    report("  cummax (cap)", scan_timer(f_cummax))

    start = jax.jit(lambda: jax.lax.cummax(
        jnp.where(M[:, 0] != 0, iota, 0)))()
    jax.block_until_ready(start)

    def f_holdlast(acc):
        h = jnp.take(M, jnp.clip(start + di(acc), 0, CAP - 1), axis=0)
        return acc + h[0, 0].astype(jnp.float32) * 1e-9
    report("  hold-last gather take(M,start) cap", scan_timer(f_holdlast))

    held = jnp.take(M, start, axis=0)
    owner = held[:, 2].astype(jnp.int32) - 1
    packed = jnp.stack([u, v, proj.rad2], axis=1)

    def f_corner(acc):
        g = jnp.take(packed, jnp.clip(owner + di(acc), 0, N - 1), axis=0)
        return acc + g[0, 0] * 1e-9
    report("  corner-cull gather (cap rows from N)", scan_timer(f_corner))

    key = jnp.where(owner >= 0,
                    (jnp.minimum(iota // 1024, num_tiles).astype(jnp.uint32)
                     << 19) | (iota % 512).astype(jnp.uint32),
                    jnp.uint32(0xFFFFFFFF))

    def f_sort(acc):
        a, b, c = jax.lax.sort(
            (key + jnp.uint32(di(acc)), owner, iota), num_keys=1)
        return acc + a[0].astype(jnp.float32) * 1e-9 \
            + b[0].astype(jnp.float32) * 1e-9 + c[0].astype(jnp.float32) * 1e-9
    report("  sort (key,owner,iota) cap", scan_timer(f_sort))

    sk, so, se = jax.jit(lambda: jax.lax.sort((key, owner, iota),
                                              num_keys=1))()
    jax.block_until_ready(sk)

    def f_sort2(acc):
        a, b = jax.lax.sort((key + jnp.uint32(di(acc)), iota), num_keys=1)
        return acc + a[0].astype(jnp.float32) * 1e-9 \
            + b[0].astype(jnp.float32) * 1e-9
    report("  sort (key,iota) 2-tuple cap", scan_timer(f_sort2))

    def f_invsort(acc):
        _, inv = jax.lax.sort((se + di(acc), iota), num_keys=1)
        return acc + inv[0].astype(jnp.float32) * 1e-9
    report("  inversion sort (cap)", scan_timer(f_invsort))

    def f_ss(acc):
        s_tile = jnp.minimum(((sk + jnp.uint32(di(acc))) >> 19)
                             .astype(jnp.int32), num_tiles)
        tb = jnp.searchsorted(
            s_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32)
        ).astype(jnp.int32)
        return acc + tb[-1].astype(jnp.float32) * 1e-9
    report("  searchsorted (T queries into cap)", scan_timer(f_ss))

    # 2. feature-table gather
    def f_table(acc):
        t = PR.build_feature_table(
            means2d, proj.conics, colors, op,
            jnp.clip(bins.inst_gauss + di(acc), -1, N - 1))
        return acc + t[0, 0] * 1e-9
    report("feature-table gather (9 x cap from N)", scan_timer(f_table))

    # 3. grad reduction sub-stages
    ngrad = PR._ngrad_rows(3)
    g = jnp.ones((ngrad, CAP), jnp.float32)
    bnd = jnp.ones((num_tiles, ngrad, PR.BLK), jnp.float32) * 1e-6

    def f_bnd(acc):
        nb = CAP // PR.BLK
        bidx = bins.tile_start[:-1] // PR.BLK
        gm = (g + df(acc)).reshape(ngrad, nb, PR.BLK)
        gm = gm.at[:, bidx].add(bnd.transpose(1, 0, 2), mode="drop")
        return acc + gm[0, 0, 0] * 1e-9
    report("  boundary block scatter-add (T blocks)", scan_timer(f_bnd))

    def f_permg(acc):
        r = jnp.take(g, jnp.clip(bins.exp2sorted + di(acc), 0, CAP - 1),
                     axis=1)
        return acc + r[0, 0] * 1e-9
    report("  perm gather take(g, e2s, ax=1) 12xcap", scan_timer(f_permg))

    def f_cumsum(acc):
        r = jnp.cumsum(g + df(acc), axis=1)
        return acc + r[0, -1] * 1e-9
    report("  cumsum (12, cap) axis=1", scan_timer(f_cumsum))

    S = jax.jit(lambda: jnp.cumsum(g, axis=1))()
    jax.block_until_ready(S)
    hi = jnp.clip(bins.g_offsets + bins.g_counts - 1, 0, CAP - 1)

    def f_fine(acc):
        r = S[:, jnp.clip(hi + di(acc), 0, CAP - 1)]
        return acc + r[0, 0] * 1e-9
    report("  fine gather S[:, hi] (12 x N)", scan_timer(f_fine))

    def f_reduce(acc):
        gg = PR.reduce_instance_grads(
            g + df(acc), bnd, bins.tile_start, bins.exp2sorted,
            bins.g_offsets, bins.g_counts)
        return acc + gg["means2d"][0, 0] * 1e-9
    report("reduce_instance_grads total", scan_timer(f_reduce))

    # 4. loss fwd+bwd at 1080p
    from divshot_tpu.train.losses import photometric_loss
    img = jnp.zeros((H, W, 3), jnp.float32)
    gt = jnp.ones((H, W, 3), jnp.float32) * 0.5

    def f_loss(acc):
        def lf(x):
            l, _ = photometric_loss(x, gt, ssim_lambda=0.2)
            return l
        l, grad = jax.value_and_grad(lf)(img + df(acc))
        return acc + l * 1e-9 + grad[0, 0, 0] * 1e-9
    report("photometric loss fwd+bwd 1080p", scan_timer(f_loss))

    # --- microbench: gather throughput vs width + locality ----------------
    log("--- microbenchmarks ---")
    idx_rand = jnp.asarray(rng.integers(0, N, CAP), jnp.int32)
    idx_sort = jnp.sort(idx_rand)
    for width in (1, 4, 16):
        src = jnp.ones((N, width), jnp.float32)
        for name, idx in (("rand", idx_rand), ("sorted", idx_sort)):
            def f_g(acc, src=src, idx=idx):
                r = jnp.take(src, jnp.clip(idx + di(acc), 0, N - 1), axis=0)
                return acc + r[0, 0] * 1e-9
            report(f"  gather (N,{width})f32 cap rows {name}", scan_timer(f_g))

    src12 = jnp.ones((12, N), jnp.float32)

    def f_g12(acc):
        r = jnp.take(src12, jnp.clip(idx_rand + di(acc), 0, N - 1), axis=1)
        return acc + r[0, 0] * 1e-9
    report("  gather (12,N)f32 axis=1 cap rand", scan_timer(f_g12))

    vals = jnp.ones((CAP, 4), jnp.float32)

    def f_sc(acc):
        r = jnp.zeros((N, 4), jnp.float32).at[
            jnp.clip(idx_rand + di(acc), 0, N - 1)].add(vals)
        return acc + r[0, 0] * 1e-9
    report("  scatter-add (cap,4)->(N,4) rand", scan_timer(f_sc))

    def f_sc_sorted(acc):
        r = jnp.zeros((N, 4), jnp.float32).at[
            jnp.clip(idx_sort + di(acc), 0, N - 1)].add(
                vals, indices_are_sorted=True)
        return acc + r[0, 0] * 1e-9
    report("  scatter-add sorted+flag (cap,4)->(N,4)", scan_timer(f_sc_sorted))

    def f_seg(acc):
        r = jax.ops.segment_sum(vals + df(acc), idx_sort, num_segments=N,
                                indices_are_sorted=True)
        return acc + r[0, 0] * 1e-9
    report("  segment_sum sorted (cap,4)->(N,4)", scan_timer(f_seg))

    # sort with wide payload (feature rows ride the sort)
    pay = [jnp.ones((CAP,), jnp.float32) + i for i in range(12)]

    def f_wsort(acc):
        out = jax.lax.sort((key + jnp.uint32(di(acc)), *pay), num_keys=1)
        return acc + out[1][0] * 1e-9 + out[-1][0] * 1e-9
    report("  sort key + 12 f32 payloads (cap)", scan_timer(f_wsort))

    def f_wsort6(acc):
        out = jax.lax.sort((key + jnp.uint32(di(acc)), *pay[:6]), num_keys=1)
        return acc + out[1][0] * 1e-9 + out[-1][0] * 1e-9
    report("  sort key + 6 f32 payloads (cap)", scan_timer(f_wsort6))

    gT = jnp.ones((CAP, 16), jnp.float32)

    def f_cs0(acc):
        r = jnp.cumsum(gT + df(acc), axis=0)
        return acc + r[-1, 0] * 1e-9
    report("  cumsum (cap, 16) axis=0", scan_timer(f_cs0))

    def f_permg_rows(acc):
        r = jnp.take(gT, jnp.clip(bins.exp2sorted + di(acc), 0, CAP - 1),
                     axis=0)
        return acc + r[0, 0] * 1e-9
    report("  perm row-gather (cap,16) axis=0", scan_timer(f_permg_rows))

    import json
    print(json.dumps({k: round(v, 3) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
