"""Round-5 regression tests: ADC densification defaults, glue kernels."""

import numpy as np
import pytest

from divshot_tpu.core.config import (TrainConfig, DensifyStrategy,
                                     auto_tune_config, config_from_flags)


def _small_scene(n=120, seed=0):
    import jax.numpy as jnp
    from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras
    rng = np.random.default_rng(seed)
    params = random_scene(rng, n, sh_degree=1)
    cam = orbit_cameras(1, width=64, height_px=48)[0]
    return params, cam


def test_pallas_binning_matches_xla_binning():
    """expand_sorted must reproduce bin_gaussians' counts/offsets/demand
    and the integrated raster path must match the XLA-binning path
    image- and gradient-wise (transport through the sort is exact)."""
    import jax
    import jax.numpy as jnp
    from divshot_tpu.raster.render import render
    from divshot_tpu.raster import tiles as T
    from divshot_tpu.raster import pallas_bin as PB
    from divshot_tpu.raster.project import project_gaussians
    from divshot_tpu.splat.sh import eval_sh_color
    from divshot_tpu.splat.math import safe_normalize

    params, cam = _small_scene()
    proj = project_gaussians(params.means, params.scales, params.quats, cam,
                             opacities=params.effective_opacity())
    dirs = safe_normalize(params.means - cam.campos[None, :])
    colors = eval_sh_color(params.sh0, params.shN, dirs, 1)
    opac = params.effective_opacity() * proj.comp

    bins_old = T.bin_gaussians(
        proj.means2d, proj.depths, proj.radii, cam.width, cam.height,
        instance_capacity=1 << 13, build_ids_mat=False,
        radii_xy=proj.radii_xy, rad2=proj.rad2)
    bins_new = PB.expand_sorted(
        proj.means2d, proj.conics, proj.depths, proj.radii, proj.radii_xy,
        proj.rad2, colors, opac, width=cam.width, height=cam.height,
        instance_capacity=1 << 13, interpret=True)

    np.testing.assert_array_equal(np.asarray(bins_new.g_counts),
                                  np.asarray(bins_old.g_counts))
    np.testing.assert_array_equal(np.asarray(bins_new.g_offsets),
                                  np.asarray(bins_old.g_offsets))
    assert int(bins_new.num_instances) == int(bins_old.num_instances)
    np.testing.assert_array_equal(np.asarray(bins_new.tile_counts),
                                  np.asarray(bins_old.tile_counts))

    # instances per tile must be the same SET (near-tie depth order may
    # differ between the two key precisions)
    ts_old = np.asarray(bins_old.tile_start)
    ts_new = np.asarray(bins_new.tile_start)
    np.testing.assert_array_equal(ts_old, ts_new)
    go = np.asarray(bins_old.inst_gauss)
    gn = np.asarray(bins_new.s_owner)
    for t in range(len(ts_old) - 1):
        s, e = ts_old[t], ts_old[t + 1]
        np.testing.assert_array_equal(np.sort(go[s:e]), np.sort(gn[s:e]))

    # feature rows decoded through the one-hot matmul must be bit-exact
    from divshot_tpu.raster.pallas_raster import build_feature_table
    table_old = build_feature_table(proj.means2d, proj.conics, colors, opac,
                                    bins_old.inst_gauss)
    # compare at instances where the two sorts agree on the owner
    agree = go == gn
    np.testing.assert_allclose(
        np.asarray(bins_new.table)[:6, agree],
        np.asarray(table_old)[:6, agree], rtol=0, atol=0)


def test_pallas_binned_render_parity():
    import jax
    import jax.numpy as jnp
    from divshot_tpu.raster.render import render

    params, cam = _small_scene()

    fields = {f: getattr(params, f)
              for f in ("means", "scales", "quats", "sh0", "opacity")}

    def run(binning):
        def f(fl):
            out = render(params.replace(**fl), cam, backend="pallas",
                         binning=binning, instance_capacity=1 << 13)
            return jnp.sum(out.image * out.image) + jnp.sum(out.alpha), \
                out.image
        (loss, img), grads = jax.value_and_grad(
            f, has_aux=True)(fields)
        return loss, img, grads

    loss_n, img_n, g_n = run("pallas")
    loss_x, img_x, g_x = run("xla")
    np.testing.assert_allclose(np.asarray(img_n), np.asarray(img_x),
                               atol=2e-5)
    np.testing.assert_allclose(float(loss_n), float(loss_x), rtol=1e-5)
    for f in fields:
        np.testing.assert_allclose(
            np.asarray(g_n[f]), np.asarray(g_x[f]), atol=3e-4,
            err_msg=f"grad mismatch on {f}")


def test_reduce_grads_sorted_matches_r4_reduce():
    """Owner-sorted segment reduce == the r4 permutation+cumsum reduce on
    random grads over a real binning (culled gaussians, corner-culled
    instances, capacity padding all present)."""
    import jax
    import jax.numpy as jnp
    from divshot_tpu.raster import tiles as T
    from divshot_tpu.raster import pallas_bin as PB
    from divshot_tpu.raster import pallas_raster as PR
    from divshot_tpu.raster.project import project_gaussians
    from divshot_tpu.splat.sh import eval_sh_color
    from divshot_tpu.splat.math import safe_normalize

    params, cam = _small_scene(n=200, seed=5)
    proj = project_gaussians(params.means, params.scales, params.quats,
                             cam, opacities=params.effective_opacity())
    dirs = safe_normalize(params.means - cam.campos[None, :])
    colors = eval_sh_color(params.sh0, params.shN, dirs, 1)
    opac = params.effective_opacity() * proj.comp
    cap_i = 1 << 13

    bins_old = T.bin_gaussians(
        proj.means2d, proj.depths, proj.radii, cam.width, cam.height,
        instance_capacity=cap_i, build_ids_mat=False,
        radii_xy=proj.radii_xy, rad2=proj.rad2)
    bins_new = PB.expand_sorted(
        proj.means2d, proj.conics, proj.depths, proj.radii, proj.radii_xy,
        proj.rad2, colors, opac, width=cam.width, height=cam.height,
        instance_capacity=cap_i, interpret=True)
    # identical sorted order over the REAL instances (padding uses -1 in
    # the old path vs 0x7FFFFFFF in the new) after the depth-bits fix ->
    # the same grad table applies to both reduces
    n_real = int(bins_old.tile_start[-1])
    np.testing.assert_array_equal(
        np.asarray(bins_old.inst_gauss)[:n_real],
        np.asarray(bins_new.s_owner)[:n_real])

    rng = np.random.default_rng(7)
    ngrad = PR._ngrad_rows(1)
    grads = jnp.asarray(rng.standard_normal((ngrad, cap_i)), jnp.float32)
    tw = (cam.width + 15) // 16
    th = (cam.height + 15) // 16
    bnd = jnp.asarray(rng.standard_normal((tw * th, ngrad, PR.BLK)) * 0.1,
                      jnp.float32)

    g_old = PR.reduce_instance_grads(
        grads, bnd, bins_old.tile_start, bins_old.exp2sorted,
        bins_old.g_offsets, bins_old.g_counts, nch=1)
    g_new = PB.reduce_grads_sorted(
        grads, bnd, bins_new.tile_start, bins_new.s_owner,
        bins_new.g_offsets, bins_new.g_counts, nch=1)
    for k in ("means2d", "conics", "colors", "opacity", "absgrad", "npix"):
        np.testing.assert_allclose(np.asarray(g_new[k]),
                                   np.asarray(g_old[k]), atol=2e-4,
                                   err_msg=f"reduce mismatch on {k}")


def test_render_fast_stale_bins_guard():
    """Reusing FastBins after a params update (token bump) must raise —
    the silent-stale-geometry bug from VERDICT r4 weak #6."""
    import pytest as _pytest
    from divshot_tpu.raster.render import render_fast

    params, cam = _small_scene()
    img, alpha, bins = render_fast(params, cam, instance_capacity=1 << 13,
                                   params_token=1)
    # same token: reuse OK (and bit-identical)
    img2, _, _ = render_fast(params, cam, bins=bins,
                             instance_capacity=1 << 13, params_token=1)
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img2))
    # bumped token (params changed): stale bins must be rejected
    with _pytest.raises(ValueError, match="stale FastBins"):
        render_fast(params, cam, bins=bins, instance_capacity=1 << 13,
                    params_token=2)


def test_overlap_step_matches_serial():
    """shard_map early-psum step (dist/overlap.py) must match the serial
    batched step's loss and parameter update to float tolerance, and its
    optimized HLO must contain MORE than one gradient all-reduce (the
    early SH wave is split out of the bundled tuple)."""
    import jax
    import jax.numpy as jnp
    from divshot_tpu.core.config import TrainConfig
    from divshot_tpu.gsio.synthetic import (random_scene, orbit_cameras,
                                            render_gt_images)
    from divshot_tpu.splat.gaussians import init_from_points
    from divshot_tpu.train.trainer import (Dataset, TrainState,
                                           make_train_step)
    from divshot_tpu.train.optim import AdamState
    from divshot_tpu.train import strategy as S
    from divshot_tpu.dist.mesh import make_mesh, shard_train_state
    from divshot_tpu.dist.overlap import make_overlap_train_step

    assert len(jax.devices()) == 8
    rng = np.random.default_rng(3)
    gt = random_scene(rng, 300, sh_degree=1)
    cams = orbit_cameras(8, width=64)
    images = render_gt_images(gt, cams, tile_capacity=512)
    ds = Dataset.from_views(cams, images)
    pts = np.asarray(gt.means)[:150]
    params = init_from_points(pts, rng.uniform(0.2, 0.8, (150, 3)),
                              sh_degree=1, capacity=256)
    cfg = TrainConfig(sh_degree=1)
    cfg.densify.warmup_length = 10_000      # no refine in the check
    cfg.densify.cap_max = 256
    rk = {"tile_capacity": 256, "chunk": 32, "instance_capacity": 1 << 14}

    def mk_state():
        return TrainState(params=params, opt=AdamState.init(params),
                          dstate=S.DensifyState.init(params.capacity),
                          key=jax.random.PRNGKey(0))

    step_b = jax.jit(make_train_step(cfg, ds, rk, batch_size=4))
    state_b, metrics_b = step_b(mk_state(), jnp.arange(4, dtype=jnp.int32))

    mesh = make_mesh(n_data=4, n_model=2)
    compile_for = make_overlap_train_step(cfg, ds, mesh, rk)
    from jax.sharding import NamedSharding, PartitionSpec as P
    state_o = jax.device_put(mk_state(), NamedSharding(mesh, P()))
    step_o = compile_for(state_o)
    state_o, metrics_o = step_o(state_o, jnp.arange(4, dtype=jnp.int32))

    np.testing.assert_allclose(float(metrics_o["loss"]),
                               float(metrics_b["loss"]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(state_o.params.means),
                               np.asarray(state_b.params.means), atol=1e-5)
    np.testing.assert_allclose(np.asarray(state_o.params.sh0),
                               np.asarray(state_b.params.sh0), atol=1e-5)

    # schedule evidence: the gradient all-reduce is SPLIT (early SH wave +
    # late wave), not one bundled tuple
    txt = step_o.lower(state_o, jnp.arange(4, dtype=jnp.int32)) \
        .compile().as_text()
    n_ar = txt.count(" all-reduce(") + txt.count(" all-reduce-start(")
    assert n_ar >= 2, f"expected split all-reduces, found {n_ar}"


def test_adc_strategy_defaults_pairing():
    """r4 ADC leg saturated cap_max in 1.3K iters: the scale2d split was on
    by default and absgrad ran against the signed-grad threshold. Classic
    ADC must resolve to signed grads @2e-4, ADC+ to absgrad @8e-4, and the
    scale2d trigger must stay disabled unless explicitly requested."""
    # classic ADC (densifyStrategy 0)
    cfg = auto_tune_config(config_from_flags(
        ["--source_path", "x", "--densify_strategy", "0"]), 100)
    assert cfg.densify.strategy == DensifyStrategy.ADC
    assert cfg.densify.use_abs_grad is False
    assert cfg.densify.grow_grad2d == pytest.approx(2e-4)
    assert cfg.densify.refine_scale2d_stop_iter == 0

    # ADC+ (densifyStrategy 2): absgrad stays on, threshold scales 4x
    cfg2 = auto_tune_config(config_from_flags(
        ["--source_path", "x", "--densify_strategy", "2"]), 100)
    assert cfg2.densify.use_abs_grad is True
    assert cfg2.densify.grow_grad2d == pytest.approx(8e-4)

    # explicit user values always win
    cfg3 = auto_tune_config(config_from_flags(
        ["--source_path", "x", "--densify_strategy", "2",
         "--grow_grad2d", "3e-4"]), 100)
    assert cfg3.densify.grow_grad2d == pytest.approx(3e-4)

    # MCMC (default) is untouched by the pairing logic
    cfg4 = auto_tune_config(config_from_flags(["--source_path", "x"]), 100)
    assert cfg4.densify.strategy == DensifyStrategy.MCMC
    assert cfg4.densify.grow_grad2d == pytest.approx(2e-4)


def test_surfel_eval_ignores_third_scale_axis():
    """r4's 2DGS leg trained to 30.7 dB (train) but evaluated at 18.2: the
    CLI forced backend=pallas, so eval rendered the RAW params as thick 3D
    slabs (the third log-scale stays at init under the surfel path). The
    fix routes modelType=1 through the surfel backends end-to-end; this
    locks the property that makes eval-on-raw-params correct — the surfel
    renderer's output is invariant to the raw third scale axis — and that
    a 3D render of the same raw params is NOT (the r4 failure mode)."""
    import jax.numpy as jnp
    from divshot_tpu.raster.render import render
    from tests.test_surfel import make_surfel_scene

    params, cam = make_surfel_scene(seed=3, n=40, size=32)
    # raw params with a fat third axis (as left behind by training)
    fat = params.replace(scales=params.scales.at[:, 2].set(np.log(0.5)))

    rk = dict(tile_size=16, instance_capacity=4096)
    img_raw = render(fat, cam, backend="surfel", **rk).image
    img_flat = render(params.replace(
        scales=params.scales.at[:, 2].set(np.log(1e-6))), cam,
        backend="surfel", **rk).image
    np.testing.assert_allclose(np.asarray(img_raw), np.asarray(img_flat),
                               atol=1e-5)

    # the 3D path over the same raw params differs grossly — the bug this
    # guards against was exactly this mismatch reaching eval
    img_3d = render(fat, cam, backend="tiles", **rk).image
    assert float(jnp.mean(jnp.abs(img_3d - img_raw))) > 1e-3


def test_flattened_gs2d_normal_loss_pairing():
    """The normal-consistency term destabilizes the flattened-EWA GS2D
    mode (r5: 30.2 dB @6K collapsed to 18.5 by 9K once it activated at
    normal_start_iter). auto_tune zeroes it for surfel_exact=0 unless the
    user asks; exact-kernel mode keeps the 2DGS default."""
    cfg = auto_tune_config(config_from_flags(
        ["--source_path", "x", "--model_type", "1",
         "--surfel_exact", "0"]), 100)
    assert cfg.normal_loss_weight == 0.0

    cfg2 = auto_tune_config(config_from_flags(
        ["--source_path", "x", "--model_type", "1"]), 100)
    assert cfg2.normal_loss_weight == pytest.approx(0.05)

    cfg3 = auto_tune_config(config_from_flags(
        ["--source_path", "x", "--model_type", "1", "--surfel_exact", "0",
         "--normal_loss_weight", "0.01"]), 100)
    assert cfg3.normal_loss_weight == pytest.approx(0.01)
