"""Pallas surfel (exact-2DGS) kernels vs the XLA scan compositor
(interpret mode on CPU): forward parity, full gradient parity through the
hand-written backward, and the sink-gradient contract (signed means2d,
per-pixel AbsGS, npix)."""

import numpy as np
import jax
import jax.numpy as jnp

from divshot_tpu.raster.surfel import render_surfels
from divshot_tpu.raster.pallas_surfel import render_surfels_pallas
from tests.test_surfel import make_surfel_scene, _clean_surfel_scene


def _pallas(params, cam, **kw):
    return render_surfels_pallas(params, cam, interpret=True, **kw)


def test_pallas_surfel_forward_parity():
    params, cam = make_surfel_scene(n=60, size=64)
    bg = jnp.asarray([0.15, 0.3, 0.45])
    out_x, _ = render_surfels(params, cam, background=bg,
                              with_geometry=True)
    out_p, _ = _pallas(params, cam, background=bg, with_geometry=True)
    np.testing.assert_allclose(np.asarray(out_p.image),
                               np.asarray(out_x.image), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out_p.alpha),
                               np.asarray(out_x.alpha), atol=5e-5)
    np.testing.assert_allclose(np.asarray(out_p.extra),
                               np.asarray(out_x.extra), atol=2e-4)


def test_pallas_surfel_gradient_parity():
    """Geometry gradients through the hand-written cross-product backward
    must match autodiff through the XLA scan on a threshold-clean scene."""
    params, cam, _seed = _clean_surfel_scene(n=12, size=32)
    bg = jnp.asarray([0.1, 0.2, 0.3])
    tgt = jnp.asarray(
        np.random.default_rng(5).uniform(0, 1, (32, 32, 3)), jnp.float32)

    def make_loss(render_fn):
        def loss(means, scales, quats, opacity, sh0):
            p = params.replace(means=means, scales=scales, quats=quats,
                               opacity=opacity, sh0=sh0)
            out, _ = render_fn(p, cam, background=bg, with_geometry=True)
            zl = jnp.sum(out.extra[..., 0]) + 0.3 * jnp.sum(
                out.extra[..., 1]) + 0.11 * jnp.sum(out.extra[..., 2:])
            return (jnp.sum((out.image - tgt) ** 2)
                    + 0.23 * jnp.sum(out.alpha) + 1e-3 * zl)
        return loss

    args = (params.means, params.scales, params.quats, params.opacity,
            params.sh0)
    g_x = jax.grad(make_loss(render_surfels), argnums=(0, 1, 2, 3, 4))(*args)
    g_p = jax.grad(make_loss(_pallas), argnums=(0, 1, 2, 3, 4))(*args)
    for name, ga, gb in zip(["means", "scales", "quats", "opacity", "sh0"],
                            g_p, g_x):
        ga, gb = np.asarray(ga), np.asarray(gb)
        scale = np.abs(gb).max() + 1e-8
        err = np.abs(ga - gb).max() / scale
        assert err < 3e-4, f"{name}: rel err {err}"


def test_pallas_surfel_sink_gradients():
    """means2d sink: signed screen-shift gradient parity with the XLA path;
    absgrad sink: per-pixel |grad| >= |signed sum| (AbsGS dominance);
    npix sink: applied-pixel counts > 0 where visible."""
    params, cam, _seed = _clean_surfel_scene(n=12, size=32)
    cap = params.capacity
    z2 = jnp.zeros((cap, 2), jnp.float32)
    z1 = jnp.zeros((cap,), jnp.float32)

    def loss_x(m2d):
        out, _ = render_surfels(params, cam, means2d_sink=m2d,
                                with_geometry=False)
        return jnp.mean((out.image - 0.4) ** 2)

    def loss_p(sinks):
        ab, m2d, npx = sinks
        out, _ = _pallas(params, cam, absgrad_sink=ab, means2d_sink=m2d,
                         npix_sink=npx, with_geometry=False)
        return jnp.mean((out.image - 0.4) ** 2)

    g_x = jax.grad(loss_x)(z2)
    g_ab, g_m2d, g_np = jax.grad(loss_p)((z2, z2, z1))
    g_x, g_ab, g_m2d, g_np = map(np.asarray, (g_x, g_ab, g_m2d, g_np))

    scale = np.abs(g_x).max() + 1e-8
    assert np.abs(g_m2d - g_x).max() / scale < 3e-4
    # AbsGS: sum of magnitudes dominates the magnitude of the signed sum
    assert (g_ab + 1e-6 >= np.abs(g_m2d)).all()
    assert g_ab.max() > 0
    assert (g_np >= 0).all() and g_np.max() > 0
    # pixel counts agree with the XLA forward's npix output
    npx_x = np.asarray(
        render_surfels(params, cam, with_geometry=False)[1])
    assert np.abs(g_np - npx_x).max() <= 2  # clamp-edge pixels may differ


def test_pallas_surfel_trainer_step():
    """A train step through backend=surfel_pallas runs and produces finite
    loss + densify stats (interpret mode)."""
    from divshot_tpu.core.config import TrainConfig
    from divshot_tpu.train.trainer import Trainer, Dataset
    from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras, \
        render_gt_images
    from divshot_tpu.splat.gaussians import init_from_points

    rng = np.random.default_rng(3)
    gt = random_scene(rng, 200, sh_degree=0)
    cams = orbit_cameras(2, width=32)
    images = render_gt_images(gt, cams, backend="tiles")
    ds = Dataset.from_views(cams, images)
    cfg = TrainConfig(model_type=1, sh_degree=0, num_iters=2,
                      normal_consistency_loss=True, dist_loss_weight=100.0)
    cfg.densify.cap_max = 256
    pts = np.asarray(gt.means)[:128]
    cols = np.full((128, 3), 0.5, np.float32)
    params = init_from_points(pts, cols, sh_degree=0, capacity=256)
    tr = Trainer(cfg, ds, params,
                 render_kwargs={"backend": "surfel_pallas"})
    m = tr.step_once()
    assert np.isfinite(float(m["loss"]))
    assert float(jnp.sum(tr.state.dstate.grad_accum)) >= 0
