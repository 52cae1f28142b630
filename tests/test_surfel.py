"""Exact 2DGS (ray-splat intersection) rasterizer: forward parity against an
independent per-pixel numpy oracle (linear-solve formulation vs the kernel's
cross-product formulation), gradient sanity, and trainer integration
(modelType=1, ``editor.cpp:1847``)."""

import numpy as np
import jax
import jax.numpy as jnp

from divshot_tpu.splat.camera import Camera
from divshot_tpu.splat.gaussians import GaussianParams
from divshot_tpu.raster.surfel import (
    project_surfels, render_surfels, ALPHA_MIN, ALPHA_MAX, T_EPS,
    FILTER_INV_SQ)


def make_surfel_scene(seed=0, n=60, size=64):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-1.0, 1.0, (n, 3)).astype(np.float32)
    scales = rng.uniform(np.log(0.05), np.log(0.3), (n, 3)).astype(np.float32)
    quats = rng.standard_normal((n, 4)).astype(np.float32)
    opac = rng.uniform(0.0, 3.0, (n,)).astype(np.float32)
    sh0 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    params = GaussianParams.create(
        means, scales=scales, quats=quats, opacity=opac, sh0=sh0,
        sh_degree=0)
    cam = Camera.look_at(
        eye=[0, 0.3, -3.5], target=[0, 0, 0], up=[0, -1, 0],
        fov_y_deg=50.0, width=size, height=size)
    return params, cam


def oracle_render(params, cam, background):
    """Brute-force exact-2DGS forward: per pixel, all splats in center-depth
    order, (u, v) from a 2x2 LINEAR SOLVE (independent of the kernel's
    cross-product path)."""
    pr = jax.tree.map(np.asarray, project_surfels(
        params.means, params.scales, params.quats, cam))
    T = pr["Tmat"]
    zpl = pr["zplane"]
    c2d = pr["center2d"]
    radii = pr["radii"]
    op = np.asarray(params.effective_opacity())
    from divshot_tpu.splat.sh import eval_sh_color
    from divshot_tpu.splat.math import safe_normalize
    dirs = safe_normalize(params.means - cam.campos[None, :])
    col = np.asarray(eval_sh_color(params.sh0, params.shN, dirs, 0))
    order = np.argsort(np.asarray(pr["depths"]))
    H, W = cam.height, cam.width
    img = np.zeros((H, W, 3), np.float32)
    alpha_img = np.zeros((H, W), np.float32)
    for py in range(H):
        for px_ in range(W):
            x, y = px_ + 0.5, py + 0.5
            Tacc = 1.0
            for i in order:
                if radii[i] <= 0:
                    continue
                # cheap reject far outside the binning radius (matches the
                # tile cull at tile granularity — use a loose bound)
                if (abs(x - c2d[i, 0]) > radii[i] + 16
                        or abs(y - c2d[i, 1]) > radii[i] + 16):
                    continue
                A = np.array([
                    [T[i, 0, 0] - x * T[i, 2, 0], T[i, 0, 1] - x * T[i, 2, 1]],
                    [T[i, 1, 0] - y * T[i, 2, 0], T[i, 1, 1] - y * T[i, 2, 1]],
                ])
                b = np.array([x * T[i, 2, 2] - T[i, 0, 2],
                              y * T[i, 2, 2] - T[i, 1, 2]])
                det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
                if abs(det) < 1e-12:
                    continue
                u = (b[0] * A[1, 1] - b[1] * A[0, 1]) / det
                v = (A[0, 0] * b[1] - A[1, 0] * b[0]) / det
                rho3d = u * u + v * v
                d2 = (x - c2d[i, 0]) ** 2 + (y - c2d[i, 1]) ** 2
                rho = min(rho3d, FILTER_INV_SQ * d2)
                z_px = zpl[i, 0] * u + zpl[i, 1] * v + zpl[i, 2]
                a = op[i] * np.exp(-0.5 * rho)
                if a < ALPHA_MIN or z_px <= 0.01:
                    continue
                a = min(a, ALPHA_MAX)
                q = Tacc * (1.0 - a)
                if q < T_EPS:
                    break
                img[py, px_] += a * Tacc * col[i]
                Tacc = q
            img[py, px_] += Tacc * background
            alpha_img[py, px_] = 1.0 - Tacc
    return img, alpha_img


def test_surfel_forward_vs_oracle():
    params, cam = make_surfel_scene(n=50, size=48)
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    out, npix = render_surfels(params, cam, background=bg,
                               with_geometry=False)
    ref_img, ref_alpha = oracle_render(params, cam, np.asarray(bg))
    got = np.asarray(out.image)
    # tile binning may order equal-depth splats differently; tolerance
    # covers f32 accumulation differences
    assert np.max(np.abs(got - ref_img)) < 2e-3, \
        np.max(np.abs(got - ref_img))
    assert np.max(np.abs(np.asarray(out.alpha) - ref_alpha)) < 2e-3
    assert float(jnp.sum(npix)) > 0


def test_surfel_geometry_planes():
    """Depth plane = per-pixel intersection depth: for a single fronto-
    parallel surfel, depth/alpha must equal the plane's camera z."""
    means = np.array([[0.0, 0.0, 0.0]], np.float32)
    scales = np.log(np.array([[0.5, 0.5, 0.5]], np.float32))
    quats = np.array([[1.0, 0, 0, 0]], np.float32)   # identity
    opac = np.array([8.0], np.float32)               # ~1.0 after sigmoid
    sh0 = np.array([[0.5, 0.5, 0.5]], np.float32)
    params = GaussianParams.create(means, scales=scales, quats=quats,
                                   opacity=opac, sh0=sh0, sh_degree=0)
    cam = Camera.look_at(eye=[0, 0, -2.0], target=[0, 0, 0], up=[0, -1, 0],
                         fov_y_deg=60.0, width=32, height=32)
    out, _ = render_surfels(params, cam, with_geometry=True)
    a = np.asarray(out.alpha)
    planes = np.asarray(out.extra)
    m = a > 0.9
    assert m.sum() > 20
    depth = planes[..., 0][m] / a[m]
    # plane through origin normal to view dir at distance 2
    assert np.allclose(depth, 2.0, atol=1e-3)
    # normals: fronto-parallel surfel faces the camera => nx, ny ~ 0
    assert np.max(np.abs(planes[..., 2][m] / a[m])) < 1e-3
    assert np.max(np.abs(planes[..., 3][m] / a[m])) < 1e-3


def dense_surfel_loss(params, cam, means, scales, quats):
    """Independent differentiable dense oracle: every (pixel, splat) pair,
    (u, v) via the 2x2 LINEAR SOLVE, global front-to-back compositing —
    identical cutoff semantics, no tiles."""
    pr = project_surfels(means, scales, quats, cam)
    order = jnp.argsort(jax.lax.stop_gradient(pr["depths"]))
    T = pr["Tmat"][order]
    zpl = pr["zplane"][order]
    c2d = pr["center2d"][order]
    radii = jax.lax.stop_gradient(pr["radii"][order])
    op = params.effective_opacity()[order]
    from divshot_tpu.splat.sh import eval_sh_color
    from divshot_tpu.splat.math import safe_normalize
    dirs = safe_normalize(means - cam.campos[None, :])
    col = eval_sh_color(params.sh0, params.shN, dirs, 0)[order]
    H, W = cam.height, cam.width
    ys, xs = jnp.meshgrid(jnp.arange(H) + 0.5, jnp.arange(W) + 0.5,
                          indexing="ij")
    x = xs.reshape(-1)[:, None]                    # (P, 1)
    y = ys.reshape(-1)[:, None]
    a00 = T[None, :, 0, 0] - x * T[None, :, 2, 0]
    a01 = T[None, :, 0, 1] - x * T[None, :, 2, 1]
    a10 = T[None, :, 1, 0] - y * T[None, :, 2, 0]
    a11 = T[None, :, 1, 1] - y * T[None, :, 2, 1]
    b0 = x * T[None, :, 2, 2] - T[None, :, 0, 2]
    b1 = y * T[None, :, 2, 2] - T[None, :, 1, 2]
    det = a00 * a11 - a01 * a10
    ok = jnp.abs(det) > 1e-12
    det_s = jnp.where(ok, det, 1.0)
    u = (b0 * a11 - b1 * a01) / det_s
    v = (a00 * b1 - a10 * b0) / det_s
    rho = jnp.minimum(u * u + v * v,
                      FILTER_INV_SQ * ((x - c2d[None, :, 0]) ** 2
                                       + (y - c2d[None, :, 1]) ** 2))
    z_px = zpl[None, :, 0] * u + zpl[None, :, 1] * v + zpl[None, :, 2]
    alpha = op[None, :] * jnp.exp(-0.5 * rho)
    valid = ok & (alpha >= ALPHA_MIN) & (z_px > 0.01) & (radii[None, :] > 0)
    alpha = jnp.where(valid, jnp.minimum(alpha, ALPHA_MAX), 0.0)
    q = jnp.cumprod(1.0 - alpha, axis=1)           # inclusive
    applied = q >= T_EPS
    a_eff = jnp.where(applied, alpha, 0.0)
    om = 1.0 - a_eff
    T_excl = jnp.concatenate(
        [jnp.ones_like(om[:, :1]), jnp.cumprod(om, axis=1)[:, :-1]], axis=1)
    img = jnp.einsum("ps,sd->pd", a_eff * T_excl, col)
    return jnp.sum(img ** 2)


def _alpha_field(params, cam):
    """f64 per-(pixel, splat) alpha + running transmittance of the scene —
    the oracle's own forward, used to certify the scene is free of
    threshold-straddling pixels (see _clean_surfel_scene)."""
    pr = jax.tree.map(lambda x: np.asarray(x, np.float64), project_surfels(
        params.means, params.scales, params.quats, cam))
    order = np.argsort(pr["depths"])
    T = pr["Tmat"][order]
    zpl = pr["zplane"][order]
    c2d = pr["center2d"][order]
    radii = pr["radii"][order]
    op = np.asarray(params.effective_opacity(), np.float64)[order]
    H, W = cam.height, cam.width
    ys, xs = np.meshgrid(np.arange(H) + 0.5, np.arange(W) + 0.5,
                         indexing="ij")
    x = xs.reshape(-1)[:, None]
    y = ys.reshape(-1)[:, None]
    a00 = T[None, :, 0, 0] - x * T[None, :, 2, 0]
    a01 = T[None, :, 0, 1] - x * T[None, :, 2, 1]
    a10 = T[None, :, 1, 0] - y * T[None, :, 2, 0]
    a11 = T[None, :, 1, 1] - y * T[None, :, 2, 1]
    b0 = x * T[None, :, 2, 2] - T[None, :, 0, 2]
    b1 = y * T[None, :, 2, 2] - T[None, :, 1, 2]
    det = a00 * a11 - a01 * a10
    ok = np.abs(det) > 1e-12
    det_s = np.where(ok, det, 1.0)
    u = (b0 * a11 - b1 * a01) / det_s
    v = (a00 * b1 - a10 * b0) / det_s
    rho = np.minimum(u * u + v * v,
                     FILTER_INV_SQ * ((x - c2d[None, :, 0]) ** 2
                                      + (y - c2d[None, :, 1]) ** 2))
    z_px = zpl[None, :, 0] * u + zpl[None, :, 1] * v + zpl[None, :, 2]
    alpha = op[None, :] * np.exp(-0.5 * rho)
    valid = ok & (alpha >= ALPHA_MIN) & (z_px > 0.01) & (radii[None, :] > 0)
    a_v = np.where(valid, np.minimum(alpha, ALPHA_MAX), 0.0)
    q = np.cumprod(1.0 - a_v, axis=1)
    return alpha, q, radii


def _clean_surfel_scene(n=12, size=32, alpha_band=5e-6, q_band=1e-8):
    """First seed whose scene has NO pixel within ``alpha_band`` of the
    1/255 alpha cutoff (nor ``q_band`` of the early-stop T_EPS).

    The rasterizer discards alpha < 1/255 (reference ``gsplat_ps.hlsl``
    semantics). Two mathematically identical f32 pipelines (tiled
    cross-product kernel vs dense linear-solve oracle) round alpha
    differently by ~1e-7; a pixel whose TRUE alpha lies within that band of
    the cutoff is valid in one and discarded in the other, flipping that
    splat's whole gradient contribution at the pixel. That is a property of
    every hard-cutoff rasterizer (the reference's CUDA trainer included),
    not a kernel defect — so gradient parity is asserted on scenes certified
    (in f64) to keep every pixel away from the discontinuity."""
    for seed in range(32):
        params, cam = make_surfel_scene(seed=seed, n=n, size=size)
        params = params.replace(opacity=jnp.full_like(params.opacity, -1.2))
        alpha, q, _ = _alpha_field(params, cam)
        if (np.abs(alpha - ALPHA_MIN) < alpha_band).any():
            continue
        if (np.abs(q - T_EPS) < q_band).any():
            continue
        return params, cam, seed
    raise AssertionError("no threshold-clean scene in 32 seeds")


def test_surfel_gradients_vs_dense_oracle():
    """Autodiff grads through the tiled cross-product kernel == autodiff
    grads through the dense linear-solve oracle (means, scales, quats), on
    a scene certified free of cutoff-straddling pixels (see
    _clean_surfel_scene — round-2 red test root cause)."""
    params, cam, seed = _clean_surfel_scene()
    bg = jnp.zeros((3,), jnp.float32)

    def loss_tiled(means, scales, quats):
        p = params.replace(means=means, scales=scales, quats=quats)
        out, _ = render_surfels(p, cam, background=bg, with_geometry=False)
        return jnp.sum(out.image ** 2)

    def loss_dense(means, scales, quats):
        return dense_surfel_loss(params, cam, means, scales, quats)

    args = (params.means, params.scales, params.quats)
    gt_ = jax.grad(loss_tiled, argnums=(0, 1, 2))(*args)
    gd_ = jax.grad(loss_dense, argnums=(0, 1, 2))(*args)
    assert abs(float(loss_tiled(*args)) - float(loss_dense(*args))) < 1e-2
    for a, b, name in zip(gt_, gd_, ("means", "scales", "quats")):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a)), name
        scale = np.maximum(np.abs(b).max(), 1e-3)
        assert np.max(np.abs(a - b)) < 1e-3 * scale + 1e-4, \
            (name, seed, np.max(np.abs(a - b)), scale)


def test_surfel_numeric_gradcheck():
    """check_grads-style finite differences of the tiled kernel's OWN
    forward vs its autodiff gradient (means, scales, quats): central
    differences on a threshold-clean scene, loss reduced in f64 on host so
    FD noise stays well under the tolerance."""
    params, cam, _ = _clean_surfel_scene()
    bg = jnp.zeros((3,), jnp.float32)

    def loss(means, scales, quats):
        p = params.replace(means=means, scales=scales, quats=quats)
        out, _ = render_surfels(p, cam, background=bg, with_geometry=False)
        return jnp.sum(out.image ** 2)

    def loss64(means, scales, quats):
        p = params.replace(means=jnp.asarray(means, jnp.float32),
                           scales=jnp.asarray(scales, jnp.float32),
                           quats=jnp.asarray(quats, jnp.float32))
        out, _ = render_surfels(p, cam, background=bg, with_geometry=False)
        return float(np.sum(np.asarray(out.image, np.float64) ** 2))

    args = (params.means, params.scales, params.quats)
    grads = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(*args)
    rng = np.random.default_rng(7)
    eps = 3e-4
    base = [np.asarray(a, np.float64) for a in args]
    for k, name in enumerate(("means", "scales", "quats")):
        g = np.asarray(grads[k], np.float64)
        for _ in range(2):
            d = rng.standard_normal(base[k].shape)
            d /= np.linalg.norm(d)
            plus = list(base)
            minus = list(base)
            plus[k] = base[k] + eps * d
            minus[k] = base[k] - eps * d
            fd = (loss64(*plus) - loss64(*minus)) / (2 * eps)
            an = float(np.sum(g * d))
            tol = 0.02 * max(abs(an), float(np.linalg.norm(g)) * 0.1) + 5e-3
            assert abs(fd - an) < tol, (name, fd, an, tol)


def test_surfel_sink_gradients():
    """The virtual-shift sinks harvest screen-space position gradients."""
    params, cam = make_surfel_scene(n=30, size=32)

    def loss_fn(m2d_sink):
        out, _ = render_surfels(params, cam, means2d_sink=m2d_sink,
                                with_geometry=False)
        return jnp.mean((out.image - 0.5) ** 2)

    g = jax.grad(loss_fn)(jnp.zeros((params.capacity, 2), jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_trainer_2dgs_exact_step():
    """model_type=1 trains through the exact kernel: step runs, loss finite,
    densify stats populated."""
    from divshot_tpu.core.config import TrainConfig
    from divshot_tpu.train.trainer import Trainer, Dataset
    from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras, \
        render_gt_images

    rng = np.random.default_rng(3)
    gt = random_scene(rng, 200, sh_degree=0)
    cams = orbit_cameras(4, width=64)
    images = render_gt_images(gt, cams, backend="tiles")
    ds = Dataset.from_views(cams, images)
    cfg = TrainConfig(model_type=1, sh_degree=0, num_iters=4,
                      normal_consistency_loss=True, dist_loss_weight=100.0)
    cfg.densify.cap_max = 256
    pts = np.asarray(gt.means)[:128]
    cols = np.full((128, 3), 0.5, np.float32)
    from divshot_tpu.splat.gaussians import init_from_points
    params = init_from_points(pts, cols, sh_degree=0, capacity=256)
    tr = Trainer(cfg, ds, params)
    for _ in range(3):
        m = tr.step_once()
    assert np.isfinite(float(m["loss"]))
    # the exact path must feed densification stats (position-sensitivity)
    assert float(jnp.sum(tr.state.dstate.grad_accum)) >= 0
