"""Rasterizer correctness: EWA projection vs numpy oracle; tiled rasterizer
forward + analytic backward vs the dense scan reference (SURVEY §4.2 —
BASELINE.json config #1: ~1K random gaussians, 128×128)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from divshot_tpu.splat.camera import Camera
from divshot_tpu.splat.gaussians import GaussianParams
from divshot_tpu.raster.project import project_gaussians
from divshot_tpu.raster.render import render


def make_scene(rng, n=800, sh_degree=0):
    means = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    scales = rng.uniform(np.log(0.02), np.log(0.15), (n, 3)).astype(np.float32)
    quats = rng.standard_normal((n, 4)).astype(np.float32)
    opac = rng.uniform(-1.5, 2.5, (n,)).astype(np.float32)
    sh0 = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    n_sh = {0: 0, 1: 3, 2: 8, 3: 15}[sh_degree]
    shN = (0.1 * rng.standard_normal((n, n_sh, 3))).astype(np.float32)
    params = GaussianParams.create(
        means, scales=scales, quats=quats, opacity=opac, sh0=sh0,
        shN=shN if n_sh else None, sh_degree=sh_degree)
    cam = Camera.look_at(
        eye=[0, 0, -4.0], target=[0, 0, 0], up=[0, -1, 0],
        fov_y_deg=50.0, width=128, height=128)
    return params, cam


def np_project_one(mean, cov3d, viewmat, fx, fy, cx, cy, eps2d=0.3):
    R, t = viewmat[:3, :3], viewmat[:3, 3]
    p = R @ mean + t
    J = np.array([
        [fx / p[2], 0, -fx * p[0] / p[2] ** 2],
        [0, fy / p[2], -fy * p[1] / p[2] ** 2],
    ])
    V = R @ cov3d @ R.T
    cov2d = J @ V @ J.T + eps2d * np.eye(2)
    u = fx * p[0] / p[2] + cx
    v = fy * p[1] / p[2] + cy
    return np.array([u, v]), cov2d, p[2]


def test_projection_vs_numpy(rng):
    params, cam = make_scene(rng, n=64)
    proj = project_gaussians(params.means, params.scales, params.quats, cam)
    from divshot_tpu.splat.math import build_cov3d
    cov3d = np.asarray(build_cov3d(params.scales, params.quats))
    viewmat = np.asarray(cam.viewmat)
    means = np.asarray(params.means)
    fx, fy = float(cam.fx), float(cam.fy)
    cx, cy = float(cam.cx), float(cam.cy)
    tan = float(cam.tan_fovx)

    for i in range(64):
        m2, c2, z = np_project_one(means[i], cov3d[i], viewmat, fx, fy, cx, cy)
        if z < 0.05 or abs(means[i][0] / z) > 1.2 * tan:
            continue  # skip clamped/culled edge cases
        np.testing.assert_allclose(np.asarray(proj.means2d)[i], m2,
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_allclose(np.asarray(proj.depths)[i], z, rtol=1e-5)
        got = np.asarray(proj.cov2d)[i]
        np.testing.assert_allclose(
            got, [c2[0, 0], c2[0, 1], c2[1, 1]], rtol=1e-3, atol=1e-3)
        # conic = inverse of dilated cov2d
        inv = np.linalg.inv(c2)
        np.testing.assert_allclose(
            np.asarray(proj.conics)[i], [inv[0, 0], inv[0, 1], inv[1, 1]],
            rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("sh_degree", [0, 3])
def test_tiles_match_dense_forward(rng, sh_degree):
    params, cam = make_scene(rng, n=800, sh_degree=sh_degree)
    bg = jnp.asarray([0.1, 0.2, 0.3])

    out_d = render(params, cam, backend="dense", background=bg)
    out_t = render(params, cam, backend="tiles", background=bg,
                   tile_capacity=1024, chunk=32)
    img_d = np.asarray(out_d.image)
    img_t = np.asarray(out_t.image)
    # dense has no early-stop; tiles stop at T<1e-4 → tiny differences only
    assert np.abs(img_d - img_t).max() < 5e-3, \
        f"max diff {np.abs(img_d - img_t).max()}"
    assert np.abs(np.asarray(out_d.alpha) - np.asarray(out_t.alpha)).max() < 5e-3


def test_tiles_gradients_match_dense(rng):
    """Analytic custom-VJP backward vs autodiff of the dense oracle."""
    params, cam = make_scene(rng, n=300, sh_degree=0)
    bg = jnp.asarray([0.0, 0.0, 0.0])
    target = jnp.asarray(rng.uniform(0, 1, (128, 128, 3)), jnp.float32)

    float_fields = ("means", "scales", "quats", "opacity", "sh0")

    def loss_fn(fields, backend):
        p = params.replace(**fields)
        out = render(p, cam, backend=backend, background=bg,
                     tile_capacity=512, chunk=32)
        return jnp.sum((out.image - target) ** 2)

    fields0 = {k: getattr(params, k) for k in float_fields}
    g_dense = jax.grad(lambda f: loss_fn(f, "dense"))(fields0)
    g_tiles = jax.grad(lambda f: loss_fn(f, "tiles"))(fields0)

    for name in float_fields:
        gd = np.asarray(g_dense[name])
        gt = np.asarray(g_tiles[name])
        scale = np.abs(gd).max() + 1e-8
        err = np.abs(gd - gt).max() / scale
        assert err < 2e-2, f"{name}: rel err {err} (scale {scale})"


def test_custom_vjp_vs_autodiff_same_forward(rng):
    """The analytic backward must match autodiff through the *identical*
    tiled forward (same binning, same early-stop) — isolates the handwritten
    VJP math from rasterization discontinuities."""
    from divshot_tpu.raster.project import project_gaussians
    from divshot_tpu.raster import tiles as T
    from divshot_tpu.splat.sh import eval_sh_color

    params, cam = make_scene(rng, n=300, sh_degree=0)
    proj = project_gaussians(params.means, params.scales, params.quats, cam)
    colors = eval_sh_color(params.sh0, params.shN,
                           jnp.zeros_like(params.means) + jnp.asarray([0, 0, 1.0]))
    opac = params.effective_opacity()
    bins = T.bin_gaussians(proj.means2d, proj.depths, proj.radii, 128, 128,
                           tile_capacity=512, instance_capacity=1 << 15)
    target = jnp.asarray(rng.uniform(0, 1, (128, 128, 3)), jnp.float32)
    bg = jnp.asarray([0.3, 0.1, 0.6])

    def loss(args, use_ad):
        m2d, con, col, op = args
        img, alpha = T.composite_tiles(
            m2d, con, col, op, bins.ids_mat, 128, 128, chunk=32,
            background=bg, _use_autodiff=use_ad)
        return jnp.sum((img - target) ** 2) + jnp.sum(alpha * 0.37)

    args = (proj.means2d, proj.conics, colors, opac)
    g_an = jax.grad(lambda a: loss(a, False))(args)
    g_ad = jax.grad(lambda a: loss(a, True))(args)
    names = ["means2d", "conics", "colors", "opacity"]
    for name, ga, gb in zip(names, g_an, g_ad):
        ga, gb = np.asarray(ga), np.asarray(gb)
        scale = np.abs(gb).max() + 1e-8
        err = np.abs(ga - gb).max() / scale
        assert err < 2e-3, f"{name}: rel err {err}"


def test_absgrad_harvest(rng):
    """absgrad (AbsGS) ≥ |signed grad| componentwise."""
    params, cam = make_scene(rng, n=200, sh_degree=0)
    sink = jnp.zeros((params.capacity, 2))

    def loss_fn(s):
        out = render(params, cam, backend="tiles", tile_capacity=512,
                     chunk=32, absgrad_sink=s)
        return jnp.sum(out.image ** 2)

    g_means2d_abs = jax.grad(loss_fn)(sink)
    assert np.asarray(g_means2d_abs).sum() > 0
