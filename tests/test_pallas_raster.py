"""Pallas rasterizer vs the XLA tiled compositor (interpret mode on CPU):
forward image parity and full gradient parity through the custom VJP."""

import numpy as np
import jax
import jax.numpy as jnp

from divshot_tpu.raster.project import project_gaussians
from divshot_tpu.raster import tiles as T
from divshot_tpu.raster import pallas_raster as PR
from divshot_tpu.splat.sh import eval_sh_color
from tests.test_raster import make_scene


def _setup(rng, n=600, res=128):
    params, cam = make_scene(rng, n=n, sh_degree=0)
    proj = project_gaussians(params.means, params.scales, params.quats, cam)
    dirs = jnp.tile(jnp.asarray([[0.0, 0, 1]]), (params.capacity, 1))
    colors = eval_sh_color(params.sh0, params.shN, dirs)
    opac = params.effective_opacity()
    bins = T.bin_gaussians(proj.means2d, proj.depths, proj.radii, res, res,
                           tile_capacity=2048, instance_capacity=1 << 15)
    return proj, colors, opac, bins, res


def test_pallas_forward_matches_tiles(rng):
    proj, colors, opac, bins, res = _setup(rng)

    img_x, alpha_x = T.composite_tiles(
        proj.means2d, proj.conics, colors, opac, bins.ids_mat, res, res,
        chunk=32, background=jnp.asarray([0.2, 0.4, 0.6]))

    img_p, alpha_p = PR.rasterize_pallas(
        proj.means2d, proj.conics, colors, opac, bins,
        width=res, height=res, background=jnp.asarray([0.2, 0.4, 0.6]),
        interpret=True)

    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_x),
                               atol=3e-5)
    np.testing.assert_allclose(np.asarray(alpha_p), np.asarray(alpha_x),
                               atol=3e-5)


def test_pallas_gradients_match_tiles(rng):
    proj, colors, opac, bins, res = _setup(rng, n=300)
    target = jnp.asarray(rng.uniform(0, 1, (res, res, 3)), jnp.float32)
    bg = jnp.asarray([0.3, 0.1, 0.6])

    def loss_x(args):
        m2d, con, col, op = args
        img, alpha = T.composite_tiles(
            m2d, con, col, op, bins.ids_mat, res, res, chunk=32,
            background=bg)
        return jnp.sum((img - target) ** 2) + 0.37 * jnp.sum(alpha)

    def loss_p(args):
        m2d, con, col, op = args
        img, alpha = PR.rasterize_pallas(
            m2d, con, col, op, bins, width=res, height=res,
            background=bg, interpret=True)
        return jnp.sum((img - target) ** 2) + 0.37 * jnp.sum(alpha)

    args = (proj.means2d, proj.conics, colors, opac)
    g_x = jax.grad(loss_x)(args)
    g_p = jax.grad(loss_p)(args)
    names = ["means2d", "conics", "colors", "opacity"]
    for name, ga, gb in zip(names, g_p, g_x):
        ga, gb = np.asarray(ga), np.asarray(gb)
        scale = np.abs(gb).max() + 1e-8
        err = np.abs(ga - gb).max() / scale
        assert err < 3e-3, f"{name}: rel err {err}"


def test_pallas_absgrad(rng):
    proj, colors, opac, bins, res = _setup(rng, n=200)
    sink = jnp.zeros((proj.means2d.shape[0], 2))

    def loss(s):
        img, _ = PR.rasterize_pallas(
            proj.means2d, proj.conics, colors, opac, bins,
            width=res, height=res, absgrad_sink=s, interpret=True)
        return jnp.sum(img ** 2)

    g = np.asarray(jax.grad(loss)(sink))
    assert g.sum() > 0


def test_pallas_multichannel_matches_separate(rng):
    """Aux channels composited in the same pass must equal separate
    override-color composites through the tiles oracle."""
    proj, colors, opac, bins, res = _setup(rng, n=200)
    n = colors.shape[0]
    aux = jnp.stack([jnp.sin(jnp.arange(n) * 0.1),
                     jnp.cos(jnp.arange(n) * 0.05)], axis=1)
    cols7 = jnp.concatenate([colors, aux], axis=1)

    img5, alpha5 = PR.rasterize_pallas(
        proj.means2d, proj.conics, cols7, opac, bins,
        width=res, height=res, interpret=True)
    assert img5.shape == (res, res, 5)

    img_rgb, _ = T.composite_tiles(
        proj.means2d, proj.conics, colors, opac, bins.ids_mat, res, res,
        chunk=32)
    aux3 = jnp.concatenate([aux, aux[:, :1]], axis=1)
    img_aux, _ = T.composite_tiles(
        proj.means2d, proj.conics, aux3, opac, bins.ids_mat, res, res,
        chunk=32)
    np.testing.assert_allclose(np.asarray(img5[..., :3]),
                               np.asarray(img_rgb), atol=5e-4)
    np.testing.assert_allclose(np.asarray(img5[..., 3:]),
                               np.asarray(img_aux[..., :2]), atol=5e-4)


def test_pallas_multichannel_grads(rng):
    """Gradients flow through all channels of the shared pass."""
    proj, colors, opac, bins, res = _setup(rng, n=150)
    n = colors.shape[0]

    def loss(args):
        col, op = args
        aux = jnp.stack([col[:, 0] * 2.0, col[:, 1] - col[:, 2]], axis=1)
        img, alpha = PR.rasterize_pallas(
            proj.means2d, proj.conics,
            jnp.concatenate([col, aux], axis=1), op, bins,
            width=res, height=res, interpret=True)
        return (jnp.sum(img[..., :3] ** 2) + jnp.sum(img[..., 3:] ** 2)
                + 0.1 * jnp.sum(alpha))

    def loss_tiles(args):
        col, op = args
        img, alpha = T.composite_tiles(
            proj.means2d, proj.conics, col, op, bins.ids_mat, res, res,
            chunk=32)
        aux_col = jnp.stack([col[:, 0] * 2.0, col[:, 1] - col[:, 2],
                             jnp.zeros((n,))], axis=1)
        img2, _ = T.composite_tiles(
            proj.means2d, proj.conics, aux_col, op, bins.ids_mat, res, res,
            chunk=32)
        return (jnp.sum(img ** 2) + jnp.sum(img2[..., :2] ** 2)
                + 0.1 * jnp.sum(alpha))

    args = (colors, opac)
    g_p = jax.grad(loss)(args)
    g_x = jax.grad(loss_tiles)(args)
    for name, ga, gb in zip(["colors", "opacity"], g_p, g_x):
        ga, gb = np.asarray(ga), np.asarray(gb)
        scale = np.abs(gb).max() + 1e-8
        err = np.abs(ga - gb).max() / scale
        assert err < 5e-3, f"{name}: rel err {err}"
