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
