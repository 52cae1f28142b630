"""Path-traced mode (reference RenderMode::PT, path_tracing.cpp):
occlusion correctness, energy behavior, and the hybrid splat composite."""

import numpy as np
import jax
import jax.numpy as jnp

from divshot_tpu.splat.camera import Camera
from divshot_tpu.models.background import init_envmap
from divshot_tpu.raster import path_trace as PT


def _floor_and_blocker():
    """A big floor quad plus a small floating blocker above its center."""
    verts = np.array([
        # floor (y = 0)
        [-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2],
        # blocker quad (y = 0.6), small, centered
        [-0.4, 0.6, -0.4], [0.4, 0.6, -0.4], [0.4, 0.6, 0.4],
        [-0.4, 0.6, 0.4],
    ], np.float32)
    faces = np.array([[0, 2, 1], [0, 3, 2], [4, 5, 6], [4, 6, 7]], np.int32)
    normals = np.array([[0, 1, 0]] * 4 + [[0, -1, 0]] * 4, np.float32)
    colors = np.full((8, 3), 0.8, np.float32)
    return (jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(normals),
            jnp.asarray(colors))


def _cam(res=96):
    return Camera.look_at(eye=jnp.asarray([0.0, 2.5, 2.5]),
                          target=jnp.zeros(3), up=jnp.asarray([0.0, 1, 0]),
                          width=res, height=res, fov_y_deg=55.0)


def test_ray_occluded_basic():
    verts, faces, _, _ = _floor_and_blocker()
    org = jnp.asarray([[0.0, 0.1, 0.0], [1.5, 0.1, 1.5]])
    up = jnp.asarray([[0.0, 1.0, 0.0]] * 2)
    occ = PT.ray_occluded(org, up, verts, faces)
    # center ray hits the blocker; the corner ray escapes
    assert bool(occ[0]) and not bool(occ[1])


def test_path_trace_occlusion_darkens():
    """Floor under the blocker must receive less env light than open
    floor, and sun shadowing must darken it further."""
    verts, faces, normals, colors = _floor_and_blocker()
    cam = _cam()
    env = init_envmap(16, 32, init_color=(0.99, 0.99, 0.99))
    out = jax.jit(lambda k: PT.path_trace_mesh(
        verts, faces, cam, env, k, normals=normals, colors=colors,
        n_samples=16, sun_dir=(0.0, 1.0, 0.0)))(jax.random.PRNGKey(0))
    img = np.asarray(out.image)
    assert np.isfinite(img).all()
    gb = out.gbuffer
    tid = np.asarray(gb.tri_id)
    # pixels on the floor (tri 0/1) split into shadowed (under blocker)
    # vs open; compare mean radiance
    H, W = tid.shape
    ys, xs = np.mgrid[0:H, 0:W]
    floor = (tid == 0) | (tid == 1)
    depth = np.asarray(gb.depth)
    # project blocker footprint: just use image center band vs border band
    center = floor & (np.abs(xs - W / 2) < W * 0.08) & \
        (np.abs(ys - H * 0.55) < H * 0.1)
    border = floor & (xs < W * 0.2)
    assert center.sum() > 10 and border.sum() > 10
    lum = img.mean(-1)
    assert lum[center].mean() < 0.6 * lum[border].mean(), \
        (lum[center].mean(), lum[border].mean())


def test_hybrid_pt_composite_shapes():
    verts, faces, normals, colors = _floor_and_blocker()
    cam = _cam(64)
    env = init_envmap(8, 16, init_color=(0.7, 0.8, 0.99))

    class SplatOut:
        image = jnp.zeros((64, 64, 3))
        alpha = jnp.zeros((64, 64))

    img, pt = PT.render_hybrid_pt(
        SplatOut, verts, faces, cam, env, jax.random.PRNGKey(1),
        splat_depth=jnp.full((64, 64), jnp.inf), n_samples=4,
        normals=normals, colors=colors,
        background=jnp.asarray([0.1, 0.1, 0.1]))
    img = np.asarray(img)
    assert img.shape == (64, 64, 3) and np.isfinite(img).all()
    # rays that miss the mesh show the background
    miss = ~np.isfinite(np.asarray(pt.gbuffer.depth))
    assert miss.any()
    np.testing.assert_allclose(img[miss], 0.1, atol=1e-5)
