"""Edit-module tests: selection predicates, state ops, transforms with SH
rotation, crop volumes, undo/redo (reference semantics, SURVEY §2.8)."""

import numpy as np
import jax.numpy as jnp

from divshot_tpu.edit.ops import EditSession, OP_ADD, OP_REMOVE
from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras
from divshot_tpu.splat.sh import eval_sh_color


def make_session(rng, n=200):
    return EditSession(params=random_scene(rng, n, sh_degree=1))


def test_select_box_sphere(rng):
    s = make_session(rng)
    s.select_box([-10, -10, -10], [10, 10, 10])
    assert bool(jnp.all(s.selected == s.params.alive))
    s.select_sphere([0, 0, 0], 0.5, mode=OP_REMOVE)
    means = np.asarray(s.params.means)
    inside = np.linalg.norm(means, axis=1) <= 0.5
    sel = np.asarray(s.selected)
    assert not sel[inside].any()
    assert sel[~inside].all()


def test_select_rect_and_polygon(rng):
    s = make_session(rng)
    cam = orbit_cameras(1, width=128)[0]
    s.select_rect(cam, 0, 0, 64, 128)
    sel_rect = np.asarray(s.selected).copy()
    # polygon covering the same half-plane should select the same splats
    s.select_polygon(cam, [[0, 0], [64, 0], [64, 128], [0, 128]])
    sel_poly = np.asarray(s.selected)
    assert (sel_rect == sel_poly).mean() > 0.98


def test_hide_delete_visible(rng):
    s = make_session(rng)
    s.select_sphere([0, 0, 0], 1.0)
    n_sel = int(np.asarray(s.selected).sum())
    s.hide_selected()
    vis = s.visible_params()
    assert int(np.asarray(vis.alive).sum()) == s.params.capacity - n_sel
    s.unhide_all()
    assert int(np.asarray(s.visible_params().alive).sum()) == s.params.capacity
    s.delete_selected()
    s.compact()
    assert int(np.asarray(s.params.alive).sum()) == s.params.capacity - n_sel


def test_transform_bakes_sh(rng):
    s = make_session(rng)
    s.select_all()
    R = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1.0]])  # 90° about z
    m = np.eye(4)
    m[:3, :3] = R
    means_before = np.asarray(s.params.means).copy()
    sh0 = np.asarray(s.params.sh0).copy()
    shN = np.asarray(s.params.shN).copy()
    dirs = np.array([[1.0, 0, 0]])
    c_before = np.asarray(eval_sh_color(
        jnp.asarray(sh0[0]), jnp.asarray(shN[0]), jnp.asarray(dirs[0])))

    s.transform_selected(m)
    np.testing.assert_allclose(np.asarray(s.params.means),
                               means_before @ R.T, atol=1e-5)
    # radiance field must rotate with the splat: eval rotated coeffs at R·d
    c_after = np.asarray(eval_sh_color(
        s.params.sh0[0], s.params.shN[0], jnp.asarray((R @ dirs[0]).astype(np.float32))))
    np.testing.assert_allclose(c_after, c_before, atol=1e-4)


def test_paint_and_undo_redo(rng):
    s = make_session(rng)
    sh0_orig = np.asarray(s.params.sh0).copy()
    s.select_all()
    s.paint_selected([1.0, 0.0, 0.0])
    assert not np.allclose(np.asarray(s.params.sh0), sh0_orig)
    assert s.undo()   # paint
    np.testing.assert_allclose(np.asarray(s.params.sh0), sh0_orig)
    assert s.redo()
    assert not np.allclose(np.asarray(s.params.sh0), sh0_orig)
    assert s.undo() and s.undo()  # paint + select_all
    assert not bool(np.asarray(s.selected).any())


def test_crop_volumes(rng):
    s = make_session(rng)
    s.apply_crop([{"type": "sphere", "center": [0, 0, 0], "radius": 1.0,
                   "op": "keep"}])
    means = np.asarray(s.params.means)
    outside = np.linalg.norm(means, axis=1) > 1.0
    assert np.asarray(s.hidden)[outside].all()
    assert not np.asarray(s.hidden)[~outside].any()


def test_merge(rng):
    base = random_scene(rng, 100, sh_degree=1, capacity=300)
    other = random_scene(rng, 50, sh_degree=1)
    s = EditSession(params=base)
    n0 = int(np.asarray(base.alive).sum())
    s.merge(other)
    assert int(np.asarray(s.params.alive).sum()) == n0 + 50
    s.undo()
    assert int(np.asarray(s.params.alive).sum()) == n0


def test_pick(rng):
    s = make_session(rng)
    cam = orbit_cameras(1, width=128)[0]
    from divshot_tpu.edit.ops import _project_centers
    proj = np.asarray(_project_centers(s.params, cam))
    valid = (proj[:, 2] > 0) & (np.abs(proj[:, 0] - 64) < 60)
    i = np.nonzero(valid)[0][0]
    got = s.pick(cam, float(proj[i, 0]), float(proj[i, 1]))
    assert got >= 0
    gp = np.asarray(proj[got])
    assert np.hypot(gp[0] - proj[i, 0], gp[1] - proj[i, 1]) < 12


def test_transform_palette_deferred_matches_bake():
    """Palette-deferred transforms render identically to an eager bake
    (splat_transform_palette.h semantics) and flatten correctly."""
    import numpy as np
    import jax.numpy as jnp
    from divshot_tpu.edit import ops as E
    from divshot_tpu.gsio.synthetic import random_scene

    rng = np.random.default_rng(3)
    params = random_scene(rng, 64, sh_degree=2)
    s1 = E.EditSession(params=params)
    s2 = E.EditSession(params=params)
    # select the first half
    mask = jnp.arange(params.capacity) < 32
    s1._set_selected_bit(mask, "sel")
    s2._set_selected_bit(mask, "sel")

    ang = 0.7
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = np.array([[np.cos(ang), -np.sin(ang), 0],
                          [np.sin(ang), np.cos(ang), 0],
                          [0, 0, 1]], np.float32) * 1.3
    m[:3, 3] = [0.2, -0.1, 0.05]

    slot = E.palette_transform_selected(s1, m)
    assert slot == 1
    s2.transform_selected(m)

    eff = E.effective_params(s1)
    for f in ("means", "quats", "scales", "shN"):
        np.testing.assert_allclose(np.asarray(getattr(eff, f)),
                                   np.asarray(getattr(s2.params, f)),
                                   atol=2e-5, err_msg=f)
    # unselected splats untouched
    np.testing.assert_array_equal(np.asarray(eff.means)[32:],
                                  np.asarray(params.means)[32:])
    # bake flattens and is undoable
    E.bake_palette(s1)
    np.testing.assert_allclose(np.asarray(s1.params.means),
                               np.asarray(s2.params.means), atol=2e-5)
    assert E._session_palette(s1).num_entries == 1
    s1.undo()
    np.testing.assert_array_equal(np.asarray(s1.params.means),
                                  np.asarray(params.means))
