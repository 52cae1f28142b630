"""Scene/Entity layer: components, color grading math, crops,
serialization round trip, and the render-type dispatch."""

import numpy as np
import jax.numpy as jnp
import pytest

from divshot_tpu.scene import (
    Scene, GaussianComponent, GaussianRenderType, GaussianCrop, CropVolume,
    CropType, Environment, EnvironmentMode, Light, LightType)
from divshot_tpu.splat.camera import Camera
from divshot_tpu.gsio.synthetic import random_scene

SH_C0 = 0.282094791773878


def _cam(res=64):
    return Camera.look_at([0, 0, -4.0], [0, 0, 0], [0, -1, 0], 50.0,
                          res, res)


def test_color_grading_matches_reference_math(rng):
    params = random_scene(rng, 50, sh_degree=0)
    comp = GaussianComponent(params=params, brightness=0.1, black_point=0.05,
                             white_point=0.9, albedo_color=(0.8, 1.0, 1.2),
                             transparency=0.5)
    g = comp.graded_params()

    sh0 = np.asarray(params.sh0)
    to = lambda v: v * SH_C0 + 0.5
    frm = lambda v: (v - 0.5) / SH_C0
    offset = -0.05 + 0.1
    scale = 1.0 / (0.9 - 0.05)
    expect = frm(offset + to(sh0) * np.asarray([0.8, 1.0, 1.2]) * scale)
    np.testing.assert_allclose(np.asarray(g.sh0), expect, rtol=1e-5, atol=1e-6)

    sig = 1 / (1 + np.exp(-np.asarray(params.opacity)))
    got_sig = 1 / (1 + np.exp(-np.asarray(g.opacity)))
    np.testing.assert_allclose(got_sig, sig * 0.5, rtol=1e-4)


def test_grading_identity_is_noop(rng):
    params = random_scene(rng, 20, sh_degree=0)
    comp = GaussianComponent(params=params)
    g = comp.graded_params()
    np.testing.assert_array_equal(np.asarray(g.sh0), np.asarray(params.sh0))
    np.testing.assert_array_equal(np.asarray(g.opacity),
                                  np.asarray(params.opacity))


def test_crop_volumes(rng):
    params = random_scene(rng, 200, sh_degree=0)
    crop = GaussianCrop()
    crop.add(CropVolume(type=CropType.SPHERE, center=(0, 0, 0), radius=0.5))
    comp = GaussianComponent(params=params, crop=crop)
    g = comp.graded_params()
    means = np.asarray(params.means)
    inside = np.linalg.norm(means, axis=1) <= 0.5
    np.testing.assert_array_equal(np.asarray(g.alive), inside)

    # invert + box AND-combination
    crop2 = GaussianCrop()
    crop2.add(CropVolume(type=CropType.BOX, pmin=(-1, -1, -1),
                         pmax=(1, 1, 1)))
    crop2.add(CropVolume(type=CropType.SPHERE, radius=0.3, invert=True))
    keep = crop2.keep_mask(means)
    expect = (np.all(np.abs(means) <= 1, axis=1)
              & (np.linalg.norm(means, axis=1) > 0.3))
    np.testing.assert_array_equal(keep, expect)

    with pytest.raises(ValueError):
        for _ in range(9):
            crop2.add(CropVolume())


def test_scene_serialization_roundtrip(rng, tmp_path):
    params = random_scene(rng, 30, sh_degree=1)
    scene = Scene("demo")
    root = scene.create_entity("root")
    e = scene.create_entity("splats", parent="root")
    e.transform[0, 3] = 2.0
    comp = e.add(GaussianComponent(params=params, transparency=0.7,
                                   render_type=GaussianRenderType.DEPTH))
    crop = GaussianCrop()
    crop.add(CropVolume(type=CropType.SPHERE, radius=2.0))
    comp.crop = crop
    env_e = scene.create_entity("sky")
    env_e.add(Environment(mode=EnvironmentMode.SUN_SKY, intensity=0.8))
    light_e = scene.create_entity("sun")
    light_e.add(Light(type=LightType.DIRECTIONAL, intensity=3.0))

    path = str(tmp_path / "scene.json")
    scene.save(path)
    loaded = Scene.load(path)

    assert [x.name for x in loaded.entities] == ["root", "splats", "sky", "sun"]
    e2 = loaded.find("splats")
    assert e2.parent == "root"
    c2 = e2.get(GaussianComponent)
    assert c2.render_type == GaussianRenderType.DEPTH
    assert c2.transparency == pytest.approx(0.7)
    assert len(c2.crop.volumes) == 1
    assert c2.crop.volumes[0].type == CropType.SPHERE
    np.testing.assert_allclose(np.asarray(c2.params.means),
                               np.asarray(params.means), rtol=1e-6)
    env2 = loaded.find("sky").get(Environment)
    assert env2.mode == EnvironmentMode.SUN_SKY
    assert env2.intensity == pytest.approx(0.8)
    assert loaded.find("sun").get(Light).type == LightType.DIRECTIONAL
    # world transform includes parent chain
    w = e2.world_transform(loaded)
    assert w[0, 3] == pytest.approx(2.0)


@pytest.mark.parametrize("rt", [
    GaussianRenderType.SPLAT, GaussianRenderType.DEPTH,
    GaussianRenderType.NORMAL, GaussianRenderType.CENTERS,
    GaussianRenderType.RINGS, GaussianRenderType.ELLIPSOIDS,
    GaussianRenderType.POINT])
def test_render_modes(rng, rt):
    from divshot_tpu.viewer.scene_render import render_component
    params = random_scene(rng, 80, sh_degree=0)
    comp = GaussianComponent(params=params, render_type=rt)
    img, alpha = render_component(
        comp, _cam(), backend="tiles", tile_capacity=256,
        instance_capacity=1 << 12)
    img = np.asarray(img)
    assert img.shape == (64, 64, 3)
    assert np.isfinite(img).all()
    assert np.asarray(alpha).max() > 0, f"{rt}: nothing rendered"


def test_render_scene_composites_env(rng):
    from divshot_tpu.viewer.scene_render import render_scene
    scene = Scene()
    e = scene.create_entity("splats")
    e.add(GaussianComponent(params=random_scene(rng, 60, sh_degree=0)))
    sky = scene.create_entity("sky")
    sky.add(Environment(mode=EnvironmentMode.PURE,
                        sky_ambient=(0.2, 0.3, 0.4)))
    img = render_scene(scene, _cam(), backend="tiles", tile_capacity=256,
                       instance_capacity=1 << 12)
    assert img.shape == (64, 64, 3)
    # corners should show the background color
    np.testing.assert_allclose(img[0, 0], [0.2, 0.3, 0.4], atol=0.05)


def test_transform_params_translates_and_rotates(rng):
    from divshot_tpu.viewer.scene_render import transform_params
    params = random_scene(rng, 40, sh_degree=1)
    m = np.eye(4, dtype=np.float32)
    th = 0.7
    m[:3, :3] = np.array([[np.cos(th), -np.sin(th), 0],
                          [np.sin(th), np.cos(th), 0],
                          [0, 0, 1]], np.float32) * 2.0   # rot + scale 2
    m[:3, 3] = [1, 2, 3]
    p2 = transform_params(params, m)
    expect = np.asarray(params.means) @ m[:3, :3].T + m[:3, 3]
    np.testing.assert_allclose(np.asarray(p2.means), expect, rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(p2.scales),
                               np.asarray(params.scales) + np.log(2.0),
                               rtol=1e-4)
