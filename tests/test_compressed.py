"""EAGLES-style compressed splats: distill -> decode -> render parity."""

import numpy as np
import jax
import jax.numpy as jnp

from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras
from divshot_tpu.raster.render import render
from divshot_tpu.train.losses import psnr


def test_compressed_distill_roundtrip(rng, tmp_path):
    from divshot_tpu.models import compressed as C

    params = random_scene(rng, 300, sh_degree=1,
                          scale_range=(0.02, 0.08))
    comp, metrics = C.distill(params, jax.random.PRNGKey(0),
                              latent_dim=16, steps=600, lr=1e-2)
    assert metrics["bytes_per_splat"] == 28      # 12 pos + 16 latent

    cam = orbit_cameras(1, width=96)[0]
    dec = comp.decode(cam.campos)
    rk = dict(backend="tiles", tile_capacity=512,
              instance_capacity=1 << 13)
    img_ref = render(params, cam, **rk).image
    img_dec = render(dec, cam, **rk).image
    p = float(psnr(img_dec, jnp.clip(img_ref, 0, 1)))
    assert p > 18.0, f"decoded render too lossy: {p:.2f} dB"

    # serialization round trip
    path = str(tmp_path / "model.czip.npz")
    C.save_compressed(path, comp)
    loaded = C.load_compressed(path)
    dec2 = loaded.decode(cam.campos)
    np.testing.assert_allclose(np.asarray(dec2.scales),
                               np.asarray(dec.scales), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(loaded.codes),
                                  np.asarray(comp.codes))
