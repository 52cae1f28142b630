"""Held-out evaluation: test-split PSNR / SSIM over a Dataset.

The quality oracle for BASELINE configs #2/#3 (train to reference PSNR);
used periodically by ``apps/train.py`` (eval_every) and at end of training.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from divshot_tpu.raster.render import render
from divshot_tpu.train.losses import psnr, ssim


def evaluate(params, eval_ds, *, render_kwargs: dict[str, Any] | None = None,
             background: jax.Array | None = None,
             max_views: int | None = None) -> dict:
    """-> {"psnr": float, "ssim": float, "n_views": int,
           "per_view_psnr": [...]}. Renders every eval view (or the first
    ``max_views``) with the given render kwargs."""
    rk = dict(render_kwargs or {})
    n = eval_ds.num_views if max_views is None \
        else min(max_views, eval_ds.num_views)
    psnrs, ssims = [], []
    for i in range(n):
        cam = jax.tree.map(lambda x: x[i], eval_ds.cameras)
        cam = cam.replace(width=eval_ds.cameras.width,
                          height=eval_ds.cameras.height)
        out = render(params, cam, background=background, **rk)
        gt = eval_ds.images[i]
        if isinstance(gt, np.ndarray):
            gt = jnp.asarray(gt)
        gt = gt.astype(jnp.float32) / 255.0
        psnrs.append(float(psnr(out.image, gt)))
        ssims.append(float(ssim(out.image, gt)))
    return {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims)),
            "n_views": n, "per_view_psnr": psnrs}
