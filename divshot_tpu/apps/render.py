"""Render CLI: load a splat model, render orbit/keyframe paths or dataset
views to PNGs / MJPEG video (the headless player — reference `runtime` app).

  python -m divshot_tpu.apps.render --model m.ply --out shots/ \
      --orbit 24 --width 800 --height 600 [--video fly.avi]
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("divshot-tpu render")
    p.add_argument("--model", required=True)
    p.add_argument("--out", default="renders")
    p.add_argument("--orbit", type=int, default=12,
                   help="number of orbit cameras")
    p.add_argument("--radius", type=float, default=4.0)
    p.add_argument("--width", type=int, default=800)
    p.add_argument("--height", type=int, default=600)
    p.add_argument("--fov", type=float, default=50.0)
    p.add_argument("--video", default=None, help="write MJPEG .avi")
    p.add_argument("--fps", type=int, default=30)
    p.add_argument("--backend", default="tiles")
    p.add_argument("--fast", action="store_true",
                   help="inference-only fast path (render_fast: 8x8 "
                        "tiles, forward kernel only)")
    p.add_argument("--white_background", action="store_true")
    ns = p.parse_args(argv)

    from divshot_tpu.gsio.io import load_model
    from divshot_tpu.gsio.synthetic import orbit_cameras
    from divshot_tpu.viewer.offline import render_views
    from divshot_tpu.viewer.video import write_video

    params, meta = load_model(ns.model)
    print(f"loaded {int(np.asarray(params.alive).sum())} splats "
          f"(sh degree {params.sh_degree}, AA {meta.get('antialiased')})")

    # auto-scale orbit radius to the model bounds
    d = params.compact_numpy()
    center = d["means"].mean(0)
    extent = float(np.abs(d["means"] - center).max())
    radius = ns.radius * max(extent / 1.5, 0.5)

    cams = orbit_cameras(ns.orbit, radius=radius, width=ns.width,
                         height_px=ns.height, fov_y_deg=ns.fov)
    bg = [1.0, 1.0, 1.0] if ns.white_background else [0.0, 0.0, 0.0]
    if ns.fast:
        import os
        import jax.numpy as jnp
        from PIL import Image
        from divshot_tpu.raster.render import render_fast
        os.makedirs(ns.out, exist_ok=True)
        frames = []
        for i, cam in enumerate(cams):
            img, _alpha, _bins = render_fast(
                params, cam, background=jnp.asarray(bg, jnp.float32),
                instance_capacity=1 << 20)
            arr = np.asarray(jnp.clip(img, 0, 1) * 255).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(ns.out, f"{i:05d}.png"))
            frames.append(arr)
    else:
        frames = render_views(params, cams, background=bg, out_dir=ns.out,
                              backend=ns.backend,
                              instance_capacity=1 << 20)
    if ns.video:
        write_video(ns.video, frames, fps=ns.fps)
        print(f"wrote {ns.video}")
    print(f"rendered {len(frames)} views to {ns.out}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
