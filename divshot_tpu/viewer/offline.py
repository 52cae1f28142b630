"""Offscreen rendering: batch view renders, keyframe fly-throughs, PNG and
video output — the headless equivalent of the reference's player/runtime +
keyframe video export (``keyframe_panel.cpp:433-462``)."""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from divshot_tpu.splat.gaussians import GaussianParams
from divshot_tpu.splat.camera import Camera
from divshot_tpu.raster.render import render
from divshot_tpu.viewer.keyframes import KeyFrameTimeline


def _render_np(params, cam, background, **kw) -> np.ndarray:
    out = render(params, cam, background=background, **kw)
    return np.asarray(out.image).clip(0, 1)


def render_views(params: GaussianParams, cameras: list[Camera], *,
                 background=None, out_dir: str | None = None,
                 backend: str = "tiles", **render_kw) -> list[np.ndarray]:
    """Render a list of cameras; optionally save numbered PNGs."""
    bg = jnp.zeros((3,)) if background is None else jnp.asarray(background)
    kw = dict(backend=backend)
    kw.update(render_kw)
    jit_render = jax.jit(
        lambda p, c: render(p, c, background=bg, **kw).image)
    imgs = []
    for i, cam in enumerate(cameras):
        img = np.asarray(jit_render(params, cam)).clip(0, 1)
        imgs.append(img)
        if out_dir:
            from PIL import Image
            os.makedirs(out_dir, exist_ok=True)
            Image.fromarray((img * 255).astype(np.uint8)).save(
                os.path.join(out_dir, f"{i:05d}.png"))
    return imgs


def render_path(params: GaussianParams, timeline: KeyFrameTimeline, *,
                width: int = 1280, height: int = 720, fps: int = 30,
                video_path: str | None = None, background=None,
                backend: str = "tiles", **render_kw) -> list[np.ndarray]:
    """Render a keyframed camera fly-through; optionally write MJPEG video."""
    n_frames = max(1, int(round(timeline.duration * fps)) + 1)
    cams = [timeline.camera_at(i / fps, width, height)
            for i in range(n_frames)]
    frames = render_views(params, cams, background=background,
                          backend=backend, **render_kw)
    if video_path:
        from divshot_tpu.viewer.video import write_video
        write_video(video_path, frames, fps=fps)
    return frames
