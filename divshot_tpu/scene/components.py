"""Scene components — headless rebuild of the reference's entt components
(SURVEY §2.6): GaussianComponent (render type, SH0-domain color grading,
``scene/component/gaussian_component.{h,cpp}``), GaussianCrop (≤8
box/sphere/plane volumes, ``gaussian_crop.h``), Environment
(Pure/SunSky/HDR, ``environment.h``), and light descriptors
(``component/light/``)."""

from __future__ import annotations

import dataclasses
import enum
from dataclasses import dataclass, field
from typing import Any

import numpy as np

SH_C0 = 0.282094791773878


class GaussianRenderType(enum.IntEnum):
    """gaussian_component.h:7-16."""
    SPLAT = 0
    POINT = 1
    DEPTH = 2
    NORMAL = 3
    RINGS = 4
    ELLIPSOIDS = 5
    CENTERS = 6


class CropType(enum.IntEnum):
    BOX = 0
    SPHERE = 1
    PLANE = 2


@dataclass
class CropVolume:
    """One crop volume; ``transform`` maps world -> crop-local space."""
    type: CropType = CropType.BOX
    center: tuple = (0.0, 0.0, 0.0)
    radius: float = 1.0
    pmin: tuple = (-1.0, -1.0, -1.0)
    pmax: tuple = (1.0, 1.0, 1.0)
    transform: Any = None          # optional (4, 4) world->local
    invert: bool = False           # keep-outside instead of keep-inside

    def contains(self, points: np.ndarray) -> np.ndarray:
        p = np.asarray(points, np.float32)
        if self.transform is not None:
            m = np.asarray(self.transform, np.float32)
            p = p @ m[:3, :3].T + m[:3, 3]
        if self.type == CropType.SPHERE:
            inside = np.linalg.norm(
                p - np.asarray(self.center, np.float32), axis=-1) <= self.radius
        elif self.type == CropType.PLANE:
            # keep the half-space below the plane through center with normal
            # +Z of the (optional) transform
            inside = (p[:, 2] - np.asarray(self.center)[2]) <= 0
        else:
            lo = np.asarray(self.pmin, np.float32)
            hi = np.asarray(self.pmax, np.float32)
            inside = np.all((p >= lo) & (p <= hi), axis=-1)
        return ~inside if self.invert else inside


@dataclass
class GaussianCrop:
    """Up to 8 crop volumes combined with AND-of-keeps (a splat survives if
    it is kept by every volume) — the semantics of the ≤8-volume crop chain
    (``renderer/gaussian.cpp:341-384``)."""
    volumes: list = field(default_factory=list)
    MAX_VOLUMES = 8

    def add(self, vol: CropVolume) -> None:
        if len(self.volumes) >= self.MAX_VOLUMES:
            raise ValueError("at most 8 crop volumes")
        self.volumes.append(vol)

    def keep_mask(self, points: np.ndarray) -> np.ndarray:
        keep = np.ones(points.shape[0], bool)
        for v in self.volumes:
            keep &= v.contains(points)
        return keep


@dataclass
class GaussianComponent:
    """Per-entity splat instance settings (gaussian_component.h:19-45)."""
    params: Any = None              # GaussianParams (or None until loaded)
    path: str = ""                  # source file, reloadable
    render_type: GaussianRenderType = GaussianRenderType.SPLAT
    participate_render: bool = True
    skip_render: bool = False
    sh_degree: int = 3
    # color grading (SH0-domain, gaussian_component.cpp:22-50);
    # brightness is an additive offset (reference default 0)
    transparency: float = 1.0
    brightness: float = 0.0
    white_point: float = 1.0
    black_point: float = 0.0
    albedo_color: tuple = (1.0, 1.0, 1.0)
    crop: GaussianCrop | None = None

    def load(self):
        if self.params is None and self.path:
            from divshot_tpu.gsio.io import load_model
            self.params, _ = load_model(self.path)
        return self.params

    def graded_params(self):
        """Apply the color grading to a copy of the params — exactly the
        reference's SH0-domain math (``apply_color_adjustment``):
        c' = from(offset + to(c)·albedo·scale) with to/from the SH0<->color
        maps, offset = -black + brightness, scale = 1/(white-black);
        opacity' = logit(sigmoid(o)·transparency)."""
        import jax.numpy as jnp
        p = self.load()
        albedo = np.asarray(self.albedo_color, np.float32)
        graded = p
        if (np.any(albedo != 1.0) or self.black_point != 0.0
                or self.white_point != 1.0 or self.brightness != 0.0):
            to = lambda v: v * SH_C0 + 0.5
            frm = lambda v: (v - 0.5) / SH_C0
            offset = -self.black_point + self.brightness
            scale = 1.0 / max(self.white_point - self.black_point, 1e-6)
            sh0 = frm(offset + to(p.sh0) * jnp.asarray(albedo) * scale)
            graded = graded.replace(sh0=sh0)
        if self.transparency != 1.0:
            sig = 1.0 / (1.0 + jnp.exp(-p.opacity))
            v = jnp.clip(sig * self.transparency, 1e-7, 1.0 - 1e-7)
            graded = graded.replace(opacity=jnp.log(v) - jnp.log1p(-v))
        if self.crop is not None and self.crop.volumes:
            keep = jnp.asarray(self.crop.keep_mask(np.asarray(p.means)))
            graded = graded.replace(alive=graded.alive & keep)
        return graded


class EnvironmentMode(enum.IntEnum):
    PURE = 0
    SUN_SKY = 1
    HDR = 2


@dataclass
class Environment:
    """Sky/background component (environment.h)."""
    mode: EnvironmentMode = EnvironmentMode.PURE
    sky_ambient: tuple = (0.0, 0.0, 0.0)
    sun_color: tuple = (1.0, 1.0, 1.0)
    intensity: float = 1.0
    theta: float = 0.0          # sun elevation angle
    phi: float = 0.0            # sun azimuth
    sun_size_multiplier: float = 1.0
    hdr_path: str = ""
    _hdr: Any = None

    def sun_direction(self) -> np.ndarray:
        st, ct = np.sin(self.theta), np.cos(self.theta)
        sp, cp = np.sin(self.phi), np.cos(self.phi)
        return np.asarray([st * cp, ct, st * sp], np.float32)

    def load_hdr(self, path: str | None = None):
        import imageio.v3 as iio
        self.hdr_path = path or self.hdr_path
        self._hdr = np.asarray(iio.imread(self.hdr_path), np.float32)
        self.mode = EnvironmentMode.HDR
        return self._hdr

    def background_color(self) -> np.ndarray:
        return np.asarray(self.sky_ambient, np.float32) * self.intensity

    def sample_background(self, width: int, height: int) -> np.ndarray:
        """(H, W, 3) background plate for compositing behind splats."""
        if self.mode == EnvironmentMode.HDR and (
                self._hdr is not None or self.hdr_path):
            if self._hdr is None:
                self.load_hdr()
            from PIL import Image
            img = Image.fromarray(
                np.clip(self._hdr * 255, 0, 255).astype(np.uint8))
            img = img.resize((width, height))
            return np.asarray(img, np.float32) / 255.0 * self.intensity
        if self.mode == EnvironmentMode.SUN_SKY:
            # simple analytic gradient sky + sun disk
            y = np.linspace(1, -1, height, dtype=np.float32)[:, None]
            horizon = np.asarray([0.8, 0.85, 0.95], np.float32)
            zenith = np.asarray([0.25, 0.45, 0.85], np.float32)
            t = np.clip((y + 1) / 2, 0, 1)[..., None]
            sky = horizon * (1 - t) + zenith * t
            return np.broadcast_to(sky, (height, width, 3)) * self.intensity
        return np.broadcast_to(self.background_color(),
                               (height, width, 3)).copy()


class LightType(enum.IntEnum):
    DIRECTIONAL = 0
    POINT = 1
    SPOT = 2
    RECT = 3
    DISK = 4
    CYLINDER = 5


@dataclass
class Light:
    """Analytic light descriptor (scene/component/light/*). Consumed by the
    mesh/hybrid shading path; splat rendering is emissive."""
    type: LightType = LightType.POINT
    position: tuple = (0.0, 0.0, 0.0)
    direction: tuple = (0.0, -1.0, 0.0)
    color: tuple = (1.0, 1.0, 1.0)
    intensity: float = 1.0
    range: float = 10.0
    inner_angle: float = 0.3
    outer_angle: float = 0.5
    size: tuple = (1.0, 1.0)     # rect/disk/cylinder extent


def component_to_dict(obj) -> dict:
    """Serialize a component dataclass to JSON-safe primitives."""
    def conv(v):
        if isinstance(v, enum.IntEnum):
            return int(v)
        if isinstance(v, np.ndarray):
            return v.tolist()
        if isinstance(v, (list, tuple)):
            return [conv(x) for x in v]
        if dataclasses.is_dataclass(v) and not isinstance(v, type):
            return component_to_dict(v)
        return v
    out = {"__type__": type(obj).__name__}
    for f in dataclasses.fields(obj):
        if f.name.startswith("_") or f.name in ("params",):
            continue
        out[f.name] = conv(getattr(obj, f.name))
    return out
