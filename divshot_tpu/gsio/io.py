"""Extension-dispatched splat model I/O — the analog of
``GaussianModel::save_to_file/load_model`` (``gaussian_model.cpp:370-505``):
.ply (standard; '.compressed'/'.reduced' in the name select variants),
.splat, .spz, .dvsplat.
"""

from __future__ import annotations

import os

from divshot_tpu.splat.gaussians import GaussianParams


def save_model(path: str, params: GaussianParams, *,
               antialiased: bool = False, **kw) -> None:
    ext = os.path.splitext(path)[1].lower()
    name = os.path.basename(path).lower()
    if ext == ".ply":
        if ".compressed" in name:
            from divshot_tpu.gsio.compressed import save_compressed_ply
            save_compressed_ply(path, params, antialiased=antialiased)
        elif ".reduced" in name:
            from divshot_tpu.gsio.reduced import save_reduced_ply
            save_reduced_ply(path, params, **kw)
        else:
            from divshot_tpu.gsio.ply import save_ply
            save_ply(path, params, antialiased=antialiased)
    elif ext == ".splat":
        from divshot_tpu.gsio.ply import save_splat
        save_splat(path, params)
    elif ext == ".spz":
        from divshot_tpu.gsio.spz import save_spz
        save_spz(path, params, antialiased=antialiased)
    elif ext == ".dvsplat":
        from divshot_tpu.gsio.dvsplat import save_dvsplat
        save_dvsplat(path, params)
    else:
        raise ValueError(f"unknown splat format: {path}")


def load_model(path: str) -> tuple[GaussianParams, dict]:
    ext = os.path.splitext(path)[1].lower()
    name = os.path.basename(path).lower()
    if ext == ".ply":
        if ".compressed" in name or _sniff_compressed(path):
            from divshot_tpu.gsio.compressed import load_compressed_ply
            return load_compressed_ply(path)
        if ".reduced" in name:
            from divshot_tpu.gsio.reduced import load_reduced_ply
            return load_reduced_ply(path)
        from divshot_tpu.gsio.ply import load_ply
        return load_ply(path)
    if ext == ".splat":
        from divshot_tpu.gsio.ply import load_splat
        return load_splat(path), {}
    if ext == ".spz":
        from divshot_tpu.gsio.spz import load_spz
        return load_spz(path)
    if ext == ".dvsplat":
        from divshot_tpu.gsio.dvsplat import load_dvsplat
        return load_dvsplat(path)
    raise ValueError(f"unknown splat format: {path}")


def _sniff_compressed(path: str) -> bool:
    """Detect a chunked compressed PLY by its header elements."""
    try:
        head = open(path, "rb").read(4096)
        return b"element chunk" in head
    except OSError:
        return False
