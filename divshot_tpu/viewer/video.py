"""Pure-python MJPEG-AVI writer — the video-export backend
(the reference uses OpenCV VideoWriter, ``keyframe_panel.cpp:433-462``;
this container has no ffmpeg/OpenCV, so we emit Motion-JPEG AVI — playable
everywhere — using PIL's JPEG encoder)."""

from __future__ import annotations

import io
import struct

import numpy as np


class MJPEGWriter:
    def __init__(self, path: str, fps: int = 30, quality: int = 90):
        self.path = path
        self.fps = fps
        self.quality = quality
        self.frames: list[bytes] = []
        self.size: tuple[int, int] | None = None

    def add_frame(self, img: np.ndarray) -> None:
        """img: (H, W, 3) uint8 or float in [0,1]."""
        from PIL import Image
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        h, w = img.shape[:2]
        if self.size is None:
            self.size = (w, h)
        assert self.size == (w, h), "frame size changed"
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, "JPEG", quality=self.quality)
        data = buf.getvalue()
        if len(data) % 2:
            data += b"\x00"
        self.frames.append(data)

    def close(self) -> None:
        if not self.frames or self.size is None:
            raise ValueError("no frames")
        w, h = self.size
        n = len(self.frames)

        def chunk(fourcc: bytes, payload: bytes) -> bytes:
            return fourcc + struct.pack("<I", len(payload)) + payload \
                + (b"\x00" if len(payload) % 2 else b"")

        def lst(fourcc: bytes, payload: bytes) -> bytes:
            return chunk(b"LIST", fourcc + payload)

        max_size = max(len(f) for f in self.frames)
        avih = struct.pack(
            "<14I",
            int(1e6 / self.fps), max_size * self.fps, 0, 0x10,  # HASINDEX
            n, 0, 1, max_size, w, h, 0, 0, 0, 0)
        strh = (b"vids" + b"MJPG" + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, self.fps, 0, n, max_size, 0, 0)
            + struct.pack("<4H", 0, 0, w, h))
        strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                           w * h * 3, 0, 0, 0, 0)
        hdrl = lst(b"hdrl", chunk(b"avih", avih)
                   + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))

        movi_payload = b"".join(chunk(b"00dc", f) for f in self.frames)
        movi = lst(b"movi", movi_payload)

        idx = b""
        off = 4
        for f in self.frames:
            sz = len(f)
            idx += b"00dc" + struct.pack("<III", 0x10, off, sz)
            off += 8 + sz + (sz % 2)
        idx1 = chunk(b"idx1", idx)

        riff_payload = b"AVI " + hdrl + movi + idx1
        with open(self.path, "wb") as f:
            f.write(b"RIFF" + struct.pack("<I", len(riff_payload))
                    + riff_payload)


def write_video(path: str, frames, fps: int = 30, quality: int = 90) -> None:
    wtr = MJPEGWriter(path, fps=fps, quality=quality)
    for fr in frames:
        wtr.add_frame(np.asarray(fr))
    wtr.close()
