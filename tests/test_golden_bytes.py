"""Golden-byte format fixtures (VERDICT r2 item 6).

Every expected byte below is HAND-DERIVED from the reference pack math —
NOT produced by the code under test — so a sign/order/scale/rounding bug
shared between our writer and reader cannot hide behind a round-trip:

- ``.splat``: ``tiny_gsplat.cpp:243-291`` — f32 pos, f32 exp(scale), u8
  color = (u8)clamp((0.5+SH_C0*f_dc)*255) (C cast => TRUNCATION), u8
  sigmoid-alpha (truncated), u8 quat = clamp(q*128+128) truncated, quat in
  storage order (w, x, y, z) (RichPoint rot vec4).
- compressed PLY: ``tiny_gsplat.hpp:342-467`` — packUnorm =
  floor(v*t + 0.5) (ROUNDS, unlike .splat), pack111011 x<<21|y<<11|z,
  largest-component quat 2+10+10+10 with norm factor sqrt(2)/2, pack8888
  color r in the top byte, per-chunk min/max normalization with the
  (max-min < 1e-5) -> 0 guard, Morton-ordered splats.
- ``.spz``: ``external/spz/src/load-spz.cc:257-330,533-546`` — 24-bit
  fixed-point positions (fractionalBits 12, std::round = half away from
  zero), u8 (s+10)*16 scales, smallest-three quats (xyzw component order,
  sign+9-bit magnitudes / sqrt1_2, C-cast truncation), u8 sigmoid alpha
  (std::round), u8 color c*0.15*255 + 127.5, bucket-quantized SH
  (sh1Bits=5 / shRestBits=4, C++ truncating integer division); payload
  field order header, positions, alphas, colors, scales, rotations, sh.

Known, documented deviation: the reference's per-chunk ``calcMinMax``
initializes from ``p[start]`` (an index position, not ``indices[start]``,
``tiny_gsplat.hpp:330-340``) which can WIDEN later chunks' bounds by an
unrelated splat; decoders read stored bounds, so interop is unaffected.
All fixtures here use a single chunk, where the two computations agree
exactly.
"""

import gzip
import struct

import numpy as np

from divshot_tpu.splat.gaussians import GaussianParams


def _f32(*vals) -> bytes:
    return struct.pack("<" + "f" * len(vals), *vals)


# ---------------------------------------------------------------------------
# .splat


def test_splat_golden_bytes(tmp_path):
    from divshot_tpu.gsio.ply import save_splat

    means = np.array([[1.0, -2.0, 0.5], [0.0, 0.0, 0.0]], np.float32)
    scales = np.array([[-1.0, 0.0, 0.25], [0.0, 0.0, 0.0]], np.float32)
    quats = np.array([[1, 0, 0, 0], [-0.6, 0.8, 0, 0]], np.float32)  # wxyz
    sh0 = np.array([[0.5, -0.25, 1.25], [-2.0, 0.0, 2.0]], np.float32)
    opac = np.array([0.0, 3.0], np.float32)
    p = GaussianParams.create(means, scales=scales, quats=quats,
                              opacity=opac, sh0=sh0, sh_degree=0)
    path = str(tmp_path / "g.splat")
    save_splat(path, p)
    got = open(path, "rb").read()

    # splat 0: colors (0.5 + SH_C0*f_dc)*255 truncated:
    #   r = 0.64104740*255 = 163.467 -> 163; g = 0.42947630*255 = 109.52
    #   -> 109; b = 0.85261849*255 = 217.418 -> 217; a = sigmoid(0)*255
    #   = 127.5 -> 127 (trunc, NOT round). quat (1,0,0,0): 1*128+128=256
    #   -> clamp 255; rest 128.
    rec0 = (_f32(1.0, -2.0, 0.5)
            + _f32(np.exp(np.float32(-1.0)), 1.0, np.exp(np.float32(0.25)))
            + bytes([163, 109, 217, 127])
            + bytes([255, 128, 128, 128]))
    # splat 1: r = (0.5 - 2*SH_C0)*255 < 0 -> 0; g = 127.5 -> 127;
    #   b = (0.5 + 2*SH_C0)*255 = 271.4 -> clamp 255; a = sigmoid(3)*255
    #   = 242.9 -> 242. quat (-0.6, 0.8, 0, 0): -0.6*128+128 = 51.2 -> 51;
    #   0.8*128+128 = 230.4 -> 230.
    rec1 = (_f32(0.0, 0.0, 0.0) + _f32(1.0, 1.0, 1.0)
            + bytes([0, 127, 255, 242])
            + bytes([51, 230, 128, 128]))
    assert got == rec0 + rec1, (got.hex(), (rec0 + rec1).hex())


# ---------------------------------------------------------------------------
# compressed PLY (PlayCanvas)


def test_compressed_ply_golden_bytes(tmp_path):
    from divshot_tpu.gsio.compressed import save_compressed_ply

    # positions at bbox corners; Morton codes order A < B < C < D
    # (x bits at 3i, y at 3i+1, z at 3i+2), so splat order is unchanged.
    means = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 1]],
                     np.float32)
    # all log-scales equal => max-min < 1e-5 guard => packed_scale = 0
    scales = np.full((4, 3), -1.0, np.float32)
    quats = np.array([            # storage order (w, x, y, z)
        [1.0, 0.0, 0.0, 0.0],
        [0.5, 0.5, 0.5, 0.5],
        [-0.8, 0.6, 0.0, 0.0],
        [0.1, -0.9, 0.3, 0.3],
    ], np.float32)
    sh0 = np.array([[0, 0, 0], [0.5, -0.25, 1.25], [-3.0, 0.1, 0.2],
                    [0, 0, 0]], np.float32)
    opac = np.array([0.0, 2.0, -8.0, 0.0], np.float32)
    p = GaussianParams.create(means, scales=scales, quats=quats,
                              opacity=opac, sh0=sh0, sh_degree=0)
    path = str(tmp_path / "g.compressed.ply")
    save_compressed_ply(path, p)
    raw = open(path, "rb").read()
    body = raw.split(b"end_header\n", 1)[1]

    # chunk element: pmin (0,0,0) pmax (1,1,1) smin=smax=(-1,-1,-1)
    chunk = _f32(0, 0, 0) + _f32(1, 1, 1) + _f32(-1, -1, -1) \
        + _f32(-1, -1, -1)

    # packed_position (pack111011, packUnorm floor(v*t+0.5)):
    #   A corner 0 -> 0; B x=1 -> 2047<<21 = 0xFFE00000;
    #   C y=1 -> 1023<<11 = 0x001FF800; D all -> 0xFFFFFFFF
    pp = [0x00000000, 0xFFE00000, 0x001FF800, 0xFFFFFFFF]
    # packed_rotation (largest-component index<<30, others *sqrt(2)/2+0.5
    # in 10 bits, floor(v*1023+0.5)):
    #   A (1,0,0,0): largest 0 (+); zeros -> floor(0.5*1023+0.5)=512 each
    #     -> (512<<20)|(512<<10)|512 = 0x20080200
    #   B (.5,.5,.5,.5): tie -> FIRST max (idx 0, like std::max_element);
    #     0.5*0.70710678+0.5 = 0.85355 -> floor(873.685)=873
    #     -> (873<<20)|(873<<10)|873 = 0x369DA769
    #   C (-0.8,0.6,0,0): largest 0 negative -> negate -> (0.8,-0.6,0,0);
    #     -0.6: floor(0.07573593*1023+0.5) = floor(77.978) = 77; zeros 512
    #     -> (77<<20)|(512<<10)|512 = 0x04D80200
    #   D (0.1,-0.9,0.3,0.3): largest idx 1 negative -> negate ->
    #     (-0.1,0.9,-0.3,-0.3); -0.1 -> floor(439.66)=439; -0.3 ->
    #     floor(294.99)=294 -> (1<<30)|(439<<20)|(294<<10)|294 = 0x5B749926
    pr = [0x20080200, 0x369DA769, 0x04D80200, 0x5B749926]
    ps = [0, 0, 0, 0]
    # packed_color = pack8888(SH_C0*dc+0.5 ..., sigmoid(op)), r in the TOP
    # byte, packUnorm ROUNDS (floor(v*255+0.5) — unlike .splat's trunc):
    #   A: 127.5+0.5 -> 128 everywhere -> 0x80808080
    #   B: r floor(163.967)=163, g floor(110.016)=110, b floor(217.918)
    #      =217, a sigmoid(2)*255+0.5=225.1 -> 225 -> 0xA36ED9E1
    #   C: r clamp 0; g floor(135.69)=135; b floor(142.41)=142;
    #      a sigmoid(-8) -> 0 -> 0x00878E00
    pc = [0x80808080, 0xA36ED9E1, 0x00878E00, 0x80808080]

    verts = b"".join(struct.pack("<IIII", pp[i], pr[i], ps[i], pc[i])
                     for i in range(4))
    assert body == chunk + verts, (body.hex(), (chunk + verts).hex())

    # header structure must match the reference's element/property layout
    head = raw.split(b"end_header\n", 1)[0].decode()
    assert "element chunk 1" in head and "element vertex 4" in head
    for prop in ("min_x", "max_scale_z"):
        assert f"property float {prop}" in head
    for prop in ("packed_position", "packed_rotation", "packed_scale",
                 "packed_color"):
        assert f"property uint {prop}" in head


# ---------------------------------------------------------------------------
# .spz


def test_spz_golden_bytes(tmp_path):
    from divshot_tpu.gsio.spz import save_spz

    means = np.array([[0.5, -0.25, 1.0], [-0.1, 0.0, 16.0]], np.float32)
    scales = np.array([[-1.0, -2.0, 0.0], [1.0, -12.0, 0.5]], np.float32)
    quats = np.array([[1, 0, 0, 0],                 # wxyz
                      [0.5, -0.5, 0.5, -0.5]], np.float32)
    opac = np.array([0.5, -1.0], np.float32)
    sh0 = np.array([[0.2, -0.4, 0.0], [-4.0, 0.0, 4.0]], np.float32)
    shN = np.zeros((2, 3, 3), np.float32)           # degree 1
    shN[0] = [[0.5, -0.5, 0.25], [0.0, 1.0, -1.0], [0.1, -0.1, 0.03125]]
    p = GaussianParams.create(means, scales=scales, quats=quats,
                              opacity=opac, sh0=sh0, shN=shN, sh_degree=1)
    path = str(tmp_path / "g.spz")
    save_spz(path, p, antialiased=True)
    payload = gzip.decompress(open(path, "rb").read())

    header = struct.pack("<IIIBBBB", 0x5053474E, 3, 2, 1, 12, 1, 0)
    # 24-bit fixed point, round(pos*4096) half away from zero:
    #   0.5 -> 2048 = 00 08 00 ; -0.25 -> -1024 -> 00 FC FF ;
    #   1.0 -> 4096 = 00 10 00 ; -0.1 -> round(-409.6) = -410 -> 66 FE FF ;
    #   0.0 -> 00 00 00 ; 16.0 -> 65536 -> 00 00 01
    positions = bytes([0x00, 0x08, 0x00, 0x00, 0xFC, 0xFF, 0x00, 0x10, 0x00,
                       0x66, 0xFE, 0xFF, 0x00, 0x00, 0x00, 0x00, 0x00, 0x01])
    # sigmoid(0.5)*255 = 158.73 -> 159 ; sigmoid(-1)*255 = 68.58 -> 69
    alphas = bytes([159, 69])
    # c*38.25 + 127.5: 0.2 -> 135.15 -> 135; -0.4 -> 112.2 -> 112;
    # 0 -> 127.5 -> 128 (std::round away); -4 -> clamp 0; 4 -> clamp 255
    colors = bytes([135, 112, 128, 0, 128, 255])
    # (s+10)*16: 144, 128, 160 ; 176, clamp 0, 168
    sc = bytes([144, 128, 160, 176, 0, 168])
    # smallest-three on xyzw: splat 0 (0,0,0,1) largest 3 (+):
    #   comp = (3<<30) = 0xC0000000 (mag of zeros truncates to 0)
    # splat 1 xyzw (-0.5, 0.5, -0.5, 0.5): tie -> first max idx 0,
    #   negative -> negate flag; per other comp: mag = trunc(511*
    #   (0.5/sqrt(0.5)) + 0.5) = trunc(361.83) = 361; signbits (own<0)^neg:
    #   q1 0.5 -> 1, q2 -0.5 -> 0, q3 0.5 -> 1 ->
    #   fields 512+361=873, 361, 873 -> (873<<20)|(361<<10)|873 = 0x3695A769
    rots = struct.pack("<II", 0xC0000000, (873 << 20) | (361 << 10) | 873)
    # quantizeSH bucket 8 (sh1Bits=5): q = round(x*128)+128, then
    # trunc((q+4)/8)*8, clamp 0..255:
    #   0.5 -> 192; -0.5 -> 64; 0.25 -> 160; 0.0 -> 128; 1.0 -> 256 ->
    #   clamp 255; -1.0 -> 0; 0.1 -> 144; -0.1 -> 112; 0.03125 -> 136
    sh = bytes([192, 64, 160, 128, 255, 0, 144, 112, 136]) + bytes([128] * 9)

    expect = header + positions + alphas + colors + sc + rots + sh
    assert payload == expect, (payload.hex(), expect.hex())


def test_spz_golden_roundtrip(tmp_path):
    """The loader must invert the golden encoding (sanity on the same
    fixtures: positions exact to 2^-12, quats to 9-bit precision)."""
    from divshot_tpu.gsio.spz import save_spz, load_spz

    means = np.array([[0.5, -0.25, 1.0], [-0.1, 0.0, 16.0]], np.float32)
    quats = np.array([[1, 0, 0, 0], [0.5, -0.5, 0.5, -0.5]], np.float32)
    p = GaussianParams.create(means, quats=quats, sh_degree=0)
    path = str(tmp_path / "rt.spz")
    save_spz(path, p)
    q, meta = load_spz(path)
    got = np.asarray(q.means)
    assert np.allclose(got, means, atol=1.5 / 4096)
    gq = np.asarray(q.quats)
    for i in range(2):
        a = gq[i] / np.linalg.norm(gq[i])
        b = quats[i] / np.linalg.norm(quats[i])
        assert min(np.abs(a - b).max(), np.abs(a + b).max()) < 3e-3
