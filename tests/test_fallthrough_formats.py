"""Sun Raster / Radiance HDR / PFM — the OpenCV always-compiled
fallthrough readers the reference gets for free (grfmt_sunras/grfmt_hdr/
grfmt_pfm behind /root/reference/opencv.cpp:93-102), plus the JPEG 2000
typed-error stance. cv2 (OpenCV 5.0) is the oracle wherever its own
reader is still sane; cv2 5.0 regressions (no-map gray SR decodes to
zeros, SR RLE/RGB-order rejected) are pinned by round-trips instead and
noted inline."""

import struct

import cv2
import numpy as np
import pytest

from lilliput_tpu import (ImageOps, ImageOptions, ResizeMethod, new_decoder,
                          new_encoder)
from lilliput_tpu.errors import InvalidImageError
from lilliput_tpu.framebuffer import Framebuffer


def _decode(buf: bytes) -> np.ndarray:
    d = new_decoder(buf)
    fb = Framebuffer()
    d.decode_to(fb)
    arr = fb.to_numpy()
    if arr.ndim == 3 and arr.shape[2] == 1:
        arr = arr[:, :, 0]
    return arr


def _img(h, w, c=3, seed=0):
    return np.random.default_rng(seed).integers(
        0, 256, (h, w, c) if c > 1 else (h, w), np.uint8)


# -- Sun Raster ---------------------------------------------------------------

def _sr(w, h, depth, typ, maptype, mapdata, data, length=None):
    return struct.pack(
        ">8I", 0x59A66A95, w, h, depth,
        length if length is not None else len(data), typ, maptype,
        len(mapdata)) + mapdata + data


def test_sunras_color_matches_cv2():
    # odd width exercises the even-byte row pitch
    img = _img(13, 17)
    ok, enc = cv2.imencode(".sr", img)
    assert ok
    got = _decode(enc.tobytes())
    ref = cv2.imdecode(enc, cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(got, img)


def test_sunras_encode_readable_by_cv2():
    img = _img(9, 11, seed=1)
    enc = new_encoder(".sr").encode(Framebuffer.from_array(img), {})
    back = cv2.imdecode(np.frombuffer(enc, np.uint8), cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(back, img)
    np.testing.assert_array_equal(_decode(enc), img)


def test_sunras_gray_roundtrip():
    # cv2 5.0's no-map gray READER is broken (decodes to zeros), so our
    # encoder writes an explicit identity gray colormap — which cv2 5.0
    # does read correctly — and our decoder handles both forms
    g = _img(7, 10, c=1, seed=2)
    enc = new_encoder(".sr").encode(Framebuffer.from_array(g[..., None]), {})
    np.testing.assert_array_equal(_decode(enc), g)
    back = cv2.imdecode(np.frombuffer(enc, np.uint8), cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(back, g)
    # no-map gray form (OpenCV 4.x semantics: identity gray)
    pitch = (10 + 1) & ~1
    rows = np.pad(g, ((0, 0), (0, pitch - 10)))
    nomap = _sr(10, 7, 8, 1, 0, b"", rows.tobytes())
    np.testing.assert_array_equal(_decode(nomap), g)


def test_sunras_rle_and_rgb_order():
    # RT_BYTE_ENCODED + RT_FORMAT_RGB: cv2 5.0 rejects both (4.x-era
    # OpenCV, which the reference links, supported them) — pinned by
    # construction: a solid-color RLE run and an RGB-order raster
    data = bytes([0x80, 47, 10])  # 48 bytes of 10 -> 4x4 BGR solid
    buf = _sr(4, 4, 24, 2, 0, b"", data)
    got = _decode(buf)
    assert got.shape == (4, 4, 3) and (got == 10).all()
    # literal 0x80 escape: 0x80,0x00 emits one 0x80 byte
    lit = bytes([0x80, 0]) * 48
    buf = _sr(4, 4, 24, 2, 0, b"", lit)
    assert (_decode(buf) == 0x80).all()
    # RT_FORMAT_RGB stores RGB triples; framebuffer is BGR
    rgb_row = bytes([1, 2, 3] * 4)
    buf = _sr(4, 2, 24, 3, 0, b"", rgb_row * 2)
    got = _decode(buf)
    assert got[0, 0].tolist() == [3, 2, 1]


def test_sunras_palette_and_1bit():
    # 8-bit palette: file stores all-R, all-G, all-B planes
    pal = bytes(range(256)) + bytes(256) + bytes(255 - i for i in range(256))
    idx = np.arange(16, dtype=np.uint8).reshape(2, 8)
    buf = _sr(8, 2, 8, 1, 1, pal, idx.tobytes())
    got = _decode(buf)
    ref = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(got, ref)  # cv2 5.0 palette path is sane
    assert got[0, 0].tolist() == [255, 0, 0]  # BGR of (R=0, G=0, B=255)
    # 1-bit: 1 = black, rows padded to even bytes
    bits = np.packbits(np.tile(np.array([1, 0], np.uint8), (2, 4)), axis=1)
    rows = np.pad(bits, ((0, 0), (0, 1)))  # 2-byte pitch
    buf = _sr(8, 2, 1, 1, 0, b"", rows.tobytes())
    got = _decode(buf)
    assert got[0, :4].tolist() == [0, 255, 0, 255]


def test_sunras_32bit():
    # 4 bytes/px: pad byte then BGR; cv2 5.0 agrees here
    px = bytes([9, 40, 50, 60] * 4)
    buf = _sr(4, 1, 32, 1, 0, b"", px)
    got = _decode(buf)
    ref = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(got, ref)
    assert got[0, 0].tolist() == [40, 50, 60]


def test_sunras_hardening():
    with pytest.raises(InvalidImageError):
        new_decoder(_sr(0, 4, 24, 1, 0, b"", b""))           # zero dim
    with pytest.raises(InvalidImageError):
        new_decoder(_sr(4, 4, 16, 1, 0, b"", b""))           # bad depth
    with pytest.raises(Exception):
        _decode(_sr(64, 64, 24, 1, 0, b"", b"\x00" * 10))    # truncated


# -- Radiance HDR -------------------------------------------------------------

def test_hdr_decode_matches_cv2():
    # cv2 writes new-style RLE scanlines; IMREAD_COLOR is the reference
    # chain's output (float -> round(f*255) saturate)
    img = _img(24, 33, seed=3)
    ok, enc = cv2.imencode(".hdr", img.astype(np.float32) / 255.0)
    assert ok
    got = _decode(enc.tobytes())
    ref = cv2.imdecode(enc, cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(got, ref)


def test_hdr_u8_input_convention_matches_cv2():
    # imwrite of a u8 mat scales by 1/255 first; so does our encoder
    img = _img(10, 12, seed=4)
    ok, enc = cv2.imencode(".hdr", img)
    assert ok
    np.testing.assert_array_equal(_decode(enc.tobytes()),
                                  cv2.imdecode(enc, cv2.IMREAD_COLOR))


def test_hdr_encode_readable_by_cv2():
    img = _img(11, 9, seed=5)
    enc = new_encoder(".hdr").encode(Framebuffer.from_array(img), {})
    assert enc.startswith(b"#?RADIANCE")
    back_cv = cv2.imdecode(np.frombuffer(enc, np.uint8), cv2.IMREAD_COLOR)
    back_us = _decode(enc)
    # identical RGBE bytes -> identical u8 after either reader
    np.testing.assert_array_equal(back_cv, back_us)
    # RGBE shares one exponent across channels: error bound ~2/255 of the
    # pixel's max channel
    assert np.abs(back_us.astype(int) - img.astype(int)).max() <= 2


def test_hdr_old_style_rle():
    # hand-crafted old-RLE: pixel then (1,1,1,count) repeats it
    w, h = 10, 2
    row = bytes([100, 110, 120, 128]) + bytes([1, 1, 1, 9])
    buf = (b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
           + b"-Y %d +X %d\n" % (h, w) + row * h)
    got = _decode(buf)
    assert got.shape == (2, 10, 3)
    assert (got == got[0, 0]).all()
    # e=128 -> f = m/256 -> u8 = round(m*255/256) = m here, as BGR
    assert got[0, 0].tolist() == [120, 110, 100]


def test_hdr_transform_to_jpeg():
    # end-to-end: .hdr input through the reference Transform loop
    img = _img(40, 60, seed=6)
    ok, enc = cv2.imencode(".hdr", img.astype(np.float32) / 255.0)
    out = ImageOps(8192).transform(new_decoder(enc.tobytes()), ImageOptions(
        file_type=".jpeg", width=20, height=20,
        resize_method=ResizeMethod.FIT, encode_timeout=300.0))
    assert out[:2] == b"\xff\xd8"


def test_hdr_hardening():
    with pytest.raises(InvalidImageError):
        new_decoder(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n+X 4 -Y 4\n")
    with pytest.raises(Exception):
        _decode(b"#?RADIANCE\n\n-Y 8 +X 8\n" + b"\x00" * 4)  # truncated


# -- PFM ----------------------------------------------------------------------

def test_pfm_decode_matches_cv2():
    img = _img(14, 19, seed=7)
    ok, enc = cv2.imencode(".pfm", img.astype(np.float32))
    assert ok
    got = _decode(enc.tobytes())
    ref = cv2.imdecode(enc, cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(got, img)  # no scaling either way


def test_pfm_encode_matches_cv2_bytes_semantics():
    img = _img(6, 8, seed=8)
    enc = new_encoder(".pfm").encode(Framebuffer.from_array(img), {})
    back = cv2.imdecode(np.frombuffer(enc, np.uint8), cv2.IMREAD_UNCHANGED)
    # cv2 reads our floats back exactly: values preserved, RGB order file
    np.testing.assert_array_equal(back, img.astype(np.float32))
    np.testing.assert_array_equal(_decode(enc), img)


def test_pfm_gray():
    g = _img(5, 9, c=1, seed=9)
    ok, enc = cv2.imencode(".pfm", g.astype(np.float32))
    assert ok
    np.testing.assert_array_equal(_decode(enc.tobytes()), g)
    ours = new_encoder(".pfm").encode(Framebuffer.from_array(g[..., None]), {})
    assert ours.startswith(b"Pf\n")
    back = cv2.imdecode(np.frombuffer(ours, np.uint8), cv2.IMREAD_UNCHANGED)
    np.testing.assert_array_equal(back, g.astype(np.float32))


def test_pfm_big_endian():
    g = _img(4, 4, c=1, seed=10).astype(">f4")
    buf = b"Pf\n4 4\n1\n" + g[::-1].tobytes()  # positive scale = big-endian
    np.testing.assert_array_equal(_decode(buf), g.astype(np.uint8))


def test_pfm_saturation():
    f = np.array([[-5.0, 0.4, 0.6, 300.0]], np.float32)
    buf = b"Pf\n4 1\n-1\n" + f[::-1].astype("<f4").tobytes()
    np.testing.assert_array_equal(_decode(buf), [[0, 0, 1, 255]])


# -- JPEG 2000 ----------------------------------------------------------------
# real decoding lives in codecs/jp2.py + tests/test_jp2.py (round 3); the
# dispatch contract here: JP2/J2K magic routes to the decoder, and garbage
# with valid magic still fails with a typed, format-specific error

def test_jpeg2000_garbage_typed_error():
    jp2 = b"\x00\x00\x00\x0cjP  \r\n\x87\n" + b"\x00" * 64
    with pytest.raises(InvalidImageError, match="JPEG 2000"):
        new_decoder(jp2)
    j2k = b"\xff\x4f\xff\x51" + b"\x00" * 64
    with pytest.raises(InvalidImageError, match="JPEG 2000"):
        new_decoder(j2k)
