"""WebP codec tests: decode parity with libwebp (via PIL), animated
transform round trips with dispose/blend compositing, ICC passthrough."""
import base64
import io

import numpy as np
import pytest

from lilliput_tpu import binding

if not binding.available():
    pytest.skip("native host library unavailable", allow_module_level=True)

PIL_Image = pytest.importorskip("PIL.Image")

from lilliput_tpu import ImageOps, ImageOptions, ResizeMethod, new_decoder  # noqa: E402
from lilliput_tpu.framebuffer import WEBP_QUALITY, Framebuffer  # noqa: E402

TD = "/root/reference/testdata"


def test_still_decode_bit_exact_vs_libwebp():
    d = new_decoder(open(f"{TD}/ferry_sunset.webp", "rb").read())
    fb = Framebuffer()
    d.decode_to(fb)
    ref = np.array(PIL_Image.open(f"{TD}/ferry_sunset.webp").convert("RGB"))[:, :, ::-1]
    assert np.array_equal(fb.to_numpy(), ref)


def test_animated_header():
    d = new_decoder(open(f"{TD}/party-discord.webp", "rb").read())
    h = d.header()
    assert h.is_animated() and h.num_frames == 16
    assert h.has_alpha()
    assert d.video_codec() == "VP8"


def test_total_duration():
    """duration() is the sum of every frame's duration (reference
    webp.go:73-77 / webp.cpp:107-112); 0 for still images."""
    d = new_decoder(open(f"{TD}/party-discord.webp", "rb").read())
    total = d.duration()
    assert total > 0
    fb = Framebuffer()
    acc = 0.0
    while True:
        try:
            d.decode_to(fb)
        except EOFError:
            break
        acc += fb.duration
    assert abs(total - acc) < 1e-9
    still = new_decoder(open(f"{TD}/ferry_sunset.webp", "rb").read())
    assert still.duration() == 0.0


def test_frame_metadata():
    d = new_decoder(open(f"{TD}/party-discord.webp", "rb").read())
    fb = Framebuffer()
    d.decode_to(fb)
    assert fb.duration > 0


@pytest.mark.parametrize("name", ["party-discord.webp", "animated-webp-supported.webp"])
def test_transform_animated_roundtrip(name):
    buf = open(f"{TD}/{name}", "rb").read()
    out = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".webp", resize_method=ResizeMethod.NO_RESIZE,
        encode_timeout=600.0, encode_options={WEBP_QUALITY: 85}))
    im = PIL_Image.open(io.BytesIO(out))
    orig = PIL_Image.open(f"{TD}/{name}")
    assert getattr(im, "n_frames", 1) == getattr(orig, "n_frames", 1)
    assert im.size == orig.size


def test_transform_resize_animated():
    buf = open(f"{TD}/party-discord.webp", "rb").read()
    out = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".webp", width=13, height=9, resize_method=ResizeMethod.RESIZE,
        encode_timeout=600.0, encode_options={WEBP_QUALITY: 85}))
    im = PIL_Image.open(io.BytesIO(out))
    assert im.size == (13, 9)


def test_icc_passthrough():
    buf = open(f"{TD}/tears_of_steel_icc.webp", "rb").read()
    icc_in = new_decoder(buf).icc()
    assert icc_in
    out = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".webp", width=400, height=167, resize_method=ResizeMethod.FIT,
        encode_timeout=600.0))
    assert new_decoder(out).icc() == icc_in


def test_webp_thumbhash_golden():
    buf = open("/root/reference/data/firefox-gray-alpha.webp", "rb").read()
    d = new_decoder(buf)
    h = d.header()
    out = ImageOps(8192).transform(d, ImageOptions(
        file_type=".thumbhash", width=h.width, height=h.height,
        resize_method=ResizeMethod.NO_RESIZE, encode_timeout=300.0))
    assert base64.b64encode(out).decode() == "4AeKBQA7oFl7lqhmaDBp92yJJ1h2iHB2Rw=="


def test_lossless_option():
    buf = open(f"{TD}/ferry_sunset.webp", "rb").read()
    d = new_decoder(buf)
    fb = Framebuffer()
    d.decode_to(fb)
    from lilliput_tpu.codecs.webp import WebpEncoder
    enc = WebpEncoder(d)
    assert enc.encode(fb, {WEBP_QUALITY: 101}) is None  # buffered
    out = enc.encode(None, {WEBP_QUALITY: 101})
    back = np.array(PIL_Image.open(io.BytesIO(out)).convert("RGB"))[:, :, ::-1]
    assert np.array_equal(back, fb.to_numpy())  # lossless round trip


def test_batched_webp_animation_matches_streaming():
    from lilliput_tpu.pipeline import transcode_webp
    buf = open(f"{TD}/party-discord.webp", "rb").read()
    batched = transcode_webp(buf, 24, 15)
    streaming = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".webp", width=24, height=15,
        resize_method=ResizeMethod.RESIZE, encode_timeout=600.0))
    assert batched == streaming


def test_extended_encode_options_accepted():
    from lilliput_tpu.framebuffer import (WEBP_FILTER_STRENGTH, WEBP_METHOD,
                                          WEBP_QUALITY)
    from lilliput_tpu.framebuffer import Framebuffer as FB
    d = new_decoder(open(f"{TD}/ferry_sunset.webp", "rb").read())
    fb = FB()
    d.decode_to(fb)
    from lilliput_tpu.codecs.webp import WebpEncoder
    enc = WebpEncoder(d)
    opts = {WEBP_QUALITY: 70, WEBP_METHOD: 6, WEBP_FILTER_STRENGTH: 30}
    assert enc.encode(fb, opts) is None
    out = enc.encode(None, opts)
    assert PIL_Image.open(io.BytesIO(out)).size == (fb.width, fb.height)


# ---------------------------------------------------------------------------
# WebP yuv420 device emit (serving still fast path): the device converts
# packed BGRA to YUV420 with libwebp's EXACT import arithmetic (per-pixel
# fixed-point RGBToY + gamma-corrected 2x2 chroma accumulation), so the
# host encodes from planes (1.5 B/px D2H instead of 4) with BYTE-IDENTICAL
# .webp output. Oracle: shim lp_webp_bgra_to_yuv = libwebp's own importer.
# ---------------------------------------------------------------------------

def _yuv_oracle(px):
    import ctypes
    lib = binding.load()
    u8p = ctypes.POINTER(ctypes.c_uint8)
    h, w, ch = px.shape
    y = np.empty(h * w, np.uint8)
    u = np.empty(((h + 1) // 2) * ((w + 1) // 2), np.uint8)
    v = np.empty_like(u)
    px = np.ascontiguousarray(px)
    rc = lib.lp_webp_bgra_to_yuv(
        px.ctypes.data_as(u8p), w, h, ch, y.ctypes.data_as(u8p),
        u.ctypes.data_as(u8p), v.ctypes.data_as(u8p), None)
    assert rc == 0
    return (y.reshape(h, w), u.reshape((h + 1) // 2, (w + 1) // 2),
            v.reshape((h + 1) // 2, (w + 1) // 2))


def _pack(px):
    return (px[..., 0].astype(np.int32) | (px[..., 1].astype(np.int32) << 8)
            | (px[..., 2].astype(np.int32) << 16) | np.int32(-16777216))


@pytest.mark.parametrize("h,w", [(2, 2), (1, 1), (5, 7), (64, 64), (33, 47),
                                 (256, 256)])
def test_webp_yuv_device_conversion_matches_libwebp_import(h, w):
    from lilliput_tpu.ops.color import webp_yuv420_from_packed
    rng = np.random.default_rng(h * 1000 + w)
    px = rng.integers(0, 256, (h, w, 3), np.uint8)
    dy, du, dv = [np.asarray(a) for a in
                  webp_yuv420_from_packed(_pack(px)[None])]
    oy, ou, ov = _yuv_oracle(px)
    assert np.array_equal(dy[0], oy)
    assert np.array_equal(du[0], ou)
    assert np.array_equal(dv[0], ov)


def test_webp_yuv_device_conversion_value_sweep():
    # every u8 value through the gamma tables (uniform 2x2 blocks)
    from lilliput_tpu.ops.color import webp_yuv420_from_packed
    px = np.zeros((2, 512, 3), np.uint8)
    for v in range(256):
        px[:, 2 * v:2 * v + 2] = v
    dy, du, dv = [np.asarray(a) for a in
                  webp_yuv420_from_packed(_pack(px)[None])]
    oy, ou, ov = _yuv_oracle(px)
    assert np.array_equal(dy[0], oy)
    assert np.array_equal(du[0], ou)
    assert np.array_equal(dv[0], ov)


def test_webp_yuv_encode_byte_identity():
    from lilliput_tpu.codecs.webp import encode_webp_pixels, encode_webp_yuv
    from lilliput_tpu.ops.color import webp_yuv420_from_packed
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (33, 47, 3), np.uint8)
    y, u, v = [np.asarray(a) for a in webp_yuv420_from_packed(_pack(px))]
    icc = b"\x00" * 64
    for opts in ({WEBP_QUALITY: 85}, {WEBP_QUALITY: 50}):
        assert encode_webp_yuv(y, u, v, opts) == encode_webp_pixels(px, opts)
        assert (encode_webp_yuv(y, u, v, opts, icc)
                == encode_webp_pixels(px, opts, icc))


def test_webp_yuv_encode_rejects_lossless():
    from lilliput_tpu.codecs.webp import encode_webp_yuv
    from lilliput_tpu.errors import DecodingFailedError
    y = np.zeros((8, 8), np.uint8)
    u = v = np.zeros((4, 4), np.uint8)
    with pytest.raises(DecodingFailedError):
        encode_webp_yuv(y, u, v, {WEBP_QUALITY: 101})


def test_pipeline_webp_yuv_byte_identity(monkeypatch):
    """JpegTranscodePipeline .webp output must be byte-identical with the
    yuv420 emit (default) and the BGRA escape hatch, and lossless options
    must route to the BGRA path."""
    from bench import _ensure_fixture
    from lilliput_tpu.pipeline import JpegTranscodePipeline
    buf = _ensure_fixture()
    pipe = JpegTranscodePipeline(buf, 96, 96, quality=85,
                                 output_format=".webp")
    assert pipe._emit == "yuv420"
    fast = pipe.transcode([buf] * 2)
    monkeypatch.setenv("LILLIPUT_WEBP_YUV", "0")
    slow_pipe = JpegTranscodePipeline(buf, 96, 96, quality=85,
                                      output_format=".webp")
    assert slow_pipe._emit == "pixels"
    assert slow_pipe.transcode([buf] * 2) == fast
    monkeypatch.delenv("LILLIPUT_WEBP_YUV")
    lossless = JpegTranscodePipeline(buf, 96, 96, quality=85,
                                     output_format=".webp",
                                     encode_options={WEBP_QUALITY: 101})
    assert lossless._emit == "pixels"


def test_still_pipeline_webp_yuv_byte_identity(monkeypatch):
    """Pixel-domain (PNG-source) serving: same identity; alpha sources
    must stay on the BGRA path (libwebp's alpha-weighted chroma is a
    different arithmetic)."""
    from lilliput_tpu.pipeline import StillTranscodePipeline
    from lilliput_tpu.codecs.png import encode_png_pixels
    rng = np.random.default_rng(2)
    png = encode_png_pixels(rng.integers(0, 256, (60, 80, 3), np.uint8), 6)
    sp = StillTranscodePipeline(png, 40, 30, quality=85,
                                output_format=".webp")
    assert sp._emit == "yuv420"
    fast = sp.transcode([png] * 2)
    monkeypatch.setenv("LILLIPUT_WEBP_YUV", "0")
    sp2 = StillTranscodePipeline(png, 40, 30, quality=85,
                                 output_format=".webp")
    assert sp2.transcode([png] * 2) == fast
    monkeypatch.delenv("LILLIPUT_WEBP_YUV")
    apng = encode_png_pixels(rng.integers(0, 256, (60, 80, 4), np.uint8), 6)
    ap = StillTranscodePipeline(apng, 40, 30, quality=85,
                                output_format=".webp")
    assert ap._emit == "pixels"  # alpha source keeps BGRA
    out = ap.transcode([apng])
    assert out[0][:4] == b"RIFF"
