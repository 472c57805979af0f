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
