"""AVIF codec tests (avif_test.go taxonomy): static + animated decode,
durations/loop count, ICC passthrough + Rec709 substitution for tone-mapped
HDR, encode round trip."""
import io

import numpy as np
import pytest

PIL_Image = pytest.importorskip("PIL.Image")
if not getattr(__import__("PIL.features", fromlist=["check"]), "check")("avif"):
    pytest.skip("PIL lacks AVIF support", allow_module_level=True)

from lilliput_tpu import ImageOps, ImageOptions, ResizeMethod, new_decoder  # noqa: E402
from lilliput_tpu.codecs.avif import AvifDecoder, parse_cicp  # noqa: E402
from lilliput_tpu.codecs.icc import REC709_PROFILE, is_hdr_icc_profile  # noqa: E402
from lilliput_tpu.framebuffer import AVIF_QUALITY, AVIF_SPEED, Framebuffer  # noqa: E402

TD = "/root/reference/testdata"


def test_static_header_and_decode():
    d = new_decoder(open(f"{TD}/colors_sdr_srgb.avif", "rb").read())
    h = d.header()
    assert (h.width, h.height) == (200, 200)
    assert not h.is_animated()
    fb = Framebuffer()
    d.decode_to(fb)
    assert fb.to_numpy().shape == (200, 200, 3)
    with pytest.raises(EOFError):
        d.decode_to(fb)


def test_animated_durations_and_loops():
    d = new_decoder(open(f"{TD}/colors-animated-8bpc-alpha-exif-xmp.avif", "rb").read())
    h = d.header()
    assert h.num_frames == 5 and h.has_alpha()
    assert d.duration() > 0
    assert d.loop_count() == 0


def test_unknown_loop_count_is_zero():
    d = new_decoder(open(f"{TD}/spinning-globe-unknown-loop-count.avif", "rb").read())
    assert d.loop_count() == 0  # avif.cpp:401-413: unknown/infinite -> 0
    assert d.header().num_frames == 72


def test_icc_passthrough():
    d = new_decoder(open(f"{TD}/paris_icc_exif_xmp.avif", "rb").read())
    assert len(d.icc()) == 596


def test_hdr_reports_rec709_when_tone_mapped():
    buf = open(f"{TD}/hdr_color_preservation.avif", "rb").read()
    cicp = parse_cicp(buf)
    assert cicp is not None and cicp[1] in (16, 18)  # PQ or HLG
    d = AvifDecoder(buf, tone_mapping_enabled=True)
    assert d.icc() == REC709_PROFILE
    assert not is_hdr_icc_profile(d.icc())
    d2 = AvifDecoder(buf, tone_mapping_enabled=False)
    assert d2.icc() != REC709_PROFILE


def test_transform_animated_avif():
    buf = open(f"{TD}/colors-animated-8bpc-alpha-exif-xmp.avif", "rb").read()
    out = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".avif", width=64, height=64, resize_method=ResizeMethod.FIT,
        encode_timeout=600.0, encode_options={AVIF_QUALITY: 60, AVIF_SPEED: 10}))
    im = PIL_Image.open(io.BytesIO(out))
    assert im.size == (64, 64)
    assert getattr(im, "n_frames", 1) == 5


def test_avif_to_webp():
    buf = open(f"{TD}/colors-animated-8bpc-alpha-exif-xmp.avif", "rb").read()
    out = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".webp", width=64, height=64, resize_method=ResizeMethod.FIT,
        encode_timeout=600.0))
    im = PIL_Image.open(io.BytesIO(out))
    assert im.size == (64, 64) and getattr(im, "n_frames", 1) == 5


def test_batched_avif_transcode():
    from lilliput_tpu.framebuffer import AVIF_QUALITY, AVIF_SPEED
    from lilliput_tpu.pipeline import transcode_avif
    buf = open(f"{TD}/colors-animated-8bpc-alpha-exif-xmp.avif", "rb").read()
    out = transcode_avif(buf, 64, 64, fit=True,
                         encode_options={AVIF_QUALITY: 60, AVIF_SPEED: 10})
    im = PIL_Image.open(io.BytesIO(out))
    assert im.size == (64, 64) and getattr(im, "n_frames", 1) == 5
