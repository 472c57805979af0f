"""Video/audio probe + first-frame tests (avcodec_test.go taxonomy):
streamability probe on std/web/corrupt-atom MP4s, codec names, audio-only
files, AV1 flag gating, keyframe index invariants, raw keyframe decode."""
import glob
import os

import numpy as np
import pytest

from lilliput_tpu import binding

if not binding.available():
    pytest.skip("native host library unavailable", allow_module_level=True)

from lilliput_tpu import (ImageOps, ImageOptions, ResizeMethod,  # noqa: E402
                          new_decoder)
from lilliput_tpu.errors import InvalidImageError  # noqa: E402
from lilliput_tpu.codecs.video import (decode_raw_keyframe,  # noqa: E402
                                       is_streamable_mp4, set_av1_enabled)
from lilliput_tpu.framebuffer import Framebuffer  # noqa: E402

TD = "/root/reference/testdata"


def test_streamability_probe():
    std = open(f"{TD}/big_buck_bunny_480p_10s_std.mp4", "rb").read()
    web = open(f"{TD}/big_buck_bunny_480p_10s_web.mp4", "rb").read()
    big = open(f"{TD}/big_buck_bunny_480p_10s_big_atom.mp4", "rb").read()
    zero = open(f"{TD}/big_buck_bunny_480p_10s_zero_length_atom.mp4", "rb").read()
    assert not is_streamable_mp4(std)   # moov after mdat
    assert is_streamable_mp4(web)       # faststart
    assert not is_streamable_mp4(big)
    assert not is_streamable_mp4(zero)
    # reference parity (avcodec.cpp:209): the probe runs on EVERY input
    # with no ftyp gate — non-ISOBMFF containers are NOT streamable via
    # the no-moov fallthrough (regression: they returned True), and a
    # moov whose header sits past the 32 KB probe limit is not found
    webm = open("tests/assets/tiny_vp8.webm", "rb").read()
    assert not is_streamable_mp4(webm)
    d = new_decoder(webm)
    assert not d.is_streamable()
    import struct
    far = (struct.pack(">I", 8 + 40000) + b"free" + b"\x00" * 40000
           + struct.pack(">I", 16) + b"moov" + b"\x00" * 8)
    assert not is_streamable_mp4(far)   # header past the 32 KB probe
    near = (struct.pack(">I", 16) + b"free" + b"\x00" * 8
            + struct.pack(">I", 16) + b"moov" + b"\x00" * 8)
    assert is_streamable_mp4(near)


def test_probe_and_first_frame():
    buf = open(f"{TD}/big_buck_bunny_480p_10s_std.mp4", "rb").read()
    d = new_decoder(buf)
    h = d.header()
    assert (h.width, h.height) == (853, 480)  # SAR-corrected
    assert d.video_codec() == "H264"
    assert d.audio_codec() == "AAC"
    assert d.description() == "MP4"
    assert 9.5 < d.duration() < 10.5
    assert not d.has_subtitles()
    fb = Framebuffer()
    d.decode_to(fb)
    assert (fb.height, fb.width) == (480, 853)
    assert fb.to_numpy().mean() > 1  # not blank


def test_icc_for_video():
    buf = open(f"{TD}/big_buck_bunny_480p_10s_std.mp4", "rb").read()
    assert len(new_decoder(buf).icc()) > 0


@pytest.mark.parametrize("path", sorted(glob.glob(f"{TD}/tos-intro-3s.*")),
                         ids=os.path.basename)
def test_audio_only_files(path):
    d = new_decoder(open(path, "rb").read())
    assert d.header().width == 0
    assert 2.5 < d.duration() < 3.5
    expected = {"aac": "AAC", "flac": "FLAC", "mp3": "MP3",
                "ogg": "Vorbis", "wav": "Unknown"}
    ext = path.rsplit(".", 1)[1]
    assert d.audio_codec() == expected[ext]


def test_av1_gating():
    buf = open(f"{TD}/av1-mp4.mp4", "rb").read()
    with pytest.raises(InvalidImageError):
        new_decoder(buf)
    set_av1_enabled(True)
    try:
        d = new_decoder(buf)
        assert d.video_codec() == "AV1"
        fb = Framebuffer()
        d.decode_to(fb)
        assert fb.width == 1280
    finally:
        set_av1_enabled(False)


def test_keyframe_index_and_raw_decode():
    buf = open(f"{TD}/big_buck_bunny_480p_10s_std.mp4", "rb").read()
    d = new_decoder(buf)
    kf = d.keyframes()
    assert len(kf) >= 1
    for ts, off, size in kf:
        assert ts >= 0 and 0 <= off < len(buf) and size > 0
    cid, extradata = d.codec_params()
    ts, off, size = kf[0]
    px = decode_raw_keyframe(cid, extradata, buf[off:off + size], 720, 480)
    assert px.shape == (480, 720, 4)
    assert (px[:, :, 3] == 255).all()  # opaque (first frame may be black)


def test_mp4_to_jpeg_transform():
    buf = open(f"{TD}/big_buck_bunny_480p_10s_std.mp4", "rb").read()
    out = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".jpeg", width=256, height=144, resize_method=ResizeMethod.FIT,
        disable_animated_output=True, encode_timeout=300.0))
    assert out[:2] == b"\xff\xd8"


def test_spritesheet_pipeline():
    from lilliput_tpu.pipeline import spritesheet
    buf = open(f"{TD}/big_buck_bunny_480p_10s_std.mp4", "rb").read()
    sheet, ts, hashes = spritesheet(buf, 160, 90, with_thumbhashes=True)
    assert sheet.shape[0] % 90 == 0 and sheet.shape[1] % 160 == 0
    assert len(ts) >= 1 and all(t >= 0 for t in ts)
    assert hashes and all(5 <= len(h) <= 25 for h in hashes)


def _extract_ftyp_moov(buf: bytes) -> bytes:
    """ftyp+moov only, mdat stripped — simulates a media proxy that fetched
    metadata via range requests (reference avcodec_test.go:189-256)."""
    out = b""
    off = 0
    while off + 8 <= len(buf):
        size = int.from_bytes(buf[off:off + 4], "big")
        typ = buf[off + 4:off + 8]
        if size < 8 or off + size > len(buf):
            break
        if typ in (b"ftyp", b"moov"):
            out += buf[off:off + size]
        off += size
    return out


def test_moov_only_parsing_and_raw_decode():
    full = open(f"{TD}/big_buck_bunny_480p_10s_std.mp4", "rb").read()
    moov = _extract_ftyp_moov(full)
    assert 0 < len(moov) < len(full)

    d = new_decoder(moov)
    kf = d.keyframes()
    assert len(kf) >= 1
    for i, (ts, off, size) in enumerate(kf):
        assert off > 0, f"keyframe {i} byte_offset should be positive"
        assert size > 0, f"keyframe {i} size should be positive"
    cid, extradata = d.codec_params()
    assert cid > 0
    assert len(extradata) > 0

    # the media-proxy workflow: range-read packet bytes from the FULL file,
    # decode each statelessly with the moov-only decoder's codec params
    hd = d.header()
    from lilliput_tpu.codecs.video import decode_raw_keyframe
    for ts, off, size in kf[:3]:
        px = decode_raw_keyframe(cid, extradata, full[off:off + size],
                                 hd.width, hd.height)
        assert px.shape[0] >= 480 and px.shape[2] == 4


def test_webm_vp8_decode_and_transform():
    # matroska demux + VP8 through the ffmpeg shim (fixture synthesized by
    # tools/make_webm_fixture.py: libwebp VP8 key frames, hand-muxed EBML)
    buf = open("tests/assets/tiny_vp8.webm", "rb").read()
    d = new_decoder(buf)
    assert d.description() == "WEBM"
    assert d.video_codec() == "VP8"
    hd = d.header()
    assert (hd.width, hd.height) == (64, 48)
    assert abs(d.duration() - 0.8) < 0.05
    fb = Framebuffer()
    d.decode_to(fb)
    px = fb.to_numpy()
    assert px.shape == (48, 64, 4)
    # first frame content: x gradient on the red channel (BGR index 2)
    assert int(px[24, 60, 2]) - int(px[24, 3, 2]) > 100

    out = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".jpeg", width=32, height=24, resize_method=ResizeMethod.FIT,
        disable_animated_output=True, encode_timeout=300.0))
    assert out[:2] == b"\xff\xd8"


def test_rotate_metadata_tag_fallback():
    """Old files carry orientation only as a per-stream 'rotate' metadata
    tag (no display-matrix side data); the reference checks the tag FIRST
    (avcodec.cpp:428-431) and so must the shim. Hand-muxed Matroska
    track-targeted ROTATE tags are the ffmpeg-7 way to exercise that path
    (its mov demuxer always synthesizes a display matrix)."""
    import sys
    sys.path.insert(0, "tools")
    try:
        from make_webm_fixture import make_webm_bytes
    finally:
        sys.path.pop(0)
    for deg, orient in ((90, 6), (180, 3), (270, 8), (None, 1)):
        buf = make_webm_bytes(rotate=deg)
        hd = new_decoder(buf).header()
        assert hd.orientation == orient, (deg, hd.orientation)


def test_webm_output_rejected():
    from lilliput_tpu import new_encoder
    with pytest.raises(InvalidImageError):
        new_encoder(".webm")


def test_rotate_tag_nonquadrant_values_stay_upright():
    """Reference parity (avcodec.cpp:450-461): the rotate tag maps ONLY
    exactly 90/180/270; negative or non-quadrant values stay upright."""
    import sys
    sys.path.insert(0, "tools")
    try:
        from make_webm_fixture import make_webm_bytes
    finally:
        sys.path.pop(0)
    for deg, orient in ((-90, 1), (45, 1), (360, 1), (91, 1)):
        hd = new_decoder(make_webm_bytes(rotate=deg)).header()
        assert hd.orientation == orient, (deg, hd.orientation)
