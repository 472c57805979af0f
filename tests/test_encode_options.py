"""Encode-option passthrough parity (VERDICT r3 next #8).

The reference forwards any map[int]int straight to cv::imencode
(/root/reference/opencv.go:44-60 -> opencv.cpp:124-188), so every OpenCV
imwrite key works there. This pins the remaining keys:
IMWRITE_JPEG_LUMA_QUALITY / CHROMA_QUALITY (per-table quant scaling),
IMWRITE_PNG_STRATEGY (zlib strategy), IMWRITE_PNG_BILEVEL (1-bit gray) —
each against the cv2 oracle where one exists — plus the unknown-key
contract (warn-and-ignore, OpenCV's own loadsave.cpp behavior, counted
in Metrics)."""
import io
import warnings

import numpy as np
import pytest

from lilliput_tpu import binding

if not binding.available():
    pytest.skip("native host library unavailable", allow_module_level=True)

from lilliput_tpu.codecs.jpeg import JpegEncoder  # noqa: E402
from lilliput_tpu.codecs.png import PngEncoder, encode_png_pixels  # noqa: E402
from lilliput_tpu.framebuffer import (JPEG_CHROMA_QUALITY,  # noqa: E402
                                      JPEG_LUMA_QUALITY, JPEG_QUALITY,
                                      PNG_BILEVEL, PNG_COMPRESSION,
                                      PNG_STRATEGY, Framebuffer)


def _fb(arr):
    return Framebuffer.from_array(arr)


def _dqt_tables(buf: bytes):
    """All DQT tables of a JPEG stream, {table_id: 64 zigzag values}."""
    tables = {}
    p = 2
    while p + 4 <= len(buf):
        if buf[p] != 0xFF:
            break
        m = buf[p + 1]
        if m == 0xDA:
            break
        seglen = (buf[p + 2] << 8) | buf[p + 3]
        if m == 0xDB:
            q = p + 4
            end = p + 2 + seglen
            while q < end:
                pq, tq = buf[q] >> 4, buf[q] & 15
                n = 128 if pq else 64
                vals = (np.frombuffer(buf[q + 1:q + 1 + n], np.uint8)
                        if not pq else
                        np.frombuffer(buf[q + 1:q + 1 + n],
                                      ">u2").astype(np.uint8))
                tables[tq] = vals
                q += 1 + n
        p += 2 + seglen
    return tables


@pytest.mark.parametrize("lq,cq", [(90, 30), (30, 90), (85, 85)])
def test_jpeg_luma_chroma_quality_match_cv2_dqt(lq, cq):
    """Per-table quality scaling must emit the SAME quantization tables
    cv2 emits for the same keys (both scale the Annex-K tables with
    jpeg_quality_scaling, so DQT bytes are comparable exactly)."""
    import cv2
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 48, 3), np.uint8)
    ok, enc = cv2.imencode(".jpg", img, [
        cv2.IMWRITE_JPEG_LUMA_QUALITY, lq,
        cv2.IMWRITE_JPEG_CHROMA_QUALITY, cq])
    assert ok
    ours = JpegEncoder().encode(_fb(img), {JPEG_LUMA_QUALITY: lq,
                                           JPEG_CHROMA_QUALITY: cq})
    t_cv = _dqt_tables(enc.tobytes())
    t_us = _dqt_tables(ours)
    assert np.array_equal(t_us[0], t_cv[0]), "luma tables differ"
    assert np.array_equal(t_us[1], t_cv[1]), "chroma tables differ"


def test_jpeg_luma_quality_alone_sets_chroma_too():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (32, 32, 3), np.uint8)
    a = JpegEncoder().encode(_fb(img), {JPEG_LUMA_QUALITY: 40})
    b = JpegEncoder().encode(_fb(img), {JPEG_LUMA_QUALITY: 40,
                                        JPEG_CHROMA_QUALITY: 40})
    assert _dqt_tables(a)[1].tolist() == _dqt_tables(b)[1].tolist()
    # and chroma-alone is ignored (cv2 gate: luma must be present)
    c = JpegEncoder().encode(_fb(img), {JPEG_QUALITY: 85,
                                        JPEG_CHROMA_QUALITY: 40})
    d = JpegEncoder().encode(_fb(img), {JPEG_QUALITY: 85})
    assert _dqt_tables(c)[1].tolist() == _dqt_tables(d)[1].tolist()


def test_png_bilevel_matches_cv2_decode_back():
    import cv2
    rng = np.random.default_rng(2)
    img = (rng.integers(0, 2, (41, 29, 1), np.uint8) * 255).astype(np.uint8)
    ours = PngEncoder().encode(_fb(img), {PNG_BILEVEL: 1})
    assert ours[24] == 1 and ours[25] == 0  # bit depth 1, grayscale
    back = cv2.imdecode(np.frombuffer(ours, np.uint8), cv2.IMREAD_GRAYSCALE)
    ok, cvenc = cv2.imencode(".png", img[:, :, 0],
                             [cv2.IMWRITE_PNG_BILEVEL, 1])
    assert ok
    cvback = cv2.imdecode(cvenc, cv2.IMREAD_GRAYSCALE)
    assert np.array_equal(back, cvback)
    # nonzero values threshold to 255 like cv2
    img2 = img.copy()
    img2[0, 0] = 7
    ours2 = PngEncoder().encode(_fb(img2), {PNG_BILEVEL: 1})
    back2 = cv2.imdecode(np.frombuffer(ours2, np.uint8),
                         cv2.IMREAD_GRAYSCALE)
    assert back2[0, 0] == 255


def test_png_bilevel_color_input():
    from PIL import Image
    img = np.zeros((10, 12, 3), np.uint8)
    img[3:6, 4:9] = 255
    out = PngEncoder().encode(_fb(img), {PNG_BILEVEL: 1})
    pim = Image.open(io.BytesIO(out))
    assert pim.mode == "1" and pim.size == (12, 10)
    got = np.asarray(pim.convert("L"))
    assert got[4, 5] == 255 and got[0, 0] == 0


@pytest.mark.parametrize("strategy", [0, 1, 2, 3, 4])
def test_png_strategy_roundtrips(strategy):
    import cv2
    rng = np.random.default_rng(strategy)
    img = rng.integers(0, 256, (23, 31, 3), np.uint8)
    out = PngEncoder().encode(_fb(img), {PNG_STRATEGY: strategy,
                                         PNG_COMPRESSION: 6})
    back = cv2.imdecode(np.frombuffer(out, np.uint8), cv2.IMREAD_COLOR)
    assert np.array_equal(back, img)


def test_unknown_key_warns_and_is_counted():
    from lilliput_tpu.utils.metrics import metrics
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    before = metrics.snapshot()["counters"].get(
        "encode.unknown_option.jpeg", 0)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = JpegEncoder().encode(_fb(img), {9999: 1, JPEG_QUALITY: 80})
    assert out[:2] == b"\xff\xd8"  # encoded fine (ignored, like OpenCV)
    assert any("unknown option key 9999" in str(x.message) for x in w)
    assert metrics.snapshot()["counters"].get(
        "encode.unknown_option.jpeg", 0) == before + 1


def test_known_keys_do_not_warn():
    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        JpegEncoder().encode(_fb(img), {JPEG_QUALITY: 80})
        encode_png_pixels(img, 6)
    assert not [x for x in w if "unknown option" in str(x.message)]


def test_cross_codec_keys_do_not_warn():
    """The reference CLI passes ONE combined map (JPEG+PNG+WebP keys) to
    whatever encoder matches the output; other codecs' keys are normal."""
    from lilliput_tpu.codecs.webp import encode_webp_pixels
    from lilliput_tpu.framebuffer import WEBP_QUALITY
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    combined = {JPEG_QUALITY: 85, PNG_COMPRESSION: 7, WEBP_QUALITY: 80}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        JpegEncoder().encode(_fb(img), dict(combined))
        PngEncoder().encode(_fb(img), dict(combined))
        encode_webp_pixels(img, dict(combined))
    assert not [x for x in w if "unknown option" in str(x.message)], (
        [str(x.message) for x in w])
