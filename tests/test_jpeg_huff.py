"""Bit-identity gates for the own baseline Huffman decoder (jpeg_huff.cpp).

The fast decoder replaces libjpeg's jpeg_read_coefficients on the serving
hot path (VERDICT r3 next #1); any acceptance (rc == 0) MUST produce
byte-for-byte the coefficients and quant tables libjpeg produces, and
anything it declines must fall back so error behavior stays libjpeg's.
Oracle: lp_jpeg_decode_coefs (libjpeg-turbo) on the same buffers.
"""
import ctypes
import glob
import io
import os

import numpy as np
import pytest

from lilliput_tpu import binding

if not binding.available():
    pytest.skip("native host library unavailable", allow_module_level=True)

from lilliput_tpu.codecs import jpeg as J  # noqa: E402

_i16p = ctypes.POINTER(ctypes.c_int16)
_u16p = ctypes.POINTER(ctypes.c_uint16)
_u8p = ctypes.POINTER(ctypes.c_uint8)


def _info_of(buf):
    lib = binding.load()
    arr = np.frombuffer(buf, np.uint8)
    info = J._JpegInfo()
    rc = lib.lp_jpeg_get_info(arr.ctypes.data_as(_u8p), arr.size,
                              ctypes.byref(info))
    return info if rc == 0 else None


def _decode(buf, fast, nthreads=1, fill=7):
    """Run one of the two C decoders into freshly poisoned arrays."""
    lib = binding.load()
    info = _info_of(buf)
    assert info is not None
    arr = np.frombuffer(buf, np.uint8)
    comps = [np.full((info.comp_blocks_h[c], info.comp_blocks_w[c], 64),
                     fill, np.int16) for c in range(info.num_components)]
    q = np.zeros((4, 64), np.uint16)
    ptrs = (_i16p * len(comps))(*[c.ctypes.data_as(_i16p) for c in comps])
    if fast:
        rc = lib.lp_jpeg_decode_coefs_fast(
            arr.ctypes.data_as(_u8p), arr.size, ptrs,
            q.ctypes.data_as(_u16p), nthreads)
    else:
        rc = lib.lp_jpeg_decode_coefs(
            arr.ctypes.data_as(_u8p), arr.size, ptrs,
            q.ctypes.data_as(_u16p), None, 0)
    return rc, comps, q


def _assert_identical(buf, min_accept=True, nthreads=1):
    rc_f, cf, qf = _decode(buf, fast=True, nthreads=nthreads)
    if rc_f != 0:
        assert not min_accept, f"fast decoder declined ({rc_f})"
        return False
    rc_l, cl, ql = _decode(buf, fast=False)
    assert rc_l == 0
    assert np.array_equal(qf, ql), "qtables differ"
    for i, (a, b) in enumerate(zip(cl, cf)):
        assert np.array_equal(a, b), (
            f"comp {i}: {np.count_nonzero(a != b)} coefficients differ "
            f"(max |d| = {np.abs(a.astype(np.int32) - b).max()})")
    return True


CORPUS = sorted(glob.glob("/root/reference/data/*.jpg")
                + glob.glob("/root/reference/testdata/*.jpg"))


@pytest.mark.parametrize("path", CORPUS, ids=os.path.basename)
def test_corpus_bit_identity(path):
    buf = open(path, "rb").read()
    info = _info_of(buf)
    if info is None:
        pytest.skip("not decodable by libjpeg either")
    _assert_identical(buf)  # baseline and progressive both decode natively


def _synth(w, h, subsampling, quality, gray=False, optimize=False,
           restart=0, seed=0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    # low-frequency content + noise: realistic huffman symbol mix
    base = rng.integers(0, 256, (max(1, h // 8), max(1, w // 8), 3),
                        np.uint8)
    im = Image.fromarray(base).resize((w, h))
    if gray:
        im = im.convert("L")
    bio = io.BytesIO()
    kw = dict(quality=quality, optimize=optimize)
    if not gray:
        kw["subsampling"] = subsampling
    if restart:
        kw["restart_marker_rows"] = restart  # newer PIL
    try:
        im.save(bio, format="JPEG", **kw)
    except TypeError:
        kw.pop("restart_marker_rows", None)
        im.save(bio, format="JPEG", **kw)
        if restart:
            pytest.skip("PIL cannot emit restart markers here")
    return bio.getvalue()


@pytest.mark.parametrize("w,h", [(1, 1), (8, 8), (33, 17), (100, 76),
                                 (257, 129)])
@pytest.mark.parametrize("sub", [0, 1, 2])  # 4:4:4, 4:2:2, 4:2:0
def test_synthetic_geometries(w, h, sub):
    _assert_identical(_synth(w, h, sub, 85, seed=w * h + sub))


@pytest.mark.parametrize("quality", [5, 50, 95, 100])
def test_synthetic_qualities(quality):
    # q100 exercises long literal sizes past the fused fast_ac window
    _assert_identical(_synth(120, 90, 2, quality, seed=quality))


def test_synthetic_gray():
    _assert_identical(_synth(77, 41, 0, 85, gray=True))


def test_synthetic_optimized_tables():
    # optimize=True emits custom (non-Annex-K) Huffman tables
    _assert_identical(_synth(160, 120, 2, 85, optimize=True))


@pytest.mark.parametrize("rows", [1, 3])
def test_restart_markers_and_threading(rows):
    try:
        import cv2
    except ImportError:
        pytest.skip("cv2 unavailable")
    rng = np.random.default_rng(rows)
    img = rng.integers(0, 256, (120, 200, 3), np.uint8)
    ok, enc = cv2.imencode(".jpg", img, [
        cv2.IMWRITE_JPEG_QUALITY, 85,
        cv2.IMWRITE_JPEG_RST_INTERVAL, rows])
    assert ok
    buf = enc.tobytes()
    info = _info_of(buf)
    assert info.restart_interval > 0
    _assert_identical(buf)
    # threaded restart-segment decode must be byte-identical to serial
    _, c1, q1 = _decode(buf, fast=True, nthreads=1)
    rc4, c4, q4 = _decode(buf, fast=True, nthreads=4)
    assert rc4 == 0
    assert all(np.array_equal(a, b) for a, b in zip(c1, c4))
    assert np.array_equal(q1, q4)


# ---------------------------------------------------------------------------
# progressive (SOF2): multi-scan spectral-selection / successive-
# approximation decode must also be bit-identical to libjpeg (jdphuff.c).
# PIL/cv2 emit libjpeg's jpeg_simple_progression() 10-scan script, which
# exercises all four scan types: DC first (interleaved, Al=1), DC refine
# (Ah=1), AC first (per-component bands with EOB runs), AC refine
# (correction bits).
# ---------------------------------------------------------------------------

def _synth_prog(w, h, subsampling=2, quality=85, gray=False, optimize=False,
                seed=0):
    from PIL import Image
    rng = np.random.default_rng(seed)
    base = rng.integers(0, 256, (max(1, h // 8), max(1, w // 8), 3),
                        np.uint8)
    im = Image.fromarray(base).resize((w, h))
    if gray:
        im = im.convert("L")
    bio = io.BytesIO()
    kw = dict(quality=quality, progressive=True, optimize=optimize)
    if not gray:
        kw["subsampling"] = subsampling
    im.save(bio, format="JPEG", **kw)
    return bio.getvalue()


@pytest.mark.parametrize("w,h", [(1, 1), (8, 8), (33, 17), (100, 76),
                                 (257, 129)])
@pytest.mark.parametrize("sub", [0, 1, 2])  # 4:4:4, 4:2:2, 4:2:0
def test_progressive_geometries(w, h, sub):
    buf = _synth_prog(w, h, sub, seed=w * h + sub)
    assert _info_of(buf).progressive
    _assert_identical(buf)


@pytest.mark.parametrize("quality", [5, 50, 95, 100])
def test_progressive_qualities(quality):
    # q100 exercises long literal sizes past the fused fast_ac window;
    # optimize=True emits custom per-scan Huffman tables (DHT between
    # scans redefining table slots mid-file)
    _assert_identical(_synth_prog(120, 90, 2, quality, optimize=True,
                                  seed=quality))


def test_progressive_gray():
    _assert_identical(_synth_prog(77, 41, gray=True))


def test_progressive_cmyk():
    # 4-component progressive: the interleaved DC scans carry 4 comps,
    # the AC band chains run per component
    from PIL import Image
    rng = np.random.default_rng(0)
    im = Image.fromarray(
        rng.integers(0, 256, (40, 56, 3), np.uint8)).convert("CMYK")
    bio = io.BytesIO()
    im.save(bio, format="JPEG", quality=85, progressive=True)
    buf = bio.getvalue()
    assert _info_of(buf).num_components == 4
    assert _info_of(buf).progressive
    _assert_identical(buf)


@pytest.mark.parametrize("rows", [1, 3])
def test_progressive_restart_markers(rows):
    # restart markers inside progressive scans reset DC predictors AND
    # the EOB run per segment
    try:
        import cv2
    except ImportError:
        pytest.skip("cv2 unavailable")
    rng = np.random.default_rng(rows)
    img = rng.integers(0, 256, (120, 200, 3), np.uint8)
    ok, enc = cv2.imencode(".jpg", img, [
        cv2.IMWRITE_JPEG_QUALITY, 85,
        cv2.IMWRITE_JPEG_PROGRESSIVE, 1,
        cv2.IMWRITE_JPEG_RST_INTERVAL, rows])
    assert ok
    buf = enc.tobytes()
    info = _info_of(buf)
    assert info.progressive and info.restart_interval > 0
    _assert_identical(buf)


def test_progressive_window_mode_identity(monkeypatch):
    """Fit-crop pipelines route progressive sources through the C-side
    thread-local full-geometry scratch + window copy-out; output must be
    byte-identical to the libjpeg scratch-then-crop path."""
    import io as _io
    from PIL import Image
    from bench import _ensure_fixture
    from lilliput_tpu.pipeline import JpegTranscodePipeline
    im = Image.open(_io.BytesIO(_ensure_fixture()))
    im.load()
    bio = _io.BytesIO()
    im.save(bio, format="JPEG", quality=85, progressive=True)
    pbuf = bio.getvalue()
    assert _info_of(pbuf).progressive
    pipe = JpegTranscodePipeline(pbuf, 256, 256, quality=85)
    assert pipe._window is not None, "fixture/dst must trigger window mode"
    fast = pipe.decode_entropy([pbuf] * 2)
    monkeypatch.setenv("LILLIPUT_JPEG_HUFF", "libjpeg")
    slow = pipe.decode_entropy([pbuf] * 2)
    for a, b in zip(fast, slow):
        assert np.array_equal(a, b)


def test_progressive_corrupt_streams_decline_or_match():
    buf = _synth_prog(64, 96, seed=7)
    rng = np.random.default_rng(0)
    cases = [buf[: len(buf) // 3], buf[: 2 * len(buf) // 3], buf[:-2]]
    for _ in range(40):
        b = bytearray(buf)
        i = int(rng.integers(2, len(b)))
        b[i] ^= int(1 << rng.integers(0, 8))
        cases.append(bytes(b))
    for case in cases:
        if _info_of(case) is None:
            continue
        rc_f, cf, _ = _decode(case, fast=True)
        if rc_f != 0:
            continue  # declined -> caller falls back to libjpeg
        rc_l, cl, _ = _decode(case, fast=False)
        if rc_l != 0:
            continue  # fast tolerated what libjpeg rejects: acceptable
        for a, b in zip(cl, cf):
            assert np.array_equal(a, b)


def test_corrupt_streams_decline_or_match():
    """Truncation / bitflips must never let the fast path return rc=0 with
    output different from libjpeg: either both agree, or fast declines."""
    buf = _synth(64, 48, 2, 85, seed=3)
    rng = np.random.default_rng(0)
    cases = [buf[: len(buf) // 2],                       # truncated scan
             buf[:-2],                                   # missing EOI
             buf.replace(b"\xff\xda", b"\xff\xd9", 1)]   # EOI before SOS
    for _ in range(20):                                  # random bitflips
        b = bytearray(buf)
        i = int(rng.integers(2, len(b)))
        b[i] ^= int(1 << rng.integers(0, 8))
        cases.append(bytes(b))
    for case in cases:
        if _info_of(case) is None:
            continue  # header no longer parses: libjpeg rejects it too
        rc_f, cf, _ = _decode(case, fast=True)
        if rc_f != 0:
            continue  # declined -> caller falls back to libjpeg
        rc_l, cl, _ = _decode(case, fast=False)
        if rc_l != 0:
            continue  # fast tolerated what libjpeg rejects: acceptable
        for a, b in zip(cl, cf):
            assert np.array_equal(a, b)


@pytest.mark.parametrize("dst", [(256, 256), (640, 160)])
def test_decode_entropy_window_mode_identity(monkeypatch, dst):
    """Fit-crop pipelines decode through lp_jpeg_decode_coefs_win directly
    into the batch window slice; output must be byte-identical to the
    libjpeg scratch-then-crop path — including the luma MCU pad row the
    window may cover (the 1080p fixture has 135 luma block rows, odd, so
    yr.stop = 136 exercises the zero-fill)."""
    from bench import _ensure_fixture
    from lilliput_tpu.pipeline import JpegTranscodePipeline
    buf = _ensure_fixture()
    pipe = JpegTranscodePipeline(buf, *dst, quality=85)
    assert pipe._window is not None, "fixture/dst must trigger window mode"
    fast = pipe.decode_entropy([buf] * 2)
    monkeypatch.setenv("LILLIPUT_JPEG_HUFF", "libjpeg")
    slow = pipe.decode_entropy([buf] * 2)
    for a, b in zip(fast, slow):
        assert np.array_equal(a, b)


def test_decode_entropy_pool_reuse_identity():
    """pool=True must return the same values as fresh arrays, across the
    2-slot rotation (3 calls exercise a reused slot)."""
    from lilliput_tpu.pipeline import JpegTranscodePipeline
    buf = open("/root/reference/data/sunrise.jpg", "rb").read()
    pipe = JpegTranscodePipeline(buf, 32, 24, quality=85)
    ref = [np.copy(a) for a in pipe.decode_entropy([buf] * 3)]
    for _ in range(3):
        got = pipe.decode_entropy([buf] * 3, pool=True)
        for a, b in zip(ref, got):
            assert np.array_equal(a, b)


def test_decode_entropy_env_escape_hatch(monkeypatch):
    """LILLIPUT_JPEG_HUFF=libjpeg must force the old path and produce the
    same batch arrays as the default fast path."""
    from lilliput_tpu.pipeline import JpegTranscodePipeline
    buf = open("/root/reference/data/sunrise.jpg", "rb").read()
    pipe = JpegTranscodePipeline(buf, 32, 24, quality=85)
    fast = pipe.decode_entropy([buf] * 2)
    monkeypatch.setenv("LILLIPUT_JPEG_HUFF", "libjpeg")
    slow = pipe.decode_entropy([buf] * 2)
    for a, b in zip(fast, slow):
        assert np.array_equal(a, b)


def _strip_dqt(buf: bytes) -> bytes:
    """Remove every DQT segment from a JPEG's header walk."""
    out = bytearray(buf[:2])
    i = 2
    n = len(buf)
    while i + 4 <= n:
        m = buf[i + 1]
        if buf[i] != 0xFF:
            break
        if m == 0xDA:  # SOS: copy the rest verbatim
            out += buf[i:]
            return bytes(out)
        if m == 0x01 or 0xD0 <= m <= 0xD8:
            out += buf[i:i + 2]
            i += 2
            continue
        ln = int.from_bytes(buf[i + 2:i + 4], "big")
        if m != 0xDB:
            out += buf[i:i + 2 + ln]
        i += 2 + ln
    return bytes(out)


def test_missing_dqt_declines_like_libjpeg():
    """A JPEG whose DQT was stripped must DECLINE in the fast decoder —
    libjpeg hard-errors with JERR_NO_QUANT_TABLE; decoding with all-zero
    qtables would silently emit a flat image (review finding, verified
    fast rc=0 + zero qtables before the fix)."""
    buf = _strip_dqt(open("/root/reference/data/coast.jpg", "rb").read())
    rc_f, _, qf = _decode(buf, fast=True)
    rc_l, _, _ = _decode(buf, fast=False)
    assert rc_l != 0, "libjpeg must reject the DQT-less stream"
    assert rc_f != 0, "fast decoder must decline, not decode with 0-tables"


def test_oversized_mcu_declines_like_libjpeg():
    """T.81 B.2.3 / libjpeg D_MAX_BLOCKS_IN_MCU: >10 data units per
    interleaved MCU (e.g. three 2x2-sampled components = 12) is a hard
    libjpeg error; the fast decoder must decline it, not decode."""
    import io

    from PIL import Image
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (32, 32, 3), np.uint8)
    bio = io.BytesIO()
    Image.fromarray(img).save(bio, format="JPEG", quality=90,
                              subsampling=2)  # 4:2:0 baseline
    buf = bytearray(bio.getvalue())
    # patch SOF0 sampling factors: all three components 2x2 (12 blocks)
    i = bytes(buf).find(b"\xff\xc0")
    assert i > 0
    ncomp = buf[i + 9]
    assert ncomp == 3
    for c in range(3):
        buf[i + 11 + 3 * c] = 0x22
    rc_l, _, _ = _decode(bytes(buf), fast=False)
    rc_f, _, _ = _decode(bytes(buf), fast=True)
    assert rc_l != 0, "libjpeg must reject 12 blocks/MCU"
    assert rc_f != 0, "fast decoder must decline 12 blocks/MCU"
