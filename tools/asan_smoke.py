#!/usr/bin/env python3
"""Memory-safety smoke over the native host library (valgrind-gate analog,
reference ci.yaml:45-115): exercises GIF decode/encode, PNG unfilter/filter,
JPEG coefficient decode/encode round trips so an ASan build surfaces leaks
and overflows. Run with the library built under -fsanitize=address and
LD_PRELOAD=libasan.so (see .github/workflows/ci.yaml).
"""
import ctypes
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np  # noqa: E402

from lilliput_tpu import binding  # noqa: E402
from lilliput_tpu.codecs import gif as G  # noqa: E402  (registers sigs)
from lilliput_tpu.codecs import jpeg as J  # noqa: E402
from lilliput_tpu.codecs import png as P  # noqa: E402

TD = "/root/reference/testdata"
DATA = "/root/reference/data"


def gif_roundtrip(lib):
    buf = np.frombuffer(open(f"{TD}/party-discord.gif", "rb").read(), np.uint8)
    info = np.zeros(6, np.int32)
    h = lib.lp_gif_open(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        buf.size, info.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    assert h
    meta = np.zeros(10, np.int32)
    frames = 0
    while lib.lp_gif_next_frame(h, meta.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))) == 1:
        idx = np.empty(int(meta[2]) * int(meta[3]), np.uint8)
        assert lib.lp_gif_frame_indices(
            h, idx.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))) == 0
        frames += 1
    assert frames == 16, frames
    lib.lp_gif_free(h)
    # scan-then-parallel raster decode (thread + heap safety of
    # lp_gif_scan / lp_gif_decode_scanned, incl. concurrent const access)
    h2 = lib.lp_gif_open(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                         buf.size,
                         info.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    assert h2
    nf = lib.lp_gif_scan(h2)
    assert nf == 16, nf
    from concurrent.futures import ThreadPoolExecutor

    def dec_one(i):
        meta2 = np.zeros(10, np.int32)
        assert lib.lp_gif_scanned_meta(
            h2, i, meta2.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))) == 0
        raw = np.empty(int(meta2[2]) * int(meta2[3]), np.uint8)
        return lib.lp_gif_decode_scanned(
            h2, i, raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    with ThreadPoolExecutor(4) as ex:
        assert all(rc == 0 for rc in ex.map(dec_one, range(nf)))
    lib.lp_gif_free(h2)
    # hostile scans: truncations must not crash
    for cut in (len(buf) // 4, len(buf) // 2, len(buf) - 3):
        tb = np.frombuffer(bytes(buf[:cut]), np.uint8)
        h3 = lib.lp_gif_open(
            tb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), tb.size,
            info.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if not h3:
            continue
        n3 = lib.lp_gif_scan(h3)
        for i in range(max(n3, 0)):
            meta3 = np.zeros(10, np.int32)
            if lib.lp_gif_scanned_meta(
                    h3, i,
                    meta3.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))) != 0:
                continue
            raw = np.empty(max(int(meta3[2]) * int(meta3[3]), 1), np.uint8)
            lib.lp_gif_decode_scanned(
                h3, i, raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        lib.lp_gif_free(h3)
    out7 = np.zeros(7, np.int32)
    lib.lp_gif_anim_info(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                         buf.size, out7.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    assert out7[1] == 16
    # hostile large-mcs root codes: min-code-size 9-11 makes the clear
    # code up to 2048 and a stream can emit 'root' codes >= 256 — the
    # decoder's root table must cover them (giflib truncates to the low
    # byte; a 256-entry table read OOB here, ASan-confirmed + fixed)
    import struct
    for mcs in (9, 10, 11):
        clear = 1 << mcs
        codes = [clear] + [300] * 16 + [clear + 1]
        acc = nb = 0
        data = bytearray()
        for c in codes:
            acc |= c << nb
            nb += mcs + 1
            while nb >= 8:
                data.append(acc & 0xFF)
                acc >>= 8
                nb -= 8
        if nb:
            data.append(acc & 0xFF)
        g = bytearray()
        g += b"GIF89a" + struct.pack("<HH", 4, 4) + bytes([0xF0, 0, 0])
        g += bytes(6)
        g += b"," + struct.pack("<HHHH", 0, 0, 4, 4) + bytes([0])
        g += bytes([mcs, len(data)]) + bytes(data) + b"\x00;"
        gb = np.frombuffer(bytes(g), np.uint8)
        h4 = lib.lp_gif_open(
            gb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), gb.size,
            info.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        if h4:
            meta4 = np.zeros(10, np.int32)
            if lib.lp_gif_next_frame(
                    h4, meta4.ctypes.data_as(
                        ctypes.POINTER(ctypes.c_int32))) == 1:
                raw = np.empty(max(int(meta4[2]) * int(meta4[3]), 1),
                               np.uint8)
                lib.lp_gif_frame_indices(
                    h4, raw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
            lib.lp_gif_free(h4)


def png_filter_roundtrip(lib):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (64, 64 * 4), dtype=np.uint8)
    filtered = np.empty(64 * (64 * 4 + 1), np.uint8)
    lib.lp_png_filter(img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      filtered.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      64, 64 * 4, 4)
    back = np.empty(64 * 64 * 4, np.uint8)
    assert lib.lp_png_unfilter(
        filtered.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        back.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), 64, 64 * 4, 4) == 0
    assert np.array_equal(back.reshape(64, 64 * 4), img)


def jpeg_roundtrip(lib):
    buf = open(f"{DATA}/coast.jpg", "rb").read()
    d = J.JpegDecoder(buf)
    d._decode_coefs_cached()
    assert d._coefs[0].size > 0


def jpeg_restart_parallel(lib):
    """Threaded slice decode of a restart-marked scan (heap + thread safety
    of lp_jpeg_decode_coefs_parallel; coefficients must match the serial
    path byte for byte). Fixture via cv2 — jit-compiled paths crash ASan
    inside jaxlib's own nanobind interceptors, so no jax calls here."""
    import cv2
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (133, 91, 3), np.uint8)
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_RST_INTERVAL, 1])
    assert ok
    rst = enc.tobytes()
    serial = J.JpegDecoder(rst)
    serial._decode_coefs_cached()
    os.environ["LILLIPUT_JPEG_INTRA_WORKERS"] = "4"
    try:
        par = J.JpegDecoder(rst)
        par._decode_coefs_cached()
    finally:
        del os.environ["LILLIPUT_JPEG_INTRA_WORKERS"]
    for a, b in zip(serial._coefs, par._coefs):
        assert np.array_equal(a, b)


def jpeg_fast_hostile(lib):
    """Hostile bitstreams straight into lp_jpeg_decode_coefs_fast /
    _win (untrusted-input memory safety for jpeg_huff.cpp): truncations,
    random bitflips, marker soup. Arrays are sized from lp_jpeg_get_info
    of the SAME buffer — the real caller's contract — so any OOB write is
    the decoder's bug, not the harness's. Return codes are unchecked (a
    nonzero path just falls back); only memory safety is under test."""
    import cv2
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (60, 44, 3), np.uint8)
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_RST_INTERVAL, 1])
    assert ok
    base = enc.tobytes()
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_PROGRESSIVE, 1,
                                         cv2.IMWRITE_JPEG_RST_INTERVAL, 1])
    assert ok
    prog = enc.tobytes()  # multi-scan state machine under the same abuse
    i16p = ctypes.POINTER(ctypes.c_int16)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    cases = [base, base[: len(base) // 2], base[:-2], base[:24],
             prog, prog[: len(prog) // 2], prog[:-2]]
    for _ in range(60):
        m = bytearray(base)
        for _ in range(3):
            m[int(rng.integers(2, len(m)))] = int(rng.integers(0, 256))
        cases.append(bytes(m))
    for _ in range(60):
        m = bytearray(prog)
        for _ in range(3):
            m[int(rng.integers(2, len(m)))] = int(rng.integers(0, 256))
        cases.append(bytes(m))
    for case in cases:
        arr = np.frombuffer(case, np.uint8)
        info = J._JpegInfo()
        if lib.lp_jpeg_get_info(arr.ctypes.data_as(u8p), arr.size,
                                ctypes.byref(info)) != 0:
            continue
        nc = max(1, min(int(info.num_components), 4))
        comps = [np.zeros((info.comp_blocks_h[c], info.comp_blocks_w[c], 64),
                          np.int16) for c in range(nc)]
        q = np.zeros((4, 64), np.uint16)
        ptrs = (i16p * nc)(*[c.ctypes.data_as(i16p) for c in comps])
        lib.lp_jpeg_decode_coefs_fast(arr.ctypes.data_as(u8p), arr.size,
                                      ptrs, q.ctypes.data_as(u16p), 2)
        # windowed variant over a sub-window of the same arrays
        win = np.zeros((4, 4), np.int32)
        wc = [np.zeros((2, 2, 64), np.int16) for _ in range(nc)]
        for c in range(nc):
            win[c] = (0, 0, 2, 2)
        wptrs = (i16p * nc)(*[c.ctypes.data_as(i16p) for c in wc])
        if all(info.comp_blocks_w[c] >= 2 for c in range(nc)):
            lib.lp_jpeg_decode_coefs_win(
                arr.ctypes.data_as(u8p), arr.size, wptrs,
                q.ctypes.data_as(u16p), 1,
                win.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))


def jp2_t1_exercise(lib):
    """EBCOT Tier-1 over real + hostile inputs (untrusted-codestream
    memory safety for native/src/jp2_t1.cpp)."""
    import io

    from PIL import Image

    from lilliput_tpu.codecs import jp2 as JP2  # registers the signature
    from lilliput_tpu.codecs import jp2_t1 as T1
    from lilliput_tpu.errors import LilliputError
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (96, 80, 3), np.uint8)
    bio = io.BytesIO()
    Image.fromarray(img).save(bio, format="JPEG2000")
    b = bio.getvalue()
    im = JP2.Jp2Image(b)
    planes = im.decode()
    assert planes[0].shape == (96, 80)
    # hostile MQ streams straight into the C++ decoder: random bytes,
    # all-0xFF (marker-stall path), empty, and wrong pass counts
    assert T1._native() is not None, "C++ T1 must be exercised under ASan"
    for data, np_ in ((rng.bytes(200), 60), (b"\xff" * 64, 30),
                      (b"", 10), (rng.bytes(3), 100)):
        T1.decode_codeblock(data, 64, 64, 2, 0, np_, 30)
    # mutated codestreams end-to-end (typed errors, no native crashes)
    for _ in range(40):
        m = bytearray(b)
        for _ in range(4):
            m[rng.integers(0, len(m))] = rng.integers(0, 256)
        try:
            JP2.Jp2Image(bytes(m)).decode()
        except (LilliputError, EOFError):
            pass


def jp2_t1_encode_exercise(lib):
    """Tier-1 ENCODER paths (lp_jp2_t1_encode): every coding style,
    degenerate geometries, and segment-aware decode of the output —
    memory safety for the round-4 encode half."""
    from lilliput_tpu.codecs import jp2_t1 as T1
    rng = np.random.default_rng(1)
    for style in (0x00, 0x01, 0x04, 0x08, 0x05, 0x2F):
        for (h, w, amp) in ((64, 64, 30000), (1, 1, 1), (3, 64, 255),
                            (17, 5, 7)):
            coefs = rng.integers(-amp, amp + 1, (h, w)).astype(np.int32)
            mb = max(int(np.abs(coefs).max()).bit_length(), 1) + 2
            segs, np_, zp = T1.encode_codeblock(coefs, 2, mb, style)
            data = b"".join(s for s, _ in segs)
            meta = [(len(s), p) for s, p in segs]
            out = T1.decode_codeblock(data, w, h, 2, zp, np_, mb,
                                      style, meta)
            rec = np.sign(out) * (np.abs(out) >> 1)
            assert np.array_equal(rec, coefs)
    # hostile segment metadata straight into the C++ decoder
    blob = rng.bytes(256)
    for meta in ([(300, 5)], [(10, 0), (10, 200)], [(0, 1)] * 64,
                 [(256, 1), (1, 1)]):
        try:
            T1.decode_codeblock(blob, 32, 32, 1, 0,
                                sum(p for _, p in meta), 20, 0x05, meta)
        except Exception:
            pass


def av1_encode_exercise(lib):
    """lp_av1_encode (round-4 AVIF encode): every format, degenerate
    sizes, undersized output caps, and multi-frame — memory safety for
    the aom driver."""
    from lilliput_tpu.codecs import avif_enc
    if not avif_enc.available():
        return
    rng = np.random.default_rng(2)
    for (h, w, fmt) in ((16, 16, 0), (1, 1, 2), (17, 13, 1),
                        (8, 8, 3)):
        cw = (w + 1) // 2 if fmt == 0 else w
        ch = (h + 1) // 2 if fmt == 0 else h
        n = h * w + (0 if fmt == 2 else 2 * cw * ch)
        planes = rng.integers(0, 256, n, dtype=np.uint8)
        avif_enc._encode_frames(planes, w, h, fmt, 1, [1], 30, 8,
                                fmt == 3, 1)
    # undersized caps must fail cleanly, not overflow
    import ctypes as c
    u8p = c.POINTER(c.c_uint8)
    i64p = c.POINTER(c.c_int64)
    planes = rng.integers(0, 256, 64 * 64 * 3, dtype=np.uint8)
    out = np.empty(16, np.uint8)
    sizes = np.zeros(1, np.int64)
    durs = np.array([1], np.int64)
    rc = lib.lp_av1_encode(planes.ctypes.data_as(u8p), 64, 64, 1, 1,
                           30, durs.ctypes.data_as(i64p), 30, 8, 0, 1,
                           1, out.ctypes.data_as(u8p), out.size,
                           sizes.ctypes.data_as(i64p), 1)
    assert rc < 0
    # OBU split + muxer + PIL decode under ASan (jax-free: ASan's
    # __cxa_throw interceptor trips on jaxlib's own C++ exceptions, so
    # the smoke feeds the shim pre-made planes instead of bgr_to_yuv)
    import io

    from PIL import Image
    h = w = 24
    y = rng.integers(0, 256, h * w, dtype=np.uint8)
    uv = rng.integers(0, 256, 2 * ((h + 1) // 2) * ((w + 1) // 2),
                      dtype=np.uint8)
    pkts = avif_enc._encode_frames(np.concatenate([y, uv]), w, h, 0, 1,
                                   [1], 30, 8, False, 1)
    seq, sample = avif_enc._split_obus(b"".join(pkts))
    b = avif_enc.mux_still(w, h, 0, sample,
                           avif_enc._build_av1c(seq, 0))
    assert Image.open(io.BytesIO(b)).size == (w, h)
    # high-bit-depth surface (round-5 fixture generator): 10/12-bit
    # planes across formats incl. 4:2:2 (fmt 4) + invalid depth/fmt
    for (depth, fmt, hh, ww) in ((10, 0, 17, 13), (12, 4, 8, 9),
                                 (10, 2, 1, 1), (12, 1, 5, 5)):
        cw = (ww + 1) // 2 if fmt in (0, 4) else ww
        chh = (hh + 1) // 2 if fmt == 0 else hh
        n = hh * ww + (0 if fmt == 2 else 2 * cw * chh)
        p16 = rng.integers(0, 1 << depth, n,
                           dtype=np.uint16).view(np.uint8)
        out = np.empty(n * 8 + (1 << 20), np.uint8)
        sizes = np.zeros(16, np.int64)
        rc = lib.lp_av1_encode_hbd(
            p16.ctypes.data_as(u8p), ww, hh, fmt, depth, 1, 1, 1, 30,
            durs.ctypes.data_as(i64p), 0, 8, 1, 1, 1,
            out.ctypes.data_as(u8p), out.size,
            sizes.ctypes.data_as(i64p), 16)
        assert rc > 0, (depth, fmt, rc)
    for (depth, fmt) in ((9, 0), (10, 5), (16, 1)):  # must decline
        rc = lib.lp_av1_encode_hbd(
            planes.ctypes.data_as(u8p), 8, 8, fmt, depth, -1, -1, 1,
            30, durs.ctypes.data_as(i64p), 0, 8, 0, 1, 1,
            out.ctypes.data_as(u8p), out.size,
            sizes.ctypes.data_as(i64p), 16)
        assert rc < 0, (depth, fmt, rc)


def webp_yuv_exercise(lib):
    """WebP YUV fast-path entries (lp_webp_bgra_to_yuv oracle +
    lp_webp_encode_yuv), incl. odd geometries and the lossless-reject
    path — leak/overflow coverage for the round-4 still fast path."""
    import ctypes
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i32p = ctypes.POINTER(ctypes.c_int32)
    rng = np.random.default_rng(4)
    for (h, w, ch) in [(33, 47, 3), (1, 1, 3), (8, 8, 4), (5, 7, 4)]:
        px = np.ascontiguousarray(
            rng.integers(0, 256, (h, w, ch), np.uint8))
        y = np.empty(h * w, np.uint8)
        u = np.empty(((h + 1) // 2) * ((w + 1) // 2), np.uint8)
        v = np.empty_like(u)
        a = np.empty(h * w, np.uint8)
        assert lib.lp_webp_bgra_to_yuv(
            px.ctypes.data_as(u8p), w, h, ch, y.ctypes.data_as(u8p),
            u.ctypes.data_as(u8p), v.ctypes.data_as(u8p),
            a.ctypes.data_as(u8p)) == 0
        out = np.empty(w * h * 4 + (1 << 20), np.uint8)
        for q in (85, 101):  # 101 -> lossless: must reject (-3), no leak
            opts = np.array([64, q], np.int32)
            n = lib.lp_webp_encode_yuv(
                y.ctypes.data_as(u8p), u.ctypes.data_as(u8p),
                v.ctypes.data_as(u8p), None, w, h,
                opts.ctypes.data_as(i32p), opts.size, None, 0,
                out.ctypes.data_as(u8p), out.size)
            assert (n > 0) if q <= 100 else (n == -3), (q, n)



def yuv_bgr_exercise(lib):
    """lp_yuv_to_bgr (the libyuv-exact AVIF SDR conversion): every
    subsampling mode, odd dims, alpha, plus hostile zero/mismatched
    geometry (must return error codes, not read out of bounds)."""
    import ctypes
    u8p = ctypes.POINTER(ctypes.c_uint8)
    from lilliput_tpu.codecs.yuv_rgb import _yuv_to_bgr_native  # registers
    rng = np.random.default_rng(7)
    for (h, w) in ((16, 16), (17, 19), (1, 1)):
        chh, cwh = (h + 1) // 2, (w + 1) // 2
        y = rng.integers(0, 256, (h, w), np.uint8)
        a = rng.integers(0, 256, (h, w), np.uint8)
        for u, v in ((rng.integers(0, 256, (chh, cwh), np.uint8),
                      rng.integers(0, 256, (chh, cwh), np.uint8)),
                     (rng.integers(0, 256, (h, cwh), np.uint8),
                      rng.integers(0, 256, (h, cwh), np.uint8)),
                     (rng.integers(0, 256, (h, w), np.uint8),
                      rng.integers(0, 256, (h, w), np.uint8)),
                     (None, None)):
            for alpha in (None, a):
                for matrix in (0, 1, 6, 9):
                    if matrix == 0 and (
                            u is None or u.shape != (h, w)):
                        # identity needs full-res planes: the shim must
                        # REJECT subsampled chroma (rc=-3), not read OOB
                        if u is not None:
                            assert _yuv_to_bgr_native(
                                y, u, v, 0, True, h, w, alpha) is None
                        continue
                    out = _yuv_to_bgr_native(y, u, v, matrix, True, h, w,
                                             alpha)
                    assert out is not None
    # undersized chroma planes must DECLINE (rc -3), not walk rows past
    # the plane (the 4:4:4 case was an ASan-confirmed heap OOB read) —
    # call the raw entry with a deliberately wrong subsampling code
    yy7 = rng.integers(0, 256, (7, 1), np.uint8)
    uu7 = rng.integers(0, 256, (4, 1), np.uint8)
    out7 = np.empty((7, 1, 3), np.uint8)
    for sub in (0, 1):  # 4:4:4 / 4:2:2 claims with 4-row chroma, h=7
        assert lib.lp_yuv_to_bgr(
            yy7.ctypes.data_as(u8p), 1, uu7.ctypes.data_as(u8p),
            uu7.ctypes.data_as(u8p), 1, 1, 4, sub, 1, 7,
            128, 25, 52, 102, 18997, -1160, None, 0,
            out7.ctypes.data_as(u8p), 3) == -3
    # width-1 4:2:0 (cw == w == 1, ch < h): the sub=2 classification —
    # must convert, bit-identical to the numpy reference
    n7 = _yuv_to_bgr_native(yy7, uu7, uu7, 1, True, 7, 1, None)
    assert n7 is not None and n7.shape == (7, 1, 3)
    # hostile: invalid sizes / missing planes return error codes
    assert lib.lp_yuv_to_bgr(None, 0, None, None, 0, 0, 0, 0, 0, 0,
                             0, 0, 0, 0, 0, 0, None, 0, None, 3) == -1
    yy = np.zeros((4, 4), np.uint8)
    out = np.empty((4, 4, 4), np.uint8)
    assert lib.lp_yuv_to_bgr(
        yy.ctypes.data_as(u8p), 4, None, None, 0, 0, 0, 2, 4, 4,
        128, 25, 52, 102, 18997, -1160, None, 0,
        out.ctypes.data_as(u8p), 4) == -2


def av1_stream_exercise(lib):
    """lp_av_stream_* lifecycle: open/feed/flush/free on a real encoded
    stream plus hostile packets (garbage OBUs must error, not crash).
    jax-free: planes are fed to the aom shim pre-made (see
    av1_encode_exercise)."""
    from lilliput_tpu.codecs import av1_raw as AR
    from lilliput_tpu.codecs import avif_enc
    if not avif_enc.available() or not hasattr(lib, "lp_av_stream_open"):
        return
    rng = np.random.default_rng(8)
    h, w = 16, 24
    cw, ch = (w + 1) // 2, (h + 1) // 2
    fsz = h * w + 2 * cw * ch
    planes = rng.integers(0, 256, 3 * fsz, dtype=np.uint8)
    pkts = avif_enc._encode_frames(planes, w, h, 0, 3, [40, 40, 40],
                                   30, 8, False, 0)
    seq, first = avif_enc._split_obus(pkts[0])
    samples = [first] + [avif_enc._split_obus(p)[1] for p in pkts[1:]]
    buf = avif_enc.mux_animation(w, h, 0, samples, [40, 40, 40],
                                 avif_enc._build_av1c(seq, 0), 0)
    tracks = AR.parse_tracks(buf)
    assert tracks is not None
    dec = AR.Av1StreamDecoder(tracks[0].av1c)
    got = dec.decode_all(tracks[0].samples)
    assert len(got) == 3
    dec.close()
    dec.close()  # double close is a no-op
    # hostile packets into a fresh stream
    dec = AR.Av1StreamDecoder(tracks[0].av1c)
    for pkt in (b"\x00" * 16, b"\xff" * 64, b"\x12", b""):
        try:
            dec.feed(pkt or None)
        except RuntimeError:
            pass
    dec.close()


def main():
    lib = binding.load()
    gif_roundtrip(lib)
    png_filter_roundtrip(lib)
    jpeg_roundtrip(lib)
    jpeg_restart_parallel(lib)
    jpeg_fast_hostile(lib)
    jp2_t1_exercise(lib)
    jp2_t1_encode_exercise(lib)
    av1_encode_exercise(lib)
    webp_yuv_exercise(lib)
    yuv_bgr_exercise(lib)
    av1_stream_exercise(lib)
    print("asan smoke OK")


if __name__ == "__main__":
    main()
