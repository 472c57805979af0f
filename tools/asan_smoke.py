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
    out7 = np.zeros(7, np.int32)
    lib.lp_gif_anim_info(buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                         buf.size, out7.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    assert out7[1] == 16


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


def main():
    lib = binding.load()
    gif_roundtrip(lib)
    png_filter_roundtrip(lib)
    jpeg_roundtrip(lib)
    jpeg_restart_parallel(lib)
    jp2_t1_exercise(lib)
    print("asan smoke OK")


if __name__ == "__main__":
    main()
