"""PNG codec tests: bit-exact decode vs cv2/libpng, round-trip encode,
APNG detection, ContentLength, interlace."""
import glob
import os
import struct
import zlib

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from lilliput_tpu import binding  # noqa: E402

if not binding.available():
    pytest.skip("native host library unavailable", allow_module_level=True)

from lilliput_tpu.codecs.png import (PngDecoder, PngEncoder, is_apng,  # noqa: E402
                                     png_content_length)
from lilliput_tpu.framebuffer import PNG_COMPRESSION, Framebuffer  # noqa: E402

FIXTURES = sorted(glob.glob("/root/reference/data/*.png")) + [
    "/root/reference/testdata/ferry_sunset.png"]


def _ref(path):
    r = cv2.imread(path, cv2.IMREAD_UNCHANGED | cv2.IMREAD_IGNORE_ORIENTATION)
    if r.ndim == 2:
        r = r[:, :, None]
    if r.dtype == np.uint16:
        r = (r >> 8).astype(np.uint8)
    if r.shape[2] == 2:  # gray+alpha -> BGRA like ours
        r = np.stack([r[:, :, 0]] * 3 + [r[:, :, 1]], axis=-1)
    return r


@pytest.mark.parametrize("path", FIXTURES, ids=os.path.basename)
def test_decode_bit_exact(path):
    buf = open(path, "rb").read()
    d = PngDecoder(buf)
    fb = Framebuffer()
    d.decode_to(fb)
    ref = _ref(path)
    assert fb.to_numpy().shape == ref.shape
    assert np.array_equal(fb.to_numpy(), ref)


@pytest.mark.parametrize("path", FIXTURES[:3], ids=os.path.basename)
def test_roundtrip_lossless(path):
    buf = open(path, "rb").read()
    d = PngDecoder(buf)
    fb = Framebuffer()
    d.decode_to(fb)
    for level in (1, 6, 9):
        out = PngEncoder(d).encode(fb, {PNG_COMPRESSION: level})
        back = cv2.imdecode(np.frombuffer(out, np.uint8), cv2.IMREAD_UNCHANGED)
        if back.ndim == 2:
            back = back[:, :, None]
        assert np.array_equal(back, fb.to_numpy())


def _synth_png(img: np.ndarray, interlace=0) -> bytes:
    """Minimal PNG writer for synthetic tests (color type 2, 8-bit)."""
    h, w, _ = img.shape
    raw = b""
    for y in range(h):
        raw += b"\x00" + img[y].tobytes()
    def chunk(t, d):
        b = t + d
        return struct.pack(">I", len(d)) + b + struct.pack(">I", zlib.crc32(b) & 0xFFFFFFFF)
    return (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, interlace))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


def test_interlaced_decode():
    img = np.random.default_rng(5).integers(0, 256, (13, 9, 3), np.uint8)
    ok, buf = cv2.imencode(".png", img[:, :, ::-1])
    plain = PngDecoder(buf.tobytes())
    fb = Framebuffer()
    plain.decode_to(fb)
    assert np.array_equal(fb.to_numpy(), img[:, :, ::-1][:, :, ::-1][:, :, ::-1])
    # Adam7 via PIL if available
    PIL = pytest.importorskip("PIL.Image")
    import io
    im = PIL.fromarray(img)
    bio = io.BytesIO()
    im.save(bio, format="PNG", interlace=True)
    d = PngDecoder(bio.getvalue())
    fb2 = Framebuffer()
    d.decode_to(fb2)
    assert np.array_equal(fb2.to_numpy(), img[:, :, ::-1])  # RGB->BGR


def test_apng_detection_synthetic():
    img = np.zeros((4, 4, 3), np.uint8)
    buf = _synth_png(img)
    assert not is_apng(buf)
    # inject acTL before IDAT
    def chunk(t, d):
        b = t + d
        return struct.pack(">I", len(d)) + b + struct.pack(">I", zlib.crc32(b) & 0xFFFFFFFF)
    head_end = 8 + 8 + 13 + 4
    actl = chunk(b"acTL", struct.pack(">II", 2, 0))
    buf2 = buf[:head_end] + actl + buf[head_end:]
    assert is_apng(buf2)


def test_content_length_truncates():
    img = np.zeros((4, 4, 3), np.uint8)
    buf = _synth_png(img)
    assert png_content_length(buf + b"trailing-acropalypse-bytes") == len(buf)


def test_apng_animated_decode_and_transform():
    """Full APNG animation decode (exceeds the reference, which only
    detects APNG): frames, durations, loop count, and transform to WebP."""
    import io

    from PIL import Image

    from lilliput_tpu import ImageOps, ImageOptions, ResizeMethod, new_decoder
    frames = [Image.fromarray(
        np.full((20, 30, 4), (i * 60, 10 + i * 50, 200 - i * 40, 255), np.uint8),
        "RGBA") for i in range(4)]
    bio = io.BytesIO()
    frames[0].save(bio, format="PNG", save_all=True, append_images=frames[1:],
                   duration=50, loop=3, default_image=False)
    buf = bio.getvalue()
    d = new_decoder(buf)
    h = d.header()
    assert h.num_frames == 4 and d.loop_count() == 3
    fb = Framebuffer()
    d.decode_to(fb)
    assert fb.duration == pytest.approx(0.05)
    out = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".webp", resize_method=ResizeMethod.NO_RESIZE,
        encode_timeout=600.0))
    im = Image.open(io.BytesIO(out))
    assert getattr(im, "n_frames", 1) == 4
    im.seek(2)
    px = np.array(im.convert("RGBA"))[0, 0]
    assert np.abs(px.astype(int) - np.array([120, 110, 120, 255])).max() <= 2
