"""BMP codec vs cv2 (OpenCV grfmt_bmp is the reference's fallthrough path)."""
import struct

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from lilliput_tpu import new_decoder, new_encoder  # noqa: E402
from lilliput_tpu.codecs.bmp import BmpDecoder  # noqa: E402
from lilliput_tpu.framebuffer import Framebuffer  # noqa: E402


def _decode(buf: bytes) -> np.ndarray:
    d = BmpDecoder(buf)
    fb = Framebuffer()
    d.decode_to(fb)
    return fb.to_numpy()


def _cv(buf: bytes) -> np.ndarray:
    out = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_UNCHANGED)
    return out[:, :, None] if out.ndim == 2 else out


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_decode_cv2_encoded(ch):
    rng = np.random.default_rng(ch)
    img = rng.integers(0, 256, (23, 17, ch), np.uint8).squeeze()
    ok, b = cv2.imencode(".bmp", img)
    got = _decode(b.tobytes())
    assert np.array_equal(got, _cv(b.tobytes()))


def test_decode_palette_color():
    from PIL import Image
    import io
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (19, 13, 3), np.uint8)
    pil = Image.fromarray(img).convert("P", palette=Image.ADAPTIVE, colors=64)
    bio = io.BytesIO()
    pil.save(bio, format="BMP")
    buf = bio.getvalue()
    assert np.array_equal(_decode(buf), _cv(buf))


def _bmp16(img_bgr: np.ndarray, fmt555: bool) -> bytes:
    h, w = img_bgr.shape[:2]
    b = img_bgr[:, :, 0].astype(np.uint16)
    g = img_bgr[:, :, 1].astype(np.uint16)
    r = img_bgr[:, :, 2].astype(np.uint16)
    if fmt555:
        v = ((r >> 3) << 10) | ((g >> 3) << 5) | (b >> 3)
        comp, masks = 0, b""
    else:
        v = ((r >> 3) << 11) | ((g >> 2) << 5) | (b >> 3)
        comp = 3
        masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    stride = ((w * 2) + 3) & ~3
    rows = np.zeros((h, stride), np.uint8)
    rows[:, :w * 2] = v.astype("<u2").view(np.uint8).reshape(h, w * 2)
    data = rows[::-1].tobytes()
    off = 14 + 40 + len(masks)
    hdr = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
           + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 16, comp, len(data),
                         0, 0, 0, 0))
    return hdr + masks + data


@pytest.mark.parametrize("fmt555", [True, False])
def test_decode_16bpp(fmt555):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (9, 11, 3), np.uint8)
    buf = _bmp16(img, fmt555)
    assert np.array_equal(_decode(buf), _cv(buf))


def test_decode_topdown():
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (6, 5, 3), np.uint8)
    ok, b = cv2.imencode(".bmp", img)
    b = bytearray(b.tobytes())
    # flip to top-down: negate height, reverse rows
    h = struct.unpack_from("<i", b, 22)[0]
    struct.pack_into("<i", b, 22, -h)
    off = struct.unpack_from("<I", b, 10)[0]
    stride = ((img.shape[1] * 3) + 3) & ~3
    rows = np.frombuffer(bytes(b[off:off + stride * h]), np.uint8).reshape(h, stride)
    b[off:off + stride * h] = rows[::-1].tobytes()
    buf = bytes(b)
    assert np.array_equal(_decode(buf), _cv(buf))


def test_decode_rle8():
    from PIL import Image
    import io
    rng = np.random.default_rng(11)
    # blocky image so RLE actually produces runs
    small = rng.integers(0, 8, (4, 4), np.uint8) * 30
    img = np.kron(small, np.ones((5, 7), np.uint8))
    pil = Image.fromarray(img, mode="L").convert("P")
    bio = io.BytesIO()
    pil.save(bio, format="BMP", compression=1)  # BI_RLE8 if supported
    buf = bio.getvalue()
    comp = struct.unpack_from("<I", buf, 30)[0]
    if comp != 1:  # PIL version didn't emit RLE; synthesize a tiny RLE8
        data = (b"\x05\x01" + b"\x00\x03\x02\x03\x04\x00" + b"\x00\x00"  # run+abs+EOL
                + b"\x08\x07" + b"\x00\x00"
                + b"\x00\x01")                                           # EOB
        pal = bytes(bytearray([i, i, i, 0] for i in range(0))) or b"".join(
            bytes([i * 25 % 256] * 3 + [0]) for i in range(256))
        off = 14 + 40 + len(pal)
        hdr = (b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
               + struct.pack("<IiiHHIIiiII", 40, 8, 2, 1, 8, 1, len(data),
                             0, 0, 256, 0))
        buf = hdr + pal + data
    assert np.array_equal(_decode(buf), _cv(buf))


@pytest.mark.parametrize("ch", [1, 3, 4])
def test_encode_roundtrip_cv2(ch):
    rng = np.random.default_rng(ch + 20)
    img = rng.integers(0, 256, (15, 14, ch), np.uint8)
    fb = Framebuffer(img.squeeze() if ch == 1 else img)
    out = new_encoder(".bmp").encode(fb, {})
    back = _cv(out)
    assert np.array_equal(back, img if ch > 1 else img)


def test_api_dispatch():
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (8, 9, 3), np.uint8)
    ok, b = cv2.imencode(".bmp", img)
    d = new_decoder(b.tobytes())
    assert d.description() == "BMP"
    hd = d.header()
    assert (hd.width, hd.height, hd.channels) == (9, 8, 3)
