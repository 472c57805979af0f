"""JPEG codec tests: decode fidelity vs libjpeg (through cv2), encode parity,
EXIF orientation, ICC, ContentLength (test taxonomy from SURVEY.md §4)."""
import glob
import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from lilliput_tpu import binding  # noqa: E402

if not binding.available():
    pytest.skip("native host library unavailable", allow_module_level=True)

from lilliput_tpu.codecs.jpeg import (JpegDecoder, JpegEncoder,  # noqa: E402
                                      exif_orientation, jpeg_content_length)
from lilliput_tpu.framebuffer import (JPEG_PROGRESSIVE, JPEG_QUALITY,  # noqa: E402
                                      Framebuffer)

DATA = "/root/reference/data"
FIXTURES = sorted(glob.glob(os.path.join(DATA, "*.jpg")))


def _psnr(a, b):
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255 ** 2 / max(mse, 1e-12))


@pytest.mark.parametrize("path", FIXTURES, ids=os.path.basename)
def test_decode_matches_libjpeg(path):
    buf = open(path, "rb").read()
    d = JpegDecoder(buf)
    fb = Framebuffer()
    d.decode_to(fb)
    mine = fb.to_numpy()
    flags = cv2.IMREAD_IGNORE_ORIENTATION | (
        cv2.IMREAD_GRAYSCALE if mine.shape[2] == 1 else cv2.IMREAD_COLOR)
    ref = cv2.imread(path, flags)
    if ref.ndim == 2:
        ref = ref[:, :, None]
    assert mine.shape == ref.shape
    # float IDCT + float fancy upsampling vs libjpeg's integer approximations;
    # chroma edges can differ by a few more counts on large images
    assert _psnr(mine, ref) >= 48.0
    assert np.abs(mine.astype(int) - ref.astype(int)).max() <= 16


def test_header_and_orientation():
    buf = open(os.path.join(DATA, "sunrise.jpg"), "rb").read()
    d = JpegDecoder(buf)
    h = d.header()
    assert (h.width, h.height) == (100, 75)
    assert int(h.orientation) == 6  # sunrise.jpg is rotated
    assert h.content_length == len(buf)
    assert not h.is_animated()


def test_encode_quality_size_parity_with_libjpeg():
    buf = open(os.path.join(DATA, "coast.jpg"), "rb").read()
    d = JpegDecoder(buf)
    fb = Framebuffer()
    d.decode_to(fb)
    mine = fb.to_numpy()
    out = JpegEncoder(d).encode(fb, {JPEG_QUALITY: 85})
    back = cv2.imdecode(np.frombuffer(out, np.uint8), cv2.IMREAD_COLOR)
    ok, cvout = cv2.imencode(".jpg", mine, [cv2.IMWRITE_JPEG_QUALITY, 85])
    cvback = cv2.imdecode(cvout, cv2.IMREAD_COLOR)
    # quality parity within 0.5 dB and size within 5%
    assert abs(_psnr(back, mine) - _psnr(cvback, mine)) < 0.5
    assert abs(len(out) - len(cvout)) / len(cvout) < 0.05


def test_progressive_output_decodable():
    buf = open(os.path.join(DATA, "sunrise.jpg"), "rb").read()
    d = JpegDecoder(buf)
    fb = Framebuffer()
    d.decode_to(fb)
    out = JpegEncoder(d).encode(fb, {JPEG_QUALITY: 80, JPEG_PROGRESSIVE: 1})
    back = cv2.imdecode(np.frombuffer(out, np.uint8), cv2.IMREAD_COLOR)
    assert back is not None and back.shape[:2] == (fb.height, fb.width)


def test_progressive_input_decodes():
    # make a progressive jpeg with cv2, decode with us
    img = np.random.default_rng(3).integers(0, 256, (64, 48, 3), np.uint8)
    ok, buf = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 90,
                                         cv2.IMWRITE_JPEG_PROGRESSIVE, 1])
    d = JpegDecoder(buf.tobytes())
    fb = Framebuffer()
    d.decode_to(fb)
    ref = cv2.imdecode(buf, cv2.IMREAD_COLOR)
    assert _psnr(fb.to_numpy(), ref) >= 48.0


def test_content_length_truncates_trailing_garbage():
    buf = open(os.path.join(DATA, "sunrise.jpg"), "rb").read()
    assert jpeg_content_length(buf + b"JUNKJUNK") == len(buf)


def test_exif_orientation_synthetic():
    # APP1 Exif with orientation tag 3, little-endian TIFF
    tiff = (b"II*\x00\x08\x00\x00\x00"
            b"\x01\x00"                      # 1 entry
            b"\x12\x01\x03\x00\x01\x00\x00\x00\x03\x00\x00\x00"
            b"\x00\x00\x00\x00")
    app1 = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + (len(app1) + 2).to_bytes(2, "big") + app1
    buf = b"\xff\xd8" + seg + b"\xff\xd9"
    assert int(exif_orientation(buf)) == 3


def test_second_decode_raises_eof():
    buf = open(os.path.join(DATA, "sunrise.jpg"), "rb").read()
    d = JpegDecoder(buf)
    fb = Framebuffer()
    d.decode_to(fb)
    with pytest.raises(EOFError):
        d.decode_to(fb)


def test_cmyk_adobe_decode():
    """4-component Adobe CMYK JPEGs decode to BGR (ROADMAP #13)."""
    import io

    from PIL import Image
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    img = cv2.resize(base, (64, 48), interpolation=cv2.INTER_CUBIC)
    bio = io.BytesIO()
    Image.fromarray(img, mode="CMYK").save(bio, format="JPEG", quality=95)
    buf = bio.getvalue()
    d = JpegDecoder(buf)
    assert d.header().channels == 3
    fb = Framebuffer()
    d.decode_to(fb)
    ref = np.asarray(Image.open(io.BytesIO(buf)).convert("RGB"))[:, :, ::-1]
    assert _psnr(fb.to_numpy(), ref) >= 50.0


def test_adobe_marker_version_high_byte():
    """libjpeg's examine_app14 matches only the 5 ASCII bytes 'Adobe'
    (12-byte payload); a DCTEncodeVersion word with a nonzero high byte
    (e.g. 0x0165) must still be detected — the old b'Adobe\\x00' compare
    read into the version word and missed it, decoding such CMYK files
    color-inverted."""
    import io

    from PIL import Image

    from lilliput_tpu.codecs.jpeg import has_adobe_marker
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (16, 16, 4), dtype=np.uint8)
    bio = io.BytesIO()
    Image.fromarray(img, mode="CMYK").save(bio, format="JPEG", quality=95)
    buf = bytearray(bio.getvalue())
    i = bytes(buf).find(b"Adobe")
    assert i > 0 and has_adobe_marker(bytes(buf))
    buf[i + 5] = 0x01  # DCTEncodeVersion high byte (was 0x00)
    assert has_adobe_marker(bytes(buf)), \
        "version word must not participate in the tag match"


@pytest.mark.parametrize("subsampling,name", [(0, "444"), (1, "422"), (2, "420")])
def test_subsampling_variants_decode(subsampling, name):
    import io

    from PIL import Image
    rng = np.random.default_rng(1)
    base = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
    img = cv2.resize(base, (56, 42), interpolation=cv2.INTER_CUBIC)
    bio = io.BytesIO()
    Image.fromarray(img).save(bio, format="JPEG", quality=92,
                              subsampling=subsampling)
    buf = bio.getvalue()
    d = JpegDecoder(buf)
    fb = Framebuffer()
    d.decode_to(fb)
    ref = cv2.imdecode(np.frombuffer(buf, np.uint8), cv2.IMREAD_COLOR)  # BGR
    assert _psnr(fb.to_numpy(), ref) >= 48.0


def test_optimize_coding_smaller_same_pixels():
    # JPEG_OPTIMIZE builds optimal Huffman tables: identical coefficients,
    # strictly valid output, usually smaller (jpeg_shim.cpp optimize arg)
    from lilliput_tpu.codecs.jpeg import JpegEncoder
    from lilliput_tpu.framebuffer import JPEG_OPTIMIZE, JPEG_QUALITY
    rng = np.random.default_rng(3)
    img = cv2.resize(rng.integers(0, 256, (12, 16, 3), dtype=np.uint8),
                     (160, 120), interpolation=cv2.INTER_CUBIC)
    fb = Framebuffer(img)
    plain = JpegEncoder().encode(fb, {JPEG_QUALITY: 85})
    opt = JpegEncoder().encode(fb, {JPEG_QUALITY: 85, JPEG_OPTIMIZE: 1})
    a = cv2.imdecode(np.frombuffer(plain, np.uint8), cv2.IMREAD_COLOR)
    b = cv2.imdecode(np.frombuffer(opt, np.uint8), cv2.IMREAD_COLOR)
    assert np.array_equal(a, b)  # same coefficients, different entropy coding
    assert len(opt) <= len(plain)


def test_rst_interval_encode_option():
    """JPEG_RST_INTERVAL emits DRI restart markers (reference exposes
    OpenCV's IMWRITE_JPEG_RST_INTERVAL through its open-coded int options,
    opencv.go:44-60)."""
    from lilliput_tpu.codecs.jpeg import JpegDecoder, JpegEncoder
    from lilliput_tpu.framebuffer import Framebuffer, JPEG_RST_INTERVAL
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (64, 96, 3), np.uint8)
    out = JpegEncoder().encode(Framebuffer(img), {JPEG_RST_INTERVAL: 1})
    d = JpegDecoder(out)
    assert d._info.restart_interval > 0
    # and the stream actually contains RST markers
    assert any(out[i] == 0xFF and 0xD0 <= out[i + 1] <= 0xD7
               for i in range(2, len(out) - 1))
    plain = JpegEncoder().encode(Framebuffer(img), {})
    assert JpegDecoder(plain)._info.restart_interval == 0


def test_restart_parallel_decode_matches_serial(monkeypatch):
    """Restart-marker-parallel Huffman decode (jpeg_shim.cpp
    lp_jpeg_decode_coefs_parallel) must produce coefficient arrays
    byte-identical to the serial libjpeg path."""
    from lilliput_tpu.codecs.jpeg import JpegDecoder, JpegEncoder
    from lilliput_tpu.framebuffer import Framebuffer, JPEG_RST_INTERVAL
    rng = np.random.default_rng(6)
    # odd dims: exercises partial trailing MCU row in the last slice
    img = rng.integers(0, 256, (133, 91, 3), np.uint8)
    buf = JpegEncoder().encode(Framebuffer(img), {JPEG_RST_INTERVAL: 1})

    d_serial = JpegDecoder(buf)
    d_serial._decode_coefs_cached()

    monkeypatch.setenv("LILLIPUT_JPEG_INTRA_WORKERS", "4")
    d_par = JpegDecoder(buf)
    d_par._decode_coefs_cached()

    assert len(d_serial._coefs) == len(d_par._coefs)
    for a, b in zip(d_serial._coefs, d_par._coefs):
        np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(d_serial._qtables, d_par._qtables)


def test_restart_parallel_falls_back_without_dri(monkeypatch):
    """Images without restart markers silently use the serial decoder."""
    from lilliput_tpu.codecs.jpeg import JpegDecoder
    monkeypatch.setenv("LILLIPUT_JPEG_INTRA_WORKERS", "4")
    buf = open("/root/reference/data/sunrise.jpg", "rb").read()
    d = JpegDecoder(buf)
    d._decode_coefs_cached()
    assert len(d._coefs) == 3


def _with_distinct_cr_table(buf: bytes) -> bytes:
    """Rewrite a baseline JPEG so Cr uses its OWN quant table (id 2, values
    = table 1 halved) — legal JPEG that libjpeg decodes per component."""
    data = bytearray(buf)
    # find the DQT holding table id 1 and copy it as id 2 with doubled values
    i = 2
    tbl1 = None
    insert_at = None
    sof_at = None
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            break
        marker = data[i + 1]
        if marker == 0xDA:
            break
        seglen = int.from_bytes(data[i + 2:i + 4], "big")
        if marker == 0xDB:
            # may hold several tables back to back
            j = i + 4
            end = i + 2 + seglen
            while j < end:
                prec_id = data[j]
                nvals = 64 * (2 if (prec_id >> 4) else 1)
                if (prec_id & 0x0F) == 1 and (prec_id >> 4) == 0:
                    tbl1 = bytes(data[j + 1:j + 1 + 64])
                j += 1 + nvals
            insert_at = i + 2 + seglen
        if marker == 0xC0:
            sof_at = i
        i += 2 + seglen
    assert tbl1 is not None and sof_at is not None
    # halved values keep the decoded Cr samples IN RANGE (a scaled-up
    # table would push samples out of [0,255], where libjpeg's per-stage
    # range-limiting diverges from our single final clip)
    halved = bytes(max(1, v // 2) for v in tbl1)
    dqt2 = b"\xff\xdb" + (67).to_bytes(2, "big") + b"\x02" + halved
    # SOF0: len(2) prec(1) h(2) w(2) ncomp(1) then (id, samp, Tq) per comp;
    # Cr is component index 2 -> its Tq byte
    ncomp = data[sof_at + 9]
    assert ncomp == 3
    tq_off = sof_at + 10 + 2 * 3 + 2  # third component's Tq byte
    assert data[tq_off] == 1
    sof_shift = len(dqt2) if insert_at <= sof_at else 0
    out = bytes(data[:insert_at]) + dqt2 + bytes(data[insert_at:])
    out = bytearray(out)
    out[tq_off + sof_shift] = 2
    return bytes(out)


def test_distinct_chroma_quant_tables_decode_per_component():
    """Cb and Cr with DIFFERENT quant tables (legal, rare): the decoder
    must dequantize each component with its own table like libjpeg; the
    batched serving pipeline rejects such sources with a typed error."""
    import io
    from PIL import Image
    from lilliput_tpu.codecs.jpeg import JpegDecoder
    from lilliput_tpu.errors import DecodingFailedError
    from lilliput_tpu.framebuffer import Framebuffer
    from lilliput_tpu.pipeline import JpegTranscodePipeline

    rng = np.random.default_rng(5)
    img = cv2.resize(rng.integers(0, 256, (10, 10, 3), np.uint8),
                     (96, 64), interpolation=cv2.INTER_CUBIC)
    ok, enc = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 85])
    buf = _with_distinct_cr_table(enc.tobytes())

    ref = np.asarray(Image.open(io.BytesIO(buf)).convert("RGB"))[..., ::-1]
    d = JpegDecoder(buf)
    fb = Framebuffer(4096)
    d.decode_to(fb)
    got = fb.to_numpy()[..., :3]
    # same per-component dequant as libjpeg; small IDCT/upsample rounding
    # differences are the usual decoder tolerance
    diff = np.abs(got.astype(int) - ref.astype(int))
    assert diff.max() <= 2 and (diff > 1).mean() < 0.05
    # sanity that the crafted file really exercises distinct tables: a
    # same-table decode (doubled table ignored) would be far off
    fb2 = Framebuffer(4096)
    d2 = JpegDecoder(buf)
    d2._info.comp_quant_tbl[2] = d2._info.comp_quant_tbl[1]
    d2.decode_to(fb2)
    wrong = fb2.to_numpy()[..., :3]
    assert np.abs(wrong.astype(int) - ref.astype(int)).max() > 10

    with pytest.raises(DecodingFailedError, match="quant tables"):
        JpegTranscodePipeline(buf, 32, 32)


def test_mixed_chroma_sampling_rejected():
    """Y=2x2, Cb=1x1, Cr=2x2 is legal JPEG (PIL decodes it) but the device
    decode derives ONE (h2, v2) pair from Cb — such files must raise, not
    silently upsample the full-res Cr plane (review-confirmed corruption)."""
    import ctypes
    from lilliput_tpu import binding
    from lilliput_tpu.codecs.jpeg import JpegDecoder
    from lilliput_tpu.codecs import jpeg as J
    from lilliput_tpu.errors import DecodingFailedError
    from lilliput_tpu.ops import jpeg_kernels as K
    import jax.numpy as jnp
    from lilliput_tpu.pipeline import JpegTranscodePipeline

    lib = binding.load()
    _i16 = ctypes.POINTER(ctypes.c_int16)
    qt = np.asarray(J.scaled_qtables(88)[0])
    rng = np.random.default_rng(8)
    w, h = 64, 32

    def quant(p):
        ph = (p.shape[0] + 7) // 8 * 8
        pw = (p.shape[1] + 7) // 8 * 8
        pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                    mode="edge")
        return np.asarray(K.fdct_quant(
            jnp.asarray(pp), jnp.asarray(qt))).astype(np.int16)

    yq = quant(rng.integers(0, 256, (h, w)).astype(np.float32))
    cbq = quant(rng.integers(0, 256, (h // 2, w // 2)).astype(np.float32))
    crq = quant(rng.integers(0, 256, (h, w)).astype(np.float32))
    hs = (ctypes.c_int32 * 3)(2, 1, 2)
    vs = (ctypes.c_int32 * 3)(2, 1, 2)
    ptrs = (_i16 * 3)(*[np.ascontiguousarray(a).ctypes.data_as(_i16)
                        for a in (yq, cbq, crq)])
    qp = ctypes.POINTER(ctypes.c_uint16)
    out = np.empty(1 << 20, np.uint8)
    n = lib.lp_jpeg_encode_coefs(
        w, h, 3, hs, vs, ptrs, qt.ctypes.data_as(qp), qt.ctypes.data_as(qp),
        0, 0, 0, None, 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size)
    assert n > 0
    buf = out[:n].tobytes()

    from lilliput_tpu.framebuffer import Framebuffer
    with pytest.raises(DecodingFailedError, match="subsampling"):
        JpegDecoder(buf).decode_to(Framebuffer(4096))
    with pytest.raises(DecodingFailedError, match="subsampling"):
        JpegTranscodePipeline(buf, 32, 32)


def test_exif_orientation_survives_fill_bytes():
    """0xFF fill bytes before the APP1 marker must not desync the EXIF
    walk (same T.81 padding tolerance as read_icc)."""
    from lilliput_tpu.codecs.jpeg import (exif_orientation,
                                          jpeg_content_length)
    tiff = (b"II*\x00\x08\x00\x00\x00"
            b"\x01\x00"
            b"\x12\x01\x03\x00\x01\x00\x00\x00\x06\x00\x00\x00"
            b"\x00\x00\x00\x00")
    app1 = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + (len(app1) + 2).to_bytes(2, "big") + app1
    buf = b"\xff\xd8" + b"\xff\xff\xff" + seg + b"\xff\xd9"
    assert int(exif_orientation(buf)) == 6
    assert jpeg_content_length(buf) == len(buf)


def test_rgb_colorspace_jpeg_decodes_without_ycc_matrix():
    """3-component JPEGs stored as RGB (Adobe APP14 transform=0 /
    JCS_RGB): libjpeg's null_convert path applies NO YCbCr matrix, and
    the reference decodes them correctly through OpenCV's libjpeg
    (opencv.cpp:93-102). Running them through the YCbCr kernel produced
    garbage colors (review finding); the serving pipeline, whose fused
    steps bake in the matrix, must reject them with a typed error."""
    import io
    from PIL import Image
    from lilliput_tpu.errors import DecodingFailedError
    from lilliput_tpu.pipeline import JpegTranscodePipeline

    rng = np.random.default_rng(11)
    src = cv2.resize(rng.integers(0, 256, (12, 12, 3), np.uint8),
                     (96, 64), interpolation=cv2.INTER_CUBIC)
    b = io.BytesIO()
    Image.fromarray(src[..., ::-1]).save(
        b, "JPEG", keep_rgb=True, quality=95, subsampling=0)
    buf = b.getvalue()
    d = JpegDecoder(buf)
    assert d._info.jpeg_color_space == 2  # fixture really is JCS_RGB
    fb = Framebuffer()
    d.decode_to(fb)
    got = fb.to_numpy()[..., :3]
    ref = np.asarray(Image.open(io.BytesIO(buf)))[..., ::-1]  # BGR
    # per-plane IDCT only: float-vs-integer IDCT rounding is the only delta
    assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1

    with pytest.raises(DecodingFailedError, match="JCS_RGB"):
        JpegTranscodePipeline(buf, 32, 32)
