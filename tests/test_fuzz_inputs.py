"""Untrusted-input robustness: truncated/corrupted buffers must raise typed
errors (or decode successfully), never crash or hang — the reference's
pervasive hardening stance (SURVEY.md §5: dimension guards, CVE-2026-26740,
acropalypse truncation, caps)."""
import numpy as np
import pytest

from lilliput_tpu import new_decoder
from lilliput_tpu.errors import LilliputError
from lilliput_tpu.framebuffer import Framebuffer

FIXTURES = [
    "/root/reference/data/sunrise.jpg",
    "/root/reference/data/firefox.png",
    "/root/reference/testdata/party-discord.gif",
    "/root/reference/testdata/tears_of_steel_icc.webp",
    # round 5: AVIF decodes first-party by default (own ISOBMFF walk +
    # dav1d shim) — the item/track offsets parsed from hostile bytes
    # feed a C ABI, so the fuzz gate must cover still, animated
    # (stateful stream decoder) and HDR (tone-map path) inputs, plus
    # the video probe's in-memory ISOBMFF walk.
    "/root/reference/testdata/colors_sdr_srgb.avif",
    "/root/reference/testdata/colors-animated-8bpc-alpha-exif-xmp.avif",
    "/root/reference/testdata/hdr_color_preservation.avif",
    "/root/reference/testdata/big_buck_bunny_480p_10s_std.mp4",
]

OK_ERRORS = (LilliputError, EOFError, ValueError)


def _poke(buf: bytes) -> None:
    """Header parse + first-frame decode must either work or raise cleanly."""
    try:
        d = new_decoder(buf)
        d.header()
        fb = Framebuffer()
        d.decode_to(fb)
    except OK_ERRORS:
        return


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.rsplit("/", 1)[1])
def test_truncations_do_not_crash(path):
    buf = open(path, "rb").read()
    n = len(buf)
    for cut in (8, 16, 64, n // 4, n // 2, n - 1):
        _poke(buf[:cut])


@pytest.mark.parametrize("path", FIXTURES, ids=lambda p: p.rsplit("/", 1)[1])
def test_byte_corruption_does_not_crash(path):
    rng = np.random.default_rng(0)
    buf = bytearray(open(path, "rb").read())
    for _ in range(12):
        b = bytearray(buf)
        for _ in range(8):
            b[int(rng.integers(2, len(b)))] = int(rng.integers(0, 256))
        _poke(bytes(b))


def test_pnm_bmp_fuzz():
    from lilliput_tpu.codecs.bmp import BmpEncoder
    from lilliput_tpu.codecs.pnm import PnmEncoder
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (16, 16, 3), np.uint8)
    for enc in (PnmEncoder(), BmpEncoder()):
        buf = enc.encode(Framebuffer(img), {})
        for cut in (3, 10, len(buf) // 2, len(buf) - 1):
            _poke(buf[:cut])
        for _ in range(8):
            b = bytearray(buf)
            for _ in range(6):
                b[int(rng.integers(2, len(b)))] = int(rng.integers(0, 256))
            _poke(bytes(b))


def test_gif_large_mcs_root_codes():
    """LZW min-code-size 9-11 makes the clear code up to 2048, so a
    hostile stream can emit 'root' codes >= 256. giflib writes those
    into a GifPixelType (low-byte truncation); the own decoder's root
    table must be sized for them (regression: a 256-entry identity
    table was read out of bounds — ASan-confirmed)."""
    import struct

    def lzw(codes, bits):
        out = bytearray()
        acc = nb = 0
        for c in codes:
            acc |= c << nb
            nb += bits
            while nb >= 8:
                out.append(acc & 0xFF)
                acc >>= 8
                nb -= 8
        if nb:
            out.append(acc & 0xFF)
        return bytes(out)

    for mcs in (9, 10, 11):
        clear = 1 << mcs
        # enough repeated >=256 root codes to cover the 4x4 raster
        data = lzw([clear] + [300] * 16 + [clear + 1], mcs + 1)
        g = bytearray()
        g += b"GIF89a" + struct.pack("<HH", 4, 4) + bytes([0xF0, 0, 0])
        g += bytes(6)
        g += b"," + struct.pack("<HHHH", 0, 0, 4, 4) + bytes([0])
        g += bytes([mcs, len(data)]) + data + b"\x00;"
        _poke(bytes(g))


def test_giant_dims_rejected():
    """Synthetic headers claiming absurd dimensions must be rejected before
    any allocation explosion (GIF guard parity, giflib.go:39-52)."""
    # PNM claiming 2^30 x 2^30
    _poke(b"P6\n1073741824 1073741824\n255\n\x00")
    # BMP claiming huge dims
    import struct
    hdr = (b"BM" + struct.pack("<IHHI", 62, 0, 0, 54)
           + struct.pack("<IiiHHIIiiII", 40, 1 << 30, 1 << 30, 1, 24, 0,
                         0, 0, 0, 0, 0))
    _poke(hdr + b"\x00" * 8)


def test_read_icc_total_on_garbage():
    """read_icc is a total function: malformed/truncated/random input
    returns b'' rather than raising."""
    import numpy as np
    from lilliput_tpu.codecs.jpeg import read_icc
    rng = np.random.default_rng(0)
    for case in (b"", b"\xff", b"\xff\xd8", b"\xff\xd8\xff",
                 b"\xff\xd8\xff\xe2\x00\x02",
                 b"\xff\xd8\xff\xe2\x00\x10ICC_PROFILE\x00\x05\x01x",
                 bytes(rng.integers(0, 256, 512, dtype=np.uint8)),
                 b"\xff\xd8" + b"\xff" * 64):
        assert read_icc(case) == b""
