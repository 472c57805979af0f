"""Decoder dispatch parity (lilliput_test.go taxonomy): magic-byte routing,
descriptions, dims, durations, animated flags, audio-only files, HDR PNG
ForceSdr ICC detection."""
import pytest

from lilliput_tpu import binding

if not binding.available():
    pytest.skip("native host library unavailable", allow_module_level=True)

from lilliput_tpu import new_decoder  # noqa: E402
from lilliput_tpu.api import (is_avif, is_gif, is_jpeg, is_mp4, is_png,  # noqa: E402
                              is_webp)

DATA = "/root/reference/data"
TD = "/root/reference/testdata"

CASES = [
    (f"{DATA}/sunrise.jpg", "JPEG", (100, 75), False),
    (f"{DATA}/firefox.png", "PNG", (97, 100), False),
    (f"{TD}/party-discord.gif", "GIF", (28, 18), True),
    (f"{TD}/party-discord.webp", "WEBP", (27, 17), True),
    (f"{TD}/colors_sdr_srgb.avif", "AVIF", (200, 200), False),
    (f"{TD}/big_buck_bunny_480p_10s_std.mp4", "MP4", (853, 480), False),
]


@pytest.mark.parametrize("path,desc,dims,animated", CASES,
                         ids=[c[1] for c in CASES])
def test_dispatch(path, desc, dims, animated):
    d = new_decoder(open(path, "rb").read())
    assert d.description() == desc
    h = d.header()
    assert (h.width, h.height) == dims
    assert h.is_animated() == animated


def test_magic_sniffers():
    assert is_gif(b"GIF89a" + b"\x00" * 10)
    assert is_gif(b"GIF87a" + b"\x00" * 10)
    assert not is_gif(b"GIF88a" + b"\x00" * 10)
    assert is_webp(b"RIFF\x00\x00\x00\x00WEBP")
    assert not is_webp(b"RIFF\x00\x00\x00\x00WAVE")
    assert is_avif(b"\x00\x00\x00\x20ftypavif" + b"\x00" * 4)
    assert is_avif(b"\x00\x00\x00\x20ftypavis" + b"\x00" * 4)
    assert not is_avif(b"\x00\x00\x00\x20ftypmp42" + b"\x00" * 4)
    assert is_mp4(b"\x00\x00\x00\x20ftypmp42" + b"\x00" * 4)
    assert is_mp4(b"\x00\x00\x00\x20ftypisom" + b"\x00" * 4)
    assert is_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 8)
    assert is_jpeg(b"\xff\xd8\xff\xe0")


def test_gif_duration_is_zero():
    # parity: Duration() is 0 for static images AND animated GIFs
    d = new_decoder(open(f"{TD}/party-discord.gif", "rb").read())
    assert d.duration() == 0.0


def test_webp_background_and_loops():
    d = new_decoder(open(f"{TD}/party-discord.webp", "rb").read())
    assert d.loop_count() >= 0
    assert d.background_color() >= 0


def test_hdr_png_icc_detected():
    from lilliput_tpu.codecs.icc import is_hdr_icc_profile
    d = new_decoder(open(f"{DATA}/hdr-ohmama.png", "rb").read())
    assert is_hdr_icc_profile(d.icc())  # PQ CICP inside the iCCP profile


def test_short_buffers_rejected():
    from lilliput_tpu.errors import InvalidImageError
    for buf in (b"", b"\x89", b"GIF", b"RIFF"):
        with pytest.raises(InvalidImageError):
            new_decoder(buf)


def test_native_manifest_verifies():
    """Integrity manifest analog of the reference's deps/verify_deps.py:
    source hashes, exported C ABI, linked system sonames."""
    import subprocess
    import sys
    r = subprocess.run([sys.executable, "tools/verify_native.py"],
                       capture_output=True, text=True, cwd="/root/repo")
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK" in r.stdout
