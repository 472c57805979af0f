"""GIF codec tests: animation metadata parity with the reference's
giflib_test.go expectations, frame decode vs PIL, LZW round-trip, and
Transform round trips."""
import io

import numpy as np
import pytest

from lilliput_tpu import binding

if not binding.available():
    pytest.skip("native host library unavailable", allow_module_level=True)

PIL_Image = pytest.importorskip("PIL.Image")

from lilliput_tpu import ImageOps, ImageOptions, ResizeMethod, new_decoder  # noqa: E402
from lilliput_tpu.codecs.gif import GifDecoder, set_gif_max_frame_dimension  # noqa: E402
from lilliput_tpu.errors import InvalidImageError  # noqa: E402
from lilliput_tpu.framebuffer import Framebuffer  # noqa: E402

TD = "/root/reference/testdata"

# expectations mirrored from the reference's own test table (giflib_test.go)
ANIM_CASES = [
    ("no-loop.gif", 1, 44, 4400),
    ("duplicate_number_of_loops.gif", 2, 2, 0),
    ("dispose_bgnd.gif", 0, 5, 5000),
    ("party-discord.gif", 0, 16, 480),
    ("restore_previous.gif", 0, 12, 7840),
]


@pytest.mark.parametrize("name,loops,frames,dur_ms", ANIM_CASES,
                         ids=[c[0] for c in ANIM_CASES])
def test_animation_info(name, loops, frames, dur_ms):
    d = GifDecoder(open(f"{TD}/{name}", "rb").read())
    assert d.loop_count() == loops
    assert d.frame_count() == frames
    assert d.total_duration_ms() == dur_ms


def test_decode_frames_match_pil():
    name = "party-discord.gif"
    d = GifDecoder(open(f"{TD}/{name}", "rb").read())
    im = PIL_Image.open(f"{TD}/{name}")
    k = 0
    while True:
        fb = Framebuffer()
        try:
            d.decode_to(fb)
        except EOFError:
            break
        im.seek(k)
        ref = np.array(im.convert("RGBA"))[:, :, [2, 1, 0, 3]]
        mine = fb.to_numpy()
        both = (mine[:, :, 3] > 0) & (ref[:, :, 3] > 0)
        assert ((mine[:, :, 3] > 127) == (ref[:, :, 3] > 127)).all()
        if both.any():
            assert np.abs(mine[:, :, :3][both].astype(int)
                          - ref[:, :, :3][both].astype(int)).max() == 0
        k += 1
    assert k == 16


def test_frame_durations():
    d = GifDecoder(open(f"{TD}/party-discord.gif", "rb").read())
    fb = Framebuffer()
    d.decode_to(fb)
    assert fb.duration == pytest.approx(0.03)  # 3cs * 10ms


@pytest.mark.parametrize("name", ["party-discord.gif", "dispose_bgnd.gif",
                                  "restore_previous.gif"])
def test_transform_gif_to_gif_roundtrip(name):
    buf = open(f"{TD}/{name}", "rb").read()
    out = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".gif", resize_method=ResizeMethod.NO_RESIZE,
        encode_timeout=300.0))
    im = PIL_Image.open(io.BytesIO(out))
    n = 0
    try:
        while True:
            im.seek(n)
            n += 1
    except EOFError:
        pass
    orig = PIL_Image.open(f"{TD}/{name}")
    m = 0
    try:
        while True:
            orig.seek(m)
            m += 1
    except EOFError:
        pass
    assert n == m
    im.seek(0)
    orig.seek(0)
    a = np.array(im.convert("RGBA"))
    b = np.array(orig.convert("RGBA"))
    assert np.abs(a.astype(int) - b.astype(int)).max() == 0


def test_transform_gif_resize():
    buf = open(f"{TD}/party-discord.gif", "rb").read()
    out = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".gif", width=14, height=9, resize_method=ResizeMethod.RESIZE,
        encode_timeout=300.0))
    im = PIL_Image.open(io.BytesIO(out))
    assert im.size == (14, 9)


def test_max_frame_dimension_guard():
    set_gif_max_frame_dimension(10)
    try:
        d = GifDecoder(open(f"{TD}/party-discord.gif", "rb").read())
        fb = Framebuffer()
        with pytest.raises(InvalidImageError):
            d.decode_to(fb)
    finally:
        set_gif_max_frame_dimension(10000)


def test_max_encode_frames():
    buf = open(f"{TD}/party-discord.gif", "rb").read()
    out = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".gif", resize_method=ResizeMethod.NO_RESIZE,
        max_encode_frames=3, encode_timeout=300.0))
    im = PIL_Image.open(io.BytesIO(out))
    n = 0
    try:
        while True:
            im.seek(n)
            n += 1
    except EOFError:
        pass
    assert n == 3


def test_batched_animation_matches_streaming():
    """transcode_gif (one scan dispatch for all frames) must produce
    byte-identical output to the per-frame ImageOps path."""
    from lilliput_tpu.pipeline import transcode_gif
    for name in ("party-discord.gif", "dispose_bgnd.gif", "restore_previous.gif"):
        buf = open(f"{TD}/{name}", "rb").read()
        batched = transcode_gif(buf, 20, 14)
        streaming = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
            file_type=".gif", width=20, height=14,
            resize_method=ResizeMethod.RESIZE, encode_timeout=600.0))
        assert batched == streaming, name


def test_disposal_method_sequences():
    """Disposal sequences per frame (giflib_test.go:85-135 taxonomy)."""
    def disposals(name):
        d = GifDecoder(open(f"{TD}/{name}", "rb").read())
        out = []
        while True:
            fb = Framebuffer()
            try:
                d.decode_to(fb)
            except EOFError:
                break
            out.append(d.frame_header().disposal)
        return out

    assert 3 in disposals("restore_previous.gif")      # RestorePrevious
    assert 2 in disposals("dispose_bgnd.gif")          # DisposeToBackground
    assert disposals("party-discord.gif") == [2] * 15 + [1]


def test_interlaced_gif_roundtrip():
    """Interlaced raster write/read through our own LZW + 4-pass layout."""
    import ctypes

    import numpy as np

    from lilliput_tpu.codecs.gif import _i32p, _u8
    lib = binding.load()
    rng = np.random.default_rng(3)
    pal = rng.integers(0, 256, (16, 3), np.uint8)
    idx = rng.integers(0, 16, (23, 17), np.uint8)
    e = lib.lp_gif_enc_new(17, 23, 8, 0, 0, _u8(np.ascontiguousarray(pal)), 16)
    desc = np.array([0, 0, 17, 23, 1, -1, 5, 0, 4], np.int32)  # interlace=1
    assert lib.lp_gif_enc_frame(e, None, 0, desc.ctypes.data_as(_i32p),
                                None, 0, _u8(np.ascontiguousarray(idx))) == 0
    size = lib.lp_gif_enc_size(e)
    out = np.empty(size, np.uint8)
    n = lib.lp_gif_enc_finish(e, _u8(out), out.size)
    lib.lp_gif_enc_free(e)
    buf = out[:n].tobytes()
    # our decoder deinterlaces
    d = GifDecoder(buf)
    fb = Framebuffer()
    d.decode_to(fb)
    expect = pal[idx][:, :, ::-1]  # BGR
    assert np.array_equal(fb.to_numpy()[:, :, :3], expect)
    # PIL agrees
    im = PIL_Image.open(io.BytesIO(buf)).convert("RGB")
    assert np.array_equal(np.array(im), pal[idx])
