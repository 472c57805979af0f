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
from lilliput_tpu.errors import DecodingFailedError, InvalidImageError  # noqa: E402
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


def _lzw_blob(indices, mcs=2):
    """Minimal LZW image-data blob: a clear code before every literal keeps
    the code width fixed at mcs+1 bits (valid per spec, trivial to pack)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    codes = []
    for v in indices:
        codes += [clear, int(v)]
    codes.append(end)
    acc = bits = 0
    out = bytearray()
    for c in codes:
        acc |= c << bits
        bits += mcs + 1
        while bits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            bits -= 8
    if bits:
        out.append(acc & 0xFF)
    blob = bytearray([mcs])
    for i in range(0, len(out), 255):
        chunk = out[i:i + 255]
        blob.append(len(chunk))
        blob += chunk
    blob.append(0)
    return bytes(blob)


_GCT4 = bytes([9, 8, 7,  255, 0, 0,  0, 255, 0,  0, 0, 255])  # 4-color GCT


def _descriptor(left, top, w, h):
    return b"\x2c" + bytes([left, 0, top, 0, w, 0, h, 0, 0])


def test_first_frame_dispose_previous_restores_transparent():
    """giflib's prev-frame buffer is zero-initialized and saved only from
    the second frame on (giflib.cpp:491-494), so frame-1 DISPOSE_PREVIOUS
    restores transparent black — in BOTH the streaming and batch paths."""
    gce_disp3 = b"\x21\xf9\x04" + bytes([3 << 2, 0, 0, 0]) + b"\x00"
    gce_disp0 = b"\x21\xf9\x04" + bytes([0, 0, 0, 0]) + b"\x00"
    gif = (b"GIF89a" + b"\x04\x00\x04\x00" + bytes([0xF1, 0, 0]) + _GCT4
           + gce_disp3 + _descriptor(0, 0, 4, 4) + _lzw_blob([1] * 16)
           + gce_disp0 + _descriptor(1, 1, 2, 2) + _lzw_blob([2] * 4)
           + b"\x3b")

    # streaming path
    d = GifDecoder(gif)
    fb = Framebuffer()
    frames = []
    while True:
        try:
            d.decode_to(fb)
        except EOFError:
            break
        frames.append(fb.to_numpy().copy())
    assert len(frames) == 2
    # frame 2: full canvas was disposed-to-previous => transparent black,
    # except the freshly drawn 2x2 green rect at (1,1)
    expect = np.zeros((4, 4, 4), np.uint8)
    expect[1:3, 1:3] = [0, 255, 0, 255]  # BGRA of palette color 2
    assert np.array_equal(frames[1], expect)

    # batch path must match streaming byte-for-byte
    batch, metas = GifDecoder(gif).decode_animation()
    assert len(metas) == 2
    assert np.array_equal(np.asarray(batch[0]), frames[0])
    assert np.array_equal(np.asarray(batch[1]), frames[1])


def test_no_gce_background_is_transparent():
    """A GIF with no graphics-control extension reports a TRANSPARENT
    background: the reference's zero-initialized GCB has
    TransparentColor==0 != NO_TRANSPARENT_COLOR (giflib.cpp:1327,597-614)."""
    gif = (b"GIF89a" + b"\x04\x00\x04\x00" + bytes([0xF1, 0, 0]) + _GCT4
           + _descriptor(0, 0, 4, 4) + _lzw_blob([1] * 16) + b"\x3b")
    d = GifDecoder(gif)
    bg = d.background_color()
    assert (bg >> 24) & 0xFF == 0          # alpha 0
    assert bg & 0xFFFFFF == 0x090807       # palette[0] rgb preserved


def test_premature_end_of_information_fails():
    """An LZW stream that hits end-of-information before w*h pixels must
    raise, not return an uninitialized raster tail (giflib's DGifGetLine
    errors identically on short rasters)."""
    # 4x4 frame, 4-color global palette, mcs=2. Code stream (3-bit,
    # LSB-first): clear(4), literal 0, end(5) -> exactly 1 of 16 pixels.
    gif = (b"GIF89a"
           + b"\x04\x00\x04\x00" + bytes([0xF1, 0, 0])   # LSD: GCT of 4
           + bytes(4 * 3)                                 # global palette
           + b"\x2c" + b"\x00\x00\x00\x00\x04\x00\x04\x00\x00"  # descriptor
           + bytes([0x02, 0x02, 0x44, 0x01, 0x00])        # mcs + LZW data
           + b"\x3b")
    d = GifDecoder(gif)
    fb = Framebuffer()
    with pytest.raises(DecodingFailedError):
        d.decode_to(fb)


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


def _giflib_quantize_oracle(frames, palettes, trans_idxs, prev_valids):
    """Direct sequential transcription of the reference encoder's quantizer
    loop (giflib.cpp:1006-1093) incl. the crushed-key cache lifetime
    (cleared when the palette bytes change, giflib.cpp:974-996)."""
    cache = {}
    prev_pal_bytes = None
    prev_frame = None
    outs = []
    for f, (img, pal, trans, prev_ok) in enumerate(
            zip(frames, palettes, trans_idxs, prev_valids)):
        if prev_pal_bytes != pal.tobytes():
            cache.clear()
        prev_pal_bytes = pal.tobytes()
        h, w = img.shape[:2]
        out = np.zeros((h, w), np.uint8)
        have_trans = trans >= 0
        for y in range(h):
            for x in range(w):
                B, G, R, A = (int(v) for v in img[y, x])
                if A < 128 and have_trans:
                    out[y, x] = trans
                    continue
                key = ((R >> 3) << 10) | ((G >> 3) << 5) | (B >> 3)
                if key not in cache:
                    ext = (R > 240 and G > 240 and B > 240) or \
                          (R < 15 and G < 15 and B < 15)
                    rc = R if ext else (R & 0xF8) | 4
                    gc = G if ext else (G & 0xF8) | 4
                    bc = B if ext else (B & 0xF8) | 4
                    least, best = 1 << 30, 0
                    for i in range(pal.shape[0]):
                        if i == trans:
                            continue
                        d = (abs(rc - int(pal[i, 0])) + abs(gc - int(pal[i, 1]))
                             + abs(bc - int(pal[i, 2])))
                        if d < least:
                            least, best = d, i
                    cache[key] = best
                else:
                    best = cache[key]
                    least = (abs(R - int(pal[best, 0])) + abs(G - int(pal[best, 1]))
                             + abs(B - int(pal[best, 2])))
                if prev_ok and have_trans and prev_frame is not None:
                    pB, pG, pR = (int(v) for v in prev_frame[y, x, :3])
                    if abs(R - pR) + abs(G - pG) + abs(B - pB) < least:
                        best = trans
                out[y, x] = best
        prev_frame = img
        outs.append(out)
    return outs


def test_quantizer_matches_sequential_giflib_cache():
    """The batched device quantizer must be pixel-exact vs the reference's
    sequential cached loop — including cross-frame cache persistence,
    palette-change clears, extreme-color keys, and the prev-frame
    transparency optimization."""
    import jax.numpy as jnp

    from lilliput_tpu.ops import palette as P

    rng = np.random.default_rng(12)
    h, w = 40, 37
    palA = rng.integers(0, 256, (31, 3), np.uint8)
    palB = rng.integers(0, 256, (16, 3), np.uint8)

    def mk_frame(seed):
        r = np.random.default_rng(seed)
        img = r.integers(0, 256, (h, w, 4), np.uint8)
        # force crushed-key collisions + extremes + low alpha regions
        img[:10, :10, :3] = r.integers(0, 16, (10, 10, 3))        # dark extremes
        img[10:20, :10, :3] = r.integers(241, 256, (10, 10, 3))   # light extremes
        img[:, 20:24, :3] = (img[:, 20:24, :3] & 0xF8) | r.integers(0, 8, (h, 4, 3))
        img[30:, 30:, 3] = 5                                       # transparent
        img[:, :, 3] = np.where(img[:, :, 3] < 50, 5, 255)
        return img

    frames = [mk_frame(i) for i in range(4)]
    palettes = [palA, palA, palB, palB]      # palette change clears cache
    trans_idxs = [7, 7, -1, 3]               # incl. a no-transparency frame
    prev_valids = [False, True, True, True]

    oracle = _giflib_quantize_oracle(frames, palettes, trans_idxs, prev_valids)

    from lilliput_tpu.ops.palette import CACHE_SIZE
    seen = jnp.zeros((CACHE_SIZE,), jnp.bool_)
    cache = jnp.zeros((CACHE_SIZE,), jnp.uint8)
    prev_pal_bytes = None
    prev = None
    for i, (img, pal, trans, prev_ok) in enumerate(
            zip(frames, palettes, trans_idxs, prev_valids)):
        if prev_pal_bytes != pal.tobytes():
            seen = jnp.zeros((CACHE_SIZE,), jnp.bool_)
            cache = jnp.zeros((CACHE_SIZE,), jnp.uint8)
        prev_pal_bytes = pal.tobytes()
        prev_arr = jnp.asarray(prev) if (prev_ok and prev is not None) \
            else jnp.zeros((h, w, 4), jnp.uint8)
        idx, seen, cache = P.quantize_to_palette(
            jnp.asarray(img), jnp.asarray(pal.astype(np.int32)), prev_arr,
            seen, cache, int(trans), trans >= 0,
            bool(prev_ok and trans >= 0 and prev is not None))
        got = np.asarray(idx)
        assert np.array_equal(got, oracle[i]), (
            f"frame {i}: {int((got != oracle[i]).sum())} px differ")
        prev = img


def test_quantize_animation_matches_sequential_calls():
    """The scan-free whole-animation quantizer must be pixel-exact vs
    sequential quantize_to_palette calls with carried cache tables —
    across palette-change clears, per-frame transparency changes WITHIN a
    palette segment, no-transparency frames, and prev-frame validity."""
    import jax.numpy as jnp

    from lilliput_tpu.ops import palette as P

    rng = np.random.default_rng(77)
    h, w = 33, 29
    palA = rng.integers(0, 256, (64, 3), np.uint8)
    palB = rng.integers(0, 256, (256, 3), np.uint8)

    def mk(seed):
        r = np.random.default_rng(seed)
        img = r.integers(0, 256, (h, w, 4), np.uint8)
        img[:8, :8, :3] = r.integers(0, 15, (8, 8, 3))
        img[8:12, :8, :3] = r.integers(241, 256, (4, 8, 3))
        img[:, :, 3] = np.where(img[:, :, 3] < 60, 10, 255)
        # repeated rows -> crushed-key collisions within and across frames
        img[20:26] = img[20]
        return img

    frames = [mk(i) for i in range(6)]
    pals = [palA, palA, palA, palB, palB, palB]
    # trans changes INSIDE the palA segment (cache must NOT clear);
    # a no-trans frame; trans inside palB segment
    trans = [5, 9, -1, 3, 3, 200]
    prev_ok = [False, True, True, True, False, True]

    # sequential reference: quantize_to_palette with carried tables
    seen = jnp.zeros((P.CACHE_SIZE,), jnp.bool_)
    cache = jnp.zeros((P.CACHE_SIZE,), jnp.uint8)
    prev_bytes = None
    prev = None
    seq = []
    clears = []
    for img, pal, tr, pv in zip(frames, pals, trans, prev_ok):
        clear = prev_bytes != pal.tobytes()
        clears.append(clear)
        if clear:
            seen = jnp.zeros((P.CACHE_SIZE,), jnp.bool_)
            cache = jnp.zeros((P.CACHE_SIZE,), jnp.uint8)
        prev_bytes = pal.tobytes()
        prev_arr = (jnp.asarray(prev) if (pv and prev is not None)
                    else jnp.zeros((h, w, 4), jnp.uint8))
        idx, seen, cache = P.quantize_to_palette(
            jnp.asarray(img), jnp.asarray(pal.astype(np.int32)), prev_arr,
            seen, cache, int(tr), tr >= 0,
            bool(pv and tr >= 0 and prev is not None))
        seq.append(np.asarray(idx))
        prev = img

    # batched: pad palettes to 256 rows, counts mask the rest
    n = len(frames)
    palettes = np.zeros((n, 256, 3), np.int32)
    counts = np.zeros((n,), np.int32)
    for i, p in enumerate(pals):
        palettes[i, :len(p)] = p
        counts[i] = len(p)
    got = np.asarray(P.quantize_animation(
        jnp.asarray(np.stack(frames)), jnp.asarray(palettes),
        jnp.asarray(counts), jnp.asarray(np.array(trans, np.int32)),
        jnp.asarray(np.array(clears)),
        jnp.asarray(np.array([pv and t >= 0 and i > 0 for i, (pv, t) in
                              enumerate(zip(prev_ok, trans))]))))
    for i in range(n):
        assert np.array_equal(got[i], seq[i]), (
            f"frame {i}: {int((got[i] != seq[i]).sum())} px differ")


def test_quantize_animation_fallback_branch_last_segment(monkeypatch):
    """The int32-overflow fallback branch (scatter glin / gather argmin)
    must size its segment table for 1-BASED segment ids: with every frame
    clearing (per-frame local palettes) and the frame count exactly on
    its bucket, the LAST segment's keys index seg == nf — an nf-slot
    table drops those scatters out of bounds and white pixels
    (crushed = 32767, the very last key) quantize against a clamped,
    colliding slot. Forced onto the fallback via _PACK_LIMIT=0."""
    import jax.numpy as jnp

    from lilliput_tpu.ops import palette as P

    rng = np.random.default_rng(5)
    h, w = 16, 16
    n = 4                      # == frame_bucket(4): no pad rows
    frames = rng.integers(0, 256, (n, h, w, 4), np.uint8)
    frames[..., 3] = 255
    frames[:, :4, :4, :3] = 255          # white: crushed key 32767
    frames[:, 4:6, :4, :3] = 0           # black neighbors to collide with
    pals = [rng.integers(0, 256, (17 + k, 3), np.int64).astype(np.int32)
            for k in range(n)]           # all palettes distinct -> all clear

    seen = jnp.zeros((P.CACHE_SIZE,), jnp.bool_)
    cache = jnp.zeros((P.CACHE_SIZE,), jnp.uint8)
    seq = []
    for k in range(n):
        seen = jnp.zeros((P.CACHE_SIZE,), jnp.bool_)   # every frame clears
        cache = jnp.zeros((P.CACHE_SIZE,), jnp.uint8)
        use_prev = k > 0
        prev = (jnp.asarray(frames[k - 1]) if use_prev
                else jnp.zeros((h, w, 4), jnp.uint8))
        idx, seen, cache = P.quantize_to_palette(
            jnp.asarray(frames[k]), jnp.asarray(pals[k]), prev, seen, cache,
            3, True, use_prev)
        seq.append(np.asarray(idx))

    pal256 = np.zeros((n, 256, 3), np.int32)
    counts = np.zeros((n,), np.int32)
    for k in range(n):
        pal256[k, :len(pals[k])] = pals[k]
        counts[k] = len(pals[k])
    monkeypatch.setattr(P, "_PACK_LIMIT", 0)
    got = np.asarray(P.quantize_animation(
        jnp.asarray(frames), jnp.asarray(pal256), jnp.asarray(counts),
        jnp.asarray(np.full((n,), 3, np.int32)),
        jnp.asarray(np.ones((n,), bool)),
        jnp.asarray(np.array([k > 0 for k in range(n)]))))
    for k in range(n):
        assert np.array_equal(got[k], seq[k]), f"frame {k}"


def test_lut_select_clamps_out_of_range_indices():
    """lut_select/_batched match jnp.take(mode='clip') for ALL indices,
    including out-of-range and negative (ADVICE r3 #3: the old zero-row
    behavior made an unmasked future caller silently wrong)."""
    import jax.numpy as jnp
    from lilliput_tpu.ops.palette import lut_select, lut_select_batched
    rng = np.random.default_rng(7)
    lut = rng.integers(0, 256, (200, 4), np.uint8)   # non-pow2 palette
    idx = np.array([[0, 199, 200, 255], [-1, 64, 1000, 5]], np.int32)
    want = jnp.take(jnp.asarray(lut), jnp.asarray(idx), axis=0, mode="clip")
    got = lut_select(jnp.asarray(lut), jnp.asarray(idx))
    assert np.array_equal(np.asarray(got), np.asarray(want))
    luts = rng.integers(0, 256, (3, 200, 4), np.uint8)
    idxb = rng.integers(-5, 260, (3, 6, 6), np.int64).astype(np.int32)
    wantb = np.stack([np.asarray(jnp.take(jnp.asarray(luts[i]),
                                          jnp.asarray(idxb[i]), axis=0,
                                          mode="clip")) for i in range(3)])
    gotb = lut_select_batched(jnp.asarray(luts), jnp.asarray(idxb))
    assert np.array_equal(np.asarray(gotb), wantb)


@pytest.mark.parametrize("name", ["party-discord.gif", "dispose_bgnd.gif",
                                  "restore_previous.gif", "no-loop.gif",
                                  "ferry_sunset.gif",
                                  "duplicate_number_of_loops.gif"])
def test_scan_parallel_decode_matches_streaming(name):
    """The scan-then-parallel raster decode (lp_gif_scan +
    lp_gif_decode_scanned, threaded) must be byte-identical to the serial
    streaming walk (lp_gif_next_frame + lp_gif_frame_indices) — metas,
    palettes, extensions, and every raster."""
    import ctypes
    buf = open(f"/root/reference/testdata/{name}", "rb").read()
    lib = binding.load()
    u8p = ctypes.POINTER(ctypes.c_uint8)

    # streaming walk
    ds = GifDecoder(buf)
    stream = []
    while True:
        try:
            m = ds._next_frame_meta()
        except EOFError:
            break
        raw = np.empty(m.height * m.width, np.uint8)
        assert lib.lp_gif_frame_indices(
            ds._h, raw.ctypes.data_as(u8p)) == 0
        stream.append((m, raw.copy()))
    ds.close()

    # threaded scan decode (out-of-order on purpose)
    dp = GifDecoder(buf)
    nf = lib.lp_gif_scan(dp._h)
    assert nf == len(stream)
    metas = [dp._scanned_meta(i) for i in range(nf)]
    from concurrent.futures import ThreadPoolExecutor

    def dec(i):
        m = metas[i]
        raw = np.empty(m.height * m.width, np.uint8)
        assert lib.lp_gif_decode_scanned(
            dp._h, i, raw.ctypes.data_as(u8p)) == 0
        return raw
    with ThreadPoolExecutor(4) as ex:
        raws = list(ex.map(dec, reversed(range(nf))))[::-1]
    for (ms, raw_s), mp, raw_p in zip(stream, metas, raws):
        for attr in ("left", "top", "width", "height", "interlace",
                     "trans_idx", "delay_cs", "disposal", "pal_count",
                     "ext"):
            assert getattr(ms, attr) == getattr(mp, attr), attr
        assert np.array_equal(ms.palette, mp.palette)
        assert np.array_equal(raw_s, raw_p)
    dp.close()


def test_animation_inputs_workers_identical():
    """animation_inputs(workers=4) must produce byte-identical stacks to
    workers=1 (the intra-animation parallel LZW gate)."""
    buf = open("/root/reference/testdata/party-discord.gif", "rb").read()
    d1 = GifDecoder(buf)
    i1, m1 = d1.animation_inputs(pad_frames=-1, workers=1)
    d1.close()
    d4 = GifDecoder(buf)
    i4, m4 = d4.animation_inputs(pad_frames=-1, workers=4)
    d4.close()
    assert len(m1) == len(m4)
    for k in i1:
        assert np.array_equal(np.asarray(i1[k]), np.asarray(i4[k])), k
    for a, b in zip(m1, m4):
        assert a.trans_idx == b.trans_idx and a.delay_cs == b.delay_cs


def _first_frame(buf, monkeypatch, fast):
    monkeypatch.setenv("LILLIPUT_GIF_FASTFIRST", "1" if fast else "0")
    d = GifDecoder(buf)
    fb = Framebuffer()
    d.decode_to(fb)
    arr = np.asarray(fb.array).copy()
    meta = d.frame_meta
    state = (d._have_first, d._prev_disposal, d._prev_rect, meta.trans_idx)
    return arr, fb.duration, fb.dispose, state, d


@pytest.mark.parametrize("name", ["party-discord.gif", "dispose_bgnd.gif",
                                  "restore_previous.gif", "no-loop.gif",
                                  "ferry_sunset.gif",
                                  "duplicate_number_of_loops.gif"])
def test_first_frame_fast_path_byte_identical(name, monkeypatch):
    """The still-serving first-frame fast path (one packed-u32 LUT gather,
    VERDICT r4 #4) must be byte-identical to the generic compositing path
    on every corpus GIF — pixels, frame timing/disposal metadata, AND the
    decoder state later frames build on."""
    buf = open(f"{TD}/{name}", "rb").read()
    fast, dur_f, disp_f, st_f, df = _first_frame(buf, monkeypatch, True)
    slow, dur_s, disp_s, st_s, ds = _first_frame(buf, monkeypatch, False)
    np.testing.assert_array_equal(fast, slow)
    assert (dur_f, disp_f, st_f) == (dur_s, disp_s, st_s)
    # SECOND frame must also match: the fast path's canvas/disposal state
    # feeds the generic path for frame 2
    if df.frame_count() > 1:
        fb_f, fb_s = Framebuffer(), Framebuffer()
        monkeypatch.setenv("LILLIPUT_GIF_FASTFIRST", "1")
        df.decode_to(fb_f)
        monkeypatch.setenv("LILLIPUT_GIF_FASTFIRST", "0")
        ds.decode_to(fb_s)
        np.testing.assert_array_equal(np.asarray(fb_f.array),
                                      np.asarray(fb_s.array))


def test_first_frame_fast_path_partial_rect_and_transparency(monkeypatch):
    """Synthesized adversarial cases: frame rect smaller than the canvas
    (background shows through + transparency forcing) and a transparent
    index inside the palette."""
    from PIL import Image

    def mk(trans):
        # 10x8 canvas, 4x3 frame at (5, 2): PIL writes the logical screen
        # from the first frame, so build the GIF by hand
        pal = bytes([i for v in range(8) for i in (v * 30, v * 20, v * 10)])
        img = Image.frombytes("P", (4, 3), bytes(range(8)) + bytes(4))
        img.putpalette(pal)
        b = io.BytesIO()
        img.save(b, "GIF", transparency=2 if trans else None)
        raw = bytearray(b.getvalue())
        # widen logical screen to 10x8 and offset the image descriptor
        raw[6:10] = (10).to_bytes(2, "little") + (8).to_bytes(2, "little")
        i = raw.index(0x2C)  # image separator
        raw[i + 1:i + 5] = (5).to_bytes(2, "little") + (2).to_bytes(2, "little")
        return bytes(raw)

    for trans in (False, True):
        buf = mk(trans)
        fast, dur_f, disp_f, st_f, _ = _first_frame(buf, monkeypatch, True)
        slow, dur_s, disp_s, st_s, _ = _first_frame(buf, monkeypatch, False)
        np.testing.assert_array_equal(fast, slow)
        assert (dur_f, disp_f, st_f) == (dur_s, disp_s, st_s)
