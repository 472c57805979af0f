"""Animated serving surface: AnimatedTranscodePipeline and the
MultiGeometryPipeline animated routing (reference Transform keeps the
animation for .gif/.webp outputs, ops.go:302-374; the still pipelines'
first-frame stance applies only to still outputs), plus the scan
quantizer and frame-bucket padding invariants behind them."""
import io

import numpy as np
import pytest

PIL_Image = pytest.importorskip("PIL.Image")

from lilliput_tpu import binding  # noqa: E402

if not binding.available():
    pytest.skip("native host library unavailable", allow_module_level=True)

from lilliput_tpu import (AnimatedTranscodePipeline,  # noqa: E402
                          MultiGeometryPipeline, transcode_gif,
                          transcode_webp)
from lilliput_tpu.errors import DecodingFailedError  # noqa: E402

TD = "/root/reference/testdata"


def _gif(name):
    return open(f"{TD}/{name}", "rb").read()


def test_animated_pipeline_gif_to_gif_matches_batch_path():
    bufs = [_gif("party-discord.gif"), _gif("dispose_bgnd.gif"),
            _gif("restore_previous.gif")]
    pipe = AnimatedTranscodePipeline(20, 14, output_format=".gif", fit=False)
    outs = pipe.transcode(bufs)
    for buf, out in zip(bufs, outs):
        assert out == transcode_gif(buf, 20, 14)
        im = PIL_Image.open(io.BytesIO(out))
        assert im.size == (20, 14)
        assert im.n_frames == PIL_Image.open(io.BytesIO(buf)).n_frames


def test_animated_pipeline_gif_to_webp_animated_output():
    buf = _gif("party-discord.gif")
    pipe = AnimatedTranscodePipeline(24, 16, output_format=".webp")
    (out,) = pipe.transcode([buf])
    im = PIL_Image.open(io.BytesIO(out))
    assert im.format == "WEBP"
    assert im.n_frames == PIL_Image.open(io.BytesIO(buf)).n_frames


def test_animated_pipeline_webp_source():
    buf = open(f"{TD}/party-discord.webp", "rb").read()
    pipe = AnimatedTranscodePipeline(24, 15, output_format=".webp", fit=False)
    (out,) = pipe.transcode([buf])
    assert out == transcode_webp(buf, 24, 15)
    im = PIL_Image.open(io.BytesIO(out))
    assert im.n_frames == PIL_Image.open(io.BytesIO(buf)).n_frames


def test_animated_pipeline_rejects_cross_palette_gif_output():
    buf = open(f"{TD}/party-discord.webp", "rb").read()
    pipe = AnimatedTranscodePipeline(16, 16, output_format=".gif")
    with pytest.raises(DecodingFailedError, match="GIF"):
        pipe.transcode_one(buf)


def test_multigeometry_routes_animated_to_animated_pipeline():
    """.webp output: animated sources keep the animation; a still source
    in the same batch still takes the pixel-domain still pipeline."""
    gif = _gif("party-discord.gif")
    still = open("/root/reference/data/firefox.png", "rb").read()
    pipe = MultiGeometryPipeline(24, 16, output_format=".webp")
    outs = pipe.transcode([gif, still, gif])
    anim = PIL_Image.open(io.BytesIO(outs[0]))
    assert anim.n_frames == PIL_Image.open(io.BytesIO(gif)).n_frames
    assert outs[2] == outs[0]
    st = PIL_Image.open(io.BytesIO(outs[1]))
    assert st.format == "WEBP" and getattr(st, "n_frames", 1) == 1
    assert st.size == (24, 16)


def test_multigeometry_jpeg_output_keeps_first_frame_stance():
    """Still outputs keep the documented first-frame behavior for
    animated sources (what the reference emits for still outputs)."""
    gif = _gif("party-discord.gif")
    pipe = MultiGeometryPipeline(16, 16, output_format=".jpeg")
    (out,) = pipe.transcode([gif])
    im = PIL_Image.open(io.BytesIO(out))
    assert im.format == "JPEG" and im.size == (16, 16)


def test_multigeometry_gif_output_requires_gif_source():
    pipe = MultiGeometryPipeline(16, 16, output_format=".gif")
    jpg = open("/root/reference/data/coast.jpg", "rb").read()
    with pytest.raises(DecodingFailedError, match="GIF source"):
        pipe.transcode([jpg])
    # GIF sources (even single-frame) go through: palette reuse applies
    gif = _gif("party-discord.gif")
    (out,) = pipe.transcode([gif])
    assert PIL_Image.open(io.BytesIO(out)).format == "GIF"


def test_quantize_animation_matches_sequential_per_frame():
    """The one-dispatch scan quantizer must be bit-identical to the
    sequential per-frame quantize_to_palette calls across palette changes,
    transparency, and the prev-frame optimization."""
    import jax.numpy as jnp

    from lilliput_tpu.ops import palette as P
    rng = np.random.default_rng(3)
    n, h, w = 5, 17, 23
    frames = rng.integers(0, 256, (n, h, w, 4), np.uint8)
    frames[..., 3] = np.where(frames[..., 3] > 40, 255, 0)  # some transparency
    pal_a = rng.integers(0, 256, (31, 3), np.int64).astype(np.int32)
    pal_b = rng.integers(0, 256, (64, 3), np.int64).astype(np.int32)
    pals = [pal_a, pal_a, pal_b, pal_b, pal_a]          # changes at 2 and 4
    trans = [3, 3, -1, 5, 3]                             # frame 2: no trans
    # sequential reference: exactly GifEncoder's streaming behavior
    seen = jnp.zeros((P.CACHE_SIZE,), jnp.bool_)
    cache = jnp.zeros((P.CACHE_SIZE,), jnp.uint8)
    prev_pal = None
    have_first = False
    seq = []
    for k in range(n):
        pb = pals[k].tobytes()
        if prev_pal != pb:
            seen = jnp.zeros((P.CACHE_SIZE,), jnp.bool_)
            cache = jnp.zeros((P.CACHE_SIZE,), jnp.uint8)
        prev_pal = pb
        use_prev = bool(have_first and trans[k] >= 0)
        prev = (jnp.asarray(frames[k - 1]) if use_prev
                else jnp.zeros((h, w, 4), jnp.uint8))
        idx, seen, cache = P.quantize_to_palette(
            jnp.asarray(frames[k]), jnp.asarray(pals[k]), prev, seen, cache,
            trans[k], trans[k] >= 0, use_prev)
        seq.append(np.asarray(idx))
        have_first = True
    # scan form, with padding rows past n (must not disturb real frames)
    nb = P.frame_bucket(n)
    fpad = np.zeros((nb, h, w, 4), np.uint8)
    fpad[:n] = frames
    pal256 = np.zeros((nb, 256, 3), np.int32)
    counts = np.ones((nb,), np.int32)
    trans_arr = np.full((nb,), -1, np.int32)
    clear_arr = np.zeros((nb,), bool)
    use_prev_arr = np.zeros((nb,), bool)
    prev_pal = None
    have_first = False
    for k in range(n):
        pal256[k, :pals[k].shape[0]] = pals[k]
        counts[k] = pals[k].shape[0]
        trans_arr[k] = trans[k]
        clear_arr[k] = prev_pal != pals[k].tobytes()
        prev_pal = pals[k].tobytes()
        use_prev_arr[k] = bool(have_first and trans[k] >= 0)
        have_first = True
    idxs = np.asarray(P.quantize_animation(
        jnp.asarray(fpad), jnp.asarray(pal256), jnp.asarray(counts),
        jnp.asarray(trans_arr), jnp.asarray(clear_arr),
        jnp.asarray(use_prev_arr)))
    for k in range(n):
        assert np.array_equal(idxs[k], seq[k]), f"frame {k}"


def test_frame_bucket_padding_is_inert():
    """transcode_gif pads the frame axis to the bucket: outputs must be
    byte-identical to an unpadded run (exercised by comparing two
    animations whose frame counts straddle a bucket edge... here simply
    against the decode_animation(pad_frames=0) composite)."""
    import jax.numpy as jnp

    from lilliput_tpu.codecs.gif import GifDecoder
    buf = _gif("party-discord.gif")
    plain, metas = GifDecoder(buf).decode_animation()
    padded, metas2 = GifDecoder(buf).decode_animation(pad_frames=-1)
    n = len(metas)
    assert len(metas2) == n
    assert padded.shape[0] >= n and padded.shape[0] != n or n in (
        1, 2, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256)
    assert np.array_equal(np.asarray(plain), np.asarray(padded[:n]))


def test_gif_batch_same_signature_group_byte_identical():
    """transcode_gif_batch with a same-(canvas, bucket) group >1 — the
    vmapped device chain with animation-count padding (3 members ->
    bucket 4) must be byte-identical to per-animation transcode_gif,
    for both .gif (quantized) and .webp (pixel) outputs."""
    from lilliput_tpu.pipeline import transcode_gif_batch
    a = _gif("party-discord.gif")
    b = _gif("dispose_bgnd.gif")
    bufs = [a, a, b, a]          # group(a) has 3 members -> padded to 4
    for fmt in (".gif", ".webp"):
        got = transcode_gif_batch(bufs, 20, 14, file_type=fmt)
        want = [transcode_gif(x, 20, 14, file_type=fmt) for x in bufs]
        for i, (g, w) in enumerate(zip(got, want)):
            assert g == w, (fmt, i)


def test_gif_batch_fit_crop_and_order():
    """Fit-mode crop rides the batched chain; outputs come back in input
    order across interleaved signatures."""
    from lilliput_tpu.pipeline import transcode_gif_batch
    a = _gif("party-discord.gif")
    b = _gif("restore_previous.gif")
    bufs = [b, a, b, a, a]
    got = transcode_gif_batch(bufs, 12, 12, fit=True)
    want = [transcode_gif(x, 12, 12, fit=True) for x in bufs]
    assert got == want


def test_webp_batch_same_signature_byte_identical():
    """transcode_webp_batch: a same-canvas group (duplicates -> bucket
    padding) plus a second signature must match per-animation
    transcode_webp byte-for-byte, in input order."""
    from lilliput_tpu.pipeline import transcode_webp, transcode_webp_batch
    a = open(f"{TD}/party-discord.webp", "rb").read()
    bufs = [a, a, a]
    got = transcode_webp_batch(bufs, 24, 15)
    want = [transcode_webp(x, 24, 15) for x in bufs]
    assert got == want
    pipe = AnimatedTranscodePipeline(24, 15, output_format=".webp",
                                     fit=False)
    assert pipe.transcode(bufs) == want


def test_avif_batch_and_edge_cases():
    """transcode_avif_batch byte-identity (duplicates -> padded group) and
    the batch functions' edge cases: empty input lists and a single
    animation (group of one, bucket 1)."""
    from lilliput_tpu.pipeline import (transcode_avif, transcode_avif_batch,
                                       transcode_gif_batch)
    a = open(f"{TD}/colors-animated-8bpc-alpha-exif-xmp.avif", "rb").read()
    bufs = [a, a, a]
    got = transcode_avif_batch(bufs, 24, 16, file_type=".webp")
    want = transcode_avif(a, 24, 16, file_type=".webp")
    assert got == [want] * 3
    # pipeline routing: AVIF sources with .webp output take the batch
    pipe = AnimatedTranscodePipeline(24, 16, output_format=".webp",
                                     fit=False)
    assert pipe.transcode(bufs) == [want] * 3
    # edge cases
    assert transcode_gif_batch([], 8, 8) == []
    assert transcode_avif_batch([], 8, 8) == []
    g = _gif("party-discord.gif")
    (single,) = transcode_gif_batch([g], 10, 8)
    assert single == transcode_gif(g, 10, 8)


def test_gif_batch_corpus_sweep():
    """Every reference GIF fixture through transcode_gif_batch (one mixed
    batch: several signatures, duplicates, interlace, dispose variants,
    big ferry_sunset) must match its per-animation output byte-for-byte,
    for both output formats."""
    import glob

    from lilliput_tpu.pipeline import transcode_gif_batch
    names = sorted(glob.glob(f"{TD}/*.gif"))
    bufs = [open(n, "rb").read() for n in names]
    bufs = bufs + bufs[:2]        # duplicates -> same-signature groups
    for fmt in (".gif", ".webp"):
        got = transcode_gif_batch(bufs, 40, 30, fit=True, file_type=fmt)
        for i, b in enumerate(bufs):
            assert got[i] == transcode_gif(b, 40, 30, fit=True,
                                           file_type=fmt), (fmt, i)


def test_avif_batch_mixed_channels_and_canvas_groups():
    """Mixed RGB and RGBA animated AVIFs share a canvas but not a frame
    signature: the batch must group them apart (channel/dtype in the
    key) instead of crashing np.stack, and match per-animation output."""
    from lilliput_tpu.pipeline import transcode_avif, transcode_avif_batch

    def mk(mode):
        frames = []
        rng = np.random.default_rng(9 if mode == "RGB" else 10)
        for _ in range(2):
            arr = rng.integers(0, 256, (40, 40, len(mode)), np.uint8)
            frames.append(PIL_Image.fromarray(arr, mode))
        bio = io.BytesIO()
        frames[0].save(bio, format="AVIF", save_all=True,
                       append_images=frames[1:], duration=100)
        return bio.getvalue()

    rgb, rgba = mk("RGB"), mk("RGBA")
    bufs = [rgb, rgba, rgb]
    got = transcode_avif_batch(bufs, 16, 16, file_type=".webp")
    want = [transcode_avif(b, 16, 16, file_type=".webp") for b in bufs]
    assert got == want


def test_gif_batch_group_chunking(monkeypatch):
    """Groups larger than the lane cap split into bounded chunks (the
    per-animation path's memory property at batch granularity), with
    outputs unchanged."""
    import lilliput_tpu.pipeline as PL

    monkeypatch.setattr(PL, "_MAX_ANIM_LANES", 2)
    a = _gif("party-discord.gif")
    bufs = [a] * 5                      # one signature, chunks 2+2+1
    got = PL.transcode_gif_batch(bufs, 14, 9)
    want = transcode_gif(a, 14, 9)
    assert got == [want] * 5


def test_animated_pipeline_isolates_hostile_member():
    """One malformed animation in a mixed batch must not fail its healthy
    co-batched requests (ADVICE r3 #1): the poisoned group falls back to
    per-item transcode where the error attaches to its own index."""
    good = [_gif("party-discord.gif"), _gif("dispose_bgnd.gif")]
    # structurally-valid GIF header with no frames: sniffs as GIF, then
    # fails during batch prep ("gif has no frames"-class error)
    hostile = b"GIF89a" + b"\x10\x00\x10\x00\x00\x00\x00" + b"\x3b"
    bufs = [good[0], hostile, good[1]]
    pipe = AnimatedTranscodePipeline(20, 14, output_format=".gif", fit=False)

    outs = pipe.transcode(bufs, return_exceptions=True)
    assert outs[0] == transcode_gif(good[0], 20, 14)
    assert outs[2] == transcode_gif(good[1], 20, 14)
    assert isinstance(outs[1], Exception)

    # default mode still raises, but only after healthy items completed
    with pytest.raises(Exception):
        pipe.transcode(bufs)


def test_warm_covers_anim_lane_buckets(tmp_path):
    """VERDICT r3 #7 acceptance gate: after warm() of an animated spec, a
    mixed corpus including bucket-4 and bucket-8 animation groups compiles
    ZERO new XLA programs (warm used to cover only the lane-bucket-2
    batch program; other lane buckets compiled on the request path).
    Compiles are counted via the persistent compile cache's file set."""
    import jax
    old_dir = jax.config.jax_compilation_cache_dir
    old_min = jax.config.jax_persistent_cache_min_compile_time_secs
    jax.config.update("jax_compilation_cache_dir", str(tmp_path))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        buf = _gif("party-discord.gif")
        pipe = MultiGeometryPipeline(16, 11, output_format=".gif")
        pipe.warm([buf], anim_lane_buckets=(1, 2, 4, 8))
        warmed = sorted(p.name for p in tmp_path.rglob("*") if p.is_file())
        for n in (4, 8, 3, 1):  # bucket-4, bucket-8, padded-to-4, singleton
            outs = pipe.transcode([buf] * n)
            assert len(outs) == n and all(o[:6] == b"GIF89a" for o in outs)
        after = sorted(p.name for p in tmp_path.rglob("*") if p.is_file())
        assert after == warmed, (
            f"request path compiled new programs: {set(after) - set(warmed)}")
    finally:
        jax.config.update("jax_compilation_cache_dir", old_dir)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", old_min)
