"""StillTranscodePipeline: batched serving for non-JPEG still sources.

The JPEG serving pipelines (test_pipeline.py) work in the coefficient
domain; these tests cover the pixel-domain counterpart — host decode of
PNG/WebP/GIF/BMP sources, one fused device dispatch (orient + crop +
AREA resize + encode), host still encode — and the format-agnostic
MultiGeometryPipeline front over mixed JPEG/non-JPEG traffic.

Exactness contract mirrors the JPEG serving path: ±1 u8 vs the streaming
ImageOps path (matmul-form AREA resample), PSNR-gated through lossy
output formats.
"""
import io

import numpy as np
import pytest
from PIL import Image

import jax.numpy as jnp

from lilliput_tpu import (ImageOps, ImageOptions, MultiGeometryPipeline,
                          ResizeMethod, StillTranscodePipeline)
from lilliput_tpu.api import new_decoder
from lilliput_tpu.codecs import jpeg as J
from lilliput_tpu.errors import DecodingFailedError


def _rng(seed=0):
    return np.random.default_rng(seed)


def _smooth(h, w, c, seed=0):
    """Low-frequency test image (JPEG-friendly, so PSNR gates are
    meaningful)."""
    r = _rng(seed)
    base = r.integers(0, 256, (h // 8 + 1, w // 8 + 1, c), np.uint8)
    img = np.asarray(Image.fromarray(
        base if c > 1 else base[..., 0]).resize((w, h), Image.BILINEAR))
    return img.reshape(h, w, c) if c == 1 else img


def _png(arr):
    b = io.BytesIO()
    Image.fromarray(arr if arr.ndim == 3 and arr.shape[2] > 1
                    else arr[..., 0]).save(b, "PNG")
    return b.getvalue()


def _webp(arr, lossless=True):
    b = io.BytesIO()
    Image.fromarray(arr).save(b, "WEBP", lossless=lossless)
    return b.getvalue()


def _psnr(a, b):
    mse = ((np.asarray(a).astype(np.float64) - np.asarray(b)) ** 2).mean()
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def _streaming(buf, dst_w, dst_h, file_type=".jpeg", opts=None):
    return ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=file_type, width=dst_w, height=dst_h,
        resize_method=ResizeMethod.FIT, encode_timeout=600.0,
        encode_options=opts or {}))


def test_png_batch_to_jpeg_matches_streaming():
    from lilliput_tpu.framebuffer import JPEG_QUALITY
    rgb = _smooth(96, 128, 3, seed=1)
    buf = _png(rgb)
    pipe = StillTranscodePipeline(buf, 48, 48, quality=90)
    outs = pipe.transcode([buf, buf, buf])
    assert len(outs) == 3 and all(o[:3] == b"\xff\xd8\xff" for o in outs)
    assert outs[0] == outs[1] == outs[2]
    fused = np.asarray(Image.open(io.BytesIO(outs[0])).convert("RGB"))
    stream = np.asarray(Image.open(io.BytesIO(
        _streaming(buf, 48, 48, ".jpeg",
                   {JPEG_QUALITY: 90}))).convert("RGB"))
    assert fused.shape == stream.shape == (48, 48, 3)
    assert _psnr(fused, stream) >= 40.0


def test_rgba_png_keeps_alpha_through_png_output():
    rgba = _smooth(80, 64, 4, seed=2).copy()
    rgba[..., 3] = np.linspace(0, 255, 64, dtype=np.uint8)[None, :]
    buf = _png(rgba)
    pipe = StillTranscodePipeline(buf, 32, 40, output_format=".png")
    assert pipe.channels == 4
    out = pipe.transcode([buf])[0]
    got = np.array(Image.open(io.BytesIO(out)))
    assert got.shape == (40, 32, 4)
    want = np.array(Image.open(io.BytesIO(
        _streaming(buf, 32, 40, ".png"))))
    assert want.shape == (40, 32, 4)
    # lossless past the resize: only the fused ±1 tier separates them,
    # alpha included
    assert np.abs(got.astype(np.int16) - want.astype(np.int16)).max() <= 1


def test_rgba_png_to_webp_keeps_alpha():
    rgba = _smooth(64, 64, 4, seed=3).copy()
    rgba[..., 3] = 128
    buf = _png(rgba)
    pipe = StillTranscodePipeline(buf, 32, 32, output_format=".webp",
                                  quality=95)
    out = pipe.transcode([buf])[0]
    assert out[:4] == b"RIFF" and out[8:12] == b"WEBP"
    got = np.array(Image.open(io.BytesIO(out)).convert("RGBA"))
    assert got.shape == (32, 32, 4)
    # alpha plane resizes to the constant 128 (lossy webp may wobble ±1)
    assert np.abs(got[..., 3].astype(np.int16) - 128).max() <= 1


def test_gray_png_produces_grayscale_jpeg_and_png():
    gray = _smooth(72, 96, 1, seed=4)
    buf = _png(gray)
    pipe = StillTranscodePipeline(buf, 36, 36, quality=92)
    assert pipe.channels == 1 and pipe.ncomp == 1
    out = pipe.transcode([buf])[0]
    # 1-component JPEG out (the reference's OpenCV encoder over a
    # 1-channel mat), not a 3x chroma-padded one
    assert J.JpegDecoder(out)._info.num_components == 1
    fused = np.asarray(Image.open(io.BytesIO(out)).convert("L"))
    stream = np.asarray(Image.open(io.BytesIO(
        _streaming(buf, 36, 36, ".jpeg"))).convert("L"))
    assert _psnr(fused, stream) >= 40.0

    pipe_png = StillTranscodePipeline(buf, 36, 36, output_format=".png")
    opng = pipe_png.transcode([buf])[0]
    assert Image.open(io.BytesIO(opng)).mode == "L"


def test_webp_batch_to_jpeg():
    rgb = _smooth(120, 90, 3, seed=5)
    buf = _webp(rgb)
    from lilliput_tpu.framebuffer import JPEG_QUALITY
    pipe = StillTranscodePipeline(buf, 45, 60, quality=90)
    assert pipe.kind == "WebpDecoder"
    out = pipe.transcode([buf, buf])
    fused = np.asarray(Image.open(io.BytesIO(out[0])).convert("RGB"))
    stream = np.asarray(Image.open(io.BytesIO(
        _streaming(buf, 45, 60, ".jpeg",
                   {JPEG_QUALITY: 90}))).convert("RGB"))
    assert fused.shape == stream.shape == (60, 45, 3)
    assert _psnr(fused, stream) >= 40.0


def test_animated_gif_uses_first_frame():
    f0 = _smooth(40, 40, 3, seed=6)
    f1 = np.zeros_like(f0)
    b = io.BytesIO()
    Image.fromarray(f0).save(
        b, "GIF", save_all=True,
        append_images=[Image.fromarray(f1)], duration=100, loop=0)
    buf = b.getvalue()
    pipe = StillTranscodePipeline(buf, 20, 20, quality=92,
                                  output_format=".png")
    out = pipe.transcode([buf])[0]
    got = np.array(Image.open(io.BytesIO(out)).convert("RGB"))
    # first (bright) frame, not the black second frame
    assert got.mean() > 32


def test_validation_rejects_mismatches():
    rgb = _smooth(64, 64, 3, seed=7)
    buf = _png(rgb)
    pipe = StillTranscodePipeline(buf, 32, 32)
    with pytest.raises(DecodingFailedError, match="geometry"):
        pipe.transcode([_png(_smooth(32, 64, 3, seed=7))])
    with pytest.raises(DecodingFailedError, match="format"):
        pipe.transcode([_webp(rgb)])
    with pytest.raises(DecodingFailedError, match="channel"):
        pipe.transcode([_png(_smooth(64, 64, 4, seed=7))])
    import cv2
    jpg = cv2.imencode(".jpg", rgb[:, :, ::-1])[1].tobytes()
    with pytest.raises(DecodingFailedError, match="JPEG"):
        StillTranscodePipeline(jpg, 32, 32)


def test_multigeometry_mixed_formats_restores_order():
    import cv2
    rgb = _smooth(96, 128, 3, seed=8)
    small = _smooth(48, 64, 3, seed=9)
    jpg = cv2.imencode(".jpg", rgb[:, :, ::-1])[1].tobytes()
    png_big = _png(rgb)
    png_small = _png(small)
    webp = _webp(small)
    mg = MultiGeometryPipeline(32, 32, quality=90)
    bufs = [jpg, png_big, webp, png_small, jpg, png_big]
    outs = mg.transcode(bufs)
    assert all(o[:3] == b"\xff\xd8\xff" for o in outs)
    assert outs[0] == outs[4] and outs[1] == outs[5]
    # 4 signatures: jpeg, png 128x96, webp 64x48, png 64x48
    st = mg.stats()
    assert st["geometries_cached"] == 4
    # the two PNG geometries and the JPEG group decode to comparable crops
    a = np.asarray(Image.open(io.BytesIO(outs[0])).convert("RGB"))
    b = np.asarray(Image.open(io.BytesIO(outs[1])).convert("RGB"))
    assert _psnr(a, b) >= 30.0  # same source, jpeg-vs-png decode chain


def test_fused_orientation_matches_preoriented():
    """orientation=6 inside the fused fn == orienting the pixels first
    (same crop/resize math after the transpose)."""
    from lilliput_tpu.ops import orient as O
    from lilliput_tpu.pipeline import fused_still_fit_transcode
    px = _rng(10).integers(0, 256, (2, 40, 64, 3), np.uint8)
    qy, qc = J.scaled_qtables(85)
    a = fused_still_fit_transcode(
        jnp.asarray(px), jnp.asarray(qy), jnp.asarray(qc),
        src_w=64, src_h=40, dst_w=24, dst_h=24, orientation=6,
        emit="pixels")
    pre = np.asarray(O.orient(jnp.asarray(px), 6))
    b = fused_still_fit_transcode(
        jnp.asarray(pre), jnp.asarray(qy), jnp.asarray(qc),
        src_w=40, src_h=64, dst_w=24, dst_h=24, orientation=1,
        emit="pixels")
    assert np.array_equal(np.asarray(a), np.asarray(b))


def test_icc_passthrough_png_to_jpeg():
    from lilliput_tpu.codecs.icc import SRGB_PROFILE
    rgb = _smooth(64, 64, 3, seed=11)
    b = io.BytesIO()
    Image.fromarray(rgb).save(b, "PNG", icc_profile=SRGB_PROFILE)
    buf = b.getvalue()
    assert new_decoder(buf).icc() == SRGB_PROFILE
    pipe = StillTranscodePipeline(buf, 32, 32)
    out = pipe.transcode([buf])[0]
    assert J.read_icc(out) == SRGB_PROFILE


def test_still_transcode_pipelined_overlap_and_equality():
    rgb = _smooth(64, 64, 3, seed=12)
    buf = _png(rgb)
    pipe = StillTranscodePipeline(buf, 32, 32)
    events = []
    orig_dec, orig_enc = pipe.decode_pixels, pipe.encode_entropy

    def dec(*a, **kw):
        events.append("dec")
        return orig_dec(*a, **kw)

    def enc(*a, **kw):
        events.append("enc")
        return orig_enc(*a, **kw)

    pipe.decode_pixels, pipe.encode_entropy = dec, enc
    outs = pipe.transcode_pipelined([[buf]] * 3)
    # host decode of batch i+1 happens before batch i's encode drains
    assert events == ["dec", "dec", "enc", "dec", "enc", "enc"]
    flat = [o for batch in outs for o in batch]
    assert flat[0] == pipe.transcode([buf])[0]


def test_warm_still_specs():
    """MultiGeometryPipeline.warm accepts ('png'|'webp', w, h[, channels])
    still specs; warmed signatures serve matching real traffic without a
    new compile."""
    from lilliput_tpu.utils.metrics import metrics
    mg = MultiGeometryPipeline(32, 32, quality=90)
    rep = mg.warm([("png", 64, 48, 3), ("png", 64, 48, 4),
                   ("webp", 64, 48, 3)])
    assert rep["warmed"] == 3 and rep["compiled_new"] == 3
    before = metrics.snapshot()["counters"].get(
        "serving.geometry_compiles", 0)
    rgb = _smooth(48, 64, 3, seed=20)
    outs = mg.transcode([_png(rgb), _webp(rgb)])
    assert all(o[:3] == b"\xff\xd8\xff" for o in outs)
    after = metrics.snapshot()["counters"].get(
        "serving.geometry_compiles", 0)
    assert after == before  # both signatures were pre-warmed


def test_poison_isolation_still_front():
    """One corrupt PNG in a pixel-domain serving batch must fail only its
    own slot (VERDICT r4 #1) — same contract as the JPEG front."""
    img1, img2 = _smooth(96, 128, 3, 1), _smooth(96, 128, 3, 2)
    b1, b2 = _png(img1), _png(img2)
    pipe = StillTranscodePipeline(b1, 40, 40, quality=90)
    # reference: a same-size all-healthy batch (the still path's batched
    # resize is lane-independent at fixed batch shape; unlike the JPEG
    # coefficient path it is not bit-stable ACROSS batch sizes)
    want = pipe.transcode([b1, b1, b2])
    for poison in (b1[:60],                       # truncated IDAT
                   _png(_smooth(50, 50, 3, 3)),   # geometry mismatch
                   b"garbage bytes"):             # unrecognized format
        outs = pipe.transcode([b1, poison, b2], return_exceptions=True)
        assert outs[0] == want[0]
        assert outs[2] == want[2]
        assert isinstance(outs[1], Exception)
        with pytest.raises(Exception):
            pipe.transcode([b1, poison, b2])


def test_poison_isolation_multigeometry_mixed_formats():
    """Mixed JPEG + PNG traffic with poison in both domains: every healthy
    item transcodes, each poison attaches to its own slot."""
    img = _smooth(80, 120, 3, 5)
    png_buf = _png(img)
    jpg_buf = _streaming(png_buf, 80, 120, ".jpeg")  # make a real JPEG
    mp = MultiGeometryPipeline(32, 32, quality=85)
    # PNG group lands in a 2-lane batch (healthy + zero-filled poison
    # lane): reference it with a same-size healthy batch
    want_p = mp.transcode([png_buf, png_buf])[0]
    solo_j = mp.transcode([jpg_buf])[0]
    bufs = [png_buf, png_buf[:50], jpg_buf, b"\x00" * 40]
    outs = mp.transcode(bufs, return_exceptions=True)
    assert outs[0] == want_p
    assert outs[2] == solo_j
    assert isinstance(outs[1], Exception)
    assert isinstance(outs[3], Exception)


def test_fused_exact_still_byte_identical(monkeypatch):
    """LILLIPUT_FUSED_EXACT=1 on the pixel-domain serving front: fused
    still transcode output becomes byte-identical to the streaming
    ImageOps path (VERDICT r4 #6 tier promotion)."""
    import lilliput_tpu.pipeline as P
    img = _smooth(300, 420, 3, 8)
    buf = _png(img)
    streaming = _streaming(buf, 70, 50, ".png")
    P.fused_still_fit_transcode.clear_cache()
    monkeypatch.setenv("LILLIPUT_FUSED_EXACT", "1")
    try:
        pipe = StillTranscodePipeline(buf, 70, 50, quality=85,
                                      output_format=".png")
        assert pipe.transcode([buf])[0] == streaming
    finally:
        monkeypatch.delenv("LILLIPUT_FUSED_EXACT")
        P.fused_still_fit_transcode.clear_cache()
