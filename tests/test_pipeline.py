"""Serving pipeline tests: fused batched transcode matches the streaming
ImageOps path; multi-geometry routing preserves order and caches programs."""
import jax.numpy as jnp
import numpy as np
import pytest

from lilliput_tpu import binding

if not binding.available():
    pytest.skip("native host library unavailable", allow_module_level=True)

cv2 = pytest.importorskip("cv2")

from lilliput_tpu import ImageOps, ImageOptions, ResizeMethod, new_decoder  # noqa: E402
from lilliput_tpu.framebuffer import JPEG_QUALITY  # noqa: E402
from lilliput_tpu.pipeline import (JpegTranscodePipeline,  # noqa: E402
                                   MultiGeometryPipeline)


def _jpeg(w, h, seed=0, q=88):
    rng = np.random.default_rng(seed)
    img = cv2.resize(rng.integers(0, 256, (10, 10, 3), np.uint8), (w, h),
                     interpolation=cv2.INTER_CUBIC)
    ok, b = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, q])
    return b.tobytes()


def test_fused_pipeline_matches_streaming_transform():
    buf = _jpeg(320, 200)
    pipe = JpegTranscodePipeline(buf, 64, 64, quality=85)
    fused = pipe.transcode([buf])[0]
    streaming = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".jpeg", width=64, height=64, resize_method=ResizeMethod.FIT,
        encode_timeout=600.0, encode_options={JPEG_QUALITY: 85}))
    a = cv2.imdecode(np.frombuffer(fused, np.uint8), cv2.IMREAD_COLOR)
    b = cv2.imdecode(np.frombuffer(streaming, np.uint8), cv2.IMREAD_COLOR)
    # same dense math; tiny f32 reassociation differences possible
    assert a.shape == b.shape == (64, 64, 3)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_multi_geometry_routing():
    bufs = [_jpeg(320, 200, 1), _jpeg(640, 360, 2), _jpeg(320, 200, 3),
            _jpeg(200, 320, 4), _jpeg(640, 360, 5)]
    mp = MultiGeometryPipeline(64, 64, quality=85)
    outs = mp.transcode(bufs)
    assert len(mp._pipes) == 3  # one compiled program per geometry
    for o in outs:
        im = cv2.imdecode(np.frombuffer(o, np.uint8), cv2.IMREAD_COLOR)
        assert im.shape == (64, 64, 3)
    # order preserved: re-running single inputs matches positionally
    for i, buf in enumerate(bufs):
        solo = mp.transcode([buf])[0]
        assert solo == outs[i]


def test_batch_members_independent():
    b1, b2 = _jpeg(320, 200, 7), _jpeg(320, 200, 8)
    pipe = JpegTranscodePipeline(b1, 48, 48, quality=80)
    both = pipe.transcode([b1, b2])
    assert pipe.transcode([b1])[0] == both[0]
    assert pipe.transcode([b2])[0] == both[1]


def test_geometry_mismatch_raises():
    # an image larger than the sample must be rejected BEFORE the native
    # coefficient decode (it would overrun the batch arrays otherwise)
    from lilliput_tpu.errors import DecodingFailedError
    pipe = JpegTranscodePipeline(_jpeg(320, 200), 64, 64)
    with pytest.raises(DecodingFailedError, match="geometry"):
        pipe.transcode([_jpeg(640, 360)])
    with pytest.raises(DecodingFailedError, match="geometry"):
        pipe.decode_entropy([_jpeg(320, 200), _jpeg(1920, 1080)], workers=1)


def test_per_image_quant_tables():
    # same geometry, very different save quality: each image must be
    # dequantized with its own tables, not the sample's
    hi = _jpeg(320, 200, seed=5, q=95)
    lo = _jpeg(320, 200, seed=5, q=30)
    pipe_hi = JpegTranscodePipeline(hi, 64, 64, quality=85)
    mixed = pipe_hi.transcode([hi, lo])
    solo_lo = JpegTranscodePipeline(lo, 64, 64, quality=85).transcode([lo])[0]
    a = cv2.imdecode(np.frombuffer(mixed[1], np.uint8), cv2.IMREAD_COLOR)
    b = cv2.imdecode(np.frombuffer(solo_lo, np.uint8), cv2.IMREAD_COLOR)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def _with_orientation(jpeg: bytes, o: int) -> bytes:
    tiff = (b"II*\x00" + (8).to_bytes(4, "little")
            + (1).to_bytes(2, "little")
            + (0x0112).to_bytes(2, "little") + (3).to_bytes(2, "little")
            + (1).to_bytes(4, "little") + o.to_bytes(2, "little") + b"\x00\x00"
            + (0).to_bytes(4, "little"))
    payload = b"Exif\x00\x00" + tiff
    seg = b"\xff\xe1" + (len(payload) + 2).to_bytes(2, "big") + payload
    return jpeg[:2] + seg + jpeg[2:]


def test_exif_orientation_applied_in_fused_path():
    # oriented phone-photo style input: fused serving output must match the
    # streaming ImageOps path (which orients before fit)
    rot = _with_orientation(_jpeg(320, 200, seed=9), 6)  # rotate 90 CW
    mp = MultiGeometryPipeline(64, 64, quality=85)
    fused = mp.transcode([rot])[0]
    streaming = ImageOps(8192).transform(new_decoder(rot), ImageOptions(
        file_type=".jpeg", width=64, height=64, resize_method=ResizeMethod.FIT,
        encode_timeout=600.0, encode_options={JPEG_QUALITY: 85}))
    a = cv2.imdecode(np.frombuffer(fused, np.uint8), cv2.IMREAD_COLOR)
    b = cv2.imdecode(np.frombuffer(streaming, np.uint8), cv2.IMREAD_COLOR)
    assert a.shape == b.shape == (64, 64, 3)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_orientation_mismatch_raises_on_fixed_pipeline():
    from lilliput_tpu.errors import DecodingFailedError
    plain = _jpeg(320, 200, seed=9)
    pipe = JpegTranscodePipeline(plain, 64, 64)
    with pytest.raises(DecodingFailedError, match="orientation"):
        pipe.transcode([_with_orientation(plain, 3)])


def test_multi_geometry_lru_eviction():
    mp = MultiGeometryPipeline(32, 32, quality=85, max_geometries=2)
    a, b, c = _jpeg(100, 80, 1), _jpeg(120, 90, 2), _jpeg(140, 100, 3)
    mp.transcode([a])
    mp.transcode([b])
    mp.transcode([a])          # touch a: now b is least-recently-used
    mp.transcode([c])          # evicts b, NOT a
    keys = list(mp._pipes.keys())
    assert len(keys) == 2
    widths = sorted(k[0].width for k in keys)
    assert widths == [100, 140]  # a kept, b evicted


def test_pipelined_overlap_structure():
    # the double-buffered loop must issue batch i+1's host decode BEFORE
    # collecting/encoding batch i (that ordering + JAX async dispatch is
    # what overlaps host entropy with device compute)
    buf = _jpeg(160, 120, seed=11)
    pipe = JpegTranscodePipeline(buf, 32, 32)
    events = []
    orig_dec, orig_enc = pipe.decode_entropy, pipe.encode_entropy

    def dec(bufs, workers=None, pool=False, errors=None):
        events.append("dec")
        return orig_dec(bufs, workers=workers, pool=pool, errors=errors)

    def enc(*a, **kw):
        events.append("enc")
        return orig_enc(*a, **kw)

    pipe.decode_entropy, pipe.encode_entropy = dec, enc
    outs = pipe.transcode_pipelined([[buf]] * 3)
    assert events == ["dec", "dec", "enc", "dec", "enc", "enc"]
    flat = [o for batch in outs for o in batch]
    assert all(o[:2] == b"\xff\xd8" for o in flat)
    # and results identical to the unpipelined path
    assert flat[0] == pipe.transcode([buf])[0]


def test_ycc_direct_mode_quality():
    """chroma_mode='direct' (YCbCr-domain transcode, one chroma resample
    instead of three) must decode cleanly and stay within a tight PSNR of
    the parity-mode output; luma especially close."""
    import cv2
    import bench as B
    buf = B._ensure_fixture()
    rgb_pipe = JpegTranscodePipeline(buf, 256, 256, quality=85)
    ycc_pipe = JpegTranscodePipeline(buf, 256, 256, quality=85,
                                     chroma_mode="direct")
    a = rgb_pipe.transcode([buf])[0]
    b = ycc_pipe.transcode([buf])[0]
    ia = cv2.imdecode(np.frombuffer(a, np.uint8), cv2.IMREAD_COLOR)
    ib = cv2.imdecode(np.frombuffer(b, np.uint8), cv2.IMREAD_COLOR)
    assert ia.shape == ib.shape == (256, 256, 3)
    mse = np.mean((ia.astype(np.float64) - ib.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr >= 38.0, f"direct-vs-rgb PSNR {psnr:.1f} dB"
    ya = cv2.cvtColor(ia, cv2.COLOR_BGR2YCrCb)[..., 0].astype(np.float64)
    yb = cv2.cvtColor(ib, cv2.COLOR_BGR2YCrCb)[..., 0].astype(np.float64)
    ymse = np.mean((ya - yb) ** 2)
    ypsnr = 10 * np.log10(255.0 ** 2 / max(ymse, 1e-12))
    assert ypsnr >= 42.0, f"luma PSNR {ypsnr:.1f} dB"


def test_ycc_direct_rejects_unsupported():
    import bench as B
    buf = B._ensure_fixture()
    from lilliput_tpu.errors import DecodingFailedError
    with pytest.raises(DecodingFailedError, match="direct"):
        # odd dims: rejected at construction (fail fast, not mid-batch)
        JpegTranscodePipeline(buf, 255, 255, quality=85,
                              chroma_mode="direct")


def test_multigeometry_direct_mode_fallback():
    """MultiGeometryPipeline(chroma_mode='direct') uses the YCbCr-direct
    path for eligible images and falls back to rgb per group otherwise."""
    import bench as B
    buf = B._ensure_fixture()
    mg = MultiGeometryPipeline(128, 128, quality=85, chroma_mode="direct")
    outs = mg.transcode([buf, buf])
    assert all(o[:2] == b"\xff\xd8" for o in outs)
    pipe = next(iter(mg._pipes.values()))
    assert pipe.chroma_mode == "direct"
    mg_odd = MultiGeometryPipeline(127, 127, quality=85, chroma_mode="direct")
    outs = mg_odd.transcode([buf])
    assert outs[0][:2] == b"\xff\xd8"
    pipe = next(iter(mg_odd._pipes.values()))
    assert pipe.chroma_mode == "rgb"  # odd dims: auto-fallback


def test_pipeline_decode_with_restart_markers():
    """A single restart-marked image through the batched pipeline decodes
    via the intra-image parallel path, byte-identical results."""
    from lilliput_tpu.codecs.jpeg import JpegEncoder
    from lilliput_tpu.framebuffer import Framebuffer, JPEG_RST_INTERVAL
    rng = np.random.default_rng(9)
    img = rng.integers(0, 256, (128, 96, 3), np.uint8)
    rst = JpegEncoder().encode(Framebuffer(img), {JPEG_RST_INTERVAL: 1})
    pipe = JpegTranscodePipeline(rst, 32, 32, quality=85)
    out1 = pipe.transcode([rst])                 # b=1 < workers: intra path
    out4 = pipe.transcode([rst] * 4)
    assert out1[0] == out4[0] == out4[3]


def test_dct_scaled_decode_matches_pil_draft():
    """dequant_idct_scaled (k=4) is libjpeg's 4/8 reduced decode; PIL's
    draft mode uses the same scaled IDCT, so half-res luma must agree
    closely (their fixed-point vs our f32)."""
    import io
    from PIL import Image
    import bench as B
    from lilliput_tpu.codecs.jpeg import JpegDecoder
    from lilliput_tpu.ops import jpeg_kernels as K
    buf = B._ensure_fixture()
    d = JpegDecoder(buf)
    d._decode_coefs_cached()
    qt = d._qtables[d._info.comp_quant_tbl[0]]
    half = np.asarray(K.dequant_idct_scaled(
        jnp.asarray(d._coefs[0]), jnp.asarray(qt), 4))
    half = np.clip(np.round(half), 0, 255).astype(np.uint8)

    im = Image.open(io.BytesIO(buf))
    im.draft("YCbCr", (im.width // 2, im.height // 2))
    ref = np.asarray(im.convert("YCbCr"))[..., 0]
    hh, ww = min(ref.shape[0], half.shape[0]), min(ref.shape[1], half.shape[1])
    diff = half[:hh, :ww].astype(int) - ref[:hh, :ww].astype(int)
    mse = float((diff.astype(np.float64) ** 2).mean())
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr >= 40.0, f"scaled decode vs PIL draft: {psnr:.1f} dB"


def test_dct_scale2_transcode_quality():
    """dct_scale=2 end-to-end: decodes cleanly, close to the full-res
    direct-mode output (reduced decode then resample vs full decode)."""
    import cv2
    import bench as B
    buf = B._ensure_fixture()
    full = JpegTranscodePipeline(buf, 256, 256, quality=85,
                                 chroma_mode="direct")
    half = JpegTranscodePipeline(buf, 256, 256, quality=85,
                                 chroma_mode="direct", dct_scale=2)
    a = cv2.imdecode(np.frombuffer(full.transcode([buf])[0], np.uint8),
                     cv2.IMREAD_COLOR)
    b = cv2.imdecode(np.frombuffer(half.transcode([buf])[0], np.uint8),
                     cv2.IMREAD_COLOR)
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr >= 34.0, f"dct_scale=2 vs full: {psnr:.1f} dB"


def _gray_jpeg(w, h, seed=0, q=90):
    rng = np.random.default_rng(seed)
    img = cv2.resize(rng.integers(0, 256, (10, 10), np.uint8), (w, h),
                     interpolation=cv2.INTER_CUBIC)
    ok, b = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, q])
    return b.tobytes()


def test_fused_pipeline_grayscale_matches_streaming():
    """1-component JPEGs batch through the luma-only fused path; output is
    a grayscale JPEG matching the streaming Transform."""
    buf = _gray_jpeg(320, 200, seed=3)
    pipe = JpegTranscodePipeline(buf, 64, 64, quality=85)
    assert pipe.ncomp == 1
    fused = pipe.transcode([buf, buf])
    assert fused[0] == fused[1]
    streaming = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".jpeg", width=64, height=64,
        resize_method=ResizeMethod.FIT, encode_timeout=600.0,
        encode_options={JPEG_QUALITY: 85}))
    a = cv2.imdecode(np.frombuffer(fused[0], np.uint8),
                     cv2.IMREAD_UNCHANGED)
    b = cv2.imdecode(np.frombuffer(streaming, np.uint8),
                     cv2.IMREAD_UNCHANGED)
    assert a.ndim == b.ndim == 2          # both stayed single-channel
    assert a.shape == b.shape == (64, 64)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_fused_pipeline_grayscale_oriented():
    """Grayscale + EXIF orientation routes through the orient path."""
    buf = _with_orientation(_gray_jpeg(200, 320, seed=4), 6)
    pipe = JpegTranscodePipeline(buf, 48, 48, quality=85)
    out = pipe.transcode([buf])[0]
    streaming = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".jpeg", width=48, height=48,
        resize_method=ResizeMethod.FIT, encode_timeout=600.0,
        encode_options={JPEG_QUALITY: 85}))
    a = cv2.imdecode(np.frombuffer(out, np.uint8), cv2.IMREAD_UNCHANGED)
    b = cv2.imdecode(np.frombuffer(streaming, np.uint8),
                     cv2.IMREAD_UNCHANGED)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_grayscale_dct_scale_truncation():
    """Grayscale + dct_scale=2: reduced decode with host coefficient
    truncation still yields a sane thumbnail (PSNR vs full decode)."""
    buf = _gray_jpeg(512, 384, seed=7)
    full = JpegTranscodePipeline(buf, 128, 128, quality=85)
    half = JpegTranscodePipeline(buf, 128, 128, quality=85,
                                 chroma_mode="direct", dct_scale=2)
    assert half.decode_entropy([buf])[0].shape[-1] == 16  # truncated
    a = cv2.imdecode(np.frombuffer(full.transcode([buf])[0], np.uint8),
                     cv2.IMREAD_UNCHANGED)
    b = cv2.imdecode(np.frombuffer(half.transcode([buf])[0], np.uint8),
                     cv2.IMREAD_UNCHANGED)
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr >= 34.0, f"gray dct_scale=2 vs full: {psnr:.1f} dB"


def test_direct_mode_preconditions_fail_fast():
    """Ineligible direct-mode pipelines raise at construction (upright /
    4:2:0 / even dims / AREA), for the sharded subclass too — silent
    un-rotated output is not acceptable."""
    from lilliput_tpu.errors import DecodingFailedError
    oriented = _with_orientation(_jpeg(320, 200, seed=6), 6)
    with pytest.raises(DecodingFailedError, match="direct"):
        JpegTranscodePipeline(oriented, 64, 64, chroma_mode="direct")
    with pytest.raises(DecodingFailedError, match="orientation"):
        JpegTranscodePipeline(oriented, 64, 64, chroma_mode="direct",
                              dct_scale=2)
    with pytest.raises(DecodingFailedError, match="direct"):
        JpegTranscodePipeline(_jpeg(320, 200, seed=6), 63, 64,
                              chroma_mode="direct")
    from lilliput_tpu.parallel import ShardedJpegPipeline
    from lilliput_tpu.parallel.mesh import make_mesh
    with pytest.raises(DecodingFailedError, match="direct"):
        ShardedJpegPipeline(oriented, 64, 64, chroma_mode="direct",
                            mesh=make_mesh(8))


def test_fused_unbatched_lead_shape():
    """fused_jpeg_fit_transcode with no leading batch dim returns unbatched
    coefficient arrays (the block tail must restore leading dims)."""
    from lilliput_tpu.pipeline import fused_jpeg_fit_transcode
    import jax
    buf = _jpeg(128, 96, seed=8)
    pipe = JpegTranscodePipeline(buf, 32, 32, quality=85)
    ys, cbs, crs, qty, qtc = pipe.decode_entropy([buf])
    g = pipe.geom
    out = fused_jpeg_fit_transcode(
        jnp.asarray(ys[0]), jnp.asarray(cbs[0]), jnp.asarray(crs[0]),
        jnp.asarray(qty[0]), jnp.asarray(qtc[0]),
        pipe.enc_qt_y, pipe.enc_qt_c,
        src_w=g.width, src_h=g.height, h2=g.h2, v2=g.v2,
        dst_w=32, dst_h=32, window=pipe.window_static)
    assert out[0].ndim == 3       # (bh, bw, 64), no spurious batch dim
    batched = fused_jpeg_fit_transcode(
        jnp.asarray(ys), jnp.asarray(cbs), jnp.asarray(crs),
        jnp.asarray(qty), jnp.asarray(qtc),
        pipe.enc_qt_y, pipe.enc_qt_c,
        src_w=g.width, src_h=g.height, h2=g.h2, v2=g.v2,
        dst_w=32, dst_h=32, window=pipe.window_static)
    for a, b in zip(out, batched):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b[0]))


def test_multi_geometry_mixes_gray_and_color():
    bufs = [_jpeg(320, 200, 1), _gray_jpeg(320, 200, 2),
            _jpeg(320, 200, 3), _gray_jpeg(200, 320, 4)]
    mp = MultiGeometryPipeline(64, 64, quality=85)
    outs = mp.transcode(bufs)
    for i, o in enumerate(outs):
        im = cv2.imdecode(np.frombuffer(o, np.uint8), cv2.IMREAD_UNCHANGED)
        assert im.shape[:2] == (64, 64)
        solo = mp.transcode([bufs[i]])[0]
        assert solo == o


def test_fused_pipeline_422_matches_streaming():
    """4:2:2 source through the fused pipeline (per-axis subsampled window
    + megakernel-backed decode) matches the streaming Transform."""
    import io
    from PIL import Image
    rng = np.random.default_rng(31)
    img = rng.integers(0, 256, (120, 180, 3), np.uint8)
    bio = io.BytesIO()
    Image.fromarray(img).save(bio, format="JPEG", quality=90, subsampling=1)
    buf = bio.getvalue()
    pipe = JpegTranscodePipeline(buf, 64, 64, quality=85)
    assert pipe.geom.h2 and not pipe.geom.v2          # really 4:2:2
    fused = pipe.transcode([buf])[0]
    streaming = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".jpeg", width=64, height=64,
        resize_method=ResizeMethod.FIT, encode_timeout=600.0,
        encode_options={JPEG_QUALITY: 85}))
    import cv2
    a = cv2.imdecode(np.frombuffer(fused, np.uint8), cv2.IMREAD_COLOR)
    b = cv2.imdecode(np.frombuffer(streaming, np.uint8), cv2.IMREAD_COLOR)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_host_windowed_decode_byte_identical_to_full():
    """decode_entropy ships only the MCU decode window (host-side slicing);
    output bytes must equal the full-coefficient in-graph-slicing path
    exactly (identical blocks reach identical ops)."""
    for dims, mode in (((640, 480), "rgb"), ((610, 414), "rgb"),
                       ((640, 480), "direct")):
        buf = _jpeg(*dims, seed=21)
        pipe = JpegTranscodePipeline(buf, 100, 100, quality=85,
                                     chroma_mode=mode)
        assert pipe.window_static is not None
        windowed = pipe.transcode([buf, buf])
        full = JpegTranscodePipeline(buf, 100, 100, quality=85,
                                     chroma_mode=mode)
        full._window = None
        full.window_static = None
        assert windowed == full.transcode([buf, buf])


def test_dct_scale_coef_truncation_byte_identical():
    """dct_scale>1 ships only the kxk corner coefficients to the device
    (decode_entropy host-side truncation); output bytes must equal the
    full-coefficient path exactly (the scaled IDCT reads no other lanes)."""
    from lilliput_tpu.pipeline import fused_jpeg_fit_transcode_ycc
    buf = _jpeg(512, 384, seed=11)
    for s in (2, 4):
        k = 8 // s
        pipe = JpegTranscodePipeline(buf, 128, 128, quality=85,
                                     chroma_mode="direct", dct_scale=s)
        coefs = pipe.decode_entropy([buf, buf])
        assert coefs[0].shape[-1] == k * k  # truncated on host
        truncated = pipe.transcode([buf, buf])

        full = JpegTranscodePipeline(buf, 128, 128, quality=85,
                                     chroma_mode="direct")
        ys, cbs, crs, qty, qtc = full.decode_entropy([buf, buf])
        out = fused_jpeg_fit_transcode_ycc(
            jnp.asarray(ys), jnp.asarray(cbs), jnp.asarray(crs),
            jnp.asarray(qty), jnp.asarray(qtc),
            pipe.enc_qt_y, pipe.enc_qt_c,
            src_w=pipe.geom.width, src_h=pipe.geom.height,
            dst_w=128, dst_h=128, dct_scale=s,
            window=full.window_static)
        ref = pipe.encode_entropy(*[np.asarray(a) for a in out])
        assert truncated == ref


def test_dct_scale4_transcode_quality():
    """dct_scale=4 (2x2 coefficients) still downscales for the headline
    shape; quality bar is looser (quarter-res reconstruction)."""
    import cv2
    import bench as B
    buf = B._ensure_fixture()
    full = JpegTranscodePipeline(buf, 256, 256, quality=85,
                                 chroma_mode="direct")
    quarter = JpegTranscodePipeline(buf, 256, 256, quality=85,
                                    chroma_mode="direct", dct_scale=4)
    a = cv2.imdecode(np.frombuffer(full.transcode([buf])[0], np.uint8),
                     cv2.IMREAD_COLOR)
    b = cv2.imdecode(np.frombuffer(quarter.transcode([buf])[0], np.uint8),
                     cv2.IMREAD_COLOR)
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
    assert psnr >= 28.0, f"dct_scale=4 vs full: {psnr:.1f} dB"


def test_mm3_resize_wiring_close(monkeypatch):
    """The exact-split resize path (LILLIPUT_RESIZE_MM3, forced on here)
    through the fused pipeline modes that run it on CPU — direct and
    dct_scale (the rgb block tail is megakernel-gated, TPU-only; its resize
    call is the same resize_area_plane_mat covered by the unit tests).
    The pre-encode contract is +-1 px; JPEG quantization can amplify a
    1-level pixel flip within one 8x8 block after decode, so gate on PSNR
    of the decoded outputs rather than a max-diff."""
    buf = _jpeg(640, 360, seed=21, q=90)

    def outs(env):
        # the fused entry points are module-level jits whose traces bake in
        # the env-gated resize path — clear them so each setting retraces
        import lilliput_tpu.pipeline as P
        for f in (P.fused_jpeg_fit_transcode, P.fused_jpeg_fit_transcode_ycc,
                  P._fused_jpeg_fit_donating):
            f.clear_cache()
        monkeypatch.setenv("LILLIPUT_RESIZE_MM3", env)
        direct = JpegTranscodePipeline(
            buf, 64, 64, quality=85, chroma_mode="direct").transcode([buf])[0]
        scaled = JpegTranscodePipeline(
            buf, 64, 64, quality=85, chroma_mode="direct",
            dct_scale=2).transcode([buf])[0]
        return [cv2.imdecode(np.frombuffer(o, np.uint8), cv2.IMREAD_COLOR)
                for o in (direct, scaled)]

    on = outs("1")
    off = outs("0")
    for a, b in zip(on, off):
        mse = ((a.astype(np.float64) - b) ** 2).mean()
        psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))
        assert psnr >= 55.0


def _jpeg_with_icc(w, h, icc, seed=3):
    import io
    from PIL import Image
    rng = np.random.default_rng(seed)
    im = Image.fromarray(rng.integers(0, 256, (h, w, 3), np.uint8))
    bio = io.BytesIO()
    im.save(bio, format="JPEG", quality=90, subsampling=2, icc_profile=icc)
    return bio.getvalue()


def test_serving_preserves_icc_profile():
    """Color profiles survive the fused serving transcode (the reference's
    Transform keeps the source ICC on JPEG->JPEG; the streaming path here
    already did — the serving encode attaches the same APP2 payload)."""
    from lilliput_tpu.codecs import jpeg as J
    icc = open("lilliput_tpu/icc_profiles/rec2020_profile.icc", "rb").read()
    buf = _jpeg_with_icc(160, 120, icc)
    assert J.read_icc(buf) == icc
    for mode in ("rgb", "direct"):
        pipe = JpegTranscodePipeline(buf, 64, 64, quality=85,
                                     chroma_mode=mode)
        out = pipe.transcode([buf])[0]
        assert J.read_icc(out) == icc, mode
    # pipelined path carries per-batch profiles too
    pipe = JpegTranscodePipeline(buf, 64, 64, quality=85)
    res = pipe.transcode_pipelined([[buf], [buf]])
    assert all(J.read_icc(r[0]) == icc for r in res)


def test_serving_icc_multichunk_and_absent():
    """>64 KB profiles span multiple APP2 chunks both ways (PIL splits on
    write, read_icc reassembles; libjpeg re-chunks on our encode); sources
    without a profile stay profile-free."""
    from lilliput_tpu.codecs import jpeg as J
    base = open("lilliput_tpu/icc_profiles/srgb_profile.icc", "rb").read()
    big = base + bytes(150_000)  # forces multi-chunk APP2
    buf = _jpeg_with_icc(96, 96, big, seed=4)
    assert J.read_icc(buf) == big
    out = JpegTranscodePipeline(buf, 48, 48, quality=85).transcode([buf])[0]
    assert J.read_icc(out) == big
    # PIL agrees on the reassembled payload of our own encode
    import io
    from PIL import Image
    assert Image.open(io.BytesIO(out)).info.get("icc_profile") == big

    plain = _jpeg(200, 150, seed=5)
    assert J.read_icc(plain) == b""
    out2 = JpegTranscodePipeline(plain, 64, 64, quality=85).transcode(
        [plain])[0]
    assert J.read_icc(out2) == b""


def _psnr(a, b):
    mse = ((a.astype(np.float64) - b) ** 2).mean()
    return 10 * np.log10(255.0 ** 2 / max(mse, 1e-12))


def test_serving_webp_output_matches_streaming():
    """output_format='.webp': device emits packed BGRA pixels and the host
    webp encoder produces the container — decoded output must sit within a
    tight PSNR of the streaming ImageOps .webp path (same pixels +-1 in,
    same libwebp encode settings)."""
    import io
    from PIL import Image
    from lilliput_tpu.framebuffer import WEBP_QUALITY
    buf = _jpeg(320, 200, seed=31)
    pipe = JpegTranscodePipeline(buf, 64, 64, quality=85,
                                 output_format=".webp")
    fused = pipe.transcode([buf])[0]
    assert fused[:4] == b"RIFF" and fused[8:12] == b"WEBP"
    streaming = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".webp", width=64, height=64,
        resize_method=ResizeMethod.FIT, encode_timeout=600.0,
        encode_options={WEBP_QUALITY: 85}))
    a = np.asarray(Image.open(io.BytesIO(fused)).convert("RGB"))
    b = np.asarray(Image.open(io.BytesIO(streaming)).convert("RGB"))
    assert a.shape == b.shape == (64, 64, 3)
    assert _psnr(a, b) >= 40.0


def test_serving_png_output_lossless_vs_streaming():
    """output_format='.png' is lossless past the device resize, so decoded
    pixels must match the streaming .png path within the +-1 fused
    contract exactly."""
    import io
    from PIL import Image
    buf = _jpeg(320, 200, seed=32)
    fused = JpegTranscodePipeline(buf, 64, 64,
                                  output_format=".png").transcode([buf])[0]
    assert fused[:8] == b"\x89PNG\r\n\x1a\n"
    streaming = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".png", width=64, height=64,
        resize_method=ResizeMethod.FIT, encode_timeout=600.0))
    a = np.asarray(Image.open(io.BytesIO(fused)).convert("RGB"))
    b = np.asarray(Image.open(io.BytesIO(streaming)).convert("RGB"))
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


def test_serving_still_outputs_carry_icc_and_gray_and_direct():
    import io
    from PIL import Image
    icc = open("lilliput_tpu/icc_profiles/rec709_profile.icc", "rb").read()
    buf = _jpeg_with_icc(160, 120, icc, seed=33)
    for fmt in (".webp", ".png"):
        out = JpegTranscodePipeline(buf, 48, 48,
                                    output_format=fmt).transcode([buf])[0]
        got = Image.open(io.BytesIO(out)).info.get("icc_profile")
        assert got == icc, fmt
    # grayscale source -> webp still
    gray = cv2.imencode(".jpg", cv2.imdecode(
        np.frombuffer(_jpeg(160, 120, seed=34), np.uint8),
        cv2.IMREAD_GRAYSCALE))[1].tobytes()
    outg = JpegTranscodePipeline(gray, 40, 40,
                                 output_format=".webp").transcode([gray])[0]
    img = np.asarray(Image.open(io.BytesIO(outg)).convert("RGB"))
    assert img.shape == (40, 40, 3)
    # grays stay neutral (b == g == r after lossy round trip, within 2)
    assert np.abs(img[..., 0].astype(int) - img[..., 1].astype(int)).max() <= 2
    # direct mode pixels -> webp: close to the rgb-mode webp output
    buf2 = _jpeg(320, 200, seed=35)
    a = JpegTranscodePipeline(buf2, 64, 64, chroma_mode="direct",
                              output_format=".webp").transcode([buf2])[0]
    b = JpegTranscodePipeline(buf2, 64, 64,
                              output_format=".webp").transcode([buf2])[0]
    ia = np.asarray(Image.open(io.BytesIO(a)).convert("RGB"))
    ib = np.asarray(Image.open(io.BytesIO(b)).convert("RGB"))
    assert _psnr(ia, ib) >= 33.0


def test_multi_geometry_webp_output():
    import io
    from PIL import Image
    bufs = [_jpeg(320, 200, 41), _jpeg(200, 320, 42)]
    mp = MultiGeometryPipeline(32, 32, quality=85, output_format=".webp")
    outs = mp.transcode(bufs)
    for o in outs:
        assert np.asarray(Image.open(io.BytesIO(o)).convert(
            "RGB")).shape == (32, 32, 3)


def _app2_icc_chunk(seq: int, cnt: int, payload: bytes) -> bytes:
    body = b"ICC_PROFILE\x00" + bytes([seq, cnt]) + payload
    return b"\xff\xe2" + (len(body) + 2).to_bytes(2, "big") + body


def test_read_icc_all_or_nothing():
    """read_icc matches libjpeg's jpeg_read_icc_profile strictness (the
    codepath the reference uses, opencv.cpp:247-291): a duplicate sequence
    number or a chunk whose count byte disagrees with the first chunk's
    invalidates the WHOLE profile — no best-effort assembly of a profile
    the reference would drop."""
    from lilliput_tpu.codecs.jpeg import read_icc
    good = (b"\xff\xd8" + _app2_icc_chunk(1, 2, b"AB")
            + _app2_icc_chunk(2, 2, b"CD") + b"\xff\xd9")
    assert read_icc(good) == b"ABCD"
    # duplicate seq even though both seqs are eventually present
    dup = (b"\xff\xd8" + _app2_icc_chunk(1, 2, b"AB")
           + _app2_icc_chunk(2, 2, b"CD")
           + _app2_icc_chunk(1, 2, b"XX") + b"\xff\xd9")
    assert read_icc(dup) == b""
    # inconsistent count byte mid-stream, followed by a 'correcting' chunk
    bad_count = (b"\xff\xd8" + _app2_icc_chunk(1, 2, b"AB")
                 + _app2_icc_chunk(2, 3, b"ZZ")
                 + _app2_icc_chunk(2, 2, b"CD") + b"\xff\xd9")
    assert read_icc(bad_count) == b""


def test_validate_header_rechecks_subsampling():
    """A tiny 4:1:1 JPEG can have IDENTICAL geometry_of() to a 4:4:4
    sample (all-(1,1) block counts, h2=v2=False at <=8px axes) while its
    chroma needs 4x horizontal upsampling — _validate_header must re-check
    supported_subsampling per request, not rely on geometry equality."""
    import ctypes
    import jax.numpy as jnp
    from lilliput_tpu import binding
    from lilliput_tpu.codecs import jpeg as J
    from lilliput_tpu.errors import DecodingFailedError
    from lilliput_tpu.ops import jpeg_kernels as K
    from lilliput_tpu.pipeline import geometry_of

    lib = binding.load()
    _i16 = ctypes.POINTER(ctypes.c_int16)
    qt = np.asarray(J.scaled_qtables(88)[0])
    rng = np.random.default_rng(21)

    def quant(p):
        return np.asarray(K.fdct_quant(
            jnp.asarray(p), jnp.asarray(qt))).astype(np.int16)

    # one 8x8 block per component: luma at 8x8, chroma 2px wide edge-padded
    yq = quant(rng.integers(0, 256, (8, 8)).astype(np.float32))
    cpl = np.pad(rng.integers(0, 256, (8, 2)).astype(np.float32),
                 ((0, 0), (0, 6)), mode="edge")
    cbq, crq = quant(cpl), quant(cpl)
    hs = (ctypes.c_int32 * 3)(4, 1, 1)
    vs = (ctypes.c_int32 * 3)(1, 1, 1)
    ptrs = (_i16 * 3)(*[np.ascontiguousarray(a).ctypes.data_as(_i16)
                        for a in (yq, cbq, crq)])
    qp = ctypes.POINTER(ctypes.c_uint16)
    out = np.empty(1 << 20, np.uint8)
    n = lib.lp_jpeg_encode_coefs(
        8, 8, 3, hs, vs, ptrs, qt.ctypes.data_as(qp), qt.ctypes.data_as(qp),
        0, 0, 0, None, 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size)
    assert n > 0
    bad = out[:n].tobytes()

    import io
    from PIL import Image
    bio = io.BytesIO()
    Image.fromarray(rng.integers(0, 256, (8, 8, 3), np.uint8)).save(
        bio, format="JPEG", quality=88, subsampling=0)  # 4:4:4
    sample = bio.getvalue()
    pipe = JpegTranscodePipeline(sample, 8, 8, quality=85)
    # the collision is real: geometry (incl. h2/v2 flags) matches exactly
    info = pipe._validate_header(sample)
    binfo = J._JpegInfo()
    arr = np.frombuffer(bad, np.uint8)
    assert lib.lp_jpeg_get_info(
        arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), arr.size,
        ctypes.byref(binfo)) == 0
    assert geometry_of(binfo) == geometry_of(info) == pipe.geom
    with pytest.raises(DecodingFailedError, match="subsampling"):
        pipe._validate_header(bad)


def test_read_icc_skips_fill_bytes():
    """0xFF fill bytes before a marker are legal padding (T.81 B.1.1.2);
    the APP2 walk must skip them, not mis-read a segment length."""
    from lilliput_tpu.codecs import jpeg as J
    icc = open("lilliput_tpu/icc_profiles/srgb_profile.icc", "rb").read()
    buf = _jpeg_with_icc(64, 48, icc, seed=51)
    idx = buf.find(b"\xff\xe2")
    assert idx > 0
    padded = buf[:idx] + b"\xff\xff\xff" + buf[idx:]
    assert J.read_icc(padded) == icc


def test_pipelined_webp_output():
    """transcode_pipelined with a still output format: same bytes as the
    unpipelined path, batch order preserved."""
    buf = _jpeg(160, 120, seed=61)
    pipe = JpegTranscodePipeline(buf, 32, 32, output_format=".webp")
    res = pipe.transcode_pipelined([[buf], [buf, buf]])
    assert [len(r) for r in res] == [1, 2]
    flat = [o for batch in res for o in batch]
    assert all(o[:4] == b"RIFF" for o in flat)
    assert flat[0] == pipe.transcode([buf])[0]


def test_serving_rejects_exotic_subsampling():
    """4:1:1 sources must raise the decoder's typed error, not produce a
    broken geometry (the 4x horizontal factor is outside the 1x/2x device
    decode paths, same gate as JpegDecoder.decode_to)."""
    import ctypes
    from lilliput_tpu import binding
    from lilliput_tpu.codecs import jpeg as J
    from lilliput_tpu.errors import DecodingFailedError
    from lilliput_tpu.ops import jpeg_kernels as K

    lib = binding.load()
    _i16 = ctypes.POINTER(ctypes.c_int16)
    qt = np.asarray(J.scaled_qtables(88)[0])
    rng = np.random.default_rng(3)
    w, h = 128, 64

    def quant(p):
        ph = (p.shape[0] + 7) // 8 * 8
        pw = (p.shape[1] + 7) // 8 * 8
        pp = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                    mode="edge")
        return np.asarray(K.fdct_quant(
            jnp.asarray(pp), jnp.asarray(qt))).astype(np.int16)

    yq = quant(rng.integers(0, 256, (h, w)).astype(np.float32))
    cbq = quant(rng.integers(0, 256, (h, w // 4)).astype(np.float32))
    crq = quant(rng.integers(0, 256, (h, w // 4)).astype(np.float32))
    hs = (ctypes.c_int32 * 3)(4, 1, 1)
    vs = (ctypes.c_int32 * 3)(1, 1, 1)
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
    with pytest.raises(DecodingFailedError, match="subsampling"):
        JpegTranscodePipeline(buf, 32, 32)


def test_synthetic_jpeg_geometries():
    """synthetic_jpeg produces decodable JPEGs of the EXACT requested
    geometry (the warm() probe input)."""
    from PIL import Image
    import io
    from lilliput_tpu.codecs.jpeg import synthetic_jpeg, JpegDecoder
    for (w, h, sub) in [(320, 200, "420"), (97, 61, "422"),
                        (64, 48, "440"), (33, 47, "444")]:
        buf = synthetic_jpeg(w, h, sub)
        hd = JpegDecoder(buf).header()
        assert (hd.width, hd.height) == (w, h)
        im = Image.open(io.BytesIO(buf))
        assert im.size == (w, h)
    g = synthetic_jpeg(50, 40, gray=True)
    assert JpegDecoder(g).header().channels == 1


def test_warm_and_eviction_metrics():
    """warm() pre-compiles the expected geometry set; the LRU surfaces
    compiles/hits/evictions through the metrics registry (round-2 VERDICT
    next-step #7)."""
    from lilliput_tpu.utils.metrics import metrics
    metrics.reset()
    mp = MultiGeometryPipeline(32, 32, quality=85, max_geometries=2)
    rep = mp.warm([(120, 90), (100, 76, "422")])
    assert rep == {"warmed": 2, "compiled_new": 2, "seconds": rep["seconds"]}
    st = mp.stats()
    assert st["geometries_cached"] == 2 and st["compiles"] == 2
    # warmed geometry served without a new pipeline
    mp.transcode([_jpeg(120, 90, seed=9)])
    assert mp.stats()["hits"] >= 1
    assert mp.stats()["compiles"] == 2
    # a third geometry evicts the LRU entry (max_geometries=2)
    mp.transcode([_jpeg(320, 200, seed=9)])
    st = mp.stats()
    assert st["evictions"] == 1 and st["geometries_cached"] == 2


_COLD_START_CHILD = r"""
import json, os, sys, time
import jax
jax.config.update("jax_platforms", "cpu")  # site plugin forces axon
import lilliput_tpu  # wires the persistent cache from LILLIPUT_COMPILE_CACHE
from lilliput_tpu import MultiGeometryPipeline
t0 = time.time()
mp = MultiGeometryPipeline(32, 32, quality=85)
rep = mp.warm([(120, 90), (100, 76, "422")])
print(json.dumps({"warm": rep, "total_s": round(time.time() - t0, 2),
                  "cache_dir": jax.config.jax_compilation_cache_dir}))
"""


def test_warm_persistent_cache_cold_start(tmp_path):
    """The round-2 VERDICT #7 acceptance gate: with the persistent compile
    cache wired by default, a SECOND process warming the same geometry set
    compiles zero new XLA programs (cache-dir file set unchanged)."""
    import json
    import os
    import subprocess
    import sys
    cache = tmp_path / "compile_cache"
    env = dict(os.environ)
    env.pop("JAX_COMPILATION_CACHE_DIR", None)
    env["LILLIPUT_COMPILE_CACHE"] = str(cache)
    # CPU compiles of tiny geometries can be under jax's 1s persistence
    # threshold; a serving TPU compile never is
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "0"

    def run():
        r = subprocess.run([sys.executable, "-c", _COLD_START_CHILD],
                           capture_output=True, text=True, env=env,
                           cwd="/root/repo", timeout=600)
        assert r.returncode == 0, r.stdout + r.stderr
        return json.loads(r.stdout.strip().splitlines()[-1])

    rep1 = run()
    assert rep1["cache_dir"] == str(cache)
    files1 = sorted(p.name for p in cache.rglob("*") if p.is_file())
    assert files1, "first run persisted no compiled programs"
    rep2 = run()
    files2 = sorted(p.name for p in cache.rglob("*") if p.is_file())
    assert files2 == files1, (
        f"second process compiled new programs: {set(files2) - set(files1)}")
    assert rep2["warm"]["warmed"] == 2


def test_poison_isolation_jpeg_front():
    """One corrupt buffer in a batch must fail only its own slot (VERDICT
    r4 #1): healthy co-batched items transcode byte-identically to solo
    runs, the failing slot carries its exception, and the isolation is
    visible in the serving.poison_isolated counter. Matches the per-request
    failure scoping of the reference (one decoder per request,
    lilliput.go:129)."""
    from lilliput_tpu.errors import DecodingFailedError
    from lilliput_tpu.utils.metrics import metrics
    g1, g2 = _jpeg(320, 200, 11), _jpeg(320, 200, 12)
    pipe = JpegTranscodePipeline(g1, 64, 64, quality=85)
    solo1 = pipe.transcode([g1])[0]
    solo2 = pipe.transcode([g2])[0]
    for poison in (_jpeg(320, 200, 13)[:100],        # truncated scan
                   _jpeg(640, 360, 14),              # geometry mismatch
                   b"\xff\xd8\xff\xe0garbage"):      # unparseable header
        metrics.reset()
        outs = pipe.transcode([g1, poison, g2], return_exceptions=True)
        assert outs[0] == solo1
        assert outs[2] == solo2
        assert isinstance(outs[1], DecodingFailedError)
        snap = metrics.snapshot()["counters"]
        assert snap.get("serving.poison_isolated") == 1
        # default mode still raises (after healthy work completed)
        with pytest.raises(DecodingFailedError):
            pipe.transcode([g1, poison, g2])


def test_poison_isolation_jpeg_pooled_no_leak():
    """A failed lane in a POOLED coefficient batch must not leak the
    previous batch's coefficients: the isolated slot zero-fills, so even
    if its (discarded) output were observed it encodes black."""
    g = _jpeg(320, 200, 21)
    other = _jpeg(320, 200, 22)
    pipe = JpegTranscodePipeline(g, 48, 48, quality=85)
    # populate the pool slots with real coefficient data
    pipe.transcode([g, other])
    pipe.transcode([g, other])
    errors = {}
    arrs = pipe.decode_entropy([g, other[:80]], pool=True, errors=errors)
    assert list(errors) == [1]
    assert not np.any(arrs[0][1])          # luma lane wiped
    assert not np.any(arrs[3][1])          # qtable lane wiped


def test_poison_isolation_multigeometry_routing():
    """MultiGeometryPipeline: buffers that fail ROUTING (unrecognized
    format / unparseable header) and buffers that fail inside a group are
    both isolated to their own slots across a mixed batch."""
    from lilliput_tpu.errors import DecodingFailedError, InvalidImageError
    b1, b2 = _jpeg(320, 200, 31), _jpeg(640, 360, 32)
    mp = MultiGeometryPipeline(64, 64, quality=85)
    solo1 = mp.transcode([b1])[0]
    solo2 = mp.transcode([b2])[0]
    bufs = [b1, b"not an image at all", b2, b1[:90]]
    outs = mp.transcode(bufs, return_exceptions=True)
    assert outs[0] == solo1
    assert outs[2] == solo2
    assert isinstance(outs[1], InvalidImageError)
    assert isinstance(outs[3], (DecodingFailedError, InvalidImageError))
    with pytest.raises(Exception):
        mp.transcode(bufs)


def test_poison_isolation_transcode_pipelined():
    """The double-buffered path carries the same per-item contract: a
    poisoned batch in the stream fails only its own slots."""
    g1, g2 = _jpeg(320, 200, 41), _jpeg(320, 200, 42)
    pipe = JpegTranscodePipeline(g1, 64, 64, quality=85)
    want = pipe.transcode([g1, g2])
    res = pipe.transcode_pipelined(
        [[g1, g2], [g1, g1[:70], g2]], return_exceptions=True)
    assert res[0] == want
    assert res[1][0] == want[0]
    assert res[1][2] == want[1]
    assert isinstance(res[1][1], Exception)


def _clear_fused_caches():
    import lilliput_tpu.pipeline as P
    for f in (P.fused_jpeg_fit_transcode, P.fused_jpeg_fit_transcode_ycc,
              P._fused_jpeg_fit_donating, P.fused_still_fit_transcode,
              P.fused_jpeg_fit_transcode_gray, P._fused_jpeg_fit_gray_donating):
        f.clear_cache()


@pytest.mark.parametrize("geom", [(640, 360, 64, 64), (512, 512, 128, 128),
                                  (256, 256, 128, 128), (320, 199, 48, 36)])
def test_fused_exact_byte_identical_to_streaming(geom, monkeypatch):
    """LILLIPUT_FUSED_EXACT=1 (VERDICT r4 #6): the fused serving path's
    sequential-tap AREA resize reproduces the streaming path's f32 tap
    order exactly, promoting fused-vs-streaming from ±1 u8 to
    BYTE-IDENTICAL output files — covering the general-tap scale, the
    integer-ratio fast path, and the 2x2 specialization. Compared via
    lossless .png outputs so the equality includes every stage."""
    from lilliput_tpu import ImageOps, ImageOptions, ResizeMethod, new_decoder
    w, h, dw, dh = geom
    buf = _jpeg(w, h, seed=(w ^ h) & 127, q=88)
    streaming = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".png", width=dw, height=dh,
        resize_method=ResizeMethod.FIT, encode_timeout=600.0))

    def run(env):
        _clear_fused_caches()
        monkeypatch.setenv("LILLIPUT_FUSED_EXACT", env)
        pipe = JpegTranscodePipeline(buf, dw, dh, quality=85,
                                     output_format=".png")
        return pipe.transcode([buf])[0]

    exact = run("1")
    assert exact == streaming, "exact fused path must match streaming bytes"
    # default path keeps its documented ±1 tier
    loose = run("0")
    monkeypatch.delenv("LILLIPUT_FUSED_EXACT")
    _clear_fused_caches()
    a = cv2.imdecode(np.frombuffer(loose, np.uint8), cv2.IMREAD_COLOR)
    b = cv2.imdecode(np.frombuffer(streaming, np.uint8), cv2.IMREAD_COLOR)
    assert np.abs(a.astype(int) - b.astype(int)).max() <= 1


@pytest.mark.parametrize("geom", [(64, 48, 128, 96),    # pure upscale
                                  (320, 199, 400, 80),  # mixed: W up, H down
                                  (100, 90, 100, 180)])  # H up, W same
def test_fused_exact_upscale_byte_identical(geom, monkeypatch):
    """LILLIPUT_FUSED_EXACT=1 covers UPSCALING geometries too: cv::resize
    switches INTER_AREA to the fixed-point bilinear (area-coordinate)
    kernel when any axis upscales, and the fused tails reproduce that
    integer kernel exactly via selection dots
    (resize_linear_window_exact_u8). The streaming oracle is built by
    hand (decode -> fit_rect crop -> streaming resize) because ImageOps'
    Fit clamps to the source size and never upscales."""
    import jax.numpy as jnp

    from lilliput_tpu import new_decoder
    from lilliput_tpu.framebuffer import Framebuffer
    from lilliput_tpu.ops import resize as R
    from lilliput_tpu.pipeline import fit_rect
    w, h, dw, dh = geom
    buf = _jpeg(w, h, seed=(w ^ h) & 127, q=88)

    d = new_decoder(buf)
    fb = Framebuffer()
    d.decode_to(fb)
    src = np.asarray(fb.array)
    left, top, cw, chh = fit_rect(w, h, dw, dh)
    crop = src[top:top + chh, left:left + cw]
    want = np.asarray(R.resize(jnp.asarray(crop), dw, dh, R.AREA))

    _clear_fused_caches()
    monkeypatch.setenv("LILLIPUT_FUSED_EXACT", "1")
    try:
        pipe = JpegTranscodePipeline(buf, dw, dh, quality=85,
                                     output_format=".png")
        out = pipe.transcode([buf])[0]
    finally:
        monkeypatch.delenv("LILLIPUT_FUSED_EXACT")
        _clear_fused_caches()
    got = cv2.imdecode(np.frombuffer(out, np.uint8), cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("method", ["linear", "cubic"])
def test_gray_pipeline_honors_resize_method(method):
    """Grayscale pipelines must honor method= like the color paths
    (regression: _fused_jpeg_fit_gray_impl had no method parameter and
    silently resampled with AREA). LINEAR/CUBIC ride the streaming
    resize kernels, so the output is bit-identical to decode -> crop ->
    streaming resize."""
    import jax.numpy as jnp

    from lilliput_tpu import new_decoder
    from lilliput_tpu.framebuffer import Framebuffer
    from lilliput_tpu.ops import resize as R
    from lilliput_tpu.pipeline import fit_rect
    w, h, dw, dh = 400, 300, 80, 60
    buf = _gray_jpeg(w, h, seed=9)

    d = new_decoder(buf)
    fb = Framebuffer()
    d.decode_to(fb)
    src = np.asarray(fb.array)
    if src.ndim == 3:
        src = src[..., 0]
    left, top, cw, chh = fit_rect(w, h, dw, dh)
    crop = src[top:top + chh, left:left + cw]
    want = np.asarray(R.resize(jnp.asarray(crop)[..., None], dw, dh,
                               method)[..., 0])

    pipe = JpegTranscodePipeline(buf, dw, dh, quality=85, method=method,
                                 output_format=".png")
    out = pipe.transcode([buf])[0]
    got = cv2.imdecode(np.frombuffer(out, np.uint8), cv2.IMREAD_UNCHANGED)
    if got.ndim == 3:
        got = got[..., 0]
    np.testing.assert_array_equal(got, want)


def test_dct_scale_requires_area_method():
    """dct_scale's fractional crop geometry only has an AREA-matrix form;
    the constructor must reject other methods (the gray chroma-mode
    coercion previously slipped past _direct_ok)."""
    buf = _jpeg(320, 200, 7)
    with pytest.raises(ValueError):
        JpegTranscodePipeline(buf, 64, 64, method="linear",
                              chroma_mode="direct", dct_scale=2)


def test_fused_exact_gray_byte_identical(monkeypatch):
    from lilliput_tpu import ImageOps, ImageOptions, ResizeMethod, new_decoder
    buf = _gray_jpeg(400, 300, seed=5)
    streaming = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".png", width=80, height=60,
        resize_method=ResizeMethod.FIT, encode_timeout=600.0))
    _clear_fused_caches()
    monkeypatch.setenv("LILLIPUT_FUSED_EXACT", "1")
    try:
        pipe = JpegTranscodePipeline(buf, 80, 60, quality=85,
                                     output_format=".png")
        assert pipe.transcode([buf])[0] == streaming
    finally:
        monkeypatch.delenv("LILLIPUT_FUSED_EXACT")
        _clear_fused_caches()
