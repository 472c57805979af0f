"""Serving pipeline tests: fused batched transcode matches the streaming
ImageOps path; multi-geometry routing preserves order and caches programs."""
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
