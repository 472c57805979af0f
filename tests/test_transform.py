"""End-to-end ImageOps.Transform behavior: option knobs, format cross
products, ForceSdr, error paths (ops.go semantics)."""
import io

import numpy as np
import pytest

from lilliput_tpu import binding

if not binding.available():
    pytest.skip("native host library unavailable", allow_module_level=True)

cv2 = pytest.importorskip("cv2")
PIL_Image = pytest.importorskip("PIL.Image")

from lilliput_tpu import (ImageOps, ImageOptions, ResizeMethod,  # noqa: E402
                          new_decoder, new_encoder)
from lilliput_tpu.errors import (EncodeTimeoutError,  # noqa: E402
                                 InvalidImageError)
from lilliput_tpu.framebuffer import JPEG_QUALITY, PNG_COMPRESSION  # noqa: E402

DATA = "/root/reference/data"
TD = "/root/reference/testdata"


def _transform(path, **kw):
    buf = open(path, "rb").read()
    kw.setdefault("encode_timeout", 600.0)
    return ImageOps(8192).transform(new_decoder(buf), ImageOptions(**kw))


def test_jpeg_fit_to_jpeg():
    out = _transform(f"{DATA}/sunrise.jpg", file_type=".jpeg", width=50,
                     height=50, resize_method=ResizeMethod.FIT,
                     encode_options={JPEG_QUALITY: 85})
    img = cv2.imdecode(np.frombuffer(out, np.uint8), cv2.IMREAD_COLOR)
    assert img.shape == (50, 50, 3)


def test_orientation_normalized_in_output():
    # sunrise.jpg is orientation 6 (90 CW): output must be upright 75x100
    out = _transform(f"{DATA}/sunrise.jpg", file_type=".png",
                     resize_method=ResizeMethod.NO_RESIZE)
    img = cv2.imdecode(np.frombuffer(out, np.uint8), cv2.IMREAD_UNCHANGED)
    assert img.shape[:2] == (100, 75)  # upright (rotated from 75x100)


def test_stretch_resize():
    out = _transform(f"{DATA}/coast.jpg", file_type=".png", width=30,
                     height=60, resize_method=ResizeMethod.RESIZE)
    img = cv2.imdecode(np.frombuffer(out, np.uint8), cv2.IMREAD_UNCHANGED)
    assert img.shape[:2] == (60, 30)


def test_square_fit_bigger_than_source():
    # quirk: square request larger than min dim -> min dim square (ops.go:224)
    out = _transform(f"{DATA}/coast.jpg", file_type=".png", width=200,
                     height=200, resize_method=ResizeMethod.FIT)
    img = cv2.imdecode(np.frombuffer(out, np.uint8), cv2.IMREAD_UNCHANGED)
    assert img.shape[:2] == (75, 75)


def test_png_to_jpeg_and_back():
    out = _transform(f"{DATA}/firefox.png", file_type=".jpeg", width=50,
                     height=50, resize_method=ResizeMethod.FIT,
                     encode_options={JPEG_QUALITY: 90})
    assert out[:2] == b"\xff\xd8"
    out2 = _transform(f"{DATA}/coast.jpg", file_type=".png",
                      resize_method=ResizeMethod.NO_RESIZE,
                      encode_options={PNG_COMPRESSION: 9})
    assert out2.startswith(b"\x89PNG")


def test_gif_to_webp_animated():
    buf = open(f"{TD}/party-discord.gif", "rb").read()
    out = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".webp", width=14, height=9, resize_method=ResizeMethod.FIT,
        encode_timeout=600.0))
    im = PIL_Image.open(io.BytesIO(out))
    assert getattr(im, "n_frames", 1) == 16


def test_disable_animated_output():
    buf = open(f"{TD}/party-discord.gif", "rb").read()
    out = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".webp", resize_method=ResizeMethod.NO_RESIZE,
        disable_animated_output=True, encode_timeout=600.0))
    im = PIL_Image.open(io.BytesIO(out))
    assert getattr(im, "n_frames", 1) == 1


def test_max_encode_duration():
    buf = open(f"{TD}/no-loop.gif", "rb").read()  # 44 frames x 100ms
    out = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".gif", resize_method=ResizeMethod.NO_RESIZE,
        max_encode_duration=0.5, encode_timeout=600.0))
    im = PIL_Image.open(io.BytesIO(out))
    n = 0
    try:
        while True:
            im.seek(n)
            n += 1
    except EOFError:
        pass
    assert n <= 6


def test_encode_timeout_quirk():
    """encode_timeout=0 fails multi-frame transforms after the first frame
    (faithful to ops.go:299,366-368)."""
    buf = open(f"{TD}/party-discord.gif", "rb").read()
    with pytest.raises(EncodeTimeoutError):
        ImageOps(8192).transform(new_decoder(buf), ImageOptions(
            file_type=".gif", resize_method=ResizeMethod.NO_RESIZE,
            encode_timeout=0.0))


def test_force_sdr_overrides_hdr_icc():
    buf = open(f"{TD}/hdr_color_preservation.avif", "rb").read()
    from lilliput_tpu.codecs.avif import AvifDecoder
    from lilliput_tpu.codecs.icc import SRGB_PROFILE, is_hdr_icc_profile
    d = AvifDecoder(buf, tone_mapping_enabled=False)
    if is_hdr_icc_profile(d.icc()):
        out = ImageOps(8192).transform(
            AvifDecoder(buf, tone_mapping_enabled=False),
            ImageOptions(file_type=".webp", width=100, height=100,
                         resize_method=ResizeMethod.FIT, force_sdr=True,
                         encode_timeout=600.0))
        assert new_decoder(out).icc() == SRGB_PROFILE


def test_video_encode_rejected():
    with pytest.raises(InvalidImageError):
        new_encoder(".mp4", None)
    with pytest.raises(InvalidImageError):
        new_encoder(".webm", None)


def test_empty_buffer_rejected():
    with pytest.raises(InvalidImageError):
        new_decoder(b"")


def test_unknown_format_rejected():
    with pytest.raises(InvalidImageError):
        new_decoder(b"this is not an image at all, not even close!!")


def test_metrics_populated():
    from lilliput_tpu.utils import metrics
    metrics.reset()
    import bench as B
    buf = B._ensure_fixture()
    from lilliput_tpu.pipeline import JpegTranscodePipeline
    pipe = JpegTranscodePipeline(buf, 64, 64, quality=80)
    pipe.transcode([buf])
    snap = metrics.snapshot()
    assert snap["counters"]["images_transcoded"] == 1
    assert "device" in snap["stages"] and snap["stages"]["device"]["count"] == 1


def test_zero_target_dims_raise_cleanly():
    """0x0 Fit must raise a clear error, not a ZeroDivisionError (the
    reference surfaces this as a cv::resize error, opencv.go:284-299)."""
    from lilliput_tpu import ImageOps, ImageOptions, ResizeMethod
    buf = open("/root/reference/data/sunrise.jpg", "rb").read()
    d = new_decoder(buf)
    with pytest.raises(ValueError, match="must be positive"):
        ImageOps(8192).transform(d, ImageOptions(
            file_type=".jpeg", width=0, height=0,
            resize_method=ResizeMethod.FIT))


def test_requested_dims_exceed_max_size_raise_typed_error():
    """ops.go/opencv.go parity: the reference's ResizeTo fails with
    ErrBufTooSmall when the REQUESTED dims exceed the preallocated
    max_size^2 buffers — a hostile width=65536 request must raise the
    typed error, not ask the device for a ~17 GB array. NO_RESIZE
    ignores the requested dims (reference parity)."""
    from lilliput_tpu.errors import BufTooSmallError
    buf = open(f"{DATA}/sunrise.jpg", "rb").read()
    for method in (ResizeMethod.FIT, ResizeMethod.RESIZE):
        with pytest.raises(BufTooSmallError):
            ImageOps(256).transform(new_decoder(buf), ImageOptions(
                file_type=".jpeg", width=512, height=512,
                resize_method=method, encode_timeout=600.0))
    # NO_RESIZE with oversized (ignored) dims still transforms
    out = ImageOps(256).transform(new_decoder(buf), ImageOptions(
        file_type=".png", width=99999, height=99999,
        resize_method=ResizeMethod.NO_RESIZE, encode_timeout=600.0))
    img = cv2.imdecode(np.frombuffer(out, np.uint8), cv2.IMREAD_UNCHANGED)
    assert img.shape[:2] == (100, 75)  # orientation-6 source normalized
