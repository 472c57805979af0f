"""lilliput_tpu: TPU-native in-memory image transcoding framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of discord/lilliput:
decode (JPEG/PNG/GIF/WebP/AVIF + video first frames) -> transform
(resize/fit/crop, EXIF orientation, animated compositing, HDR->SDR) ->
encode (JPEG/PNG/WebP/AVIF/GIF/thumbhash). Serial entropy stages run on the
host (C++ where hot); every dense pixel transform runs on TPU.

Public surface mirrors the reference Go API (lilliput.go, ops.go):

    from lilliput_tpu import new_decoder, ImageOps, ImageOptions
    d = new_decoder(open("in.jpg", "rb").read())
    ops = ImageOps(8192)
    out = ops.transform(d, ImageOptions(file_type=".webp", width=256,
                                        height=256, resize_method=ResizeMethod.FIT))
"""

import jax as _jax

# Image fidelity depends on exact f32 matmuls: TPU XLA's DEFAULT matmul
# precision runs f32 dots as single-pass bf16 on the MXU, which corrupts
# IDCT/resize/thumbhash outputs by tens of u8 levels (measured +-37 on the
# JPEG decode path). Force full-f32 MXU passes for everything this package
# traces; compute is nowhere near the bottleneck (HBM bandwidth is).
_jax.config.update("jax_default_matmul_precision", "highest")

# Serving cold-start: wire JAX's persistent compilation cache by default so
# a restarted serving process re-loads every previously compiled
# (geometry, orientation) program instead of paying the multi-second XLA
# compile on the request path (the reference preallocates everything up
# front — ops.go:62-94 — this is the compiled-program analog). Respects an
# explicit JAX_COMPILATION_CACHE_DIR; LILLIPUT_COMPILE_CACHE=0 disables,
# any other value overrides the directory.
import os as _os

_cache = _os.environ.get("LILLIPUT_COMPILE_CACHE", "")
if _cache != "0" and not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _dir = _cache or _os.path.join(
        _os.path.expanduser("~"), ".cache", "lilliput_tpu", "jax")
    try:
        _os.makedirs(_dir, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", _dir)
    except OSError:
        pass  # read-only home: run without a persistent cache

from .api import new_decoder, new_encoder  # noqa: F401
from .errors import (BufTooSmallError, DecodingFailedError,  # noqa: F401
                     EncodeTimeoutError, FrameBufNoPixelsError,
                     InvalidImageError, LilliputError, SkipNotSupportedError)
from .framebuffer import (AVIF_QUALITY, AVIF_SPEED, JPEG_PROGRESSIVE,  # noqa: F401
                          JPEG_QUALITY, PNG_COMPRESSION, WEBP_METHOD,
                          WEBP_QUALITY, BlendMethod, DisposeMethod,
                          Framebuffer, ImageHeader, ImageOrientation)
from .imageops import ImageOps, ImageOptions, ResizeMethod  # noqa: F401
from .interfaces import Decoder, Encoder  # noqa: F401
from .pipeline import (AnimatedTranscodePipeline,  # noqa: F401
                       JpegTranscodePipeline, MultiGeometryPipeline,
                       StillTranscodePipeline, spritesheet,
                       transcode_avif, transcode_avif_batch,
                       transcode_gif, transcode_gif_batch,
                       transcode_webp, transcode_webp_batch)

__version__ = "0.1.0"
