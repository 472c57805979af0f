"""WebP codec over the system libwebp shim (native/src/webp_shim.cpp).

Parity with the reference WebP path (webp.cpp/webp.go): decode yields
frame-sized buffers with x/y offsets + dispose/blend (composited by
ImageOps on device, ops.go:150-218), WebP enum values map 1:1 onto the
public DisposeMethod/BlendMethod enums; the encoder buffers frames and
selects still-vs-animation at flush, reattaching ICC and animation params.
"""

from __future__ import annotations

import ctypes
from typing import Dict, Optional

import numpy as np

from .. import binding
from ..errors import DecodingFailedError, InvalidImageError
from ..framebuffer import (WEBP_AUTOFILTER, WEBP_FILTER_STRENGTH,  # noqa: E501
                           WEBP_FILTER_TYPE, WEBP_METHOD, WEBP_PALETTE,
                           WEBP_PARTITIONS, WEBP_PREPROCESSING,
                           WEBP_QUALITY, WEBP_SEGMENTS, WEBP_THREAD_LEVEL,
                           BlendMethod, DisposeMethod, Framebuffer,
                           ImageHeader, ImageOrientation)
from ..interfaces import Decoder, Encoder, check_encode_options

_WEBP_ENCODE_KEYS = frozenset({
    WEBP_QUALITY, WEBP_METHOD, WEBP_FILTER_STRENGTH, WEBP_FILTER_TYPE,
    WEBP_AUTOFILTER, WEBP_PARTITIONS, WEBP_SEGMENTS, WEBP_PREPROCESSING,
    WEBP_THREAD_LEVEL, WEBP_PALETTE})

_i32p = ctypes.POINTER(ctypes.c_int32)
_u8p = ctypes.POINTER(ctypes.c_uint8)

binding.register_signature("lp_webp_open", [_u8p, ctypes.c_size_t, _i32p], ctypes.c_void_p)
binding.register_signature("lp_webp_icc", [ctypes.c_void_p, _u8p, ctypes.c_int32], ctypes.c_int)
binding.register_signature("lp_webp_next_frame", [ctypes.c_void_p, _i32p], ctypes.c_int)
binding.register_signature("lp_webp_total_duration", [ctypes.c_void_p], ctypes.c_int)
binding.register_signature(
    "lp_webp_frame_pixels",
    [ctypes.c_void_p, _u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32], ctypes.c_int)
binding.register_signature("lp_webp_free", [ctypes.c_void_p], None)
binding.register_signature(
    "lp_webp_enc_new", [_u8p, ctypes.c_int32, ctypes.c_uint32, ctypes.c_int32],
    ctypes.c_void_p)
binding.register_signature(
    "lp_webp_enc_add",
    [ctypes.c_void_p, _u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
     ctypes.c_int32, _i32p, ctypes.c_int32], ctypes.c_int)
binding.register_signature(
    "lp_webp_enc_flush",
    [ctypes.c_void_p, _i32p, ctypes.c_int32, _u8p, ctypes.c_size_t], ctypes.c_long)
binding.register_signature("lp_webp_enc_free", [ctypes.c_void_p], None)
binding.register_signature(
    "lp_webp_bgra_to_yuv",
    [_u8p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, _u8p, _u8p, _u8p,
     _u8p], ctypes.c_int)
binding.register_signature(
    "lp_webp_encode_yuv",
    [_u8p, _u8p, _u8p, _u8p, ctypes.c_int32, ctypes.c_int32, _i32p,
     ctypes.c_int32, _u8p, ctypes.c_int32, _u8p, ctypes.c_size_t],
    ctypes.c_long)


def _u8(a: np.ndarray):
    return a.ctypes.data_as(_u8p)


class WebpDecoder(Decoder):
    def __init__(self, buf: bytes):
        self._lib = binding.load()
        self._buf = np.frombuffer(buf, np.uint8)
        info = np.zeros(8, np.int32)
        self._h = self._lib.lp_webp_open(_u8(self._buf), self._buf.size,
                                         info.ctypes.data_as(_i32p))
        if not self._h:
            raise InvalidImageError("not a valid WebP")
        (self._w, self._hgt, self._frames, self._loops, self._alpha,
         self._anim, self._bg, self._icc_len) = (int(v) for v in info)
        self._channels = 4 if self._alpha else 3
        self._closed = False

    def header(self) -> ImageHeader:
        return ImageHeader(width=self._w, height=self._hgt,
                           channels=self._channels,
                           orientation=ImageOrientation.TOP_LEFT,
                           num_frames=self._frames,
                           content_length=len(self._buf))

    def description(self) -> str:
        return "WEBP"

    def video_codec(self) -> str:
        return "VP8"

    def loop_count(self) -> int:
        return self._loops

    def duration(self) -> float:
        """Total animation duration in seconds (reference webp.go:73-77:
        sum of every frame's duration, 0 for still images)."""
        return self._lib.lp_webp_total_duration(self._h) / 1000.0

    def background_color(self) -> int:
        return self._bg & 0xFFFFFFFF

    def icc(self) -> bytes:
        if self._icc_len <= 0:
            return b""
        out = np.zeros(self._icc_len, np.uint8)
        n = self._lib.lp_webp_icc(self._h, _u8(out), out.size)
        return out[:n].tobytes() if n > 0 else b""

    def decode_to(self, fb: Framebuffer) -> None:
        meta = np.zeros(8, np.int32)
        st = self._lib.lp_webp_next_frame(self._h, meta.ctypes.data_as(_i32p))
        if st == 0:
            raise EOFError()
        if st < 0:
            raise DecodingFailedError("webp frame parse failed")
        x, y, w, h, dur_ms, dispose, blend, _fa = (int(v) for v in meta)
        px = np.empty((h, w, self._channels), np.uint8)
        if self._lib.lp_webp_frame_pixels(self._h, _u8(px), self._channels, w, h) != 0:
            raise DecodingFailedError("webp frame decode failed")
        # libwebp already produced contiguous BGR(A); stay numpy — an
        # eager jnp copy here costs a 6 MB round trip per 1080p frame on
        # the pinned-CPU serving path and the consumer converts anyway
        fb.array = px
        fb.duration = dur_ms / 1000.0
        fb.x_offset, fb.y_offset = x, y
        fb.dispose = DisposeMethod(dispose)   # 0 none / 1 background (1:1)
        fb.blend = BlendMethod(blend)         # 0 alpha-blend / 1 no-blend (1:1)

    def close(self) -> None:
        if not self._closed and self._h:
            self._lib.lp_webp_free(self._h)
            self._closed = True
            self._h = None


def encode_webp_pixels(px: np.ndarray, opts: Optional[Dict[int, int]] = None,
                       icc: Optional[bytes] = None) -> bytes:
    """One-shot still-WebP encode of (H, W, 3|4) BGR(A) u8 pixels — the
    numpy-level encode used by the serving pipeline's webp output (same
    shim calls as WebpEncoder, without a Framebuffer)."""
    lib = binding.load()
    icc_arr = (np.frombuffer(icc, np.uint8) if icc
               else np.zeros(0, np.uint8))
    h = lib.lp_webp_enc_new(_u8(icc_arr) if icc_arr.size else None,
                            icc_arr.size, ctypes.c_uint32(0), 0)
    if not h:
        raise DecodingFailedError("webp encoder init failed")
    try:
        o = WebpEncoder._opts_array(opts or {})
        op = o.ctypes.data_as(_i32p) if o.size else None
        hgt, wdt, ch = px.shape
        px = np.ascontiguousarray(px)
        if lib.lp_webp_enc_add(h, _u8(px), wdt, hgt, ch, 0, op, o.size):
            raise DecodingFailedError("webp frame add failed")
        out = np.empty(wdt * hgt * 4 + (1 << 20) + icc_arr.size, np.uint8)
        n = lib.lp_webp_enc_flush(h, op, o.size, _u8(out), out.size)
        if n < 0:
            raise DecodingFailedError(f"webp flush failed ({n})")
        return out[:n].tobytes()
    finally:
        lib.lp_webp_enc_free(h)


def encode_webp_yuv(y: np.ndarray, u: np.ndarray, v: np.ndarray,
                    opts: Optional[Dict[int, int]] = None,
                    icc: Optional[bytes] = None) -> bytes:
    """Still lossy WebP encode from device-converted YUV420 planes (the
    serving fast path: the device ships 1.5 B/px of planes instead of
    4 B/px packed BGRA, and libwebp skips its import conversion).

    Byte-identical to encode_webp_pixels on the same source pixels
    because ops.color.webp_yuv420_from_packed is bit-exact to libwebp's
    own import (both gated in tests/test_webp.py). Lossless (quality >
    100) needs ARGB input — callers route that through
    encode_webp_pixels; the shim rejects it here (-3)."""
    lib = binding.load()
    o = WebpEncoder._opts_array(opts or {})
    op = o.ctypes.data_as(_i32p) if o.size else None
    h, w = y.shape
    y = np.ascontiguousarray(y)
    u = np.ascontiguousarray(u)
    v = np.ascontiguousarray(v)
    icc_arr = (np.frombuffer(icc, np.uint8) if icc else np.zeros(0, np.uint8))
    out = np.empty(w * h * 4 + (1 << 20) + icc_arr.size, np.uint8)
    n = lib.lp_webp_encode_yuv(
        _u8(y), _u8(u), _u8(v), None, w, h, op, o.size,
        _u8(icc_arr) if icc_arr.size else None, icc_arr.size,
        _u8(out), out.size)
    if n < 0:
        raise DecodingFailedError(f"webp yuv encode failed ({n})")
    return out[:n].tobytes()


class WebpEncoder(Encoder):
    def __init__(self, decoded_by: Optional[Decoder] = None,
                 icc_override: Optional[bytes] = None):
        self._lib = binding.load()
        icc = icc_override
        bg, loops = 0, 0
        if decoded_by is not None:
            if icc is None:
                try:
                    icc = decoded_by.icc() or None
                except Exception:
                    icc = None
            try:
                bg = decoded_by.background_color()
                loops = decoded_by.loop_count()
            except Exception:
                pass
        icc_arr = np.frombuffer(icc, np.uint8) if icc else np.zeros(0, np.uint8)
        self._h = self._lib.lp_webp_enc_new(
            _u8(icc_arr) if icc_arr.size else None, icc_arr.size,
            ctypes.c_uint32(bg & 0xFFFFFFFF), loops)
        if not self._h:
            raise DecodingFailedError("webp encoder init failed")
        self._flushed = False
        self._raw_bytes = 0  # sum of added frames' raw BGRA bytes (flush cap)

    @staticmethod
    def _opts_array(opts: Dict[int, int]) -> np.ndarray:
        check_encode_options(opts, _WEBP_ENCODE_KEYS, "webp")
        flat = []
        for k, v in (opts or {}).items():
            flat += [int(k), int(v)]
        return np.asarray(flat, np.int32) if flat else np.zeros(0, np.int32)

    def encode(self, fb: Optional[Framebuffer], opts: Dict[int, int]) -> Optional[bytes]:
        if self._flushed:
            raise EOFError()
        o = self._opts_array(opts)
        op = o.ctypes.data_as(_i32p) if o.size else None
        if fb is None:
            # worst case is bounded by the raw frame bytes plus container
            # overhead (encode_webp_pixels uses the same bound per frame);
            # the 64 MiB floor keeps small animations on one allocation size
            cap = max(64 << 20, self._raw_bytes + (1 << 20))
            out = np.empty(cap, np.uint8)
            n = self._lib.lp_webp_enc_flush(self._h, op, o.size, _u8(out), cap)
            if n < 0:
                raise DecodingFailedError(f"webp flush failed ({n})")
            self._flushed = True
            return out[:n].tobytes()
        px = np.ascontiguousarray(fb.to_numpy())
        self._raw_bytes += fb.width * fb.height * 4
        rc = self._lib.lp_webp_enc_add(
            self._h, _u8(px), fb.width, fb.height, fb.channels,
            int(round(fb.duration * 1000)), op, o.size)
        if rc != 0:
            raise DecodingFailedError("webp frame add failed")
        return None

    def close(self) -> None:
        if self._h:
            self._lib.lp_webp_enc_free(self._h)
            self._h = None
