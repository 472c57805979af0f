"""Video/audio decoder over the ffmpeg shim (native/src/avformat_shim.cpp).

Parity with the reference's avcodec layer (avcodec.go/avcodec.cpp): container
probe with SAR-corrected dimensions and rotation->orientation, HEVC/AV1
feature gates, moov-atom streamability probe (host byte scan), codec/audio
names, ICC-by-primaries, keyframe index + stateless raw keyframe decode for
spritesheet workflows. The sws_scale stage is replaced by the fused device
YUV->BGR kernel (ops/color.py) for planar 4:2:0/4:2:2/4:4:4; exotic formats
fall back to the shim's sws path.
"""

from __future__ import annotations

import ctypes
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .. import binding
from ..errors import DecodingFailedError, InvalidImageError
from ..framebuffer import (BlendMethod, DisposeMethod, Framebuffer,
                           ImageHeader, ImageOrientation)
from ..interfaces import Decoder
from ..ops import color as C
from .icc import (REC601_NTSC_PROFILE, REC601_PAL_PROFILE, REC2020_PROFILE,
                  SRGB_PROFILE)

_i32p = ctypes.POINTER(ctypes.c_int32)
_i64p = ctypes.POINTER(ctypes.c_int64)
_u8p = ctypes.POINTER(ctypes.c_uint8)


class _AvInfo(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int32), ("height", ctypes.c_int32),
        ("orientation", ctypes.c_int32),
        ("video_codec", ctypes.c_int32), ("audio_codec", ctypes.c_int32),
        ("has_video", ctypes.c_int32), ("has_audio", ctypes.c_int32),
        ("has_subtitles", ctypes.c_int32),
        ("duration_us", ctypes.c_int64),
        ("colorspace", ctypes.c_int32), ("color_range", ctypes.c_int32),
        ("pix_fmt", ctypes.c_int32), ("frame_count_estimate", ctypes.c_int32),
        ("color_primaries", ctypes.c_int32),
    ]


binding.register_signature(
    "lp_av_open", [_u8p, ctypes.c_size_t, ctypes.c_int32, ctypes.c_int32],
    ctypes.c_void_p)
binding.register_signature("lp_av_get_info", [ctypes.c_void_p, ctypes.c_void_p], None)
binding.register_signature("lp_av_decode_frame", [ctypes.c_void_p], ctypes.c_int)
binding.register_signature("lp_av_frame_info", [ctypes.c_void_p, _i32p], None)
binding.register_signature(
    "lp_av_frame_plane",
    [ctypes.c_void_p, ctypes.c_int32, _u8p, ctypes.c_int32, ctypes.c_int32],
    ctypes.c_int)
binding.register_signature(
    "lp_av_frame_bgra", [ctypes.c_void_p, _u8p, ctypes.c_int32, ctypes.c_int32],
    ctypes.c_int)
binding.register_signature(
    "lp_av_keyframes", [ctypes.c_void_p, _i64p, ctypes.c_long], ctypes.c_long)
binding.register_signature(
    "lp_av_codec_params", [ctypes.c_void_p, _i32p, _u8p, ctypes.c_int32],
    ctypes.c_int)
binding.register_signature(
    "lp_av_decode_raw_keyframe",
    [ctypes.c_int32, _u8p, ctypes.c_int32, _u8p, ctypes.c_size_t, _u8p,
     ctypes.c_int32, ctypes.c_int32], ctypes.c_int)
binding.register_signature(
    "lp_av_format_name", [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int32],
    ctypes.c_int)
binding.register_signature("lp_av_free", [ctypes.c_void_p], None)

_VIDEO_NAMES = {0: "Unknown", 1: "H264", 2: "HEVC", 3: "AV1", 4: "VP8",
                5: "VP9", 6: "MPEG4"}
_AUDIO_NAMES = {0: "Unknown", 1: "AAC", 2: "MP3", 3: "FLAC", 4: "Vorbis",
                5: "Opus"}

# feature gates (parity with the reference's Go linker flags, avcodec.go:14-22)
_hevc_enabled = False
_av1_enabled = False

# AVPixelFormat values we convert on device (planar 8-bit YUV)
_PLANAR_YUV = {0: (2, 2), 4: (2, 1), 5: (1, 1),    # yuv420p, yuv422p, yuv444p
               12: (2, 2), 13: (2, 1), 14: (1, 1)}  # yuvj*
_FULL_RANGE_FMTS = {12, 13, 14}


def set_hevc_enabled(v: bool) -> None:
    global _hevc_enabled
    _hevc_enabled = v


def set_av1_enabled(v: bool) -> None:
    global _av1_enabled
    _av1_enabled = v


def _u8(a: np.ndarray):
    return a.ctypes.data_as(_u8p)


def is_streamable_mp4(buf: bytes) -> bool:
    """Exact mirror of avcodec_decoder_is_streamable
    (avcodec.cpp:209-245): walk top-level atoms whose HEADERS sit in the
    first 32 KB, validating each atom size against the WHOLE buffer
    before looking at its type; 'moov' first -> streamable, 'mdat'
    first -> not, anything invalid/absent -> not. The reference runs
    this scan on EVERY input (no ftyp gate, no 64-bit atom sizes), so
    WebM/MP3/etc. report not-streamable via the no-moov fallthrough —
    matching that behavior exactly is the parity contract."""
    n = len(buf)
    peek = min(n, 32 * 1024)
    pos = 0
    while pos + 8 <= peek:
        size = int.from_bytes(buf[pos:pos + 4], "big")
        if size < 8 or size + pos > n:
            break
        typ = buf[pos + 4:pos + 8]
        if typ == b"moov":
            return True
        if typ == b"mdat":
            return False
        pos += size
    return False


class VideoDecoder(Decoder):
    def __init__(self, buf: bytes):
        self._lib = binding.load()
        self._raw = buf
        self._buf = np.frombuffer(buf, np.uint8)
        self._h = self._lib.lp_av_open(_u8(self._buf), self._buf.size,
                                       1 if _hevc_enabled else 0,
                                       1 if _av1_enabled else 0)
        if not self._h:
            raise InvalidImageError("unsupported media container/codec")
        self._info = _AvInfo()
        self._lib.lp_av_get_info(self._h, ctypes.byref(self._info))
        self._closed = False

    # -- metadata --------------------------------------------------------

    def header(self) -> ImageHeader:
        i = self._info
        return ImageHeader(
            width=int(i.width), height=int(i.height), channels=4,
            orientation=ImageOrientation(int(i.orientation)),
            num_frames=1, content_length=len(self._raw))

    def description(self) -> str:
        """Container name (avcodec.cpp:473-499 mapping; MOV with an mp4
        ftyp brand reports MP4, avcodec.go:77-86)."""
        buf = ctypes.create_string_buffer(64)
        self._lib.lp_av_format_name(self._h, buf, 64)
        name = buf.value.decode()
        if name.startswith("mov"):
            return "MP4" if self._raw[4:8] == b"ftyp" else "MOV"
        for key, label in (("matroska", "WEBM"), ("mp3", "MP3"),
                           ("flac", "FLAC"), ("wav", "WAV"), ("aac", "AAC"),
                           ("ogg", "OGG")):
            if key in name:
                return label
        return name.upper() or "Unknown"

    def duration(self) -> float:
        return self._info.duration_us / 1e6

    def video_codec(self) -> str:
        return _VIDEO_NAMES.get(int(self._info.video_codec), "Unknown")

    def audio_codec(self) -> str:
        return _AUDIO_NAMES.get(int(self._info.audio_codec), "Unknown")

    def has_subtitles(self) -> bool:
        return bool(self._info.has_subtitles)

    def is_streamable(self) -> bool:
        # the reference probes EVERY container with the atom scan
        # (avcodec.go:93-95 -> avcodec.cpp:209); non-ISOBMFF inputs
        # (WebM/MP3/...) fall through to not-streamable via no-moov
        return is_streamable_mp4(self._raw)

    def icc(self) -> bytes:
        """Embedded profile by color primaries (avcodec.cpp:353-370)."""
        if not self._info.has_video:
            return b""
        pri = int(self._info.color_primaries)
        if pri == 9:    # AVCOL_PRI_BT2020
            return REC2020_PROFILE
        if pri == 5:    # AVCOL_PRI_BT470BG (601 PAL)
            return REC601_PAL_PROFILE
        if pri == 6:    # AVCOL_PRI_SMPTE170M (601 NTSC)
            return REC601_NTSC_PROFILE
        return SRGB_PROFILE

    # -- decoding ---------------------------------------------------------

    def decode_to(self, fb: Framebuffer) -> None:
        if not self._info.has_video:
            raise DecodingFailedError("no video stream")
        st = self._lib.lp_av_decode_frame(self._h)
        if st == 0:
            raise EOFError()
        if st < 0:
            raise DecodingFailedError(f"video decode failed ({st})")
        finfo = np.zeros(8, np.int32)
        self._lib.lp_av_frame_info(self._h, finfo.ctypes.data_as(_i32p))
        fw, fh, fmt, spc, rng, _planes, cw, ch = (int(v) for v in finfo)
        if fmt in _PLANAR_YUV:
            y = np.empty((fh, fw), np.uint8)
            u = np.empty((ch, cw), np.uint8)
            v = np.empty((ch, cw), np.uint8)
            if (self._lib.lp_av_frame_plane(self._h, 0, _u8(y), fw, fh) != 0
                    or self._lib.lp_av_frame_plane(self._h, 1, _u8(u), cw, ch) != 0
                    or self._lib.lp_av_frame_plane(self._h, 2, _u8(v), cw, ch) != 0):
                raise DecodingFailedError("frame plane export failed")
            space = C.AVCOL_SPC.get(spc, "bt601")
            full = rng == 2 or fmt in _FULL_RANGE_FMTS
            bgr = C.yuv420_to_bgr(jnp.asarray(y), jnp.asarray(u), jnp.asarray(v),
                                  space=space, full_range=full,
                                  out_h=fh, out_w=fw)
            from ..ops.blend import to_bgra
            arr = to_bgra(bgr)
        else:
            px = np.empty((fh, fw, 4), np.uint8)
            if self._lib.lp_av_frame_bgra(self._h, _u8(px), fw, fh) != 0:
                raise DecodingFailedError("frame conversion failed")
            arr = jnp.asarray(px)
        # anamorphic content: scale to SAR-corrected display size (the
        # reference folds this into its sws_scale pass, avcodec.cpp:37-111)
        dw, dh = int(self._info.width), int(self._info.height)
        if (arr.shape[1], arr.shape[0]) != (dw, dh):
            from ..ops import resize as R
            arr = R.resize(arr, dw, dh, R.LINEAR)
        fb.array = arr
        fb.duration = 0.0
        fb.x_offset = fb.y_offset = 0
        fb.blend = BlendMethod.NO_BLEND
        fb.dispose = DisposeMethod.DISPOSE_TO_BACKGROUND_COLOR

    # -- spritesheet API (avcodec.go:203-302) -------------------------------

    def keyframes(self) -> List[Tuple[int, int, int]]:
        """(pts_us, byte_offset, byte_size) per keyframe."""
        cap = 4096
        out = np.zeros(cap * 3, np.int64)
        n = self._lib.lp_av_keyframes(self._h, out.ctypes.data_as(_i64p), cap)
        if n < 0:
            raise DecodingFailedError("no keyframe index")
        if n > cap:
            # the shim reports the true count; re-call with a buffer that
            # holds the whole index instead of silently truncating it
            cap = n
            out = np.zeros(cap * 3, np.int64)
            n = self._lib.lp_av_keyframes(self._h, out.ctypes.data_as(_i64p), cap)
            if n < 0:
                raise DecodingFailedError("no keyframe index")
        n = min(n, cap)
        return [(int(out[i * 3]), int(out[i * 3 + 1]), int(out[i * 3 + 2]))
                for i in range(n)]  # (pts_us, byte_offset, byte_size)

    def codec_params(self) -> Tuple[int, bytes]:
        codec_id = ctypes.c_int32(0)
        extradata = np.zeros(10240, np.uint8)
        n = self._lib.lp_av_codec_params(self._h, ctypes.byref(codec_id),
                                         _u8(extradata), extradata.size)
        if n < 0:
            raise DecodingFailedError("extradata too large")
        return int(codec_id.value), extradata[:n].tobytes()

    def close(self) -> None:
        if not self._closed and self._h:
            self._lib.lp_av_free(self._h)
            self._closed = True
            self._h = None


def decode_raw_keyframe(codec_id: int, extradata: bytes, packet: bytes,
                        width: int, height: int) -> np.ndarray:
    """Stateless single-keyframe decode -> (H, W, 4) BGRA. Thread-safe
    (fresh codec context per call, avcodec.cpp:774-873)."""
    lib = binding.load()
    ed = np.frombuffer(extradata, np.uint8) if extradata else np.zeros(0, np.uint8)
    pk = np.frombuffer(packet, np.uint8)
    out = np.empty((height, width, 4), np.uint8)
    rc = lib.lp_av_decode_raw_keyframe(
        codec_id, _u8(ed) if ed.size else None, ed.size,
        _u8(pk), pk.size, _u8(out), width, height)
    if rc != 0:
        raise DecodingFailedError(f"raw keyframe decode failed ({rc})")
    return out
