"""JPEG codec: host entropy (libjpeg-turbo) + TPU dense transforms.

Capability parity with the reference's OpenCV-backed JPEG path
(/root/reference/opencv.cpp:93-188, opencv.go:432-453,629-802): header-only
parse, EXIF orientation, ICC extraction (APP2 assembly, opencv.cpp:247-291),
acropalypse-style ContentLength detection (opencv.go:502-557), decode to
BGR/gray pixels, and encode with quality/progressive options — but decode
pixels are produced by MXU IDCT matmuls (ops/jpeg_kernels.py) instead of
libjpeg's CPU IDCT, and encode runs fDCT+quantization on device with the
host only Huffman-coding the result.
"""

from __future__ import annotations

import ctypes
import os
from typing import Dict, Optional

import numpy as np

from .. import binding
from ..errors import DecodingFailedError, InvalidImageError
from ..framebuffer import (JPEG_CHROMA_QUALITY, JPEG_LUMA_QUALITY,  # noqa: E501
                           JPEG_OPTIMIZE, JPEG_PROGRESSIVE,
                           JPEG_QUALITY, JPEG_RST_INTERVAL,
                           Framebuffer, ImageHeader, ImageOrientation)
from ..interfaces import Decoder, Encoder, check_encode_options

_JPEG_ENCODE_KEYS = frozenset({
    JPEG_QUALITY, JPEG_PROGRESSIVE, JPEG_OPTIMIZE, JPEG_RST_INTERVAL,
    JPEG_LUMA_QUALITY, JPEG_CHROMA_QUALITY})
from ..ops import jpeg_kernels as K

# Standard Annex K base quantization tables (JPEG spec Tables K.1/K.2).
STD_LUMA_QTABLE = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.uint16)
STD_CHROMA_QTABLE = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.uint16)

_MAX_COMPONENTS = 4

_SAMP = {"420": ([2, 1, 1], [2, 1, 1]), "422": ([2, 1, 1], [1, 1, 1]),
         "440": ([1, 1, 1], [2, 1, 1]), "444": ([1, 1, 1], [1, 1, 1])}


def synthetic_jpeg(w: int, h: int, subsampling: str = "420",
                   gray: bool = False, quality: int = 85) -> bytes:
    """Zero-coefficient JPEG of an EXACT geometry — a warm-up/probe input
    for MultiGeometryPipeline.warm(): geometry (dims + sampling factors +
    quant tables) matches what a real capture at that size would produce,
    entropy data is all-zero blocks (encodes in microseconds)."""
    if subsampling not in _SAMP:
        raise ValueError(f"unknown subsampling {subsampling!r}")
    lib = binding.load()
    qt_l, qt_c = scaled_qtables(quality)
    h_samp, v_samp = ([1], [1]) if gray else _SAMP[subsampling]
    max_h, max_v = max(h_samp), max(v_samp)
    comps = []
    for i in range(len(h_samp)):
        bw = (w * h_samp[i] + 8 * max_h - 1) // (8 * max_h)
        bh = (h * v_samp[i] + 8 * max_v - 1) // (8 * max_v)
        comps.append(np.zeros((bh, bw, 64), np.int16))
    nc = len(comps)
    ptrs = (ctypes.POINTER(ctypes.c_int16) * nc)()
    for i, c in enumerate(comps):
        ptrs[i] = c.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
    hs = (ctypes.c_int32 * nc)(*h_samp)
    vs = (ctypes.c_int32 * nc)(*v_samp)
    out = np.empty(w * h + (1 << 20), np.uint8)
    q = ctypes.POINTER(ctypes.c_uint16)
    n = lib.lp_jpeg_encode_coefs(
        w, h, nc, hs, vs, ptrs,
        qt_l.ctypes.data_as(q), qt_c.ctypes.data_as(q),
        0, 0, 0, None, 0,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size)
    if n <= 0:
        raise DecodingFailedError(f"synthetic JPEG encode failed ({n})")
    return out[:n].tobytes()


class _JpegInfo(ctypes.Structure):
    _fields_ = [
        ("width", ctypes.c_int32),
        ("height", ctypes.c_int32),
        ("num_components", ctypes.c_int32),
        ("progressive", ctypes.c_int32),
        ("icc_length", ctypes.c_int32),
        ("comp_h_samp", ctypes.c_int32 * _MAX_COMPONENTS),
        ("comp_v_samp", ctypes.c_int32 * _MAX_COMPONENTS),
        ("comp_quant_tbl", ctypes.c_int32 * _MAX_COMPONENTS),
        ("comp_blocks_w", ctypes.c_int32 * _MAX_COMPONENTS),
        ("comp_blocks_h", ctypes.c_int32 * _MAX_COMPONENTS),
        ("comp_downsampled_w", ctypes.c_int32 * _MAX_COMPONENTS),
        ("comp_downsampled_h", ctypes.c_int32 * _MAX_COMPONENTS),
        ("jpeg_color_space", ctypes.c_int32),
        ("restart_interval", ctypes.c_int32),
    ]


def use_fast_huff() -> bool:
    """Own baseline Huffman decoder (jpeg_huff.cpp) on by default;
    LILLIPUT_JPEG_HUFF=libjpeg forces the libjpeg path everywhere (the
    escape hatch mirrors LILLIPUT_PALLAS)."""
    return os.environ.get("LILLIPUT_JPEG_HUFF", "fast") != "libjpeg"


def intra_decode_workers() -> int:
    """Host threads for restart-marker-parallel Huffman decode of ONE image
    (LILLIPUT_JPEG_INTRA_WORKERS; default 1 = serial). Batch serving uses
    image-level threading instead (pipeline.decode_entropy); intra-image
    slicing is the latency lever for single large images."""
    import os
    try:
        return max(int(os.environ.get("LILLIPUT_JPEG_INTRA_WORKERS", "1")), 1)
    except ValueError:
        return 1


def _u8ptr(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


# ---------------------------------------------------------------------------
# host-side byte walkers (mirroring the reference's pure-Go JPEG walkers)
# ---------------------------------------------------------------------------

def supported_subsampling(info) -> bool:
    """True when a 3-component JPEG's chroma layout maps onto the device
    decode paths: INTEGER 1x/2x luma:chroma factors on both axes and
    IDENTICAL Cb/Cr sampling. Legal-but-exotic layouts (4:1:1, 3:2
    ratios, Cb != Cr sampling) must be rejected, not mis-decoded — the
    device fns derive one (h2, v2) pair from component 1."""
    hy, vy = info.comp_h_samp[0], info.comp_v_samp[0]
    for c in (1, 2):
        hc, vc = info.comp_h_samp[c], info.comp_v_samp[c]
        if hc <= 0 or vc <= 0 or hy % hc or vy % vc:
            return False
        if hy // hc not in (1, 2) or vy // vc not in (1, 2):
            return False
    return (info.comp_h_samp[1] == info.comp_h_samp[2]
            and info.comp_v_samp[1] == info.comp_v_samp[2])


def _iter_marker_segments(buf: bytes):
    """Header-phase JPEG marker walk, shared by every marker reader below
    (one copy of the hardening: 0xFF fill bytes, standalone RST/TEM/SOI
    skip, SOS/EOI stop, seglen/overrun guards). Yields
    (marker, payload_offset, seglen) where payload starts right after the
    2 length bytes and spans seglen-2 bytes."""
    n = len(buf)
    i = 2  # past SOI
    while i + 4 <= n and buf[i] == 0xFF:
        while i + 2 <= n and buf[i + 1] == 0xFF:  # 0xFF fill bytes (T.81)
            i += 1
        if i + 4 > n:
            break
        marker = buf[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2
            continue
        if marker in (0xD9, 0xDA):  # EOI / SOS: header segments are over
            break
        seglen = int.from_bytes(buf[i + 2:i + 4], "big")
        if seglen < 2 or i + 2 + seglen > n:
            break
        yield marker, i + 4, seglen
        i += 2 + seglen


def exif_orientation(buf: bytes) -> ImageOrientation:
    """Extract EXIF orientation from the APP1 segment (host-side parse)."""
    for marker, off, seglen in _iter_marker_segments(buf):
        if marker == 0xE1 and buf[off:off + 6] == b"Exif\x00\x00":
            o = _parse_tiff_orientation(buf[off + 6:off - 2 + seglen])
            if o:
                return ImageOrientation(o)
    return ImageOrientation.TOP_LEFT


def _parse_tiff_orientation(tiff: bytes) -> int:
    if len(tiff) < 14:
        return 0
    if tiff[:4] == b"II*\x00":
        end = "little"
    elif tiff[:4] == b"MM\x00*":
        end = "big"
    else:
        return 0
    off = int.from_bytes(tiff[4:8], end)
    if off + 2 > len(tiff):
        return 0
    count = int.from_bytes(tiff[off:off + 2], end)
    for k in range(count):
        e = off + 2 + k * 12
        if e + 12 > len(tiff):
            return 0
        tag = int.from_bytes(tiff[e:e + 2], end)
        if tag == 0x0112:
            val = int.from_bytes(tiff[e + 8:e + 10], end)
            return val if 1 <= val <= 8 else 0
    return 0


def has_adobe_marker(buf: bytes) -> bool:
    """APP14 'Adobe' marker: CMYK/YCCK samples are stored inverted.

    libjpeg (examine_app14) matches the 5 ASCII bytes "Adobe" with a
    12-byte payload (APP14_DATA_LEN; seglen >= 14 counting the length
    field) — a 6-byte b"Adobe\\x00" compare would also read the
    DCTEncodeVersion high byte, missing APP14 segments whose version
    word is >= 0x0100 (and inverting CMYK ink values)."""
    for marker, off, seglen in _iter_marker_segments(buf):
        if marker == 0xEE and seglen >= 14 and buf[off:off + 5] == b"Adobe":
            return True
    return False


_ICC_MARKER_PREFIX = b"ICC_PROFILE\x00"
_ICC_MAX_BYTES = 1 << 20  # same hardening cap as codecs/icc.py


def read_icc(buf: bytes) -> bytes:
    """Assemble a JPEG's ICC profile from its APP2 marker segments (pure
    header byte walk — no entropy decode). Mirrors libjpeg's
    jpeg_read_icc_profile chunk reassembly (seq 1..count, consistent count,
    no duplicates) with the 1 MB hardening cap; the reference extracts ICC
    the same way through libjpeg's saved APP2 markers
    (/root/reference/opencv.cpp:247-291). Returns b"" when absent or
    malformed. Used by the serving pipeline to carry the source profile
    into the transcoded output without touching the shim."""
    if len(buf) < 4 or buf[0:2] != b"\xff\xd8":
        return b""
    chunks = {}
    count = 0
    for marker, off, seglen in _iter_marker_segments(buf):
        if marker == 0xE2:
            p = buf[off:off - 2 + seglen]
            if p[:12] == _ICC_MARKER_PREFIX and len(p) >= 14:
                seq, cnt = p[12], p[13]
                if count == 0:
                    count = cnt
                # all-or-nothing like libjpeg's jpeg_read_icc_profile (which
                # the reference uses via opencv.cpp:247-291): a duplicate
                # seq number or a chunk whose count byte disagrees with the
                # first chunk's marks the whole profile malformed
                if cnt != count or not 1 <= seq <= count or seq in chunks:
                    return b""
                chunks[seq] = p[14:]
    if not count or len(chunks) != count:
        return b""
    out = b"".join(chunks[s] for s in range(1, count + 1))
    return out if 0 < len(out) <= _ICC_MAX_BYTES else b""


def jpeg_content_length(buf: bytes) -> int:
    """Length up to and including EOI; trailing bytes beyond are unwanted
    (acropalypse-type leak surface, see reference opencv.go:502-557).

    Walks marker segments (so EOIs inside EXIF thumbnails are skipped), then
    scans entropy data where 0xFF is always escaped (FF 00) or a RST marker,
    making the first unescaped FF D9 the real EOI."""
    n = len(buf)
    i = 2  # past SOI
    in_scan = False
    while i + 1 < n:
        if not in_scan:
            if buf[i] != 0xFF:
                return n  # malformed; keep everything
            while i + 2 < n and buf[i + 1] == 0xFF:  # 0xFF fill bytes
                i += 1
            marker = buf[i + 1]
            if marker == 0xD9:
                return i + 2
            if marker == 0xDA:
                i += 2 + int.from_bytes(buf[i + 2:i + 4], "big")
                in_scan = True
                continue
            if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
                i += 2
                continue
            if i + 4 > n:
                return n
            i += 2 + int.from_bytes(buf[i + 2:i + 4], "big")
        else:
            idx = buf.find(b"\xff", i)
            if idx == -1 or idx + 1 >= n:
                return n
            m = buf[idx + 1]
            if m == 0xD9:
                return idx + 2
            if m == 0x00 or 0xD0 <= m <= 0xD7:
                i = idx + 2  # stuffed byte or restart marker: still in scan
            else:
                i = idx      # next marker segment (e.g. progressive scans)
                in_scan = False
    return n


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class JpegDecoder(Decoder):
    def __init__(self, buf: bytes):
        if len(buf) < 3 or buf[0] != 0xFF or buf[1] != 0xD8:
            raise InvalidImageError("not a JPEG")
        self._buf = np.frombuffer(buf, np.uint8)
        self._raw = buf
        self._lib = binding.load()
        self._info = _JpegInfo()
        rc = self._lib.lp_jpeg_get_info(_u8ptr(self._buf), self._buf.size,
                                        ctypes.byref(self._info))
        if rc != 0:
            raise InvalidImageError(f"JPEG header parse failed ({rc})")
        self._decoded = False
        self._header: Optional[ImageHeader] = None

    def header(self) -> ImageHeader:
        if self._header is None:
            info = self._info
            self._header = ImageHeader(
                width=info.width,
                height=info.height,
                channels=1 if info.num_components == 1 else 3,
                orientation=exif_orientation(self._raw),
                num_frames=1,
                content_length=jpeg_content_length(self._raw),
            )
        return self._header

    def description(self) -> str:
        return "JPEG"

    def icc(self) -> bytes:
        if self._info.icc_length <= 0:
            return b""
        self._decode_coefs_cached()
        return self._icc

    def _decode_coefs_cached(self):
        if hasattr(self, "_coefs"):
            return
        info = self._info
        nc = info.num_components
        coefs = []
        ptrs = (ctypes.POINTER(ctypes.c_int16) * nc)()
        for c in range(nc):
            arr = np.empty((info.comp_blocks_h[c], info.comp_blocks_w[c], 64), np.int16)
            coefs.append(arr)
            ptrs[c] = arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
        qtables = np.zeros((4, 64), np.uint16)
        icc_buf = np.zeros(max(info.icc_length, 1), np.uint8)
        rc = -10
        fast_used = False
        workers = intra_decode_workers()
        if use_fast_huff():
            # own Huffman decoder (jpeg_huff.cpp): decodes straight into
            # the destination arrays, bit-identical to libjpeg (gated in
            # tests/test_jpeg_huff.py), threads across restart segments.
            # Handles baseline AND progressive (SOF2 multi-scan); declines
            # (-10) on anything else -> libjpeg fallback.
            rc = self._lib.lp_jpeg_decode_coefs_fast(
                _u8ptr(self._buf), self._buf.size, ptrs,
                qtables.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                workers)
            fast_used = rc == 0
        if (rc != 0 and workers > 1 and info.restart_interval > 0
                and not info.progressive and info.icc_length == 0):
            # restart-marker-parallel Huffman decode (SURVEY hard part #2):
            # DRI segments reset bit state + DC predictors, so the scan
            # slices across host threads inside ONE image
            rc = self._lib.lp_jpeg_decode_coefs_parallel(
                _u8ptr(self._buf), self._buf.size, ptrs,
                qtables.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                workers)
        if rc != 0:  # not sliceable (or parallel decode failed): serial path
            rc = self._lib.lp_jpeg_decode_coefs(
                _u8ptr(self._buf), self._buf.size, ptrs,
                qtables.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                _u8ptr(icc_buf), icc_buf.size)
        if rc != 0:
            raise DecodingFailedError(f"JPEG entropy decode failed ({rc})")
        self._coefs = coefs
        self._qtables = qtables
        if info.icc_length <= 0:
            self._icc = b""
        elif fast_used:
            # the fast decoder skips APPn payloads; the Python APP2 walk
            # returns the same concatenation libjpeg's reader does
            # (self._raw is the original bytes object — no copy)
            self._icc = read_icc(self._raw)
        else:
            self._icc = icc_buf.tobytes()

    def decode_to(self, fb: Framebuffer) -> None:
        if self._decoded:
            raise EOFError()
        info = self._info
        self._decode_coefs_cached()
        h, w = info.height, info.width
        if info.num_components == 1:
            px = K.decode_gray(self._coefs[0], self._qtables[info.comp_quant_tbl[0]], h, w)
        elif info.num_components == 3:
            if not supported_subsampling(info):
                raise DecodingFailedError("unsupported chroma subsampling")
            hy, vy = info.comp_h_samp[0], info.comp_v_samp[0]
            hc, vc = info.comp_h_samp[1], info.comp_v_samp[1]
            h2, v2 = hy // hc == 2, vy // vc == 2
            if info.jpeg_color_space == 2:  # JCS_RGB: no YCbCr transform
                fb.array = K.decode_rgb(
                    self._coefs[0], self._coefs[1], self._coefs[2],
                    *[self._qtables[info.comp_quant_tbl[i]] for i in range(3)],
                    h, w, h2, v2)
                fb.duration = 0.0
                fb.x_offset = fb.y_offset = 0
                self._decoded = True
                return
            if info.jpeg_color_space != 3:  # JCS_YCbCr — anything else is
                raise DecodingFailedError(   # rejected, never mis-decoded
                    f"unsupported 3-component JPEG colorspace "
                    f"{info.jpeg_color_space}")
            tcb, tcr = info.comp_quant_tbl[1], info.comp_quant_tbl[2]
            px = K.decode_ycc_420(
                self._coefs[0], self._coefs[1], self._coefs[2],
                self._qtables[info.comp_quant_tbl[0]],
                self._qtables[tcb],
                h, w, h2, v2,
                qt_chroma2=(None if tcr == tcb else self._qtables[tcr]))
        elif info.num_components == 4:
            # CMYK (JCS_CMYK=4) / YCCK (JCS_YCCK=5); requires uniform sampling
            if len({(info.comp_h_samp[i], info.comp_v_samp[i]) for i in range(4)}) != 1:
                raise DecodingFailedError("subsampled CMYK JPEG unsupported")
            px = K.decode_cmyk(
                *self._coefs,
                *[self._qtables[info.comp_quant_tbl[i]] for i in range(4)],
                h, w, info.jpeg_color_space == 5, has_adobe_marker(self._raw))
        else:
            raise DecodingFailedError(
                f"unsupported JPEG component count {info.num_components}")
        fb.array = px
        fb.duration = 0.0
        fb.x_offset = fb.y_offset = 0
        self._decoded = True



# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def scaled_qtables(quality: int, chroma_quality: Optional[int] = None):
    """Annex-K tables scaled by libjpeg quality semantics; chroma_quality
    scales the chroma table independently (IMWRITE_JPEG_LUMA/CHROMA_QUALITY
    parity — OpenCV's grfmt_jpeg per-table q_scale_factor path)."""
    lib = binding.load()
    out_l = np.zeros(64, np.uint16)
    out_c = np.zeros(64, np.uint16)
    q = ctypes.POINTER(ctypes.c_uint16)
    lib.lp_jpeg_scale_qtable(STD_LUMA_QTABLE.ctypes.data_as(q), quality, 1,
                             out_l.ctypes.data_as(q))
    lib.lp_jpeg_scale_qtable(
        STD_CHROMA_QTABLE.ctypes.data_as(q),
        quality if chroma_quality is None else chroma_quality, 1,
        out_c.ctypes.data_as(q))
    return out_l, out_c


class JpegEncoder(Encoder):
    """Single-frame encoder; device fDCT/quant + host Huffman."""

    def __init__(self, decoded_by: Optional[Decoder] = None,
                 icc_override: Optional[bytes] = None):
        self._lib = binding.load()
        self._icc = icc_override
        if self._icc is None and decoded_by is not None:
            try:
                self._icc = decoded_by.icc() or None
            except Exception:
                self._icc = None

    def encode(self, fb: Optional[Framebuffer], opts: Dict[int, int]) -> Optional[bytes]:
        if fb is None:
            raise DecodingFailedError("JPEG encoder cannot flush without a frame")
        opts = opts or {}
        check_encode_options(opts, _JPEG_ENCODE_KEYS, "jpeg")
        quality = int(opts.get(JPEG_QUALITY, 95))
        quality = min(max(quality, 1), 100)
        progressive = 1 if opts.get(JPEG_PROGRESSIVE, 0) else 0
        optimize = 1 if opts.get(JPEG_OPTIMIZE, 0) else 0
        rst_rows = max(int(opts.get(JPEG_RST_INTERVAL, 0)), 0)
        # per-table quality (opencv.go passthrough -> OpenCV grfmt_jpeg):
        # LUMA_QUALITY overrides the overall quality for the luma table;
        # CHROMA_QUALITY defaults to LUMA_QUALITY and is ignored without it
        # (cv2's own gate is `luma >= 0 && chroma >= 0` after defaulting)
        luma_q = int(opts.get(JPEG_LUMA_QUALITY, -1))
        if luma_q >= 0:
            luma_q = min(max(luma_q, 1), 100)
            chroma_q = int(opts.get(JPEG_CHROMA_QUALITY, luma_q))
            chroma_q = min(max(chroma_q, 1), 100)
            qt_l, qt_c = scaled_qtables(luma_q, chroma_q)
        else:
            qt_l, qt_c = scaled_qtables(quality)

        arr = fb.array
        h, w = fb.height, fb.width
        gray = fb.channels == 1
        if gray:
            y = np.asarray(K.encode_gray_from_u8(arr, qt_l))
            comps = [np.ascontiguousarray(y)]
            h_samp = [1]
            v_samp = [1]
        else:
            yq, cbq, crq = K.encode_from_bgr(arr, qt_l, qt_c, subsample=True)
            comps = [np.asarray(c) for c in (yq, cbq, crq)]
            h_samp = [2, 1, 1]
            v_samp = [2, 1, 1]
        # crop device MCU padding down to libjpeg's expected block geometry
        # (width_in_blocks = ceil(w*hs/(8*max_h)), same for rows)
        max_h, max_v = max(h_samp), max(v_samp)
        for i in range(len(comps)):
            exp_bw = (w * h_samp[i] + 8 * max_h - 1) // (8 * max_h)
            exp_bh = (h * v_samp[i] + 8 * max_v - 1) // (8 * max_v)
            comps[i] = np.ascontiguousarray(comps[i][:exp_bh, :exp_bw])
        nc = len(comps)
        ptrs = (ctypes.POINTER(ctypes.c_int16) * nc)()
        for i, c in enumerate(comps):
            ptrs[i] = c.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
        hs = (ctypes.c_int32 * nc)(*h_samp)
        vs = (ctypes.c_int32 * nc)(*v_samp)
        icc = self._icc or b""
        icc_arr = np.frombuffer(icc, np.uint8) if icc else np.zeros(1, np.uint8)
        out = np.empty(w * h * 4 + (1 << 20), np.uint8)
        q = ctypes.POINTER(ctypes.c_uint16)
        n = self._lib.lp_jpeg_encode_coefs(
            w, h, nc, hs, vs, ptrs,
            qt_l.ctypes.data_as(q), qt_c.ctypes.data_as(q),
            progressive, optimize, rst_rows,
            _u8ptr(icc_arr), len(icc), _u8ptr(out), out.size)
        if n < 0:
            raise DecodingFailedError(f"JPEG entropy encode failed ({n})")
        return out[:n].tobytes()
