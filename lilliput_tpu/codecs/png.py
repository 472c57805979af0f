"""PNG codec: host chunk-walk + inflate + unfilter, device pixel expansion.

Capability parity with the reference's PNG path: the pure-Go chunk iterator,
APNG detection and ContentLength logic (/root/reference/opencv.go:458-627)
are reimplemented as a host-side chunk walker; libpng's decode
(opencv.cpp:309-340 for ICC) is replaced by: zlib inflate (host), row
unfilter (host C++, native/src/png_filter.cpp — a serial recurrence), then
palette expansion / bit unpacking / 16->8 / RGB->BGR swizzles on device.
Encode filters rows host-side (adaptive min-SAD like libpng) and deflates
with the PngCompression option (opencv.hpp:34).
"""

from __future__ import annotations

import ctypes
import os
import struct
import zlib
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from .. import binding
from ..errors import DecodingFailedError, InvalidImageError
from ..framebuffer import (PNG_BILEVEL, PNG_COMPRESSION, PNG_STRATEGY,
                           Framebuffer, ImageHeader, ImageOrientation)

_PNG_ENCODE_KEYS = frozenset({PNG_COMPRESSION, PNG_STRATEGY, PNG_BILEVEL})
from ..interfaces import Decoder, Encoder, check_encode_options

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

binding.register_signature(
    "lp_png_unfilter",
    [ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
     ctypes.c_int64, ctypes.c_int64, ctypes.c_int32],
    ctypes.c_int)
binding.register_signature(
    "lp_png_filter",
    [ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_uint8),
     ctypes.c_int64, ctypes.c_int64, ctypes.c_int32],
    None)
binding.register_signature("lp_zlib_fast_available", [], ctypes.c_int)
binding.register_signature(
    "lp_zlib_compress",
    [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
     ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int32],
    ctypes.c_int64)
binding.register_signature("lp_zlib_compress_bound", [ctypes.c_int64],
                           ctypes.c_int64)
binding.register_signature(
    "lp_zlib_decompress",
    [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
     ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64],
    ctypes.c_int64)


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


# --- fast zlib streams (libdeflate, the reference's zlib-ng analog) --------
#
# The reference builds zlib-ng into libpng (deps/build-deps-linux.sh) because
# host deflate dominates PNG encode; here the same role is played by
# libdeflate behind the native shim, with Python zlib as the always-correct
# fallback (and LILLIPUT_LIBDEFLATE=0 forcing it, for A/B and tests).

_FAST_ZLIB: Optional[bool] = None


def _fast_zlib(lib) -> bool:
    global _FAST_ZLIB
    if _FAST_ZLIB is None:
        try:
            _FAST_ZLIB = (os.environ.get("LILLIPUT_LIBDEFLATE", "1") != "0"
                          and bool(lib.lp_zlib_fast_available()))
        except AttributeError:
            _FAST_ZLIB = False
    return _FAST_ZLIB


def _deflate(data: bytes, level: int, lib=None) -> bytes:
    """Compress to a zlib-format stream (libdeflate fast path; zlib fallback
    keeps level-0 stored streams and unavailable-shim behavior identical)."""
    lib = lib if lib is not None else binding.load()
    if _fast_zlib(lib) and len(data) > 0 and level > 0:
        src = np.frombuffer(data, np.uint8)
        cap = int(lib.lp_zlib_compress_bound(src.size))
        if cap > 0:
            out = np.empty(cap, np.uint8)
            n = int(lib.lp_zlib_compress(_u8ptr(src), src.size,
                                         _u8ptr(out), cap, level))
            if n > 0:
                return out[:n].tobytes()
    return zlib.compress(data, level)


def _deflate_strategy(data: bytes, level: int, strategy: Optional[int],
                      lib=None) -> bytes:
    """_deflate with an optional zlib strategy (IMWRITE_PNG_STRATEGY).
    libdeflate has no strategy knob, so a non-default strategy routes
    through Python zlib — correctness knob, not a hot path."""
    if strategy is None or int(strategy) == zlib.Z_DEFAULT_STRATEGY:
        return _deflate(data, level, lib)
    co = zlib.compressobj(min(max(int(level), 0), 9), zlib.DEFLATED, 15, 8,
                          int(strategy))
    return co.compress(data) + co.flush()


def _inflate_exact(idat: bytes, expected: int, lib) -> Optional[np.ndarray]:
    """Fast inflate when the decompressed size is exactly known (always true
    for well-formed PNG). Returns None on any mismatch/corruption so the
    caller falls back to Python zlib — edge-case semantics (trailing
    garbage, overlong streams) stay byte-identical with the historical
    path, and the known-size buffer doubles as a decompression-bomb cap."""
    if not _fast_zlib(lib) or expected <= 0 or len(idat) == 0:
        return None
    # DEFLATE expands at most ~1032:1, so an `expected` (derived from the
    # file's claimed IHDR dims) beyond that bound can never be filled from
    # this stream — fall back instead of committing a hostile allocation;
    # the zlib path then raises the typed truncated-PNG error.
    if expected > len(idat) * 1032 + (1 << 16):
        return None
    src = np.frombuffer(idat, np.uint8)
    out = np.empty(expected, np.uint8)
    n = int(lib.lp_zlib_decompress(_u8ptr(src), src.size,
                                   _u8ptr(out), expected))
    if n < 0:
        return None
    return out[:n]


def _inflate_bounded(raw: bytes, expected: int, what: str) -> np.ndarray:
    """Python-zlib fallback inflate, capped at the geometry's raw size:
    decompressing a whole hostile stream first would allocate up to
    ~1032x the compressed bytes (a 1x1-IHDR PNG with a 10 MB IDAT would
    inflate to ~10 GB before any size check ran). Bytes past `expected`
    are never needed — downstream reconstruction slices data[:need] with
    need == expected — so the bound changes no well-formed decode."""
    try:
        d = zlib.decompressobj()
        out = d.decompress(raw, max(expected, 0))
        return np.frombuffer(out, np.uint8)
    except zlib.error as e:
        raise DecodingFailedError(f"{what}: {e}") from e


def _expected_raw_size(width: int, height: int, ch: int, bit_depth: int,
                       interlace: int) -> int:
    """Exact filtered-stream size: per-row filter byte + packed samples,
    summed over Adam7 passes when interlaced."""
    if interlace == 0:
        stride = (width * ch * bit_depth + 7) // 8
        return height * (stride + 1)
    total = 0
    for (x0, y0, dx, dy) in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw == 0 or ph == 0:
            continue
        stride = (pw * ch * bit_depth + 7) // 8
        total += ph * (stride + 1)
    return total


# ---------------------------------------------------------------------------
# chunk walking (host)
# ---------------------------------------------------------------------------

def iter_chunks(buf: bytes):
    """Yield (type, data_offset, length, chunk_end) for each chunk."""
    pos = len(PNG_MAGIC)
    n = len(buf)
    while pos + 8 <= n:
        length = int.from_bytes(buf[pos:pos + 4], "big")
        ctype = buf[pos + 4:pos + 8]
        data_off = pos + 8
        end = data_off + length + 4  # + CRC
        if end > n:
            return
        yield ctype, data_off, length, end
        pos = end
        if ctype == b"IEND":
            return


def png_content_length(buf: bytes) -> int:
    """Bytes up to and including IEND (+CRC); trailing data beyond is
    truncated (acropalypse parity, opencv.go:560-610)."""
    last = len(buf)
    for ctype, _off, _ln, end in iter_chunks(buf):
        if ctype == b"IEND":
            return end
    return last


def is_apng(buf: bytes) -> bool:
    """acTL chunk before IDAT marks an APNG (opencv.go:609-627 behavior)."""
    for ctype, _off, _ln, _end in iter_chunks(buf):
        if ctype == b"acTL":
            return True
        if ctype == b"IDAT":
            return False
    return False


# Adam7 interlace passes: (x_start, y_start, x_step, y_step)
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


class _PngInfo:
    width: int
    height: int
    bit_depth: int
    color_type: int
    interlace: int
    palette: Optional[np.ndarray]
    trns: Optional[bytes]
    icc: bytes


def _parse(buf: bytes) -> "_PngInfo":
    if not buf.startswith(PNG_MAGIC):
        raise InvalidImageError("not a PNG")
    info = _PngInfo()
    info.palette = None
    info.trns = None
    info.icc = b""
    seen_ihdr = False
    for ctype, off, ln, _end in iter_chunks(buf):
        if ctype == b"IHDR":
            if ln < 13:
                raise InvalidImageError("bad IHDR")
            (info.width, info.height, info.bit_depth, info.color_type,
             _comp, _filt, info.interlace) = struct.unpack(">IIBBBBB", buf[off:off + 13])
            if info.bit_depth not in _VALID_DEPTHS.get(info.color_type, ()):
                raise InvalidImageError(
                    f"invalid PNG color type/bit depth "
                    f"{info.color_type}/{info.bit_depth}")
            if info.interlace not in (0, 1):
                raise InvalidImageError("invalid PNG interlace method")
            if (info.width == 0 or info.height == 0
                    or info.width * info.height > _MAX_PIXELS):
                # same ceiling OpenCV's imdecode enforces for the reference
                # (CV_IO_MAX_IMAGE_PIXELS, default 1<<30) — keeps hostile
                # IHDR dims from driving downstream allocations
                raise InvalidImageError("PNG dimensions out of range")
            seen_ihdr = True
        elif ctype == b"PLTE":
            if ln % 3 != 0 or ln == 0:
                raise InvalidImageError("bad PLTE length")
            info.palette = np.frombuffer(buf[off:off + ln], np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            info.trns = buf[off:off + ln]
        elif ctype == b"iCCP":
            data = buf[off:off + ln]
            z = data.find(b"\x00")
            if z != -1 and z + 2 <= len(data):
                try:
                    # cap the inflated size (decompression-bomb guard; same
                    # 1 MiB hardening cap as the JPEG/lcms2 ICC paths)
                    d = zlib.decompressobj()
                    icc = d.decompress(data[z + 2:], _ICC_MAX_BYTES + 1)
                    # require a COMPLETE zlib stream (d.eof): decompressobj
                    # returns partial data on truncation without raising,
                    # and a truncated profile must be dropped, not embedded
                    info.icc = (b"" if len(icc) > _ICC_MAX_BYTES or not d.eof
                                else icc)
                except zlib.error:
                    info.icc = b""
        elif ctype == b"IDAT":
            break
    if not seen_ihdr:
        raise InvalidImageError("PNG missing IHDR")
    return info


_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# spec-legal bit depths per color type (PNG spec 11.2.2)
_VALID_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                 4: (8, 16), 6: (8, 16)}

_ICC_MAX_BYTES = 1 << 20

# OpenCV's CV_IO_MAX_IMAGE_PIXELS default — the ceiling the reference's
# imdecode applies before any allocation
_MAX_PIXELS = 1 << 30


def _unfilter(lib, raw: np.ndarray, rows: int, stride: int, bpp: int) -> np.ndarray:
    out = np.empty(rows * stride, np.uint8)
    rc = lib.lp_png_unfilter(_u8ptr(raw), _u8ptr(out), rows, stride, max(bpp, 1))
    if rc != 0:
        raise DecodingFailedError("bad PNG filter type")
    return out


def _unpack_bits(row_bytes: np.ndarray, bit_depth: int, width: int, channels: int,
                 keep16: bool = False) -> np.ndarray:
    """(rows, stride) packed -> (rows, width*channels) samples.

    16-bit samples reduce to the high byte (libpng strip-16 behavior the
    reference inherits through OpenCV) unless keep16 (used for exact tRNS
    color-key comparison)."""
    if bit_depth == 8:
        return row_bytes[:, :width * channels]
    if bit_depth == 16:
        pairs = row_bytes.reshape(row_bytes.shape[0], -1, 2)[:, :width * channels]
        if keep16:
            return (pairs[..., 0].astype(np.uint16) << 8) | pairs[..., 1]
        return pairs[..., 0]
    # 1/2/4-bit: big-endian bit packing
    rows = row_bytes.shape[0]
    bits = np.unpackbits(row_bytes, axis=1)
    n = width * channels
    per = bit_depth
    groups = bits[:, :n * per].reshape(rows, n, per)
    vals = np.zeros((rows, n), np.uint8)
    for b in range(per):
        vals = ((vals.astype(np.uint16) << 1) | groups[:, :, b]).astype(np.uint8)
    return vals


_GRAY_SCALE = {1: 255, 2: 85, 4: 17, 8: 1, 16: 1}


class PngDecoder(Decoder):
    def __init__(self, buf: bytes):
        self._raw = buf
        self._info = _parse(buf)
        self._lib = binding.load()
        self._decoded = False
        self._apng = is_apng(buf)
        self._header: Optional[ImageHeader] = None

    def header(self) -> ImageHeader:
        if self._header is None:
            i = self._info
            if i.color_type in (4, 6) or i.trns is not None:
                channels = 4
            elif i.color_type == 0:
                channels = 1
            else:
                channels = 3
            num_frames = 1
            if self._apng:
                num_frames = max(len(self._apng_frames()), 1)
            self._header = ImageHeader(
                width=i.width, height=i.height, channels=channels,
                orientation=ImageOrientation.TOP_LEFT, num_frames=num_frames,
                content_length=png_content_length(self._raw))
        return self._header

    def description(self) -> str:
        return "PNG"

    def icc(self) -> bytes:
        return self._info.icc

    @property
    def is_apng(self) -> bool:
        return self._apng

    def loop_count(self) -> int:
        """acTL num_plays (0 = infinite)."""
        for ctype, off, ln, _ in iter_chunks(self._raw):
            if ctype == b"acTL" and ln >= 8:
                return int.from_bytes(self._raw[off + 4:off + 8], "big")
            if ctype == b"IDAT":
                break
        return 0

    # -- decode -------------------------------------------------------------

    def _inflate(self) -> np.ndarray:
        idat = b"".join(self._raw[off:off + ln]
                        for ctype, off, ln, _ in iter_chunks(self._raw)
                        if ctype == b"IDAT")
        i = self._info
        expected = _expected_raw_size(i.width, i.height,
                                      _CHANNELS[i.color_type], i.bit_depth,
                                      i.interlace)
        fast = _inflate_exact(idat, expected, self._lib)
        if fast is not None:
            return fast
        return _inflate_bounded(idat, expected, "PNG inflate failed")

    def _reconstruct_samples(self, keep16: bool = False, data=None,
                             width=None, height=None,
                             interlace=None) -> np.ndarray:
        """Undo filtering+interlace: returns (H, W*channels) samples
        (16-bit reduced to high byte unless keep16)."""
        i = self._info
        ch = _CHANNELS[i.color_type]
        data = self._inflate() if data is None else data
        width = i.width if width is None else width
        height = i.height if height is None else height
        interlace = i.interlace if interlace is None else interlace
        bpp_bytes = max(1, ch * i.bit_depth // 8)
        dtype = np.uint16 if (keep16 and i.bit_depth == 16) else np.uint8
        if interlace == 0:
            stride = (width * ch * i.bit_depth + 7) // 8
            need = height * (stride + 1)
            if data.size < need:
                raise DecodingFailedError("truncated PNG data")
            rows = _unfilter(self._lib, data[:need], height, stride, bpp_bytes)
            rows = rows.reshape(height, stride)
            return _unpack_bits(rows, i.bit_depth, width, ch, keep16)
        # Adam7
        out = np.zeros((height, width * ch), dtype)
        pos = 0
        for (x0, y0, dx, dy) in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            stride = (pw * ch * i.bit_depth + 7) // 8
            need = ph * (stride + 1)
            if data.size - pos < need:
                raise DecodingFailedError("truncated PNG data")
            sub = _unfilter(self._lib, data[pos:pos + need], ph, stride, bpp_bytes)
            pos += need
            samples = _unpack_bits(sub.reshape(ph, stride), i.bit_depth, pw, ch, keep16)
            samples = samples.reshape(ph, pw, ch)
            out.reshape(height, width, ch)[y0::dy, x0::dx, :] = samples
        return out

    def _to_pixels(self, samples: np.ndarray, width: int, height: int):
        """Color-type conversion of raw samples to device BGR(A)/gray pixels."""
        i = self._info
        color_key = i.trns is not None and i.color_type in (0, 2)
        samples = samples.reshape(height, width, _CHANNELS[i.color_type])
        alpha = None
        if color_key:
            nvals = 1 if i.color_type == 0 else 3
            if len(i.trns) < nvals * 2:
                # libpng errors on an undersized tRNS; keep the error typed
                raise DecodingFailedError("bad tRNS length")
            key = np.frombuffer(i.trns[:nvals * 2], ">u2").astype(np.uint32)
            if i.bit_depth < 16:
                key = key & ((1 << i.bit_depth) - 1)
            transparent = np.all(samples.astype(np.uint32) == key, axis=-1)
            alpha = np.where(transparent, 0, 255).astype(np.uint8)
            if samples.dtype == np.uint16:
                samples = (samples >> 8).astype(np.uint8)
        # The swizzle/stack forms below are PURE DATA MOVEMENT, so they
        # stay numpy: as views/copies they cost ~0 here and materialize
        # once when the consumer batches or ships to the device, whereas
        # the former eager-jnp forms measured 47 ms/1080p on the CPU
        # backend — more than inflate+unfilter combined — ON THE SERVING
        # HOST PATH (StillTranscodePipeline pins per-image decode to the
        # CPU backend by design). Arithmetic (palette LUT, gray scale)
        # keeps jnp so it can ride the device when one is default.
        arr = samples
        if i.color_type == 3:
            if i.palette is None:
                raise DecodingFailedError("palette PNG missing PLTE")
            pal = i.palette
            if i.trns is not None:
                alpha = np.full(pal.shape[0], 255, np.uint8)
                # spec-illegal tRNS longer than the palette: extra entries
                # have no pixel to apply to — clamp instead of broadcasting
                t = np.frombuffer(self._trns_bytes(), np.uint8)[:pal.shape[0]]
                alpha[:t.size] = t
                lut = np.concatenate([pal[:, ::-1], alpha[:, None]], axis=1)  # BGRA
            else:
                lut = pal[:, ::-1]  # BGR
            px = jnp.take(jnp.asarray(lut),
                          jnp.asarray(arr[..., 0]).astype(jnp.int32),
                          axis=0, mode="clip")
        elif i.color_type == 0:
            scale = _GRAY_SCALE[i.bit_depth]
            px = (jnp.asarray(arr) * np.uint8(scale)) if scale != 1 else arr
            if alpha is not None:
                g = np.asarray(px)[..., 0]
                px = np.stack([g, g, g, alpha], axis=-1)
        elif i.color_type == 4:
            g, a = arr[..., 0], arr[..., 1]
            px = np.stack([g, g, g, a], axis=-1)
        elif i.color_type == 2:
            # RGB -> BGR contiguous via per-channel assignment: numpy's
            # generic strided loop for reversed-channel views measured
            # 17-104 ms/1080p; three column copies measure ~3 ms and the
            # result memcpys straight into batch arrays
            px = np.empty(arr.shape[:-1] + (3 + (alpha is not None),),
                          arr.dtype)
            px[..., 0] = arr[..., 2]
            px[..., 1] = arr[..., 1]
            px[..., 2] = arr[..., 0]
            if alpha is not None:
                px[..., 3] = alpha
        else:  # 6: RGBA -> BGRA (same contiguous column-assign form)
            px = np.empty_like(arr)
            px[..., 0] = arr[..., 2]
            px[..., 1] = arr[..., 1]
            px[..., 2] = arr[..., 0]
            px[..., 3] = arr[..., 3]
        return px

    def decode_to(self, fb: Framebuffer) -> None:
        if self._apng and self._apng_frames():
            return self._decode_apng_frame(fb)
        if self._decoded:
            raise EOFError()
        i = self._info
        color_key = i.trns is not None and i.color_type in (0, 2)
        samples = self._reconstruct_samples(keep16=color_key)
        fb.array = self._to_pixels(samples, i.width, i.height)
        fb.duration = 0.0
        fb.x_offset = fb.y_offset = 0
        self._decoded = True

    # -- APNG (animated) -------------------------------------------------
    # The reference only DETECTS APNG (opencv.go:609-627) and decodes the
    # static image; full animated decode here reuses the PNG unfilter and
    # hands frames to ImageOps with APNG dispose/blend semantics.

    def _apng_frames(self):
        if hasattr(self, "_frames"):
            return self._frames
        frames = []
        cur = None  # (fctl dict, [data chunks])
        for ctype, off, ln, _end in iter_chunks(self._raw):
            if ctype == b"fcTL" and ln >= 26:
                if cur is not None:
                    frames.append(cur)
                f = struct.unpack(">IIIIIHHBB", self._raw[off:off + 26])
                # APNG spec: the frame rect must lie inside the IHDR
                # canvas. Hostile offsets otherwise surface as untyped
                # ValueErrors from the compositing copy (or mis-stride
                # the reconstruction into shifted garbage rows).
                if (f[1] == 0 or f[2] == 0
                        or f[3] + f[1] > self._info.width
                        or f[4] + f[2] > self._info.height):
                    raise InvalidImageError(
                        "APNG frame rect exceeds canvas")
                cur = ({"w": f[1], "h": f[2], "x": f[3], "y": f[4],
                        "delay_num": f[5], "delay_den": f[6],
                        "dispose": f[7], "blend": f[8]}, [])
            elif ctype == b"IDAT":
                if cur is not None:
                    cur[1].append(self._raw[off:off + ln])
            elif ctype == b"fdAT" and ln > 4:
                if cur is not None:
                    cur[1].append(self._raw[off + 4:off + ln])
        if cur is not None:
            frames.append(cur)
        self._frames = [f for f in frames if f[1]]
        self._frame_idx = 0
        return self._frames

    def _decode_apng_frame(self, fb: Framebuffer) -> None:
        frames = self._apng_frames()
        if self._frame_idx >= len(frames):
            raise EOFError()
        meta, chunks = frames[self._frame_idx]
        raw = b"".join(chunks)
        i = self._info
        expected = _expected_raw_size(meta["w"], meta["h"],
                                      _CHANNELS[i.color_type], i.bit_depth,
                                      i.interlace)
        data = _inflate_exact(raw, expected, self._lib)
        if data is None:
            data = _inflate_bounded(raw, expected,
                                    "APNG frame inflate failed")
        # frames use the IHDR interlace method (APNG spec: frame data is
        # encoded like the static image, Adam7 laid out over the frame rect)
        samples = self._reconstruct_samples(
            keep16=self._info.trns is not None and self._info.color_type in (0, 2),
            data=data, width=meta["w"], height=meta["h"],
            interlace=self._info.interlace)
        fb.array = self._to_pixels(samples, meta["w"], meta["h"])
        den = meta["delay_den"] or 100
        fb.duration = meta["delay_num"] / den
        fb.x_offset, fb.y_offset = meta["x"], meta["y"]
        from ..framebuffer import BlendMethod, DisposeMethod
        fb.dispose = DisposeMethod(min(meta["dispose"], 2))
        # APNG blend 0 = replace, 1 = over (inverse of our enum values)
        fb.blend = (BlendMethod.USE_ALPHA_BLENDING if meta["blend"] == 1
                    else BlendMethod.NO_BLEND)
        self._frame_idx += 1

    def skip_frame(self) -> None:
        if self._apng and self._apng_frames():
            if self._frame_idx >= len(self._frames):
                raise EOFError()
            self._frame_idx += 1
            return
        from ..errors import SkipNotSupportedError
        raise SkipNotSupportedError()

    def _trns_bytes(self) -> bytes:
        return self._info.trns or b""


class PngEncoder(Encoder):
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
            raise DecodingFailedError("PNG encoder cannot flush without a frame")
        opts = opts or {}
        check_encode_options(opts, _PNG_ENCODE_KEYS, "png")
        level = int(opts.get(PNG_COMPRESSION, 6))
        return encode_png_pixels(fb.to_numpy(), level, self._icc,
                                 strategy=opts.get(PNG_STRATEGY),
                                 bilevel=bool(opts.get(PNG_BILEVEL, 0)))


def _pack_bilevel(gray: np.ndarray) -> np.ndarray:
    """(H, W) u8 -> 1-bit-packed scanlines with a 0 (None) filter byte per
    row. cv2 oracle semantics: any nonzero pixel -> bit 1 (decodes back as
    255), MSB-first within each byte (PNG packing order)."""
    h, w = gray.shape
    bits = (gray != 0).astype(np.uint8)
    packed = np.packbits(bits, axis=1)  # MSB-first, zero-padded rows
    return np.concatenate(
        [np.zeros((h, 1), np.uint8), packed], axis=1).reshape(-1)


def encode_png_pixels(arr: np.ndarray, level: int = 6,
                      icc: Optional[bytes] = None,
                      strategy: Optional[int] = None,
                      bilevel: bool = False) -> bytes:
    """Encode (H, W, 1|3|4) BGR(A)/gray u8 pixels to PNG (host: C++ Paeth
    filter + zlib deflate). The numpy-level body of PngEncoder.encode,
    shared with the serving pipeline's still-output path.

    strategy: zlib strategy 0..4 (IMWRITE_PNG_STRATEGY passthrough —
    values are zlib's own Z_*_STRATEGY constants, like OpenCV's).
    bilevel: 1-bit grayscale output (IMWRITE_PNG_BILEVEL); color input is
    converted via the BGR luma weights first, then thresholded nonzero."""
    lib = binding.load()
    level = min(max(int(level), 0), 9)
    h, w, c = arr.shape
    if bilevel:
        if c == 1:
            gray = arr[:, :, 0]
        else:  # BT.601 luma of BGR, the cv2 color->gray convention
            gray = (arr[:, :, 0] * 0.114 + arr[:, :, 1] * 0.587
                    + arr[:, :, 2] * 0.299 + 0.5).astype(np.uint8)
        filtered = _pack_bilevel(gray)
        comp = _deflate_strategy(filtered.tobytes(), level, strategy, lib)
        return _assemble_png(w, h, 1, 0, comp, icc, lib)
    if c == 3:
        # contiguous RGB via per-channel column assignment: the generic
        # strided loop for the reversed-channel view measured tens of ms
        # at 1080p (same data-movement fix as the decode path above)
        rgb = np.empty((h, w, 3), np.uint8)
        rgb[..., 0] = arr[..., 2]
        rgb[..., 1] = arr[..., 1]
        rgb[..., 2] = arr[..., 0]
        color_type = 2
    elif c == 4:
        rgb = np.empty((h, w, 4), np.uint8)
        rgb[..., 0] = arr[..., 2]
        rgb[..., 1] = arr[..., 1]
        rgb[..., 2] = arr[..., 0]
        rgb[..., 3] = arr[..., 3]
        color_type = 6
    else:
        rgb = np.ascontiguousarray(arr[:, :, 0:1])
        color_type = 0
    ch = rgb.shape[2]
    raw = rgb.reshape(h, w * ch)
    stride = w * ch
    filtered = np.empty(h * (stride + 1), np.uint8)
    lib.lp_png_filter(_u8ptr(raw), _u8ptr(filtered), h, stride, ch)
    comp = _deflate_strategy(filtered.tobytes(), level, strategy, lib)
    return _assemble_png(w, h, 8, color_type, comp, icc, lib)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    body = ctype + data
    return (struct.pack(">I", len(data)) + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF))


def _assemble_png(w: int, h: int, bit_depth: int, color_type: int,
                  comp: bytes, icc: bytes, lib) -> bytes:
    """Shared container tail (magic/IHDR/iCCP/IDAT/IEND) for the bilevel
    and normal encode branches — one copy of the chunk framing."""
    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    out = [PNG_MAGIC, _png_chunk(b"IHDR", ihdr)]
    if icc:
        out.append(_png_chunk(
            b"iCCP", b"ICC Profile\x00\x00" + _deflate(icc, 9, lib)))
    out.append(_png_chunk(b"IDAT", comp))
    out.append(_png_chunk(b"IEND", b""))
    return b"".join(out)
