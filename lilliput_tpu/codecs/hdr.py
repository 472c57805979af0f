"""Radiance HDR codec (.hdr, RGBE) — OpenCV-fallthrough parity.

The reference decodes .hdr through OpenCV's always-compiled grfmt_hdr
reader (`NewDecoder` fallthrough, /root/reference/lilliput.go:157 ->
opencv.cpp:93-102) and encodes by extension through cv::imencode
(/root/reference/lilliput.go:199). Conversion conventions match OpenCV:
decode RGBE -> float (mantissa * 2^(e-136)) -> u8 as round(f*255)
saturated; encode u8 -> f=v/255 -> RGBE with shared exponent
(truncating mantissas, like rgbe.cpp's float2rgbe).

TPU split: header lines + the serial scanline RLE walks stay host; the
RGBE<->float math (exp2 / frexp expressed as log2-floor, pure
elementwise) and the u8 conversion run on device.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..errors import DecodingFailedError, InvalidImageError
from ..framebuffer import Framebuffer, ImageHeader, ImageOrientation
from ..interfaces import Decoder, Encoder

_MAX_DIM = 1 << 20


def is_hdr(buf: bytes) -> bool:
    return buf.startswith(b"#?RADIANCE") or buf.startswith(b"#?RGBE")


def _decode_scanlines(buf: bytes, off: int, w: int, h: int) -> np.ndarray:
    """RGBE scanlines -> (h, w, 4) u8. Handles the new-style per-component
    RLE (0x02 0x02 marker), the old-style run marker (1,1,1,count repeats
    the previous pixel), and flat data. Serial byte walk — host."""
    out = np.empty((h, w, 4), np.uint8)
    n = len(buf)
    y = 0
    while y < h:
        if off + 4 > n:
            raise DecodingFailedError("HDR pixel data truncated")
        p0, p1, p2, p3 = buf[off], buf[off + 1], buf[off + 2], buf[off + 3]
        if p0 == 2 and p1 == 2 and (p2 << 8 | p3) == w and w >= 8:
            # new-style: each of the 4 components RLE'd across the scanline
            off += 4
            row = np.empty((4, w), np.uint8)
            for c in range(4):
                x = 0
                while x < w:
                    if off >= n:
                        raise DecodingFailedError("HDR RLE truncated")
                    cnt = buf[off]
                    off += 1
                    if cnt > 128:  # run of cnt-128 copies of next byte
                        cnt -= 128
                        if off >= n or x + cnt > w:
                            raise DecodingFailedError("HDR RLE overrun")
                        row[c, x:x + cnt] = buf[off]
                        off += 1
                    else:  # cnt literal bytes
                        if off + cnt > n or x + cnt > w:
                            raise DecodingFailedError("HDR RLE overrun")
                        row[c, x:x + cnt] = np.frombuffer(
                            buf, np.uint8, count=cnt, offset=off)
                        off += cnt
                    x += cnt
            out[y] = row.T
            y += 1
            continue
        # flat scanline fast path: no old-RLE (1,1,1,count) marker beyond
        # the first pixel -> a straight (w, 4) view is exact (vectorized;
        # our own encoder writes flat scanlines, so this is the hot case)
        if off + 4 * w <= n:
            row = np.frombuffer(buf, np.uint8, count=4 * w, offset=off)
            rv = row.reshape(w, 4)
            if not ((rv[1:, 0] == 1) & (rv[1:, 1] == 1)
                    & (rv[1:, 2] == 1)).any():
                out[y] = rv
                off += 4 * w
                y += 1
                continue
        # old-style-RLE scanline: walk pixels serially
        x = 0
        shift = 0
        while y < h:
            if off + 4 > n:
                raise DecodingFailedError("HDR pixel data truncated")
            r, g, b, e = buf[off], buf[off + 1], buf[off + 2], buf[off + 3]
            off += 4
            if r == 1 and g == 1 and b == 1 and x > 0:
                cnt = e << shift
                if x + cnt > w:
                    raise DecodingFailedError("HDR old-RLE overrun")
                out[y, x:x + cnt] = out[y, x - 1]
                x += cnt
                shift += 8
            else:
                out[y, x] = (r, g, b, e)
                x += 1
                shift = 0
            if x == w:
                y += 1
                x = 0
                shift = 0
                break
    return out


def rgbe_to_u8_bgr(rgbe: jnp.ndarray) -> jnp.ndarray:
    """(…, 4) RGBE u8 -> (…, 3) BGR u8, the OpenCV conversion chain
    (rgbe2float then the *255 saturate of IMREAD_COLOR) — device math."""
    m = rgbe[..., :3].astype(jnp.float32)
    e = rgbe[..., 3].astype(jnp.int32)
    scale = jnp.where(e > 0, jnp.exp2((e - 136).astype(jnp.float32)), 0.0)
    f = m * scale[..., None]
    u8 = jnp.clip(jnp.round(f * 255.0), 0, 255).astype(jnp.uint8)
    return u8[..., ::-1]  # RGB -> BGR


def u8_bgr_to_rgbe(px: jnp.ndarray) -> jnp.ndarray:
    """(…, 3) BGR u8 -> (…, 4) RGBE u8 with OpenCV's float2rgbe semantics
    (shared exponent from the max channel, truncating mantissas)."""
    f = px[..., ::-1].astype(jnp.float32) / 255.0  # BGR -> RGB, to float
    v = jnp.max(f, axis=-1)
    # frexp: v = m * 2^e, m in [0.5, 1) -> e = floor(log2(v)) + 1
    e = jnp.floor(jnp.log2(jnp.maximum(v, 1e-38))).astype(jnp.int32) + 1
    scale = jnp.exp2((8 - e).astype(jnp.float32))
    mant = (f * scale[..., None]).astype(jnp.uint8)  # truncation, < 256
    tiny = v < 1e-32
    rgbe = jnp.concatenate(
        [jnp.where(tiny[..., None], 0, mant),
         jnp.where(tiny, 0, e + 128).astype(jnp.uint8)[..., None]], axis=-1)
    return rgbe


class HdrDecoder(Decoder):
    def __init__(self, buf: bytes):
        if not is_hdr(buf):
            raise InvalidImageError("not a Radiance HDR")
        self._buf = buf
        # header: text lines up to a blank line, then the resolution line
        end = buf.find(b"\n\n")
        if end < 0:
            raise InvalidImageError("HDR header truncated")
        res_end = buf.find(b"\n", end + 2)
        if res_end < 0:
            raise InvalidImageError("HDR resolution line truncated")
        parts = buf[end + 2:res_end].split()
        # standard orientation only (what OpenCV supports): -Y h +X w
        if (len(parts) != 4 or parts[0] != b"-Y" or parts[2] != b"+X"):
            raise InvalidImageError("unsupported HDR pixel ordering")
        try:
            self._h, self._w = int(parts[1]), int(parts[3])
        except ValueError as e:
            raise InvalidImageError("bad HDR resolution") from e
        if not (0 < self._w <= _MAX_DIM and 0 < self._h <= _MAX_DIM):
            raise InvalidImageError("invalid HDR dimensions")
        self._data_off = res_end + 1
        self._decoded = False

    def header(self) -> ImageHeader:
        return ImageHeader(width=self._w, height=self._h, channels=3,
                           orientation=ImageOrientation.TOP_LEFT,
                           num_frames=1, content_length=len(self._buf))

    def description(self) -> str:
        return "HDR"

    def icc(self) -> bytes:
        return b""

    def decode_to(self, fb: Framebuffer) -> None:
        if self._decoded:
            raise EOFError()
        rgbe = _decode_scanlines(self._buf, self._data_off, self._w, self._h)
        fb.array = rgbe_to_u8_bgr(jnp.asarray(rgbe))
        fb.duration = 0.0
        fb.x_offset = fb.y_offset = 0
        self._decoded = True

    def duration(self) -> float:
        return 0.0

    def loop_count(self) -> int:
        return 0

    def background_color(self):
        return 0

    def skip_frame(self) -> None:
        raise NotImplementedError

    def is_streamable(self) -> bool:
        return False

    def has_subtitles(self) -> bool:
        return False

    def video_codec(self) -> str:
        return ""

    def audio_codec(self) -> str:
        return ""

    def close(self) -> None:
        pass


class HdrEncoder(Encoder):
    """Flat (non-RLE) RGBE writer — every Radiance reader, including
    OpenCV's, accepts unencoded scanlines; gray input is broadcast to
    RGB first (imwrite converts to 3 channels the same way)."""

    def __init__(self, decoded_by: Optional[Decoder] = None,
                 icc_override: Optional[bytes] = None):
        del decoded_by, icc_override

    def encode(self, fb: Optional[Framebuffer],
               opts: Dict[int, int]) -> Optional[bytes]:
        del opts
        if fb is None:
            raise DecodingFailedError(
                "HDR encoder cannot flush without a frame")
        px = fb.array
        if px.ndim == 2:
            px = px[..., None]
        if px.shape[-1] == 1:
            px = jnp.repeat(px, 3, axis=-1)
        rgbe = np.asarray(u8_bgr_to_rgbe(px[..., :3]))
        h, w = rgbe.shape[:2]
        head = (b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n"
                + b"-Y %d +X %d\n" % (h, w))
        return head + rgbe.tobytes()

    def close(self) -> None:
        pass
