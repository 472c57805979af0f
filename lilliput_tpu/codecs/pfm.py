"""PFM codec (Portable FloatMap, PF/Pf) — OpenCV-fallthrough parity.

The reference decodes .pfm through OpenCV's always-compiled grfmt_pfm
reader (`NewDecoder` fallthrough, /root/reference/lilliput.go:157 ->
opencv.cpp:93-102) and encodes by extension through cv::imencode
(/root/reference/lilliput.go:199). OpenCV conventions (verified against
this env's cv2): floats are NOT rescaled on either side — u8 output is
saturate(round(f)), u8 input is written as float values 0..255; the
scale token's magnitude is ignored, only its sign (endianness) matters;
scanlines are stored bottom-up.

TPU split: header token walk host; endian swap, bottom-up flip,
float->u8 saturation, RGB->BGR reorder on device.
"""

from __future__ import annotations

import re
from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..errors import DecodingFailedError, InvalidImageError
from ..framebuffer import Framebuffer, ImageHeader, ImageOrientation
from ..interfaces import Decoder, Encoder

_MAX_DIM = 1 << 20
_TOKEN = re.compile(rb"(?:\s|#[^\n]*\n)*([^\s#]+)")


def is_pfm(buf: bytes) -> bool:
    return (len(buf) >= 3 and buf[0] == 0x50  # 'P'
            and buf[1] in b"Ff" and buf[2] in b" \t\r\n")


class PfmDecoder(Decoder):
    def __init__(self, buf: bytes):
        if not is_pfm(buf):
            raise InvalidImageError("not a PFM")
        self._buf = buf
        self._color = buf[1] == 0x46  # 'F' color, 'f' gray
        pos = 2

        def tok():
            nonlocal pos
            m = _TOKEN.match(buf, pos)
            if not m:
                raise InvalidImageError("PFM header truncated")
            pos = m.end()
            return m.group(1)

        try:
            self._w = int(tok())
            self._h = int(tok())
            scale = float(tok())
        except ValueError as e:
            raise InvalidImageError("bad PFM header") from e
        if not (0 < self._w <= _MAX_DIM and 0 < self._h <= _MAX_DIM
                and scale != 0):
            raise InvalidImageError("invalid PFM header")
        self._little = scale < 0
        self._data_off = pos + 1  # exactly one whitespace byte after scale
        self._decoded = False

    def header(self) -> ImageHeader:
        return ImageHeader(width=self._w, height=self._h,
                           channels=3 if self._color else 1,
                           orientation=ImageOrientation.TOP_LEFT,
                           num_frames=1, content_length=len(self._buf))

    def description(self) -> str:
        return "PFM"

    def icc(self) -> bytes:
        return b""

    def decode_to(self, fb: Framebuffer) -> None:
        if self._decoded:
            raise EOFError()
        c = 3 if self._color else 1
        need = self._w * self._h * c * 4
        if len(self._buf) - self._data_off < need:
            raise DecodingFailedError("PFM pixel data truncated")
        dt = np.dtype(np.float32).newbyteorder("<" if self._little else ">")
        f = np.frombuffer(self._buf, dt, count=self._w * self._h * c,
                          offset=self._data_off)
        f = jnp.asarray(f.reshape(self._h, self._w, c), jnp.float32)
        f = f[::-1]  # bottom-up storage
        # OpenCV's IMREAD_COLOR conversion: saturate, NO 255 scaling
        px = jnp.clip(jnp.round(f), 0, 255).astype(jnp.uint8)
        if self._color:
            px = px[..., ::-1]  # RGB -> BGR
        fb.array = px
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


class PfmEncoder(Encoder):
    """Little-endian writer (scale -1), u8 values stored unscaled as
    floats — byte-compatible with cv::imencode(".pfm", u8_mat)."""

    def __init__(self, decoded_by: Optional[Decoder] = None,
                 icc_override: Optional[bytes] = None):
        del decoded_by, icc_override

    def encode(self, fb: Optional[Framebuffer],
               opts: Dict[int, int]) -> Optional[bytes]:
        del opts
        if fb is None:
            raise DecodingFailedError(
                "PFM encoder cannot flush without a frame")
        arr = fb.to_numpy()
        if arr.ndim == 3 and arr.shape[2] == 1:
            arr = arr[:, :, 0]
        gray = arr.ndim == 2
        h, w = arr.shape[:2]
        if gray:
            body = arr.astype("<f4")
        else:
            body = arr[:, :, 2::-1].astype("<f4")  # BGR(A) -> RGB
        body = body[::-1]  # bottom-up
        head = b"%s\n%d %d\n-1\n" % (b"Pf" if gray else b"PF", w, h)
        return head + np.ascontiguousarray(body).tobytes()

    def close(self) -> None:
        pass
