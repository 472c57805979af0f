"""AVIF codec: libavif (through PIL's plugin) for AV1 entropy/recon, own
ISOBMFF metadata parsing, device-side HDR->SDR tone mapping.

Capability parity with the reference AVIF path (avif.cpp/avif.go): static +
animated (avis) decode, per-frame durations (stts box, ms timescale), loop
count semantics (infinite/unknown -> 0, avif.cpp:401-413), ICC extraction
with Rec709 substitution for tone-mapped HDR output (avif.cpp:415-427),
CICP-based HDR detection (PQ=16/HLG=18 transfer in the colr/nclx box), and
quality/speed encode options on the ms timescale.

HDR note: the AV1 decode surfaces an 8-bit PQ/HLG-coded signal here (the
transfer function is not applied by the YUV->RGB stage), so the fused device
kernel ops/color.py:hdr_to_sdr (PQ/HLG linearize -> primaries to BT.709 ->
Reinhard -> sRGB) operates on that signal; a native 10-bit libavif shim can
later lift precision without changing the pipeline shape.
"""

from __future__ import annotations

import io
import struct
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..errors import DecodingFailedError, InvalidImageError
from ..framebuffer import (AVIF_QUALITY, AVIF_SPEED, BlendMethod,
                           DisposeMethod, Framebuffer, ImageHeader,
                           ImageOrientation)
from ..interfaces import Decoder, Encoder
from ..ops import color as COLOR
from .icc import REC709_PROFILE

try:
    from PIL import Image as _PILImage
    _HAVE_PIL_AVIF = True
except Exception:  # pragma: no cover
    _HAVE_PIL_AVIF = False

CICP_TRANSFER_PQ = 16
CICP_TRANSFER_HLG = 18


# ---------------------------------------------------------------------------
# ISOBMFF helpers (host): timing + CICP
# ---------------------------------------------------------------------------

def _iter_boxes(buf: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos:pos + 4], "big")
        typ = buf[pos + 4:pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                return
            size = int.from_bytes(buf[pos + 8:pos + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            return
        yield typ, pos + hdr, pos + size
        pos += size


def _find_box(buf: bytes, path: List[bytes], start=0, end=None):
    end = len(buf) if end is None else end
    if not path:
        return start, end
    for typ, s, e in _iter_boxes(buf, start, end):
        if typ == path[0]:
            # fullbox children for some containers handled by caller offsets
            r = _find_box(buf, path[1:], s, e)
            if r:
                return r
    return None


def parse_avis_timing(buf: bytes) -> Tuple[List[float], int]:
    """Per-frame durations (seconds) from the pict track's stts; loop count
    (0 = infinite/unknown, parity with avif.cpp:401-413)."""
    moov = _find_box(buf, [b"moov"])
    if not moov:
        return [], 0
    ms, me = moov
    durations: List[float] = []
    for typ, s, e in _iter_boxes(buf, ms, me):
        if typ != b"trak":
            continue
        mdia = _find_box(buf, [b"mdia"], s, e)
        if not mdia:
            continue
        timescale = 1000
        mdhd = _find_box(buf, [b"mdhd"], *mdia)
        if mdhd:
            v = buf[mdhd[0]]
            timescale = int.from_bytes(
                buf[mdhd[0] + (20 if v == 1 else 12):
                    mdhd[0] + (24 if v == 1 else 16)], "big") or 1000
        stts = _find_box(buf, [b"minf", b"stbl", b"stts"], *mdia)
        if not stts:
            continue
        s0 = stts[0] + 4  # version/flags
        (count,) = struct.unpack(">I", buf[s0:s0 + 4])
        ds: List[float] = []
        for i in range(count):
            off = s0 + 4 + i * 8
            n, delta = struct.unpack(">II", buf[off:off + 8])
            ds.extend([delta / timescale] * n)
        if len(ds) > len(durations):
            durations = ds
    return durations, 0


def parse_cicp(buf: bytes) -> Optional[Tuple[int, int, int, int]]:
    """(primaries, transfer, matrix, full_range) from the first colr/nclx box."""
    idx = buf.find(b"colrnclx")
    if idx == -1 or idx + 15 > len(buf):
        return None
    p, t, m = struct.unpack(">HHH", buf[idx + 8:idx + 14])
    fr = (buf[idx + 14] >> 7) & 1
    return (p, t, m, fr)


def _cicp_is_hdr(cicp) -> bool:
    return cicp is not None and cicp[1] in (CICP_TRANSFER_PQ, CICP_TRANSFER_HLG)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

class AvifDecoder(Decoder):
    def __init__(self, buf: bytes, tone_mapping_enabled: bool = True):
        if not _HAVE_PIL_AVIF:
            raise InvalidImageError("AVIF support unavailable")
        self._raw = buf
        try:
            self._im = _PILImage.open(io.BytesIO(buf))
            self._im.load()
        except Exception as e:
            raise InvalidImageError(f"not a valid AVIF: {e}") from e
        self._tone_map = tone_mapping_enabled
        self._cicp = parse_cicp(buf)
        self._is_hdr = _cicp_is_hdr(self._cicp)
        self._frames = getattr(self._im, "n_frames", 1)
        self._durations, self._loops = parse_avis_timing(buf)
        self._next = 0

    def header(self) -> ImageHeader:
        channels = 4 if self._im.mode in ("RGBA", "LA", "PA") else 3
        orientation = ImageOrientation.TOP_LEFT
        try:
            o = self._im.getexif().get(0x0112)
            if o and 1 <= int(o) <= 8:
                orientation = ImageOrientation(int(o))
        except Exception:
            pass
        return ImageHeader(width=self._im.size[0], height=self._im.size[1],
                           channels=channels, orientation=orientation,
                           num_frames=self._frames,
                           content_length=len(self._raw))

    def description(self) -> str:
        return "AVIF"

    def duration(self) -> float:
        return float(sum(self._durations))

    def loop_count(self) -> int:
        return self._loops

    def icc(self) -> bytes:
        # Rec709 substitution for tone-mapped HDR output (avif.cpp:415-427)
        if self._tone_map and self._is_hdr:
            return REC709_PROFILE
        return self._im.info.get("icc_profile", b"") or b""

    def decode_to(self, fb: Framebuffer) -> None:
        if self._next >= self._frames:
            raise EOFError()
        try:
            self._im.seek(self._next)
        except EOFError:
            raise
        mode = "RGBA" if self._im.mode in ("RGBA", "LA", "PA") else "RGB"
        arr = np.asarray(self._im.convert(mode))
        if mode == "RGBA":
            bgr = arr[:, :, [2, 1, 0, 3]]
        else:
            bgr = arr[:, :, ::-1]
        px = jnp.asarray(np.ascontiguousarray(bgr))
        if self._tone_map and self._is_hdr:
            primaries = {9: "bt2020", 12: "p3", 1: "bt709"}.get(
                self._cicp[0], "bt2020")
            transfer = "pq" if self._cicp[1] == CICP_TRANSFER_PQ else "hlg"
            rgb = px[..., :3][..., ::-1].astype(jnp.float32) / 255.0
            sdr = COLOR.hdr_to_sdr(rgb, transfer=transfer, primaries=primaries)
            bgr_sdr = sdr[..., ::-1]
            px = (jnp.concatenate([bgr_sdr, px[..., 3:4]], axis=-1)
                  if mode == "RGBA" else bgr_sdr)
        fb.array = px
        if self._next < len(self._durations):
            fb.duration = self._durations[self._next]
        else:
            fb.duration = 0.0
        fb.x_offset = fb.y_offset = 0
        fb.blend = BlendMethod.NO_BLEND          # avis frames are full canvas
        fb.dispose = DisposeMethod.NO_DISPOSE
        self._next += 1

    def skip_frame(self) -> None:
        if self._next >= self._frames:
            raise EOFError()
        self._next += 1

    def close(self) -> None:
        try:
            self._im.close()
        except Exception:
            pass


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

class AvifEncoder(Encoder):
    """Buffers frames, emits still or animated AVIF on flush (ms timescale,
    quality/speed options — avif.cpp:614-776 behavior)."""

    def __init__(self, decoded_by: Optional[Decoder] = None,
                 icc_override: Optional[bytes] = None):
        if not _HAVE_PIL_AVIF:
            raise InvalidImageError("AVIF support unavailable")
        self._icc = icc_override
        if self._icc is None and decoded_by is not None:
            try:
                self._icc = decoded_by.icc() or None
            except Exception:
                self._icc = None
        self._frames: List[np.ndarray] = []
        self._durations: List[int] = []
        self._opts: Dict[int, int] = {}
        self._flushed = False

    def encode(self, fb: Optional[Framebuffer], opts: Dict[int, int]) -> Optional[bytes]:
        if self._flushed:
            raise EOFError()
        if fb is not None:
            self._opts = opts or {}
            arr = fb.to_numpy()
            rgb = arr[:, :, [2, 1, 0, 3]] if arr.shape[2] == 4 else arr[:, :, ::-1]
            self._frames.append(np.ascontiguousarray(rgb))
            self._durations.append(max(int(round(fb.duration * 1000)), 0))
            return None
        if not self._frames:
            raise DecodingFailedError("avif encoder got no frames")
        quality = int(self._opts.get(AVIF_QUALITY, 60))
        speed = int(self._opts.get(AVIF_SPEED, 6))
        imgs = [_PILImage.fromarray(f) for f in self._frames]
        bio = io.BytesIO()
        kwargs = dict(format="AVIF", quality=min(max(quality, 0), 100),
                      speed=min(max(speed, 0), 10))
        if self._icc:
            kwargs["icc_profile"] = self._icc
        if len(imgs) > 1:
            kwargs.update(save_all=True, append_images=imgs[1:],
                          duration=self._durations or 100, loop=0)
        imgs[0].save(bio, **kwargs)
        self._flushed = True
        return bio.getvalue()
