"""AVIF codec: own ISOBMFF walk + dav1d (via the ffmpeg shim) for decode,
libaom for encode, device-side HDR->SDR tone mapping. PIL/libavif is a
test oracle and the LILLIPUT_AVIF=pil escape hatch only.

Capability parity with the reference AVIF path (avif.cpp/avif.go): static +
animated (avis) decode, per-frame durations (stts box, ms timescale), loop
count semantics (infinite/unknown -> 0, avif.cpp:401-413), ICC extraction
with Rec709 substitution for tone-mapped HDR output (avif.cpp:415-427),
CICP-based HDR detection (PQ=16/HLG=18 transfer in the colr/nclx box), and
quality/speed encode options on the ms timescale.

SDR decode converts dav1d planes at ANY depth (8/10/12-bit) through the
empirically pinned libavif/libyuv ruleset (yuv_rgb.planes_to_bgr_u8) —
bit-identical to PIL/libavif output, gated in tests. HDR sources with
tone mapping enabled take the full-precision device path instead
(_decode_raw_hdr): native-depth YUV -> R'G'B' -> PQ/HLG linearize ->
primaries to BT.709 -> Reinhard -> sRGB (ops/color.py:hdr_to_sdr).
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
from ..interfaces import Decoder, Encoder, check_encode_options

_AVIF_ENCODE_KEYS = frozenset({AVIF_QUALITY, AVIF_SPEED})
from ..ops import color as COLOR
from .icc import REC709_PROFILE

try:
    from PIL import Image as _PILImage
    _HAVE_PIL_AVIF = True
except Exception:  # pragma: no cover
    _HAVE_PIL_AVIF = False

CICP_TRANSFER_PQ = 16
CICP_TRANSFER_HLG = 18

# cap on per-frame timing entries expanded from stts (DoS hardening)
_MAX_TIMING_SAMPLES = 1 << 16


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
        if s0 + 4 > stts[1]:
            continue
        (count,) = struct.unpack(">I", buf[s0:s0 + 4])
        # entries must live inside the stts box (truncation guard), and the
        # expanded list is capped: sample_count fields are attacker-
        # controlled u32s that would otherwise size a multi-GB Python list
        count = min(count, (stts[1] - s0 - 4) // 8)
        ds: List[float] = []
        for i in range(count):
            if len(ds) >= _MAX_TIMING_SAMPLES:
                break  # cap reached — stop expanding
            off = s0 + 4 + i * 8
            n, delta = struct.unpack(">II", buf[off:off + 8])
            n = min(n, _MAX_TIMING_SAMPLES - len(ds))
            if n > 0:
                # a file-supplied zero sample_count entry extends nothing
                # but must NOT abort the remaining entries
                ds.extend([delta / timescale] * n)
        if len(ds) > len(durations):
            durations = ds
    return durations, 0


def parse_cicp(buf: bytes) -> Optional[Tuple[int, int, int, int]]:
    """(primaries, transfer, matrix, full_range) of the image's colr/nclx.

    Stills: the PRIMARY item's ipma-associated colr property (an alpha
    item's colr or stray mdat bytes can never be picked up). Animated /
    fallback: a search scoped to the moov (sample entry) or meta box —
    never the whole buffer, which includes entropy-coded mdat payload."""
    payload = None
    # animated (avis): the pict track's sample-entry colr governs playback,
    # so a moov-scoped hit wins over any still cover item's property
    moov = _find_box(buf, [b"moov"])
    if moov:
        # scope the search to the COLOR track's stsd sample entry: a raw
        # moov-wide scan can pick up an alpha/aux track's colr first, or
        # coincidental bytes in an unrelated box payload (ADVICE r3 #2)
        for typ, s, e in _iter_boxes(buf, *moov):
            if typ != b"trak":
                continue
            mdia = _find_box(buf, [b"mdia"], s, e)
            if not mdia:
                continue
            hdlr = _find_box(buf, [b"hdlr"], *mdia)
            # hdlr payload: version/flags(4) pre_defined(4) handler(4)
            if (not hdlr or hdlr[1] - hdlr[0] < 12
                    or buf[hdlr[0] + 8:hdlr[0] + 12] != b"pict"):
                continue
            # an alpha track references the color track via tref/auxl —
            # skip it; the color track carries no tref
            tref = _find_box(buf, [b"tref"], s, e)
            if tref and b"auxl" in buf[tref[0]:tref[1]]:
                continue
            stsd = _find_box(buf, [b"minf", b"stbl", b"stsd"], *mdia)
            if not stsd:
                continue
            idx = buf.find(b"colrnclx", stsd[0], stsd[1])
            if idx != -1 and idx + 15 <= stsd[1]:
                payload = buf[idx + 4:idx + 15]
                break
        if payload is None:
            # fallback: the original moov-scoped scan (hand-rolled or
            # truncated files whose trak walk fails)
            idx = buf.find(b"colrnclx", moov[0], moov[1])
            if idx != -1 and idx + 15 <= moov[1]:
                payload = buf[idx + 4:idx + 15]
    still_parsed = False
    if payload is None:
        try:
            from . import av1_raw as _AR
            si = _AR.parse_still_items(buf)
            if si is not None:
                still_parsed = True
                payload = si.nclx
        except Exception:
            still_parsed = False
    if payload is None and not still_parsed:
        # substring fallback ONLY when the item walk could not parse the
        # meta box at all — if it parsed and found no primary-item colr,
        # searching ipco raw would misattribute an alpha item's nclx
        box = _find_box(buf, [b"meta"])
        if box:
            idx = buf.find(b"colrnclx", box[0], box[1])
            if idx != -1 and idx + 15 <= box[1]:
                payload = buf[idx + 4:idx + 15]
    if payload is None or len(payload) < 11:
        return None
    p, t, m = struct.unpack(">HHH", payload[4:10])
    fr = (payload[10] >> 7) & 1
    return (p, t, m, fr)


def _cicp_is_hdr(cicp) -> bool:
    return cicp is not None and cicp[1] in (CICP_TRANSFER_PQ, CICP_TRANSFER_HLG)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def _av1c_depth(av1c: bytes) -> int:
    """Coded bit depth from the av1C config record (byte 2:
    seq_tier(1) high_bitdepth(1) twelve_bit(1) ...)."""
    if len(av1c) < 3:
        return 8
    b = av1c[2]
    if not (b & 0x40):
        return 8
    return 12 if (b & 0x20) else 10


def _avif_native_default() -> bool:
    """Own decode path (ISOBMFF walk + dav1d + libyuv-exact conversion)
    is the default; LILLIPUT_AVIF=pil restores the PIL/libavif
    delegation (test oracle + escape hatch, VERDICT r4 #3)."""
    import os
    return os.environ.get("LILLIPUT_AVIF", "native").lower() != "pil"


class AvifDecoder(Decoder):
    """AVIF decode on the framework's OWN stack by default: ISOBMFF
    item/track walk (av1_raw.py) -> dav1d via the ffmpeg shim -> the
    libyuv-bit-exact YUV->BGR conversion (yuv_rgb.py) -> device tone map
    for HDR. SDR output is converted at every depth (8/10/12-bit) and
    every matrix libavif itself can convert — including YCgCo and
    chromaticity-derived NCL via the pinned built-in float path
    (yuv_rgb.planes_to_bgr_u8). Declined corners (limited-range YCgCo,
    ICtCp, mixed-depth alpha) fail in PIL/libavif too, so the fallback
    preserves error parity. PIL remains only the escape hatch
    (LILLIPUT_AVIF=pil) and the oracle in tests — reference parity:
    lilliput drives libavif/dav1d directly (avif.cpp:255-601)."""

    def __init__(self, buf: bytes, tone_mapping_enabled: bool = True):
        self._raw = buf
        self._tone_map = tone_mapping_enabled
        self._cicp = parse_cicp(buf)
        self._is_hdr = _cicp_is_hdr(self._cicp)
        self._durations, _ = parse_avis_timing(buf)
        self._next = 0
        self._im = None          # PIL handle, created lazily on fallback

        from . import av1_raw as AR
        self._AR = AR
        self._loops = AR.parse_loop_count(buf)
        self._clap_off = (0, 0)
        self._still_items = None
        self._tracks = None
        try:
            self._still_items = AR.parse_still_items(buf)
        except Exception:
            self._still_items = None
        try:
            self._tracks = AR.parse_tracks(buf)
        except Exception:
            self._tracks = None
        if self._still_items and self._still_items.clap:
            c = self._still_items.clap
            # int(horizOffN / horizOffD) — C truncation (avif.cpp:500-522)
            if c[5] and c[7]:
                self._clap_off = (int(c[4] / c[5]), int(c[6] / c[7]))

        # geometry/frame count from the own walk; PIL only if it failed
        self._native_meta = False
        if self._tracks is not None:
            color, alpha = self._tracks
            self._frames = len(color.samples)
            self._w, self._h = color.width, color.height
            self._has_alpha = alpha is not None
            self._depth = _av1c_depth(color.av1c)
            self._native_meta = self._w > 0 and self._h > 0
        elif self._still_items is not None and self._still_items.ispe:
            self._frames = 1
            self._w, self._h = self._still_items.ispe
            self._has_alpha = self._still_items.alpha_data is not None
            self._depth = _av1c_depth(self._still_items.color_av1c)
            self._native_meta = self._w > 0 and self._h > 0
        if not self._native_meta or not _avif_native_default():
            im = self._pil()     # raises InvalidImageError if unparseable
            self._frames = getattr(im, "n_frames", 1)
            self._w, self._h = im.size
            self._has_alpha = im.mode in ("RGBA", "LA", "PA")
            self._depth = 8

        # full-precision HDR path (device tone map on native-depth planes)
        self._use_raw = False
        if self._tone_map and self._is_hdr:
            self._use_raw = (
                (self._tracks is not None and self._tracks[0].av1c != b"")
                or (self._still_items is not None
                    and bool(self._still_items.color_av1c)))
        # incremental animated stream decoders (created on first frame)
        self._cdec = self._adec = None
        self._cfifo: list = []
        self._afifo: list = []
        self._fed = 0
        # Latched when the native stream can no longer be trusted to be
        # frame-synchronized with self._next (a feed raised mid-loop, or
        # the alpha track ran dry while color frames remain). Every
        # subsequent frame rides the PIL fallback, whose seek() is
        # absolute — correct output, never a shifted frame.
        self._stream_dead = False

    def _pil(self):
        """Lazy PIL handle (fallback/escape hatch only)."""
        if self._im is None:
            if not _HAVE_PIL_AVIF:
                raise InvalidImageError("AVIF support unavailable")
            try:
                self._im = _PILImage.open(io.BytesIO(self._raw))
                self._im.load()
            except Exception as e:
                raise InvalidImageError(f"not a valid AVIF: {e}") from e
        return self._im

    def header(self) -> ImageHeader:
        orientation = ImageOrientation.TOP_LEFT
        exif = self._still_items.exif if self._still_items else b""
        if exif:
            from .jpeg import _parse_tiff_orientation
            try:
                o = _parse_tiff_orientation(exif)
                if 1 <= o <= 8:
                    orientation = ImageOrientation(o)
            except Exception:
                pass
        elif self._im is not None:
            try:
                o = self._im.getexif().get(0x0112)
                if o and 1 <= int(o) <= 8:
                    orientation = ImageOrientation(int(o))
            except Exception:
                pass
        return ImageHeader(width=self._w, height=self._h,
                           channels=4 if self._has_alpha else 3,
                           orientation=orientation,
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
        if self._still_items is not None and self._still_items.icc:
            return self._still_items.icc
        if self._tracks is not None and self._tracks[0].icc:
            return self._tracks[0].icc
        if self._native_meta and _avif_native_default():
            return b""
        return self._pil().info.get("icc_profile", b"") or b""

    def _next_planes(self):
        """(color RawPlanes, alpha RawPlanes or None) for frame
        self._next. Stills decode their items statelessly; animations
        feed the stateful stream decoders incrementally (samples are
        inter-coded, so frames decode strictly in order)."""
        AR = self._AR
        if self._frames > 1 and self._tracks is not None:
            if self._stream_dead:
                return None, None
            color, alpha = self._tracks
            if self._next >= len(color.samples):
                return None, None
            try:
                if self._cdec is None:
                    self._cdec = AR.Av1StreamDecoder(color.av1c)
                    if alpha is not None:
                        self._adec = AR.Av1StreamDecoder(alpha.av1c)
                while not self._cfifo or (self._adec and not self._afifo):
                    if self._fed < len(color.samples):
                        self._cfifo.extend(self._cdec.feed(
                            color.samples[self._fed]))
                        if self._adec is not None:
                            self._afifo.extend(self._adec.feed(
                                alpha.samples[self._fed]
                                if self._fed < len(alpha.samples) else None))
                        self._fed += 1
                    else:
                        self._cfifo.extend(self._cdec.feed(None))
                        if self._adec is not None:
                            self._afifo.extend(self._adec.feed(None))
                        if not self._cfifo:
                            self._stream_dead = True
                            return None, None
                        break
            except Exception:
                # A feed raised after sibling feeds may have extended a
                # FIFO: frame/position sync is unprovable from here on.
                self._stream_dead = True
                return None, None
            if self._adec is not None and not self._afifo:
                # alpha track ran dry while color frames remain: emitting
                # alpha-less frames would change channel count mid-stream
                self._stream_dead = True
                return None, None
            return (self._cfifo.pop(0),
                    self._afifo.pop(0) if self._afifo else None)
        if self._still_items:
            rp = AR.decode_av1_planes(self._still_items.color_av1c,
                                      self._still_items.color_data)
            ap = None
            if rp is not None and self._still_items.alpha_data is not None:
                ap = AR.decode_av1_planes(
                    self._still_items.alpha_av1c or b"",
                    self._still_items.alpha_data)
            return rp, ap
        return None, None

    def _decode_native_sdr(self) -> Optional[np.ndarray]:
        """Own SDR path: dav1d planes -> libavif-bit-exact BGR(A) u8
        (yuv_rgb.py; identical bytes to the PIL/libavif oracle, gated
        in tests) at every depth — 8/10/12-bit planes all convert
        through the empirically pinned ruleset (planes_to_bgr_u8).
        Only a mixed-depth alpha item or an exotic matrix declines to
        the PIL fallback."""
        from .yuv_rgb import planes_to_bgr_u8
        rp, ap = self._next_planes()
        if rp is None:
            return None
        if ap is not None and ap.y is None:
            return None
        # CICP: the colr/nclx box governs (libavif priority), the
        # sequence-header values are the fallback. primaries drives the
        # matrix-12 family mapping / kr-kb derivation.
        if self._cicp:
            primaries, _, matrix, full_range = self._cicp
            if primaries <= 0:
                primaries = rp.primaries if rp.primaries > 0 else 2
        else:
            primaries = rp.primaries if rp.primaries > 0 else 2
            matrix, full_range = rp.matrix, rp.full_range
        return planes_to_bgr_u8(
            rp.y, rp.u, rp.v, rp.depth, matrix, full_range,
            self._h, self._w,
            alpha=ap.y if ap is not None else None,
            alpha_depth=ap.depth if ap is not None else None,
            primaries=primaries)

    def _decode_raw_hdr(self) -> Optional[jnp.ndarray]:
        """Full-precision HDR decode: AV1 planes at native depth -> device
        YUV->R'G'B' -> tone map. Returns BGR(A) u8 or None on failure."""
        rp, ap_pl = self._next_planes()
        if rp is None:
            return None
        w, h = self._w, self._h
        y = jnp.asarray(rp.y)
        if rp.u is not None and rp.v is not None:
            u, v = jnp.asarray(rp.u), jnp.asarray(rp.v)
        else:
            half = np.uint16(1 << (rp.depth - 1))
            u = jnp.full(rp.y.shape, half, jnp.uint16)
            v = u
        if rp.matrix == 0 and rp.u is not None:
            # CICP Identity: the planes ARE G, B, R (no YCbCr inverse —
            # AVCOL_SPC maps 0 onto bt709 for the video path's untagged
            # streams, which is wrong for AVIF's explicit identity)
            step = float(1 << (rp.depth - 8))
            maxv = float((1 << rp.depth) - 1)
            if rp.full_range:
                bias, rng = 0.0, maxv
            else:
                bias, rng = 16.0 * step, 219.0 * step
            def norm(p):
                return jnp.clip((p[..., :h, :w].astype(jnp.float32) - bias)
                                / rng, 0.0, 1.0)
            rgb = jnp.stack([norm(v), norm(y), norm(u)], axis=-1)  # R,G,B
        else:
            space = COLOR.AVCOL_SPC.get(rp.matrix, "bt2020")
            rgb = COLOR.yuv_to_rgb_norm(y, u, v, space=space,
                                        full_range=rp.full_range,
                                        depth=rp.depth, out_h=h, out_w=w)
        primaries = {9: "bt2020", 12: "p3", 1: "bt709"}.get(
            rp.primaries if rp.primaries > 0 else
            (self._cicp[0] if self._cicp else 9), "bt2020")
        trc = rp.trc if rp.trc > 0 else (self._cicp[1] if self._cicp else 16)
        transfer = "pq" if trc == CICP_TRANSFER_PQ else "hlg"
        sdr = COLOR.hdr_to_sdr(rgb, transfer=transfer, primaries=primaries)
        bgr = sdr[..., ::-1]
        # auxiliary alpha (item or track; monochrome AV1 stream)
        if ap_pl is not None and ap_pl.y is not None:
            maxv = float((1 << ap_pl.depth) - 1)
            a = jnp.clip(jnp.round(
                jnp.asarray(ap_pl.y).astype(jnp.float32)[
                    ..., :h, :w] * (255.0 / maxv)), 0, 255).astype(jnp.uint8)
            return jnp.concatenate([bgr, a[..., None]], axis=-1)
        return bgr

    def decode_to(self, fb: Framebuffer) -> None:
        if self._next >= self._frames:
            raise EOFError()
        px = None
        if _avif_native_default():
            if self._use_raw:
                try:
                    px = self._decode_raw_hdr()
                except Exception:
                    px = None
            elif not (self._tone_map and self._is_hdr):
                try:
                    px = self._decode_native_sdr()
                except Exception:
                    px = None
        if px is None:
            try:
                self._pil().seek(self._next)
            except EOFError:
                raise
            mode = "RGBA" if self._im.mode in ("RGBA", "LA", "PA") else "RGB"
            arr = np.asarray(self._im.convert(mode))
            # contiguous BGR(A) via per-channel column assignment, kept
            # numpy: the former reversed-view ascontiguousarray + eager
            # jnp copy pair is the data-movement sink the PNG/WebP/GIF
            # decoders dropped (the serving path pins decode to CPU)
            ch = 4 if mode == "RGBA" else 3
            bgr = np.empty(arr.shape[:-1] + (ch,), np.uint8)
            bgr[..., 0] = arr[..., 2]
            bgr[..., 1] = arr[..., 1]
            bgr[..., 2] = arr[..., 0]
            if ch == 4:
                bgr[..., 3] = arr[..., 3]
            px = bgr
            if self._tone_map and self._is_hdr:
                # 8-bit fallback tone map (PIL surfaces the coded signal)
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
        # Clean-aperture offsets (avif.cpp:500-522 semantics)
        fb.x_offset, fb.y_offset = self._clap_off
        fb.blend = BlendMethod.NO_BLEND          # avis frames are full canvas
        fb.dispose = DisposeMethod.NO_DISPOSE
        self._next += 1

    def skip_frame(self) -> None:
        if self._next >= self._frames:
            raise EOFError()
        # The stateful stream decoders deliver frames in FIFO order, so a
        # skipped frame must consume one native frame exactly when
        # decode_to would — including BEFORE the first decode (gating on
        # self._cdec alone shifted every later frame by the number of
        # leading skips). Later frames are inter-coded against this one,
        # so the skipped sample still feeds the decoders.
        if (self._frames > 1 and self._tracks is not None
                and _avif_native_default()
                and (self._use_raw
                     or not (self._tone_map and self._is_hdr))):
            try:
                self._next_planes()
            except Exception:
                pass
        self._next += 1

    def close(self) -> None:
        for dec in (self._cdec, self._adec):
            if dec is not None:
                try:
                    dec.close()
                except Exception:
                    pass
        self._cdec = self._adec = None
        if self._im is not None:
            try:
                self._im.close()
            except Exception:
                pass


def _set_avis_repetitions(buf: bytes, loops: int) -> bytes:
    """Rewrite mvhd.duration = track_duration_in_movie_ts * (loops + 1)."""
    from . import av1_raw as AR
    moov = AR._child(buf, 0, len(buf), b"moov")
    if not moov:
        return buf
    mvhd = AR._child(buf, *moov, b"mvhd")
    if not mvhd:
        return buf
    v = buf[mvhd[0]]
    # movie timescale + current duration
    if v == 1:
        ts_off, dur_off, dur_len = mvhd[0] + 20, mvhd[0] + 24, 8
    else:
        ts_off, dur_off, dur_len = mvhd[0] + 12, mvhd[0] + 16, 4
    mts = int.from_bytes(buf[ts_off:ts_off + 4], "big")
    # track duration in its own timescale
    track_s = None
    for t, s, e in AR._iter_boxes(buf, *moov):
        if t != b"trak":
            continue
        mdia = AR._child(buf, s, e, b"mdia")
        if not mdia:
            continue
        mdhd = AR._child(buf, *mdia, b"mdhd")
        if not mdhd:
            continue
        hv = buf[mdhd[0]]
        if hv == 1:
            tts = int.from_bytes(buf[mdhd[0] + 20:mdhd[0] + 24], "big")
            tdur = int.from_bytes(buf[mdhd[0] + 24:mdhd[0] + 32], "big")
        else:
            tts = int.from_bytes(buf[mdhd[0] + 12:mdhd[0] + 16], "big")
            tdur = int.from_bytes(buf[mdhd[0] + 16:mdhd[0] + 20], "big")
        if tts and tdur:
            track_s = tdur / tts
            break
    if not mts or track_s is None:
        return buf
    new_dur = int(round(track_s * mts * (loops + 1)))
    if new_dur >= 1 << (8 * dur_len):
        return buf
    out = bytearray(buf)
    out[dur_off:dur_off + dur_len] = new_dur.to_bytes(dur_len, "big")
    return bytes(out)


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
        self._loops = 0
        if decoded_by is not None:
            if self._icc is None:
                try:
                    self._icc = decoded_by.icc() or None
                except Exception:
                    self._icc = None
            try:
                self._loops = int(decoded_by.loop_count())
            except Exception:
                self._loops = 0
        self._frames: List[np.ndarray] = []
        self._durations: List[int] = []
        self._opts: Dict[int, int] = {}
        self._flushed = False

    def encode(self, fb: Optional[Framebuffer], opts: Dict[int, int]) -> Optional[bytes]:
        if self._flushed:
            raise EOFError()
        if fb is not None:
            check_encode_options(opts, _AVIF_ENCODE_KEYS, "avif")
            self._opts = opts or {}
            arr = fb.to_numpy()
            if arr.shape[2] == 4:
                rgb = arr[:, :, [2, 1, 0, 3]]
            elif arr.shape[2] == 1:
                rgb = arr[:, :, 0]  # 2-D -> PIL mode "L" (fromarray rejects (H,W,1))
            else:
                rgb = arr[:, :, ::-1]
            self._frames.append(np.ascontiguousarray(rgb))
            self._durations.append(max(int(round(fb.duration * 1000)), 0))
            return None
        if not self._frames:
            raise DecodingFailedError("avif encoder got no frames")
        quality = int(self._opts.get(AVIF_QUALITY, 60))
        speed = int(self._opts.get(AVIF_SPEED, 6))
        # first-party path: libaom-av1 through our ffmpeg shim + own
        # ISOBMFF muxer (codecs/avif_enc.py) — stills AND animations,
        # alpha included (auxl item / auxv track pairing). PIL/libavif
        # remains only as the exception fallback + LILLIPUT_AVIF_ENC=pil
        # escape hatch.
        from . import avif_enc
        if avif_enc.available():
            try:
                durs = self._durations if len(self._frames) > 1 else [0]
                out = avif_enc.encode(
                    self._frames, [max(d, 1) for d in durs],
                    quality=min(max(quality, 0), 100),
                    speed=min(max(speed, 0), 10),
                    loop_count=max(self._loops, 0), icc=self._icc)
                self._flushed = True
                return out
            except Exception:
                pass  # PIL/libavif fallback below
        imgs = [_PILImage.fromarray(f) for f in self._frames]
        bio = io.BytesIO()
        kwargs = dict(format="AVIF", quality=min(max(quality, 0), 100),
                      speed=min(max(speed, 0), 10))
        if self._icc:
            kwargs["icc_profile"] = self._icc
        if len(imgs) > 1:
            kwargs.update(save_all=True, append_images=imgs[1:],
                          duration=self._durations or 100)
        imgs[0].save(bio, **kwargs)
        self._flushed = True
        out = bio.getvalue()
        if len(imgs) > 1 and self._loops > 0:
            # source loop count passthrough: libavif expresses a finite
            # repetition count as mvhd.duration = track_duration*(loops+1)
            # (encoder parity with avif.cpp:639; loop 0 stays infinite)
            out = _set_avis_repetitions(out, self._loops)
        return out
