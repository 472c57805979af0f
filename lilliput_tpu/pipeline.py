"""Fused batched transcode pipeline — the TPU-native serving path.

This is the production counterpart of the per-frame ImageOps.Transform loop
(SURVEY.md §7 step 10): N same-geometry images batch on a leading axis and the
ENTIRE dense pipeline — dequant + IDCT (MXU matmuls) + chroma upsample +
YCbCr->BGR + center-crop + INTER_AREA resize + BGR->YCbCr + 4:2:0 downsample
+ fDCT + quantize — compiles to ONE XLA program per geometry. Host threads
run only the serial entropy stages (libjpeg Huffman via the native shim) and
overlap with device compute through JAX's async dispatch.

Where the reference crosses the cgo FFI >=4x per frame with CPU work between
(ops.go:302-374), this path crosses the host<->device boundary exactly twice
per batch (coefficients in, coefficients out).
"""

from __future__ import annotations

import ctypes
import dataclasses
import functools
import os
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from . import binding
from .codecs import jpeg as J
from .errors import DecodingFailedError
from .ops import jpeg_kernels as K
from .ops import resize as R

_i16p = ctypes.POINTER(ctypes.c_int16)


@dataclasses.dataclass(frozen=True)
class JpegGeometry:
    """Static shape key: one compiled program per geometry."""
    width: int
    height: int
    h2: bool          # chroma h subsampled
    v2: bool
    blocks: tuple     # ((bh, bw) per component)


def geometry_of(info) -> JpegGeometry:
    hy, vy = info.comp_h_samp[0], info.comp_v_samp[0]
    hc, vc = info.comp_h_samp[1], info.comp_v_samp[1]
    return JpegGeometry(
        width=info.width, height=info.height,
        h2=(hy // hc == 2), v2=(vy // vc == 2),
        blocks=tuple((int(info.comp_blocks_h[c]), int(info.comp_blocks_w[c]))
                     for c in range(3)))


def fit_rect(src_w: int, src_h: int, dst_w: int, dst_h: int):
    """Center-crop rect for Fit (opencv.go:316-353 math)."""
    aspect_in = src_w / src_h
    aspect_out = dst_w / dst_h
    if aspect_in > aspect_out:
        w = int(aspect_out * src_h + 0.5)
        h = src_h
    else:
        h = int(src_w / aspect_out + 0.5)
        w = src_w
    w, h = max(w, 1), max(h, 1)
    left = max(int((src_w - w) * 0.5), 0)
    top = max(int((src_h - h) * 0.5), 0)
    return left, top, w, h


@functools.partial(
    jax.jit,
    static_argnames=("src_w", "src_h", "h2", "v2", "dst_w", "dst_h", "method"))
def fused_jpeg_fit_transcode(yc, cb, cr, qt_y, qt_c, enc_qt_y, enc_qt_c,
                             src_w: int, src_h: int, h2: bool, v2: bool,
                             dst_w: int, dst_h: int, method: str = R.AREA):
    """(B, bh, bw, 64) coefficient batches -> quantized encode coefficients.

    Matches ImageOps Fit semantics bit-for-bit with the unfused path: decode
    to BGR u8, center-crop, INTER_AREA resize, encode at 4:2:0.
    """
    bgr = K.decode_ycc_420(yc, cb, cr, qt_y, qt_c, src_h, src_w, h2, v2)
    left, top, w, h = fit_rect(src_w, src_h, dst_w, dst_h)
    cropped = bgr[..., top:top + h, left:left + w, :]
    resized = R.resize(cropped, dst_w, dst_h, method)
    return K.encode_from_bgr(resized, enc_qt_y, enc_qt_c, subsample=True)


class JpegTranscodePipeline:
    """Batched JPEG->JPEG Fit transcoder for a fixed source geometry.

    Usage:
        pipe = JpegTranscodePipeline(sample_jpeg_bytes, 256, 256, quality=85)
        outs = pipe.transcode(list_of_jpeg_bytes)   # same geometry as sample
    """

    def __init__(self, sample: bytes, dst_w: int, dst_h: int,
                 quality: int = 85, method: str = R.AREA):
        self._lib = binding.load()
        self.dst_w, self.dst_h = dst_w, dst_h
        self.method = method
        d = J.JpegDecoder(sample)
        info = d._info
        if info.num_components != 3:
            raise DecodingFailedError("pipeline expects color JPEGs")
        self.geom = geometry_of(info)
        d._decode_coefs_cached()
        self.qt_y = jnp.asarray(d._qtables[info.comp_quant_tbl[0]])
        self.qt_c = jnp.asarray(d._qtables[info.comp_quant_tbl[1]])
        eql, eqc = J.scaled_qtables(quality)
        self.enc_qt_y_np, self.enc_qt_c_np = eql, eqc
        self.enc_qt_y = jnp.asarray(eql)
        self.enc_qt_c = jnp.asarray(eqc)

    # -- host entropy stages --------------------------------------------------

    def decode_entropy(self, bufs: Sequence[bytes], workers: Optional[int] = None):
        """Huffman-decode a batch into stacked coefficient arrays (host).

        The libjpeg shim releases the GIL inside ctypes calls, so a small
        thread pool scales entropy decode across host cores (the reference's
        'one ImageOps per goroutine' concurrency model, SURVEY.md §2.3)."""
        g = self.geom
        b = len(bufs)
        ys = np.empty((b,) + g.blocks[0] + (64,), np.int16)
        cbs = np.empty((b,) + g.blocks[1] + (64,), np.int16)
        crs = np.empty((b,) + g.blocks[2] + (64,), np.int16)

        def one(i: int):
            arr = np.frombuffer(bufs[i], np.uint8)
            qtables = np.zeros((4, 64), np.uint16)
            ptrs = (_i16p * 3)(
                ys[i].ctypes.data_as(_i16p),
                cbs[i].ctypes.data_as(_i16p),
                crs[i].ctypes.data_as(_i16p))
            rc = self._lib.lp_jpeg_decode_coefs(
                arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), arr.size,
                ptrs, qtables.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                None, 0)
            if rc != 0:
                raise DecodingFailedError(f"JPEG entropy decode failed ({rc})")

        n_workers = workers if workers is not None else min(8, os.cpu_count() or 1)
        if n_workers <= 1 or b <= 1:
            for i in range(b):
                one(i)
        else:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(n_workers) as ex:
                list(ex.map(one, range(b)))
        return ys, cbs, crs

    def encode_entropy(self, yq: np.ndarray, cbq: np.ndarray, crq: np.ndarray) -> List[bytes]:
        """Huffman-encode device-quantized coefficients (host)."""
        w, h = self.dst_w, self.dst_h
        yb = ((h + 7) // 8, (w + 7) // 8)
        cbb = ((h + 15) // 16, (w + 15) // 16)
        outs = []
        hs = (ctypes.c_int32 * 3)(2, 1, 1)
        vs = (ctypes.c_int32 * 3)(2, 1, 1)
        qp = ctypes.POINTER(ctypes.c_uint16)
        out_buf = np.empty(w * h * 4 + (1 << 20), np.uint8)
        for i in range(yq.shape[0]):
            y = np.ascontiguousarray(yq[i][:yb[0], :yb[1]])
            cbx = np.ascontiguousarray(cbq[i][:cbb[0], :cbb[1]])
            crx = np.ascontiguousarray(crq[i][:cbb[0], :cbb[1]])
            ptrs = (_i16p * 3)(y.ctypes.data_as(_i16p),
                               cbx.ctypes.data_as(_i16p),
                               crx.ctypes.data_as(_i16p))
            n = self._lib.lp_jpeg_encode_coefs(
                w, h, 3, hs, vs, ptrs,
                self.enc_qt_y_np.ctypes.data_as(qp),
                self.enc_qt_c_np.ctypes.data_as(qp),
                0, 0, None, 0,
                out_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out_buf.size)
            if n < 0:
                raise DecodingFailedError(f"JPEG entropy encode failed ({n})")
            outs.append(out_buf[:n].tobytes())
        return outs

    # -- device stage ----------------------------------------------------------

    def device_step(self, ys, cbs, crs):
        """One fused dispatch; returns device arrays (async)."""
        g = self.geom
        return fused_jpeg_fit_transcode(
            jnp.asarray(ys), jnp.asarray(cbs), jnp.asarray(crs),
            self.qt_y, self.qt_c, self.enc_qt_y, self.enc_qt_c,
            g.width, g.height, g.h2, g.v2, self.dst_w, self.dst_h, self.method)

    # -- end to end --------------------------------------------------------------

    def transcode(self, bufs: Sequence[bytes]) -> List[bytes]:
        from .utils import StageTimer, metrics
        with StageTimer("entropy_decode"):
            ys, cbs, crs = self.decode_entropy(bufs)
        with StageTimer("device"):
            yq, cbq, crq = self.device_step(ys, cbs, crs)
            yq, cbq, crq = np.asarray(yq), np.asarray(cbq), np.asarray(crq)
        with StageTimer("entropy_encode"):
            out = self.encode_entropy(yq, cbq, crq)
        metrics.incr("images_transcoded", len(bufs))
        return out

    def transcode_pipelined(self, batches: Sequence[Sequence[bytes]]) -> List[List[bytes]]:
        """Double-buffered: host entropy for batch i+1 overlaps device batch i
        (JAX dispatch is asynchronous; np.asarray blocks on completion)."""
        results = []
        pending = None  # (device arrays,)
        for bufs in batches:
            coefs = self.decode_entropy(bufs)
            dev = self.device_step(*coefs)
            if pending is not None:
                results.append(self.encode_entropy(*[np.asarray(a) for a in pending]))
            pending = dev
        if pending is not None:
            results.append(self.encode_entropy(*[np.asarray(a) for a in pending]))
        return results


class MultiGeometryPipeline:
    """Serving front for mixed-geometry JPEG batches (SURVEY.md hard part #3).

    Dynamic input shapes would force an XLA recompile per image; instead
    requests are grouped by their exact coefficient geometry (dims +
    subsampling), each group batching through a per-geometry
    JpegTranscodePipeline whose compiled program is cached. Steady-state
    traffic from a bounded set of source resolutions (the common serving
    shape) compiles once per resolution and then always dispatches batched.
    """

    def __init__(self, dst_w: int, dst_h: int, quality: int = 85,
                 method: str = R.AREA, max_geometries: int = 64):
        self.dst_w, self.dst_h = dst_w, dst_h
        self.quality = quality
        self.method = method
        self.max_geometries = max_geometries
        self._pipes = {}  # JpegGeometry -> JpegTranscodePipeline

    def _pipe_for(self, buf: bytes) -> "JpegTranscodePipeline":
        info = J.JpegDecoder(buf)._info
        key = geometry_of(info)
        pipe = self._pipes.get(key)
        if pipe is None:
            if len(self._pipes) >= self.max_geometries:
                self._pipes.pop(next(iter(self._pipes)))  # FIFO eviction
            pipe = JpegTranscodePipeline(buf, self.dst_w, self.dst_h,
                                         quality=self.quality, method=self.method)
            self._pipes[key] = pipe
        return pipe

    def transcode(self, bufs: Sequence[bytes]) -> List[bytes]:
        """Group by geometry, batch each group, restore input order."""
        groups = {}
        for i, buf in enumerate(bufs):
            pipe = self._pipe_for(buf)
            groups.setdefault(id(pipe), (pipe, []))[1].append(i)
        out: List[Optional[bytes]] = [None] * len(bufs)
        for pipe, idxs in groups.values():
            results = pipe.transcode([bufs[i] for i in idxs])
            for i, r in zip(idxs, results):
                out[i] = r
        return out  # type: ignore[return-value]


def spritesheet(video: bytes, tile_w: int, tile_h: int,
                max_tiles: int = 64, workers: Optional[int] = None,
                with_thumbhashes: bool = False):
    """Keyframe spritesheet (BASELINE config 5): stateless parallel raw
    keyframe decodes (thread pool — avcodec.cpp:770-873's contract), then
    ONE batched device dispatch resizes every keyframe tile; optional
    batched thumbhashes ride the same batch.

    Returns (sheet (rows, cols) BGRA np.ndarray, [timestamps_us], hashes?).
    """
    from concurrent.futures import ThreadPoolExecutor

    from .codecs.video import VideoDecoder, decode_raw_keyframe

    dec = VideoDecoder(video)
    kf = dec.keyframes()[:max_tiles]
    if not kf:
        raise DecodingFailedError("no keyframes in video")
    cid, extradata = dec.codec_params()
    fw = dec._info.width
    fh = dec._info.height

    def one(entry):
        ts, off, size = entry
        return decode_raw_keyframe(cid, extradata, video[off:off + size], fw, fh)

    n_workers = workers if workers is not None else min(8, os.cpu_count() or 1)
    if n_workers > 1 and len(kf) > 1:
        with ThreadPoolExecutor(n_workers) as ex:
            frames = list(ex.map(one, kf))
    else:
        frames = [one(e) for e in kf]

    batch = jnp.asarray(np.stack(frames))          # (N, H, W, 4)
    tiles = R.resize(batch, tile_w, tile_h, R.AREA)
    hashes = None
    if with_thumbhashes:
        from .codecs.thumbhash import thumbhash_batch
        hashes = thumbhash_batch(tiles)
    n = tiles.shape[0]
    cols = int(np.ceil(np.sqrt(n)))
    rows = (n + cols - 1) // cols
    sheet = np.zeros((rows * tile_h, cols * tile_w, 4), np.uint8)
    tiles_np = np.asarray(tiles)
    for i in range(n):
        r, c = divmod(i, cols)
        sheet[r * tile_h:(r + 1) * tile_h, c * tile_w:(c + 1) * tile_w] = tiles_np[i]
    return sheet, [e[0] for e in kf], hashes


def transcode_webp(buf: bytes, dst_w: int, dst_h: int, fit: bool = False,
                   encode_options=None) -> bytes:
    """Whole-animation batched WebP transcode (BASELINE config 4 path):
    libwebp frame decode on host, ONE scan-compositing dispatch (alpha
    blend + dispose), ONE batched resize, WebPAnimEncoder on host.
    Byte-identical to the streaming ImageOps path."""
    from .codecs.webp import WebpDecoder, WebpEncoder, _i32p, _u8
    from .framebuffer import Framebuffer
    from .ops import palette as P

    dec = WebpDecoder(buf)
    cw, ch = dec._w, dec._hgt
    frames, drawn, blends, pdisp, prects, durations = [], [], [], [], [], []
    prev_rect = None
    prev_disposal = 0
    while True:
        meta = np.zeros(8, np.int32)
        st = dec._lib.lp_webp_next_frame(dec._h, meta.ctypes.data_as(_i32p))
        if st == 0:
            break
        if st < 0:
            raise DecodingFailedError("webp frame parse failed")
        x, y, w, h, dur_ms, dispose, blend, _fa = (int(v) for v in meta)
        px = np.empty((h, w, 4), np.uint8)
        if dec._lib.lp_webp_frame_pixels(dec._h, _u8(px), 4, w, h) != 0:
            raise DecodingFailedError("webp frame decode failed")
        full = np.zeros((ch, cw, 4), np.uint8)
        dm = np.zeros((ch, cw), bool)
        x2, y2 = max(x, 0), max(y, 0)
        w2, h2 = min(w, cw - x2), min(h, ch - y2)
        if w2 > 0 and h2 > 0:
            full[y2:y2 + h2, x2:x2 + w2] = px[y2 - y:y2 - y + h2, x2 - x:x2 - x + w2]
            dm[y2:y2 + h2, x2:x2 + w2] = True
        pm = np.zeros((ch, cw), bool)
        if prev_rect is not None:
            px0, py0, pw0, ph0 = prev_rect
            px0, py0 = max(px0, 0), max(py0, 0)
            pw0, ph0 = min(pw0, cw - px0), min(ph0, ch - py0)
            if pw0 > 0 and ph0 > 0:
                pm[py0:py0 + ph0, px0:px0 + pw0] = True
        frames.append(full)
        drawn.append(dm)
        blends.append(blend)
        pdisp.append(prev_disposal)
        prects.append(pm)
        durations.append(dur_ms)
        prev_rect = (x, y, w, h)
        prev_disposal = dispose
    if not frames:
        raise DecodingFailedError("webp has no frames")
    comp = P.composite_animation_rgba(
        jnp.asarray(np.stack(frames)), jnp.asarray(np.stack(drawn)),
        jnp.asarray(np.array(blends, np.int32)),
        jnp.asarray(np.array(pdisp, np.int32)), jnp.asarray(np.stack(prects)))
    if fit:
        left, top, w, h = fit_rect(cw, ch, dst_w, dst_h)
        comp = comp[:, top:top + h, left:left + w, :]
    resized = R.resize(comp, dst_w, dst_h, R.AREA)
    enc = WebpEncoder(dec)
    for i, dur in enumerate(durations):
        fb = Framebuffer(resized[i])
        fb.duration = dur / 1000.0
        enc.encode(fb, encode_options or {})
    return enc.encode(None, encode_options or {})


def transcode_avif(buf: bytes, dst_w: int, dst_h: int, fit: bool = False,
                   encode_options=None, file_type: str = ".avif") -> bytes:
    """Whole-animation batched AVIF transcode: AV1 frame decode on host,
    frames stack directly (avis frames are full canvas, no compositing
    needed), ONE batched resize dispatch, then the AVIF/WebP encoder."""
    from .api import new_encoder
    from .codecs.avif import AvifDecoder
    from .framebuffer import Framebuffer

    dec = AvifDecoder(buf)
    frames = []
    durations = []
    while True:
        fb = Framebuffer()
        try:
            dec.decode_to(fb)
        except EOFError:
            break
        frames.append(fb.array)
        durations.append(fb.duration)
    if not frames:
        raise DecodingFailedError("avif has no frames")
    batch = jnp.stack(frames)
    if fit:
        left, top, w, h = fit_rect(batch.shape[2], batch.shape[1], dst_w, dst_h)
        batch = batch[:, top:top + h, left:left + w, :]
    resized = R.resize(batch, dst_w, dst_h, R.AREA)
    enc = new_encoder(file_type, dec)
    for i, dur in enumerate(durations):
        fb = Framebuffer(resized[i])
        fb.duration = dur
        enc.encode(fb, encode_options or {})
    return enc.encode(None, encode_options or {})


def transcode_gif(buf: bytes, dst_w: int, dst_h: int, fit: bool = False,
                  file_type: str = ".gif") -> bytes:
    """Whole-animation batched transcode (BASELINE config 3 path): LZW on
    host, ONE scan-compositing dispatch for all frames, ONE batched resize
    dispatch, then per-frame palette quantization + host LZW/WebP encode.

    Compare ImageOps.transform, which round-trips the device once per frame
    (the reference-shaped streaming API)."""
    from .codecs.gif import GifDecoder, GifEncoder
    from .framebuffer import BlendMethod, DisposeMethod, Framebuffer

    dec = GifDecoder(buf)
    frames, metas = dec.decode_animation()
    if not metas:
        raise DecodingFailedError("gif has no frames")
    if fit:
        left, top, w, h = fit_rect(dec._w, dec._hgt, dst_w, dst_h)
        frames = frames[:, top:top + h, left:left + w, :]
    resized = R.resize(frames, dst_w, dst_h, R.AREA)

    if file_type == ".webp":
        from .codecs.webp import WebpEncoder
        enc = WebpEncoder(dec)
    else:
        enc = GifEncoder(dec)
    for i, m in enumerate(metas):
        dec.frame_meta = m
        fb = Framebuffer(resized[i])
        fb.duration = m.delay_cs * 10 / 1000.0
        fb.blend = BlendMethod.NO_BLEND
        fb.dispose = (DisposeMethod.DISPOSE_TO_BACKGROUND_COLOR
                      if m.disposal == 2 else DisposeMethod.NO_DISPOSE)
        enc.encode(fb, {})
    return enc.encode(None, {})
