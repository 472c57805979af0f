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
import warnings
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import binding
from .codecs import jpeg as J
from .errors import DecodingFailedError
from .ops import jpeg_kernels as K
from .ops import orient as O
from .ops import palette as P
from .ops import resize as R

_i16p = ctypes.POINTER(ctypes.c_int16)

# coefficient inputs are donated for steady-state zero-allocation serving
# (the reference's reusable-buffer design goal, opencv.go:197-202); on
# backends where a donated layout can't be aliased JAX warns, which is noise
warnings.filterwarnings(
    "ignore", message="Some donated buffers were not usable")


@dataclasses.dataclass(frozen=True)
class JpegGeometry:
    """Static shape key: one compiled program per geometry."""
    width: int
    height: int
    h2: bool          # chroma h subsampled
    v2: bool
    blocks: tuple     # ((bh, bw) per component)


def geometry_of(info) -> JpegGeometry:
    if info.num_components == 1:
        return JpegGeometry(
            width=info.width, height=info.height, h2=False, v2=False,
            blocks=((int(info.comp_blocks_h[0]),
                     int(info.comp_blocks_w[0])),))
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


def mcu_decode_window(src_w: int, src_h: int, dst_w: int, dst_h: int,
                      h2: bool, v2: bool, blocks, luma_rows: int):
    """MCU-aligned coefficient window covering the Fit crop plus one MCU
    margin (the chroma triangle filter's neighbor taps). Returns
    (x0, y0, rw, rh, luma_rowslice, luma_colslice, chroma_rowslice,
    chroma_colslice) in BLOCK units — the same window _fused_jpeg_fit_impl
    computes, factored out so decode_entropy can slice on the HOST: the
    coefficient H2D transfer and the device graph then carry only the
    window (~40% less for the 1080p->square headline shape)."""
    left, top, w, h = fit_rect(src_w, src_h, dst_w, dst_h)
    fx = 2 if h2 else 1
    fy = 2 if v2 else 1
    mx, my = 8 * fx, 8 * fy
    ybh, ybw = blocks[0]
    cbh, cbw = blocks[1]
    plane_w = min(ybw * 8, cbw * 8 * fx)
    plane_h = min(ybh * 8, cbh * 8 * fy)
    x0 = max((left // mx) * mx - mx, 0)
    y0 = max((top // my) * my - my, 0)
    x1 = min(((left + w + mx - 1) // mx + 1) * mx, plane_w)
    y1 = min(((top + h + my - 1) // my + 1) * my, plane_h)
    ybx0, ybx1 = x0 // 8, -(-x1 // 8)
    yby0, yby1 = y0 // 8, -(-y1 // 8)
    cbx0, cbx1 = x0 // (8 * fx), -(-x1 // (8 * fx))
    cby0, cby1 = y0 // (8 * fy), -(-y1 // (8 * fy))
    if fy == 2:
        yby1 = min(2 * cby1, luma_rows)
    return (x0, y0, x1 - x0, y1 - y0, slice(yby0, yby1), slice(ybx0, ybx1),
            slice(cby0, cby1), slice(cbx0, cbx1))


def _normalize_output_format(output_format: str) -> str:
    """Shared output-format validation for the serving frontends."""
    fmt = {".jpg": ".jpeg"}.get(output_format, output_format)
    if fmt not in (".jpeg", ".webp", ".png"):
        raise ValueError("output_format must be .jpeg, .webp or .png")
    return fmt


def emit_post(out, emit: str):
    """Shared device-step epilogue: normalize the fused fn's output to a
    tuple, applying the yuv420 post-pass (packed BGRA -> libwebp-exact
    YUV420 planes) when that emit mode is active. Used by every serving
    device step — local and sharded — so the conversion cannot drift
    between copies. Call with the same `emit` snapshot that selected the
    fused fn's (static) emit argument."""
    if emit == "yuv420":
        from .ops.color import webp_yuv420_from_packed
        return webp_yuv420_from_packed(
            out[0] if isinstance(out, tuple) else out)
    return out if isinstance(out, tuple) else (out,)


def _pack_pixels(bpl, gpl, rpl):
    """Three (..., H, W) channel planes (exact u8 values, any numeric
    storage) -> packed BGRA int32 — the serving pixel-output form (bitcast
    to u8 gives interleaved B,G,R,255 for the host webp/png encoders)."""
    from .ops import pallas_kernels as PK
    return PK._pack_bgra(bpl.astype(jnp.float32), gpl.astype(jnp.float32),
                         rpl.astype(jnp.float32))


def _pack_pixels_a(bpl, gpl, rpl, apl):
    """_pack_pixels with a real alpha plane (still-input serving: sources
    with transparency keep it through webp/png outputs). Same round/clip
    as _pack_bgra; the <<24 wraps to the int32 alpha byte."""
    def u8(x):
        return jnp.clip(jnp.round(x.astype(jnp.float32)), 0.0,
                        255.0).astype(jnp.int32)
    return (u8(bpl) | (u8(gpl) << 8) | (u8(rpl) << 16) | (u8(apl) << 24))


def _fused_jpeg_fit_impl(yc, cb, cr, qt_y, qt_c, enc_qt_y, enc_qt_c,
                         src_w: int, src_h: int, h2: bool, v2: bool,
                         dst_w: int, dst_h: int, method: str = R.AREA,
                         orientation: int = 1, window=None,
                         emit: str = "coefs"):
    """(B, bh, bw, 64) coefficient batches -> quantized encode coefficients
    (emit='coefs', the JPEG-output serving path) or packed BGRA int32
    pixels at the destination size (emit='pixels', feeding the host
    webp/png still encoders).

    Pipeline: decode to BGR u8, EXIF orientation normalization, center-crop,
    INTER_AREA resize, encode at 4:2:0. Output is within +-1 u8 of the
    unfused ImageOps path (tested): the decode half is bit-identical, but
    the matmul-form AREA resample and the batched IDCT dispatch shapes
    reassociate f32 sums relative to the streaming path's tap order.

    qt_y/qt_c may be (64,) shared tables or (B, 64) per-image tables (the
    serving path always passes per-image tables — images of the same
    geometry but different save quality must not share dequant tables).

    Serving-path optimizations (upright images):
      * decode window — only the MCU-aligned coefficient window covering
        the Fit crop (plus one MCU margin for the chroma triangle filter's
        neighbor taps) is IDCT'd (host-sliced when window is set):
        identical pixels, ~40% less work for the 1080p->square headline;
      * u8 channels are extracted while pixels are still in block-vector
        space and the crop folds into the AREA resize matrices
        (area_matrix_embedded) — no crop slice pass, 1 B/px/channel
        through the relayout transpose;
      * the AREA resample runs as banded MXU matrix contractions instead
        of gathers, which serialize on TPU.
    """
    if orientation == 1:
        left, top, w, h = fit_rect(src_w, src_h, dst_w, dst_h)
        if window is not None:
            # the host already sliced the arrays to the decode window
            # (decode_entropy); (x0, y0, rw, rh) describe its plane origin
            x0, y0, rw, rh = window
            win = (yc, cb, cr)
        else:
            fx = 2 if h2 else 1
            fy = 2 if v2 else 1
            mx, my = 8 * fx, 8 * fy
            plane_w = min(yc.shape[-2] * 8, cb.shape[-2] * 8 * fx)
            plane_h = min(yc.shape[-3] * 8, cb.shape[-3] * 8 * fy)
            x0 = max((left // mx) * mx - mx, 0)
            y0 = max((top // my) * my - my, 0)
            x1 = min(((left + w + mx - 1) // mx + 1) * mx, plane_w)
            y1 = min(((top + h + my - 1) // my + 1) * my, plane_h)
            rw, rh = x1 - x0, y1 - y0
            ybx0, ybx1 = x0 // 8, -(-x1 // 8)
            yby0, yby1 = y0 // 8, -(-y1 // 8)
            cbx0, cbx1 = x0 // (8 * fx), -(-x1 // (8 * fx))
            cby0, cby1 = y0 // (8 * fy), -(-y1 // (8 * fy))
            if fy == 2:
                # take whole MCU rows of luma when the (host-padded) array
                # has them: a conforming slice lets the megakernel skip its
                # row-pad
                yby1 = min(2 * cby1, yc.shape[-3])
            win = (yc[..., yby0:yby1, ybx0:ybx1, :],
                   cb[..., cby0:cby1, cbx0:cbx1, :],
                   cr[..., cby0:cby1, cbx0:cbx1, :])
        if (method == R.AREA and h2 and v2
                and os.environ.get("LILLIPUT_MXU_DECODE", "0")
                not in ("0", "false", "off")):
            # round-3 raster MXU decode experiment (LILLIPUT_MXU_DECODE=1):
            # dequant+IDCT einsums + banded matmul triangle upsample +
            # fused color/round. MEASURED SLOWER than the megakernel once
            # honestly materialized (18.8 vs 16.6 ms/batch-128 decode on
            # v5e — see ROADMAP round-3 notes and tools/profile_stages.py);
            # kept env-gated with its guaranteed-≤1 tier (vs the
            # bit-identical megakernel/split pair) for re-evaluation on
            # future compilers. Default stays the megakernel.
            planes = K.decode_ycc_planes_mxu(*win, qt_y, qt_c, rh, rw,
                                             h2, v2)
            if planes is not None:
                lin = dst_w > w or dst_h > h
                mw = R.area_matrix_embedded(rw, left - x0, w, dst_w, lin)
                mh = R.area_matrix_embedded(rh, top - y0, h, dst_h, lin)
                out = [jnp.clip(jnp.round(
                    R.resize_area_plane_mat(p, mw, mh)), 0, 255)
                    for p in planes]
                if emit == "pixels":
                    return _pack_pixels(out[0], out[1], out[2])
                return K.encode_from_bgr_planes(
                    out[0], out[1], out[2], enc_qt_y, enc_qt_c,
                    subsample=True)
        if (method == R.AREA and K._use_megakernel()
                and os.environ.get("LILLIPUT_PLANAR_TAIL", "1")
                not in ("0", "false", "off")):
            if (h2 and v2 and os.environ.get("LILLIPUT_BLOCK_TAIL", "1")
                    not in ("0", "false", "off")):
                # u8-block tail (default): the megakernel writes the three
                # channels as u8 planes still in block-vector space (no
                # extraction pass, 1 B/px/channel through the relayout
                # transpose) and the pixel crop folds into the resize
                # matrices so no crop slice pass exists at all (measured:
                # rgb parity 3.9k -> 4.9k imgs/s on v5e;
                # LILLIPUT_BLOCK_TAIL=0 restores the packed tail)
                planes = K.decode_ycc_u8_plane_blocks(*win, qt_y, qt_c,
                                                      h2, v2)
                if planes is not None:
                    lead = planes[0].shape[:-4]
                    cbh_pad, cbw = planes[0].shape[-4], planes[0].shape[-2]
                    from .ops import pallas_kernels as PK
                    out = []
                    for pb in planes:
                        blk = pb.reshape(-1, 2 * cbh_pad, 2 * cbw, 64)
                        p = PK._blocks_to_plane_xla(
                            blk, 2 * cbh_pad, 2 * cbw)
                        out.append(jnp.clip(jnp.round(
                            R.resize_area_plane_embedded(
                                p, left - x0, w, dst_w,
                                top - y0, h, dst_h)), 0, 255))
                    if emit == "pixels":
                        px = _pack_pixels(out[0], out[1], out[2])
                        return px.reshape(lead + px.shape[1:])
                    res = K.encode_from_bgr_planes(
                        out[0], out[1], out[2], enc_qt_y, enc_qt_c,
                        subsample=True)
                    return tuple(r.reshape(lead + r.shape[1:])
                                 for r in res)
            packed = K.decode_ycc_packed(*win, qt_y, qt_c, rh, rw, h2, v2)
            if packed is not None:
                # fully planar u8 tail (default for 4:4:4; beats the
                # bitcast tail below: 3912 vs 3595 imgs/s;
                # LILLIPUT_PLANAR_TAIL=0 restores the bitcast tail)
                cp = packed[..., top - y0:top - y0 + h,
                            left - x0:left - x0 + w]
                # u8 materialization (see the ycc path): planes stored
                # 1 B/px between extraction and resize
                planes = [p.astype(jnp.uint8)
                          for p in K.packed_to_planes(cp)]
                out = [jnp.clip(jnp.round(
                    R.resize_area_plane_embedded(
                        p, 0, w, dst_w, 0, h, dst_h)), 0, 255)
                    for p in planes]
                if emit == "pixels":
                    return _pack_pixels(out[0], out[1], out[2])
                return K.encode_from_bgr_planes(
                    out[0], out[1], out[2], enc_qt_y, enc_qt_c,
                    subsample=True)
        bgr = K.decode_ycc_420(*win, qt_y, qt_c, rh, rw, h2, v2)
        cropped = bgr[..., top - y0:top - y0 + h, left - x0:left - x0 + w, :]
    else:
        bgr = K.decode_ycc_420(yc, cb, cr, qt_y, qt_c, src_h, src_w, h2, v2)
        bgr = O.orient(bgr, orientation)
        eff_w, eff_h = ((src_h, src_w) if O.swaps_dimensions(orientation)
                        else (src_w, src_h))
        left, top, w, h = fit_rect(eff_w, eff_h, dst_w, dst_h)
        cropped = bgr[..., top:top + h, left:left + w, :]
    if method == R.AREA:
        resized = R.resize_area_mxu_or_exact(cropped, dst_w, dst_h)
    else:
        resized = R.resize(cropped, dst_w, dst_h, method)
    if emit == "pixels":
        return _pack_pixels(resized[..., 0], resized[..., 1],
                            resized[..., 2])
    return K.encode_from_bgr(resized, enc_qt_y, enc_qt_c, subsample=True)


def _fused_jpeg_fit_ycc_impl(yc, cb, cr, qt_y, qt_c, enc_qt_y, enc_qt_c,
                             src_w: int, src_h: int,
                             dst_w: int, dst_h: int, dct_scale: int = 1,
                             window=None, emit: str = "coefs"):
    """YCbCr-direct Fit transcode (chroma_mode='direct').

    Planes never leave YCbCr: luma crops+resizes directly to the output
    grid, and chroma is resampled ONCE at its native half resolution
    straight to the output's 4:2:0 grid (general-position AREA matrices
    absorb the half-pixel crop offset). This skips YCbCr<->BGR, the
    triangle upsample, and the 2x2 re-downsample — the chroma signal is
    resampled once instead of three times, at roughly half the device
    work. The reference cannot express this mode (everything passes
    through BGRA framebuffers, ops.go:283-375); output bytes differ
    slightly from the BGR-path in chroma (PSNR-gated in tests).
    Requires 4:2:0, upright orientation, and even dst dims.

    Compressed/native-domain processing of JPEG data is an established
    direction (e.g. arXiv:2104.00185 trains networks straight from DCT
    coefficients); here it is applied to transcoding.
    """
    left, top, w, h = fit_rect(src_w, src_h, dst_w, dst_h)
    if window is not None:
        # host-sliced arrays (any 16-aligned window covering the crop)
        x0, y0, rw, rh = window
        ywin = yc
        cwin = (slice(None),) * cb.ndim
    else:
        plane_w = min(yc.shape[-2] * 8, cb.shape[-2] * 16)
        plane_h = min(yc.shape[-3] * 8, cb.shape[-3] * 16)
        x0 = max((left // 16) * 16, 0)
        y0 = max((top // 16) * 16, 0)
        x1 = min(((left + w + 15) // 16) * 16, plane_w)
        y1 = min(((top + h + 15) // 16) * 16, plane_h)
        rw, rh = x1 - x0, y1 - y0
        ywin = yc[..., y0 // 8:-(-y1 // 8), x0 // 8:-(-x1 // 8), :]
        cwin = (slice(None),) * (cb.ndim - 3) + (
            slice(y0 // 16, -(-y1 // 16)), slice(x0 // 16, -(-x1 // 16)),
            slice(None))
    tx, ty = left - x0, top - y0

    s = dct_scale
    if s == 1:
        # u8 quantization happens in the IDCT einsum epilogue (block
        # space, bf16 — 2 B/px through the relayout transpose instead of
        # 4) and the crop folds into the resize matrices, so neither a
        # crop slice nor a separate u8 pass exists
        y8 = K.dequant_idct_u8(ywin, qt_y)
        lin = dst_w > w or dst_h > h
        mwl = R.area_matrix_embedded(y8.shape[-1], tx, w, dst_w, lin)
        mhl = R.area_matrix_embedded(y8.shape[-2], ty, h, dst_h, lin)
        yr = jnp.clip(jnp.round(
            R.resize_area_plane_mat(y8, mwl, mhl)), 0, 255)
    else:
        # DCT-domain scaled decode (dct_scale=2: libjpeg's 4/8 reduced
        # decode, OpenCV IMREAD_REDUCED_*_2): reconstruct the luma plane at
        # half resolution straight from the top-left 4x4 coefficients —
        # a quarter of the decode work before a smaller final resample.
        y = jnp.clip(jnp.round(
            K.dequant_idct_scaled(ywin, qt_y, 8 // s)),
            0, 255).astype(jnp.uint8)
        ym_w = R.area_axis_matrix_scaled(y.shape[-1], dst_w,
                                         w / s / dst_w, tx / s)
        ym_h = R.area_axis_matrix_scaled(y.shape[-2], dst_h,
                                         h / s / dst_h, ty / s)
        yr = jnp.clip(jnp.round(R.resize_area_plane_mat(y, ym_w, ym_h)),
                      0, 255)

    def chroma(cplane):
        if s == 1:
            p = K.dequant_idct_u8(cplane[cwin], qt_c)
        else:
            p = jnp.clip(jnp.round(
                K.dequant_idct_scaled(cplane[cwin], qt_c, 8 // s)),
                0, 255).astype(jnp.uint8)
        mat_w = R.area_axis_matrix_scaled(p.shape[-1], dst_w // 2,
                                          w / s / dst_w, tx / (2 * s))
        mat_h = R.area_axis_matrix_scaled(p.shape[-2], dst_h // 2,
                                          h / s / dst_h, ty / (2 * s))
        return jnp.clip(jnp.round(
            R.resize_area_plane_mat(p, mat_w, mat_h)), 0, 255)

    cbr = chroma(cb)
    crr = chroma(cr)
    if emit == "pixels":
        # still output: upsample the once-resampled chroma to the output
        # grid (same triangle filter as 4:2:0 decode) and color-convert at
        # dst res — the direct mode's quality class, in BGRA pixels
        cbu = K.upsample_chroma(cbr, 2, 2, dst_h, dst_w) - 128.0
        cru = K.upsample_chroma(crr, 2, 2, dst_h, dst_w) - 128.0
        return _pack_pixels(yr + 1.772 * cbu,
                            yr - 0.344136286 * cbu - 0.714136286 * cru,
                            yr + 1.402 * cru)
    mcu = 16
    ph = (dst_h + mcu - 1) // mcu * mcu
    pw = (dst_w + mcu - 1) // mcu * mcu
    return (K.fdct_quant(K._pad_to(yr, ph, pw), enc_qt_y),
            K.fdct_quant(K._pad_to(cbr, ph // 2, pw // 2), enc_qt_c),
            K.fdct_quant(K._pad_to(crr, ph // 2, pw // 2), enc_qt_c))


def _fused_jpeg_fit_gray_impl(yc, qt_y, enc_qt_y, src_w: int, src_h: int,
                              dst_w: int, dst_h: int, dct_scale: int = 1,
                              method: str = R.AREA, orientation: int = 1,
                              window=None, emit: str = "coefs"):
    """Grayscale Fit transcode: luma coefficients -> quantized luma encode
    coefficients (1-component JPEG in and out, like the reference's
    Transform over grayscale sources). Same structure as the color paths:
    u8 quantization in the IDCT einsum epilogue, crop folded into the
    resize matrices (AREA), streaming-kernel resample for LINEAR/CUBIC,
    optional DCT-domain reduced decode (AREA-only, gated in __init__)."""
    s = dct_scale
    if orientation == 1:
        left, top, w, h = fit_rect(src_w, src_h, dst_w, dst_h)
        if window is not None:
            x0, y0 = window[0], window[1]
            ywin = yc
        else:
            x0 = y0 = 0
            ywin = yc
        tx, ty = left - x0, top - y0
        if s == 1 and method != R.AREA:
            # LINEAR/CUBIC: decode the window to u8 and run the streaming
            # resize kernels on the crop (same dispatch the color path
            # takes at pipeline.py:313 — bit-identical resample math)
            y8 = K.dequant_idct_u8(ywin, qt_y).astype(jnp.uint8)
            cropped = y8[..., ty:ty + h, tx:tx + w][..., None]
            yr = R.resize(cropped, dst_w, dst_h,
                          method)[..., 0].astype(jnp.float32)
        elif s == 1:
            y8 = K.dequant_idct_u8(ywin, qt_y)
            yr = jnp.clip(jnp.round(
                R.resize_area_plane_embedded(y8, tx, w, dst_w,
                                             ty, h, dst_h)), 0, 255)
        else:
            y = jnp.clip(jnp.round(
                K.dequant_idct_scaled(ywin, qt_y, 8 // s)),
                0, 255).astype(jnp.uint8)
            ym_w = R.area_axis_matrix_scaled(y.shape[-1], dst_w,
                                             w / s / dst_w, tx / s)
            ym_h = R.area_axis_matrix_scaled(y.shape[-2], dst_h,
                                             h / s / dst_h, ty / s)
            yr = jnp.clip(jnp.round(R.resize_area_plane_mat(y, ym_w, ym_h)),
                          0, 255)
    else:
        gray = K.decode_gray(yc, qt_y, src_h, src_w)     # (..., H, W, 1)
        gray = O.orient(gray, orientation)
        eff_w, eff_h = ((src_h, src_w) if O.swaps_dimensions(orientation)
                        else (src_w, src_h))
        left, top, w, h = fit_rect(eff_w, eff_h, dst_w, dst_h)
        cropped = gray[..., top:top + h, left:left + w, :]
        yr = R.resize(cropped, dst_w, dst_h, method)[..., 0].astype(
            jnp.float32)
    if emit == "pixels":
        return _pack_pixels(yr, yr, yr)
    ph = (dst_h + 7) // 8 * 8
    pw = (dst_w + 7) // 8 * 8
    return (K.fdct_quant(K._pad_to(yr, ph, pw), enc_qt_y),)


def _fused_still_fit_impl(px, enc_qt_y, enc_qt_c, src_w: int, src_h: int,
                          dst_w: int, dst_h: int, method: str = R.AREA,
                          orientation: int = 1, emit: str = "coefs"):
    """(B, H, W, C) u8 BGR(A)/gray still pixels -> quantized JPEG encode
    coefficients (emit='coefs') or packed BGRA int32 pixels at the
    destination size (emit='pixels').

    The pixel-input counterpart of _fused_jpeg_fit_impl for non-JPEG
    still sources (PNG/WebP/BMP/...): the host decodes each source to
    pixels (entropy is the serial part), and orientation + center-crop +
    resize + JPEG color encode fuse into ONE device program per batch —
    where the reference crosses the cgo boundary per frame per op
    (ops.go:302-374). Tail math mirrors the JPEG rgb path exactly, so the
    output carries the same documented ±1-u8 tier vs the streaming
    ImageOps path (matmul-form AREA resample reassociation).

    C=1 sources produce 1-component (grayscale) JPEGs / gray still
    outputs; C=4 sources keep their alpha through emit='pixels'.
    """
    if orientation != 1:
        px = O.orient(px, orientation)
    eff_w, eff_h = ((src_h, src_w) if O.swaps_dimensions(orientation)
                    else (src_w, src_h))
    left, top, w, h = fit_rect(eff_w, eff_h, dst_w, dst_h)
    cropped = px[..., top:top + h, left:left + w, :]
    if method == R.AREA:
        resized = R.resize_area_mxu_or_exact(cropped, dst_w, dst_h)
    else:
        resized = R.resize(cropped, dst_w, dst_h, method)
    c = px.shape[-1]
    if emit == "pixels":
        if c == 1:
            g = resized[..., 0]
            return _pack_pixels(g, g, g)
        if c == 4:
            return _pack_pixels_a(resized[..., 0], resized[..., 1],
                                  resized[..., 2], resized[..., 3])
        return _pack_pixels(resized[..., 0], resized[..., 1],
                            resized[..., 2])
    if c == 1:
        # 1-channel sources encode as grayscale JPEG, like the reference's
        # OpenCV encoder over a 1-channel mat
        yr = jnp.clip(jnp.round(resized[..., 0].astype(jnp.float32)),
                      0, 255)
        ph = (dst_h + 7) // 8 * 8
        pw = (dst_w + 7) // 8 * 8
        return (K.fdct_quant(K._pad_to(yr, ph, pw), enc_qt_y),)
    return K.encode_from_bgr(resized, enc_qt_y, enc_qt_c, subsample=True)


_STILL_STATICS = ("src_w", "src_h", "dst_w", "dst_h", "method",
                  "orientation", "emit")

fused_still_fit_transcode = jax.jit(
    _fused_still_fit_impl, static_argnames=_STILL_STATICS)
# No donating variant: the u8 pixel batch can never alias the int16
# coefficient / int32 packed outputs (XLA warns 'donated buffers were not
# usable' on every compile), and each batch is a fresh H2D array anyway.


_GRAY_STATICS = ("src_w", "src_h", "dst_w", "dst_h", "dct_scale",
                 "method", "orientation", "window", "emit")

fused_jpeg_fit_transcode_gray = jax.jit(
    _fused_jpeg_fit_gray_impl, static_argnames=_GRAY_STATICS)

#: serving variant: luma coefficients donated (see _fused_jpeg_fit_donating)
_fused_jpeg_fit_gray_donating = jax.jit(
    _fused_jpeg_fit_gray_impl, static_argnames=_GRAY_STATICS,
    donate_argnums=(0,))


_YCC_STATICS = ("src_w", "src_h", "dst_w", "dst_h", "dct_scale", "window",
                "emit")

fused_jpeg_fit_transcode_ycc = jax.jit(
    _fused_jpeg_fit_ycc_impl, static_argnames=_YCC_STATICS)


_FUSED_STATICS = ("src_w", "src_h", "h2", "v2", "dst_w", "dst_h", "method",
                  "orientation", "window", "emit")

#: public variant: inputs stay live (reusable for benchmarking/sharding)
fused_jpeg_fit_transcode = jax.jit(
    _fused_jpeg_fit_impl, static_argnames=_FUSED_STATICS)

#: serving variant: coefficient inputs are donated so steady-state batches
#: reuse device buffers (zero-allocation parity with opencv.go:197-202)
_fused_jpeg_fit_donating = jax.jit(
    _fused_jpeg_fit_impl, static_argnames=_FUSED_STATICS,
    donate_argnums=(0, 1, 2))


class _ServingPipelineBase:
    """Shared host-encode/orchestration stages of the serving pipelines.

    Subclasses provide the host decode stage (`_host_decode`) and the
    fused device stage (`device_step`) plus the attributes the encode
    stages read: dst_w/dst_h, ncomp, quality, optimize_coding,
    enc_qt_y_np/enc_qt_c_np, output_format, encode_options, _lib.
    """

    @property
    def _emit(self) -> str:
        """Device-step output mode derived from output_format (shared by
        every subclass so they cannot drift): 'coefs' for JPEG output,
        'yuv420' for opaque lossy WebP output (the device converts with
        libwebp's exact import arithmetic and ships 1.5 B/px of planes
        over D2H instead of 4 B/px packed BGRA — ops.color
        .webp_yuv420_from_packed, byte-identical .webp output, gated in
        tests; LILLIPUT_WEBP_YUV=0 restores the BGRA path), else
        'pixels' (packed BGRA int32)."""
        if self.output_format == ".jpeg":
            return "coefs"
        if self.output_format == ".webp" and self._webp_yuv_ok():
            return "yuv420"
        return "pixels"

    def _webp_yuv_ok(self) -> bool:
        """YUV420 device conversion applies to OPAQUE lossy WebP stills:
        alpha-keeping sources stay BGRA (libwebp's alpha-weighted chroma
        accumulation is a different arithmetic), and lossless (q>100)
        needs ARGB input."""
        if os.environ.get("LILLIPUT_WEBP_YUV", "1") in ("0", "false", "off"):
            return False
        if self._pixel_channels(".webp") != 3:
            return False
        from .framebuffer import WEBP_QUALITY
        return int(self.encode_options.get(WEBP_QUALITY,
                                           int(self.quality))) <= 100

    # -- abstract stages ------------------------------------------------------

    def _host_decode(self, bufs: Sequence[bytes],
                     errors: Optional[Dict[int, Exception]] = None):
        """Host decode stage: returns (device_step args tuple, per-image
        ICC profiles). When `errors` is a dict, per-item decode failures
        are ISOLATED: the failing item's exception lands in errors[i],
        its batch lane is zero-filled (a benign all-black lane rides the
        device step; its output bytes are discarded), and healthy
        co-batched items are unaffected. With errors=None the first
        failure raises — the contract for direct stage callers that hold
        returned arrays."""
        raise NotImplementedError

    def device_step(self, *args, donate: bool = True):
        raise NotImplementedError

    # -- host encode stages ---------------------------------------------------

    def _pixel_channels(self, fmt: str) -> int:
        """Channel count the host still-encoders write for pixel outputs.
        JPEG-source pipelines decode to opaque BGR (gray sources stay
        1-channel in PNG); StillTranscodePipeline overrides to keep a
        source alpha channel."""
        if fmt == ".webp":
            return 3
        return 1 if self.ncomp == 1 else 3

    def encode_entropy(self, yq: np.ndarray, cbq: Optional[np.ndarray] = None,
                       crq: Optional[np.ndarray] = None,
                       workers: Optional[int] = None,
                       iccs: Optional[Sequence[bytes]] = None) -> List[bytes]:
        """Huffman-encode device-quantized coefficients (host, threaded).

        Color pipelines take (yq, cbq, crq); grayscale just (yq,). Like
        the host decode stages, the shim releases the GIL so encode scales
        across host cores; each worker owns its output buffer.

        iccs: optional per-image ICC profiles to embed (the transcode paths
        pass each source's profile so color profiles survive the serving
        transcode, like the reference's Transform)."""
        w, h = self.dst_w, self.dst_h
        yb = ((h + 7) // 8, (w + 7) // 8)
        cbb = ((h + 15) // 16, (w + 15) // 16)
        gray = self.ncomp == 1
        b = yq.shape[0]
        outs: List[Optional[bytes]] = [None] * b
        nc = 1 if gray else 3
        hs = (ctypes.c_int32 * nc)(*([1] if gray else [2, 1, 1]))
        vs = (ctypes.c_int32 * nc)(*([1] if gray else [2, 1, 1]))
        qp = ctypes.POINTER(ctypes.c_uint16)
        opt = 1 if self.optimize_coding else 0
        cap = w * h * 4 + (1 << 20)
        if iccs is not None:
            cap += max((len(p or b"") for p in iccs), default=0) + (1 << 12)

        def one(i: int, out_buf=None):
            if out_buf is None:
                out_buf = np.empty(cap, np.uint8)
            y = np.ascontiguousarray(yq[i][:yb[0], :yb[1]])
            if gray:
                ptrs = (_i16p * 1)(y.ctypes.data_as(_i16p))
            else:
                cbx = np.ascontiguousarray(cbq[i][:cbb[0], :cbb[1]])
                crx = np.ascontiguousarray(crq[i][:cbb[0], :cbb[1]])
                ptrs = (_i16p * 3)(y.ctypes.data_as(_i16p),
                                   cbx.ctypes.data_as(_i16p),
                                   crx.ctypes.data_as(_i16p))
            icc = (iccs[i] if iccs is not None else b"") or b""
            icc_arr = (np.frombuffer(icc, np.uint8) if icc
                       else None)
            n = self._lib.lp_jpeg_encode_coefs(
                w, h, nc, hs, vs, ptrs,
                self.enc_qt_y_np.ctypes.data_as(qp),
                self.enc_qt_c_np.ctypes.data_as(qp),
                0, opt, 0,
                (icc_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
                 if icc_arr is not None else None),
                len(icc),
                out_buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                out_buf.size)
            if n < 0:
                raise DecodingFailedError(f"JPEG entropy encode failed ({n})")
            outs[i] = out_buf[:n].tobytes()

        n_workers = workers if workers is not None else min(8, os.cpu_count() or 1)
        if n_workers <= 1 or b <= 1:
            buf = np.empty(cap, np.uint8)
            for i in range(b):
                one(i, buf)
        else:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(n_workers) as ex:
                list(ex.map(one, range(b)))
        return outs  # type: ignore[return-value]

    def encode_pixels(self, packed: np.ndarray,
                      iccs: Optional[Sequence[bytes]] = None,
                      workers: Optional[int] = None) -> List[bytes]:
        """Host still-encode stage for webp/png outputs.

        packed: (B, dst_h, dst_w) int32 BGRA from device_step (little-
        endian byte 0 = B). Threaded like encode_entropy (libwebp and
        zlib release the GIL); _pixel_channels decides whether the alpha
        byte is written or dropped."""
        from .codecs.png import encode_png_pixels
        from .codecs.webp import encode_webp_pixels
        from .framebuffer import PNG_COMPRESSION, WEBP_QUALITY
        b = packed.shape[0]
        # device->host fetches of odd-shaped int32 arrays can arrive with
        # non-C-contiguous strides on TPU (np.asarray preserves them), and
        # .view() requires a contiguous last axis — no-op when already C
        bgra = np.ascontiguousarray(packed).view(np.uint8).reshape(
            b, self.dst_h, self.dst_w, 4)
        outs: List[Optional[bytes]] = [None] * b
        fmt = self.output_format
        ch = self._pixel_channels(fmt)

        def one(i: int):
            icc = (iccs[i] if iccs is not None else b"") or None
            px = np.ascontiguousarray(bgra[i][:, :, :ch])
            if fmt == ".webp":
                o = dict(self.encode_options)
                o.setdefault(WEBP_QUALITY, int(self.quality))
                outs[i] = encode_webp_pixels(px, o, icc)
            else:
                level = int(self.encode_options.get(PNG_COMPRESSION, 6))
                outs[i] = encode_png_pixels(px, level, icc)

        n_workers = (workers if workers is not None
                     else min(8, os.cpu_count() or 1))
        if n_workers <= 1 or b <= 1:
            for i in range(b):
                one(i)
        else:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(n_workers) as ex:
                list(ex.map(one, range(b)))
        return outs  # type: ignore[return-value]

    def encode_yuv(self, y: np.ndarray, u: np.ndarray, v: np.ndarray,
                   iccs: Optional[Sequence[bytes]] = None,
                   workers: Optional[int] = None) -> List[bytes]:
        """Host still-encode stage for the WebP yuv420 device emit:
        libwebp encodes straight from the device-converted planes
        (byte-identical to the BGRA path — see _emit). Threaded like
        encode_pixels."""
        from .codecs.webp import encode_webp_yuv
        from .framebuffer import WEBP_QUALITY
        b = y.shape[0]
        outs: List[Optional[bytes]] = [None] * b

        def one(i: int):
            icc = (iccs[i] if iccs is not None else b"") or None
            o = dict(self.encode_options)
            o.setdefault(WEBP_QUALITY, int(self.quality))
            outs[i] = encode_webp_yuv(y[i], u[i], v[i], o, icc)

        n_workers = (workers if workers is not None
                     else min(8, os.cpu_count() or 1))
        if n_workers <= 1 or b <= 1:
            for i in range(b):
                one(i)
        else:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(n_workers) as ex:
                list(ex.map(one, range(b)))
        return outs  # type: ignore[return-value]

    def _encode_outputs(self, arrs: Sequence[np.ndarray],
                        iccs: Optional[Sequence[bytes]]) -> List[bytes]:
        """Dispatch the host encode stage by output format."""
        if self.output_format == ".jpeg":
            return self.encode_entropy(*arrs, iccs=iccs)
        if self.output_format == ".webp" and len(arrs) == 3:
            return self.encode_yuv(*arrs, iccs=iccs)  # yuv420 emit
        return self.encode_pixels(arrs[0], iccs=iccs)

    # -- end to end -----------------------------------------------------------

    @staticmethod
    def _resolve_errors(out: List[bytes], errors: Dict[int, Exception],
                        return_exceptions: bool) -> List[bytes]:
        """Apply the serving-front failure contract (shared with
        AnimatedTranscodePipeline.transcode): failed items are counted in
        Metrics, then either attached to their own slots
        (return_exceptions=True) or the first one re-raises after healthy
        items finished — one corrupt buffer never fails its co-batched
        requests' work (reference parity: one decoder per request,
        lilliput.go:129, so batch-wide failure coupling cannot exist)."""
        if not errors:
            return out
        from .utils import metrics
        metrics.incr("serving.poison_isolated", len(errors))
        if not return_exceptions:
            raise errors[min(errors)]
        for i, e in errors.items():
            out[i] = e  # type: ignore[assignment]
        return out

    def transcode(self, bufs: Sequence[bytes],
                  return_exceptions: bool = False) -> List[bytes]:
        """Transcode a batch. Per-item decode failures are ISOLATED: a
        corrupt buffer cannot fail its healthy co-batched requests (its
        lane is zero-filled through the device step and its output
        discarded). With return_exceptions=True the failing items' slots
        hold the exception objects; with the default False the first
        failure re-raises after healthy items finish — the same contract
        as AnimatedTranscodePipeline.transcode."""
        from .utils import StageTimer, metrics
        errors: Dict[int, Exception] = {}
        with StageTimer("entropy_decode"):
            args, iccs = self._host_decode(bufs, errors)
        with StageTimer("device"):
            arrs = [np.asarray(a) for a in self.device_step(*args)]
        with StageTimer("encode"):
            out = self._encode_outputs(arrs, iccs)
        metrics.incr("images_transcoded", len(bufs) - len(errors))
        return self._resolve_errors(out, errors, return_exceptions)

    def transcode_pipelined(self, batches: Sequence[Sequence[bytes]],
                            return_exceptions: bool = False
                            ) -> List[List[bytes]]:
        """Double-buffered: host decode for batch i+1 overlaps device batch i
        (JAX dispatch is asynchronous; np.asarray blocks on completion).
        Failure isolation matches transcode(): per-item within each batch."""
        results = []
        pending = None  # (device arrays, ICC profiles, per-item errors)
        for bufs in batches:
            errors: Dict[int, Exception] = {}
            args, iccs = self._host_decode(bufs, errors)
            dev = self.device_step(*args)
            if pending is not None:
                pdev, piccs, perr = pending
                results.append(self._resolve_errors(self._encode_outputs(
                    [np.asarray(a) for a in pdev], piccs), perr,
                    return_exceptions))
            pending = (dev, iccs, errors)
        if pending is not None:
            pdev, piccs, perr = pending
            results.append(self._resolve_errors(self._encode_outputs(
                [np.asarray(a) for a in pdev], piccs), perr,
                return_exceptions))
        return results


class JpegTranscodePipeline(_ServingPipelineBase):
    """Batched JPEG Fit transcoder for a fixed source geometry.

    Usage:
        pipe = JpegTranscodePipeline(sample_jpeg_bytes, 256, 256, quality=85)
        outs = pipe.transcode(list_of_jpeg_bytes)   # same geometry as sample

    output_format selects the encode side: ".jpeg" (default — device
    re-encodes to quantized coefficients, host Huffman) or ".webp"/".png"
    (device emits packed BGRA pixels at the destination size; threaded
    host still-encoders produce the container). Source ICC profiles are
    carried into every output format.
    """

    def __init__(self, sample: bytes, dst_w: int, dst_h: int,
                 quality: int = 85, method: str = R.AREA,
                 optimize_coding: bool = False, chroma_mode: str = "rgb",
                 dct_scale: int = 1, output_format: str = ".jpeg",
                 encode_options: Optional[dict] = None):
        self._lib = binding.load()
        self._coef_pool: dict = {}
        self.dst_w, self.dst_h = dst_w, dst_h
        self.method = method
        self.optimize_coding = optimize_coding
        self.output_format = _normalize_output_format(output_format)
        self.encode_options = dict(encode_options or {})
        if chroma_mode not in ("rgb", "direct"):
            raise ValueError("chroma_mode must be 'rgb' or 'direct'")
        if dct_scale not in (1, 2, 4):
            raise ValueError("dct_scale must be 1, 2 or 4")
        if dct_scale != 1 and chroma_mode != "direct":
            raise ValueError("dct_scale needs chroma_mode='direct'")
        if dct_scale != 1 and method != R.AREA:
            # the reduced decode's fractional crop geometry only has an
            # AREA-matrix form (color enforces this via _direct_ok; the
            # grayscale coercion below must not slip past it)
            raise ValueError("dct_scale>1 requires method=AREA")
        self.chroma_mode = chroma_mode
        self.dct_scale = dct_scale
        d = J.JpegDecoder(sample)
        info = d._info
        if info.num_components not in (1, 3):
            raise DecodingFailedError(
                "pipeline expects color or grayscale JPEGs")
        if info.num_components == 3:
            # same gate as JpegDecoder.decode_to (J.supported_subsampling):
            # integer 1x/2x factors and Cb == Cr sampling — 4:1:1, 3:2
            # ratios or mixed per-chroma sampling would silently map onto
            # the wrong geometry
            if not J.supported_subsampling(info):
                raise DecodingFailedError("unsupported chroma subsampling")
            if info.jpeg_color_space != 3:
                # fused device steps bake in the YCbCr->BGR matrix; a
                # JCS_RGB (Adobe transform=0) source decodes matrix-free
                raise DecodingFailedError(
                    "non-YCbCr 3-component JPEG (JCS_RGB): use the "
                    "streaming ImageOps path for this source")
            if info.comp_quant_tbl[2] != info.comp_quant_tbl[1]:
                # the batched device fns carry ONE chroma table per image;
                # distinct Cb/Cr tables (legal, rare) route through the
                # streaming path, which dequantizes per component
                raise DecodingFailedError(
                    "distinct Cb/Cr quant tables: use the streaming "
                    "ImageOps path for this source")
        self.ncomp = int(info.num_components)
        if self.ncomp == 1 and chroma_mode == "direct":
            # grayscale has no chroma; the luma-only path is the only mode
            self.chroma_mode = chroma_mode = "rgb"
        self.geom = geometry_of(info)
        self.orientation = int(J.exif_orientation(sample))
        g = self.geom
        if dct_scale != 1 and self.orientation != 1:
            # reduced decode is an upright-only serving fast path: the
            # orient fallback decodes full-resolution pixels, which the
            # truncated kxk coefficients cannot reconstruct
            raise DecodingFailedError(
                "dct_scale>1 requires upright (orientation 1) sources")
        if self.chroma_mode == "direct" and not self._direct_ok():
            raise DecodingFailedError(
                "chroma_mode='direct' needs 4:2:0, upright orientation, "
                "AREA method, and even output dims")
        # host-side decode window (orientation-1 Fit): coefficients outside
        # the MCU-aligned crop window never leave the host — decode_entropy
        # slices each image's arrays and the device fns get window=(x0, y0,
        # rw, rh) as a static (~40% less H2D for 1080p->square)
        g = self.geom
        ybh = g.blocks[0][0]
        if self.orientation == 1:
            blocks = g.blocks if self.ncomp == 3 else (g.blocks[0],
                                                       g.blocks[0])
            luma_rows = ybh + (ybh % 2) if (self.ncomp == 3 and g.v2) else ybh
            self._window = mcu_decode_window(
                g.width, g.height, dst_w, dst_h, g.h2, g.v2, blocks,
                luma_rows)
        else:
            self._window = None
        #: static (x0, y0, rw, rh) for the device fns (None = full arrays)
        self.window_static = self._window[:4] if self._window else None
        self.quality = quality
        eql, eqc = J.scaled_qtables(quality)
        self.enc_qt_y_np, self.enc_qt_c_np = eql, eqc
        self.enc_qt_y = jnp.asarray(eql)
        self.enc_qt_c = jnp.asarray(eqc)

    @staticmethod
    def direct_eligible(geom, orientation: int, dst_w: int, dst_h: int,
                        method: str) -> bool:
        """chroma_mode='direct' preconditions — THE one copy of the
        predicate (this class, the sharded subclass and
        MultiGeometryPipeline's eligibility check all call it, so the
        builder can never construct a direct pipeline whose device_step
        would reject its own mode)."""
        return (geom.h2 and geom.v2 and orientation == 1
                and dst_w % 2 == 0 and dst_h % 2 == 0
                and method == R.AREA)

    def _direct_ok(self) -> bool:
        return self.direct_eligible(self.geom, self.orientation,
                                    self.dst_w, self.dst_h, self.method)

    # -- host entropy stages --------------------------------------------------

    def _validate_header(self, buf: bytes) -> "J._JpegInfo":
        """Header-only parse + geometry/orientation gate.

        Every buffer is validated BEFORE the coefficient decode: the shim
        memcpys by the image's own block counts, so an unchecked larger
        image would overrun the batch arrays (untrusted-input memory
        safety, the reference's pervasive hardening stance — SURVEY.md §5).
        """
        arr = np.frombuffer(buf, np.uint8)
        info = J._JpegInfo()
        rc = self._lib.lp_jpeg_get_info(
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), arr.size,
            ctypes.byref(info))
        if rc != 0:
            raise DecodingFailedError(f"JPEG header parse failed ({rc})")
        if info.num_components != self.ncomp:
            raise DecodingFailedError(
                f"component-count mismatch: pipeline compiled for "
                f"{self.ncomp}-component JPEGs, got {info.num_components}")
        if geometry_of(info) != self.geom:
            raise DecodingFailedError(
                f"geometry mismatch: pipeline compiled for {self.geom}, "
                f"got {geometry_of(info)}")
        if (info.num_components == 3
                and info.comp_quant_tbl[2] != info.comp_quant_tbl[1]):
            raise DecodingFailedError(
                "distinct Cb/Cr quant tables: use the streaming ImageOps "
                "path for this source")
        if info.num_components == 3 and info.jpeg_color_space != 3:
            # the fused device steps bake in the YCbCr->BGR matrix; a
            # JCS_RGB (Adobe transform=0) source must take the streaming
            # path, where decode_rgb skips the matrix
            raise DecodingFailedError(
                "non-YCbCr 3-component JPEG (JCS_RGB): use the streaming "
                "ImageOps path for this source")
        if info.num_components == 3 and not J.supported_subsampling(info):
            # geometry_of block-count equality can coincide for tiny images
            # (<=16px axes) whose Cb/Cr sampling differs from the compile
            # sample — re-check the sampling factors per request so such a
            # buffer fails loudly instead of mis-decoding one chroma plane
            raise DecodingFailedError(
                "unsupported chroma subsampling: use the streaming "
                "ImageOps path for this source")
        o = int(J.exif_orientation(buf))
        if o != self.orientation:
            raise DecodingFailedError(
                f"EXIF orientation mismatch: pipeline expects "
                f"{self.orientation}, got {o} (route through "
                f"MultiGeometryPipeline, which groups by orientation)")
        return info

    def _pooled(self, key, alloc):
        """Rotating 2-slot destination-array pool for decode_entropy.

        Fresh batch-coefficient arrays are mmap-backed at these sizes, so
        every batch pays first-touch page faults (~1.1 ms/image at 1080p,
        measured in tools/profile_host.py — comparable to the entropy
        decode itself after jpeg_huff.cpp). Steady-state serving reuses the
        previous batch's pages instead. Two slots cover transcode_pipelined,
        whose batch-i H2D transfer may still be in flight while batch i+1
        decodes; slot i is reused only at batch i+2, after iteration i+1
        fetched batch i's OUTPUTS (which orders after its input transfer).
        Callers of pool=True must serialize decode_entropy calls per
        pipeline (transcode/transcode_pipelined do)."""
        slots = self._coef_pool.get(key)
        if slots is None:
            if len(self._coef_pool) >= 4:  # ragged tail batches: stay bounded
                self._coef_pool.pop(next(iter(self._coef_pool)))
            self._coef_pool[key] = slots = [[], 0]
        arrs, idx = slots
        if len(arrs) < 2:
            arrs.append(alloc())
            return arrs[-1]
        out = arrs[idx]
        slots[1] = 1 - idx
        return out

    def decode_entropy(self, bufs: Sequence[bytes],
                       workers: Optional[int] = None, pool: bool = False,
                       errors: Optional[Dict[int, Exception]] = None):
        """Huffman-decode a batch into stacked coefficient + qtable arrays.

        Returns (ys, cbs, crs, qt_y, qt_c) with qt_* of shape (B, 64) — each
        image is dequantized with its OWN tables on device (same-size JPEGs
        saved at different qualities must not share tables). Grayscale
        pipelines return (ys, qt_y).

        pool=True reuses the previous-but-one batch's destination arrays
        (see _pooled) — the serving paths' default; direct callers that
        hold returned arrays across calls must keep pool=False.

        errors: when a dict, per-item failures are ISOLATED (the serving
        contract): a corrupt buffer's exception lands in errors[i] and its
        lane is zero-filled — coefficients AND qtables, so pooled reuse
        cannot leak a previous request's data through the failed slot —
        instead of failing the whole batch. errors=None (default) raises
        on the first bad buffer.

        The entropy shims release the GIL inside ctypes calls, so a small
        thread pool scales entropy decode across host cores (the reference's
        'one ImageOps per goroutine' concurrency model, SURVEY.md §2.3)."""
        g = self.geom
        b = len(bufs)
        # luma rows rounded up to whole MCU rows (zeros in the pad): the
        # device megakernel needs 2 luma block rows per chroma row, and a
        # host-side calloc is free while a device-side jnp.pad is a full
        # HBM round trip over the coefficient stack
        ybh, ybw = g.blocks[0]
        gray = self.ncomp == 1
        # the MCU-row pad only serves the vertically-subsampled megakernels
        # (2 luma block rows per chroma row); 4:2:2/4:4:4 must keep the
        # true row count or the kernel shape guards would decline them
        ypad = ybh % 2 if (not gray and g.v2) else 0
        win = self._window
        if win is None:
            def _alloc_full():
                # ys zeros: only the MCU pad row relies on it, and nothing
                # ever writes that row, so pooled reuse preserves it
                a = np.zeros((b, ybh + ypad, ybw, 64), np.int16)
                if gray:
                    return (a,)
                return (a, np.empty((b,) + g.blocks[1] + (64,), np.int16),
                        np.empty((b,) + g.blocks[2] + (64,), np.int16))

            if pool:
                arrs = self._pooled((b, "full"), _alloc_full)
            else:
                arrs = _alloc_full()
            ys = arrs[0]
            if not gray:
                cbs, crs = arrs[1], arrs[2]
            win_c = None
        else:
            # window mode: the shim decodes into per-thread full-geometry
            # scratch and only the MCU crop window is copied into the batch
            # (and later shipped to the device)
            import threading
            _, _, _, _, yr, ycs, crr, ccs = win

            def _alloc_win():
                a = np.empty((b, yr.stop - yr.start, ycs.stop - ycs.start,
                              64), np.int16)
                if gray:
                    return (a,)
                c = np.empty((b, crr.stop - crr.start, ccs.stop - ccs.start,
                              64), np.int16)
                return (a, c, np.empty_like(c))

            if pool:
                arrs = self._pooled((b, "win"), _alloc_win)
            else:
                arrs = _alloc_win()
            ys = arrs[0]
            if not gray:
                cbs, crs = arrs[1], arrs[2]
            # per-component block windows for the direct-window fast decode
            # (lp_jpeg_decode_coefs_win): {y0, x0, h, w} rows
            win_c = np.array(
                [[yr.start, ycs.start, yr.stop - yr.start,
                  ycs.stop - ycs.start]] +
                [[crr.start, ccs.start, crr.stop - crr.start,
                  ccs.stop - ccs.start]] * 2 + [[0, 0, 0, 0]], np.int32)
            tls = threading.local()

            def scratch():
                s = getattr(tls, "s", None)
                if s is None:
                    s = ((np.zeros((ybh + ypad, ybw, 64), np.int16),)
                         if gray else
                         (np.zeros((ybh + ypad, ybw, 64), np.int16),
                          np.empty(g.blocks[1] + (64,), np.int16),
                          np.empty(g.blocks[2] + (64,), np.int16)))
                    tls.s = s
                return s
        qty = np.empty((b, 64), np.uint16)
        qtc = None if gray else np.empty((b, 64), np.uint16)

        n_workers = workers if workers is not None else min(8, os.cpu_count() or 1)
        # small batches underfill the pool: slice each image's scan at its
        # restart markers across the idle threads (byte-identical output;
        # jpeg_shim.cpp lp_jpeg_decode_coefs_parallel falls back serially
        # for images without a row-aligned DRI)
        intra = max(1, n_workers // max(b, 1)) if b < n_workers else 1

        def one(i: int):
            info = self._validate_header(bufs[i])
            arr = np.frombuffer(bufs[i], np.uint8)
            qtables = np.zeros((4, 64), np.uint16)
            rc = -10
            if J.use_fast_huff():
                # own Huffman decoder (jpeg_huff.cpp, bit-identical to
                # libjpeg, baseline AND progressive): no internal
                # whole-image virtual array, no copy-out pass — measured
                # 1.5x the libjpeg call on the bench fixture
                # (tools/profile_host.py). Threads across restart segments when
                # the batch underfills the pool. In window mode baseline
                # decodes DIRECTLY into the batch window slice
                # (out-of-window blocks parse but never store) so the
                # full-geometry scratch + crop copy is skipped;
                # progressive stages through a C-side thread-local
                # full-geometry scratch (refinement parsing needs every
                # block's history) and copies the window out.
                comps = (ys[i],) if gray else (ys[i], cbs[i], crs[i])
                ptrs = (_i16p * len(comps))(
                    *[c.ctypes.data_as(_i16p) for c in comps])
                rc = self._lib.lp_jpeg_decode_coefs_win(
                    arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    arr.size, ptrs,
                    qtables.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                    intra,
                    (win_c.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
                     if win_c is not None else None))
                if rc == 0:
                    qty[i] = qtables[info.comp_quant_tbl[0]]
                    if not gray:
                        qtc[i] = qtables[info.comp_quant_tbl[1]]
                    return
            # libjpeg fallback: window mode stages through full-geometry
            # per-thread scratch, then copies the crop window out
            if win is None:
                comps = (ys[i],) if gray else (ys[i], cbs[i], crs[i])
            else:
                comps = scratch()
            ptrs = (_i16p * len(comps))(
                *[c.ctypes.data_as(_i16p) for c in comps])
            if (rc != 0 and intra > 1 and info.restart_interval > 0
                    and not info.progressive):
                rc = self._lib.lp_jpeg_decode_coefs_parallel(
                    arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    arr.size, ptrs,
                    qtables.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                    intra)
            if rc != 0:
                rc = self._lib.lp_jpeg_decode_coefs(
                    arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                    arr.size, ptrs,
                    qtables.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
                    None, 0)
            if rc != 0:
                raise DecodingFailedError(f"JPEG entropy decode failed ({rc})")
            if win is not None:
                ys[i] = comps[0][yr, ycs]
                if not gray:
                    cbs[i] = comps[1][crr, ccs]
                    crs[i] = comps[2][crr, ccs]
            qty[i] = qtables[info.comp_quant_tbl[0]]
            if not gray:
                qtc[i] = qtables[info.comp_quant_tbl[1]]

        if errors is not None:
            decode_one = one

            def one(i: int):
                try:
                    decode_one(i)
                except Exception as e:  # noqa: BLE001 — isolate per item
                    errors[i] = e
                    ys[i] = 0            # benign all-zero lane; also wipes
                    qty[i] = 0           # pooled previous-batch data
                    if not gray:
                        cbs[i] = 0
                        crs[i] = 0
                        qtc[i] = 0

        if n_workers <= 1 or b <= 1:
            for i in range(b):
                one(i)
        else:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(n_workers) as ex:
                list(ex.map(one, range(b)))
        if self.dct_scale > 1:
            # ship only the kxk corner coefficients the scaled IDCT reads:
            # byte-identical output at 64/(k*k) less H2D traffic (4x at
            # dct_scale=2, 16x at 4 — the transfer matters on PCIe hosts)
            idx = K.scaled_coef_indices(8 // self.dct_scale)
            ys = np.ascontiguousarray(ys[..., idx])
            if not gray:
                cbs = np.ascontiguousarray(cbs[..., idx])
                crs = np.ascontiguousarray(crs[..., idx])
        if gray:
            return ys, qty
        return ys, cbs, crs, qty, qtc

    # -- device stage ----------------------------------------------------------

    def device_step(self, ys, cbs=None, crs=None, qty=None, qtc=None,
                    donate: bool = True):
        """One fused dispatch; returns device arrays (async).

        Color pipelines take (ys, cbs, crs, qty, qtc); grayscale (ys, qty)
        — i.e. device_step(*decode_entropy(bufs)) works for both.
        donate=True (serving default) hands the coefficient buffers to XLA
        for reuse; pass donate=False when the caller keeps device-resident
        inputs alive across calls (e.g. bench loops).

        Always returns a tuple: quantized coefficient arrays for JPEG
        output, or a 1-tuple holding the packed-BGRA int32 pixel array at
        the destination size for webp/png output."""
        g = self.geom
        emit = self._emit
        # yuv420 is a post-pass over the fused fn's packed pixels (the
        # conversion program is tiny; keeping it a separate jit leaves
        # every fused fn untouched)
        fused_emit = "pixels" if emit == "yuv420" else emit
        # donation only helps when an output can alias a donated input;
        # pixel outputs (int32) can never reuse the int16 coefficient
        # buffers, so skip the donating variants (avoids per-shape XLA
        # "donated buffers were not usable" warnings in serving logs)
        donate = donate and emit == "coefs"
        if self.ncomp == 1:
            qty = cbs  # (ys, qty) calling convention
            gfn = (_fused_jpeg_fit_gray_donating if donate
                   else fused_jpeg_fit_transcode_gray)
            out = gfn(
                jnp.asarray(ys), jnp.asarray(qty), self.enc_qt_y,
                src_w=g.width, src_h=g.height,
                dst_w=self.dst_w, dst_h=self.dst_h,
                dct_scale=self.dct_scale, method=self.method,
                orientation=self.orientation,
                window=self.window_static, emit=fused_emit)
        elif self.chroma_mode == "direct":
            if not self._direct_ok():
                raise DecodingFailedError(
                    "chroma_mode='direct' needs 4:2:0, upright orientation, "
                    "AREA method, and even output dims")
            out = fused_jpeg_fit_transcode_ycc(
                jnp.asarray(ys), jnp.asarray(cbs), jnp.asarray(crs),
                jnp.asarray(qty), jnp.asarray(qtc),
                self.enc_qt_y, self.enc_qt_c,
                src_w=g.width, src_h=g.height,
                dst_w=self.dst_w, dst_h=self.dst_h,
                dct_scale=self.dct_scale, window=self.window_static,
                emit=fused_emit)
        else:
            fn = (_fused_jpeg_fit_donating if donate
                  else fused_jpeg_fit_transcode)
            out = fn(
                jnp.asarray(ys), jnp.asarray(cbs), jnp.asarray(crs),
                jnp.asarray(qty), jnp.asarray(qtc),
                self.enc_qt_y, self.enc_qt_c,
                src_w=g.width, src_h=g.height, h2=g.h2, v2=g.v2,
                dst_w=self.dst_w, dst_h=self.dst_h,
                method=self.method, orientation=self.orientation,
                window=self.window_static, emit=fused_emit)
        return emit_post(out, emit)

    # -- end to end --------------------------------------------------------------

    def _host_decode(self, bufs: Sequence[bytes],
                     errors: Optional[Dict[int, Exception]] = None):
        """Host stage: entropy decode + ICC collection (a cheap APP2
        header walk per source, so color profiles survive the transcode —
        reference Transform parity)."""
        coefs = self.decode_entropy(bufs, pool=True, errors=errors)
        iccs = [b"" if errors is not None and i in errors
                else J.read_icc(buf) for i, buf in enumerate(bufs)]
        return coefs, iccs


def _synthetic_still(fmt: str, w: int, h: int, channels: int = 3) -> bytes:
    """Zero-pixel sample of a still format/geometry — the warm() analog
    of codecs.jpeg.synthetic_jpeg for pixel-domain pipelines. The
    channel count is part of the serving signature (PNG color type /
    WebP alpha flag), so it is encoded faithfully."""
    arr = np.zeros((h, w, channels), np.uint8)
    if fmt == "png":
        from .codecs.png import encode_png_pixels
        return encode_png_pixels(arr, 1)
    if fmt == "webp":
        from .codecs.webp import encode_webp_pixels
        from .framebuffer import WEBP_QUALITY
        # quality>100 selects lossless, which keeps a 4th channel's
        # alpha flag in the container (the lossy path would too, but
        # lossless is deterministic about it)
        return encode_webp_pixels(arr, {WEBP_QUALITY: 101})
    raise ValueError(f"unsupported warm still format {fmt!r}")


def _host_cpu_device():
    """Host CPU jax device for the still decode path's per-image pixel
    conversions. They must not ride the accelerator per image: eager
    per-op dispatch through a remote TPU costs ms-to-minutes per op, and
    the conversions (palette LUT, 16->8, channel swizzles) are trivially
    CPU-sized."""
    try:
        return jax.devices("cpu")[0]
    except RuntimeError:
        return None


class StillTranscodePipeline(_ServingPipelineBase):
    """Batched Fit transcoder for same-geometry NON-JPEG still sources
    (PNG/WebP/BMP/GIF/AVIF/... — anything new_decoder dispatches).

    The JPEG serving pipelines work in the coefficient domain; every
    other still format decodes to pixels on the HOST (the serial entropy
    codecs, threaded across cores; the cheap per-image conversions pinned
    to the host CPU backend), and the dense tail — EXIF orientation,
    center-crop, INTER_AREA resize, JPEG color encode — fuses into ONE
    device dispatch per batch (_fused_still_fit_impl). Output tier
    matches the JPEG serving path: ±1 u8 vs the streaming ImageOps path
    (matmul-form AREA resample reassociation).

    Gray (1-channel) sources produce grayscale JPEG / 1-channel PNG
    outputs; 4-channel sources keep alpha through .webp/.png outputs
    (JPEG output drops it, like the reference's OpenCV encoder).
    Animated sources transcode their FIRST frame — what the reference's
    Transform emits for animated input with still output.

    Usage:
        pipe = StillTranscodePipeline(sample_png, 256, 256, quality=85)
        outs = pipe.transcode(list_of_pngs)   # same geometry as sample
    """

    def __init__(self, sample: bytes, dst_w: int, dst_h: int,
                 quality: int = 85, method: str = R.AREA,
                 optimize_coding: bool = False,
                 output_format: str = ".jpeg",
                 encode_options: Optional[dict] = None):
        from . import api as A
        if A.is_jpeg(sample):
            raise DecodingFailedError(
                "JPEG sources: use JpegTranscodePipeline (the "
                "coefficient-domain path) or MultiGeometryPipeline")
        self._lib = binding.load()
        self.dst_w, self.dst_h = dst_w, dst_h
        self.method = method
        self.quality = quality
        self.optimize_coding = optimize_coding
        self.output_format = _normalize_output_format(output_format)
        self.encode_options = dict(encode_options or {})
        d = A.new_decoder(sample)
        self.kind = type(d).__name__
        hdr = d.header()
        self.src_w, self.src_h = int(hdr.width), int(hdr.height)
        self.orientation = int(hdr.orientation)
        arr = self._decode_array(d)
        if arr.shape[:2] != (self.src_h, self.src_w):
            # e.g. a video stream whose SAR display scaling changes the
            # decoded size: the batched path needs header==pixels geometry
            raise DecodingFailedError(
                f"decoder output {arr.shape[1]}x{arr.shape[0]} does not "
                f"match header geometry {self.src_w}x{self.src_h}: use "
                "the streaming ImageOps path for this source")
        self.channels = int(arr.shape[-1])
        self.ncomp = 1 if self.channels == 1 else 3
        eql, eqc = J.scaled_qtables(quality)
        self.enc_qt_y_np, self.enc_qt_c_np = eql, eqc
        self.enc_qt_y = jnp.asarray(eql)
        self.enc_qt_c = jnp.asarray(eqc)

    # -- host decode stage ----------------------------------------------------

    @staticmethod
    def _decode_array(d) -> np.ndarray:
        """First-frame pixels as host u8 numpy, decoder jnp work pinned
        to the CPU backend."""
        import contextlib

        from .framebuffer import Framebuffer
        fb = Framebuffer()
        cpu = _host_cpu_device()
        ctx = (jax.default_device(cpu) if cpu is not None
               else contextlib.nullcontext())
        with ctx:
            d.decode_to(fb)
            arr = np.asarray(fb.array)
        return arr

    def _decode_one(self, buf: bytes):
        """Decode + validate one source (untrusted-input stance: every
        buffer is re-validated against the compiled signature before it
        lands in the batch array)."""
        from . import api as A
        d = A.new_decoder(buf)
        if type(d).__name__ != self.kind:
            raise DecodingFailedError(
                f"format mismatch: pipeline compiled for {self.kind} "
                f"sources, got {type(d).__name__}")
        hdr = d.header()
        if (int(hdr.width), int(hdr.height)) != (self.src_w, self.src_h):
            raise DecodingFailedError(
                f"geometry mismatch: pipeline compiled for "
                f"{self.src_w}x{self.src_h}, got {hdr.width}x{hdr.height}")
        if int(hdr.orientation) != self.orientation:
            raise DecodingFailedError(
                f"EXIF orientation mismatch: pipeline expects "
                f"{self.orientation}, got {int(hdr.orientation)}")
        arr = self._decode_array(d)
        if arr.shape != (self.src_h, self.src_w, self.channels):
            raise DecodingFailedError(
                f"decoded shape mismatch: pipeline compiled for "
                f"{(self.src_h, self.src_w, self.channels)}, got "
                f"{arr.shape} (same-size sources must share the channel "
                "layout)")
        return arr, (d.icc() or b"")

    def decode_pixels(self, bufs: Sequence[bytes],
                      workers: Optional[int] = None,
                      errors: Optional[Dict[int, Exception]] = None):
        """Decode a batch into one (B, H, W, C) u8 array + per-image ICC
        profiles. Threaded like decode_entropy: the entropy codecs
        (zlib/libwebp/dav1d/...) release the GIL.

        errors: when a dict, per-item failures are ISOLATED (the serving
        contract — see JpegTranscodePipeline.decode_entropy): a corrupt
        buffer's exception lands in errors[i] and its lane zero-fills;
        errors=None (default) raises on the first bad buffer."""
        b = len(bufs)
        batch = np.empty((b, self.src_h, self.src_w, self.channels),
                         np.uint8)
        iccs: List[bytes] = [b""] * b

        def one(i: int):
            arr, icc = self._decode_one(bufs[i])
            batch[i] = arr
            iccs[i] = icc

        if errors is not None:
            decode_one = one

            def one(i: int):
                try:
                    decode_one(i)
                except Exception as e:  # noqa: BLE001 — isolate per item
                    errors[i] = e
                    batch[i] = 0   # benign black lane (np.empty scratch)
                    iccs[i] = b""

        n_workers = (workers if workers is not None
                     else min(8, os.cpu_count() or 1))
        if n_workers <= 1 or b <= 1:
            for i in range(b):
                one(i)
        else:
            from concurrent.futures import ThreadPoolExecutor
            with ThreadPoolExecutor(n_workers) as ex:
                list(ex.map(one, range(b)))
        return batch, iccs

    def _host_decode(self, bufs: Sequence[bytes],
                     errors: Optional[Dict[int, Exception]] = None):
        batch, iccs = self.decode_pixels(bufs, errors=errors)
        return (batch,), iccs

    def _pixel_channels(self, fmt: str) -> int:
        if self.channels == 4:
            return 4                      # alpha survives still outputs
        if self.channels == 1:
            # gray stays 1-channel in PNG; libwebp takes 3/4-channel only
            return 1 if fmt == ".png" else 3
        return 3

    # -- device stage ---------------------------------------------------------

    def device_step(self, px, donate: bool = True):
        """One fused dispatch over the pixel batch (async device arrays).

        `donate` is accepted for signature parity with the JPEG pipelines
        but is a no-op: the u8 pixel input can never alias the outputs."""
        del donate
        emit = self._emit
        out = fused_still_fit_transcode(
            jnp.asarray(px), self.enc_qt_y, self.enc_qt_c,
            src_w=self.src_w, src_h=self.src_h,
            dst_w=self.dst_w, dst_h=self.dst_h, method=self.method,
            orientation=self.orientation,
            emit="pixels" if emit == "yuv420" else emit)
        return emit_post(out, emit)


class AnimatedTranscodePipeline:
    """Serving front for ANIMATED sources whose output keeps the animation
    — what the reference's Transform does for animated input with .gif or
    .webp output (ops.go:302-374 loops every frame through the encoder;
    the still serving pipelines instead emit the first frame, the
    reference's behavior for still outputs).

    Each animation runs the whole-animation batched transcode (frames on
    the leading device axis: composite lax.scan + batched resize + for GIF
    output the quantize_animation scan — three dispatches total, outputs
    byte-identical to the streaming ImageOps path). The frame axis is
    padded to ops.palette.frame_bucket so same-canvas animations of any
    length share compiled programs (the serving compile-reuse concern).
    A batch of animations runs on a thread pool: the host entropy stages
    (LZW / libwebp / dav1d decode, LZW / WebPAnimEncoder encode) release
    the GIL and overlap with other threads' device dispatches.

    output_format: ".gif" (GIF sources only — the GIF encoder reuses the
    source palette, reference giflib.go parity), ".webp" (GIF/WebP/AVIF
    sources), or ".avif" (AVIF sources).
    """

    _FORMATS = (".gif", ".webp", ".avif")

    def __init__(self, dst_w: int, dst_h: int, output_format: str = ".webp",
                 fit: bool = True, workers: Optional[int] = None,
                 encode_options: Optional[dict] = None, mesh=None):
        if output_format not in self._FORMATS:
            raise ValueError(
                f"animated output_format must be one of {self._FORMATS}")
        self.dst_w, self.dst_h = dst_w, dst_h
        self.output_format = output_format
        self.fit = fit
        self.workers = workers
        self.encode_options = dict(encode_options or {})
        # optional jax.sharding.Mesh with a 'dp' axis: the cross-animation
        # batch shards its animation axis over the mesh (byte-identical —
        # animations never split across chips); per-animation fallbacks
        # (mixed formats, singletons) stay single-device
        self.mesh = mesh

    def transcode_one(self, buf: bytes) -> bytes:
        from . import api as A
        fmt = self.output_format
        if A.is_gif(buf):
            if fmt not in (".gif", ".webp"):
                raise DecodingFailedError(
                    f"GIF sources encode to .gif/.webp, not {fmt}")
            return transcode_gif(buf, self.dst_w, self.dst_h, fit=self.fit,
                                 file_type=fmt)
        if A.is_webp(buf):
            if fmt != ".webp":
                raise DecodingFailedError(
                    ".gif output requires a GIF source (the GIF encoder "
                    "reuses the source palette)" if fmt == ".gif" else
                    f"WebP sources encode to .webp, not {fmt}")
            return transcode_webp(buf, self.dst_w, self.dst_h, fit=self.fit,
                                  encode_options=self.encode_options)
        if A.is_avif(buf):
            if fmt not in (".webp", ".avif"):
                raise DecodingFailedError(
                    ".gif output requires a GIF source (the GIF encoder "
                    "reuses the source palette)")
            return transcode_avif(buf, self.dst_w, self.dst_h, fit=self.fit,
                                  encode_options=self.encode_options,
                                  file_type=fmt)
        raise DecodingFailedError(
            "animated transcode supports GIF/WebP/AVIF sources")

    def transcode(self, bufs: Sequence[bytes],
                  return_exceptions: bool = False) -> List[bytes]:
        """Transcode a mixed batch. Per-item failures are ISOLATED: a
        malformed animation grouped into a cross-animation batch cannot
        fail its healthy co-batched requests — a failed group falls back
        to per-item transcode, where errors attach to their own index.
        With return_exceptions=True the failing items' slots hold the
        exception objects (the serving-front contract); with the default
        False the first failure re-raises after healthy items finish.
        """
        from . import api as A
        out: List[Optional[bytes]] = [None] * len(bufs)
        errors: Dict[int, Exception] = {}
        # GIF sources with animation-capable output ride the cross-
        # animation batch: same-signature animations share ONE device
        # program (transcode_gif_batch), byte-identical to per-animation
        rest = list(range(len(bufs)))

        def run_batch(sniff, batch_fn, **kw):
            nonlocal rest
            members = [i for i in rest if sniff(bufs[i])]
            if len(members) > 1:
                try:
                    res = batch_fn([bufs[i] for i in members], self.dst_w,
                                   self.dst_h, fit=self.fit,
                                   workers=self.workers, mesh=self.mesh,
                                   **kw)
                except Exception:
                    # one hostile member poisoned the group: leave every
                    # member in `rest` — the per-item path below isolates
                    # the failure to its own index (ADVICE r3 #1)
                    return
                for i, r in zip(members, res):
                    out[i] = r
                rest = [i for i in rest if out[i] is None]

        if self.output_format in (".gif", ".webp"):
            run_batch(A.is_gif, transcode_gif_batch,
                      file_type=self.output_format)
        if self.output_format == ".webp":
            run_batch(A.is_webp, transcode_webp_batch,
                      encode_options=self.encode_options)
        if self.output_format in (".webp", ".avif"):
            run_batch(A.is_avif, transcode_avif_batch,
                      encode_options=self.encode_options,
                      file_type=self.output_format)
        n_workers = (self.workers if self.workers is not None
                     else min(4, os.cpu_count() or 1))
        if rest:
            def one(i):
                try:
                    return self.transcode_one(bufs[i])
                except Exception as e:  # noqa: BLE001 — isolate per item
                    errors[i] = e
                    return None

            if n_workers <= 1 or len(rest) <= 1:
                results = [one(i) for i in rest]
            else:
                from concurrent.futures import ThreadPoolExecutor
                with ThreadPoolExecutor(n_workers) as ex:
                    results = list(ex.map(one, rest))
            for i, r in zip(rest, results):
                out[i] = r
        if errors:
            from .utils import metrics
            metrics.incr("serving.poison_isolated", len(errors))
            if return_exceptions:
                for i, e in errors.items():
                    out[i] = e  # type: ignore[assignment]
            else:
                raise errors[min(errors)]
        return out  # type: ignore[return-value]


class MultiGeometryPipeline:
    """Serving front for mixed-geometry still batches (SURVEY.md hard
    part #3) — JPEG and non-JPEG sources alike.

    Dynamic input shapes would force an XLA recompile per image; instead
    requests are grouped by their exact signature — JPEGs by coefficient
    geometry (dims + subsampling) and EXIF orientation, other still
    formats (PNG/WebP/BMP/GIF/AVIF/...) by (format, dims, channels,
    orientation) — each group batching through a per-signature
    JpegTranscodePipeline (coefficient domain) or StillTranscodePipeline
    (pixel domain) whose compiled program is cached (LRU). Steady-state
    traffic from a bounded set of source resolutions (the common serving
    shape) compiles once per resolution and then always dispatches
    batched.
    """

    def __init__(self, dst_w: int, dst_h: int, quality: int = 85,
                 method: str = R.AREA, max_geometries: int = 64,
                 chroma_mode: str = "rgb", dct_scale: int = 1,
                 output_format: str = ".jpeg",
                 encode_options: Optional[dict] = None, mesh=None):
        # optional jax.sharding.Mesh: every route shards — JPEG groups
        # build ShardedJpegPipeline, stills ShardedStillPipeline (dp
        # byte-identical, sp rows for big images), animated batches
        # dp-shard their animation axis
        self.mesh = mesh
        self.dst_w, self.dst_h = dst_w, dst_h
        self.quality = quality
        self.method = method
        self.max_geometries = max_geometries
        self.chroma_mode = chroma_mode
        self.dct_scale = dct_scale
        # fail at construction, not on the first request; ".gif" is the
        # animated-only output (GIF sources, reference giflib.go parity)
        fmt = {".jpg": ".jpeg"}.get(output_format, output_format)
        if fmt == ".gif":
            self.output_format = fmt
        else:
            self.output_format = _normalize_output_format(output_format)
        self.encode_options = dict(encode_options or {})
        self._anim_pipe: Optional[AnimatedTranscodePipeline] = None
        # signature key -> serving pipeline, LRU order; JPEG keys are
        # (JpegGeometry, orientation), still keys ("still", kind, w, h,
        # channels, orientation)
        self._pipes: "OrderedDict[Tuple, _ServingPipelineBase]" = OrderedDict()

    def _animated_route(self, buf: bytes):
        """Animated source + animation-capable output -> the animated
        serving pipeline (reference Transform keeps the animation for
        .gif/.webp outputs); still outputs keep the first-frame stance.
        Returns (pipeline or None for the still routes, decoder or None)
        — a decoder built for the animation probe is handed back so the
        still route reuses it instead of re-parsing the container."""
        from . import api as A
        if self.output_format == ".gif":
            # GIF output: GIF sources only (single-frame ones included —
            # the GIF encoder reuses the source palette)
            if not A.is_gif(buf):
                raise DecodingFailedError(
                    ".gif output requires a GIF source (the GIF encoder "
                    "reuses the source palette, giflib.go parity)")
        elif self.output_format != ".webp":
            return None, None
        elif not (A.is_gif(buf) or A.is_webp(buf) or A.is_avif(buf)):
            return None, None
        else:
            d = A.new_decoder(buf)
            if not d.header().is_animated():
                return None, d
        if self._anim_pipe is None:
            self._anim_pipe = AnimatedTranscodePipeline(
                self.dst_w, self.dst_h, output_format=self.output_format,
                fit=True, encode_options=self.encode_options,
                mesh=self.mesh)
        return self._anim_pipe, None

    def _pipe_for(self, buf: bytes) -> "_ServingPipelineBase":
        from . import api as A
        from .utils.metrics import metrics
        anim, d0 = self._animated_route(buf)
        if anim is not None:
            return anim
        if A.is_jpeg(buf):
            info = J.JpegDecoder(buf)._info
            key = (geometry_of(info), int(J.exif_orientation(buf)))

            def builder() -> "_ServingPipelineBase":
                mode = (self.chroma_mode
                        if (self.chroma_mode == "direct"
                            and JpegTranscodePipeline.direct_eligible(
                                geometry_of(info),
                                int(J.exif_orientation(buf)),
                                self.dst_w, self.dst_h, self.method))
                        else "rgb")
                kw = dict(quality=self.quality, method=self.method,
                          chroma_mode=mode,
                          dct_scale=self.dct_scale if mode == "direct" else 1,
                          output_format=self.output_format,
                          encode_options=self.encode_options)
                if self.mesh is not None:
                    from .parallel.serving import ShardedJpegPipeline
                    return ShardedJpegPipeline(
                        buf, self.dst_w, self.dst_h, mesh=self.mesh, **kw)
                return JpegTranscodePipeline(
                    buf, self.dst_w, self.dst_h, **kw)
        else:
            # non-JPEG stills: pixel-domain pipelines keyed by (format,
            # dims, channel layout, orientation) — a JPEG key is a
            # (JpegGeometry, int) 2-tuple so the key spaces never collide
            d = d0 if d0 is not None else A.new_decoder(buf)
            hdr = d.header()
            key = ("still", type(d).__name__, int(hdr.width),
                   int(hdr.height), int(hdr.channels),
                   int(hdr.orientation))

            def builder() -> "_ServingPipelineBase":
                kw = dict(quality=self.quality, method=self.method,
                          output_format=self.output_format,
                          encode_options=self.encode_options)
                if self.mesh is not None:
                    from .parallel.serving import ShardedStillPipeline
                    return ShardedStillPipeline(
                        buf, self.dst_w, self.dst_h, mesh=self.mesh, **kw)
                return StillTranscodePipeline(
                    buf, self.dst_w, self.dst_h, **kw)
        pipe = self._pipes.get(key)
        if pipe is None:
            metrics.incr("serving.geometry_compiles")
            # construct BEFORE evicting: a rejected source (exotic
            # subsampling, distinct chroma tables) must not cost a hot
            # geometry its compiled program
            pipe = builder()
            if len(self._pipes) >= self.max_geometries:
                # LRU eviction: a hot geometry must not lose its compiled
                # program to an early arrival (round-1 VERDICT weak #5);
                # surfaced in metrics so an undersized max_geometries is
                # visible in production instead of silent recompiles
                self._pipes.popitem(last=False)
                metrics.incr("serving.geometry_evictions")
        else:
            self._pipes.pop(key)
            metrics.incr("serving.geometry_hits")
        self._pipes[key] = pipe  # most-recently-used position
        return pipe

    def stats(self) -> dict:
        """Serving-cache observability: current size + the process-global
        compile/hit/eviction counters (utils.metrics registry)."""
        from .utils.metrics import metrics
        snap = metrics.snapshot()["counters"]
        return {
            "geometries_cached": len(self._pipes),
            "max_geometries": self.max_geometries,
            "compiles": int(snap.get("serving.geometry_compiles", 0)),
            "hits": int(snap.get("serving.geometry_hits", 0)),
            "evictions": int(snap.get("serving.geometry_evictions", 0)),
        }

    def warm(self, specs, anim_lane_buckets=None) -> dict:
        """Pre-compile pipelines for an expected geometry set BEFORE
        traffic arrives (reference analog: NewImageOps preallocates all
        buffers up front, ops.go:62-94). Each spec is either a sample
        image (bytes, any supported format), a JPEG geometry tuple
        (width, height[, subsampling[, gray]]) with subsampling in
        {'420','422','440','444'} (default '420') warmed via a
        synthesized zero-coefficient JPEG, or a still-format tuple
        ('png'|'webp', width, height[, channels]) warmed via a
        synthesized zero-pixel still of that exact signature.
        Combined with the persistent compilation cache wired in
        lilliput_tpu.__init__, a RESTARTED process re-warms the same set
        without compiling any new XLA program (gated in
        tests/test_pipeline.py::test_warm_persistent_cache_cold_start).

        Animated specs warm EVERY lane bucket of the cross-animation
        batch path by default (the batch programs compile per (canvas,
        frame-bucket, ANIM-LANE-bucket, dst), so a bucket-8 group
        arriving first would otherwise eat a serving-path compile —
        VERDICT r3). Pass anim_lane_buckets=(1, 2, 8) to warm a subset
        (1 = the per-animation singleton programs).

        Returns {"warmed": n, "compiled_new": n_new, "seconds": s}."""
        import time as _time
        specs = list(specs)
        if len(specs) > self.max_geometries:
            raise ValueError(
                f"warm set of {len(specs)} geometries exceeds "
                f"max_geometries={self.max_geometries}: earlier entries "
                "would be LRU-evicted during warming — raise "
                "max_geometries to cover the expected set")
        if anim_lane_buckets is None:
            # the full reachable lane-bucket set: every distinct value
            # _anim_bucket can produce for group sizes up to the chunk cap
            anim_lane_buckets = sorted(
                {1} | {_anim_bucket(k, self.mesh)
                       for k in range(2, _MAX_ANIM_LANES + 1)})
        t0 = _time.time()
        before = len(self._pipes)
        n = 0
        for spec in specs:
            if isinstance(spec, (bytes, bytearray)):
                buf = bytes(spec)
            elif isinstance(spec[0], str):
                buf = _synthetic_still(*spec)
            else:
                buf = J.synthetic_jpeg(*spec)
            pipe = self._pipe_for(bytes(buf))
            if isinstance(pipe, AnimatedTranscodePipeline):
                for b in anim_lane_buckets:
                    pipe.transcode([bytes(buf)] * b)
            else:
                pipe.transcode([bytes(buf)])  # forces the XLA compile now
            n += 1
        return {"warmed": n, "compiled_new": len(self._pipes) - before,
                "seconds": round(_time.time() - t0, 3)}

    def transcode(self, bufs: Sequence[bytes],
                  return_exceptions: bool = False) -> List[bytes]:
        """Group by geometry, batch each group, restore input order.

        Per-item failures are ISOLATED end to end: a buffer that fails
        ROUTING (unrecognized format, unsupported subsampling, header
        parse failure — anything _pipe_for raises) or fails inside its
        group's batch (every group runs with return_exceptions=True, the
        per-front isolation contract) affects only its own slot. With
        return_exceptions=True failing slots hold the exceptions; with
        the default False the first failure re-raises after every healthy
        item finished."""
        from .utils import metrics
        groups = {}
        errors: Dict[int, Exception] = {}
        routing_failures = 0
        for i, buf in enumerate(bufs):
            try:
                pipe = self._pipe_for(buf)
            except Exception as e:  # noqa: BLE001 — isolate per item
                errors[i] = e
                routing_failures += 1
                continue
            groups.setdefault(id(pipe), (pipe, []))[1].append(i)
        out: List[Optional[bytes]] = [None] * len(bufs)
        for pipe, idxs in groups.values():
            results = pipe.transcode([bufs[i] for i in idxs],
                                     return_exceptions=True)
            for i, r in zip(idxs, results):
                if isinstance(r, Exception):
                    errors[i] = r
                else:
                    out[i] = r
        if routing_failures:
            # group-level isolation already counts its own failures
            metrics.incr("serving.poison_isolated", routing_failures)
        if errors and not return_exceptions:
            raise errors[min(errors)]
        for i, e in errors.items():
            out[i] = e  # type: ignore[assignment]
        return out  # type: ignore[return-value]


@functools.partial(jax.jit, static_argnames=("crop", "dst_w", "dst_h"))
def _anim_crop_resize(frames: jax.Array, crop, dst_w: int, dst_h: int):
    """Fit crop + exact AREA resize of an animation batch as ONE compiled
    dispatch. The eager `R.resize` call it replaces issues ~20 unfused
    per-op dispatches at full canvas size per animation — jitting fuses
    the tap chain and (with the frame-bucketed inputs) compiles once per
    (bucket, canvas, dst) geometry. Numerics are unchanged: the exact-AREA
    guards (_rounded_product / ordered tap sums) hold under fusion by
    construction."""
    if crop is not None:
        left, top, w, h = crop
        frames = frames[..., top:top + h, left:left + w, :]
    return R.resize(frames, dst_w, dst_h, R.AREA)


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
    tiles = _anim_crop_resize(batch, None, tile_w, tile_h)
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


def _webp_anim_inputs(buf: bytes):
    """Host-side assembly for the WebP composite: decode every frame's
    pixels, scatter to canvas shape, pad the frame axis to the bucket.
    Returns (decoder, inputs dict for composite_animation_rgba,
    durations_ms) — the unit transcode_webp_batch stacks over a leading
    animation axis."""
    from .codecs.webp import WebpDecoder, _i32p, _u8

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
        # clamp like GifDecoder._clip_rect: a negative offset reduces the
        # copy extent by the clipped-off margin (min(w, cw-x2) alone
        # would leave the destination wider than the source slice)
        x2, y2 = max(x, 0), max(y, 0)
        w2 = min(w - (x2 - x), cw - x2)
        h2 = min(h - (y2 - y), ch - y2)
        if w2 > 0 and h2 > 0:
            full[y2:y2 + h2, x2:x2 + w2] = px[y2 - y:y2 - y + h2, x2 - x:x2 - x + w2]
            dm[y2:y2 + h2, x2:x2 + w2] = True
        pm = np.zeros((ch, cw), bool)
        if prev_rect is not None:
            px0, py0, pw0, ph0 = prev_rect
            qx, qy = max(px0, 0), max(py0, 0)
            qw = min(pw0 - (qx - px0), cw - qx)
            qh = min(ph0 - (qy - py0), ch - qy)
            if qw > 0 and qh > 0:
                pm[qy:qy + qh, qx:qx + qw] = True
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
    n = len(frames)
    # pad the frame axis to a bucket: same-canvas animations share one
    # compiled composite+resize program (inert frames draw nothing)
    for _ in range(n, P.frame_bucket(n)):
        frames.append(np.zeros((ch, cw, 4), np.uint8))
        drawn.append(np.zeros((ch, cw), bool))
        blends.append(1)
        pdisp.append(0)
        prects.append(np.zeros((ch, cw), bool))
    inputs = dict(frames=np.stack(frames), drawn=np.stack(drawn),
                  blends=np.array(blends, np.int32),
                  pdisp=np.array(pdisp, np.int32), prects=np.stack(prects))
    return dec, inputs, durations


def _webp_emit(dec, host_frames: np.ndarray, durations, encode_options):
    from .codecs.webp import WebpEncoder
    from .framebuffer import Framebuffer

    enc = WebpEncoder(dec)
    for i, dur in enumerate(durations):
        fb = Framebuffer(host_frames[i])
        fb.duration = dur / 1000.0
        enc.encode(fb, encode_options or {})
    return enc.encode(None, encode_options or {})


def transcode_webp(buf: bytes, dst_w: int, dst_h: int, fit: bool = False,
                   encode_options=None) -> bytes:
    """Whole-animation batched WebP transcode (BASELINE config 4 path):
    libwebp frame decode on host, ONE scan-compositing dispatch (alpha
    blend + dispose), ONE batched resize, WebPAnimEncoder on host.
    Byte-identical to the streaming ImageOps path."""
    dec, inp, durations = _webp_anim_inputs(buf)
    cw, ch = dec._w, dec._hgt
    comp = P.composite_animation_rgba(
        jnp.asarray(inp["frames"]), jnp.asarray(inp["drawn"]),
        jnp.asarray(inp["blends"]), jnp.asarray(inp["pdisp"]),
        jnp.asarray(inp["prects"]))
    crop = fit_rect(cw, ch, dst_w, dst_h) if fit else None
    resized = _anim_crop_resize(comp, crop, dst_w, dst_h)
    # one D2H; pad-frame drop on host (compile-free, see batch paths)
    host_frames = np.asarray(resized)[:len(durations)]
    return _webp_emit(dec, host_frames, durations, encode_options)


@functools.partial(jax.jit, static_argnames=("crop", "dst_w", "dst_h"))
def _webp_batch_to_pixels(frames, drawn, blends, pdisp, prects,
                          crop, dst_w: int, dst_h: int):
    """Vmapped composite_animation_rgba + crop + exact AREA resize for a
    BATCH of WebP-class animations (leading axis = animation)."""
    comp = jax.vmap(P.composite_animation_rgba)(
        frames, drawn, blends, pdisp, prects)
    return _anim_crop_resize(comp, crop, dst_w, dst_h)


def transcode_webp_batch(bufs: Sequence[bytes], dst_w: int, dst_h: int,
                         fit: bool = False, encode_options=None,
                         workers: Optional[int] = None,
                         mesh=None) -> List[bytes]:
    """Cross-animation batched WebP transcode (the transcode_gif_batch
    analog for WebP sources): animations grouped by (canvas, frame
    bucket), animation count padded to a bucket, ONE vmapped composite+
    resize program and ONE D2H per group, byte-identical to per-animation
    transcode_webp. Host libwebp decode/encode on a thread pool."""
    n_workers = workers if workers is not None else min(4, os.cpu_count() or 1)
    prepped = _tmap(_webp_anim_inputs, bufs, n_workers)
    groups = _anim_batch_groups(
        prepped, lambda it: (it[0]._w, it[0]._hgt, it[1]["frames"].shape[0]))

    out: List[Optional[bytes]] = [None] * len(bufs)
    for (cw, ch, nb), members in [(k, c) for k, g in groups.items()
                                  for c in _chunk_members(g, mesh)]:
        bb = _anim_bucket(len(members), mesh)
        stack = _stack_group(prepped, members,
                             ("frames", "drawn", "blends", "pdisp",
                              "prects"), bb)
        crop = fit_rect(cw, ch, dst_w, dst_h) if fit else None
        resized = _webp_batch_to_pixels(
            _dp_put(stack["frames"], mesh), _dp_put(stack["drawn"], mesh),
            _dp_put(stack["blends"], mesh), _dp_put(stack["pdisp"], mesh),
            _dp_put(stack["prects"], mesh), crop, dst_w, dst_h)
        # host-side pad-lane drop (compile-free: a device slice is an
        # eager XLA program per distinct member count, defeating warm())
        host_px = np.asarray(resized)[:len(members)]

        def emit(k: int) -> bytes:
            dec, _, durs = prepped[members[k]]
            return _webp_emit(dec, host_px[k], durs, encode_options)

        results = _tmap(emit, range(len(members)), n_workers)
        for k, i in enumerate(members):
            out[i] = results[k]
    return out  # type: ignore[return-value]


def _avif_anim_inputs(buf: bytes):
    """Host-side assembly for AVIF: decode all frames (full-canvas, no
    compositing), pad the frame axis to the bucket. Returns
    (decoder, inputs dict, durations_s)."""
    import contextlib

    from .codecs.avif import AvifDecoder
    from .framebuffer import Framebuffer

    dec = AvifDecoder(buf)
    frames = []
    durations = []
    # Pin the decoder's jnp work (HDR tone map / raw >8-bit path) to the
    # host CPU backend, like StillTranscodePipeline._decode_array: eager
    # per-frame ops on the default (possibly remote) TPU device would
    # serialize the host decode stage through the device link.
    cpu = _host_cpu_device()
    ctx = (jax.default_device(cpu) if cpu is not None
           else contextlib.nullcontext())
    with ctx:
        while True:
            fb = Framebuffer()
            try:
                dec.decode_to(fb)
            except EOFError:
                break
            frames.append(np.asarray(fb.array))
            durations.append(fb.duration)
    if not frames:
        raise DecodingFailedError("avif has no frames")
    arrs = frames
    for _ in range(len(frames), P.frame_bucket(len(frames))):
        arrs.append(np.zeros_like(arrs[0]))  # bucketed compile reuse
    return dec, dict(frames=np.stack(arrs)), durations


def _avif_emit(dec, host_frames: np.ndarray, durations, encode_options,
               file_type: str) -> bytes:
    from .api import new_encoder
    from .framebuffer import Framebuffer

    enc = new_encoder(file_type, dec)
    for i, dur in enumerate(durations):
        fb = Framebuffer(host_frames[i])
        fb.duration = dur
        enc.encode(fb, encode_options or {})
    return enc.encode(None, encode_options or {})


def transcode_avif(buf: bytes, dst_w: int, dst_h: int, fit: bool = False,
                   encode_options=None, file_type: str = ".avif") -> bytes:
    """Whole-animation batched AVIF transcode: AV1 frame decode on host,
    frames stack directly (avis frames are full canvas, no compositing
    needed), ONE batched resize dispatch, then the AVIF/WebP encoder."""
    dec, inp, durations = _avif_anim_inputs(buf)
    batch = jnp.asarray(inp["frames"])
    crop = (fit_rect(batch.shape[2], batch.shape[1], dst_w, dst_h)
            if fit else None)
    resized = _anim_crop_resize(batch, crop, dst_w, dst_h)
    # one D2H; pad-frame drop on host (compile-free, see batch paths)
    host_frames = np.asarray(resized)[:len(durations)]
    return _avif_emit(dec, host_frames, durations, encode_options,
                      file_type)


def transcode_avif_batch(bufs: Sequence[bytes], dst_w: int, dst_h: int,
                         fit: bool = False, encode_options=None,
                         file_type: str = ".avif",
                         workers: Optional[int] = None,
                         mesh=None) -> List[bytes]:
    """Cross-animation batched AVIF transcode: animations grouped by
    (canvas, frame bucket), one crop+resize dispatch and one D2H per
    group (no compositing — avis frames are full canvas), byte-identical
    to per-animation transcode_avif."""
    n_workers = workers if workers is not None else min(4, os.cpu_count() or 1)
    prepped = _tmap(_avif_anim_inputs, bufs, n_workers)
    # key on the FULL frame-stack signature: channels (RGB vs RGBA) and
    # dtype (u8 vs HDR float) must match within a group or np.stack
    # fails / silently promotes
    groups = _anim_batch_groups(
        prepped, lambda it: (it[1]["frames"].shape,
                             str(it[1]["frames"].dtype)))

    out: List[Optional[bytes]] = [None] * len(bufs)
    for ((nb, ch, cw, _c), _dt), members in [
            (k, c) for k, g in groups.items()
            for c in _chunk_members(g, mesh)]:
        bb = _anim_bucket(len(members), mesh)
        stack = _stack_group(prepped, members, ("frames",), bb)
        crop = fit_rect(cw, ch, dst_w, dst_h) if fit else None
        resized = _anim_crop_resize(_dp_put(stack["frames"], mesh), crop,
                                    dst_w, dst_h)
        # host-side pad-lane drop (compile-free: a device slice is an
        # eager XLA program per distinct member count, defeating warm())
        host_px = np.asarray(resized)[:len(members)]

        def emit(k: int) -> bytes:
            dec, _, durs = prepped[members[k]]
            return _avif_emit(dec, host_px[k], durs, encode_options,
                              file_type)

        results = _tmap(emit, range(len(members)), n_workers)
        for k, i in enumerate(members):
            out[i] = results[k]
    return out  # type: ignore[return-value]


def transcode_gif(buf: bytes, dst_w: int, dst_h: int, fit: bool = False,
                  file_type: str = ".gif") -> bytes:
    """Whole-animation batched transcode (BASELINE config 3 path): LZW on
    host, ONE scan-compositing dispatch for all frames (frame axis padded
    to a bucket so same-canvas animations share compiled programs), ONE
    batched resize dispatch, ONE scan-quantization dispatch
    (ops.palette.quantize_animation — bit-identical to the sequential
    per-frame cache emulation), then host LZW/WebP encode.

    Compare ImageOps.transform, which round-trips the device once per frame
    (the reference-shaped streaming API)."""
    from .codecs.gif import GifDecoder, GifEncoder

    dec = GifDecoder(buf)
    frames, metas = dec.decode_animation(pad_frames=-1)
    if not metas:
        raise DecodingFailedError("gif has no frames")
    n = len(metas)
    crop = fit_rect(dec._w, dec._hgt, dst_w, dst_h) if fit else None
    resized = _anim_crop_resize(frames, crop, dst_w, dst_h)

    if file_type == ".webp":
        host_frames = np.asarray(resized)[:n]  # one D2H for all frames
        return _gif_emit_webp(dec, metas, host_frames)

    enc = GifEncoder(dec)
    nb = resized.shape[0]  # bucketed frame count
    plan = _gif_quantize_plan(enc, metas, nb)
    idxs = P.quantize_animation(
        resized, jnp.asarray(plan["palettes"]), jnp.asarray(plan["counts"]),
        jnp.asarray(plan["trans"]), jnp.asarray(plan["clear"]),
        jnp.asarray(plan["use_prev"]))
    idx_np = np.asarray(idxs)[:n]  # one D2H for all frames
    return _gif_emit_frames(enc, metas, plan["plans"], idx_np, dst_w, dst_h)


def _gif_quantize_plan(enc, metas, nb: int) -> dict:
    """Host-side per-frame quantization plans (sequential trans/cache
    state) stacked to the padded frame count nb, as quantize_animation
    inputs + the (trans, use_local) pairs the emitter needs."""
    palettes = np.zeros((nb, 256, 3), np.int32)
    counts = np.zeros((nb,), np.int32)
    trans_arr = np.full((nb,), -1, np.int32)
    clear_arr = np.zeros((nb,), bool)
    use_prev_arr = np.zeros((nb,), bool)
    plans = []
    for i, m in enumerate(metas):
        trans, use_local, clear, use_prev = enc._plan_frame(m)
        palettes[i, :m.pal_count] = m.palette[:m.pal_count]
        counts[i] = max(m.pal_count, 1)
        trans_arr[i] = trans
        clear_arr[i] = clear
        use_prev_arr[i] = use_prev
        plans.append((trans, use_local))
    counts[len(metas):] = 1  # inert pad rows: 1-entry palette, no trans
    return dict(palettes=palettes, counts=counts, trans=trans_arr,
                clear=clear_arr, use_prev=use_prev_arr, plans=plans)


def _gif_emit_webp(dec, metas, host_frames: np.ndarray) -> bytes:
    """GIF->WebP emission: one WebPAnimEncoder fed the composited host
    frames with the GIF disposal/blend mapping (shared by transcode_gif
    and the batch path so the byte-identity contract has one source)."""
    from .codecs.webp import WebpEncoder
    from .framebuffer import BlendMethod, DisposeMethod, Framebuffer

    enc = WebpEncoder(dec)
    for i, m in enumerate(metas):
        dec.frame_meta = m
        fb = Framebuffer(host_frames[i])
        fb.duration = m.delay_cs * 10 / 1000.0
        fb.blend = BlendMethod.NO_BLEND
        fb.dispose = (DisposeMethod.DISPOSE_TO_BACKGROUND_COLOR
                      if m.disposal == 2 else DisposeMethod.NO_DISPOSE)
        enc.encode(fb, {})
    return enc.encode(None, {})


def _gif_emit_frames(enc, metas, plans, idx_np: np.ndarray,
                     dst_w: int, dst_h: int) -> bytes:
    for i, m in enumerate(metas):
        trans, use_local = plans[i]
        enc._emit_frame(m, np.ascontiguousarray(idx_np[i]), dst_w, dst_h,
                        trans, use_local)
    return enc.encode(None, {})


@functools.partial(jax.jit, static_argnames=("crop", "dst_w", "dst_h"))
def _gif_batch_to_pixels(idxs, drawn, luts, counts, trans, pdisp, prects,
                         bgs, crop, dst_w: int, dst_h: int):
    """Composite + crop + exact AREA resize for a BATCH of animations
    (leading axis = animation): one compiled program per
    (anim-bucket, frame-bucket, canvas, dst) signature. Per-animation
    results are bitwise identical to the unbatched chain (vmap adds a
    batch dimension to the same ops; the exact-resize tap order and
    rounding guards are elementwise)."""
    comp = jax.vmap(P.composite_animation)(
        idxs, drawn, luts, counts, trans, pdisp, prects, bgs)
    return _anim_crop_resize(comp, crop, dst_w, dst_h)


@jax.jit
def _gif_batch_quantize(resized, palettes, counts, trans, clears, uprevs):
    """Vmapped quantize_animation over the animation axis (the scan-free
    quantizer's sorts/scans batch cleanly)."""
    return jax.vmap(P.quantize_animation)(
        resized, palettes, counts, trans, clears, uprevs)


def _tmap(fn, items, n_workers: int) -> list:
    """Thread-pooled map (the host entropy codecs release the GIL)."""
    if n_workers > 1 and len(items) > 1:
        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(n_workers) as ex:
            return list(ex.map(fn, items))
    return [fn(x) for x in items]


def _anim_batch_groups(prepped, sig_fn):
    """Group prepped animations by device signature, preserving first-seen
    order. Returns OrderedDict[signature, member-index list]."""
    groups: "OrderedDict[Tuple, List[int]]" = OrderedDict()
    for i, item in enumerate(prepped):
        groups.setdefault(sig_fn(item), []).append(i)
    return groups


def _stack_group(prepped, members, names, pad_to: int) -> dict:
    """Stack each named per-animation input over a leading animation axis,
    padding the animation count to pad_to with zeroed (inert) lanes."""
    from .utils.metrics import metrics
    metrics.incr("serving.anim_groups")
    metrics.incr("serving.anim_lanes", len(members))
    metrics.incr("serving.anim_pad_lanes", pad_to - len(members))
    stack = {}
    for name in names:
        arrs = [prepped[i][1][name] for i in members]
        arrs.extend([np.zeros_like(arrs[0])] * (pad_to - len(members)))
        stack[name] = np.stack(arrs)
    return stack


#: cross-animation batch lane cap: one group's device footprint is
#: proportional to its animation count (composited frames alone are
#: ~30 MB/animation at a 480p canvas x bucket-32), so groups larger than
#: this split into chunks — the per-animation path's bounded-memory
#: property, kept at batch granularity
_MAX_ANIM_LANES = 32


def _anim_bucket(n_members: int, mesh) -> int:
    """Animation-count bucket, rounded up to a multiple of the mesh's dp
    size so the animation axis shards evenly."""
    bb = P.frame_bucket(n_members)
    if mesh is not None:
        dp = mesh.shape["dp"]
        bb = -(-bb // dp) * dp
    return bb


def _chunk_members(members, mesh):
    """Split a group's member list into device-memory-bounded chunks of
    at most _MAX_ANIM_LANES animations (rounded to a dp multiple so
    sharded chunks keep even lanes)."""
    cap = _MAX_ANIM_LANES
    if mesh is not None:
        dp = mesh.shape["dp"]
        cap = max(dp, (cap // dp) * dp)
    return [members[i:i + cap] for i in range(0, len(members), cap)]


def _dp_put(arr, mesh):
    """Device placement for a stacked animation input: dp-sharded over
    the leading (animation) axis when a mesh is given — animations are
    independent, so dp sharding is byte-identical to single-chip — else
    a plain transfer."""
    if mesh is None:
        return jnp.asarray(arr)
    from jax.sharding import NamedSharding, PartitionSpec
    return jax.device_put(np.ascontiguousarray(arr),
                          NamedSharding(mesh, PartitionSpec("dp")))


def transcode_gif_batch(bufs: Sequence[bytes], dst_w: int, dst_h: int,
                        fit: bool = False, file_type: str = ".gif",
                        workers: Optional[int] = None,
                        mesh=None) -> List[bytes]:
    """Whole-animation batched transcode of MANY GIFs with shared device
    dispatches — the cross-animation extension of transcode_gif for
    avatar-resize-class serving (many small animations, where per-
    animation dispatch overhead dominates the device work).

    Animations are grouped by (canvas, frame bucket); each group pads its
    animation count to ops.palette.frame_bucket and runs ONE composite+
    resize (+quantize for .gif output) program over a (B, N, H, W, ...)
    stack. Outputs are byte-identical to per-animation transcode_gif
    (asserted in tests): the vmapped chain applies the same exact ops per
    animation, and the host LZW encode is per-animation regardless.

    Host LZW decode/encode and the input assembly run on a thread pool
    (the C++ codec releases the GIL)."""
    from .codecs.gif import GifDecoder, GifEncoder

    if file_type not in (".gif", ".webp"):
        raise DecodingFailedError(
            f"GIF batch transcode encodes to .gif/.webp, not {file_type}")

    n_workers = workers if workers is not None else min(4, os.cpu_count() or 1)

    def prep(buf: bytes):
        dec = GifDecoder(buf)
        inp, metas = dec.animation_inputs(pad_frames=-1)
        if not metas:
            raise DecodingFailedError("gif has no frames")
        return dec, inp, metas

    prepped = _tmap(prep, bufs, n_workers)
    groups = _anim_batch_groups(
        prepped, lambda it: (it[0]._w, it[0]._hgt, it[1]["idxs"].shape[0]))

    out: List[Optional[bytes]] = [None] * len(bufs)
    for (cw, ch, nb), members in [(k, c) for k, g in groups.items()
                                  for c in _chunk_members(g, mesh)]:
        bb = _anim_bucket(len(members), mesh)  # animation-count bucket
        stack = _stack_group(prepped, members,
                             ("idxs", "drawn", "luts", "counts", "trans",
                              "pdisp", "prects", "bg_bgra"), bb)
        crop = fit_rect(cw, ch, dst_w, dst_h) if fit else None
        resized = _gif_batch_to_pixels(
            _dp_put(stack["idxs"], mesh), _dp_put(stack["drawn"], mesh),
            _dp_put(stack["luts"], mesh), _dp_put(stack["counts"], mesh),
            _dp_put(stack["trans"], mesh), _dp_put(stack["pdisp"], mesh),
            _dp_put(stack["prects"], mesh), _dp_put(stack["bg_bgra"], mesh),
            crop, dst_w, dst_h)

        if file_type == ".webp":
            # fetch the whole bucket and drop pad lanes on HOST: a device
            # slice is an eager XLA program per distinct member count,
            # which defeats warm()'s zero-compiles-after-warm contract;
            # the pad lanes are dst-sized (mean ~17% extra D2H)
            host_px = np.asarray(resized)[:len(members)]

            def emit_webp(k: int) -> bytes:
                dec, _, metas = prepped[members[k]]
                return _gif_emit_webp(dec, metas, host_px[k])

            emitters = emit_webp
        else:
            # per-animation host plans, stacked for the vmapped quantizer
            encs, plans_list = [], []
            pal_s = np.zeros((bb, nb, 256, 3), np.int32)
            cnt_s = np.ones((bb, nb), np.int32)
            tr_s = np.full((bb, nb), -1, np.int32)
            cl_s = np.zeros((bb, nb), bool)
            up_s = np.zeros((bb, nb), bool)
            for k, i in enumerate(members):
                dec, _, metas = prepped[i]
                enc = GifEncoder(dec)
                plan = _gif_quantize_plan(enc, metas, nb)
                encs.append(enc)
                plans_list.append(plan["plans"])
                pal_s[k], cnt_s[k] = plan["palettes"], plan["counts"]
                tr_s[k], cl_s[k], up_s[k] = (plan["trans"], plan["clear"],
                                             plan["use_prev"])
            idxs = _gif_batch_quantize(
                resized, _dp_put(pal_s, mesh), _dp_put(cnt_s, mesh),
                _dp_put(tr_s, mesh), _dp_put(cl_s, mesh),
                _dp_put(up_s, mesh))
            # host-side pad-lane drop (see the .webp branch note)
            idx_np = np.asarray(idxs)[:len(members)]

            def emit_gif(k: int) -> bytes:
                i = members[k]
                _, _, metas = prepped[i]
                return _gif_emit_frames(encs[k], metas, plans_list[k],
                                        idx_np[k], dst_w, dst_h)

            emitters = emit_gif

        results = _tmap(emitters, range(len(members)), n_workers)
        for k, i in enumerate(members):
            out[i] = results[k]
    return out  # type: ignore[return-value]
