"""Host-side (numpy) coefficient tables for OpenCV-compatible resize.

These tables replicate the coefficient generation of OpenCV's ``cv::resize``
(the resize the reference wraps at /root/reference/opencv.cpp:190-202 and uses
for every ``Fit``/``ResizeTo`` at /root/reference/opencv.go:284-364) so the
device kernels in ``resize.py`` can be bit-exact:

* INTER_LINEAR (8U): fixed-point Q11 coefficients (``INTER_RESIZE_COEF_BITS=11``),
  computed in float32 and rounded half-to-even exactly like
  ``saturate_cast<short>(cbuf*2048)``.
* INTER_AREA upscale: same linear kernel but with OpenCV's area-specific
  source-coordinate rule ``fx = (dx+1) - (sx+1)*inv_scale``.
* INTER_AREA fractional downscale: the decimation tables of ``resizeArea_``
  (float32 weights, per-output variable tap count, padded to a static K).
* INTER_CUBIC: float32 Catmull-Rom-style coefficients with A=-0.75
  (``interpolateCubic``), kept in float32 — matches OpenCV 5.x bit-exactly.

Tables are computed once per (src,dst) pair on the host in numpy and become
compile-time constants of the jitted device functions.
"""

from __future__ import annotations

import functools

import numpy as np

INTER_RESIZE_COEF_BITS = 11
INTER_RESIZE_COEF_SCALE = 1 << INTER_RESIZE_COEF_BITS  # 2048
CUBIC_A = np.float32(-0.75)


def _rint32(x: np.ndarray) -> np.ndarray:
    """cvRound: round half to even (matches SSE cvtss2si)."""
    return np.rint(x).astype(np.int32)


@functools.lru_cache(maxsize=4096)
def linear_tables(src: int, dst: int, area_mode: bool = False):
    """Per-output (sx, a0, a1) for fixed-point bilinear.

    a0/a1 are Q11 int32; sx is the left tap, right tap is min(sx+1, src-1).
    area_mode selects the INTER_AREA-upscale coordinate rule.
    """
    if src == 1:
        sx = np.zeros(dst, np.int32)
        return sx, np.full(dst, INTER_RESIZE_COEF_SCALE, np.int32), np.zeros(dst, np.int32)
    scale = np.float64(src) / dst
    inv_scale = np.float64(dst) / src
    sx = np.empty(dst, np.int32)
    fx = np.empty(dst, np.float32)
    for dx in range(dst):
        # Coordinates are computed in double and reduced to the fractional
        # part before narrowing to float32 (cv::resize does the same; an
        # early narrow loses fraction bits for large source indices).
        if area_mode:
            s = int(np.floor(dx * scale))
            fd = np.float64((dx + 1) - (s + 1) * inv_scale)
            f = np.float32(0) if fd <= 0 else np.float32(fd - np.floor(fd))
        else:
            fd = np.float64((dx + 0.5) * scale - 0.5)
            s = int(np.floor(fd))
            f = np.float32(fd - s)
        if s < 0:
            s, f = 0, np.float32(0)
        if s >= src - 1:
            s, f = src - 2, np.float32(1)
        sx[dx], fx[dx] = s, f
    a0 = _rint32((np.float32(1.0) - fx) * np.float32(INTER_RESIZE_COEF_SCALE))
    a1 = _rint32(fx * np.float32(INTER_RESIZE_COEF_SCALE))
    return sx, a0, a1


@functools.lru_cache(maxsize=4096)
def linear_tables_f32(src: int, dst: int, area_mode: bool = False):
    """Float32 (sx, a0, a1) for the float pixel-type bilinear path."""
    sx, a0, a1 = linear_tables(src, dst, area_mode)
    inv = np.float32(1.0 / INTER_RESIZE_COEF_SCALE)
    return sx, a0.astype(np.float32) * inv, a1.astype(np.float32) * inv


@functools.lru_cache(maxsize=4096)
def cubic_tables(src: int, dst: int):
    """Per-output 4-tap (idx[dst,4] int32, w[dst,4] float32) bicubic tables."""
    one = np.float32(1)
    A = CUBIC_A
    scale = np.float64(src) / dst
    idx = np.empty((dst, 4), np.int32)
    w = np.empty((dst, 4), np.float32)
    for dx in range(dst):
        fd = np.float64((dx + 0.5) * scale - 0.5)
        s = int(np.floor(fd))
        x = np.float32(fd - s)
        c0 = ((A * (x + one) - np.float32(5) * A) * (x + one) + np.float32(8) * A) * (x + one) - np.float32(4) * A
        c1 = ((A + np.float32(2)) * x - (A + np.float32(3))) * x * x + one
        c2 = ((A + np.float32(2)) * (one - x) - (A + np.float32(3))) * (one - x) * (one - x) + one
        c3 = one - c0 - c1 - c2
        for k, c in enumerate((c0, c1, c2, c3)):
            idx[dx, k] = min(max(s - 1 + k, 0), src - 1)
            w[dx, k] = c
    return idx, w


@functools.lru_cache(maxsize=4096)
def area_tables(src: int, dst: int):
    """Decimation tables for fractional INTER_AREA downscale.

    Returns (idx[dst,K] int32, w[dst,K] float32) padded with zero weights.
    Weight values and tap ORDER match OpenCV's xi table generation, so a
    sequential float32 accumulation over k reproduces cv::resize bit-exactly.
    """
    scale = np.float64(src) / dst
    rows = []
    for dx in range(dst):
        fsx1 = dx * scale
        fsx2 = fsx1 + scale
        cellw = min(scale, src - fsx1)
        sx1 = int(np.ceil(fsx1))
        sx2 = min(int(np.floor(fsx2)), src - 1)
        taps = []
        if sx1 - fsx1 > 1e-3:
            taps.append((sx1 - 1, np.float32((sx1 - fsx1) / cellw)))
        for sx in range(sx1, sx2):
            taps.append((sx, np.float32(1.0 / cellw)))
        if fsx2 - sx2 > 1e-3:
            taps.append((sx2, np.float32(min(min(fsx2 - sx2, 1.0), cellw) / cellw)))
        rows.append(taps)
    K = max(len(t) for t in rows)
    idx = np.zeros((dst, K), np.int32)
    w = np.zeros((dst, K), np.float32)
    for dx, taps in enumerate(rows):
        for k, (sx, a) in enumerate(taps):
            idx[dx, k] = sx
            w[dx, k] = a
    return idx, w


def area_is_fast(src_w: int, src_h: int, dst_w: int, dst_h: int) -> bool:
    """True when both scale factors are exact integers (ResizeAreaFast path)."""
    if dst_w == 0 or dst_h == 0:
        return False
    return src_w % dst_w == 0 and src_h % dst_h == 0 and src_w >= dst_w and src_h >= dst_h
