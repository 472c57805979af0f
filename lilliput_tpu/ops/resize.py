"""OpenCV-compatible resize on device (JAX/XLA, TPU-first).

Replaces the reference's ``cv::resize`` calls (``opencv_mat_resize``,
/root/reference/opencv.cpp:190-202; used by ``Framebuffer.ResizeTo``/``Fit``
at /root/reference/opencv.go:284-364 — always INTER_AREA in production).

Bit-exactness contract (validated in tests/test_resize_exact.py against cv2):

* INTER_AREA — bit-exact for all sizes (integer fast path, fractional
  decimation path, and the upscale->bilinear fallback with area coordinates).
* INTER_LINEAR — bit-exact for ALL sizes (Q11 fixed-point with cv::resize's
  exact coordinate rules: coordinates narrowed to float32 before cvFloor,
  x-axis edge coefficients clamped, y-axis fractions kept with row indices
  clipped at the gather).
* INTER_CUBIC (8U) — bit-exact vs OpenCV's PORTABLE scalar fixed-point
  kernel (Q11 coefficients, int32 accumulation, FixedPtCast rounding); ±1
  vs any particular cv2 binary, whose SIMD/IPP kernels are build-dependent
  and disagree with each other (see _cubic_u8's docstring). Float inputs
  use the float32 separable path (<=1 ulp of cv2).

All entry points accept arbitrary leading batch dims: ``(..., H, W, C)``.
uint8 images use the integer/float paths above; floating images use float32
arithmetic with the same taps (no final rounding).

The ops are pure XLA: gathers along one axis plus elementwise multiply-adds,
which XLA/TPU fuses into a handful of vectorized loops over VMEM tiles. The
separable structure (H-pass then V-pass) keeps the working set linear in the
image rather than quadratic in taps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import resize_tables as T

AREA = "area"
LINEAR = "linear"
CUBIC = "cubic"


def _take_w(img, idx):
    return jnp.take(img, idx, axis=-2)


def _take_h(img, idx):
    return jnp.take(img, idx, axis=-3)


# ---------------------------------------------------------------------------
# INTER_LINEAR (fixed-point Q11, 8U) — OpenCV 4.x classic kernel
# ---------------------------------------------------------------------------

def _linear_u8(img, dst_w: int, dst_h: int, area_mode: bool):
    src_h, src_w = img.shape[-3], img.shape[-2]
    # x: clamped edge coefficients; y: true fractions, row indices clipped
    # (cv::resize treats the two axes differently — see T._linear_coords).
    sx, ax0, ax1 = T.linear_tables(src_w, dst_w, area_mode, clamp=True)
    sy, ay0, ay1 = T.linear_tables(src_h, dst_h, area_mode, clamp=False)
    sx_r = np.minimum(sx + 1, src_w - 1)
    sy0 = np.clip(sy, 0, src_h - 1)
    sy1 = np.clip(sy + 1, 0, src_h - 1)

    s = img.astype(jnp.int32)
    a0 = jnp.asarray(ax0)[:, None]
    a1 = jnp.asarray(ax1)[:, None]
    h = _take_w(s, jnp.asarray(sx)) * a0 + _take_w(s, jnp.asarray(sx_r)) * a1

    b0 = jnp.asarray(ay0)[:, None, None]
    b1 = jnp.asarray(ay1)[:, None, None]
    s0 = _take_h(h, jnp.asarray(sy0))
    s1 = _take_h(h, jnp.asarray(sy1))
    # VResizeLinear 8U specialization:
    #   uchar((((b0*(S0>>4))>>16) + ((b1*(S1>>4))>>16) + 2) >> 2)
    out = (((b0 * (s0 >> 4)) >> 16) + ((b1 * (s1 >> 4)) >> 16) + 2) >> 2
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


def _linear_f32(img, dst_w: int, dst_h: int, area_mode: bool):
    src_h, src_w = img.shape[-3], img.shape[-2]
    sx, ax0, ax1 = T.linear_tables_f32(src_w, dst_w, area_mode, clamp=True)
    sy, ay0, ay1 = T.linear_tables_f32(src_h, dst_h, area_mode, clamp=False)
    sy0 = np.clip(sy, 0, src_h - 1)
    sy1 = np.clip(sy + 1, 0, src_h - 1)
    s = img.astype(jnp.float32)
    h = (_take_w(s, jnp.asarray(sx)) * jnp.asarray(ax0)[:, None]
         + _take_w(s, jnp.asarray(np.minimum(sx + 1, src_w - 1))) * jnp.asarray(ax1)[:, None])
    out = (_take_h(h, jnp.asarray(sy0)) * jnp.asarray(ay0)[:, None, None]
           + _take_h(h, jnp.asarray(sy1)) * jnp.asarray(ay1)[:, None, None])
    return out


# ---------------------------------------------------------------------------
# INTER_CUBIC (pure float32 separable)
# ---------------------------------------------------------------------------

def _cubic(img, dst_w: int, dst_h: int):
    src_h, src_w = img.shape[-3], img.shape[-2]
    xi, xw = T.cubic_tables(src_w, dst_w)
    yi, yw = T.cubic_tables(src_h, dst_h)
    s = img.astype(jnp.float32)

    def pass_(arr, idx, w, take):
        t = [take(arr, jnp.asarray(idx[:, k])) * jnp.asarray(w[:, k])[:, None] for k in range(4)]
        return (t[0] + t[1]) + (t[2] + t[3])

    h = pass_(s, xi, xw, lambda a, i: _take_w(a, i))
    out = pass_(h, yi, yw[:, :, None], lambda a, i: _take_h(a, i))
    return out


def _cubic_u8(img, dst_w: int, dst_h: int):
    """OpenCV's PORTABLE scalar fixed-point 8U cubic, implemented exactly.

    Q11 coefficients both passes (resize_tables.cubic_tables_q11), int32
    accumulation with two's-complement wrap (matching C), and the final
    ``FixedPtCast<int,uchar,22>``: ``(acc + (1<<21)) >> 22`` saturated.

    Why this target and not "whatever cv2 outputs": a single cv::resize
    call mixes THREE arithmetics along one row — IPP's polyphase kernel
    (when enabled), the universal-intrinsics float kernel over the SIMD
    body (itself different between SSE/AVX2/NEON builds: FMA contraction),
    and this scalar kernel on the last width%lanes elements. Only the
    scalar kernel is build-independent, so it is the one well-defined
    "OpenCV INTER_CUBIC" — and the reference's own x86 (IPP/AVX) vs arm64
    (NEON) builds already disagree with each other at the same ±1 level.
    tests/test_resize_exact.py pins: bit-equality with this kernel's
    numpy mirror, bit-equality with cv2 on the scalar-tail region (the
    only region where cv2 provably runs it), and ±1 globally vs cv2.
    """
    src_h, src_w = img.shape[-3], img.shape[-2]
    xi, xq = T.cubic_tables_q11(src_w, dst_w)
    yi, yq = T.cubic_tables_q11(src_h, dst_h)
    s = img.astype(jnp.int32)
    h = _take_w(s, jnp.asarray(xi[:, 0])) * jnp.asarray(xq[:, 0])[:, None]
    for k in range(1, 4):
        h = h + _take_w(s, jnp.asarray(xi[:, k])) * jnp.asarray(xq[:, k])[:, None]
    acc = _take_h(h, jnp.asarray(yi[:, 0])) * jnp.asarray(yq[:, 0])[:, None, None]
    for k in range(1, 4):
        acc = acc + _take_h(h, jnp.asarray(yi[:, k])) * jnp.asarray(yq[:, k])[:, None, None]
    out = (acc + (1 << 21)) >> 22
    return jnp.clip(out, 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# INTER_AREA
# ---------------------------------------------------------------------------

def _area_fast_u8(img, dst_w: int, dst_h: int):
    src_h, src_w = img.shape[-3], img.shape[-2]
    fx, fy = src_w // dst_w, src_h // dst_h
    lead = img.shape[:-3]
    c = img.shape[-1]
    v = img.reshape(lead + (dst_h, fy, dst_w, fx, c)).astype(jnp.int32)
    total = v.sum(axis=(-2, -4))
    if fx == 2 and fy == 2:
        out = (total + 2) >> 2  # ResizeAreaFastVec 2x2 specialization
        return jnp.clip(out, 0, 255).astype(jnp.uint8)
    scale = np.float32(1.0 / (fx * fy))
    return jnp.clip(jnp.round(total.astype(jnp.float32) * scale), 0, 255).astype(jnp.uint8)


def _area_fast_f32(img, dst_w: int, dst_h: int):
    src_h, src_w = img.shape[-3], img.shape[-2]
    fx, fy = src_w // dst_w, src_h // dst_h
    lead = img.shape[:-3]
    c = img.shape[-1]
    v = img.reshape(lead + (dst_h, fy, dst_w, fx, c)).astype(jnp.float32)
    return v.sum(axis=(-2, -4)) * np.float32(1.0 / (fx * fy))


def _runtime_zero_bits(x) -> jax.Array:
    """A uint32 zero the compiler cannot constant-fold.

    ``x - x`` is not foldable for floats (it would be wrong for inf/NaN, and
    x here is a traced runtime value), so the result is an opaque runtime 0.
    """
    x0 = x.reshape(-1)[0].astype(jnp.float32)
    return jax.lax.bitcast_convert_type(x0 - x0, jnp.uint32)


def _rounded_product(a, b, zero_bits):
    """fl32(a*b): the product with its own float32 rounding guaranteed.

    XLA:CPU unconditionally contracts mul feeding add into FMA, which skips
    the product rounding cv::resize's scalar code performs, flipping the
    final u8 by 1 on ~1e-5 of pixels. XOR-ing the product's bits with an
    opaque runtime zero is a value no-op that the simplifier cannot remove,
    so the add's operand is no longer a multiply and cannot be contracted.
    (optimization_barrier does not help: constants are folded through it and
    the fusion emitter contracts within a fused computation.)
    """
    p = a * b
    return jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(p, jnp.uint32) ^ zero_bits, jnp.float32)


def _area_general(img, dst_w: int, dst_h: int, round_u8: bool):
    src_h, src_w = img.shape[-3], img.shape[-2]
    xi, xw = T.area_tables(src_w, dst_w)
    yi, yw = T.area_tables(src_h, dst_h)
    s = img.astype(jnp.float32)
    z = _runtime_zero_bits(s)

    # Sequential tap accumulation preserves OpenCV's float32 summation order;
    # _rounded_product preserves its per-product rounding under fusion.
    h = jnp.zeros(s.shape[:-2] + (dst_w, s.shape[-1]), jnp.float32)
    for k in range(xi.shape[1]):
        h = h + _rounded_product(
            _take_w(s, jnp.asarray(xi[:, k])), jnp.asarray(xw[:, k])[:, None], z)
    out = jnp.zeros(h.shape[:-3] + (dst_h,) + h.shape[-2:], jnp.float32)
    for k in range(yi.shape[1]):
        out = out + _rounded_product(
            _take_h(h, jnp.asarray(yi[:, k])), jnp.asarray(yw[:, k])[:, None, None], z)
    if round_u8:
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out


def _area(img, dst_w: int, dst_h: int):
    src_h, src_w = img.shape[-3], img.shape[-2]
    is_u8 = img.dtype == jnp.uint8
    if src_w >= dst_w and src_h >= dst_h:
        if T.area_is_fast(src_w, src_h, dst_w, dst_h):
            return _area_fast_u8(img, dst_w, dst_h) if is_u8 else _area_fast_f32(img, dst_w, dst_h)
        return _area_general(img, dst_w, dst_h, is_u8)
    # cv::resize: INTER_AREA with any upscaling axis falls back to bilinear
    # with the area-specific coordinate rule.
    if is_u8:
        return _linear_u8(img, dst_w, dst_h, area_mode=True)
    return _linear_f32(img, dst_w, dst_h, area_mode=True)


# ---------------------------------------------------------------------------
# Matmul-form AREA resize (MXU path for the fused serving pipeline)
# ---------------------------------------------------------------------------

def _area_axis_matrix(src: int, dst: int,
                      force_linear: bool = False) -> np.ndarray:
    """(dst, src) f32 resampling matrix for one axis with INTER_AREA taps
    (decimation taps when downscaling, area-rule bilinear when upscaling).

    force_linear: cv::resize switches the WHOLE resize to bilinear when
    ANY axis upscales — callers building a mixed up/down geometry must
    pass True for the downscaling axis too, or the matmul path diverges
    from the streaming `_area` by far more than the documented ±1."""
    m = np.zeros((dst, src), np.float32)
    if src >= dst and not force_linear:
        idx, w = T.area_tables(src, dst)
        for d in range(dst):
            for k in range(idx.shape[1]):
                m[d, idx[d, k]] += w[d, k]
    else:
        sx, a0, a1 = T.linear_tables_f32(src, dst, area_mode=True, clamp=True)
        sxr = np.minimum(sx + 1, src - 1)
        for d in range(dst):
            m[d, sx[d]] += a0[d]
            m[d, sxr[d]] += a1[d]
    return m


_BAND_GROUP = 64  # output rows per banded-contraction slab


def _banded_groups(mat: np.ndarray, group: int = _BAND_GROUP):
    """Split a banded (dst, src) axis matrix into per-output-group slabs
    covering only each group's nonzero source window. Returns
    [(src_lo, src_hi, slab)] in output order; None when banding would not
    shrink the contraction (e.g. near-dense matrices)."""
    dst, src = mat.shape
    groups = []
    total = 0
    for g0 in range(0, dst, group):
        rows = mat[g0:min(g0 + group, dst)]
        nz = np.nonzero(rows.any(axis=0))[0]
        lo, hi = int(nz[0]), int(nz[-1]) + 1
        groups.append((lo, hi, np.ascontiguousarray(rows[:, lo:hi])))
        total += (hi - lo) * rows.shape[0]
    if total >= 0.75 * dst * src:
        return None
    return groups


def _banded_contract_eq(s: jax.Array, mat: np.ndarray, axis: int,
                        eq: str) -> jax.Array:
    """Shared banded-slab contraction body: each 64-output-row group reads
    only its ~(scale*64+taps)-row source window, cutting MXU work ~4x at
    serving shapes vs the dense form (same nonzero terms, so the +-1
    contract of resize_area_mxu is unchanged). The einsum equation decides
    channel-minor vs planar layout."""
    groups = _banded_groups(mat)
    if groups is None:
        return jnp.einsum(eq, s, jnp.asarray(mat),
                          preferred_element_type=jnp.float32)
    parts = [jnp.einsum(eq, jax.lax.slice_in_dim(s, lo, hi, axis=axis),
                        jnp.asarray(slab), preferred_element_type=jnp.float32)
             for lo, hi, slab in groups]
    return jnp.concatenate(parts, axis=axis)


def _banded_contract(s: jax.Array, mat: np.ndarray, axis: int) -> jax.Array:
    """Banded contraction of spatial `axis` (-3=h, -2=w) of (..., h, w, c)."""
    eq = "...hwc,Ww->...hWc" if axis == -2 else "...hwc,Hh->...Hwc"
    return _banded_contract_eq(s, mat, axis, eq)


def area_axis_matrix_scaled(src: int, dst: int, scale: float,
                            offset: float) -> np.ndarray:
    """(dst, src) INTER_AREA matrix for a dst grid whose sample d covers the
    source interval [offset + d*scale, offset + (d+1)*scale) — the general-
    position form used by the YCbCr-direct serving mode, where the chroma
    plane is resampled at its native half resolution with a possible half-
    pixel crop offset."""
    m = np.zeros((dst, src), np.float64)
    inv = 1.0 / scale
    for d in range(dst):
        a = offset + d * scale
        b = a + scale
        for k in range(max(int(np.floor(a)), 0),
                       min(int(np.ceil(b)), src)):
            ov = min(b, k + 1.0) - max(a, float(k))
            if ov > 0:
                m[d, k] = ov * inv
    return m.astype(np.float32)


def _mm3_enabled() -> bool:
    """Exact-split bf16 contraction gate (LILLIPUT_RESIZE_MM3=1 to enable).

    DEFAULT OFF — measured a wash on v5e: the 2x MXU-pass reduction is
    eaten by XLA materializing the 3-term partial products before the
    summing slice-adds (full bench A/B: rgb 5200 vs 5125, direct 16.4k vs
    15.8k imgs/s, inside run noise). Kept as an env-gated, property-tested
    path for re-evaluation on compilers that fuse the reduction."""
    import os
    return os.environ.get("LILLIPUT_RESIZE_MM3") in ("1", "true", "on")


def _mat3_stack(mat: np.ndarray):
    """EXACT 3-term bf16 decomposition of an f32 matrix, stacked along the
    dst axis: (3*dst, src) with hi+mid+lo == mat elementwise (an f32 has 24
    significand bits = three disjoint 8-bit bf16 slices). Returns None when
    the split is not exact (subnormal/overflow corner)."""
    import ml_dtypes
    m = np.ascontiguousarray(mat, dtype=np.float32)
    hi = m.astype(ml_dtypes.bfloat16).astype(np.float32)
    mid = (m - hi).astype(ml_dtypes.bfloat16).astype(np.float32)
    lo = (m - hi - mid).astype(ml_dtypes.bfloat16).astype(np.float32)
    if not np.array_equal(hi + mid + lo, m):
        return None
    return np.concatenate([hi, mid, lo], axis=0)


def _mm3_w_contract(s: jax.Array, slab: np.ndarray) -> jax.Array:
    """(..., h, K) plane holding EXACT u8 values x (g, K) f32 slab -> f32,
    in 3 native-bf16 MXU passes instead of HIGHEST's 6: the operand is
    bit-exact in bf16 (integers 0..255), the slab splits exactly into three
    bf16 terms (_mat3_stack), and every partial product is exact in the f32
    accumulator — the only difference vs the f32 einsum is summation order,
    which the serving tail's +-1 contract already covers (the HIGHEST
    emulation reassociates too)."""
    m3 = _mat3_stack(slab)
    if m3 is None:
        return jnp.einsum("...hw,Ww->...hW", s.astype(jnp.float32),
                          jnp.asarray(slab),
                          preferred_element_type=jnp.float32)
    g = slab.shape[0]
    p3 = jnp.einsum("...hw,Ww->...hW", s.astype(jnp.bfloat16),
                    jnp.asarray(m3, dtype=jnp.bfloat16),
                    precision=jax.lax.Precision.DEFAULT,
                    preferred_element_type=jnp.float32)
    return p3[..., :g] + p3[..., g:2 * g] + p3[..., 2 * g:]


def resize_area_plane_mat(plane: jax.Array, mat_w: np.ndarray,
                          mat_h: np.ndarray) -> jax.Array:
    """Contract a (..., H, W) plane holding EXACT u8 values (u8/bf16/f32
    storage) with explicit per-axis AREA matrices (banded when profitable).

    With LILLIPUT_RESIZE_MM3=1 the W (first) contraction runs as exact-
    split bf16 passes (_mm3_w_contract — off by default, see _mm3_enabled);
    the H pass input is a general f32 intermediate and stays at HIGHEST."""
    if _mm3_enabled():
        # fail fast on operands whose bf16 cast could be lossy: only u8 and
        # bf16 storage PROVE the exact-u8-values precondition; an arbitrary
        # f32 plane would silently truncate in the cast (callers with
        # integral f32 planes cast to uint8 first)
        if plane.dtype not in (jnp.uint8, jnp.bfloat16):
            raise TypeError(
                "mm3 resize path needs a uint8/bfloat16 plane (exact-u8 "
                f"values), got {plane.dtype}")
        groups = _banded_groups(mat_w)
        if groups is None:
            out = _mm3_w_contract(plane, mat_w)
        else:
            out = jnp.concatenate(
                [_mm3_w_contract(jax.lax.slice_in_dim(plane, lo, hi, axis=-1),
                                 slab) for lo, hi, slab in groups], axis=-1)
    else:
        out = _banded_plane_contract(plane.astype(jnp.float32), mat_w,
                                     axis=-1)
    return _banded_plane_contract(out, mat_h, axis=-2)


def _banded_plane_contract(s: jax.Array, mat: np.ndarray,
                           axis: int) -> jax.Array:
    """Banded contraction of `axis` (-2=h, -1=w) of a (..., h, w) plane."""
    eq = "...hw,Ww->...hW" if axis == -1 else "...hw,Hh->...Hw"
    return _banded_contract_eq(s, mat, axis, eq)


def _fused_exact_enabled() -> bool:
    """LILLIPUT_FUSED_EXACT=1 switches the fused serving tails from the
    embedded-matrix AREA contraction (±1 u8 vs streaming, f32
    reassociation) to the sequential-tap form below, which reproduces the
    STREAMING path's (cv2's) f32 tap order exactly — promoting
    fused-vs-streaming to BYTE-IDENTICAL. Default decided by the on-chip
    A/B (VERDICT r4 #6); see BASELINE.md."""
    import os
    return os.environ.get("LILLIPUT_FUSED_EXACT", "0") not in (
        "0", "false", "off")


def _sel_matrix(dst: int, src: int, idx: np.ndarray) -> np.ndarray:
    m = np.zeros((dst, src), np.float32)
    m[np.arange(dst), idx] = 1.0
    return m


def resize_area_window_exact(plane: jax.Array, off_x: int, w: int,
                             dst_w: int, off_y: int, h: int, dst_h: int):
    """Sequential-tap INTER_AREA of the crop [off_y:off_y+h,
    off_x:off_x+w) of a (..., H, W) plane, bit-identical to cropping then
    running the STREAMING `resize` (and therefore to cv2): same f32 tap
    ORDER, same per-product rounding (_rounded_product), with the
    streaming path's gathers turned into exact 0/1 selection dots (each
    output element is a single copied product, so the dot introduces no
    rounding and MXU-serializing gathers never appear). Integer-ratio
    geometries use 0/1 summing dots (exact integer totals < 2^24 in f32,
    order-free) plus the streaming path's own scale/round form.

    Returns (..., dst_h, dst_w) f32 whose clip(round(.)) equals the
    streaming u8 output, or None when an axis upscales (the
    embedded-matrix form keeps its documented ±1 tier there)."""
    if w < dst_w or h < dst_h:
        return None
    W, H = plane.shape[-1], plane.shape[-2]
    s = plane.astype(jnp.float32)
    if T.area_is_fast(w, h, dst_w, dst_h):
        fx, fy = w // dst_w, h // dst_h
        if fx * fy * 255 >= 1 << 24:
            # block totals past 2^24 stop being exact in the f32 summing
            # dots (fx*fy >= 65794, a >256x decimation both axes) — the
            # byte-identity promise can't hold, decline to the ±1 form
            return None
        mx = np.zeros((dst_w, W), np.float32)
        my = np.zeros((dst_h, H), np.float32)
        for d in range(dst_w):
            mx[d, off_x + d * fx:off_x + (d + 1) * fx] = 1.0
        for e in range(dst_h):
            my[e, off_y + e * fy:off_y + (e + 1) * fy] = 1.0
        tot = _banded_plane_contract(
            _banded_plane_contract(s, mx, axis=-1), my, axis=-2)
        if fx == 2 and fy == 2:
            # streaming: (total + 2) >> 2 (round-half-up); emit the final
            # integer so the caller's round() is a no-op
            return jnp.floor((tot + 2.0) * np.float32(0.25))
        return tot * np.float32(1.0 / (fx * fy))
    xi, xw = T.area_tables(w, dst_w)
    yi, yw = T.area_tables(h, dst_h)
    z = _runtime_zero_bits(s)
    acc = None
    for k in range(xi.shape[1]):
        t = _banded_plane_contract(
            s, _sel_matrix(dst_w, W, off_x + xi[:, k]), axis=-1)
        p = _rounded_product(t, jnp.asarray(xw[:, k]), z)
        acc = p if acc is None else acc + p
    out = None
    for k in range(yi.shape[1]):
        t = _banded_plane_contract(
            acc, _sel_matrix(dst_h, H, off_y + yi[:, k]), axis=-2)
        p = _rounded_product(t, jnp.asarray(yw[:, k])[:, None], z)
        out = p if out is None else out + p
    return out


def resize_area_exact(img: jax.Array, dst_w: int, dst_h: int):
    """Interleaved (..., H, W, C) counterpart of resize_area_window_exact
    (no crop embedding — callers pass the cropped array, like the
    streaming path): byte-identical to `resize(img, ..., AREA)` for
    downscales, selection dots instead of gathers. None on upscale."""
    src_h, src_w = img.shape[-3], img.shape[-2]
    if src_w < dst_w or src_h < dst_h:
        return None
    s = img.astype(jnp.float32)
    if T.area_is_fast(src_w, src_h, dst_w, dst_h):
        fx, fy = src_w // dst_w, src_h // dst_h
        if fx * fy * 255 >= 1 << 24:   # see resize_area_window_exact
            return None
        mx = np.zeros((dst_w, src_w), np.float32)
        my = np.zeros((dst_h, src_h), np.float32)
        for d in range(dst_w):
            mx[d, d * fx:(d + 1) * fx] = 1.0
        for e in range(dst_h):
            my[e, e * fy:(e + 1) * fy] = 1.0
        tot = _banded_contract(_banded_contract(s, mx, axis=-2), my,
                               axis=-3)
        if fx == 2 and fy == 2:
            return jnp.floor((tot + 2.0) * np.float32(0.25))
        return tot * np.float32(1.0 / (fx * fy))
    xi, xw = T.area_tables(src_w, dst_w)
    yi, yw = T.area_tables(src_h, dst_h)
    z = _runtime_zero_bits(s)
    acc = None
    for k in range(xi.shape[1]):
        t = _banded_contract(s, _sel_matrix(dst_w, src_w, xi[:, k]),
                             axis=-2)
        p = _rounded_product(t, jnp.asarray(xw[:, k])[:, None], z)
        acc = p if acc is None else acc + p
    out = None
    for k in range(yi.shape[1]):
        t = _banded_contract(acc, _sel_matrix(dst_h, src_h, yi[:, k]),
                             axis=-3)
        p = _rounded_product(t, jnp.asarray(yw[:, k])[:, None, None], z)
        out = p if out is None else out + p
    return out


def resize_linear_window_exact_u8(plane: jax.Array, off_x: int, w: int,
                                  dst_w: int, off_y: int, h: int,
                                  dst_h: int) -> jax.Array:
    """Crop-embedded INTER_AREA *upscale* (cv::resize: any upscaling axis
    switches the WHOLE resize to fixed-point bilinear with area
    coordinates) of u8-valued planes, byte-identical to cropping then
    running the streaming `resize(..., AREA)`. The Q11 integer kernel
    (_linear_u8) is order-free, so unlike the downscale f32 form no tap
    sequencing is needed — the gathers become exact 0/1 selection dots
    (u8 levels and Q11 horizontal sums are < 2^24, so the f32 dot is
    exact) and the arithmetic between them is the same int32
    VResizeLinear expression. Returns integer-valued f32 in [0, 255]
    (the callers' clip(round(.)) is a no-op)."""
    W, H = plane.shape[-1], plane.shape[-2]
    sx, ax0, ax1 = T.linear_tables(w, dst_w, area_mode=True, clamp=True)
    sy, ay0, ay1 = T.linear_tables(h, dst_h, area_mode=True, clamp=False)
    sx_r = np.minimum(sx + 1, w - 1)
    sy0 = np.clip(sy, 0, h - 1)
    sy1 = np.clip(sy + 1, 0, h - 1)
    s = plane.astype(jnp.float32)
    g0 = _banded_plane_contract(s, _sel_matrix(dst_w, W, off_x + sx),
                                axis=-1)
    g1 = _banded_plane_contract(s, _sel_matrix(dst_w, W, off_x + sx_r),
                                axis=-1)
    hrow = (g0.astype(jnp.int32) * jnp.asarray(ax0)
            + g1.astype(jnp.int32) * jnp.asarray(ax1))
    hf = hrow.astype(jnp.float32)
    s0 = _banded_plane_contract(hf, _sel_matrix(dst_h, H, off_y + sy0),
                                axis=-2).astype(jnp.int32)
    s1 = _banded_plane_contract(hf, _sel_matrix(dst_h, H, off_y + sy1),
                                axis=-2).astype(jnp.int32)
    b0 = jnp.asarray(ay0)[:, None]
    b1 = jnp.asarray(ay1)[:, None]
    out = (((b0 * (s0 >> 4)) >> 16) + ((b1 * (s1 >> 4)) >> 16) + 2) >> 2
    return jnp.clip(out, 0, 255).astype(jnp.float32)


def resize_linear_exact_u8(img: jax.Array, dst_w: int,
                           dst_h: int) -> jax.Array:
    """Interleaved (..., H, W, C) counterpart of
    resize_linear_window_exact_u8 (no crop embedding): byte-identical to
    `resize(img, ..., AREA)` when an axis upscales."""
    src_h, src_w = img.shape[-3], img.shape[-2]
    sx, ax0, ax1 = T.linear_tables(src_w, dst_w, area_mode=True,
                                   clamp=True)
    sy, ay0, ay1 = T.linear_tables(src_h, dst_h, area_mode=True,
                                   clamp=False)
    sx_r = np.minimum(sx + 1, src_w - 1)
    sy0 = np.clip(sy, 0, src_h - 1)
    sy1 = np.clip(sy + 1, 0, src_h - 1)
    s = img.astype(jnp.float32)
    g0 = _banded_contract(s, _sel_matrix(dst_w, src_w, sx), axis=-2)
    g1 = _banded_contract(s, _sel_matrix(dst_w, src_w, sx_r), axis=-2)
    hrow = (g0.astype(jnp.int32) * jnp.asarray(ax0)[:, None]
            + g1.astype(jnp.int32) * jnp.asarray(ax1)[:, None])
    hf = hrow.astype(jnp.float32)
    s0 = _banded_contract(hf, _sel_matrix(dst_h, src_h, sy0),
                          axis=-3).astype(jnp.int32)
    s1 = _banded_contract(hf, _sel_matrix(dst_h, src_h, sy1),
                          axis=-3).astype(jnp.int32)
    b0 = jnp.asarray(ay0)[:, None, None]
    b1 = jnp.asarray(ay1)[:, None, None]
    out = (((b0 * (s0 >> 4)) >> 16) + ((b1 * (s1 >> 4)) >> 16) + 2) >> 2
    return jnp.clip(out, 0, 255).astype(jnp.float32)


def resize_area_plane_embedded(plane: jax.Array, off_x: int, w: int,
                               dst_w: int, off_y: int, h: int,
                               dst_h: int) -> jax.Array:
    """The fused tails' plane resize with the crop folded in: the exact
    sequential-tap form when LILLIPUT_FUSED_EXACT=1 (byte-identical to
    streaming — downscales via the f32 tap-order form, upscaling
    geometries via the integer bilinear form), else the embedded-matrix
    contraction (±1 tier)."""
    if _fused_exact_enabled():
        if w < dst_w or h < dst_h:
            return resize_linear_window_exact_u8(plane, off_x, w, dst_w,
                                                 off_y, h, dst_h)
        out = resize_area_window_exact(plane, off_x, w, dst_w, off_y, h,
                                       dst_h)
        if out is not None:
            return out
    lin = dst_w > w or dst_h > h           # cv: any upscale -> all bilinear
    return resize_area_plane_mat(plane,
                                 area_matrix_embedded(plane.shape[-1],
                                                      off_x, w, dst_w, lin),
                                 area_matrix_embedded(plane.shape[-2],
                                                      off_y, h, dst_h, lin))


def resize_area_mxu_or_exact(img: jax.Array, dst_w: int,
                             dst_h: int) -> jax.Array:
    """Interleaved fused-tail resize: exact sequential-tap (downscale) /
    integer-bilinear (upscale) forms under LILLIPUT_FUSED_EXACT=1, else
    resize_area_mxu (±1)."""
    if _fused_exact_enabled():
        if img.shape[-2] < dst_w or img.shape[-3] < dst_h:
            return resize_linear_exact_u8(img, dst_w, dst_h)
        out = resize_area_exact(img, dst_w, dst_h)
        if out is not None:
            return out
    return resize_area_mxu(img, dst_w, dst_h)


def area_matrix_embedded(window: int, off: int, length: int, dst: int,
                         force_linear: bool = False) -> np.ndarray:
    """(dst, window) AREA axis matrix with the crop [off, off+length) folded
    in: crop-then-resize collapses into ONE contraction (columns outside the
    crop get weight 0). Taps are identical to _area_axis_matrix(length, dst)
    shifted by off, both directions (upscale uses the area-rule bilinear
    fallback like cv::resize). Pass force_linear=True for BOTH axes when
    the OTHER axis upscales (cv's joint mode switch)."""
    m = np.zeros((dst, window), np.float32)
    m[:, off:off + length] = _area_axis_matrix(length, dst, force_linear)
    return m


def resize_area_mxu_plane(plane: jax.Array, dst_w: int, dst_h: int) -> jax.Array:
    """INTER_AREA resize of a single (..., H, W) f32 plane holding exact u8
    values -> (..., dst_h, dst_w) f32 (caller rounds/clips). Planar variant
    for the packed serving path: channel-minor arrays have pathological TPU
    layouts, so the pipeline resizes B/G/R planes independently. Same +-1
    contract as resize_area_mxu."""
    src_h, src_w = plane.shape[-2], plane.shape[-1]
    if (src_w, src_h) == (dst_w, dst_h):
        return plane
    lin = dst_w > src_w or dst_h > src_h   # cv: any upscale -> all bilinear
    return resize_area_plane_mat(plane,
                                 _area_axis_matrix(src_w, dst_w, lin),
                                 _area_axis_matrix(src_h, dst_h, lin))


def resize_area_mxu(img: jax.Array, dst_w: int, dst_h: int) -> jax.Array:
    """INTER_AREA resize as two dense matrix contractions (no gathers).

    TPU gathers serialize into row-at-a-time DMAs; expressing the separable
    taps as (dst, src) matrices instead runs the whole resample on the MXU.
    The matrices are ~K/src sparse but the MXU's f32 throughput beats the
    gather path by an order of magnitude at serving shapes.

    Accuracy: within +-1 u8 of the bit-exact `resize` path (matmul partial-
    sum order differs from cv::resize's sequential accumulation) — used by
    the fused serving pipeline whose contract is +-1; NOT a substitute for
    `resize` where bit-exactness is required.
    """
    src_h, src_w = img.shape[-3], img.shape[-2]
    if (src_w, src_h) == (dst_w, dst_h):
        return img
    is_u8 = img.dtype == jnp.uint8
    if (src_w >= dst_w and src_h >= dst_h
            and T.area_is_fast(src_w, src_h, dst_w, dst_h)):
        return _area_fast_u8(img, dst_w, dst_h) if is_u8 else _area_fast_f32(img, dst_w, dst_h)
    lin = dst_w > src_w or dst_h > src_h   # cv: any upscale -> all bilinear
    wx = _area_axis_matrix(src_w, dst_w, lin)  # (dst_w, src_w)
    wy = _area_axis_matrix(src_h, dst_h, lin)  # (dst_h, src_h)
    s = img.astype(jnp.float32)
    h = _banded_contract(s, wx, axis=-2)
    out = _banded_contract(h, wy, axis=-3)
    if is_u8:
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)
    return out


# ---------------------------------------------------------------------------
# Public entry point
# ---------------------------------------------------------------------------

def resize(img: jax.Array, dst_w: int, dst_h: int, method: str = AREA) -> jax.Array:
    """Resize (..., H, W, C) to (..., dst_h, dst_w, C) with OpenCV semantics."""
    src_h, src_w = img.shape[-3], img.shape[-2]
    if (src_w, src_h) == (dst_w, dst_h):
        return img
    if img.dtype == jnp.uint8:
        if method == AREA:
            return _area(img, dst_w, dst_h)
        if method == LINEAR:
            return _linear_u8(img, dst_w, dst_h, area_mode=False)
        if method == CUBIC:
            return _cubic_u8(img, dst_w, dst_h)
    else:
        if method == AREA:
            return _area(img, dst_w, dst_h)
        if method == LINEAR:
            return _linear_f32(img, dst_w, dst_h, area_mode=False)
        if method == CUBIC:
            return _cubic(img, dst_w, dst_h)
    raise ValueError(f"unknown resize method {method!r}")
