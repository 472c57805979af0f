"""JPEG dense transforms on device: IDCT/fDCT as MXU matmuls, chroma
resampling, and YCbCr<->BGR color conversion.

TPU-native replacement for the pixel half of libjpeg (the reference consumes
it whole through OpenCV, /root/reference/opencv.cpp:93-188): the 8x8
inverse/forward DCT is expressed as two 8x8 matrix contractions over a batch
of blocks — exactly the shape the MXU wants — and the chroma triangle
filter + color matrix fuse into the surrounding elementwise code. The host
only ever sees entropy-coded bytes and quantized coefficients
(native/src/jpeg_shim.cpp).

Decode: coefs -> dequant -> IDCT -> +128 -> fancy (triangle) chroma upsample
        -> YCbCr->BGR -> u8.
Encode: BGR -> YCbCr -> pad to MCU -> 2x2 box chroma downsample -> -128 ->
        fDCT -> quantize(round) -> int16 coefs.

All functions take/return arrays with an arbitrary leading batch dim where
noted, enabling whole-animation or mega-batch transcodes in one dispatch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=1)
def dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix A: forward K = A @ P @ A.T."""
    a = np.zeros((8, 8), np.float32)
    for k in range(8):
        c = np.sqrt(1.0 / 8.0) if k == 0 else np.sqrt(2.0 / 8.0)
        for n in range(8):
            a[k, n] = c * np.cos((2 * n + 1) * k * np.pi / 16.0)
    return a


@functools.lru_cache(maxsize=1)
def idct_kron_matrix() -> np.ndarray:
    """(64, 64) W with W[xy, uv] = A[x,u]*A[y,v]: the full 2D IDCT as ONE
    matmul P_flat = K_flat @ W — the MXU-optimal mapping (a (N,64)x(64,64)
    contraction instead of 2N tiny 8x8 matmuls)."""
    a = dct_matrix()
    return np.kron(a, a).astype(np.float32)


@functools.lru_cache(maxsize=4)
def scaled_idct_kron_matrix(k: int) -> np.ndarray:
    """(64, k*k) matrix reconstructing a kxk pixel block from the top-left
    kxk DCT coefficients — libjpeg's M/8 scaled decode (jpeg_idct_4x4 etc.,
    what OpenCV exposes as IMREAD_REDUCED_*): a k-point inverse DCT of the
    truncated spectrum with the sqrt(k/8) energy rescale folded in."""
    bk = np.zeros((k, k), np.float64)
    for u in range(k):
        a = np.sqrt(1.0 / k) if u == 0 else np.sqrt(2.0 / k)
        for m in range(k):
            bk[m, u] = a * np.cos((2 * m + 1) * u * np.pi / (2 * k))
    w = np.zeros((64, k * k), np.float64)
    scale = k / 8.0  # sqrt(k/8) per axis
    for u in range(k):
        for v in range(k):
            for mx in range(k):
                for my in range(k):
                    w[u * 8 + v, mx * k + my] = bk[mx, u] * bk[my, v] * scale
    return w.astype(np.float32)


@functools.lru_cache(maxsize=4)
def scaled_coef_indices(k: int) -> np.ndarray:
    """Natural-order indices of the top-left kxk DCT coefficients — the only
    rows scaled_idct_kron_matrix(k) reads. A coefficient batch sliced to
    these k*k lanes on the host decodes bit-identically while shipping
    64/(k*k) less data over H2D (4x at dct_scale=2, 16x at dct_scale=4)."""
    return np.array([u * 8 + v for u in range(k) for v in range(k)], np.int64)


def dequant_idct_scaled(coefs: jax.Array, qtable: jax.Array,
                        k: int) -> jax.Array:
    """(..., bh, bw, 64) int16 + (64,)/(B, 64) tables -> (..., bh*k, bw*k)
    f32 plane at k/8 scale (level-shifted). Per-image tables fold into the
    matrix like dequant_idct.

    Also accepts HOST-TRUNCATED coefficients of shape (..., bh, bw, k*k)
    holding only the scaled_coef_indices(k) lanes (qtable stays full 64):
    the matrix and tables are sliced to match, so results are bit-identical
    to the full-coefficient form."""
    w_base = jnp.asarray(scaled_idct_kron_matrix(k))
    nc = coefs.shape[-1]
    if nc == k * k and k != 8:
        idx = scaled_coef_indices(k)
        w_base = w_base[jnp.asarray(idx)]
        qtable = qtable[..., jnp.asarray(idx)]
    elif nc != 64:
        raise ValueError(
            f"coefficient lane dim must be 64 or {k * k}, got {nc}")
    lead = coefs.shape[:-3]
    bh, bw = coefs.shape[-3], coefs.shape[-2]
    if qtable.ndim == 1:
        w = w_base * qtable.astype(jnp.float32)[:, None]
        p = jnp.dot(coefs.reshape(-1, nc).astype(jnp.float32), w,
                    preferred_element_type=jnp.float32) + 128.0
    else:
        b = int(np.prod(lead)) if lead else 1
        wq = (w_base[None]
              * qtable.astype(jnp.float32).reshape(b, -1)[:, :, None])
        p = jnp.einsum("bnc,bcj->bnj",
                       coefs.reshape(b, -1, nc).astype(jnp.float32), wq,
                       preferred_element_type=jnp.float32) + 128.0
    p = p.reshape(lead + (bh, bw, k, k))
    p = jnp.moveaxis(p, -2, -3)
    return p.reshape(lead + (bh * k, bw * k))


_force_split_depth = 0


class force_split_decode:
    """Context manager forcing the pure-XLA split decode path while a fused
    fn is being TRACED. Multi-device (GSPMD-sharded) steps use this: a
    pallas_call carries no partitioning rules, so the megakernel cannot be
    sharded across chips — the split path is fully partitionable and
    measures within ~4% of it (ROADMAP session-3 notes). Re-entrant; only
    affects traces started inside the context."""

    def __enter__(self):
        global _force_split_depth
        _force_split_depth += 1
        return self

    def __exit__(self, *exc):
        global _force_split_depth
        _force_split_depth -= 1
        return False


def _use_pallas() -> bool:
    """Pallas kernels on TPU by default; XLA path elsewhere, when
    LILLIPUT_PALLAS=0, or inside force_split_decode (sharded steps)."""
    import os
    if _force_split_depth:
        return False
    flag = os.environ.get("LILLIPUT_PALLAS")
    if flag is not None:
        return flag not in ("0", "false", "off")
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _use_megakernel() -> bool:
    """Fused decode megakernel gate: LILLIPUT_MEGAKERNEL overrides, else
    follows the Pallas gate (on-TPU default). force_split_decode (multi-
    device sharded steps) wins over everything.

    Read at TRACE time: the flag is not part of jax's jit cache key, so
    set it BEFORE the first decode of a given shape — flipping the env
    var later keeps serving the already-compiled executable for shapes
    traced earlier (restart the process, or clear_cache() the fused fns,
    to re-trace). The sharded serving steps are immune: they trace their
    own per-instance jit copies under force_split_decode."""
    import os
    if _force_split_depth:
        return False
    flag = os.environ.get("LILLIPUT_MEGAKERNEL")
    if flag is not None:
        return flag not in ("0", "false", "off")
    return _use_pallas()


def dequant_idct(coefs: jax.Array, qtable: jax.Array) -> jax.Array:
    """(..., bh, bw, 64) int16 + (64,) or (B, 64) -> (..., bh*8, bw*8) f32.

    Dequantization folds into the IDCT matrix rows (W_q = diag(q) @ W), so
    the whole dense half of JPEG decode is a single (N,64)x(64,64) matmul
    per plane — dispatched to the Pallas MXU kernel on TPU
    (ops/pallas_kernels.py, two blocks packed per 128-lane tile row).

    A 2-D qtable carries per-image tables for a batched (B, bh, bw, 64)
    coefficient stack (same-quality assumptions are unsafe in serving — see
    pipeline.JpegTranscodePipeline); each image's tables fold into its own
    IDCT matrix so the arithmetic matches the shared-table path exactly.
    """
    w_base = jnp.asarray(idct_kron_matrix())
    lead = coefs.shape[:-3]
    bh, bw = coefs.shape[-3], coefs.shape[-2]
    if qtable.ndim == 1:
        w = w_base * qtable.astype(jnp.float32)[:, None]
        flat = coefs.reshape(-1, 64)
        if _use_pallas():
            from . import pallas_kernels as PK
            p = PK.dequant_idct_blocks(flat, w)
        else:
            p = jnp.dot(flat.astype(jnp.float32), w,
                        preferred_element_type=jnp.float32) + 128.0
    else:
        if lead != qtable.shape[:-1]:
            raise ValueError(
                f"batched qtable leading dims {qtable.shape[:-1]} must match "
                f"coefficient leading dims {lead}")
        b = int(np.prod(lead))
        wq = w_base[None] * qtable.astype(jnp.float32).reshape(b, 64)[:, :, None]
        flat = coefs.reshape(b, -1, 64)
        if _use_pallas():
            from . import pallas_kernels as PK
            p = jax.vmap(PK.dequant_idct_blocks)(flat, wq)
        else:
            p = jnp.einsum("bnk,bkj->bnj", flat.astype(jnp.float32), wq,
                           preferred_element_type=jnp.float32) + 128.0
    p = p.reshape(lead + (bh, bw, 8, 8))
    p = jnp.moveaxis(p, -2, -3)  # (…, bh, 8, bw, 8)
    return p.reshape(lead + (bh * 8, bw * 8))


def dequant_idct_u8(coefs: jax.Array, qtable: jax.Array) -> jax.Array:
    """dequant_idct with the u8 quantization applied while pixels are still
    in BLOCK space: (..., bh, bw, 64) int16 -> (..., bh*8, bw*8) bf16 plane
    holding exact u8 values. The round/clip is elementwise, so doing it
    before the block->plane relayout is value-identical to rounding the
    f32 plane — but the relayout transpose then moves 2 B/px instead of 4.
    Used by the serving path where the plane feeds a resize contraction
    (the matmul upcasts bf16 exactly).

    Always the XLA einsum form, on every backend: the Pallas pair-packed
    kernel measured 3.6x SLOWER than XLA's batched (N,64)x(64,64) matmul on
    v5e (6.5 vs 1.8 ms/batch-128 at the 1080p serving shape — the pad/vmap
    staging around the kernel dominates), and this path carries only the
    serving modes' +-1 contract, not the megakernel bit-identity gate (that
    gate runs through dequant_idct, which keeps the Pallas dispatch)."""
    lead = coefs.shape[:-3]
    bh, bw = coefs.shape[-3], coefs.shape[-2]
    w_base = jnp.asarray(idct_kron_matrix())
    if qtable.ndim == 1:
        w = w_base * qtable.astype(jnp.float32)[:, None]
        p = jnp.dot(coefs.reshape(-1, 64).astype(jnp.float32), w,
                    preferred_element_type=jnp.float32) + 128.0
        p = jnp.clip(jnp.round(p), 0.0, 255.0).astype(jnp.bfloat16)
    else:
        if lead != qtable.shape[:-1]:
            raise ValueError(
                f"batched qtable leading dims {qtable.shape[:-1]} must match "
                f"coefficient leading dims {lead}")
        b = int(np.prod(lead))
        wq = w_base[None] * qtable.astype(jnp.float32).reshape(b, 64)[:, :, None]
        p = jnp.einsum("bnk,bkj->bnj",
                       coefs.reshape(b, -1, 64).astype(jnp.float32), wq,
                       preferred_element_type=jnp.float32) + 128.0
        p = jnp.clip(jnp.round(p), 0.0, 255.0).astype(jnp.bfloat16)
    p = p.reshape(lead + (bh, bw, 8, 8))
    p = jnp.moveaxis(p, -2, -3)
    return p.reshape(lead + (bh * 8, bw * 8))


def fdct_quant(plane: jax.Array, qtable: jax.Array) -> jax.Array:
    """(..., H8, W8) f32 (0..255) -> (..., H8/8, W8/8, 64) int16 quantized.

    Forward transform + quantization divide fold into one (N,64)x(64,64)
    matmul (W_f = W^T with 1/q folded into the output columns).

    Always the XLA dot form: the Pallas pair-packed kernel measured 1.6x
    slower on v5e (1.65 vs 1.03 ms/batch-128 at the serving encode shapes)
    with bit-identical quantized coefficients."""
    wf = jnp.asarray(idct_kron_matrix()).T / qtable.astype(jnp.float32)[None, :]
    lead = plane.shape[:-2]
    h, w = plane.shape[-2], plane.shape[-1]
    bh, bw = h // 8, w // 8
    p = plane.reshape(lead + (bh, 8, bw, 8))
    p = jnp.moveaxis(p, -3, -2)  # (…, bh, bw, 8, 8)
    flat = p.reshape(-1, 64)
    k = jnp.dot(flat - 128.0, wf, preferred_element_type=jnp.float32)
    q = jnp.clip(jnp.round(k), -2047, 2047).astype(jnp.int16)
    return q.reshape(lead + (bh, bw, 64))


# ---------------------------------------------------------------------------
# chroma resampling
# ---------------------------------------------------------------------------

def _upsample2x_axis(x: jax.Array, axis: int, out_len: int) -> jax.Array:
    """Triangle-filter 2x upsample along axis (libjpeg 'fancy' upsampling):
    out[2i] = (3*x[i] + x[i-1]) / 4, out[2i+1] = (3*x[i] + x[i+1]) / 4,
    with edge replication; computed in f32 (no intermediate rounding)."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    # shifted-slice concats, NOT index gathers: XLA lowers gathers on TPU to
    # serialized dynamic-slices (measured 35 GB/s vs 260+ for concat form)
    left = jnp.concatenate([x[..., :1], x[..., :-1]], axis=-1)
    right = jnp.concatenate([x[..., 1:], x[..., -1:]], axis=-1)
    even = (3.0 * x + left) * 0.25
    odd = (3.0 * x + right) * 0.25
    out = jnp.stack([even, odd], axis=-1).reshape(x.shape[:-1] + (2 * n,))
    out = out[..., :out_len]
    return jnp.moveaxis(out, -1, axis)


@functools.lru_cache(maxsize=1024)
def _upsample2x_matrix(src: int, out_len: int):
    """(out_len, src) triangle-filter 2x upsample matrix (libjpeg 'fancy'
    upsample weights: out[2i] = .75*x[i] + .25*x[i-1], out[2i+1] =
    .75*x[i] + .25*x[i+1], edges replicated). Banded (2 taps/row) so the
    upsample runs as a slab MXU contraction instead of concat/stack
    relayout passes — same weights, f32-summation-order tier (±1 u8 after
    the color round on boundary values)."""
    m = np.zeros((out_len, src), np.float32)
    for o in range(out_len):
        i = min(o // 2, src - 1)  # clamp = edge replication past 2*src
        j = i - 1 if o % 2 == 0 else i + 1
        j = min(max(j, 0), src - 1)
        m[o, i] += np.float32(0.75)
        m[o, j] += np.float32(0.25)
    return m


def decode_ycc_planes_mxu(y_coefs, cb_coefs, cr_coefs, qt_luma, qt_chroma,
                          out_h: int, out_w: int, h2: bool, v2: bool):
    """4:2:0 decode to (b, g, r) u8 RASTER planes with every dense stage on
    the MXU: dequant+IDCT einsums (raster epilogue), triangle chroma
    upsample as banded 2-tap matrix contractions, then the fused
    color+round elementwise tail. Returns None unless h2 and v2.

    Round-3 EXPERIMENT (LILLIPUT_MXU_DECODE=1; default off): once outputs
    are honestly materialized it measures SLOWER than the block-vector
    megakernel (18.8 vs 16.6 ms/batch-128 decode on v5e — the full-res
    relayout/materialization cost dominates every representation; see
    ROADMAP round-3 notes + tools/profile_stages.py). Kept env-gated for
    re-evaluation on future compilers. Exactness: the W pass is exact
    (power-of-2 scaling commutes with f32 rounding, so 0.75x+0.25l ==
    (3x+l)*0.25 bit-for-bit); the H pass rounds to UNCLIPPED int16, a
    ±0.5 chroma deviation whose color image is at most 1.772*0.5 = 0.886
    < 1 — a GUARANTEED ≤1-u8 bound vs the bit-identical megakernel/split
    pair even on adversarial coefficients (gated in
    tests/test_megakernel.py::test_mxu_planes_within_1)."""
    if not (h2 and v2):
        return None
    yf = dequant_idct(y_coefs, qt_luma)[..., :out_h, :out_w]
    cbf = dequant_idct(cb_coefs, qt_chroma)
    crf = dequant_idct(cr_coefs, qt_chroma)
    ch, cw = cbf.shape[-2], cbf.shape[-1]
    from . import resize as R
    mh = _upsample2x_matrix(ch, out_h)
    mw = _upsample2x_matrix(cw, out_w)

    def up(p):
        # W pass stays f32 at HALF height; the H pass's epilogue rounds to
        # int16 WITHOUT clipping (fuses into the dot), so full-res f32
        # chroma never hits HBM — 2 B/px instead of 4 on the decode's
        # dominant traffic. The ±0.5 chroma round gives a channel
        # deviation of at most 1.772*0.5 = 0.886 < 1 after color, i.e. a
        # GUARANTEED ≤1-u8 decode bound vs the bit-identical
        # megakernel/split pair (no clipping: out-of-range chroma keeps
        # its excursion exactly like the f32 path).
        p = R._banded_plane_contract(p, mw, axis=-1)
        p = R._banded_plane_contract(p, mh, axis=-2)
        return jnp.round(p).astype(jnp.int16)

    cbu = up(cbf)
    cru = up(crf)
    cbc = cbu.astype(jnp.float32) - 128.0
    crc = cru.astype(jnp.float32) - 128.0
    r = yf + 1.402 * crc
    g = yf - 0.344136286 * cbc - 0.714136286 * crc
    b = yf + 1.772 * cbc
    q = [jnp.clip(jnp.round(p), 0, 255).astype(jnp.uint8)
         for p in (b, g, r)]
    # materialize the u8 planes once before the banded resize's many slab
    # slices downstream (measured neutral on v5e, kept as insurance
    # against slab-consumer rematerialization at other geometries)
    return tuple(jax.lax.optimization_barrier(q))


def upsample_chroma(plane: jax.Array, h_factor: int, v_factor: int,
                    out_h: int, out_w: int) -> jax.Array:
    """Upsample a chroma plane by integer factors (1 or 2 per axis)."""
    if v_factor == 2:
        plane = _upsample2x_axis(plane, -2, out_h)
    if h_factor == 2:
        plane = _upsample2x_axis(plane, -1, out_w)
    plane = plane[..., :out_h, :out_w]
    # replicate-pad if source plane (blocks*8) was smaller than target
    pad_h = out_h - plane.shape[-2]
    pad_w = out_w - plane.shape[-1]
    if pad_h or pad_w:
        cfg = [(0, 0)] * (plane.ndim - 2) + [(0, pad_h), (0, pad_w)]
        plane = jnp.pad(plane, cfg, mode="edge")
    return plane


def downsample_chroma_2x2(plane: jax.Array) -> jax.Array:
    """2x2 box average (libjpeg h2v2 downsample) on an even-sized plane."""
    lead = plane.shape[:-2]
    h, w = plane.shape[-2], plane.shape[-1]
    v = plane.reshape(lead + (h // 2, 2, w // 2, 2))
    return v.mean(axis=(-1, -3))


# ---------------------------------------------------------------------------
# color conversion (BT.601 full-range, libjpeg constants)
# ---------------------------------------------------------------------------

def ycbcr_to_bgr(y: jax.Array, cb: jax.Array, cr: jax.Array) -> jax.Array:
    cbc = cb - 128.0
    crc = cr - 128.0
    r = y + 1.402 * crc
    g = y - 0.344136286 * cbc - 0.714136286 * crc
    b = y + 1.772 * cbc
    out = jnp.stack([b, g, r], axis=-1)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


def bgr_to_ycbcr(img: jax.Array):
    f = img.astype(jnp.float32)
    b, g, r = f[..., 0], f[..., 1], f[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b + 128.0
    return y, cb, cr


# ---------------------------------------------------------------------------
# full decode / encode pipelines (jitted per geometry)
# ---------------------------------------------------------------------------

def decode_ycc_packed(y_coefs, cb_coefs, cr_coefs, qt_luma, qt_chroma,
                      out_h: int, out_w: int, h2: bool, v2: bool,
                      interpret: bool = False):
    """Megakernel decode to PACKED BGRA int32 planes (lead + (out_h, out_w)),
    or None when the coefficient shapes don't fit a supported layout
    (4:2:0, 4:2:2, 4:4:0 and 4:4:4 are all covered).

    The packed form is the serving-path representation: TPU layouts make a
    (..., 3) u8 minor dim catastrophically slow (a measured 15 ms/batch-64
    just to slice BGR out of BGRA), while channel extraction from int32 via
    shifts fuses into whatever consumes the planes."""
    from . import pallas_kernels as PK
    ysh, csh = y_coefs.shape[-3:-1], cb_coefs.shape[-3:-1]
    if csh != cr_coefs.shape[-3:-1]:
        return None

    def half(n):  # chroma blocks for a half-sampled luma axis
        return -(-n // 2)

    if h2 and v2:
        ok = csh == (half(ysh[0]), half(ysh[1]))
        fn = PK.decode420_packed
    elif h2:
        ok = csh == (ysh[0], half(ysh[1]))
        fn = PK.decode422_packed
    elif v2:
        ok = csh == (half(ysh[0]), ysh[1])
        fn = PK.decode440_packed
    else:
        ok = csh == ysh
        fn = PK.decode444_packed
    if not ok:
        return None
    lead = y_coefs.shape[:-3]
    b = int(np.prod(lead)) if lead else 1
    yc = y_coefs.reshape((b,) + y_coefs.shape[-3:])
    cb = cb_coefs.reshape((b,) + cb_coefs.shape[-3:])
    cr = cr_coefs.reshape((b,) + cr_coefs.shape[-3:])
    w_base = jnp.asarray(idct_kron_matrix())

    def fold(qt):
        q = (qt.astype(jnp.float32).reshape(-1, 64) if qt.ndim > 1
             else qt.astype(jnp.float32)[None])
        return w_base[None] * q[:, :, None]

    packed = fn(yc, cb, cr, fold(qt_luma), fold(qt_chroma),
                interpret=interpret)
    return packed[:, :out_h, :out_w].reshape(lead + (out_h, out_w))


def decode_ycc_u8_plane_blocks(y_coefs, cb_coefs, cr_coefs, qt_luma,
                               qt_chroma, h2: bool, v2: bool,
                               interpret: bool = False):
    """Megakernel decode to three u8 channel arrays (b, g, r) still in
    BLOCK-VECTOR space: each lead + (cbh_pad, 2, cbw, 128), where
    plane[row, col] lives at [row // 16, (row // 8) % 2, col // 16,
    (col // 8 % 2) * 64 + (row % 8) * 8 + col % 8]. Returns None when the
    subsampling shape is not 4:2:0. The serving tail relayouts each
    channel directly (1 B/px through the transpose, no extraction pass)."""
    if not (h2 and v2):
        return None
    # same chroma/luma shape-consistency gate as decode_ycc_packed: a raw
    # fused-fn caller (window=None path) passing off-spec '4:2:0' arrays
    # must fall through to the packed/split paths, not get zero-padded
    # (gray) blocks or a trace-time pad error
    ysh = y_coefs.shape[-3:-1]
    csh = cb_coefs.shape[-3:-1]
    if csh != cr_coefs.shape[-3:-1]:
        return None
    if csh != (-(-ysh[0] // 2), -(-ysh[1] // 2)):
        return None
    lead = y_coefs.shape[:-3]
    b = int(np.prod(lead)) if lead else 1
    yc = y_coefs.reshape((b,) + y_coefs.shape[-3:])
    cb = cb_coefs.reshape((b,) + cb_coefs.shape[-3:])
    cr = cr_coefs.reshape((b,) + cr_coefs.shape[-3:])
    w_base = jnp.asarray(idct_kron_matrix())

    def fold(qt):
        q = (qt.astype(jnp.float32).reshape(-1, 64) if qt.ndim > 1
             else qt.astype(jnp.float32)[None])
        return w_base[None] * q[:, :, None]

    from . import pallas_kernels as PK
    planes = PK._decode420_call(yc, cb, cr, fold(qt_luma), fold(qt_chroma),
                                interpret, out_planes=True)
    return tuple(p.reshape(lead + p.shape[1:]) for p in planes)


def packed_to_planes(packed: jax.Array):
    """Packed BGRA int32 -> (b, g, r) f32 planes (exact u8 values)."""
    bpl = (packed & 255).astype(jnp.float32)
    gpl = ((packed >> 8) & 255).astype(jnp.float32)
    rpl = ((packed >> 16) & 255).astype(jnp.float32)
    return bpl, gpl, rpl


def _decode_ycc_megakernel(y_coefs, cb_coefs, cr_coefs, qt_luma, qt_chroma,
                           out_h: int, out_w: int, h2: bool, v2: bool,
                           interpret: bool = False):
    """Dispatch to the fused decode megakernel (ops/pallas_kernels.py) —
    4:2:0, 4:2:2, 4:4:0 and 4:4:4 are all covered; returns None only when
    the coefficient shapes don't match the declared subsampling, falling
    back to the split dequant_idct + upsample_chroma + ycbcr_to_bgr path."""
    packed = decode_ycc_packed(y_coefs, cb_coefs, cr_coefs, qt_luma,
                               qt_chroma, out_h, out_w, h2, v2,
                               interpret=interpret)
    if packed is None:
        return None
    u8v = jax.lax.bitcast_convert_type(packed, jnp.uint8)
    return u8v[..., :3]


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "h2", "v2"))
def decode_ycc_420(y_coefs, cb_coefs, cr_coefs, qt_luma, qt_chroma,
                   out_h: int, out_w: int, h2: bool, v2: bool,
                   qt_chroma2=None):
    """Full color JPEG decode from coefficients (any of 444/422/420/440).

    qt_chroma2: Cr's own quant table for the (legal, rare) JPEGs whose two
    chroma components use DIFFERENT tables — libjpeg decodes those
    per-component and so must we. The megakernels carry one chroma matrix,
    so such images take the split path."""
    if qt_chroma2 is None and _use_megakernel():
        out = _decode_ycc_megakernel(y_coefs, cb_coefs, cr_coefs,
                                     qt_luma, qt_chroma, out_h, out_w, h2, v2)
        if out is not None:
            return out
    y = dequant_idct(y_coefs, qt_luma)[..., :out_h, :out_w]
    cb = dequant_idct(cb_coefs, qt_chroma)
    cr = dequant_idct(cr_coefs,
                      qt_chroma if qt_chroma2 is None else qt_chroma2)
    hf = 2 if h2 else 1
    vf = 2 if v2 else 1
    cb = upsample_chroma(cb, hf, vf, out_h, out_w)
    cr = upsample_chroma(cr, hf, vf, out_h, out_w)
    return ycbcr_to_bgr(y, cb, cr)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "h2", "v2"))
def decode_rgb(r_coefs, g_coefs, b_coefs, qt_r, qt_g, qt_b,
               out_h: int, out_w: int, h2: bool, v2: bool):
    """3-component JCS_RGB JPEG decode to BGR u8.

    JPEGs whose compressed colorspace is RGB (Adobe APP14 transform=0 or
    'R'/'G'/'B' component ids) store the planes without the YCbCr
    transform — libjpeg's null_convert path, which the reference hits via
    OpenCV's libjpeg decode. Dequant+IDCT per plane, upsample the
    (rare) subsampled G/B planes like chroma, reorder to BGR — NO color
    matrix."""
    r = dequant_idct(r_coefs, qt_r)[..., :out_h, :out_w]
    g = dequant_idct(g_coefs, qt_g)
    b = dequant_idct(b_coefs, qt_b)
    hf = 2 if h2 else 1
    vf = 2 if v2 else 1
    g = upsample_chroma(g, hf, vf, out_h, out_w)
    b = upsample_chroma(b, hf, vf, out_h, out_w)
    out = jnp.stack([b, g, r], axis=-1)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w", "ycck", "inverted"))
def decode_cmyk(c0, c1, c2, c3, qt0, qt1, qt2, qt3,
                out_h: int, out_w: int, ycck: bool, inverted: bool):
    """4-component (CMYK / YCCK) JPEG decode to BGR u8.

    Adobe-marked files store inverted ink values, in which case
    R = C*K/255 on the decoded samples; YCCK first undoes the YCbCr
    transform on the CMY channels (libjpeg ycck_cmyk_convert semantics)."""
    p = [dequant_idct(c, q)[..., :out_h, :out_w]
         for c, q in ((c0, qt0), (c1, qt1), (c2, qt2), (c3, qt3))]
    if ycck:
        # the YCbCr transform was applied to the inverted-ink CMY channels,
        # so inverting it yields the inverted ink values directly
        cbc = p[1] - 128.0
        crc = p[2] - 128.0
        vc = p[0] + 1.402 * crc
        vm = p[0] - 0.344136286 * cbc - 0.714136286 * crc
        vy = p[0] + 1.772 * cbc
    else:
        vc, vm, vy = p[0], p[1], p[2]
    vk = p[3]
    if not inverted:  # no Adobe marker: samples are true ink coverage
        vc, vm, vy, vk = 255.0 - vc, 255.0 - vm, 255.0 - vy, 255.0 - vk
    inv255 = np.float32(1.0 / 255.0)
    vc = jnp.clip(vc, 0.0, 255.0)
    vm = jnp.clip(vm, 0.0, 255.0)
    vy = jnp.clip(vy, 0.0, 255.0)
    vk = jnp.clip(vk, 0.0, 255.0)
    r_out = vc * vk * inv255
    g_out = vm * vk * inv255
    b_out = vy * vk * inv255
    out = jnp.stack([b_out, g_out, r_out], axis=-1)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("out_h", "out_w"))
def decode_gray(y_coefs, qt_luma, out_h: int, out_w: int):
    y = dequant_idct(y_coefs, qt_luma)[..., :out_h, :out_w]
    return jnp.clip(jnp.round(y), 0, 255).astype(jnp.uint8)[..., None]


def _pad_to(plane: jax.Array, h: int, w: int) -> jax.Array:
    ph, pw = h - plane.shape[-2], w - plane.shape[-1]
    if ph or pw:
        cfg = [(0, 0)] * (plane.ndim - 2) + [(0, ph), (0, pw)]
        plane = jnp.pad(plane, cfg, mode="edge")
    return plane


def _encode_ycc(y, cb, cr, qt_luma, qt_chroma, subsample: bool):
    h, w = y.shape[-2], y.shape[-1]
    if subsample:
        mcu = 16
        ph = (h + mcu - 1) // mcu * mcu
        pw = (w + mcu - 1) // mcu * mcu
        y = _pad_to(y, ph, pw)
        cb = downsample_chroma_2x2(_pad_to(cb, ph, pw))
        cr = downsample_chroma_2x2(_pad_to(cr, ph, pw))
    else:
        mcu = 8
        ph = (h + mcu - 1) // mcu * mcu
        pw = (w + mcu - 1) // mcu * mcu
        y = _pad_to(y, ph, pw)
        cb = _pad_to(cb, ph, pw)
        cr = _pad_to(cr, ph, pw)
    return (fdct_quant(y, qt_luma),
            fdct_quant(cb, qt_chroma),
            fdct_quant(cr, qt_chroma))


@functools.partial(jax.jit, static_argnames=("subsample",))
def encode_from_bgr(img, qt_luma, qt_chroma, subsample: bool = True):
    """(..., H, W, 3+) u8 BGR(A) -> (y, cb, cr) quantized int16 coefficient
    arrays, 4:2:0 when subsample else 4:4:4. Alpha is ignored."""
    y, cb, cr = bgr_to_ycbcr(img[..., :3])
    return _encode_ycc(y, cb, cr, qt_luma, qt_chroma, subsample)


@functools.partial(jax.jit, static_argnames=("subsample",))
def encode_from_bgr_planes(bpl, gpl, rpl, qt_luma, qt_chroma,
                           subsample: bool = True):
    """Planar variant for the packed serving path: three (..., H, W) f32
    planes holding exact u8 values. Identical math to encode_from_bgr
    without ever materializing a channel-minor array (TPU layout poison)."""
    y = 0.299 * rpl + 0.587 * gpl + 0.114 * bpl
    cb = -0.168735892 * rpl - 0.331264108 * gpl + 0.5 * bpl + 128.0
    cr = 0.5 * rpl - 0.418687589 * gpl - 0.081312411 * bpl + 128.0
    return _encode_ycc(y, cb, cr, qt_luma, qt_chroma, subsample)


@jax.jit
def encode_gray_from_u8(img, qt_luma):
    """(..., H, W, 1) u8 -> quantized luma coefficients."""
    y = img[..., 0].astype(jnp.float32)
    h, w = y.shape[-2], y.shape[-1]
    ph = (h + 7) // 8 * 8
    pw = (w + 7) // 8 * 8
    return fdct_quant(_pad_to(y, ph, pw), qt_luma)
