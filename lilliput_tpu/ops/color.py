"""Color math on device: YUV->BGR(A) matrices, PQ/HLG linearization,
primaries conversion, Reinhard tonemap.

Replaces the reference's sws_scale colorspace stage
(/root/reference/avcodec.cpp:37-111) and the AVIF HDR->SDR chain
(/root/reference/avif.cpp:88-199): everything here is elementwise + 3x3
matrix work that XLA fuses with the surrounding decode/resize ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# BT matrix luma coefficients (Kr, Kb)
KR_KB = {
    "bt601": (0.299, 0.114),
    "bt709": (0.2126, 0.0722),
    "bt2020": (0.2627, 0.0593),
    "smpte240": (0.212, 0.087),
}

# AVCOL_SPC_* -> coefficient family
AVCOL_SPC = {0: "bt709", 1: "bt709", 4: "bt601", 5: "bt601", 6: "bt601",
             7: "smpte240", 9: "bt2020", 10: "bt2020"}


def yuv_to_bgr_coeffs(space: str):
    kr, kb = KR_KB[space]
    kg = 1.0 - kr - kb
    return (2.0 * (1.0 - kr),                       # cr -> r
            -2.0 * kb * (1.0 - kb) / kg,            # cb -> g
            -2.0 * kr * (1.0 - kr) / kg,            # cr -> g
            2.0 * (1.0 - kb))                       # cb -> b


@functools.partial(jax.jit, static_argnames=("space", "full_range", "out_h", "out_w"))
def yuv420_to_bgr(y: jax.Array, u: jax.Array, v: jax.Array,
                  space: str = "bt601", full_range: bool = False,
                  out_h: int = 0, out_w: int = 0) -> jax.Array:
    """Planar 4:2:0 (or 4:4:4 when u/v match y) u8 -> (H, W, 3) BGR u8.

    Chroma is upsampled with the separable triangle filter (same kernel the
    JPEG path uses); the matrix multiply and range expansion fuse in.
    """
    from .jpeg_kernels import upsample_chroma

    out_h = out_h or y.shape[-2]
    out_w = out_w or y.shape[-1]
    yf = y.astype(jnp.float32)
    uf = u.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if uf.shape[-2:] != (out_h, out_w):
        # a SUBSAMPLED axis (chroma dim < output dim) upsamples 2x; a
        # full-resolution axis must stay 1x — `shape*2 >= out` was also
        # true for FULL-height 4:2:2 chroma, which then got vertically
        # doubled and truncated to the top half (review finding)
        hf = 2 if uf.shape[-1] < out_w else 1
        vf_fac = 2 if uf.shape[-2] < out_h else 1
        uf = upsample_chroma(uf, hf, vf_fac, out_h, out_w)
        vf = upsample_chroma(vf, hf, vf_fac, out_h, out_w)
    yf = yf[..., :out_h, :out_w]

    if full_range:
        yn = yf
        cb = uf - 128.0
        cr = vf - 128.0
    else:
        yn = (yf - 16.0) * np.float32(255.0 / 219.0)
        cb = (uf - 128.0) * np.float32(255.0 / 224.0)
        cr = (vf - 128.0) * np.float32(255.0 / 224.0)

    c_rr, c_gb, c_gr, c_bb = yuv_to_bgr_coeffs(space)
    r = yn + np.float32(c_rr) * cr
    g = yn + np.float32(c_gb) * cb + np.float32(c_gr) * cr
    b = yn + np.float32(c_bb) * cb
    out = jnp.stack([b, g, r], axis=-1)
    return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("space", "full_range", "depth",
                                              "out_h", "out_w"))
def yuv_to_rgb_norm(y: jax.Array, u: jax.Array, v: jax.Array,
                    space: str = "bt2020", full_range: bool = False,
                    depth: int = 10, out_h: int = 0, out_w: int = 0) -> jax.Array:
    """Planar YUV at ANY bit depth -> (H, W, 3) normalized f32 R'G'B'.

    The 10/12-bit AVIF HDR input path: planes arrive as u16 (or u8) and the
    output stays the full-precision coded (nonlinear) signal in [0, 1] for
    hdr_to_sdr to linearize — no 8-bit quantization anywhere (the round-1
    gap vs the reference's dav1d-depth pipeline, avif.cpp:88-199).
    """
    from .jpeg_kernels import upsample_chroma

    out_h = out_h or y.shape[-2]
    out_w = out_w or y.shape[-1]
    yf = y.astype(jnp.float32)
    uf = u.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    if uf.shape[-2:] != (out_h, out_w):
        # subsampled axis -> 2x, full-resolution axis -> 1x (see
        # yuv420_to_bgr: the old >= test corrupted 4:2:2 chroma)
        hf = 2 if uf.shape[-1] < out_w else 1
        vfac = 2 if uf.shape[-2] < out_h else 1
        uf = upsample_chroma(uf, hf, vfac, out_h, out_w)
        vf = upsample_chroma(vf, hf, vfac, out_h, out_w)
    yf = yf[..., :out_h, :out_w]

    step = float(1 << (depth - 8))
    half = float(1 << (depth - 1))
    maxv = float((1 << depth) - 1)
    if full_range:
        yn = yf / np.float32(maxv)
        cb = (uf - np.float32(half)) / np.float32(maxv)
        cr = (vf - np.float32(half)) / np.float32(maxv)
    else:
        yn = (yf - np.float32(16.0 * step)) / np.float32(219.0 * step)
        cb = (uf - np.float32(half)) / np.float32(224.0 * step)
        cr = (vf - np.float32(half)) / np.float32(224.0 * step)

    c_rr, c_gb, c_gr, c_bb = yuv_to_bgr_coeffs(space)
    r = yn + np.float32(c_rr) * cr
    g = yn + np.float32(c_gb) * cb + np.float32(c_gr) * cr
    b = yn + np.float32(c_bb) * cb
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 1.0)


# ---------------------------------------------------------------------------
# HDR transfer functions + tone mapping (avif.cpp:88-199 math)
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("space", "subsample"))
def bgr_to_yuv(bgr: jax.Array, space: str = "bt601",
               subsample: bool = True):
    """(H, W, 3) BGR u8 -> studio-swing planar YUV u8 (the forward of
    yuv420_to_bgr): Y on [16, 235], chroma on [16, 240] around 128;
    subsample=True averages chroma 2x2 (4:2:0, odd edges replicate).
    Feeds the first-party AVIF encoder (codecs/avif_enc.py); the dense
    conversion runs on device per the codec split."""
    kr, kb = KR_KB[space]
    kg = 1.0 - kr - kb
    b = bgr[..., 0].astype(jnp.float32)
    g = bgr[..., 1].astype(jnp.float32)
    r = bgr[..., 2].astype(jnp.float32)
    yf = kr * r + kg * g + kb * b                    # 0..255
    cb = (b - yf) / (2.0 * (1.0 - kb))               # -127.5..127.5
    cr = (r - yf) / (2.0 * (1.0 - kr))
    y = jnp.clip(jnp.round(16.0 + yf * (219.0 / 255.0)), 0, 255)
    if subsample:
        h, w = cb.shape
        ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
        cb = jnp.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
        cr = jnp.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
        cb = (cb[0::2, 0::2] + cb[0::2, 1::2]
              + cb[1::2, 0::2] + cb[1::2, 1::2]) * 0.25
        cr = (cr[0::2, 0::2] + cr[0::2, 1::2]
              + cr[1::2, 0::2] + cr[1::2, 1::2]) * 0.25
    u = jnp.clip(jnp.round(128.0 + cb * (224.0 / 255.0)), 0, 255)
    v = jnp.clip(jnp.round(128.0 + cr * (224.0 / 255.0)), 0, 255)
    return (y.astype(jnp.uint8), u.astype(jnp.uint8),
            v.astype(jnp.uint8))


def pq_to_linear(e: jax.Array) -> jax.Array:
    """SMPTE ST 2084 (PQ) EOTF: normalized signal -> linear (1.0 = 10000 nits)."""
    m1 = 2610.0 / 16384.0
    m2 = 2523.0 / 4096.0 * 128.0
    c1 = 3424.0 / 4096.0
    c2 = 2413.0 / 4096.0 * 32.0
    c3 = 2392.0 / 4096.0 * 32.0
    ep = jnp.power(jnp.maximum(e, 0.0), 1.0 / m2)
    num = jnp.maximum(ep - c1, 0.0)
    den = c2 - c3 * ep
    return jnp.power(num / jnp.maximum(den, 1e-10), 1.0 / m1)


def hlg_to_linear(e: jax.Array) -> jax.Array:
    """ARIB STD-B67 (HLG) inverse OETF (normalized to [0,1] scene light)."""
    a, b, c = 0.17883277, 0.28466892, 0.55991073
    lo = (e * e) / 3.0
    hi = (jnp.exp((e - c) / a) + b) / 12.0
    return jnp.where(e <= 0.5, lo, hi)


# RGB->XYZ primaries matrices (D65), and BT.709 inverse — used to move
# BT.2020/P3 content into BT.709 before tone mapping (avif.cpp:121-199)
_RGB_TO_XYZ = {
    "bt709": np.array([[0.4124564, 0.3575761, 0.1804375],
                       [0.2126729, 0.7151522, 0.0721750],
                       [0.0193339, 0.1191920, 0.9503041]], np.float32),
    "bt2020": np.array([[0.6369580, 0.1446169, 0.1688810],
                        [0.2627002, 0.6779981, 0.0593017],
                        [0.0000000, 0.0280727, 1.0609851]], np.float32),
    "p3": np.array([[0.4865709, 0.2656677, 0.1982173],
                    [0.2289746, 0.6917385, 0.0792869],
                    [0.0000000, 0.0451134, 1.0439444]], np.float32),
    "bt601": np.array([[0.3935891, 0.3652497, 0.1916313],
                       [0.2124132, 0.7010437, 0.0865432],
                       [0.0187423, 0.1119313, 0.9581563]], np.float32),
}


def primaries_to_bt709_matrix(src: str) -> np.ndarray:
    xyz = _RGB_TO_XYZ[src]
    inv709 = np.linalg.inv(_RGB_TO_XYZ["bt709"]).astype(np.float32)
    return (inv709 @ xyz).astype(np.float32)


def reinhard_tonemap(rgb_linear: jax.Array, intensity: float = 0.0,
                     light_adapt: float = 1.0, color_adapt: float = 0.0) -> jax.Array:
    """Global Reinhard operator in the cv::createTonemapReinhard style
    (gamma applied by the caller). rgb_linear: (..., 3) float in [0, 1]."""
    # luminance (Rec.709 weights over RGB order)
    lum = (0.2126 * rgb_linear[..., 0] + 0.7152 * rgb_linear[..., 1]
           + 0.0722 * rgb_linear[..., 2])
    log_mean = jnp.exp(jnp.mean(jnp.log(jnp.maximum(lum, 1e-6))))
    lum_mean = jnp.mean(lum)
    key = (jnp.log(jnp.max(lum) + 1e-6) - jnp.log(log_mean + 1e-6)) / \
          (jnp.log(jnp.max(lum) + 1e-6) - jnp.log(jnp.min(lum) + 1e-6) + 1e-6)
    map_key = 0.3 + 0.7 * jnp.power(key, 1.4)
    intensity_f = jnp.exp(-intensity)
    gl = lum * light_adapt + lum_mean * (1.0 - light_adapt)
    adapt = color_adapt * rgb_linear + (1.0 - color_adapt) * gl[..., None]
    adapt = intensity_f * jnp.power(adapt, map_key)
    out = rgb_linear / (rgb_linear + adapt)
    return jnp.clip(out, 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("transfer", "primaries"))
def hdr_to_sdr(rgb: jax.Array, transfer: str = "pq",
               primaries: str = "bt2020") -> jax.Array:
    """Fused HDR->SDR: normalized HDR RGB -> linearize -> primaries to 709 ->
    Reinhard -> sRGB gamma -> u8 (the ForceSdr pipeline, avif.cpp:88-199)."""
    f = rgb.astype(jnp.float32)
    lin = pq_to_linear(f) if transfer == "pq" else hlg_to_linear(f)
    if primaries != "bt709":
        m = jnp.asarray(primaries_to_bt709_matrix(primaries))
        lin = jnp.einsum("ij,...j->...i", m, lin)
        lin = jnp.clip(lin, 0.0, None)
    # PQ is absolute (1.0 = 10000 nits); expose around SDR white
    if transfer == "pq":
        lin = lin * np.float32(10000.0 / 203.0)
    mapped = reinhard_tonemap(lin)
    srgb = jnp.where(mapped <= 0.0031308,
                     12.92 * mapped,
                     1.055 * jnp.power(mapped, 1.0 / 2.4) - 0.055)
    return jnp.clip(jnp.round(srgb * 255.0), 0, 255).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# libwebp-exact YUV420 conversion (device side of the WebP still fast path)
# ---------------------------------------------------------------------------

def _webp_gamma_tables():
    """libwebp 1.2.x picture_csp_enc.c gamma tables (InitGammaTables):
    chroma downsampling is gamma-corrected — u8 -> 12-bit linear via a
    256-entry pow(0.80) table, 2x2 sum, then back through a 33-entry
    inverse table with 9-bit linear interpolation. Reconstructed from the
    reference formulas and gated BIT-EXACTLY against the system libwebp's
    own import (shim lp_webp_bgra_to_yuv oracle) in tests/test_webp.py."""
    GAMMA_FIX, GAMMA_TAB_FIX = 12, 7
    scale_max = (1 << GAMMA_FIX) - 1                      # 4095
    g2l = np.array([int((v / 255.0) ** 0.80 * scale_max + 0.5)
                    for v in range(256)], np.int64)
    scale = (1 << GAMMA_TAB_FIX) / scale_max
    # libwebp's kLinearToGammaTab holds 1<<(GAMMA_FIX-GAMMA_TAB_FIX)+1 =
    # 33 entries and the interpolation index (s>>9 for s <= 4*4095) can
    # only reach rows 0..31 — a larger table would carry dead rows with
    # values past 255 that don't exist in libwebp
    tab_size = 1 << (GAMMA_FIX - GAMMA_TAB_FIX)           # 32
    l2g = np.array([int(255.0 * (scale * v) ** (1.0 / 0.80) + 0.5)
                    for v in range(tab_size + 1)], np.int64)
    # selection-dot-friendly u8 column splits (values are 12/13-bit; bf16
    # one-hot dots are exact only on u8 columns — recombine hi*256+lo)
    g2l_cols = np.stack([g2l >> 8, g2l & 255], -1).astype(np.uint8)
    # row t of the pair table carries (l2g[t], l2g[t+1])
    l2g_pairs = np.stack([l2g[:-1] >> 8, l2g[:-1] & 255,
                          l2g[1:] >> 8, l2g[1:] & 255], -1).astype(np.uint8)
    return g2l_cols, l2g_pairs


_WEBP_G2L_COLS, _WEBP_L2G_PAIRS = _webp_gamma_tables()


@jax.jit
def webp_yuv420_from_packed(packed: jax.Array):
    """Packed BGRA int32 (..., H, W) -> libwebp-import-identical YUV420.

    Returns (y (..., H, W) u8, u, v (..., ceil(H/2), ceil(W/2)) u8) with
    EXACTLY the values libwebp's own lossy import (ImportYUVAFromRGBA,
    /root/reference webp.cpp:707-751's encode path) would produce from the
    same pixels: per-pixel fixed-point RGBToY, gamma-corrected 2x2 chroma
    accumulation (SUM4/SUM2 edge-duplication semantics fold into plain 2x2
    sums over an edge-replicated pad), VP8ClipUV. That bit-identity is
    what lets the serving still path ship 1.5 B/px of planes over D2H
    instead of 4 B/px of BGRA with byte-identical .webp output (gated in
    tests against the shim oracle and end-to-end).

    All arithmetic is int32-exact; table lookups are u8-column selection
    dots (ops.palette.lut_select), never gathers (~6 ns/element on TPU).
    """
    from .palette import lut_select
    packed = packed.astype(jnp.int32)
    b = packed & 0xFF
    g = (packed >> 8) & 0xFF
    r = (packed >> 16) & 0xFF
    yv = (16839 * r + 33059 * g + 6420 * b
          + ((16 << 16) + (1 << 15))) >> 16
    y_out = yv.astype(jnp.uint8)

    h, w = packed.shape[-2], packed.shape[-1]
    pad = [(0, 0)] * (packed.ndim - 2) + [(0, h & 1), (0, w & 1)]
    g2l = jnp.asarray(_WEBP_G2L_COLS)
    l2g = jnp.asarray(_WEBP_L2G_PAIRS)

    def mapped_sum(chan):
        # u8 -> 12-bit linear (hi/lo selection columns), 2x2 block sum
        cpad = jnp.pad(chan, pad, mode="edge")
        two = lut_select(g2l, cpad).astype(jnp.int32)
        lin = two[..., 0] * 256 + two[..., 1]
        s = (lin[..., 0::2, 0::2] + lin[..., 0::2, 1::2]
             + lin[..., 1::2, 0::2] + lin[..., 1::2, 1::2])
        # LinearToGamma(s, 0): 9-bit interpolation over the pair table
        tab_pos = s >> 9
        x = s & 511
        pair = lut_select(l2g, tab_pos).astype(jnp.int32)
        v0 = pair[..., 0] * 256 + pair[..., 1]
        v1 = pair[..., 2] * 256 + pair[..., 3]
        return (v1 * x + v0 * (512 - x) + 64) >> 7

    ru, gu, bu = mapped_sum(r), mapped_sum(g), mapped_sum(b)

    def clip_uv(uv):
        # non-negative before the shift for all u8 inputs (see VP8ClipUV)
        return jnp.clip((uv + ((1 << 17) + (128 << 18))) >> 18,
                        0, 255).astype(jnp.uint8)

    u_out = clip_uv(-9719 * ru - 19081 * gu + 28800 * bu)
    v_out = clip_uv(28800 * ru - 24116 * gu - 4684 * bu)
    return y_out, u_out, v_out
