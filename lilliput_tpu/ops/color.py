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
        hf = 2 if uf.shape[-1] * 2 >= out_w else 1
        vf_fac = 2 if uf.shape[-2] * 2 >= out_h else 1
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
        hf = 2 if uf.shape[-1] * 2 >= out_w else 1
        vfac = 2 if uf.shape[-2] * 2 >= out_h else 1
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
