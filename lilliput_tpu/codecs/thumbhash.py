"""Thumbhash encoder — the DCT is a pure matmul, so the whole pixel stage
(LPQA channel split + per-channel 2D cosine transform) runs on device.

Behavioral port of the public thumbhash algorithm as the reference embeds it
(/root/reference/thumbhash.cpp:29-277, itself a port of evanw/thumbhash's
rust implementation): nearest-neighbor downsample to <=100px, alpha-weighted
average color, L/P/Q/A planes, triangular-truncated DCT per plane, 4-bit AC
packing behind a 5-6 byte header. Golden-exact against the reference's test
hashes (thumbhash_test.go:63-82).
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import DecodingFailedError
from ..framebuffer import Framebuffer
from ..interfaces import Decoder, Encoder

MAX_DIMENSION = 100
_PI = np.float32(3.14159265)


def _cos_matrix(n_coeff: int, size: int) -> np.ndarray:
    """(n_coeff, size) float32: cos(PI/size * c * (x + 0.5))."""
    c = np.arange(n_coeff, dtype=np.float32)[:, None]
    x = np.arange(size, dtype=np.float32)[None, :] + np.float32(0.5)
    return np.cos(_PI / np.float32(size) * c * x).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("nx", "ny"))
def _dct_grid(channel: jax.Array, nx: int, ny: int):
    """Full (ny, nx) cosine-coefficient grid of a (h, w) plane, mean-normalized."""
    h, w = channel.shape
    cosx = jnp.asarray(_cos_matrix(nx, w))
    cosy = jnp.asarray(_cos_matrix(ny, h))
    f = jnp.einsum("cy,yx,dx->cd", cosy, channel, cosx,
                   preferred_element_type=jnp.float32)
    return f / np.float32(w * h)


def _encode_channel(grid: np.ndarray, nx: int, ny: int):
    """Triangular selection + AC normalization (thumbhash.cpp:41-73)."""
    dc = float(grid[0, 0])
    ac = []
    for cy in range(ny):
        cx = 1 if cy == 0 else 0
        while cx * ny < nx * (ny - cy):
            ac.append(float(grid[cy, cx]))
            cx += 1
    scale = max((abs(v) for v in ac), default=0.0)
    if scale > 0:
        ac = [float(np.float32(0.5) + np.float32(0.5) / np.float32(scale) * np.float32(v))
              for v in ac]
    return dc, ac, scale


@jax.jit
def _lpqa_from_bgra(img: jax.Array):
    f = img.astype(jnp.float32)
    alpha = f[..., 3] * np.float32(1.0 / 255.0)
    ab = alpha * f[..., 0] * np.float32(1.0 / 255.0)
    ag = alpha * f[..., 1] * np.float32(1.0 / 255.0)
    ar = alpha * f[..., 2] * np.float32(1.0 / 255.0)
    suma = jnp.sum(alpha)
    avg_r = jnp.sum(ar) / jnp.maximum(suma, 1e-12)
    avg_g = jnp.sum(ag) / jnp.maximum(suma, 1e-12)
    avg_b = jnp.sum(ab) / jnp.maximum(suma, 1e-12)
    avg_r = jnp.where(suma > 0, avg_r, 0.0)
    avg_g = jnp.where(suma > 0, avg_g, 0.0)
    avg_b = jnp.where(suma > 0, avg_b, 0.0)
    r = avg_r * (1.0 - alpha) + ar
    g = avg_g * (1.0 - alpha) + ag
    b = avg_b * (1.0 - alpha) + ab
    l = (r + g + b) / 3.0
    p = (r + g) / 2.0 - b
    q = r - g
    return l, p, q, alpha, suma


@jax.jit
def _lpqa_from_bgr(img: jax.Array):
    f = img.astype(jnp.float32) * np.float32(1.0 / 255.0)
    b, g, r = f[..., 0], f[..., 1], f[..., 2]
    l = (r + g + b) / 3.0
    p = (r + g) / 2.0 - b
    q = r - g
    return l, p, q


def _round_u(x: float) -> int:
    return int(np.round(np.float32(x)))


@functools.partial(jax.jit, static_argnames=("nx", "ny"))
def _dct_grid_batch(channels: jax.Array, nx: int, ny: int):
    """(B, h, w) planes -> (B, ny, nx) coefficient grids in one dispatch."""
    h, w = channels.shape[-2], channels.shape[-1]
    cosx = jnp.asarray(_cos_matrix(nx, w))
    cosy = jnp.asarray(_cos_matrix(ny, h))
    f = jnp.einsum("cy,byx,dx->bcd", cosy, channels, cosx,
                   preferred_element_type=jnp.float32)
    return f / np.float32(w * h)


def thumbhash_batch(frames) -> list:
    """Thumbhashes for a batch of same-shaped (B, H, W, 4) u8 BGRA images in
    a handful of device dispatches (SURVEY.md §2.1: 'batched thumbhash over
    N images in one dispatch'). Images must already be <=100px per side
    (e.g. spritesheet tiles)."""
    frames = jnp.asarray(frames)
    b, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    l, p, q, a, suma = jax.vmap(_lpqa_from_bgra)(frames)
    # batched DCT grids at the maximum coefficient counts; per-image
    # triangular selection happens host-side in the packer
    gl = np.asarray(_dct_grid_batch(l, 7, 7))
    gp = np.asarray(_dct_grid_batch(p, 3, 3))
    gq = np.asarray(_dct_grid_batch(q, 3, 3))
    ga = np.asarray(_dct_grid_batch(a, 5, 5))
    sums = np.asarray(suma)
    out = []
    m = max(w, h)
    is_landscape = w > h
    for i in range(b):
        has_alpha = float(sums[i]) < float(w * h)
        l_limit = 5 if has_alpha else 7
        lx = max(int(np.round(np.float32(l_limit * w) / np.float32(m))), 1)
        ly = max(int(np.round(np.float32(l_limit * h) / np.float32(m))), 1)
        l_dc, l_ac, l_scale = _encode_channel(gl[i], max(lx, 3), max(ly, 3))
        p_dc, p_ac, p_scale = _encode_channel(gp[i], 3, 3)
        q_dc, q_ac, q_scale = _encode_channel(gq[i], 3, 3)
        if has_alpha:
            a_dc, a_ac, a_scale = _encode_channel(ga[i], 5, 5)
        else:
            a_dc, a_ac, a_scale = 1.0, [], 1.0
        out.append(_pack_hash(has_alpha, is_landscape, lx, ly,
                              l_dc, l_ac, l_scale, p_dc, p_ac, p_scale,
                              q_dc, q_ac, q_scale, a_dc, a_ac, a_scale))
    return out


def _pack_hash(has_alpha, is_landscape, lx, ly, l_dc, l_ac, l_scale,
               p_dc, p_ac, p_scale, q_dc, q_ac, q_scale,
               a_dc, a_ac, a_scale) -> bytes:
    """Header + 4-bit AC packing (thumbhash.cpp:222-268)."""
    header24 = (_round_u(63.0 * l_dc)
                | (_round_u(31.5 + 31.5 * p_dc) << 6)
                | (_round_u(31.5 + 31.5 * q_dc) << 12)
                | (_round_u(31.0 * l_scale) << 18)
                | ((1 << 23) if has_alpha else 0))
    header16 = ((ly if is_landscape else lx)
                | (_round_u(63.0 * p_scale) << 3)
                | (_round_u(63.0 * q_scale) << 9)
                | ((1 << 15) if is_landscape else 0))
    out = bytearray([header24 & 255, (header24 >> 8) & 255, header24 >> 16,
                     header16 & 255, header16 >> 8])
    if has_alpha:
        out.append(_round_u(15.0 * a_dc) | (_round_u(15.0 * a_scale) << 4))
    is_odd = False
    acs = [l_ac, p_ac, q_ac] + ([a_ac] if has_alpha else [])
    for ac in acs:
        for f in ac:
            u = _round_u(15.0 * f)
            if is_odd:
                out[-1] |= u << 4
            else:
                out.append(u)
            is_odd = not is_odd
    return bytes(out)


class ThumbhashEncoder(Encoder):
    """Single-frame encoder producing the <=25-byte thumbhash."""

    def __init__(self, decoded_by: Optional[Decoder] = None):
        del decoded_by  # palette-free; kept for constructor parity

    def encode(self, fb: Optional[Framebuffer], opts: Dict[int, int]) -> Optional[bytes]:
        if fb is None:
            raise DecodingFailedError("thumbhash encoder needs a frame")
        arr = fb.array
        orig_h, orig_w = fb.height, fb.width
        w, h = orig_w, orig_h
        if orig_w > MAX_DIMENSION or orig_h > MAX_DIMENSION:
            aspect = np.float32(orig_w) / np.float32(orig_h)
            if orig_w > orig_h:
                w = MAX_DIMENSION
                h = int(np.float32(w) / aspect)
            else:
                h = MAX_DIMENSION
                w = int(np.float32(h) * aspect)
        # nearest-neighbor gather: orig_i = floor(i * ratio) (thumbhash.cpp:110-130)
        row_ratio = np.float32(orig_h) / np.float32(h)
        col_ratio = np.float32(orig_w) / np.float32(w)
        rows = (np.arange(h, dtype=np.float32) * row_ratio).astype(np.int64)
        cols = (np.arange(w, dtype=np.float32) * col_ratio).astype(np.int64)
        small = jnp.take(jnp.take(arr, jnp.asarray(rows), axis=0),
                         jnp.asarray(cols), axis=1)

        channels = fb.channels
        if channels == 4:
            l, p, q, a, suma = _lpqa_from_bgra(small)
            has_alpha = float(suma) < float(w * h)
        elif channels == 3:
            l, p, q = _lpqa_from_bgr(small)
            a = jnp.ones((h, w), jnp.float32)
            has_alpha = False
        elif channels == 1:
            l = small[..., 0].astype(jnp.float32) * np.float32(1.0 / 255.0)
            p = jnp.zeros((h, w), jnp.float32)
            q = jnp.zeros((h, w), jnp.float32)
            a = jnp.ones((h, w), jnp.float32)
            has_alpha = False
        else:
            raise DecodingFailedError("unsupported channel count for thumbhash")

        l_limit = 5 if has_alpha else 7
        m = max(w, h)
        lx = max(int(np.round(np.float32(l_limit * w) / np.float32(m))), 1)
        ly = max(int(np.round(np.float32(l_limit * h) / np.float32(m))), 1)

        l_dc, l_ac, l_scale = _encode_channel(
            np.asarray(_dct_grid(l, max(lx, 3), max(ly, 3))), max(lx, 3), max(ly, 3))
        p_dc, p_ac, p_scale = _encode_channel(np.asarray(_dct_grid(p, 3, 3)), 3, 3)
        q_dc, q_ac, q_scale = _encode_channel(np.asarray(_dct_grid(q, 3, 3)), 3, 3)
        if has_alpha:
            a_dc, a_ac, a_scale = _encode_channel(np.asarray(_dct_grid(a, 5, 5)), 5, 5)
        else:
            a_dc, a_ac, a_scale = 1.0, [], 1.0

        return _pack_hash(has_alpha, w > h, lx, ly,
                          l_dc, l_ac, l_scale, p_dc, p_ac, p_scale,
                          q_dc, q_ac, q_scale, a_dc, a_ac, a_scale)
