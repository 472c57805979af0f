"""Frame compositing primitives on device.

Replaces the reference's region copy / alpha-blend / clear shims
(/root/reference/opencv.cpp:432-628 ``opencv_copy_to_region_with_alpha``,
``opencv_copy_to_region``; :384-418 ``opencv_mat_clear_to_transparent``),
used by ``ImageOps`` animated compositing (/root/reference/ops.go:431-461).

Semantics preserved exactly:

* alpha blend is straight (non-premultiplied) source-over in float32:
  ``out_a = sa + da*(1-sa)``, ``out_rgb = (src*sa + dst*da*(1-sa)) / out_a``
  with 0/0 -> 0, then saturate back to u8 with round-half-even
  (``convertTo CV_8U`` uses cvRound).
* plain copy overwrites the destination rect (with channel conversion and an
  INTER_LINEAR resize when the source does not match the rect size).
* clear_to_transparent zeroes the rect (all channels, including alpha).

Offsets/sizes are static Python ints (animation frame rects are known on the
host before dispatch), so XLA sees fixed slices and fuses the whole
dispose->blend->resize chain of a frame into one program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .resize import resize, LINEAR


def _round_u8(x):
    return jnp.clip(jnp.round(x), 0.0, 255.0).astype(jnp.uint8)


def to_bgra(img: jax.Array) -> jax.Array:
    """Convert 1/3/4-channel u8 image to 4-channel (alpha=255)."""
    c = img.shape[-1]
    if c == 4:
        return img
    if c == 3:
        alpha = jnp.full(img.shape[:-1] + (1,), 255, img.dtype)
        return jnp.concatenate([img, alpha], axis=-1)
    if c == 1:
        alpha = jnp.full(img.shape[:-1] + (1,), 255, img.dtype)
        return jnp.concatenate([img, img, img, alpha], axis=-1)
    raise ValueError(f"unsupported channel count {c}")


def to_channels(img: jax.Array, channels: int) -> jax.Array:
    """Convert between 1/3/4 channel counts (BGRA drop/add alpha, gray expand)."""
    c = img.shape[-1]
    if c == channels:
        return img
    if channels == 4:
        return to_bgra(img)
    if channels == 3:
        if c == 4:
            return img[..., :3]
        if c == 1:
            return jnp.concatenate([img, img, img], axis=-1)
    raise ValueError(f"cannot convert {c} -> {channels} channels")


def alpha_blend_full(dst: jax.Array, src: jax.Array) -> jax.Array:
    """Source-over blend of equal-shaped 4-channel u8 images (float math)."""
    inv255 = jnp.float32(1.0 / 255.0)
    sa = src[..., 3:4].astype(jnp.float32) * inv255
    da = dst[..., 3:4].astype(jnp.float32) * inv255
    sc = src[..., :3].astype(jnp.float32) * inv255
    dc = dst[..., :3].astype(jnp.float32) * inv255
    one_minus_sa = 1.0 - sa
    out_a = sa + da * one_minus_sa
    num = sc * sa + dc * da * one_minus_sa
    rgb = jnp.where(out_a > 0.0, num / jnp.where(out_a > 0.0, out_a, 1.0), 0.0)
    out = jnp.concatenate([rgb, out_a], axis=-1)
    return _round_u8(out * 255.0)


def copy_to_region_with_alpha(dst: jax.Array, src: jax.Array,
                              x: int, y: int, w: int, h: int) -> jax.Array:
    """Alpha-blend src into dst[y:y+h, x:x+w]; returns the new dst."""
    if src.shape[-3] != h or src.shape[-2] != w:
        src = resize(src, w, h, LINEAR)
    src4 = to_bgra(src)
    dst4 = to_bgra(dst)
    region = dst4[..., y:y + h, x:x + w, :]
    blended = alpha_blend_full(region, src4)
    out4 = dst4.at[..., y:y + h, x:x + w, :].set(blended)
    return to_channels(out4, dst.shape[-1])


def copy_to_region(dst: jax.Array, src: jax.Array,
                   x: int, y: int, w: int, h: int) -> jax.Array:
    """Overwrite dst[y:y+h, x:x+w] with src (resize/convert as needed)."""
    if src.shape[-3] != h or src.shape[-2] != w:
        src = resize(src, w, h, LINEAR)
    src = to_channels(src, dst.shape[-1])
    return dst.at[..., y:y + h, x:x + w, :].set(src)


def clear_to_transparent(img: jax.Array, x: int, y: int, w: int, h: int) -> jax.Array:
    """Zero out the rect (transparent black)."""
    return img.at[..., y:y + h, x:x + w, :].set(jnp.zeros((), img.dtype))


def crop(img: jax.Array, x: int, y: int, w: int, h: int) -> jax.Array:
    """Static crop (cv::Mat ROI equivalent, opencv.cpp:204-209)."""
    return img[..., y:y + h, x:x + w, :]


def set_color(img: jax.Array, bgra) -> jax.Array:
    """Fill the whole image with a color (opencv_mat_set_color)."""
    c = img.shape[-1]
    col = jnp.asarray(bgra[:c], img.dtype)
    return jnp.broadcast_to(col, img.shape)
