"""EXIF orientation normalization on device.

Replaces ``cv::OrientationTransform`` (patched OpenCV API, used by the
reference at /root/reference/opencv.cpp:211-215 via
``Framebuffer.OrientationTransform`` /root/reference/opencv.go:261-269).

The 8 EXIF orientations (opencv.hpp:17-26) lower to transpose/flip
combinations, which XLA compiles to pure layout/copy ops on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# EXIF orientation codes (matching the reference's ImageOrientation enum).
ORIENTATION_TOP_LEFT = 1      # identity
ORIENTATION_TOP_RIGHT = 2     # mirror horizontal
ORIENTATION_BOTTOM_RIGHT = 3  # rotate 180
ORIENTATION_BOTTOM_LEFT = 4   # mirror vertical
ORIENTATION_LEFT_TOP = 5      # mirror horizontal + rotate 270 CW (transpose)
ORIENTATION_RIGHT_TOP = 6     # rotate 90 CW
ORIENTATION_RIGHT_BOTTOM = 7  # mirror horizontal + rotate 90 CW (anti-transpose)
ORIENTATION_LEFT_BOTTOM = 8   # rotate 270 CW


def swaps_dimensions(orientation: int) -> bool:
    """True when the transform swaps width and height (orientations 5-8)."""
    return orientation >= ORIENTATION_LEFT_TOP


def orient(img: jax.Array, orientation: int) -> jax.Array:
    """Apply the EXIF orientation transform to (..., H, W, C).

    The output is upright (orientation 1). Static dispatch: the orientation is
    a Python int, so each case traces to a fixed transpose/flip program.
    """
    o = int(orientation)
    if o <= ORIENTATION_TOP_LEFT or o > ORIENTATION_LEFT_BOTTOM:
        return img
    if o == ORIENTATION_TOP_RIGHT:
        return jnp.flip(img, axis=-2)
    if o == ORIENTATION_BOTTOM_RIGHT:
        return jnp.flip(jnp.flip(img, axis=-2), axis=-3)
    if o == ORIENTATION_BOTTOM_LEFT:
        return jnp.flip(img, axis=-3)
    t = jnp.swapaxes(img, -3, -2)
    if o == ORIENTATION_LEFT_TOP:
        return t
    if o == ORIENTATION_RIGHT_TOP:
        return jnp.flip(t, axis=-2)
    if o == ORIENTATION_RIGHT_BOTTOM:
        return jnp.flip(jnp.flip(t, axis=-2), axis=-3)
    return jnp.flip(t, axis=-3)  # LEFT_BOTTOM: rotate 270 CW
