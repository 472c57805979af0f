"""Orientation and compositing primitives vs reference semantics."""
import numpy as np
import pytest

import jax.numpy as jnp

from lilliput_tpu.ops import blend as B
from lilliput_tpu.ops import orient as O

RNG = np.random.default_rng(7)


def test_orientation_roundtrip_shapes():
    img = jnp.asarray(RNG.integers(0, 256, (5, 9, 4), dtype=np.uint8))
    for o in range(1, 9):
        out = O.orient(img, o)
        if O.swaps_dimensions(o):
            assert out.shape == (9, 5, 4)
        else:
            assert out.shape == (5, 9, 4)


def test_orientation_cases():
    img = np.arange(6, dtype=np.uint8).reshape(2, 3, 1)
    j = jnp.asarray(img)
    assert np.array_equal(np.asarray(O.orient(j, 2)), img[:, ::-1])      # mirror H
    assert np.array_equal(np.asarray(O.orient(j, 3)), img[::-1, ::-1])   # rot180
    assert np.array_equal(np.asarray(O.orient(j, 4)), img[::-1, :])      # mirror V
    assert np.array_equal(np.asarray(O.orient(j, 5)), img.transpose(1, 0, 2))
    # orientation 6 = rotate 90 CW: out[y,x] = in[H-1-x, y]
    r90 = np.rot90(img, k=-1)
    assert np.array_equal(np.asarray(O.orient(j, 6)), r90)
    r270 = np.rot90(img, k=1)
    assert np.array_equal(np.asarray(O.orient(j, 8)), r270)


def _blend_ref(dst, src):
    """Reference float math from opencv.cpp:494-515."""
    sa = src[..., 3:4].astype(np.float64) / 255.0
    da = dst[..., 3:4].astype(np.float64) / 255.0
    oa = sa + da * (1 - sa)
    num = src[..., :3] / 255.0 * sa + dst[..., :3] / 255.0 * da * (1 - sa)
    with np.errstate(invalid="ignore"):
        rgb = np.where(oa > 0, num / np.where(oa > 0, oa, 1), 0.0)
    out = np.concatenate([rgb, oa], axis=-1)
    return np.clip(np.rint(out * 255.0), 0, 255).astype(np.uint8)


def test_alpha_blend_matches_float_reference():
    dst = RNG.integers(0, 256, (16, 16, 4), dtype=np.uint8)
    src = RNG.integers(0, 256, (16, 16, 4), dtype=np.uint8)
    out = np.asarray(B.alpha_blend_full(jnp.asarray(dst), jnp.asarray(src)))
    ref = _blend_ref(dst, src)
    # float32 vs float64 rounding: allow 1 ulp at exact-half boundaries
    assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1


def test_alpha_blend_opaque_src_replaces():
    dst = RNG.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    src = RNG.integers(0, 256, (8, 8, 4), dtype=np.uint8).copy()
    src[..., 3] = 255
    out = np.asarray(B.alpha_blend_full(jnp.asarray(dst), jnp.asarray(src)))
    assert np.array_equal(out, src)


def test_alpha_blend_transparent_src_keeps_dst():
    dst = RNG.integers(0, 256, (8, 8, 4), dtype=np.uint8)
    src = np.zeros((8, 8, 4), dtype=np.uint8)
    out = np.asarray(B.alpha_blend_full(jnp.asarray(dst), jnp.asarray(src)))
    assert np.array_equal(out, dst)


def test_copy_to_region_and_clear():
    dst = jnp.zeros((10, 10, 4), jnp.uint8)
    src = jnp.full((4, 4, 4), 200, jnp.uint8)
    out = B.copy_to_region(dst, src, 2, 3, 4, 4)
    o = np.asarray(out)
    assert (o[3:7, 2:6] == 200).all()
    assert o.sum() == 200 * 4 * 4 * 4
    cleared = np.asarray(B.clear_to_transparent(out, 2, 3, 4, 4))
    assert cleared.sum() == 0


def test_copy_channel_conversion():
    dst = jnp.zeros((6, 6, 4), jnp.uint8)
    src = jnp.full((2, 2, 3), 77, jnp.uint8)
    out = np.asarray(B.copy_to_region(dst, src, 0, 0, 2, 2))
    assert (out[:2, :2, :3] == 77).all() and (out[:2, :2, 3] == 255).all()


def test_fit_crop_math():
    """Fit semantics from opencv.go:316-364 on a known geometry."""
    from lilliput_tpu.framebuffer import Framebuffer
    img = RNG.integers(0, 256, (100, 200, 4), dtype=np.uint8)
    fb = Framebuffer.from_array(img)
    out = fb.fit(50, 50)
    assert (out.height, out.width) == (50, 50)
    # crop should be the center 100x100
    import cv2
    expect = cv2.resize(img[:, 50:150], (50, 50), interpolation=cv2.INTER_AREA)
    assert np.array_equal(out.to_numpy(), expect)


def test_calculate_expected_size_quirks():
    from lilliput_tpu.imageops import calculate_expected_size as ces
    assert ces(100, 50, 80, 80) == (50, 50)     # big square -> min dim
    assert ces(100, 50, 200, 100) == (100, 50)  # both larger, non-square
    assert ces(100, 50, 40, 20) == (40, 20)     # normal
    assert ces(100, 50, 30, 30) == (30, 30)     # small square passes through
