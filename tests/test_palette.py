"""Direct gates for ops.palette.composite_animation: the packed-int32,
colors-hoisted scan must be byte-identical to a pure-numpy sequential
reference implementing the giflib dispose/draw semantics
(/root/reference/giflib.cpp:400-541) frame by frame."""
import numpy as np
import pytest

from lilliput_tpu.ops import palette as P


def _reference(idx, drawn, luts, counts, trans, pdisp, prects, bg):
    n, h, w = idx.shape
    canvas = np.broadcast_to(bg.astype(np.uint8), (h, w, 4)).copy()
    prev = np.zeros((h, w, 4), np.uint8)
    out = np.empty((n, h, w, 4), np.uint8)
    for k in range(n):
        m = prects[k][..., None]
        if pdisp[k] == 2:
            canvas = np.where(m, bg.astype(np.uint8), canvas)
        elif pdisp[k] == 3:
            canvas = np.where(m, prev, canvas)
        prev = np.zeros_like(canvas) if k == 0 else canvas.copy()
        i32 = idx[k].astype(np.int32)
        color = luts[k][np.minimum(i32, 255)]
        valid = drawn[k] & (i32 != trans[k]) & (i32 < counts[k])
        canvas = np.where(valid[..., None], color, canvas)
        out[k] = canvas
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_composite_animation_matches_numpy_reference(seed):
    rng = np.random.default_rng(seed)
    n, h, w = 7, 21, 33
    idx = rng.integers(0, 256, (n, h, w), np.uint8)
    drawn = rng.integers(0, 2, (n, h, w)).astype(bool)
    luts = rng.integers(0, 256, (n, 256, 4), np.uint8)
    luts[..., 3] = 255
    counts = rng.integers(1, 257, (n,)).astype(np.int32)
    trans = rng.integers(-1, 256, (n,)).astype(np.int32)
    pdisp = rng.integers(0, 4, (n,)).astype(np.int32)
    pdisp[0] = 0
    prects = np.zeros((n, h, w), bool)
    for k in range(1, n):
        y0, x0 = rng.integers(0, h - 1), rng.integers(0, w - 1)
        y1 = rng.integers(y0 + 1, h + 1)
        x1 = rng.integers(x0 + 1, w + 1)
        prects[k, y0:y1, x0:x1] = True
    bg = rng.integers(0, 256, (4,)).astype(np.uint8)

    got = np.asarray(P.composite_animation(
        idx, drawn, luts, counts, trans, pdisp, prects, bg))
    want = _reference(idx, drawn, luts, counts, trans, pdisp, prects, bg)
    assert np.array_equal(got, want)


def test_composite_first_frame_dispose_previous_restores_zeros():
    """giflib saves prev only from frame 2 on: a frame-2 DISPOSE_PREVIOUS
    after frame 1 restores transparent black, not the background."""
    n, h, w = 2, 4, 4
    idx = np.zeros((n, h, w), np.uint8)
    drawn = np.zeros((n, h, w), bool)
    drawn[0] = True  # frame 0 paints everything with palette entry 0
    luts = np.zeros((n, 256, 4), np.uint8)
    luts[:, 0] = (10, 20, 30, 255)
    counts = np.array([1, 1], np.int32)
    trans = np.array([-1, -1], np.int32)
    pdisp = np.array([0, 3], np.int32)  # frame 1 disposes frame 0 to PREV
    prects = np.zeros((n, h, w), bool)
    prects[1] = True
    bg = np.array([1, 2, 3, 4], np.uint8)
    out = np.asarray(P.composite_animation(
        idx, drawn, luts, counts, trans, pdisp, prects, bg))
    assert np.array_equal(out[0][0, 0], (10, 20, 30, 255))
    assert np.array_equal(out[1][0, 0], (0, 0, 0, 0))  # zeros, not bg


def test_composite_indexed_frame_matches_streaming_semantics():
    """composite_indexed_frame is the device form of the streaming
    numpy composite in codecs/gif.py (whose comments cite its
    bounds-check contract): transparent and out-of-palette indices keep
    the canvas pixel, first_frame starts from the background fill.
    Gated here so the claimed contract is enforced, not just asserted
    in comments (review finding: the function had no callers or tests)."""
    import jax.numpy as jnp
    rng = np.random.default_rng(4)
    h, w, pc = 13, 17, 5
    canvas = rng.integers(0, 256, (h, w, 4), np.uint8)
    idx = rng.integers(0, 8, (h, w), np.uint8)       # some >= pal_count
    drawn = rng.integers(0, 2, (h, w)).astype(bool)
    lut = rng.integers(0, 256, (pc, 4), np.uint8)
    bg = np.array([9, 8, 7, 255], np.uint8)
    trans = 2
    for first in (False, True):
        got = np.asarray(P.composite_indexed_frame(
            jnp.asarray(canvas), jnp.asarray(idx), jnp.asarray(drawn),
            jnp.asarray(lut), jnp.asarray(np.int32(trans)), True,
            jnp.asarray(bg), first))
        base = (np.broadcast_to(bg, (h, w, 4)) if first else canvas)
        i32 = idx.astype(np.int32)
        valid = drawn & (i32 < pc) & (i32 != trans)
        color = lut[np.minimum(i32, pc - 1)]
        want = np.where(valid[..., None], color, base)
        np.testing.assert_array_equal(got, want)
