"""Decode-megakernel parity: the fused Pallas coefficient->BGRA kernels
(ops/pallas_kernels.decode{420,422,440,444}_packed) must be bit-identical
to the split dequant_idct + upsample_chroma + ycbcr_to_bgr path on every
subsampling/odd-geometry case (interpret mode on CPU; the real-TPU numerics
check runs in bench.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lilliput_tpu.codecs.jpeg import scaled_qtables
from lilliput_tpu.ops import jpeg_kernels as K


def _bl(n: int, f: int) -> int:
    """Block count along one axis for a plane subsampled by f."""
    return (-(-n // f) + 7) // 8


def _sub_factors(sub):
    return (2 if sub in ("420", "422") else 1,   # horizontal
            2 if sub in ("420", "440") else 1)   # vertical


def _coefs(rng, h, w, sub, batch=2):
    fh, fv = _sub_factors(sub)
    yc = rng.integers(-300, 300, (batch, _bl(h, 1), _bl(w, 1), 64)).astype(np.int16)
    cb = rng.integers(-200, 200, (batch, _bl(h, fv), _bl(w, fh), 64)).astype(np.int16)
    cr = rng.integers(-200, 200, (batch, _bl(h, fv), _bl(w, fh), 64)).astype(np.int16)
    return yc, cb, cr


CASES = [(64, 48), (67, 61), (16, 16), (130, 17), (8, 8), (24, 129)]


@pytest.mark.parametrize("h,w", CASES)
@pytest.mark.parametrize("sub", ["420", "444", "422", "440"])
def test_megakernel_matches_split_path(h, w, sub):
    rng = np.random.default_rng(42)
    yc, cb, cr = _coefs(rng, h, w, sub)
    qy, qc = scaled_qtables(85)
    fh, fv = _sub_factors(sub)
    h2, v2 = fh == 2, fv == 2
    args = (jnp.asarray(yc), jnp.asarray(cb), jnp.asarray(cr),
            jnp.asarray(qy), jnp.asarray(qc))
    ref = K.decode_ycc_420(*args, h, w, h2, v2)  # CPU default: split path
    got = K._decode_ycc_megakernel(*args, h, w, h2, v2, interpret=True)
    assert got is not None
    assert got.shape == ref.shape == (2, h, w, 3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("mode", ["mm", "mm3", "roll"])
@pytest.mark.parametrize("sub", ["420", "422", "440"])
def test_expand_modes_bit_identical(sub, mode, monkeypatch):
    """All three upsample-expansion strategies (HIGHEST selection matmuls,
    3x-bf16 _sel_dot_exact, VPU lane rolls) must match the split path."""
    monkeypatch.setenv("LILLIPUT_EXPAND", mode)
    rng = np.random.default_rng(17)
    h, w = 43 + {"mm": 0, "mm3": 8, "roll": 16}[mode], 53
    yc, cb, cr = _coefs(rng, h, w, sub)
    qy, qc = scaled_qtables(80)
    fh, fv = _sub_factors(sub)
    args = (jnp.asarray(yc), jnp.asarray(cb), jnp.asarray(cr),
            jnp.asarray(qy), jnp.asarray(qc))
    ref = K.decode_ycc_420(*args, h, w, fh == 2, fv == 2)
    got = K._decode_ycc_megakernel(*args, h, w, fh == 2, fv == 2,
                                   interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_megakernel_per_image_qtables():
    """Serving path: each image dequantizes with its OWN tables."""
    rng = np.random.default_rng(7)
    h, w = 67, 61
    yc, cb, cr = _coefs(rng, h, w, "420", batch=3)
    qy = np.stack([scaled_qtables(q)[0] for q in (30, 85, 95)])
    qc = np.stack([scaled_qtables(q)[1] for q in (30, 85, 95)])
    args = (jnp.asarray(yc), jnp.asarray(cb), jnp.asarray(cr),
            jnp.asarray(qy), jnp.asarray(qc))
    ref = K.decode_ycc_420(*args, h, w, True, True)
    got = K._decode_ycc_megakernel(*args, h, w, True, True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # per-image tables actually matter: image 0 at q30 differs from q85
    ref_q85 = K.decode_ycc_420(
        args[0], args[1], args[2],
        jnp.asarray(scaled_qtables(85)[0]), jnp.asarray(scaled_qtables(85)[1]),
        h, w, True, True)
    assert not np.array_equal(np.asarray(got[0]), np.asarray(ref_q85[0]))


def test_megakernel_unbatched_lead():
    """Streaming decoder shape: no leading batch axis."""
    rng = np.random.default_rng(3)
    h, w = 40, 56
    yc, cb, cr = _coefs(rng, h, w, "420", batch=1)
    qy, qc = scaled_qtables(75)
    args = (jnp.asarray(yc[0]), jnp.asarray(cb[0]), jnp.asarray(cr[0]),
            jnp.asarray(qy), jnp.asarray(qc))
    ref = K.decode_ycc_420(*args, h, w, True, True)
    got = K._decode_ycc_megakernel(*args, h, w, True, True, interpret=True)
    assert got.shape == (h, w, 3)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_megakernel_declines_shape_mismatch():
    """Coefficient shapes inconsistent with the declared subsampling fall
    back to the split path (returns None) instead of mis-decoding."""
    rng = np.random.default_rng(1)
    h, w = 32, 32
    yc = rng.integers(-100, 100, (1, 4, 4, 64)).astype(np.int16)
    cbh = rng.integers(-100, 100, (1, 2, 2, 64)).astype(np.int16)
    qy, qc = scaled_qtables(85)
    # 4:2:2 claims chroma rows == luma rows; these are halved -> decline
    got = K._decode_ycc_megakernel(
        jnp.asarray(yc), jnp.asarray(cbh), jnp.asarray(cbh),
        jnp.asarray(qy), jnp.asarray(qc), h, w, True, False)
    assert got is None


def test_plane_blocks_declines_shape_mismatch():
    """decode_ycc_u8_plane_blocks mirrors decode_ycc_packed's shape gate:
    off-spec '4:2:0' arrays (full-res chroma, or Cb != Cr shapes) return
    None so _fused_jpeg_fit_impl falls through to the packed/split paths
    instead of producing zero-padded blocks or a trace-time pad error."""
    rng = np.random.default_rng(2)
    yc = jnp.asarray(rng.integers(-100, 100, (1, 4, 4, 64)).astype(np.int16))
    full = jnp.asarray(rng.integers(-100, 100, (1, 4, 4, 64)).astype(np.int16))
    half = jnp.asarray(rng.integers(-100, 100, (1, 2, 2, 64)).astype(np.int16))
    qy, qc = (jnp.asarray(q) for q in scaled_qtables(85))
    # claims 4:2:0 but chroma is full-res
    assert K.decode_ycc_u8_plane_blocks(yc, full, full, qy, qc,
                                        True, True) is None
    # Cb and Cr shapes disagree
    assert K.decode_ycc_u8_plane_blocks(yc, half, full, qy, qc,
                                        True, True) is None
    # well-formed 4:2:0 still dispatches
    assert K.decode_ycc_u8_plane_blocks(yc, half, half, qy, qc, True, True,
                                        interpret=True) is not None


def test_planar_resize_matches_channel_resize():
    """resize_area_mxu_plane on separate planes must match resize_area_mxu
    on the stacked image within the +-1 contract (and exactly on CPU)."""
    from lilliput_tpu.ops import resize as R
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, (2, 96, 128, 3), np.uint8)
    ref = np.asarray(R.resize_area_mxu(jnp.asarray(img), 40, 24))
    planes = [jnp.asarray(img[..., c], jnp.float32) for c in range(3)]
    got = [np.clip(np.round(np.asarray(
        R.resize_area_mxu_plane(p, 40, 24))), 0, 255).astype(np.uint8)
        for p in planes]
    for c in range(3):
        d = np.abs(ref[..., c].astype(int) - got[c].astype(int))
        assert d.max() <= 1
        assert np.array_equal(ref[..., c], got[c])  # exact on CPU


def test_planar_encode_matches_channel_encode():
    from lilliput_tpu.codecs.jpeg import scaled_qtables
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (2, 64, 80, 3), np.uint8)
    qy, qc = scaled_qtables(85)
    ref = K.encode_from_bgr(jnp.asarray(img), jnp.asarray(qy), jnp.asarray(qc))
    got = K.encode_from_bgr_planes(
        jnp.asarray(img[..., 0], jnp.float32),
        jnp.asarray(img[..., 1], jnp.float32),
        jnp.asarray(img[..., 2], jnp.float32),
        jnp.asarray(qy), jnp.asarray(qc))
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_block_tail_pieces_match_planar_tail():
    """The u8-block serving tail: decode_ycc_u8_plane_blocks' block-vector
    channel planes must reconstruct the exact u8 pixels, and the
    crop-embedded resize matrices (area_matrix_embedded) must equal
    crop-then-resize exactly (identical taps, identical contraction)."""
    from lilliput_tpu.ops import pallas_kernels as PK
    from lilliput_tpu.ops import resize as R
    rng = np.random.default_rng(14)
    h, w = 131, 157                       # odd geometry, non-divisor blocks
    yc, cb, cr = _coefs(rng, h, w, "420")
    qy, qc = scaled_qtables(85)
    args = (jnp.asarray(yc), jnp.asarray(cb), jnp.asarray(cr),
            jnp.asarray(qy), jnp.asarray(qc))
    bgr = K._decode_ycc_megakernel(*args, h, w, True, True, interpret=True)
    planes = K.decode_ycc_u8_plane_blocks(*args, True, True, interpret=True)
    assert planes is not None and len(planes) == 3
    b2, rb, two, cbw, lanes = planes[0].shape
    assert (two, lanes) == (2, 128)
    assert planes[0].dtype == jnp.uint8

    # 1. u8 channel block planes reconstruct the exact pixels
    for c in range(3):
        blk = np.asarray(planes[c]).reshape(b2, 2 * rb, 2 * cbw, 64)
        plane = np.asarray(PK._blocks_to_plane_xla(
            jnp.asarray(blk), 2 * rb, 2 * cbw))
        np.testing.assert_array_equal(plane[:, :h, :w],
                                      np.asarray(bgr[..., c]))

    # 2. crop folded into the axis matrices == crop-then-resize (exact)
    top, left, ch_, cw_ = 3, 5, 96, 144
    dst_w, dst_h = 40, 24
    blk0 = np.asarray(planes[0]).reshape(b2, 2 * rb, 2 * cbw, 64)
    full = np.asarray(PK._blocks_to_plane_xla(
        jnp.asarray(blk0), 2 * rb, 2 * cbw))
    mw = R.area_matrix_embedded(cbw * 16, left, cw_, dst_w)
    mh = R.area_matrix_embedded(rb * 16, top, ch_, dst_h)
    got = np.clip(np.round(np.asarray(
        R.resize_area_plane_mat(jnp.asarray(full, jnp.float32), mw, mh))),
        0, 255)
    refp = np.clip(np.round(np.asarray(R.resize_area_mxu_plane(
        jnp.asarray(full[:, top:top + ch_, left:left + cw_], jnp.float32),
        dst_w, dst_h))), 0, 255)
    assert np.abs(got - refp).max() <= 1


def test_decode_ycc_packed_matches_bgr():
    """Packed int32 decode equals the BGR megakernel output per channel."""
    rng = np.random.default_rng(13)
    h, w = 67, 61
    yc, cb, cr = _coefs(rng, h, w, "420")
    qy, qc = scaled_qtables(85)
    args = (jnp.asarray(yc), jnp.asarray(cb), jnp.asarray(cr),
            jnp.asarray(qy), jnp.asarray(qc))
    bgr = K._decode_ycc_megakernel(*args, h, w, True, True, interpret=True)
    packed = K.decode_ycc_packed(*args, h, w, True, True, interpret=True)
    bp, gp, rp = K.packed_to_planes(packed)
    np.testing.assert_array_equal(np.asarray(bgr[..., 0]),
                                  np.asarray(bp).astype(np.uint8))
    np.testing.assert_array_equal(np.asarray(bgr[..., 1]),
                                  np.asarray(gp).astype(np.uint8))
    np.testing.assert_array_equal(np.asarray(bgr[..., 2]),
                                  np.asarray(rp).astype(np.uint8))


def test_mxu_planes_within_1():
    """decode_ycc_planes_mxu (the env-gated raster MXU decode experiment)
    carries a GUARANTEED ≤1-u8 bound vs the bit-identical split path: the
    matmul triangle upsample's W pass is bit-exact (power-of-2 scaling
    commutes with f32 rounding) and the H pass's unclipped int16 round is
    a ±0.5 chroma deviation bounded by 1.772*0.5 < 1 after color —
    asserted here on adversarial random coefficients."""
    from lilliput_tpu.codecs.jpeg import scaled_qtables as sq
    worst = 0
    for seed in range(4):
        rng = np.random.default_rng(seed)
        for (ybh, ybw) in [(18, 24), (17, 13), (4, 4)]:
            cbh, cbw = -(-ybh // 2), -(-ybw // 2)
            rh, rw = ybh * 8, ybw * 8
            yc = jnp.asarray(rng.integers(
                -400, 400, (2, ybh, ybw, 64)).astype(np.int16))
            cb = jnp.asarray(rng.integers(
                -400, 400, (2, cbh, cbw, 64)).astype(np.int16))
            cr = jnp.asarray(rng.integers(
                -400, 400, (2, cbh, cbw, 64)).astype(np.int16))
            qy, qc = (jnp.asarray(np.asarray(q)) for q in sq(85))
            ref = np.asarray(K.decode_ycc_420(yc, cb, cr, qy, qc, rh, rw,
                                              True, True))
            out = K.decode_ycc_planes_mxu(yc, cb, cr, qy, qc, rh, rw,
                                          True, True)
            got = np.stack([np.asarray(p) for p in out], axis=-1)
            worst = max(worst, int(np.abs(
                got.astype(int) - ref[..., :3].astype(int)).max()))
    assert worst <= 1, worst
    # declines non-4:2:0
    assert K.decode_ycc_planes_mxu(yc, cb, cr, qy, qc, 32, 32,
                                   True, False) is None
