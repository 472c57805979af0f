"""Direct gates for ops.color's chroma upsample factor selection
(regression: `shape*2 >= out` classified FULL-height 4:2:2 chroma as
vertically subsampled, doubling it and truncating to the top half —
wrong colors in the bottom half of every yuv422p video frame and 4:2:2
HDR AVIF; review finding, fixed to `shape < out`)."""
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from lilliput_tpu.ops import color as C  # noqa: E402
from lilliput_tpu.ops.jpeg_kernels import upsample_chroma  # noqa: E402


def _case(h, w, ch, cw, depth=8, seed=0):
    rng = np.random.default_rng(seed)
    mx = (1 << depth) - 1
    dt = np.uint8 if depth == 8 else np.uint16
    y = rng.integers(0, mx + 1, (h, w)).astype(dt)
    u = rng.integers(0, mx + 1, (ch, cw)).astype(dt)
    v = rng.integers(0, mx + 1, (ch, cw)).astype(dt)
    return y, u, v


# (name, chroma dims as fn of (h, w), expected (hf, vf))
_SUBS = [
    ("420", lambda h, w: ((h + 1) // 2, (w + 1) // 2), (2, 2)),
    ("422", lambda h, w: (h, (w + 1) // 2), (2, 1)),   # FULL height
    ("440", lambda h, w: ((h + 1) // 2, w), (1, 2)),   # FULL width
]


@pytest.mark.parametrize("name,cdims,fac", _SUBS, ids=lambda x: str(x))
def test_yuv420_to_bgr_factor_selection(name, cdims, fac):
    """The function must apply exactly the (hf, vf) the chroma geometry
    implies: result equals manually upsampling chroma to full resolution
    with upsample_chroma(hf, vf) and converting with full-res chroma."""
    h, w = 22, 30
    ch, cw = cdims(h, w)
    y, u, v = _case(h, w, ch, cw)
    got = np.asarray(C.yuv420_to_bgr(jnp.asarray(y), jnp.asarray(u),
                                     jnp.asarray(v), out_h=h, out_w=w))
    hf, vf = fac
    uf = upsample_chroma(jnp.asarray(u, jnp.float32), hf, vf, h, w)
    vv = upsample_chroma(jnp.asarray(v, jnp.float32), hf, vf, h, w)
    want = np.asarray(C.yuv420_to_bgr(jnp.asarray(y), uf, vv,
                                      out_h=h, out_w=w))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("name,cdims,fac", _SUBS, ids=lambda x: str(x))
def test_yuv_to_rgb_norm_factor_selection(name, cdims, fac):
    h, w = 17, 25
    ch, cw = cdims(h, w)
    y, u, v = _case(h, w, ch, cw, depth=10, seed=3)
    got = np.asarray(C.yuv_to_rgb_norm(jnp.asarray(y), jnp.asarray(u),
                                       jnp.asarray(v), depth=10,
                                       out_h=h, out_w=w))
    hf, vf = fac
    uf = upsample_chroma(jnp.asarray(u, jnp.float32), hf, vf, h, w)
    vv = upsample_chroma(jnp.asarray(v, jnp.float32), hf, vf, h, w)
    want = np.asarray(C.yuv_to_rgb_norm(jnp.asarray(y), uf, vv, depth=10,
                                        out_h=h, out_w=w))
    np.testing.assert_array_equal(got, want)


def test_yuv422_bottom_half_chroma_reaches_output():
    """Semantic form of the regression: a 4:2:2 frame whose chroma is
    neutral on top and strongly red on the bottom must come out red at
    the bottom — the old factor inversion stretched TOP-half chroma over
    the whole image, leaving the bottom gray."""
    h, w = 32, 16
    y = np.full((h, w), 128, np.uint8)
    u = np.full((h, w // 2), 128, np.uint8)
    v = np.full((h, w // 2), 128, np.uint8)
    v[h // 2:] = 240  # bottom half: strong Cr (red)
    out = np.asarray(C.yuv420_to_bgr(jnp.asarray(y), jnp.asarray(u),
                                     jnp.asarray(v), out_h=h, out_w=w))
    assert out[-1, 0, 2] > out[-1, 0, 0] + 80, "bottom rows must be red"
    assert abs(int(out[0, 0, 2]) - int(out[0, 0, 0])) < 10, \
        "top rows must stay neutral"
