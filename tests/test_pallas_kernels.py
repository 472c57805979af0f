"""Pallas kernel parity: interpret-mode Pallas vs the XLA reference path.

Only dequant_idct_blocks remains a Pallas kernel at this tier: it is the
arithmetic the decode-megakernel bit-identity gate runs through
(jpeg_kernels.dequant_idct). The u8/fdct variants moved to XLA dots after
measuring the Pallas forms 1.6-3.6x slower on v5e (see
jpeg_kernels.dequant_idct_u8 / fdct_quant docstrings).
"""
import numpy as np
import pytest

import jax.numpy as jnp

from lilliput_tpu.ops import jpeg_kernels as K
from lilliput_tpu.ops import pallas_kernels as PK

RNG = np.random.default_rng(11)


@pytest.mark.parametrize("n", [1, 2, 7, 512, 1023])
def test_dequant_idct_pallas_matches_xla(n):
    coefs = jnp.asarray(RNG.integers(-512, 512, (n, 64), dtype=np.int16))
    q = RNG.integers(1, 64, 64).astype(np.uint16)
    w = jnp.asarray(K.idct_kron_matrix()) * jnp.asarray(q, jnp.float32)[:, None]
    ref = jnp.dot(coefs.astype(jnp.float32), w) + 128.0
    out = PK.dequant_idct_blocks(coefs, w, interpret=True)
    assert out.shape == (n, 64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_roundtrip_through_kron_transform():
    """dequant_idct_blocks(fdct_quant(x)) ~ x with a quant table of ones."""
    px = RNG.integers(0, 256, (8, 64, 64)).astype(np.float32)
    ones = np.ones(64, np.float32)
    k = K.fdct_quant(jnp.asarray(px), jnp.asarray(ones))
    w = jnp.asarray(K.idct_kron_matrix())
    flat = k.reshape(-1, 64).astype(jnp.int16)
    back = PK.dequant_idct_blocks(flat, w, interpret=True)
    bh = px.shape[-2] // 8
    back = np.asarray(back).reshape(px.shape[0], bh, bh, 8, 8)
    back = np.moveaxis(back, -2, -3).reshape(px.shape)
    assert np.abs(back - px).max() <= 2.0
