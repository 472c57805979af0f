"""Pallas kernel parity: interpret-mode Pallas vs the XLA reference path."""
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


@pytest.mark.parametrize("n", [4, 513])
def test_fdct_quant_pallas_matches_xla(n):
    px = jnp.asarray(RNG.integers(0, 256, (n, 64)).astype(np.float32))
    q = RNG.integers(1, 64, 64).astype(np.uint16)
    wf = jnp.asarray(K.idct_kron_matrix()).T / jnp.asarray(q, jnp.float32)[None, :]
    ref = jnp.clip(jnp.round(jnp.dot(px - 128.0, wf)), -2047, 2047)
    out = PK.fdct_quant_blocks(px, wf, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-3)


def test_roundtrip_through_kron_transform():
    """IDCT(fDCT(x)) ~ x with quant table of ones."""
    px = jnp.asarray(RNG.integers(0, 256, (64, 64)).astype(np.float32))
    ones = np.ones(64, np.uint16)
    wf = jnp.asarray(K.idct_kron_matrix()).T / 1.0
    w = jnp.asarray(K.idct_kron_matrix()) * 1.0
    k = PK.fdct_quant_blocks(px, wf, interpret=True)
    back = PK.dequant_idct_blocks(k.astype(jnp.int16), w, interpret=True)
    assert np.abs(np.asarray(back) - np.asarray(px)).max() <= 2.0
    del ones
