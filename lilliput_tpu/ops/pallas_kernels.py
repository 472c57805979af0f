"""Pallas TPU kernels for the hot dense ops.

The flagship kernel is the fused dequant+IDCT: JPEG's 2D 8x8 inverse DCT is
one (N,64)x(64,64) matmul after vectorizing blocks (see
jpeg_kernels.idct_kron_matrix). Packing TWO blocks per row and
block-diagonalizing the transform to (128,128) fills the MXU's native tile
exactly; dequantization rides in the matrix rows and the +128 level shift in
the epilogue, so one VMEM round trip covers dequant+IDCT+bias.

Kernels run compiled on TPU and fall back to XLA elsewhere (tests exercise
them through Pallas interpret mode for bit-parity with the XLA path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK_ROWS = 256  # rows of packed (2-block) coefficients per grid step


def _idct_kernel(coef_ref, w_ref, out_ref):
    x = coef_ref[:].astype(jnp.float32)
    out_ref[:] = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32) + 128.0


@functools.partial(jax.jit, static_argnames=("interpret",))
def dequant_idct_blocks(coefs_flat: jax.Array, wq: jax.Array,
                        interpret: bool = False) -> jax.Array:
    """(N, 64) int16 quantized coefficients + (64, 64) dequant-folded IDCT
    matrix -> (N, 64) f32 pixels (level-shifted to 0..255 range).

    N is padded to 2*BLOCK_ROWS granularity; two blocks pack into each
    128-lane row and the transform becomes block_diag(wq, wq) @ MXU tile.
    """
    n = coefs_flat.shape[0]
    w2 = jnp.zeros((128, 128), jnp.float32)
    w2 = w2.at[:64, :64].set(wq).at[64:, 64:].set(wq)

    pair_rows = (n + 1) // 2
    padded_pairs = (pair_rows + BLOCK_ROWS - 1) // BLOCK_ROWS * BLOCK_ROWS
    pad_blocks = padded_pairs * 2 - n
    x = jnp.pad(coefs_flat, ((0, pad_blocks), (0, 0))).reshape(padded_pairs, 128)

    grid = (padded_pairs // BLOCK_ROWS,)
    out = pl.pallas_call(
        _idct_kernel,
        out_shape=jax.ShapeDtypeStruct((padded_pairs, 128), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w2)
    return out.reshape(padded_pairs * 2, 64)[:n]


def _fdct_kernel(px_ref, w_ref, out_ref):
    x = px_ref[:] - 128.0
    k = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
    out_ref[:] = jnp.clip(jnp.round(k), -2047, 2047)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fdct_quant_blocks(px_flat: jax.Array, wf: jax.Array,
                      interpret: bool = False) -> jax.Array:
    """(N, 64) f32 pixels + (64, 64) quant-folded fDCT matrix ->
    (N, 64) f32 quantized coefficients (caller casts to int16)."""
    n = px_flat.shape[0]
    w2 = jnp.zeros((128, 128), jnp.float32)
    w2 = w2.at[:64, :64].set(wf).at[64:, 64:].set(wf)
    pair_rows = (n + 1) // 2
    padded_pairs = (pair_rows + BLOCK_ROWS - 1) // BLOCK_ROWS * BLOCK_ROWS
    pad_blocks = padded_pairs * 2 - n
    x = jnp.pad(px_flat, ((0, pad_blocks), (0, 0))).reshape(padded_pairs, 128)
    out = pl.pallas_call(
        _fdct_kernel,
        out_shape=jax.ShapeDtypeStruct((padded_pairs, 128), jnp.float32),
        grid=(padded_pairs // BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BLOCK_ROWS, 128), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w2)
    return out.reshape(padded_pairs * 2, 64)[:n]
