"""Pallas TPU kernels for the hot dense ops.

Two tiers of kernels:

* dequant_idct_blocks — the (N,64)x(64,64) MXU matmul form of JPEG's 2D 8x8
  IDCT (see jpeg_kernels.idct_kron_matrix). Packing TWO blocks per row and
  block-diagonalizing the transform to (128,128) fills the MXU's native
  tile exactly; dequantization rides in the matrix rows and the +128 level
  shift in the epilogue. This is the arithmetic the megakernel bit-identity
  gate compares against; the serving-only u8/fdct variants use plain XLA
  dots instead (measured 1.6-3.6x faster than their Pallas forms on v5e —
  Mosaic matmul staging loses to XLA's batched dot at these shapes).

* decode420_packed / decode444_packed — the decode MEGAKERNEL: one grid step
  per (image, MCU row) runs dequant + IDCT + block->plane relayout + chroma
  triangle upsample + YCbCr->BGR + u8 quantization and writes packed BGRA
  u32 pixels. Where the split path writes/rereads f32 planes between the
  IDCT and the color stage (>=16 bytes/px of HBM traffic), the megakernel
  reads int16 coefficients (~3 B/px) and writes u8 BGRA (4 B/px) once —
  the dense half of JPEG decode at its HBM-bandwidth speed of light.

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


# ---------------------------------------------------------------------------
# decode megakernel: coefficients -> packed BGRA, one pass
# ---------------------------------------------------------------------------

_ALPHA_FF = -16777216  # 0xFF000000 as int32 (alpha byte of the packed pixel)


def _pack_bgra(b: jax.Array, g: jax.Array, r: jax.Array) -> jax.Array:
    """Round/clip three f32 channel planes to u8 and pack little-endian
    BGRA into int32 (byte 0 = B), matching lax.bitcast_convert_type order.
    Rounding matches jpeg_kernels.ycbcr_to_bgr exactly (round-half-even)."""
    def u8(x):
        return jnp.clip(jnp.round(x), 0.0, 255.0).astype(jnp.int32)
    return u8(b) | (u8(g) << 8) | (u8(r) << 16) | jnp.int32(_ALPHA_FF)


def _roll(x: jax.Array, shift: int, axis: int) -> jax.Array:
    """pltpu.roll with negative shifts normalized (it requires shift >= 0)."""
    return pltpu.roll(x, shift % x.shape[axis], axis=axis)


def _sel_dot_exact(a: jax.Array, s3_ref) -> jax.Array:
    """EXACT a @ S for a 0/1 selection matrix S, in native bf16 MXU passes.

    s3_ref holds S stacked 3x along K as bf16 (exact: entries are 0/1).
    The f32 activation splits exactly into three disjoint bf16 mantissa
    slices (hi = rn(a); mid = rn(a-hi); lo = a-hi-mid, each <=8 significand
    bits); concatenated along K, one DEFAULT-precision bf16 matmul then
    sums, per output element, exactly the three slices of one selected
    source element (plus exact zeros) — bit-identical to a full-precision
    f32 selection at ~1/4 the MXU passes of the 6-pass HIGHEST emulation."""
    hi = a.astype(jnp.bfloat16)
    r = a - hi.astype(jnp.float32)
    mid = r.astype(jnp.bfloat16)
    lo = (r - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    a3 = jnp.concatenate([hi, mid, lo], axis=1)
    return jax.lax.dot_general(
        a3, s3_ref[:], (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)


MEGA_TILE_ROWS = 8   # pad-granularity fallback tile (rows % divisor != 0)
MEGA_TILE_MAX = 20   # largest divisor tile considered (VMEM double-buffer
                     # pressure regresses beyond this: t=17 beat t=34 on v5e)


def _tile_rows(rows: int) -> int:
    """Grid tile size: the largest divisor of `rows` up to MEGA_TILE_MAX
    (no pad copies — a jnp.pad of the coefficient stack is a full HBM round
    trip), falling back to MEGA_TILE_ROWS with padding when the best
    divisor is tiny (small tiles lose more to per-step overhead)."""
    import os
    t = max(d for d in range(1, min(MEGA_TILE_MAX, rows) + 1)
            if rows % d == 0)
    if t < 3 and rows > MEGA_TILE_ROWS:
        t = MEGA_TILE_ROWS
    return int(os.environ.get("LILLIPUT_MEGA_T", t))


@functools.lru_cache(maxsize=1)
def _upsample_sel_matrices() -> np.ndarray:
    """0/1 selection matrices expressing the 2x triangle-upsample EXPANSION
    as exact MXU matmuls over block-vectorized (j, 64) planes.

    A block vector index is x*8+y (pixel row x, col y). The triangle filter
    value itself is computed elementwise ((3*c + neighbor) * 0.25 — the same
    expression tree as jpeg_kernels._upsample2x_axis, so results are
    bit-identical); these matrices only PLACE each filtered value into its
    output quadrant block, and a 0/1 selection matmul is exact in f32.

    Layout: [Ae0, Ao0, Ae1, Ao1] vertical quadrants qy (even/odd output
    rows), [He0, Ho0, He1, Ho1] horizontal quadrants qx (even/odd cols)."""
    s = np.zeros((8, 64, 64), np.float32)
    for qy in range(2):
        for xp in range(8):
            k = 4 * qy + xp // 2
            dst = s[2 * qy] if xp % 2 == 0 else s[2 * qy + 1]
            for y in range(8):
                dst[k * 8 + y, xp * 8 + y] = 1.0
    for qx in range(2):
        for yp in range(8):
            m = 4 * qx + yp // 2
            dst = s[4 + 2 * qx] if yp % 2 == 0 else s[5 + 2 * qx]
            for x in range(8):
                dst[x * 8 + m, x * 8 + yp] = 1.0
    return s


def _expand_mode() -> str:
    """Upsample-expansion strategy inside the 4:2:0 megakernel: 'mm3'
    (default — 0/1-selection matmuls on 3x-stacked bf16 via _sel_dot_exact,
    exact at 1/2 the MXU passes of HIGHEST), 'mm' (HIGHEST f32 selection
    matmuls), or 'roll' (VPU lane-roll/select placement, zero MXU). All
    three are bit-identical; measured on v5e: mm3 < mm < roll."""
    import os
    return os.environ.get("LILLIPUT_EXPAND", "mm3")


def _expand_rows_roll(ve, vo, qy, lane_x):
    """2x vertical expansion, quadrant qy, as VPU lane rolls: output pixel
    row x reads filtered value (ve if x even else vo) at source row
    4*qy+x//2 — a lane roll by (x - 4*qy - x//2)*8 selected per lane_x.
    Exact (each output lane copies exactly one filtered value)."""
    out = jnp.zeros_like(ve)
    for x in range(8):
        src = ve if x % 2 == 0 else vo
        shift = (x - (4 * qy + x // 2)) * 8
        out = jnp.where(lane_x == x, _roll(src, shift, 1), out)
    return out


def _expand_cols_roll(he, ho, qx, lane_y):
    """2x horizontal expansion, quadrant qx: output col y reads
    (he if y even else ho) at source col 4*qx+y//2."""
    out = jnp.zeros_like(he)
    for y in range(8):
        src = he if y % 2 == 0 else ho
        shift = y - (4 * qx + y // 2)
        out = jnp.where(lane_y == y, _roll(src, shift, 1), out)
    return out


def _sel_quadrant_mats(indices):
    """[qy0|qy1]-column selection matrices for the given even/odd filter
    indices of _upsample_sel_matrices (e.g. (0, 1) vertical, (4, 5)
    horizontal)."""
    s = _upsample_sel_matrices()
    return [np.concatenate([s[a], s[a + 2]], axis=1) for a in indices]


def _sel_staging(mode: str, mats):
    """Stage 0/1 selection matrices as kernel operands: f32 for 'mm',
    3x-stacked bf16 for 'mm3' (the _sel_dot_exact form — exact since the
    entries are 0/1); returns (args, specs). Empty for 'roll'."""
    if mode == "roll":
        return [], []
    if mode == "mm3":
        mats = [np.concatenate([m, m, m], axis=0) for m in mats]
        args = [jnp.asarray(m, dtype=jnp.bfloat16) for m in mats]
    else:
        args = [jnp.asarray(m) for m in mats]
    k_rows, width = mats[0].shape
    specs = [pl.BlockSpec((k_rows, width), lambda b, i: (0, 0),
                          memory_space=pltpu.VMEM)] * len(mats)
    return args, specs


def _dec420_kernel_factory(t_rows: int, cbw: int, cbh_true: int,
                           expand_mode: str = "mm3",
                           out_planes: bool = False):
    """Builds the 4:2:0 megakernel body for a tile of t_rows MCU rows.

    Per grid step (image b, row-tile i) everything happens in block-vector
    space (sublane = block index, lane = x*8+y pixel index inside a block):
    kron-matmul IDCT (block PAIRS packed to the MXU's 128 lanes for luma),
    lane-roll neighbor taps, exact upsample EXPANSION (see _expand_mode —
    each output lane receives exactly one filtered value, so every mode
    stays bit-identical to the split XLA path), elementwise color + u8
    quantization. No transposes and no lane-crossing shape casts (Mosaic
    cannot lower those).

    out_planes=False packs BGRA into one int32 ref (general decode);
    out_planes=True writes three u8 refs (B, G, R) still in block-vector
    space — the serving tail relayouts 1 B/px/channel with no separate
    channel-extraction pass."""
    n = t_rows * cbw

    def kernel(*refs):
        if expand_mode == "roll":
            (y_ref, cbp_ref, cbc_ref, cbn_ref, crp_ref, crc_ref, crn_ref,
             wy_ref, wc_ref) = refs[:9]
            outs = refs[9:]
            sae_ref = sao_ref = she_ref = sho_ref = None
        else:
            (y_ref, cbp_ref, cbc_ref, cbn_ref, crp_ref, crc_ref, crn_ref,
             wy_ref, wc_ref, sae_ref, sao_ref, she_ref, sho_ref) = refs[:13]
            outs = refs[13:]
        i = pl.program_id(1)
        wc = wc_ref[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (n, 64), 1)
        lane_x = lane // 8
        lane_y = lane % 8
        sub = jax.lax.broadcasted_iota(jnp.int32, (n, 64), 0)
        glob = i * t_rows + sub // cbw       # global chroma block row
        row_j = sub % cbw                    # block column within the row

        def idct(x):
            return jnp.dot(x.astype(jnp.float32), wc,
                           preferred_element_type=jnp.float32) + 128.0

        def upsample2x2(cur_ref, prev_ref, next_ref):
            # per-row slices CONCATENATED along sublanes instead of a
            # (t, cbw, 64) -> (n, 64) ref reshape: that shape cast fails
            # Mosaic's layout inference at small geometries (e.g. 100x76:
            # "(5,7,64)->(35,64) unsupported shape cast") while the same
            # kernel compiles at 1080p — tpu.concatenate lowers at every
            # shape tested
            if t_rows == 1:
                raw = cur_ref[0, 0]
            else:
                raw = jnp.concatenate(
                    [cur_ref[0, r] for r in range(t_rows)], axis=0)
            cp = idct(raw)
            pp8 = _roll(idct(prev_ref[0, 0]), 8, 1)
            nn8 = _roll(idct(next_ref[0, 0]), -8, 1)
            # pixel-row +-1 neighbors: lane roll by 8 shifts x inside the
            # block; x==0/7 lanes splice in the adjacent block row (from
            # within the tile, or the neighbor-tile boundary row refs)
            up_in = _roll(cp, 8, 1)
            dn_in = _roll(cp, -8, 1)
            up_x = (pp8 if t_rows == 1
                    else jnp.concatenate([pp8, up_in[:-cbw]], axis=0))
            dn_x = (nn8 if t_rows == 1
                    else jnp.concatenate([dn_in[cbw:], nn8], axis=0))
            up = jnp.where(lane_x == 0, up_x, up_in)
            up = jnp.where((glob == 0) & (lane_x == 0), cp, up)
            dn = jnp.where(lane_x == 7, dn_x, dn_in)
            dn = jnp.where((glob == cbh_true - 1) & (lane_x == 7), cp, dn)
            ve = (3.0 * cp + up) * 0.25
            vo = (3.0 * cp + dn) * 0.25
            if expand_mode == "mm":
                vq = (jnp.dot(ve, sae_ref[:],
                              preferred_element_type=jnp.float32)
                      + jnp.dot(vo, sao_ref[:],
                                preferred_element_type=jnp.float32))
            elif expand_mode == "mm3":
                vq = _sel_dot_exact(ve, sae_ref) + _sel_dot_exact(vo, sao_ref)
            out = []
            for qy in range(2):
                if expand_mode == "roll":
                    v = _expand_rows_roll(ve, vo, qy, lane_x)
                else:
                    v = vq[:, 64 * qy:64 * qy + 64]
                # pixel-col +-1 neighbors: lane roll by 1; y==0/7 take the
                # adjacent BLOCK (sublane roll) or edge-replicate at j edges
                vl = _roll(v, 1, 0)
                vr = _roll(v, -1, 0)
                left = jnp.where(lane_y == 0,
                                 jnp.where(row_j == 0, v, _roll(vl, -7, 1)),
                                 _roll(v, 1, 1))
                right = jnp.where(lane_y == 7,
                                  jnp.where(row_j == cbw - 1, v,
                                            _roll(vr, 7, 1)),
                                  _roll(v, -1, 1))
                he = (3.0 * v + left) * 0.25
                ho = (3.0 * v + right) * 0.25
                if expand_mode == "roll":
                    out.append(jnp.concatenate(
                        [_expand_cols_roll(he, ho, 0, lane_y),
                         _expand_cols_roll(he, ho, 1, lane_y)], axis=1))
                elif expand_mode == "mm":
                    out.append(
                        jnp.dot(he, she_ref[:],
                                preferred_element_type=jnp.float32)
                        + jnp.dot(ho, sho_ref[:],
                                  preferred_element_type=jnp.float32))
                else:
                    out.append(_sel_dot_exact(he, she_ref)
                               + _sel_dot_exact(ho, sho_ref))
            return out       # per qy: (n, 128) = even|odd block-pair lanes

        cbu = upsample2x2(cbc_ref, cbp_ref, cbn_ref)
        cru = upsample2x2(crc_ref, crp_ref, crn_ref)
        # luma IDCT + color per block-pair row: the small per-row matmuls
        # interleave with the VPU color/pack work (measured faster than one
        # whole-tile (2n,128)x(128,128) contraction — re-confirmed with the
        # u8-plane epilogue: 16.6 vs 17.9 ms/batch-128)
        wy2 = wy_ref[0]
        for r in range(2 * t_rows):
            t, qy = r // 2, r % 2
            yf = y_ref[0, r].astype(jnp.float32)     # (cbw, 128): block pair
            y = jnp.dot(yf, wy2, preferred_element_type=jnp.float32) + 128.0
            cbv = cbu[qy][t * cbw:(t + 1) * cbw] - 128.0
            crv = cru[qy][t * cbw:(t + 1) * cbw] - 128.0
            rr = y + 1.402 * crv
            gg = y - 0.344136286 * cbv - 0.714136286 * crv
            bb = y + 1.772 * cbv
            if out_planes:
                def u8(v):
                    # Mosaic lacks a direct f32->u8 cast; round to int32
                    # first (same values as _pack_bgra's channel bytes)
                    return jnp.clip(jnp.round(v), 0.0, 255.0).astype(
                        jnp.int32).astype(jnp.uint8)
                outs[0][0, t, qy] = u8(bb)
                outs[1][0, t, qy] = u8(gg)
                outs[2][0, t, qy] = u8(rr)
            else:
                outs[0][0, t, qy] = _pack_bgra(bb, gg, rr)

    return kernel


def _blocks_to_plane_xla(blocks: jax.Array, bh: int, bw: int) -> jax.Array:
    """(B, bh, bw, 64) block-vectorized -> (B, bh*8, bw*8) plane (XLA-side
    relayout: one transpose pass over the packed int32 pixels)."""
    b = blocks.shape[0]
    p = blocks.reshape(b, bh, bw, 8, 8)
    return jnp.moveaxis(p, -2, -3).reshape(b, bh * 8, bw * 8)


def _block_diag_pair(w: jax.Array) -> jax.Array:
    """(B, 64, 64) -> (B, 128, 128) block-diagonal: two blocks per MXU tile.
    Zero padding adds exact zeros to each output sum, so results match the
    single-block matmul bit-for-bit."""
    bsz = w.shape[0]
    w2 = jnp.zeros((bsz, 128, 128), jnp.float32)
    return w2.at[:, :64, :64].set(w).at[:, 64:, 64:].set(w)


def _decode420_call(yc: jax.Array, cb: jax.Array, cr: jax.Array,
                    wqy: jax.Array, wqc: jax.Array, interpret: bool,
                    out_planes: bool = False):
    """Shared 4:2:0 megakernel dispatch; block-vector-space output
    (B, cbh_pad, 2, cbw, 128): packed-BGRA int32, or a (b, g, r) tuple of
    u8 arrays when out_planes."""
    bsz, cbh, cbw = cb.shape[0], cb.shape[1], cb.shape[2]
    t = _tile_rows(cbh)
    cbh_pad = -(-cbh // t) * t
    cb = jnp.pad(cb, ((0, 0), (0, cbh_pad - cbh), (0, 0), (0, 0)))
    cr = jnp.pad(cr, ((0, 0), (0, cbh_pad - cbh), (0, 0), (0, 0)))
    yc = jnp.pad(yc, ((0, 0), (0, 2 * cbh_pad - yc.shape[1]),
                      (0, 2 * cbw - yc.shape[2]), (0, 0)))
    yc2 = yc.reshape(bsz, 2 * cbh_pad, cbw, 128)   # free: block pairs
    wqy = jnp.broadcast_to(wqy, (bsz, 64, 64))
    wqc = jnp.broadcast_to(wqc, (bsz, 64, 64))
    cspec = pl.BlockSpec((1, t, cbw, 64), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    espec = lambda m: pl.BlockSpec((1, 1, cbw, 64), m,
                                   memory_space=pltpu.VMEM)
    prev = lambda b, i: (b, jnp.maximum(i * t - 1, 0), 0, 0)
    nxt = lambda b, i: (b, jnp.minimum(i * t + t, cbh_pad - 1), 0, 0)
    mode = _expand_mode()
    sel_args, sel_specs = [], []
    if mode != "roll":
        s = _upsample_sel_matrices()
        mats = [np.concatenate([s[a], s[a + 2]], axis=1)
                for a in (0, 1, 4, 5)]               # sae, sao, she, sho
        if mode == "mm3":
            # 3x-stacked bf16 form for _sel_dot_exact (exact: entries 0/1)
            mats = [np.concatenate([m, m, m], axis=0) for m in mats]
            sel_args = [jnp.asarray(m, dtype=jnp.bfloat16) for m in mats]
        else:
            sel_args = [jnp.asarray(m) for m in mats]
        k_rows = mats[0].shape[0]
        sel_specs = [pl.BlockSpec((k_rows, 128), lambda b, i: (0, 0),
                                  memory_space=pltpu.VMEM)] * 4
    out_spec = pl.BlockSpec((1, t, 2, cbw, 128),
                            lambda b, i: (b, i, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    out_sh = (bsz, cbh_pad, 2, cbw, 128)
    if out_planes:
        out_shapes = [jax.ShapeDtypeStruct(out_sh, jnp.uint8)] * 3
        out_specs = [out_spec] * 3
    else:
        out_shapes = jax.ShapeDtypeStruct(out_sh, jnp.int32)
        out_specs = out_spec
    return pl.pallas_call(
        _dec420_kernel_factory(t, cbw, cbh, mode, out_planes=out_planes),
        out_shape=out_shapes,
        grid=(bsz, cbh_pad // t),
        in_specs=[
            pl.BlockSpec((1, 2 * t, cbw, 128), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            espec(prev), cspec, espec(nxt),
            espec(prev), cspec, espec(nxt),
            pl.BlockSpec((1, 128, 128), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64, 64), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + sel_specs,
        out_specs=out_specs,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(yc2, cb, cb, cb, cr, cr, cr, _block_diag_pair(wqy), wqc, *sel_args)


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode420_packed(yc: jax.Array, cb: jax.Array, cr: jax.Array,
                     wqy: jax.Array, wqc: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """4:2:0 decode megakernel.

    (B, ybh, ybw, 64) + 2x(B, cbh, cbw, 64) int16 coefficients with
    per-image dequant-folded IDCT matrices (B, 64, 64) -> (B, cbh_pad*16,
    cbw*16) int32 packed BGRA (bitcast to u8 gives (..., 4) = B,G,R,255).
    Caller crops to the true image dims."""
    bsz, cbh = cb.shape[0], cb.shape[1]
    cbw = cb.shape[2]
    blocks = _decode420_call(yc, cb, cr, wqy, wqc, interpret)
    cbh_pad = blocks.shape[1]
    blk = blocks.reshape(bsz, 2 * cbh_pad, 2 * cbw, 64)
    return _blocks_to_plane_xla(blk, 2 * cbh_pad, 2 * cbw)




def _dec422_kernel_factory(t_rows: int, cbw: int, expand_mode: str):
    """4:2:2 megakernel body: chroma rows align 1:1 with luma block rows;
    only the horizontal triangle upsample runs (no neighbor-row refs)."""
    n = t_rows * cbw

    def kernel(*refs):
        if expand_mode == "roll":
            (y_ref, cb_ref, cr_ref, wy_ref, wc_ref, out_ref) = refs
            she_ref = sho_ref = None
        else:
            (y_ref, cb_ref, cr_ref, wy_ref, wc_ref, she_ref, sho_ref,
             out_ref) = refs
        wc = wc_ref[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (n, 64), 1)
        lane_y = lane % 8
        sub = jax.lax.broadcasted_iota(jnp.int32, (n, 64), 0)
        row_j = sub % cbw

        def upsample_h(cur_ref):
            # row-slice concat, NOT a (t, cbw, 64)->(n, 64) ref reshape:
            # Mosaic rejects that shape cast at small geometries (see the
            # 4:2:0 kernel's upsample2x2)
            raw = (cur_ref[0, 0] if t_rows == 1 else jnp.concatenate(
                [cur_ref[0, r] for r in range(t_rows)], axis=0))
            v = jnp.dot(raw.astype(jnp.float32), wc,
                        preferred_element_type=jnp.float32) + 128.0
            vl = _roll(v, 1, 0)
            vr = _roll(v, -1, 0)
            left = jnp.where(lane_y == 0,
                             jnp.where(row_j == 0, v, _roll(vl, -7, 1)),
                             _roll(v, 1, 1))
            right = jnp.where(lane_y == 7,
                              jnp.where(row_j == cbw - 1, v,
                                        _roll(vr, 7, 1)),
                              _roll(v, -1, 1))
            he = (3.0 * v + left) * 0.25
            ho = (3.0 * v + right) * 0.25
            if expand_mode == "roll":
                return jnp.concatenate(
                    [_expand_cols_roll(he, ho, 0, lane_y),
                     _expand_cols_roll(he, ho, 1, lane_y)], axis=1)
            if expand_mode == "mm":
                return (jnp.dot(he, she_ref[:],
                                preferred_element_type=jnp.float32)
                        + jnp.dot(ho, sho_ref[:],
                                  preferred_element_type=jnp.float32))
            return _sel_dot_exact(he, she_ref) + _sel_dot_exact(ho, sho_ref)

        cbu = upsample_h(cb_ref) - 128.0
        cru = upsample_h(cr_ref) - 128.0
        wy2 = wy_ref[0]
        for r in range(t_rows):
            yf = y_ref[0, r].astype(jnp.float32)
            y = jnp.dot(yf, wy2, preferred_element_type=jnp.float32) + 128.0
            cbv = cbu[r * cbw:(r + 1) * cbw]
            crv = cru[r * cbw:(r + 1) * cbw]
            rr = y + 1.402 * crv
            gg = y - 0.344136286 * cbv - 0.714136286 * crv
            bb = y + 1.772 * cbv
            out_ref[0, r] = _pack_bgra(bb, gg, rr)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode422_packed(yc: jax.Array, cb: jax.Array, cr: jax.Array,
                     wqy: jax.Array, wqc: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """4:2:2 decode megakernel: (B, bh, bw, 64) luma + 2x(B, bh, cbw, 64)
    chroma -> (B, bh_pad*8, cbw*16) packed BGRA int32 (caller crops)."""
    bsz, bh, cbw = cb.shape[0], cb.shape[1], cb.shape[2]
    t = _tile_rows(bh)
    bh_pad = -(-bh // t) * t
    cb = jnp.pad(cb, ((0, 0), (0, bh_pad - bh), (0, 0), (0, 0)))
    cr = jnp.pad(cr, ((0, 0), (0, bh_pad - bh), (0, 0), (0, 0)))
    yc = jnp.pad(yc, ((0, 0), (0, bh_pad - yc.shape[1]),
                      (0, 2 * cbw - yc.shape[2]), (0, 0)))
    yc2 = yc.reshape(bsz, bh_pad, cbw, 128)
    wqy = jnp.broadcast_to(wqy, (bsz, 64, 64))
    wqc = jnp.broadcast_to(wqc, (bsz, 64, 64))
    mode = _expand_mode()
    sel_args, sel_specs = _sel_staging(mode, _sel_quadrant_mats((4, 5)))
    cspec = pl.BlockSpec((1, t, cbw, 64), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    blocks = pl.pallas_call(
        _dec422_kernel_factory(t, cbw, mode),
        out_shape=jax.ShapeDtypeStruct((bsz, bh_pad, cbw, 128), jnp.int32),
        grid=(bsz, bh_pad // t),
        in_specs=[
            pl.BlockSpec((1, t, cbw, 128), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            cspec, cspec,
            pl.BlockSpec((1, 128, 128), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 64, 64), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + sel_specs,
        out_specs=pl.BlockSpec((1, t, cbw, 128), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(yc2, cb, cr, _block_diag_pair(wqy), wqc, *sel_args)
    blk = blocks.reshape(bsz, bh_pad, 2 * cbw, 64)
    return _blocks_to_plane_xla(blk, bh_pad, 2 * cbw)


def _dec440_kernel_factory(t_rows: int, bw2: int, cbh_true: int,
                           expand_mode: str):
    """4:4:0 megakernel body: pair-packed chroma expands vertically 2x.

    Lanes hold (pair, x, y); within-half x rolls use shift 72/56 (mod 128)
    so x=0 lanes read the previous row's x=7 of the SAME pair half."""
    n = t_rows * bw2

    def kernel(*refs):
        if expand_mode == "roll":
            (y_ref, cbp_ref, cbc_ref, cbn_ref, crp_ref, crc_ref, crn_ref,
             wy_ref, wc_ref, out_ref) = refs
            sae_ref = sao_ref = None
        else:
            (y_ref, cbp_ref, cbc_ref, cbn_ref, crp_ref, crc_ref, crn_ref,
             wy_ref, wc_ref, sae_ref, sao_ref, out_ref) = refs
        i = pl.program_id(1)
        wc2 = wc_ref[0]
        lane = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 1)
        lane_x = (lane % 64) // 8
        sub = jax.lax.broadcasted_iota(jnp.int32, (n, 128), 0)
        glob = i * t_rows + sub // bw2

        def idct(x):
            return jnp.dot(x.astype(jnp.float32), wc2,
                           preferred_element_type=jnp.float32) + 128.0

        def upsample_v(cur_ref, prev_ref, next_ref):
            # row-slice concat, NOT a ref reshape (Mosaic shape-cast limit
            # at small geometries — see the 4:2:0 kernel's upsample2x2)
            raw = (cur_ref[0, 0] if t_rows == 1 else jnp.concatenate(
                [cur_ref[0, r] for r in range(t_rows)], axis=0))
            cp = idct(raw)
            # within-half x=7 -> x=0 / x=0 -> x=7 rolls (72 == -56 mod 128)
            pp8 = _roll(idct(prev_ref[0, 0]), 72, 1)
            nn8 = _roll(idct(next_ref[0, 0]), 56, 1)
            up_in = _roll(cp, 8, 1)
            dn_in = _roll(cp, -8, 1)
            up_pair = _roll(cp, 72, 1)
            dn_pair = _roll(cp, 56, 1)
            up_x = (pp8 if t_rows == 1
                    else jnp.concatenate([pp8, up_pair[:-bw2]], axis=0))
            dn_x = (nn8 if t_rows == 1
                    else jnp.concatenate([dn_pair[bw2:], nn8], axis=0))
            up = jnp.where(lane_x == 0, up_x, up_in)
            up = jnp.where((glob == 0) & (lane_x == 0), cp, up)
            dn = jnp.where(lane_x == 7, dn_x, dn_in)
            dn = jnp.where((glob == cbh_true - 1) & (lane_x == 7), cp, dn)
            ve = (3.0 * cp + up) * 0.25
            vo = (3.0 * cp + dn) * 0.25
            if expand_mode == "roll":
                # in-half shifts never cross the pair boundary (|shift| <=
                # 32, source x' in [0,7] of the same half), so the shared
                # roll expansion works on pair-packed 128-lane arrays too
                return [_expand_rows_roll(ve, vo, 0, lane_x),
                        _expand_rows_roll(ve, vo, 1, lane_x)]
            if expand_mode == "mm":
                vq = (jnp.dot(ve, sae_ref[:],
                              preferred_element_type=jnp.float32)
                      + jnp.dot(vo, sao_ref[:],
                                preferred_element_type=jnp.float32))
            else:
                vq = _sel_dot_exact(ve, sae_ref) + _sel_dot_exact(vo, sao_ref)
            return [vq[:, :128], vq[:, 128:]]

        cbu = upsample_v(cbc_ref, cbp_ref, cbn_ref)
        cru = upsample_v(crc_ref, crp_ref, crn_ref)
        wy2 = wy_ref[0]
        for r in range(2 * t_rows):
            t, qy = r // 2, r % 2
            yf = y_ref[0, r].astype(jnp.float32)
            y = jnp.dot(yf, wy2, preferred_element_type=jnp.float32) + 128.0
            cbv = cbu[qy][t * bw2:(t + 1) * bw2] - 128.0
            crv = cru[qy][t * bw2:(t + 1) * bw2] - 128.0
            rr = y + 1.402 * crv
            gg = y - 0.344136286 * cbv - 0.714136286 * crv
            bb = y + 1.772 * cbv
            out_ref[0, t, qy] = _pack_bgra(bb, gg, rr)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode440_packed(yc: jax.Array, cb: jax.Array, cr: jax.Array,
                     wqy: jax.Array, wqc: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """4:4:0 decode megakernel: (B, bh, bw, 64) luma + 2x(B, cbh, bw, 64)
    chroma -> (B, cbh_pad*16, bw_pad*8) packed BGRA int32 (caller crops)."""
    bsz, cbh, bw = cb.shape[0], cb.shape[1], cb.shape[2]
    bw_pad = bw + (bw % 2)
    bw2 = bw_pad // 2
    t = _tile_rows(cbh)
    cbh_pad = -(-cbh // t) * t

    def prepc(c):
        c = jnp.pad(c, ((0, 0), (0, cbh_pad - cbh), (0, bw_pad - bw),
                        (0, 0)))
        return c.reshape(bsz, cbh_pad, bw2, 128)

    yc = jnp.pad(yc, ((0, 0), (0, 2 * cbh_pad - yc.shape[1]),
                      (0, bw_pad - yc.shape[2]), (0, 0)))
    yc2 = yc.reshape(bsz, 2 * cbh_pad, bw2, 128)
    cbp, crp = prepc(cb), prepc(cr)
    wqy = jnp.broadcast_to(wqy, (bsz, 64, 64))
    wqc = jnp.broadcast_to(wqc, (bsz, 64, 64))
    mode = _expand_mode()
    su = _upsample_sel_matrices()

    # pair-packed: block-diagonalize the vertical selection matrices per
    # pair half, grouping output columns [qy=0 pair | qy=1 pair]
    def bd(e0, e1):
        z = np.zeros((128, 256), np.float32)
        z[:64, 0:64] = e0
        z[64:128, 64:128] = e0
        z[:64, 128:192] = e1
        z[64:128, 192:256] = e1
        return z

    sel_args, sel_specs = _sel_staging(
        mode, [bd(su[0], su[2]), bd(su[1], su[3])])
    cspec = pl.BlockSpec((1, t, bw2, 128), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM)
    espec = lambda m: pl.BlockSpec((1, 1, bw2, 128), m,
                                   memory_space=pltpu.VMEM)
    prev = lambda b, i: (b, jnp.maximum(i * t - 1, 0), 0, 0)
    nxt = lambda b, i: (b, jnp.minimum(i * t + t, cbh_pad - 1), 0, 0)
    blocks = pl.pallas_call(
        _dec440_kernel_factory(t, bw2, cbh, mode),
        out_shape=jax.ShapeDtypeStruct((bsz, cbh_pad, 2, bw2, 128),
                                       jnp.int32),
        grid=(bsz, cbh_pad // t),
        in_specs=[
            pl.BlockSpec((1, 2 * t, bw2, 128), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            espec(prev), cspec, espec(nxt),
            espec(prev), cspec, espec(nxt),
            pl.BlockSpec((1, 128, 128), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 128, 128), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + sel_specs,
        out_specs=pl.BlockSpec((1, t, 2, bw2, 128),
                               lambda b, i: (b, i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(yc2, cbp, cbp, cbp, crp, crp, crp, _block_diag_pair(wqy),
      _block_diag_pair(wqc), *sel_args)
    blk = blocks.reshape(bsz, 2 * cbh_pad, bw_pad, 64)
    return _blocks_to_plane_xla(blk, 2 * cbh_pad, bw_pad)


def _dec444_kernel_factory(t_rows: int, bw2: int):
    n = t_rows * bw2

    def kernel(y_ref, cb_ref, cr_ref, wy_ref, wc_ref, out_ref):
        def plane(ref, w):
            # row-slice concat, NOT a ref reshape (Mosaic shape-cast limit
            # at small geometries — see the 4:2:0 kernel's upsample2x2)
            raw = (ref[0, 0] if t_rows == 1 else jnp.concatenate(
                [ref[0, r] for r in range(t_rows)], axis=0))
            f = raw.astype(jnp.float32)
            return jnp.dot(f, w, preferred_element_type=jnp.float32) + 128.0

        y = plane(y_ref, wy_ref[0])
        # the +128 then -128 round-trip is kept (NOT algebraically
        # cancelled) so f32 results stay bit-identical to the split path
        cb = plane(cb_ref, wc_ref[0]) - 128.0
        cr = plane(cr_ref, wc_ref[0]) - 128.0
        rr = y + 1.402 * cr
        gg = y - 0.344136286 * cb - 0.714136286 * cr
        bb = y + 1.772 * cb
        packed = _pack_bgra(bb, gg, rr)
        # per-row stores instead of a (n, 128) -> (t, bw2, 128) value
        # reshape (the sublane-SPLIT cast has the same Mosaic limit)
        for r in range(t_rows):
            out_ref[0, r] = packed[r * bw2:(r + 1) * bw2]

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def decode444_packed(yc: jax.Array, cb: jax.Array, cr: jax.Array,
                     wqy: jax.Array, wqc: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """4:4:4 decode megakernel: 3x(B, bh, bw, 64) int16 -> (B, bh_pad*8,
    bw_pad*8) int32 packed BGRA (caller crops)."""
    bsz, bh, bw = yc.shape[0], yc.shape[1], yc.shape[2]
    bw_pad = bw + (bw % 2)
    t = _tile_rows(bh)
    bh_pad = -(-bh // t) * t

    def prep(c):
        c = jnp.pad(c, ((0, 0), (0, bh_pad - bh), (0, bw_pad - bw), (0, 0)))
        return c.reshape(bsz, bh_pad, bw_pad // 2, 128)

    wqy = jnp.broadcast_to(wqy, (bsz, 64, 64))
    wqc = jnp.broadcast_to(wqc, (bsz, 64, 64))
    bw2 = bw_pad // 2
    spec = pl.BlockSpec((1, t, bw2, 128), lambda b, i: (b, i, 0, 0),
                        memory_space=pltpu.VMEM)
    wspec = pl.BlockSpec((1, 128, 128), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM)
    blocks = pl.pallas_call(
        _dec444_kernel_factory(t, bw2),
        out_shape=jax.ShapeDtypeStruct((bsz, bh_pad, bw2, 128), jnp.int32),
        grid=(bsz, bh_pad // t),
        in_specs=[spec, spec, spec, wspec, wspec],
        out_specs=pl.BlockSpec((1, t, bw2, 128), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(prep(yc), prep(cb), prep(cr),
      _block_diag_pair(wqy), _block_diag_pair(wqc))
    blk = blocks.reshape(bsz, bh_pad, bw_pad, 64)
    return _blocks_to_plane_xla(blk, bh_pad, bw_pad)


