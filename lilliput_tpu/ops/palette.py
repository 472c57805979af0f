"""Palette ops on device: LUT expansion and nearest-palette quantization.

Replaces the per-pixel CPU loops of the reference GIF path: palette->BGRA
expansion (giflib.cpp:515-541) becomes a LUT gather; the encoder's
crushed-RGB nearest-palette search with midpoint/extreme-color rules and
prev-frame transparency optimization (giflib.cpp:1006-1093) becomes a
batched |ΔR|+|ΔG|+|ΔB| argmin over the palette axis — pure VPU work over
(H*W, N) tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


#: crushed-RGB cache size + 1 dump slot for masked scatters
CACHE_SIZE = (1 << 15) + 1

#: quantize_animation packs glin*256+argmin into int32; past this pixel
#: count it falls back to the two-pass (scatter glin, gather argmin) form
_PACK_LIMIT = (2**31 - 1) // 256

#: frame-count buckets for the animation scans: padding an animation's
#: frame axis up to the next bucket lets every (bucket, canvas) pair reuse
#: one compiled composite/resize/quantize program instead of compiling per
#: exact frame count (the serving concern; ~17% mean pad overhead)
_FRAME_BUCKETS = (1, 2, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96, 128, 192, 256)


def frame_bucket(n: int) -> int:
    """Smallest scheduled bucket >= n (multiples of 128 past the table)."""
    for b in _FRAME_BUCKETS:
        if n <= b:
            return b
    return -(-n // 128) * 128


def lut_select(lut: jax.Array, idx: jax.Array) -> jax.Array:
    """Palette LUT expansion as a one-hot selection dot on the MXU.

    Replaces `jnp.take(lut, idx, axis=0)`: XLA lowers that gather to a
    per-index loop on TPU and it measured ~1 ms/frame at 480x480 — the
    entire cost of the animation composite scan (tools/profile_anim.py);
    the selection dot is below measurement noise. Exact at DEFAULT (bf16)
    matmul precision: the one-hot rows are 0/1 and palette entries are
    integers <= 255, both exactly representable in bf16, and each output
    element sums exactly one nonzero product into the f32 accumulator, so
    no rounding can occur (the CLAUDE.md provably-exact exception).

    Out-of-range indices clamp to the nearest valid row — the same
    semantics as `jnp.take(mode='clip')`, so a caller that forgets to
    mask invalid pixels gets clipped entries, never silent zeros
    (ADVICE r3: the zero-row contract was documentation-only). The
    clamp is one fused elementwise op, below measurement noise.

    Split hi/lo (idx = hi*8 + lo) with the HI dot contracted first: the
    full (..., 256) one-hot materializes ~118 MB per 480x480 frame; the
    split intermediates are one-hots (..., 32)/(..., 8) plus the partial
    (..., 8, C). Measured on v5e: 2.57 ms/bucket-32 for the full one-hot,
    2.80 for a 16/16 split, 1.28 for this 32/8 hi-first form (the
    intermediate bytes/pixel are minimized near hi = sqrt(C_eff*256)).

      lut  (N, C) u8/int   idx (...,) int  ->  (..., C) u8
    """
    p = lut.shape[0]
    idx = jnp.clip(idx, 0, p - 1)
    hi_n = -(-p // 8)
    t = jnp.pad(lut.astype(jnp.bfloat16), ((0, hi_n * 8 - p), (0, 0))
                ).reshape(hi_n, 8, lut.shape[1])
    oh_hi = ((idx[..., None] >> 3)
             == jnp.arange(hi_n, dtype=jnp.int32)).astype(jnp.bfloat16)
    oh_lo = ((idx[..., None] & 7)
             == jnp.arange(8, dtype=jnp.int32)).astype(jnp.bfloat16)
    b = jnp.einsum("...g,glc->...lc", oh_hi, t,
                   precision=jax.lax.Precision.DEFAULT)
    return jnp.einsum("...l,...lc->...c", oh_lo, b,
                      precision=jax.lax.Precision.DEFAULT).astype(jnp.uint8)


def lut_select_batched(luts: jax.Array, idx: jax.Array) -> jax.Array:
    """lut_select with a leading batch axis shared by table and indices:
    luts (N, P, C) u8/int, idx (N, ...) int -> (N, ..., C) u8. Same
    32/8 hi-first exact selection dots; out-of-range indices clamp like
    jnp.take(mode='clip')."""
    p = luts.shape[1]
    idx = jnp.clip(idx, 0, p - 1)
    hi_n = -(-p // 8)
    t = jnp.pad(luts.astype(jnp.bfloat16),
                ((0, 0), (0, hi_n * 8 - p), (0, 0))
                ).reshape(luts.shape[0], hi_n, 8, luts.shape[2])
    oh_hi = ((idx[..., None] >> 3)
             == jnp.arange(hi_n, dtype=jnp.int32)).astype(jnp.bfloat16)
    oh_lo = ((idx[..., None] & 7)
             == jnp.arange(8, dtype=jnp.int32)).astype(jnp.bfloat16)
    b = jnp.einsum("n...g,nglc->n...lc", oh_hi, t,
                   precision=jax.lax.Precision.DEFAULT)
    return jnp.einsum("n...l,n...lc->n...c", oh_lo, b,
                      precision=jax.lax.Precision.DEFAULT).astype(jnp.uint8)


def _crush(r: jax.Array, g: jax.Array, b: jax.Array):
    """giflib's crushed-RGB key rules (giflib.cpp:1027-1046), shared by
    the streaming core and the batched quantizer so the bit-identity
    contract has one source: extreme light/dark pixels search on their
    exact values, everything else on the 5-bit midpoint; the cache key is
    the 15-bit crushed RGB. Returns (rc, gc, bc, crushed)."""
    extreme = (((r > 240) & (g > 240) & (b > 240))
               | ((r < 15) & (g < 15) & (b < 15)))
    rc = jnp.where(extreme, r, (r & 0xF8) | 4)
    gc = jnp.where(extreme, g, (g & 0xF8) | 4)
    bc = jnp.where(extreme, b, (b & 0xF8) | 4)
    crushed = ((r >> 3) << 10) | ((g >> 3) << 5) | (b >> 3)
    return rc, gc, bc, crushed


def _quantize_core(img: jax.Array, pal: jax.Array, pal_count: jax.Array,
                   prev_bgra: jax.Array, seen_keys: jax.Array,
                   cache_idx: jax.Array, trans: jax.Array,
                   use_prev: jax.Array):
    """Fully-dynamic quantizer body shared by the per-frame entry point and
    the whole-animation scan (quantize_animation): `pal` may be padded past
    `pal_count` rows (masked out of the search), `trans` is -1 for no
    transparency, and `use_prev`/`pal_count`/`trans` are traced scalars so
    one compiled program serves every frame of a scan."""
    b = img[..., 0].astype(jnp.int32)
    g = img[..., 1].astype(jnp.int32)
    r = img[..., 2].astype(jnp.int32)
    a = img[..., 3].astype(jnp.int32)
    h, w = r.shape[-2], r.shape[-1]
    n = h * w
    imax = jnp.iinfo(jnp.int32).max
    trans = trans.astype(jnp.int32) if hasattr(trans, "astype") else jnp.int32(trans)
    have_trans = trans >= 0

    rc, gc, bc, crushed_hw = _crush(r, g, b)

    pal = pal.astype(jnp.int32)  # (N, 3), possibly padded
    dist = (jnp.abs(rc[..., None] - pal[:, 0])
            + jnp.abs(gc[..., None] - pal[:, 1])
            + jnp.abs(bc[..., None] - pal[:, 2]))  # (H, W, N)
    rows = jnp.arange(pal.shape[0], dtype=jnp.int32)
    # padded rows never win; the transparent entry is skipped in the
    # search exactly when it is inside the effective palette
    row_dead = (rows >= pal_count) | (have_trans & (rows == trans)
                                      & (trans < pal_count))
    dist = jnp.where(row_dead, imax, dist)
    best_mid = jnp.argmin(dist, axis=-1).astype(jnp.int32).reshape(-1)
    least_mid = jnp.min(dist, axis=-1).reshape(-1)

    rf, gf, bf = r.reshape(-1), g.reshape(-1), b.reshape(-1)
    crushed = crushed_hw.reshape(-1)
    # transparent pixels skip the cache (only when transparency exists)
    valid = (a.reshape(-1) >= 128) | ~have_trans

    lin = jnp.arange(n, dtype=jnp.int32)
    first_of_key = jnp.full((CACHE_SIZE,), imax, jnp.int32)
    first_of_key = first_of_key.at[crushed].min(jnp.where(valid, lin, imax))
    first_idx = first_of_key[crushed]
    frame_first_best = best_mid[jnp.clip(first_idx, 0, n - 1)]

    seen = seen_keys[crushed]
    cached = cache_idx[crushed].astype(jnp.int32)
    best = jnp.where(seen, cached, frame_first_best)
    is_first = valid & (first_idx == lin) & ~seen

    best_rgb = lut_select(pal, best).astype(jnp.int32)
    least_actual = (jnp.abs(rf - best_rgb[..., 0])
                    + jnp.abs(gf - best_rgb[..., 1])
                    + jnp.abs(bf - best_rgb[..., 2]))
    least = jnp.where(is_first, least_mid, least_actual)

    pb = prev_bgra.reshape(-1, prev_bgra.shape[-1]).astype(jnp.int32)
    dp = (jnp.abs(rf - pb[:, 2]) + jnp.abs(gf - pb[:, 1])
          + jnp.abs(bf - pb[:, 0]))
    best = jnp.where(use_prev & have_trans & (dp < least), trans, best)

    best = jnp.where(have_trans & ~valid, trans, best)

    # cache update: transparent pixels scatter to the dump slot; seen keys
    # keep their cached value (all writers of a key write one value)
    crushed_w = jnp.where(valid, crushed, CACHE_SIZE - 1)
    upd = jnp.where(seen, cached, frame_first_best).astype(jnp.uint8)
    new_cache = cache_idx.at[crushed_w].set(upd)
    new_seen = seen_keys.at[crushed_w].set(True)
    return (best.reshape(h, w).astype(jnp.uint8),
            new_seen.at[CACHE_SIZE - 1].set(False),
            new_cache)


@functools.partial(jax.jit, static_argnames=("trans_idx", "use_prev", "have_trans"))
def quantize_to_palette(img: jax.Array, palette_rgb: jax.Array,
                        prev_bgra: jax.Array, seen_keys: jax.Array,
                        cache_idx: jax.Array,
                        trans_idx: int, have_trans: bool, use_prev: bool):
    """(H, W, 4) u8 BGRA -> (H, W) u8 palette indices.

    palette_rgb: (N, 3) int32 RGB (the transparent entry is skipped in the
    search). EXACT emulation of giflib.cpp:1006-1093 including the
    sequential crushed-key cache (validated pixel-for-pixel against a
    sequential oracle in tests/test_gif.py):
      * alpha < 128 and transparency available -> transparent index, and
        the pixel does NOT touch the cache
      * on a cache miss (first occurrence of a crushed key, in raster
        order), the palette search runs on the crushed-to-5-bit midpoint
        ((c & 0xF8) | 4) — or the exact value for extreme light/dark
        pixels — Manhattan distance, first-lowest index wins; least_dist
        is that midpoint distance
      * on a cache hit, best comes from the cached entry (the key's FIRST
        occurrence, possibly from an earlier same-palette frame, carried in
        cache_idx) and least_dist is the ACTUAL pixel's distance to it
      * if the pixel is closer to the previous output frame's pixel than
        least_dist, emit transparent instead (smaller LZW)

    The batch construction: the frame-local first occurrence per key is a
    scatter-min of linear raster indices; every later pixel of the key
    gathers the first pixel's argmin result, reproducing the loop-carried
    cache without sequential execution.

    seen_keys (CACHE_SIZE,) bool and cache_idx (CACHE_SIZE,) uint8 persist
    across same-palette frames; callers reset both when the palette changes
    (giflib.cpp:974-996). Returns (indices, new_seen, new_cache).
    """
    # the historical static flags map onto the dynamic core: transparency
    # exists iff have_trans (trans outside the palette keeps its forcing
    # semantics), and prev-frame shortcutting requires both flags
    trans_eff = trans_idx if have_trans else -1
    return _quantize_core(img, palette_rgb, jnp.int32(palette_rgb.shape[0]),
                          prev_bgra, seen_keys, cache_idx,
                          jnp.int32(trans_eff), jnp.bool_(use_prev))


@jax.jit
def quantize_animation(frames: jax.Array, palettes: jax.Array,
                       pal_counts: jax.Array, trans_idx: jax.Array,
                       clear_flags: jax.Array, use_prev_flags: jax.Array):
    """Quantize a whole animation's composited frames in ONE dispatch —
    the batched form of GifEncoder's per-frame quantize_to_palette calls,
    bit-identical to running them sequentially.

    SCAN-FREE formulation (the original lax.scan carried the crushed-key
    cache tables across frames and its per-frame table scatters/gathers
    measured ~1 ms/frame on v5e — the whole animation path's cost). The
    loop-carried cache collapses because clear_flags are set exactly when
    the palette bytes change (giflib.cpp:974-996): within a clear-delimited
    SEGMENT the palette is constant, so the value the cache would hold for
    a crushed key is the midpoint argmin computed at the key's first
    VALID occurrence in the segment (frame-then-raster order) — and every
    later hit reads that same value. So:

      * per-pixel midpoint argmin (best_mid/least_mid) vectorizes over all
        frames (no carry);
      * "the cache" = one scatter-min of packed (glin*256 + best_mid) into
        a (segments x CACHE_SIZE) table + one gather back — glin is the
        global pixel index, unique, so min picks the first occurrence and
        carries its argmin in the low byte;
      * the prev-frame transparency optimization reads frames[k-1]
        directly (the scan's prev carry was just the previous input).

    Args/semantics identical to the scan version it replaces:
      frames         (N, H, W, 4) u8 composited+resized output frames
      palettes       (N, 256, 3)  i32 RGB (rows >= pal_counts[k] ignored)
      pal_counts     (N,)         i32 effective palette sizes
      trans_idx      (N,)         i32 transparent index (-1 = none)
      clear_flags    (N,)         bool clear the cache BEFORE this frame
      use_prev_flags (N,)         bool prev output frame valid for the
                                  transparency optimization

    Returns (N, H, W) u8 palette indices.
    """
    nf, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    n = h * w
    imax = jnp.iinfo(jnp.int32).max
    trans = trans_idx.astype(jnp.int32)
    have_trans = trans >= 0                                   # (N,)

    b = frames[..., 0].astype(jnp.int32)
    g = frames[..., 1].astype(jnp.int32)
    r = frames[..., 2].astype(jnp.int32)
    a = frames[..., 3].astype(jnp.int32)

    rc, gc, bc, crushed_hw = _crush(r, g, b)

    rows = jnp.arange(palettes.shape[1], dtype=jnp.int32)

    # one fused pass over the (N, H, W, P) distance space: the elementwise
    # producer fuses into the min/argmin reduce, so the full tensor never
    # materializes (a lax.map over frames measured slower: serialized
    # iterations, same traffic)
    pal_b = palettes[:, None, None, :, :]                     # (N,1,1,P,3)
    dist = (jnp.abs(rc[..., None] - pal_b[..., 0])
            + jnp.abs(gc[..., None] - pal_b[..., 1])
            + jnp.abs(bc[..., None] - pal_b[..., 2]))         # (N,H,W,P)
    row_dead = ((rows >= pal_counts[:, None])
                | (have_trans[:, None] & (rows == trans[:, None])
                   & (trans[:, None] < pal_counts[:, None])))  # (N,P)
    dist = jnp.where(row_dead[:, None, None, :], imax, dist)
    best_mid = jnp.argmin(dist, axis=-1).astype(jnp.int32).reshape(-1)
    least_mid = jnp.min(dist, axis=-1).reshape(-1)

    rf, gf, bf = r.reshape(-1), g.reshape(-1), b.reshape(-1)
    crushed = crushed_hw.reshape(-1)
    valid = ((a.reshape(-1) >= 128)
             | ~jnp.repeat(have_trans, n, total_repeat_length=nf * n))

    # segment-global first occurrence. seg is 1-BASED when frame 0 clears
    # (the common case), so nf+1 segment slots are needed in the fallback
    # table — nf slots drops the last segment's scatters out of bounds
    # when every frame clears and the count sits exactly on its bucket.
    seg = jnp.cumsum(clear_flags.astype(jnp.int32))           # (N,)
    segp = jnp.repeat(seg, n, total_repeat_length=nf * n)
    table_n = (nf + 1) * (CACHE_SIZE - 1) + 1
    ckey = segp * (CACHE_SIZE - 1) + crushed
    ckey_w = jnp.where(valid, ckey, table_n - 1)              # dump slot
    glin = jnp.arange(nf * n, dtype=jnp.int32)
    if nf * n <= _PACK_LIMIT:
        # sort-based first occurrence: TPU scatters/gathers run at ~6 ns
        # per random access (the packed scatter-min + gather pair measured
        # 6.4 ms here, 70% of the quantizer) while a 524k-element stable
        # sort costs ~0.8 ms. Stable-sort pixels by segment-key (invalid
        # pixels to an imax sentinel run), forward-fill each run's first
        # packed value with a segmented associative scan, and sort back by
        # pixel index. packed = glin*256 + best_mid carries the first
        # occurrence's argmin in the low byte; ties cannot occur (glin
        # unique) and the stable sort preserves occurrence order.
        packed = glin * 256 + best_mid
        skey = jnp.where(valid, ckey, imax)
        # two-key unstable sort: packed is unique (glin in its high bits),
        # so (skey, packed) fully orders the array — no stability needed,
        # and glin_s is recovered from packed_s instead of riding the sort
        # as a third operand
        skey_s, packed_s = jax.lax.sort(
            (skey, packed), num_keys=2, is_stable=False)
        glin_s = packed_s // 256
        first_flag = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_),
             skey_s[1:] != skey_s[:-1]])

        def fill(a, b):
            va, fa = a
            vb, fb = b
            return jnp.where(fb, vb, va), fa | fb

        leader_s, _ = jax.lax.associative_scan(
            fill, (packed_s, first_flag))
        _, first_packed = jax.lax.sort(
            (glin_s, leader_s), num_keys=1, is_stable=False)
        is_first = valid & (first_packed == packed)
        best = jnp.where(valid, first_packed & 255, best_mid)
    else:
        # glin*256 would overflow int32: scatter glin alone, gather the
        # first occurrence's argmin in a second pass
        table = jnp.full((table_n,), imax, jnp.int32)
        table = table.at[ckey_w].min(jnp.where(valid, glin, imax))
        first_g = table[ckey]
        is_first = valid & (first_g == glin)
        best = jnp.where(first_g == imax, best_mid,
                         best_mid[jnp.clip(first_g, 0, nf * n - 1)])

    # least_dist: midpoint distance at the first occurrence, actual
    # distance to the cached color everywhere else
    best_rgb = lut_select_batched(
        palettes, best.reshape(nf, n)).astype(jnp.int32).reshape(-1, 3)
    least_actual = (jnp.abs(rf - best_rgb[:, 0])
                    + jnp.abs(gf - best_rgb[:, 1])
                    + jnp.abs(bf - best_rgb[:, 2]))
    least = jnp.where(is_first, least_mid, least_actual)

    # prev-frame transparency optimization vs the previous INPUT frame
    prev = jnp.concatenate(
        [jnp.zeros((1, h, w, 4), frames.dtype), frames[:-1]], axis=0)
    pb = prev.reshape(-1, 4).astype(jnp.int32)
    dp = (jnp.abs(rf - pb[:, 2]) + jnp.abs(gf - pb[:, 1])
          + jnp.abs(bf - pb[:, 0]))
    transp = jnp.repeat(trans, n, total_repeat_length=nf * n)
    havep = transp >= 0
    usep = jnp.repeat(use_prev_flags, n, total_repeat_length=nf * n)
    best = jnp.where(usep & havep & (dp < least), transp, best)
    best = jnp.where(havep & ~valid, transp, best)
    return best.reshape(nf, h, w).astype(jnp.uint8)


@functools.partial(jax.jit, static_argnames=("have_trans", "first_frame"))
def composite_indexed_frame(canvas: jax.Array, indices_full: jax.Array,
                            drawn_mask: jax.Array, lut_bgra: jax.Array,
                            trans_idx: jax.Array, have_trans: bool,
                            bg_bgra: jax.Array, first_frame: bool) -> jax.Array:
    """Draw a palette-indexed frame onto the BGRA canvas.

    indices_full/drawn_mask are canvas-sized (host pre-scattered the frame
    rect, so one compiled program serves every frame geometry). Transparent
    and out-of-palette indices keep the canvas pixel (giflib.cpp:522-538).
    """
    if first_frame:
        canvas = jnp.broadcast_to(bg_bgra.astype(jnp.uint8), canvas.shape)
    idx = indices_full.astype(jnp.int32)
    color = lut_select(lut_bgra, idx)  # (H, W, 4)
    valid = drawn_mask & (idx < lut_bgra.shape[0])
    if have_trans:
        valid = valid & (idx != trans_idx)
    return jnp.where(valid[..., None], color, canvas)


# (clear_rect_to / restore_rect — trivial jnp.where dispose wrappers —
# were removed: the batched path does disposal inside
# composite_animation's scan and the streaming path is numpy.)


@jax.jit
def composite_animation_rgba(frames_full: jax.Array, drawn_masks: jax.Array,
                             blend_flags: jax.Array, prev_disposal: jax.Array,
                             prev_rect_masks: jax.Array) -> jax.Array:
    """Composite an animated-WebP/AVIF-style clip in ONE lax.scan dispatch.

    Frames carry their own BGRA pixels (pre-scattered to canvas shape, zeros
    outside the rect); per-frame blend is WebP semantics (0 = alpha blend,
    1 = replace) and disposal 1 clears the previous frame's rect to
    transparent — the same ops the streaming ImageOps path applies per
    frame (ops.go:150-218, 431-461), so outputs are byte-identical.

      frames_full     (N, H, W, 4) u8
      drawn_masks     (N, H, W)    bool
      blend_flags     (N,)         i32  (0 blend / 1 no-blend)
      prev_disposal   (N,)         i32  disposal of frame k-1 (0 for k=0)
      prev_rect_masks (N, H, W)    bool rect of frame k-1
    """
    from .blend import alpha_blend_full

    h, w = frames_full.shape[1], frames_full.shape[2]
    init = jnp.zeros((h, w, 4), jnp.uint8)

    def step(canvas, x):
        frame, drawn, blend_flag, disp, prect = x
        canvas = jnp.where((disp == 1) & prect[..., None],
                           jnp.zeros((), jnp.uint8), canvas)
        blended = alpha_blend_full(canvas, frame)
        drawn3 = drawn[..., None]
        canvas = jnp.where(drawn3 & (blend_flag == 0), blended, canvas)
        canvas = jnp.where(drawn3 & (blend_flag != 0), frame, canvas)
        return canvas, canvas

    _, out = jax.lax.scan(step, init, (frames_full, drawn_masks, blend_flags,
                                       prev_disposal, prev_rect_masks),
                          unroll=8)
    return out


@jax.jit
def composite_animation(idx_frames: jax.Array, drawn_masks: jax.Array,
                        luts: jax.Array, pal_counts: jax.Array,
                        trans_idx: jax.Array, prev_disposal: jax.Array,
                        prev_rect_masks: jax.Array,
                        bg_bgra: jax.Array) -> jax.Array:
    """Composite a whole GIF animation in ONE dispatch via lax.scan.

    The loop-carried dispose/draw dependence (SURVEY.md hard part #4,
    giflib.cpp:400-541 semantics) becomes a scan with (canvas, prev_canvas)
    as carry; every per-frame input is pre-scattered to canvas shape on the
    host so the compiled program is geometry-stable:

      idx_frames      (N, H, W)   u8 palette indices scattered into canvas
      drawn_masks     (N, H, W)   bool, inside this frame's clipped rect
      luts            (N, 256, 4) u8 BGRA palette (255-padded alpha rows ok)
      pal_counts      (N,)        i32 effective palette sizes
      trans_idx       (N,)        i32 transparent index (-1 = none)
      prev_disposal   (N,)        i32 GIF disposal of frame k-1 (0 for k=0)
      prev_rect_masks (N, H, W)   bool rect of frame k-1 (False row for k=0)

    Returns (N, H, W, 4) u8 composited frames.
    """
    n, h, w = idx_frames.shape[0], idx_frames.shape[1], idx_frames.shape[2]
    init_canvas = jnp.broadcast_to(bg_bgra.astype(jnp.uint8), (h, w, 4))
    # giflib's prev_frame_bgra starts zeroed and is saved only from the
    # second frame on (giflib.cpp:491-494): a first-frame DISPOSE_PREVIOUS
    # therefore restores transparent black, not the background fill
    zeros = jnp.zeros((h, w, 4), jnp.uint8)
    is_first = jnp.arange(n) == 0

    def step(carry, x):
        canvas, prev_canvas = carry
        idx, drawn, lut, count, trans, disp, prect, first = x
        # dispose previous frame region (giflib.cpp:400-489)
        m = prect[..., None]
        canvas = jnp.where((disp == 2) & m, init_canvas, canvas)
        canvas = jnp.where((disp == 3) & m, prev_canvas, canvas)
        # saved post-disposal, pre-draw; giflib never saves before frame 1
        new_prev = jnp.where(first, zeros, canvas)
        idx32 = idx.astype(jnp.int32)
        color = lut_select(lut, idx32)
        valid = drawn & (idx32 != trans) & (idx32 < count)
        canvas = jnp.where(valid[..., None], color, canvas)
        return (canvas, new_prev), canvas

    # unroll: the per-iteration loop overhead (~180us/frame measured on
    # v5e) dominates the ~4 canvas-sized wheres of actual work; unrolled
    # bodies fuse across frames
    (_, _), frames = jax.lax.scan(
        step, (init_canvas, zeros),
        (idx_frames, drawn_masks, luts, pal_counts, trans_idx,
         prev_disposal, prev_rect_masks, is_first), unroll=8)
    return frames
