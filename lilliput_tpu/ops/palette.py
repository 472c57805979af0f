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


@functools.partial(jax.jit, static_argnames=("trans_idx", "use_prev", "have_trans"))
def quantize_to_palette(img: jax.Array, palette_rgb: jax.Array,
                        prev_bgra: jax.Array, seen_keys: jax.Array,
                        trans_idx: int, have_trans: bool, use_prev: bool):
    """(H, W, 4) u8 BGRA -> (H, W) u8 palette indices.

    palette_rgb: (N, 3) int32 RGB (the transparent entry is skipped in the
    search). Rules match giflib.cpp:1006-1093:
      * alpha < 128 and transparency available -> transparent index
      * search color is the crushed-to-5-bit midpoint ((c & 0xF8) | 4) unless
        the pixel is an extreme light/dark color, then the exact value
      * Manhattan distance, first-lowest index wins
      * if the pixel is closer to the previous output frame's pixel than to
        the chosen palette color, emit transparent instead (smaller LZW)
    """
    b = img[..., 0].astype(jnp.int32)
    g = img[..., 1].astype(jnp.int32)
    r = img[..., 2].astype(jnp.int32)
    a = img[..., 3].astype(jnp.int32)

    extreme = ((r > 240) & (g > 240) & (b > 240)) | ((r < 15) & (g < 15) & (b < 15))
    rc = jnp.where(extreme, r, (r & 0xF8) | 4)
    gc = jnp.where(extreme, g, (g & 0xF8) | 4)
    bc = jnp.where(extreme, b, (b & 0xF8) | 4)

    pal = palette_rgb.astype(jnp.int32)  # (N, 3)
    dist = (jnp.abs(rc[..., None] - pal[:, 0])
            + jnp.abs(gc[..., None] - pal[:, 1])
            + jnp.abs(bc[..., None] - pal[:, 2]))  # (H, W, N)
    if have_trans and 0 <= trans_idx < pal.shape[0]:
        dist = dist.at[..., trans_idx].set(jnp.iinfo(jnp.int32).max)
    best = jnp.argmin(dist, axis=-1).astype(jnp.int32)
    least_mid = jnp.min(dist, axis=-1)

    best_rgb = jnp.take(pal, best, axis=0, mode="clip")
    least_actual = (jnp.abs(r - best_rgb[..., 0]) + jnp.abs(g - best_rgb[..., 1])
                    + jnp.abs(b - best_rgb[..., 2]))

    h, w = r.shape[-2], r.shape[-1]
    crushed = (((r >> 3) << 10) | ((g >> 3) << 5) | (b >> 3)).reshape(-1)
    if use_prev and have_trans:
        # giflib's 15-bit lookup cache makes the FIRST pixel of each crushed
        # key use the midpoint distance for the prev-frame comparison, while
        # cache hits use the actual-pixel distance (giflib.cpp:1027-1072).
        # The cache persists across same-palette frames, so `seen_keys`
        # carries which keys were already computed; the frame-local "first
        # occurrence in raster order" map is a scatter-min of linear indices.
        lin = jnp.arange(h * w, dtype=jnp.int32)
        first_of_key = jnp.full((1 << 15,), jnp.iinfo(jnp.int32).max, jnp.int32)
        first_of_key = first_of_key.at[crushed].min(lin)
        is_first = ((first_of_key[crushed] == lin)
                    & ~seen_keys[crushed]).reshape(r.shape)
        least = jnp.where(is_first, least_mid, least_actual)
        dp = (jnp.abs(r - prev_bgra[..., 2].astype(jnp.int32))
              + jnp.abs(g - prev_bgra[..., 1].astype(jnp.int32))
              + jnp.abs(b - prev_bgra[..., 0].astype(jnp.int32)))
        best = jnp.where(dp < least, trans_idx, best)

    if have_trans:
        best = jnp.where(a < 128, trans_idx, best)
    new_seen = seen_keys.at[crushed].set(True)
    return best.astype(jnp.uint8), new_seen


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
    color = jnp.take(lut_bgra, idx, axis=0, mode="clip")  # (H, W, 4)
    valid = drawn_mask & (idx < lut_bgra.shape[0])
    if have_trans:
        valid = valid & (idx != trans_idx)
    return jnp.where(valid[..., None], color, canvas)


@jax.jit
def clear_rect_to(canvas: jax.Array, mask: jax.Array, color: jax.Array) -> jax.Array:
    """Fill masked region with a color (dispose-to-background)."""
    return jnp.where(mask[..., None], color.astype(canvas.dtype), canvas)


@jax.jit
def restore_rect(canvas: jax.Array, mask: jax.Array, saved: jax.Array) -> jax.Array:
    """Restore masked region from a saved canvas (dispose-previous)."""
    return jnp.where(mask[..., None], saved, canvas)


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
                                       prev_disposal, prev_rect_masks))
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
    h, w = idx_frames.shape[1], idx_frames.shape[2]
    init_canvas = jnp.broadcast_to(bg_bgra.astype(jnp.uint8), (h, w, 4))

    def step(carry, x):
        canvas, prev_canvas = carry
        idx, drawn, lut, count, trans, disp, prect = x
        # dispose previous frame region (giflib.cpp:400-489)
        m = prect[..., None]
        canvas = jnp.where((disp == 2) & m, init_canvas, canvas)
        canvas = jnp.where((disp == 3) & m, prev_canvas, canvas)
        new_prev = canvas  # saved post-disposal, pre-draw (giflib.cpp:491-494)
        idx32 = idx.astype(jnp.int32)
        color = jnp.take(lut, idx32, axis=0, mode="clip")
        valid = drawn & (idx32 != trans) & (idx32 < count)
        canvas = jnp.where(valid[..., None], color, canvas)
        return (canvas, new_prev), canvas

    (_, _), frames = jax.lax.scan(
        step, (init_canvas, init_canvas),
        (idx_frames, drawn_masks, luts, pal_counts, trans_idx,
         prev_disposal, prev_rect_masks))
    return frames
