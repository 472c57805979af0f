#!/usr/bin/env python3
"""Per-stage device profile of the animated-GIF serving path (real chip).

Decomposes bench.py's anim workload (bucket-32 frames, 480x480 canvas ->
128x128, composite scan + AREA resize + quantize scan) into stages with
the chained optimization_barrier methodology (see tools/profile_stages.py
for why the barrier is required). One JSON line. Stages:

  full             composite + resize + quantize, barriers between the
                   stages (the production three-dispatch shape)
  full_fused       same without barriers (tracks the fusion penalty)
  batch_full /     ANIMS animations through the vmapped cross-animation
  seq_full         chain vs the same work as sequential in-program chains
  composite_only   composite_animation scan alone
  comp_hilo /      composite with alternative LUT-dot splits (history of
  comp_3208        the 16/16 -> 32/8 hi-first experiments)
  rgba_full        the WebP/AVIF-class chain (composite_rgba + resize)
  lut_batch        LUT expansion as an XLA gather (the original sin)
  lut_onehot       LUT expansion as a full 256-wide one-hot dot
  resize_only      batched exact AREA resize alone
  quantize_only    scan-free quantize_animation alone
  qn_argmin        its vectorized midpoint argmin alone
  qn_sorts         its sort-based first-occurrence machinery alone
  qn_scatgat       the REJECTED packed scatter-min + gather form
  comp_* / quant_* older decomposition stages (see git history)

All stages take unfoldable inputs (pre-buffers perturbed by `x & 1`) —
`x * 0` perturbations constant-fold the whole stage away.

Usage: python tools/profile_anim.py
       (TPU; CHAIN/ITERS/FRAMES/CANVAS/DST/ANIMS/STAGES env)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    chain = int(os.environ.get("CHAIN", "4"))
    iters = int(os.environ.get("ITERS", "12"))
    af = int(os.environ.get("FRAMES", "32"))

    import jax
    import jax.numpy as jnp

    from lilliput_tpu.ops import palette as PAL
    from lilliput_tpu.ops import resize as RZ

    ah = aw = int(os.environ.get("CANVAS", "480"))
    adw = adh = int(os.environ.get("DST", "128"))
    nb_anim = int(os.environ.get("ANIMS", "4"))

    @jax.jit
    def _inputs(key):
        ks = jax.random.split(key, 3)
        idxf = jax.random.bits(ks[0], (af, ah, aw), dtype=jnp.uint8)
        luts = jax.random.bits(ks[1], (af, 256, 4), dtype=jnp.uint8)
        pals = jax.random.bits(ks[2], (af, 256, 3),
                               dtype=jnp.uint8).astype(jnp.int32)
        return idxf, luts, pals

    idxf, luts, pals = _inputs(jax.random.key(1))
    drawn = jnp.ones((af, ah, aw), jnp.bool_)
    counts = jnp.full((af,), 256, jnp.int32)
    notrans = jnp.full((af,), -1, jnp.int32)
    trans0 = jnp.zeros((af,), jnp.int32)
    pdisp = jnp.zeros((af,), jnp.int32)
    prect = jnp.zeros((af, ah, aw), jnp.bool_)
    bg = jnp.zeros((4,), jnp.uint8)
    clear = jnp.zeros((af,), jnp.bool_)
    uprev = jnp.ones((af,), jnp.bool_)

    # pre-resized u8 frames for the quantize-side stages
    pre = jax.jit(lambda x, l: RZ.resize(
        PAL.composite_animation(x, drawn, l, counts, notrans, pdisp,
                                prect, bg), adw, adh, RZ.AREA))(idxf, luts)
    pre = jax.device_put(jax.numpy.asarray(pre))
    # full-res composited u8 frames for the resize-side stages
    pre_full = jax.jit(lambda x, l: PAL.composite_animation(
        x, drawn, l, counts, notrans, pdisp, prect, bg))(idxf, luts)
    pre_full = jax.device_put(jax.numpy.asarray(pre_full))

    def chained(step_fn):
        @jax.jit
        def cs(x0, luts_, pals_):
            acc = jnp.int32(0)
            x = x0
            for _ in range(chain):
                o = step_fn(x, luts_, pals_)
                if not isinstance(o, (tuple, list)):
                    o = (o,)
                o = jax.lax.optimization_barrier(tuple(o))
                s = sum(jnp.sum(v.astype(jnp.int32)) for v in o)
                acc = acc + s
                x = x0 + (s % 2).astype(x0.dtype)
            return acc
        return cs

    def full(x, luts_, pals_):
        # barriers between stages = the production three-dispatch shape
        comp = PAL.composite_animation(x, drawn, luts_, counts, notrans,
                                       pdisp, prect, bg)
        comp = jax.lax.optimization_barrier(comp)
        rs = RZ.resize(comp, adw, adh, RZ.AREA)
        rs = jax.lax.optimization_barrier(rs)
        return PAL.quantize_animation(rs, pals_, counts, trans0, clear,
                                      uprev)

    def full_fused(x, luts_, pals_):
        # no barriers. With the original scan quantizer this re-fused
        # producers into the scan and ran ~4x the stage sum; with the
        # scan-free quantizer it measures IDENTICAL to `full` (6.13 ms
        # both, CHAIN=16) — kept to track the penalty across compilers
        comp = PAL.composite_animation(x, drawn, luts_, counts, notrans,
                                       pdisp, prect, bg)
        rs = RZ.resize(comp, adw, adh, RZ.AREA)
        return PAL.quantize_animation(rs, pals_, counts, trans0, clear,
                                      uprev)

    def composite_only(x, luts_, pals_):
        return PAL.composite_animation(x, drawn, luts_, counts, notrans,
                                       pdisp, prect, bg)

    def batch_full(x, luts_, pals_):
        # ANIMS animations through the vmapped batch chain (the
        # transcode_gif_batch device path); compare ANIMS x `full`
        B = nb_anim
        bx = jnp.broadcast_to(x, (B,) + x.shape)
        bl = jnp.broadcast_to(luts_, (B,) + luts_.shape)
        bp = jnp.broadcast_to(pals_, (B,) + pals_.shape)
        comp = jax.vmap(PAL.composite_animation)(
            bx, jnp.broadcast_to(drawn, (B,) + drawn.shape), bl,
            jnp.broadcast_to(counts, (B, af)),
            jnp.broadcast_to(notrans, (B, af)),
            jnp.broadcast_to(pdisp, (B, af)),
            jnp.broadcast_to(prect, (B,) + prect.shape),
            jnp.broadcast_to(bg, (B, 4)))
        comp = jax.lax.optimization_barrier(comp)
        rs = RZ.resize(comp, adw, adh, RZ.AREA)
        rs = jax.lax.optimization_barrier(rs)
        return jax.vmap(PAL.quantize_animation)(
            rs, bp, jnp.broadcast_to(counts, (B, af)),
            jnp.broadcast_to(trans0, (B, af)),
            jnp.broadcast_to(clear, (B, af)),
            jnp.broadcast_to(uprev, (B, af)))

    def seq_full(x, luts_, pals_):
        # the same ANIMS animations as ANIMS sequential chains in one
        # program (models per-animation dispatch without tunnel RTT)
        outs = []
        for _ in range(nb_anim):
            o = full(x, luts_, pals_)
            o = jax.lax.optimization_barrier(o)
            outs.append(o)
            x = x + (o[0, 0, 0] % 2).astype(x.dtype)
        return tuple(outs)

    def comp_3208(x, luts_, pals_):
        # 32/8 split, hi contracted first: intermediates oh_hi (n,32) +
        # b (n,8,C) + oh_lo (n,8) = 144 B/px vs the 16/16 form's 192
        init_canvas = jnp.broadcast_to(bg.astype(jnp.uint8), (ah, aw, 4))
        zeros = jnp.zeros((ah, aw, 4), jnp.uint8)
        is_first = jnp.arange(af) == 0

        def sel(lut, idx):
            t = lut.astype(jnp.bfloat16).reshape(32, 8, -1)
            oh_hi = ((idx[..., None] >> 3)
                     == jnp.arange(32, dtype=jnp.int32)).astype(jnp.bfloat16)
            oh_lo = ((idx[..., None] & 7)
                     == jnp.arange(8, dtype=jnp.int32)).astype(jnp.bfloat16)
            b_ = jnp.einsum("hwg,glc->hwlc", oh_hi, t,
                            precision=jax.lax.Precision.DEFAULT)
            return jnp.einsum("hwl,hwlc->hwc", oh_lo, b_,
                              precision=jax.lax.Precision.DEFAULT
                              ).astype(jnp.uint8)

        def step(carry, xs):
            canvas, prev_canvas = carry
            idx, dr, lut, count, trans, disp, prm, first = xs
            m = prm[..., None]
            canvas = jnp.where((disp == 2) & m, init_canvas, canvas)
            canvas = jnp.where((disp == 3) & m, prev_canvas, canvas)
            new_prev = jnp.where(first, zeros, canvas)
            idx32 = idx.astype(jnp.int32)
            color = sel(lut, idx32)
            val = dr & (idx32 != trans) & (idx32 < count)
            canvas = jnp.where(val[..., None], color, canvas)
            return (canvas, new_prev), canvas

        (_, _), frames = jax.lax.scan(
            step, (init_canvas, zeros),
            (x, drawn, luts_, counts, notrans, pdisp, prect, is_first),
            unroll=8)
        return frames

    def rgba_full(x, luts_, pals_):
        # WebP/AVIF-class chain: composite_animation_rgba + exact resize
        # (no quantize; frames carry their own BGRA pixels)
        frames_full = jnp.broadcast_to(
            x[..., None], x.shape + (4,)).astype(jnp.uint8)
        comp = PAL.composite_animation_rgba(
            frames_full, drawn, jnp.zeros((af,), jnp.int32), pdisp, prect)
        comp = jax.lax.optimization_barrier(comp)
        return RZ.resize(comp, adw, adh, RZ.AREA)

    def comp_hilo(x, luts_, pals_):
        # composite scan with the LUT selection dot split hi/lo nibble:
        # one-hot operands shrink from (n,256) to 2x(n,16)
        init_canvas = jnp.broadcast_to(bg.astype(jnp.uint8), (ah, aw, 4))
        zeros = jnp.zeros((ah, aw, 4), jnp.uint8)
        is_first = jnp.arange(af) == 0
        nib = jnp.arange(16, dtype=jnp.int32)

        def sel_hilo(lut, idx):
            t = lut.astype(jnp.bfloat16).reshape(16, 16, -1)  # (hi,lo,C)
            oh_lo = ((idx[..., None] & 15) == nib).astype(jnp.bfloat16)
            oh_hi = ((idx[..., None] >> 4) == nib).astype(jnp.bfloat16)
            b_ = jnp.einsum("hwl,glc->hwgc", oh_lo, t,
                            precision=jax.lax.Precision.DEFAULT)
            return jnp.einsum("hwg,hwgc->hwc", oh_hi, b_,
                              precision=jax.lax.Precision.DEFAULT
                              ).astype(jnp.uint8)

        def step(carry, xs):
            canvas, prev_canvas = carry
            idx, dr, lut, count, trans, disp, prm, first = xs
            m = prm[..., None]
            canvas = jnp.where((disp == 2) & m, init_canvas, canvas)
            canvas = jnp.where((disp == 3) & m, prev_canvas, canvas)
            new_prev = jnp.where(first, zeros, canvas)
            idx32 = idx.astype(jnp.int32)
            color = sel_hilo(lut, idx32)
            val = dr & (idx32 != trans) & (idx32 < count)
            canvas = jnp.where(val[..., None], color, canvas)
            return (canvas, new_prev), canvas

        (_, _), frames = jax.lax.scan(
            step, (init_canvas, zeros),
            (x, drawn, luts_, counts, notrans, pdisp, prect, is_first),
            unroll=8)
        return frames

    def sort_524k(x, luts_, pals_):
        # cost probe: one u32 key-value sort at the quantizer's pixel
        # count (the sort-based first-occurrence alternative needs two)
        keys = (x[:, :adh, :adw].astype(jnp.int32).reshape(-1)
                * 7919 + jnp.arange(af * adh * adw, dtype=jnp.int32))
        vals = jnp.arange(af * adh * adw, dtype=jnp.int32)
        return jax.lax.sort((keys, vals), num_keys=1)

    def comp_resize(x, luts_, pals_):
        comp = PAL.composite_animation(x, drawn, luts_, counts, notrans,
                                       pdisp, prect, bg)
        comp = jax.lax.optimization_barrier(comp)
        return RZ.resize(comp, adw, adh, RZ.AREA)

    def two_scans_indep(x, luts_, pals_):
        # composite scan + quantize scan in ONE program, data-independent
        # (quantize reads the uploaded buffer): isolates "two scans in one
        # XLA program" from the comp->quant data dependence
        comp = PAL.composite_animation(x, drawn, luts_, counts, notrans,
                                       pdisp, prect, bg)
        q = PAL.quantize_animation(pre[:, :adh, :adw], pals_, counts,
                                   trans0, clear, uprev)
        return comp, q

    def comp_quant_dep(x, luts_, pals_):
        # composite -> (cheap slice, no resize) -> quantize: the data-
        # dependent two-scan chain without the resize in between
        comp = PAL.composite_animation(x, drawn, luts_, counts, notrans,
                                       pdisp, prect, bg)
        comp = jax.lax.optimization_barrier(comp)
        rs = comp[:, :adh, :adw, :]
        return PAL.quantize_animation(rs, pals_, counts, trans0, clear,
                                      uprev)

    def resize_quant(x, luts_, pals_):
        p = pre_full + (x[..., None] & 1)
        rs = RZ.resize(p, adw, adh, RZ.AREA)
        rs = jax.lax.optimization_barrier(rs)
        return PAL.quantize_animation(rs, pals_, counts, trans0, clear,
                                      uprev)

    def lut_batch(x, luts_, pals_):
        return jax.vmap(lambda i, l: jnp.take(l, i.astype(jnp.int32),
                                              axis=0, mode="clip"))(x, luts_)

    def lut_onehot(x, luts_, pals_):
        def one(args):
            i, l = args
            oh = (i.astype(jnp.int32)[..., None]
                  == jnp.arange(256, dtype=jnp.int32)).astype(jnp.bfloat16)
            return jnp.einsum(
                "hwp,pc->hwc", oh, l.astype(jnp.bfloat16),
                precision=jax.lax.Precision.DEFAULT).astype(jnp.uint8)
        return jax.lax.map(one, (x, luts_))

    def comp_wheres(x, luts_, pals_):
        colors = lut_batch(x, luts_, pals_)
        idx32 = x.astype(jnp.int32)
        valid = (drawn & (idx32 != notrans[:, None, None])
                 & (idx32 < counts[:, None, None]))
        init_canvas = jnp.broadcast_to(bg.astype(jnp.uint8), (ah, aw, 4))
        zeros = jnp.zeros((ah, aw, 4), jnp.uint8)
        is_first = jnp.arange(af) == 0

        def step(carry, xs):
            canvas, prev_canvas = carry
            color, val, disp, prm, first = xs
            m = prm[..., None]
            canvas = jnp.where((disp == 2) & m, init_canvas, canvas)
            canvas = jnp.where((disp == 3) & m, prev_canvas, canvas)
            new_prev = jnp.where(first, zeros, canvas)
            canvas = jnp.where(val[..., None], color, canvas)
            return (canvas, new_prev), canvas

        (_, _), frames = jax.lax.scan(
            step, (init_canvas, zeros),
            (colors, valid, pdisp, prect, is_first))
        return frames

    def resize_only(x, luts_, pals_):
        # x is idx frames; use the full-res composited buffer via closure
        # to keep input plumbing uniform (data dependence via the chain
        # comes from the caller's x perturbation folded in)
        p = pre_full + (x[..., None] & 1)  # cheap but unfoldable dep on x
        return RZ.resize(p, adw, adh, RZ.AREA)

    def resize_sel(x, luts_, pals_):
        # challenger: same exact-AREA tap structure, but each constant-
        # index gather expressed as a 0/1 selection dot at HIGHEST
        # precision (exact f32 reconstruction: 3-way bf16 split with a
        # 0/1 operand keeps terms a1b1+a2b1+a3b1 = a)
        from lilliput_tpu.ops import resize_tables as T
        import numpy as np
        p = (pre_full + (x[..., None] & 1)).astype(jnp.float32)
        src_h, src_w = ah, aw
        xi, xw = T.area_tables(src_w, adw)
        yi, yw = T.area_tables(src_h, adh)
        z = RZ._runtime_zero_bits(p)

        def sel(n, idx):
            m = np.zeros((n, idx.shape[0]), np.float32)
            m[idx, np.arange(idx.shape[0])] = 1.0
            return jnp.asarray(m)

        h = jnp.zeros(p.shape[:-2] + (adw, p.shape[-1]), jnp.float32)
        for k in range(xi.shape[1]):
            g = jnp.einsum("bhwc,wo->bhoc", p, sel(src_w, xi[:, k]),
                           precision=jax.lax.Precision.HIGHEST)
            h = h + RZ._rounded_product(
                g, jnp.asarray(xw[:, k])[:, None], z)
        out = jnp.zeros(h.shape[:-3] + (adh,) + h.shape[-2:], jnp.float32)
        for k in range(yi.shape[1]):
            g = jnp.einsum("bhoc,hp->bpoc", h, sel(src_h, yi[:, k]),
                           precision=jax.lax.Precision.HIGHEST)
            out = out + RZ._rounded_product(
                g, jnp.asarray(yw[:, k])[:, None, None], z)
        return jnp.clip(jnp.round(out), 0, 255).astype(jnp.uint8)

    def quantize_only(x, luts_, pals_):
        # real data dependence on x — `pre + x*0` lets XLA constant-fold
        # the whole stage (measured: compile_s balloons, run time reads 0)
        p = pre + (x[:, :adh, :adw, None] & 1)
        return PAL.quantize_animation(p, pals_, counts,
                                      trans0, clear, uprev)

    def qn_sorts(x, luts_, pals_):
        # the sort-based first-occurrence machinery alone (2 stable sorts
        # + segmented forward-fill) on real runtime data
        p = pre + (x[:, :adh, :adw, None] & 1)
        n = adh * adw
        imax = jnp.iinfo(jnp.int32).max
        r = p[..., 2].astype(jnp.int32).reshape(-1)
        g = p[..., 1].astype(jnp.int32).reshape(-1)
        b = p[..., 0].astype(jnp.int32).reshape(-1)
        crushed = ((r >> 3) << 10) | ((g >> 3) << 5) | (b >> 3)
        glin = jnp.arange(af * n, dtype=jnp.int32)
        packed = glin * 256 + (crushed & 255)
        skey = crushed
        skey_s, packed_s, glin_s = jax.lax.sort(
            (skey, packed, glin), num_keys=1, is_stable=True)
        first_flag = jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), skey_s[1:] != skey_s[:-1]])

        def fill(a_, b_):
            va, fa = a_
            vb, fb = b_
            return jnp.where(fb, vb, va), fa | fb

        leader_s, _ = jax.lax.associative_scan(fill, (packed_s, first_flag))
        _, first_packed = jax.lax.sort(
            (glin_s, leader_s), num_keys=1, is_stable=True)
        return first_packed, (first_packed == packed)

    def qn_argmin(x, luts_, pals_):
        # the new quantizer's vectorized midpoint argmin alone
        p = pre + (x[:, :adh, :adw, None] & 1)
        r = p[..., 2].astype(jnp.int32)
        g = p[..., 1].astype(jnp.int32)
        b = p[..., 0].astype(jnp.int32)
        extreme = (((r > 240) & (g > 240) & (b > 240))
                   | ((r < 15) & (g < 15) & (b < 15)))
        rc = jnp.where(extreme, r, (r & 0xF8) | 4)
        gc = jnp.where(extreme, g, (g & 0xF8) | 4)
        bc = jnp.where(extreme, b, (b & 0xF8) | 4)
        pal_b = pals_[:, None, None, :, :]
        dist = (jnp.abs(rc[..., None] - pal_b[..., 0])
                + jnp.abs(gc[..., None] - pal_b[..., 1])
                + jnp.abs(bc[..., None] - pal_b[..., 2]))
        return (jnp.argmin(dist, axis=-1).astype(jnp.int32),
                jnp.min(dist, axis=-1))

    def qn_scatgat(x, luts_, pals_):
        # the new quantizer's packed scatter-min + gather alone
        p = pre + (x[:, :adh, :adw, None] & 1)
        n = adh * adw
        imax = jnp.iinfo(jnp.int32).max
        r = p[..., 2].astype(jnp.int32).reshape(-1)
        g = p[..., 1].astype(jnp.int32).reshape(-1)
        b = p[..., 0].astype(jnp.int32).reshape(-1)
        crushed = ((r >> 3) << 10) | ((g >> 3) << 5) | (b >> 3)
        table_n = af * (PAL.CACHE_SIZE - 1) + 1
        segp = jnp.repeat(jnp.arange(af, dtype=jnp.int32) * 0, n,
                          total_repeat_length=af * n)
        ckey = segp * (PAL.CACHE_SIZE - 1) + crushed
        glin = jnp.arange(af * n, dtype=jnp.int32)
        packed = glin * 256 + (crushed & 255)
        table = jnp.full((table_n,), imax, jnp.int32)
        table = table.at[ckey].min(packed)
        first_packed = table[ckey]
        return first_packed, (first_packed == packed)

    def quant_argmin(x, luts_, pals_):
        p = pre + (x[:, :adh, :adw, None] & 1)

        def one(args):
            img, pal = args
            r = img[..., 2].astype(jnp.int32)
            g = img[..., 1].astype(jnp.int32)
            b = img[..., 0].astype(jnp.int32)
            extreme = (((r > 240) & (g > 240) & (b > 240))
                       | ((r < 15) & (g < 15) & (b < 15)))
            rc = jnp.where(extreme, r, (r & 0xF8) | 4)
            gc = jnp.where(extreme, g, (g & 0xF8) | 4)
            bc = jnp.where(extreme, b, (b & 0xF8) | 4)
            dist = (jnp.abs(rc[..., None] - pal[:, 0])
                    + jnp.abs(gc[..., None] - pal[:, 1])
                    + jnp.abs(bc[..., None] - pal[:, 2]))
            return jnp.argmin(dist, axis=-1).astype(jnp.uint8)
        return jax.lax.map(one, (p, pals_))

    def quant_cache(x, luts_, pals_):
        p = pre + (x[:, :adh, :adw, None] & 1)
        n = adh * adw
        imax = jnp.iinfo(jnp.int32).max
        lin = jnp.arange(n, dtype=jnp.int32)

        def step(carry, img):
            seen, cache = carry
            r = img[..., 2].astype(jnp.int32).reshape(-1)
            g = img[..., 1].astype(jnp.int32).reshape(-1)
            b = img[..., 0].astype(jnp.int32).reshape(-1)
            crushed = ((r >> 3) << 10) | ((g >> 3) << 5) | (b >> 3)
            first_of_key = jnp.full((PAL.CACHE_SIZE,), imax, jnp.int32)
            first_of_key = first_of_key.at[crushed].min(lin)
            first_idx = first_of_key[crushed]
            seen_g = seen[crushed]
            cached = cache[crushed].astype(jnp.int32)
            best = jnp.where(seen_g, cached, first_idx % 256)
            cache = cache.at[crushed].set(best.astype(jnp.uint8))
            seen = seen.at[crushed].set(True)
            return (seen, cache), best.astype(jnp.uint8).reshape(adh, adw)

        seen0 = jnp.zeros((PAL.CACHE_SIZE,), jnp.bool_)
        cache0 = jnp.zeros((PAL.CACHE_SIZE,), jnp.uint8)
        _, out = jax.lax.scan(step, (seen0, cache0), p)
        return out

    stages = {
        "full": full,
        "batch_full": batch_full,
        "seq_full": seq_full,
        "full_fused": full_fused,
        "composite_only": composite_only,
        "comp_3208": comp_3208,
        "rgba_full": rgba_full,
        "comp_hilo": comp_hilo,
        "sort_524k": sort_524k,
        "comp_resize": comp_resize,
        "resize_quant": resize_quant,
        "two_scans_indep": two_scans_indep,
        "comp_quant_dep": comp_quant_dep,
        "comp_wheres": comp_wheres,
        "lut_batch": lut_batch,
        "lut_onehot": lut_onehot,
        "resize_only": resize_only,
        "resize_sel": resize_sel,
        "quantize_only": quantize_only,
        "qn_argmin": qn_argmin,
        "qn_sorts": qn_sorts,
        "qn_scatgat": qn_scatgat,
        "quant_argmin": quant_argmin,
        "quant_cache": quant_cache,
    }
    sel = os.environ.get("STAGES")
    if sel:
        stages = {k: v for k, v in stages.items() if k in sel.split(",")}

    one_f = jax.device_put(jnp.float32(1.0))
    triv = jax.jit(lambda v: v + 1)
    float(triv(one_f))
    rtts = []
    for _ in range(10):
        t1 = time.time()
        float(triv(one_f))
        rtts.append(time.time() - t1)
    rtts.sort()
    rtt = rtts[len(rtts) // 2]

    out = {"frames": af, "chain": chain, "rtt_ms": round(rtt * 1000, 2)}
    for name, fn in stages.items():
        cs = chained(fn)
        t0 = time.time()
        int(cs(idxf, luts, pals))
        compile_s = time.time() - t0
        times = []
        for _ in range(max(iters // chain, 3)):
            t1 = time.time()
            int(cs(idxf, luts, pals))
            times.append(time.time() - t1)
        times.sort()
        p50 = max(times[len(times) // 2] - rtt, 1e-9) / chain
        mult = nb_anim if name in ("batch_full", "seq_full") else 1
        out[name] = {"ms_per_step": round(p50 * 1000, 2),
                     "frames_per_sec": round(mult * af / p50, 1),
                     "compile_s": round(compile_s, 1)}
        print(json.dumps({name: out[name]}), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
