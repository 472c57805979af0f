#!/usr/bin/env python3
"""Per-stage device profile of the rgb-parity fused transcode (real chip).

Decomposes the ~24 ms/batch-128 rgb-parity step into its stages with the
bench.py chained-checksum methodology (the tunnel acks dispatch, so every
timed call forces materialization and amortizes the RTT over a K-step
data-dependent chain). One JSON line. Stages:

  idct_only        three dequant+IDCT einsums (block space, no epilogue)
  mega_planes      420 megakernel -> u8 planes in block-vector space
  mega_relayout    + the blocks->raster transpose per channel
  full_rgb         the complete parity step (crop/resize/fdct/quant)
  tail_only        relayout+resize+encode on PRE-DECODED block planes
  split_decode     pure-XLA split decode to u8 planes (no Pallas)

Usage: python tools/profile_stages.py  (TPU; BATCH/CHAIN/ITERS env)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")


def main():
    batch = int(os.environ.get("BATCH", "128"))
    chain = int(os.environ.get("CHAIN", "4"))
    iters = int(os.environ.get("ITERS", "12"))

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import _ensure_fixture
    from lilliput_tpu.ops import jpeg_kernels as K
    from lilliput_tpu.ops import pallas_kernels as PK
    from lilliput_tpu.ops import resize as R
    from lilliput_tpu.pipeline import (JpegTranscodePipeline, fit_rect,
                                       fused_jpeg_fit_transcode)

    buf = _ensure_fixture()
    pipe = JpegTranscodePipeline(buf, 256, 256, quality=85)
    coefs = pipe.decode_entropy([buf] * batch)
    dev = [jax.device_put(c) for c in coefs]
    yc, cb, cr, qty, qtc = dev
    g = pipe.geom
    win = pipe.window_static
    x0, y0, rw, rh = win
    left, top, w, h = fit_rect(g.width, g.height, 256, 256)

    def chained(step_fn, n_in=3):
        @jax.jit
        def cs(yc, cb, cr, qy, qc, eqy, eqc):
            acc = jnp.int32(0)
            y = yc
            for _ in range(chain):
                o = step_fn(y, cb, cr, qy, qc, eqy, eqc)
                if not isinstance(o, (tuple, list)):
                    o = (o,)
                # the barrier forces every output to MATERIALIZE before the
                # checksum: without it XLA folds transposes/whole chains
                # into the reduction and the stage under-measures
                o = jax.lax.optimization_barrier(tuple(o))
                s = sum(jnp.sum(v.astype(jnp.int32)) for v in o)
                acc = acc + s
                y = yc + (s % 2).astype(y.dtype)
            return acc
        return cs

    args = (yc, cb, cr, qty, qtc, pipe.enc_qt_y, pipe.enc_qt_c)

    def idct_only(y, cbc, crc, qy, qc, eqy, eqc):
        a = K.dequant_idct_u8(y, qy)
        b = K.dequant_idct_u8(cbc, qc)
        c = K.dequant_idct_u8(crc, qc)
        return a, b, c

    def mega_planes(y, cbc, crc, qy, qc, eqy, eqc):
        return K.decode_ycc_u8_plane_blocks(y, cbc, crc, qy, qc, True, True)

    def mega_relayout(y, cbc, crc, qy, qc, eqy, eqc):
        planes = K.decode_ycc_u8_plane_blocks(y, cbc, crc, qy, qc,
                                              True, True)
        cbh_pad, cbw = planes[0].shape[-4], planes[0].shape[-2]
        out = []
        for pb in planes:
            blk = pb.reshape(-1, 2 * cbh_pad, 2 * cbw, 64)
            out.append(PK._blocks_to_plane_xla(blk, 2 * cbh_pad, 2 * cbw))
        return tuple(out)

    def full_rgb(y, cbc, crc, qy, qc, eqy, eqc):
        return fused_jpeg_fit_transcode(
            y, cbc, crc, qy, qc, eqy, eqc,
            src_w=g.width, src_h=g.height, h2=True, v2=True,
            dst_w=256, dst_h=256, window=win)

    # pre-decoded block planes for the tail-only measurement
    planes0 = jax.jit(lambda a, b, c, qy, qc: K.decode_ycc_u8_plane_blocks(
        a, b, c, qy, qc, True, True))(yc, cb, cr, qty, qtc)
    planes0 = [jax.device_put(np.asarray(p)) for p in planes0]
    cbh_pad, cbw = planes0[0].shape[-4], planes0[0].shape[-2]
    mw = R.area_matrix_embedded(cbw * 16, left - x0, w, 256)
    mh = R.area_matrix_embedded(cbh_pad * 16, top - y0, h, 256)

    def tail_only(p0, p1, p2, qy, qc, eqy, eqc):
        out = []
        for pb in (p0, p1, p2):
            blk = pb.reshape(-1, 2 * cbh_pad, 2 * cbw, 64)
            p = PK._blocks_to_plane_xla(blk, 2 * cbh_pad, 2 * cbw)
            out.append(jnp.clip(jnp.round(
                R.resize_area_plane_mat(p, mw, mh)), 0, 255))
        return K.encode_from_bgr_planes(out[0], out[1], out[2], eqy, eqc,
                                        subsample=True)

    def split_decode(y, cbc, crc, qy, qc, eqy, eqc):
        with K.force_split_decode():
            packed = K.decode_ycc_packed(y, cbc, crc, qy, qc, rh, rw,
                                         True, True)
            return K.packed_to_planes(packed)

    # --- compile + measure -------------------------------------------------
    one_f = jax.device_put(np.float32(1.0))
    triv = jax.jit(lambda x: x + 1)
    float(triv(one_f))
    rtts = []
    for _ in range(10):
        t1 = time.time()
        float(triv(one_f))
        rtts.append(time.time() - t1)
    rtts.sort()
    rtt = rtts[len(rtts) // 2]

    def mxu_idct_f32(y, cbc, crc, qy, qc, eqy, eqc):
        return (K.dequant_idct(y, qy), K.dequant_idct(cbc, qc),
                K.dequant_idct(crc, qc))

    def mxu_upW(y, cbc, crc, qy, qc, eqy, eqc):
        yf = K.dequant_idct(y, qy)
        cbf = K.dequant_idct(cbc, qc)
        crf = K.dequant_idct(crc, qc)
        mwu = K._upsample2x_matrix(cbf.shape[-1], rw)
        return (yf, R._banded_plane_contract(cbf, mwu, axis=-1),
                R._banded_plane_contract(crf, mwu, axis=-1))

    def mxu_planes(y, cbc, crc, qy, qc, eqy, eqc):
        return K.decode_ycc_planes_mxu(y, cbc, crc, qy, qc, rh, rw,
                                       True, True)

    def mxu_planes_i16(y, cbc, crc, qy, qc, eqy, eqc):
        # V5 probe: i16-noclip luma (2 B/px relayout) + V3 chroma
        import jax.numpy as jnp
        from lilliput_tpu.ops import resize as RR
        yf = K.dequant_idct(y, qy)
        y16 = jnp.round(yf).astype(jnp.int16)[..., :rh, :rw]
        cbf = K.dequant_idct(cbc, qc)
        crf = K.dequant_idct(crc, qc)
        mhu = K._upsample2x_matrix(cbf.shape[-2], rh)
        mwu = K._upsample2x_matrix(cbf.shape[-1], rw)
        def up(pl):
            pl = RR._banded_plane_contract(pl, mwu, axis=-1)
            pl = RR._banded_plane_contract(pl, mhu, axis=-2)
            return jnp.round(pl).astype(jnp.int16)
        cbu = up(cbf).astype(jnp.float32) - 128.0
        cru = up(crf).astype(jnp.float32) - 128.0
        ylf = y16.astype(jnp.float32)
        r = ylf + 1.402 * cru
        g = ylf - 0.344136286 * cbu - 0.714136286 * cru
        b = ylf + 1.772 * cbu
        return tuple(jnp.clip(jnp.round(v), 0, 255).astype(jnp.uint8)
                     for v in (b, g, r))

    mwr = R.area_matrix_embedded(rw, left - x0, w, 256)
    mhr = R.area_matrix_embedded(rh, top - y0, h, 256)

    def mxu_decode_resize(y, cbc, crc, qy, qc, eqy, eqc):
        planes = K.decode_ycc_planes_mxu(y, cbc, crc, qy, qc, rh, rw,
                                         True, True)
        return tuple(jnp.clip(jnp.round(
            R.resize_area_plane_mat(p, mwr, mhr)), 0, 255) for p in planes)

    def mxu_full(y, cbc, crc, qy, qc, eqy, eqc):
        planes = K.decode_ycc_planes_mxu(y, cbc, crc, qy, qc, rh, rw,
                                         True, True)
        out = [jnp.clip(jnp.round(
            R.resize_area_plane_mat(p, mwr, mhr)), 0, 255) for p in planes]
        return K.encode_from_bgr_planes(out[0], out[1], out[2], eqy, eqc,
                                        subsample=True)

    # raster u8 planes for the raster-tail measurement
    rp0 = jax.jit(lambda a, b, c, qy, qc: K.decode_ycc_planes_mxu(
        a, b, c, qy, qc, rh, rw, True, True))(yc, cb, cr, qty, qtc)
    rp0 = [jax.device_put(np.asarray(p)) for p in rp0]

    def raster_tail(p0, p1, p2, qy, qc, eqy, eqc):
        out = [jnp.clip(jnp.round(
            R.resize_area_plane_mat(p, mwr, mhr)), 0, 255)
            for p in (p0, p1, p2)]
        return K.encode_from_bgr_planes(out[0], out[1], out[2], eqy, eqc,
                                        subsample=True)

    from lilliput_tpu.pipeline import fused_jpeg_fit_transcode_ycc

    def ycc_full(y, cbc, crc, qy, qc, eqy, eqc):
        return fused_jpeg_fit_transcode_ycc(
            y, cbc, crc, qy, qc, eqy, eqc, src_w=g.width, src_h=g.height,
            dst_w=256, dst_h=256, window=win)

    def ycc_luma_idct(y, cbc, crc, qy, qc, eqy, eqc):
        return (K.dequant_idct_u8(y, qy),)

    def ycc_luma_idct_resize(y, cbc, crc, qy, qc, eqy, eqc):
        y8 = K.dequant_idct_u8(y, qy)
        mwl = R.area_matrix_embedded(y8.shape[-1], left - x0, w, 256)
        mhl = R.area_matrix_embedded(y8.shape[-2], top - y0, h, 256)
        return (jnp.clip(jnp.round(
            R.resize_area_plane_mat(y8, mwl, mhl)), 0, 255),)

    def ycc_chroma_only(y, cbc, crc, qy, qc, eqy, eqc):
        out = []
        for pl in (cbc, crc):
            p8 = K.dequant_idct_u8(pl, qc)
            mat_w = R.area_axis_matrix_scaled(p8.shape[-1], 128,
                                              w / 256, (left - x0) / 2)
            mat_h = R.area_axis_matrix_scaled(p8.shape[-2], 128,
                                              h / 256, (top - y0) / 2)
            out.append(jnp.clip(jnp.round(
                R.resize_area_plane_mat(p8, mat_w, mat_h)), 0, 255))
        return tuple(out)

    stages = {
        "ycc_full": (chained(ycc_full), args),
        "ycc_luma_idct": (chained(ycc_luma_idct), args),
        "ycc_luma_idct_resize": (chained(ycc_luma_idct_resize), args),
        "ycc_chroma_only": (chained(ycc_chroma_only), args),
        "mxu_planes_i16": (chained(mxu_planes_i16), args),
        "mxu_decode_resize": (chained(mxu_decode_resize), args),
        "mxu_full": (chained(mxu_full), args),
        "raster_tail": (chained(raster_tail),
                        (rp0[0], rp0[1], rp0[2], qty, qtc,
                         pipe.enc_qt_y, pipe.enc_qt_c)),
        "idct_only": (chained(idct_only), args),
        "mxu_idct_f32": (chained(mxu_idct_f32), args),
        "mxu_upW": (chained(mxu_upW), args),
        "mxu_planes": (chained(mxu_planes), args),
        "mega_planes": (chained(mega_planes), args),
        "mega_relayout": (chained(mega_relayout), args),
        "full_rgb": (chained(full_rgb), args),
        "tail_only": (chained(tail_only),
                      (planes0[0], planes0[1], planes0[2], qty, qtc,
                       pipe.enc_qt_y, pipe.enc_qt_c)),
        "split_decode": (chained(split_decode), args),
    }
    sel = os.environ.get("STAGES")
    if sel:
        stages = {k: v for k, v in stages.items() if k in sel.split(",")}
    out = {"batch": batch, "chain": chain, "rtt_ms": round(rtt * 1000, 2)}
    for name, (fn, a) in stages.items():
        t0 = time.time()
        int(fn(*a))
        compile_s = time.time() - t0
        times = []
        for _ in range(max(iters // chain, 3)):
            t1 = time.time()
            int(fn(*a))
            times.append(time.time() - t1)
        times.sort()
        p50 = max(times[len(times) // 2] - rtt, 1e-9) / chain
        out[name] = {"ms_per_batch": round(p50 * 1000, 2),
                     "imgs_per_sec": round(batch / p50, 1),
                     "compile_s": round(compile_s, 1)}
        print(json.dumps({name: out[name]}), file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
