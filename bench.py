#!/usr/bin/env python3
"""Headline benchmark: 1080p JPEG -> 256x256 Fit -> JPEG q85 transcode
(BASELINE.json config 1) on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is measured throughput / the 5000 imgs/sec/chip north-star
(the reference publishes no numbers of its own — BASELINE.md).

The measured path is the fused serving pipeline (lilliput_tpu/pipeline.py):
host Huffman decode (libjpeg entropy only) -> one fused device dispatch
(dequant+IDCT+upsample+color+crop+INTER_AREA+fDCT+quant) -> host Huffman
encode, double-buffered so host entropy overlaps device compute.

Reported stages (detail field):
  * device_images_per_sec  — fused dispatch throughput, coefficients in HBM
  * host_decode_images_per_sec / host_encode_images_per_sec — threaded
    libjpeg entropy stages on THIS host's cores (host_cores field)
  * e2e_bound_images_per_sec — min(host pipeline, device): the honest
    end-to-end ceiling on this host+chip pairing, assuming the double-
    buffered overlap (pipeline.transcode_pipelined) hides the smaller side.
    The host stages scale ~linearly with cores (they are per-image
    independent; the shim releases the GIL), so production sizing is
    host_cores ~= device_rate / per_core_host_rate.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "tests", "assets", "bench_1080p.jpg")
TARGET = 5000.0  # imgs/sec/chip north star (BASELINE.json)


def _ensure_fixture() -> bytes:
    if os.path.exists(FIXTURE):
        return open(FIXTURE, "rb").read()
    # synthesize a 1920x1080 q85 4:2:0 JPEG from the largest reference image
    os.makedirs(os.path.dirname(FIXTURE), exist_ok=True)
    import numpy as np
    from PIL import Image
    src = "/root/reference/data/large-sunrise.jpg"
    im = Image.open(src).convert("RGB")
    im = im.resize((1920, 1080))
    arr = np.asarray(im)
    import io
    bio = io.BytesIO()
    Image.fromarray(arr).save(bio, format="JPEG", quality=85, subsampling=2)
    data = bio.getvalue()
    open(FIXTURE, "wb").write(data)
    return data


def main():
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    host_iters = int(os.environ.get("BENCH_HOST_ITERS", "3"))
    e2e_batches = int(os.environ.get("BENCH_E2E_BATCHES", "4"))
    buf = _ensure_fixture()

    import numpy as np

    import jax

    from lilliput_tpu.pipeline import JpegTranscodePipeline

    pipe = JpegTranscodePipeline(buf, 256, 256, quality=85)

    # --- host entropy stages (threaded; scale with cores) ------------------
    host_cores = os.cpu_count() or 1
    bufs = [buf] * batch
    # pool=True is the serving configuration (_host_decode): the 2-slot
    # destination pool removes the per-batch first-touch page faults.
    # Safe here: coefs is only read until the next decode_entropy call.
    coefs = pipe.decode_entropy(bufs, pool=True)  # warm (pages, pool, jit)
    dec_times = []
    for _ in range(host_iters):
        t0 = time.time()
        coefs = pipe.decode_entropy(bufs, pool=True)
        dec_times.append(time.time() - t0)
    host_decode_ips = batch / min(dec_times)

    # same-run A/B vs the libjpeg huffman path (the only honest comparison
    # on this +-10% cgroup host — VERDICT r3 next #1 acceptance gate)
    prev_huff = os.environ.get("LILLIPUT_JPEG_HUFF")
    os.environ["LILLIPUT_JPEG_HUFF"] = "libjpeg"
    try:
        pipe.decode_entropy(bufs, pool=True)  # rewarm
        lj_times = []
        for _ in range(host_iters):
            t0 = time.time()
            pipe.decode_entropy(bufs, pool=True)
            lj_times.append(time.time() - t0)
    finally:
        if prev_huff is None:
            os.environ.pop("LILLIPUT_JPEG_HUFF", None)
        else:
            os.environ["LILLIPUT_JPEG_HUFF"] = prev_huff
    host_decode_libjpeg_ips = batch / min(lj_times)

    # progressive (SOF2) source A/B: the own multi-scan decoder vs libjpeg
    # on the same content re-encoded progressive (mozjpeg-class traffic)
    import io as _io

    from PIL import Image as _Image
    _im = _Image.open(_io.BytesIO(buf))
    _im.load()
    _bio = _io.BytesIO()
    _im.save(_bio, format="JPEG", quality=85, progressive=True)
    pbufs = [_bio.getvalue()] * batch
    ppipe = JpegTranscodePipeline(pbufs[0], 256, 256, quality=85)
    ppipe.decode_entropy(pbufs, pool=True)  # warm
    pdec_times = []
    for _ in range(host_iters):
        t0 = time.time()
        ppipe.decode_entropy(pbufs, pool=True)
        pdec_times.append(time.time() - t0)
    host_decode_prog_ips = batch / min(pdec_times)
    os.environ["LILLIPUT_JPEG_HUFF"] = "libjpeg"
    try:
        ppipe.decode_entropy(pbufs, pool=True)  # rewarm
        plj_times = []
        for _ in range(host_iters):
            t0 = time.time()
            ppipe.decode_entropy(pbufs, pool=True)
            plj_times.append(time.time() - t0)
    finally:
        if prev_huff is None:
            os.environ.pop("LILLIPUT_JPEG_HUFF", None)
        else:
            os.environ["LILLIPUT_JPEG_HUFF"] = prev_huff
    host_decode_prog_libjpeg_ips = batch / min(plj_times)

    out_dev = pipe.device_step(*coefs, donate=False)
    out_np = [np.asarray(a) for a in out_dev]
    pipe.encode_entropy(*out_np)  # warm
    enc_times = []
    for _ in range(host_iters):
        t0 = time.time()
        outs = pipe.encode_entropy(*out_np)
        enc_times.append(time.time() - t0)
    host_encode_ips = batch / min(enc_times)
    assert outs[0][:2] == b"\xff\xd8"
    # host pipeline rate: decode and encode contend for the same cores
    host_pipeline_ips = batch / (min(dec_times) + min(enc_times))

    # --- headline: device-resident fused transcode throughput -------------
    # Methodology (hardened in round 2): on this harness the TPU sits
    # behind an async tunnel whose block_until_ready acks dispatch, NOT
    # completion — naive wall-clock timing reports physically impossible
    # rates (round 1's 445k imgs/s read 400 MB of coefficients in 0.14 ms
    # = 3 TB/s > the chip's HBM). Every timed iteration therefore forces
    # materialization by fetching a device-side checksum of the outputs,
    # and the per-step time is amortized over a K-step data-dependent
    # chain inside one jit so the tunnel round trip (~30 ms here, absent
    # on a production host-attached chip) is paid once, not per step.
    import jax.numpy as jnp

    from lilliput_tpu.pipeline import (fused_jpeg_fit_transcode,
                                       fused_jpeg_fit_transcode_ycc)

    g = pipe.geom
    chain = int(os.environ.get("BENCH_CHAIN", "4"))
    dev_in = [jax.device_put(c) for c in coefs]

    def make_chained(step_fn):
        @jax.jit
        def chained_step(yc, cbc, crc, qy, qc, eqy, eqc):
            acc = jnp.int32(0)
            y = yc
            for _ in range(chain):
                o = step_fn(y, cbc, crc, qy, qc, eqy, eqc)
                s = sum(jnp.sum(v.astype(jnp.int32)) for v in o)
                acc = acc + s
                y = yc + (s % 2).astype(jnp.int16)  # serialize the chain
            return acc
        return chained_step

    win = pipe.window_static  # decode_entropy ships windowed coefficients

    def rgb_step(y, cbc, crc, qy, qc, eqy, eqc):
        return fused_jpeg_fit_transcode(
            y, cbc, crc, qy, qc, eqy, eqc,
            src_w=g.width, src_h=g.height, h2=g.h2, v2=g.v2,
            dst_w=pipe.dst_w, dst_h=pipe.dst_h, method=pipe.method,
            orientation=pipe.orientation, window=win)

    def ycc_step(y, cbc, crc, qy, qc, eqy, eqc):
        return fused_jpeg_fit_transcode_ycc(
            y, cbc, crc, qy, qc, eqy, eqc,
            src_w=g.width, src_h=g.height,
            dst_w=pipe.dst_w, dst_h=pipe.dst_h, window=win)

    def ycc_scaled_step(y, cbc, crc, qy, qc, eqy, eqc):
        return fused_jpeg_fit_transcode_ycc(
            y, cbc, crc, qy, qc, eqy, eqc,
            src_w=g.width, src_h=g.height,
            dst_w=pipe.dst_w, dst_h=pipe.dst_h, dct_scale=2, window=win)

    args = (dev_in[0], dev_in[1], dev_in[2], dev_in[3], dev_in[4],
            pipe.enc_qt_y, pipe.enc_qt_c)
    chained_rgb = make_chained(rgb_step)
    chained_ycc = make_chained(ycc_step)
    chained_scaled = make_chained(ycc_scaled_step)
    t0 = time.time()
    int(chained_rgb(*args))
    int(chained_ycc(*args))
    int(chained_scaled(*args))
    warmup_s = time.time() - t0

    # tunnel round-trip floor (subtracted from the chained wall time)
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

    def measure(chained_step):
        times = []
        for _ in range(max(iters // chain, 3)):
            t1 = time.time()
            int(chained_step(*args))
            times.append(time.time() - t1)
        times.sort()
        p50_chain = times[len(times) // 2]
        p50 = max(p50_chain - rtt, 1e-9) / chain
        return batch / p50, p50

    # parity mode: BGR-path pixels, validated +-1 vs the reference-shaped
    # unfused Transform; direct mode: YCbCr-domain (one chroma resample,
    # PSNR-gated vs parity in tests/test_pipeline.py) — both are full
    # 1080p->256 q85 transcodes; the headline takes the faster production
    # mode and reports the other alongside.
    trace_dir = os.environ.get("BENCH_TRACE_DIR")
    if trace_dir:
        with jax.profiler.trace(trace_dir):
            int(chained_ycc(*args))

    rgb_ips, rgb_p50 = measure(chained_rgb)
    ycc_ips, ycc_p50 = measure(chained_ycc)
    scaled_ips, _ = measure(chained_scaled)
    device_ips = max(rgb_ips, ycc_ips)
    p50_batch = min(rgb_p50, ycc_p50)

    # --- still-input serving device rate (StillTranscodePipeline step) ----
    # 1080p BGR pixel batch -> fused orient+crop+AREA resize+JPEG encode
    # (the non-JPEG-source serving path: PNG/WebP/... decode to pixels on
    # the host, this is their one device dispatch). The pixel batch is
    # synthesized ON device: 760 MB of u8 through the dev tunnel would
    # measure the tunnel, not the chip.
    still_ips = None
    if os.environ.get("BENCH_STILL", "1") != "0":
        try:
            from lilliput_tpu.pipeline import fused_still_fit_transcode

            @jax.jit
            def _make_px(key):
                return jax.random.bits(
                    key, (batch, 1080, 1920, 3), dtype=jnp.uint8)

            px_dev = _make_px(jax.random.key(0))
            px_dev.block_until_ready()

            @jax.jit
            def chained_still(px, eqy, eqc):
                acc = jnp.int32(0)
                p = px
                for _ in range(chain):
                    o = fused_still_fit_transcode(
                        p, eqy, eqc, src_w=1920, src_h=1080,
                        dst_w=pipe.dst_w, dst_h=pipe.dst_h)
                    s = sum(jnp.sum(v.astype(jnp.int32)) for v in o)
                    acc = acc + s
                    p = px + (s % 2).astype(jnp.uint8)  # serialize
                return acc

            sargs = (px_dev, pipe.enc_qt_y, pipe.enc_qt_c)
            int(chained_still(*sargs))  # compile
            stimes = []
            for _ in range(max(iters // chain, 3)):
                t1 = time.time()
                int(chained_still(*sargs))
                stimes.append(time.time() - t1)
            stimes.sort()
            still_ips = batch / max(
                (stimes[len(stimes) // 2] - rtt) / chain, 1e-9)
        except Exception:
            still_ips = None

    # --- animated serving device rate (AnimatedTranscodePipeline step) ----
    # GIF-class workload: the three dispatches behind transcode_gif —
    # composite lax.scan over a bucket of frames, batched AREA resize,
    # quantize_animation scan (exact giflib cache emulation) — at a
    # bucket-32 480x480 canvas -> 128x128 (avatar-resize shape). Inputs
    # synthesized on device (frame pixels through the dev tunnel would
    # measure the tunnel, not the chip). Reported as output frames/sec.
    anim_fps = None
    if os.environ.get("BENCH_ANIM", "1") != "0":
        try:
            from lilliput_tpu.ops import palette as PAL
            from lilliput_tpu.ops import resize as RZ

            af, ah, aw, adw, adh = 32, 480, 480, 128, 128

            @jax.jit
            def _anim_inputs(key):
                ks = jax.random.split(key, 3)
                idxf = jax.random.bits(ks[0], (af, ah, aw), dtype=jnp.uint8)
                luts = jax.random.bits(ks[1], (af, 256, 4), dtype=jnp.uint8)
                pals = jax.random.bits(ks[2], (af, 256, 3),
                                       dtype=jnp.uint8).astype(jnp.int32)
                return idxf, luts, pals

            idxf, luts, pals = _anim_inputs(jax.random.key(1))
            a_drawn = jnp.ones((af, ah, aw), jnp.bool_)
            a_counts = jnp.full((af,), 256, jnp.int32)
            a_notrans = jnp.full((af,), -1, jnp.int32)
            a_trans0 = jnp.zeros((af,), jnp.int32)
            a_pdisp = jnp.zeros((af,), jnp.int32)
            a_prect = jnp.zeros((af, ah, aw), jnp.bool_)
            a_bg = jnp.zeros((4,), jnp.uint8)
            a_clear = jnp.zeros((af,), jnp.bool_)
            a_uprev = jnp.ones((af,), jnp.bool_)

            @jax.jit
            def chained_anim(x0, luts_, pals_):
                acc = jnp.int32(0)
                x = x0
                for _ in range(chain):
                    comp = PAL.composite_animation(
                        x, a_drawn, luts_, a_counts, a_notrans, a_pdisp,
                        a_prect, a_bg)
                    # barriers model the production structure (three
                    # separate dispatches). History: with the original
                    # lax.scan quantizer the UNbarriered program re-fused
                    # producers into the scan and measured ~4x the stage
                    # sum; with the scan-free quantizer fused==barriered
                    # exactly (6.13 vs 6.13 ms measured) — kept for shape
                    # fidelity, they now cost nothing
                    comp = jax.lax.optimization_barrier(comp)
                    rs = RZ.resize(comp, adw, adh, RZ.AREA)
                    rs = jax.lax.optimization_barrier(rs)
                    qi = PAL.quantize_animation(rs, pals_, a_counts,
                                                a_trans0, a_clear, a_uprev)
                    s = jnp.sum(qi.astype(jnp.int32))
                    acc = acc + s
                    x = x0 + (s % 2).astype(jnp.uint8)  # serialize
                return acc

            int(chained_anim(idxf, luts, pals))  # compile
            atimes = []
            for _ in range(max(iters // chain, 3)):
                t1 = time.time()
                int(chained_anim(idxf, luts, pals))
                atimes.append(time.time() - t1)
            atimes.sort()
            anim_fps = af / max(
                (atimes[len(atimes) // 2] - rtt) / chain, 1e-9)
        except Exception:
            anim_fps = None

    # host anim bound: our GIF LZW decode (animation_inputs: LZW + index
    # scatter at canvas size) and LZW encode (_emit_frame at dst size)
    # in frames/s/core — the per-animation-independent host stages that
    # scale with cores like JPEG Huffman (see host_scaling)
    anim_host = None
    if os.environ.get("BENCH_ANIM", "1") != "0":
        try:
            import io

            import numpy as _np
            from PIL import Image as _Image

            from lilliput_tpu.codecs.gif import GifDecoder, GifEncoder

            rng = _np.random.default_rng(7)
            ims = [_Image.fromarray(
                rng.integers(0, 256, (480, 480, 3), _np.uint8), "RGB"
            ).quantize(colors=256) for _ in range(8)]
            bio = io.BytesIO()
            ims[0].save(bio, format="GIF", save_all=True,
                        append_images=ims[1:], duration=40, loop=0)
            gbuf = bio.getvalue()
            # workers=1: frames/s/CORE (the scan-parallel LZW path also
            # threads inside one animation; this records the per-core rate)
            t0 = time.time()
            dec = GifDecoder(gbuf)
            inp, metas = dec.animation_inputs(workers=1)
            dec_s = time.time() - t0
            # encode: random dst-size indices through the LZW emitter
            enc = GifEncoder(dec)
            # dst geometry defined locally: the device-anim block's
            # adw/adh must not couple this independent host metric to
            # that block's success
            hdw = hdh = 128
            idxs_np = rng.integers(0, 255, (len(metas), hdh, hdw),
                                   _np.uint8)
            t0 = time.time()
            for i, m in enumerate(metas):
                trans, use_local, _cl, _up = enc._plan_frame(m)
                enc._emit_frame(m, _np.ascontiguousarray(idxs_np[i]),
                                hdw, hdh, trans, use_local)
            out_gif = enc.encode(None, {})
            enc_s = time.time() - t0
            anim_host = {
                "decode_frames_per_sec_per_core":
                    round(len(metas) / max(dec_s, 1e-9), 1),
                "encode_frames_per_sec_per_core":
                    round(len(metas) / max(enc_s, 1e-9), 1),
                "canvas": "480x480", "dst": f"{hdw}x{hdh}",
                "frames": len(metas), "encoded_bytes": len(out_gif),
            }
        except Exception:
            anim_host = None

    # still-INPUT host decode bound (the pixel-domain analog of the JPEG
    # host stages): PNG 1080p through the serving host stage — libdeflate
    # inflate + SSE2 unfilter + numpy swizzle into the batch array
    still_host = None
    if os.environ.get("BENCH_STILL_HOST", "1") != "0":
        try:
            import io as _io

            from PIL import Image as _Image

            from lilliput_tpu.pipeline import StillTranscodePipeline
            _im = _Image.open(_io.BytesIO(buf))
            _im.load()
            _pio = _io.BytesIO()
            _im.save(_pio, format="PNG")
            _png = _pio.getvalue()
            spipe = StillTranscodePipeline(_png, 256, 256, quality=85)
            spipe.decode_pixels([_png] * 4)  # warm
            _rates = []
            for _ in range(max(host_iters, 3)):
                t0 = time.time()
                spipe.decode_pixels([_png] * 4)
                _rates.append(4 / (time.time() - t0))
            still_host = {
                "png_1080p_decode_images_per_sec_per_core": round(
                    max(_rates), 1),
                "note": ("serving host stage (decode_pixels): inflate + "
                         "unfilter + swizzle + batch store; per-image "
                         "independent, scales with cores"),
            }
            # GIF first-frame serving host decode (VERDICT r4 #4): the
            # still route needs only frame 1 — LZW + one packed-u32 LUT
            # gather (codecs/gif.py fast path, byte-identical, 6x the
            # generic compositing walk at this canvas)
            _gio = _io.BytesIO()
            _im.convert("RGB").convert(
                "P", palette=_Image.ADAPTIVE).save(_gio, format="GIF")
            _gif = _gio.getvalue()
            gpipe = StillTranscodePipeline(_gif, 256, 256, quality=85)
            gpipe.decode_pixels([_gif] * 4)  # warm
            _grates = []
            for _ in range(max(host_iters, 3)):
                t0 = time.time()
                gpipe.decode_pixels([_gif] * 4)
                _grates.append(4 / (time.time() - t0))
            still_host["gif_1080p_decode_images_per_sec_per_core"] = round(
                max(_grates), 1)
            # AVIF SDR serving host decode (VERDICT r4 #3): the own path
            # (ISOBMFF walk + dav1d + libyuv-exact conversion) — PIL is
            # no longer on the runtime path
            from lilliput_tpu.codecs import avif_enc as _avif_enc
            if _avif_enc.available():
                _bgr = _np.asarray(_im)[:, :, ::-1]
                _avif = _avif_enc.encode(
                    [_np.ascontiguousarray(_bgr[:, :, ::-1])], [0],
                    quality=60, speed=8)
                apipe = StillTranscodePipeline(_avif, 256, 256, quality=85)
                apipe.decode_pixels([_avif] * 4)  # warm
                _arates = []
                for _ in range(max(host_iters, 3)):
                    t0 = time.time()
                    apipe.decode_pixels([_avif] * 4)
                    _arates.append(4 / (time.time() - t0))
                still_host["avif_1080p_decode_images_per_sec_per_core"] = \
                    round(max(_arates), 1)
        except Exception:
            still_host = None

    # single-image device latency: the per-step time of a 16-deep data-
    # dependent chain of batch-1 transforms (a lone step is ~sub-ms, far
    # below the tunnel RTT's jitter, so it must be amortized to measure)
    one = [jax.device_put(c[:1]) for c in coefs]
    lat_chain = 16

    @jax.jit
    def one_chained(yc, cbc, crc, qy, qc, eqy, eqc):
        acc = jnp.int32(0)
        y = yc
        for _ in range(lat_chain):
            o = fused_jpeg_fit_transcode(
                y, cbc, crc, qy, qc, eqy, eqc,
                src_w=g.width, src_h=g.height, h2=g.h2, v2=g.v2,
                dst_w=pipe.dst_w, dst_h=pipe.dst_h, method=pipe.method,
                orientation=pipe.orientation, window=win)
            s = sum(jnp.sum(v.astype(jnp.int32)) for v in o)
            acc = acc + s
            y = yc + (s % 2).astype(jnp.int16)  # serialize the chain
        return acc

    one_args = (one[0], one[1], one[2], one[3], one[4],
                pipe.enc_qt_y, pipe.enc_qt_c)
    int(one_chained(*one_args))
    lat = []
    for _ in range(5):
        t1 = time.time()
        int(one_chained(*one_args))
        lat.append(time.time() - t1)
    lat.sort()
    p50_ms = max(lat[len(lat) // 2] - rtt, 0.0) / lat_chain * 1000

    # --- on-device kernel numerics gate ------------------------------------
    # Pallas megakernel vs the split XLA path, both COMPILED on this chip
    # (the CPU suite only exercises interpret mode): must agree bit-for-bit.
    from lilliput_tpu.ops import jpeg_kernels as KK

    def _numerics_check():
        sm = [jax.device_put(c[:1]) for c in coefs]
        # coefficients are host-windowed; compare over the window extent
        h_, w_ = (win[3], win[2]) if win else (g.height, g.width)
        mega = KK._decode_ycc_megakernel(
            sm[0], sm[1], sm[2], sm[3][0], sm[4][0], h_, w_, g.h2, g.v2)
        if mega is None:
            return None
        y = KK.dequant_idct(sm[0], sm[3][0])[..., :h_, :w_]
        cbp = KK.upsample_chroma(KK.dequant_idct(sm[1], sm[4][0]),
                                 2 if g.h2 else 1, 2 if g.v2 else 1, h_, w_)
        crp = KK.upsample_chroma(KK.dequant_idct(sm[2], sm[4][0]),
                                 2 if g.h2 else 1, 2 if g.v2 else 1, h_, w_)
        split = KK.ycbcr_to_bgr(y, cbp, crp)
        d = jnp.max(jnp.abs(mega.astype(jnp.int32) - split.astype(jnp.int32)))
        return int(d)

    pallas_vs_xla = _numerics_check()

    # TPU vs host-CPU decode drift (accumulation-order ulps at rounding
    # boundaries; contract is <=1). Small tile so the tunnel fetch is cheap.
    def _cpu_drift():
        cby = 16 // (2 if g.v2 else 1)
        cbx = 16 // (2 if g.h2 else 1)
        sm = [coefs[0][:1, :16, :16], coefs[1][:1, :cby, :cbx],
              coefs[2][:1, :cby, :cbx], coefs[3][:1], coefs[4][:1]]
        th, tw = 16 * 8, 16 * 8
        dev = KK.decode_ycc_420(
            jax.device_put(sm[0]), jax.device_put(sm[1]),
            jax.device_put(sm[2]), jax.device_put(sm[3][0]),
            jax.device_put(sm[4][0]), th, tw, g.h2, g.v2)
        dev = np.asarray(dev).astype(np.int32)
        cpu_dev = jax.devices("cpu")[0]
        # the Pallas/megakernel gates read the PROCESS backend (tpu), so
        # pin them off for the CPU-reference trace
        os.environ["LILLIPUT_PALLAS"] = "0"
        os.environ["LILLIPUT_MEGAKERNEL"] = "0"
        with jax.default_device(cpu_dev):
            y = KK.dequant_idct(jax.device_put(sm[0], cpu_dev),
                                jax.device_put(sm[3][0], cpu_dev))[..., :th, :tw]
            f = 2 if g.h2 else 1
            cbp = KK.upsample_chroma(
                KK.dequant_idct(jax.device_put(sm[1], cpu_dev),
                                jax.device_put(sm[4][0], cpu_dev)), f, f, th, tw)
            crp = KK.upsample_chroma(
                KK.dequant_idct(jax.device_put(sm[2], cpu_dev),
                                jax.device_put(sm[4][0], cpu_dev)), f, f, th, tw)
            ref = np.asarray(KK.ycbcr_to_bgr(y, cbp, crp)).astype(np.int32)
        del os.environ["LILLIPUT_PALLAS"]
        del os.environ["LILLIPUT_MEGAKERNEL"]
        return int(np.abs(dev - ref).max())

    try:
        tpu_vs_cpu = _cpu_drift()
    except Exception:
        tpu_vs_cpu = None
    finally:
        os.environ.pop("LILLIPUT_PALLAS", None)
        os.environ.pop("LILLIPUT_MEGAKERNEL", None)

    # small-geometry compile gate: Mosaic layout rules differ at odd tiny
    # shapes (a (5,7,64)->(35,64) ref reshape compiled at 1080p but failed
    # at 100x76 until replaced with row-slice concats) — the CPU suite runs
    # interpret mode only, so the real-chip lowering must be exercised here
    def _small_geometry_ok():
        import io
        from PIL import Image
        rng2 = np.random.default_rng(3)
        im = Image.fromarray(rng2.integers(0, 256, (76, 100, 3),
                                           dtype=np.uint8))
        bio = io.BytesIO()
        im.save(bio, format="JPEG", quality=88, subsampling=2)
        small = bio.getvalue()
        p2 = JpegTranscodePipeline(small, 64, 64, quality=85)
        out = p2.transcode([small])
        return bool(out[0][:2] == b"\xff\xd8")

    try:
        small_ok = _small_geometry_ok()
    except Exception:
        small_ok = False

    # --- honest e2e bound ---------------------------------------------------
    # transcode_pipelined overlaps host entropy with device compute, so the
    # steady-state rate is min(host pipeline, device) (+ transfer, which on
    # a host-attached chip is far above both).
    e2e_bound = min(host_pipeline_ips, device_ips)

    # --- host decode stage breakdown (tools/profile_host.py, subprocess:
    # it pins the CPU platform before first jax use) --------------------------
    host_stages = None
    if os.environ.get("BENCH_HOST_STAGES", "1") != "0":
        try:
            import subprocess
            r = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(
                    os.path.abspath(__file__)), "tools", "profile_host.py")],
                capture_output=True, text=True, timeout=240,
                env=dict(os.environ, N="16", ITERS="3"),
                cwd=os.path.dirname(os.path.abspath(__file__)))
            host_stages = json.loads(r.stdout.strip().splitlines()[-1])
        except Exception as e:  # never fail the bench on the probe
            host_stages = {"error": repr(e)}

    # --- multi-process host-entropy scaling curve (VERDICT r2 #2) ---------
    # measured, not asserted: fork-pool aggregate rates at P=1/2/4 workers,
    # parallel efficiency, and the projected core count where the host
    # pipeline crosses each mode's device rate (BENCH_HOST_SCALING=0 skips)
    host_scaling = None
    if os.environ.get("BENCH_HOST_SCALING", "1") != "0":
        # fresh CPU-pinned subprocess: fork()ing THIS process (live TPU
        # tunnel client, XLA thread pools) can deadlock; the probe builds
        # its own fixture/pipeline pre-fork on CPU
        try:
            import subprocess
            env = dict(os.environ, HS_PER_PROC="12", HS_PROCS="1,2,4",
                       HS_SHIP="0")
            r = subprocess.run(
                [sys.executable, os.path.join(os.path.dirname(
                    os.path.abspath(__file__)), "tools", "host_scaling.py")],
                capture_output=True, text=True, timeout=240, env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            host_scaling = json.loads(r.stdout.strip().splitlines()[-1])
            sys.path.insert(0, os.path.join(os.path.dirname(
                os.path.abspath(__file__)), "tools"))
            import host_scaling as HS
            host_scaling["crossover_cores"] = HS.crossover_cores(
                host_scaling, {"rgb_parity": rgb_ips, "ycc_direct": ycc_ips})
        except Exception as e:  # never fail the bench on the host probe
            host_scaling = {"error": repr(e)}

    # --- roofline accounting (VERDICT r4 #2): relate each mode's imgs/s
    # to what the silicon could do. Bytes are a MINIMUM-TRAFFIC model
    # (each input byte read once, each intermediate written+read once,
    # each output written once + D2H) from the actual benched shapes;
    # FLOPs count the matmul MACs (IDCT/fDCT 8x8 dots + the two-pass
    # AREA resize contractions). Peaks: TPU v5e ~819 GB/s HBM, ~197
    # TFLOPS bf16 (public v5e litepod specs). A mode at a high % of
    # peak BW is bandwidth-bound — faster needs fewer bytes, not better
    # kernels; dips between rounds can be attributed by comparing
    # attained GB/s instead of raw imgs/s.
    roofline = None
    try:
        HBM_PEAK_GBS = 819.0
        MXU_PEAK_TFLOPS = 197.0
        x0, y0w, rw, rh = pipe.window_static
        dw, dh = pipe.dst_w, pipe.dst_h
        h2d = sum(int(np.prod(c.shape[1:])) for c in coefs) * 2
        out_coef = (dh // 8) * (dw // 8) * 64 * 2 + 2 * ((dh // 16)
                                                         * (dw // 16)
                                                         * 64 * 2)
        nblk_win = sum(int(np.prod(c.shape[1:3])) for c in coefs[:3])
        nblk_dst = (dh // 8) * (dw // 8) + 2 * (dh // 16) * (dw // 16)
        # per-8x8-block IDCT/fDCT = two (8x8)x(8x8) dots = 2*512 MACs
        idct_f = nblk_win * 2 * 512 * 2
        fdct_f = nblk_dst * 2 * 512 * 2
        # AREA resize as two matmul passes per plane (w-contract then h)
        def resize_f(ch_scale, sw, sh):
            return int(ch_scale * 2 * (sw * sh * dw + dh * sh * dw))

        def entry(ips, planes_bytes, inter_bytes, flops, h2d_b=h2d):
            total = (h2d_b + 2 * planes_bytes + 2 * inter_bytes
                     + 2 * out_coef)
            return {
                "model_bytes_per_image": int(total),
                "model_gflops_per_image": round(flops / 1e9, 3),
                "attained_GBps": round(total * ips / 1e9, 1),
                "pct_hbm_peak": round(100 * total * ips / 1e9
                                      / HBM_PEAK_GBS, 1),
                "pct_mxu_peak": round(100 * flops * ips / 1e12
                                      / MXU_PEAK_TFLOPS, 2),
            }

        roofline = {
            "hbm_peak_GBps": HBM_PEAK_GBS,
            "mxu_peak_tflops_bf16": MXU_PEAK_TFLOPS,
            "note": ("minimum-traffic model from benched shapes: H2D "
                     "coefficient window + decoded planes (write+read) "
                     "+ resize intermediate (write+read) + output "
                     "coefficients (write+D2H); FLOPs = matmul MACs*2 "
                     "(IDCT/fDCT + 2-pass AREA). Real HBM traffic is "
                     ">= model (relayouts, padding); pct_hbm_peak is "
                     "therefore a LOWER bound on utilization"),
            "mode_rgb_parity": entry(
                rgb_ips, 3 * rw * rh, 4 * 3 * dw * rh,
                idct_f + fdct_f + resize_f(3, rw, rh)),
            "mode_ycc_direct": entry(
                ycc_ips, int(1.5 * rw * rh), int(4 * 1.5 * dw * rh),
                idct_f + fdct_f + resize_f(1.5, rw, rh)),
            "mode_ycc_dct_scale2": entry(
                scaled_ips, int(1.5 * (rw // 2) * (rh // 2)),
                int(4 * 1.5 * dw * (rh // 2)),
                nblk_win * 2 * 128 * 2 + fdct_f
                + resize_f(1.5, rw // 2, rh // 2),
                h2d_b=(coefs[0].nbytes + coefs[1].nbytes
                       + coefs[2].nbytes) // batch // 4
                + coefs[3].nbytes // batch + coefs[4].nbytes // batch),
        }
        if still_ips:
            # pixel source: 1080p u8x3 in (device-synthesized here, H2D
            # on a real host), resize intermediate, coef out
            roofline["mode_still_input"] = entry(
                still_ips, 0, 4 * 3 * dw * 1080,
                fdct_f + resize_f(3, 1920, 1080),
                h2d_b=1920 * 1080 * 3)
    except Exception as e:
        roofline = {"error": repr(e)}

    # --- measured e2e through the tunnel (BENCH_E2E_BATCHES=0 disables) ---
    # On this harness the host<->device link is a ~15 MB/s tunnel, so the
    # measured number is TRANSPORT-bound, not host- or device-bound; the
    # point of measuring it anyway is to verify the double-buffered
    # overlap (transcode_pipelined) really hides host decode + device
    # compute behind the transfer. transport_share ~= 1.0 means the wall
    # time is fully explained by H2D bytes / measured link bandwidth —
    # i.e. the overlap works and a co-located deployment keeps the
    # e2e_bound projection. (Round-4 VERDICT missing #3.)
    e2e_ips = None
    e2e_detail = None
    if e2e_batches > 0:
        # measured link bandwidth: one ~8 MB H2D put, forced resident
        probe = np.zeros(8 << 20, np.uint8)
        bw = []
        for _ in range(2):
            t0 = time.time()
            d = jax.device_put(probe)
            d.block_until_ready()
            # force real materialization (block_until_ready can ack
            # dispatch only on this tunnel): fetch a checksum
            _ = int(jax.numpy.sum(d[:: 1 << 18]))
            bw.append(probe.nbytes / (time.time() - t0))
            del d
        link_bps = max(bw)
        args0, _ = pipe._host_decode([buf] * batch)
        h2d_batch_bytes = sum(
            a.nbytes for a in args0 if hasattr(a, "nbytes"))
        t0 = time.time()
        res = pipe.transcode_pipelined([[buf] * batch] * e2e_batches)
        e2e_dt = time.time() - t0
        n_imgs = sum(len(r) for r in res)
        e2e_ips = round(n_imgs / e2e_dt, 2)
        assert res[0][0][:2] == b"\xff\xd8"
        transport_s = e2e_batches * h2d_batch_bytes / link_bps
        e2e_detail = {
            "batches": e2e_batches,
            "link_h2d_mb_per_sec_measured": round(link_bps / 1e6, 2),
            "h2d_mb_per_batch": round(h2d_batch_bytes / 1e6, 3),
            "transport_share_of_wall": round(transport_s / e2e_dt, 3),
            "note": ("transport_share ~1.0 = host+device fully hidden "
                     "behind the tunnel transfer (overlap verified); "
                     "co-located hosts see e2e_bound_images_per_sec"),
        }

    result = {
        "metric": "1080p JPEG -> 256x256 Fit -> JPEG q85 transcode (fused device pipeline)",
        "value": round(device_ips, 2),
        "unit": "images/sec/chip",
        "vs_baseline": round(device_ips / TARGET, 4),
        "detail": {
            "batch": batch,
            "iters": iters,
            "chain": chain,
            "compile_warmup_s": round(warmup_s, 2),
            "tunnel_rtt_ms": round(rtt * 1000, 2),
            "methodology": ("forced output materialization (device-side "
                            "checksum fetch) + K-step data-dependent chain; "
                            "naive block_until_ready on this tunnel acks "
                            "dispatch only and overstates throughput ~500x"),
            "p50_batch_ms": round(p50_batch * 1000, 3),
            "p50_single_image_device_latency_ms": round(p50_ms, 2),
            "device_images_per_sec": round(device_ips, 2),
            "mode_rgb_parity_images_per_sec": round(rgb_ips, 2),
            "mode_ycc_direct_images_per_sec": round(ycc_ips, 2),
            "mode_ycc_dct_scale2_images_per_sec": round(scaled_ips, 2),
            "still_input_device_images_per_sec": (
                round(still_ips, 2) if still_ips else None),
            "anim_gif_device_frames_per_sec": (
                round(anim_fps, 2) if anim_fps else None),
            "anim_host": anim_host,
            "still_host": still_host,
            "pallas_megakernel_vs_xla_max_abs_diff": pallas_vs_xla,
            "tpu_vs_cpu_decode_max_abs_diff": tpu_vs_cpu,
            "small_geometry_compile_ok": small_ok,
            "mode_note": ("rgb_parity reproduces the reference-shaped "
                          "BGR pipeline (+-1 u8 vs unfused Transform); "
                          "ycc_direct transcodes in the YCbCr domain with "
                          "ONE chroma resample (PSNR>=38dB color / 42dB "
                          "luma vs parity mode, gated in tests) — a mode "
                          "the reference's BGRA framebuffer design cannot "
                          "express; dct_scale2 is the libjpeg/OpenCV "
                          "IMREAD_REDUCED-class thumbnail mode — quality-"
                          "traded, excluded from the headline"),
            "host_decode_images_per_sec": round(host_decode_ips, 2),
            "host_decode_libjpeg_images_per_sec": round(
                host_decode_libjpeg_ips, 2),
            "host_decode_speedup_same_run": round(
                host_decode_ips / host_decode_libjpeg_ips, 3),
            "host_decode_stage_breakdown": host_stages,
            "host_decode_progressive_images_per_sec": round(
                host_decode_prog_ips, 2),
            "host_decode_progressive_libjpeg_images_per_sec": round(
                host_decode_prog_libjpeg_ips, 2),
            "host_decode_progressive_speedup_same_run": round(
                host_decode_prog_ips / host_decode_prog_libjpeg_ips, 3),
            "host_encode_images_per_sec": round(host_encode_ips, 2),
            "host_cores": host_cores,
            "e2e_bound_images_per_sec": round(e2e_bound, 2),
            "e2e_bound_vs_baseline": round(e2e_bound / TARGET, 4),
            "e2e_note": ("bound = min(threaded host entropy, device); host "
                         "stages are per-image independent and scale with "
                         "cores — this harness host has host_cores core(s)"),
            "e2e_images_per_sec_via_tunnel": e2e_ips,
            "e2e_tunnel_detail": e2e_detail,
            "host_scaling": host_scaling,
            "roofline": roofline,
            "backend": _backend_name(),
        },
    }
    print(json.dumps(result))


def _backend_name():
    try:
        import jax
        return str(jax.devices()[0])
    except Exception:
        return "unknown"


if __name__ == "__main__":
    main()
