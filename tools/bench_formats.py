#!/usr/bin/env python3
"""Format-level benchmark harnesses mirroring the reference's taxonomy
(SURVEY.md §6): WebP encoder configs with PSNR (webp_benchmark_test.go),
PNG decode/encode at zlib levels 1/6/9 (zlib_benchmark_test.go), decoder
creation (MP4 header parse) and the streamability probe. Prints one JSON
line per harness. Runs on CPU (host entropy + eager device ops)."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("BENCH_FMT_DEVICE", "cpu"))

import numpy as np  # noqa: E402

from lilliput_tpu import ImageOps, ImageOptions, ResizeMethod, new_decoder  # noqa: E402
from lilliput_tpu.framebuffer import (PNG_COMPRESSION, WEBP_METHOD,  # noqa: E402
                                      WEBP_PALETTE, WEBP_QUALITY, Framebuffer)

TD = "/root/reference/testdata"
DATA = "/root/reference/data"


def psnr(a, b):
    mse = ((a.astype(np.float64) - b.astype(np.float64)) ** 2).mean()
    return 10 * np.log10(255 ** 2 / max(mse, 1e-12))


def bench_webp_configs():
    """15 encoder configs (method 0-6, quality 60-90, palette on/off) over an
    animated input; reports ms/op, bytes/op, psnr_db (first frame)."""
    import io

    from PIL import Image
    buf = open(f"{TD}/party-discord.webp", "rb").read()
    first = np.array(Image.open(io.BytesIO(buf)).convert("RGBA"))

    configs = ([{"name": f"m{m}_q{q}", WEBP_METHOD: m, WEBP_QUALITY: q}
                for m in (0, 2, 4, 6) for q in (60, 75, 90)]
               + [{"name": f"palette_q{q}", WEBP_PALETTE: 1, WEBP_QUALITY: q}
                  for q in (60, 75, 90)])
    results = []
    for cfg in configs:
        name = cfg.pop("name")
        t0 = time.perf_counter()
        out = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
            file_type=".webp", resize_method=ResizeMethod.NO_RESIZE,
            encode_timeout=600.0, encode_options=cfg))
        dt = time.perf_counter() - t0
        back = np.array(Image.open(io.BytesIO(out)).convert("RGBA"))
        p = psnr(back[..., :3], first[..., :3]) if back.shape == first.shape else 0.0
        results.append({"config": name, "ms_per_op": round(dt * 1000, 1),
                        "bytes": len(out), "psnr_db": round(float(p), 2)})
    print(json.dumps({"harness": "webp_encode_configs", "results": results}))


def bench_png_levels():
    """PNG decode B/s and encode bytes at compression 1/6/9."""
    buf = open(f"{DATA}/firefox.png", "rb").read()
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        d = new_decoder(buf)
        fb = Framebuffer()
        d.decode_to(fb)
        np.asarray(fb.array)
    dec_bps = len(buf) * n / (time.perf_counter() - t0)
    enc = {}
    from lilliput_tpu.codecs.png import PngEncoder
    d = new_decoder(buf)
    fb = Framebuffer()
    d.decode_to(fb)
    for level in (1, 6, 9):
        t0 = time.perf_counter()
        out = PngEncoder(d).encode(fb, {PNG_COMPRESSION: level})
        enc[f"level_{level}"] = {"ms": round((time.perf_counter() - t0) * 1000, 1),
                                 "bytes": len(out)}
    print(json.dumps({"harness": "png_codec", "decode_bytes_per_sec": int(dec_bps),
                      "encode": enc}))


def bench_avif_configs():
    """AVIF encoder quality/speed sweep (the reference's encode options,
    avif.cpp:614-776 — AVIF_QUALITY/AVIF_SPEED; example defaults q85
    speed10 in examples/main.go:14-19): still + animated inputs, reports
    ms/op, bytes/op, psnr_db/op like the WebP harness."""
    import io

    from PIL import Image

    from lilliput_tpu.framebuffer import AVIF_QUALITY, AVIF_SPEED
    still = open(f"{TD}/colors_sdr_srgb.avif", "rb").read()
    anim = open(f"{TD}/colors-animated-8bpc-alpha-exif-xmp.avif", "rb").read()
    first = np.array(Image.open(io.BytesIO(still)).convert("RGB"))
    configs = ([{"name": f"q{q}_s6", AVIF_QUALITY: q, AVIF_SPEED: 6}
                for q in (50, 60, 85, 95)]
               + [{"name": f"q85_s{s}", AVIF_QUALITY: 85, AVIF_SPEED: s}
                  for s in (8, 10)])
    results = []
    for cfg in configs:
        name = cfg.pop("name")
        t0 = time.perf_counter()
        out = ImageOps(8192).transform(new_decoder(still), ImageOptions(
            file_type=".avif", resize_method=ResizeMethod.NO_RESIZE,
            encode_timeout=600.0, encode_options=cfg))
        dt = time.perf_counter() - t0
        back = np.array(Image.open(io.BytesIO(out)).convert("RGB"))
        p = psnr(back, first) if back.shape == first.shape else 0.0
        results.append({"config": name, "ms_per_op": round(dt * 1000, 1),
                        "bytes": len(out), "psnr_db": round(float(p), 2)})
    # animated: bytes + wall only (per-frame PSNR covered by tests)
    t0 = time.perf_counter()
    out = ImageOps(8192).transform(new_decoder(anim), ImageOptions(
        file_type=".avif", resize_method=ResizeMethod.NO_RESIZE,
        encode_timeout=600.0,
        encode_options={AVIF_QUALITY: 85, AVIF_SPEED: 8}))
    results.append({"config": "animated_q85_s8",
                    "ms_per_op": round((time.perf_counter() - t0) * 1000, 1),
                    "bytes": len(out),
                    "frames": getattr(Image.open(io.BytesIO(out)),
                                      "n_frames", 1)})
    print(json.dumps({"harness": "avif_encode_configs", "results": results}))


def bench_decoder_create():
    buf = open(f"{TD}/big_buck_bunny_480p_10s_std.mp4", "rb").read()
    t0 = time.perf_counter()
    n = 30
    for _ in range(n):
        new_decoder(buf).close()
    per = (time.perf_counter() - t0) / n
    from lilliput_tpu.codecs.video import is_streamable_mp4
    t0 = time.perf_counter()
    m = 2000
    for _ in range(m):
        is_streamable_mp4(buf)
    probe = (time.perf_counter() - t0) / m
    print(json.dumps({"harness": "probe", "decoder_create_ms": round(per * 1000, 2),
                      "streamable_probe_us": round(probe * 1e6, 1)}))


if __name__ == "__main__":
    bench_png_levels()
    bench_decoder_create()
    bench_webp_configs()
    bench_avif_configs()
