#!/usr/bin/env python3
"""End-to-end timings for every BASELINE.json workload config.

Runs each config through the same public surfaces a user would (ImageOps /
batched transcode helpers) and prints one JSON line per config with ms/op.
CPU by default (BENCH_CFG_DEVICE=axon to aim at the TPU — only the batched
paths are usable through the dev tunnel).

    python tools/bench_configs.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", os.environ.get("BENCH_CFG_DEVICE", "cpu"))

from lilliput_tpu import (ImageOps, ImageOptions, ResizeMethod,  # noqa: E402
                          new_decoder, spritesheet, transcode_gif)
from lilliput_tpu.framebuffer import JPEG_QUALITY, WEBP_QUALITY  # noqa: E402

TD = "/root/reference/testdata"
DATA = "/root/reference/data"
REPS = int(os.environ.get("BENCH_CFG_REPS", "3"))


def timed(fn):
    fn()  # warm (compile)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, out


def transform(path, ftype, w, h, opts=None, method=ResizeMethod.FIT):
    buf = open(path, "rb").read()

    def run():
        return ImageOps(8192).transform(new_decoder(buf), ImageOptions(
            file_type=ftype, width=w, height=h, resize_method=method,
            encode_timeout=300.0, encode_options=opts or {}))
    return timed(run)


def main():
    results = []

    ms, out = transform(f"{DATA}/sunrise.jpg", ".jpeg", 256, 256,
                        {JPEG_QUALITY: 85})
    results.append({"config": "1 static JPEG fit 256 q85", "ms_per_op": ms,
                    "out_bytes": len(out)})

    ms, out = transform(f"{DATA}/firefox-16bit-alpha.png", ".png", 64, 64)
    results.append({"config": "2 16-bit PNG+alpha resize->PNG",
                    "ms_per_op": ms, "out_bytes": len(out)})

    gif = open(f"{TD}/party-discord.gif", "rb").read()
    ms, out = timed(lambda: transcode_gif(gif, 64, 64, file_type=".webp"))
    results.append({"config": "3 animated GIF->animated WebP (batched)",
                    "ms_per_op": ms, "out_bytes": len(out)})

    ms, out = transform(f"{TD}/tears_of_steel_icc.webp", ".webp", 128, 128,
                        {WEBP_QUALITY: 85})
    results.append({"config": "4 animated WebP w/ ICC fit->WebP",
                    "ms_per_op": ms, "out_bytes": len(out)})
    ms, out = transform(f"{TD}/paris_icc_exif_xmp.avif", ".avif", 128, 128)
    results.append({"config": "4b AVIF w/ ICC+EXIF fit->AVIF",
                    "ms_per_op": ms, "out_bytes": len(out)})

    mp4 = f"{TD}/big_buck_bunny_480p_10s_std.mp4"
    ms, out = transform(mp4, ".jpeg", 256, 144, {JPEG_QUALITY: 85})
    results.append({"config": "5 MP4 first frame->JPEG", "ms_per_op": ms,
                    "out_bytes": len(out)})
    video = open(mp4, "rb").read()
    ms, (sheet, ts, hashes) = timed(
        lambda: spritesheet(video, 160, 90, with_thumbhashes=True))
    results.append({"config": "5b MP4 keyframe spritesheet + thumbhashes",
                    "ms_per_op": ms, "tiles": len(ts)})

    for r in results:
        r["ms_per_op"] = round(r["ms_per_op"], 1)
        print(json.dumps(r))


if __name__ == "__main__":
    main()
