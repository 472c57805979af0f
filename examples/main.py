#!/usr/bin/env python3
"""End-to-end CLI driver, mirroring the reference example
(/root/reference/examples/main.go:21-148): read file -> new_decoder ->
print metadata -> ImageOps.transform -> write file.

Usage:
    python examples/main.py -input in.jpg -output out.webp \
        -width 256 -height 256 [-stretch] [-disable-animated-output] \
        [-max-encode-frames N] [-max-encode-duration SECONDS] [-force-sdr]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _select_device(argv):
    """Single-image CLI work is dominated by dispatch latency, so default to
    CPU; pass -device tpu for device execution (the batched pipeline in
    lilliput_tpu/pipeline.py is the right TPU entry point)."""
    dev = "cpu"
    if "-device" in argv:
        dev = argv[argv.index("-device") + 1]
    import jax
    if dev != "default":
        jax.config.update("jax_platforms", dev)


_select_device(sys.argv)

from lilliput_tpu import (ImageOps, ImageOptions, ResizeMethod, new_decoder)
from lilliput_tpu.framebuffer import (AVIF_QUALITY, AVIF_SPEED, JPEG_QUALITY,
                                      PNG_COMPRESSION, WEBP_QUALITY)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-input", required=True)
    p.add_argument("-output", default="")
    p.add_argument("-width", type=int, default=0)
    p.add_argument("-height", type=int, default=0)
    p.add_argument("-stretch", action="store_true")
    p.add_argument("-disable-animated-output", dest="disable_anim", action="store_true")
    p.add_argument("-max-encode-frames", type=int, default=0)
    p.add_argument("-max-encode-duration", type=float, default=0.0)
    p.add_argument("-force-sdr", dest="force_sdr", action="store_true")
    p.add_argument("-quality", type=int, default=85)
    p.add_argument("-device", default="cpu",
                   help="jax platform for the transform (cpu|tpu|default)")
    p.add_argument("-stats", action="store_true",
                   help="print per-stage p50/p99 timings after the transform")
    args = p.parse_args()

    try:
        buf = open(args.input, "rb").read()
    except OSError as e:
        # clean error like the reference CLI (examples/main.go:47-50)
        print(f"failed to read input file: {e}", file=sys.stderr)
        sys.exit(1)
    try:
        dec = new_decoder(buf)
        header = dec.header()
    except Exception as e:
        print(f"error decoding image: {e}", file=sys.stderr)
        sys.exit(1)

    print(f"file type: {dec.description()}")
    print(f"{header.width}x{header.height}, {header.channels}ch, "
          f"{header.num_frames} frame(s), orientation {int(header.orientation)}")
    if dec.duration():
        print(f"duration: {dec.duration():.2f} s")

    if not args.output:
        return

    if args.stretch:
        method = ResizeMethod.RESIZE
    elif args.width and args.height:
        method = ResizeMethod.FIT
    else:
        method = ResizeMethod.NO_RESIZE

    ext = os.path.splitext(args.output)[1] or ("." + dec.description().lower())
    opts = ImageOptions(
        file_type=ext,
        width=args.width,
        height=args.height,
        resize_method=method,
        normalize_orientation=True,
        encode_options={
            # example defaults mirroring examples/main.go:14-19
            JPEG_QUALITY: args.quality,
            PNG_COMPRESSION: 7,
            WEBP_QUALITY: args.quality,
            AVIF_QUALITY: args.quality,
            AVIF_SPEED: 10,
        },
        max_encode_frames=args.max_encode_frames,
        max_encode_duration=args.max_encode_duration,
        encode_timeout=300.0,
        disable_animated_output=args.disable_anim,
        force_sdr=args.force_sdr,
    )

    ops = ImageOps(8192)
    t0 = time.time()
    out = ops.transform(dec, opts)
    dt = time.time() - t0
    open(args.output, "wb").write(out)
    print(f"transformed in {dt * 1000:.1f} ms -> {args.output} ({len(out)} bytes)")
    if args.stats:
        import json

        from lilliput_tpu.utils import metrics
        print(json.dumps(metrics.snapshot(), indent=2))


if __name__ == "__main__":
    main()
