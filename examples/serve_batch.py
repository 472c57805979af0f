#!/usr/bin/env python3
"""Batch serving demo: the TPU-native counterpart of running one lilliput
ImageOps per goroutine (reference README.md:5-8).

    python examples/serve_batch.py IMG.jpg [IMG2.jpg ...] \
        -width 256 -height 256 [-quality 85] [-mode rgb|direct] [-sharded]

Routes mixed requests — JPEG, PNG/WebP/BMP/AVIF stills, and animated
GIF/WebP/AVIF alike — through MultiGeometryPipeline (one compiled
program per source signature, order-preserving batch dispatch);
-sharded hands the same front a device mesh so every route scales
across chips (JPEG signatures take the sharded coefficient-domain
pipeline, other stills the sharded pixel-domain one, animated batches
dp-shard their animation axis). -mode direct selects the YCbCr-domain
transcode (one chroma resample; fastest) where eligible, falling back
per group otherwise."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("inputs", nargs="+")
    ap.add_argument("-width", type=int, default=256)
    ap.add_argument("-height", type=int, default=256)
    ap.add_argument("-quality", type=int, default=85)
    ap.add_argument("-mode", choices=("rgb", "direct"), default="rgb")
    ap.add_argument("-dct-scale", type=int, choices=(1, 2, 4), default=1,
                    help="reduced decode (2=half, 4=quarter; needs -mode direct)")
    ap.add_argument("-format", choices=("jpeg", "webp", "png"),
                    default="jpeg", help="output container")
    ap.add_argument("-sharded", action="store_true")
    ap.add_argument("-warm", action="store_true",
                    help="pre-compile the input geometries before timing "
                         "(pairs with the default persistent compile cache)")
    ap.add_argument("-outdir", default=".")
    ap.add_argument("-device", default=None,
                    help="jax platform override (e.g. cpu)")
    args = ap.parse_args()

    if args.device:
        import jax
        jax.config.update("jax_platforms", args.device)

    bufs = [open(p, "rb").read() for p in args.inputs]
    t0 = time.time()
    if args.sharded:
        from lilliput_tpu import MultiGeometryPipeline
        from lilliput_tpu.parallel import make_mesh

        # the mesh-aware mixed front: JPEG signatures take the sharded
        # coefficient-domain pipeline, other stills the sharded
        # pixel-domain one, animated sources (with webp output) shard
        # their animation axis — all from one serving object
        mesh = make_mesh()
        pipe = MultiGeometryPipeline(args.width, args.height,
                                     quality=args.quality,
                                     chroma_mode=args.mode,
                                     dct_scale=args.dct_scale,
                                     output_format="." + args.format,
                                     mesh=mesh)
        with mesh:
            outs = pipe.transcode(bufs)
        kind = f"sharded over {mesh.devices.size} device(s)"
    else:
        from lilliput_tpu import MultiGeometryPipeline
        pipe = MultiGeometryPipeline(args.width, args.height,
                                     quality=args.quality,
                                     chroma_mode=args.mode,
                                     dct_scale=args.dct_scale,
                                     output_format="." + args.format)
        if args.warm:
            # pre-compile off the request path (with the persistent
            # compile cache a RESTARTED server re-warms without any
            # XLA compile at all)
            rep = pipe.warm([open(p, "rb").read() for p in args.inputs])
            print(f"warmed {rep['warmed']} geometries "
                  f"({rep['compiled_new']} new) in {rep['seconds']} s")
            t0 = time.time()
        outs = pipe.transcode(bufs)
        kind = "multi-geometry"
        stats = pipe.stats()
        kind += (f", cache {stats['geometries_cached']}/"
                 f"{stats['max_geometries']} "
                 f"(hits {stats['hits']}, evictions {stats['evictions']})")
    dt = time.time() - t0

    os.makedirs(args.outdir, exist_ok=True)
    for path, out in zip(args.inputs, outs):
        dst = os.path.join(
            args.outdir,
            os.path.splitext(os.path.basename(path))[0]
            + ".out." + args.format)
        open(dst, "wb").write(out)
        print(f"{path} -> {dst} ({len(out)} bytes)")
    print(f"{len(bufs)} image(s) in {dt * 1e3:.1f} ms "
          f"({kind}, mode={args.mode}, incl. compile)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
