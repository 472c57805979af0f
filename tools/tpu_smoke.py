#!/usr/bin/env python3
"""Real-chip smoke of every device path (compile + run, small fixtures).

The CPU suite exercises Pallas kernels in interpret mode only, and Mosaic's
layout rules differ by SHAPE (a ref reshape compiled at 1080p but failed at
100x76 — see CLAUDE.md). This drives each device-touching surface on the
attached TPU with small/odd fixtures so lowering breaks surface before a
user hits them. One JSON line per surface; nonzero exit on any failure.

    python tools/tpu_smoke.py            # needs the TPU attached
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

TD = "/root/reference/testdata"
DATA = "/root/reference/data"


def main() -> int:
    import numpy as np

    results = []
    failures = 0

    def run(name, fn):
        nonlocal failures
        t0 = time.time()
        try:
            detail = fn() or {}
            results.append({"surface": name, "ok": True,
                            "s": round(time.time() - t0, 1), **detail})
        except Exception as e:
            failures += 1
            traceback.print_exc()
            results.append({"surface": name, "ok": False,
                            "error": f"{type(e).__name__}: {e}"})
        print(json.dumps(results[-1]), flush=True)

    # --- JPEG serving pipeline, odd small + grayscale ----------------------
    def jpeg_serving():
        import cv2
        from lilliput_tpu.pipeline import JpegTranscodePipeline
        rng = np.random.default_rng(0)
        img = cv2.resize(rng.integers(0, 256, (10, 10, 3), np.uint8),
                         (100, 76), interpolation=cv2.INTER_CUBIC)
        ok, b = cv2.imencode(".jpg", img, [cv2.IMWRITE_JPEG_QUALITY, 88])
        buf = b.tobytes()
        out = JpegTranscodePipeline(buf, 64, 64).transcode([buf])[0]
        assert out[:2] == b"\xff\xd8"
        gray = cv2.imencode(".jpg", img[..., 0])[1].tobytes()
        outg = JpegTranscodePipeline(gray, 48, 48).transcode([gray])[0]
        assert outg[:2] == b"\xff\xd8"
        # 4:2:2 / 4:4:4 sources route through the packed megakernel tails
        import io
        from PIL import Image
        for subs in (1, 0):
            bio = io.BytesIO()
            Image.fromarray(img[..., ::-1]).save(
                bio, format="JPEG", quality=88, subsampling=subs)
            b422 = bio.getvalue()
            o = JpegTranscodePipeline(b422, 48, 48).transcode([b422])[0]
            assert o[:2] == b"\xff\xd8", subs
        # still outputs (pixel-emit device step + host webp/png encode)
        outw = JpegTranscodePipeline(buf, 64, 64,
                                     output_format=".webp").transcode([buf])[0]
        assert outw[:4] == b"RIFF"
        outp = JpegTranscodePipeline(buf, 64, 64,
                                     output_format=".png").transcode([buf])[0]
        assert outp[:8] == b"\x89PNG\r\n\x1a\n"
        return {}

    # --- animated GIF batch path (device compositing + quantizer) ----------
    def gif_batch():
        from lilliput_tpu import transcode_gif
        buf = open(f"{TD}/party-discord.gif", "rb").read()
        out = transcode_gif(buf, 14, 9)
        assert out[:6] in (b"GIF87a", b"GIF89a")
        return {"bytes": len(out)}

    # --- cross-ANIMATION batch (vmapped composite/resize/quantize — the
    # batched sorts have no CPU-suite coverage of their TPU lowering) ---
    def gif_anim_group():
        from lilliput_tpu import transcode_gif, transcode_gif_batch
        buf = open(f"{TD}/party-discord.gif", "rb").read()
        outs = transcode_gif_batch([buf, buf, buf], 14, 9)
        want = transcode_gif(buf, 14, 9)
        assert outs == [want] * 3
        return {"bytes": len(want)}

    # --- animated WebP batch path ------------------------------------------
    def webp_batch():
        from lilliput_tpu import transcode_webp
        buf = open(f"{TD}/party-discord.webp", "rb").read()
        out = transcode_webp(buf, 20, 13)
        assert out[:4] == b"RIFF" and out[8:12] == b"WEBP"
        return {"bytes": len(out)}

    # --- thumbhash (device DCT matmuls) ------------------------------------
    def thumbhash():
        import base64
        from lilliput_tpu import ImageOps, ImageOptions, new_decoder
        buf = open(f"{DATA}/sunrise.jpg", "rb").read()
        out = ImageOps(1024).transform(new_decoder(buf), ImageOptions(
            file_type=".thumbhash", width=100, height=100))
        assert (base64.b64encode(out).decode()
                == "1QcSHQRnh493V4dIh4eXh1h4kJUI")
        return {}

    # --- video first frame (device YUV->BGR + resize) ----------------------
    def video_frame():
        from lilliput_tpu import ImageOps, ImageOptions, new_decoder
        from lilliput_tpu.framebuffer import JPEG_QUALITY
        buf = open(f"{TD}/big_buck_bunny_480p_10s_std.mp4", "rb").read()
        from lilliput_tpu import ResizeMethod
        out = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
            file_type=".jpeg", width=160, height=90,
            resize_method=ResizeMethod.RESIZE,
            encode_timeout=600.0, encode_options={JPEG_QUALITY: 85},
            disable_animated_output=True))
        assert out[:2] == b"\xff\xd8"
        return {}

    # --- exact resize paths (gather form) on TPU ---------------------------
    def resize_exact_paths():
        import jax
        from lilliput_tpu.ops import resize as R
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (37, 53, 3), np.uint8)
        for method in (R.AREA, R.LINEAR, R.CUBIC):
            out = np.asarray(jax.jit(
                R.resize, static_argnums=(1, 2, 3))(img, 24, 17, method))
            assert out.shape == (17, 24, 3), method
        return {}

    # --- blend / orient device ops -----------------------------------------
    def blend_orient():
        import jax.numpy as jnp
        from lilliput_tpu.ops import blend as B
        from lilliput_tpu.ops import orient as O
        rng = np.random.default_rng(2)
        canvas = jnp.asarray(rng.integers(0, 256, (31, 29, 4), np.uint8))
        frame = jnp.asarray(rng.integers(0, 256, (13, 11, 4), np.uint8))
        out = np.asarray(B.copy_to_region_with_alpha(canvas, frame,
                                                     3, 5, 11, 13))
        assert out.shape == canvas.shape
        for o in range(1, 9):
            np.asarray(O.orient(canvas, o))
        return {}

    # --- AVIF decode + device tone-map/resize ------------------------------
    def avif_frame():
        from lilliput_tpu import ImageOps, ImageOptions, new_decoder
        from lilliput_tpu.framebuffer import JPEG_QUALITY
        from lilliput_tpu.imageops import ResizeMethod
        buf = open(f"{TD}/paris_icc_exif_xmp.avif", "rb").read()
        out = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
            file_type=".jpeg", width=120, height=80,
            resize_method=ResizeMethod.FIT, encode_timeout=600.0,
            encode_options={JPEG_QUALITY: 85},
            disable_animated_output=True))
        assert out[:2] == b"\xff\xd8"
        return {}

    # --- PNG decode (device post) + encode ---------------------------------
    def png_roundtrip():
        from lilliput_tpu import ImageOps, ImageOptions, new_decoder
        from lilliput_tpu.imageops import ResizeMethod
        buf = open(f"{DATA}/firefox-16bit.png", "rb").read()
        out = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
            file_type=".png", width=40, height=30,
            resize_method=ResizeMethod.FIT, encode_timeout=600.0))
        assert out[:8] == b"\x89PNG\r\n\x1a\n"
        return {}

    # --- keyframe spritesheet (batched device resize + thumbhashes) --------
    def sprite():
        from lilliput_tpu import spritesheet
        buf = open(f"{TD}/big_buck_bunny_480p_10s_std.mp4", "rb").read()
        sheet, ts, hashes = spritesheet(buf, 64, 36, max_tiles=4,
                                        with_thumbhashes=True)
        assert sheet.ndim == 3 and len(ts) >= 1 and len(hashes) == len(ts)
        return {"tiles": len(ts)}

    # --- still-input serving (pixel-domain fused step, odd shapes) ---------
    def still_serving():
        from lilliput_tpu.pipeline import StillTranscodePipeline
        buf = open(f"{DATA}/opera.png", "rb").read()           # 100x100 RGBA
        out = StillTranscodePipeline(buf, 47, 33).transcode([buf, buf])
        assert all(o[:2] == b"\xff\xd8" for o in out)
        ga = open(f"{DATA}/opera-gray-alpha.png", "rb").read()
        outp = StillTranscodePipeline(ga, 33, 47,
                                      output_format=".png").transcode([ga])[0]
        assert outp[:8] == b"\x89PNG\r\n\x1a\n"
        wb = open(f"{TD}/ferry_sunset.webp", "rb").read()
        o = StillTranscodePipeline(wb, 40, 40).transcode([wb])[0]
        assert o[:2] == b"\xff\xd8"
        return {}

    # --- WebP yuv420 device emit (selection-dot gamma tables on-chip) ------
    def webp_yuv():
        import ctypes
        from lilliput_tpu import binding
        from lilliput_tpu.ops.color import webp_yuv420_from_packed
        from lilliput_tpu.pipeline import JpegTranscodePipeline
        import cv2
        lib = binding.load()
        u8p = ctypes.POINTER(ctypes.c_uint8)
        rng = np.random.default_rng(7)
        # on-chip conversion must bit-match libwebp's importer at odd shapes
        for (h, w) in [(33, 47), (1, 1), (64, 64)]:
            px = rng.integers(0, 256, (h, w, 3), np.uint8)
            packed = (px[..., 0].astype(np.int32)
                      | (px[..., 1].astype(np.int32) << 8)
                      | (px[..., 2].astype(np.int32) << 16))
            dy, du, dv = [np.asarray(a) for a in
                          webp_yuv420_from_packed(packed[None])]
            oy = np.empty(h * w, np.uint8)
            ou = np.empty(((h + 1) // 2) * ((w + 1) // 2), np.uint8)
            ov = np.empty_like(ou)
            pxc = np.ascontiguousarray(px)
            assert lib.lp_webp_bgra_to_yuv(
                pxc.ctypes.data_as(u8p), w, h, 3, oy.ctypes.data_as(u8p),
                ou.ctypes.data_as(u8p), ov.ctypes.data_as(u8p), None) == 0
            assert np.array_equal(dy[0], oy.reshape(h, w)), (h, w)
            assert np.array_equal(
                du[0], ou.reshape((h + 1) // 2, (w + 1) // 2)), (h, w)
            assert np.array_equal(
                dv[0], ov.reshape((h + 1) // 2, (w + 1) // 2)), (h, w)
        # serving output bytes identical to the BGRA escape hatch
        img = cv2.resize(rng.integers(0, 256, (10, 10, 3), np.uint8),
                         (100, 76), interpolation=cv2.INTER_CUBIC)
        buf = cv2.imencode(".jpg", img)[1].tobytes()
        fast = JpegTranscodePipeline(buf, 48, 48,
                                     output_format=".webp").transcode([buf])
        os.environ["LILLIPUT_WEBP_YUV"] = "0"
        try:
            slow = JpegTranscodePipeline(
                buf, 48, 48, output_format=".webp").transcode([buf])
        finally:
            del os.environ["LILLIPUT_WEBP_YUV"]
        assert fast == slow
        return {}

    run("jpeg_serving_small+gray", jpeg_serving)
    run("still_input_serving", still_serving)
    run("webp_yuv420_emit", webp_yuv)
    run("gif_batch_anim", gif_batch)
    run("gif_anim_group", gif_anim_group)
    run("webp_batch_anim", webp_batch)
    run("thumbhash_golden", thumbhash)
    run("video_first_frame", video_frame)
    run("resize_exact_paths", resize_exact_paths)
    run("blend_orient", blend_orient)
    run("avif_tone_map", avif_frame)
    run("png_16bit_roundtrip", png_roundtrip)
    run("spritesheet", sprite)

    print(json.dumps({"surfaces": len(results), "failures": failures}))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
