#!/usr/bin/env python3
"""Synthesize a tiny WebM fixture without ffmpeg's CLI.

A lossy WebP still is a VP8 key frame in a RIFF wrapper, so the fixture
pipeline is: render frames -> lilliput WebP encoder (libwebp VP8) -> pull the
'VP8 ' chunk payload -> hand-mux the key frames into a minimal EBML/WebM
container (all-keyframe, 100 ms cadence). The result exercises the ffmpeg
shim's matroska demuxer + VP8 decoder (the reference CI decodes webm through
the same path; its testdata ships none).

Usage: python tools/make_webm_fixture.py tests/assets/tiny_vp8.webm
"""

import struct
import sys


def vint(n: int) -> bytes:
    """EBML variable-size integer (length marker in the leading bits)."""
    for length in range(1, 9):
        if n < (1 << (7 * length)) - 1:
            out = n | (1 << (7 * length))
            return out.to_bytes(length, "big")
    raise ValueError(n)


def elem(eid: int, payload: bytes) -> bytes:
    return eid.to_bytes((eid.bit_length() + 7) // 8, "big") + vint(len(payload)) + payload


def uint_elem(eid: int, v: int) -> bytes:
    n = max((v.bit_length() + 7) // 8, 1)
    return elem(eid, v.to_bytes(n, "big"))


def float_elem(eid: int, v: float) -> bytes:
    return elem(eid, struct.pack(">d", v))


def str_elem(eid: int, s: str) -> bytes:
    return elem(eid, s.encode())


def vp8_frame_from_webp(webp: bytes) -> bytes:
    """Extract the raw VP8 key frame payload from a lossy WebP file."""
    assert webp[:4] == b"RIFF" and webp[8:12] == b"WEBP"
    i = 12
    while i + 8 <= len(webp):
        tag = webp[i:i + 4]
        size = int.from_bytes(webp[i + 4:i + 8], "little")
        if tag == b"VP8 ":
            return webp[i + 8:i + 8 + size]
        i += 8 + size + (size & 1)
    raise ValueError("no lossy VP8 chunk in webp")


def mux_webm(frames, width: int, height: int, frame_ms: int = 100,
             rotate: int | None = None) -> bytes:
    """rotate: clockwise degrees muxed as a track-targeted Matroska
    SimpleTag ROTATE — ffmpeg's matroska demuxer attaches it to the
    stream's metadata dict, where the legacy 'rotate' lookup (matched
    case-insensitively, reference avcodec.cpp:428-431) finds it. This is
    the only way to exercise the dictionary-tag orientation path with
    ffmpeg 7, whose mov demuxer always synthesizes display-matrix side
    data instead."""
    ebml = elem(0x1A45DFA3, b"".join([
        uint_elem(0x4286, 1), uint_elem(0x42F7, 1), uint_elem(0x42F2, 4),
        uint_elem(0x42F3, 8), str_elem(0x4282, "webm"),
        uint_elem(0x4287, 2), uint_elem(0x4285, 2)]))
    info = elem(0x1549A966, b"".join([
        uint_elem(0x2AD7B1, 1_000_000),          # timestamp scale = 1 ms
        float_elem(0x4489, float(len(frames) * frame_ms)),
        str_elem(0x4D80, "lilliput-tpu"), str_elem(0x5741, "lilliput-tpu")]))
    video = elem(0xE0, uint_elem(0xB0, width) + uint_elem(0xBA, height))
    track = elem(0xAE, b"".join([
        uint_elem(0xD7, 1), uint_elem(0x73C5, 1), uint_elem(0x83, 1),
        str_elem(0x86, "V_VP8"), video]))
    tracks = elem(0x1654AE6B, track)
    tags = b""
    if rotate is not None:
        simple = elem(0x67C8, str_elem(0x45A3, "ROTATE")
                      + str_elem(0x4487, str(rotate)))
        targets = elem(0x63C0, uint_elem(0x63C5, 1))  # TagTrackUID = 1
        tags = elem(0x1254C367, elem(0x7373, targets + simple))
    clusters = b""
    for i, f in enumerate(frames):
        block = elem(0xA3, vint(1) + struct.pack(">h", 0) + b"\x80" + f)
        clusters += elem(0x1F43B675, uint_elem(0xE7, i * frame_ms) + block)
    segment = elem(0x18538067, info + tracks + tags + clusters)
    return ebml + segment


def make_webm_bytes(rotate: int | None = None, n_frames: int = 2) -> bytes:
    """In-memory fixture builder for tests (same frames as main())."""
    import io

    import numpy as np
    from PIL import Image

    w, h = 64, 48
    frames = []
    for i in range(n_frames):
        img = np.zeros((h, w, 3), np.uint8)
        img[:, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        img[:, :, 1] = (i * 32) % 256
        img[:, :, 2] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
        bio = io.BytesIO()
        Image.fromarray(img).save(bio, format="WEBP", lossless=False,
                                  quality=80)
        frames.append(vp8_frame_from_webp(bio.getvalue()))
    return mux_webm(frames, w, h, rotate=rotate)


def main(out_path: str) -> None:
    import io

    import numpy as np
    from PIL import Image

    w, h = 64, 48
    frames = []
    for i in range(8):
        img = np.zeros((h, w, 3), np.uint8)
        img[:, :, 0] = np.linspace(0, 255, w, dtype=np.uint8)[None, :]
        img[:, :, 1] = (i * 32) % 256
        img[:, :, 2] = np.linspace(0, 255, h, dtype=np.uint8)[:, None]
        img[10:20, (4 * i) % (w - 10):(4 * i) % (w - 10) + 10] = 255
        bio = io.BytesIO()
        Image.fromarray(img).save(bio, format="WEBP", lossless=False, quality=80)
        frames.append(vp8_frame_from_webp(bio.getvalue()))
    data = mux_webm(frames, w, h)
    open(out_path, "wb").write(data)
    print(f"wrote {out_path}: {len(data)} bytes, {len(frames)} frames")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "tests/assets/tiny_vp8.webm")
