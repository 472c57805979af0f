"""AVIF codec tests (avif_test.go taxonomy): static + animated decode,
durations/loop count, ICC passthrough + Rec709 substitution for tone-mapped
HDR, encode round trip."""
import io

import numpy as np
import pytest

PIL_Image = pytest.importorskip("PIL.Image")
if not getattr(__import__("PIL.features", fromlist=["check"]), "check")("avif"):
    pytest.skip("PIL lacks AVIF support", allow_module_level=True)

from lilliput_tpu import ImageOps, ImageOptions, ResizeMethod, new_decoder  # noqa: E402
from lilliput_tpu.codecs.avif import AvifDecoder, parse_cicp  # noqa: E402
from lilliput_tpu.codecs.icc import REC709_PROFILE, is_hdr_icc_profile  # noqa: E402
from lilliput_tpu.framebuffer import AVIF_QUALITY, AVIF_SPEED, Framebuffer  # noqa: E402

TD = "/root/reference/testdata"


def test_static_header_and_decode():
    d = new_decoder(open(f"{TD}/colors_sdr_srgb.avif", "rb").read())
    h = d.header()
    assert (h.width, h.height) == (200, 200)
    assert not h.is_animated()
    fb = Framebuffer()
    d.decode_to(fb)
    assert fb.to_numpy().shape == (200, 200, 3)
    with pytest.raises(EOFError):
        d.decode_to(fb)


def test_animated_durations_and_loops():
    d = new_decoder(open(f"{TD}/colors-animated-8bpc-alpha-exif-xmp.avif", "rb").read())
    h = d.header()
    assert h.num_frames == 5 and h.has_alpha()
    assert d.duration() > 0
    assert d.loop_count() == 0


def test_unknown_loop_count_is_zero():
    d = new_decoder(open(f"{TD}/spinning-globe-unknown-loop-count.avif", "rb").read())
    assert d.loop_count() == 0  # avif.cpp:401-413: unknown/infinite -> 0
    assert d.header().num_frames == 72


def test_icc_passthrough():
    d = new_decoder(open(f"{TD}/paris_icc_exif_xmp.avif", "rb").read())
    assert len(d.icc()) == 596


def test_hdr_reports_rec709_when_tone_mapped():
    buf = open(f"{TD}/hdr_color_preservation.avif", "rb").read()
    cicp = parse_cicp(buf)
    assert cicp is not None and cicp[1] in (16, 18)  # PQ or HLG
    d = AvifDecoder(buf, tone_mapping_enabled=True)
    assert d.icc() == REC709_PROFILE
    assert not is_hdr_icc_profile(d.icc())
    d2 = AvifDecoder(buf, tone_mapping_enabled=False)
    assert d2.icc() != REC709_PROFILE


def test_transform_animated_avif():
    buf = open(f"{TD}/colors-animated-8bpc-alpha-exif-xmp.avif", "rb").read()
    out = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".avif", width=64, height=64, resize_method=ResizeMethod.FIT,
        encode_timeout=600.0, encode_options={AVIF_QUALITY: 60, AVIF_SPEED: 10}))
    im = PIL_Image.open(io.BytesIO(out))
    assert im.size == (64, 64)
    assert getattr(im, "n_frames", 1) == 5


def test_avif_to_webp():
    buf = open(f"{TD}/colors-animated-8bpc-alpha-exif-xmp.avif", "rb").read()
    out = ImageOps(8192).transform(new_decoder(buf), ImageOptions(
        file_type=".webp", width=64, height=64, resize_method=ResizeMethod.FIT,
        encode_timeout=600.0))
    im = PIL_Image.open(io.BytesIO(out))
    assert im.size == (64, 64) and getattr(im, "n_frames", 1) == 5


def test_batched_avif_transcode():
    from lilliput_tpu.framebuffer import AVIF_QUALITY, AVIF_SPEED
    from lilliput_tpu.pipeline import transcode_avif
    buf = open(f"{TD}/colors-animated-8bpc-alpha-exif-xmp.avif", "rb").read()
    out = transcode_avif(buf, 64, 64, fit=True,
                         encode_options={AVIF_QUALITY: 60, AVIF_SPEED: 10})
    im = PIL_Image.open(io.BytesIO(out))
    assert im.size == (64, 64) and getattr(im, "n_frames", 1) == 5


# ---------------------------------------------------------------------------
# 10/12-bit HDR path + CLAP + loop passthrough (round 2)
# ---------------------------------------------------------------------------

def test_hdr_uses_native_depth_planes():
    """HDR decode must run on the full-precision AV1 planes (12-bit here),
    not PIL's 8-bit RGB: the two paths agree globally but the native-depth
    output resolves gradient steps the 8-bit signal quantized away."""
    import numpy as np
    from lilliput_tpu.codecs.avif import AvifDecoder
    buf = open(f"{TD}/hdr_color_preservation.avif", "rb").read()
    d = AvifDecoder(buf)
    assert d._use_raw, "HDR still should take the native-depth path"
    fb = Framebuffer(); d.decode_to(fb)
    hi = fb.to_numpy()

    d8 = AvifDecoder(buf)
    d8._use_raw = False
    fb8 = Framebuffer(); d8.decode_to(fb8)
    lo = fb8.to_numpy()

    diff = np.abs(hi.astype(int) - lo.astype(int))
    assert diff.mean() < 4.0              # same tone-map, consistent output
    assert diff.max() >= 4                # ...but measurably more precision
    # banding: fewer >1-step jumps along a gradient row at native depth
    def jumps(px):
        return int((np.abs(np.diff(px[1080, :, 2].astype(int))) > 1).sum())
    assert jumps(hi) <= jumps(lo)


def _inject_clap(buf: bytes, clap) -> bytes:
    """Append a clap property to a real still AVIF: rebuild ipco/ipma inside
    meta, then shift the iloc extent offset by the growth."""
    import struct
    from lilliput_tpu.codecs import av1_raw as AR

    def box(typ, payload):
        return (len(payload) + 8).to_bytes(4, "big") + typ + payload

    meta_s, meta_e = AR._child(buf, 0, len(buf), b"meta")
    ms = meta_s + 4
    iprp_s, iprp_e = AR._child(buf, ms, meta_e, b"iprp")
    ipco_s, ipco_e = AR._child(buf, iprp_s, iprp_e, b"ipco")
    ipma_s, ipma_e = AR._child(buf, iprp_s, iprp_e, b"ipma")
    nprops = sum(1 for _ in AR._iter_boxes(buf, ipco_s, ipco_e))

    clap_box = box(b"clap", struct.pack(">8i", *clap))
    new_ipco = box(b"ipco", buf[ipco_s:ipco_e] + clap_box)
    # ipma v0/flags0: verflags(4) entry_count(4) item_id(2) assoc_count(1) ...
    pay = bytearray(buf[ipma_s:ipma_e])
    assert pay[3] & 1 == 0, "2-byte associations not handled"
    pay[4 + 4 + 2] += 1                      # assoc_count of entry 1
    pay.append(0x80 | (nprops + 1))          # clap is transformative -> essential
    new_ipma = box(b"ipma", bytes(pay))
    new_iprp = box(b"iprp", new_ipco + new_ipma)
    new_meta_payload = (buf[meta_s:iprp_s - 8] + new_iprp
                        + buf[iprp_e:meta_e])
    new_meta = box(b"meta", new_meta_payload)
    out = bytearray(buf[:meta_s - 8] + new_meta + buf[meta_e:])
    delta = len(new_meta) - (meta_e - (meta_s - 8))

    # shift every iloc extent offset (v0, offset_size=length_size=4)
    nm_s, nm_e = AR._child(bytes(out), 0, len(out), b"meta")
    iloc_s, iloc_e = AR._child(bytes(out), nm_s + 4, nm_e, b"iloc")
    p = iloc_s
    version = out[p]; p += 4
    offset_size = out[p] >> 4; length_size = out[p] & 0xF
    base_offset_size = out[p + 1] >> 4
    p += 2
    count = int.from_bytes(out[p:p + 2], "big"); p += 2
    assert version == 0 and offset_size == 4 and base_offset_size == 0
    for _ in range(count):
        p += 2 + 2                           # item_id + data_reference_index
        ec = int.from_bytes(out[p:p + 2], "big"); p += 2
        for _ in range(ec):
            off = int.from_bytes(out[p:p + 4], "big")
            out[p:p + 4] = (off + delta).to_bytes(4, "big")
            p += 4 + length_size
    return bytes(out)


def test_clap_offsets_surfaced():
    from lilliput_tpu.codecs import av1_raw as AR
    from lilliput_tpu.codecs.avif import AvifDecoder
    src = open(f"{TD}/colors_sdr_srgb.avif", "rb").read()
    # a libavif-valid clean aperture (integral, even-aligned crop for
    # 4:2:0) whose offsets still exercise the N/D division
    clap = (160, 1, 120, 1, 28, 2, -40, 2)   # horizOff 28/2, vertOff -40/2
    buf = _inject_clap(src, clap)
    # our walk finds the synthetic box
    got = AR.parse_still_items(buf)
    assert got is not None and got.clap == clap
    # PIL/libavif accepts the hand-built file and the decoder surfaces the
    # C-truncated offsets (avif.cpp:500-522: int division)
    d = AvifDecoder(buf)
    fb = Framebuffer(); d.decode_to(fb)
    assert (fb.x_offset, fb.y_offset) == (14, -20)


def test_loop_count_passthrough_roundtrip():
    import numpy as np
    from lilliput_tpu.codecs import av1_raw as AR
    from lilliput_tpu.codecs.avif import AvifEncoder
    enc = AvifEncoder()
    enc._loops = 3
    rng = np.random.default_rng(0)
    for i in range(3):
        fb = Framebuffer(rng.integers(0, 256, (32, 32, 3), np.uint8))
        fb.duration = 0.1
        enc.encode(fb, {})
    out = enc.encode(None, {})
    assert AR.parse_loop_count(out) == 3
    # loop 0 (infinite) stays untouched
    d = new_decoder(open(f"{TD}/colors-animated-8bpc-alpha-exif-xmp.avif", "rb").read())
    assert d.loop_count() == 0


def test_alpha_encode_roundtrip():
    """RGBA survives the AVIF encoder: the alpha plane must come back
    structurally intact (lossy codec: tolerance, not equality)."""
    from lilliput_tpu.codecs.avif import AvifEncoder
    rng = np.random.default_rng(3)
    rgb = rng.integers(0, 256, (64, 64, 4), np.uint8)
    rgb[:, :, 3] = 255
    rgb[:32, :, 3] = 0          # top half fully transparent
    rgb[40:48, :, 3] = 128      # a semi-transparent band
    enc = AvifEncoder()
    assert enc.encode(Framebuffer(rgb), {AVIF_QUALITY: 90, AVIF_SPEED: 8}) is None
    out = enc.encode(None, {})
    im = PIL_Image.open(io.BytesIO(out))
    assert im.mode in ("RGBA", "LA") or "A" in im.getbands()
    back = np.array(im.convert("RGBA"))
    assert back.shape == (64, 64, 4)
    a = back[:, :, 3].astype(int)
    assert abs(a[:32].mean() - 0) <= 8
    assert abs(a[55:].mean() - 255) <= 8
    assert abs(a[40:48].mean() - 128) <= 16
    # and our own decoder agrees
    d = new_decoder(out)
    assert d.header().has_alpha()
    fb = Framebuffer(); d.decode_to(fb)
    ours = fb.to_numpy()
    assert ours.shape[2] == 4
    assert abs(int(ours[:32, :, 3].astype(int).mean()) - 0) <= 8


def test_animated_encode_roundtrip():
    """Multi-frame encode: frame count, per-frame content and total
    duration survive the AVIF round trip (reference avif.cpp:614-776
    animated encode semantics, ms timescale)."""
    from lilliput_tpu.codecs.avif import AvifEncoder
    colors = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 0)]
    enc = AvifEncoder()
    for c in colors:
        fr = np.zeros((48, 48, 3), np.uint8)
        fr[:, :] = c[::-1]  # framebuffer is BGR
        fb = Framebuffer(fr)
        fb.duration = 0.08
        assert enc.encode(fb, {AVIF_QUALITY: 90, AVIF_SPEED: 8}) is None
    out = enc.encode(None, {})
    d = new_decoder(out)
    h = d.header()
    assert h.num_frames == 4 and h.is_animated()
    assert abs(d.duration() - 0.32) < 0.05
    for c in colors:
        fb = Framebuffer(); d.decode_to(fb)
        px = fb.to_numpy()[..., :3]
        mean = px.reshape(-1, 3).mean(axis=0)  # BGR
        want = np.array(c[::-1], float)
        assert np.abs(mean - want).max() < 20, (mean, want)


def test_set_avis_repetitions_fuzz_total():
    """_set_avis_repetitions is hand-rolled ISOBMFF surgery: it must be a
    TOTAL function over malformed input — garbage, truncations at every
    box boundary, and size-field mutations return bytes, never raise."""
    from lilliput_tpu.codecs.avif import _set_avis_repetitions
    real = open(f"{TD}/colors-animated-8bpc-alpha-exif-xmp.avif", "rb").read()
    rng = np.random.default_rng(0)
    cases = [b"", b"\x00", b"\x00" * 7, rng.bytes(64), rng.bytes(4096)]
    cases += [real[:n] for n in range(0, min(len(real), 2048), 37)]
    # mutate box-size fields throughout the header region
    for off in range(0, 512, 16):
        m = bytearray(real)
        m[off:off + 4] = (0xFFFFFFFF).to_bytes(4, "big")
        cases.append(bytes(m))
        m = bytearray(real)
        m[off:off + 4] = (1).to_bytes(4, "big")  # 64-bit-size marker, no payload
        cases.append(bytes(m))
    for case in cases:
        out = _set_avis_repetitions(case, 3)
        assert isinstance(out, bytes)
    # and on the real file it actually takes effect
    from lilliput_tpu.codecs import av1_raw as AR
    good = _set_avis_repetitions(real, 2)
    assert AR.parse_loop_count(good) == 2


# ---------------------------------------------------------------------------
# hardening regressions (adversarial-review findings)
# ---------------------------------------------------------------------------

def test_parse_cicp_ignores_mdat_bytes():
    """parse_cicp must read the PRIMARY item's ipma-associated colr
    property — 'colrnclx' appearing inside the entropy payload (mdat) or
    on the alpha item must never flip the HDR detection (review finding:
    a naive whole-buffer substring search did exactly that)."""
    import struct
    buf = open(f"{TD}/colors_sdr_srgb.avif", "rb").read()
    base = parse_cicp(buf)
    # append a hostile PQ 'colrnclx' in a trailing free box: transfer=16
    # would previously flip _is_hdr on this SDR file (the old code
    # substring-searched the WHOLE buffer, entropy payload included)
    hostile = b"colrnclx" + struct.pack(">HHH", 9, 16, 9) + b"\x80"
    evil = buf + struct.pack(">I", 8 + len(hostile)) + b"free" + hostile
    assert parse_cicp(evil) == base
    d = AvifDecoder(evil, tone_mapping_enabled=True)
    assert not d._is_hdr


def test_parse_avis_timing_bounded_on_hostile_stts():
    """stts sample_count fields are attacker-controlled u32s: a crafted
    count must not size a multi-GB Python list, and a truncated stts box
    must not raise struct.error out of the constructor."""
    import struct
    from lilliput_tpu.codecs.avif import parse_avis_timing
    buf = open(f"{TD}/colors-animated-8bpc-alpha-exif-xmp.avif", "rb").read()
    stts = buf.find(b"stts")
    assert stts > 0
    # entry_count claims 2^31 entries; box ends long before that
    evil = buf[:stts + 8] + struct.pack(">I", 1 << 31) + buf[stts + 12:]
    durations, _ = parse_avis_timing(evil)  # must return promptly, bounded
    assert len(durations) <= (1 << 16)
    # one entry with sample_count 0xFFFFFFFF: expansion is capped
    evil2 = (buf[:stts + 8] + struct.pack(">III", 1, 0xFFFFFFFF, 1)
             + buf[stts + 20:])
    durations2, _ = parse_avis_timing(evil2)
    assert len(durations2) <= (1 << 16)
    # truncating the file mid-stts must not raise an untyped error
    parse_avis_timing(buf[:stts + 10])


def test_gray_frame_encodes_to_avif():
    """Grayscale sources route a 1-channel Framebuffer into AvifEncoder
    (api.py dispatch); PIL rejects (H,W,1) arrays, so the encoder must
    hand it a 2-D mode-'L' array (review finding: untyped TypeError)."""
    import numpy as np
    from lilliput_tpu.codecs.avif import AvifEncoder
    fb = Framebuffer()
    fb.array = np.tile(np.arange(64, dtype=np.uint8)[:, None, None] * 4,
                       (1, 48, 1))
    enc = AvifEncoder()
    assert enc.encode(fb, {AVIF_QUALITY: 80, AVIF_SPEED: 10}) is None
    out = enc.encode(None, {AVIF_QUALITY: 80, AVIF_SPEED: 10})
    im = PIL_Image.open(io.BytesIO(out))
    assert im.size == (48, 64)
    back = np.asarray(im.convert("L"))
    src = fb.to_numpy()[:, :, 0]
    assert np.abs(back.astype(int) - src.astype(int)).mean() < 8


def test_parse_avis_timing_zero_sample_count_entry():
    """A legitimate zero-sample_count stts entry extends nothing but must
    not abort the remaining entries (review finding: the hostile-count cap
    turned it into an early break, dropping all later durations)."""
    import struct
    from lilliput_tpu.codecs.avif import parse_avis_timing

    def box(t, payload):
        return struct.pack(">I", 8 + len(payload)) + t + payload

    stts = (b"\x00" * 4 + struct.pack(">I", 3)
            + struct.pack(">II", 0, 99)     # zero-count entry (file-supplied)
            + struct.pack(">II", 2, 500)    # 2 x 0.5 s
            + struct.pack(">II", 1, 250))   # 1 x 0.25 s
    mdhd = box(b"mdhd", b"\x00" * 12 + struct.pack(">I", 1000) + b"\x00" * 8)
    buf = box(b"moov", box(b"trak", box(b"mdia", mdhd + box(
        b"minf", box(b"stbl", box(b"stts", stts))))))
    durations, _ = parse_avis_timing(buf)
    assert durations == [0.5, 0.5, 0.25]


def test_parse_cicp_no_meta_fallback_after_item_walk(monkeypatch):
    """If the still item walk PARSED the meta box but the primary item has
    no colr/nclx, the raw meta substring fallback must be skipped — it
    would misattribute an alpha item's nclx to the primary image (review
    finding). The fallback stays available when the walk cannot parse."""
    import struct
    from lilliput_tpu.codecs import av1_raw

    # a 'meta' box whose raw bytes contain a PQ colrnclx (as an alpha
    # item's ipco property would) — transfer=16 flips HDR if picked up
    hostile = b"colrnclx" + struct.pack(">HHH", 9, 16, 9) + b"\x80"
    buf = (struct.pack(">I", 12 + len(hostile)) + b"meta" + b"\x00" * 4
           + hostile)

    class _Si:
        nclx = None

    monkeypatch.setattr(av1_raw, "parse_still_items", lambda b: _Si())
    assert parse_cicp(buf) is None  # parsed walk, no nclx: no fallback

    monkeypatch.setattr(av1_raw, "parse_still_items",
                        lambda b: (_ for _ in ()).throw(ValueError("boom")))
    got = parse_cicp(buf)            # unparseable walk: fallback engages
    assert got is not None and got[1] == 16


def test_parse_cicp_prefers_color_trak_over_alpha_trak():
    """Animated path (ADVICE r3 #2): the moov scan must read the COLOR
    track's stsd colr, not the first 'colrnclx' in moov — an alpha/aux
    track (tref/auxl) can precede the color track and carry its own nclx."""
    import struct
    from lilliput_tpu.codecs.avif import parse_cicp

    def box(typ, payload):
        return struct.pack(">I", 8 + len(payload)) + typ + payload

    def colr(p, t, m):
        return box(b"colr", b"nclx" + struct.pack(">HHH", p, t, m) + b"\x80")

    def trak(nclx, aux):
        stsd = box(b"stsd", b"\x00" * 4 + struct.pack(">I", 1) + nclx)
        stbl = box(b"stbl", stsd)
        minf = box(b"minf", stbl)
        hdlr = box(b"hdlr", b"\x00" * 8 + b"pict" + b"\x00" * 12)
        mdia = box(b"mdia", hdlr + minf)
        tref = box(b"tref", box(b"auxl", struct.pack(">I", 1))) if aux \
            else b""
        return box(b"trak", tref + mdia)

    # alpha track FIRST, claiming PQ (transfer 16); color track sRGB-ish
    alpha = trak(colr(9, 16, 9), aux=True)
    color = trak(colr(1, 13, 6), aux=False)
    moov = box(b"moov", alpha + color)
    ftyp = box(b"ftyp", b"avis" + b"\x00" * 4 + b"avis")
    assert parse_cicp(ftyp + moov) == (1, 13, 6, 1)
    # color track first: unchanged
    assert parse_cicp(ftyp + box(b"moov", color + alpha)) == (1, 13, 6, 1)
    # only an alpha track: the moov-wide fallback still surfaces its nclx
    assert parse_cicp(ftyp + box(b"moov", alpha)) == (9, 16, 9, 1)


# ---------------------------------------------------------------------------
# Own SDR decode path (VERDICT r4 #3): ISOBMFF walk + dav1d + libyuv-exact
# YUV->BGR must be BIT-IDENTICAL to the PIL/libavif oracle. PIL is only the
# oracle + LILLIPUT_AVIF=pil escape hatch from this round on.

def _decode_all(buf, monkeypatch, mode):
    monkeypatch.setenv("LILLIPUT_AVIF", mode)
    d = AvifDecoder(buf)
    h = d.header()
    frames = []
    for _ in range(h.num_frames):
        fb = Framebuffer()
        d.decode_to(fb)
        frames.append(np.asarray(fb.array).copy())
    icc = d.icc()
    d.close()
    return h, frames, icc


@pytest.mark.parametrize("name", ["paris_icc_exif_xmp.avif",
                                  "colors_sdr_srgb.avif",
                                  "spinning-globe-unknown-loop-count.avif",
                                  "colors-animated-8bpc-alpha-exif-xmp.avif"])
def test_native_sdr_decode_bit_exact_vs_pil(name, monkeypatch):
    """Every corpus SDR fixture — 4:4:4 full-range, 4:2:0 limited-range
    odd-dims inter-coded animation, alpha track animation — decodes
    bit-identically on the own path, with matching header metadata and
    ICC bytes."""
    buf = open(f"{TD}/{name}", "rb").read()
    hn, fn, iccn = _decode_all(buf, monkeypatch, "native")
    hp, fp, iccp = _decode_all(buf, monkeypatch, "pil")
    assert (hn.width, hn.height, hn.channels, int(hn.orientation),
            hn.num_frames) == (hp.width, hp.height, hp.channels,
                               int(hp.orientation), hp.num_frames)
    assert iccn == iccp
    assert len(fn) == len(fp)
    for a, b in zip(fn, fp):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("case", [
    ("4:2:0", (64, 66, 3)), ("4:2:0", (61, 67, 3)),
    ("4:2:2", (40, 42, 3)), ("4:2:2", (41, 45, 3)),
    ("4:4:4", (33, 35, 3)), ("4:0:0", (30, 34)),
    ("4:2:0", (32, 36, 4)),
], ids=["420even", "420odd", "422even", "422odd", "444odd", "mono",
        "alpha420"])
def test_native_sdr_synthesized_bit_exact(case, monkeypatch):
    """Synthesized coverage of every subsampling/parity/alpha combination
    the libyuv-exact conversion handles (yuv_rgb.py rules were pinned
    from these shapes)."""
    sub, shape = case
    rng = np.random.default_rng(hash(case[0] + str(shape)) % 2**32)
    img = rng.integers(0, 256, shape, np.uint8)
    b = io.BytesIO()
    PIL_Image.fromarray(img).save(b, "AVIF", quality=85, subsampling=sub,
                                  speed=10)
    buf = b.getvalue()
    _, fn, _ = _decode_all(buf, monkeypatch, "native")
    _, fp, _ = _decode_all(buf, monkeypatch, "pil")
    np.testing.assert_array_equal(fn[0], fp[0])


def test_native_decode_uses_no_pil(monkeypatch):
    """The own path must not touch PIL at all on a healthy SDR decode
    (PIL demoted to escape hatch, reference avif.cpp:255-601 parity)."""
    import lilliput_tpu.codecs.avif as AV
    monkeypatch.setenv("LILLIPUT_AVIF", "native")

    def boom(*a, **k):
        raise AssertionError("PIL touched on the native path")

    monkeypatch.setattr(AV, "_PILImage", type("X", (), {"open": boom}))
    buf = open(f"{TD}/spinning-globe-unknown-loop-count.avif", "rb").read()
    d = AvifDecoder(buf)
    h = d.header()
    assert h.num_frames == 72
    fb = Framebuffer()
    d.decode_to(fb)
    assert fb.to_numpy().shape == (545, 545, 3)
    assert d.icc() == b""
    d.close()


@pytest.mark.parametrize("name", ["spinning-globe-unknown-loop-count.avif",
                                  "colors-animated-8bpc-alpha-exif-xmp.avif"])
def test_skip_frame_keeps_animated_stream_in_sync(name, monkeypatch):
    """skip_frame must consume a native stream frame exactly when
    decode_to would — INCLUDING before the first decode (regression:
    gating the consume on self._cdec shifted every later frame by the
    number of leading skips: skip+decode returned frame 0's pixels as
    frame 1). Skips are also exercised mid-stream and on the alpha-track
    fixture."""
    monkeypatch.setenv("LILLIPUT_AVIF", "native")
    buf = open(f"{TD}/{name}", "rb").read()

    ref = AvifDecoder(buf)
    want = []
    for _ in range(4):
        fb = Framebuffer()
        ref.decode_to(fb)
        want.append(np.asarray(fb.array).copy())
    ref.close()

    d = AvifDecoder(buf)
    d.skip_frame()                       # leading skip (pre-first-decode)
    fb = Framebuffer()
    d.decode_to(fb)
    np.testing.assert_array_equal(np.asarray(fb.array), want[1])
    d.skip_frame()                       # mid-stream skip
    fb2 = Framebuffer()
    d.decode_to(fb2)
    np.testing.assert_array_equal(np.asarray(fb2.array), want[3])
    d.close()


def test_yuv_rgb_cpp_matches_python_reference(monkeypatch):
    """The C++ conversion kernel (native/src/yuv_bgr.cpp) must stay
    bit-identical to the Python reference in yuv_rgb.py across every
    subsampling/parity/range/matrix combination — the jp2_t1 pattern:
    C++ for speed, Python as the pinned reference, test as the gate."""
    from lilliput_tpu.codecs.yuv_rgb import yuv_to_bgr_u8
    rng = np.random.default_rng(11)
    cases = []
    for (h, w) in ((16, 16), (17, 19), (31, 33), (8, 64)):
        chh, cwh = (h + 1) // 2, (w + 1) // 2
        y = rng.integers(0, 256, (h, w), np.uint8)
        a = rng.integers(0, 256, (h, w), np.uint8)
        cases += [
            ("420", y, rng.integers(0, 256, (chh, cwh), np.uint8),
             rng.integers(0, 256, (chh, cwh), np.uint8), a),
            ("422", y, rng.integers(0, 256, (h, cwh), np.uint8),
             rng.integers(0, 256, (h, cwh), np.uint8), None),
            ("444", y, rng.integers(0, 256, (h, w), np.uint8),
             rng.integers(0, 256, (h, w), np.uint8), a),
            ("mono", y, None, None, None),
            ("identity", y, rng.integers(0, 256, (h, w), np.uint8),
             rng.integers(0, 256, (h, w), np.uint8), a),
        ]
    for name, y, u, v, a in cases:
        h, w = y.shape
        combos = ([(0, True)] if name == "identity" else
                  [(1, True), (1, False), (5, False), (6, True),
                   (9, False), (2, True)])
        for matrix, fr in combos:
            monkeypatch.setenv("LILLIPUT_YUV_RGB", "py")
            ref = yuv_to_bgr_u8(y, u, v, matrix, fr, h, w, alpha=a)
            monkeypatch.setenv("LILLIPUT_YUV_RGB", "native")
            got = yuv_to_bgr_u8(y, u, v, matrix, fr, h, w, alpha=a)
            np.testing.assert_array_equal(
                got, ref, err_msg=f"{name} m{matrix} fr{fr} {h}x{w}")


# ---------------------------------------------------------------------------
# High-bit-depth SDR decode (round 5): the own path covers 10/12-bit
# planes bit-identically to PIL/libavif 1.3 (libyuv 1909). Fixtures are
# synthesized losslessly at arbitrary depth/subsampling/matrix/range via
# the aom shim (avif_enc.encode_still_hbd), so the comparison pins ONLY
# the YUV->BGR conversion ruleset (yuv_rgb.planes_to_bgr_u8 docstring).
# ---------------------------------------------------------------------------

def _hbd_fixture(depth, sub, full, matrix, use_alpha, h=33, w=47, seed=7,
                 primaries=1):
    from lilliput_tpu.codecs import avif_enc as E
    rng = np.random.default_rng(seed)
    mx = (1 << depth) - 1
    dt = np.uint16 if depth > 8 else np.uint8
    y = rng.integers(0, mx + 1, (h, w)).astype(dt)
    if sub == "mono":
        u = v = None
    elif sub == "identity":
        u = rng.integers(0, mx + 1, (h, w)).astype(dt)
        v = rng.integers(0, mx + 1, (h, w)).astype(dt)
    else:
        cs = {"420": ((h + 1) // 2, (w + 1) // 2),
              "422": (h, (w + 1) // 2), "444": (h, w)}[sub]
        u = rng.integers(0, mx + 1, cs).astype(dt)
        v = rng.integers(0, mx + 1, cs).astype(dt)
    a = rng.integers(0, mx + 1, (h, w)).astype(dt) if use_alpha else None
    m = 0 if sub == "identity" else matrix
    return E.encode_still_hbd(y, u, v, depth, matrix=m,
                              full_range=full, alpha=a,
                              primaries=primaries)


# one case per pinned rule branch (depth, sub, full_range, matrix, alpha)
_HBD_CASES = [
    (10, "420", True, 1, True),    # 10-bit alpha kernel, bilinear@10
    (10, "420", False, 9, True),   # ... limited 2020 (YG=19003)
    (10, "422", True, 5, True),    # 10-bit 4:2:2 alpha kernel
    (10, "444", False, 1, True),   # 10-bit 4:4:4 alpha kernel
    (12, "420", True, 1, True),    # I012: nearest upsample, round alpha
    (12, "420", False, 9, True),
    (12, "422", True, 1, True),    # 12-bit non-420 alpha: truncate all
    (12, "444", False, 9, True),
    (10, "420", False, 9, False),  # no-alpha: truncate + 8-bit kernel
    (12, "444", False, 9, False),
    (12, "420", True, 2, False),   # matrix 2 (unspecified -> 601)
    (10, "mono", True, 1, False),  # mono rational (round half-up)
    (12, "mono", False, 1, False),
    (10, "mono", False, 1, True),  # mono w/ alpha: trunc + round alpha
    (10, "identity", True, 0, True),   # GBR: round-scale channels
    (12, "identity", True, 0, False),
    (8, "420", False, 9, True),    # 8-bit 2020-limited (YG fix)
    (8, "mono", False, 1, False),  # 8-bit mono-limited (rational fix)
]


@pytest.mark.parametrize(
    "depth,sub,full,matrix,alpha", _HBD_CASES,
    ids=[f"d{d}-{s}-{'full' if f else 'lim'}-m{m}-{'A' if a else 'noA'}"
         for d, s, f, m, a in _HBD_CASES])
def test_native_sdr_high_depth_bit_exact(depth, sub, full, matrix, alpha,
                                         monkeypatch):
    buf = _hbd_fixture(depth, sub, full, matrix, alpha)
    _, fn, _ = _decode_all(buf, monkeypatch, "native")
    _, fp, _ = _decode_all(buf, monkeypatch, "pil")
    np.testing.assert_array_equal(fn[0], fp[0])


def test_native_decode_12bit_pq_no_tonemap_bit_exact(monkeypatch):
    """Coded-signal surfacing of the 12-bit PQ corpus fixture (tone map
    off): the own path must match PIL byte-for-byte — the last runtime
    surface that previously delegated to PIL (round-4 VERDICT missing
    #1 tail)."""
    buf = open(f"{TD}/hdr_color_preservation.avif", "rb").read()

    def dec(mode):
        monkeypatch.setenv("LILLIPUT_AVIF", mode)
        d = AvifDecoder(buf, tone_mapping_enabled=False)
        fb = Framebuffer()
        d.decode_to(fb)
        out = np.asarray(fb.array).copy()
        d.close()
        return out

    np.testing.assert_array_equal(dec("native"), dec("pil"))


# matrices with no libyuv kernel: YCgCo (8) and chromaticity-derived
# NCL (12) ride libavif's built-in float path — pinned in
# yuv_rgb._builtin_float_bgr (unorm at native depth, float 9331
# upsample, derived kr/kb per primaries; matrix 12 with primaries
# {1,2,5,6,9} maps onto the fixed-point kernel families instead).
_EXOTIC_CASES = [
    (8, "420", True, 8, 1, True),      # YCgCo + alpha, 8-bit
    (10, "444", True, 8, 1, False),    # YCgCo 10-bit
    (12, "420", True, 8, 1, True),     # YCgCo 12-bit 4:2:0
    (8, "444", True, 12, 12, False),   # derived NCL, P3 primaries
    (12, "422", True, 12, 12, True),   # derived NCL high depth + alpha
    (8, "444", True, 12, 10, False),   # XYZ primaries -> kr=kb=0
    (10, "420", True, 12, 1, True),    # m12 family-mapped to 709 kernel
    (8, "444", False, 12, 5, False),   # m12 family-mapped 601, limited
    (10, "mono", False, 12, 12, True),  # built-in gray + round alpha
]


@pytest.mark.parametrize(
    "depth,sub,full,matrix,prim,alpha", _EXOTIC_CASES,
    ids=[f"d{d}-{s}-{'full' if f else 'lim'}-m{m}-p{p}-{'A' if a else 'noA'}"
         for d, s, f, m, p, a in _EXOTIC_CASES])
def test_native_sdr_exotic_matrix_bit_exact(depth, sub, full, matrix,
                                            prim, alpha, monkeypatch):
    buf = _hbd_fixture(depth, sub, full, matrix, alpha, primaries=prim)
    _, fn, _ = _decode_all(buf, monkeypatch, "native")
    _, fp, _ = _decode_all(buf, monkeypatch, "pil")
    np.testing.assert_array_equal(fn[0], fp[0])


@pytest.mark.parametrize("geom", [(1, 7, 8, False), (1, 6, 8, True),
                                  (7, 1, 8, False), (1, 1, 8, False),
                                  (1, 9, 10, True)],
                         ids=lambda g: f"{g[0]}x{g[1]}-d{g[2]}" +
                                       ("-A" if g[3] else ""))
def test_native_sdr_degenerate_geometry_bit_exact(geom, monkeypatch):
    """Width-1 / height-1 4:2:0: dav1d's chroma plane has cw == w == 1
    (or ch == h == 1), so subsampling must be classified by BOTH axes —
    the old cw-only heuristic sent width-1 4:2:0 down the 4:4:4 path,
    which read chroma rows past the plane in the C kernel
    (ASan-confirmed, fixed) and crashed the numpy reference."""
    w, h, depth, alpha = geom
    buf = _hbd_fixture(depth, "420", True, 1, alpha, h=h, w=w)
    _, fn, _ = _decode_all(buf, monkeypatch, "native")
    _, fp, _ = _decode_all(buf, monkeypatch, "pil")
    np.testing.assert_array_equal(fn[0], fp[0])


def test_ycgco_limited_rejected_like_libavif(monkeypatch):
    """Limited-range YCgCo fails in libavif's reformat ('Reformat
    failed'); the own path declines it so the PIL fallback raises the
    same way — error parity, not a silent wrong decode."""
    buf = _hbd_fixture(8, "420", False, 8, False)
    monkeypatch.setenv("LILLIPUT_AVIF", "native")
    d = AvifDecoder(buf)
    fb = Framebuffer()
    with pytest.raises(Exception):
        d.decode_to(fb)
    d.close()
