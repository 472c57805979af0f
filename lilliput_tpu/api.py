"""Public API: format sniffing and decoder/encoder construction.

Mirrors /root/reference/lilliput.go:100-202: magic-byte dispatch for
GIF/WebP/AVIF/PNG/JPEG, MP4/MOV fallback through the video decoder, and
extension-based encoder selection (.mp4/.webm rejected).
"""

from __future__ import annotations

from typing import Optional

from .errors import InvalidImageError
from .interfaces import Decoder, Encoder

_GIF87 = b"GIF87a"
_GIF89 = b"GIF89a"
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def is_gif(buf: bytes) -> bool:
    return buf.startswith(_GIF87) or buf.startswith(_GIF89)


def is_webp(buf: bytes) -> bool:
    return len(buf) >= 12 and buf.startswith(b"RIFF") and buf[8:12] == b"WEBP"


def is_avif(buf: bytes) -> bool:
    return len(buf) >= 12 and buf[4:8] == b"ftyp" and buf[8:12] in (b"avif", b"avis")


def is_mp4(buf: bytes) -> bool:
    return len(buf) >= 12 and (buf[4:12] == b"ftypmp42" or buf[4:12] == b"ftypisom")


def is_png(buf: bytes) -> bool:
    return buf.startswith(_PNG_MAGIC)


def is_jpeg(buf: bytes) -> bool:
    return len(buf) >= 3 and buf[0] == 0xFF and buf[1] == 0xD8 and buf[2] == 0xFF


def is_jpeg2000(buf: bytes) -> bool:
    # single source of truth for the JP2/J2K magic: the codec module
    from .codecs.jp2 import is_jp2
    return is_jp2(buf)


def new_decoder(buf: bytes, tone_mapping_enabled: bool = True) -> Decoder:
    """Sniff magic bytes and return the right Decoder (lilliput.go:129-164)."""
    if len(buf) == 0:
        raise InvalidImageError("empty buffer")
    if is_gif(buf):
        from .codecs.gif import GifDecoder
        return GifDecoder(buf)
    if is_webp(buf):
        from .codecs.webp import WebpDecoder
        return WebpDecoder(buf)
    if is_avif(buf):
        from .codecs.avif import AvifDecoder
        return AvifDecoder(buf, tone_mapping_enabled)
    if is_jpeg(buf):
        from .codecs.jpeg import JpegDecoder
        return JpegDecoder(buf)
    if is_png(buf):
        from .codecs.png import PngDecoder
        return PngDecoder(buf)
    if buf[:2] == b"BM":
        # OpenCV-fallthrough format (reference decodes BMP via grfmt_bmp)
        from .codecs.bmp import BmpDecoder
        return BmpDecoder(buf)
    from .codecs.pnm import is_pam, is_pnm
    if is_pnm(buf):
        # OpenCV-fallthrough format (netpbm via grfmt_pxm)
        from .codecs.pnm import PnmDecoder
        return PnmDecoder(buf)
    if is_pam(buf):
        # OpenCV-fallthrough format (PAM/P7 via grfmt_pam)
        from .codecs.pnm import PamDecoder
        return PamDecoder(buf)
    from .codecs.sunras import is_sunras
    if is_sunras(buf):
        # OpenCV-fallthrough format (Sun Raster via grfmt_sunras)
        from .codecs.sunras import SunRasDecoder
        return SunRasDecoder(buf)
    from .codecs.hdr import is_hdr
    if is_hdr(buf):
        # OpenCV-fallthrough format (Radiance HDR via grfmt_hdr)
        from .codecs.hdr import HdrDecoder
        return HdrDecoder(buf)
    from .codecs.pfm import is_pfm
    if is_pfm(buf):
        # OpenCV-fallthrough format (PFM via grfmt_pfm)
        from .codecs.pfm import PfmDecoder
        return PfmDecoder(buf)
    if is_jpeg2000(buf):
        # the reference compiles OpenJPEG into its OpenCV
        # (deps/build-deps-linux.sh:289); codecs/jp2.py is this
        # framework's own baseline decoder. Unsupported J2K features
        # raise typed, specific InvalidImageErrors from within.
        from .codecs.jp2 import Jp2Decoder
        return Jp2Decoder(buf)
    # fall through to the video/audio probe (ffmpeg shim)
    from .codecs.video import VideoDecoder
    try:
        return VideoDecoder(buf)
    except Exception as e:
        raise InvalidImageError("unrecognized image format") from e


def new_encoder(ext: str, decoded_by: Optional[Decoder] = None,
                icc_override: Optional[bytes] = None) -> Encoder:
    """Extension-based encoder dispatch (lilliput.go:180-202)."""
    e = ext.lower()
    if e == ".gif":
        from .codecs.gif import GifEncoder
        return GifEncoder(decoded_by, icc_override=icc_override)
    if e == ".webp":
        from .codecs.webp import WebpEncoder
        return WebpEncoder(decoded_by, icc_override=icc_override)
    if e == ".avif":
        from .codecs.avif import AvifEncoder
        return AvifEncoder(decoded_by, icc_override=icc_override)
    if e in (".mp4", ".webm"):
        raise InvalidImageError("Encoder cannot encode into video types")
    if e == ".thumbhash":
        from .codecs.thumbhash import ThumbhashEncoder
        return ThumbhashEncoder(decoded_by)
    if e in (".jpg", ".jpeg"):
        from .codecs.jpeg import JpegEncoder
        return JpegEncoder(decoded_by, icc_override=icc_override)
    if e == ".png":
        from .codecs.png import PngEncoder
        return PngEncoder(decoded_by, icc_override=icc_override)
    if e == ".bmp":
        from .codecs.bmp import BmpEncoder
        return BmpEncoder(decoded_by, icc_override=icc_override)
    if e in (".pbm", ".pgm", ".ppm", ".pnm"):
        from .codecs.pnm import PnmEncoder
        return PnmEncoder(decoded_by, icc_override=icc_override, subtype=e)
    if e == ".pam":
        from .codecs.pnm import PamEncoder
        return PamEncoder(decoded_by, icc_override=icc_override)
    if e in (".jp2", ".j2k"):
        from .codecs.jp2 import Jp2Encoder
        return Jp2Encoder(decoded_by, icc_override=icc_override)
    if e in (".sr", ".ras"):
        from .codecs.sunras import SunRasEncoder
        return SunRasEncoder(decoded_by, icc_override=icc_override)
    if e == ".hdr":
        from .codecs.hdr import HdrEncoder
        return HdrEncoder(decoded_by, icc_override=icc_override)
    if e == ".pfm":
        from .codecs.pfm import PfmEncoder
        return PfmEncoder(decoded_by, icc_override=icc_override)
    raise InvalidImageError(f"unsupported output type {ext!r}")
