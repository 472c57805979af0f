"""ctypes loader for the host-side native library (liblilliput_host.so).

The native layer holds the serial entropy stages (JPEG Huffman via
libjpeg-turbo, GIF LZW, WebP/ffmpeg container+codec shims) — the analog of the
reference's cgo shim layer (SURVEY.md L2/L3), but with the dense compute
removed to the TPU. Built on demand with make; loading is lazy so pure-device
code paths work without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "liblilliput_host.so")

_lock = threading.Lock()
_lib = None


class NativeUnavailableError(RuntimeError):
    pass


def _configure(lib: ctypes.CDLL) -> None:
    c = ctypes
    u8p, i16p, u16p, i32p = (c.POINTER(c.c_uint8), c.POINTER(c.c_int16),
                             c.POINTER(c.c_uint16), c.POINTER(c.c_int32))
    lib.lp_jpeg_get_info.argtypes = [u8p, c.c_size_t, c.c_void_p]
    lib.lp_jpeg_get_info.restype = c.c_int
    lib.lp_jpeg_decode_coefs.argtypes = [u8p, c.c_size_t, c.POINTER(i16p), u16p, u8p, c.c_int32]
    lib.lp_jpeg_decode_coefs.restype = c.c_int
    lib.lp_jpeg_encode_coefs.argtypes = [
        c.c_int32, c.c_int32, c.c_int32, i32p, i32p, c.POINTER(i16p),
        u16p, u16p, c.c_int32, c.c_int32, c.c_int32, u8p, c.c_int32,
        u8p, c.c_size_t]
    lib.lp_jpeg_encode_coefs.restype = c.c_long
    lib.lp_jpeg_decode_coefs_parallel.argtypes = [
        u8p, c.c_size_t, c.POINTER(i16p), u16p, c.c_int32]
    lib.lp_jpeg_decode_coefs_parallel.restype = c.c_int
    lib.lp_jpeg_decode_coefs_fast.argtypes = [
        u8p, c.c_size_t, c.POINTER(i16p), u16p, c.c_int32]
    lib.lp_jpeg_decode_coefs_fast.restype = c.c_int
    lib.lp_jpeg_decode_coefs_win.argtypes = [
        u8p, c.c_size_t, c.POINTER(i16p), u16p, c.c_int32, i32p]
    lib.lp_jpeg_decode_coefs_win.restype = c.c_int
    lib.lp_jpeg_scale_qtable.argtypes = [u16p, c.c_int32, c.c_int32, u16p]
    lib.lp_jpeg_scale_qtable.restype = None
    _configure_optional(lib)


def _configure_optional(lib: ctypes.CDLL) -> None:
    """Signatures for shims that may be compiled in later (gif, webp, video)."""
    c = ctypes
    for name, argtypes, restype in _OPTIONAL_SIGS:
        try:
            fn = getattr(lib, name)
        except AttributeError:
            continue
        fn.argtypes = argtypes
        fn.restype = restype


_OPTIONAL_SIGS: list = []  # populated by codec modules via register_signature


def register_signature(name, argtypes, restype):
    """Codec modules declare their native signatures before first load()."""
    _OPTIONAL_SIGS.append((name, argtypes, restype))
    global _lib
    if _lib is not None:
        try:
            fn = getattr(_lib, name)
            fn.argtypes = argtypes
            fn.restype = restype
        except AttributeError:
            pass


def build() -> None:
    subprocess.run(["make", "-C", _NATIVE_DIR, "-j4"], check=True,
                   capture_output=True, text=True)


def load() -> ctypes.CDLL:
    global _lib
    if _lib is not None:
        return _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_LIB_PATH):
            try:
                build()
            except (subprocess.CalledProcessError, FileNotFoundError) as e:
                raise NativeUnavailableError(f"cannot build native library: {e}") from e
        lib = ctypes.CDLL(_LIB_PATH)
        _configure(lib)
        _lib = lib
        return _lib


def available() -> bool:
    try:
        load()
        return True
    except NativeUnavailableError:
        return False
