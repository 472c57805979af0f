#!/usr/bin/env python3
"""Native-stage integrity manifest — the analog of the reference's
deps/verify_deps.py (SHA-256 manifest over its vendored prebuilts,
/root/reference/deps/verify_deps.py:1-176).

This build links SYSTEM codec libraries instead of vendored .a archives,
so the manifest covers what is actually ours to pin:

  * sha256 of every C++ source + the Makefile (drift means the checked-in
    recipe no longer matches what produced the .so),
  * the C ABI the Python binding depends on (exported lp_* symbols),
  * the sonames of the system libraries the shared object links.

Usage:
    python tools/verify_native.py --generate   # write native/manifest.json
    python tools/verify_native.py              # verify, exit 1 on mismatch
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NATIVE = os.path.join(ROOT, "lilliput_tpu", "native")
MANIFEST = os.path.join(NATIVE, "manifest.json")
SO = os.path.join(NATIVE, "build", "liblilliput_host.so")


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 16), b""):
            h.update(chunk)
    return h.hexdigest()


def _sources() -> dict:
    out = {"Makefile": _sha256(os.path.join(NATIVE, "Makefile"))}
    src = os.path.join(NATIVE, "src")
    for name in sorted(os.listdir(src)):
        if name.endswith((".cpp", ".hpp", ".h")):
            out[f"src/{name}"] = _sha256(os.path.join(src, name))
    return out


def _exported_symbols() -> list:
    res = subprocess.run(["nm", "-D", "--defined-only", SO],
                         capture_output=True, text=True, check=True)
    syms = re.findall(r"\sT\s+(lp_\w+)", res.stdout)
    return sorted(set(syms))


def _linked_sonames() -> list:
    res = subprocess.run(["ldd", SO], capture_output=True, text=True,
                         check=True)
    names = re.findall(r"^\s*(lib[\w.+-]+\.so[\w.]*)", res.stdout, re.M)
    keep = ("jpeg", "webp", "avformat", "avcodec", "avutil", "swscale", "z",
            "deflate")
    return sorted(n for n in names
                  if any(n.startswith(f"lib{k}") for k in keep))


def build_manifest() -> dict:
    if not os.path.exists(SO):
        subprocess.run(["make", "-C", NATIVE, "-j4"], check=True,
                       capture_output=True)
    return {
        "sources": _sources(),
        "abi_symbols": _exported_symbols(),
        "linked_sonames": _linked_sonames(),
    }


def verify() -> int:
    with open(MANIFEST) as f:
        want = json.load(f)
    have = build_manifest()
    rc = 0
    for path, digest in want["sources"].items():
        got = have["sources"].get(path)
        if got != digest:
            print(f"MISMATCH source {path}: {digest[:12]} != "
                  f"{(got or 'missing')[:12]}")
            rc = 1
    for extra in set(have["sources"]) - set(want["sources"]):
        print(f"UNMANIFESTED source {extra}")
        rc = 1
    missing_syms = set(want["abi_symbols"]) - set(have["abi_symbols"])
    if missing_syms:
        print(f"MISSING ABI symbols: {sorted(missing_syms)}")
        rc = 1
    missing_libs = set(want["linked_sonames"]) - set(have["linked_sonames"])
    if missing_libs:
        print(f"MISSING linked libraries: {sorted(missing_libs)}")
        rc = 1
    print("native manifest OK" if rc == 0 else "native manifest FAILED")
    return rc


def main() -> int:
    if "--generate" in sys.argv:
        manifest = build_manifest()
        with open(MANIFEST, "w") as f:
            json.dump(manifest, f, indent=1, sort_keys=True)
            f.write("\n")
        print(f"wrote {MANIFEST}: {len(manifest['sources'])} sources, "
              f"{len(manifest['abi_symbols'])} symbols, "
              f"{len(manifest['linked_sonames'])} libraries")
        return 0
    return verify()


if __name__ == "__main__":
    sys.exit(main())
