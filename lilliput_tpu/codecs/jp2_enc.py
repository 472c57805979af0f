"""First-party JPEG 2000 encoder (JP2 container + J2K codestream),
ISO/IEC 15444-1 — the encode half of codecs/jp2.py, written from the
spec like the decoder.

Replaces the PIL/OpenJPEG delegation the round-3 build shipped (the
reference encodes .jp2 through cv::ImageEncoder's OpenJPEG writer,
/root/reference/opencv.cpp:93-102, built at
deps/build-deps-linux.sh:289): lossless 5/3 output round-trips
BIT-EXACTLY through our own decoder AND through OpenJPEG itself
(cv2/PIL decode oracles in tests/test_jp2_enc.py), with no PIL on the
encode path.

Architecture split (SURVEY stance): forward DWT / MCT are the dense
vectorized stages (ops/wavelet.py); EBCOT Tier-1 is serial entropy on
the host (C++ native/src/jp2_t1.cpp with the pure-Python reference in
jp2_t1.py); this module is the Tier-2 packet assembly + marker layer.

It is also the fixture generator for the decoder's exotic-style
coverage: bypass/termall/vsc/reset/segsym codeblock styles, PPT packed
headers, precincts, subsampled components, and ROI shifts can all be
emitted here and cross-checked against OpenJPEG's decoder.
"""

from __future__ import annotations

import math
import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np

from ..errors import InvalidImageError
from . import jp2_t1
from .jp2 import band_geometry, _ceil_div

# codeblock-style bits (SPcod byte 4, Table A.19)
STY_LAZY = 0x01     # selective arithmetic coding bypass
STY_RESET = 0x02    # context reset on each pass
STY_TERMALL = 0x04  # termination on each pass
STY_VSC = 0x08      # vertically stripe-causal contexts
STY_PTERM = 0x10    # predictable termination
STY_SEGSYM = 0x20   # segmentation symbols


class _BitWriter:
    """Packet-header bit writer with 0xFF stuffing — mirror of
    jp2.py's _BitReader (B.10.1)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0
        self.last = 0

    def _cap(self) -> int:
        return 7 if self.last == 0xFF else 8

    def bit(self, b: int):
        self.acc = (self.acc << 1) | (b & 1)
        self.nacc += 1
        if self.nacc == self._cap():
            self.out.append(self.acc)
            self.last = self.acc
            self.acc = 0
            self.nacc = 0

    def write(self, v: int, n: int):
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def align(self):
        """Pad to byte boundary; emit the stuffing byte after a final
        0xFF like the reader's align consumes (B.10.1)."""
        if self.nacc:
            self.acc <<= self._cap() - self.nacc
            self.out.append(self.acc)
            self.last = self.acc
            self.acc = 0
            self.nacc = 0
        if self.last == 0xFF:
            self.out.append(0)
            self.last = 0

    def data(self) -> bytes:
        return bytes(self.out)


class _TagTreeEnc:
    """Tag-tree encoder (B.10.2) — exact dual of jp2.py's _TagTree
    decoder: same node walk, emitting the bits it consumes."""

    def __init__(self, w: int, h: int, leaves: np.ndarray):
        self.levels = []
        while True:
            self.levels.append((w, h))
            if w == 1 and h == 1:
                break
            w, h = (w + 1) // 2, (h + 1) // 2
        self.value = []
        cur = np.asarray(leaves, np.int64)
        for (w_, h_) in self.levels:
            if cur.shape != (h_, w_):
                raise ValueError("tag tree leaf shape mismatch")
            self.value.append(cur)
            if w_ == 1 and h_ == 1:
                break
            ph, pw = (h_ + 1) // 2, (w_ + 1) // 2
            nxt = np.full((ph, pw), np.iinfo(np.int64).max, np.int64)
            for yy in range(h_):
                for xx in range(w_):
                    nxt[yy // 2, xx // 2] = min(nxt[yy // 2, xx // 2],
                                                cur[yy, xx])
            cur = nxt
        self.low = [np.zeros((h_, w_), np.int64) for (w_, h_) in self.levels]
        self.known = [np.zeros((h_, w_), np.uint8)
                      for (w_, h_) in self.levels]

    def encode(self, bw: _BitWriter, x: int, y: int, threshold: int):
        stack = []
        xx, yy = x, y
        for lv in range(len(self.levels)):
            stack.append((lv, xx, yy))
            xx, yy = xx // 2, yy // 2
        low = 0
        for lv, xx, yy in reversed(stack):
            if self.low[lv][yy, xx] < low:
                self.low[lv][yy, xx] = low
            while (not self.known[lv][yy, xx]
                   and self.low[lv][yy, xx] < threshold):
                if self.low[lv][yy, xx] == self.value[lv][yy, xx]:
                    bw.bit(1)
                    self.known[lv][yy, xx] = 1
                else:
                    bw.bit(0)
                    self.low[lv][yy, xx] += 1
            if self.known[lv][yy, xx]:
                low = int(self.value[lv][yy, xx])
            else:
                return  # threshold reached without resolving — decoder
                # stops here too ("value >= threshold")


class _EncBlock:
    __slots__ = ("x0", "y0", "x1", "y1", "segs", "numpasses",
                 "zero_planes", "lblock")

    def __init__(self, x0, y0, x1, y1):
        self.x0, self.y0, self.x1, self.y1 = x0, y0, x1, y1
        self.segs: List[Tuple[bytes, int]] = []  # (data, passes)
        self.numpasses = 0
        self.zero_planes = 0
        self.lblock = 3


def _write_numpasses(bw: _BitWriter, np_: int):
    """B.10.6 — mirror of the decoder's read."""
    if np_ == 1:
        bw.bit(0)
    elif np_ == 2:
        bw.bit(1)
        bw.bit(0)
    elif np_ <= 5:
        bw.write(0b11, 2)
        bw.write(np_ - 3, 2)
    elif np_ <= 36:
        bw.write(0b1111, 4)
        bw.write(np_ - 6, 5)
    elif np_ <= 164:
        bw.write(0b111111111, 9)
        bw.write(np_ - 37, 7)
    else:
        raise InvalidImageError("JPEG 2000: > 164 coding passes")


def _grid_dims(bx0, by0, bx1, by1, cbw_exp, cbh_exp):
    if bx1 <= bx0 or by1 <= by0:
        return 0, 0, 0, 0
    cbw, cbh = 1 << cbw_exp, 1 << cbh_exp
    cgx0, cgx1 = bx0 // cbw, _ceil_div(bx1, cbw)
    cgy0, cgy1 = by0 // cbh, _ceil_div(by1, cbh)
    return cgx0, cgy0, cgx1 - cgx0, cgy1 - cgy0


def _build_bands(tile_rect, levels, cbw_e, cbh_e):
    """Per resolution: list of (orient, rect, grid origin+dims) for the
    whole-tile-precinct layout (precinct exponent 15)."""
    geo = band_geometry(*tile_rect, levels)
    out = []
    for r, (rrect, bands) in enumerate(geo):
        binfo = []
        for orient, bx0, by0, bx1, by1 in bands:
            cbw_exp = cbw_e if r else cbw_e  # precinct 15 never clamps
            binfo.append((orient, (bx0, by0, bx1, by1),
                          _grid_dims(bx0, by0, bx1, by1, cbw_exp, cbh_e)))
        out.append((rrect, binfo))
    return out


_BAND_CTX = (0, 1, 0, 2)  # orient -> T1 context family (LL/LH, HL, HH)
_BAND_GAIN = (0, 1, 1, 2)


def _t1_encode(coefs, orient, mb, style=0):
    """Dispatch one codeblock to the native Tier-1 encoder when
    available, else the pure-Python reference. Returns
    (segments [(bytes, passes)], numpasses, zero_planes)."""
    data, numpasses, zp = jp2_t1.encode_codeblock(
        coefs, _BAND_CTX[orient], mb, style)
    return data, numpasses, zp


def forward_tile_planes(planes, tile_rect, levels, reversible):
    """Forward DWT pyramid for one tile-component: returns per-res
    band arrays [{orient: array}] matching band_geometry rects."""
    from ..ops import wavelet as W
    geo = band_geometry(*tile_rect, levels)
    res_bands: List[dict] = [dict() for _ in range(levels + 1)]
    cur = planes
    for d in range(levels):
        r = levels - d          # resolution whose H-bands this step makes
        rrect = geo[r][0] if r < len(geo) else tile_rect
        # rect of the CURRENT ll (resolution r coordinates)
        ll, hl, lh, hh = W.forward_dwt_level(cur, rrect, reversible)
        res_bands[r][1] = hl
        res_bands[r][2] = lh
        res_bands[r][3] = hh
        cur = ll
    res_bands[0][0] = cur
    return res_bands


def _quantize_band(arr, reversible, depth, gain, eps, mu):
    if reversible:
        return np.asarray(arr, np.int64)
    rb = depth + gain
    delta = 2.0 ** (rb - eps) * (1.0 + mu / 2048.0)
    a = np.asarray(arr, np.float64) / delta
    return (np.sign(a) * np.floor(np.abs(a))).astype(np.int64)


class _TileEncoder:
    def __init__(self, comp_planes, comp_rects, cod, qparams, depths,
                 comp_styles, roi=None, roi_shifts=None):
        """comp_planes: per-component int64/float64 arrays covering
        comp_rects[c] (post level-shift + MCT, component grid).
        qparams: per component a list of (eps, mu) per band index (QCD
        order). depths: SIZ component depths (dequant Rb uses these —
        jp2.py:602). comp_styles: SPcod/SPcoc style byte per
        component. roi: (x0, y0, x1, y1) image-grid rect whose wavelet
        coefficients get the maxshift ROI upshift roi_shifts[c]."""
        self.cod = cod
        levels = cod["levels"]
        self.ncomp = len(comp_planes)
        self.comps = []
        guard = cod["guard"]
        reversible = cod["transform"] == 1
        for c, plane in enumerate(comp_planes):
            tile_rect = comp_rects[c]
            shift = roi_shifts[c] if roi_shifts else 0
            bands_per_res = forward_tile_planes(
                plane, tile_rect, levels, reversible)
            geo = _build_bands(tile_rect, levels, cod["cbw_e"],
                               cod["cbh_e"])
            res_list = []
            for r, (rrect, binfo) in enumerate(geo):
                nb2 = levels - r + (1 if r else 0)
                bands = []
                for (orient, brect, grid) in binfo:
                    qi = 0 if r == 0 else 3 * (r - 1) + \
                        {1: 1, 2: 2, 3: 3}[orient]
                    eps, mu = qparams[c][qi]
                    mb = guard + eps - 1 + shift
                    arr = bands_per_res[r][orient]
                    q = _quantize_band(arr, reversible, depths[c],
                                       _BAND_GAIN[orient], eps, mu)
                    bx0, by0, bx1, by1 = brect
                    if roi and shift and q.size:
                        # maxshift: upshift coefficients whose band
                        # coords fall in the (scaled) ROI rect — any
                        # encoder-side mask is legal; the decoder
                        # recovers values by the 2^shift threshold
                        rx0, ry0, rx1, ry1 = roi
                        sbx0 = max(rx0 >> nb2, bx0)
                        sby0 = max(ry0 >> nb2, by0)
                        sbx1 = min(_ceil_div(rx1, 1 << nb2), bx1)
                        sby1 = min(_ceil_div(ry1, 1 << nb2), by1)
                        if sbx1 > sbx0 and sby1 > sby0:
                            q[sby0 - by0:sby1 - by0,
                              sbx0 - bx0:sbx1 - bx0] <<= shift
                    cgx0, cgy0, gw, gh = grid
                    cblks = []
                    cbw, cbh = 1 << cod["cbw_e"], 1 << cod["cbh_e"]
                    for gy in range(gh):
                        for gx in range(gw):
                            x0 = max((cgx0 + gx) * cbw, bx0)
                            y0 = max((cgy0 + gy) * cbh, by0)
                            x1 = min((cgx0 + gx + 1) * cbw, bx1)
                            y1 = min((cgy0 + gy + 1) * cbh, by1)
                            cb = _EncBlock(x0, y0, x1, y1)
                            coefs = q[y0 - by0:y1 - by0, x0 - bx0:x1 - bx0]
                            segs, np_, zp = _t1_encode(
                                coefs, orient, mb, comp_styles[c])
                            cb.segs = segs
                            cb.numpasses = np_
                            cb.zero_planes = zp if np_ else mb
                            cblks.append(cb)
                    bands.append({"orient": orient, "rect": brect,
                                  "grid": grid, "cblks": cblks})
                res_list.append({"rect": rrect, "bands": bands})
            self.comps.append(res_list)

    def packets(self) -> List[Tuple[bytes, bytes]]:
        """All packets of this tile in LRCP order (single layer,
        whole-tile precincts => one precinct per (r, c)), as
        (header, body) pairs so PPT/SOP/EPH assembly can split them."""
        cod = self.cod
        out = []
        for r in range(cod["levels"] + 1):
            for c in range(self.ncomp):
                res = self.comps[c][r]
                trx0, try0, trx1, try1 = res["rect"]
                if trx1 <= trx0 or try1 <= try0:
                    continue  # decoder sees nprec == 0: no packet
                out.append(self._one_packet(res))
        return out

    def _one_packet(self, res) -> Tuple[bytes, bytes]:
        bw = _BitWriter()
        styled = self.cod.get("style", 0)
        any_inc = any(cb.numpasses
                      for b in res["bands"] for cb in b["cblks"])
        if not any_inc:
            bw.bit(0)
            bw.align()
            return bw.data(), b""
        bw.bit(1)
        bodies = []
        for b in res["bands"]:
            _, _, gw, gh = b["grid"]
            if gw == 0 or gh == 0:
                continue
            incl = np.ones((gh, gw), np.int64)
            zps = np.zeros((gh, gw), np.int64)
            for ci, cb in enumerate(b["cblks"]):
                incl[ci // gw, ci % gw] = 0 if cb.numpasses else 1
                zps[ci // gw, ci % gw] = cb.zero_planes
            itt = _TagTreeEnc(gw, gh, incl)
            ztt = _TagTreeEnc(gw, gh, zps)
            for ci, cb in enumerate(b["cblks"]):
                gx, gy = ci % gw, ci // gw
                itt.encode(bw, gx, gy, 1)
                if not cb.numpasses:
                    continue
                thr = 1
                while thr <= cb.zero_planes:
                    ztt.encode(bw, gx, gy, thr)
                    thr += 1
                ztt.encode(bw, gx, gy, thr)
                _write_numpasses(bw, cb.numpasses)
                # Lblock signalling then one length per codeword
                # segment (B.10.7.1): a single increment must satisfy
                # every segment's length
                k = 0
                for (seg, np_) in cb.segs:
                    base = cb.lblock + int(math.floor(math.log2(np_)))
                    while len(seg) >= (1 << (base + k)):
                        k += 1
                for _ in range(k):
                    bw.bit(1)
                bw.bit(0)
                cb.lblock += k
                for (seg, np_) in cb.segs:
                    bits = cb.lblock + int(math.floor(math.log2(np_)))
                    bw.write(len(seg), bits)
                bodies.append(b"".join(s for s, _ in cb.segs))
        del styled
        bw.align()
        return bw.data(), b"".join(bodies)


def _marker(code: int, payload: bytes) -> bytes:
    return struct.pack(">HH", code, len(payload) + 2) + payload


_NORM_CACHE: dict = {}


def _band_norm(levels: int, r: int, orient: int) -> float:
    """L2 synthesis norm of a unit coefficient in band (r, orient) of a
    `levels`-deep 9/7 pyramid, computed numerically through our own
    inverse transform (exact for our filters; used to weight lossy
    quantizer steps so distortion per unit delta is uniform)."""
    key = (levels, r, orient)
    v = _NORM_CACHE.get(key)
    if v is not None:
        return v
    from ..ops import wavelet as W
    size = 8 << max(levels - (1 if r == 0 else r), 0)
    size = min(max(size, 16), 512)
    geo = band_geometry(0, 0, size, size, levels)
    ll = None
    prev_rect = None
    for rr, (rrect, bands) in enumerate(geo):
        arrs = []
        for orient_b, bx0, by0, bx1, by1 in bands:
            a = np.zeros((by1 - by0, bx1 - bx0), np.float64)
            if rr == r and orient_b == orient and a.size:
                a[a.shape[0] // 2, a.shape[1] // 2] = 1.0
            arrs.append(a)
        if rr == 0:
            ll = arrs[0]
        else:
            ll = W.inverse_dwt_level(ll, arrs[0], arrs[1], arrs[2],
                                     prev_rect, rrect, False)
        prev_rect = rrect
    v = float(np.sqrt((np.asarray(ll) ** 2).sum()))
    _NORM_CACHE[key] = v
    return v


def _lossy_qparams(levels: int, depth: int, scale: float):
    """Per-band (eps, mu) for scalar-expounded 9/7 quantization with
    step sizes delta_b = scale / norm_b (uniform distortion weighting).
    Returns (qcd_values, [(eps, mu)] in QCD band order)."""
    out = []
    for qi in range(3 * levels + 1):
        if qi == 0:
            r, orient = 0, 0
        else:
            r = (qi - 1) // 3 + 1
            orient = (qi - 1) % 3 + 1
        gain = _BAND_GAIN[orient]
        rb = depth + gain
        delta = max(scale / _band_norm(levels, r, orient), 2.0 ** -20)
        eps = rb - int(math.floor(math.log2(delta)))
        eps = max(0, min(31, eps))
        mu = int(round((delta / 2.0 ** (rb - eps) - 1.0) * 2048.0))
        mu = max(0, min(2047, mu))
        out.append((eps, mu))
    return out


def encode_j2k(img: np.ndarray, *, reversible: bool = True,
               levels: Optional[int] = None, mct: Optional[bool] = None,
               tile: Optional[Tuple[int, int]] = None,
               cblk: Tuple[int, int] = (6, 6),
               style: int = 0,
               rate: Optional[float] = None,
               qscale: Optional[float] = None,
               sub: Optional[Sequence[Tuple[int, int]]] = None,
               sop: bool = False, eph: bool = False, ppt: bool = False,
               ppm: bool = False,
               roi: Optional[Tuple[int, int, int, int]] = None,
               roi_shift: Optional[int] = None,
               coc_styles: Optional[dict] = None,
               qcd_eps_bump: int = 0) -> bytes:
    """Encode HxW or HxWxC uint8 (components in R,G,B(,A) order) to a
    raw J2K codestream. Single quality layer, LRCP, whole-tile
    precincts; `style` sets the SPcod codeblock-style byte.

    `rate` (irreversible only) targets a compression ratio (raw/coded
    bytes, the OpenCV X1000 / OpenJPEG "rates" semantic) by a secant
    search on the global quantizer scale — each trial is a full
    encode, which is fine for a fallthrough format with no serving
    pipeline; `qscale` pins the scale directly."""
    if rate is not None and rate > 1.0 and not reversible:
        if img.ndim == 2:
            raw = img.shape[0] * img.shape[1]
        else:
            raw = img.shape[0] * img.shape[1] * img.shape[2]
        target = max(raw / rate, 64.0)
        pts = []  # (log2 qscale, size)
        lg = 0.0
        best = None        # largest size <= target
        smallest = None    # fallback when the header floor exceeds it
        for _ in range(8):
            b = encode_j2k(img, reversible=False, levels=levels,
                           mct=mct, tile=tile, cblk=cblk, style=style,
                           qscale=2.0 ** lg)
            size = len(b)
            if size <= target and (best is None or size > best[0]):
                best = (size, b)
            if smallest is None or size < smallest[0]:
                smallest = (size, b)
            if size <= target and (lg == 0.0 or size >= target * 0.80):
                break  # base quality already fits, or close enough
            pts.append((lg, float(size)))
            if len(pts) >= 2 and pts[-1][1] != pts[-2][1] \
                    and pts[-1][0] != pts[-2][0]:
                (x0, y0), (x1, y1) = pts[-2], pts[-1]
                slope = (y1 - y0) / (x1 - x0)
                if slope < 0:
                    lg = x1 + (target * 0.92 - y1) / slope
                else:
                    lg = x1 + (2.0 if size > target else -1.0)
            else:
                lg += 2.0 if size > target else -1.0
            if size > target:
                lg = max(lg, pts[-1][0] + 0.5)  # guaranteed progress
            lg = max(0.0, min(16.0, lg))
        return (best or smallest)[1]
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    if img.dtype != np.uint8:
        raise InvalidImageError("JPEG 2000 encoder: uint8 input only")
    if h < 1 or w < 1 or nc < 1 or nc > 4:
        raise InvalidImageError("JPEG 2000 encoder: bad geometry")
    depth = 8
    sub = list(sub) if sub else [(1, 1)] * nc
    if len(sub) != nc or any(not (1 <= xr <= 4 and 1 <= yr <= 4)
                             for (xr, yr) in sub):
        raise InvalidImageError("JPEG 2000 encoder: bad subsampling")
    same_grid = all(sv == sub[0] for sv in sub[:3])
    use_mct = (nc >= 3) if mct is None else (mct and nc >= 3)
    if use_mct and not same_grid:
        use_mct = False  # MCT needs co-sited components (G.2)
    if levels is None:
        levels = max(0, min(5, int(math.floor(math.log2(min(w, h))))
                            if min(w, h) > 1 else 0))
    xts, yts = (tile if tile else (w, h))
    cbw_e, cbh_e = cblk
    if not (2 <= cbw_e <= 10 and 2 <= cbh_e <= 10 and cbw_e + cbh_e <= 12):
        raise InvalidImageError("JPEG 2000 encoder: bad codeblock size")

    # ---- headers
    guard = 2
    comps_siz = b"".join(struct.pack(">BBB", depth - 1, xr, yr)
                         for (xr, yr) in sub)
    siz = struct.pack(">HIIIIIIIIH", 0, w, h, 0, 0, xts, yts, 0, 0, nc) \
        + comps_siz
    sgcod = struct.pack(">BHB", 0, 1, 1 if use_mct else 0)
    spcod = struct.pack(">BBBBB", levels, cbw_e - 2, cbh_e - 2, style,
                        1 if reversible else 0)
    scod = (0x02 if sop else 0) | (0x04 if eph else 0)
    cod = bytes([scod]) + sgcod + spcod
    nbands = 3 * levels + 1
    qparams = []

    def band_gain(qi):
        if qi == 0:
            return 0
        return _BAND_GAIN[(qi - 1) % 3 + 1]

    if reversible:
        eps_list = []
        for c in range(nc):
            d_eff = depth + (1 if (use_mct and c > 0) else 0)
            eps_list.append([d_eff + band_gain(qi) + qcd_eps_bump
                             for qi in range(nbands)])
        qcd = bytes([(guard << 5) | 0]) \
            + bytes(e << 3 for e in eps_list[0])
        qparams = [[(e, 0) for e in eps_list[c]] for c in range(nc)]
        qcc_list = [
            (c, bytes([(guard << 5) | 0])
             + bytes(e << 3 for e in eps_list[c]))
            for c in range(nc) if eps_list[c] != eps_list[0]]
    else:
        # scalar expounded 9/7 quantization, norm-weighted steps
        pairs = _lossy_qparams(levels, depth,
                               1.0 if qscale is None else qscale)
        qcd = bytes([(guard << 5) | 2]) + b"".join(
            struct.pack(">H", (e << 11) | m) for (e, m) in pairs)
        qparams = [list(pairs) for _ in range(nc)]
        qcc_list = []

    head = b"\xff\x4f" + _marker(0xFF51, siz) + _marker(0xFF52, cod) \
        + _marker(0xFF5C, qcd)
    comp_styles = [style] * nc
    if coc_styles:
        for c, st in sorted(coc_styles.items()):
            comp_styles[c] = st
            spcoc = struct.pack(">BBBBBB", 0, levels, cbw_e - 2,
                                cbh_e - 2, st, 1 if reversible else 0)
            head += _marker(0xFF53, bytes([c]) + spcoc)
    for (c, qbody) in qcc_list:
        qcc = bytes([c]) + qbody if nc < 257 else \
            struct.pack(">H", c) + qbody
        head += _marker(0xFF5D, qcc)

    # ---- component planes: level shift + MCT + subsampling
    from ..ops import wavelet as W
    planes = [img[:, :, c].astype(np.int64) - (1 << (depth - 1))
              for c in range(nc)]
    if use_mct:
        if reversible:
            y, u, v = W.forward_rct(planes[0], planes[1], planes[2])
        else:
            y, u, v = W.forward_ict(planes[0], planes[1], planes[2])
        planes[0], planes[1], planes[2] = y, u, v
    # subsampled components keep every XRsiz/YRsiz-th sample
    # (decimation — the component grid per B.3)
    planes = [p[::sub[c][1], ::sub[c][0]] for c, p in enumerate(planes)]
    if not reversible:
        planes = [np.asarray(p, np.float64) for p in planes]

    # maxshift ROI: the shift must clear every background coefficient
    # (the decoder separates ROI samples by the 2^shift threshold)
    roi_shifts = None
    if roi is not None:
        if not reversible:
            raise InvalidImageError(
                "JPEG 2000 encoder: ROI fixtures are reversible-only")
        roi_shifts = []
        for c in range(nc):
            mx = int(np.abs(planes[c]).max()) if planes[c].size else 0
            # conservative: any 5/3 coefficient magnitude is bounded by
            # 4x the plane's max absolute sample. +1 margin because
            # OpenJPEG applies its ROI threshold in the x2-scaled T1
            # domain (background must stay below 2^(shift-1) there —
            # found via oracle A/B on a marginal stream)
            s_c = roi_shift if roi_shift is not None \
                else (4 * mx + 1).bit_length() + 1
            roi_shifts.append(s_c)
        for c in range(nc):
            head += _marker(0xFF5E, bytes([c, 0, roi_shifts[c]]))

    cod_dict = {"levels": levels, "cbw_e": cbw_e, "cbh_e": cbh_e,
                "transform": 1 if reversible else 0, "guard": guard,
                "style": style}

    # ---- tiles
    if ppm and ppt:
        raise InvalidImageError("JPEG 2000 encoder: PPM xor PPT")
    ntx, nty = _ceil_div(w, xts), _ceil_div(h, yts)
    body = b""
    ppm_chunks = []
    nsop = 0
    for t in range(ntx * nty):
        tx, ty = t % ntx, t // ntx
        tx0, ty0 = tx * xts, ty * yts
        tx1, ty1 = min(tx0 + xts, w), min(ty0 + yts, h)
        rects = []
        tile_planes = []
        for c in range(nc):
            xr, yr = sub[c]
            rc = (_ceil_div(tx0, xr), _ceil_div(ty0, yr),
                  _ceil_div(tx1, xr), _ceil_div(ty1, yr))
            rects.append(rc)
            tile_planes.append(planes[c][rc[1]:rc[3], rc[0]:rc[2]])
        te = _TileEncoder(tile_planes, rects, cod_dict, qparams,
                          [depth] * nc, comp_styles, roi=roi,
                          roi_shifts=roi_shifts)
        hdrs = []
        bodies = []
        for (hd, bd) in te.packets():
            if sop:
                bodies.append(_marker(0xFF91, struct.pack(">H",
                                                          nsop & 0xFFFF)))
                nsop += 1
            if eph:
                hd += b"\xff\x92"
            hdrs.append(hd)
            bodies.append(bd)
        if ppm:
            # one Nppm-prefixed chunk per tile-part (A.7.4)
            blob = b"".join(hdrs)
            ppm_chunks.append(struct.pack(">I", len(blob)) + blob)
            pk = b"".join(bodies)
            sot_body = struct.pack(">HIBB", t, 12 + 2 + len(pk), 0, 1)
            body += _marker(0xFF90, sot_body) + b"\xff\x93" + pk
        elif ppt:
            ppt_seg = _marker(0xFF61, bytes([0]) + b"".join(hdrs))
            pk = b"".join(bodies)
            sot_body = struct.pack(">HIBB", t, 12 + len(ppt_seg) + 2
                                   + len(pk), 0, 1)
            body += _marker(0xFF90, sot_body) + ppt_seg \
                + b"\xff\x93" + pk
        else:
            # interleave: header then body per packet
            pk_parts = []
            bi = 0
            for hd in hdrs:
                if sop:
                    pk_parts.append(bodies[bi])
                    bi += 1
                pk_parts.append(hd)
                pk_parts.append(bodies[bi])
                bi += 1
            pk = b"".join(pk_parts)
            sot_body = struct.pack(">HIBB", t, 12 + 2 + len(pk), 0, 1)
            body += _marker(0xFF90, sot_body) + b"\xff\x93" + pk
    if ppm_chunks:
        stream = b"".join(ppm_chunks)
        # split across PPM segments if oversized (Lppm is 16-bit)
        z = 0
        while stream:
            part, stream = stream[:65000], stream[65000:]
            head += _marker(0xFF60, bytes([z]) + part)
            z += 1
    return head + body + b"\xff\xd9"


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + typ + payload


def encode_jp2(img: np.ndarray, **kw) -> bytes:
    """J2K codestream wrapped in the JP2 container (signature + ftyp +
    jp2h(ihdr, colr) + jp2c)."""
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, nc = img.shape
    cs = encode_j2k(img, **kw)
    ihdr = struct.pack(">IIHBBBB", h, w, nc, 7, 7, 0, 0)
    colr = struct.pack(">BBBI", 1, 0, 0, 16 if nc >= 3 else 17)
    jp2h = _box(b"ihdr", ihdr) + _box(b"colr", colr)
    out = (b"\x00\x00\x00\x0cjP  \r\n\x87\n"
           + _box(b"ftyp", b"jp2 " + struct.pack(">I", 0) + b"jp2 ")
           + _box(b"jp2h", jp2h)
           + _box(b"jp2c", cs))
    return out
