"""Multi-chip serving front: JPEG batch transcode sharded over a device mesh.

The reference scales out by running one ImageOps per goroutine per process
(SURVEY.md §2.3); the TPU-native equivalent shards the serving batch across
chips with `jax.sharding` — host threads feed entropy-decoded coefficients,
one sharded jit step transcodes every chip's slice in parallel (no
collectives: requests are independent), host threads entropy-encode.

    mesh = make_mesh()                       # all visible chips
    pipe = ShardedJpegPipeline(sample, 256, 256, mesh=mesh)
    outs = pipe.transcode(list_of_jpeg_bytes)

Outputs are byte-identical to the single-chip JpegTranscodePipeline (same
per-image math; dp sharding never crosses image boundaries).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..pipeline import (JpegTranscodePipeline, fused_jpeg_fit_transcode,
                        fused_jpeg_fit_transcode_ycc)
from .mesh import make_mesh


class ShardedJpegPipeline(JpegTranscodePipeline):
    """JpegTranscodePipeline whose device step shards the batch over 'dp'.

    The batch is padded up to a multiple of the dp size by repeating the
    final image (its outputs are dropped), so any request count works.
    """

    def __init__(self, sample: bytes, dst_w: int, dst_h: int,
                 quality: int = 85, mesh: Optional[Mesh] = None, **kw):
        super().__init__(sample, dst_w, dst_h, quality=quality, **kw)
        self.mesh = mesh if mesh is not None else make_mesh()
        self._dp = self.mesh.shape["dp"]
        self._batch_sharding = NamedSharding(self.mesh, P("dp"))
        self._repl = NamedSharding(self.mesh, P())
        g = self.geom
        emit = self._emit
        if self.ncomp == 1:
            from ..pipeline import fused_jpeg_fit_transcode_gray

            def fn(yc, qy, eqy):
                return fused_jpeg_fit_transcode_gray(
                    yc, qy, eqy, src_w=g.width, src_h=g.height,
                    dst_w=dst_w, dst_h=dst_h, dct_scale=self.dct_scale,
                    orientation=self.orientation,
                    window=self.window_static, emit=emit)
        elif self.chroma_mode == "direct":
            def fn(yc, cb, cr, qy, qc, eqy, eqc):
                return fused_jpeg_fit_transcode_ycc(
                    yc, cb, cr, qy, qc, eqy, eqc,
                    src_w=g.width, src_h=g.height,
                    dst_w=dst_w, dst_h=dst_h, dct_scale=self.dct_scale,
                    window=self.window_static, emit=emit)
        else:
            def fn(yc, cb, cr, qy, qc, eqy, eqc):
                return fused_jpeg_fit_transcode(
                    yc, cb, cr, qy, qc, eqy, eqc,
                    src_w=g.width, src_h=g.height, h2=g.h2, v2=g.v2,
                    dst_w=dst_w, dst_h=dst_h, method=self.method,
                    orientation=self.orientation,
                    window=self.window_static, emit=emit)
        self._step = jax.jit(fn, out_shardings=self._batch_sharding)

    def device_step(self, ys, cbs=None, crs=None, qty=None, qtc=None,
                    donate: bool = True):
        del donate  # sharded placement governs buffers
        pad = (-len(ys)) % self._dp

        def p(a):
            return np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])

        if self.ncomp == 1:
            qty = cbs  # (ys, qty) calling convention
            batch = (p(ys), p(qty)) if pad else (ys, qty)
            args = [jax.device_put(a, self._batch_sharding) for a in batch]
            eqy = jax.device_put(np.asarray(self.enc_qt_y), self._repl)
            out = self._step(*args, eqy)
        else:
            batch = ((p(ys), p(cbs), p(crs), p(qty), p(qtc)) if pad
                     else (ys, cbs, crs, qty, qtc))
            args = [jax.device_put(a, self._batch_sharding) for a in batch]
            eqy = jax.device_put(np.asarray(self.enc_qt_y), self._repl)
            eqc = jax.device_put(np.asarray(self.enc_qt_c), self._repl)
            out = self._step(*args, eqy, eqc)
        if not isinstance(out, tuple):
            out = (out,)   # pixel mode: the fused fn returns a bare array
        if pad:
            out = tuple(o[:-pad] for o in out)
        return out


def transcode_sharded(bufs: Sequence[bytes], dst_w: int, dst_h: int,
                      quality: int = 85,
                      mesh: Optional[Mesh] = None) -> List[bytes]:
    """One-shot helper: same-geometry JPEGs -> Fit transcodes over all chips."""
    pipe = ShardedJpegPipeline(bufs[0], dst_w, dst_h, quality=quality,
                               mesh=mesh)
    return pipe.transcode(bufs)
