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

# NOTE: the sharded steps close over the UNJITTED _impl functions, not
# the module-level jitted wrappers: the fused decode dispatch reads the
# force_split_decode global at TRACE time, and an inner jit'd call is
# cached by jax per (function, avals, statics) — the global is not in
# that key, so sharing the jitted objects with the single-chip/bench
# paths could reuse a megakernel trace inside the GSPMD program (or
# silently downgrade later single-chip traces to the split path).
# Tracing the impls fresh inside each instance's own jit keeps the
# multi-chip and single-chip trace caches fully independent.
from ..pipeline import (JpegTranscodePipeline, StillTranscodePipeline,
                        _fused_jpeg_fit_gray_impl, _fused_jpeg_fit_impl,
                        _fused_jpeg_fit_ycc_impl, _fused_still_fit_impl)
from ..utils.metrics import metrics
from .mesh import make_mesh


class ShardedJpegPipeline(JpegTranscodePipeline):
    """JpegTranscodePipeline whose device step shards the batch over 'dp'
    and, when the mesh carries an 'sp' axis > 1, the BLOCK-ROW axis of
    every coefficient plane over 'sp' (spatial sharding — the big-image
    path: one 8K image's decode+resize spreads across sp chips, XLA
    inserting the halo collectives for the cross-row resize taps on ICI).

    Exactness tiers (mirrors the fused-vs-streaming contract): dp-only
    meshes are BYTE-IDENTICAL to the single-chip pipeline (gated in
    tests/test_parallel.py); sp>1 re-associates the f32 resize partial
    sums at shard boundaries and carries the documented ±1-u8 tier
    (tests/test_parallel.py::test_sp_sharded_4k_pipeline).

    Multi-device steps trace the pure-XLA split decode path
    (force_split_decode): a pallas_call has no GSPMD partitioning rules,
    and the split path measures within ~4% of the megakernel (ROADMAP).

    The batch is padded up to a multiple of the dp size by repeating the
    final image (its outputs are dropped), so any request count works.
    """

    def __init__(self, sample: bytes, dst_w: int, dst_h: int,
                 quality: int = 85, mesh: Optional[Mesh] = None, **kw):
        super().__init__(sample, dst_w, dst_h, quality=quality, **kw)
        self.mesh = mesh if mesh is not None else make_mesh()
        self._dp = self.mesh.shape["dp"]
        self._sp = self.mesh.shape.get("sp", 1)
        self._multi = self.mesh.devices.size > 1
        self._batch_sharding = NamedSharding(self.mesh, P("dp"))
        self._coef_sharding = (NamedSharding(self.mesh, P("dp", "sp"))
                               if self._sp > 1 else self._batch_sharding)
        self._repl = NamedSharding(self.mesh, P())
        g = self.geom
        emit = self._emit
        # yuv420: fused fn emits packed pixels, the shared emit_post
        # conversion fuses into the same sharded program (elementwise +
        # selection dots partition cleanly under GSPMD)
        femit = "pixels" if emit == "yuv420" else emit

        def _post(out):
            from ..pipeline import emit_post
            return emit_post(out, emit)
        if self.ncomp == 1:
            def fn(yc, qy, eqy):
                return _post(_fused_jpeg_fit_gray_impl(
                    yc, qy, eqy, src_w=g.width, src_h=g.height,
                    dst_w=dst_w, dst_h=dst_h, dct_scale=self.dct_scale,
                    method=self.method, orientation=self.orientation,
                    window=self.window_static, emit=femit))
        elif self.chroma_mode == "direct":
            def fn(yc, cb, cr, qy, qc, eqy, eqc):
                return _post(_fused_jpeg_fit_ycc_impl(
                    yc, cb, cr, qy, qc, eqy, eqc,
                    src_w=g.width, src_h=g.height,
                    dst_w=dst_w, dst_h=dst_h, dct_scale=self.dct_scale,
                    window=self.window_static, emit=femit))
        else:
            def fn(yc, cb, cr, qy, qc, eqy, eqc):
                return _post(_fused_jpeg_fit_impl(
                    yc, cb, cr, qy, qc, eqy, eqc,
                    src_w=g.width, src_h=g.height, h2=g.h2, v2=g.v2,
                    dst_w=dst_w, dst_h=dst_h, method=self.method,
                    orientation=self.orientation,
                    window=self.window_static, emit=femit))
        self._step = jax.jit(fn, out_shardings=self._batch_sharding)
        # constant encode qtables: replicate ONCE (device_step previously
        # round-tripped the committed jnp arrays D2H then re-uploaded them
        # on every batch — a blocking transfer per step for constant data)
        self._eqy_repl = jax.device_put(self.enc_qt_y_np, self._repl)
        self._eqc_repl = (jax.device_put(self.enc_qt_c_np, self._repl)
                          if self.ncomp == 3 else None)

    def device_step(self, ys, cbs=None, crs=None, qty=None, qtc=None,
                    donate: bool = True):
        del donate  # sharded placement governs buffers
        pad = (-len(ys)) % self._dp

        def p(a):
            return np.concatenate([a, np.repeat(a[-1:], pad, axis=0)])

        from ..ops import jpeg_kernels as K
        import contextlib
        split = K.force_split_decode() if self._multi else \
            contextlib.nullcontext()

        def put_coef(a):
            # spatial sharding per plane: block rows must divide sp
            # (luma always does — decode_entropy MCU-pads its rows); an
            # odd-row chroma plane stays dp-only, still correct, the halo
            # work simply concentrates on the luma 2/3 of the FLOPs
            if self._sp > 1 and a.shape[1] % self._sp == 0:
                metrics.incr("serving.sp_sharded_planes")
                return jax.device_put(a, self._coef_sharding)
            if self._sp > 1:
                # visible fallback: operators sharding big-image traffic
                # can see when planes silently run dp-only (VERDICT r3 #4)
                metrics.incr("serving.sp_fallback_dp_only")
            return jax.device_put(a, self._batch_sharding)

        if self.ncomp == 1:
            qty = cbs  # (ys, qty) calling convention
            batch = (p(ys), p(qty)) if pad else (ys, qty)
            args = [put_coef(batch[0]),
                    jax.device_put(batch[1], self._batch_sharding)]
            with split:
                out = self._step(*args, self._eqy_repl)
        else:
            batch = ((p(ys), p(cbs), p(crs), p(qty), p(qtc)) if pad
                     else (ys, cbs, crs, qty, qtc))
            args = ([put_coef(a) for a in batch[:3]]
                    + [jax.device_put(a, self._batch_sharding)
                       for a in batch[3:]])
            with split:
                out = self._step(*args, self._eqy_repl, self._eqc_repl)
        if not isinstance(out, tuple):
            out = (out,)   # pixel mode: the fused fn returns a bare array
        if pad:
            out = tuple(o[:-pad] for o in out)
        return out


class ShardedStillPipeline(StillTranscodePipeline):
    """StillTranscodePipeline (non-JPEG still sources) whose device step
    shards the pixel batch over 'dp' and, when the mesh carries an 'sp'
    axis > 1 that divides the image height, each image's ROW axis over
    'sp' — the big-image path for pixel-domain sources (an 8K PNG's
    resize spreads across sp chips, XLA inserting the halo collectives
    for the cross-row AREA taps on ICI).

    Exactness mirrors ShardedJpegPipeline: dp-only meshes are
    BYTE-IDENTICAL to the single-chip pipeline (requests never split);
    sp>1 re-associates the f32 resize partial sums at shard boundaries
    and carries the documented ±1-u8 tier.

    The batch pads up to a multiple of dp by repeating the final image
    (its outputs are dropped), so any request count works.
    """

    def __init__(self, sample: bytes, dst_w: int, dst_h: int,
                 quality: int = 85, mesh: Optional[Mesh] = None, **kw):
        super().__init__(sample, dst_w, dst_h, quality=quality, **kw)
        self.mesh = mesh if mesh is not None else make_mesh()
        self._dp = self.mesh.shape["dp"]
        self._sp = self.mesh.shape.get("sp", 1)
        self._batch_sharding = NamedSharding(self.mesh, P("dp"))
        self._px_sharding = (NamedSharding(self.mesh, P("dp", "sp"))
                             if self._sp > 1 else self._batch_sharding)
        self._repl = NamedSharding(self.mesh, P())

        def fn(px, eqy, eqc):
            from ..pipeline import emit_post
            emit = self._emit
            out = _fused_still_fit_impl(
                px, eqy, eqc, src_w=self.src_w, src_h=self.src_h,
                dst_w=dst_w, dst_h=dst_h, method=self.method,
                orientation=self.orientation,
                emit="pixels" if emit == "yuv420" else emit)
            return emit_post(out, emit)

        self._step = jax.jit(fn, out_shardings=self._batch_sharding)
        self._eqy_repl = jax.device_put(self.enc_qt_y_np, self._repl)
        self._eqc_repl = jax.device_put(self.enc_qt_c_np, self._repl)

    def device_step(self, px, donate: bool = True):
        del donate  # sharded placement governs buffers
        pad = (-len(px)) % self._dp
        if pad:
            px = np.concatenate([px, np.repeat(px[-1:], pad, axis=0)])
        # spatial sharding needs the row axis to divide sp; otherwise the
        # batch stays dp-only (still correct, just unsharded rows)
        if self._sp > 1 and px.shape[1] % self._sp == 0:
            sharding = self._px_sharding
            metrics.incr("serving.sp_sharded_planes")
        else:
            sharding = self._batch_sharding
            if self._sp > 1:
                metrics.incr("serving.sp_fallback_dp_only")
        px_d = jax.device_put(np.ascontiguousarray(px), sharding)
        out = self._step(px_d, self._eqy_repl, self._eqc_repl)
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
