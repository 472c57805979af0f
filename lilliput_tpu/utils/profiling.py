"""Device tracing + per-stage device timing (jax.profiler wrappers and a
stage-decomposition probe feeding the metrics registry).

The reference has no tracing (SURVEY.md §5); here:

* ``device_trace`` captures an XLA/TPU trace viewable in TensorBoard/
  Perfetto.
* ``measure_device_stages`` decomposes a serving pipeline's fused device
  step into decode / full-step / fetch timings and records them as
  ``device.*`` stages in the shared metrics registry — the device-side
  complement to the host StageTimers transcode() already emits. Stage
  outputs are materialized through ``jax.lax.optimization_barrier``
  before the timing checksum: without it XLA deletes transposes under
  permutation-invariant reductions and folds producer chains into the
  reduce, under-measuring stages by up to 2x (ROADMAP round-3
  methodology note).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional, Sequence

from .metrics import Metrics, metrics


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/lilliput_trace"):
    """Capture a jax.profiler trace of the enclosed device work."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def measure_device_stages(pipe, bufs: Sequence[bytes], iters: int = 3,
                          registry: Optional[Metrics] = None) -> Dict:
    """Per-stage DEVICE timing for a JpegTranscodePipeline batch.

    Compiles a decode-only program alongside the pipeline's full fused
    step and times both (plus the D2H fetch), feeding ``device.decode``,
    ``device.full_step`` and ``device.fetch`` reservoirs in the metrics
    registry and returning a summary dict. The decode stage covers the
    color pipelines (4:2:0/4:2:2/4:4:0/4:4:4 via the split-path decode)
    and grayscale (dequant+IDCT); chroma_mode='direct' pipelines report
    full_step/fetch only (their decode IS the fused resample).

    NOTE on this dev harness: the TPU tunnel acks dispatch, so wall
    times here bound dispatch+transfer, not pure compute — on a
    host-attached chip the same calls time the real thing. Methodology
    matches tools/profile_stages.py (barrier-materialized checksums).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..ops import jpeg_kernels as K

    reg = registry if registry is not None else metrics
    coefs = pipe.decode_entropy(bufs)
    out: Dict = {"batch": len(bufs)}

    def timed(name, fn, *args):
        fn(*args)  # warm/compile
        best = None
        for _ in range(iters):
            t0 = time.perf_counter()
            fn(*args)
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        reg.observe(f"device.{name}", best)
        out[name + "_ms"] = round(best * 1000, 3)

    gray = pipe.ncomp == 1
    g = pipe.geom
    if gray:
        ys, qty = coefs

        @jax.jit
        def dec(y, q):
            p = K.dequant_idct(y, q)
            return jnp.sum(jax.lax.optimization_barrier(p)
                           .astype(jnp.int32))

        timed("decode", lambda y, q: int(dec(y, q)), ys, qty)
    elif pipe.chroma_mode != "direct":
        ys, cbs, crs, qty, qtc = coefs
        rh = min(ys.shape[-3] * 8, cbs.shape[-3] * 16)
        rw = min(ys.shape[-2] * 8, cbs.shape[-2] * 16)

        @jax.jit
        def dec(y, cb, cr, qy, qc):
            bgr = K.decode_ycc_420(y, cb, cr, qy, qc, rh, rw, g.h2, g.v2)
            return jnp.sum(jax.lax.optimization_barrier(bgr)
                           .astype(jnp.int32))

        timed("decode", lambda *a: int(dec(*a)), ys, cbs, crs, qty, qtc)

    # full fused step: device_step isn't traceable directly (it does its
    # own device_put), so time it call-to-materialized and split the
    # async dispatch from the completion+fetch
    [np.asarray(a) for a in pipe.device_step(*coefs, donate=False)]  # warm
    best_full = None
    for _ in range(iters):
        t0 = time.perf_counter()
        arrs = pipe.device_step(*coefs, donate=False)
        t1 = time.perf_counter()
        mats = [np.asarray(a) for a in arrs]
        t2 = time.perf_counter()
        tot = t2 - t0
        if best_full is None or tot < best_full[0]:
            best_full = (tot, t1 - t0, t2 - t1)
        del mats
    reg.observe("device.full_step", best_full[0])
    reg.observe("device.dispatch", best_full[1])
    reg.observe("device.fetch", best_full[2])
    out["full_step_ms"] = round(best_full[0] * 1000, 3)
    out["dispatch_ms"] = round(best_full[1] * 1000, 3)
    out["fetch_ms"] = round(best_full[2] * 1000, 3)
    return out
