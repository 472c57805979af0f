"""Device tracing helpers (jax.profiler wrappers).

The reference has no tracing (SURVEY.md §5); here a single context manager
captures an XLA/TPU trace viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/lilliput_trace"):
    """Capture a jax.profiler trace of the enclosed device work."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
