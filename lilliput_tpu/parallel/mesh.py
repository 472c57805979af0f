"""Multi-chip scale-out: device meshes and sharded transcode steps.

The reference has no distributed layer (SURVEY.md §2.3 — requests are
independent and scale-out is per-process replication). The TPU-native
equivalents provided here:

* **data parallelism** ('dp'): the image batch axis shards across chips;
  no collectives needed — each chip transcodes its slice.
* **spatial parallelism** ('sp'): the block-row axis of each image shards
  across chips for very large inputs (the long-context analog); XLA inserts
  halo exchanges/gathers for the cross-row resize taps over ICI.

Layout rule of thumb: keep 'dp' on the outer (slow) mesh dimension and 'sp'
on ICI-adjacent neighbors so the resize halos ride ICI, never DCN.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None, sp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """(dp, sp) mesh over the first n_devices."""
    devs = list(devices) if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    n = len(devs)
    if n % sp != 0:
        raise ValueError(f"{n} devices not divisible by sp={sp}")
    return Mesh(np.array(devs).reshape(n // sp, sp), ("dp", "sp"))


def shard_batch(mesh: Mesh, arr, spatial_axis: Optional[int] = None):
    """Place (B, ...) on the mesh: batch over 'dp', optionally one spatial
    axis over 'sp'."""
    spec = [None] * arr.ndim
    spec[0] = "dp"
    if spatial_axis is not None and mesh.shape["sp"] > 1:
        spec[spatial_axis] = "sp"
    return jax.device_put(arr, NamedSharding(mesh, P(*spec)))


def replicate(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))


def sharded_transcode_step(mesh: Mesh, src_w: int, src_h: int,
                           h2: bool, v2: bool, dst_w: int, dst_h: int):
    """jit-compiled fused JPEG Fit transcode with dp(+sp) in/out shardings.

    Returns a callable (y, cb, cr, qt_y, qt_c, eqt_y, eqt_c) -> coef batches
    whose inputs should be placed with shard_batch/replicate above.
    """
    from ..pipeline import fused_jpeg_fit_transcode

    step = jax.jit(
        functools.partial(fused_jpeg_fit_transcode,
                          src_w=src_w, src_h=src_h, h2=h2, v2=v2,
                          dst_w=dst_w, dst_h=dst_h),
        out_shardings=NamedSharding(mesh, P("dp")))
    return step
