"""Device mesh construction and batch sharding helpers.

The metering workload is embarrassingly parallel over streams (the
reference's "one plugin instance per track" concurrency, SURVEY.md §2.4),
so the primary axis is data-parallel ('dp').  A second, sequence-parallel
axis ('sp') splits *time* within a stream: linear-recurrence state is
composed across devices with collectives (parallel.timepar), fragment
histograms are additive (psum), and peaks are pmax — so even a single very
long file can ride the whole mesh.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, sp: int = 1, devices=None) -> Mesh:
    """Build a ('dp', 'sp') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // sp
    assert dp * sp == n, (dp, sp, n)
    arr = np.asarray(devices).reshape(dp, sp)
    return Mesh(arr, ("dp", "sp"))


def shard_batch(mesh: Mesh, x, batch_axis: int = 0):
    """Place an array with streams sharded over 'dp' (replicated on 'sp')."""
    spec = [None] * x.ndim
    spec[batch_axis] = "dp"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def shard_time(mesh: Mesh, x, batch_axis: int = 0, time_axis: int = -1):
    """Streams over 'dp' AND time over 'sp'."""
    spec = [None] * x.ndim
    spec[batch_axis] = "dp"
    spec[time_axis % x.ndim] = "sp"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
