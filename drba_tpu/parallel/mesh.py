"""Device-mesh utilities for multi-chip scaling.

The reference is strictly single-GPU (SURVEY.md §2: no distributed backend
of any kind). The TPU-native scaling axis here is the **window batch**: each
3-frame sliding window's computation is independent once flow is computed
per-window, so windows shard embarrassingly across chips over ICI with
``jax.sharding`` — XLA inserts any needed collectives.

The single axis is ``data`` — the window/batch axis (pure DP, no cross-chip
traffic in the hot loop beyond the reuse-chain ppermute and input scatter /
output gather).

Why no spatial ('sp') axis for 4K (decided round 3): window DP already
scales 4K *throughput* linearly — a video stream supplies far more
independent windows than chips, so spatial sharding could only improve
single-window *latency*, which offline conversion does not need. Wiring it
would also force manual halo exchange around every Pallas kernel (the
stencil splat / MXU warp / conv chains are custom calls XLA's SPMD
partitioner cannot split), a large complexity tax for no throughput win.
The single-chip 4K bound is therefore the per-chip bench number
(bench.py --config uhd); aggregate 4K throughput = chips x that number.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None) -> Mesh:
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    return Mesh(np.asarray(devices[:n]), ("data",))


def window_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (window-batch) axis sharded across 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device_put a pytree of stacked window tensors with batch sharding."""
    sh = window_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
