"""Device-mesh utilities for multi-chip scaling.

The reference is strictly single-GPU (SURVEY.md §2: no distributed backend
of any kind). The TPU-native scaling axis here is the **window batch**: each
3-frame sliding window's computation is independent once flow is computed
per-window, so windows shard embarrassingly across chips over ICI with
``jax.sharding`` — XLA inserts any needed collectives.

Axes:
  * ``data``  — window/batch axis (pure DP, no cross-chip traffic in the hot
    loop beyond input scatter / output gather);
  * ``sp``    — optional spatial axis (H) for 4K+ frames; XLA's SPMD
    partitioner inserts halo exchanges for convolutions automatically.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, spatial: int = 1) -> Mesh:
    devices = jax.devices()
    n = len(devices) if n_devices is None else n_devices
    devices = np.asarray(devices[:n])
    if spatial > 1:
        assert n % spatial == 0
        return Mesh(devices.reshape(n // spatial, spatial), ("data", "sp"))
    return Mesh(devices, ("data",))


def window_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (window-batch) axis sharded across 'data'."""
    if "sp" in mesh.axis_names:
        return NamedSharding(mesh, P("data", None, "sp"))
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree):
    """Device_put a pytree of stacked window tensors with batch sharding."""
    sh = window_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
