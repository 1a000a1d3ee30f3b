"""Network definitions: functional JAX modules over flat param dicts.

Every network is a pure ``apply(params, ...)`` function over a flat
``dict[str, jax.Array]`` whose keys mirror the upstream torch state-dict
names (e.g. ``"block0.conv0.0.0.weight"``). This makes the torch->JAX weight
converter (drba_tpu/convert.py) a mechanical per-kind transpose and keeps
every model a plain pytree for ``jit``/``vmap``/``shard_map``.

Convolution weights are stored HWIO (TPU-native NHWC pipeline); transposed
convolutions keep torch's un-flipped layout and are flipped inside the op.
"""

from drba_tpu.models.ifnet import IFNET_SPEC, ifnet_apply, ifnet_encode, ifnet_block

__all__ = [
    "IFNET_SPEC",
    "ifnet_apply",
    "ifnet_encode",
    "ifnet_block",
]
