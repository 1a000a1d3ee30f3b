"""Network definitions: functional JAX modules over flat param dicts.

Every network is a pure ``apply(params, ...)`` function over a flat
``dict[str, jax.Array]`` whose keys mirror the upstream torch state-dict
names (e.g. ``"block0.conv0.0.0.weight"``). This makes the torch->JAX weight
converter (drba_tpu/convert.py) a mechanical per-kind transpose and keeps
every model a plain pytree for ``jit``/``vmap``/``shard_map``.

Convolution weights are stored HWIO (TPU-native NHWC pipeline); transposed
convolutions keep torch's un-flipped layout and are flipped inside the op.
"""

__all__ = ["RIFE", "GMFSS", "GMFSS_UNION"]


def __getattr__(name):
    # Lazy: the wrappers import drba_tpu.convert, which imports
    # drba_tpu.models.layers — eager imports here would be circular.
    if name == "RIFE":
        from drba_tpu.models.rife import RIFE

        return RIFE
    if name == "GMFSS":
        from drba_tpu.models.gmfss import GMFSS

        return GMFSS
    if name == "GMFSS_UNION":
        from drba_tpu.models.gmfss_union import GMFSS_UNION

        return GMFSS_UNION
    raise AttributeError(name)
