"""Flow-magnitude distance map (models/utils/tools.py:77-80)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def flow_distance(flow: jax.Array) -> jax.Array:
    """sqrt(u^2 + v^2) of an NHWC2 flow, computed in f32, returned (N,H,W,1)."""
    u = flow[..., 0:1].astype(jnp.float32)
    v = flow[..., 1:2].astype(jnp.float32)
    return jnp.sqrt(u * u + v * v).astype(flow.dtype)
