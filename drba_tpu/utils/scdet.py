"""Scene-change detection: SSIM on 32x32 downsamples (tools.py:27-30).

Runs as one fused jitted reduction on device; only the final boolean crosses
the host boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from drba_tpu.ops import ssim_matlab
from drba_tpu.ops.resize import resize_to


@jax.jit
def scene_ssim(x1: jax.Array, x2: jax.Array) -> jax.Array:
    a = resize_to(x1.astype(jnp.float32), (32, 32))
    b = resize_to(x2.astype(jnp.float32), (32, 32))
    return ssim_matlab(a, b)


def check_scene(x1: jax.Array, x2: jax.Array, threshold: float = 0.3) -> bool:
    return bool(scene_ssim(x1, x2) < threshold)
