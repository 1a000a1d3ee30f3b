"""Global configuration for DRBA-TPU.

The reference has no config system beyond argparse (infer.py:18-36); here the
knobs that shape compilation and numerics live in one dataclass so the CLI,
tests and benchmarks construct models uniformly.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Config:
    """Framework-wide settings.

    Attributes:
      compute_dtype: dtype used inside the networks (bf16 on TPU for MXU
        throughput; f32 for parity tests). Parameters are always stored f32.
      flow_scale: optical-flow resolution scale; mirrors the reference's
        ``-scale`` flag (infer.py:34-35): 1.0 at 1080p, 0.5 at 4K.
      splat_backend: which forward-splat implementation to use:
        'auto' | 'scatter' | 'sort' | 'pallas'.
      ts_bucket: static upper bound on interpolated timesteps per 3-frame
        window. Timestep lists are padded/masked to this length so the whole
        window compiles to a single XLA program (the reference loops per-t in
        Python, one kernel launch chain per t: models/rife.py:88-106).
      scdet_threshold: SSIM threshold for scene-change detection
        (infer.py:30-31).
    """

    compute_dtype: jnp.dtype = jnp.bfloat16
    flow_scale: float = 1.0
    splat_backend: str = "auto"
    ts_bucket: int = 4
    scdet_threshold: float = 0.3
    seed: int = 0

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# Convenient preset for numerics-sensitive tests.
F32 = Config(compute_dtype=jnp.float32)
DEFAULT = Config()
