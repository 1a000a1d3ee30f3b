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
        'auto' | 'scatter' | 'sort' | 'shift' | 'stencil'. 'auto' picks the
        Pallas 'stencil' kernel on TPU (exact within its radius, see
        ops/softsplat.py) and the bit-exact 'scatter' spec on CPU. Threaded
        as a static argument through every jitted model program, so two
        models with different backends coexist safely in one process.
      warp_backend: backward-warp implementation: 'auto' | 'gather' | 'mxu'.
        'auto' picks the Pallas residual-window MXU kernel
        (ops/warp_mxu.py) on TPU for shapes it supports and the XLA
        patch-gather otherwise. 'mxu' forces the kernel (tests); 'gather'
        forces the exact XLA path.
      conv_backend: conv-chain implementation for the large-spatial /
        small-channel conv blocks (GridNet L0 seq blocks, IFNet ResConv
        chains): 'auto' | 'xla' | 'pallas' | 'packed'. 'auto' picks the
        measured-fastest backend per site on TPU (round-4 timings,
        scripts/exp_conv_packed.py): column-packed XLA convs
        (ops/conv_packed.py, exact weight rearrangements) for the GridNet
        lattice and MetricNet, fused Pallas conv chains
        (ops/conv_chain.py) for the IFNet ResConv runs, plain XLA
        elsewhere — and plain XLA for everything on CPU. 'packed' /
        'pallas' force those paths where shapes allow; 'xla' forces plain
        convs. Numerics match XLA's bf16 convs to rounding
        (tests/test_conv_packed.py, tests/test_conv_chain.py).
      drm_splat_scale: resolution scale of the DRM alignment splats on the
        RIFE path (drm.py:_splat_avg_scaled). DRM maps are smooth ratio
        fields, so 0.5 (default) splats at half resolution — 4x fewer pixels
        and 2x the effective stencil radius — with a bounded deviation
        localized to motion boundaries (gated by
        tests/test_splat_deviation.py). 1.0 is the exact path.
      scdet_threshold: SSIM threshold for scene-change detection
        (infer.py:30-31).

    Note on timestep-count program shapes: fps-mode windows produce at most
    two distinct ts counts (floor/ceil of the fps ratio, utils/tmapper.py),
    so the serial pipeline compiles at most two window programs per
    resolution and needs no ts bucketing; the multi-device planner derives
    its own pad bucket from the fps ratio (parallel/pipeline.py).
    """

    compute_dtype: jnp.dtype = jnp.bfloat16
    flow_scale: float = 1.0
    splat_backend: str = "auto"
    warp_backend: str = "auto"
    conv_backend: str = "auto"
    drm_splat_scale: float = 0.5
    scdet_threshold: float = 0.3
    seed: int = 0
    # hard-fail on missing/extra checkpoint keys or absent weight files
    # instead of the reference's lenient strict=False load (CLI --strict)
    strict_load: bool = False

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


# Convenient preset for numerics-sensitive tests.
F32 = Config(compute_dtype=jnp.float32)
DEFAULT = Config()
