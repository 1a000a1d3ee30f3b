"""DRBA-TPU: a TPU-native anime video frame interpolation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of routineLife1/DRBA
(Distance Ratio Based Adjuster for anime interpolation): RIFE / GMFSS /
GMFSS_UNION interpolation models driven by a Distance Ratio Map (DRM) computed
from bidirectional optical flow over a sliding 3-frame window.

Everything on the compute path is functional JAX compiled by XLA for TPU;
the forward-splat op ships with several TPU backends (XLA scatter, sort-based
segment-sum, Pallas); multi-chip scaling rides ``jax.sharding`` over a device
mesh (see ``drba_tpu.parallel``).

Reference behavior citations use ``file:line`` paths into the upstream CUDA
repo (mounted read-only during development) and describe semantics only — the
implementation here is written TPU-first, not translated.
"""

__version__ = "0.1.0"

from drba_tpu.config import Config  # noqa: F401
