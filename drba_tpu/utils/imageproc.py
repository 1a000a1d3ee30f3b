"""Host<->device image conversion and network-legal sizing.

Mirrors models/utils/tools.py:33-72 with NHWC layout:
  * frames enter as HWC uint8 (BGR from the decoder), leave the same way;
  * network-legal size: (H, W) scaled so that ``dim * scale`` is a multiple
    of the model's pad size, reached by bilinear RESIZE (not zero-pad),
    exactly like ``get_valid_net_inp_size`` (tools.py:41-56).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from drba_tpu.ops.resize import resize_to


def _net_dim(dim: int, scale: float, div: int) -> int:
    """Smallest working dimension >= dim whose SCALED extent is a multiple
    of ``div`` (the network's pyramid depth requires div-aligned inputs at
    the flow scale). SPEC-MANDATED float arithmetic — the reference rounds
    via float ``//`` then truncates (models/utils/tools.py:41-56), and the
    padded size must match exactly or resize grids (and outputs) shift."""
    scaled = dim * scale
    if scaled % div == 0:
        return dim
    return int((scaled // div + 1) * div / scale)


def get_valid_net_inp_size(img: np.ndarray, scale: float, div: int = 64) -> dict:
    h, w = img.shape[:2]
    return {
        "src_size": (h, w),
        "dst_size": (_net_dim(h, scale, div), _net_dim(w, scale, div)),
    }


@functools.partial(jax.jit, static_argnames=("dtype",))
def _u8_to_float(img_u8: jax.Array, dtype) -> jax.Array:
    return img_u8.astype(dtype)[None] / 255.0


@jax.jit
def _float_to_u8(x: jax.Array) -> jax.Array:
    return jnp.clip(x[0].astype(jnp.float32) * 255.0, 0, 255).astype(jnp.uint8)


def to_tensor(img: np.ndarray, dtype=jnp.float32) -> jax.Array:
    """HWC uint8 -> (1,H,W,C) float in [0,1] on device.

    The frame crosses the host boundary as uint8 (host<->device bandwidth is
    the scarce resource on relayed TPU runtimes: 4x less bytes than f32) and
    is normalized on device.
    """
    return _u8_to_float(jnp.asarray(np.ascontiguousarray(img)), dtype)


def to_uint8(x: jax.Array) -> np.ndarray:
    """(1,H,W,C) float [0,1] -> HWC uint8 on host (truncation, like
    ``(x*255).astype(uint8)`` at tools.py:38); quantized on device so only
    uint8 crosses the host boundary."""
    return np.asarray(_float_to_u8(x))


def to_inp(img: np.ndarray, dst_size: tuple[int, int], dtype=jnp.float32) -> jax.Array:
    return resize_to(to_tensor(img, dtype), dst_size)


def to_out(x: jax.Array, src_size: tuple[int, int]) -> np.ndarray:
    return to_uint8(resize_to(x.astype(jnp.float32), src_size))
