"""Bilinear resize with exact torch ``F.interpolate`` coordinate semantics.

The reference resizes everywhere with ``F.interpolate(mode='bilinear')`` in
both conventions: ``align_corners=False`` for image pre/post-processing and
scene detection (models/utils/tools.py:27-30,71-72) and ``align_corners=True``
for optical-flow upsampling inside GMFlow (models/gmflow/gmflow.py:70-71,119).

Implementation is a separable gather-lerp along H then W — pure XLA gathers,
no dynamic shapes, fuses well on TPU. ``jax.image.resize`` is NOT used because
its half-pixel convention only matches ``align_corners=False`` and it lowers
to a general gather that is slower than the two 1-D passes below.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp


def _axis_down_int(x: jax.Array, k: int, axis: int) -> jax.Array:
    """Integer-factor bilinear downsample, align_corners=False, as strided
    slices (gathers are pathologically slow on this TPU stack).

    src = (i + 0.5)k - 0.5 has constant fractional part: 0.5 between taps
    k*i + (k-2)/2 and k*i + k/2 for even k; exactly k*i + (k-1)/2 for odd k.
    """
    x = jnp.moveaxis(x, axis, 0)
    if k % 2 == 0:
        a = x[(k - 2) // 2 :: k]
        b = x[k // 2 :: k]
        out = (a + b) * jnp.asarray(0.5, x.dtype)
    else:
        out = x[(k - 1) // 2 :: k]
    return jnp.moveaxis(out, 0, axis)


def _axis_up_int(x: jax.Array, k: int, axis: int) -> jax.Array:
    """Integer-factor bilinear upsample, align_corners=False, as per-phase
    shifted lerps + interleave — no gathers."""
    x = jnp.moveaxis(x, axis, 0)
    n = x.shape[0]
    xp = jnp.concatenate([x[:1], x, x[-1:]], axis=0)  # edge clamp
    phases = []
    for p in range(k):
        src = (p + 0.5) / k - 0.5  # relative to i
        off = math.floor(src)
        wgt = src - off
        a = jax.lax.dynamic_slice_in_dim(xp, off + 1, n, 0)
        b = jax.lax.dynamic_slice_in_dim(xp, off + 2, n, 0)
        phases.append(a * jnp.asarray(1 - wgt, x.dtype) + b * jnp.asarray(wgt, x.dtype))
    out = jnp.stack(phases, axis=1).reshape(n * k, *x.shape[1:])
    return jnp.moveaxis(out, 0, axis)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def _axis_resize(x: jax.Array, out_size: int, axis: int, align_corners: bool) -> jax.Array:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x
    if not align_corners:
        if in_size % out_size == 0:
            return _axis_down_int(x, in_size // out_size, axis)
        if out_size % in_size == 0:
            return _axis_up_int(x, out_size // in_size, axis)
    if align_corners and out_size > 1 and in_size > 1:
        src = jnp.arange(out_size, dtype=jnp.float32) * ((in_size - 1) / (out_size - 1))
    else:
        scale = in_size / out_size
        src = (jnp.arange(out_size, dtype=jnp.float32) + 0.5) * scale - 0.5
    # torch clamps the source coordinate at 0 (negative coords sample pixel 0)
    src = jnp.clip(src, 0.0, float(in_size - 1))
    i0 = jnp.floor(src).astype(jnp.int32)
    i0 = jnp.minimum(i0, in_size - 1)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    w = (src - i0.astype(jnp.float32)).astype(x.dtype)

    a = jnp.take(x, i0, axis=axis)
    b = jnp.take(x, i1, axis=axis)
    wshape = [1] * x.ndim
    wshape[axis] = out_size
    w = w.reshape(wshape)
    return a * (1 - w) + b * w


def resize_bilinear(x: jax.Array, size: tuple[int, int], align_corners: bool = False) -> jax.Array:
    """Resize NHWC (or HWC) tensor to (H, W) = ``size``."""
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    x = _axis_resize(x, size[0], h_axis, align_corners)
    x = _axis_resize(x, size[1], w_axis, align_corners)
    return x


def resize_to(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """align_corners=False resize — reference ``resize`` (models/utils/tools.py:71-72)."""
    return resize_bilinear(x, size, align_corners=False)


def scale_by(x: jax.Array, factor: float, align_corners: bool = False) -> jax.Array:
    """Resize by scale factor with torch's floor output-size rule."""
    h, w = x.shape[-3], x.shape[-2]
    return resize_bilinear(x, (int(h * factor), int(w * factor)), align_corners)
