"""Functional layer primitives over flat param dicts (NHWC, TPU-first).

Numerics match the torch layers used by the reference networks; weights are
pre-transposed at conversion time (drba_tpu/convert.py) so the hot path is
pure ``lax.conv_general_dilated`` with HWIO kernels.
"""

from __future__ import annotations

import math
from typing import Mapping

import jax
import jax.numpy as jnp
import numpy as np

from drba_tpu.ops.shuffle import conv_transpose2d as _convT

Params = Mapping[str, jax.Array]


def conv2d(
    p: Params,
    name: str,
    x: jax.Array,
    stride: int = 1,
    padding: int = 0,
    dilation: int = 1,
) -> jax.Array:
    w = p[f"{name}.weight"]
    out = jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    b = p.get(f"{name}.bias")
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def conv_transpose2d(
    p: Params, name: str, x: jax.Array, stride: int = 2, padding: int = 1
) -> jax.Array:
    w = p[f"{name}.weight"].astype(x.dtype)
    b = p.get(f"{name}.bias")
    return _convT(x, w, None if b is None else b, stride=stride, padding=padding)


def linear(p: Params, name: str, x: jax.Array) -> jax.Array:
    w = p[f"{name}.weight"]  # stored (in, out)
    out = jnp.dot(x, w.astype(x.dtype), preferred_element_type=jnp.float32).astype(x.dtype)
    b = p.get(f"{name}.bias")
    if b is not None:
        out = out + b.astype(out.dtype)
    return out


def layer_norm(p: Params, name: str, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    y = y * p[f"{name}.weight"].astype(jnp.float32) + p[f"{name}.bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def instance_norm(x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """torch ``nn.InstanceNorm2d`` default: affine=False, per-(N,C) over HW."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=(1, 2), keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def leaky_relu(x: jax.Array, slope: float = 0.2) -> jax.Array:
    return jnp.where(x >= 0, x, x * slope)


def prelu(p: Params, name: str, x: jax.Array) -> jax.Array:
    """torch ``nn.PReLU()`` with a single shared slope parameter."""
    a = p[f"{name}.weight"].astype(x.dtype).reshape(())
    return jnp.where(x >= 0, x, x * a)


def relu(x: jax.Array) -> jax.Array:
    return jnp.maximum(x, 0)


def gelu(x: jax.Array) -> jax.Array:
    """torch ``nn.GELU()`` default (exact erf form)."""
    return jax.nn.gelu(x, approximate=False)


# ---------------------------------------------------------------------------
# Random initialization (used when no checkpoint is supplied).
# ---------------------------------------------------------------------------


def init_from_spec(spec: Mapping[str, tuple], seed: int = 0) -> dict:
    """Create a param dict from a spec of {torch_key: (kind, *dims)}.

    kinds: conv(kh,kw,cin,cout) / convT(kh,kw,cin,cout) / bias(c) /
    linear(cin,cout) / scalar() / shape(tuple).
    Init mimics torch defaults (kaiming-uniform fan-in) closely enough for
    the weightless demo path; real runs load converted checkpoints.
    """
    rng = np.random.default_rng(seed)
    params = {}
    for key, desc in spec.items():
        kind = desc[0]
        if kind in ("conv", "convT"):
            kh, kw, cin, cout = desc[1:]
            fan_in = kh * kw * (cin if kind == "conv" else cout)
            bound = 1.0 / math.sqrt(max(fan_in, 1))
            params[key] = rng.uniform(-bound, bound, (kh, kw, cin, cout)).astype(np.float32)
        elif kind == "bias":
            (c,) = desc[1:]
            params[key] = rng.uniform(-0.05, 0.05, (c,)).astype(np.float32)
        elif kind == "linear":
            cin, cout = desc[1:]
            bound = 1.0 / math.sqrt(cin)
            params[key] = rng.uniform(-bound, bound, (cin, cout)).astype(np.float32)
        elif kind == "scalar":
            params[key] = np.float32(desc[1] if len(desc) > 1 else 0.25)
        elif kind == "ones":
            params[key] = np.ones(desc[1], np.float32)
        elif kind == "zeros":
            params[key] = np.zeros(desc[1], np.float32)
        else:
            raise ValueError(f"unknown kind {kind} for {key}")
    return {k: jnp.asarray(v) for k, v in params.items()}
