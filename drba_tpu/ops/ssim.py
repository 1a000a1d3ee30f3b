"""MATLAB-style volumetric SSIM as a fused separable XLA reduction.

Reproduces ``ssim_matlab`` (models/pytorch_msssim/__init__.py:83-136): RGB
treated as a 3-D volume, an 11x11x11 gaussian window (sigma 1.5) applied via
conv3d after replicate padding of 5 on (C, H, W).

The 3-D gaussian is an outer product of a normalized 1-D gaussian
(create_window_3d, __init__.py:21-26), so the conv3d factorizes into three
1-D convolutions — ~33 multiplies per voxel instead of 1331, all dense VPU
work on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_kernel(window_size: int = 11, sigma: float = 1.5) -> np.ndarray:
    x = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _conv1d_along(x: jax.Array, kernel: jax.Array, axis: int) -> jax.Array:
    """'Valid' 1-D correlation along ``axis`` of an arbitrary-rank tensor."""
    k = kernel.shape[0]
    x = jnp.moveaxis(x, axis, -1)
    lead = x.shape[:-1]
    length = x.shape[-1]
    flat = x.reshape(-1, 1, length)  # (batch, feature=1, spatial)
    out = jax.lax.conv_general_dilated(
        flat,
        kernel.reshape(1, 1, k),
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    out = out.reshape(*lead, length - k + 1)
    return jnp.moveaxis(out, -1, axis)


def _gauss3d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Separable 11^3 gaussian filter over (C,H,W) of (N,C,H,W) with
    replicate ('edge') padding of 5 on every filtered axis."""
    pad = kernel.shape[0] // 2
    x = jnp.pad(
        x, ((0, 0), (pad, pad), (pad, pad), (pad, pad)), mode="edge"
    )
    x = _conv1d_along(x, kernel, axis=1)
    x = _conv1d_along(x, kernel, axis=2)
    x = _conv1d_along(x, kernel, axis=3)
    return x


def _gauss2d(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Separable 11x11 gaussian over (H,W) of (N,C,H,W), replicate pad 5."""
    pad = kernel.shape[0] // 2
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    x = _conv1d_along(x, kernel, axis=2)
    x = _conv1d_along(x, kernel, axis=3)
    return x


def _auto_range(x: jax.Array, val_range):
    if val_range is not None:
        return jnp.float32(val_range)
    max_val = jnp.where(jnp.max(x) > 128.0, 255.0, 1.0)
    min_val = jnp.where(jnp.min(x) < -0.5, -1.0, 0.0)
    return max_val - min_val


@functools.partial(jax.jit, static_argnames=("val_range", "full"))
def ssim(img1: jax.Array, img2: jax.Array, val_range: float | None = None,
         full: bool = False):
    """Per-channel 2-D SSIM (models/pytorch_msssim/__init__.py:29-80), NHWC."""
    x = jnp.moveaxis(img1.astype(jnp.float32), -1, 1)
    y = jnp.moveaxis(img2.astype(jnp.float32), -1, 1)
    L = _auto_range(x, val_range)

    k = jnp.asarray(_gaussian_kernel())
    mu1 = _gauss2d(x, k)
    mu2 = _gauss2d(y, k)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _gauss2d(x * x, k) - mu1_sq
    sigma2_sq = _gauss2d(y * y, k) - mu2_sq
    sigma12 = _gauss2d(x * y, k) - mu1_mu2

    c1 = (0.01 * L) ** 2
    c2 = (0.03 * L) ** 2
    v1 = 2.0 * sigma12 + c2
    v2 = sigma1_sq + sigma2_sq + c2
    cs = jnp.mean(v1 / v2)
    ssim_map = ((2 * mu1_mu2 + c1) * v1) / ((mu1_sq + mu2_sq + c1) * v2)
    ret = jnp.mean(ssim_map)
    if full:
        return ret, cs
    return ret


def msssim(img1: jax.Array, img2: jax.Array, val_range: float | None = None,
           normalize: bool = False) -> jax.Array:
    """Multi-scale SSIM (models/pytorch_msssim/__init__.py:139-165), NHWC."""
    weights = jnp.asarray([0.0448, 0.2856, 0.3001, 0.2363, 0.1333], jnp.float32)
    mssim, mcs = [], []
    x, y = img1, img2
    for _ in range(5):
        s, cs = ssim(x, y, val_range=val_range, full=True)
        mssim.append(s)
        mcs.append(cs)
        # 2x2 average pool
        n, h, w, c = x.shape
        x = x[:, : h // 2 * 2, : w // 2 * 2].reshape(n, h // 2, 2, w // 2, 2, c).mean((2, 4))
        y = y[:, : h // 2 * 2, : w // 2 * 2].reshape(n, h // 2, 2, w // 2, 2, c).mean((2, 4))
    mssim = jnp.stack(mssim)
    mcs = jnp.stack(mcs)
    if normalize:
        mssim = (mssim + 1) / 2
        mcs = (mcs + 1) / 2
    pow1 = mcs**weights
    pow2 = mssim**weights
    return jnp.prod(pow1[:-1]) * pow2[-1]


@functools.partial(jax.jit, static_argnames=("val_range",))
def ssim_matlab(img1: jax.Array, img2: jax.Array, val_range: float | None = None) -> jax.Array:
    """Scalar volumetric SSIM of two NHWC images.

    ``val_range=None`` applies the reference's auto detection
    (__init__.py:84-97): L = 255 if max > 128 else 1; min < -0.5 widens to 2.
    Inputs in this pipeline are always [0, 1] floats, so L = 1.
    """
    x = jnp.moveaxis(img1.astype(jnp.float32), -1, 1)  # N,C,H,W volume
    y = jnp.moveaxis(img2.astype(jnp.float32), -1, 1)

    if val_range is None:
        max_val = jnp.where(jnp.max(x) > 128.0, 255.0, 1.0)
        min_val = jnp.where(jnp.min(x) < -0.5, -1.0, 0.0)
        L = max_val - min_val
    else:
        L = jnp.float32(val_range)

    k = jnp.asarray(_gaussian_kernel())
    mu1 = _gauss3d(x, k)
    mu2 = _gauss3d(y, k)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _gauss3d(x * x, k) - mu1_sq
    sigma2_sq = _gauss3d(y * y, k) - mu2_sq
    sigma12 = _gauss3d(x * y, k) - mu1_mu2

    c1 = (0.01 * L) ** 2
    c2 = (0.03 * L) ** 2
    v1 = 2.0 * sigma12 + c2
    v2 = sigma1_sq + sigma2_sq + c2
    ssim_map = ((2 * mu1_mu2 + c1) * v1) / ((mu1_sq + mu2_sq + c1) * v2)
    return jnp.mean(ssim_map)


class SSIM:
    """Stateful wrapper mirroring ``pytorch_msssim.SSIM``
    (models/pytorch_msssim/__init__.py:168-191). Returns DSSIM
    ``(1 - ssim) / 2`` like the reference's forward. The gaussian window is
    a trace-time constant here, so there is no device window cache to carry
    — the class exists for API completeness."""

    def __init__(self, window_size: int = 11, size_average: bool = True,
                 val_range: float | None = None):
        assert window_size == 11 and size_average, "reference defaults only"
        self.window_size = window_size
        self.size_average = size_average
        self.val_range = val_range

    def __call__(self, img1: jax.Array, img2: jax.Array) -> jax.Array:
        return (1.0 - ssim(img1, img2, val_range=self.val_range)) / 2.0

    forward = __call__


class MSSSIM:
    """Stateful wrapper mirroring ``pytorch_msssim.MSSSIM``
    (models/pytorch_msssim/__init__.py:194-203)."""

    def __init__(self, window_size: int = 11, size_average: bool = True,
                 channel: int = 3):
        assert window_size == 11 and size_average, "reference defaults only"
        self.window_size = window_size
        self.size_average = size_average
        self.channel = channel

    def __call__(self, img1: jax.Array, img2: jax.Array) -> jax.Array:
        return msssim(img1, img2)

    forward = __call__
