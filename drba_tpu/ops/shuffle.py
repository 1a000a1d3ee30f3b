"""Layout helper ops: pixel shuffle, torch-semantics transposed conv, unfold.

These back the IFBlock/GridNet upsampling tails
(models/rife_426_heavy/IFNet_HDv3.py:79-82, models/model_gmfss/FusionNet.py:27-52)
and GMFlow's convex upsampling (models/gmflow/gmflow.py:82).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """torch ``nn.PixelShuffle`` in NHWC.

    Input (N, H, W, C*r^2) with torch channel ordering (c-major, then the
    r x r sub-pixel grid): out[n, h*r+i, w*r+j, c] = in[n, h, w, c*r*r + i*r + j].
    """
    n, h, w, crr = x.shape
    c = crr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # N, H, i, W, j, C
    return x.reshape(n, h * r, w * r, c)


def conv_transpose2d(
    x: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    stride: int = 2,
    padding: int = 1,
) -> jax.Array:
    """torch ``nn.ConvTranspose2d`` semantics in NHWC.

    ``kernel`` uses HWIO layout (kh, kw, in, out) — the converter maps torch's
    (in, out, kh, kw) ConvTranspose weight by transposing, WITHOUT spatial
    flip; the flip is applied here so the stored layout stays uniform with
    regular convs. Equivalent regular conv: dilate input by ``stride``, pad by
    ``k - 1 - padding``, correlate with the spatially-flipped kernel.
    """
    kh, kw = kernel.shape[0], kernel.shape[1]
    flipped = kernel[::-1, ::-1, :, :]
    out = jax.lax.conv_general_dilated(
        x,
        flipped,
        window_strides=(1, 1),
        padding=((kh - 1 - padding, kh - 1 - padding), (kw - 1 - padding, kw - 1 - padding)),
        lhs_dilation=(stride, stride),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if bias is not None:
        out = out + bias.astype(out.dtype)
    return out


def unfold3x3(x: jax.Array) -> jax.Array:
    """torch ``F.unfold(x, [3, 3], padding=1)`` in NHWC, returned as
    (N, H, W, C, 9) with torch's (c, ky, kx) patch ordering flattened on the
    last axis. Implemented as 9 static shifts — no gather."""
    n, h, w, c = x.shape
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    patches = [
        xp[:, dy : dy + h, dx : dx + w, :] for dy in range(3) for dx in range(3)
    ]
    return jnp.stack(patches, axis=-1)  # (N,H,W,C,9)
