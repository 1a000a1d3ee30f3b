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


def fold_conv_after_shuffle(w: jax.Array, b: jax.Array | None, r: int):
    """Commute a same-padded odd-k conv THROUGH a preceding pixel shuffle.

    ``conv2d(pixel_shuffle(x, r), w, padding=k//2)`` equals
    ``pixel_shuffle(conv2d(x, w_lo, padding=1) + b_lo, r)`` with the
    returned ``(w_lo, b_lo)`` — the standard polyphase identity. Each
    output phase (py, px) of the full-res conv reads a k x k full-res
    window, which lands inside a 3 x 3 low-res window; the full-res kernel
    is embedded into a (3r, 3r) canvas at offset (py + r - k//2, ...) and
    the canvas regrouped as (DY, qy, DX, qx) with the shuffle's c-major
    channel order. Zero padding is exact: the only canvas slots that read
    out-of-frame low-res pixels are ones whose full-res taps are the conv's
    own zero padding (all other slots of those border groups hold zeros).

    w: (k, k, cin, cout) HWIO, k odd, k <= 2r+1. Returns
    w_lo (3, 3, cin*r*r, cout*r*r), b_lo (cout*r*r,) or None.

    Why: a shuffle at large spatial dims followed by a full-res conv
    lowers to a cascade of 6-D transpose copies (measured ~25-30 ms for
    GridNet's (544,960,256)->(1088,1920,64)->conv_last tail); folding runs
    the conv on 1/4 the pixels and shuffles r*r*cout channels instead.
    """
    k, _, cin, cout = w.shape
    if k % 2 != 1 or k > 2 * r + 1:
        raise ValueError(f"fold_conv_after_shuffle: k={k} needs odd k <= {2 * r + 1}")
    lo = jnp.zeros((3, 3, cin * r * r, cout * r * r), w.dtype)
    for py in range(r):
        for px in range(r):
            lp_y = py + r - k // 2
            lp_x = px + r - k // 2
            cv = jnp.pad(
                w,
                ((lp_y, 3 * r - lp_y - k), (lp_x, 3 * r - lp_x - k), (0, 0), (0, 0)),
            )
            cv = cv.reshape(3, r, 3, r, cin, cout).transpose(0, 2, 4, 1, 3, 5)
            cv = cv.reshape(3, 3, cin * r * r, cout)
            lo = lo.at[:, :, :, py * r + px :: r * r].set(cv)
    b_lo = None if b is None else jnp.repeat(b, r * r)
    return lo, b_lo


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


def fold_convT4s2_shuffle(w: jax.Array, b: jax.Array | None, r2: int = 2):
    """Re-express ``pixel_shuffle(conv_transpose2d(x, w, b, stride=2,
    padding=1), r2)`` as ``pixel_shuffle(conv2d(x, w4, pad=1) + b4, 2*r2)``.

    The k=4/s=2/p=1 transposed conv splits into 4 output phases, each a
    2x2-tap stride-1 conv of the input (phase (a, b) of out row 2i+a reads
    input rows {i-1, i} for a=0 and {i, i+1} for a=1 with kernel rows
    {3, 1} / {2, 0} respectively — embedded in a 3x3 canvas so all phases
    share pad=1). The following pixel_shuffle composes with the phase
    shuffle into one shuffle(2*r2) after an output-channel permutation,
    which is folded into ``w4``. Exact up to fp reassociation.

    Why: the dilated-conv lowering of convT plus TWO full-res shuffle
    relayout passes run at IFNet's lastconv geometry per block per window
    (IFNet_HDv3.py:79-82); this form does one conv at FEATURE resolution
    and one shuffle.

    w: (4, 4, cin, cout) HWIO as stored (converter layout, unflipped).
    Returns (w4 (3, 3, cin, 4*cout), b4) with channels ordered for
    ``pixel_shuffle(., 2*r2)`` where cout = c_final * r2 * r2.
    """
    k, _, cin, cout = w.shape
    assert k == 4, k
    c_final = cout // (r2 * r2)
    w4 = jnp.zeros((3, 3, cin, 4 * cout), w.dtype)
    # tap map measured against conv_transpose2d directly (impulse probe):
    # out[2i+a] reads x[i-1+r] with stored index ky per (a -> ((r, ky), ...))
    rows = {0: ((1, 1), (0, 3)), 1: ((2, 0), (1, 2))}
    for a in range(2):
        for bb in range(2):
            blk = jnp.zeros((3, 3, cin, cout), w.dtype)
            for (ry, ky) in rows[a]:
                for (rx, kx) in rows[bb]:
                    blk = blk.at[ry, rx].set(w[ky, kx])
            # channel interleave: convT out channel c = cf*r2*r2 + i1*r2 + j1
            # feeds final offset (2*(a?)...): out row = 2*(2i + a) + i1 ->
            # shuffle(2*r2) channel cf*(2*r2)^2 + (a*r2 + i1)*(2*r2) + ...
            for i1 in range(r2):
                for j1 in range(r2):
                    src = jnp.arange(c_final) * (r2 * r2) + i1 * r2 + j1
                    dst = (
                        jnp.arange(c_final) * (4 * r2 * r2)
                        + (a * r2 + i1) * (2 * r2)
                        + (bb * r2 + j1)
                    )
                    w4 = w4.at[:, :, :, dst].set(blk[:, :, :, src])
    b4 = None
    if b is not None:
        b4 = jnp.zeros((4 * cout,), b.dtype)
        for a in range(2):
            for bb in range(2):
                for i1 in range(r2):
                    for j1 in range(r2):
                        src = jnp.arange(c_final) * (r2 * r2) + i1 * r2 + j1
                        dst = (
                            jnp.arange(c_final) * (4 * r2 * r2)
                            + (a * r2 + i1) * (2 * r2)
                            + (bb * r2 + j1)
                        )
                        b4 = b4.at[dst].set(b[src])
    return w4, b4
