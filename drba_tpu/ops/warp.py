"""Backward warping (grid-sample) as pure XLA gathers.

Reproduces the semantics of the reference's two backward-warp flavors:
  * RIFE warplayer: bilinear, ``padding_mode='border'``, ``align_corners=True``
    (models/rife_426_heavy/warplayer.py:8-22)
  * MetricNet backwarp / GMFlow flow_warp: bilinear, ``padding_mode='zeros'``,
    ``align_corners=True`` (models/model_gmfss/MetricNet.py:10-20,
    models/gmflow/geometry.py:53-84)

Both normalize flow to [-1, 1] with the ``(size-1)/2`` align-corners factor,
which cancels against the de-normalization — so sampling positions are simply
``pixel + flow`` in pixel units. We gather the four corners with clamped
indices and zero the weights of out-of-bounds corners in 'zeros' mode
(matching torch's per-corner OOB handling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _gather2d(img: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """img (N,H,W,C), iy/ix (N,Ho,Wo) int32 in-range -> (N,Ho,Wo,C)."""
    n, h, w, c = img.shape
    flat = img.reshape(n, h * w, c)
    idx = iy * w + ix  # (N, Ho, Wo)
    return jnp.take_along_axis(flat, idx.reshape(n, -1, 1), axis=1).reshape(
        n, *iy.shape[1:], c
    )


@functools.partial(jax.jit, static_argnames=("padding_mode",))
def _sample_pixels(img: jax.Array, px: jax.Array, py: jax.Array, padding_mode: str) -> jax.Array:
    """Bilinear sample of img (N,H,W,C) at pixel coords px/py (N,Ho,Wo).

    The whole 2x2 bilinear patch comes from ONE ``lax.gather`` with
    ``slice_sizes=(1,2,2,C)`` — gather cost on TPU is per-index, so this is
    ~4x cheaper than four corner gathers. The image is edge-padded by one so
    the patch read at clamped (y0, x0) is always in bounds; corner weights
    reproduce border/zeros semantics exactly.
    """
    n, h, w, c = img.shape
    compute = jnp.float32
    px = px.astype(compute)
    py = py.astype(compute)

    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    # Small output grids (the k >= 16 tap-warps sample a strided grid from a
    # full-res image) take FOUR plain corner gathers: gather cost is
    # per-index, so 4x a small index count is nothing, while the one-gather
    # patch-image trick below materializes a 4C-channel copy of the WHOLE
    # image (+ a relayout copy of it at some geometries) — 12.4 G + 7.4 G
    # HLO temps at 4K, a measured compile OOM for a 272x480-tap warp.
    if px.shape[1] * px.shape[2] * 8 <= h * w:
        out = None
        for dy in (0, 1):
            for dx in (0, 1):
                ix = x0i + dx
                iy = y0i + dy
                wgt = (wx if dx else (1 - wx)) * (wy if dy else (1 - wy))
                if padding_mode == "zeros":
                    valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
                    wgt = jnp.where(valid, wgt, 0.0)
                v = _gather2d(img, jnp.clip(iy, 0, h - 1),
                              jnp.clip(ix, 0, w - 1)).astype(compute)
                v = v * wgt[..., None]
                out = v if out is None else out + v
        return out.astype(img.dtype)

    # pad by 1 (edge) so the 2x2 patch at clamped corners stays in bounds,
    # then interleave the 2x2 neighborhood into channels with dense shifts so
    # ONE flat-row gather fetches the whole bilinear patch (a (2,2,C) gather
    # output hits XLA tile padding and explodes memory at full-res).
    #
    # The gather operand width is padded to a 128 multiple: flattening
    # (h+1, w+1, 4C) -> ((h+1)*(w+1), 4C) with an unaligned w+1 forces XLA to
    # physically retile the whole patch image (~20 ms at 1080p); with an
    # aligned width the reshape is free.
    wq = ((w + 1 + 127) // 128) * 128
    imgp = jnp.pad(img, ((0, 0), (1, 1), (1, 1 + wq - w), (0, 0)), mode="edge")
    imgq = jnp.concatenate(
        [
            imgp[:, 0 : h + 1, 0:wq, :],
            imgp[:, 0 : h + 1, 1 : wq + 1, :],
            imgp[:, 1 : h + 2, 0:wq, :],
            imgp[:, 1 : h + 2, 1 : wq + 1, :],
        ],
        axis=-1,
    )  # (N, h+1, wq, 4C): channel block q holds corner (q//2, q%2)
    sy = jnp.clip(y0i, -1, h - 1) + 1  # patch start in padded coords
    sx = jnp.clip(x0i, -1, w - 1) + 1

    # Large many-channel warps gather CHANNEL-FIRST: a row gather of width
    # 4C makes XLA lay the result (and everything fused downstream) out
    # channel-minor, lane-padding 4C -> 128 — a 2-10x HBM blowup that OOMs
    # the 16 GB chip at 1080p bf16 (measured: the 19-channel IFNet warp's
    # program hit 16.01 G). Gathering (4C, 1) columns along a flattened-
    # spatial minormost axis keeps every layout dense at the cost of two
    # transposes — this is the non-Pallas fallback path, so fit > speed.
    channel_first = n * px.shape[1] * px.shape[2] * c >= (1 << 24)
    if channel_first:
        flat = imgq.transpose(0, 3, 1, 2).reshape(n, 4 * c, (h + 1) * wq)
        idx = (sy * wq + sx).reshape(n, 1, -1)
        patch = jnp.take_along_axis(flat, idx, axis=2)
        patch = patch.reshape(n, 4 * c, *px.shape[1:]).astype(compute)
    else:
        flat = imgq.reshape(n, (h + 1) * wq, 4 * c)
        idx = (sy * wq + sx).reshape(n, -1)
        patch = jnp.take_along_axis(flat, idx[..., None], axis=1)
        # keep corners as STATIC channel-block slices — reshaping to a
        # trailing (2, 2, c) materializes with TPU tile padding (2 -> 8
        # sublanes, c -> 128 lanes), a ~16x memory blowup measured at
        # ~35 ms extra per full-res warp.
        patch = patch.reshape(n, *px.shape[1:], 4 * c).astype(compute)

    out = None
    for dy in (0, 1):
        for dx in (0, 1):
            ix = x0i + dx
            iy = y0i + dy
            wgt = (wx if dx else (1 - wx)) * (wy if dy else (1 - wy))
            if padding_mode == "zeros":
                valid = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
                wgt = jnp.where(valid, wgt, 0.0)
            else:  # border: clamped corners collapse onto the edge texel
                pass
            q = dy * 2 + dx  # imgq concat order: (0,0),(0,1),(1,0),(1,1)
            if channel_first:
                v = patch[:, q * c : (q + 1) * c] * wgt[:, None]
            else:
                v = patch[..., q * c : (q + 1) * c] * wgt[..., None]
            out = v if out is None else out + v
    if channel_first:
        out = jnp.moveaxis(out, 1, -1)
    return out.astype(img.dtype)


def backwarp(img: jax.Array, flow: jax.Array, padding_mode: str = "border") -> jax.Array:
    """Backward-warp ``img`` by ``flow`` (both NHWC; flow (N,H,W,2) pixels).

    ``out[y, x] = img[y + flow_v, x + flow_u]`` bilinearly sampled.
    """
    n, h, w, _ = flow.shape
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    px = gx + flow[..., 0].astype(jnp.float32)
    py = gy + flow[..., 1].astype(jnp.float32)
    return _sample_pixels(img, px, py, padding_mode)


def grid_sample(
    img: jax.Array,
    grid: jax.Array,
    padding_mode: str = "zeros",
    align_corners: bool = True,
) -> jax.Array:
    """torch ``F.grid_sample`` equivalent: grid (N,Ho,Wo,2) normalized [-1,1].

    Used by the local-correlation window sampler
    (models/gmflow/matching.py:67-69).
    """
    n, h, w, c = img.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)
    if align_corners:
        px = (gx + 1) * 0.5 * (w - 1)
        py = (gy + 1) * 0.5 * (h - 1)
    else:
        px = ((gx + 1) * w - 1) * 0.5
        py = ((gy + 1) * h - 1) * 0.5
    return _sample_pixels(img, px, py, padding_mode)
