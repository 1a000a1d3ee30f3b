"""Softmax-splatting forward warp — the reference's single native (CUDA) op.

Semantics reproduced from the executable spec in the reference's pure-torch
fallback (models/softsplat/softsplat_torch.py:70-179) and the mode handling of
the CUDA wrapper (models/softsplat/softsplat.py:248-293):

  * every source pixel ``s`` is moved to ``p = (x + u, y + v)`` and its value
    scattered to the 4 integer neighbors of ``p`` with bilinear weights;
    out-of-bounds corners and non-finite targets are dropped;
  * ``mode``:
      'sum'     raw scatter of the input;
      'avg'     scatter [in, 1], divide by scattered ones;
      'linear'  scatter [in*metric, metric], divide by scattered metric;
      'soft'    scatter [in*exp(metric), exp(metric)], divide likewise;
    with '-addeps' (default), '-zeroeps', '-clipeps' denominators.

TPU-first design notes: scatter-add with colliding indices is the one pattern
the MXU/VPU pipeline dislikes. Two backends:

  * 'scatter' — a single fused ``zeros.at[idx].add(vals)``; XLA lowers this to
    a native TPU scatter. Used as the correctness spec and default.
  * 'sort' — sort-by-destination + segment-sum via prefix sums and
    ``searchsorted``: every step (sort, gather, cumsum, binary search) is a
    dense TPU-friendly primitive with no serialization. f32 cumsum over long
    streams loses precision when metrics are large, so this backend promotes
    the accumulation dtype.

Both are wrapped in one public ``softsplat`` function; the backend is chosen
by ``drba_tpu.config.Config.splat_backend`` or per call.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_EPS = 1e-7


def _corner_contributions(flow: jax.Array):
    """Shared corner index/weight computation.

    flow: (N, H, W, 2) pixel displacements. Returns per-corner
    (idx, weight) with idx flattened over (N*H*W) into a per-batch H*W space,
    invalid corners mapped to weight 0 (index clamped in-range).
    """
    n, h, w, _ = flow.shape
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    fx = gx + flow[..., 0].astype(jnp.float32)
    fy = gy + flow[..., 1].astype(jnp.float32)
    finite = jnp.isfinite(fx) & jnp.isfinite(fy)
    # Guard non-finite before floor to avoid int conversion UB.
    fx = jnp.where(finite, fx, -2.0)
    fy = jnp.where(finite, fy, -2.0)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx = fx - x0
    wy = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    batch_off = (jnp.arange(n, dtype=jnp.int32) * (h * w))[:, None, None]
    out = []
    for dy, dx in ((0, 0), (0, 1), (1, 0), (1, 1)):
        ix = x0i + dx
        iy = y0i + dy
        wgt = (wx if dx else (1 - wx)) * (wy if dy else (1 - wy))
        valid = finite & (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h)
        wgt = jnp.where(valid, wgt, 0.0)
        idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1) + batch_off
        out.append((idx.reshape(-1), wgt.reshape(-1)))
    return out


def _splat_scatter(ten: jax.Array, flow: jax.Array) -> jax.Array:
    """XLA scatter-add backend."""
    n, h, w, c = ten.shape
    corners = _corner_contributions(flow)
    src = ten.astype(jnp.float32).reshape(n * h * w, c)
    out = jnp.zeros((n * h * w, c), jnp.float32)
    for idx, wgt in corners:
        out = out.at[idx].add(src * wgt[:, None], mode="drop")
    return out.reshape(n, h, w, c).astype(ten.dtype)


def _splat_sort(ten: jax.Array, flow: jax.Array) -> jax.Array:
    """Sort-by-destination + sorted segment-sum backend.

    After sorting, destinations are contiguous, so the reduction is exact
    per-segment summation (no global prefix-sum cancellation) and XLA's
    scatter emitter can exploit ``indices_are_sorted``.
    """
    n, h, w, c = ten.shape
    m = n * h * w
    corners = _corner_contributions(flow)
    src = ten.astype(jnp.float32).reshape(m, c)

    idx = jnp.concatenate([i for i, _ in corners])          # (4M,)
    wgt = jnp.concatenate([g for _, g in corners])          # (4M,)
    # Zero-weight entries are parked at index 0 with zero value: harmless.
    idx = jnp.where(wgt != 0.0, idx, 0)

    order = jnp.argsort(idx)
    idx_s = idx[order]
    src4 = jnp.tile(src, (4, 1)) * wgt[:, None]
    vals_s = src4[order]

    out = jax.ops.segment_sum(
        vals_s, idx_s, num_segments=m, indices_are_sorted=True
    )
    return out.reshape(n, h, w, c).astype(ten.dtype)


def _splat_shift(ten: jax.Array, flow: jax.Array, radius: int = 12) -> jax.Array:
    """Dense offset-enumeration backend — the TPU fast path.

    Bilinear splat corner offsets are integers, so the scatter decomposes
    exactly into one dense masked shift-add per integer offset:
        out += shift(ten * w * [offset(e) == (dy, dx)], (dy, dx))
    Everything is elementwise + static slices — no scatter/gather/sort, which
    measure 100-1000x slower than dense ops on this TPU stack (XLA serializes
    scatters; sorts are comparison networks).

    Exact for displacements within ``radius`` pixels at the warp resolution;
    rarer far entries (sentinel-hole-filled flows, models/rife.py:69-70, and
    extreme motion) are dropped. Their targets then read as splat holes and
    downstream hole-filling (< 0.999 coverage, models/drm.py:98-102) falls
    back to the unaligned value — a graceful, localized deviation.
    Measured on the DRM path (tests/test_splat_deviation.py): bit-identical
    up to 20 px/frame pans; SSIM 0.938 / max abs diff 0.031 on the timestep
    maps at extreme 40 px/frame pans. Use the 'scatter' backend for
    bit-exact needs.
    """
    n, h, w, c = ten.shape
    r = radius
    x32 = ten.astype(jnp.float32)

    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    fx = gx + flow[..., 0].astype(jnp.float32)
    fy = gy + flow[..., 1].astype(jnp.float32)
    finite = jnp.isfinite(fx) & jnp.isfinite(fy)
    fx = jnp.where(finite, fx, -1e9)
    fy = jnp.where(finite, fy, -1e9)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    wx1 = fx - x0  # weight toward the +1 column corner
    wy1 = fy - y0
    # integer corner displacements relative to the source pixel
    dx0 = (x0 - gx).astype(jnp.int32)
    dy0 = (y0 - gy).astype(jnp.int32)

    # scan over row offsets; the 2r+1 column shifts are unrolled and fuse
    # into one elementwise pass per row offset
    def row_step(out, dy):
        sel_y0 = dy0 == dy          # this offset is the y0 corner row
        sel_y1 = dy0 == dy - 1      # this offset is the y0+1 corner row
        wy = jnp.where(sel_y0, 1.0 - wy1, 0.0) + jnp.where(sel_y1, wy1, 0.0)

        # S[y, x'] = sum over dx of column-shifted weighted contributions
        s = jnp.zeros((n, h, w + 2 * r, c), jnp.float32)
        for dx in range(-r, r + 1):
            sel_x0 = dx0 == dx
            sel_x1 = dx0 == dx - 1
            wgt = wy * (
                jnp.where(sel_x0, 1.0 - wx1, 0.0) + jnp.where(sel_x1, wx1, 0.0)
            )
            contrib = x32 * wgt[..., None]
            s = jax.lax.dynamic_update_slice(
                s,
                jax.lax.dynamic_slice(s, (0, 0, r + dx, 0), (n, h, w, c)) + contrib,
                (0, 0, r + dx, 0),
            )
        # add the row-shifted strip into the canvas
        upd = jax.lax.dynamic_slice(out, (0, r + dy, 0, 0), (n, h, w + 2 * r, c)) + s
        out = jax.lax.dynamic_update_slice(out, upd, (0, r + dy, 0, 0))
        return out, None

    canvas = jnp.zeros((n, h + 2 * r, w + 2 * r, c), jnp.float32)
    offsets = jnp.arange(-r, r + 1, dtype=jnp.int32)
    canvas, _ = jax.lax.scan(row_step, canvas, offsets)

    out = canvas[:, r : r + h, r : r + w, :]
    return out.astype(ten.dtype)


def _pool_sum(x: jax.Array, s: int) -> jax.Array:
    """Block-sum (N,H,W,C) by s x s (H, W padded up to multiples of s)."""
    n, h, w, c = x.shape
    hp, wp = -(-h // s) * s, -(-w // s) * s
    if (hp, wp) != (h, w):
        x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    return x.reshape(n, hp // s, s, wp // s, s, c).sum(axis=(2, 4))


def _splat_overflow(x32: jax.Array, flow: jax.Array, radius: int,
                    backend_fn, factors=(8, 64)) -> jax.Array:
    """Coarse-cascade accumulation of the contributions the dense fast path
    drops (|displacement| > radius): pool them ``s x s`` down, splat at the
    coarse resolution with the same dense backend (radius covers
    ``s * radius`` px of fine motion), and mass-conservatively upsample into
    the fine accumulator.

    Sound because splat flow fields are piecewise-smooth at the block scale
    by construction — GMFlow convex-upsamples flow from a 1/8 grid
    (reference models/gmflow/gmflow.py:67-90) and DRM maps are smooth ratio
    fields — so a block's dropped contributions share a target up to small
    intra-block spread; the pooled splat places their summed mass at the
    count-mean target with <= s/2 px placement error plus the coarse
    bilinear spread (a localized blur, not a loss). The reference's CUDA
    kernel places every contribution exactly (models/softsplat/
    softsplat.py:306-367); with the cascade the fast path conserves the
    mass of far-displaced content instead of dropping it, which is what
    dominated the production-oracle SSIM gap under large flows
    (docs/ROADMAP.md round-5).

    Levels partition by displacement: level ``s`` takes the dropped pixels
    whose target lies within ``s * (radius - 1)`` of their block center;
    beyond the last level the contribution is dropped as before (on real
    content that is only the reference's own sentinel holes, whose targets
    are out of frame and dropped by the reference too).
    """
    n, h, w, _ = x32.shape
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    u = flow[..., 0].astype(jnp.float32)
    v = flow[..., 1].astype(jnp.float32)
    finite = jnp.isfinite(u) & jnp.isfinite(v)
    u = jnp.where(finite, u, 1e9)
    v = jnp.where(finite, v, 1e9)
    fx = gx + u
    fy = gy + v
    r = float(radius)
    # the fine pass fully drops a contribution iff one axis' displacement
    # has BOTH bilinear corners outside +-radius (see _splat_shift's
    # sel_x0/sel_x1 enumeration): u >= r+1 or u < -r-1
    far = ((u >= r + 1.0) | (u < -r - 1.0) | (v >= r + 1.0)
           | (v < -r - 1.0)) & finite

    accs = []  # [(factor, coarse accumulation)]
    handled = jnp.zeros_like(far)
    for s in factors:
        cgx = (jnp.floor(gx / s) + 0.5) * s  # block centers, fine coords
        cgy = (jnp.floor(gy / s) + 0.5) * s
        margin = s * (r - 1.0)
        covered = (jnp.abs(fx - cgx) <= margin) & (jnp.abs(fy - cgy) <= margin)
        m = (far & covered & ~handled).astype(jnp.float32)[..., None]
        handled = handled | (covered & far)

        cnt = _pool_sum(m, s)
        xs = _pool_sum(x32 * m, s)
        tx = _pool_sum(fx[..., None] * m, s) / jnp.maximum(cnt, 1.0)
        ty = _pool_sum(fy[..., None] * m, s) / jnp.maximum(cnt, 1.0)
        hc, wc = xs.shape[1], xs.shape[2]
        ccx = (jnp.arange(wc, dtype=jnp.float32)[None, None, :] + 0.5) * s
        ccy = (jnp.arange(hc, dtype=jnp.float32)[None, :, None] + 0.5) * s
        # coarse-grid displacement toward the pooled mean target; empty
        # blocks get a far out-of-range finite flow, which every backend
        # drops deterministically (finite so no NaN enters the kernels)
        empty = cnt[..., 0] == 0.0
        cu = jnp.where(empty, 1e9, (tx[..., 0] - ccx) / s)
        cv = jnp.where(empty, 1e9, (ty[..., 0] - ccy) / s)
        cflow = jnp.stack([cu, cv], axis=-1)
        accs.append((s, backend_fn(xs, cflow, radius=radius)
                     .astype(jnp.float32)))

    # Single full-resolution upsample: coarser levels cascade into the
    # finest coarse grid first (tiny resizes), so the expensive fine-res
    # bilinear pass runs once per call, not once per level. The 1/s^2
    # factors keep total mass invariant under each upsample.
    s0, total = accs[0]
    h0, w0 = total.shape[1], total.shape[2]
    for s, acc in accs[1:]:
        k = s // s0
        up = jax.image.resize(
            acc, (n, acc.shape[1] * k, acc.shape[2] * k, acc.shape[-1]),
            "bilinear") / (k * k)
        total = total + up[:, :h0, :w0]
    fine = jax.image.resize(total, (n, h0 * s0, w0 * s0, total.shape[-1]),
                            "bilinear") / (s0 * s0)
    return fine[:, :h, :w]


def _splat_stencil(ten: jax.Array, flow: jax.Array, radius: int = 12) -> jax.Array:
    """Pallas dense-stencil kernel backend (see splat_stencil.py).

    Geometries the kernel cannot tile (H not a multiple of 8, or ultra-wide
    frames whose minimal block exceeds the VMEM budget) fall back to the
    bit-equivalent dense 'shift' backend instead of silently truncating."""
    from drba_tpu.ops.splat_stencil import splat_nhwc_stencil, stencil_supported

    if not stencil_supported(ten.shape[1], ten.shape[2], radius):
        return _splat_shift(ten, flow, radius=radius)
    return splat_nhwc_stencil(ten, flow, radius=radius)


def _splat_shift_ov(ten, flow, radius=12):
    """'shift' + the coarse overflow cascade for far displacements."""
    return (_splat_shift(ten, flow, radius=radius).astype(jnp.float32)
            + _splat_overflow(ten.astype(jnp.float32), flow, radius,
                              _splat_shift)).astype(ten.dtype)


def _splat_stencil_ov(ten, flow, radius=12):
    """'stencil' + the coarse overflow cascade for far displacements."""
    return (_splat_stencil(ten, flow, radius=radius).astype(jnp.float32)
            + _splat_overflow(ten.astype(jnp.float32), flow, radius,
                              _splat_stencil)).astype(ten.dtype)


_BACKENDS = {
    "scatter": _splat_scatter,
    "sort": _splat_sort,
    "shift": _splat_shift,
    "stencil": _splat_stencil,
    "shift_ov": _splat_shift_ov,
    "stencil_ov": _splat_stencil_ov,
}


def _resolve_backend(backend: str) -> str:
    if backend == "auto":
        import jax as _jax

        return "stencil" if _jax.default_backend() not in ("cpu",) else "scatter"
    if backend not in _BACKENDS:
        raise ValueError(
            f"unknown splat backend {backend!r}; valid: auto, "
            + ", ".join(sorted(_BACKENDS))
        )
    return backend


@functools.partial(
    jax.jit, static_argnames=("mode", "backend", "return_coverage", "radius")
)
def softsplat(
    ten: jax.Array,
    flow: jax.Array,
    metric: jax.Array | None,
    mode: str = "avg",
    backend: str = "auto",
    return_coverage: bool = False,
    radius: int = 12,
) -> jax.Array:
    """Forward-splat ``ten`` (N,H,W,C) along ``flow`` (N,H,W,2).

    Mirrors the reference call signature ``softsplat(tenIn, tenFlow,
    tenMetric, strMode)`` (models/softsplat/softsplat.py:248) with NHWC
    layout. ``metric`` is (N,H,W,1) for 'linear'/'soft', None otherwise.

    ``return_coverage=True`` additionally returns the warped all-ones mask
    ``warp(1, flow, metric, mode) = denom/(denom+eps)`` derived from the
    splat's own denominator — the reference computes it with a second full
    splat call per flow (models/drm.py:139-140, models/rife.py:63-64); here
    it is free.

    ``radius`` bounds the dense backends' (shift/stencil) exact displacement
    range at THIS call's resolution; callers warping at a downscaled pyramid
    level scale it down with the flow so physical motion coverage stays
    constant (default 12 = 24 px of physical motion at a half-res warp;
    raise per call for extreme-motion content — the stencil kernel's
    motion-adaptive bounds charge only for motion actually present, plus a
    modest halo-DMA overhead). Ignored by the exact scatter/sort backends.
    """
    parts = mode.split("-")
    main, sub = parts[0], (parts[1] if len(parts) > 1 else None)
    assert main in ("sum", "avg", "linear", "soft"), mode
    if main in ("sum", "avg"):
        assert metric is None
    else:
        assert metric is not None
    assert not (return_coverage and main == "sum")

    compute = jnp.float32
    x = ten.astype(compute)
    ones = jnp.ones(x.shape[:3] + (1,), compute)
    if main == "avg":
        x = jnp.concatenate([x, ones], axis=-1)
    elif main == "linear":
        mtr = metric.astype(compute)
        x = jnp.concatenate([x * mtr, mtr], axis=-1)
    elif main == "soft":
        mexp = jnp.exp(metric.astype(compute))
        x = jnp.concatenate([x * mexp, mexp], axis=-1)

    name = _resolve_backend(backend)
    if name.startswith("stencil") and ten.dtype == jnp.bfloat16:
        # bf16 inputs stream through the kernel's VMEM in bf16 (half the
        # value DMA/footprint); weights + accumulation stay f32, so the
        # result matches the input's own precision
        out = _BACKENDS[name](x.astype(jnp.bfloat16), flow, radius=radius)
    elif name in ("shift", "stencil", "shift_ov", "stencil_ov"):
        out = _BACKENDS[name](x, flow, radius=radius)
    else:
        out = _BACKENDS[name](x, flow)

    if main == "sum":
        return out.astype(ten.dtype)

    raw = out[..., -1:]
    if sub is None or sub == "addeps":
        norm = raw + _EPS
    elif sub == "zeroeps":
        norm = jnp.where(raw == 0.0, 1.0, raw)
    elif sub == "clipeps":
        norm = jnp.clip(raw, _EPS, None)
    result = (out[..., :-1] / norm).astype(ten.dtype)
    if return_coverage:
        return result, (raw / norm).astype(ten.dtype)
    return result
