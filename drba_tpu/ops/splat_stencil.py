"""Pallas dense-stencil forward-splat kernel (TPU fast path).

Same math as the 'shift' backend (softsplat.py): bilinear splat decomposed
over integer corner offsets, exact for |offset| <= radius. The masked
shift-adds run as dense VPU ops — no scatter, no gather, no materialized
offset planes.

Streaming structure (v4): the kernel runs on a (samples, plane-blocks,
row-bands) grid. Each step double-buffer-DMAs one haloed value window
``(Pblk, hb+2r+extra, Wpad)`` plus the sample's two absolute-position
planes (fx, fy) for the band from HBM into VMEM scratch, derives the four
corner planes (dx0, dy0, wx1, wy1) on the VPU once per step, then
accumulates the band's output block. Deriving weights in-kernel (v4)
replaces the XLA-side stacked 4-plane weight materialization (tiled-layout
writes measure ~3-6 GB/s on this stack) and halves the per-band weight DMA.

The native sample axis (v4) replaces the former per-sample ``lax.map``:
one kernel invocation covers a whole batch (each sample indexes its own
flow planes via the grid), so the XLA prep batches into single fused ops
and the longer grid pipelines the DMAs better. Model-level packing rides
this: gmfss splats both directions x all window timesteps of one pyramid
level in ONE invocation (models/gmfss_core.py).

Motion-adaptive bounds: the wrapper computes, per (sample, band), the
integer offset range actually present in the flow (clipped to the radius)
and prefetches it as scalars; the kernel skips column offsets via
``pl.when`` and row-offset blocks via dynamic ``fori_loop`` bounds. Cost is
therefore proportional to the real motion magnitude — a band whose flow
fits in +-2 px runs ~25 of the 625 offset pairs; only worst-case motion
pays the full stencil.

All planes travel as f32 (Mosaic on v5e rejects bf16 comparisons);
accumulation is f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x, m):
    return (x + m - 1) // m * m


def _align_extra(r: int) -> int:
    """Extra bottom rows so 8-aligned block loads stay in bounds."""
    return 8 * ((2 * r + 1 + 7) // 8) - 2 * r


# VMEM footprint target for one grid step's scratch + out block (bytes).
_VMEM_BUDGET = 10 * 1024 * 1024


def _choose_blocks(p: int, h: int, wpad: int, r: int, vbytes: int = 4) -> tuple[int, int]:
    """Pick (plane-block, band-height) minimizing the grid-step count
    (per-step overhead ~tens of us dominates for small-motion bands),
    tie-breaking toward larger plane blocks (weight-compute amortization)."""
    extra = _align_extra(r)

    def vmem(pblk, hb):
        rows = hb + 2 * r + extra
        return (
            2 * pblk * rows * wpad * vbytes  # double-buffered value windows
            + 8 * rows * wpad * 4            # fx/fy windows (2x2) + derived corners (4), f32
            + pblk * hb * wpad * 4           # f32 out block
        )

    best = None
    for hb in (64, 32, 16, 8):
        if h % hb:
            continue
        # largest plane block that fits VMEM at this band height
        pblk = None
        for nb in range(1, p + 1):
            cand = -(-p // nb)
            if vmem(cand, hb) <= _VMEM_BUDGET:
                pblk = cand
                break
        if pblk is None:
            continue
        steps = (-(-p // pblk)) * (h // hb)
        key = (steps, -pblk)
        if best is None or key < best[0]:
            best = (key, (pblk, hb))
    if best is None:
        return None  # no band height divides H / fits the budget
    return best[1]


def stencil_supported(h: int, w: int, radius: int = 12) -> bool:
    """Whether ``splat_planes_stencil`` can handle this geometry exactly.

    H must split into 8-row bands and even the minimal block configuration
    must fit the VMEM budget (ultra-wide frames can exceed it). Callers
    (ops/softsplat.py) fall back to the bit-equivalent 'shift' backend when
    this is False instead of silently truncating the band grid (ADVICE r2)."""
    wpad = _round_up(w + 2 * radius, 128)
    return _choose_blocks(1, h, wpad, radius, vbytes=4) is not None


def _kernel(bounds_ref, v_hbm, f_hbm, out_ref, vwin, fwin, cwin, vsem, fsem,
            *, n_s, n_pb, n_bands, pblk, hb, rows, r, w_out, wpad):
    s = pl.program_id(0)
    pb = pl.program_id(1)
    b = pl.program_id(2)
    t = (s * n_pb + pb) * n_bands + b
    total = n_s * n_pb * n_bands

    def dmas(slot, tt):
        ss = tt // (n_pb * n_bands)
        rem = tt % (n_pb * n_bands)
        pbb = rem // n_bands
        bb = rem % n_bands
        vc = pltpu.make_async_copy(
            v_hbm.at[
                ss,
                pl.ds(pbb * pblk, pblk),
                pl.ds(pl.multiple_of(bb * hb, 8), rows),
                :,
            ],
            vwin.at[slot],
            vsem.at[slot],
        )
        fc = pltpu.make_async_copy(
            f_hbm.at[ss, :, pl.ds(pl.multiple_of(bb * hb, 8), rows), :],
            fwin.at[slot],
            fsem.at[slot],
        )
        return vc, fc

    @pl.when(t == 0)
    def _():
        for c in dmas(0, 0):
            c.start()

    @pl.when(t + 1 < total)
    def _():
        for c in dmas((t + 1) % 2, t + 1):
            c.start()

    slot = t % 2
    for c in dmas(slot, t):
        c.wait()

    # derive the corner planes once per step (VPU, ~rows*wpad*10 ops):
    # padded col j -> absolute x = j - r; padded row i of this band ->
    # absolute y = b*hb + i - r. The -1e9 pad fill floors to itself, so
    # derived offsets clip to the +-512 sentinel (matches no dx/dy in
    # [-r, r]) and the fractional parts are 0 — identical to the former
    # XLA-side weight planes.
    fx = fwin[slot, 0]
    fy = fwin[slot, 1]
    gx = jax.lax.broadcasted_iota(jnp.int32, (rows, wpad), 1).astype(
        jnp.float32) - float(r)
    band0 = (b * hb - r).astype(jnp.float32)
    gy = band0 + jax.lax.broadcasted_iota(jnp.int32, (rows, wpad), 0).astype(
        jnp.float32)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    big = jnp.float32(512.0)
    cwin[0] = jnp.clip(x0 - gx, -big, big)
    cwin[1] = jnp.clip(y0 - gy, -big, big)
    cwin[2] = fx - x0
    cwin[3] = fy - y0

    out_ref[0] = jnp.zeros((pblk, hb, w_out), jnp.float32)

    yb_lo = bounds_ref[s * n_bands + b, 0]
    yb_hi = bounds_ref[s * n_bands + b, 1]
    dx_lo = bounds_ref[s * n_bands + b, 2]
    dx_hi = bounds_ref[s * n_bands + b, 3]

    # Row-offset blocks iterate a dynamic (band-measured) sub-range OUTER —
    # a band with empty bounds costs zero iterations, so the 2r+1 predicated
    # column offsets inside never evaluate (the inverted nesting cost ~60us
    # per step on quiet bands). Mosaic requires sublane starts provably
    # divisible by 8, hence the 8-aligned blocks with 8 statically-unrolled
    # sub-offsets; windows carry `extra` spare bottom rows so the last
    # aligned block load stays in bounds.
    def block_body(b8, _):
        base = pl.multiple_of(b8 * 8, 8)
        # two-level predicate hierarchy: each ~3us pl.when evaluation is the
        # dominant per-block cost for typical small-motion bands, so gate
        # groups of 5 column offsets behind one interval-overlap check
        for g0 in range(0, 2 * r + 1, 5):
            g_lo = g0 - r
            g_hi = min(g0 + 4, 2 * r) - r

            @pl.when((dx_lo <= g_hi) & (g_lo <= dx_hi))
            def _(g0=g0, g_hi=g_hi):
                for dx in range(g0, min(g0 + 5, 2 * r + 1)):
                    dxk = dx - r
                    sl_x = slice(r - dxk, r - dxk + w_out)

                    @pl.when((dx_lo <= dxk) & (dxk <= dx_hi))
                    def _(dxk=dxk, sl_x=sl_x):
                        # one lane-rotate per (dx, block), amortized over 8 js
                        vsb = vwin[slot, :, pl.ds(base, hb + 8), sl_x]
                        dx0b = cwin[0, pl.ds(base, hb + 8), sl_x]
                        dy0b = cwin[1, pl.ds(base, hb + 8), sl_x]
                        wx1b = cwin[2, pl.ds(base, hb + 8), sl_x]
                        wy1b = cwin[3, pl.ds(base, hb + 8), sl_x]
                        cw = jnp.where(dx0b == dxk, 1.0 - wx1b, 0.0) + jnp.where(
                            dx0b == dxk - 1, wx1b, 0.0
                        )
                        for j in range(8):
                            # source rows start at y0 = 8*b8 + j; offset r - y0
                            y0j = base + j
                            dyk_f = (2 * r - y0j).astype(jnp.float32) - r
                            valid = (y0j <= 2 * r).astype(jnp.float32)
                            wy = (
                                jnp.where(dy0b[j : j + hb, :] == dyk_f, 1.0 - wy1b[j : j + hb, :], 0.0)
                                + jnp.where(dy0b[j : j + hb, :] == dyk_f - 1, wy1b[j : j + hb, :], 0.0)
                            ) * valid
                            out_ref[0] += vsb[:, j : j + hb, :].astype(jnp.float32) * (
                                wy * cw[j : j + hb, :]
                            )[None]
        return 0

    jax.lax.fori_loop(yb_lo, yb_hi, block_body, 0)


def _band_bounds(dx0, dy0, h, hb, rows, r):
    """Per-band offset bounds (int32 (n_bands, 4)): row-offset 8-block range
    [yb_lo, yb_hi) and column offset range [dx_lo, dx_hi] actually present in
    the band's haloed source window, clipped to the stencil radius."""
    n_bands = h // hb
    hp = dx0.shape[0]
    n_chunks = hp // hb  # hp is padded to a multiple of hb by the caller
    big = jnp.float32(1e9)

    # a pixel contributes via corners at offsets (d, d+1): live iff any
    # corner lands within the stencil radius
    live = (
        (dx0 >= -(r + 1)) & (dx0 <= r) & (dy0 >= -(r + 1)) & (dy0 <= r)
    )
    dx_m_lo = jnp.where(live, dx0, big).reshape(n_chunks, hb * dx0.shape[1])
    dx_m_hi = jnp.where(live, dx0, -big).reshape(n_chunks, -1)
    dy_m_lo = jnp.where(live, dy0, big).reshape(n_chunks, -1)
    dy_m_hi = jnp.where(live, dy0, -big).reshape(n_chunks, -1)
    c_dx_lo = dx_m_lo.min(axis=1)
    c_dx_hi = dx_m_hi.max(axis=1)
    c_dy_lo = dy_m_lo.min(axis=1)
    c_dy_hi = dy_m_hi.max(axis=1)

    # band b's window covers chunks [b, b + nw)
    nw = -(-rows // hb)
    idx = jnp.arange(n_bands)[:, None] + jnp.arange(nw)[None, :]
    idx = jnp.minimum(idx, n_chunks - 1)
    b_dx_lo = c_dx_lo[idx].min(axis=1)
    b_dx_hi = c_dx_hi[idx].max(axis=1)
    b_dy_lo = c_dy_lo[idx].min(axis=1)
    b_dy_hi = c_dy_hi[idx].max(axis=1)

    empty = b_dx_lo > b_dx_hi
    dx_lo = jnp.clip(b_dx_lo, -r, r).astype(jnp.int32)
    dx_hi = jnp.clip(b_dx_hi + 1, -r, r).astype(jnp.int32)
    # corner offsets dyk in [dy_lo, dy_hi + 1] -> window y0 = r - dyk
    dy_lo = jnp.clip(b_dy_lo, -r, r).astype(jnp.int32)
    dy_hi = jnp.clip(b_dy_hi + 1, -r, r).astype(jnp.int32)
    yb_lo = (r - dy_hi) // 8
    yb_hi = (r - dy_lo) // 8 + 1
    z = jnp.zeros_like(dx_lo)
    bounds = jnp.stack(
        [
            jnp.where(empty, z, yb_lo),
            jnp.where(empty, z, yb_hi),
            jnp.where(empty, z + 1, dx_lo),
            jnp.where(empty, z, dx_hi),
        ],
        axis=1,
    )
    return bounds.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("radius",))
def splat_planes_stencil_batched(planes: jax.Array, flows: jax.Array,
                                 radius: int = 8) -> jax.Array:
    """Splat (S, P, H, W) value planes along per-sample flows (S, H, W, 2)
    -> (S, P, H, W) f32, in ONE kernel invocation.

    Value planes stream through VMEM in their OWN dtype (bf16 inputs halve
    the value DMA and VMEM footprint -> bigger blocks, fewer grid steps);
    positions, derived weights and accumulation are always f32.
    """
    n_s, p, h, w = planes.shape
    vdt = planes.dtype if planes.dtype == jnp.bfloat16 else jnp.float32
    r = radius
    extra = _align_extra(r)
    wpad = _round_up(w + 2 * r, 128)

    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    fx = gx + flows[..., 0].astype(jnp.float32)
    fy = gy + flows[..., 1].astype(jnp.float32)
    finite = jnp.isfinite(fx) & jnp.isfinite(fy)
    fx = jnp.where(finite, fx, -1e9)
    fy = jnp.where(finite, fy, -1e9)
    # corner offsets, XLA-side, ONLY for the per-band bounds reductions
    # (fused into the min/max — never materialized as weight planes)
    big = jnp.float32(512.0)
    dx0 = jnp.clip(jnp.floor(fx) - gx, -big, big)
    dy0 = jnp.clip(jnp.floor(fy) - gy, -big, big)

    # NOTE: block sizes are chosen with f32 accounting even for bf16 values —
    # Mosaic's scoped-vmem stack for this kernel runs ~2x the raw buffer
    # footprint (f32 conversion temporaries), and the bf16 win is DMA
    # bandwidth, not larger blocks (bigger blocks OOM'd scoped vmem at 16M).
    blocks = _choose_blocks(p, h, wpad, r, vbytes=4)
    if blocks is None:
        raise ValueError(
            f"stencil splat unsupported for H={h}, W={w}, r={r} (no band "
            "height divides H within the VMEM budget); use the 'shift' "
            "backend (ops/softsplat.py gates this via stencil_supported)"
        )
    pblk, hb = blocks
    rows = hb + 2 * r + extra
    # pad rows so both the last band's haloed window and the bounds
    # chunking stay in range: r top, then up to a multiple of hb
    row_pad_hi = _round_up(h + 2 * r + extra, hb) - h - r

    def pad3(x, fill):
        return jnp.pad(
            x, ((0, 0), (r, row_pad_hi), (r, wpad - w - r)), constant_values=fill
        )

    bounds = jax.vmap(
        lambda a, b: _band_bounds(a, b, h, hb, rows, r)
    )(pad3(dx0, big), pad3(dy0, big)).reshape(n_s * (h // hb), 4)

    # only the two absolute-position planes travel to the kernel (see the
    # in-kernel derivation note in _kernel)
    fstack = jnp.stack([pad3(fx, -1e9), pad3(fy, -1e9)], axis=1)

    ppad = -(-p // pblk) * pblk
    vpad = jnp.pad(
        planes.astype(vdt),
        ((0, 0), (0, ppad - p), (r, row_pad_hi), (r, wpad - w - r)),
    )

    n_pb, n_bands = ppad // pblk, h // hb
    kernel = functools.partial(
        _kernel, n_s=n_s, n_pb=n_pb, n_bands=n_bands, pblk=pblk, hb=hb,
        rows=rows, r=r, w_out=w, wpad=wpad,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_s, n_pb, n_bands),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, pblk, hb, w), lambda s, pb, b, bounds: (s, pb, b, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, pblk, rows, wpad), vdt),
            pltpu.VMEM((2, 2, rows, wpad), jnp.float32),
            pltpu.VMEM((4, rows, wpad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_s, ppad, h, w), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(bounds, vpad, fstack)
    return out[:, :p]


@functools.partial(jax.jit, static_argnames=("radius",))
def splat_planes_stencil(planes: jax.Array, flow: jax.Array, radius: int = 8) -> jax.Array:
    """Splat (P, H, W) value planes along ``flow`` (H, W, 2) -> (P, H, W) f32
    (single-sample adapter over the batched kernel)."""
    return splat_planes_stencil_batched(planes[None], flow[None], radius=radius)[0]


def splat_nhwc_stencil(ten: jax.Array, flow: jax.Array, radius: int = 12) -> jax.Array:
    """NHWC adapter: splat (N,H,W,C) along (N,H,W,2) via the stencil kernel.

    The batch axis maps onto the kernel's native sample grid axis (each
    sample's flow planes are DMA'd by grid index) — one invocation for the
    whole batch. Like the other Pallas kernels it must NOT be vmapped
    (program_id-indexed scratch); batching is explicit here and at the
    model layer."""
    out = splat_planes_stencil_batched(
        jnp.moveaxis(ten, -1, 1), flow, radius=radius
    )
    # accumulation is f32 — return it so downstream normalization divides at
    # full precision even when values streamed through VMEM as bf16
    return jnp.moveaxis(out, 1, -1)
