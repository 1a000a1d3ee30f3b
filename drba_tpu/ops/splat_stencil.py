"""Pallas dense-stencil forward-splat kernel (TPU fast path).

Same math as the 'shift' backend (softsplat.py): bilinear splat decomposed
over integer corner offsets, exact for |offset| <= radius. The (2r+1)^2
masked shift-adds run inside one Pallas kernel over VMEM-resident planes:
dense VPU ops only — no scatter, no gather, no materialized offset planes.

The kernel processes a full (P, H, W) block in VMEM; the XLA-level wrapper
(`splat_planes_stencil`) splits large problems into haloed row-bands and
channel blocks that fit the ~16MB VMEM budget.

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


def _stencil_kernel(v_ref, dx_ref, dy_ref, wx_ref, wy_ref, out_ref, *, r, h_out, w_out):
    # v_ref (P, H+2r, Wpad) f32 | weights (H+2r, Wpad) f32 | out (P, h_out, w_out) f32
    p = v_ref.shape[0]

    # fori over 8-aligned row-offset blocks (Mosaic requires sublane starts
    # provably divisible by 8); the 8 sub-offsets and the 2r+1 column offsets
    # are unrolled as static slices. Planes carry 8 extra bottom rows so the
    # last aligned block load stays in bounds.
    out_ref[...] = jnp.zeros((p, h_out, w_out), jnp.float32)

    def block_body(b, _):
        base = pl.multiple_of(b * 8, 8)
        dy0_b = dy_ref[pl.ds(base, h_out + 8), :]
        wy1_b = wy_ref[pl.ds(base, h_out + 8), :]
        dx0_b = dx_ref[pl.ds(base, h_out + 8), :]
        wx1_b = wx_ref[pl.ds(base, h_out + 8), :]
        v_b = v_ref[:, pl.ds(base, h_out + 8), :]
        for j in range(8):
            # source rows start at y0 = 8b + j; row offset dyk = r - (8b+j-r)
            y0 = base + j
            dyk_f = (2 * r - y0).astype(jnp.float32) - r
            valid = (y0 <= 2 * r).astype(jnp.float32)
            dy0_j = dy0_b[j : j + h_out, :]
            wy1_j = wy1_b[j : j + h_out, :]
            wy = (
                jnp.where(dy0_j == dyk_f, 1.0 - wy1_j, 0.0)
                + jnp.where(dy0_j == dyk_f - 1, wy1_j, 0.0)
            ) * valid
            for dx in range(2 * r + 1):
                dxk = dx - r
                sl_x = slice(r - dxk, r - dxk + w_out)
                wgt = wy[:, sl_x] * (
                    jnp.where(dx0_b[j : j + h_out, sl_x] == dxk, 1.0 - wx1_b[j : j + h_out, sl_x], 0.0)
                    + jnp.where(dx0_b[j : j + h_out, sl_x] == dxk - 1, wx1_b[j : j + h_out, sl_x], 0.0)
                )
                out_ref[...] += v_b[:, j : j + h_out, sl_x] * wgt[None]
        return 0

    num_blocks = (2 * r + 1 + 7) // 8
    jax.lax.fori_loop(0, num_blocks, block_body, 0)


def _align_extra(r: int) -> int:
    """Extra bottom rows so 8-aligned block loads stay in bounds."""
    return 8 * ((2 * r + 1 + 7) // 8) - 2 * r


@functools.partial(jax.jit, static_argnames=("radius",))
def _splat_band(vp, dx0p, dy0p, wx1p, wy1p, radius: int):
    """One VMEM-resident band: vp (P, hb+2r+extra, Wpad), weights same."""
    p, hb2, wpad = vp.shape
    r = radius
    h_out = hb2 - 2 * r - _align_extra(r)
    w_out = wpad - 2 * r
    kernel = functools.partial(_stencil_kernel, r=r, h_out=h_out, w_out=w_out)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, h_out, w_out), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(vp, dx0p, dy0p, wx1p, wy1p)


# VMEM budget for one band invocation (bytes), conservative vs ~16MB.
_VMEM_BUDGET = 2500 * 1024  # Mosaic temporaries cost ~3.6x the I/O footprint


@functools.partial(jax.jit, static_argnames=("radius",))
def splat_planes_stencil(planes: jax.Array, flow: jax.Array, radius: int = 8) -> jax.Array:
    """Splat (P, H, W) value planes along ``flow`` (H, W, 2) -> (P, H, W) f32."""
    p, h, w = planes.shape
    r = radius
    wpad = _round_up(w + 2 * r, 128)

    gx = jnp.arange(w, dtype=jnp.float32)[None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[:, None]
    fx = gx + flow[..., 0].astype(jnp.float32)
    fy = gy + flow[..., 1].astype(jnp.float32)
    finite = jnp.isfinite(fx) & jnp.isfinite(fy)
    fx = jnp.where(finite, fx, -1e9)
    fy = jnp.where(finite, fy, -1e9)
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    # clamp offsets outside the stencil to a sentinel that matches nothing
    big = jnp.float32(512.0)
    dx0 = jnp.clip(x0 - gx, -big, big)
    dy0 = jnp.clip(y0 - gy, -big, big)
    wx1 = fx - x0
    wy1 = fy - y0

    extra = _align_extra(r)

    def pad2(x, fill):
        return jnp.pad(x, ((r, r + extra), (r, wpad - w - r)), constant_values=fill)

    dx0p = pad2(dx0, big)
    dy0p = pad2(dy0, big)
    wx1p = pad2(wx1, 0)
    wy1p = pad2(wy1, 0)
    vpad = jnp.pad(planes.astype(jnp.float32), ((0, 0), (r, r + extra), (r, wpad - w - r)))

    # choose band height + channel block so one band fits the VMEM budget
    per_row_bytes = wpad * (4 + 4)  # value f32 + out f32 per plane-row
    weight_row_bytes = wpad * 4 * 4
    def fits(pc_, hb_):
        return pc_ * hb_ * per_row_bytes + hb_ * weight_row_bytes <= _VMEM_BUDGET

    pc = p
    hb = h
    while pc > 1 and not fits(pc, hb):
        pc = (pc + 1) // 2
    if not fits(pc, hb):
        # largest divisor band height that fits (h always has small factors
        # here: frame dims are pad-aligned)
        for cand in range(h, 0, -1):
            if h % cand == 0 and fits(pc, cand):
                hb = cand
                break

    outs = []
    for p0 in range(0, p, pc):
        rows = []
        for y0_ in range(0, h, hb):
            vb = jax.lax.dynamic_slice(
                vpad, (p0, y0_, 0), (min(pc, p - p0), hb + 2 * r + extra, wpad)
            )
            sl = lambda a: jax.lax.dynamic_slice(a, (y0_, 0), (hb + 2 * r + extra, wpad))
            rows.append(
                _splat_band(vb, sl(dx0p), sl(dy0p), sl(wx1p), sl(wy1p), radius=r)
            )
        outs.append(jnp.concatenate(rows, axis=1))
    out = jnp.concatenate(outs, axis=0)
    return out[:, :, :w]


def splat_nhwc_stencil(ten: jax.Array, flow: jax.Array, radius: int = 12) -> jax.Array:
    """NHWC adapter: splat (N,H,W,C) along (N,H,W,2) via the stencil kernel.

    The batch axis maps over per-sample kernel invocations (each sample has
    its own flow field; inside the jitted window program N is 1 and the
    timestep axis arrives via an outer vmap)."""
    def one(args):
        t, f = args
        return splat_planes_stencil(jnp.moveaxis(t, -1, 0), f, radius=radius)

    if ten.shape[0] == 1:
        out = one((ten[0], flow[0]))[None]
    else:
        out = jax.lax.map(one, (ten, flow))
    return jnp.moveaxis(out, 1, -1).astype(ten.dtype)
