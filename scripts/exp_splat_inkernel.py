"""Experiment: compute splat corner weights in-kernel from the flow planes.

The production stencil (ops/splat_stencil.py) materializes four padded f32
weight planes (dx0, dy0, wx1, wy1) in XLA and DMAs all four per band. This
variant DMAs only the two padded absolute-position planes (fx, fy) and
derives the corner planes once per grid step on the VPU into scratch —
eliminating the XLA-side stacked-weight materialization (tiled-layout
writes measure ~3-6 GB/s on this stack) and halving the per-band weight
DMA.

    FORCE_CPU=1 python scripts/exp_splat_inkernel.py   # interpret parity
    python scripts/exp_splat_inkernel.py               # TPU parity + timing
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import functools

import jax

if os.environ.get("FORCE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drba_tpu.ops.splat_stencil import (
    _align_extra, _band_bounds, _choose_blocks, _round_up,
)


def _kernel(bounds_ref, v_hbm, f_hbm, out_ref, vwin, fwin, cwin, vsem, fsem,
            *, n_pb, n_bands, pblk, hb, rows, r, w_out, wpad):
    pb = pl.program_id(0)
    b = pl.program_id(1)
    t = pb * n_bands + b
    total = n_pb * n_bands

    def dmas(slot, tt):
        pbb = tt // n_bands
        bb = tt % n_bands
        vc = pltpu.make_async_copy(
            v_hbm.at[
                pl.ds(pbb * pblk, pblk),
                pl.ds(pl.multiple_of(bb * hb, 8), rows),
                :,
            ],
            vwin.at[slot],
            vsem.at[slot],
        )
        fc = pltpu.make_async_copy(
            f_hbm.at[:, pl.ds(pl.multiple_of(bb * hb, 8), rows), :],
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

    # derive the corner planes once per step (VPU, ~rows*wpad*10 ops) —
    # absolute coords: col j -> x = j - r; row i -> y = band_start + i - r
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

    out_ref[...] = jnp.zeros((pblk, hb, w_out), jnp.float32)

    yb_lo = bounds_ref[b, 0]
    yb_hi = bounds_ref[b, 1]
    dx_lo = bounds_ref[b, 2]
    dx_hi = bounds_ref[b, 3]

    def block_body(b8, _):
        base = pl.multiple_of(b8 * 8, 8)
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
                        vsb = vwin[slot, :, pl.ds(base, hb + 8), sl_x]
                        dx0b = cwin[0, pl.ds(base, hb + 8), sl_x]
                        dy0b = cwin[1, pl.ds(base, hb + 8), sl_x]
                        wx1b = cwin[2, pl.ds(base, hb + 8), sl_x]
                        wy1b = cwin[3, pl.ds(base, hb + 8), sl_x]
                        cw = jnp.where(dx0b == dxk, 1.0 - wx1b, 0.0) + jnp.where(
                            dx0b == dxk - 1, wx1b, 0.0
                        )
                        for j in range(8):
                            y0j = base + j
                            dyk_f = (2 * r - y0j).astype(jnp.float32) - r
                            valid = (y0j <= 2 * r).astype(jnp.float32)
                            wy = (
                                jnp.where(dy0b[j : j + hb, :] == dyk_f, 1.0 - wy1b[j : j + hb, :], 0.0)
                                + jnp.where(dy0b[j : j + hb, :] == dyk_f - 1, wy1b[j : j + hb, :], 0.0)
                            ) * valid
                            out_ref[...] += vsb[:, j : j + hb, :].astype(jnp.float32) * (
                                wy * cw[j : j + hb, :]
                            )[None]
        return 0

    jax.lax.fori_loop(yb_lo, yb_hi, block_body, 0)


@functools.partial(jax.jit, static_argnames=("radius",))
def splat_planes_inkernel(planes, flow, radius=8):
    p, h, w = planes.shape
    vdt = planes.dtype if planes.dtype == jnp.bfloat16 else jnp.float32
    r = radius
    extra = _align_extra(r)
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
    big = jnp.float32(512.0)
    dx0 = jnp.clip(x0 - gx, -big, big)
    dy0 = jnp.clip(y0 - gy, -big, big)

    blocks = _choose_blocks(p, h, wpad, r, vbytes=4)
    assert blocks is not None
    pblk, hb = blocks
    rows = hb + 2 * r + extra
    row_pad_hi = _round_up(h + 2 * r + extra, hb) - h - r

    def pad2(x, fill):
        return jnp.pad(x, ((r, row_pad_hi), (r, wpad - w - r)), constant_values=fill)

    # bounds still come from the XLA-side corner offsets (reduction only —
    # no stacked weight materialization)
    dx0p = pad2(dx0, big)
    dy0p = pad2(dy0, big)
    bounds = _band_bounds(dx0p, dy0p, h, hb, rows, r)

    # only the two absolute-position planes travel to the kernel; the pad
    # fill -1e9 floors to itself so the derived corners clip to the +-512
    # sentinel (matches nothing) and the fractional parts are 0
    fstack = jnp.stack([pad2(fx, -1e9), pad2(fy, -1e9)])

    ppad = -(-p // pblk) * pblk
    vpad = jnp.pad(
        planes.astype(vdt),
        ((0, ppad - p), (r, row_pad_hi), (r, wpad - w - r)),
    )

    n_pb, n_bands = ppad // pblk, h // hb
    kernel = functools.partial(
        _kernel, n_pb=n_pb, n_bands=n_bands, pblk=pblk, hb=hb, rows=rows,
        r=r, w_out=w, wpad=wpad,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_pb, n_bands),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((pblk, hb, w), lambda pb, b, bounds: (pb, b, 0)),
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
        out_shape=jax.ShapeDtypeStruct((ppad, h, w), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(bounds, vpad, fstack)
    return out[:p]


def main():
    from drba_tpu.ops.splat_stencil import splat_planes_stencil

    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() != "cpu"
    if on_tpu:
        P, H, W, R = 68, 544, 960, 12
    else:
        P, H, W, R = 5, 64, 192, 6
    planes = jnp.asarray(rng.uniform(0, 1, (P, H, W)),
                         jnp.bfloat16 if on_tpu else jnp.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    f = np.stack([4.0 + 2.0 * np.sin(xx / 53.0), 1.5 * np.cos(yy / 37.0)],
                 axis=-1)
    f[100:200, 50:150] = -3.0 if not on_tpu else f[100:200, 50:150]
    flow = jnp.asarray(f)

    ref = np.asarray(splat_planes_stencil(planes, flow, radius=R))
    new = np.asarray(splat_planes_inkernel(planes, flow, radius=R))
    err = np.abs(ref - new).max()
    print(f"max |ref - inkernel| = {err:.2e}", flush=True)
    assert err == 0.0, err

    if not on_tpu:
        print("CPU parity OK (interpret mode)")
        return

    sync = jax.jit(lambda v: jnp.sum(v))
    for name, fn in (("prod", splat_planes_stencil),
                     ("inkernel", splat_planes_inkernel)):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(planes, flow, n, fn=fn):
            def body(_, carry):
                return fn(planes + carry[0, 0, 0] * 0, flow, radius=R)
            return jax.lax.fori_loop(0, n, body,
                                     jnp.zeros(planes.shape, jnp.float32))

        n = 8
        float(sync(loop(planes, flow, n)))
        t0 = time.perf_counter()
        float(sync(loop(planes, flow, n)))
        dt = (time.perf_counter() - t0) / n * 1e3
        print(f"{name}: {dt:7.2f} ms per ({P},{H},{W}) r={R} splat", flush=True)


if __name__ == "__main__":
    main()
