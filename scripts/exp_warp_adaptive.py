"""Experiment: motion-adaptive tap-block bounds for the MXU warp kernel.

The production kernel (ops/warp_mxu.py) multiplies ALL wh=32 window rows
through the horizontal sampling matmul for every output row, then discards
all but ~2 in the vertical reduction — and always builds/multiplies the
full ww=384 sampling matrix even when a tile's x-spread fits 256 columns.
At the hot (6, 1088, 1920, 19) geometry that is ~478 MFLOP/tile where
~20 MFLOP is load-bearing.

This variant prefetches per-tile tap-block bounds (row blocks of 8, col
blocks of 128 — same trick as the splat kernel's motion-adaptive bounds)
and loops only the covered blocks: smooth-flow tiles run 2 of 4 row blocks
x 2 of 3 col blocks (~3x fewer matmul FLOPs + 1/3 less VPU tent build);
only tiles with real flow divergence pay the full window.

    FORCE_CPU=1 python scripts/exp_warp_adaptive.py   # interpret parity
    python scripts/exp_warp_adaptive.py               # TPU parity + timing
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

from drba_tpu.ops.warp_mxu import TH, TW, _prep_positions, backwarp_mxu


def _kernel(ys_ref, xs_ref, bnd_ref, qx_ref, qy_ref, img_ref, out_ref,
            win, sem, *, nty, ntx, wh, ww, c, spread):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    t = (b * nty + i) * ntx + j
    total = pl.num_programs(0) * nty * ntx

    def win_dma(slot, tt):
        bb = tt // (nty * ntx)
        return pltpu.make_async_copy(
            img_ref.at[
                bb, :,
                pl.ds(pl.multiple_of(ys_ref[tt], 8), wh),
                pl.ds(pl.multiple_of(xs_ref[tt], 128), ww),
            ],
            win.at[slot],
            sem.at[slot],
        )

    @pl.when(t == 0)
    def _():
        win_dma(0, 0).start()

    @pl.when(t + 1 < total)
    def _():
        win_dma((t + 1) % 2, t + 1).start()

    win_dma(t % 2, t).wait()
    slot = t % 2

    rb_lo = bnd_ref[t, 0]
    rb_hi = bnd_ref[t, 1]
    cb_lo = bnd_ref[t, 2]
    cb_hi = bnd_ref[t, 3]

    hwidth = 1.0 + spread
    s = 1.0 / (1.0 + 2.0 * spread)
    xx = jax.lax.broadcasted_iota(jnp.int32, (128, TW), 0).astype(jnp.float32)
    rr = jax.lax.broadcasted_iota(jnp.int32, (8, TW), 0).astype(jnp.float32)

    for y in range(TH):
        qxy = qx_ref[0, y, :][None, :]  # (1, TW)
        qyy = qy_ref[0, y, :][None, :]

        def col_block(cb, acc):
            bmat = jnp.clip(
                hwidth - jnp.abs(xx + (cb * 128).astype(jnp.float32) - qxy),
                0.0, 1.0,
            ) * s  # (128, TW)
            bmat = bmat.astype(win.dtype)

            def row_block(rb, acc):
                mb = win[
                    slot, :,
                    pl.ds(pl.multiple_of(rb * 8, 8), 8),
                    pl.ds(pl.multiple_of(cb * 128, 128), 128),
                ].reshape(c * 8, 128)
                hb = jnp.dot(mb, bmat, preferred_element_type=jnp.float32)
                a = jnp.clip(
                    hwidth - jnp.abs(rr + (rb * 8).astype(jnp.float32) - qyy),
                    0.0, 1.0,
                ) * s  # (8, TW)
                return acc + jnp.sum(hb.reshape(c, 8, TW) * a[None], axis=1)

            return jax.lax.fori_loop(rb_lo, rb_hi + 1, row_block, acc)

        acc = jax.lax.fori_loop(
            cb_lo, cb_hi + 1, col_block,
            jnp.zeros((c, TW), jnp.float32),
        )
        out_ref[0, :, y, :] = acc.astype(out_ref.dtype)


def _tap_block_bounds(qx, qy, wh, ww, spread):
    """Per-tile (rb_lo, rb_hi, cb_lo, cb_hi) covering every tent support."""
    bsz, ho, wo = qx.shape
    nty, ntx = ho // TH, wo // TW
    qxt = qx.reshape(bsz, nty, TH, ntx, TW)
    qyt = qy.reshape(bsz, nty, TH, ntx, TW)
    # tent support: cols/rows p with |p - q| < 1 + spread
    cx_lo = jnp.floor(qxt.min(axis=(2, 4)) - spread).astype(jnp.int32)
    cx_hi = jnp.floor(qxt.max(axis=(2, 4)) + spread).astype(jnp.int32) + 1
    ry_lo = jnp.floor(qyt.min(axis=(2, 4)) - spread).astype(jnp.int32)
    ry_hi = jnp.floor(qyt.max(axis=(2, 4)) + spread).astype(jnp.int32) + 1
    rb_lo = jnp.clip(ry_lo // 8, 0, wh // 8 - 1)
    rb_hi = jnp.clip(ry_hi // 8, 0, wh // 8 - 1)
    cb_lo = jnp.clip(cx_lo // 128, 0, ww // 128 - 1)
    cb_hi = jnp.clip(cx_hi // 128, 0, ww // 128 - 1)
    return jnp.stack(
        [rb_lo.reshape(-1), rb_hi.reshape(-1), cb_lo.reshape(-1),
         cb_hi.reshape(-1)], axis=-1,
    )


def _sample_chw_adaptive(img_chw, px, py, wh, ww, spread=0.0):
    bsz, c, h, w = img_chw.shape
    _, ho, wo = px.shape
    nty, ntx = ho // TH, wo // TW
    qx, qy, ys, xs, _ = _prep_positions(px, py, h, w, wh, ww, spread)
    bnd = _tap_block_bounds(qx, qy, wh, ww, spread)

    plane = pl.BlockSpec((1, TH, TW), lambda b, i, j, ys, xs, bnd: (b, i, j))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bsz, nty, ntx),
        in_specs=[plane, plane, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, c, TH, TW), lambda b, i, j, ys, xs, bnd: (b, 0, i, j)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, c, wh, ww), img_chw.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, nty=nty, ntx=ntx, wh=wh, ww=ww, c=c,
                          spread=spread),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, c, ho, wo), img_chw.dtype),
        interpret=jax.default_backend() == "cpu",
    )(ys, xs, bnd, qx, qy, img_chw)


@functools.partial(jax.jit, static_argnames=("wh", "ww"))
def backwarp_adaptive(img, flow, wh=32, ww=384):
    _, h, w, _ = img.shape
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    px = jnp.clip(gx + flow[..., 0].astype(jnp.float32), 0.0, w - 1)
    py = jnp.clip(gy + flow[..., 1].astype(jnp.float32), 0.0, h - 1)
    img_chw = jnp.transpose(img, (0, 3, 1, 2))
    out = _sample_chw_adaptive(img_chw, px, py, wh, ww)
    return jnp.transpose(out, (0, 2, 3, 1))


@functools.partial(jax.jit, static_argnames=("wh", "ww"))
def warp_downsample2_adaptive(img, flow, wh=32, ww=512):
    """Adaptive-bounds variant of ops/warp_mxu.warp_downsample2_mxu."""
    from drba_tpu.ops.resize import resize_bilinear

    _, h, w, _ = img.shape
    fm = resize_bilinear(flow, (h // 2, w // 2))
    gx = (jnp.arange(0, w, 2, dtype=jnp.float32) + 0.5)[None, None, :]
    gy = (jnp.arange(0, h, 2, dtype=jnp.float32) + 0.5)[None, :, None]
    px = jnp.clip(gx + fm[..., 0].astype(jnp.float32), 0.0, w - 1)
    py = jnp.clip(gy + fm[..., 1].astype(jnp.float32), 0.0, h - 1)
    img_chw = jnp.transpose(img, (0, 3, 1, 2))
    out = _sample_chw_adaptive(img_chw, px, py, wh, ww, spread=0.5)
    return jnp.transpose(out, (0, 2, 3, 1))


def _pan_flow(b, h, w, dx, dy, jitter, seed, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    f = np.broadcast_to(np.asarray([dx, dy], np.float32), (b, h, w, 2)).copy()
    f += rng.uniform(-jitter, jitter, f.shape).astype(np.float32)
    return jnp.asarray(f, dtype)


def main():
    on_tpu = jax.default_backend() != "cpu"
    rng = np.random.default_rng(0)
    if on_tpu:
        b, h, w, c = 6, 1088, 1920, 19
        dt = jnp.bfloat16
    else:
        b, h, w, c = 2, 64, 512, 5
        dt = jnp.float32
    img = jnp.asarray(rng.uniform(0, 1, (b, h, w, c)), dt)

    from drba_tpu.ops.warp_mxu import warp_downsample2_mxu

    for mag, jit_ in ((8.0, 1.5), (40.0, 3.0)):
        flow = _pan_flow(b, h, w, mag, mag * 0.3, jit_, 1, dt)
        ref = np.asarray(backwarp_mxu(img, flow)).astype(np.float32)
        new = np.asarray(backwarp_adaptive(img, flow)).astype(np.float32)
        err = np.abs(ref - new).max()
        refd = np.asarray(warp_downsample2_mxu(img, flow)).astype(np.float32)
        newd = np.asarray(warp_downsample2_adaptive(img, flow)).astype(np.float32)
        errd = np.abs(refd - newd).max()
        print(f"pan {mag:4.0f}px: max |prod - adaptive| = {err:.2e} "
              f"(warp) {errd:.2e} (warp+ds2)", flush=True)
        assert err <= (5e-3 if dt == jnp.bfloat16 else 1e-5), err
        assert errd <= (5e-3 if dt == jnp.bfloat16 else 1e-5), errd

    if not on_tpu:
        print("CPU parity OK (interpret mode)")
        return

    sync = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))
    for mag, jit_ in ((8.0, 1.5), (40.0, 3.0)):
        flow = _pan_flow(b, h, w, mag, mag * 0.3, jit_, 1, dt)
        for name, fn in (("prod", backwarp_mxu),
                         ("adaptive", backwarp_adaptive),
                         ("prod-ds2", warp_downsample2_mxu),
                         ("adapt-ds2", warp_downsample2_adaptive)):
            @functools.partial(jax.jit, static_argnames=("n",))
            def loop(x0, n, fn=fn):
                def body(_, carry):
                    return fn(img + carry[:1, :1, :1, :1].astype(dt), flow)
                return jax.lax.fori_loop(0, n, body, x0)

            n = 8
            float(sync(loop(img, n)))
            t0 = time.perf_counter()
            float(sync(loop(img, n)))
            ms = (time.perf_counter() - t0) / n * 1e3
            print(f"pan {mag:4.0f}px {name:9s}: {ms:7.2f} ms per "
                  f"({b},{h},{w},{c}) warp", flush=True)


if __name__ == "__main__":
    main()
