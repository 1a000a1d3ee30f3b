"""Experiment: motion-adaptive tap-block bounds for the MXU warp kernel.

The adaptive kernel is now the production one (ops/warp_mxu.py); this
script keeps the superseded FULL-window kernel (every output row multiplies
all wh window rows x ww cols through the sampling matmul) as the baseline
for parity + timing comparisons.

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

from drba_tpu.ops.warp_mxu import (
    TH, TW, _prep_positions, backwarp_mxu, warp_downsample2_mxu,
)


def _kernel_full(ys_ref, xs_ref, qx_ref, qy_ref, img_ref, out_ref,
            win, sem, *, nty, ntx, wh, ww, c, spread):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    t = (b * nty + i) * ntx + j
    total = pl.num_programs(0) * nty * ntx

    # Double-buffered window DMA: grid steps run sequentially and scratch
    # persists across them, so tile t+1's window streams in behind tile t's
    # matmuls.
    def win_dma(slot, tt):
        bb = tt // (nty * ntx)
        rr = tt % (nty * ntx)
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
    m = win[t % 2].reshape(c * wh, ww)  # free: wh is a sublane-tile multiple

    # Mosaic iota is integer-only; arithmetic runs in f32 (no bf16 compares
    # on v5e), so convert once. Tent half-width 1 + spread; weight sum per
    # column is 1 + 2*spread, normalized by s.
    xx = jax.lax.broadcasted_iota(jnp.int32, (ww, TW), 0).astype(jnp.float32)
    rr = jax.lax.broadcasted_iota(jnp.int32, (wh, TW), 0).astype(jnp.float32)
    hwidth = 1.0 + spread
    s = 1.0 / (1.0 + 2.0 * spread)
    for y in range(TH):
        qxy = qx_ref[0, y, :][None, :]  # (1, TW) f32: window-relative center
        bmat = jnp.clip(hwidth - jnp.abs(xx - qxy), 0.0, 1.0) * s
        h = jnp.dot(m, bmat.astype(m.dtype),
                    preferred_element_type=jnp.float32)  # (c*wh, TW)
        h3 = h.reshape(c, wh, TW)
        qyy = qy_ref[0, y, :][None, :]
        a = jnp.clip(hwidth - jnp.abs(rr - qyy), 0.0, 1.0) * s
        out_ref[0, :, y, :] = jnp.sum(h3 * a[None], axis=1).astype(out_ref.dtype)

def _sample_chw_full(img_chw: jax.Array, px: jax.Array, py: jax.Array,
                wh: int, ww: int, spread: float = 0.0) -> jax.Array:
    """Core: sample img_chw (B,C,H,W) at centers (B,Ho,Wo) -> (B,C,Ho,Wo).

    ``spread=0``: plain bilinear; ``spread=0.5``: each output averages the
    two taps at center +- 0.5 per axis (the fused 2x-downsample)."""
    bsz, c, h, w = img_chw.shape
    _, ho, wo = px.shape
    assert ho % TH == 0 and wo % TW == 0 and w >= ww and h >= wh, (ho, wo, h, w)
    assert wh % 16 == 0 and ww % 128 == 0, (wh, ww)
    nty, ntx = ho // TH, wo // TW

    qx, qy, ys, xs, _ = _prep_positions(px, py, h, w, wh, ww, spread)

    plane = pl.BlockSpec((1, TH, TW), lambda b, i, j, ys, xs: (b, i, j))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, nty, ntx),
        in_specs=[
            plane,
            plane,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, c, TH, TW), lambda b, i, j, ys, xs: (b, 0, i, j)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, c, wh, ww), img_chw.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_full, nty=nty, ntx=ntx, wh=wh, ww=ww, c=c,
                          spread=spread),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, c, ho, wo), img_chw.dtype),
        interpret=jax.default_backend() == "cpu",
    )(ys, xs, qx, qy, img_chw)

@functools.partial(jax.jit, static_argnames=("wh", "ww"))
def backwarp_full(img, flow, wh=32, ww=384):
    """The superseded full-window kernel (baseline)."""
    _, h, w, _ = img.shape
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    px = jnp.clip(gx + flow[..., 0].astype(jnp.float32), 0.0, w - 1)
    py = jnp.clip(gy + flow[..., 1].astype(jnp.float32), 0.0, h - 1)
    img_chw = jnp.transpose(img, (0, 3, 1, 2))
    out = _sample_chw_full(img_chw, px, py, wh, ww)
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

    for mag, jit_ in ((8.0, 1.5), (40.0, 3.0)):
        flow = _pan_flow(b, h, w, mag, mag * 0.3, jit_, 1, dt)
        ref = np.asarray(backwarp_full(img, flow)).astype(np.float32)
        new = np.asarray(backwarp_mxu(img, flow)).astype(np.float32)
        err = np.abs(ref - new).max()
        err_r = np.abs(ref - np.asarray(backwarp_rollup(img, flow)).astype(
            np.float32)).max()
        print(f"pan {mag:4.0f}px: max |full - adaptive| = {err:.2e}, "
              f"|full - rollup| = {err_r:.2e}", flush=True)
        assert err <= (5e-3 if dt == jnp.bfloat16 else 1e-5), err
        assert err_r <= (5e-3 if dt == jnp.bfloat16 else 1e-5), err_r

    if not on_tpu:
        print("CPU parity OK (interpret mode)")
        return

    sync = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))
    for mag, jit_ in ((8.0, 1.5), (40.0, 3.0)):
        flow = _pan_flow(b, h, w, mag, mag * 0.3, jit_, 1, dt)
        img3 = img[..., :3]
        cases = (
            ("full 19ch", img, lambda im, fl: backwarp_full(im, fl)),
            ("adapt 19ch", img, lambda im, fl: backwarp_mxu(im, fl)),
            ("full 3ch", img3, lambda im, fl: backwarp_full(im, fl)),
            ("adapt 3ch", img3, lambda im, fl: backwarp_mxu(im, fl)),
            ("rollup 19ch", img, lambda im, fl: backwarp_rollup(im, fl)),
            ("rollup 3ch", img3, lambda im, fl: backwarp_rollup(im, fl)),
            ("adapt ds2", img, lambda im, fl: warp_downsample2_mxu(im, fl)),
        )
        for name, im0, fn in cases:
            # Python-loop timing over the ALREADY-CACHED standalone program
            # (a jitted fori_loop wrapper would need a fresh multi-minute AOT
            # compile per case; and jit-closure constants ship as HLO
            # literals to the remote compiler — a 238 MB captured image blows
            # the request-body limit with HTTP 413). Dispatch (~3.5-4 ms)
            # pipelines behind the 15-40 ms kernels; one sync at the end.
            n = 8
            out = fn(im0, flow)
            float(sync(out))
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(im0, flow)
            float(sync(out))
            ms = (time.perf_counter() - t0) / n * 1e3
            # ADVICE r3: one trailing sync is only valid while kernel time
            # exceeds the ~3.5-4 ms per-dispatch overhead; near that floor
            # the loop measures dispatch, not the kernel.
            floor = " [~DISPATCH FLOOR — kernel may be faster]" if ms < 6.0 else ""
            print(f"pan {mag:4.0f}px {name:11s}: {ms:7.2f} ms{floor}",
                  flush=True)




# ---------------------------------------------------------------------------
# Variant 2: row-rollup — one wide matmul per (rb, cb) covering all 8 output
# rows (the adaptive kernel issues 8 per-row (c*8,128)@(128,128) matmuls per
# block pair; rolling the rows into the N dimension gives 8x fewer, 8x wider
# matmuls at identical FLOPs and 1/8 the VPU op dispatches).
# ---------------------------------------------------------------------------

from drba_tpu.ops.warp_mxu import _tap_block_bounds


def _kernel_rollup(ys_ref, xs_ref, bnd_ref, qx_ref, qy_ref, img_ref, out_ref,
                   win, bmat_s, sem, *, nty, ntx, wh, ww, c, spread):
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

    rb_lo = bnd_ref[4 * t + 0]
    rb_hi = bnd_ref[4 * t + 1]
    cb_lo = bnd_ref[4 * t + 2]
    cb_hi = bnd_ref[4 * t + 3]

    hwidth = 1.0 + spread
    s = 1.0 / (1.0 + 2.0 * spread)
    xx = jax.lax.broadcasted_iota(jnp.int32, (128, TW), 0).astype(jnp.float32)
    rr = jax.lax.broadcasted_iota(jnp.int32, (8, TW), 0).astype(jnp.float32)

    def col_block(cb, acc):
        # B_all (128 window cols, 8*TW): column block y holds row y's tents
        for y in range(TH):
            qxy = qx_ref[0, y, :][None, :]
            bmat_s[:, y * TW : (y + 1) * TW] = (jnp.clip(
                hwidth - jnp.abs(xx + (cb * 128).astype(jnp.float32) - qxy),
                0.0, 1.0,
            ) * s).astype(bmat_s.dtype)

        def row_block(rb, acc):
            mb = win[
                slot, :,
                pl.ds(pl.multiple_of(rb * 8, 8), 8),
                pl.ds(pl.multiple_of(cb * 128, 128), 128),
            ].reshape(c * 8, 128)
            hb = jnp.dot(mb, bmat_s[...],
                         preferred_element_type=jnp.float32)  # (c*8, 8*TW)
            # A_all (8, 8*TW): column block y holds row y's vertical tents
            parts = []
            for y in range(TH):
                qyy = qy_ref[0, y, :][None, :]
                parts.append(jnp.clip(
                    hwidth - jnp.abs(rr + (rb * 8).astype(jnp.float32) - qyy),
                    0.0, 1.0,
                ) * s)
            a_all = jnp.concatenate(parts, axis=1)  # (8, 8*TW)
            return acc + jnp.sum(
                hb.reshape(c, 8, TH * TW) * a_all[None], axis=1
            )

        return jax.lax.fori_loop(rb_lo, rb_hi + 1, row_block, acc)

    acc = jax.lax.fori_loop(
        cb_lo, cb_hi + 1, col_block, jnp.zeros((c, TH * TW), jnp.float32)
    )
    for y in range(TH):
        out_ref[0, :, y, :] = acc[:, y * TW : (y + 1) * TW].astype(out_ref.dtype)


def _sample_chw_rollup(img_chw, px, py, wh, ww, spread=0.0):
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
            pltpu.VMEM((128, TH * TW), img_chw.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_rollup, nty=nty, ntx=ntx, wh=wh, ww=ww, c=c,
                          spread=spread),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, c, ho, wo), img_chw.dtype),
        interpret=jax.default_backend() == "cpu",
    )(ys, xs, bnd, qx, qy, img_chw)


@functools.partial(jax.jit, static_argnames=("wh", "ww"))
def backwarp_rollup(img, flow, wh=32, ww=384):
    _, h, w, _ = img.shape
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    px = jnp.clip(gx + flow[..., 0].astype(jnp.float32), 0.0, w - 1)
    py = jnp.clip(gy + flow[..., 1].astype(jnp.float32), 0.0, h - 1)
    img_chw = jnp.transpose(img, (0, 3, 1, 2))
    out = _sample_chw_rollup(img_chw, px, py, wh, ww)
    return jnp.transpose(out, (0, 2, 3, 1))

if __name__ == "__main__":
    main()
