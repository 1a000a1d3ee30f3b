"""Narrow-window warp kernel probe: unquantized window starts.

NEGATIVE RESULT (measured 2026-08-20, .tpu_results/exp_warp_narrow.log):
every xq<128 variant fails Mosaic lowering — "Failed to prove that a tile
index in dimension 3 is divisible by the tiling (128)" on the HBM-side
memref_slice feeding the window DMA. HBM slices carry the same (8,128)
tiled layout as VMEM refs, so lane starts MUST be 128-multiples; do not
re-attempt sub-128 quantization. The round-5 follow-up that works is the
ANCHOR change (floor(min) starts, landed in ops/warp_mxu.py) swept by
scripts/exp_warp_r5.py.

Original hypothesis (falsified): the production kernel quantizes per-tile
window starts to 128 lanes / 8 sublanes, which forces ww=384/wh=32 for
guaranteed coverage (window must contain a 131-col span wherever the
128-multiple lands). That quantization was assumed required by Mosaic for
the dynamic-slice starts — but the slice feeding the async window DMA is on
the HBM-side operand, where alignment rules MIGHT have been looser than for
VMEM refs.

Hypothesis: with starts quantized to q lanes, guaranteed coverage needs
ww >= 131 + (q-1) + spread_budget. q=1 (or 8/64) admits ww=256 with the SAME
structural margin as the production (384, q=128) config — at 2/3 the matmul
FLOPs, 2/3 the tent-build VPU work and 2/3 the window DMA. Same algebra
vertically: q=1 rows admits wh=16 with ~6 px of intra-tile vertical spread
margin (kept as a second variant; wh stays 16-multiple for the bf16
(c*wh, ww) view).

This script carries a self-contained copy of the kernel with the
quantization as a parameter; production stays untouched until a real-TPU
run validates lowering AND timing (CLAUDE.md round-4 rule).

    python scripts/exp_warp_narrow.py [iters]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TH, TW = 8, 128
ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 8

sync = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))


def _kernel(ys_ref, xs_ref, qx_ref, qy_ref, img_ref, out_ref, win, sem,
            *, nty, ntx, wh, ww, c, xq, yq):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    t = (b * nty + i) * ntx + j
    total = pl.num_programs(0) * nty * ntx

    def win_dma(slot, tt):
        bb = tt // (nty * ntx)
        ys = ys_ref[tt] if yq == 1 else pl.multiple_of(ys_ref[tt], yq)
        xs = xs_ref[tt] if xq == 1 else pl.multiple_of(xs_ref[tt], xq)
        return pltpu.make_async_copy(
            img_ref.at[bb, :, pl.ds(ys, wh), pl.ds(xs, ww)],
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

    m = win[slot].reshape(c * wh, ww)
    xxf = jax.lax.broadcasted_iota(jnp.int32, (ww, TW), 0).astype(jnp.float32)
    rrf = jax.lax.broadcasted_iota(jnp.int32, (wh, TW), 0).astype(jnp.float32)
    for y in range(TH):
        qxy = qx_ref[0, y, :][None, :]
        bmat = jnp.clip(1.0 - jnp.abs(xxf - qxy), 0.0, 1.0)
        hb = jnp.dot(m, bmat.astype(m.dtype), preferred_element_type=jnp.float32)
        qyy = qy_ref[0, y, :][None, :]
        a = jnp.clip(1.0 - jnp.abs(rrf - qyy), 0.0, 1.0)
        out_ref[0, :, y, :] = jnp.sum(
            hb.reshape(c, wh, TW) * a[None], axis=1
        ).astype(out_ref.dtype)


def _prep(px, py, h, w, wh, ww, xq, yq):
    bsz, ho, wo = px.shape
    nty, ntx = ho // TH, wo // TW
    px = jnp.clip(px.astype(jnp.float32), 0.0, w - 1)
    py = jnp.clip(py.astype(jnp.float32), 0.0, h - 1)
    x0 = jnp.minimum(jnp.floor(px), w - 2).astype(jnp.int32)
    y0 = jnp.minimum(jnp.floor(py), h - 2).astype(jnp.int32)
    xt = x0.reshape(bsz, nty, TH, ntx, TW)
    xs = jnp.clip((xt.min(axis=(2, 4)) + xt.max(axis=(2, 4))) // 2 - ww // 2,
                  0, w - ww) // xq * xq
    yt = y0.reshape(bsz, nty, TH, ntx, TW)
    ys = jnp.clip((yt.min(axis=(2, 4)) + yt.max(axis=(2, 4))) // 2
                  - (wh - 2) // 2, 0, h - wh) // yq * yq
    xs_b = jnp.repeat(jnp.repeat(xs, TH, axis=1), TW, axis=2)
    ys_b = jnp.repeat(jnp.repeat(ys, TH, axis=1), TW, axis=2)
    qx = jnp.clip(px - xs_b, 0.0, ww - 1.0)
    qy = jnp.clip(py - ys_b, 0.0, wh - 1.0)
    covered = (jnp.abs(px - xs_b - qx) <= 1e-6) & (jnp.abs(py - ys_b - qy) <= 1e-6)
    return qx, qy, ys.reshape(-1), xs.reshape(-1), covered


@functools.partial(jax.jit, static_argnames=("wh", "ww", "xq", "yq"))
def backwarp_q(img, flow, wh, ww, xq, yq):
    bsz, h, w, c = img.shape
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    px = gx + flow[..., 0].astype(jnp.float32)
    py = gy + flow[..., 1].astype(jnp.float32)
    w_pad = (w + TW - 1) // TW * TW
    if w_pad != w:
        img = jnp.pad(img, ((0, 0), (0, 0), (0, w_pad - w), (0, 0)), mode="edge")
    img_chw = jnp.transpose(img, (0, 3, 1, 2))
    ho, wo = px.shape[1], px.shape[2]
    nty, ntx = ho // TH, wo // TW
    qx, qy, ys, xs, covered = _prep(px, py, h, w_pad, wh, ww, xq, yq)
    plane = pl.BlockSpec((1, TH, TW), lambda b, i, j, ys, xs: (b, i, j))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, nty, ntx),
        in_specs=[plane, plane, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, c, TH, TW), lambda b, i, j, ys, xs: (b, 0, i, j)),
        scratch_shapes=[
            pltpu.VMEM((2, c, wh, ww), img_chw.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, nty=nty, ntx=ntx, wh=wh, ww=ww, c=c,
                          xq=xq, yq=yq),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, c, ho, wo), img_chw.dtype),
        interpret=jax.default_backend() == "cpu",
    )(ys, xs, qx, qy, img_chw)
    return jnp.transpose(out, (0, 2, 3, 1)), covered


def flow_field(rng, bsz, h, w, mag, kind):
    if kind == "pan":
        f = np.tile(np.array([mag, mag * 0.3], np.float32), (bsz, h, w, 1))
        f += rng.normal(0, 0.5, (bsz, h, w, 2)).astype(np.float32)
    else:  # zoom: divergent
        yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
        cx, cy = w / 2, h / 2
        fx = (xx - cx) / max(cx, 1) * mag
        fy = (yy - cy) / max(cy, 1) * mag
        f = np.stack([fx, fy], -1)[None].repeat(bsz, 0)
    return jnp.asarray(f)


def main():
    from drba_tpu.ops.warp import backwarp
    from drba_tpu.ops.warp_mxu import backwarp_mxu

    rng = np.random.default_rng(0)
    B, H, W, C = 6, 1088, 1920, 19
    img = jnp.asarray(rng.normal(0, 1, (B, H, W, C)), jnp.bfloat16)

    variants = [
        ("prod (32,384,q128)", None),
        ("(32,256,xq1)", (32, 256, 1, 8)),
        ("(32,256,xq64)", (32, 256, 64, 8)),
        ("(16,256,xq1,yq1)", (16, 256, 1, 1)),
        ("(32,384,xq1)", (32, 384, 1, 8)),
    ]

    # correctness + coverage first at modest pans/zooms
    ref_fn = jax.jit(lambda im, fl: backwarp(im, fl))
    for kind, mag in (("pan", 8.0), ("pan", 40.0), ("zoom", 12.0)):
        fl = flow_field(rng, B, H, W, mag, kind)
        ref = np.asarray(ref_fn(img, fl).astype(jnp.float32))
        for name, cfg in variants:
            if cfg is None:
                got = np.asarray(backwarp_mxu(img, fl).astype(jnp.float32))
                cov = ""
            else:
                wh, ww, xq, yq = cfg
                o, covered = backwarp_q(img, fl, wh, ww, xq, yq)
                got = np.asarray(o.astype(jnp.float32))
                cov = f" cov={float(jnp.mean(covered.astype(jnp.float32))):.4f}"
            err = np.abs(got - ref)
            frac = (err > 0.05).mean()
            print(f"{kind}{mag:5.1f} {name:20s} mismatch>{0.05}: "
                  f"{frac:.5f}{cov}", flush=True)

    # timing (loop in one jit; genuine carry dependence)
    fl = flow_field(rng, B, H, W, 8.0, "pan")

    def timeit(name, fn):
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(im, fl, n):
            def body(_, carry):
                eps = (jnp.mean(carry.astype(jnp.float32))
                       * jnp.float32(1e-20)).astype(im.dtype)
                out = fn(im + eps, fl)
                return out

            return jax.lax.fori_loop(0, n, body, jnp.zeros_like(im))

        out = loop(img, fl, ITERS)
        float(sync(out[0, 0, 0]))
        t0 = time.perf_counter()
        out = loop(img, fl, ITERS)
        float(sync(out[0, 0, 0]))
        print(f"{name:20s} {(time.perf_counter() - t0) / ITERS * 1e3:8.2f} ms",
              flush=True)

    timeit("prod (32,384,q128)", lambda im, fl: backwarp_mxu(im, fl))
    for name, cfg in variants[1:]:
        wh, ww, xq, yq = cfg
        timeit(name, lambda im, fl, a=wh, b=ww, x=xq, y=yq:
               backwarp_q(im, fl, a, b, x, y)[0])


if __name__ == "__main__":
    main()
