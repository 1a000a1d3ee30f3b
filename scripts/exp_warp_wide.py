"""Experiment: grouped-row sampling matmuls for the MXU warp kernel.

The production kernel (ops/warp_mxu.py) issues one (C*WH, WW) @ (WW, 128)
matmul per output row (8 per tile) with the VPU tent build interleaved.
This variant builds the sampling matrix for YB output rows at once and
issues TH/YB matmuls of N = YB*128 — wider N amortizes MXU pipeline
ramp-up and batches the VPU build.

    python scripts/exp_warp_wide.py          # parity (CPU interpret) + TPU timing
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import functools

import jax

if os.environ.get("FORCE_CPU"):
    # the axon sitecustomize pins JAX_PLATFORMS=axon; the env var alone
    # cannot force CPU — the config update can (before backend init)
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from drba_tpu.ops.warp_mxu import TH, TW, _prep_positions

YB_DEFAULT = 4  # output rows per matmul group


def _kernel(ys_ref, xs_ref, qx_ref, qy_ref, img_ref, out_ref,
            win, sem, *, nty, ntx, wh, ww, c, spread, YB):
    b = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    t = (b * nty + i) * ntx + j
    total = pl.num_programs(0) * nty * ntx

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
    m = win[t % 2].reshape(c * wh, ww)

    nw = YB * TW
    xx = jax.lax.broadcasted_iota(jnp.int32, (ww, nw), 0).astype(jnp.float32)
    rr = jax.lax.broadcasted_iota(jnp.int32, (wh, nw), 0).astype(jnp.float32)
    hwidth = 1.0 + spread
    s = 1.0 / (1.0 + 2.0 * spread)
    for g in range(TH // YB):
        # (YB, TW) centers -> flattened (1, YB*TW)
        qxg = qx_ref[0, g * YB:(g + 1) * YB, :].reshape(1, nw)
        bmat = jnp.clip(hwidth - jnp.abs(xx - qxg), 0.0, 1.0) * s
        h = jnp.dot(m, bmat.astype(m.dtype),
                    preferred_element_type=jnp.float32)  # (c*wh, YB*TW)
        h4 = h.reshape(c, wh, nw)
        qyg = qy_ref[0, g * YB:(g + 1) * YB, :].reshape(1, nw)
        a = jnp.clip(hwidth - jnp.abs(rr - qyg), 0.0, 1.0) * s
        og = jnp.sum(h4 * a[None], axis=1)  # (c, YB*TW)
        for y in range(YB):
            out_ref[0, :, g * YB + y, :] = og[
                :, y * TW:(y + 1) * TW].astype(out_ref.dtype)


def _sample_chw(img_chw, px, py, wh, ww, spread=0.0, YB=YB_DEFAULT):
    bsz, c, h, w = img_chw.shape
    _, ho, wo = px.shape
    nty, ntx = ho // TH, wo // TW
    qx, qy, ys, xs, _ = _prep_positions(px, py, h, w, wh, ww, spread)
    plane = pl.BlockSpec((1, TH, TW), lambda b, i, j, ys, xs: (b, i, j))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(bsz, nty, ntx),
        in_specs=[plane, plane, pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (1, c, TH, TW), lambda b, i, j, ys, xs: (b, 0, i, j)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, c, wh, ww), img_chw.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, nty=nty, ntx=ntx, wh=wh, ww=ww, c=c,
                          spread=spread, YB=YB),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bsz, c, ho, wo), img_chw.dtype),
        interpret=jax.default_backend() == "cpu",
    )(ys, xs, qx, qy, img_chw)


@functools.partial(jax.jit, static_argnames=("wh", "ww", "YB"))
def backwarp_wide(img, flow, wh=32, ww=384, YB=YB_DEFAULT):
    _, h, w, _ = img.shape
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    px = jnp.clip(gx + flow[..., 0].astype(jnp.float32), 0.0, w - 1)
    py = jnp.clip(gy + flow[..., 1].astype(jnp.float32), 0.0, h - 1)
    img_chw = jnp.transpose(img, (0, 3, 1, 2))
    out = _sample_chw(img_chw, px, py, wh, ww, YB=YB)
    return jnp.transpose(out, (0, 2, 3, 1))


def main():
    from drba_tpu.ops.warp_mxu import backwarp_mxu

    rng = np.random.default_rng(0)
    on_tpu = jax.default_backend() != "cpu"
    if not on_tpu:
        B, H, W, C = 1, 64, 512, 5
    else:
        B, H, W, C = 6, 1088, 1920, 19
    img = jnp.asarray(rng.uniform(0, 1, (B, H, W, C)),
                      jnp.bfloat16 if on_tpu else jnp.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    f = np.stack([8.0 + 3.0 * np.sin(xx / 97.0) * np.cos(yy / 53.0),
                  2.0 * np.sin(yy / 71.0)], axis=-1)[None]
    flow = jnp.asarray(np.tile(f, (B, 1, 1, 1))).astype(img.dtype)

    ref = np.asarray(backwarp_mxu(img, flow), np.float32)
    for yb in (2, 4, 8):
        new = np.asarray(backwarp_wide(img, flow, YB=yb), np.float32)
        err = np.abs(ref - new).max()
        print(f"max |ref - wide(YB={yb})| = {err:.2e}", flush=True)
        assert err < (1e-2 if on_tpu else 1e-5)

    if not on_tpu:
        print("CPU parity OK (interpret mode); run on TPU for timing")
        return

    sync = jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))
    variants = [("prod", backwarp_mxu)] + [
        (f"wide YB={yb}", functools.partial(backwarp_wide, YB=yb))
        for yb in (2, 4, 8)
    ]
    for name, fn in variants:
        @functools.partial(jax.jit, static_argnames=("n",))
        def loop(img, flow, n, fn=fn):
            def body(_, carry):
                return fn(img + carry[0, 0, 0, 0] * 0, flow)
            return jax.lax.fori_loop(0, n, body, jnp.zeros_like(img))

        n = 8
        float(sync(loop(img, flow, n)))
        t0 = time.perf_counter()
        float(sync(loop(img, flow, n)))
        dt = (time.perf_counter() - t0) / n * 1e3
        floor = " [~dispatch floor]" if dt < 6.0 else ""
        print(f"{name:10s}: {dt:7.2f} ms per (6,1088,1920,19) warp{floor}",
              flush=True)


if __name__ == "__main__":
    main()
