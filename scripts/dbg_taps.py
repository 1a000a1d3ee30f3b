"""Debug timing: where does the conv-chain kernel's time go?

Self-contained kernel variants (numerics intentionally wrong for some) to
attribute cost between matmuls, gx (sublane-offset) operand slices, dy
slices, and buffer writes. Not part of the product.
"""

import sys, os, time, functools
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sync = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
N, H, W = 3, 544, 960
P, PW = 480, 488
HB = 32


def make_kernel(mode):
    def kernel(x_hbm, wk, out_ref, win, bufB, sem):
        ni = pl.program_id(0)
        b = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[ni, pl.ds(b * HB, HB + 4), :, :], win.at[0], sem.at[0])
        cp.start()
        cp.wait()
        if mode.startswith("real_shape"):
            # mimic the real chain exactly: conv1 out hb+2 rows into bufB,
            # conv2 reads bufB with dy offsets
            for conv in range(2):
                rows = HB + 2 if conv == 0 else HB
                src = win if conv == 0 else bufB
                idx0 = (0,) if conv == 0 else ()
                if "bias" in mode:
                    acc = jnp.broadcast_to(
                        wk[0, 0:1, :].astype(jnp.float32), (rows * P, 128))
                else:
                    acc = jnp.zeros((rows * P, 128), jnp.float32)
                for dy in range(3):
                    for gx in range(3):
                        a = src[idx0 + (pl.ds(conv + dy, rows),
                                        pl.ds(gx, P), slice(0, 128))]
                        acc = acc + jnp.dot(a.reshape(rows * P, 128),
                                            wk[dy * 3 + gx],
                                            preferred_element_type=jnp.float32)
                y = acc.astype(jnp.bfloat16).reshape(rows, P, 128)
                if conv == 0:
                    bufB[pl.ds(1, rows), pl.ds(1, P), slice(0, 128)] = y
                    if "mask" in mode:
                        @pl.when(jnp.logical_or(b * HB < 2,
                                                b * HB + HB + 2 > H))
                        def _():
                            gi = jax.lax.broadcasted_iota(
                                jnp.int32, (rows, 1, 1), 0) + (b * HB - 1)
                            ym = jnp.where((gi >= 0) & (gi < H), y,
                                           jnp.zeros_like(y))
                            bufB[pl.ds(1, rows), pl.ds(1, P),
                                 slice(0, 128)] = ym
                else:
                    out_ref[0] = y
            return
        if mode == "noop":
            # DMA + buffer writes only — the zero-matmul floor
            y0 = win[0, pl.ds(0, HB + 2), pl.ds(0, P), :] * 2.0
            bufB[pl.ds(1, HB + 2), pl.ds(1, P), slice(0, 128)] = y0
            y1 = bufB[pl.ds(0, HB), pl.ds(0, P), :] * 2.0
            out_ref[0] = y1
            return
        if mode == "dmaonly":
            out_ref[0] = win[0, pl.ds(2, HB), pl.ds(1, P), :]
            return
        if mode == "kpack":
            # one K=1152 matmul per conv: taps concatenated along K so the
            # MXU accumulates internally instead of 9 RMW passes over a
            # VMEM-resident f32 accumulator
            wk2 = wk[...].reshape(9 * 128, 128)
            for conv in range(2):
                rows = HB + 2 if conv == 0 else HB
                src = win if conv == 0 else bufB
                idx0 = (0,) if conv == 0 else ()
                taps = [
                    src[idx0 + (pl.ds(conv + dy, rows), pl.ds(gx, P),
                                slice(0, 128))].reshape(rows * P, 128)
                    for dy in range(3) for gx in range(3)
                ]
                a = jnp.concatenate(taps, axis=1)  # (rows*P, 1152)
                y = jnp.dot(a, wk2, preferred_element_type=jnp.float32)
                y = y.astype(jnp.bfloat16).reshape(rows, P, 128)
                if conv == 0:
                    bufB[pl.ds(1, rows), pl.ds(1, P), slice(0, 128)] = y
                else:
                    out_ref[0] = y
            return
        if mode == "bufB":
            # in-place -> separate intermediate buffer, same extents as full
            for conv in range(2):
                src = win if conv == 0 else bufB
                idx0 = (0,) if conv == 0 else ()
                acc = jnp.zeros((HB * P, 128), jnp.float32)
                for dy in range(3):
                    for gx in range(3):
                        a = src[idx0 + (pl.ds(dy, HB), pl.ds(gx, P),
                                        slice(0, 128))]
                        acc = acc + jnp.dot(a.reshape(HB * P, 128),
                                            wk[dy * 3 + gx],
                                            preferred_element_type=jnp.float32)
                y = acc.astype(jnp.bfloat16).reshape(HB, P, 128)
                if conv == 0:
                    bufB[pl.ds(2, HB), pl.ds(1, P), slice(0, 128)] = y
                else:
                    out_ref[0] = y
            return
        for conv in range(2):
            if mode == "prelu_f32":
                v = win[0]
                win[0] = jnp.where(v.astype(jnp.float32) >= 0, v, v * 0.25)
            elif mode == "prelu_minmax":
                v = win[0]
                win[0] = jnp.maximum(v, 0) + jnp.minimum(v, 0) * 0.25
            elif mode == "prelu_int16":
                v = win[0]
                neg = jax.lax.bitcast_convert_type(v, jnp.int16) < 0
                win[0] = jnp.where(neg, v * 0.25, v)
            acc = jnp.zeros((HB * P, 128), jnp.float32)
            for dy in range(3):
                if mode == "one_wide":
                    a = win[0, pl.ds(dy, HB), pl.ds(0, P), :]
                    acc = acc + jnp.dot(a.reshape(HB * P, 128),
                                        wk[dy * 3], preferred_element_type=jnp.float32)
                    continue
                for gx in range(3):
                    off = 0 if mode == "gx0" else gx
                    a = win[0, pl.ds(dy, HB), pl.ds(off, P), :]
                    acc = acc + jnp.dot(a.reshape(HB * P, 128),
                                        wk[dy * 3 + gx],
                                        preferred_element_type=jnp.float32)
            y = acc.astype(jnp.bfloat16).reshape(HB, P, 128)
            if conv == 0:
                win[0, pl.ds(2, HB), pl.ds(1, P), :] = y
            else:
                out_ref[0] = y
    return kernel


def run(mode):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (N, H + 4, PW, 128)), jnp.bfloat16)
    wk = jnp.asarray(rng.normal(0, 0.1, (9, 128, 128)), jnp.bfloat16)
    fn = jax.jit(functools.partial(
        pl.pallas_call,
        grid=(N, H // HB),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, HB, P, 128), lambda ni, b: (ni, b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, P, 128), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((1, HB + 4, PW, 128), jnp.bfloat16),
                        pltpu.VMEM((HB + 4, PW, 128), jnp.bfloat16),
                        pltpu.SemaphoreType.DMA((1,))],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
    )(make_kernel(mode)))

    out = fn(x, wk)
    float(sync(out))
    t0 = time.perf_counter()
    for _ in range(8):
        out = fn(x, wk)
    float(sync(out))
    print(f"{mode:12s} {(time.perf_counter() - t0) / 8 * 1e3:8.2f} ms", flush=True)


for mode in sys.argv[1:] or ["full", "gx0", "one_wide"]:
    run(mode)
