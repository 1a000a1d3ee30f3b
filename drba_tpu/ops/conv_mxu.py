"""3x3 stride-1 64-channel convolution as paired-column MXU matmuls (Pallas).

XLA's TPU conv lowering runs 64-channel 3x3 convs at large spatial dims at
~12 TF/s. This kernel feeds the MXU at full width by PAIRING adjacent pixel
columns into 128 lanes:

  * in HBM (linear layout) the padded input reshapes (H, Wp, 64) ->
    (H, Wp/2, 128) for FREE — same bytes — so the window DMA is 128-lane
    aligned and every matmul operand is full width;
  * a 3x3 conv on the paired grid is 9 pair-taps (3 dy x 3 pair-dx), each
    an accumulating (hb*W/2, 128) @ (128, 128) matmul whose weight matrix
    holds the phase-resolved sub-blocks of the original (64, 64) taps:
    out col c = 2j+po reads in col c+dx-1 = 2(j+pdx)+pi, i.e. sub-block
    (pi, po) of pair-tap (dy, pdx) is w[dy, 2*pdx+pi-po+1] when that tap
    index is within [0, 3);
  * 6 of the 12 phase sub-blocks per dy are zero -> 2x the minimum FLOPs,
    but at ~full MXU utilization.

Measured: 2.24x over lax.conv standalone at (3,544,960,64) bf16
(4.41 vs 9.88 ms/conv, in-jit loop) with bf16-level numerics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, wk_ref, b_ref, out_ref, win, sem, *, nb, hb, p_in, p_out, c2):
    n = pl.program_id(0)
    b = pl.program_id(1)
    t = n * nb + b
    total = pl.num_programs(0) * nb

    def dma(slot, tt):
        nn = tt // nb
        bb = tt % nb
        return pltpu.make_async_copy(
            x_hbm.at[nn, pl.ds(bb * hb, hb + 2), :, :],
            win.at[slot],
            sem.at[slot],
        )

    @pl.when(t == 0)
    def _():
        dma(0, 0).start()

    @pl.when(t + 1 < total)
    def _():
        dma((t + 1) % 2, t + 1).start()

    slot = t % 2
    dma(slot, t).wait()

    acc = jnp.broadcast_to(b_ref[...].astype(jnp.float32), (hb * p_out, c2))
    for k in range(9):
        dy, pdx = k // 3, k % 3  # pdx 0,1,2 == pair offset -1,0,+1
        a = win[slot, dy : dy + hb, pdx : pdx + p_out, :].reshape(hb * p_out, c2)
        acc = acc + jnp.dot(a, wk_ref[k], preferred_element_type=jnp.float32)
    out_ref[...] = acc.reshape(1, hb, p_out, c2).astype(out_ref.dtype)


def _paired_weights(w: jax.Array, dtype) -> jax.Array:
    """(3,3,64,64) HWIO taps -> (9, 128, 128) phase-resolved pair-taps."""
    blocks = []
    for dy in range(3):
        for pdx in (-1, 0, 1):
            rows = []
            for pi in (0, 1):
                cols = []
                for po in (0, 1):
                    dx = 2 * pdx + pi - po + 1
                    if 0 <= dx < 3:
                        cols.append(w[dy, dx])
                    else:
                        cols.append(jnp.zeros((64, 64), w.dtype))
                rows.append(jnp.concatenate(cols, axis=1))
            blocks.append(jnp.concatenate(rows, axis=0))
    return jnp.stack(blocks).astype(dtype)  # (9, 128, 128)


def conv3x3_c64(x: jax.Array, w: jax.Array, bias=None,
                interpret: bool | None = None) -> jax.Array:
    """3x3/stride-1/pad-1 conv, C_in=C_out=64, NHWC x / HWIO w.

    Accumulation is f32; result in x.dtype. Requires even W and H divisible
    by a band height (16 or 8).
    """
    N, H, W, C = x.shape
    assert C == 64 and w.shape == (3, 3, 64, 64), (x.shape, w.shape)
    hb = next((cand for cand in (16, 8) if H % cand == 0), None)
    assert hb is not None and W % 2 == 0, (H, W)

    # pair grid: left pad 2 so output pair j reads input pairs j..j+2;
    # sublane (pair) extent padded to a multiple of 8 for aligned DMA rows
    p_out = W // 2
    p_in = (p_out + 2 + 7) // 8 * 8
    xp = jnp.pad(x, ((0, 0), (1, 1), (2, 2 * p_in - W - 2), (0, 0)))
    # free in HBM: (.., 2*p_in, 64) and (.., p_in, 128) are the same bytes
    xp = xp.reshape(N, H + 2, p_in, 128)

    wk = _paired_weights(w, x.dtype)
    if bias is None:
        b_row = jnp.zeros((1, 128), jnp.float32)
    else:
        b_row = jnp.tile(bias.reshape(1, 64), (1, 2)).astype(jnp.float32)

    nb = H // hb
    kernel = functools.partial(
        _kernel, nb=nb, hb=hb, p_in=p_in, p_out=p_out, c2=128,
    )
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    out = pl.pallas_call(
        kernel,
        grid=(N, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hb, p_out, 128), lambda n, b: (n, b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, p_out, 128), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, hb + 2, p_in, 128), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(xp, wk, b_row)
    return out.reshape(N, H, W, 64)
