"""Fused window-attention Pallas kernel (TPU).

One grid step computes one (Lq, Lpad) score chunk of one attention window
entirely in VMEM: ``softmax(q @ k^T * scale + mask) @ v``. The XLA path
materializes the (B, L, L) score tensor in HBM (bf16 write + read ~5.5 ms
per layer at gmflow's splits=8 geometry, bandwidth-bound); keeping scores
chunk-resident makes the layer compute-bound (~2x).

Matches models/gmflow_net._window_attention's einsum semantics (reference:
models/gmflow/transformer.py:46-105): scores and softmax in f32, f32 kept
through the value matmul (a bf16 cast between softmax and its consumer
matmul blocks fusion — docs/ROADMAP.md), output cast to the input dtype.

Shifted windows pass per-position int32 region ids (the swin shift mask:
token i may attend token j iff their spatial regions match,
transformer.py:61-87); keys beyond the true length L (sublane padding to
a multiple of 8) are masked unconditionally.

Must NOT be vmapped (grid-indexed blocks); callers batch windows into the
leading axis explicitly (gmflow already does).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_LQ = 512  # query-chunk rows per grid step


def _kernel(q_ref, k_ref, v_ref, rr_ref, rc_ref, out_ref, *, L, scale,
            with_mask):
    q = q_ref[0]                                  # (Lq, c) bf16/f32
    k = k_ref[0]                                  # (Lpad, c)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale                                     # (Lq, Lpad) f32
    lpad = k.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], lpad), 1)
    dead = col >= L
    if with_mask:
        dead = dead | (rr_ref[0][:, None] != rc_ref[0][None, :])
    s = jnp.where(dead, -1e9, s)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)
    out_ref[0] = jax.lax.dot_general(
        p, v_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("with_mask",))
def window_attention_mxu(q: jax.Array, k: jax.Array, v: jax.Array,
                         rid: jax.Array | None = None,
                         with_mask: bool = False) -> jax.Array:
    """``softmax(q k^T / sqrt(c) [+ shift mask]) v`` per window.

    q, k, v: (B, L, c) with c a lane multiple (gmflow: c=128). ``rid``
    (B, L) int32 region ids gates attention to same-region pairs when
    ``with_mask`` (pass None otherwise). Returns (B, L, c) in q's dtype.
    L is padded internally to a sublane multiple; padded keys are masked,
    padded query rows are sliced away.
    """
    b, L, c = q.shape
    lpad = -(-L // _LQ) * _LQ

    def padL(x):
        if x.shape[1] == lpad:
            return x
        return jnp.pad(x, ((0, 0), (0, lpad - x.shape[1])) + ((0, 0),) * (x.ndim - 2))

    q, k, v = padL(q), padL(k), padL(v)
    if rid is None:
        rid = jnp.zeros((b, lpad), jnp.int32)
    else:
        rid = padL(rid.astype(jnp.int32))
    nq = lpad // _LQ

    out = pl.pallas_call(
        functools.partial(_kernel, L=L, scale=1.0 / math.sqrt(c),
                          with_mask=with_mask),
        grid=(b, nq),
        in_specs=[
            pl.BlockSpec((1, _LQ, c), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((1, lpad, c), lambda bb, i: (bb, 0, 0)),
            pl.BlockSpec((1, lpad, c), lambda bb, i: (bb, 0, 0)),
            pl.BlockSpec((1, _LQ), lambda bb, i: (bb, i)),
            pl.BlockSpec((1, lpad), lambda bb, i: (bb, 0)),
        ],
        out_specs=pl.BlockSpec((1, _LQ, c), lambda bb, i: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, lpad, c), q.dtype),
        interpret=jax.default_backend() == "cpu",
    )(q, k, v, rid, rid)
    return out[:, :L]


def attention_mxu_supported(L: int, c: int) -> bool:
    """VMEM-feasibility gate: the (Lq, Lpad) f32 score chunk plus k/v blocks
    must fit well under the ~16 MB scoped-vmem ceiling (Mosaic runs ~2x the
    raw footprint)."""
    lpad = -(-L // _LQ) * _LQ
    raw = (
        _LQ * lpad * 4 * 2          # scores + exp temporaries, f32
        + 2 * lpad * c * 2          # k, v blocks (bf16)
        + 2 * _LQ * c * 4           # q block + out, f32 upper bound
    )
    return c % 128 == 0 and raw <= 10 * 1024 * 1024
