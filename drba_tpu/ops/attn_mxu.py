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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

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
        # rr (Lq, 1) vs rc (1, Lpad): region ids ride as 3-D trailing/leading
        # singleton operands — a 2-D (B, L) operand with a (1, _LQ) block
        # violates the Pallas last-two-dims rule whenever B > 1
        dead = dead | (rr_ref[0] != rc_ref[0])
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
            pl.BlockSpec((1, _LQ, 1), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((1, 1, lpad), lambda bb, i: (bb, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _LQ, c), lambda bb, i: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, lpad, c), q.dtype),
        interpret=jax.default_backend() == "cpu",
    )(q, k, v, rid[:, :, None], rid[:, None, :])
    return out[:, :L]


_KC = 1024  # key-chunk rows per flash grid step


def _flash_kernel(q_ref, k_ref, v_ref, rr_ref, rc_ref, out_ref, acc, m, l,
                  *, L, nk, scale, with_mask):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m[...] = jnp.full(m.shape, -1e30, jnp.float32)
        l[...] = jnp.zeros(l.shape, jnp.float32)
        acc[...] = jnp.zeros(acc.shape, jnp.float32)

    q = q_ref[0]                                  # (LQ, c)
    kj = k_ref[0]                                 # (KC, c)
    s = jax.lax.dot_general(
        q, kj, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale                                     # (LQ, KC) f32
    col = j * _KC + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    dead = col >= L
    if with_mask:
        # (Lq, 1) vs (1, KC) — see the window kernel's rid layout note
        dead = dead | (rr_ref[0] != rc_ref[0])

    m_old = m[:, 0:1]
    m_new = jnp.maximum(m_old, jnp.max(jnp.where(dead, -1e30, s), axis=1,
                                       keepdims=True))
    p = jnp.where(dead, 0.0, jnp.exp(s - m_new))  # (LQ, KC)
    corr = jnp.exp(m_old - m_new)                 # (LQ, 1)
    l[...] = l[...] * corr + jnp.sum(p, axis=1, keepdims=True)
    acc[...] = acc[...] * corr + jax.lax.dot_general(
        p, v_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m[...] = jnp.broadcast_to(m_new, m.shape)

    @pl.when(j == nk - 1)
    def _():
        out_ref[0] = (acc[...] / l[:, 0:1]).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("with_mask", "out_slice", "out_dtype"))
def flash_attention_mxu(q: jax.Array, k: jax.Array, v: jax.Array,
                        rid: jax.Array | None = None,
                        with_mask: bool = False,
                        out_slice: int = 0,
                        out_dtype=None) -> jax.Array:
    """``softmax(q k^T / sqrt(c_q) [+ shift mask]) v`` with ONLINE softmax
    over key chunks — supports any L (the simple kernel's (Lq, Lpad) score
    chunk caps L at ~2k). Serves gmflow's global correlation and global
    flow propagation (L = HW = 8160 at 1080p), where the XLA path
    materializes the (B, L, L) correlation tensor in HBM (~0.5 GB f32 at
    1080p; matching.py:7-38, transformer.py:343-374).

    q, k: (B, L, c) with c a lane multiple. v: (B, L, cv) — cv may be small
    (grid coords / flow are 2 channels); it is lane-padded internally and
    the first ``out_slice`` (or cv) channels are returned. Scale is always
    1/sqrt(c_q). Must NOT be vmapped (grid-indexed blocks + scratch).
    """
    b, L, c = q.shape
    cv = v.shape[-1]
    cvp = -(-cv // 128) * 128
    lq = -(-L // _LQ) * _LQ
    lk = -(-L // _KC) * _KC
    nq, nk = lq // _LQ, lk // _KC

    def padto(x, rows, lanes=None):
        pw = [(0, 0), (0, rows - x.shape[1])]
        if x.ndim == 3:
            pw.append((0, (lanes - x.shape[2]) if lanes else 0))
        if not any(hi for _, hi in pw):
            return x
        return jnp.pad(x, pw)

    qp = padto(q, lq)
    kp = padto(k, lk)
    vp = padto(v, lk, cvp)
    if rid is None:
        rid_q = jnp.zeros((b, lq), jnp.int32)
        rid_k = jnp.zeros((b, lk), jnp.int32)
    else:
        rid_q = padto(rid.astype(jnp.int32), lq)
        rid_k = padto(rid.astype(jnp.int32), lk)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, L=L, nk=nk, scale=1.0 / math.sqrt(c),
                          with_mask=with_mask),
        grid=(b, nq, nk),
        in_specs=[
            pl.BlockSpec((1, _LQ, c), lambda bb, i, j: (bb, i, 0)),
            pl.BlockSpec((1, _KC, c), lambda bb, i, j: (bb, j, 0)),
            pl.BlockSpec((1, _KC, cvp), lambda bb, i, j: (bb, j, 0)),
            pl.BlockSpec((1, _LQ, 1), lambda bb, i, j: (bb, i, 0)),
            pl.BlockSpec((1, 1, _KC), lambda bb, i, j: (bb, 0, j)),
        ],
        out_specs=pl.BlockSpec((1, _LQ, cvp), lambda bb, i, j: (bb, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, lq, cvp), out_dtype or q.dtype),
        scratch_shapes=[
            pltpu.VMEM((_LQ, cvp), jnp.float32),
            pltpu.VMEM((_LQ, 128), jnp.float32),
            pltpu.VMEM((_LQ, 128), jnp.float32),
        ],
        interpret=jax.default_backend() == "cpu",
    )(qp, kp, vp, rid_q[:, :, None], rid_k[:, None, :])
    sl = out_slice or cv
    return out[:, :L, :sl]


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


def _nhwc_chunk_plan(wh: int, wwp: int, c: int):
    """Pick q-rows-per-chunk for the NHWC window kernel: the largest divisor
    of ``wh`` whose f32 score chunk fits the VMEM budget, with multi-chunk
    plans lane-aligned for the label slice. None if no plan fits."""
    lp = wh * wwp
    for rpc in sorted((d for d in range(1, wh + 1) if wh % d == 0),
                      reverse=True):
        scores = rpc * wwp * lp * 4 * 2     # scores + exp temporaries
        kv = 2 * lp * c * 2                 # k/v window blocks (bf16)
        if scores + kv > 6 * 1024 * 1024:
            continue
        nq = wh // rpc
        if nq > 1 and (rpc * wwp) % 128 != 0:
            continue
        return rpc
    return None


def nhwc_attention_supported(h: int, w: int, k_splits: int, c: int) -> bool:
    wh, ww = h // k_splits, w // k_splits
    wwp = -(-ww // 8) * 8
    return c % 128 == 0 and _nhwc_chunk_plan(wh, wwp, c) is not None


def _nhwc_kernel(q_ref, k_ref, v_ref, lab_ref, out_ref, *, rpc, wwp, lp, c,
                 nq, scale, with_mask):
    qc = pl.program_id(3)
    q2 = q_ref[0].reshape(rpc * wwp, c)
    k2 = k_ref[0].reshape(lp, c)
    s = jax.lax.dot_general(
        q2, k2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale                                     # (rpc*wwp, Lp) f32
    lr = lab_ref[0, 0]                            # (Lp,) int32
    if nq > 1:
        lq = lab_ref[0, 0, pl.ds(pl.multiple_of(qc * (rpc * wwp), 128),
                                 rpc * wwp)]
    else:
        lq = lr
    dead = lr[None, :] == -1
    if with_mask:
        dead = dead | (lq[:, None] != lr[None, :])
    s = jnp.where(dead, -1e9, s)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)
    out = jax.lax.dot_general(
        p, v_ref[0].reshape(lp, c).astype(jnp.float32),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    out_ref[0] = out.reshape(rpc, wwp, c).astype(out_ref.dtype)


def window_attention_nhwc(q: jax.Array, k: jax.Array, v: jax.Array,
                          k_splits: int,
                          labels: "np.ndarray | None" = None,
                          with_mask: bool = False) -> jax.Array:
    """Swin window attention straight off the (B, H, W, C) layout.

    Each (window, q-chunk) grid step reads its (rows, ww, C) block from the
    UNSPLIT feature map via BlockSpec index maps — no split_windows /
    merge_windows 6-D transposes around the attention (each carries the
    ~1 ms per-op floor on this stack; gmflow pays them twice per layer,
    models/gmflow/utils.py:5-36). Window columns pad per-window to a
    sublane multiple (one minor-dim pad copy) and are masked out.

    ``labels``: STATIC numpy (k^2, wh, ww) int32 swin region ids for
    shifted layers (with_mask=True); ids must be >= 0 (-1 is reserved for
    padding). Callers roll the map before / after; call under jit (no own
    jit wrapper — the label mask is built at trace time). Must NOT be
    vmapped.
    """
    b, h, w, c = q.shape
    kk = k_splits
    wh, ww = h // kk, w // kk
    wwp = -(-ww // 8) * 8
    rpc = _nhwc_chunk_plan(wh, wwp, c)
    lp = wh * wwp
    nq = wh // rpc

    def pad_cols(x):
        if wwp == ww:
            return x
        x = x.reshape(b, h, kk, ww, c)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, wwp - ww), (0, 0)))
        return x.reshape(b, h, kk * wwp, c)

    qp, kp, vp = pad_cols(q), pad_cols(k), pad_cols(v)

    if labels is None:
        lab = np.zeros((kk * kk, wh, ww), np.int32)
    else:
        lab = np.asarray(labels, np.int32).reshape(kk * kk, wh, ww)
    labp = np.full((kk * kk, 1, lp), -1, np.int32)
    labp.reshape(kk * kk, 1, wh, wwp)[:, 0, :, :ww] = lab
    labp = jnp.asarray(labp)

    out = pl.pallas_call(
        functools.partial(_nhwc_kernel, rpc=rpc, wwp=wwp, lp=lp, c=c, nq=nq,
                          scale=1.0 / math.sqrt(c), with_mask=with_mask),
        grid=(b, kk, kk, nq),
        in_specs=[
            pl.BlockSpec((1, rpc, wwp, c),
                         lambda bb, wy, wx, qc, _wh=wh // rpc:
                         (bb, wy * _wh + qc, wx, 0)),
            pl.BlockSpec((1, wh, wwp, c), lambda bb, wy, wx, qc: (bb, wy, wx, 0)),
            pl.BlockSpec((1, wh, wwp, c), lambda bb, wy, wx, qc: (bb, wy, wx, 0)),
            pl.BlockSpec((1, 1, lp), lambda bb, wy, wx, qc: (wy * kk + wx, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, rpc, wwp, c),
                               lambda bb, wy, wx, qc, _wh=wh // rpc:
                               (bb, wy * _wh + qc, wx, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, kk * wwp, c), q.dtype),
        interpret=jax.default_backend() == "cpu",
    )(qp, kp, vp, labp)

    if wwp != ww:
        out = out.reshape(b, h, kk, wwp, c)[:, :, :, :ww, :].reshape(b, h, w, c)
    return out
