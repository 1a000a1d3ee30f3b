"""Fused transformer-LAYER Pallas kernel (TPU): one invocation computes a
whole gmflow TransformerLayer (reference: models/gmflow/transformer.py:108-185)
per attention window —

    q/k/v projection -> window attention (swin shift mask) -> merge
    projection -> LayerNorm [-> concat-FFN -> LayerNorm] -> residual add

The motivation is the per-op floor on this TPU stack (docs/ROADMAP.md):
transformer-shaped stacks are op-count/bandwidth bound, ~0.3-1 ms per
full-tensor XLA op at gmflow's scale-1 geometry (4, 136, 240, 128). The
unfused layer costs ~8 (self) / ~12 (cross+FFN) such passes; this kernel
reads the feature map once and writes it once.

Like ops/attn_mxu.py this reads blocks straight off the (B, H, W, C) map
(no split/merge window transposes). The cross-attention target is the
OTHER direction's feature map, which in gmflow's batch layout is the same
tensor with batch halves swapped (transformer.py:291-300: concat0/concat1)
— the kernel reads the target block via a ((b + B/2) mod B) index map, so
the per-layer batch-swap concatenate disappears too.

Supported geometry: the whole window's (Lp, Lp) f32 score block must fit
VMEM (nq == 1 plans; gmflow scale 1 at 1080p: 17x32 windows, Lp=544).
Scale 0 (Lp=2176) stays on the chunked attention kernels in attn_mxu.py.

Must NOT be vmapped (grid-indexed blocks); callers batch windows into the
leading axes explicitly (gmflow already does).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# f32 scratch budget for the (Lp, Lp) score block plus FFN temporaries.
# Mosaic's scoped-vmem stack runs ~2x the raw footprint (docs/ROADMAP.md);
# the kernel raises the scoped limit to 100 MB (a compiler flag — v5e has
# 128 MiB physical VMEM; ops/conv_chain.py uses the same escape), so the
# default budget admits gmflow scale 1 (Lp=544) comfortably and the WIDE
# budget admits scale 0 (Lp=2176, 2x18.9 MB raw) — the wide plan is gated
# separately until a real-TPU run proves the 2x stack estimate holds there.
_SCORE_BYTES_MAX = 4 * 1024 * 1024
_SCORE_BYTES_WIDE = 40 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def layer_mxu_supported(h: int, w: int, k_splits: int, c: int,
                        score_bytes_max: int = _SCORE_BYTES_MAX) -> bool:
    """Whole-window plan feasibility: one grid step per window."""
    wh, ww = h // k_splits, w // k_splits
    wwp = -(-ww // 8) * 8
    lp = wh * wwp
    return (
        c % 128 == 0
        and h % k_splits == 0
        and w % k_splits == 0
        # scores + exp temporaries f32
        and 2 * lp * lp * 4 <= score_bytes_max
    )


def _erfc_f32(x):
    """XLA's own erfc(f32) expansion (Cephes), restated with primitives that
    Mosaic CAN lower (mul/add/div/exp/abs/select) — ``lax.erfc`` itself hits
    "Unimplemented primitive ... erfc" in Pallas TPU (round-4 failure,
    .tpu_results/exp_attn_layer.log). Same Horner coefficient sequence and
    select structure as the optimized-HLO expansion of ``lax.erfc``, so the
    fused path computes the same f32 values as the unfused one
    (tests/test_attn_layer.py pins bf16 bit-parity exhaustively)."""
    w = x * x
    abs_x = jnp.abs(x)
    # |x| < 1: 1 - erf(x), erf via a degree-6 polynomial in x^2
    pe = jnp.float32(7.85386146e-05)
    for cc in (-0.000801019371, 0.00518832775, -0.0268538129,
               0.112835854, -0.37612626, 1.12837911):
        pe = pe * w + jnp.float32(cc)
    one_minus_erf = 1.0 - x * pe
    # |x| >= 1: exp(-x^2)/|x| * P(1/x^2), two ranges of P
    q = 1.0 / w
    p1 = jnp.float32(0.0232682)
    for cc in (-0.138703942, 0.368742466, -0.582473278, 0.621000469,
               -0.494451523, 0.340488, -0.274112701, 0.563825965):
        p1 = p1 * q + jnp.float32(cc)
    p2 = jnp.float32(-10.477664)
    for cc in (12.9772, -7.49551868, 2.92101908, -1.01526523,
               0.42184633, -0.282076746, 0.564189494):
        p2 = p2 * q + jnp.float32(cc)
    pick = jnp.where(abs_x < 2.0, p1, p2)
    r = jnp.exp(-w) * (1.0 / abs_x) * pick
    r = jnp.where(-w < -88.7228394, jnp.float32(0.0), r)
    r = jnp.where(x < 0.0, 2.0 - r, r)
    return jnp.where(abs_x < 1.0, one_minus_erf, r)


def _gelu_exact(x):
    """``jax.nn.gelu(x, approximate=False)`` == 0.5*x*erfc(-x/sqrt(2)) with
    the same dtype rounding points as the jax-level formula (bf16 products,
    f32 erfc core); erfc comes from :func:`_erfc_f32`."""
    sqrt_half = np.sqrt(0.5).astype(x.dtype)
    arg = -x * sqrt_half
    e = _erfc_f32(arg.astype(jnp.float32)).astype(x.dtype)
    return (x.dtype.type(0.5) * x) * e


def _ln(x32, g_ref, b_ref, eps=1e-5):
    """LayerNorm over the lane axis, f32 in/out (models/layers.py:63-69)."""
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    # norm params ride as (1, C) blocks and broadcast over the token rows
    return y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)


def _dot(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )


def _kernel(src_ref, tgt_ref, lr_ref, lc_ref, wqkv_ref, wm_ref, g1_ref,
            b1_ref, w0_ref, w2_ref, g2_ref, b2_ref, out_ref, *,
            lp, c, scale, with_mask, no_ffn, ffn_split):
    dt = src_ref.dtype
    s2 = src_ref[0].reshape(lp, c)
    t2 = tgt_ref[0].reshape(lp, c)

    # projections (bf16 weights, f32 accumulate, cast back — matches
    # models/layers.linear / the fused qkv dot in gmflow_net)
    q = _dot(s2, wqkv_ref[:, :c]).astype(dt)
    k = _dot(t2, wqkv_ref[:, c:2 * c]).astype(dt)
    v = _dot(t2, wqkv_ref[:, 2 * c:]).astype(dt)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
    ) * scale                                      # (Lp, Lp) f32
    # column-padding mask rides the labels (-1 marks padded lanes); the swin
    # shift mask additionally requires region equality (attn_mxu layout note:
    # labels travel as (Lp, 1) / (1, Lp) trailing/leading-singleton operands)
    dead = lc_ref[0] == -1
    if with_mask:
        dead = dead | (lr_ref[0] != lc_ref[0])
    s = jnp.where(dead, -1e9, s)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    p = e / jnp.sum(e, axis=1, keepdims=True)
    av = _dot(p, v.astype(jnp.float32)).astype(dt)  # (Lp, c)

    msg = _ln(_dot(av, wm_ref[...]), g1_ref, b1_ref)
    if no_ffn:
        out = s2.astype(jnp.float32) + msg
    else:
        # mlp.0 on concat([source, message]) == s2 @ W0[:c] + msg @ W0[c:]
        # (transformer.py:137-141); hidden computed in lane-halves to bound
        # the f32 temporary (Lp, hidden/split)
        msg_b = msg.astype(dt)
        hidden = w0_ref.shape[1]
        step = hidden // ffn_split
        acc = jnp.zeros((lp, c), jnp.float32)
        for i in range(ffn_split):
            sl = pl.ds(i * step, step)
            h32 = _dot(s2, w0_ref[:c, sl]) + _dot(msg_b, w0_ref[c:, sl])
            # bf16 between the cast, gelu, and mlp.2 — matches the unfused
            # path (linear casts its output to x.dtype before gelu); exact
            # gelu via the in-kernel erfc expansion (lax.erfc cannot lower)
            hb = _gelu_exact(h32.astype(dt))
            acc = acc + _dot(hb, w2_ref[sl, :])
        out = s2.astype(jnp.float32) + _ln(acc, g2_ref, b2_ref)
    out_ref[0] = out.astype(dt).reshape(src_ref.shape[1:])


def transformer_layer_mxu(
    x: jax.Array,
    wqkv: jax.Array,
    wmerge: jax.Array,
    norm1: tuple[jax.Array, jax.Array],
    k_splits: int,
    labels: "np.ndarray | None" = None,
    with_mask: bool = False,
    cross_swap: bool = False,
    target: jax.Array | None = None,
    ffn: tuple[jax.Array, jax.Array, jax.Array, jax.Array] | None = None,
) -> jax.Array:
    """One fused TransformerLayer over swin windows of ``x`` (B, H, W, C).

    ``cross_swap``: attend to the batch-half-swapped map (gmflow's
    concat0/concat1 cross-attention layout) instead of self-attention.
    ``target``: the tensor k/v are projected FROM (default ``x``) — gmflow's
    cross layer attends to the swap of the state before the layer pair's
    self-attention (transformer.py:291-300 updates concat1 once per BLOCK),
    so the caller passes that earlier state here.
    ``ffn``: (w0, w2, gamma2, beta2) enables the cross_attn_ffn tail
    (concat-MLP + LayerNorm); None for the no_ffn self-attention layer.
    ``labels``: STATIC numpy (k^2, wh, ww) int32 swin region ids for shifted
    layers (with_mask=True); ids must be >= 0. Callers roll ``x`` before and
    the output after (the projections and norms are per-token, so rolling
    the input is equivalent to the reference's post-projection roll).
    Call under jit. Must NOT be vmapped.
    """
    b, h, w, c = x.shape
    kk = k_splits
    wh, ww = h // kk, w // kk
    wwp = -(-ww // 8) * 8
    lp = wh * wwp
    half = b // 2 if cross_swap else 0

    def pad_cols(t):
        if wwp == ww:
            return t
        t = t.reshape(b, h, kk, ww, c)
        t = jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, wwp - ww), (0, 0)))
        return t.reshape(b, h, kk * wwp, c)

    xp = pad_cols(x)
    tp = xp if target is None else pad_cols(target)

    if labels is None:
        lab = np.zeros((kk * kk, wh, ww), np.int32)
    else:
        lab = np.asarray(labels, np.int32).reshape(kk * kk, wh, ww)
    labp = np.full((kk * kk, wh, wwp), -1, np.int32)
    labp[:, :, :ww] = lab
    labp = labp.reshape(kk * kk, lp)
    lab_col = jnp.asarray(labp[:, :, None])   # (k^2, Lp, 1)
    lab_row = jnp.asarray(labp[:, None, :])   # (k^2, 1, Lp)

    g1, b1 = norm1
    if ffn is None:
        # dummy FFN operands keep one kernel signature; never read
        w0 = jnp.zeros((2 * c, 8), wqkv.dtype)
        w2 = jnp.zeros((8, c), wqkv.dtype)
        g2 = jnp.zeros((c,), g1.dtype)
        b2 = g2
    else:
        w0, w2, g2, b2 = ffn
    hidden = w0.shape[1]
    # bound the f32 FFN temporary at ~(Lp, 256)
    ffn_split = max(1, hidden // 256) if ffn is not None else 1

    win = pl.BlockSpec((1, wh, wwp, c), lambda bb, wy, wx: (bb, wy, wx, 0))
    tgt = pl.BlockSpec(
        (1, wh, wwp, c),
        lambda bb, wy, wx: ((bb + half) % b, wy, wx, 0),
    )
    row1 = lambda g, bta: pl.BlockSpec((1, g.shape[0]), lambda bb, wy, wx: (0, 0))

    out = pl.pallas_call(
        functools.partial(
            _kernel, lp=lp, c=c, scale=1.0 / math.sqrt(c),
            with_mask=with_mask, no_ffn=ffn is None, ffn_split=ffn_split,
        ),
        grid=(b, kk, kk),
        in_specs=[
            win,
            tgt,
            pl.BlockSpec((1, lp, 1), lambda bb, wy, wx: (wy * kk + wx, 0, 0)),
            pl.BlockSpec((1, 1, lp), lambda bb, wy, wx: (wy * kk + wx, 0, 0)),
            pl.BlockSpec(wqkv.shape, lambda bb, wy, wx: (0, 0)),
            pl.BlockSpec(wmerge.shape, lambda bb, wy, wx: (0, 0)),
            row1(g1, None),
            row1(b1, None),
            pl.BlockSpec(w0.shape, lambda bb, wy, wx: (0, 0)),
            pl.BlockSpec(w2.shape, lambda bb, wy, wx: (0, 0)),
            row1(g2, None),
            row1(b2, None),
        ],
        out_specs=win,
        out_shape=jax.ShapeDtypeStruct(xp.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=jax.default_backend() == "cpu",
    )(
        xp, tp, lab_col, lab_row,
        wqkv.astype(x.dtype), wmerge.astype(x.dtype),
        g1[None], b1[None],
        w0.astype(x.dtype), w2.astype(x.dtype), g2[None], b2[None],
    )

    if wwp != ww:
        out = out.reshape(b, h, kk, wwp, c)[:, :, :, :ww, :].reshape(b, h, w, c)
    return out
