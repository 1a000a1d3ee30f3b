"""Fused 3x3 conv-chain Pallas kernel (packed-column MXU matmuls).

Round 2 measured XLA's TPU conv lowering at ~12 TF/s for the
large-spatial / 64-channel geometry that dominates GridNet L0
(reference models/model_gmfss/FusionNet.py:7-33) and IFNet's ResConv
chains (models/rife_426_heavy/IFNet_HDv3.py:12-20), and a standalone
paired-column conv kernel won 2.24x but LOST in-graph to per-invocation
overhead plus XLA's lost bias/activation fusion (docs/ROADMAP.md).  This
kernel amortizes that tax by running a WHOLE chain of convs — each with
its activation / bias / residual epilogue — in one invocation:

  * column packing: f adjacent pixels share the 128-lane dim (f = 128/C
    for C in {32, 64}; f = 1 for C >= 128).  In HBM the padded input
    reshapes (H, Wp, C) -> (H, Wp/f, f*C) for FREE, so window DMAs are
    lane-aligned and every MXU operand is full width;
  * a 3x3 conv on the packed grid is 9 group-taps (3 dy x 3 gdx), each
    an accumulating (rows*P, f*Cin) @ (f*Cin, f*Cout) matmul whose
    weight holds the phase-resolved sub-blocks of the original taps:
    sub-block (pi, po) of group-tap (dy, gdx) is w[dy, f*gdx+pi-po+1]
    when that tap index lies in [0, 3).  FLOP overhead is f x the
    minimum, at ~full MXU utilization;
  * the chain runs on a row-band grid with an n-row halo per side
    (n = chain depth); intermediate levels live in VMEM ping-pong
    buffers, so inter-conv tensors never touch HBM;
  * per-step epilogues: optional pre-PReLU (GridNet's Sequential
    (PReLU, Conv) pairs), bias, optional ResConv tail
    ``leaky_relu(y * beta + x)`` (IFNet), and a final residual add
    (``_seq_block(x) + x`` / ``+ other``).

Zero-padding semantics match chained ``conv2d(pad=1)`` exactly: each
level's out-of-frame rows/cols are forced to zero before the next conv
consumes them (conv-of-padded-input would otherwise leak bias terms).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# Column-group base of the data region inside VMEM window/intermediate
# buffers. Mosaic only accepts DMA destination slices whose sublane (group)
# offset is a multiple of 8, so the left conv-zero-pad region is 8 groups
# wide (only group _CB-1 is ever read, as the left tap).
_CB = 8


class ChainStep(NamedTuple):
    """One conv of the chain: ``y = conv3x3(pre(x)) + b`` then epilogue.

    pre_alpha: scalar PReLU slope applied to the conv INPUT (GridNet's
        pre-activation).  Must not be combined with ``beta``.
    beta: per-channel scale for the ResConv epilogue
        ``y = leaky_relu(y * beta + x, 0.2)`` (x = this conv's input).
    """

    w: jax.Array                 # (3, 3, Cin, Cout)
    b: jax.Array                 # (Cout,)
    pre_alpha: jax.Array | None = None
    beta: jax.Array | None = None
    plain_res: bool = False      # y = conv(pre(x)) + x (un-activated x);
                                 # pre applies on the fly in the tap reads


class _Meta(NamedTuple):
    steps: tuple  # per step: (Lin, Lout, has_pre, has_beta)
    f: int
    n: int
    hb: int
    H: int
    P: int
    PW: int
    res_mode: int  # 0 none, 1 input, 2 extra
    nb: int
    dtype: object


def _phase_weights(w: jax.Array, f: int, dtype) -> jax.Array:
    """(3,3,Cin,Cout) taps -> (9, f*Cin, f*Cout) phase-resolved group taps."""
    _, _, cin, cout = w.shape
    blocks = []
    for dy in range(3):
        for gdx in (-1, 0, 1):
            cols = []
            for po in range(f):
                rows = []
                for pi in range(f):
                    dx = f * gdx + pi - po + 1
                    if 0 <= dx < 3:
                        rows.append(w[dy, dx])
                    else:
                        rows.append(jnp.zeros((cin, cout), w.dtype))
                cols.append(jnp.concatenate(rows, axis=0))
            blocks.append(jnp.concatenate(cols, axis=1))
    return jnp.stack(blocks).astype(dtype)


def _row(v: jax.Array | float, L: int, dtype) -> jax.Array:
    """Broadcast a scalar or per-channel vector to a packed (1, L) lane row."""
    v = jnp.asarray(v)
    if v.ndim == 0:
        return jnp.full((1, L), v, dtype)
    c = v.shape[-1]
    return jnp.tile(v.reshape(1, c), (1, L // c)).astype(dtype)


def _kernel(meta: _Meta, *refs):
    steps = meta.steps
    n, hb, H, P, PW, f = meta.n, meta.hb, meta.H, meta.P, meta.PW, meta.f
    n_steps = len(steps)
    win_rows = hb + 2 * n

    # ---- unpack positional refs (layout mirrors conv_chain's call) ----
    it = iter(range(len(refs)))
    x_hbm = refs[next(it)]
    zrows = refs[next(it)]
    res_ref = refs[next(it)] if meta.res_mode == 2 else None
    step_refs = []
    for (_, _, has_pre, has_beta, _pr) in steps:
        wk = refs[next(it)]
        bias = refs[next(it)]
        alpha = refs[next(it)] if has_pre else None
        beta = refs[next(it)] if has_beta else None
        step_refs.append((wk, bias, alpha, beta))
    out_ref = refs[next(it)]
    win = refs[next(it)]
    n_mid = min(2, max(0, n_steps - 1))
    bufs = [refs[next(it)] for _ in range(n_mid)]
    sem = refs[next(it)]

    ni = pl.program_id(0)
    b = pl.program_id(1)
    t = ni * meta.nb + b
    nb = meta.nb
    total = pl.num_programs(0) * nb

    @pl.when(t == 0)
    def _():
        # edge group columns (conv zero padding) + never-written right pad;
        # the per-band DMAs only touch cols [_CB, _CB+P), so these stay zero
        win[...] = jnp.zeros_like(win)
        for bf in bufs:
            bf[...] = jnp.zeros_like(bf)

    # ---- band input window: rows b*hb-n .. b*hb+hb+n of the UNPADDED
    # input (the free (N,H,W,C)->(N,H,P,f*C) reshape replaces the
    # 2x-full-tensor-copy jnp.pad that dominated kernel time); the n-row
    # halo beyond the frame comes from a tiny zero-rows input instead.
    # Data lives at column-group base _CB = 8: Mosaic requires DMA
    # destination slices in the sublane (group) dim to be 8-aligned, so the
    # left zero-pad region is 8 groups wide and taps read at _CB-1.._CB+1.
    #
    # Uniform 3 copies per band — top halo / body / bottom halo, each on its
    # own semaphore — double-buffered across grid steps (splat_stencil's
    # pattern): step t prefetches band t+1's window while computing band t,
    # hiding both HBM latency and the start->wait round trips. The halo
    # sources select zrows vs neighbor rows under pl.when; the wait side
    # uses same-shape/same-sem descriptors, which is what the semaphore
    # counts.
    def band_copies(slot, tt, start):
        nn = tt // nb
        bb = tt % nb

        def top(src):
            return pltpu.make_async_copy(
                src, win.at[slot, pl.ds(0, n), pl.ds(_CB, P), :], sem.at[slot, 0]
            )

        def bot(src):
            return pltpu.make_async_copy(
                src, win.at[slot, pl.ds(n + hb, n), pl.ds(_CB, P), :],
                sem.at[slot, 2],
            )

        body = pltpu.make_async_copy(
            x_hbm.at[nn, pl.ds(bb * hb, hb), :, :],
            win.at[slot, pl.ds(n, hb), pl.ds(_CB, P), :], sem.at[slot, 1]
        )
        if not start:  # wait: shape/sem-equivalent descriptors suffice
            return [top(zrows.at[:, :, :]), body, bot(zrows.at[:, :, :])]

        body.start()

        @pl.when(bb == 0)
        def _():
            top(zrows.at[:, :, :]).start()

        @pl.when(bb == nb - 1)
        def _():
            bot(zrows.at[:, :, :]).start()

        if nb > 1:  # hb >= n keeps both neighbor-row slices in bounds
            @pl.when(bb > 0)
            def _():
                top(x_hbm.at[nn, pl.ds(bb * hb - n, n), :, :]).start()

            @pl.when(bb < nb - 1)
            def _():
                bot(x_hbm.at[nn, pl.ds(bb * hb + hb, n), :, :]).start()
        return None

    @pl.when(t == 0)
    def _():
        band_copies(0, t, start=True)

    @pl.when(t + 1 < total)
    def _():
        band_copies((t + 1) % 2, t + 1, start=True)

    slot = t % 2
    for c in band_copies(slot, t, start=False):
        c.wait()
    wslot = win.at[slot]  # 3-D view of this step's window buffer

    if meta.res_mode == 1:
        # snapshot the residual rows into the out block BEFORE any in-place
        # activation of the window corrupts them — zero extra VMEM
        out_ref[0] = wslot[pl.ds(n, hb), pl.ds(_CB, P), slice(0, steps[-1][1])]

    def prelu(v, alpha_ref, L):
        # comparison in f32: Mosaic on v5e rejects bf16 cmpf
        a = alpha_ref[0:1, 0:L]
        return jnp.where(v.astype(jnp.float32) >= 0, v,
                         v * a[None, :, :].astype(v.dtype))

    src = wslot  # level-0 buffer
    for k, ((Lin, Lout, has_pre, has_beta, has_plainres),
            (wk, bias, alpha, beta)) in enumerate(zip(steps, step_refs)):
        r0 = k                      # valid row extent of level k
        out_rows = hb + 2 * (n - k - 1)
        last = k == n_steps - 1

        if has_pre and not has_plainres:
            # activate only the rows this conv reads (the buffers are
            # allocated at full window height; deeper levels use less)
            rows_k = hb + 2 * (n - k)
            src[pl.ds(r0, rows_k), :, :] = prelu(
                src[pl.ds(r0, rows_k), :, :], alpha, Lin)

        # bias folded into the accumulator init (f32 add pre-cast — within
        # bf16 rounding of XLA's post-cast bias add; exact in f32)
        acc = jnp.broadcast_to(
            bias[0:1, :].astype(jnp.float32), (out_rows * P, Lout))
        for dy in range(3):
            for gx in range(3):
                a = src[pl.ds(r0 + dy, out_rows),
                        pl.ds(_CB - 1 + gx, P), slice(0, Lin)]
                if has_pre and has_plainres:
                    # the plain-res epilogue needs the UN-activated input,
                    # so pre-activation applies per tap read (prelu(0) == 0
                    # keeps the zero-padding semantics intact)
                    a = prelu(a, alpha, Lin)
                acc = acc + jnp.dot(
                    a.reshape(out_rows * P, Lin), wk[dy * 3 + gx],
                    preferred_element_type=jnp.float32,
                )

        y = acc.astype(meta.dtype).reshape(out_rows, P, Lout)

        if has_beta:
            prev = src[pl.ds(r0 + 1, out_rows), pl.ds(_CB, P),
                       slice(0, Lin)]
            bv = y * beta[0:1, :][None, :, :].astype(y.dtype) + prev
            y = jnp.where(bv.astype(jnp.float32) >= 0, bv, bv * 0.2)
        elif has_plainres:
            y = y + src[pl.ds(r0 + 1, out_rows), pl.ds(_CB, P),
                        slice(0, Lin)]

        if not last:
            dst = bufs[k % len(bufs)]
            dst[pl.ds(k + 1, out_rows), pl.ds(_CB, P), slice(0, Lout)] = y

            # out-of-frame rows are the NEXT conv's zero padding; only the
            # first/last bands have any, so the masked overwrite is gated
            @pl.when(jnp.logical_or(b * hb < n, b * hb + hb + n > H))
            def _():
                gi = jax.lax.broadcasted_iota(
                    jnp.int32, (out_rows, 1, 1), 0) + (b * hb - n + k + 1)
                ym = jnp.where((gi >= 0) & (gi < H), y, jnp.zeros_like(y))
                dst[pl.ds(k + 1, out_rows), pl.ds(_CB, P), slice(0, Lout)] = ym

            src = dst
        else:
            if meta.res_mode == 1:
                y = y + out_ref[0]  # residual snapshot taken at entry
            elif meta.res_mode == 2:
                y = y + res_ref[0]
            out_ref[0] = y


# Raw-buffer VMEM budget per grid step. Mosaic's scoped-vmem stack runs ~2x
# the raw footprint; the kernel raises the scoped limit to _VMEM_LIMIT (v5e
# has 128 MiB of physical VMEM — the 16 MiB scoped default is just a compiler
# flag), so the effective ceiling is _VMEM_LIMIT / 2. Fewer, larger grid
# steps win: the measured per-step fixed cost is ~40-50 us.
_VMEM_BUDGET = 40 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def _choose_hb(H: int, n: int, PW: int, lanes: Sequence[int], itemsize: int,
               has_res: bool, w_bytes: int,
               budget: int = _VMEM_BUDGET) -> int | None:
    """Largest band height fitting the VMEM budget (raw buffer bytes)."""
    lmid = max(lanes[1:-1], default=0)
    # hb >= n so edge-band halo DMAs stay within one neighbor band
    cands = sorted({d for d in range(4, H + 1)
                    if H % d == 0 and (d >= n or d == H)}, reverse=True)
    for hb in cands:
        rows = hb + 2 * n
        tot = (
            2 * rows * PW * lanes[0] * itemsize             # window (2 slots)
            + min(2, max(0, n - 1)) * rows * PW * lmid * itemsize  # mid bufs
            + 2 * hb * PW * lanes[-1] * itemsize                 # out (piped)
            + (2 * hb * PW * lanes[-1] * itemsize if has_res == 2 else 0)
            + w_bytes
        )
        if tot <= budget:
            return hb
    return None


def pack_cols(x: jax.Array, f: int) -> jax.Array:
    """(N,H,W,C) -> the kernel's packed (N,H,W/f,f*C) column layout.

    NOT free on TPU: retiling C=64 (half-empty 128-lane tiles) into full
    128-lane tiles is a real relayout (~1.4 ms in-graph at GridNet-L0 size).
    Callers keep tensors packed across whole chain lattices (see
    models/gmfss_nets._gridnet_fused) so the cost is paid at the lattice
    boundary, not per invocation."""
    N, H, W, C = x.shape
    return x.reshape(N, H, W // f, f * C)


def unpack_cols(x: jax.Array, f: int) -> jax.Array:
    """Inverse of :func:`pack_cols` (same relayout cost)."""
    N, H, P, FC = x.shape
    return x.reshape(N, H, P * f, FC // f)


def conv_chain(
    x: jax.Array,
    steps: Sequence[ChainStep],
    *,
    residual: str = "none",
    res: jax.Array | None = None,
    hb: int | None = None,
    interpret: bool | None = None,
    packed: bool = False,
) -> jax.Array:
    """Run a chain of 3x3/stride-1/pad-1 convs fused in one Pallas kernel.

    x: (N, H, W, C0) NHWC.  Channel counts may be any multiple pattern such
    that ``f * C`` is a multiple of 128 at every level, where
    ``f = max(1, 128 // min(C))`` is the column packing factor (so levels in
    {32, 64, 128, 256, ...}; mixed levels like 128 -> 64 -> 64 work with
    f = 2).  W must be divisible by f and W/f by 8; any H.

    residual: 'none' | 'input' (adds x, requires C_out == C0) | 'extra'
    (adds ``res``).  Returns (N, H, W, C_out).

    packed: ``x`` (and ``res``/the return value) use the pre-packed
    (N, H, W/f, f*C) layout of :func:`pack_cols`, skipping the per-call
    relayout entirely — the f > 1 fast path for chains whose neighbors are
    also chains.
    """
    if packed:
        N, H, P, FC0 = x.shape
        chs = [steps[0].w.shape[2]] + [s.w.shape[3] for s in steps]
        f = max(1, 128 // min(chs))
        assert FC0 == f * chs[0], (x.shape, f, chs)
        W = P * f
    else:
        N, H, W, C0 = x.shape
        chs = [C0] + [s.w.shape[3] for s in steps]
        f = max(1, 128 // min(chs))
    for s, cin in zip(steps, chs[:-1]):
        assert s.w.shape[:3] == (3, 3, cin), (s.w.shape, cin)
        assert s.pre_alpha is None or s.beta is None
        assert not (s.plain_res and s.beta is not None)
        assert not s.plain_res or s.w.shape[2] == s.w.shape[3]
    assert all((f * c) % 128 == 0 for c in chs), (f, chs)
    assert W % f == 0 and (W // f) % 8 == 0, (W, f)
    P = W // f
    PW = _round_up(_CB + P + 1, 8)  # 8-group left pad + data + right zero
    n = len(steps)
    res_mode = {"none": 0, "input": 1, "extra": 2}[residual]
    if res_mode == 1:
        assert chs[-1] == chs[0]
    dtype = x.dtype
    itemsize = jnp.dtype(dtype).itemsize
    lanes = [f * c for c in chs]

    if hb is None:
        w_bytes = sum(9 * f * f * s.w.shape[2] * s.w.shape[3] * itemsize
                      for s in steps)
        hb = _choose_hb(H, n, PW, lanes, itemsize, res_mode, w_bytes)
        assert hb is not None, (H, n, PW, lanes)
    assert H % hb == 0 and (hb >= n or hb == H), (H, hb, n)
    nb = H // hb

    # NOTE: for f > 1 this reshape is a measured ~1.4 ms relayout in-graph
    # (64-lane -> 128-lane retiling), NOT free — callers on the hot path
    # pass packed=True and keep whole lattices in the packed layout.
    xp = x if packed else x.reshape(N, H, P, f * chs[0])
    zrows = jnp.zeros((n, P, f * chs[0]), dtype)

    meta = _Meta(
        steps=tuple((f * ci, f * co, s.pre_alpha is not None,
                     s.beta is not None, s.plain_res)
                    for s, ci, co in zip(steps, chs[:-1], chs[1:])),
        f=f, n=n, hb=hb, H=H, P=P, PW=PW, res_mode=res_mode, nb=nb,
        dtype=dtype,
    )

    inputs = [xp, zrows]
    in_specs = [pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY)]
    if res_mode == 2:
        assert res is not None
        if packed:
            assert res.shape == (N, H, P, f * chs[-1]), res.shape
            inputs.append(res)
        else:
            assert res.shape == (N, H, W, chs[-1]), res.shape
            inputs.append(res.reshape(N, H, P, f * chs[-1]))
        in_specs.append(
            pl.BlockSpec((1, hb, P, f * chs[-1]), lambda ni, b: (ni, b, 0, 0))
        )
    for s in steps:
        inputs.append(_phase_weights(s.w, f, dtype))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        inputs.append(_row(s.b, f * s.w.shape[3], dtype))
        in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        if s.pre_alpha is not None:
            inputs.append(_row(s.pre_alpha, f * s.w.shape[2], dtype))
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))
        if s.beta is not None:
            inputs.append(_row(s.beta, f * s.w.shape[3], dtype))
            in_specs.append(pl.BlockSpec(memory_space=pltpu.VMEM))

    win_rows = hb + 2 * n
    lmid = max(lanes[1:-1], default=0)
    scratch = [pltpu.VMEM((2, win_rows, PW, lanes[0]), dtype)]  # double-buffered
    for _ in range(min(2, max(0, n - 1))):
        scratch.append(pltpu.VMEM((win_rows, PW, lmid), dtype))
    scratch.append(pltpu.SemaphoreType.DMA((2, 3)))

    if interpret is None:
        interpret = jax.default_backend() == "cpu"

    out = pl.pallas_call(
        functools.partial(_kernel, meta),
        grid=(N, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, hb, P, lanes[-1]), lambda ni, b: (ni, b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, H, P, lanes[-1]), dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(*inputs)
    return out if packed else out.reshape(N, H, W, chs[-1])
