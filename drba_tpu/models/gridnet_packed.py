"""GridNet lattice with the 64-channel L0 row in column-packed layout.

Same math as models.gmfss_nets.gridnet_apply (reference:
models/model_gmfss/FusionNet.py:106-145), but every L0 (64ch, full-W)
conv — the geometry XLA lowers at ~11.6 TF/s on this TPU — runs as a
dense packed conv at the measured-fast 128-lane rate via the exact
weight rearrangements of ops.conv_packed:

* the whole L0 row (heads, residual blocks, upsample tails, tail head)
  stays packed; the pack relayout is paid once per lattice boundary;
* L0->L1 stride-2 convs consume the packed tensor directly and emit
  unpacked L1 (no unpack relayout);
* L1->L0 transposed convs emit packed L0 via a low-res 3x3 conv + row
  interleave (no full-res dilated-conv lowering);
* the tail's conv_last commutes through its pixel shuffle as in
  gmfss_nets._tail_out, with the folded conv itself packed — the 256ch
  pre-shuffle tensor never unpacks.

L1 (128ch) and L2 (192ch) blocks keep plain XLA convs (already-fast
geometries). Exactness vs gridnet_apply is pinned by
tests/test_gridnet_packed.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from drba_tpu.models.layers import Params, conv2d, conv_transpose2d, prelu
from drba_tpu.ops import pixel_shuffle
from drba_tpu.ops.conv_chain import pack_cols, unpack_cols
from drba_tpu.ops.conv_packed import (
    conv3_packed,
    conv3_stride2_from_packed,
    convT4_to_packed,
)
from drba_tpu.ops.shuffle import fold_conv_after_shuffle


def _prelu_s(p: Params, name: str, x):
    # scalar-slope PReLU is layout-blind: same op on packed tensors
    return prelu(p, name, x)


def _seq_packed(p: Params, prefix: str, xp):
    """_seq_block (PReLU, conv3, PReLU, conv3) entirely in packed layout."""
    y = conv3_packed(_prelu_s(p, f"{prefix}.0", xp), p[f"{prefix}.1.weight"],
                     p[f"{prefix}.1.bias"])
    return conv3_packed(_prelu_s(p, f"{prefix}.2", y), p[f"{prefix}.3.weight"],
                        p[f"{prefix}.3.bias"])


def _down_from_packed(p: Params, prefix: str, xp):
    """_seq_block with stride-2 lead conv, consuming packed L0 -> plain L1."""
    y = conv3_stride2_from_packed(_prelu_s(p, f"{prefix}.0", xp),
                                  p[f"{prefix}.1.weight"],
                                  p[f"{prefix}.1.bias"])
    return conv2d(p, f"{prefix}.3", _prelu_s(p, f"{prefix}.2", y), padding=1)


def _up_to_packed(p: Params, prefix: str, x):
    """_seq_block with transposed lead conv, plain L1 -> packed L0."""
    y = convT4_to_packed(_prelu_s(p, f"{prefix}.0", x),
                         p[f"{prefix}.1.weight"], p[f"{prefix}.1.bias"])
    return conv3_packed(_prelu_s(p, f"{prefix}.2", y), p[f"{prefix}.3.weight"],
                        p[f"{prefix}.3.bias"])


def _seq_block(p: Params, prefix, x, stride=1, transpose=False):
    if transpose:
        y = conv_transpose2d(p, f"{prefix}.1", prelu(p, f"{prefix}.0", x),
                             stride=2, padding=1)
    else:
        y = conv2d(p, f"{prefix}.1", prelu(p, f"{prefix}.0", x),
                   stride=stride, padding=1)
    return conv2d(p, f"{prefix}.3", prelu(p, f"{prefix}.2", y), stride=1,
                  padding=1)


def _chain_step(p: Params, prefix: str, i: int):
    """ChainStep for conv ``{prefix}.{i}`` with pre-PReLU ``{prefix}.{i-1}``."""
    from drba_tpu.ops.conv_chain import ChainStep

    return ChainStep(w=p[f"{prefix}.{i}.weight"], b=p[f"{prefix}.{i}.bias"],
                     pre_alpha=p.get(f"{prefix}.{i - 1}.weight"))


def gridnet_apply_packed(p: Params, x, x1, x2, x3, union: bool = False,
                         seq_chain: bool = False):
    """gridnet_apply with the L0 row column-packed. Requires even W.

    ``seq_chain``: route the pure-64ch L0 residual blocks (01/04/05 + the
    upsample tails + the tail head) through ONE fused Pallas conv-chain
    invocation each (ops/conv_chain.py, packed layout shared with this
    lattice) instead of per-conv packed XLA convs — the round-5 hybrid:
    VMEM-resident seq-block interiors + fused residual epilogues where the
    round-4 full-chain lattice lost to relayouts/L1 chains
    (docs/ROADMAP.md; VERDICT r4 item 3). Exactness vs gridnet_apply pinned
    by tests/test_gridnet_packed.py. Must NOT be vmapped when seq_chain.
    """
    from drba_tpu.ops.conv_chain import conv_chain

    head0 = "residual_model_head0" if union else "residual_model_head"
    xp = pack_cols(x, 2)
    x1p = pack_cols(x1, 2)

    def seq64(prefix, src, residual="none", res=None):
        # 64->64->64 seq block; one kernel invocation when seq_chain
        if seq_chain:
            return conv_chain(
                src, [_chain_step(p, prefix, 1), _chain_step(p, prefix, 3)],
                residual=residual, res=res, packed=True)
        y = _seq_packed(p, prefix, src)
        if residual == "input":
            return y + src
        if residual == "extra":
            return y + res
        return y

    # heads keep per-conv packed XLA: their lead convs are narrow
    # (9/128-ch inputs) and a chain would pad them to 64ch FLOPs
    X00p = _seq_packed(p, head0, xp) + _seq_packed(p, "residual_model_head1",
                                                   x1p)
    X01p = seq64("residual_model_01", X00p, residual="input")

    X10 = _down_from_packed(p, "downsample_model_10", X00p) + _seq_block(
        p, "residual_model_head2", x2
    )
    X20 = _seq_block(p, "downsample_model_20", X10, stride=2) + _seq_block(
        p, "residual_model_head3", x3
    )

    X11 = (_seq_block(p, "residual_model_11", X10) + X10) + _down_from_packed(
        p, "downsample_model_11", X01p
    )
    X21 = (_seq_block(p, "residual_model_21", X20) + X20) + _seq_block(
        p, "downsample_model_21", X11, stride=2
    )

    X24 = _seq_block(p, "residual_model_24", X21) + X21
    X25 = _seq_block(p, "residual_model_25", X24) + X24

    X14 = _seq_block(p, "upsample_model_14", X24, transpose=True) + (
        _seq_block(p, "residual_model_14", X11) + X11
    )

    def up_plus(name, src, res):
        # transposed lead conv -> packed (XLA); trailing conv fused with
        # the lattice residual sum as a 1-step chain when seq_chain
        t = convT4_to_packed(_prelu_s(p, f"{name}.0", src),
                             p[f"{name}.1.weight"], p[f"{name}.1.bias"])
        if seq_chain:
            return conv_chain(t, [_chain_step(p, name, 3)],
                              residual="extra", res=res, packed=True)
        return conv3_packed(_prelu_s(p, f"{name}.2", t),
                            p[f"{name}.3.weight"], p[f"{name}.3.bias"]) + res

    R04p = seq64("residual_model_04", X01p, residual="input")
    X04p = up_plus("upsample_model_04", X14, R04p)
    X15 = _seq_block(p, "upsample_model_15", X25, transpose=True) + (
        _seq_block(p, "residual_model_15", X14) + X14
    )
    R05p = seq64("residual_model_05", X04p, residual="input")
    X05p = up_plus("upsample_model_05", X15, R05p)

    # PixelShuffleBlcok tail, packed end-to-end: the 256ch pre-shuffle
    # tensor and the folded conv_last (gmfss_nets._tail_out) never unpack
    if seq_chain:
        from drba_tpu.ops.conv_chain import ChainStep

        t = conv_chain(X05p, [
            ChainStep(
                w=p["residual_model_tail.conv_before_upsample.0.weight"],
                b=p["residual_model_tail.conv_before_upsample.0.bias"]),
            ChainStep(
                w=p["residual_model_tail.upsample.0.weight"],
                b=p["residual_model_tail.upsample.0.bias"],
                pre_alpha=p["residual_model_tail.conv_before_upsample.1.weight"]),
        ], packed=True)
    else:
        t = conv3_packed(
            xp=X05p, w=p["residual_model_tail.conv_before_upsample.0.weight"],
            b=p["residual_model_tail.conv_before_upsample.0.bias"])
        t = _prelu_s(p, "residual_model_tail.conv_before_upsample.1", t)
        t = conv3_packed(t, p["residual_model_tail.upsample.0.weight"],
                         p["residual_model_tail.upsample.0.bias"])
    w_lo, b_lo = fold_conv_after_shuffle(
        p["residual_model_tail.conv_last.weight"],
        p["residual_model_tail.conv_last.bias"], 2)
    y = conv3_packed(t, w_lo, b_lo)
    return pixel_shuffle(unpack_cols(y, 2), 2)
