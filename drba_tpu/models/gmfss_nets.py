"""GMFSS sub-networks: MetricNet, FeatureNet, GridNet (+ union variants).

Reproduced from models/model_gmfss/{MetricNet,FeatureNet,FusionNet}.py and
the union copies (differences: MetricNet tail ``Tanh * 10``
(model_gmfss_union/MetricNet.py:41-42,63) and the GridNet head name/width
(model_gmfss_union/FusionNet.py:59)).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from drba_tpu.models.layers import (
    Params,
    conv2d,
    conv_transpose2d,
    prelu,
)
from drba_tpu.ops import backwarp, pixel_shuffle
from drba_tpu.ops.distance import flow_distance
from drba_tpu.ops.shuffle import fold_conv_after_shuffle


# ---------------------------------------------------------------------------
# MetricNet
# ---------------------------------------------------------------------------


def build_metricnet_spec() -> dict:
    spec = {
        "metric_in.weight": ("conv", 3, 3, 14, 64),
        "metric_in.bias": ("bias", 64),
    }
    for i in (1, 2, 3):
        spec[f"metric_net{i}.0.weight"] = ("scalar",)
        spec[f"metric_net{i}.1.weight"] = ("conv", 3, 3, 64, 64)
        spec[f"metric_net{i}.1.bias"] = ("bias", 64)
    spec["metric_out.0.weight"] = ("scalar",)
    spec["metric_out.1.weight"] = ("conv", 3, 3, 64, 2)
    spec["metric_out.1.bias"] = ("bias", 2)
    return spec


METRICNET_SPEC = build_metricnet_spec()


def _fb_consistency(flow01, flow10, alpha=0.01, beta=0.5):
    """forward_backward_consistency_check (gmflow/geometry.py:87-108)."""
    mag = flow_distance(flow01).astype(jnp.float32) + flow_distance(flow10).astype(jnp.float32)
    warped_bwd = backwarp(flow10, flow01, padding_mode="zeros")
    warped_fwd = backwarp(flow01, flow10, padding_mode="zeros")
    diff_fwd = flow_distance(flow01 + warped_bwd).astype(jnp.float32)
    diff_bwd = flow_distance(flow10 + warped_fwd).astype(jnp.float32)
    thresh = alpha * mag + beta
    return (diff_fwd > thresh).astype(flow01.dtype), (diff_bwd > thresh).astype(flow10.dtype)


def _zeros_coverage(flow):
    """Bilinear in-bounds weight of a zeros-padding warp: (N,H,W,2)->(N,H,W,1)."""
    n, h, w, _ = flow.shape
    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]
    px = gx + flow[..., 0].astype(jnp.float32)
    py = gy + flow[..., 1].astype(jnp.float32)
    x0 = jnp.floor(px)
    y0 = jnp.floor(py)
    wx = px - x0
    wy = py - y0

    def inx(x):
        return ((x >= 0) & (x <= w - 1)).astype(jnp.float32)

    def iny(y):
        return ((y >= 0) & (y <= h - 1)).astype(jnp.float32)

    vx = (1 - wx) * inx(x0) + wx * inx(x0 + 1)
    vy = (1 - wy) * iny(y0) + wy * iny(y0 + 1)
    return (vx * vy)[..., None]


def _use_mxu(h: int, w: int, warp_backend: str) -> bool:
    from drba_tpu.models.ifnet import _use_mxu_warp

    return _use_mxu_warp(warp_backend, h, w)


def _warp2_zeros(a, b, fa, fb, use_mxu: bool):
    """Warp ``a`` by ``fa`` and ``b`` by ``fb`` (zeros padding) as ONE
    batched program — gather cost is per-index on this stack, so packing the
    four MetricNet warps into one two-sample call halves it; the MXU window
    kernel path costs ~1/4 of the gather.

    MXU note: the kernel samples with border clamping; multiplying by the
    analytic bilinear in-bounds weight reproduces zeros padding exactly
    except at pixels whose 4-tap square straddles the frame edge (clamped
    edge values vs dropped taps) — a boundary-row approximation on the
    metric inputs only.
    """
    n = a.shape[0]
    both = jnp.concatenate([a, b], axis=0)
    flows = jnp.concatenate([fa, fb], axis=0)
    if use_mxu:
        from drba_tpu.ops.warp_mxu import backwarp_mxu

        out = backwarp_mxu(both, flows) * _zeros_coverage(flows).astype(both.dtype)
    else:
        out = backwarp(both, flows, padding_mode="zeros")
    return out[:n], out[n:]


def metricnet_apply(p: Params, img0, img1, flow01, flow10, union: bool = False,
                    warp_backend: str = "auto", conv_backend: str = "auto"):
    """MetricNet.forward (model_gmfss/MetricNet.py:44-65).

    The reference's four separate backward warps (two image occlusion
    metrics + the forward/backward consistency check's flow warps,
    MetricNet.py:46-52 / gmflow/geometry.py:87-108) are packed into one
    two-sample batched warp call.
    """
    h, w = img0.shape[1], img0.shape[2]
    pk1 = jnp.concatenate([img1, flow10.astype(img1.dtype)], axis=-1)
    pk0 = jnp.concatenate([img0, flow01.astype(img0.dtype)], axis=-1)
    w1p, w0p = _warp2_zeros(pk1, pk0, flow01, flow10,
                            _use_mxu(h, w, warp_backend))
    warped_img1, warped_bwd = w1p[..., :3], w1p[..., 3:5]
    warped_img0, warped_fwd = w0p[..., :3], w0p[..., 3:5]

    m0 = jnp.mean(jnp.abs(img0 - warped_img1), axis=-1, keepdims=True)
    m1 = jnp.mean(jnp.abs(img1 - warped_img0), axis=-1, keepdims=True)

    # forward/backward consistency on the already-warped flows
    mag = flow_distance(flow01).astype(jnp.float32) + flow_distance(flow10).astype(jnp.float32)
    diff_fwd = flow_distance(flow01 + warped_bwd.astype(flow01.dtype)).astype(jnp.float32)
    diff_bwd = flow_distance(flow10 + warped_fwd.astype(flow10.dtype)).astype(jnp.float32)
    thresh = 0.01 * mag + 0.5
    fwd_occ = (diff_fwd > thresh).astype(flow01.dtype)
    bwd_occ = (diff_bwd > thresh).astype(flow10.dtype)

    h, w = flow01.shape[1], flow01.shape[2]
    def norm_flow(f):
        return jnp.concatenate(
            [f[..., 0:1] / ((w - 1.0) / 2.0), f[..., 1:2] / ((h - 1.0) / 2.0)], axis=-1
        )

    x = jnp.concatenate(
        [img0, img1, -m0, -m1, norm_flow(flow01), norm_flow(flow10), fwd_occ, bwd_occ],
        axis=-1,
    )
    if _use_conv_chain(conv_backend, x.shape[1], x.shape[2]):
        # all five 64ch convs (the same large-spatial geometry XLA lowers at
        # ~12 TF/s — docs/ROADMAP.md) run as ONE fused chain invocation; the
        # 14ch input and 2ch output pad to the 64-lane levels (zero taps)
        from drba_tpu.ops.conv_chain import ChainStep, conv_chain

        xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 64 - x.shape[-1])))
        w_in = jnp.pad(p["metric_in.weight"],
                       ((0, 0), (0, 0), (0, 64 - 14), (0, 0)))
        w_out = jnp.pad(p["metric_out.1.weight"],
                        ((0, 0), (0, 0), (0, 0), (0, 64 - 2)))
        b_out = jnp.pad(p["metric_out.1.bias"], (0, 64 - 2))
        steps = [ChainStep(w=w_in, b=p["metric_in.bias"])]
        steps += [
            ChainStep(w=p[f"metric_net{i}.1.weight"],
                      b=p[f"metric_net{i}.1.bias"],
                      pre_alpha=p[f"metric_net{i}.0.weight"],
                      plain_res=True)
            for i in (1, 2, 3)
        ]
        steps.append(ChainStep(w=w_out, b=b_out,
                               pre_alpha=p["metric_out.0.weight"]))
        out = conv_chain(xp, steps)[..., :2]
    elif _use_packed(conv_backend, x.shape[1], x.shape[2]):
        # all five 64ch convs column-packed (ops/conv_packed.py): same math,
        # 2x the MACs at the measured-fast 128-lane XLA rate, one relayout
        # pair at the net boundary; scalar PReLUs are layout-blind
        from drba_tpu.ops.conv_chain import pack_cols, unpack_cols
        from drba_tpu.ops.conv_packed import conv3_packed

        feat = conv3_packed(pack_cols(x, 2), p["metric_in.weight"],
                            p["metric_in.bias"])
        for i in (1, 2, 3):
            feat = conv3_packed(prelu(p, f"metric_net{i}.0", feat),
                                p[f"metric_net{i}.1.weight"],
                                p[f"metric_net{i}.1.bias"]) + feat
        out = conv3_packed(prelu(p, "metric_out.0", feat),
                           p["metric_out.1.weight"], p["metric_out.1.bias"])
        out = unpack_cols(out, 2)
    else:
        feat = conv2d(p, "metric_in", x, padding=1)
        for i in (1, 2, 3):
            feat = conv2d(p, f"metric_net{i}.1", prelu(p, f"metric_net{i}.0", feat), padding=1) + feat
        out = conv2d(p, "metric_out.1", prelu(p, "metric_out.0", feat), padding=1)
    if union:
        out = jnp.tanh(out.astype(jnp.float32)).astype(out.dtype) * 10
    return out[..., 0:1], out[..., 1:2]


# ---------------------------------------------------------------------------
# FeatureNet
# ---------------------------------------------------------------------------


def build_featurenet_spec() -> dict:
    spec = {}
    dims = [(3, 64), (64, 128), (128, 192)]
    for i, (cin, cout) in enumerate(dims, start=1):
        spec[f"block{i}.0.weight"] = ("scalar",)
        spec[f"block{i}.1.weight"] = ("conv", 3, 3, cin, cout)
        spec[f"block{i}.1.bias"] = ("bias", cout)
        spec[f"block{i}.2.weight"] = ("scalar",)
        spec[f"block{i}.3.weight"] = ("conv", 3, 3, cout, cout)
        spec[f"block{i}.3.bias"] = ("bias", cout)
    return spec


FEATURENET_SPEC = build_featurenet_spec()


def featurenet_apply(p: Params, x, conv_backend: str = "auto"):
    """3-level pyramid at 1/2, 1/4, 1/8 (model_gmfss/FeatureNet.py:29-34)."""
    outs = []
    for i in (1, 2, 3):
        x = conv2d(p, f"block{i}.1", prelu(p, f"block{i}.0", x), stride=2, padding=1)
        if i == 1 and _use_conv_chain(conv_backend, x.shape[1], x.shape[2]):
            # the level-1 64ch conv at half res is the slow XLA geometry
            # (docs/ROADMAP.md); run it as a 1-conv chain with the
            # pre-PReLU fused
            from drba_tpu.ops.conv_chain import ChainStep, conv_chain

            x = conv_chain(x, [ChainStep(
                w=p[f"block{i}.3.weight"], b=p[f"block{i}.3.bias"],
                pre_alpha=p[f"block{i}.2.weight"],
            )])
        elif i == 1 and conv_backend == "packed" and x.shape[2] % 2 == 0:
            # column-packed 64ch conv (ops/conv_packed.py); scalar PReLU
            # applies before the pack (layout-blind either way)
            from drba_tpu.ops.conv_chain import pack_cols, unpack_cols
            from drba_tpu.ops.conv_packed import conv3_packed

            x = unpack_cols(conv3_packed(
                pack_cols(prelu(p, f"block{i}.2", x), 2),
                p[f"block{i}.3.weight"], p[f"block{i}.3.bias"]), 2)
        else:
            x = conv2d(p, f"block{i}.3", prelu(p, f"block{i}.2", x), stride=1, padding=1)
        outs.append(x)
    return tuple(outs)


# ---------------------------------------------------------------------------
# GridNet
# ---------------------------------------------------------------------------


def _seq_conv_spec(spec, prefix, cin, cout, transpose=False):
    """Sequential(PReLU, Conv, PReLU, Conv) blocks of FusionNet.py:7-33."""
    kind = "convT" if transpose else "conv"
    k = 4 if transpose else 3
    spec[f"{prefix}.0.weight"] = ("scalar",)
    spec[f"{prefix}.1.weight"] = (kind, k, k, cin, cout)
    spec[f"{prefix}.1.bias"] = ("bias", cout)
    spec[f"{prefix}.2.weight"] = ("scalar",)
    spec[f"{prefix}.3.weight"] = ("conv", 3, 3, cout, cout)
    spec[f"{prefix}.3.bias"] = ("bias", cout)


def build_gridnet_spec(in_channels: int, union: bool = False) -> dict:
    spec = {}
    head0 = "residual_model_head0" if union else "residual_model_head"
    _seq_conv_spec(spec, head0, in_channels, 64)
    _seq_conv_spec(spec, "residual_model_head1", 128, 64)
    _seq_conv_spec(spec, "residual_model_head2", 256, 128)
    _seq_conv_spec(spec, "residual_model_head3", 384, 192)
    for r in ("01", "04", "05"):
        _seq_conv_spec(spec, f"residual_model_{r}", 64, 64)
    for r in ("11", "14", "15"):
        _seq_conv_spec(spec, f"residual_model_{r}", 128, 128)
    for r in ("21", "24", "25"):
        _seq_conv_spec(spec, f"residual_model_{r}", 192, 192)
    for d in ("10", "11"):
        _seq_conv_spec(spec, f"downsample_model_{d}", 64, 128)
    for d in ("20", "21"):
        _seq_conv_spec(spec, f"downsample_model_{d}", 128, 192)
    for u in ("04", "05"):
        _seq_conv_spec(spec, f"upsample_model_{u}", 128, 64, transpose=True)
    for u in ("14", "15"):
        _seq_conv_spec(spec, f"upsample_model_{u}", 192, 128, transpose=True)
    # PixelShuffleBlcok tail (FusionNet.py:36-52)
    spec["residual_model_tail.conv_before_upsample.0.weight"] = ("conv", 3, 3, 64, 64)
    spec["residual_model_tail.conv_before_upsample.0.bias"] = ("bias", 64)
    spec["residual_model_tail.conv_before_upsample.1.weight"] = ("scalar",)
    spec["residual_model_tail.upsample.0.weight"] = ("conv", 3, 3, 64, 256)
    spec["residual_model_tail.upsample.0.bias"] = ("bias", 256)
    spec["residual_model_tail.conv_last.weight"] = ("conv", 3, 3, 64, 3)
    spec["residual_model_tail.conv_last.bias"] = ("bias", 3)
    return spec


GRIDNET_SPEC = build_gridnet_spec(12, union=False)
GRIDNET_UNION_SPEC = build_gridnet_spec(9, union=True)


def _tail_out(p: Params, u):
    """``conv_last(pixel_shuffle(u, 2))`` with the conv commuted through the
    shuffle (ops/shuffle.py:fold_conv_after_shuffle) — bit-equal math, but
    the conv runs on 1/4 the pixels and the shuffle moves 12 channels
    instead of 256, eliding the measured ~25-30 ms full-res 6-D transpose
    cascade in the tail (FusionNet.py:36-52 semantics preserved)."""
    w_lo, b_lo = fold_conv_after_shuffle(
        p["residual_model_tail.conv_last.weight"],
        p["residual_model_tail.conv_last.bias"], 2)
    y = jax.lax.conv_general_dilated(
        u, w_lo.astype(u.dtype), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(u.dtype) + b_lo.astype(u.dtype)
    return pixel_shuffle(y, 2)


def _seq_block(p: Params, prefix, x, stride=1, transpose=False):
    if transpose:
        y = conv_transpose2d(p, f"{prefix}.1", prelu(p, f"{prefix}.0", x), stride=2, padding=1)
    else:
        y = conv2d(p, f"{prefix}.1", prelu(p, f"{prefix}.0", x), stride=stride, padding=1)
    return conv2d(p, f"{prefix}.3", prelu(p, f"{prefix}.2", y), stride=1, padding=1)


def _use_packed(conv_backend: str, h: int, w: int) -> bool:
    """Whether the column-packed XLA path (ops/conv_packed.py) applies.

    Measured on TPU (scripts/exp_conv_packed.py, round 4): the packed
    GridNet lattice runs 91.9 ms vs 107.1 plain-XLA / 109.9 chain at the
    production (3,544,960) gmfss window, and packed MetricNet 114.8 vs
    122.3 — so 'auto' resolves to packed for both on TPU. CPU keeps the
    plain lattice (the pack relayout is free only under XLA:TPU's tiled
    layouts; CPU tests compare backends explicitly)."""
    if h % 2 or w % 2:
        return False
    if conv_backend == "packed":
        return True
    # 'packed_chain' = the packed defaults with the GridNet lattice's L0
    # seq blocks chain-fused (gridnet_apply switches on it explicitly)
    return (conv_backend in ("auto", "packed_chain")
            and jax.default_backend() != "cpu")


def _use_conv_chain(conv_backend: str, h: int, w: int) -> bool:
    """Whether the fused Pallas conv-chain kernel handles the L0 blocks.

    The kernel packs 2 pixel columns into the 128-lane dim, so W must be
    even and W/2 a multiple of 8. Like the other Pallas kernels it must
    not be traced under vmap (models batch explicitly).

    ``auto`` resolves to the XLA lattice: measured head-to-head at the
    production 1080p window (scripts/profile_gridnet.py, tail fold in
    both variants) the packed chain lattice is 109.9 ms vs 105.8 ms for
    XLA — the standalone 2.2x chain win is eaten by in-context conv
    speedups + boundary relayouts. Kept behind ``pallas`` for study."""
    shapes_ok = w % 16 == 0 and h % 4 == 0
    if conv_backend == "pallas":
        return shapes_ok
    return False


def _chain_step(p: Params, prefix: str, i: int, cin_pad: int | None = None):
    """ChainStep for conv ``{prefix}.{i}`` with pre-PReLU ``{prefix}.{i-1}``."""
    from drba_tpu.ops.conv_chain import ChainStep

    w = p[f"{prefix}.{i}.weight"]
    if cin_pad is not None and w.shape[2] < cin_pad:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, cin_pad - w.shape[2]), (0, 0)))
    return ChainStep(w=w, b=p[f"{prefix}.{i}.bias"],
                     pre_alpha=p.get(f"{prefix}.{i - 1}.weight"))


def _seq_chain(p: Params, prefix: str, x, residual="none", res=None,
               cin_pad=None, packed=False):
    """``_seq_block`` via ONE fused Pallas invocation (ops/conv_chain.py)."""
    from drba_tpu.ops.conv_chain import conv_chain

    steps = [_chain_step(p, prefix, 1, cin_pad=cin_pad),
             _chain_step(p, prefix, 3)]
    return conv_chain(x, steps, residual=residual, res=res, packed=packed)


def _gridnet_fused(p: Params, x, x1, x2, x3, union: bool):
    """GridNet with the L0 (64ch) and L1 (128ch) seq blocks fused into
    Pallas conv-chain invocations.

    The whole 64ch L0 row of the lattice runs in the kernel's packed
    (W/2, 128)-lane layout: the 64->128-lane retiling is a measured
    ~1.4 ms relayout at this size, so it is paid once at each lattice
    boundary (pack x/x1 and the two transposed-conv outputs; unpack
    X00/X01 for the stride-2 consumers and the tail) instead of per
    invocation.  L1 is already lane-full (f=1, reshape-free); its
    residual blocks run as chains and the stride-2/transposed convs
    keep XLA for the strided conv with the TRAILING conv fused as a
    1-conv chain carrying the lattice sum.  L2 (192ch, not a 128
    multiple) stays entirely on XLA — it is 1/16 the pixels."""
    from drba_tpu.ops.conv_chain import (
        ChainStep, conv_chain, pack_cols, unpack_cols,
    )

    head0 = "residual_model_head0" if union else "residual_model_head"
    cin = x.shape[-1]
    xp = pack_cols(jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 64 - cin))), 2)
    x1p = pack_cols(x1, 2)
    h0 = _seq_chain(p, head0, xp, cin_pad=64, packed=True)
    X00p = _seq_chain(p, "residual_model_head1", x1p, residual="extra",
                      res=h0, packed=True)
    X01p = _seq_chain(p, "residual_model_01", X00p, residual="input",
                      packed=True)
    X00 = unpack_cols(X00p, 2)
    X01 = unpack_cols(X01p, 2)

    def strided_plus(name, src, stride, other, transpose=False):
        # stride-2 / transposed conv on XLA; its trailing conv fused with
        # the lattice sum as a 1-conv chain
        a = prelu(p, f"{name}.0", src)
        if transpose:
            t = conv_transpose2d(p, f"{name}.1", a, stride=2, padding=1)
        else:
            t = conv2d(p, f"{name}.1", a, stride=stride, padding=1)
        return conv_chain(t, [_chain_step(p, name, 3)], residual="extra",
                          res=other)

    h2 = _seq_chain(p, "residual_model_head2", x2)
    X10 = strided_plus("downsample_model_10", X00, 2, h2)
    X20 = _seq_block(p, "downsample_model_20", X10, stride=2) + _seq_block(
        p, "residual_model_head3", x3
    )
    a11 = _seq_chain(p, "residual_model_11", X10, residual="input")
    X11 = strided_plus("downsample_model_11", X01, 2, a11)
    X21 = (_seq_block(p, "residual_model_21", X20) + X20) + _seq_block(
        p, "downsample_model_21", X11, stride=2
    )
    X24 = _seq_block(p, "residual_model_24", X21) + X21
    X25 = _seq_block(p, "residual_model_25", X24) + X24
    a14 = _seq_chain(p, "residual_model_14", X11, residual="input")
    X14 = strided_plus("upsample_model_14", X24, 2, a14, transpose=True)

    def up_l0(name, src, res):
        # transposed conv on XLA, packed once, then its trailing conv
        # fused with the L0 lattice sum
        t = conv_transpose2d(p, f"{name}.1", prelu(p, f"{name}.0", src),
                             stride=2, padding=1)
        return conv_chain(pack_cols(t, 2), [_chain_step(p, name, 3)],
                          residual="extra", res=res, packed=True)

    R04p = _seq_chain(p, "residual_model_04", X01p, residual="input",
                      packed=True)
    X04p = up_l0("upsample_model_04", X14, R04p)
    a15 = _seq_chain(p, "residual_model_15", X14, residual="input")
    X15 = strided_plus("upsample_model_15", X25, 2, a15, transpose=True)
    R05p = _seq_chain(p, "residual_model_05", X04p, residual="input",
                      packed=True)
    X05p = up_l0("upsample_model_05", X15, R05p)

    tail = conv_chain(X05p, [
        ChainStep(w=p["residual_model_tail.conv_before_upsample.0.weight"],
                  b=p["residual_model_tail.conv_before_upsample.0.bias"]),
        ChainStep(w=p["residual_model_tail.upsample.0.weight"],
                  b=p["residual_model_tail.upsample.0.bias"],
                  pre_alpha=p["residual_model_tail.conv_before_upsample.1.weight"]),
    ], packed=True)
    return _tail_out(p, unpack_cols(tail, 2))


def gridnet_apply(p: Params, x, x1, x2, x3, union: bool = False,
                  conv_backend: str = "auto"):
    """GridNet lattice (model_gmfss/FusionNet.py:106-145).

    ``conv_backend='packed_chain'``: the packed lattice with the pure-64ch
    L0 seq blocks fused into single Pallas chain invocations (the round-5
    hybrid, gridnet_packed.gridnet_apply_packed(seq_chain=True)) — opt-in
    until a real-TPU run beats the packed lattice (scripts/exp_gridnet_r5.py).
    """
    if conv_backend == "packed_chain" or _use_packed(
            conv_backend, x.shape[1], x.shape[2]):
        from drba_tpu.models.gridnet_packed import gridnet_apply_packed

        return gridnet_apply_packed(p, x, x1, x2, x3, union=union,
                                    seq_chain=conv_backend == "packed_chain")
    if _use_conv_chain(conv_backend, x.shape[1], x.shape[2]):
        return _gridnet_fused(p, x, x1, x2, x3, union)
    head0 = "residual_model_head0" if union else "residual_model_head"
    X00 = _seq_block(p, head0, x) + _seq_block(p, "residual_model_head1", x1)
    X01 = _seq_block(p, "residual_model_01", X00) + X00

    X10 = _seq_block(p, "downsample_model_10", X00, stride=2) + _seq_block(
        p, "residual_model_head2", x2
    )
    X20 = _seq_block(p, "downsample_model_20", X10, stride=2) + _seq_block(
        p, "residual_model_head3", x3
    )

    X11 = (_seq_block(p, "residual_model_11", X10) + X10) + _seq_block(
        p, "downsample_model_11", X01, stride=2
    )
    X21 = (_seq_block(p, "residual_model_21", X20) + X20) + _seq_block(
        p, "downsample_model_21", X11, stride=2
    )

    X24 = _seq_block(p, "residual_model_24", X21) + X21
    X25 = _seq_block(p, "residual_model_25", X24) + X24

    X14 = _seq_block(p, "upsample_model_14", X24, transpose=True) + (
        _seq_block(p, "residual_model_14", X11) + X11
    )
    X04 = _seq_block(p, "upsample_model_04", X14, transpose=True) + (
        _seq_block(p, "residual_model_04", X01) + X01
    )
    X15 = _seq_block(p, "upsample_model_15", X25, transpose=True) + (
        _seq_block(p, "residual_model_15", X14) + X14
    )
    X05 = _seq_block(p, "upsample_model_05", X15, transpose=True) + (
        _seq_block(p, "residual_model_05", X04) + X04
    )

    # PixelShuffleBlcok tail
    t = conv2d(p, "residual_model_tail.conv_before_upsample.0", X05, padding=1)
    t = prelu(p, "residual_model_tail.conv_before_upsample.1", t)
    t = conv2d(p, "residual_model_tail.upsample.0", t, padding=1)
    return _tail_out(p, t)
