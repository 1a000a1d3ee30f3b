"""GMFlow optical-flow estimator in functional JAX (models/gmflow/).

2-scale (1/8, 1/4) transformer matching:
  CNNEncoder backbone (ResNet-style, InstanceNorm, trident multi-scale tail,
  backbone.py:39-117) -> sine position embedding (position.py:13-54) ->
  6-layer FeatureTransformer with Swin-style shifted-window single-head
  attention (transformer.py:244-322) -> correlation softmax (global at scale
  0, local r=4 at scale 1, matching.py:7-89) -> FeatureFlowAttention
  propagation (transformer.py:325-409) -> convex upsampling x4
  (gmflow.py:67-90).

TPU-first notes:
  * shifted-window attention masks are static (shape-only) and built with
    numpy at trace time — zero device work;
  * local correlation is 81 dense shifted multiplies (the sample offsets are
    integers), not a gather: flow = sum_k softmax(corr)_k * offset_k;
  * ``pred_bidir`` computes both flow directions in one program by
    transposing the global correlation volume (gmflow.py:112-114,
    matching.py:25-29) — the GMFSS reuse path uses this to halve backbone
    cost vs the reference's two sequential flownet calls
    (models/model_gmfss/GMFSS.py:73-74).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from drba_tpu.models.layers import (
    Params,
    conv2d,
    gelu,
    instance_norm,
    layer_norm,
    linear,
    relu,
)
from drba_tpu.ops import backwarp, unfold3x3
from drba_tpu.ops.attn_mxu import (
    attention_mxu_supported,
    flash_attention_mxu,
    nhwc_attention_supported,
    window_attention_mxu,
    window_attention_nhwc,
)
from drba_tpu.ops.resize import resize_bilinear

FEATURE_CHANNELS = 128


def _fused_attention_on() -> bool:
    """Gate for the fused attention kernels (ops/attn_mxu.py): production
    TPU only — tests patch this to exercise the kernel wiring in interpret
    mode on CPU. ``DRBA_DISABLE_FUSED_ATTN=1`` falls back to the einsum
    path (operational kill switch)."""
    import os

    if os.environ.get("DRBA_DISABLE_FUSED_ATTN"):
        return False
    return jax.default_backend() == "tpu"


NUM_LAYERS = 6
UPSAMPLE_FACTOR = 4
ATTN_SPLITS = (2, 8)
CORR_RADIUS = (-1, 4)
PROP_RADIUS = (-1, 1)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


# ---------------------------------------------------------------------------
# Param spec (torch state-dict key names)
# ---------------------------------------------------------------------------


def _res_block(spec, prefix, cin, cout, stride):
    spec[f"{prefix}.conv1.weight"] = ("conv", 3, 3, cin, cout)
    spec[f"{prefix}.conv2.weight"] = ("conv", 3, 3, cout, cout)
    if stride != 1 or cin != cout:
        spec[f"{prefix}.downsample.0.weight"] = ("conv", 1, 1, cin, cout)
        spec[f"{prefix}.downsample.0.bias"] = ("bias", cout)


def build_spec() -> dict:
    spec = {}
    # backbone (feature_dims 64/96/128, backbone.py:48)
    spec["backbone.conv1.weight"] = ("conv", 7, 7, 3, 64)
    _res_block(spec, "backbone.layer1.0", 64, 64, 1)
    _res_block(spec, "backbone.layer1.1", 64, 64, 1)
    _res_block(spec, "backbone.layer2.0", 64, 96, 2)
    _res_block(spec, "backbone.layer2.1", 96, 96, 1)
    _res_block(spec, "backbone.layer3.0", 96, 128, 1)
    _res_block(spec, "backbone.layer3.1", 128, 128, 1)
    spec["backbone.conv2.weight"] = ("conv", 1, 1, 128, 128)
    spec["backbone.conv2.bias"] = ("bias", 128)
    spec["backbone.trident_conv.weight"] = ("conv", 3, 3, 128, 128)

    c = FEATURE_CHANNELS
    for i in range(NUM_LAYERS):
        for attn in ("self_attn", "cross_attn_ffn"):
            base = f"transformer.layers.{i}.{attn}"
            for proj in ("q_proj", "k_proj", "v_proj", "merge"):
                spec[f"{base}.{proj}.weight"] = ("linear", c, c)
            spec[f"{base}.norm1.weight"] = ("ones", (c,))
            spec[f"{base}.norm1.bias"] = ("zeros", (c,))
            if attn == "cross_attn_ffn":
                spec[f"{base}.mlp.0.weight"] = ("linear", 2 * c, 2 * c * 4)
                spec[f"{base}.mlp.2.weight"] = ("linear", 2 * c * 4, c)
                spec[f"{base}.norm2.weight"] = ("ones", (c,))
                spec[f"{base}.norm2.bias"] = ("zeros", (c,))

    spec["feature_flow_attn.q_proj.weight"] = ("linear", c, c)
    spec["feature_flow_attn.q_proj.bias"] = ("bias", c)
    spec["feature_flow_attn.k_proj.weight"] = ("linear", c, c)
    spec["feature_flow_attn.k_proj.bias"] = ("bias", c)

    spec["upsampler.0.weight"] = ("conv", 3, 3, 2 + c, 256)
    spec["upsampler.0.bias"] = ("bias", 256)
    spec["upsampler.2.weight"] = ("conv", 1, 1, 256, UPSAMPLE_FACTOR**2 * 9)
    spec["upsampler.2.bias"] = ("bias", UPSAMPLE_FACTOR**2 * 9)
    return spec


GMFLOW_SPEC = build_spec()


# ---------------------------------------------------------------------------
# Backbone
# ---------------------------------------------------------------------------


def _residual_block(p: Params, prefix: str, x, stride: int):
    y = relu(instance_norm(conv2d(p, f"{prefix}.conv1", x, stride=stride, padding=1)))
    y = relu(instance_norm(conv2d(p, f"{prefix}.conv2", y, stride=1, padding=1)))
    if f"{prefix}.downsample.0.weight" in p:
        x = instance_norm(conv2d(p, f"{prefix}.downsample.0", x, stride=stride, padding=0))
    return relu(x + y)


def backbone_apply(p: Params, x):
    """CNNEncoder (backbone.py:101-117) -> [1/4, 1/8] feature maps."""
    x = relu(instance_norm(conv2d(p, "backbone.conv1", x, stride=2, padding=3)))
    x = _residual_block(p, "backbone.layer1.0", x, 1)
    x = _residual_block(p, "backbone.layer1.1", x, 1)
    x = _residual_block(p, "backbone.layer2.0", x, 2)
    x = _residual_block(p, "backbone.layer2.1", x, 1)
    x = _residual_block(p, "backbone.layer3.0", x, 1)
    x = _residual_block(p, "backbone.layer3.1", x, 1)
    x = conv2d(p, "backbone.conv2", x, stride=1, padding=0)
    # shared-weight trident conv, strides (1, 2): high-res then low-res
    hi = conv2d(p, "backbone.trident_conv", x, stride=1, padding=1)
    lo = conv2d(p, "backbone.trident_conv", x, stride=2, padding=1)
    return hi, lo  # 1/4, 1/8


# ---------------------------------------------------------------------------
# Window helpers + position embedding
# ---------------------------------------------------------------------------


def split_windows(x, k: int):
    """(B,H,W,C) -> (B*k*k, H/k, W/k, C), window-major (split_feature)."""
    b, h, w, c = x.shape
    x = x.reshape(b, k, h // k, k, w // k, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b * k * k, h // k, w // k, c)


def merge_windows(x, k: int):
    bkk, hk, wk, c = x.shape
    b = bkk // (k * k)
    x = x.reshape(b, k, k, hk, wk, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, k * hk, k * wk, c)


def _sine_position_embedding(h: int, w: int, num_feats: int = FEATURE_CHANNELS // 2) -> np.ndarray:
    """PositionEmbeddingSine on an all-ones mask (position.py:30-54): static
    per (h, w), so built with numpy and embedded as a constant."""
    scale = 2 * math.pi
    y_embed = np.cumsum(np.ones((h, w), np.float32), axis=0)
    x_embed = np.cumsum(np.ones((h, w), np.float32), axis=1)
    eps = 1e-6
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale
    dim_t = np.arange(num_feats, dtype=np.float32)
    dim_t = 10000.0 ** (2 * (dim_t // 2) / num_feats)
    pos_x = x_embed[:, :, None] / dim_t
    pos_y = y_embed[:, :, None] / dim_t
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3).reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=-1)  # (h, w, 2*num_feats)


def add_position(feature0, feature1, attn_splits: int):
    """feature_add_position (gmflow/utils.py:74-94): per-window embedding."""
    if attn_splits > 1:
        f0 = split_windows(feature0, attn_splits)
        f1 = split_windows(feature1, attn_splits)
        pos = jnp.asarray(_sine_position_embedding(f0.shape[1], f0.shape[2]), f0.dtype)
        return (
            merge_windows(f0 + pos, attn_splits),
            merge_windows(f1 + pos, attn_splits),
        )
    pos = jnp.asarray(_sine_position_embedding(feature0.shape[1], feature0.shape[2]), feature0.dtype)
    return feature0 + pos, feature1 + pos


def _shift_region_labels(h: int, w: int, k: int) -> np.ndarray:
    """Per-token swin shift region labels, window-major (k^2, L) int32
    (transformer.py:19-43): token i may attend token j iff labels match."""
    win_h, win_w = h // k, w // k
    shift_h, shift_w = win_h // 2, win_w // 2
    img_mask = np.zeros((h, w), np.int32)
    cnt = 0
    for hs in (slice(0, -win_h), slice(-win_h, -shift_h), slice(-shift_h, None)):
        for ws in (slice(0, -win_w), slice(-win_w, -shift_w), slice(-shift_w, None)):
            img_mask[hs, ws] = cnt
            cnt += 1
    # split into windows (window-major)
    return img_mask.reshape(k, win_h, k, win_w).transpose(0, 2, 1, 3).reshape(
        k * k, win_h * win_w)


def _shift_window_mask(h: int, w: int, k: int) -> np.ndarray:
    """Swin shifted-window attention mask (transformer.py:19-43), static."""
    m = _shift_region_labels(h, w, k).astype(np.float32)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)  # (k^2, L, L)


# ---------------------------------------------------------------------------
# Transformer
# ---------------------------------------------------------------------------


def _window_attention(q, k, v, num_splits: int, h: int, w: int, with_shift: bool):
    """single_head_split_window_attention (transformer.py:46-105).

    q/k/v: (B, H, W, C). Returns (B, H, W, C).
    """
    b, _, _, c = q.shape
    scale = 1.0 / math.sqrt(c)
    # one roll + one split over a batch-stacked qkv instead of three each:
    # the 6-D split/merge transposes carry a ~1 ms fixed per-op cost on this
    # stack, so fewer-bigger ops win (docs/ROADMAP.md per-op floor)
    qkv = jnp.concatenate([q, k, v], axis=0)  # (3B,H,W,C)
    if with_shift:
        sh, sw = (h // num_splits) // 2, (w // num_splits) // 2
        qkv = jnp.roll(qkv, (-sh, -sw), axis=(1, 2))

    if (_fused_attention_on()
            and nhwc_attention_supported(h, w, num_splits, c)):
        # NHWC-direct kernel: each window's block is read straight from the
        # unsplit map via index maps — no split/merge window transposes at
        # all (ops/attn_mxu.py:window_attention_nhwc)
        lab = None
        if with_shift:
            wh_, ww_ = h // num_splits, w // num_splits
            lab = _shift_region_labels(h, w, num_splits).reshape(
                num_splits * num_splits, wh_, ww_)
        out = window_attention_nhwc(qkv[:b], qkv[b:2 * b], qkv[2 * b:],
                                    num_splits, lab, with_mask=with_shift)
        if with_shift:
            out = jnp.roll(out, (sh, sw), axis=(1, 2))
        return out

    s = split_windows(qkv, num_splits)
    bkk3, wh, ww, _ = s.shape
    L = wh * ww
    s = s.reshape(3, bkk3 // 3, L, c)
    qs, ks, vs = s[0], s[1], s[2]
    bkk = bkk3 // 3

    if _fused_attention_on() and c % 128 == 0:
        # fused Pallas kernel: scores stay chunk-resident in VMEM instead of
        # round-tripping the (bkk, L, L) tensor through HBM (ops/attn_mxu.py);
        # oversized windows (4K at -scale 1) fall through to the key-chunked
        # online-softmax variant
        single = attention_mxu_supported(L, c)
        kern = window_attention_mxu if single else flash_attention_mxu
        if with_shift:
            rid = jnp.tile(
                jnp.asarray(_shift_region_labels(h, w, num_splits)), (b, 1))
            out = kern(qs, ks, vs, rid, with_mask=True)
        else:
            out = kern(qs, ks, vs)
    else:
        scores = jnp.einsum("blc,bmc->blm", qs, ks, preferred_element_type=jnp.float32) * scale
        if with_shift:
            mask = jnp.asarray(_shift_window_mask(h, w, num_splits))  # (k^2, L, L)
            scores = scores + jnp.tile(mask, (b, 1, 1))
        # keep the softmax output f32 into the value einsum: a bf16 cast
        # between them blocks XLA's softmax+matmul fusion and materializes the
        # full score tensor (measured 15x slower on this TPU stack)
        attn = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("blm,bmc->blc", attn, vs.astype(jnp.float32),
                         preferred_element_type=jnp.float32).astype(vs.dtype)
    out = merge_windows(out.reshape(bkk, wh, ww, c), num_splits)
    if with_shift:
        out = jnp.roll(out, (sh, sw), axis=(1, 2))
    return out


def _full_attention(q, k, v):
    b, h, w, c = q.shape
    scale = 1.0 / math.sqrt(c)
    qf = q.reshape(b, h * w, c)
    kf = k.reshape(b, h * w, c)
    vf = v.reshape(b, h * w, c)
    scores = jnp.einsum("blc,bmc->blm", qf, kf, preferred_element_type=jnp.float32) * scale
    # f32 softmax straight into the einsum — see _window_attention note
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("blm,bmc->blc", attn, vf.astype(jnp.float32),
                      preferred_element_type=jnp.float32).astype(vf.dtype).reshape(b, h, w, c)


def _transformer_layer(p: Params, base: str, source, target, num_splits: int,
                       with_shift: bool, no_ffn: bool):
    """TransformerLayer (transformer.py:108-185). source/target (B,H,W,C)."""
    b, h, w, c = source.shape
    # fuse the projections into one wide matmul: skinny-N matmuls at these
    # token counts pay a fixed ~0.85 ms M-traversal cost regardless of N on
    # this TPU stack, so one N=3c (or N=2c) matmul ~= the cost of one N=c
    wq = p[f"{base}.q_proj.weight"]
    wk = p[f"{base}.k_proj.weight"]
    wv = p[f"{base}.v_proj.weight"]
    if source is target:
        qkv = jnp.dot(
            source, jnp.concatenate([wq, wk, wv], axis=1).astype(source.dtype),
            preferred_element_type=jnp.float32,
        ).astype(source.dtype)
        q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
    else:
        q = linear(p, f"{base}.q_proj", source)
        kv = jnp.dot(
            target, jnp.concatenate([wk, wv], axis=1).astype(target.dtype),
            preferred_element_type=jnp.float32,
        ).astype(target.dtype)
        k, v = kv[..., :c], kv[..., c:]

    if num_splits > 1:
        message = _window_attention(q, k, v, num_splits, h, w, with_shift)
    else:
        message = _full_attention(q, k, v)

    message = linear(p, f"{base}.merge", message)
    message = layer_norm(p, f"{base}.norm1", message)
    if not no_ffn:
        message = jnp.concatenate([source, message], axis=-1)
        message = linear(p, f"{base}.mlp.0", message)
        message = gelu(message)
        message = linear(p, f"{base}.mlp.2", message)
        message = layer_norm(p, f"{base}.norm2", message)
    return source + message


def _fused_layer_on(h: int, w: int, attn_splits: int, c: int) -> bool:
    """Gate for the whole-layer fused kernel (ops/attn_layer.py).

    Default-ON since the round-5 real-TPU validation (CLAUDE.md round-4
    rule satisfied — the round-4 erfc version could not lower and shipped
    opt-in until then): .tpu_results/exp_attn_layer_r5.log ran all stages
    rc=0 at batch 4 (erfc-free exact GELU), gmflow bidir 58.15 ms fused vs
    77.01 unfused, and the gmfss window bench measured 11.58 vs 10.66
    interp-fps (+8.6%, bench_gmfss_fusedlayer.log). Kill switch:
    ``DRBA_DISABLE_FUSED_LAYER=1`` (bench.py's safe-fallback sets it)."""
    import os

    from drba_tpu.ops.attn_layer import layer_mxu_supported

    if os.environ.get("DRBA_DISABLE_FUSED_LAYER"):
        return False
    from drba_tpu.ops.attn_layer import _SCORE_BYTES_WIDE

    # DRBA_FUSED_LAYER_WIDE=1 additionally admits the scale-0 geometry
    # (Lp=2176, ~38 MB f32 scratch under the raised VMEM ceiling) — still
    # opt-in: it measured only +0.8% over the narrow plan (11.67 vs 11.58)
    # and carries the untested 2x scoped-vmem stack estimate at Lp=2176
    budget = (_SCORE_BYTES_WIDE
              if os.environ.get("DRBA_FUSED_LAYER_WIDE") else None)
    kw = {} if budget is None else {"score_bytes_max": budget}
    return (_fused_attention_on() and attn_splits > 1
            and layer_mxu_supported(h, w, attn_splits, c, **kw))


def _transformer_apply_fused(p: Params, concat0, attn_splits: int):
    """6 layer pairs as 12 single-kernel invocations (ops/attn_layer.py).

    The cross-attention target (the reference's ``concat1``,
    transformer.py:291-300) is read via the kernel's batch-half-swap index
    map, so the per-layer swap concatenate disappears; shifted layers roll
    the map once before the self/cross pair and once after (the projections
    and norms are per-token, so pre-projection rolling is equivalent)."""
    from drba_tpu.ops.attn_layer import transformer_layer_mxu

    b2, h, w, c = concat0.shape
    k = attn_splits
    sh, sw = (h // k) // 2, (w // k) // 2
    lab = _shift_region_labels(h, w, k).reshape(k * k, h // k, w // k)

    def wcat(base, names):
        return jnp.concatenate([p[f"{base}.{n}.weight"] for n in names], axis=1)

    x = concat0
    for i in range(NUM_LAYERS):
        with_shift = i % 2 == 1
        if with_shift:
            x = jnp.roll(x, (-sh, -sw), axis=(1, 2))
        # the cross layer attends to the swap of the state BEFORE this
        # block's self-attention (the reference updates concat1 once per
        # block, transformer.py:291-300)
        x_pre = x
        for attn, cross in (("self_attn", False), ("cross_attn_ffn", True)):
            base = f"transformer.layers.{i}.{attn}"
            ffn = None
            if cross:
                ffn = (p[f"{base}.mlp.0.weight"], p[f"{base}.mlp.2.weight"],
                       p[f"{base}.norm2.weight"], p[f"{base}.norm2.bias"])
            x = transformer_layer_mxu(
                x,
                wcat(base, ("q_proj", "k_proj", "v_proj")),
                p[f"{base}.merge.weight"],
                (p[f"{base}.norm1.weight"], p[f"{base}.norm1.bias"]),
                k,
                labels=lab if with_shift else None,
                with_mask=with_shift,
                cross_swap=cross,
                target=x_pre if cross else None,
                ffn=ffn,
            )
        if with_shift:
            x = jnp.roll(x, (sh, sw), axis=(1, 2))
    half = b2 // 2
    return x[:half], x[half:]


def transformer_apply(p: Params, feature0, feature1, attn_splits: int):
    """FeatureTransformer (transformer.py:244-322): 6 blocks of
    self-attn + cross-attn(ffn), both directions batched together."""
    concat0 = jnp.concatenate([feature0, feature1], axis=0)  # (2B,H,W,C)
    b2, h, w, c = concat0.shape
    if _fused_layer_on(h, w, attn_splits, c):
        return _transformer_apply_fused(p, concat0, attn_splits)
    concat1 = jnp.concatenate([feature1, feature0], axis=0)
    for i in range(NUM_LAYERS):
        with_shift = attn_splits > 1 and i % 2 == 1
        concat0 = _transformer_layer(
            p, f"transformer.layers.{i}.self_attn", concat0, concat0,
            attn_splits, with_shift, no_ffn=True,
        )
        concat0 = _transformer_layer(
            p, f"transformer.layers.{i}.cross_attn_ffn", concat0, concat1,
            attn_splits, with_shift, no_ffn=False,
        )
        half = b2 // 2
        concat1 = jnp.concatenate([concat0[half:], concat0[:half]], axis=0)
    half = b2 // 2
    return concat0[:half], concat0[half:]


# ---------------------------------------------------------------------------
# Correlation
# ---------------------------------------------------------------------------


def global_correlation_flow(feature0, feature1, bidir: bool = False):
    """global_correlation_softmax (matching.py:7-38)."""
    b, h, w, c = feature0.shape
    f0 = feature0.reshape(b, h * w, c)
    f1 = feature1.reshape(b, h * w, c)

    gx, gy = np.meshgrid(np.arange(w, dtype=np.float32), np.arange(h, dtype=np.float32))
    grid = jnp.asarray(np.stack([gx, gy], axis=-1).reshape(h * w, 2))  # (HW, 2)

    if _fused_attention_on() and c % 128 == 0:
        # flash kernel: softmax(f0 f1^T / sqrt(c)) @ grid without ever
        # materializing the (B, HW, HW) correlation (~0.5 GB f32 at 1080p);
        # the backward direction swaps the roles of f0/f1 instead of
        # materializing + transposing + concatenating the correlation
        gb = jnp.broadcast_to(grid[None], (b, h * w, 2))
        correspondence = flash_attention_mxu(f0, f1, gb, out_dtype=jnp.float32)
        if bidir:
            correspondence = jnp.concatenate(
                [correspondence,
                 flash_attention_mxu(f1, f0, gb, out_dtype=jnp.float32)],
                axis=0,
            )
    else:
        corr = jnp.einsum("blc,bmc->blm", f0, f1, preferred_element_type=jnp.float32) / math.sqrt(c)
        if bidir:
            corr = jnp.concatenate([corr, jnp.swapaxes(corr, 1, 2)], axis=0)  # (2B,...)
        prob = jax.nn.softmax(corr, axis=-1)
        correspondence = jnp.einsum("blm,mk->blk", prob, grid, preferred_element_type=jnp.float32)
    flow = correspondence - grid[None]
    bb = flow.shape[0]
    return flow.reshape(bb, h, w, 2).astype(feature0.dtype)


def local_correlation_flow(feature0, feature1, radius: int):
    """local_correlation_softmax (matching.py:41-89) as dense shifts.

    Sample offsets are the integer window grid, so grid_sample reduces to
    shifted reads with zero padding; flow = sum_k softmax(corr)_k * offset_k
    (out-of-image offsets masked to -1e4 before softmax, matching.py:79).
    """
    b, h, w, c = feature0.shape
    r = radius
    k = 2 * r + 1
    f0 = feature0.astype(jnp.float32)
    f1p = jnp.pad(feature1.astype(jnp.float32), ((0, 0), (r, r), (r, r), (0, 0)))

    gx = jnp.arange(w, dtype=jnp.float32)[None, None, :]
    gy = jnp.arange(h, dtype=jnp.float32)[None, :, None]

    corrs = []
    valids = []
    offsets = []
    for dy in range(-r, r + 1):
        for dx in range(-r, r + 1):
            shifted = jax.lax.dynamic_slice(
                f1p, (0, dy + r, dx + r, 0), (b, h, w, c)
            )
            corrs.append(jnp.sum(f0 * shifted, axis=-1) / math.sqrt(c))
            valids.append(((gx + dx >= 0) & (gx + dx < w) & (gy + dy >= 0) & (gy + dy < h)))
            offsets.append((dx, dy))
    corr = jnp.stack(corrs, axis=-1)  # (B,H,W,k^2)
    valid = jnp.stack([jnp.broadcast_to(v, corr.shape[:3]) for v in valids], axis=-1)
    corr = jnp.where(valid, corr, -1e4)
    prob = jax.nn.softmax(corr, axis=-1)
    off = jnp.asarray(np.array(offsets, np.float32))  # (k^2, 2) as (dx, dy)
    flow = jnp.einsum("bhwk,kc->bhwc", prob, off, preferred_element_type=jnp.float32)
    return flow.astype(feature0.dtype)


# ---------------------------------------------------------------------------
# Flow propagation (FeatureFlowAttention) + convex upsampling
# ---------------------------------------------------------------------------


def flow_prop_global(p: Params, feature0, flow):
    """Global self-attn propagation (transformer.py:343-374). Note the
    reference's quirk: key = k_proj(q_proj(feature)) — kept for parity."""
    b, h, w, c = feature0.shape
    q = linear(p, "feature_flow_attn.q_proj", feature0).reshape(b, h * w, c)
    k = linear(p, "feature_flow_attn.k_proj", q)
    fl = flow.reshape(b, h * w, 2).astype(jnp.float32)
    if _fused_attention_on() and c % 128 == 0:
        # flash kernel — the (B, HW, HW) score tensor stays chunk-resident
        out = flash_attention_mxu(q, k, fl, out_dtype=jnp.float32)
    else:
        scores = jnp.einsum(
            "blc,bmc->blm", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(c)
        # f32 softmax straight into the einsum — see _window_attention note
        prob = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("blm,bmc->blc", prob, fl,
                         preferred_element_type=jnp.float32)
    return out.reshape(b, h, w, 2).astype(flow.dtype)


def flow_prop_local(p: Params, feature0, flow, radius: int = 1):
    """Local-window propagation via unfold (transformer.py:376-409)."""
    b, h, w, c = feature0.shape
    q = linear(p, "feature_flow_attn.q_proj", feature0)  # (B,H,W,C)
    # unlike the global path, the local path projects the ORIGINAL feature
    # with k_proj (transformer.py:389), not k_proj(q_proj(x))
    kfull = linear(p, "feature_flow_attn.k_proj", feature0)
    assert radius == 1, "reference uses prop_radius 1 at the refine scale"
    k_win = unfold3x3(kfull)  # (B,H,W,C,9)
    flow_win = unfold3x3(flow)  # (B,H,W,2,9)
    scores = jnp.einsum("bhwc,bhwck->bhwk", q, k_win,
                        preferred_element_type=jnp.float32) / math.sqrt(c)
    prob = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhwk,bhwck->bhwc", prob, flow_win.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return out.astype(flow.dtype)


def convex_upsample(p: Params, flow, feature):
    """Convex x4 upsampling (gmflow.py:74-90)."""
    b, h, w, _ = flow.shape
    K = UPSAMPLE_FACTOR
    concat = jnp.concatenate([flow, feature], axis=-1)
    mask = relu(conv2d(p, "upsampler.0", concat, stride=1, padding=1))
    mask = conv2d(p, "upsampler.2", mask, stride=1, padding=0)  # (B,H,W,9*K*K)
    mask = mask.reshape(b, h, w, 9, K, K)
    mask = jax.nn.softmax(mask.astype(jnp.float32), axis=3)

    up = unfold3x3(flow.astype(jnp.float32) * K)  # (B,H,W,2,9)
    out = jnp.einsum("bhwqij,bhwcq->bhwcij", mask, up,
                     preferred_element_type=jnp.float32)  # (B,H,W,2,K,K)
    out = out.transpose(0, 1, 4, 2, 5, 3).reshape(b, h * K, w * K, 2)
    return out.astype(flow.dtype)


# ---------------------------------------------------------------------------
# Full forward
# ---------------------------------------------------------------------------


def normalize_img(img):
    mean = jnp.asarray(IMAGENET_MEAN, img.dtype)
    std = jnp.asarray(IMAGENET_STD, img.dtype)
    return (img - mean) / std


def gmflow_apply(p: Params, img0, img1, pred_bidir: bool = False):
    """GMFlow.forward (gmflow.py:92-185). Returns flow at input resolution
    (B,H,W,2), or (2B,...) with [fwd; bwd] when ``pred_bidir``."""
    img0 = normalize_img(img0)
    img1 = normalize_img(img1)

    both = jnp.concatenate([img0, img1], axis=0)
    hi, lo = backbone_apply(p, both)
    b = img0.shape[0]
    features = [(lo[:b], lo[b:]), (hi[:b], hi[b:])]  # low res -> high res

    flow = None
    for scale_idx in range(2):
        feature0, feature1 = features[scale_idx]
        attn_splits = ATTN_SPLITS[scale_idx]
        corr_radius = CORR_RADIUS[scale_idx]
        prop_radius = PROP_RADIUS[scale_idx]

        if pred_bidir and scale_idx > 0:
            feature0, feature1 = (
                jnp.concatenate([feature0, feature1], axis=0),
                jnp.concatenate([feature1, feature0], axis=0),
            )

        if scale_idx > 0:
            h2, w2 = feature0.shape[1], feature0.shape[2]
            flow = resize_bilinear(flow, (h2, w2), align_corners=True) * 2
            feature1 = backwarp(feature1, flow, padding_mode="zeros")

        feature0, feature1 = add_position(feature0, feature1, attn_splits)
        feature0, feature1 = transformer_apply(p, feature0, feature1, attn_splits)

        if corr_radius == -1:
            flow_pred = global_correlation_flow(feature0, feature1, bidir=pred_bidir and scale_idx == 0)
        else:
            flow_pred = local_correlation_flow(feature0, feature1, corr_radius)

        flow = flow_pred if flow is None else flow + flow_pred

        if pred_bidir and scale_idx == 0:
            feature0 = jnp.concatenate([feature0, feature1], axis=0)

        if prop_radius > 0:
            flow = flow_prop_local(p, feature0, flow, prop_radius)
        else:
            flow = flow_prop_global(p, feature0, flow)

        if scale_idx == 1:
            flow = convex_upsample(p, flow, feature0)

    return flow
