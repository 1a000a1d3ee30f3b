"""IFNet 4.26-heavy (RIFE's flow/fusion network) in functional JAX.

Architecture reproduced from models/rife_426_heavy/IFNet_HDv3.py:
  * ``Head`` encoder: 3 convs + transposed conv, 16ch (IFNet_HDv3.py:28-47);
  * 5 coarse-to-fine ``IFBlock``s (c=192/128/96/64/32): stride-4 conv0 ->
    8x ResConv with learned per-channel beta -> ConvTranspose + PixelShuffle
    to 4ch flow + 1ch mask + 8ch feat (IFNet_HDv3.py:62-96);
  * per-stage backward warp of images and encoder features, sigmoid-mask
    merge (IFNet_HDv3.py:126-177). Accepts per-pixel tensor timesteps
    (IFNet_HDv3.py:131-132) — the DRM hook.

The five-stage python loop unrolls at trace time into one fused XLA program;
all resizes are static-shape bilinear (align_corners=False, matching
``F.interpolate`` in IFBlock.forward at IFNet_HDv3.py:85-92).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from drba_tpu.models.layers import Params, conv2d, conv_transpose2d, leaky_relu
from drba_tpu.ops import backwarp, pixel_shuffle
from drba_tpu.ops.shuffle import fold_convT4s2_shuffle
from drba_tpu.ops.warp import _sample_pixels
from drba_tpu.ops.warp_mxu import (
    backwarp_mxu, sample_positions_mxu, warp_downsample2_mxu,
)
from drba_tpu.ops.resize import resize_bilinear

BLOCK_CHANNELS = (192, 128, 96, 64, 32)
BLOCK_IN = (7 + 32, 8 + 4 + 8 + 32, 8 + 4 + 8 + 32, 8 + 4 + 8 + 32, 8 + 4 + 8 + 32)


def build_spec() -> dict:
    """Param spec with torch state-dict key names (converter contract)."""
    spec = {}
    # Head encoder
    spec["encode.cnn0.weight"] = ("conv", 3, 3, 3, 16)
    spec["encode.cnn0.bias"] = ("bias", 16)
    spec["encode.cnn1.weight"] = ("conv", 3, 3, 16, 16)
    spec["encode.cnn1.bias"] = ("bias", 16)
    spec["encode.cnn2.weight"] = ("conv", 3, 3, 16, 16)
    spec["encode.cnn2.bias"] = ("bias", 16)
    spec["encode.cnn3.weight"] = ("convT", 4, 4, 16, 16)
    spec["encode.cnn3.bias"] = ("bias", 16)
    for i, (cin, c) in enumerate(zip(BLOCK_IN, BLOCK_CHANNELS)):
        b = f"block{i}"
        # in_planes already counts the 4 flow channels concatenated in
        # IFBlock.forward for blocks 1-4 (IFNet_HDv3.py:86-88,102-106)
        spec[f"{b}.conv0.0.0.weight"] = ("conv", 3, 3, cin, c // 2)
        spec[f"{b}.conv0.0.0.bias"] = ("bias", c // 2)
        spec[f"{b}.conv0.1.0.weight"] = ("conv", 3, 3, c // 2, c)
        spec[f"{b}.conv0.1.0.bias"] = ("bias", c)
        for j in range(8):
            spec[f"{b}.convblock.{j}.conv.weight"] = ("conv", 3, 3, c, c)
            spec[f"{b}.convblock.{j}.conv.bias"] = ("bias", c)
            spec[f"{b}.convblock.{j}.beta"] = ("ones", (c,))
        spec[f"{b}.lastconv.0.weight"] = ("convT", 4, 4, c, 4 * 13)
        spec[f"{b}.lastconv.0.bias"] = ("bias", 4 * 13)
    return spec


IFNET_SPEC = build_spec()


def fold_lastconvs(p: Params) -> Params:
    """Precompute each block's folded lastconv weights (see ifnet_block) so
    the weight rearrangement runs once at load time, not in-graph."""
    out = dict(p)
    for i in range(5):
        b = f"block{i}"
        w4, b4 = fold_convT4s2_shuffle(
            p[f"{b}.lastconv.0.weight"], p[f"{b}.lastconv.0.bias"], r2=2
        )
        out[f"{b}.lastconv.fold4.weight"] = w4
        out[f"{b}.lastconv.fold4.bias"] = b4
    return out


def ifnet_encode(p: Params, img: jax.Array) -> jax.Array:
    """Head feature encoder (IFNet_HDv3.py:37-47)."""
    x = conv2d(p, "encode.cnn0", img, stride=2, padding=1)
    x = conv2d(p, "encode.cnn1", leaky_relu(x), stride=1, padding=1)
    x = conv2d(p, "encode.cnn2", leaky_relu(x), stride=1, padding=1)
    x = conv_transpose2d(p, "encode.cnn3", leaky_relu(x), stride=2, padding=1)
    return x


# (wh, ww) sampling-window sizes for the MXU tap path: a 128-tap tile spans
# 64*k source columns (taps come 2 per k-cell), so the window must cover that
# span plus the 128-lane start quantization plus flow spread.
_MXU_TAP_WIN = {4: (48, 512), 8: (64, 768)}


def _warp_then_downsample(img: jax.Array, flow: jax.Array, k: int,
                          use_mxu: bool = False) -> jax.Array:
    """Exactly ``downsample_k(backwarp(img, flow))`` with 4x/k^2 fewer sample
    positions: the 2-tap-per-axis bilinear downsample (see ops/resize.py)
    only reads the warped image at a strided tap grid, so the warp is
    evaluated there directly — bit-identical output. The taps are sampled by
    the MXU window kernel when available, else the patch gather."""
    if k == 1:
        return backwarp(img, flow)
    n, h, w, _ = img.shape

    def tap_starts(kk):
        if kk % 2 == 0:
            return ((kk - 2) // 2, kk // 2)
        return ((kk - 1) // 2,)

    ys = tap_starts(k)
    xs = tap_starts(k)
    # tap coordinate grids (static) and flow sampled AT the taps
    ty = jnp.concatenate([jnp.arange(s, h, k, dtype=jnp.float32) for s in ys])
    ty = jnp.sort(ty)
    tx = jnp.sort(jnp.concatenate([jnp.arange(s, w, k, dtype=jnp.float32) for s in xs]))
    iy = ty.astype(jnp.int32)
    ix = tx.astype(jnp.int32)
    flow_t = flow[:, iy][:, :, ix]  # strided: dense slices under the hood
    px = tx[None, None, :] + flow_t[..., 0].astype(jnp.float32)
    py = ty[None, :, None] + flow_t[..., 1].astype(jnp.float32)
    win = _MXU_TAP_WIN.get(k)
    if use_mxu and win and w >= win[1] and h >= win[0] and len(ty) % 8 == 0:
        warped_taps = sample_positions_mxu(img, px, py, wh=win[0], ww=win[1])
    else:
        warped_taps = _sample_pixels(img, px, py, "border")  # (N, nty, ntx, C)
    if k % 2 == 0:
        # 2x2 tap average = the separable 0.5/0.5 bilinear downsample
        nt_h, nt_w = warped_taps.shape[1] // 2, warped_taps.shape[2] // 2
        v = warped_taps.reshape(n, nt_h, 2, nt_w, 2, img.shape[-1])
        return v.mean(axis=(2, 4)).astype(img.dtype)
    return warped_taps


def _use_mxu_warp(warp_backend: str, h: int, w: int,
                  wh: int = None, ww: int = None) -> bool:
    """Whether the Pallas residual-window warp kernel applies.

    Window geometry defaults follow ops.warp_mxu (DRBA_WARP_WIN hook).

    NOTE: the MXU kernel reads ``pl.program_id`` for its scalar-prefetch
    indexing, so it must never be traced under ``vmap`` — callers batch
    explicitly (see rife._drba_window). Non-lane-multiple widths are
    edge-padded inside the kernel wrapper, so only H-alignment and a minimum
    extent are required here.
    """
    if wh is None or ww is None:
        from drba_tpu.ops.warp_mxu import _DEF_WH, _DEF_WW

        wh = _DEF_WH if wh is None else wh
        ww = _DEF_WW if ww is None else ww
    shapes_ok = h % 8 == 0 and h >= wh and (w + 127) // 128 * 128 >= ww
    if warp_backend == "mxu":
        return shapes_ok
    if warp_backend == "auto":
        import jax as _jax

        return shapes_ok and _jax.default_backend() != "cpu"
    return False


def _backwarp2(a, b, flow4, use_mxu: bool):
    """Warp ``a`` by flow4[..., 0:2] and ``b`` by flow4[..., 2:4].

    Both directions run as ONE batched kernel call / gather program — the
    per-call cost (dispatch, window DMA setup) amortizes across directions.
    """
    if use_mxu:
        n = a.shape[0]
        out = backwarp_mxu(
            jnp.concatenate([a, b], axis=0),
            jnp.concatenate([flow4[..., 0:2], flow4[..., 2:4]], axis=0),
        )
        return out[:n], out[n:]
    return backwarp(a, flow4[..., 0:2]), backwarp(b, flow4[..., 2:4])


# max convs per fused chain invocation: halo redundancy is (hb+2n)/hb rows,
# so splitting the 8x ResConv run bounds the recompute while still
# amortizing the per-invocation tax over 4 convs + epilogues
_RESCONV_SPLIT = 4


def _use_resconv_chain(conv_backend: str, c: int, w: int) -> bool:
    """Whether the fused conv-chain kernel handles this ResConv geometry.

    c=96 runs channel-padded to 128; c=192 (block0) and non-8-multiple
    packed widths (block1 at 1080p) stay on XLA — both are tiny."""
    cpad = 128 if c == 96 else c
    f = max(1, 128 // cpad)
    shapes_ok = (f * cpad) % 128 == 0 and w % f == 0 and (w // f) % 8 == 0
    if conv_backend == "pallas":
        return shapes_ok
    if conv_backend in ("auto", "packed_chain"):  # packed_chain only
        # retargets the GridNet lattice; IFNet keeps its measured default
        import jax as _jax

        return shapes_ok and _jax.default_backend() != "cpu"
    return False


def _resconv_chain(p: Params, b: str, feat: jax.Array, conv_backend: str):
    """8x ResConv ``leaky(conv(x) * beta + x)`` (IFNet_HDv3.py:12-20,71).

    Fused path: the whole run executes as conv-chain kernel invocations of
    ``_RESCONV_SPLIT`` convs each — intermediates stay in VMEM, bias/beta/
    leaky epilogues fuse with the matmuls (ops/conv_chain.py)."""
    c = feat.shape[-1]
    if (conv_backend == "packed" and 128 % c == 0
            and feat.shape[2] % (128 // c) == 0):
        # column-packed run (ops/conv_packed.py): each conv is ONE dense
        # packed XLA conv at the 128-lane rate (f x the MACs, f = 128/c);
        # per-channel beta/bias tile to the f phase blocks; leaky and the
        # residual add are layout-blind. Pack/unpack pays once per run.
        from drba_tpu.ops.conv_chain import pack_cols, unpack_cols
        from drba_tpu.ops.conv_packed import conv3_packed

        f = 128 // c
        xp = pack_cols(feat, f)
        for j in range(8):
            beta = jnp.tile(p[f"{b}.convblock.{j}.beta"], f).astype(xp.dtype)
            y = conv3_packed(xp, p[f"{b}.convblock.{j}.conv.weight"],
                             p[f"{b}.convblock.{j}.conv.bias"], f=f)
            xp = leaky_relu(y * beta + xp)
        return unpack_cols(xp, f)
    if not _use_resconv_chain(conv_backend, c, feat.shape[2]):
        for j in range(8):
            beta = p[f"{b}.convblock.{j}.beta"].astype(feat.dtype)
            feat = leaky_relu(
                conv2d(p, f"{b}.convblock.{j}.conv", feat, padding=1) * beta + feat
            )
        return feat

    from drba_tpu.ops.conv_chain import (
        ChainStep, conv_chain, pack_cols, unpack_cols,
    )

    cpad = 128 if c == 96 else c
    x = feat
    if cpad != c:
        # zero-padded channels stay zero through the chain: conv taps and
        # bias are zero there, and leaky(0 * beta + 0) == 0
        x = jnp.pad(feat, ((0, 0), (0, 0), (0, 0), (0, cpad - c)))
    steps = []
    for j in range(8):
        w = p[f"{b}.convblock.{j}.conv.weight"]
        bb = p[f"{b}.convblock.{j}.conv.bias"]
        beta = p[f"{b}.convblock.{j}.beta"]
        if cpad != c:
            w = jnp.pad(w, ((0, 0), (0, 0), (0, cpad - c), (0, cpad - c)))
            bb = jnp.pad(bb, (0, cpad - c))
            beta = jnp.pad(beta, (0, cpad - c))
        steps.append(ChainStep(w=w, b=bb, beta=beta))
    # pack once across the whole run (the 64/32ch -> 128-lane retiling is a
    # real relayout; pay it at the run boundary, not per invocation)
    f = max(1, 128 // cpad)
    if f > 1:
        x = pack_cols(x, f)
    for k in range(0, 8, _RESCONV_SPLIT):
        x = conv_chain(x, steps[k : k + _RESCONV_SPLIT], packed=f > 1)
    if f > 1:
        x = unpack_cols(x, f)
    return x[..., :c] if cpad != c else x


def ifnet_block(
    p: Params, idx: int, x: jax.Array, flow: jax.Array | None, scale: float,
    x_at_scale: bool = False, out_size: tuple[int, int] | None = None,
    conv_backend: str = "auto",
):
    """One IFBlock at pyramid scale ``scale`` (IFNet_HDv3.py:84-96).

    ``x_at_scale=True`` means the caller already built ``x`` at the block's
    working resolution (the warp-then-downsample fast path); ``out_size``
    then gives the full resolution to upsample back to.
    """
    b = f"block{idx}"
    if x_at_scale:
        hs, ws = x.shape[1], x.shape[2]
        h, w = out_size
    else:
        n, h, w, _ = x.shape
        hs, ws = int(h / scale), int(w / scale)
        x = resize_bilinear(x, (hs, ws))
    if flow is not None:
        flow = resize_bilinear(flow, (hs, ws)) * (1.0 / scale)
        x = jnp.concatenate([x, flow], axis=-1)

    feat = leaky_relu(conv2d(p, f"{b}.conv0.0.0", x, stride=2, padding=1))
    feat = leaky_relu(conv2d(p, f"{b}.conv0.1.0", feat, stride=2, padding=1))
    feat = _resconv_chain(p, b, feat, conv_backend)
    # lastconv (ConvTranspose 4x4/s2 + PixelShuffle 2, IFNet_HDv3.py:79-82)
    # folded to one stride-1 conv AT FEATURE RESOLUTION + one shuffle(4):
    # skips the dilated-conv lowering and one full-tile relayout pass
    # (exact weight rearrangement, ops/shuffle.py:fold_convT4s2_shuffle).
    # Model wrappers precompute the folded weights at load time
    # (fold_lastconvs); the inline fold keeps raw param dicts working.
    if f"{b}.lastconv.fold4.weight" in p:
        w4 = p[f"{b}.lastconv.fold4.weight"]
        b4 = p[f"{b}.lastconv.fold4.bias"]
    else:
        w4, b4 = fold_convT4s2_shuffle(
            p[f"{b}.lastconv.0.weight"], p[f"{b}.lastconv.0.bias"], r2=2
        )
    tmp = jax.lax.conv_general_dilated(
        feat, w4.astype(feat.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    ).astype(feat.dtype) + b4.astype(feat.dtype)
    tmp = pixel_shuffle(tmp, 4)
    tmp = resize_bilinear(tmp, (h, w))
    out_flow = tmp[..., :4] * scale
    mask = tmp[..., 4:5]
    feat_out = tmp[..., 5:]
    return out_flow, mask, feat_out


def ifnet_apply(
    p: Params,
    img0: jax.Array,
    img1: jax.Array,
    timestep: jax.Array,
    scale_list: tuple[float, ...],
    f0: jax.Array | None = None,
    f1: jax.Array | None = None,
    warp_backend: str = "auto",
    conv_backend: str = "auto",
):
    """Full 5-stage inference (IFNet_HDv3.py:126-177).

    ``timestep`` is an (N,H,W,1) map — scalars are broadcast by the caller.
    Returns (merged_frame, flow_list). ``N`` may carry a folded timestep
    batch (rife stacks the whole window's frames into it).
    """
    if f0 is None:
        f0 = ifnet_encode(p, img0[..., :3])
    if f1 is None:
        f1 = ifnet_encode(p, img1[..., :3])

    h, w = img0.shape[1], img0.shape[2]
    use_mxu = _use_mxu_warp(warp_backend, h, w)
    flow = None
    mask = None
    feat = None
    flow_list = []
    # TPU notes (gather cost is per-index):
    #  * each stage warps cat(img, feat) for BOTH directions in one batched
    #    program instead of separate img/feature warps (IFNet_HDv3.py:151-164);
    #  * full-res warps use the Pallas residual-window MXU kernel
    #    (ops/warp_mxu.py) when available — the scale-2 stage warps at full
    #    res and downsamples (bit-identical to sampling at the tap grid);
    #  * gather-path stages at integer pyramid scale k >= 4 fuse the warp
    #    with the block-input downsample (_warp_then_downsample): gather
    #    indices drop by k^2/4 with identical values.
    for i in range(5):
        if flow is None:
            x = jnp.concatenate([img0[..., :3], img1[..., :3], f0, f1, timestep], axis=-1)
            flow, mask, feat = ifnet_block(p, i, x, None, scale_list[i],
                                           conv_backend=conv_backend)
        else:
            sc = scale_list[i]
            ki = int(sc) if float(sc).is_integer() and sc >= 2 and h % int(sc) == 0 and w % int(sc) == 0 else None
            if ki is not None and (ki >= 4 or not use_mxu):
                # both directions through ONE tap-warp call (the per-call
                # fixed cost — dispatch, tap-grid prep, window DMA setup —
                # amortizes across directions, as in _backwarp2)
                n = img0.shape[0]
                both = _warp_then_downsample(
                    jnp.concatenate([
                        jnp.concatenate([img0[..., :3], f0], axis=-1),
                        jnp.concatenate([img1[..., :3], f1], axis=-1),
                    ], axis=0),
                    jnp.concatenate([flow[..., 0:2], flow[..., 2:4]], axis=0),
                    ki, use_mxu,
                )
                w0, w1 = both[:n], both[n:]
                rest = resize_bilinear(
                    jnp.concatenate([timestep, mask, feat], axis=-1), (h // ki, w // ki)
                )
                x = jnp.concatenate(
                    [w0[..., :3], w1[..., :3], w0[..., 3:], w1[..., 3:], rest], axis=-1
                )
                fd, mask, feat = ifnet_block(
                    p, i, x, flow, sc, x_at_scale=True, out_size=(h, w),
                    conv_backend=conv_backend,
                )
            elif ki == 2:
                a = jnp.concatenate([img0[..., :3], f0], axis=-1)
                bimg = jnp.concatenate([img1[..., :3], f1], axis=-1)
                if use_mxu and h % 16 == 0 and w % 2 == 0:
                    # fused warp + 2x downsample: rank-1 marginal taps do the
                    # downsample inside the sampling matmul at 1/4 the
                    # positions (ops/warp_mxu.warp_downsample2_mxu)
                    n = a.shape[0]
                    both = warp_downsample2_mxu(
                        jnp.concatenate([a, bimg], axis=0),
                        jnp.concatenate([flow[..., 0:2], flow[..., 2:4]], axis=0),
                    )
                    w0, w1 = both[:n], both[n:]
                else:  # warp at full res + exact 2x downsample
                    wf0, wf1 = _backwarp2(a, bimg, flow, use_mxu)
                    w0 = resize_bilinear(wf0, (h // 2, w // 2))
                    w1 = resize_bilinear(wf1, (h // 2, w // 2))
                rest = resize_bilinear(
                    jnp.concatenate([timestep, mask, feat], axis=-1), (h // 2, w // 2)
                )
                x = jnp.concatenate(
                    [w0[..., :3], w1[..., :3], w0[..., 3:], w1[..., 3:], rest], axis=-1
                )
                fd, mask, feat = ifnet_block(
                    p, i, x, flow, sc, x_at_scale=True, out_size=(h, w),
                    conv_backend=conv_backend,
                )
            else:
                wf0, wf1 = _backwarp2(
                    jnp.concatenate([img0[..., :3], f0], axis=-1),
                    jnp.concatenate([img1[..., :3], f1], axis=-1),
                    flow, use_mxu,
                )
                x = jnp.concatenate(
                    [wf0[..., :3], wf1[..., :3], wf0[..., 3:], wf1[..., 3:], timestep, mask, feat],
                    axis=-1,
                )
                fd, mask, feat = ifnet_block(p, i, x, flow, sc,
                                             conv_backend=conv_backend)
            flow = flow + fd
        flow_list.append(flow)

    warped_img0, warped_img1 = _backwarp2(img0, img1, flow, use_mxu)
    m = jax.nn.sigmoid(mask.astype(jnp.float32)).astype(img0.dtype)
    merged = warped_img0 * m + warped_img1 * (1 - m)
    return merged, flow_list
