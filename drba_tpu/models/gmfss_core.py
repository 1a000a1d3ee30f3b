"""GMFSS model core: reuse (flow/metric/features) + fused inference.

Reproduces models/model_gmfss/GMFSS.py (quality path) and
models/model_gmfss_union/GMFSS.py (union path, 9ch fusion head + timestep
swap masking). The model is a bundle of four param dicts
(flownet/metricnet/feat_ext/fusionnet) + pure functions.

TPU-first: the reference runs the flow network twice per pair
(GMFSS.py:73-74); here both directions come from ONE bidirectional GMFlow
program (correlation-transpose trick), halving backbone/transformer work.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from drba_tpu.models.gmflow_net import gmflow_apply
from drba_tpu.models.gmfss_nets import (
    featurenet_apply,
    gridnet_apply,
    metricnet_apply,
)
from drba_tpu.ops import softsplat
from drba_tpu.ops.resize import resize_bilinear, scale_by


class GmfssParams(NamedTuple):
    flownet: dict
    metricnet: dict
    feat_ext: dict
    fusionnet: dict


class Reuse(NamedTuple):
    """reuse() outputs (GMFSS.py:58-81): flow/metric/feature pyramid."""
    flow01: jax.Array
    flow10: jax.Array
    metric0: jax.Array
    metric1: jax.Array
    feat0: tuple
    feat1: tuple

    def swapped(self) -> "Reuse":
        """Direction swap for window chaining (models/gmfss.py:68-71)."""
        return Reuse(self.flow10, self.flow01, self.metric1, self.metric0,
                     self.feat1, self.feat0)


def gmfss_reuse(p: GmfssParams, img0, img1, scale: float, union: bool = False,
                warp_backend: str = "auto", conv_backend: str = "auto",
                feat0=None) -> Reuse:
    """Precompute flow, metrics and feature pyramids (GMFSS.py:58-81).

    ``feat0`` may pass img0's feature pyramid from the previous window's
    chained reuse (``reuse10.feat0`` IS featurenet(I1)) — saves one
    featurenet evaluation per window, bit-identical.
    """
    if feat0 is None:
        feat0 = featurenet_apply(p.feat_ext, img0, conv_backend=conv_backend)
    feat1 = featurenet_apply(p.feat_ext, img1, conv_backend=conv_backend)

    img0h = scale_by(img0, 0.5)
    img1h = scale_by(img1, 0.5)

    if scale != 1.0:
        imgf0 = scale_by(img0h, scale)
        imgf1 = scale_by(img1h, scale)
    else:
        imgf0, imgf1 = img0h, img1h

    flows = gmflow_apply(p.flownet, imgf0, imgf1, pred_bidir=True)
    b = imgf0.shape[0]
    flow01, flow10 = flows[:b], flows[b:]
    if scale != 1.0:
        size = (img0h.shape[1], img0h.shape[2])
        flow01 = resize_bilinear(flow01, size) / scale
        flow10 = resize_bilinear(flow10, size) / scale

    metric0, metric1 = metricnet_apply(
        p.metricnet, img0h, img1h, flow01, flow10, union=union,
        warp_backend=warp_backend, conv_backend=conv_backend,
    )
    return Reuse(flow01, flow10, metric0, metric1, feat0, feat1)


def _warp_pyramid2(img0h, img1h, feats0, feats1, Ft0, Ft1, Zt0, Zt1,
                   extra0=None, extra1=None, backend="auto"):
    """Soft-splat BOTH directions' image + 3-level feature pyramids along
    scaled flows (GMFSS.py:95-115, both calls). Flow/metric rescale per
    pyramid level.

    TPU notes: (a) the image, level-1 features and any ``extra`` channels
    (the union path's timestep map) share (Ft, Zt), so they splat in one
    call; the warped-ones coverage comes from the same call's denominator
    (the reference issues a separate splat per tensor,
    model_gmfss_union/GMFSS.py:93-121); (b) BOTH directions stack along the
    batch axis, which the stencil kernel's native sample grid axis consumes
    in a single invocation per level (ops/splat_stencil.py v4) — 3 kernel
    invocations per window instead of 18.

    Returns ((I1t, feats1w, extra0w, cov0), (I2t, feats2w, extra1w, cov1)).
    """
    n = img0h.shape[0]
    c_img = img0h.shape[-1]
    c_f1 = feats0[0].shape[-1]

    def pack(img, f1, extra):
        parts = [img, f1]
        if extra is not None:
            parts.append(extra)
        return jnp.concatenate(parts, axis=-1)

    both = jnp.concatenate([pack(img0h, feats0[0], extra0),
                            pack(img1h, feats1[0], extra1)], axis=0)
    Ft = jnp.concatenate([Ft0, Ft1], axis=0)
    Zt = jnp.concatenate([Zt0, Zt1], axis=0)
    w1, cov = softsplat(both, Ft, Zt, "soft", backend=backend,
                        return_coverage=True)

    # flows scale with the pyramid level, so the dense backends' exact radius
    # scales too: r=12/6/3 covers the same physical motion at every level
    h2, w2 = feats0[1].shape[1], feats0[1].shape[2]
    Ftd = resize_bilinear(Ft, (h2, w2)) * 0.5
    Ztd = resize_bilinear(Zt, (h2, w2))
    f2 = softsplat(jnp.concatenate([feats0[1], feats1[1]], axis=0), Ftd, Ztd,
                   "soft", backend=backend, radius=6)

    h3, w3 = feats0[2].shape[1], feats0[2].shape[2]
    Ftdd = resize_bilinear(Ft, (h3, w3)) * 0.25
    Ztdd = resize_bilinear(Zt, (h3, w3))
    f3 = softsplat(jnp.concatenate([feats0[2], feats1[2]], axis=0), Ftdd, Ztdd,
                   "soft", backend=backend, radius=3)

    def unpack(d):
        sl = slice(d * n, (d + 1) * n)
        wd = w1[sl]
        It = wd[..., :c_img]
        f1w = wd[..., c_img : c_img + c_f1]
        extra_w = wd[..., c_img + c_f1 :] if (extra0 is not None) else None
        return It, (f1w, f2[sl], f3[sl]), extra_w, cov[sl]

    return unpack(0), unpack(1)


def gmfss_inference(p: GmfssParams, img0, img1, reuse: Reuse, timestep0, timestep1,
                    backend: str = "auto", conv_backend: str = "auto",
                    swap_thresh: float = 1.0):
    """Model.inference (model_gmfss/GMFSS.py:83-190): splat-and-fuse.

    ``swap_thresh`` mirrors the reference signature (GMFSS.py:83); like the
    reference's quality path it is accepted but unused — the active
    timestep-swap masking lives in the union variant below."""
    del swap_thresh
    F1t = timestep0 * reuse.flow01
    F2t = timestep1 * reuse.flow10
    Z1t = timestep0 * reuse.metric0
    Z2t = timestep1 * reuse.metric1

    img0h = scale_by(img0, 0.5)
    img1h = scale_by(img1, 0.5)

    (I1t, f1, _, _), (I2t, f2, _, _) = _warp_pyramid2(
        img0h, img1h, reuse.feat0, reuse.feat1, F1t, F2t, Z1t, Z2t,
        backend=backend,
    )

    out = gridnet_apply(
        p.fusionnet,
        jnp.concatenate([img0h, I1t, I2t, img1h], axis=-1),
        jnp.concatenate([f1[0], f2[0]], axis=-1),
        jnp.concatenate([f1[1], f2[1]], axis=-1),
        jnp.concatenate([f1[2], f2[2]], axis=-1),
        conv_backend=conv_backend,
    )
    return jnp.clip(out, 0.0, 1.0)


def gmfss_union_inference(
    p: GmfssParams, img0, img1, reuse: Reuse, timestep0, timestep1, rife,
    enable_mask: bool = True, backend: str = "auto",
    conv_backend: str = "auto",
):
    """Union Model.inference (model_gmfss_union/GMFSS.py:80-155): GridNet head
    consumes cat(I1t, rife, I2t); the timestep-swap mask kills ghosting where
    one warped stream's (warped, hole-filled) timestep dominates the other by
    more than 25x (GMFSS.py:114-150)."""
    F1t = timestep0 * reuse.flow01
    F2t = timestep1 * reuse.flow10
    Z1t = timestep0 * reuse.metric0
    Z2t = timestep1 * reuse.metric1

    img0h = scale_by(img0, 0.5)
    img1h = scale_by(img1, 0.5)

    is_map = enable_mask and hasattr(timestep0, "shape") and getattr(timestep0, "ndim", 0) == 4
    (I1t, f1, w_t0, cov0), (I2t, f2, w_t1, cov1) = _warp_pyramid2(
        img0h, img1h, reuse.feat0, reuse.feat1, F1t, F2t, Z1t, Z2t,
        extra0=timestep0 if is_map else None,
        extra1=timestep1 if is_map else None,
        backend=backend,
    )
    f1, f2 = list(f1), list(f2)

    if is_map:
        gaps0 = cov0 < 0.999
        gaps1 = cov1 < 0.999
        invalid = jnp.logical_or(gaps0, gaps1)
        w_t0 = jnp.where(invalid, 1.0, w_t0)
        w_t1 = jnp.where(invalid, 1.0, w_t1)

        def masks(scale):
            t0, t1 = w_t0, w_t1
            if scale != 1.0:
                t0 = scale_by(t0, scale)
                t1 = scale_by(t1, scale)
            return (t0 / t1 > 25.0), (t1 / t0 > 25.0)

        m0, m1 = masks(1.0)
        I1t, I2t = jnp.where(m0, I2t, I1t), jnp.where(m1, I1t, I2t)
        f1[0], f2[0] = jnp.where(m0, f2[0], f1[0]), jnp.where(m1, f1[0], f2[0])
        m0, m1 = masks(0.5)
        f1[1], f2[1] = jnp.where(m0, f2[1], f1[1]), jnp.where(m1, f1[1], f2[1])
        m0, m1 = masks(0.25)
        f1[2], f2[2] = jnp.where(m0, f2[2], f1[2]), jnp.where(m1, f1[2], f2[2])

    out = gridnet_apply(
        p.fusionnet,
        jnp.concatenate([I1t, rife, I2t], axis=-1),
        jnp.concatenate([f1[0], f2[0]], axis=-1),
        jnp.concatenate([f1[1], f2[1]], axis=-1),
        jnp.concatenate([f1[2], f2[2]], axis=-1),
        union=True,
        conv_backend=conv_backend,
    )
    return jnp.clip(out, 0.0, 1.0)
