"""GMFSS_UNION wrapper — the high-quality path (models/gmfss_union.py).

GMFSS plus an auxiliary RIFE: the full IFNet-426-heavy runs at half
resolution with a DRM timestep map and its output becomes the middle 3
channels of the fusion GridNet (models/gmfss_union.py:70-77,
model_gmfss_union/GMFSS.py:152). pad_size is 128 so the half-res aux RIFE
still sees 64-aligned frames (models/gmfss_union.py:23).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from drba_tpu.config import Config, DEFAULT
from drba_tpu.convert import load_network
from drba_tpu.drm import calc_drm_gmfss, calc_drm_rife_auxiliary
from drba_tpu.models.gmflow_net import GMFLOW_SPEC
from drba_tpu.models.gmfss_core import (
    GmfssParams,
    Reuse,
    gmfss_reuse,
    gmfss_union_inference,
)
from drba_tpu.models.gmfss_nets import (
    FEATURENET_SPEC,
    GRIDNET_UNION_SPEC,
    METRICNET_SPEC,
)
from drba_tpu.models.gmfss import _select_reuse
from drba_tpu.models.ifnet import IFNET_SPEC, fold_lastconvs, ifnet_apply
from drba_tpu.ops.resize import resize_bilinear, scale_by


@functools.partial(
    jax.jit,
    static_argnames=("scale_list", "linear", "backend", "warp_backend",
                     "drm_splat_scale", "conv_backend"),
)
def _drba_window(p, rife_params, I0, I1, I2, ts, reuse10, reuse12, scale_list,
                 linear, backend="auto", warp_backend="auto",
                 drm_splat_scale=1.0, conv_backend="auto"):
    """All T timesteps as ONE batched program, T folded into the batch axis
    (explicit batching — see models/gmfss.py). The aux RIFE runs as one
    batched IFNet call and may use the MXU warp kernel (never possible under
    the old per-t vmap)."""
    T = ts.shape[0]
    tt = jnp.where(ts < 1, 1 - ts, ts - 1)
    flow10, flow12 = reuse10.flow01, reuse12.flow01
    metric10, metric12 = reuse10.metric0, reuse12.metric0

    drm_g = calc_drm_gmfss(tt, flow10, flow12, metric10, metric12,
                           linear=linear, backend=backend,
                           splat_scale=drm_splat_scale)
    drm_r = calc_drm_rife_auxiliary(tt, flow10, flow12, metric10, metric12,
                                    linear=linear, backend=backend,
                                    splat_scale=drm_splat_scale)

    left = (ts < 1)[:, None, None, None]
    imgB = jnp.where(left, I0, I2)  # (T, H, W, 3)
    I1b = jnp.broadcast_to(I1, (T,) + I1.shape[1:])
    reuse = _select_reuse(left, reuse10, reuse12)
    t0 = jnp.where(left, drm_g.drm1t_t01, drm_g.drm1t_t12)
    t1 = jnp.where(left, drm_g.drm0t_t01, drm_g.drm2t_t12)
    drm_rife = jnp.where(left, drm_r.drm_t1_t01, drm_r.drm_t1_t12)

    # auxiliary RIFE at half resolution (models/gmfss_union.py:72-74)
    I1s = scale_by(I1b, 0.5)
    IBs = scale_by(imgB, 0.5)
    ts_map = resize_bilinear(drm_rife, (I1s.shape[1], I1s.shape[2]))
    rife, _ = ifnet_apply(rife_params, I1s, IBs, ts_map.astype(I1s.dtype),
                          scale_list, warp_backend=warp_backend,
                          conv_backend=conv_backend)

    out = gmfss_union_inference(
        p, I1b, imgB, reuse, t0.astype(I1.dtype), t1.astype(I1.dtype), rife,
        backend=backend, conv_backend=conv_backend,
    )
    tb = ts[:, None, None, None]
    out = jnp.where(tb == 0, I0, jnp.where(tb == 1, I1,
                    jnp.where(tb == 2, I2, out)))
    return out[:, None]  # (T, 1, H, W, 3) — original per-t sample contract


@functools.partial(
    jax.jit,
    static_argnames=("scale", "scale_list", "linear", "backend",
                     "warp_backend", "drm_splat_scale", "conv_backend"),
)
def _drba_window_fused(p, rife_params, I0, I1, I2, ts, reuse10: Reuse,
                       scale, scale_list, linear, backend="auto",
                       warp_backend="auto", drm_splat_scale=1.0,
                       conv_backend="auto"):
    """One dispatch per window: reuse(I1, I2) + the full timestep batch in a
    single XLA program. Returns (frames, reuse12)."""
    reuse12 = gmfss_reuse(p, I1, I2, scale=scale, union=True,
                          warp_backend=warp_backend,
                          conv_backend=conv_backend, feat0=reuse10.feat0)
    out = _drba_window(p, rife_params, I0, I1, I2, ts, reuse10, reuse12,
                       scale_list, linear, backend, warp_backend,
                       drm_splat_scale, conv_backend)
    return out, reuse12


@functools.partial(
    jax.jit, static_argnames=("scale_list", "backend", "warp_backend",
                              "conv_backend")
)
def _ts_batch(p, rife_params, I0, I1, ts, reuse, scale_list, backend="auto",
              warp_backend="auto", conv_backend="auto"):
    """Plain interpolation at T timesteps, T folded into the batch axis."""
    T = ts.shape[0]
    I0b = jnp.broadcast_to(I0, (T,) + I0.shape[1:])
    I1b = jnp.broadcast_to(I1, (T,) + I1.shape[1:])
    reuse_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (T,) + x.shape[1:]), reuse
    )
    I0s = scale_by(I0b, 0.5)
    I1s = scale_by(I1b, 0.5)
    tmap = jnp.full_like(I0s[..., :1], 0.0) + ts[:, None, None, None]
    rife, _ = ifnet_apply(rife_params, I0s, I1s, tmap.astype(I0s.dtype),
                          scale_list, warp_backend=warp_backend,
                          conv_backend=conv_backend)
    tcol = ts[:, None, None, None].astype(I0.dtype)
    out = gmfss_union_inference(p, I0b, I1b, reuse_b, tcol, 1 - tcol, rife,
                                enable_mask=False, backend=backend,
                                conv_backend=conv_backend)
    tb = ts[:, None, None, None]
    return jnp.where(tb == 0, I0, jnp.where(tb == 1, I1, out))[:, None]


class GMFSS_UNION:
    """High-quality path (reference: models/gmfss_union.py:10-100)."""

    def __init__(self, weights: str | None = None, scale: float = 1.0,
                 config: Config = DEFAULT):
        self.params = GmfssParams(
            flownet=load_network(weights, "flownet.pkl", GMFLOW_SPEC, seed=config.seed, strict=config.strict_load),
            metricnet=load_network(weights, "metric.pkl", METRICNET_SPEC, seed=config.seed + 1, strict=config.strict_load),
            feat_ext=load_network(weights, "feat.pkl", FEATURENET_SPEC, seed=config.seed + 2, strict=config.strict_load),
            fusionnet=load_network(weights, "fusionnet.pkl", GRIDNET_UNION_SPEC, seed=config.seed + 3, strict=config.strict_load),
        )
        self.rife_params = fold_lastconvs(
            load_network(weights, "rife.pkl", IFNET_SPEC, seed=config.seed + 4, strict=config.strict_load)
        )
        self.scale = scale
        self.scale_list = tuple(s / scale for s in (16.0, 8.0, 4.0, 2.0, 1.0))
        self.pad_size = 128
        self.config = config
        self._reuse_jit = jax.jit(
            functools.partial(gmfss_reuse, scale=self.scale, union=True,
                              warp_backend=config.warp_backend,
                              conv_backend=config.conv_backend)
        )

    def reuse(self, img0, img1, feat0=None) -> Reuse:
        return self._reuse_jit(self.params, img0, img1, feat0=feat0)

    def inference_ts(self, I0, I1, ts, reuse=None, return_reuse=False):
        """Plain interpolation; ``reuse``/``return_reuse`` chain the GMFlow
        pass across scene-cut windows (see models/gmfss.py)."""
        if len(ts) == 0:
            return ([], None) if return_reuse else []
        if reuse is None:
            reuse = self.reuse(I0, I1)
        out = _ts_batch(
            self.params, self.rife_params, I0, I1,
            jnp.asarray(ts, jnp.float32), reuse, self.scale_list,
            backend=self.config.splat_backend,
            warp_backend=self.config.warp_backend,
            conv_backend=self.config.conv_backend,
        )
        frames = [out[i] for i in range(len(ts))]
        return (frames, reuse) if return_reuse else frames

    def inference_ts_drba(self, I0, I1, I2, ts, reuse=None, linear: bool = False):
        reuse10 = self.reuse(I1, I0) if reuse is None else reuse

        if len(ts) == 0:
            reuse12 = self.reuse(I1, I2, feat0=reuse10.feat0)
            return [], reuse12.swapped()

        # fused single-program window: reuse(I1, I2) + all timesteps
        # (reuse10.feat0 is featurenet(I1) — not recomputed)
        out, reuse12 = _drba_window_fused(
            self.params, self.rife_params, I0, I1, I2,
            jnp.asarray(ts, jnp.float32), reuse10,
            self.scale, self.scale_list, linear, self.config.splat_backend,
            self.config.warp_backend, self.config.drm_splat_scale,
            self.config.conv_backend,
        )
        frames = [out[i] for i in range(len(ts))]

        return frames, reuse12.swapped()
