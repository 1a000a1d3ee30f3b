"""GMFSS model wrapper — the quality path (models/gmfss.py).

Same uniform API as RIFE; the whole window (all timesteps) compiles to one
batched XLA program (the reference loops per-t, models/gmfss.py:47-66).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from drba_tpu.config import Config, DEFAULT
from drba_tpu.convert import load_network
from drba_tpu.drm import calc_drm_gmfss
from drba_tpu.models.gmflow_net import GMFLOW_SPEC
from drba_tpu.models.gmfss_core import (
    GmfssParams,
    Reuse,
    gmfss_inference,
    gmfss_reuse,
)
from drba_tpu.models.gmfss_nets import (
    FEATURENET_SPEC,
    GRIDNET_SPEC,
    METRICNET_SPEC,
)


def _select_reuse(left, a: Reuse, b: Reuse) -> Reuse:
    return jax.tree_util.tree_map(lambda x, y: jnp.where(left, x, y), a, b)


@functools.partial(jax.jit, static_argnames=("linear", "backend",
                                             "drm_splat_scale", "conv_backend"))
def _drba_window(p: GmfssParams, I0, I1, I2, ts, reuse10: Reuse, reuse12: Reuse,
                 linear, backend="auto", drm_splat_scale=1.0,
                 conv_backend="auto"):
    """All T timesteps as ONE batched program, T folded into the batch axis.

    Explicit batching (not vmap) so the T GridNet/conv evaluations run as one
    batched network call and the Pallas splat kernel is never vmapped (it
    indexes scratch by ``pl.program_id``; see ops/splat_stencil.py). Inputs
    are single-sample (N=1); outputs are (T, H, W, 3).
    """
    T = ts.shape[0]
    tt = jnp.where(ts < 1, 1 - ts, ts - 1)
    drm = calc_drm_gmfss(
        tt, reuse10.flow01, reuse12.flow01, reuse10.metric0, reuse12.metric0,
        linear=linear, backend=backend, splat_scale=drm_splat_scale,
    )  # folded (T, h/2, w/2, 1) maps
    left = (ts < 1)[:, None, None, None]
    imgB = jnp.where(left, I0, I2)  # (T, H, W, 3)
    I1b = jnp.broadcast_to(I1, (T,) + I1.shape[1:])
    reuse = _select_reuse(left, reuse10, reuse12)
    t0 = jnp.where(left, drm.drm1t_t01, drm.drm1t_t12)
    t1 = jnp.where(left, drm.drm0t_t01, drm.drm2t_t12)

    out = gmfss_inference(p, I1b, imgB, reuse, t0.astype(I1.dtype),
                          t1.astype(I1.dtype), backend=backend,
                          conv_backend=conv_backend)
    tb = ts[:, None, None, None]
    out = jnp.where(tb == 0, I0, jnp.where(tb == 1, I1,
                    jnp.where(tb == 2, I2, out)))
    return out[:, None]  # (T, 1, H, W, 3) — original per-t sample contract


@functools.partial(
    jax.jit,
    static_argnames=("scale", "linear", "backend", "warp_backend",
                     "drm_splat_scale", "conv_backend"),
)
def _drba_window_fused(p: GmfssParams, I0, I1, I2, ts, reuse10: Reuse,
                       scale, linear, backend="auto", warp_backend="auto",
                       drm_splat_scale=1.0, conv_backend="auto"):
    """One dispatch per window: reuse(I1, I2) + the full timestep batch in a
    single XLA program. Returns (frames, reuse12)."""
    reuse12 = gmfss_reuse(p, I1, I2, scale=scale, union=False,
                          warp_backend=warp_backend,
                          conv_backend=conv_backend, feat0=reuse10.feat0)
    out = _drba_window(p, I0, I1, I2, ts, reuse10, reuse12, linear, backend,
                       drm_splat_scale, conv_backend)
    return out, reuse12


@functools.partial(jax.jit, static_argnames=("backend", "conv_backend"))
def _ts_batch(p: GmfssParams, I0, I1, ts, reuse: Reuse, backend="auto",
              conv_backend="auto"):
    """Plain interpolation at T timesteps, T folded into the batch axis."""
    T = ts.shape[0]
    I0b = jnp.broadcast_to(I0, (T,) + I0.shape[1:])
    I1b = jnp.broadcast_to(I1, (T,) + I1.shape[1:])
    reuse_b = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (T,) + x.shape[1:]), reuse
    )
    tcol = ts[:, None, None, None].astype(I0.dtype)
    out = gmfss_inference(p, I0b, I1b, reuse_b, tcol, 1 - tcol, backend=backend,
                          conv_backend=conv_backend)
    tb = ts[:, None, None, None]
    return jnp.where(tb == 0, I0, jnp.where(tb == 1, I1, out))[:, None]


class GMFSS:
    """Quality-path model (reference: models/gmfss.py:7-73)."""

    def __init__(self, weights: str | None = None, scale: float = 1.0,
                 config: Config = DEFAULT):
        self.params = GmfssParams(
            flownet=load_network(weights, "flownet.pkl", GMFLOW_SPEC, seed=config.seed, strict=config.strict_load),
            metricnet=load_network(weights, "metric.pkl", METRICNET_SPEC, seed=config.seed + 1, strict=config.strict_load),
            feat_ext=load_network(weights, "feat.pkl", FEATURENET_SPEC, seed=config.seed + 2, strict=config.strict_load),
            fusionnet=load_network(weights, "fusionnet.pkl", GRIDNET_SPEC, seed=config.seed + 3, strict=config.strict_load),
        )
        self.scale = scale
        self.pad_size = 64
        self.config = config
        self._reuse_jit = jax.jit(
            functools.partial(gmfss_reuse, scale=self.scale, union=False,
                              warp_backend=config.warp_backend,
                              conv_backend=config.conv_backend)
        )

    def reuse(self, img0, img1, feat0=None) -> Reuse:
        return self._reuse_jit(self.params, img0, img1, feat0=feat0)

    def inference_ts(self, I0, I1, ts, reuse=None, return_reuse=False):
        """Plain interpolation. ``reuse`` (an I0->I1 ``Reuse``) skips the
        GMFlow pass when the window chain already has one; ``return_reuse``
        hands the computed pass back so a scene-cut window can seed the next
        window's chain instead of discarding it (VERDICT r3 weak 7)."""
        if len(ts) == 0:
            return ([], None) if return_reuse else []
        if reuse is None:
            reuse = self.reuse(I0, I1)
        out = _ts_batch(self.params, I0, I1, jnp.asarray(ts, jnp.float32), reuse,
                        backend=self.config.splat_backend,
                        conv_backend=self.config.conv_backend)
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
            self.params, I0, I1, I2, jnp.asarray(ts, jnp.float32), reuse10,
            self.scale, linear, self.config.splat_backend,
            self.config.warp_backend, self.config.drm_splat_scale,
            self.config.conv_backend,
        )
        frames = [out[i] for i in range(len(ts))]

        # next reuse(I1', I0') = direction-swapped current reuse(I1, I2)
        return frames, reuse12.swapped()
