"""RIFE model wrapper — the speed path (models/rife.py).

Uniform model API (shared by GMFSS / GMFSS_UNION):
  * ``.scale`` / ``.pad_size``
  * ``inference_ts(I0, I1, ts) -> [frames]``
  * ``inference_ts_drba(I0, I1, I2, ts, reuse, linear) -> ([frames], reuse)``

TPU-first redesign vs the reference:
  * the reference loops over timesteps in python, one kernel chain per t
    (models/rife.py:88-106). Here the whole window is ONE jitted XLA program:
    the per-t computation (DRM maps + IFNet) is ``vmap``-ed over the t axis,
    so the T per-frame IFNets run as a single batched network evaluation on
    the MXU. fps-mode windows produce at most two distinct ts counts
    (floor/ceil of the fps ratio — see utils/tmapper.py), so at most two
    programs compile per resolution; no bucket padding is needed;
  * exact-integer timesteps (t = 0/1/2 emit source frames,
    models/rife.py:89-95) become masked selects inside the same program;
  * flow inversion (``calc_flow``, models/rife.py:41-75): bidirectional
    coarse flow from IFBlock0 only, inverted by forward-splatting the
    negated flow, holes filled with a ``max(H, W)`` sentinel.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from drba_tpu.config import Config, DEFAULT
from drba_tpu.convert import load_network
from drba_tpu.drm import calc_drm_rife
from drba_tpu.models.ifnet import (
    IFNET_SPEC, fold_lastconvs, ifnet_apply, ifnet_block, ifnet_encode,
)
from drba_tpu.ops import softsplat


def _calc_flow(params, a, b, scale0: float, f0=None, f1=None,
               splat_backend: str = "auto", conv_backend: str = "auto"):
    """Bidirectional full-step flow between a and b (models/rife.py:41-75)."""
    timestep = jnp.full_like(a[..., :1], 0.5)
    f0 = ifnet_encode(params, a[..., :3]) if f0 is None else f0
    f1 = ifnet_encode(params, b[..., :3]) if f1 is None else f1
    x = jnp.concatenate([a[..., :3], b[..., :3], f0, f1, timestep], axis=-1)
    flow, _, _ = ifnet_block(params, 0, x, None, scale0,
                             conv_backend=conv_backend)

    flow50 = flow[..., 0:2]  # flow from t=0.5 toward a
    flow51 = flow[..., 2:4]  # flow from t=0.5 toward b

    # both inversion splats ride the stencil kernel's native sample axis in
    # ONE invocation (ops/splat_stencil.py v4)
    n = flow50.shape[0]
    both = jnp.concatenate([flow50, flow51], axis=0)
    w, mask = softsplat(both, both, None, "avg", backend=splat_backend,
                        return_coverage=True)
    mask05, mask15 = mask[:n], mask[n:]
    flow05 = -w[:n]
    flow15 = -w[n:]

    h, w = a.shape[1], a.shape[2]
    sentinel = jnp.asarray(float(max(h, w)), flow05.dtype)
    flow05 = jnp.where(mask05 < 0.999, sentinel, flow05)
    flow15 = jnp.where(mask15 < 0.999, sentinel, flow15)

    return flow05 * 2, flow15 * 2, f0, f1  # flow_ab, flow_ba, feats


def _window_inputs_one_t(t, I0, I1, I2, flow10, flow12, f0, f1, f2,
                         linear, splat_backend):
    """DRM map + side-frame selection for window-time ``t`` (one vmap lane)."""
    tt = jnp.where(t < 1, 1 - t, t - 1)
    drm = calc_drm_rife(tt, flow10, flow12, linear=linear, backend=splat_backend)

    left = t < 1
    imgB = jnp.where(left, I0, I2)
    fB = jnp.where(left, f0, f2)
    drm_map = jnp.where(left, drm.drm_t1_t01, drm.drm_t1_t12)
    return imgB, fB, drm_map


def _interp_one_t(params, t, I0, I1, I2, flow10, flow12, f0, f1, f2,
                  scale_list, linear, splat_backend, warp_backend="gather"):
    """Single-timestep synthesis (vmap-safe: forces the gather warp).

    Used by the multi-device window plan, which vmaps over timesteps; the
    serial path runs the folded-batch `_drba_window` below instead.
    """
    imgB, fB, drm_map = _window_inputs_one_t(
        t, I0, I1, I2, flow10, flow12, f0, f1, f2, linear, splat_backend
    )
    out, _ = ifnet_apply(
        params, I1, imgB, drm_map.astype(I1.dtype), scale_list, f0=f1, f1=fB,
        warp_backend=warp_backend,
    )
    # integer timesteps pass sources through (models/rife.py:89-95)
    out = jnp.where(t == 0, I0, jnp.where(t == 1, I1, jnp.where(t == 2, I2, out)))
    return out


@functools.partial(
    jax.jit,
    static_argnames=("scale_list", "linear", "splat_backend", "warp_backend",
                     "drm_splat_scale", "conv_backend"),
)
def _drba_window(params, I0, I1, I2, ts, flow10, flow12, f0, f1, f2,
                 scale_list, linear, splat_backend="auto", warp_backend="auto",
                 drm_splat_scale=1.0, conv_backend="auto"):
    """All timesteps of one 3-frame window as a single batched XLA program.

    The per-t DRM maps are vmapped; the T IFNet evaluations then run as ONE
    call with T folded into the batch axis — explicit batching (rather than
    vmap) both feeds the MXU bigger convolutions and keeps the Pallas warp
    kernel out of vmap (it indexes its scalar-prefetch table with
    ``pl.program_id``, which vmap's grid-prepending batching rule would
    silently shift).
    """
    T = ts.shape[0]
    n, h, w, _ = I1.shape

    # batched DRM maps: calc_drm_rife folds the (T,) timestep axis into the
    # leading axis itself (explicit batching keeps the Pallas splat kernel
    # out of vmap; see drm._retime_batched)
    tt = jnp.where(ts < 1, 1 - ts, ts - 1)
    drm = calc_drm_rife(tt, flow10, flow12, linear=linear, backend=splat_backend,
                        splat_scale=drm_splat_scale)
    d01 = drm.drm_t1_t01.reshape(T, n, h, w, 1)
    d12 = drm.drm_t1_t12.reshape(T, n, h, w, 1)
    l5 = (ts < 1)[:, None, None, None, None]
    imgB = jnp.where(l5, I0[None], I2[None])  # (T, N, H, W, 3)
    fB = jnp.where(l5, f0[None], f2[None])
    drm_map = jnp.where(l5, d01, d12)

    def fold(x):
        return x.reshape((T * n,) + x.shape[2:])

    def tile(x):
        return fold(jnp.broadcast_to(x[None], (T,) + x.shape))

    out, _ = ifnet_apply(
        params, tile(I1), fold(imgB), fold(drm_map).astype(I1.dtype),
        scale_list, f0=tile(f1), f1=fold(fB), warp_backend=warp_backend,
        conv_backend=conv_backend,
    )
    out = out.reshape((T, n, h, w, 3))

    # integer timesteps pass sources through (models/rife.py:89-95)
    tb = ts[:, None, None, None, None]
    out = jnp.where(tb == 0, I0[None], jnp.where(tb == 1, I1[None],
                    jnp.where(tb == 2, I2[None], out)))
    return out  # (T, N, H, W, 3)


@functools.partial(
    jax.jit,
    static_argnames=("scale_list", "linear", "splat_backend", "warp_backend",
                     "drm_splat_scale", "conv_backend"),
)
def _drba_window_fused(params, I0, I1, I2, ts, flow10, f0, f1,
                       scale_list, linear, splat_backend="auto",
                       warp_backend="auto", drm_splat_scale=1.0,
                       conv_backend="auto"):
    """One dispatch per window: the I1<->I2 flow pass and the full timestep
    batch compile into a single XLA program (saves a ~4 ms program dispatch
    and the HBM round-trip of flows/features between programs). Returns
    (frames, flow12, flow21, f2) — the last three thread the reuse chain.
    """
    flow12, flow21, _, f2 = _calc_flow(
        params, I1, I2, scale_list[0], f0=f1, splat_backend=splat_backend,
        conv_backend=conv_backend,
    )
    out = _drba_window(
        params, I0, I1, I2, ts, flow10, flow12, f0, f1, f2,
        scale_list, linear, splat_backend, warp_backend, drm_splat_scale,
        conv_backend,
    )
    return out, flow12, flow21, f2


@functools.partial(jax.jit, static_argnames=("scale_list", "warp_backend",
                                             "conv_backend"))
def _ts_batch(params, I0, I1, ts, scale_list, warp_backend="auto",
              conv_backend="auto"):
    """Plain interpolation at T timesteps, T folded into the batch axis."""
    T = ts.shape[0]
    n, h, w, _ = I0.shape

    def tile(x):
        return jnp.broadcast_to(x[None], (T,) + x.shape).reshape(
            (T * n,) + x.shape[1:]
        )

    tmap = jnp.broadcast_to(
        ts[:, None, None, None, None], (T, n, h, w, 1)
    ).reshape(T * n, h, w, 1)
    out, _ = ifnet_apply(
        params, tile(I0), tile(I1), tmap.astype(I0.dtype), scale_list,
        warp_backend=warp_backend, conv_backend=conv_backend,
    )
    out = out.reshape((T, n, h, w, 3))
    tb = ts[:, None, None, None, None]
    return jnp.where(tb == 0, I0[None], jnp.where(tb == 1, I1[None], out))


_flow_jit = jax.jit(_calc_flow,
                    static_argnames=("scale0", "splat_backend", "conv_backend"))


class RIFE:
    """Speed-path model (reference: models/rife.py:15-109)."""

    def __init__(self, weights: str | None = None, scale: float = 1.0,
                 config: Config = DEFAULT):
        self.params = fold_lastconvs(
            load_network(weights, "flownet.pkl", IFNET_SPEC, seed=config.seed, strict=config.strict_load)
        )
        self.scale = scale
        self.scale_list = tuple(s / scale for s in (16.0, 8.0, 4.0, 2.0, 1.0))
        self.pad_size = 64
        self.config = config

    # -- internal ----------------------------------------------------------
    def _calc_flow(self, a, b, f0=None, f1=None):
        return _flow_jit(self.params, a, b, scale0=self.scale_list[0], f0=f0, f1=f1,
                         splat_backend=self.config.splat_backend,
                         conv_backend=self.config.conv_backend)

    # -- public API --------------------------------------------------------
    def inference_ts(self, I0, I1, ts: Sequence[float], reuse=None,
                     return_reuse=False):
        """Interpolate at plain timesteps in [0, 1] (models/rife.py:27-39).

        ``reuse``/``return_reuse`` exist for API uniformity with the gmfss
        paths (the pipeline chains flow passes across scene cuts); IFNet
        computes timestep-conditioned flows inside the batched program, so
        there is no window-independent pass to hand back — reuse is ignored
        and the returned reuse is always None.
        """
        if len(ts) == 0:
            return ([], None) if return_reuse else []
        tsv = jnp.asarray(ts, jnp.float32)
        out = _ts_batch(self.params, I0, I1, tsv, self.scale_list,
                        warp_backend=self.config.warp_backend,
                        conv_backend=self.config.conv_backend)
        frames = [out[i] for i in range(len(ts))]
        return (frames, None) if return_reuse else frames

    def inference_ts_drba(self, I0, I1, I2, ts, reuse=None, linear: bool = False):
        """DRM-adjusted interpolation over a 3-frame window.

        ``ts`` values live in [0.5, 1.5) (window time, centered on I1).
        Returns (frames, reuse) where reuse carries the I1<->I2 flow pair and
        encoder features to the next window (models/rife.py:108-109).
        """
        if reuse is not None:
            flow10, _flow01, f1, f0 = reuse
        else:
            flow10, _flow01, f1, f0 = self._calc_flow(I1, I0)

        if len(ts) == 0:
            flow12, flow21, _, f2 = self._calc_flow(I1, I2, f0=f1)
            return [], (flow21, flow12, f2, f1)

        # fused single-program window: I1<->I2 flow + all timesteps
        tsv = jnp.asarray(ts, jnp.float32)
        out, flow12, flow21, f2 = _drba_window_fused(
            self.params, I0, I1, I2, tsv, flow10, f0, f1,
            self.scale_list, linear, self.config.splat_backend,
            self.config.warp_backend, self.config.drm_splat_scale,
            self.config.conv_backend,
        )
        frames = [out[i] for i in range(len(ts))]

        # next window's (flow10, flow01, f1, f0) = reversed current I1<->I2
        return frames, (flow21, flow12, f2, f1)
