"""Distance Ratio Map (DRM) — the paper's core contribution, TPU-first.

Reproduces the semantics of models/drm.py:
  * distance maps from bidirectional flow magnitude -> ratio maps
    ``d10/(d10+d12)`` (drm.py:67-72);
  * linear retiming ``drm * t * 2`` (always used by the reference driver:
    infer.py:143 passes linear=True) or nonlinear retiming by coupled
    bisection (``get_drm_t``, drm.py:10-62);
  * forward-warp alignment of the retimed maps to the intermediate-frame
    time plus ones-mask hole detection (< 0.999) and hole fill
    (drm.py:89-102, 132-148).

Design differences from the reference (deliberate, TPU-first):
  * all hole fills are ``jnp.where`` selects, no boolean-mask mutation;
  * the bisection's scalar (l, r, x, branch) schedule depends only on the
    target ``t``; when ``t`` is a concrete python float the loop unrolls at
    trace time into ~10 fused vector ops; a traced fallback runs a fixed
    32-iteration ``lax.while_loop`` identical in math;
  * everything is batched over the timestep axis by ``vmap`` at the model
    layer — one XLA program per window instead of one kernel chain per t.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from drba_tpu.ops import flow_distance, softsplat


def get_drm_t(drm: jax.Array, t, precision: float = 1e-3) -> jax.Array:
    """Nonlinearly retime a ratio map to target time ``t`` (drm.py:10-62).

    The whole map, whose collective "time" is defined as 0.5, is driven
    toward ``t`` by a coupled bisection: the scalar trajectory
    ``x <- x -+ (x - l|r) * 0.5`` is mirrored element-wise with per-pixel
    step ``b = drm``. Values keep their original proportions.
    """
    dtype = drm.dtype
    x_drm = drm.astype(jnp.float32)
    b_drm = drm.astype(jnp.float32)
    l_drm = jnp.zeros_like(x_drm)
    r_drm = jnp.ones_like(x_drm)

    if isinstance(t, (int, float)):
        # Concrete target: unroll the data-independent scalar schedule.
        x, lo, hi = 0.5, 0.0, 1.0
        while abs(x - t) > precision:
            if x > t:
                hi = x
                x = x - (x - lo) * 0.5
                r_drm = x_drm
                x_drm = x_drm - (x_drm - l_drm) * b_drm
            if x < t:
                lo = x
                x = x + (hi - x) * 0.5
                l_drm = x_drm
                x_drm = x_drm + (r_drm - x_drm) * b_drm
        return x_drm.astype(dtype)

    # Traced target: fixed-trip-count loop (2^-32 << any useful precision).
    def body(state):
        x, lo, hi, x_d, l_d, r_d = state
        gt = x > t
        hi2 = jnp.where(gt, x, hi)
        x2 = jnp.where(gt, x - (x - lo) * 0.5, x)
        r_d2 = jnp.where(gt, x_d, r_d)
        x_d2 = jnp.where(gt, x_d - (x_d - l_d) * b_drm, x_d)

        lt = x2 < t
        lo2 = jnp.where(lt, x2, lo)
        x3 = jnp.where(lt, x2 + (hi2 - x2) * 0.5, x2)
        l_d2 = jnp.where(lt, x_d2, l_d)
        x_d3 = jnp.where(lt, x_d2 + (r_d2 - x_d2) * b_drm, x_d2)
        return x3, lo2, hi2, x_d3, l_d2, r_d2

    def cond(state):
        return jnp.abs(state[0] - t) > precision

    t = jnp.float32(t)
    init = (jnp.float32(0.5), jnp.float32(0.0), jnp.float32(1.0), x_drm, l_drm, r_drm)
    out = jax.lax.while_loop(cond, body, init)
    return out[3].astype(dtype)


def _ratio_maps(flow10: jax.Array, flow12: jax.Array, eps: float):
    d10 = flow_distance(flow10).astype(jnp.float32) + eps
    d12 = flow_distance(flow12).astype(jnp.float32) + eps
    denom = d10 + d12
    return d10 / denom, d12 / denom


def _retime(drm: jax.Array, t, linear: bool) -> jax.Array:
    return drm * t * 2 if linear else get_drm_t(drm, t)


def _retime_batched(drm: jax.Array, ts: jax.Array, linear: bool) -> jax.Array:
    """Retime one (N,H,W,1) map at T timesteps -> (T*N,H,W,1) folded maps.

    Batching is explicit (fold into the leading axis) rather than vmap so the
    downstream Pallas splat kernels are never traced under vmap (they index
    scratch by ``pl.program_id``; see ops/splat_stencil.py)."""
    T = ts.shape[0]
    n, h, w, _ = drm.shape
    if linear:
        out = drm[None] * ts[:, None, None, None, None] * 2
    else:
        out = jax.vmap(lambda t: get_drm_t(drm, t))(ts)
    return out.reshape(T * n, h, w, 1)


def _tile_t(x: jax.Array, T: int) -> jax.Array:
    """Broadcast (N, ...) -> (T*N, ...) matching ``_retime_batched`` order."""
    return jnp.broadcast_to(x[None], (T,) + x.shape).reshape((-1,) + x.shape[1:])


def _is_batched_t(t) -> bool:
    return hasattr(t, "ndim") and t.ndim == 1


def _hole_fill(warped: jax.Array, warped_ones: jax.Array, fallback: jax.Array) -> jax.Array:
    """Replace pixels whose warped coverage < 0.999 (drm.py:98-102)."""
    return jnp.where(warped_ones < 0.999, fallback, warped)


def _splat_avg_scaled(val, flow, metric, mode, backend, splat_scale):
    """Forward-splat ``val`` along ``flow`` with optional downscaled splat.

    DRM maps are smooth ratio fields, so their alignment splat can run at
    reduced resolution (``splat_scale=0.5``: 4x fewer pixels, 2x the
    effective stencil radius) and be bilinearly upsampled — a bounded
    deviation localized to motion boundaries, gated by
    tests/test_splat_deviation.py. ``splat_scale=1.0`` is the exact path.
    """
    from drba_tpu.ops.resize import resize_bilinear

    if splat_scale == 1.0:
        return softsplat(val, flow, metric, mode, backend=backend,
                         return_coverage=True)
    h, w = val.shape[1], val.shape[2]
    hs, ws = int(h * splat_scale), int(w * splat_scale)
    val_s = resize_bilinear(val, (hs, ws))
    flow_s = resize_bilinear(flow, (hs, ws)) * splat_scale
    metric_s = None if metric is None else resize_bilinear(metric, (hs, ws))
    wv, cov = softsplat(val_s, flow_s, metric_s, mode, backend=backend,
                        return_coverage=True)
    return resize_bilinear(wv, (h, w)), resize_bilinear(cov, (h, w))


def _splat_avg_scaled2(val_a, flow_a, metric_a, val_b, flow_b, metric_b,
                       mode, backend, splat_scale):
    """Both direction splats of a DRM alignment as ONE softsplat call —
    the directions stack on the batch axis, which the stencil kernel's
    native sample grid axis consumes in a single invocation (splat v4)."""
    n = val_a.shape[0]
    metric = None
    if metric_a is not None and metric_b is not None:
        metric = jnp.concatenate([metric_a, metric_b], axis=0)
    wv, cov = _splat_avg_scaled(
        jnp.concatenate([val_a, val_b], axis=0),
        jnp.concatenate([flow_a, flow_b], axis=0),
        metric, mode, backend, splat_scale,
    )
    return (wv[:n], cov[:n]), (wv[n:], cov[n:])


class DrmRife(NamedTuple):
    drm_t1_t01: jax.Array
    drm_t1_t12: jax.Array


def calc_drm_rife(t, flow10: jax.Array, flow12: jax.Array, linear: bool = False,
                  backend: str = "auto", splat_scale: float = 1.0) -> DrmRife:
    """DRM timestep maps for the RIFE (backward-warp) path (drm.py:65-107).

    RIFE consumes the DRM as a per-pixel timestep, aligned to the
    intermediate frame's time by forward-warping along ``flow * drm``.
    ``backend`` selects the softsplat implementation (Config.splat_backend).

    ``t`` may be a scalar or a (T,) vector; the vector case returns
    (T*N, H, W, 1) maps folded over the leading axis (explicit batching —
    never vmap this function over ``t``, the Pallas splat backend is not
    vmappable).
    """
    drm10, drm12 = _ratio_maps(flow10, flow12, eps=1e-4)
    if _is_batched_t(t):
        T = t.shape[0]
        drm_t0 = _retime_batched(drm10, t, linear)
        drm_t1 = _retime_batched(drm12, t, linear)
        flow10 = _tile_t(flow10, T)
        flow12 = _tile_t(flow12, T)
    else:
        drm_t0 = _retime(drm10, t, linear)
        drm_t1 = _retime(drm12, t, linear)

    (w01, m01), (w12, m12) = _splat_avg_scaled2(
        drm_t1, flow10 * drm_t1, None, drm_t0, flow12 * drm_t0, None,
        "avg", backend, splat_scale,
    )

    return DrmRife(
        drm_t1_t01=_hole_fill(w01, m01, drm_t1),
        drm_t1_t12=_hole_fill(w12, m12, drm_t0),
    )


class DrmGmfss(NamedTuple):
    drm0t_t01: jax.Array
    drm1t_t01: jax.Array
    drm1t_t12: jax.Array
    drm2t_t12: jax.Array


def calc_drm_gmfss(
    t,
    flow10: jax.Array,
    flow12: jax.Array,
    metric10: jax.Array | None,
    metric12: jax.Array | None,
    linear: bool = False,
    backend: str = "auto",
    splat_scale: float = 1.0,
) -> DrmGmfss:
    """DRM timestep maps for the GMFSS (forward-warp) path (drm.py:110-155).

    ``t`` scalar or (T,) vector; see :func:`calc_drm_rife` for the folded
    batched-t contract. ``splat_scale`` downsamples the alignment splats
    (see :func:`_splat_avg_scaled`).
    """
    drm10, drm12 = _ratio_maps(flow10, flow12, eps=0.0)
    if _is_batched_t(t):
        T = t.shape[0]
        drm1t_t01 = _retime_batched(drm12, t, linear)
        drm1t_t12 = _retime_batched(drm10, t, linear)
        flow10 = _tile_t(flow10, T)
        flow12 = _tile_t(flow12, T)
        metric10 = None if metric10 is None else _tile_t(metric10, T)
        metric12 = None if metric12 is None else _tile_t(metric12, T)
    else:
        drm1t_t01 = _retime(drm12, t, linear)
        drm1t_t12 = _retime(drm10, t, linear)
    drm0t_u = 1.0 - drm1t_t01
    drm2t_u = 1.0 - drm1t_t12

    mode = "soft" if (metric10 is not None and metric12 is not None) else "avg"
    (w0, m0), (w2, m2) = _splat_avg_scaled2(
        drm0t_u, flow10, metric10, drm2t_u, flow12, metric12,
        mode, backend, splat_scale,
    )

    return DrmGmfss(
        drm0t_t01=_hole_fill(w0, m0, drm0t_u),
        drm1t_t01=drm1t_t01,
        drm1t_t12=drm1t_t12,
        drm2t_t12=_hole_fill(w2, m2, drm2t_u),
    )


def calc_drm_rife_auxiliary(
    t,
    flow10: jax.Array,
    flow12: jax.Array,
    metric10: jax.Array | None,
    metric12: jax.Array | None,
    linear: bool = False,
    backend: str = "auto",
    splat_scale: float = 1.0,
) -> DrmRife:
    """DRM maps for the auxiliary RIFE inside GMFSS_UNION (drm.py:158-195).

    Same as :func:`calc_drm_rife` but metric-weighted ('soft') warping when
    metrics are available. ``t`` scalar or (T,) vector (folded batch).
    """
    drm10, drm12 = _ratio_maps(flow10, flow12, eps=1e-4)
    if _is_batched_t(t):
        T = t.shape[0]
        drm_t0 = _retime_batched(drm10, t, linear)
        drm_t1 = _retime_batched(drm12, t, linear)
        flow10 = _tile_t(flow10, T)
        flow12 = _tile_t(flow12, T)
        metric10 = None if metric10 is None else _tile_t(metric10, T)
        metric12 = None if metric12 is None else _tile_t(metric12, T)
    else:
        drm_t0 = _retime(drm10, t, linear)
        drm_t1 = _retime(drm12, t, linear)

    mode = "soft" if (metric10 is not None and metric12 is not None) else "avg"
    (w01, m01), (w12, m12) = _splat_avg_scaled2(
        drm_t1, flow10 * drm_t1, metric10, drm_t0, flow12 * drm_t0, metric12,
        mode, backend, splat_scale,
    )

    return DrmRife(
        drm_t1_t01=_hole_fill(w01, m01, drm_t1),
        drm_t1_t12=_hole_fill(w12, m12, drm_t0),
    )
