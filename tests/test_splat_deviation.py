"""Quantify the stencil splat's bounded-radius approximation on high motion.

The TPU-default 'stencil'/'shift' splat backends drop contributions displaced
more than the stencil radius (12 px at warp resolution); dropped targets read
as coverage holes and the DRM hole-fill (< 0.999, models/drm.py:98-102) falls
back to the unaligned value.

Measured deviation of the DRM maps vs the exact scatter backend, fast pans
(this test pins these as regression floors; see docs/ROADMAP.md):
  * pan 20 px/frame: bit-identical at every t (worst DRM displacement
    ``drm*t*2*flow`` stays within the radius);
  * pan 40 px/frame, t=0.5: SSIM 0.938, max abs diff 0.031 — beyond-radius
    contributions fall back to the UNALIGNED drm value via hole-fill, a
    bounded timing (not pixel) error.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from drba_tpu.drm import calc_drm_rife
from drba_tpu.ops.ssim import ssim
from drba_tpu.ops.softsplat import softsplat


def _pan_flow(b, h, w, dx, dy, jitter, seed):
    """A fast pan: near-uniform flow with small spatial jitter (anime cuts
    pan rigidly; jitter models parallax/estimation noise)."""
    rng = np.random.default_rng(seed)
    base = np.asarray([dx, dy], np.float32)
    f = np.broadcast_to(base, (b, h, w, 2)).copy()
    f += rng.uniform(-jitter, jitter, f.shape).astype(np.float32)
    return jnp.asarray(f)


@pytest.mark.parametrize("mag,floor", [(20.0, 0.999), (40.0, 0.93)])
def test_drm_stencil_vs_scatter_high_motion_pan(mag, floor):
    h, w = 96, 160
    flow10 = _pan_flow(1, h, w, mag, mag * 0.3, 1.5, seed=0)
    flow12 = _pan_flow(1, h, w, -mag, -mag * 0.3, 1.5, seed=1)

    for t in (0.25, 0.5):
        exact = calc_drm_rife(t, flow10, flow12, linear=True, backend="scatter")
        approx = calc_drm_rife(t, flow10, flow12, linear=True, backend="stencil")
        for name in ("drm_t1_t01", "drm_t1_t12"):
            a = getattr(approx, name)
            e = getattr(exact, name)
            s = float(ssim(a, e))
            assert s > floor, (name, t, mag, s)
            assert float(jnp.abs(a - e).max()) < 0.04, (name, t, mag)


def test_raw_splat_beyond_radius_reads_as_holes():
    """Displacements beyond the radius must surface as low coverage (so the
    DRM hole-fill catches them), never as wrong values at covered pixels."""
    h, w = 64, 128
    rng = np.random.default_rng(2)
    ten = jnp.asarray(rng.uniform(0.2, 1.0, (1, h, w, 1)).astype(np.float32))
    flow = _pan_flow(1, h, w, 30.0, 0.0, 0.0, seed=3)  # uniform 30px shift

    out_s, cov_s = softsplat(ten, flow, None, "avg", backend="stencil",
                             return_coverage=True)
    out_e, cov_e = softsplat(ten, flow, None, "avg", backend="scatter",
                             return_coverage=True)
    cov_s = np.asarray(cov_s)
    cov_e = np.asarray(cov_e)
    # stencil drops everything (30 > 12): its coverage must be ~0 where the
    # exact backend has coverage ~1 — a detectable hole, not silent garbage.
    lit = cov_e[0, :, 40:w-10, 0] > 0.5
    assert lit.any()
    assert (cov_s[0, :, 40:w-10, 0][lit] < 0.5).all()
    # and where the stencil DOES claim coverage, values match the exact ones
    both = (cov_s > 0.999) & (cov_e > 0.999)
    if both.any():
        np.testing.assert_allclose(
            np.asarray(out_s)[both], np.asarray(out_e)[both], atol=1e-4
        )


def test_drm_half_res_splat_deviation_bounds():
    """drm_splat_scale=0.5 (the RIFE-path default) splats the smooth DRM maps
    at half resolution. Piecewise-uniform motion (pans, region boundaries) is
    essentially exact; jittery flow estimation noise is low-passed — pinned
    here as regression floors vs the exact full-res path."""
    h, w = 96, 160
    # worst case: noisy jittered pan (the ratio maps inherit the jitter)
    f10 = _pan_flow(1, h, w, 12.0, 4.0, 1.5, seed=0)
    f12 = _pan_flow(1, h, w, -12.0, -4.0, 1.5, seed=1)
    for t in (0.25, 0.5):
        e = calc_drm_rife(t, f10, f12, linear=True, backend="scatter")
        a = calc_drm_rife(t, f10, f12, linear=True, backend="scatter",
                          splat_scale=0.5)
        for name in ("drm_t1_t01", "drm_t1_t12"):
            x, y = getattr(a, name), getattr(e, name)
            assert float(ssim(x, y)) > 0.82, (name, t)
            assert float(jnp.abs(x - y).max()) < 0.1, (name, t)

    # motion-boundary case (two rigid regions): exact
    fb = np.zeros((1, h, w, 2), np.float32)
    fb[:, :, : w // 2, 0] = 12.0
    f10b, f12b = jnp.asarray(fb), jnp.asarray(-fb)
    e = calc_drm_rife(0.5, f10b, f12b, linear=True, backend="scatter")
    a = calc_drm_rife(0.5, f10b, f12b, linear=True, backend="scatter",
                      splat_scale=0.5)
    for name in ("drm_t1_t01", "drm_t1_t12"):
        assert float(jnp.abs(getattr(a, name) - getattr(e, name)).max()) < 1e-5
