"""Production-resolution oracle parity (CI-optional; VERDICT r4 item 6).

One DRBA window of each model path at >= 544x960 through our DEFAULT
config vs the torch reference with identical converted random weights,
gated at SSIM >= 0.995 per frame. Slow (many minutes of interpret-mode
Pallas on CPU), so opt-in via DRBA_SLOW_TESTS=1; the TPU battery runs the
same check on real hardware every round (scripts/exp_oracle_prod.py in
scripts/tpu_battery_r5.sh), where the default backends are the actual
fast-path kernels. Reference windows: models/rife.py:79-109,
models/gmfss.py:37-73, models/gmfss_union.py:47-100.
"""

import os

import pytest

slow = pytest.mark.skipif(
    not os.environ.get("DRBA_SLOW_TESTS"),
    reason="opt-in: DRBA_SLOW_TESTS=1 (interpret-mode Pallas at 576x960)",
)


@slow
@pytest.mark.parametrize("name,h,w", [
    ("rife", 576, 960),
    ("gmfss", 576, 960),
])
def test_oracle_production_res(reference_path, name, h, w):
    from scripts.exp_oracle_prod import GATE, run_window

    ssims = run_window(name, h, w)
    assert min(ssims) >= GATE, ssims


@slow
def test_oracle_production_res_union(reference_path):
    """Union gates RELATIVE to the construction's measured fp-exact ceiling:
    with everything exact (f32/scatter/gather/full-res DRM) our union path
    measures ~0.9864 vs the oracle at 384x640 — its hard thresholds
    (timestep-swap ratio>25, hole-fill <0.999) flip on fp-level flow
    differences under the adversarial random-weight flows, so an absolute
    0.995 is unattainable by construction (docs/ROADMAP.md round-5)."""
    from scripts.exp_oracle_prod import run_window

    ssims = run_window("gmfss_union", 640, 1024)
    os.environ["DRBA_ORACLE_CFG"] = (
        "compute_dtype=float32,splat_backend=scatter,"
        "drm_splat_scale=1.0,warp_backend=gather")
    try:
        exact = run_window("gmfss_union", 640, 1024)
    finally:
        del os.environ["DRBA_ORACLE_CFG"]
    assert min(ssims) >= min(exact) - 0.012 and min(ssims) >= 0.97, (
        ssims, exact)
