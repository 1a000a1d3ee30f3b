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
    ("gmfss_union", 640, 1024),
])
def test_oracle_production_res(reference_path, name, h, w):
    from scripts.exp_oracle_prod import GATE, run_window

    ssims = run_window(name, h, w)
    assert min(ssims) >= GATE, ssims
