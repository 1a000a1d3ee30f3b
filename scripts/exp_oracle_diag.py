"""Diagnose the rife production-res oracle SSIM gap (round 5).

exp_oracle_prod measured the DEFAULT rife fast path at 576x960 vs the torch
oracle at SSIM min 0.99398 — just below the 0.995 BASELINE gate. Each
variant here disables ONE fast-path approximation (subprocess-per-variant;
env is read at trace time) to find which default prices the gap:

  default    the measured 0.99398 control
  warp_gather  exact XLA patch-gather backward warp (vs (16,256) MXU window)
  exact_drm    full-res DRM alignment splats (vs half-res)
  splat_scatter exact scatter splat backend (vs Pallas stencil radius 12)
  f32          f32 compute (vs bf16)
  all_exact    everything exact — expected ~= 1.0 (converter/semantics floor)

    python scripts/exp_oracle_diag.py [rife|gmfss|gmfss_union]
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))

VARIANTS = {
    "default": "",
    "warp_gather": "warp_backend=gather",
    "exact_drm": "drm_splat_scale=1.0",
    "splat_scatter": "splat_backend=scatter",
    "f32": "compute_dtype=float32",
    "all_exact": ("warp_backend=gather,drm_splat_scale=1.0,"
                  "splat_backend=scatter,compute_dtype=float32"),
    # overflow-cascade candidates (round-5, ops/softsplat.py:_splat_overflow)
    "splat_ov": "splat_backend=stencil_ov",
    "ov_exactdrm": "splat_backend=stencil_ov,drm_splat_scale=1.0",
    "ov_f32": "splat_backend=stencil_ov,compute_dtype=float32",
}


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "rife"
    names = sys.argv[2:] or list(VARIANTS)
    for name in names:
        cfg = VARIANTS[name]
        env = dict(os.environ, DRBA_ORACLE_CFG=cfg)
        print(f"=== variant {name} [{cfg or 'DEFAULT'}] ===", flush=True)
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "exp_oracle_prod.py"), model],
            env=env, timeout=3000)
        print(f"variant {name} rc={r.returncode}", flush=True)


if __name__ == "__main__":
    main()
