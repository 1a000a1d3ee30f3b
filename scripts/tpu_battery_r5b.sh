#!/bin/bash
# Round-5 follow-up battery: quality gates for candidate default flips.
# Run AFTER tpu_battery_r5.sh completes (watcher:
#   bash scripts/tpu_watcher.sh scripts/tpu_battery_r5b.sh).
set -u
cd /root/repo
OUT=/root/repo/.tpu_results
mkdir -p "$OUT"
export PYTHONPATH=/root/.axon_site
[ -f "$OUT/axon_env.sh" ] && . "$OUT/axon_env.sh"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "[battery-b] running $name $(date -u +%FT%TZ)" >>"$OUT/probe.log"
  timeout -k 30 "$tmo" "$@" >"$OUT/$name.log" 2>&1
  echo "[battery-b] $name rc=$? $(date -u +%FT%TZ)" >>"$OUT/probe.log"
}

# Warp-window geometry re-decision: the round-5 (16,256) default flip was
# justified by pan/zoom probes that are trivially smooth vertically; the
# added motion-boundary probes price the real-content case (opposing
# regions; CPU tests measured cov 0.59-0.91 on vertically-sheared flows at
# (16,256) vs 1.0 at (32,384)). Re-pick the default from this sweep.
run exp_warp_bnd      5400 python scripts/exp_warp_r5.py
# Production-oracle gap diagnosis: which fast-path default prices each
# path's SSIM miss (round-5 battery, exp_oracle_prod.log: rife 0.99398 /
# gmfss 0.98803 / union 0.86962 vs the 0.995 gate).
run oracle_diag_rife  7200 python scripts/exp_oracle_diag.py rife default warp_gather exact_drm splat_ov ov_exactdrm f32
run oracle_diag_gmfss 9000 python scripts/exp_oracle_diag.py gmfss f32 splat_scatter exact_drm splat_ov ov_exactdrm all_exact
run oracle_diag_union 7200 python scripts/exp_oracle_diag.py gmfss_union f32 splat_ov ov_exactdrm all_exact
# overflow-cascade splat: lowering + parity + window-cost on the real TPU
run exp_splat_ov      5400 python scripts/exp_splat_ov.py
# Fused attn-layer QUALITY gate: torch-oracle parity of the gmfss window
# with the fused layer on (the measured flow maxdiff of 2.0 px vs unfused
# needs a frame-level SSIM verdict before any default flip).
run oracle_fused      5400 env DRBA_ENABLE_FUSED_LAYER=1 python scripts/exp_oracle_prod.py gmfss
run oracle_fused_wide 5400 env DRBA_ENABLE_FUSED_LAYER=1 DRBA_FUSED_LAYER_WIDE=1 python scripts/exp_oracle_prod.py gmfss
