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

# DECISION-CRITICAL STAGES FIRST (each gates a default flip).
# 1. Warp-window geometry re-decision: the round-5 (16,256) default flip
#    was justified by pan/zoom probes that are trivially smooth vertically;
#    the motion-boundary probes price the real-content case (CPU tests
#    measured cov 0.59-0.91 on vertically-sheared flows at (16,256) vs 1.0
#    at (32,384); profile_rife_r5 shows wh, not ww, drives the cost).
run exp_warp_gate     5400 python scripts/exp_warp_gate.py
run exp_warp_bnd      5400 python scripts/exp_warp_r5.py
# 2. Overflow-cascade splat: lowering + parity + window-cost on real TPU
#    (gates flipping splat auto -> stencil_ov).
run exp_splat_ov      5400 python scripts/exp_splat_ov.py
# 3. Fused attn-layer QUALITY gate: torch-oracle parity of the gmfss window
#    with the fused layer on (the measured 2.0 px flow maxdiff vs unfused
#    needs a frame-level SSIM verdict before any default flip).
run oracle_fused      5400 env DRBA_ENABLE_FUSED_LAYER=1 python scripts/exp_oracle_prod.py gmfss
# INFORMATIVE STAGES (document the gap structure per default).
run oracle_diag_rife  7200 python scripts/exp_oracle_diag.py rife default warp_gather splat_ov f32
run oracle_diag_gmfss 9000 python scripts/exp_oracle_diag.py gmfss splat_ov ov_exactdrm ov_f32 splat_scatter
run oracle_diag_union 7200 python scripts/exp_oracle_diag.py gmfss_union splat_ov f32
run oracle_fused_wide 5400 env DRBA_ENABLE_FUSED_LAYER=1 DRBA_FUSED_LAYER_WIDE=1 python scripts/exp_oracle_prod.py gmfss
