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

# Fused attn-layer QUALITY gate: torch-oracle parity of the gmfss window
# with the fused layer on (the measured flow maxdiff of 2.0 px vs unfused
# needs a frame-level SSIM verdict before any default flip).
run oracle_fused      5400 env DRBA_ENABLE_FUSED_LAYER=1 python scripts/exp_oracle_prod.py gmfss
run oracle_fused_wide 5400 env DRBA_ENABLE_FUSED_LAYER=1 DRBA_FUSED_LAYER_WIDE=1 python scripts/exp_oracle_prod.py gmfss
