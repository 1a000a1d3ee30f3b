#!/bin/bash
# Round-5 FINAL battery: every bench_breakdown entry re-measured in one
# session at the final shipped defaults (warp (32,256), fused attn-layer
# ON, plus whatever round-5 flips landed), then the e2e CLI configs with
# the parallel-download emitter, then the headline.
set -u
cd /root/repo
OUT=/root/repo/.tpu_results
mkdir -p "$OUT"
export PYTHONPATH=/root/.axon_site
[ -f "$OUT/axon_env.sh" ] && . "$OUT/axon_env.sh"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "[battery-c] running $name $(date -u +%FT%TZ)" >>"$OUT/probe.log"
  timeout -k 30 "$tmo" "$@" >"$OUT/$name.log" 2>&1
  echo "[battery-c] $name rc=$? $(date -u +%FT%TZ)" >>"$OUT/probe.log"
}

run relay_rate_r5   1200 python scripts/exp_relay_rate.py
run bench_all_final 10800 python bench.py --config all
run bench_e2e_final  5400 python bench.py --config e2e
run bench_e2e_gmfss_final 5400 python bench.py --config e2e_gmfss
run bench_headline_final 1800 python bench.py
