#!/bin/bash
# Round-5 TPU measurement battery (VERDICT r4 items 1, 7; run by
# scripts/tpu_watcher.sh on tunnel recovery, or directly when the TPU is up).
# Ordered so the cheap lowering checks come first and a hang pinpoints
# itself; each stage is timeout-bounded and failures don't stop the sweep.
set -u
cd /root/repo
OUT=/root/repo/.tpu_results
mkdir -p "$OUT"
export PYTHONPATH=/root/.axon_site
[ -f "$OUT/axon_env.sh" ] && . "$OUT/axon_env.sh"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "[battery] running $name $(date -u +%FT%TZ)" >>"$OUT/probe.log"
  timeout -k 30 "$tmo" "$@" >"$OUT/$name.log" 2>&1
  echo "[battery] $name rc=$? $(date -u +%FT%TZ)" >>"$OUT/probe.log"
}

# 1. Fused attn-layer kernel: Mosaic lowering at batch=4 + timing vs unfused
#    (gates whether DRBA_ENABLE_FUSED_LAYER graduates to default-ON).
run exp_attn_layer_r5 2400 python scripts/exp_attn_layer.py
# 1b. Warp geometry sweep: floor(min)-anchored narrow windows (VERDICT r4
#     next 2) — coverage + deviation + hot-shape timing per variant.
run exp_warp_r5 5400 python scripts/exp_warp_r5.py
# 1b2. GridNet hybrid lattice sweep (VERDICT r4 item 3): packed vs
#      packed_chain at the production window; target <= 65 ms.
run exp_gridnet_r5 5400 python scripts/exp_gridnet_r5.py
# 1c. Production-resolution torch-oracle parity of the DEFAULT fast path
#     (VERDICT r4 item 6): SSIM >= 0.995 per frame at >= 576x960.
run exp_oracle_prod 5400 python scripts/exp_oracle_prod.py
# 1b3. Union window conv-backend sweep (VERDICT r4 item 8).
run exp_union_r5 7200 python scripts/exp_union_r5.py
# 2. Per-stage profilers at HEAD (VERDICT r4 weak 6 / next 7).
run profile_rife_r5  2400 python scripts/profile_rife.py
run profile_gmfss_r5 2400 python scripts/profile_gmfss.py
# 2b. Candidate-default variants at the window-bench level: measure the
#     opt-in paths' real effect on the gmfss config so the default flip is
#     a one-line change once justified. (Env switches are read at trace
#     time; each variant gets its own process.)
run bench_gmfss_fusedlayer 3600 env DRBA_ENABLE_FUSED_LAYER=1 python bench.py --config gmfss --no-save
run bench_gmfss_fusedwide  3600 env DRBA_ENABLE_FUSED_LAYER=1 DRBA_FUSED_LAYER_WIDE=1 python bench.py --config gmfss --no-save
# 3. Full config sweep + headline at HEAD (includes the new e2e CLI
#    pipeline configs, VERDICT r4 item 5).
run bench_all_r5     10800 python bench.py --config all
# 3b. Real-pipeline e2e configs in their own processes (the parent must not
#     hold a TPU client while the CLI subprocess runs).
run bench_e2e_r5      5400 python bench.py --config e2e
run bench_e2e_gmfss_r5 5400 python bench.py --config e2e_gmfss
run bench_headline_r5 1800 python bench.py
