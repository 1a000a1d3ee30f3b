#!/bin/bash
# TPU-tunnel recovery watcher (CLAUDE.md playbook).
#
# Probes the axon TPU every ~90 s; when backend init + a scalar-reduction
# sync both succeed, runs the round-4 measurement battery and writes logs
# to /root/repo/.tpu_results/.  Touches .tpu_results/DONE when finished so
# an interactive session can poll for completion.
#
# Round-4 battery (VERDICT r3): the regression bisect first — it gates
# everything else — then the kernel experiments, then a FRESH full config
# sweep (now stamped measured_at per entry) and the headline.
set -u
cd /root/repo
OUT=/root/repo/.tpu_results
mkdir -p "$OUT"
rm -f "$OUT/DONE"
# PYTHONPATH must be EXACTLY /root/.axon_site: that is how the axon
# sitecustomize (TPU backend registration) reaches sys.path; anything else
# prepended breaks registration (CLAUDE.md).
export PYTHONPATH=/root/.axon_site
# Background shells may lack the axon env (PALLAS_AXON_POOL_IPS etc.) that
# sitecustomize needs to register the TPU backend — source the snapshot.
[ -f "$OUT/axon_env.sh" ] && . "$OUT/axon_env.sh"

probe() {
  timeout -k 10 100 python -c "
import jax, jax.numpy as jnp
d = jax.devices()
assert d and d[0].platform != 'cpu', d
print('probe ok:', d)
print(float(jax.jit(lambda x: jnp.sum(x))(jnp.ones((256, 256)))))
" >>"$OUT/probe.log" 2>&1
}

echo "[watcher] start $(date -u +%FT%TZ)" >>"$OUT/probe.log"
until probe; do
  echo "[watcher] tunnel down $(date -u +%FT%TZ)" >>"$OUT/probe.log"
  sleep 90
done
echo "[watcher] TUNNEL UP $(date -u +%FT%TZ)" >>"$OUT/probe.log"

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 tmo=$2; shift 2
  echo "[watcher] running $name $(date -u +%FT%TZ)" >>"$OUT/probe.log"
  timeout -k 30 "$tmo" "$@" >"$OUT/$name.log" 2>&1
  echo "[watcher] $name rc=$? $(date -u +%FT%TZ)" >>"$OUT/probe.log"
}

# 1. Packed-conv rate + packed GridNet lattice timing (gates whether the
#    column-packed L0 becomes the gmfss/union default).
run exp_conv_packed 3600 python scripts/exp_conv_packed.py
# 2. gmfss + union re-bench (the packed lattice targets these two).
run bench_gmfss    3600 python bench.py --config gmfss
run bench_union    3600 python bench.py --config gmfss_union
# 3. Headline (re-measures rife, drops stale breakdown entries).
run bench_headline 1800 python bench.py
touch "$OUT/DONE"
echo "[watcher] battery complete $(date -u +%FT%TZ)" >>"$OUT/probe.log"
