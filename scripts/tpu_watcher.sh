#!/bin/bash
# TPU-tunnel recovery watcher (CLAUDE.md playbook).
#
# Probes the axon TPU every ~90 s; when backend init + a scalar-reduction
# sync both succeed, runs the battery script given as $1 (default
# scripts/tpu_battery_r5.sh) and touches .tpu_results/DONE_<battery> when
# finished so an interactive session can poll for completion. The battery
# lives in its own file so it can be updated while the watcher waits.
set -u
cd /root/repo
OUT=/root/repo/.tpu_results
BATTERY=${1:-scripts/tpu_battery_r5.sh}
mkdir -p "$OUT"
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

echo "[watcher] start $(date -u +%FT%TZ) battery=$BATTERY" >>"$OUT/probe.log"
until probe; do
  echo "[watcher] tunnel down $(date -u +%FT%TZ)" >>"$OUT/probe.log"
  sleep 90
done
echo "[watcher] TUNNEL UP $(date -u +%FT%TZ)" >>"$OUT/probe.log"

bash "$BATTERY"
touch "$OUT/DONE_$(basename "$BATTERY" .sh)"
echo "[watcher] battery complete $(date -u +%FT%TZ)" >>"$OUT/probe.log"
