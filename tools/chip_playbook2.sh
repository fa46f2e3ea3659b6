#!/bin/bash
# Follow-up measurement playbook: steps added after chip_playbook.sh was
# already running (a bash script must not be edited mid-run).  Chain with:
#   while kill -0 <playbook1_pid> 2>/dev/null; do sleep 60; done; \
#     bash tools/chip_playbook2.sh
# Covers the flat-object stage-2 layout (PERF.md "Flat-object stage-2
# layout") at train + serve, and the unified host/step A/B the first
# playbook lacks.
set -u
cd "$(dirname "$0")/.."
STAMP=$(date -u +%m%d_%H%M)
DIR=chip_runs/${STAMP}_p2
mkdir -p "$DIR"
export JAX_CACHE_DIR=${JAX_CACHE_DIR:-/tmp/jaxcache}
PY=${PYTHON:-python}

probe() {
  timeout 100 $PY -c "import jax; d=jax.devices(); import jax.numpy as jnp; \
float(jnp.ones((8,8)).sum()); print(str(d[0]))" 2>/dev/null | tail -1
}

wait_device() {
  local deadline=$(( $(date +%s) + $1 ))
  while true; do
    local out; out=$(probe)
    if echo "$out" | grep -qiE "tpu|axon|lite"; then
      echo "device up: $out $(date -u +%H:%M:%S)" | tee -a "$DIR/playbook.log"
      return 0
    fi
    [ "$(date +%s)" -gt "$deadline" ] && return 1
    sleep 120
  done
}

run_step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* $(date -u +%H:%M:%S)" | tee -a "$DIR/playbook.log"
  timeout "$tmo" "$@" > "$DIR/$name.log" 2>&1
  local rc=$?
  if [ $rc -ne 0 ]; then
    echo "    rc=$rc — reprobing + one retry" | tee -a "$DIR/playbook.log"
    wait_device 7200 || { echo "    device gone; skipping" \
      | tee -a "$DIR/playbook.log"; return 1; }
    timeout "$tmo" "$@" > "$DIR/$name.retry.log" 2>&1
    rc=$?
  fi
  echo "    done rc=$rc $(date -u +%H:%M:%S)" | tee -a "$DIR/playbook.log"
  tail -n 8 "$DIR/$name".*log | grep -E "ms|scenes|s/step|=" | tail -n 8 \
    >> "$DIR/summary.txt" 2>/dev/null
  echo "--- $name ^" >> "$DIR/summary.txt"
  return $rc
}

wait_device $(( ${1:-6} * 3600 )) || { echo GAVE_UP | tee -a "$DIR/playbook.log"; exit 2; }

# flat-object stage-2 A/B: train step at B=32/128, base vs flat layout
run_step 20_unitrain_flat 7200 $PY tools/bench_unified_train.py 32 128 base flat
echo "PLAYBOOK2 DONE $(date -u +%H:%M:%S)" | tee -a "$DIR/playbook.log"
ln -sfn "${STAMP}_p2" chip_runs/latest_p2
