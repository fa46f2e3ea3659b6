#!/bin/bash
# Third measurement playbook (session-4 additions): serving-level numbers
# through the micro-batch servers + a learning-sanity re-check.  Chain after
# chip_playbook2.sh:
#   while kill -0 <chain_pid> 2>/dev/null; do sleep 60; done; \
#     bash tools/chip_playbook3.sh [WAIT_H]
set -u
cd "$(dirname "$0")/.."
STAMP=$(date -u +%m%d_%H%M)
DIR=chip_runs/${STAMP}_p3
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
    wait_device 3600 || { echo "    device gone; skipping" \
      | tee -a "$DIR/playbook.log"; return 1; }
    timeout "$tmo" "$@" > "$DIR/$name.retry.log" 2>&1
    rc=$?
  fi
  echo "    done rc=$rc $(date -u +%H:%M:%S)" | tee -a "$DIR/playbook.log"
  tail -n 8 "$DIR/$name".*log | grep -E "ms|scenes|serve_|loss" | tail -n 6 \
    >> "$DIR/summary.txt" 2>/dev/null
  echo "--- $name ^" >> "$DIR/summary.txt"
  return $rc
}

wait_device $(( ${1:-2} * 3600 )) || { echo GAVE_UP \
  | tee -a "$DIR/playbook.log"; exit 2; }

# serving-level throughput/latency (dense_block stem; gather as fallback A/B)
run_step 30_serve_dense 5400 $PY tools/bench_serve.py instseg unified
run_step 31_serve_gather 5400 env SERVE_STEM=gather $PY tools/bench_serve.py instseg
# learning sanity on the real chip (overfit 2 scenes; AP=1.0 expected)
run_step 32_overfit 5400 $PY tools/sanity_overfit_instseg.py
echo "PLAYBOOK3 DONE $(date -u +%H:%M:%S)" | tee -a "$DIR/playbook.log"
ln -sfn "${STAMP}_p3" chip_runs/latest_p3
