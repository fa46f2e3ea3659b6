#!/bin/bash
# Unattended measurement playbook for the round-2 perf levers (NEXTSTEPS.md).
#
# Waits (up to WAIT_H hours) for the axon TPU tunnel to answer a subprocess
# probe, then runs the staged A/B ladders in value order, logging each step
# to chip_runs/<stamp>/.  Steps are timeout-bounded and re-probe + retry
# once on failure (tunnel flaps observed to last minutes-to-hours).
#
# Usage:  bash tools/chip_playbook.sh [WAIT_H]
# One TPU process at a time: this script assumes nothing else touches the
# chip; stop the /tmp/tpu_probe.sh loop before relying on its results.
set -u
cd "$(dirname "$0")/.."
WAIT_H=${1:-9}
STAMP=$(date -u +%m%d_%H%M)
DIR=chip_runs/$STAMP
mkdir -p "$DIR"
export JAX_CACHE_DIR=${JAX_CACHE_DIR:-/tmp/jaxcache}
PY=${PYTHON:-python}

probe() {
  timeout 100 $PY -c "import jax; d=jax.devices(); import jax.numpy as jnp; \
float(jnp.ones((8,8)).sum()); print(str(d[0]))" 2>/dev/null | tail -1
}

wait_device() {   # $1 = max seconds
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

run_step() {      # $1 = name, $2 = per-step timeout s, rest = command
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
  tail -n 6 "$DIR/$name".*log | grep -E "ms|scenes|s/step|=" | tail -n 8 \
    >> "$DIR/summary.txt" 2>/dev/null
  echo "--- $name ^" >> "$DIR/summary.txt"
  return $rc
}

echo "waiting up to ${WAIT_H}h for the chip $(date -u +%H:%M:%S)" \
  | tee -a "$DIR/playbook.log"
if ! wait_device $(( WAIT_H * 3600 )); then
  echo "GAVE UP: no device in ${WAIT_H}h" | tee -a "$DIR/playbook.log"
  exit 2
fi
# the chip admits ONE process: stop the status-probe loop before real runs
if [ -f /tmp/probe.pid ]; then
  kill "$(cat /tmp/probe.pid)" 2>/dev/null
  echo "UP (playbook running)" > /tmp/tpu_status
fi

# 1. instseg forward ladder: baseline + dense stem + sorted-gather hint
run_step 01_fwd_base_dense 5400 $PY tools/bench_instseg_fwd.py base dense
run_step 02_fwd_sorted 5400 $PY tools/bench_instseg_fwd.py sorted dense_sorted
# 2. training-step ladder (the <=1.5 s/step target)
run_step 03_train_scatter_free 4800 $PY tools/bench_train_step.py none scatter_free
run_step 04_train_dense 4800 $PY tools/bench_train_step.py none scatter_free dense_stem
run_step 05_train_sorted_dense 4800 $PY tools/bench_train_step.py none scatter_free sorted,dense_stem
# 3. serving layouts
run_step 06_fwd_flat 5400 $PY tools/bench_instseg_fwd.py flat flat_sorted
run_step 07_fwd_compact 5400 $PY tools/bench_instseg_fwd.py compact
run_step 08_fwd_int8 5400 $PY tools/bench_instseg_fwd.py int8 dense_int8 compact_int8
run_step 09_train_compact 4800 $PY tools/bench_train_step.py none scatter_free compact
# 4. micro levers
run_step 10_ballquery 3600 $PY tools/bench_ballquery.py
run_step 11_gather_micro 3600 $PY tools/bench_gather.py
# 5. swin backbone variants
run_step 12_fwd_swin 5400 $PY tools/bench_instseg_fwd.py swin flat_swin
# 6. headline bench with the full variant ladder (fault-isolated per variant)
BENCH_VARIANTS="gather,dense_block,dense_block+sorted,flat,compact,compact+int8" \
  run_step 13_bench_full 10800 $PY bench.py
# 7. XLA flag sweep on the base variant (bounded; lowest value, last)
run_step 14_flag_sweep 14400 $PY tools/bench_xla_flags.py dense

echo "PLAYBOOK DONE $(date -u +%H:%M:%S)" | tee -a "$DIR/playbook.log"
ln -sfn "$STAMP" chip_runs/latest
