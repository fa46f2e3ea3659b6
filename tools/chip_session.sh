#!/bin/bash
# Trimmed in-session measurement run: value-ordered subset of
# chip_playbook.sh with tight per-step timeouts so the whole sequence
# fits in a short window while the tunnel is up.  Logs are
# fold_chip_results.py-compatible (chip_runs/<stamp>/NN_name.log).
set -u
cd "$(dirname "$0")/.."
STAMP=$(date -u +%m%d_%H%M)
DIR=chip_runs/$STAMP
mkdir -p "$DIR"
export JAX_CACHE_DIR=${JAX_CACHE_DIR:-/tmp/jaxcache}
PY=${PYTHON:-python}

run_step() {
  local name=$1 tmo=$2; shift 2
  echo "=== $name: $* $(date -u +%H:%M:%S)" | tee -a "$DIR/playbook.log"
  timeout "$tmo" "$@" > "$DIR/$name.log" 2>&1
  local rc=$?
  echo "    done rc=$rc $(date -u +%H:%M:%S)" | tee -a "$DIR/playbook.log"
  tail -n 8 "$DIR/$name".*log | grep -E "ms|scenes|s/step|=" | tail -n 8 \
    >> "$DIR/summary.txt" 2>/dev/null
  echo "--- $name ^" >> "$DIR/summary.txt"
  return $rc
}

# 1. conv-ladder decisions: stem mode x sorted hint (serving + training)
run_step 01_fwd_ladder 1500 $PY tools/bench_instseg_fwd.py base dense sorted dense_sorted
# 2. training-step target (<=1.5 s/step at B=4 x 65k)
run_step 03_train_scatter_free 1200 $PY tools/bench_train_step.py none scatter_free
run_step 04_train_dense 1200 $PY tools/bench_train_step.py none scatter_free dense_stem
run_step 05_train_sorted_dense 1200 $PY tools/bench_train_step.py none scatter_free sorted,dense_stem
# 3. serving layouts
run_step 06_fwd_flat 1500 $PY tools/bench_instseg_fwd.py flat flat_sorted compact
run_step 08_fwd_int8 1200 $PY tools/bench_instseg_fwd.py int8 dense_int8
# 4. micro levers
run_step 10_ballquery 900 $PY tools/bench_ballquery.py
# 5. stage-2 flat-object A/B (train)
run_step 20_unitrain_flat 1500 $PY tools/bench_unified_train.py 32 base flat
# 6. swin variants
run_step 12_fwd_swin 1200 $PY tools/bench_instseg_fwd.py swin flat_swin

echo "SESSION RUN DONE $(date -u +%H:%M:%S)" | tee -a "$DIR/playbook.log"
ln -sfn "$STAMP" chip_runs/latest
