#!/bin/bash
# One-shot on-chip work batch: run everything that needs the real TPU, in
# priority order, logging to /tmp/chip_session/. Designed to be fired the
# moment the tunneled chip comes back after an outage (each step is
# independently bounded; a mid-run outage loses only the current step).
set -u
OUT=/tmp/chip_session
mkdir -p $OUT
cd "$(dirname "$0")/.."

echo "=== chip_session start $(date) ===" | tee $OUT/summary.log

run() {  # run <name> <timeout_s> <cmd...>
  local name=$1 t=$2; shift 2
  echo "--- $name ($(date +%H:%M:%S)) ---" | tee -a $OUT/summary.log
  timeout "$t" "$@" > "$OUT/$name.log" 2>&1
  echo "exit=$? $(tail -c 300 "$OUT/$name.log" | tr '\n' ' ')" \
    | tee -a $OUT/summary.log
}

# 0. pre-warm the multichip dryrun's XLA:CPU compiles into the persistent
#    cache (CPU-only, no chip needed; the driver's own dryrun_multichip run
#    then starts warm and finishes in seconds)
run dryrun 3000 python -c "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"

# 1. TPU-gated kernel parity (the weighted-scatter VJPs landed unverified
#    on-chip; correctness first)
run tpu_tests 3000 python -m pytest tests/test_pallas_tpu_paths.py -q

# 2. headline bench (segm + det + train line + R101); high extras budget so
#    every line gets compiled into the persistent cache here — the driver's
#    own bench run then stays warm and within its budget
run bench 3000 env BENCH_EXTRA_BUDGET_S=2400 python bench.py

# 3. MFU / batch-scaling table
run mfu 3000 python tools/mfu_bench.py --segm-train

# 4. trace the post-fix train step (det bs=1, then segm bs=1)
run trace_train 2000 python tools/profile_train.py
run trace_train_segm 2500 python tools/profile_train.py mask
# 5. trace segm inference (with postprocessing, like the bench) for the
#    remaining-fat hunt
run trace_infer 2000 python tools/profile_mask.py mask --postproc

echo "=== chip_session done $(date) ===" | tee -a $OUT/summary.log
