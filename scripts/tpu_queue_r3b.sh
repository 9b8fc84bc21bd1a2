#!/bin/bash
# Round-3 follow-up TPU queue: re-measurements after two harness fixes.
#
# 1. profile_init's block_until_ready timings read 0.0 ms on the tunnel
#    backend (not a barrier there — utils/platform.py::device_barrier);
#    re-run with the true barrier.
# 2. ab_paired walls were an ordering artifact (first arm in the process
#    absorbed 60-90 s of compile; every arm b "beat" arm a 3-6x including
#    scan_unroll=2). ab_paired now warms each arm before timing; re-run
#    all seven arms for honest wall comparisons. CRPS deltas were already
#    valid (paired artifacts) and are re-confirmed for free.
#
# Run AFTER scripts/tpu_queue_r3.sh. Logs under results/tpu_queue_r3b/.
set -u
cd "$(dirname "$0")/.."
LOGDIR=results/tpu_queue_r3b
mkdir -p "$LOGDIR"

step() {
  local name=$1; shift
  echo "=== [$name] $(date) ===" | tee -a "$LOGDIR/queue.log"
  timeout 5400 "$@" > "$LOGDIR/$name.log" 2>&1
  echo "=== [$name] exit $? $(date) ===" | tee -a "$LOGDIR/queue.log"
}

step profile_init python scripts/profile_init.py 16

# stage profile under the true barrier: pre-fix, the scan/pull boundary
# used block_until_ready, so scan time leaked into "history pull"
step profile_batch python scripts/profile_batch.py 16

step ab_em_dtype python scripts/ab_paired.py \
  --b init_em_dtype=bfloat16 --out results/ab_em_dtype_r3
step ab_train_dtype python scripts/ab_paired.py \
  --b train_dtype=bf16 --out results/ab_train_dtype_r3
step ab_n_init python scripts/ab_paired.py \
  --b init_gmm_n_init=1 --out results/ab_n_init_r3
step ab_subsample python scripts/ab_paired.py \
  --b init_subsample=4096 --out results/ab_subsample_r3
step ab_seed_rounds python scripts/ab_paired.py \
  --b init_seed_rounds=8 --out results/ab_seed_rounds_r3
step ab_unroll2 python scripts/ab_paired.py \
  --b scan_unroll=2 --out results/ab_unroll2_r3
step ab_unroll4 python scripts/ab_paired.py \
  --b scan_unroll=4 --out results/ab_unroll4_r3

# combined stack: every CRPS-neutral knob at once (interaction check —
# adopting defaults requires the STACK to stay neutral, not just each arm)
step ab_stack python scripts/ab_paired.py \
  --b init_em_dtype=bfloat16 train_dtype=bf16 init_gmm_n_init=1 \
     init_subsample=4096 init_seed_rounds=8 scan_unroll=4 \
  --out results/ab_stack_r3

# benches with the stacked knobs (adoption candidates): M=16 headline
# shape and a NATIVE M=32 batch — with the init cost cut, the lane-width
# sweet spot may move (VERDICT r2 item 1: "M=32 >= M=16")
STACK='{"init_em_dtype":"bfloat16","train_dtype":"bf16","init_gmm_n_init":1,"init_subsample":4096,"init_seed_rounds":8,"scan_unroll":4}'
step bench_stack_m16 env BENCH_OVERRIDES="$STACK" \
  BENCH_DETAILS=results/tpu_queue_r3b/bench_stack_m16_details.json \
  python bench.py 16
step bench_stack_m32 env BENCH_OVERRIDES="$STACK" \
  BENCH_DETAILS=results/tpu_queue_r3b/bench_stack_m32_details.json \
  python bench.py 32

# re-run the large-N crossover map with the true device barrier
# (pre-fix absolute ms were backpressure approximations; ratios held)
step bench_large_n python scripts/bench_large_n.py

echo "=== queue r3b done $(date) ===" | tee -a "$LOGDIR/queue.log"
