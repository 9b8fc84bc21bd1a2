#!/bin/bash
# Round-3 TPU work backlog, run sequentially once the tunnel is back.
# Each step logs under results/tpu_queue_r3/; safe to re-run (A/B arms
# re-fit, profiles overwrite their logs).
set -u
cd "$(dirname "$0")/.."
LOGDIR=results/tpu_queue_r3
mkdir -p "$LOGDIR"

step() {
  local name=$1; shift
  echo "=== [$name] $(date) ===" | tee -a "$LOGDIR/queue.log"
  timeout 5400 "$@" > "$LOGDIR/$name.log" 2>&1
  echo "=== [$name] exit $? $(date) ===" | tee -a "$LOGDIR/queue.log"
}

# 1. GMM init split: seeding vs EM, kmeans++ unroll sweep (roadmap question)
step profile_init python scripts/profile_init.py 16

# 2. bf16 EM storage A/B (paired CRPS + arm wall-clock)
step ab_em_dtype python scripts/ab_paired.py \
  --b init_em_dtype=bfloat16 --out results/ab_em_dtype_r3

# 3. bf16 training trunk A/B
step ab_train_dtype python scripts/ab_paired.py \
  --b train_dtype=bf16 --out results/ab_train_dtype_r3

# 4. GMM restart-count A/B (n_init 3 -> 1: init cost /3 if metric-neutral)
step ab_n_init python scripts/ab_paired.py \
  --b init_gmm_n_init=1 --out results/ab_n_init_r3

# 5. init subsample-cap A/B (10k -> 4096: EM cost ~x0.4 if metric-neutral)
step ab_subsample python scripts/ab_paired.py \
  --b init_subsample=4096 --out results/ab_subsample_r3

# 5b. low-depth seeding A/B (k-1 sequential draws -> 8 rounds)
step ab_seed_rounds python scripts/ab_paired.py \
  --b init_seed_rounds=8 --out results/ab_seed_rounds_r3

# 5c. epoch-scan unroll sweep (float-equivalent, NOT bit-exact: XLA
# reorders accumulation across unrolled iterations — CPU check shows
# ~1e-8-level loss drift. Signal = arm wall_seconds + the paired CRPS
# delta; ROADMAP: per-step scan dispatch ~0.4 ms is the current floor)
step ab_unroll2 python scripts/ab_paired.py \
  --b scan_unroll=2 --out results/ab_unroll2_r3
step ab_unroll4 python scripts/ab_paired.py \
  --b scan_unroll=4 --out results/ab_unroll4_r3

# 6. current-code bench (5x90 s protocol)
step bench python bench.py

# 7. long-horizon stability check (3 x 10 min windows: is the 23.7k-29.9k
# within-run drift tunnel noise or a real thermal ramp?)
step bench_long env BENCH_WINDOW_SECONDS=600 BENCH_WINDOWS=3 \
  BENCH_DETAILS=results/tpu_queue_r3/bench_long_details.json python bench.py

# 8. 32-fit workload at the engine's default auto-split policy (2 pipelined
# 16-lane batches) — the honest "M=32 >= M=16" evidence (VERDICT item 1)
step bench_m32_split env BENCH_LANE_WIDTH=16 \
  BENCH_DETAILS=results/tpu_queue_r3/bench_m32_split_details.json \
  python bench.py 32

echo "=== queue done $(date) ===" | tee -a "$LOGDIR/queue.log"
