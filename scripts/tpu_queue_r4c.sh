#!/usr/bin/env bash
# Round-4c perf-measurement queue (late round 4, fresh session):
#
#   1. bf16 wide-lane CONFIRMATION: the r4b session measured
#      train_dtype=bf16 at 0.907 paired wall at M=32 (the first >3% knob
#      win). The auto-policy (engine picks bf16 when lane width > 16) was
#      deliberately deferred until a SECOND session reproduces the win —
#      this is that session.
#   2. Fatter-steps probe (ROADMAP round-5 candidate): batch_size 8192
#      halves steps/epoch (2 -> 1 at the bench workload's ~8k train
#      points), attacking the per-step fixed cost the M=32 attribution
#      surfaced. Accuracy-affecting (gradient noise halves), so the A/B's
#      paired CRPS is a gate, not just a side-channel; a Table-4.4
#      protocol rerun follows only if the wall win clears 3%.
#   3. Same probe under the wide-lane bf16 policy (M=32), where per-step
#      fixed costs bite hardest.
set -u
cd "$(dirname "$0")/.."
LOG=results/tpu_queue_r4c
mkdir -p "$LOG"

step() {
  local name="$1"; shift
  echo "=== [$name] $(date -u +%H:%M:%S) :: $*" | tee -a "$LOG/queue.log"
  timeout 3600 "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc $(date -u +%H:%M:%S)" | tee -a "$LOG/queue.log"
  return 0
}

# 1. bf16 M=32 second-session confirmation
step ab_bf16_m32_confirm python scripts/ab_interleaved.py \
  --b train_dtype=bf16 --m 32 --pairs 16 \
  --out results/ab_interleaved_bf16_m32_r4c

# 2. fatter steps at the M=16 default
step ab_bs8192 python scripts/ab_interleaved.py \
  --b batch_size=8192 --pairs 16 \
  --out results/ab_interleaved_bs8192_r4

# 3. fatter steps where fixed costs bite: M=32 + bf16 arm
step ab_bs8192_m32bf16 python scripts/ab_interleaved.py \
  --a train_dtype=bf16 --b train_dtype=bf16 batch_size=8192 --m 32 --pairs 12 \
  --out results/ab_interleaved_bs8192_m32bf16_r4

echo "QUEUE R4C DONE $(date -u +%H:%M:%S)" | tee -a "$LOG/queue.log"
