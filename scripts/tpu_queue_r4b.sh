#!/usr/bin/env bash
# Round-4 perf-measurement queue (runs AFTER tpu_queue_r4.sh frees the chip;
# everything here is timing-sensitive and needs the chip idle).
#
#   1. VERDICT task 6 (GMM EM loop): fused concat-k EM paired A/B + the init
#      stage profile with the fused rows.
#   2. VERDICT task 3 (lane-merge / M=32 attribution): timed lane-count
#      scaling, bare + per-knob ablations (dropout off, bf16 trunk, pregather
#      off) to localize the superlinear component before any kernel work.
#   3. bf16-at-M=32 direct A/B: if the M=32 penalty is HBM pressure, the
#      bf16 trunk should close part of it (it halves activation traffic).
set -u
cd "$(dirname "$0")/.."
LOG=results/tpu_queue_r4b
mkdir -p "$LOG"

step() {
  local name="$1"; shift
  echo "=== [$name] $(date -u +%H:%M:%S) :: $*" | tee -a "$LOG/queue.log"
  timeout 3600 "$@" >"$LOG/$name.log" 2>&1
  local rc=$?
  echo "=== [$name] rc=$rc $(date -u +%H:%M:%S)" | tee -a "$LOG/queue.log"
  return 0
}

# 1. fused GMM EM: drift-controlled whole-fit A/B + isolated init profile
step ab_gmmfused python scripts/ab_interleaved.py \
  --b init_gmm_fused=true --pairs 16 --out results/ab_interleaved_gmmfused_r4
step profile_init python scripts/profile_init.py 16

# 2. lane-count scaling, bare + ablations
step lanes_bare python scripts/ab_scan_lanes.py --lanes 8 16 32 --pairs 10 \
  --out results/ab_scan_lanes_r4 --dump-hlo results/lane_scaling_r4/hlo_timed
step lanes_nodrop python scripts/ab_scan_lanes.py --lanes 16 32 --pairs 8 \
  --b dropout=0.0 --out results/ab_scan_lanes_r4_nodrop
step lanes_bf16 python scripts/ab_scan_lanes.py --lanes 16 32 --pairs 8 \
  --b train_dtype=bf16 --out results/ab_scan_lanes_r4_bf16
step lanes_remat python scripts/ab_scan_lanes.py --lanes 16 32 --pairs 8 \
  --b remat=true --out results/ab_scan_lanes_r4_remat

# 3. direct whole-fit bf16 A/B at M=32
step ab_bf16_m32 python scripts/ab_interleaved.py \
  --b train_dtype=bf16 --m 32 --pairs 12 --out results/ab_interleaved_bf16_m32_r4

echo "QUEUE R4B DONE $(date -u +%H:%M:%S)" | tee -a "$LOG/queue.log"
