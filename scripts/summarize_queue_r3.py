#!/usr/bin/env python
"""Summarize the round-3 TPU measurement queue (scripts/tpu_queue_r3.sh).

Reads whatever has completed — paired-A/B summaries under results/ab_*_r3/,
bench window details under results/tpu_queue_r3/ — and prints one markdown
table per section, ready to paste into docs/BENCHMARKS.md. Robust to a
partially-run queue: missing steps are listed as pending.

Verdict rule per A/B arm (the adoption bar used in docs/BENCHMARKS.md):
metric-neutral when the paired CRPS delta is under 2 sigma of its mean,
faster when arm b's wall clock beats arm a's by more than 3%. Only arms
that are BOTH are candidates for default flips.
"""
from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

AB_ARMS = [
    ("ab_em_dtype_r3", "init_em_dtype=bfloat16"),
    ("ab_train_dtype_r3", "train_dtype=bf16"),
    ("ab_n_init_r3", "init_gmm_n_init=1"),
    ("ab_subsample_r3", "init_subsample=4096"),
    ("ab_seed_rounds_r3", "init_seed_rounds=8"),
    ("ab_unroll2_r3", "scan_unroll=2"),
    ("ab_unroll4_r3", "scan_unroll=4"),
    ("ab_stack_r3", "combined stack (all neutral knobs)"),
]

BENCH_DETAILS = [
    ("headline 5x90s", REPO / "results" / "tpu_queue_r3" /
     "bench.log"),  # bench.py prints its details path; windows land below
    ("long 3x600s", REPO / "results" / "tpu_queue_r3" /
     "bench_long_details.json"),
    ("M=32 auto-split", REPO / "results" / "tpu_queue_r3" /
     "bench_m32_split_details.json"),
    ("stack M=16", REPO / "results" / "tpu_queue_r3b" /
     "bench_stack_m16_details.json"),
    ("stack M=32 native", REPO / "results" / "tpu_queue_r3b" /
     "bench_stack_m32_details.json"),
]


def _fmt(v, nd=5):
    return "--" if v is None else f"{v:+.{nd}f}"


def ab_table() -> list[str]:
    lines = ["## Paired A/B arms (bench workload, 16 paired seeds)", "",
             "| arm | CRPS delta (b-a) | sigma | RMSE delta | wall a (s) "
             "| wall b (s) | verdict |",  # walls = warm steady-state runs
             "|---|---|---|---|---|---|---|"]
    for dirname, label in AB_ARMS:
        f = REPO / "results" / dirname / "ab_summary.json"
        if not f.exists():
            lines.append(f"| `{label}` | pending | | | | | |")
            continue
        t = json.loads(f.read_text())
        p, a, b = t.get("paired"), t.get("a"), t.get("b")
        if not (p and a and b):
            lines.append(f"| `{label}` | incomplete | | | | | |")
            continue
        wa, wb = a.get("wall_seconds"), b.get("wall_seconds")
        neutral = p["crps_delta_sigma"] < 2.0
        faster = (wa is not None and wb is not None and wb < 0.97 * wa)
        # walls are only comparable when both arms were warmed up first
        # (wall_seconds_cold recorded): without a warmup pass, whichever
        # arm ran first absorbs the process's compile cost and the
        # comparison is an ordering artifact, not a speed signal.
        warmed = (a.get("wall_seconds_cold") is not None
                  and b.get("wall_seconds_cold") is not None)
        # single-sample walls are indicative only — the interleaved paired
        # harness (section below) is the authoritative throughput signal
        verdict = (("neutral; 1-sample wall faster (see interleaved)"
                    if neutral and faster
                    else "neutral, not faster" if neutral
                    else "NOT neutral")
                   if warmed else
                   ("CRPS-neutral; walls unwarmed (rerun)" if neutral
                    else "NOT neutral; walls unwarmed"))
        lines.append(
            f"| `{label}` | {_fmt(p['crps_delta_mean'])} ± "
            f"{p['crps_delta_std']:.5f} | {p['crps_delta_sigma']:.2f} "
            f"| {_fmt(p['rmse_delta_mean'])} "
            f"| {wa if wa is not None else '--'} "
            f"| {wb if wb is not None else '--'} | {verdict} |")
    return lines


INTERLEAVED = [
    ("ab_interleaved_stack_r3", "full stack (all 6 knobs)"),
    ("ab_interleaved_unroll4_r3", "scan_unroll=4 alone"),
    ("ab_interleaved_initpack_r3",
     "init-pack (bf16 EM + n_init=1 + seed_rounds=8)"),
]


def interleaved_table() -> list[str]:
    lines = ["", "## Interleaved paired throughput (authoritative walls)", "",
             "Drift-controlled: a/b batches alternate in one warmed process "
             "(`scripts/ab_interleaved.py`); pairwise wall ratios cancel the "
             "tunnel's 22-32k fits/hr session drift that makes separate "
             "runs (and the 1-sample arm walls above) incomparable.", "",
             "| arm b vs bare workload | ratio b/a median (p10-p90) "
             "| b faster | CRPS a / b |",
             "|---|---|---|---|"]
    for dirname, label in INTERLEAVED:
        f = REPO / "results" / dirname / "interleaved_summary.json"
        if not f.exists():
            lines.append(f"| {label} | pending | | |")
            continue
        t = json.loads(f.read_text())
        lo, hi = t["ratio_p10_p90"]
        lines.append(
            f"| {label} | {t['ratio_median']:.3f} ({lo:.2f}-{hi:.2f}) "
            f"| {t['b_faster_count']}/{t['pairs']} "
            f"| {t['crps_a_mean']:.4f} / {t['crps_b_mean']:.4f} |")
    lines.append("")
    lines.append("Adoption verdict: no default flips — the stack is slower "
                 "paired; the init-pack's -4% is thin and protocol-"
                 "divergent (docs/BENCHMARKS.md).")
    return lines


def bench_table() -> list[str]:
    lines = ["", "## Bench windows", "",
             "| run | median fits/hr | windows | spread |",
             "|---|---|---|---|"]
    for label, path in BENCH_DETAILS:
        if path.suffix == ".log":
            # headline bench writes BENCH_details next to bench.py by
            # default; prefer the canonical details file if present
            path = REPO / "bench_details.json"
        if not path.exists():
            lines.append(f"| {label} | pending | | |")
            continue
        try:
            d = json.loads(path.read_text())
        except (json.JSONDecodeError, OSError):
            lines.append(f"| {label} | unreadable | | |")
            continue
        wins = [w.get("fits_per_hour") for w in d.get("windows", [])
                if w.get("fits_per_hour")]
        if not wins:
            lines.append(f"| {label} | no windows | | |")
            continue
        med = sorted(wins)[len(wins) // 2]
        spread = (max(wins) - min(wins)) / med * 100 if med else 0.0
        lines.append(f"| {label} | {med:,.0f} | "
                     f"{', '.join(f'{w:,.0f}' for w in wins)} "
                     f"| ±{spread / 2:.1f}% |")
    return lines


def profile_section() -> list[str]:
    # prefer the r3b re-run: the r3 log predates the device_barrier fix
    # and its on-device timings read 0.0 ms (utils/platform.py)
    log = REPO / "results" / "tpu_queue_r3b" / "profile_init.log"
    if not log.exists():
        log = REPO / "results" / "tpu_queue_r3" / "profile_init.log"
    lines = ["", "## Init profile (seeding vs EM split)", ""]
    if not log.exists():
        lines.append("pending")
        return lines
    # surface the profile script's own summary lines verbatim
    keep = [ln for ln in log.read_text().splitlines()
            if any(s in ln for s in ("seed", "em", "total", "s/batch",
                                     "ms", "[profile"))]
    lines.extend(keep[-30:] or ["(no summary lines found)"])
    return lines


def main() -> int:
    out = (ab_table() + interleaved_table() + bench_table()
           + profile_section())
    print("\n".join(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
