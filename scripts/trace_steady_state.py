#!/usr/bin/env python
"""Trace-backed accounting of the pipelined steady state (VERDICT r4 item 2).

The headline bench streams vmapped 16-fit batches through the TPU with host
prepare/finalize pipelined on side threads (bench.py, run_job_batches). The
component-level phase numbers (init 0.33 s + scan ~0.95 s + eval 0.23 s)
summed to ~1.5 s/batch while the measured steady-state wall is ~1.7-1.9 s —
a ~15% residual that subtraction-style attribution cannot localize. This
script measures the timeline directly:

  capture: warm the compile caches exactly like bench.py, then run a short
    pipelined stream under jax.profiler.trace and keep the device-timeline
    JSON (the .trace.json.gz xprof export carries per-program device events
    with microsecond start/duration).
  analyze: reconstruct the device-queue occupancy from the trace — merged
    busy intervals per program family (init / fit chunk / eval / serving
    pulls / transfers), queue gaps between them, and a steady-state
    per-batch table that must sum to the batch wall.

Usage:
  python scripts/trace_steady_state.py capture [--batches 6] [--m 16]
         [--out results/trace_steady_r5]
  python scripts/trace_steady_state.py analyze [--out results/trace_steady_r5]

The capture runs on the real TPU (bench protocol); analysis is pure host.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import shutil
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# capture
# --------------------------------------------------------------------------

def capture(out_dir: Path, n_batches: int, M: int) -> None:
    import jax

    from st_dadk_tpu.bench_workload import bench_workload
    from st_dadk_tpu.config import ExperimentConfig
    from st_dadk_tpu.train.batch_engine import run_job_batch, run_job_batches

    base = bench_workload()

    def jobs_for(seed: int, out: Path):
        cfg = ExperimentConfig.from_dict({**base, "base_seed": seed})
        return [(cfg, i, out / str(i)) for i in range(1, M + 1)]

    tmp = Path(tempfile.mkdtemp(prefix="stdadk_trace_"))
    trace_dir = out_dir / "raw"
    if trace_dir.exists():
        shutil.rmtree(trace_dir)
    trace_dir.mkdir(parents=True, exist_ok=True)
    try:
        for wi, seed in enumerate((9999, 9998)):
            t0 = time.time()
            log(f"[trace] warmup batch {wi} starting...")
            run_job_batch(jobs_for(seed, tmp / f"warm{wi}"),
                          epochs_chunk=500, verbose=True)
            log(f"[trace] warmup batch {wi} in {time.time() - t0:.1f}s")

        # python tracer off: frame events triple the export size and the
        # device-queue question is answered by the PJRT/TraceMe host level
        opts = jax.profiler.ProfileOptions()
        opts.python_tracer_level = 0

        def gen():
            for bi in range(n_batches):
                yield jobs_for(2025 + bi * 1000, tmp / f"b{bi}")

        log(f"[trace] tracing {n_batches} pipelined batches...")
        t0 = time.time()
        jax.profiler.start_trace(str(trace_dir), profiler_options=opts)
        try:
            results = run_job_batches(gen(), epochs_chunk=500)
            wall = time.time() - t0
        finally:
            jax.profiler.stop_trace()
        t_export = time.time() - t0 - wall
        log(f"[trace] stream wall {wall:.2f}s for {len(results)} fits "
            f"({len(results) / wall * 3600:.0f} fits/hr in-window); "
            f"trace export {t_export:.1f}s")

        (out_dir / "capture_meta.json").write_text(json.dumps({
            "M": M, "n_batches": n_batches, "wall_seconds": wall,
            "fits": len(results),
            "fits_per_hour_in_window": len(results) / wall * 3600.0,
            "export_seconds": t_export,
        }, indent=2))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


# --------------------------------------------------------------------------
# analysis
# --------------------------------------------------------------------------

def _load_trace(out_dir: Path) -> dict:
    cands = sorted(glob.glob(str(out_dir / "raw" / "plugins" / "profile" /
                                 "*" / "*.trace.json.gz")))
    if not cands:
        raise SystemExit(f"no trace.json.gz under {out_dir}/raw")
    with gzip.open(cands[-1]) as f:
        return json.load(f)


def _merge(intervals):
    """Merge possibly-overlapping (start, end) microsecond intervals."""
    out = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return out


def classify(name: str, dur_us: float = 0.0) -> str:
    """Program-family bucket for one device event name.

    The engine's jitted callables are small closures whose names reach the
    trace as jit_program/jit_one/jit_build; the big ones are unambiguous by
    role: jit_program >50 ms is the vmapped GMM init
    (ops/init_centers.py), the sub-ms jit_program calls are the serving
    select/flat-pull programs (train/loop.py), jit_one is the vmapped eval
    metrics program, jit_build the carry-init."""
    n = name.lower()
    if "_epoch_block" in n or "fit_chunk" in n or n.startswith("jit__chunk"):
        return "fit"
    if "jit_program" in n:
        return "gmm-init" if dur_us > 50_000 else "serve-select"
    if "jit_build" in n or "prepare" in n or "init" in n:
        return "init-carry"
    if "jit_one" in n or "metrics" in n or "eval" in n or "predict" in n:
        return "eval"
    if "select" in n or "serving" in n or "flat" in n or "pull" in n:
        return "serve-select"
    if n.startswith(("copy", "transfer")) or "buffer" in n:
        return "transfer"
    if n.startswith("jit_all") or "stopped" in n:
        return "stop-sync"
    return "eager-glue" if n.startswith("jit_") else "other"


def analyze(out_dir: Path) -> None:
    tr = _load_trace(out_dir)
    ev = tr.get("traceEvents", [])
    meta = json.loads((out_dir / "capture_meta.json").read_text()) \
        if (out_dir / "capture_meta.json").exists() else {}

    pids, tids = {}, {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"]["name"]
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"]["name"]
    dev_pids = [p for p, n in pids.items() if "TPU" in n or "tpu" in n]
    if not dev_pids:
        raise SystemExit(f"no TPU pid in trace (processes: {pids})")

    # the device process exports several lanes; take the one that carries
    # whole-program executions ("XLA Modules" in xprof naming; fall back to
    # the lane whose events are jit_* named)
    dev_events = [e for e in ev if e.get("ph") == "X" and
                  e.get("pid") in dev_pids]
    by_tid = defaultdict(list)
    for e in dev_events:
        by_tid[(e["pid"], e["tid"])].append(e)

    lane_summary = {}
    for key, evs in by_tid.items():
        lane_summary[str(key)] = {
            "name": tids.get(key, "?"), "events": len(evs),
            "total_dur_ms": round(sum(x.get("dur", 0) for x in evs) / 1e3, 1),
        }
    print("device lanes:")
    for k, v in sorted(lane_summary.items()):
        print(f"  {k} {v['name']!r}: {v['events']} events, "
              f"{v['total_dur_ms']} ms")

    module_lanes = [k for k in by_tid
                    if "module" in tids.get(k, "").lower()]
    if not module_lanes:
        # fall back: the lane with the largest total duration whose names
        # look like whole programs
        module_lanes = [max(by_tid, key=lambda k: sum(
            x.get("dur", 0) for x in by_tid[k]
            if str(x.get("name", "")).startswith("jit")))]
    mod = []
    for k in module_lanes:
        mod.extend(by_tid[k])
    mod.sort(key=lambda e: e["ts"])
    if not mod:
        raise SystemExit("no module-level device events found")

    t0 = mod[0]["ts"]
    t1 = max(e["ts"] + e.get("dur", 0) for e in mod)
    span_s = (t1 - t0) / 1e6

    # per-program rollup over the full span
    fam_dur = defaultdict(float)
    fam_cnt = defaultdict(int)
    name_dur = defaultdict(float)
    name_cnt = defaultdict(int)
    for e in mod:
        nm = str(e.get("name", "?"))
        fam = classify(nm, e.get("dur", 0))
        fam_dur[fam] += e.get("dur", 0) / 1e6
        fam_cnt[fam] += 1
        name_dur[nm] += e.get("dur", 0) / 1e6
        name_cnt[nm] += 1

    busy = _merge([(e["ts"], e["ts"] + e.get("dur", 0)) for e in mod])
    busy_s = sum(e - s for s, e in busy) / 1e6

    # gap list (device queue empty between module executions)
    gaps = []
    for (s1, e1), (s2, e2) in zip(busy, busy[1:]):
        gaps.append({"start_s": round((e1 - t0) / 1e6, 4),
                     "dur_ms": round((s2 - e1) / 1e3, 2)})
    gaps_sorted = sorted(gaps, key=lambda g: -g["dur_ms"])

    # steady-state restriction: drop everything before the SECOND fit
    # program starts (pipeline spin-up) and after the LAST fit ends (tail
    # finalize has no following batch to overlap with)
    fits = [e for e in mod if classify(str(e.get("name"))) == "fit"]
    report = {
        "meta": meta,
        "span_seconds": round(span_s, 3),
        "device_busy_seconds": round(busy_s, 3),
        "device_occupancy": round(busy_s / span_s, 4) if span_s else None,
        "family_seconds": {k: round(v, 3) for k, v in sorted(
            fam_dur.items(), key=lambda kv: -kv[1])},
        "family_counts": dict(fam_cnt),
        "program_seconds": {k: round(v, 3) for k, v in sorted(
            name_dur.items(), key=lambda kv: -kv[1])[:25]},
        "program_counts": {k: name_cnt[k] for k in sorted(
            name_dur, key=lambda k: -name_dur[k])[:25]},
        "largest_gaps_ms": gaps_sorted[:15],
        "n_gaps_over_5ms": sum(1 for g in gaps if g["dur_ms"] > 5),
        "gap_total_seconds": round(span_s - busy_s, 3),
    }
    if len(fits) >= 3:
        # steady span = fit-start to fit-start, excluding the pipeline
        # spin-up (everything before fit[1]) and the unoverlapped tail
        # (after the last fit starts): len(fits)-2 whole batch periods
        s0 = fits[1]["ts"]
        s1e = fits[-1]["ts"]
        inner = [e for e in mod if s0 <= e["ts"] < s1e]
        ibusy = _merge([(max(e["ts"], s0),
                         min(e["ts"] + e.get("dur", 0), s1e)) for e in inner])
        ispan = (s1e - s0) / 1e6
        ibusy_s = sum(e - s for s, e in ibusy) / 1e6
        ifam = defaultdict(float)
        for e in inner:
            ifam[classify(str(e.get("name")), e.get("dur", 0))] \
                += e.get("dur", 0) / 1e6
        nb = len(fits) - 2
        report["steady"] = {
            "n_batches": nb,
            "span_seconds": round(ispan, 3),
            "batch_wall_seconds": round(ispan / nb, 3),
            "device_busy_seconds": round(ibusy_s, 3),
            "device_occupancy": round(ibusy_s / ispan, 4),
            "per_batch_family_seconds": {
                k: round(v / nb, 4) for k, v in sorted(
                    ifam.items(), key=lambda kv: -kv[1])},
            "per_batch_gap_seconds": round((ispan - ibusy_s) / nb, 4),
        }

        # attribute each steady-span module-lane gap: what was running
        # anywhere else (host PJRT calls, transfers, device op lanes)
        # while the module queue sat empty? A gap fully covered by
        # transfer/host-pull activity is DMA time, not idle.
        others = [e for e in ev
                  if e.get("ph") == "X" and e.get("dur", 0) > 300
                  and (e["pid"], e.get("tid")) not in
                  [k for k in module_lanes]]
        gap_attr = []
        for (s1, e1), (s2, e2) in zip(ibusy, ibusy[1:]):
            if s2 - e1 < 2000:      # < 2 ms
                continue
            over = []
            for o in others:
                os_, oe = o["ts"], o["ts"] + o.get("dur", 0)
                ov = min(oe, s2) - max(os_, e1)
                if ov > 200:
                    over.append((ov, str(o.get("name", "?")),
                                 pids.get(o["pid"], o["pid"])))
            over.sort(reverse=True)
            gap_attr.append({
                "start_s": round((e1 - t0) / 1e6, 4),
                "dur_ms": round((s2 - e1) / 1e3, 2),
                "overlapping": [
                    {"name": n, "where": str(w),
                     "overlap_ms": round(ov / 1e3, 2)}
                    for ov, n, w in over[:4]],
            })
        report["steady_gap_attribution"] = sorted(
            gap_attr, key=lambda g: -g["dur_ms"])[:12]

    (out_dir / "report.json").write_text(json.dumps(report, indent=2))
    print(json.dumps({k: v for k, v in report.items()
                      if k not in ("largest_gaps_ms",)}, indent=2))
    print("largest gaps (ms):",
          [g["dur_ms"] for g in gaps_sorted[:10]])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["capture", "analyze", "both"])
    ap.add_argument("--batches", type=int, default=6)
    ap.add_argument("--m", type=int, default=16)
    ap.add_argument("--out", default=str(REPO / "results" / "trace_steady_r5"))
    args = ap.parse_args()
    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    if args.mode in ("capture", "both"):
        capture(out, args.batches, args.m)
    if args.mode in ("analyze", "both"):
        analyze(out)


if __name__ == "__main__":
    main()
