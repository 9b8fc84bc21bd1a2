#!/usr/bin/env python
"""Headline benchmark: experiment-fit throughput on the reference workload.

Workload = the reference's default config (configs/config_st_interp.yaml of
STLABTW/ST-DADK): dataset 2a_8 (T=100, S=1000), multi-quantile
tau={.05,.25,.5,.75,.95}, GMM-initialized learnable Wendland basis, AdamW
2e-2 + warmup/cosine + EMA, 500 epochs max with patience 50 — i.e. one full
DA-STDK fit. We stream vmapped batches of M fits through the TPU with
finalize pipelined against the next batch's training, and report
steady-state fits/hour.

Measurement protocol (round-3 tightening, VERDICT item 5): FIVE independent
windows, each >= 90 s of whole batches, median window reported with the
per-window spread; window lengths and rates are recorded in
bench_details.json so round-over-round deltas are interpretable against the
tunnel's run-to-run variance.

Baseline: the same workload measured with the actual reference code on this
host's CPU = 35.0 fits/hour single-process (baselines/reference_cpu.json;
3 fits, mean 102.8 s/fit). The reference's parallel mode is joblib
n_jobs=10, so vs_baseline divides by 10x the single-process rate — an
optimistic proxy for the reference (perfect scaling, 10 cores).

Prints ONE JSON line:
    {"metric": "fits_per_hour", "value": ..., "unit": "fits/hour",
     "vs_baseline": ...}
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

# persistent compilation cache: the vmapped whole-fit program is large and
# the remote-compile tunnel is slow; steady-state throughput (what a grid
# search sees) reuses the compiled program.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

BASELINE_FITS_PER_HOUR_1CORE = 35.0
BASELINE_JOBLIB10_PROXY = BASELINE_FITS_PER_HOUR_1CORE * 10.0
MIN_WINDOW_SECONDS = float(os.environ.get("BENCH_WINDOW_SECONDS", 90.0))
N_WINDOWS = int(os.environ.get("BENCH_WINDOWS", 5))
# non-default protocols (e.g. the long-horizon stability check) write their
# evidence elsewhere so the headline bench_details.json is never clobbered
DETAILS_PATH = Path(os.environ.get("BENCH_DETAILS",
                                   str(REPO / "bench_details.json")))
# BENCH_LANE_WIDTH=w splits each M-fit workload into pipelined w-lane
# batches — the same policy run_lane_jobs applies in real sweeps (measured
# single-chip sweet spot is 16 lanes; docs/BENCHMARKS.md). 0 = one M-lane
# batch per dispatch (the raw lane-width measurement).
LANE_WIDTH = int(os.environ.get("BENCH_LANE_WIDTH", 0))


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


# ---- drift calibration (VERDICT r3 item 5) --------------------------------
# Identical code measured 29.9k vs 25.1k fits/hr medians in sessions five
# hours apart (commit 553677a), so cross-round deltas under ~15% are
# environment, not code. Each window therefore runs a GOLDEN PROBE — two
# pinned pure-jnp programs that never change across rounds:
#   device arm: 1024-step scan of 2048^2 bf16 matmuls (one dispatch,
#     ~17.6 TFLOP) — tracks raw MXU/HBM rate; measured invariant at
#     0.119 s +/- 0.000 on this chip.
#   dispatch arm: 100 tiny jit round-trips with a one-element fetch each —
#     tracks the tunnel's dispatch+fetch latency, the component that
#     actually drifts (measured 26-32 ms/trip within minutes).
# The reference values below were pinned alongside the round-4 headline
# run; the calibrated rate scales the raw median by the round-trip drift
# with sensitivity 0.5 — per-batch profiling (docs/BENCHMARKS.md) splits a
# 16-lane batch roughly half host-device chatter (init uploads, chunk
# dispatches, serving pulls), half on-device compute, so rate sensitivity
# to round-trip latency is ~0.5. Raw per-window probe values land in
# bench_details.json so any better model can be applied post hoc.
GOLDEN_REF = {"device_s": 0.119, "roundtrip_ms": 29.0}
RT_SENSITIVITY = 0.5


def _make_golden_probe():
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def mxu(x):
        def body(c, _):
            return jnp.tanh(c @ c) + 0.001, ()
        c, _ = jax.lax.scan(body, x, None, length=1024)
        return c

    @jax.jit
    def tiny(x):
        return x * 1.000001 + 0.000001

    x_mxu = jnp.full((2048, 2048), 0.001, jnp.bfloat16)
    x_tiny = jnp.ones((128,), jnp.float32)

    def fetch1(a):  # true barrier on the tunnel backend
        np.asarray(jax.device_get(a.ravel()[:1]))

    fetch1(mxu(x_mxu))  # compile + warm both arms
    fetch1(tiny(x_tiny))

    def probe():
        dev = []
        for _ in range(3):
            t0 = time.time()
            fetch1(mxu(x_mxu))
            dev.append(time.time() - t0)
        t0 = time.time()
        x = x_tiny
        for _ in range(100):
            x = tiny(x)
            fetch1(x)
        rt_ms = (time.time() - t0) * 10.0
        return {"device_s": round(sorted(dev)[1], 4),
                "roundtrip_ms": round(rt_ms, 2)}

    return probe


def main() -> None:
    import numpy as np

    from st_dadk_tpu.bench_workload import bench_workload
    from st_dadk_tpu.config import ExperimentConfig
    from st_dadk_tpu.train.batch_engine import run_job_batch, run_job_batches

    M = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    # ablation hook (same contract as profile_batch's
    # ST_DADK_PROFILE_OVERRIDES): BENCH_OVERRIDES='{"scan_unroll": 4}'
    # measures the workload with config overrides; the headline protocol
    # is the bare default.
    overrides = json.loads(os.environ.get("BENCH_OVERRIDES", "{}"))
    if overrides and DETAILS_PATH == REPO / "bench_details.json":
        log("[bench] WARNING: BENCH_OVERRIDES set without a non-default "
            "BENCH_DETAILS path — overwriting the headline evidence file "
            "with an overridden-workload run")
    base = bench_workload(**overrides)

    def jobs_for(seed: int, out: Path):
        cfg = ExperimentConfig.from_dict({**base, "base_seed": seed})
        return [(cfg, i, out / str(i)) for i in range(1, M + 1)]

    tmp = Path(tempfile.mkdtemp(prefix="stdadk_bench_"))
    try:
        # warmup: compiles the whole-fit + init + eval programs
        # warm at the WIDTH THE WINDOWS RUN: under BENCH_LANE_WIDTH the
        # measured batches are lane_width-lane programs, so warming only
        # the M-lane shape leaves window 0 paying the split program's
        # compile/cache-load (13.3k vs 30k steady in the r3 M=32 split
        # run). Then one more warm batch to flush tunnel spin-up residue.
        if LANE_WIDTH and LANE_WIDTH < M:
            # every distinct chunk width the split produces (incl. a
            # ragged tail, e.g. M=24 w=16 -> widths {16, 8})
            widths = sorted({len(c) for c in (
                list(range(M))[i:i + LANE_WIDTH]
                for i in range(0, M, LANE_WIDTH))}, reverse=True)
        else:
            widths = [M]
        log(f"[bench] warmup batches (widths {widths}) — compiling...")
        for wi, seed in enumerate((9999, 9998)):
            for w in widths:
                t0 = time.time()
                warm_jobs = jobs_for(seed, tmp / f"warm{wi}_{w}")[:w]
                run_job_batch(warm_jobs, epochs_chunk=500)
                log(f"[bench] warmup batch {wi} (width {w}) "
                    f"in {time.time()-t0:.1f}s")

        golden_probe = _make_golden_probe()

        windows = []
        results = None
        seed_base = 2025
        for wi in range(N_WINDOWS):
            golden = golden_probe()
            t0 = time.time()

            def gen(wi=wi, t0=t0):
                # stream whole batches (pipelined train/finalize inside
                # run_job_batches) until the window is long enough
                bi = 0
                while True:
                    jobs = jobs_for(seed_base + wi * 100000 + bi * 1000,
                                    tmp / f"w{wi}b{bi}")
                    if LANE_WIDTH and LANE_WIDTH < len(jobs):
                        for c in range(0, len(jobs), LANE_WIDTH):
                            yield jobs[c:c + LANE_WIDTH]
                    else:
                        yield jobs
                    bi += 1
                    if time.time() - t0 >= MIN_WINDOW_SECONDS:
                        return

            window_results = run_job_batches(gen(), epochs_chunk=500)
            wall = time.time() - t0
            fits = len(window_results)
            rate = fits / wall * 3600.0
            windows.append({"fits": fits, "wall_seconds": wall,
                            "fits_per_hour": rate, "golden": golden})
            results = window_results
            log(f"[bench] window {wi}: {fits} fits in {wall:.1f}s "
                f"-> {rate:.1f} fits/hr (golden: mxu {golden['device_s']}s, "
                f"rt {golden['roundtrip_ms']}ms)")
            # incremental dump: if a later window stalls (tunnel hiccup),
            # the completed windows' evidence survives on disk
            with open(DETAILS_PATH, "w") as f:
                json.dump({"M": M, "overrides": overrides,
                           "windows": windows, "partial": True},
                          f, indent=2)

        rates = sorted(w["fits_per_hour"] for w in windows)
        fits_per_hour = rates[len(rates) // 2]          # median window
        spread_pct = ((rates[-1] - rates[0]) / fits_per_hour * 50.0
                      if fits_per_hour else 0.0)        # +/- half-range %

        rt_vals = sorted(w["golden"]["roundtrip_ms"] for w in windows)
        dev_vals = sorted(w["golden"]["device_s"] for w in windows)
        rt_med = rt_vals[len(rt_vals) // 2]
        dev_med = dev_vals[len(dev_vals) // 2]
        rt_ratio = rt_med / GOLDEN_REF["roundtrip_ms"]
        calibration = {
            "golden_ref": GOLDEN_REF,
            "roundtrip_ms_median": rt_med,
            "device_s_median": dev_med,
            "roundtrip_ratio_vs_ref": round(rt_ratio, 4),
            "device_ratio_vs_ref": round(dev_med / GOLDEN_REF["device_s"], 4),
            "rt_sensitivity": RT_SENSITIVITY,
            "calibrated_fits_per_hour": round(
                fits_per_hour * rt_ratio ** RT_SENSITIVITY, 2),
        }

        crps = [r.get("test_crps") for r in results]
        rmse = [r.get("test_rmse") for r in results]
        log(f"[bench] median window: {fits_per_hour:.1f} fits/hr "
            f"(spread +/-{spread_pct:.1f}% over {len(rates)} windows, "
            f"range {rates[0]:.0f}-{rates[-1]:.0f})")
        log(f"[bench] test CRPS mean={np.mean(crps):.4f} "
            f"(reference CPU: 0.484 +/- 0.013); "
            f"test RMSE mean={np.mean(rmse):.4f} (reference: 0.963)")

        details = {
            "M": M,
            "overrides": overrides,
            "lane_width": LANE_WIDTH or M,
            "protocol": f"median of {N_WINDOWS} windows, each >= "
                        f"{MIN_WINDOW_SECONDS:.0f}s of whole pipelined batches",
            "windows": windows,
            "fits_per_hour": fits_per_hour,
            "calibration": calibration,
            "window_spread_pct": round(spread_pct, 2),
            "test_crps_last_window": crps, "test_rmse_last_window": rmse,
            "baseline_1core_fits_per_hour": BASELINE_FITS_PER_HOUR_1CORE,
            "baseline_joblib10_proxy": BASELINE_JOBLIB10_PROXY,
        }
        with open(DETAILS_PATH, "w") as f:
            json.dump(details, f, indent=2)

        log(f"[bench] calibration: roundtrip {rt_med:.1f}ms "
            f"(ref {GOLDEN_REF['roundtrip_ms']}), ratio {rt_ratio:.3f} -> "
            f"calibrated {calibration['calibrated_fits_per_hour']:.0f} "
            f"fits/hr (raw {fits_per_hour:.0f})")
        print(json.dumps({
            "metric": "fits_per_hour",
            "value": round(fits_per_hour, 2),
            "unit": "fits/hour",
            "vs_baseline": round(fits_per_hour / BASELINE_JOBLIB10_PROXY, 2),
            "calibrated_value": calibration["calibrated_fits_per_hour"],
            "calibration_roundtrip_ratio": calibration[
                "roundtrip_ratio_vs_ref"],
        }))
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
