#!/usr/bin/env python
"""Per-HLO attribution of the lane-width (M) scaling of the fit-chunk scan.

VERDICT r3 weak #3: native M=32 lanes pay a ~24% HBM-pressure penalty (scan
cost scales 2.43x per 2x lanes past M=16). This script makes the penalty
attributable WITHOUT timing: it AOT-compiles the exact `jitted_fit_chunk`
program the batch engine dispatches, at M in {8, 16, 32, 64}, and reports

  - compiled.cost_analysis():   total flops / bytes accessed (by operand and
                                output) -- both should be exactly linear in M;
  - compiled.memory_analysis(): argument/output/temp/code HBM allocation --
                                `temp_size_in_bytes` is XLA's live-intermediate
                                high-water mark, the number that decides
                                whether the working set outgrows what the
                                chip can overlap;
  - an HLO fusion census:       op-kind histogram of the optimized HLO, so a
                                strategy flip (e.g. a fusion splitting, a
                                dot lowering to a different loop emitter) at
                                a particular M shows up as a diff, not a
                                guess.

Superlinear wall-clock with linear flops/bytes and superlinear temp_size is
the HBM-pressure signature; superlinear wall-clock with a fusion-census diff
is a compiler-strategy flip. Output: results/lane_scaling_r4/report.json and
a rendered markdown table on stdout.

Run on the real chip env (axon) -- compilation happens server-side, no chip
step time is consumed.
"""
from __future__ import annotations

import json
import os
import sys
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
from st_dadk_tpu.utils.platform import apply_platform_env  # noqa: E402
apply_platform_env()

import jax
import jax.numpy as jnp
import numpy as np

from st_dadk_tpu.bench_workload import bench_workload
from st_dadk_tpu.config import ExperimentConfig

MS = [int(x) for x in (sys.argv[1:] or ["8", "16", "32", "64"])]
OUT = REPO / "results" / "lane_scaling_r4"
CHUNK = 100


def build_abstract_args(cfg: ExperimentConfig, M: int):
    """ShapeDtypeStructs of the exact (carry, consts, data, ids, lr, active)
    the engine passes to fit_chunk, without touching the device: lane setup
    runs on host numpy, model/carry shapes via jax.eval_shape."""
    from st_dadk_tpu.train.experiment import ExperimentSetup
    from st_dadk_tpu.train.loop import (LoopSpec, adaptive_batch_size,
                                        prepare_carry_batch,
                                        prepare_train_data)

    setups = []
    for i in range(1, M + 1):
        s = ExperimentSetup(cfg, i, verbose=False, defer_model=True)
        s.cfg = cfg
        setups.append(s)
    spec_model = setups[0].spec
    batch_size = adaptive_batch_size(min(s.train_ps.n_real for s in setups),
                                     cfg.batch_size)
    B = max(-(-s.train_ps.n_real // batch_size) for s in setups)
    cap_tr = B * batch_size
    max_val = max(s.valid_ps.n_real for s in setups)
    val_chunk = min(max(batch_size * 16, 32768), max_val)
    nvc = max(1, -(-max_val // val_chunk))
    cap_va = nvc * val_chunk
    data0 = prepare_train_data(setups[0].train_ps, setups[0].valid_ps,
                               batch_size, val_chunk=val_chunk,
                               cap_tr=cap_tr, cap_va=cap_va)[0]
    abstract = lambda t: jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), t)
    data_b = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct((M,) + np.shape(x), np.asarray(x).dtype),
        data0)

    keys = jax.ShapeDtypeStruct((M, 2), np.uint32)
    k = spec_model.k_spatial
    centers_b = jax.ShapeDtypeStruct((M, k, 2), np.float32)
    bw_b = jax.ShapeDtypeStruct((M, k), np.float32)
    carry_b, consts_b = jax.eval_shape(prepare_carry_batch(spec_model, M),
                                       keys, centers_b, bw_b)
    carry_b, consts_b = abstract(carry_b), abstract(consts_b)

    spec = LoopSpec.from_config(cfg, spec_model, batch_size, B, val_chunk, nvc)
    ids = jax.ShapeDtypeStruct((CHUNK,), np.int32)
    lr_c = jax.ShapeDtypeStruct((M, CHUNK, B, 2), np.float32)
    active = jax.ShapeDtypeStruct((CHUNK,), np.bool_)
    return spec, (carry_b, consts_b, data_b, ids, lr_c, active)


def fusion_census(hlo_text: str) -> Counter:
    census: Counter = Counter()
    for line in hlo_text.splitlines():
        line = line.strip()
        if "=" not in line or line.startswith(("HloModule", "ENTRY", "//")):
            continue
        rhs = line.split("=", 1)[1].strip()
        # 'f32[16,4096,256]{...} fusion(...)' -> opkind 'fusion'
        parts = rhs.split(" ")
        if len(parts) < 2:
            continue
        op = parts[1].split("(")[0]
        if op.startswith("fusion"):
            kind = "fusion.loop"
            if "kind=kInput" in line:
                kind = "fusion.input"
            elif "kind=kOutput" in line:
                kind = "fusion.output"
            elif "kind=kCustom" in line:
                kind = "fusion.custom"
            census[kind] += 1
        else:
            census[op] += 1
    return census


def analyze(M: int) -> dict:
    from st_dadk_tpu.train.loop import jitted_fit_chunk
    cfg = ExperimentConfig.from_dict({**bench_workload(tag="lane_scaling"),
                                      "base_seed": 2025})
    spec, args = build_abstract_args(cfg, M)
    fit = jitted_fit_chunk(spec, vmapped=True, lr_per_lane=True)
    lowered = fit.lower(*args)
    compiled = lowered.compile()
    cost = compiled.cost_analysis() or {}
    mem = compiled.memory_analysis()
    hlo = compiled.as_text()
    census = fusion_census(hlo)
    row = {
        "M": M,
        "flops": float(cost.get("flops", float("nan"))),
        "bytes_accessed": float(cost.get("bytes accessed", float("nan"))),
        "bytes_out": float(cost.get("bytes accessed output", float("nan"))),
        "argument_bytes": getattr(mem, "argument_size_in_bytes", None),
        "output_bytes": getattr(mem, "output_size_in_bytes", None),
        "temp_bytes": getattr(mem, "temp_size_in_bytes", None),
        "alias_bytes": getattr(mem, "alias_size_in_bytes", None),
        "code_bytes": getattr(mem, "generated_code_size_in_bytes", None),
        "census": dict(census.most_common()),
        "hlo_lines": len(hlo.splitlines()),
    }
    # keep per-M HLO for manual diffing of strategy flips
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / f"hlo_M{M}.txt").write_text(hlo)
    return row


def main():
    rows = [analyze(M) for M in MS]
    OUT.mkdir(parents=True, exist_ok=True)
    (OUT / "report.json").write_text(json.dumps(rows, indent=2))

    def fmt(x):
        if x is None or (isinstance(x, float) and not np.isfinite(x)):
            return "-"
        for u in ["B", "KB", "MB", "GB", "TB"]:
            if abs(x) < 1024:
                return f"{x:.2f}{u}"
            x /= 1024
        return f"{x:.2f}PB"

    print("\n| M | flops | bytes | temp HBM | args HBM | ratio vs prev "
          "(flops/bytes/temp) |")
    print("|---|---|---|---|---|---|")
    prev = None
    for r in rows:
        rat = ""
        if prev is not None:
            def rr(k):
                a, b = r.get(k), prev.get(k)
                return (f"{a / b:.2f}" if a and b else "-")
            rat = f"{rr('flops')} / {rr('bytes_accessed')} / {rr('temp_bytes')}"
        print(f"| {r['M']} | {fmt(r['flops'])} | {fmt(r['bytes_accessed'])} | "
              f"{fmt(r['temp_bytes'])} | {fmt(r['argument_bytes'])} | {rat} |")
        prev = r

    print("\nFusion census diffs vs M=16:")
    base = next((r for r in rows if r["M"] == 16), rows[0])
    for r in rows:
        if r is base:
            continue
        diff = {}
        keys = set(base["census"]) | set(r["census"])
        for kk in sorted(keys):
            a, b = base["census"].get(kk, 0), r["census"].get(kk, 0)
            if a != b:
                diff[kk] = f"{a}->{b}"
        print(f"  M={r['M']}: {diff if diff else 'identical op census'}")


if __name__ == "__main__":
    main()
