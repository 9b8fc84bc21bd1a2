#!/usr/bin/env python
"""Analyze Table 4.4 results: scenario x model -> mean +/- std test CRPS
(parity with the reference scripts/analyze_table_4_4.py:14-152)."""
import argparse
import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import pandas as pd


def load_table_4_4_results(results_dir: Path):
    """Load from table_4_4_summary.json, or walk experiment dirs."""
    summary_file = results_dir / "table_4_4_summary.json"
    if summary_file.exists():
        with open(summary_file) as f:
            return json.load(f)

    summaries = {}
    for cdir in sorted(results_dir.glob("table4.4_*")):
        parts = cdir.name.split("_")          # table4.4, Scenario, Name, Model
        model = parts[-1]
        scenario = "_".join(parts[1:-1])
        crps = []
        for rf in glob.glob(str(cdir / "experiments" / "*" / "results.json")):
            with open(rf) as f:
                r = json.load(f)
            if "test_crps" in r:
                crps.append(r["test_crps"])
        if crps:
            summaries[f"{scenario}/{model}"] = {
                "scenario": scenario, "model": model, "n": len(crps),
                "test_crps_mean": float(np.mean(crps)),
                "test_crps_std": float(np.std(crps)),
            }
    return summaries


def create_table_4_4(summaries):
    proto = summaries.get("_protocol", {})
    if proto.get("quarantined"):
        print("[WARNING] this run used the quarantined eq310 mode "
              "(reference sign-convention bug reproduction); CRPS values "
              "are noise, not model quality")
    rows = {}
    for entry in summaries.values():
        if not isinstance(entry, dict) or "scenario" not in entry:
            continue
        key = entry["scenario"]
        rows.setdefault(key, {})[entry["model"]] = (
            f"{entry['test_crps_mean']:.4f} ± {entry['test_crps_std']:.4f}"
            if entry["test_crps_mean"] is not None else "-")
    return pd.DataFrame(rows).T


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("results_dir", type=str, nargs="?", default=None)
    args = parser.parse_args()

    if args.results_dir is None:
        cands = sorted(glob.glob("results/*table_4_4*"))
        if not cands:
            sys.exit("no table_4_4 results directory found")
        args.results_dir = cands[-1]

    results_dir = Path(args.results_dir)
    summaries = load_table_4_4_results(results_dir)
    if not summaries:
        sys.exit(f"no results under {results_dir}")

    table = create_table_4_4(summaries)
    print("\nTable 4.4 — test CRPS (mean ± std)\n")
    print(table.to_string())
    out = results_dir / "table_4_4_rendered.csv"
    table.to_csv(out)
    print(f"\nsaved -> {out}")


if __name__ == "__main__":
    main()
