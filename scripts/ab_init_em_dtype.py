#!/usr/bin/env python
"""A/B: f32 vs bf16 EM storage in the GMM init, end metric.

`init_em_dtype: bfloat16` halves the HBM traffic of the init EM loop (the
(n, k) distance/responsibility tensors; ops/init_centers.py). The math
guarantees the perturbation is ~0.4% relative on stored distances — this
script MEASURES the end-to-end effect on the bench workload (2a_8 DA-STDK
multi-quantile): the same seeds fit under both dtypes, so per-seed CRPS
deltas are PAIRED (same masks, same subsample, same training stream —
only the init EM arithmetic differs).

Usage:
    python scripts/ab_init_em_dtype.py --n_experiments 16 \
        --out results/ab_em_dtype_r3
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os  # noqa: E402
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
from st_dadk_tpu.utils.platform import apply_platform_env  # noqa: E402
apply_platform_env()

import numpy as np  # noqa: E402

from st_dadk_tpu.config import ExperimentConfig  # noqa: E402
from st_dadk_tpu.train.runner import (load_all_results,  # noqa: E402
                                      run_multiple_experiments)
from st_dadk_tpu.utils.io import save_json  # noqa: E402

BASE = dict(
    tag="ab_em_dtype", data_file="data/2a/2a_8.csv",
    k_spatial_centers=[25, 81, 121], k_temporal_centers=[10, 15, 45],
    spatial_basis_function="wendland", spatial_init_method="gmm",
    spatial_learnable=True, gradient_damping=True, damping_threshold=0.0,
    damping_strength=5.0, domain_penalty_weight=0.01,
    sparsity_penalty_type="sparse_group", sparsity_lambda_l1=0.0,
    sparsity_lambda_group=0.0, sparsity_apply_to_temporal=False,
    hidden_dims=[256, 256, 128], dropout=0.1, layernorm=True,
    obs_method="site-wise", obs_ratio=0.1, obs_spatial_pattern="corner",
    obs_spatial_intensity=10.0, split_method="random", train_ratio=0.8,
    epochs=500, lr=2e-2, basis_lr_ratio=0.05, weight_decay=5e-4,
    batch_size=4096, patience=50, grad_clip=10.0, scheduler="cosine",
    warmup_epochs=10, basis_unfreeze_epoch=10, basis_lr_rampup_epochs=10,
    regression_type="multi-quantile",
    quantile_levels=[0.05, 0.25, 0.5, 0.75, 0.95],
    base_seed=2025, save_plots=False, save_artifacts=True,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_experiments", type=int, default=16)
    ap.add_argument("--data_file", default=None)
    ap.add_argument("--out", default=str(REPO / "results" / "ab_em_dtype_r3"))
    ap.add_argument("--arms", nargs="+", default=["float32", "bfloat16"])
    args = ap.parse_args()

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)

    table = {}
    per_seed = {}
    for arm in ("float32", "bfloat16"):
        d = dict(BASE, n_experiments=args.n_experiments)
        if args.data_file:
            d["data_file"] = args.data_file
        if arm == "bfloat16":
            d["init_em_dtype"] = "bfloat16"
        cdir = out / arm
        cdir.mkdir(parents=True, exist_ok=True)
        t0 = time.time()
        if arm in args.arms:
            print(f"\n=== init_em_dtype={arm} ({args.n_experiments} seeds) "
                  f"===", flush=True)
            run_multiple_experiments(ExperimentConfig.from_dict(d), cdir,
                                     engine="vmap")
        results = load_all_results(cdir / "experiments", args.n_experiments)
        crps = {r["experiment_id"]: r["test_crps"] for r in results
                if "test_crps" in r}
        rmse = {r["experiment_id"]: r["test_rmse"] for r in results
                if "test_rmse" in r}
        if not crps:
            continue
        per_seed[arm] = {"crps": crps, "rmse": rmse}
        table[arm] = {
            "n": len(crps),
            "test_crps_mean": float(np.mean(list(crps.values()))),
            "test_crps_std": float(np.std(list(crps.values()))),
            "test_rmse_mean": float(np.mean(list(rmse.values()))),
            "wall_seconds": (round(time.time() - t0, 1)
                             if arm in args.arms else None),
        }
        e = table[arm]
        print(f"  {arm}: CRPS {e['test_crps_mean']:.4f} ± "
              f"{e['test_crps_std']:.4f}  RMSE {e['test_rmse_mean']:.4f}",
              flush=True)

    if "float32" in per_seed and "bfloat16" in per_seed:
        common = sorted(set(per_seed["float32"]["crps"])
                        & set(per_seed["bfloat16"]["crps"]))
        deltas = np.array([per_seed["bfloat16"]["crps"][i]
                           - per_seed["float32"]["crps"][i] for i in common])
        table["paired"] = {
            "n_pairs": len(common),
            "crps_delta_mean": float(deltas.mean()),
            "crps_delta_std": float(deltas.std()),
            "crps_delta_sigma": float(abs(deltas.mean())
                                      / max(deltas.std()
                                            / np.sqrt(len(deltas)), 1e-12)),
        }
        p = table["paired"]
        print(f"\npaired bf16-f32 CRPS delta = {p['crps_delta_mean']:+.5f} "
              f"± {p['crps_delta_std']:.5f} over {p['n_pairs']} seeds "
              f"({p['crps_delta_sigma']:.2f} sigma of the mean)")

    save_json(table, out / "ab_summary.json")
    print(f"[OK] wrote {out / 'ab_summary.json'}")


if __name__ == "__main__":
    main()
