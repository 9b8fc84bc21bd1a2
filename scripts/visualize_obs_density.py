#!/usr/bin/env python
"""Visualize observation densities for the four Table-4.4 scenarios
(role parity with the reference scripts/visualize_obs_density.py — but reusing
the framework's obs-design functions instead of duplicating them)."""
import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from st_dadk_tpu.config import ExperimentConfig
from st_dadk_tpu.dataio.kaust import load_kaust_csv_single
from st_dadk_tpu.dataio.obs_design import sample_observations, spatial_obs_probs

SCENARIOS = [
    ("Fixed / Uniform", "site-wise", "uniform"),
    ("Fixed / Clustered", "site-wise", "corner"),
    ("Random / Uniform", "random", "uniform"),
    ("Random / Clustered", "random", "corner"),
]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_file", type=str, default="data/2a/2a_8.csv")
    parser.add_argument("--obs_ratio", type=float, default=0.1)
    parser.add_argument("--intensity", type=float, default=10.0)
    parser.add_argument("--seed", type=int, default=2025)
    parser.add_argument("--out", type=str, default="obs_density.png")
    args = parser.parse_args()

    cfg = ExperimentConfig(data_file=args.data_file)
    z, coords, _ = load_kaust_csv_single(cfg.resolve_data_file(),
                                         normalize=False, verbose=False)

    fig, axes = plt.subplots(1, 4, figsize=(22, 5))
    for ax, (title, method, pattern) in zip(axes, SCENARIOS):
        w = spatial_obs_probs(coords, pattern, args.intensity)
        mask, _ = sample_observations(z, coords, method, args.obs_ratio, w,
                                      seed=args.seed)
        counts = mask.sum(axis=0)
        sc = ax.scatter(coords[:, 0], coords[:, 1], c=counts, s=8,
                        cmap="viridis")
        ax.set_title(f"{title}\n({mask.mean()*100:.1f}% observed)")
        ax.set_aspect("equal")
        plt.colorbar(sc, ax=ax, shrink=0.8)
    fig.suptitle("Observation density by scenario")
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"saved -> {args.out}")


if __name__ == "__main__":
    main()
