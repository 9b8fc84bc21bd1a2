#!/usr/bin/env python
"""Visualize a spatio-temporal dataset: spatial map at a chosen time plus
per-location time series (role parity with the reference
scripts/visualize_2b_data.py; works for any x,y,t,z CSV and degrades to a
spatial-only map for x,y,z files)."""
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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_file", type=str, default="data/2a/2a_8.csv")
    parser.add_argument("--t", type=int, default=50, help="1-based time slice")
    parser.add_argument("--n_series", type=int, default=5)
    parser.add_argument("--out", type=str, default=None)
    args = parser.parse_args()

    cfg = ExperimentConfig(data_file=args.data_file)
    z, coords, _ = load_kaust_csv_single(cfg.resolve_data_file(),
                                         normalize=False, verbose=True)
    T, S = z.shape
    t_idx = min(max(args.t - 1, 0), T - 1)

    fig = plt.figure(figsize=(14, 6))
    ax1 = fig.add_subplot(1, 2, 1)
    sc = ax1.scatter(coords[:, 0], coords[:, 1], c=z[t_idx], s=8,
                     cmap="RdBu_r")
    ax1.set_title(f"{Path(args.data_file).stem} at t={t_idx+1}")
    ax1.set_aspect("equal")
    plt.colorbar(sc, ax=ax1, shrink=0.8)

    ax2 = fig.add_subplot(1, 2, 2)
    if T > 1:
        rng = np.random.default_rng(0)
        sites = rng.choice(S, size=min(args.n_series, S), replace=False)
        for s in sites:
            ax2.plot(np.arange(1, T + 1), z[:, s], lw=1,
                     label=f"({coords[s,0]:.2f},{coords[s,1]:.2f})")
        ax2.set_xlabel("t")
        ax2.set_ylabel("z")
        ax2.legend(fontsize=8)
        ax2.set_title("sample site time series")
    else:
        ax2.hist(z[0][np.isfinite(z[0])], bins=60)
        ax2.set_title("value distribution (spatial-only file)")

    out = args.out or f"{Path(args.data_file).stem}_viz.png"
    fig.tight_layout()
    fig.savefig(out, dpi=110)
    print(f"saved -> {out}")


if __name__ == "__main__":
    main()
