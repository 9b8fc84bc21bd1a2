#!/usr/bin/env python
"""Grid-search analysis (parity with the reference
scripts/analyze_grid_search.py): regenerate per-config summaries from
results.json, rebuild grid CSVs, auto-detect which parameters vary, render
per-data-file boxplot grids and a detailed_summary.csv, and print best-method
insights."""
import argparse
import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import yaml

from st_dadk_tpu.sweep.grid import save_experiment_results
from st_dadk_tpu.train.runner import aggregate_results, load_all_results

CANDIDATE_PARAMS = ["data_file", "spatial_basis_function",
                    "spatial_init_method", "spatial_learnable",
                    "obs_method", "obs_ratio", "obs_spatial_pattern"]
ABBREV = {"spatial_init_method": {"uniform": "uni", "gmm": "gmm",
                                  "random_site": "rnd",
                                  "kmeans_balanced": "kmb", "kmeans_exact": "kme"},
          "spatial_basis_function": {"wendland": "wend", "gaussian": "gaus",
                                     "triangular": "tria"}}


def regenerate_config_summaries(results_dir: Path):
    """Walk every config dir, recompute summaries from results.json
    (ref analyze_grid_search.py:162-361)."""
    all_results = []
    for cfg_file in sorted(results_dir.glob("**/config.yaml")):
        cdir = cfg_file.parent
        with open(cfg_file) as f:
            config = yaml.safe_load(f)
        results = load_all_results(cdir / "experiments",
                                   config.get("n_experiments", 10))
        summary = aggregate_results(results, cdir / "summary") if results else None
        if "config_id" not in config:
            config["config_id"] = len(all_results) + 1
        all_results.append({"config": config, "summary": summary,
                            "status": "success" if summary else "empty"})
    return all_results


def identify_varying_parameters(configs):
    varying = []
    for p in CANDIDATE_PARAMS:
        vals = {str(c.get(p)) for c in configs}
        if len(vals) > 1:
            varying.append(p)
    return varying


def create_method_label(config, varying):
    parts = []
    for p in varying:
        if p == "data_file":
            continue
        v = config.get(p)
        if p in ABBREV:
            parts.append(ABBREV[p].get(v, str(v)))
        elif p == "spatial_learnable":
            parts.append("lrn" if v else "fix")
        else:
            parts.append(str(v))
    return "_".join(parts) or config.get("tag", "config")


def plot_boxplots(df_detail, results_dir: Path, metric="test_rmse"):
    """Per-data-file boxplots of the chosen metric by method label."""
    if metric not in df_detail.columns:
        return
    data_files = sorted(df_detail["data_file"].dropna().unique()) \
        if "data_file" in df_detail.columns else ["all"]
    n = len(data_files)
    fig, axes = plt.subplots(1, n, figsize=(max(6, 4 * n), 5), squeeze=False)
    for ax, dfile in zip(axes[0], data_files):
        sub = (df_detail[df_detail["data_file"] == dfile]
               if "data_file" in df_detail.columns else df_detail)
        groups = sub.groupby("method_label")[metric]
        labels, vals = [], []
        for name, g in groups:
            labels.append(name)
            vals.append(g.dropna().values)
        if not vals:
            continue
        ax.boxplot(vals, labels=labels)
        ax.set_title(Path(str(dfile)).stem)
        ax.set_ylabel(metric)
        ax.tick_params(axis="x", rotation=45)
        ax.grid(alpha=0.3)
    fig.suptitle(f"{metric} by method")
    fig.tight_layout()
    fig.savefig(results_dir / f"boxplot_{metric}.png", dpi=110)
    plt.close(fig)


def plot_matrix_boxplots(df_detail, results_dir: Path, metric="test_rmse"):
    """Reference layout (analyze_grid_search.py:590-693): one figure per data
    file; subplot rows = obs spatial patterns, columns = (obs_method, ratio)
    combinations, boxes = method labels with stable colors."""
    if metric not in df_detail.columns or df_detail[metric].isna().all():
        return
    methods = sorted(df_detail["method_label"].dropna().unique())
    palette = plt.cm.Set2(np.linspace(0, 1, max(len(methods), 3)))
    method_colors = {m: palette[i % len(palette)] for i, m in enumerate(methods)}

    for dfile in sorted(df_detail["data_file"].dropna().unique()):
        dff = df_detail[df_detail["data_file"] == dfile]
        patterns = sorted(dff["obs_spatial_pattern"].dropna().unique())
        ratios = sorted(dff["obs_ratio"].dropna().unique())
        obs_methods = sorted(dff["obs_method"].dropna().unique())
        if not patterns or not ratios or not obs_methods:
            continue
        col_cfgs = [(m, r) for m in obs_methods for r in ratios]
        n_rows, n_cols = len(patterns), len(col_cfgs)
        fig, axes = plt.subplots(n_rows, n_cols,
                                 figsize=(6 * n_cols, 5 * n_rows),
                                 squeeze=False)
        fig.suptitle(f"Performance Comparison: {dfile}",
                     fontsize=16, fontweight="bold", y=0.995)
        for ri, pattern in enumerate(patterns):
            for ci, (om, orat) in enumerate(col_cfgs):
                ax = axes[ri, ci]
                sub = dff[(dff["obs_spatial_pattern"] == pattern)
                          & (dff["obs_method"] == om)
                          & (dff["obs_ratio"] == orat)]
                title = f"{str(pattern).capitalize()} | {om}, r={orat}"
                data, labels, colors = [], [], []
                for m in methods:
                    vals = sub[sub["method_label"] == m][metric].dropna().values
                    if len(vals):
                        data.append(vals)
                        labels.append(m)
                        colors.append(method_colors[m])
                if not data:
                    ax.text(0.5, 0.5, "No data", ha="center", va="center",
                            transform=ax.transAxes, fontsize=14)
                    ax.set_title(title, fontsize=11, fontweight="bold")
                    continue
                positions = np.arange(len(data))
                bp = ax.boxplot(data, positions=positions, widths=0.6,
                                patch_artist=True,
                                medianprops=dict(color="black", linewidth=2),
                                whiskerprops=dict(linewidth=1.5),
                                capprops=dict(linewidth=1.5),
                                flierprops=dict(marker="o", markersize=5,
                                                alpha=0.5))
                for patch, color in zip(bp["boxes"], colors):
                    patch.set_facecolor(color)
                    patch.set_alpha(0.7)
                ax.set_xticks(positions)
                ax.set_xticklabels(labels, rotation=45, ha="right", fontsize=10)
                ax.set_ylabel(metric, fontsize=10, fontweight="bold")
                ax.set_title(title, fontsize=11, fontweight="bold")
                ax.grid(True, alpha=0.3, axis="y", linestyle="--")
                ax.margins(x=0.1)
        fig.tight_layout()
        fname = str(dfile).replace("/", "_").replace(".csv", "") \
            + f"_{metric}.png"
        fig.savefig(results_dir / fname, dpi=150, bbox_inches="tight")
        plt.close(fig)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("results_dir", type=str, nargs="?", default=None)
    args = parser.parse_args()

    if args.results_dir is None:
        cands = sorted(glob.glob("results/*grid_search*"))
        if not cands:
            sys.exit("no grid_search results directory found")
        args.results_dir = cands[-1]
    results_dir = Path(args.results_dir)

    print(f"[1/3] regenerating per-config summaries in {results_dir}")
    all_results = regenerate_config_summaries(results_dir)
    ok = [r for r in all_results if r["summary"] is not None]
    if not ok:
        sys.exit("no completed configs found")

    print("[2/3] regenerating grid-level CSVs")
    save_experiment_results(all_results, results_dir)
    df_detail = pd.read_csv(results_dir / "grid_search_detail.csv")

    print("[3/3] plots + insights")
    configs = [r["config"] for r in ok]
    varying = identify_varying_parameters(configs)
    id_to_config = {c["config_id"]: c for c in configs}
    df_detail["method_label"] = df_detail["config_id"].map(
        lambda cid: create_method_label(id_to_config.get(cid, {}), varying))
    for col in ("data_file", "obs_spatial_pattern", "obs_method", "obs_ratio"):
        if col not in df_detail.columns:
            df_detail[col] = df_detail["config_id"].map(
                lambda cid: id_to_config.get(cid, {}).get(col))

    for metric in ("test_rmse", "test_crps", "test_check_loss"):
        plot_boxplots(df_detail, results_dir, metric)
        plot_matrix_boxplots(df_detail, results_dir, metric)

    # "aggregate over one param" variants (ref analyze_grid_search.py:700-792):
    # for each varying parameter, pool over everything else
    for p in varying:
        if p == "data_file" or p not in df_detail.columns:
            continue
        for metric in ("test_rmse", "test_crps"):
            if metric not in df_detail.columns or df_detail[metric].isna().all():
                continue
            fig, ax = plt.subplots(figsize=(6, 4.5))
            groups = df_detail.groupby(p)[metric]
            labels = [str(name) for name, _ in groups]
            ax.boxplot([g.dropna().values for _, g in groups], labels=labels)
            ax.set_title(f"{metric} aggregated by {p}")
            ax.grid(alpha=0.3)
            fig.tight_layout()
            fig.savefig(results_dir / f"boxplot_{metric}_by_{p}.png", dpi=110)
            plt.close(fig)

    # detailed summary + insights
    metrics_present = [m for m in ("test_rmse", "test_crps") if
                       m in df_detail.columns and df_detail[m].notna().any()]
    rows = []
    for (label, dfile), g in df_detail.groupby(["method_label", "data_file"]):
        row = {"method": label, "data_file": dfile}
        for m in metrics_present:
            row[f"{m}_mean"] = g[m].mean()
            row[f"{m}_std"] = g[m].std()
        rows.append(row)
    detailed = pd.DataFrame(rows)
    detailed.to_csv(results_dir / "detailed_summary.csv", index=False)

    for m in metrics_present:
        best = detailed.loc[detailed[f"{m}_mean"].idxmin()]
        print(f"  best {m}: {best['method']} on {best['data_file']} "
              f"({best[f'{m}_mean']:.4f})")
    print(f"analysis artifacts -> {results_dir}")


if __name__ == "__main__":
    main()
