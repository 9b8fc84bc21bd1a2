#!/usr/bin/env python
"""Multi-experiment training CLI.

Same interface as the reference trainer (scripts/train_st_interp.py:3029-3212):

    python scripts/train_st_interp.py --config configs/config_st_interp.yaml \
        [--data_file F] [--n_experiments N] [--base_seed S] \
        [--start_exp_id A] [--end_exp_id B] [--skip-existing] [--engine vmap]

Output tree: results/<YYYYMMDD>/<HHMMSS>_<tag>/{config.yaml, experiments/<i>/,
summary/}. `--parallel`/`--n_jobs` are accepted for compatibility; on TPU the
parallel engine is `--engine vmap` (a vmapped, mesh-sharded experiment batch)
instead of joblib processes.
"""
import argparse
import sys
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from st_dadk_tpu.utils.platform import apply_platform_env  # noqa: E402
apply_platform_env()

from st_dadk_tpu.config import load_config
from st_dadk_tpu.train.runner import run_multiple_experiments


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str,
                        default="configs/config_st_interp.yaml")
    parser.add_argument("--data_file", type=str, default=None)
    parser.add_argument("--n_experiments", type=int, default=None)
    parser.add_argument("--base_seed", type=int, default=None)
    parser.add_argument("--parallel", action="store_true",
                        help="compat flag; maps to --engine vmap")
    parser.add_argument("--n_jobs", type=int, default=-1,
                        help="compat flag (ignored on TPU)")
    parser.add_argument("--engine", type=str, default=None,
                        choices=["sequential", "vmap", "dp"],
                        help="experiment dispatch engine: sequential fits, "
                             "one vmapped batch of all repeats, or per-fit "
                             "data parallelism over all devices")
    parser.add_argument("--start_exp_id", type=int, default=None)
    parser.add_argument("--end_exp_id", type=int, default=None)
    parser.add_argument("--skip-existing", action="store_true")
    parser.add_argument("--output_dir", type=str, default=None)
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    # one process per host on a pod; no-op on a single machine
    from st_dadk_tpu.parallel.multihost import maybe_initialize_distributed
    maybe_initialize_distributed()

    cfg = load_config(args.config, {
        "data_file": args.data_file,
        "n_experiments": args.n_experiments,
        "base_seed": args.base_seed,
    })

    engine = args.engine or ("vmap" if args.parallel else "sequential")

    from st_dadk_tpu.parallel.multihost import shared_timestamp
    now = shared_timestamp()   # pod-safe: identical stamp on every process
    if args.output_dir:
        base_output_dir = Path(args.output_dir)
    else:
        base_output_dir = (Path("results") / now.strftime("%Y%m%d")
                           / f"{now.strftime('%H%M%S')}_{cfg.tag}")
    base_output_dir.mkdir(parents=True, exist_ok=True)
    cfg.to_yaml(base_output_dir / "config.yaml")

    print("=" * 70)
    print("MULTIPLE EXPERIMENT RUNNER (TPU)")
    print(f"tag={cfg.tag}  n_experiments={cfg.n_experiments}  "
          f"base_seed={cfg.base_seed}  engine={engine}")
    print(f"output: {base_output_dir}")
    print("=" * 70)

    summary = run_multiple_experiments(
        cfg, base_output_dir,
        start_exp_id=args.start_exp_id, end_exp_id=args.end_exp_id,
        skip_existing=args.skip_existing, verbose=args.verbose,
        engine=engine)

    if summary:
        print("\nSUMMARY (test):")
        for m in ("test_rmse", "test_mae", "test_crps", "total_time_seconds"):
            st = summary["statistics"].get(m)
            if st:
                print(f"  {m:<20} mean={st['mean']:.6f} std={st['std']:.6f}")
    return summary


if __name__ == "__main__":
    main()
