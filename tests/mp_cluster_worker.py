"""Worker process for the REAL 2-process jax.distributed cluster test.

Launched by tests/test_multiprocess_cluster.py as
    python tests/mp_cluster_worker.py <pid> <nprocs> <port> <csv> <out_dir>

Each process brings 4 virtual CPU devices (8 global), joins the cluster,
and runs the SAME run_multiple_experiments call — the engine shards the
lane axis over the global mesh, each process writes only its own lanes'
artifacts (batch_engine._owned_lane_slice), and the primary aggregates.
"""
import os
import sys

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
csv_path, out_dir = sys.argv[4], sys.argv[5]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=4 "
                           "--xla_cpu_enable_fast_math=false")
os.environ["JAX_ENABLE_X64"] = "0"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nprocs, process_id=pid)
assert jax.process_count() == nprocs
assert len(jax.devices()) == 4 * nprocs

from st_dadk_tpu.config import ExperimentConfig  # noqa: E402
from st_dadk_tpu.train.runner import run_multiple_experiments  # noqa: E402

cfg = ExperimentConfig.from_dict(dict(
    tag="mpcluster", data_file=csv_path,
    k_spatial_centers=[9], k_temporal_centers=[4],
    hidden_dims=[16, 8], dropout=0.0, epochs=6, lr=5e-3,
    batch_size=64, patience=50, warmup_epochs=1, scheduler="cosine",
    grad_clip=10.0, regression_type="mean",
    obs_method="site-wise", obs_ratio=0.5, obs_spatial_pattern="uniform",
    split_method="random", train_ratio=0.8,
    n_experiments=6, base_seed=700, use_pallas=False,
    save_plots=False, save_artifacts=True,
))

summary = run_multiple_experiments(cfg, out_dir, engine="vmap")
if pid == 0:
    assert summary is not None and summary["n_experiments"] == 6, summary
else:
    assert summary is None, "non-primary must not aggregate"
print(f"[p{pid}] OK", flush=True)
