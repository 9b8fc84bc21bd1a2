"""Vmapped, mesh-sharded experiment batches — the joblib replacement.

The reference parallelizes experiment repeats with a process pool
(train_st_interp.py:2945-2991) and grid-search configs with an outer pool
(run_grid_search.py:331-387). Here the M repeats of one config become a
leading batch axis: per-experiment params/consts/data are stacked, the whole
epoch scan is `jax.vmap`-ed, and the stacked inputs are placed with a
`NamedSharding` over the 'exp' axis of a `jax.sharding.Mesh` — XLA SPMD then
splits the lanes across devices with zero steady-state collectives
(experiments are embarrassingly parallel; see SURVEY.md section 2.4).

Per-lane semantics are preserved exactly: each lane keeps its own seed-derived
masks, its own real batch count (surplus steps are masked), its own EMA decay,
early stopping, and best-checkpoint tracking.
"""
from __future__ import annotations

import time
from pathlib import Path
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from st_dadk_tpu.config import ExperimentConfig
from st_dadk_tpu.train.experiment import ExperimentSetup, finalize_experiment
from st_dadk_tpu.train.loop import (
    FitResult,
    LoopSpec,
    adaptive_batch_size,
    assemble_result,
    jitted_fit_chunk,
    prepare_carry_batch,
    prepare_train_data,
)
from st_dadk_tpu.train.optimizer import build_lr_tables


def _lane(tree: Any, i: int):
    return jax.tree_util.tree_map(lambda x: np.asarray(x[i]), tree)


def _batched_eval(cfg, spec_model, carry_host, consts_b, setups, M):
    """Per-lane split metrics + dense (T, S) field from vmapped predicts.

    Selects each lane's serving params (best-EMA when a best exists, final
    EMA otherwise — matching assemble_result) on host, then runs one
    (M_group, T*S, Q) inference per distinct dataset (lanes of a stacked
    config batch may span data files; every group reuses the same compiled
    program since shapes match)."""
    from st_dadk_tpu.dataio.arrays import dense_grid_points
    from st_dadk_tpu.train.experiment import metrics_from_preds
    from st_dadk_tpu.train.loop import predict_lanes

    has_best = np.asarray(carry_host["has_best"])[:M]

    def select(best, ema):
        sel = has_best.reshape((M,) + (1,) * (best.ndim - 1))
        return np.where(sel, best[:M], ema[:M])

    params_sel = jax.tree_util.tree_map(select, carry_host["best_ema"],
                                        carry_host["ema"])
    consts_host = jax.tree_util.tree_map(lambda x: np.asarray(x[:M]), consts_b)

    groups: Dict[Any, List[int]] = {}
    for li, s in enumerate(setups):
        groups.setdefault(getattr(s, "cfg", cfg).data_file, []).append(li)

    Q = (len(cfg.quantile_levels)
         if cfg.regression_type == "multi-quantile" else 1)
    median_idx = (len(cfg.quantile_levels) // 2
                  if cfg.regression_type == "multi-quantile" else 0)

    out: List[Optional[Dict[str, Any]]] = [None] * len(setups)
    for lanes in groups.values():
        s0 = setups[lanes[0]]
        T = s0.T
        coords_rep, t_rep = dense_grid_points(T, s0.coords)
        take = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.asarray(x[np.asarray(lanes)]), t)
        preds = predict_lanes(spec_model, take(params_sel),
                              take(consts_host), coords_rep, t_rep)
        for gi, li in enumerate(lanes):
            s = setups[li]
            field = preds[gi].reshape(T, s.S, -1)
            lane = {"all_predictions": field[:, :, median_idx]}
            for split, mask in (("train_metrics", s.train_mask),
                                ("val_metrics", s.valid_mask),
                                ("test_metrics", s.test_mask)):
                m = mask & np.isfinite(s.z_full)
                lane[split] = metrics_from_preds(
                    cfg, field[m], s.z_full[m][:, None])
            out[li] = lane
    return out


def experiment_mesh(axis: str = "exp") -> Mesh:
    devices = np.array(jax.devices())
    return Mesh(devices, (axis,))


def run_experiment_batch(
    cfg: ExperimentConfig,
    exp_ids: List[int],
    experiments_dir: Path,
    skip_existing: bool = False,
    verbose: bool = False,
    epochs_chunk: int = 100,
    mesh: Optional[Mesh] = None,
) -> List[Dict[str, Any]]:
    """Run all `exp_ids` of one config as a single vmapped program."""
    experiments_dir = Path(experiments_dir)
    jobs = [(cfg, i, experiments_dir / str(i)) for i in exp_ids]
    return run_job_batch(jobs, skip_existing=skip_existing, verbose=verbose,
                         epochs_chunk=epochs_chunk, mesh=mesh)


_STACKABLE_KEYS = frozenset({
    "data_file", "obs_method", "obs_ratio", "obs_spatial_pattern",
    "obs_spatial_intensity", "split_method", "train_ratio",
    "normalize_target", "tag", "config_id", "base_seed", "n_experiments",
    "extra", "data_root", "save_plots", "save_artifacts", "n_jobs",
    "num_workers", "device",
})


def stacking_key(cfg: ExperimentConfig):
    """Configs whose non-observation fields match compile to the SAME lane
    program and may share one vmapped batch (see run_job_batch)."""
    import dataclasses
    d = dataclasses.asdict(cfg)
    return tuple(sorted(
        (k, tuple(v) if isinstance(v, list) else v)
        for k, v in d.items() if k not in _STACKABLE_KEYS))


def run_job_batch(
    jobs: List,
    skip_existing: bool = False,
    verbose: bool = False,
    epochs_chunk: int = 100,
    mesh: Optional[Mesh] = None,
) -> List[Dict[str, Any]]:
    """Run heterogeneous (cfg, experiment_id, output_dir) jobs as ONE vmapped
    program. All cfgs must share a `stacking_key` (identical model/loop
    hyperparameters); data files and observation designs may differ per lane
    as long as dataset shapes match. This is config-level stacking: a grid
    search's same-shaped configs multiply the lane axis instead of running
    serially (SURVEY.md section 2.4 row 2)."""
    t_start = time.time()

    todo = []
    for cfg_i, exp_id, out_dir in jobs:
        if skip_existing and (Path(out_dir) / "results.json").exists():
            continue
        todo.append((cfg_i, exp_id, Path(out_dir)))
    if not todo:
        return []

    cfg = todo[0][0]
    keys0 = {stacking_key(c) for c, _, _ in todo}
    if len(keys0) != 1:
        raise ValueError("run_job_batch: configs are not stackable "
                         "(differing model/loop hyperparameters)")

    # -- per-lane setup on host (seed-exact masks) + batched model init ------
    t_phase = time.time()
    setups = []
    for cfg_i, exp_id, out_dir in todo:
        s = ExperimentSetup(cfg_i, exp_id, verbose=False, defer_model=True)
        s.cfg = cfg_i
        s.out_dir = out_dir
        setups.append(s)
    shapes = {(s.T, s.S) for s in setups}
    if len(shapes) != 1:
        raise ValueError(f"run_job_batch: dataset shapes differ: {shapes}")
    keys = jnp.stack([jax.random.PRNGKey(s.experiment_seed) for s in setups])
    needs_coords = cfg.spatial_init_method in ("gmm", "random_site",
                                               "kmeans_balanced")
    coords_list = [s.train_ps.coords if needs_coords else None
                   for s in setups]
    from st_dadk_tpu.ops.init_centers import init_spatial_centers_batch
    inits = init_spatial_centers_batch(cfg.spatial_init_method,
                                       cfg.k_spatial_centers,
                                       coords_list, keys)
    centers_b = jnp.asarray(np.stack([c for c, _ in inits]))
    bw_b = jnp.asarray(np.stack([b for _, b in inits]))
    t_setup = time.time() - t_phase
    spec_model = setups[0].spec

    batch_size = adaptive_batch_size(
        min(s.train_ps.n_real for s in setups), cfg.batch_size)
    B_shared = max(-(-s.train_ps.n_real // batch_size) for s in setups)
    cap_tr = B_shared * batch_size
    max_val = max(max(1, s.valid_ps.n_real) for s in setups)
    val_chunk = min(max(batch_size * 16, 32768), max_val)
    n_val_chunks = max(1, -(-max_val // val_chunk))
    cap_va = n_val_chunks * val_chunk

    datas = []
    for s in setups:
        data, _, _ = prepare_train_data(s.train_ps, s.valid_ps, batch_size,
                                        val_chunk=val_chunk, cap_tr=cap_tr,
                                        cap_va=cap_va)
        datas.append(data)

    # lanes stacked on host (numpy); uploaded ONCE with the lane sharding at
    # the device_put below (an eager per-leaf asarray here would upload every
    # leaf unsharded and then re-place it). Model init + carry construction
    # is ONE jitted program (see loop.prepare_carry_batch).
    data_b = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *datas)
    carry_b, consts_b = prepare_carry_batch(spec_model, len(setups))(
        keys, centers_b, bw_b)
    # per-lane consts/param-count for finalize, materialized on host in one
    # pull (per-lane device slicing would compile one tiny program per index)
    n_params = int(sum(np.prod(l.shape[1:]) for l in
                       jax.tree_util.tree_leaves(carry_b["params"])))
    consts_host = jax.tree_util.tree_map(np.asarray, consts_b)
    for i, s in enumerate(setups):
        s.consts = jax.tree_util.tree_map(lambda x, i=i: x[i], consts_host)
        s.n_params = n_params

    spec = LoopSpec.from_config(cfg, spec_model, batch_size, B_shared,
                                val_chunk, n_val_chunks)
    # Per-lane LR tables: warmup pacing depends on the lane's OWN batches
    # per epoch (W = warmup_epochs * B_lane), which can differ across lanes
    # when observation counts straddle a ceil(n/batch) boundary. Lanes with
    # B_lane < B_shared get their surplus steps padded with the last real
    # step's LR (those steps are masked in the loop anyway).
    lr_tabs, lr_recorded_lanes = [], []
    lr_cache: Dict[int, Any] = {}
    for data in datas:
        B_lane = int(data.n_batches)
        if B_lane not in lr_cache:
            lm, lb, lrec = build_lr_tables(cfg, B_lane)
            tab = np.stack([lm, lb], -1).reshape(cfg.epochs, B_lane, 2)
            if B_lane < B_shared:
                tab = np.concatenate(
                    [tab, np.repeat(tab[:, -1:], B_shared - B_lane, axis=1)],
                    axis=1)
            lr_cache[B_lane] = (tab, lrec)
        tab, lrec = lr_cache[B_lane]
        lr_tabs.append(tab)
        lr_recorded_lanes.append(lrec)
    lr_steps = np.stack(lr_tabs)          # (M, epochs, B_shared, 2)

    # -- shard the experiment axis over the mesh ------------------------------
    mesh = mesh or experiment_mesh(cfg.mesh_axis)
    n_dev = mesh.devices.size
    M = len(setups)
    pad_lanes = (-M) % n_dev
    if pad_lanes:
        dup = lambda t: jax.tree_util.tree_map(
            lambda x: jnp.concatenate(
                [x, jnp.repeat(x[-1:], pad_lanes, axis=0)]), t)
        data_b, carry_b, consts_b = dup(data_b), dup(carry_b), dup(consts_b)
        lr_steps = np.concatenate(
            [lr_steps, np.repeat(lr_steps[-1:], pad_lanes, axis=0)])

    lane_sharding = NamedSharding(mesh, P(cfg.mesh_axis))
    shard = lambda t: jax.device_put(t, lane_sharding)
    data_b, carry_b, consts_b = shard(data_b), shard(carry_b), shard(consts_b)

    fit_chunk = jitted_fit_chunk(spec, vmapped=True, lr_per_lane=True)

    # -- chunked epoch loop (early exit when every lane has stopped) ----------
    E = cfg.epochs
    chunk = min(epochs_chunk, E)
    hists = []
    epochs_done = 0
    while epochs_done < E:
        c = min(chunk, E - epochs_done)
        ids = jnp.arange(epochs_done, epochs_done + c, dtype=jnp.int32)
        lr_c = jnp.asarray(lr_steps[:, epochs_done:epochs_done + c])
        active = jnp.ones((chunk,), bool)
        if c != chunk:
            pad = chunk - c
            ids = jnp.concatenate([ids, jnp.full((pad,), E - 1, jnp.int32)])
            lr_c = jnp.concatenate([lr_c, jnp.repeat(lr_c[:, -1:], pad, 1)], 1)
            active = active.at[c:].set(False)
        lr_c = jax.device_put(lr_c, lane_sharding)
        carry_b, hist = fit_chunk(carry_b, consts_b, data_b, ids, lr_c, active)
        hists.append(jax.tree_util.tree_map(
            lambda x: np.asarray(x[:, :c]), hist))
        epochs_done += c
        if bool(np.asarray(carry_b["stopped"]).all()):
            break

    history_b = {k: np.concatenate([h[k] for h in hists], axis=1)
                 for k in hists[0]}
    carry_host = jax.tree_util.tree_map(np.asarray, carry_b)
    wall = time.time() - t_start
    t_train = time.time() - t_phase
    if verbose:
        print(f"[batch] {M} experiments x {epochs_done} epochs in "
              f"{wall:.1f}s on {n_dev} device(s) "
              f"(setup {t_setup:.1f}s, train {t_train - t_setup:.1f}s)")
    t_phase = time.time()

    # -- batched evaluation: ONE vmapped dense-grid predict for all lanes ----
    # (lanes share the dataset; per-split metrics + predictions.npz payloads
    # all derive from the (M, T*S, Q) field — eval is deterministic, so the
    # values equal per-lane chunked prediction exactly)
    precomputed_lanes = None
    try:
        precomputed_lanes = _batched_eval(cfg, spec_model, carry_host,
                                          consts_b, setups, len(todo))
    except Exception as e:
        print(f"[WARNING] batched eval failed, falling back per-lane: {e}")

    # -- per-lane finalize ------------------------------------------------------
    results = []
    per_lane_time = wall / max(M, 1)
    for li, s in enumerate(setups):
        lane_carry = _lane(carry_host, li)
        lane_hist = {k: v[li] for k, v in history_b.items()}
        fit_res: FitResult = assemble_result(spec, lane_carry, lane_hist,
                                             lr_recorded_lanes[li], epochs_done)
        out_dir = s.out_dir
        out_dir.mkdir(parents=True, exist_ok=True)
        r = finalize_experiment(
            s.cfg, s, fit_res, out_dir, per_lane_time, verbose=False,
            stage_timings={"setup_seconds": t_setup / M,
                           "train_seconds": (t_train - t_setup) / M},
            precomputed=precomputed_lanes[li] if precomputed_lanes else None)
        r.pop("_split_predictions", None)
        results.append(r)
    if verbose:
        print(f"[batch] finalize (eval+artifacts) {time.time() - t_phase:.1f}s")
    return results
