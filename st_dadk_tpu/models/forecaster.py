"""Direct multi-horizon forecaster over sliding windows — the consumer of
the forecasting workload style (KAUSTWindowDataset, reference
stnf/dataio/kaust_loader.py:237-515; carried unused by the reference's own
trainer).

Per (window, site) sample the features are
    [ y_hist (L) | phi(s) spatial basis (k_s) | psi(t0) temporal basis ]
-> MLP -> H-step-ahead predictions. DeepKriging-style spatial conditioning
(the same basis machinery as the interpolation model) lets nearby sites
share statistical strength; the direct multi-horizon head avoids recursive
error accumulation and keeps the whole fit one jittable program.

Training runs as a lax.scan of epochs of minibatch AdamW steps with
validation-based early stopping — a compact sibling of train.loop sized for
this workload.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from st_dadk_tpu.ops.basis import (
    spatial_basis_embed,
    temporal_basis_embed,
    temporal_grid_centers,
    uniform_grid_centers,
)
from st_dadk_tpu.train.optimizer import adamw_init, adamw_update

Params = Dict[str, Any]


@dataclass(frozen=True)
class ForecastSpec:
    L: int = 20
    H: int = 10
    k_spatial_centers: Tuple[int, ...] = (25, 81)
    k_temporal_centers: Tuple[int, ...] = (10, 15)
    hidden_dims: Tuple[int, ...] = (256, 128)
    dropout: float = 0.1
    spatial_basis_function: str = "wendland"

    @property
    def k_spatial(self) -> int:
        return int(sum(self.k_spatial_centers))

    @property
    def k_temporal(self) -> int:
        return int(sum(self.k_temporal_centers))

    @property
    def input_dim(self) -> int:
        return self.L + self.k_spatial + self.k_temporal


def init_forecaster(key: jax.Array, spec: ForecastSpec
                    ) -> Tuple[Params, Dict[str, Any]]:
    sc, sb = uniform_grid_centers(spec.k_spatial_centers)
    tc, tb = temporal_grid_centers(spec.k_temporal_centers)
    consts = {"spatial_centers": jnp.asarray(sc),
              "spatial_bandwidths": jnp.asarray(sb),
              "temporal_centers": jnp.asarray(tc),
              "temporal_bandwidths": jnp.asarray(tb)}

    params: Params = {}
    prev = spec.input_dim
    keys = jax.random.split(key, len(spec.hidden_dims) + 1)
    for i, h in enumerate(spec.hidden_dims):
        bound = 1.0 / float(np.sqrt(prev))
        kw, kb = jax.random.split(keys[i])
        params[f"linear_{i}"] = {
            "w": jax.random.uniform(kw, (prev, h), jnp.float32, -bound, bound),
            "b": jax.random.uniform(kb, (h,), jnp.float32, -bound, bound)}
        params[f"ln_{i}"] = {"scale": jnp.ones((h,), jnp.float32),
                             "bias": jnp.zeros((h,), jnp.float32)}
        prev = h
    bound = 1.0 / float(np.sqrt(prev))
    kw, kb = jax.random.split(keys[-1])
    params["out"] = {
        "w": jax.random.uniform(kw, (prev, spec.H), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (spec.H,), jnp.float32, -bound, bound)}
    return params, consts


def forward_forecaster(spec: ForecastSpec, params: Params,
                       consts: Dict[str, Any], y_hist: jax.Array,
                       coords: jax.Array, t0: jax.Array,
                       train: bool = False,
                       rng: Optional[jax.Array] = None) -> jax.Array:
    """y_hist (B, L), coords (B, 2), t0 (B, 1) normalized -> (B, H)."""
    phi = spatial_basis_embed(coords, consts["spatial_centers"],
                              consts["spatial_bandwidths"],
                              spec.spatial_basis_function)
    psi = temporal_basis_embed(t0, consts["temporal_centers"],
                               consts["temporal_bandwidths"])
    h = jnp.concatenate([y_hist, phi, psi], axis=-1)
    for i in range(len(spec.hidden_dims)):
        lin = params[f"linear_{i}"]
        h = h @ lin["w"] + lin["b"]
        ln = params[f"ln_{i}"]
        mean = jnp.mean(h, axis=-1, keepdims=True)
        var = jnp.var(h, axis=-1, keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + 1e-5) * ln["scale"] + ln["bias"]
        h = jax.nn.relu(h)
        if train and spec.dropout > 0.0 and rng is not None:
            rng, sub = jax.random.split(rng)
            keep = jax.random.bernoulli(sub, 1.0 - spec.dropout, h.shape)
            h = jnp.where(keep, h / (1.0 - spec.dropout), 0.0)
    out = params["out"]
    return h @ out["w"] + out["b"]


class ForecastData(NamedTuple):
    y_hist: jax.Array    # (n, L)
    coords: jax.Array    # (n, 2)
    t0: jax.Array        # (n, 1)
    y_fut: jax.Array     # (n, H)


def rows_from_windows(ds, T_total: int) -> ForecastData:
    """Flatten a WindowDataset (W windows x n_obs sites) into per-sample
    rows for the pointwise forecaster."""
    W, L, n_obs, _ = ds.y_hist.shape
    H = ds.y_fut.shape[1]
    y_hist = np.transpose(ds.y_hist[..., 0], (0, 2, 1)).reshape(-1, L)
    y_fut = np.transpose(ds.y_fut[..., 0], (0, 2, 1)).reshape(-1, H)
    coords = np.broadcast_to(ds.obs_coords[None], (W, n_obs, 2)).reshape(-1, 2)
    t0 = np.repeat(ds.t0.astype(np.float32) / max(T_total - 1, 1), n_obs)
    return ForecastData(y_hist=y_hist.astype(np.float32), coords=coords,
                        t0=t0[:, None], y_fut=y_fut.astype(np.float32))


_FIT_CACHE: Dict[Any, Any] = {}


def fit_forecaster(spec: ForecastSpec, params: Params, consts: Dict[str, Any],
                   train_rows: ForecastData, valid_rows: ForecastData,
                   epochs: int = 200, batch_size: int = 1024,
                   lr: float = 1e-3, weight_decay: float = 1e-5,
                   patience: int = 20, seed: int = 0,
                   verbose: bool = False) -> Tuple[Params, Dict[str, Any]]:
    """AdamW + early stopping; the whole fit is one jitted scan program.
    Returns (best_params, history)."""
    n = train_rows.y_hist.shape[0]
    bs = min(batch_size, n)
    B = max(1, -(-n // bs))     # ceil: every training row lands in a batch
    cap = B * bs                # >= n; pad() tiles the shortfall (the old
                                # floor rounding TRUNCATED up to bs-1 rows
                                # out of training entirely)

    def pad(a):
        reps = -(-cap // a.shape[0])
        return jnp.asarray(np.tile(a, (reps,) + (1,) * (a.ndim - 1))[:cap])

    data = ForecastData(*(pad(np.asarray(x)) for x in train_rows))
    val = ForecastData(*(jnp.asarray(np.asarray(x)) for x in valid_rows))

    cache_key = (spec, epochs, B, bs, cap,
                 float(lr), float(weight_decay), patience)
    fitfn = _FIT_CACHE.get(cache_key)
    if fitfn is None:
        def loss_fn(p, cs, yh, c, t0, yf, rng):
            pred = forward_forecaster(spec, p, cs, yh, c, t0,
                                      train=rng is not None, rng=rng)
            return jnp.mean((pred - yf) ** 2)

        def run(p, cs, dat, va, k):
            def epoch(carry, e):
                p, opt, best_p, best_val, pat, stopped, k = carry
                k, perm_k, drop_k = jax.random.split(k, 3)
                idx = jax.random.permutation(perm_k, cap)[: B * bs]
                idx = idx.reshape(B, bs)

                def step(sc, b):
                    p, opt = sc
                    i = idx[b]
                    g = jax.grad(loss_fn)(p, cs, dat.y_hist[i], dat.coords[i],
                                          dat.t0[i], dat.y_fut[i],
                                          jax.random.fold_in(drop_k, b))
                    lr_tree = jax.tree_util.tree_map(
                        lambda _: jnp.asarray(lr), p)
                    p, opt = adamw_update(p, g, opt, lr_tree, weight_decay)
                    return (p, opt), None

                (p2, opt2), _ = jax.lax.scan(step, (p, opt),
                                             jnp.arange(B, dtype=jnp.int32))
                vp = forward_forecaster(spec, p2, cs, va.y_hist, va.coords,
                                        va.t0)
                vl = jnp.mean((vp - va.y_fut) ** 2)
                improved = vl < best_val
                best_p2 = jax.tree_util.tree_map(
                    lambda a, b: jnp.where(improved, a, b), p2, best_p)
                best_val2 = jnp.where(improved, vl, best_val)
                pat2 = jnp.where(improved, 0, pat + 1)
                stop_now = pat2 >= patience
                stopped2 = jnp.logical_or(stopped, stop_now)
                keep = lambda new, old: jax.tree_util.tree_map(
                    lambda a, b: jnp.where(stopped, b, a), new, old)
                return ((keep(p2, p), keep(opt2, opt), keep(best_p2, best_p),
                         jnp.where(stopped, best_val, best_val2),
                         jnp.where(stopped, pat, pat2), stopped2, k),
                        jnp.where(stopped, jnp.nan, vl))

            opt = adamw_init(p)
            init = (p, opt, p, jnp.asarray(jnp.inf),
                    jnp.asarray(0, jnp.int32), jnp.asarray(False), k)
            carry, vls = jax.lax.scan(epoch, init,
                                      jnp.arange(epochs, dtype=jnp.int32))
            return carry[2], carry[3], vls

        fitfn = jax.jit(run)
        _FIT_CACHE[cache_key] = fitfn

    best_p, best_val, vls = fitfn(params, consts, data, val,
                                  jax.random.PRNGKey(seed))
    vls = np.asarray(vls)
    hist = {"val_mse": vls, "best_val": float(best_val),
            "n_epochs_run": int(np.sum(~np.isnan(vls)))}
    if verbose:
        print(f"[forecast] best val MSE {hist['best_val']:.5f} "
              f"({hist['n_epochs_run']} epochs)")
    return jax.tree_util.tree_map(np.asarray, best_p), hist
