#!/usr/bin/env python
"""Reconstruct 1b / 3b train data at the competition's true scale.

The reference snapshot ships only test coordinates + the official solutions
for the large spatial families (`data/1b/1b_*_test.csv` 100k sites,
`data/3b/3b_*_test.csv` 50k sites; train files withheld everywhere, no
network egress). Where `scripts/synthesize_2b.py` rebuilt 2b from a
covariance fitted to a SIBLING dataset (2a_8), here each field's covariance
is fitted to ITS OWN real values — the solutions column IS the true field at
the official test sites:

  1. fit mean/std + a Matern(nu=1) correlation (range, partial sill, nugget)
     to binned empirical correlations of random site pairs of the real
     solutions field — the same estimator synthesize_2b.py uses;
  2. sample an unconditional GRF with those parameters at n_train synthetic
     uniform sites AND at the official test sites, via random Fourier
     features: the Matern spectral measure is a multivariate Student-t with
     2*nu dof and scale 1/range (omega = g/range * sqrt(2nu/u), g ~ N(0,I),
     u ~ chi2_{2nu}), so z(s) = mean + std*(sqrt(s2) * sqrt(2/m) *
     sum_j cos(omega_j . s + phi_j) + sqrt(nugget)*eps). O(n*m) instead of
     the O(n^3) Cholesky (900k sites is far beyond synthesize_2b's path);
  3. 3b's field pairs (z_{2i-1}, z_{2i}) are correlated — a one-factor
     linear model of coregionalization reuses the SAME spectral draw for a
     shared latent field and mixes it with an independent one to match the
     pair's measured cross-correlation.

Outputs (to the repo's data/ tree, never the read-only reference mount):
  data/<fam>/<fam>_<i>.csv          train: x,y,z (1b) / x,y,z1,z2 (3b)
  data/<fam>/<fam>_<i>_synthsol.csv the SAME field at the official test
                                    sites -> lets a fit on the synthetic
                                    train be scored end-to-end at true scale
  data/<fam>/fit_params.json        fitted covariance per field

This is a documented SYNTHETIC stand-in: fits on it exercise the b-families
at their true size (1b: 900k train points), while real-field accuracy
evidence stays with score_families.py's splitsol mode (which trains on the
actual solutions field). Ref context: SURVEY.md section 6; the reference's
loaders at stnf/data/kaust_loader.py:19-175 only ever see train CSVs of this
layout.
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from st_dadk_tpu.utils.platform import apply_platform_env  # noqa: E402
apply_platform_env()


def _clean(df: pd.DataFrame) -> pd.DataFrame:
    df.columns = [c.strip().strip('"') for c in df.columns]
    return df


def fit_field(coords: np.ndarray, z: np.ndarray, n_bins: int = 24,
              max_h: float = 0.5, n_pairs: int = 200_000,
              seed: int = 0) -> dict:
    """Matern(nu=1) fit to the empirical correlation of random site pairs
    (st_dadk_tpu.utils.covariance.fit_matern1 — the SAME binning/fit as
    synthesize_2b.fit_2a_covariance — on a single spatial field)."""
    from st_dadk_tpu.utils.covariance import fit_matern1

    z = np.asarray(z, np.float64)
    mu, sd = float(z.mean()), float(z.std())
    zn = (z - mu) / sd
    rng = np.random.default_rng(seed)
    n = len(z)
    ii = rng.integers(0, n, n_pairs)
    jj = rng.integers(0, n, n_pairs)
    keep = ii != jj
    ii, jj = ii[keep], jj[keep]
    h = np.linalg.norm(coords[ii] - coords[jj], axis=1)
    prod = zn[ii] * zn[jj]
    s2, a, nugget = fit_matern1(h, prod, n_bins=n_bins, max_h=max_h)
    return dict(mean=mu, std=sd, sigma2=s2, range_=a, nu=1.0, nugget=nugget)


def matern_rff(params: dict, m: int, seed: int):
    """(omega (m,2), phi (m,)) drawn from the Matern spectral measure."""
    rng = np.random.default_rng(seed)
    nu = params["nu"]
    g = rng.standard_normal((m, 2))
    u = rng.chisquare(2.0 * nu, size=(m, 1))
    omega = g / params["range_"] * np.sqrt(2.0 * nu / u)
    phi = rng.uniform(0.0, 2.0 * np.pi, size=m)
    return omega, phi


def eval_latent(coords: np.ndarray, omega: np.ndarray, phi: np.ndarray,
                chunk: int = 131072) -> np.ndarray:
    """sqrt(2/m) sum_j cos(omega_j . s + phi_j): ~unit-variance latent.

    The (n, m) feature matrix is a dense matmul + cos — minutes of float64
    numpy on this host's single CPU core at n=1M, m=4096, but milliseconds
    per chunk on the accelerator, so the projection runs through jax in
    float32 (f32 phase error ~1e-4 rad is far below the field's nugget)."""
    import jax
    import jax.numpy as jnp

    m = len(phi)
    om32 = jnp.asarray(omega.T, jnp.float32)
    ph32 = jnp.asarray(phi, jnp.float32)

    @jax.jit
    def one(c):
        proj = c @ om32 + ph32[None, :]
        return jnp.sqrt(2.0 / m) * jnp.cos(proj).sum(axis=1)

    out = np.empty(len(coords), np.float64)
    for s in range(0, len(coords), chunk):
        e = min(s + chunk, len(coords))
        c = np.zeros((chunk, 2), np.float32)       # fixed shape: one compile
        c[: e - s] = coords[s:e]
        out[s:e] = np.asarray(one(jnp.asarray(c)))[: e - s]
    return out


def sample_field(params: dict, latent: np.ndarray, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    eps = rng.standard_normal(len(latent))
    zn = np.sqrt(params["sigma2"]) * latent \
        + np.sqrt(params["nugget"]) * eps
    return params["mean"] + params["std"] * zn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", nargs="+", default=["1b", "3b"])
    ap.add_argument("--ref_data", default="/root/reference/data")
    ap.add_argument("--out_root", default=str(REPO / "data"))
    ap.add_argument("--train_ratio", type=float, default=9.0,
                    help="n_train = ratio * n_test (1a/3a ship 9:1)")
    ap.add_argument("--m_features", type=int, default=4096)
    ap.add_argument("--seed", type=int, default=2026)
    args = ap.parse_args()

    for fam in args.families:
        fam_dir = Path(args.ref_data) / fam
        sol = _clean(pd.read_csv(fam_dir / f"{fam}-solutions.csv"))
        out_dir = Path(args.out_root) / fam
        out_dir.mkdir(parents=True, exist_ok=True)
        bivariate = fam.startswith("3")
        tests = sorted(fam_dir.glob(f"{fam}_*_test.csv"),
                       key=lambda p: int(p.stem.split("_")[1]))
        all_params = {}
        for test_csv in tests:
            i = int(test_csv.stem.split("_")[1])
            test = _clean(pd.read_csv(test_csv))
            te_xy = test[["x", "y"]].to_numpy(np.float64)
            n_test = len(te_xy)
            n_train = int(args.train_ratio * n_test)
            rng = np.random.default_rng(args.seed + 100 * i)
            tr_xy = rng.uniform(size=(n_train, 2))
            t0 = time.time()

            if bivariate:
                cols = [f"z{2 * (i - 1) + 1}", f"z{2 * (i - 1) + 2}"]
                y = sol[cols].to_numpy(np.float64)[: n_test]
                p1 = fit_field(te_xy, y[:, 0], seed=args.seed + i)
                p2 = fit_field(te_xy, y[:, 1], seed=args.seed + i + 50)
                zn1 = (y[:, 0] - p1["mean"]) / p1["std"]
                zn2 = (y[:, 1] - p2["mean"]) / p2["std"]
                rho = float(np.corrcoef(zn1, zn2)[0, 1])
                # one-factor LMC: shared spectral draw at the two fields'
                # common (averaged) range, mixed to the measured rho
                shared = dict(p1, range_=0.5 * (p1["range_"] + p2["range_"]))
                om, ph = matern_rff(shared, args.m_features,
                                    args.seed + 7 * i)
                om2, ph2 = matern_rff(shared, args.m_features,
                                      args.seed + 7 * i + 3)
                lat_s = eval_latent(np.vstack([tr_xy, te_xy]), om, ph)
                lat_i = eval_latent(np.vstack([tr_xy, te_xy]), om2, ph2)
                lat2 = rho * lat_s + np.sqrt(max(1 - rho * rho, 0.0)) * lat_i
                z1 = sample_field(p1, lat_s, args.seed + 11 * i)
                z2 = sample_field(p2, lat2, args.seed + 11 * i + 5)
                pd.DataFrame({
                    "x": tr_xy[:, 0], "y": tr_xy[:, 1],
                    "z1": z1[:n_train].astype(np.float32),
                    "z2": z2[:n_train].astype(np.float32),
                }).to_csv(out_dir / f"{fam}_{i}.csv", index=False)
                pd.DataFrame({
                    "id": np.arange(1, n_test + 1),
                    "z1": z1[n_train:].astype(np.float32),
                    "z2": z2[n_train:].astype(np.float32),
                }).to_csv(out_dir / f"{fam}_{i}_synthsol.csv", index=False)
                all_params[f"{fam}_{i}"] = dict(
                    z1=p1, z2=p2, cross_corr=rho, n_train=n_train)
                print(f"[synth] {fam}_{i}: ranges "
                      f"{p1['range_']:.3f}/{p2['range_']:.3f} rho={rho:.3f} "
                      f"n_train={n_train} ({time.time()-t0:.0f}s)",
                      flush=True)
            else:
                col = f"z{i}"
                y = sol[col].to_numpy(np.float64)[: n_test]
                p = fit_field(te_xy, y, seed=args.seed + i)
                om, ph = matern_rff(p, args.m_features, args.seed + 7 * i)
                lat = eval_latent(np.vstack([tr_xy, te_xy]), om, ph)
                z = sample_field(p, lat, args.seed + 11 * i)
                pd.DataFrame({
                    "id_train": np.arange(1, n_train + 1),
                    "x": tr_xy[:, 0], "y": tr_xy[:, 1],
                    "z": z[:n_train].astype(np.float32),
                }).to_csv(out_dir / f"{fam}_{i}.csv", index=False)
                pd.DataFrame({
                    "id": np.arange(1, n_test + 1),
                    "z": z[n_train:].astype(np.float32),
                }).to_csv(out_dir / f"{fam}_{i}_synthsol.csv", index=False)
                all_params[f"{fam}_{i}"] = dict(z=p, n_train=n_train)
                print(f"[synth] {fam}_{i}: range {p['range_']:.3f} "
                      f"s2={p['sigma2']:.3f} nugget={p['nugget']:.3f} "
                      f"n_train={n_train} ({time.time()-t0:.0f}s)",
                      flush=True)
        with open(out_dir / "fit_params.json", "w") as f:
            json.dump(all_params, f, indent=2)
        print(f"[synth] wrote {out_dir}")


if __name__ == "__main__":
    main()
