"""Exact size-constrained k-means (the reference's KMeansConstrained role).

The reference initializes DA-STDK centers with `k_means_constrained.
KMeansConstrained(n_clusters=k, size_min=n//k-1, size_max=n//k+n%k,
random_state=42, n_init=3, max_iter=100)` (stnf/models/st_interp.py:340-431),
which solves a min-cost-flow assignment per Lloyd iteration. That package is
not installable here, so this module provides the exact solver from scratch:

  - cluster sizes are EXACTLY balanced: floor(n/k) or ceil(n/k) points per
    cluster (a feasible refinement of the reference's (n//k-1, n//k+n%k)
    box — the constraint the method exists to enforce);
  - per Lloyd iteration the equal-size assignment is solved EXACTLY by a
    forward auction with epsilon scaling (Bertsekas) on integer-scaled
    costs. With caps summing to n the problem is a balanced transportation
    problem; at final epsilon < 1/n the epsilon-CS solution is the integer
    min-cost optimum — the same assignment a min-cost-flow solver returns
    (verified against scipy HiGHS LP and brute force in
    tests/test_kmeans_exact.py);
  - k-means++ seeding, n_init restarts keeping the lowest inertia, max_iter
    Lloyd iterations (reference: random_state=42, n_init=3, max_iter=100).

This backs the opt-in `spatial_init_method="kmeans_exact"`; the fast default
remains the on-device Sinkhorn-OT `kmeans_balanced` (ops/init_centers.py),
which matches this solver statistically but not combinatorially.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

_COST_SCALE = 1e7          # coords in [0,1]^2 -> integer costs <= 2e7


def _pairwise_d2(X: np.ndarray, C: np.ndarray) -> np.ndarray:
    diff = X[:, None, :] - C[None, :, :]
    return np.einsum("nkd,nkd->nk", diff, diff)


def auction_assign_balanced(cost: np.ndarray, caps: np.ndarray,
                            eps_final: Optional[float] = None,
                            scale_factor: float = 6.0) -> np.ndarray:
    """Exact balanced transportation by forward auction with eps-scaling.

    cost: (n, m) float64 with INTEGER values; caps: (m,) int with
    caps.sum() == n (every slot filled). Returns col (n,) minimizing
    sum_i cost[i, col[i]] with bincount(col) == caps, exactly
    (eps_final < 1/n on integer costs).
    """
    n, m = cost.shape
    caps = np.asarray(caps, np.int64)
    assert int(caps.sum()) == n, "balanced auction needs caps.sum() == n"
    if eps_final is None:
        eps_final = 1.0 / (n + 1)
    value = -cost
    spread = float(value.max() - value.min())
    eps = max(spread / 8.0, eps_final)

    # per-column slot prices as one padded (m, cmax) array (+inf pads), so
    # the cheapest/2nd-cheapest scan per bidding round is a single
    # np.partition over the matrix instead of a Python loop over columns
    # (roadmap: auction vectorization). Prices persist across scales
    # (standard eps-scaling warm start); occupants are cleared each scale.
    cmax = int(caps.max())
    sp = np.full((m, cmax), np.inf)
    for j in range(m):
        sp[j, : caps[j]] = 0.0
    assignment = np.full(n, -1, np.int64)

    while True:
        occ = np.full((m, cmax), -1, np.int64)
        assignment.fill(-1)

        while True:
            U = np.where(assignment < 0)[0]
            if U.size == 0:
                break
            # cheapest and second-cheapest slot price per column (vectorized;
            # +inf padding makes single-slot columns yield p2 = inf)
            if cmax == 1:
                p1 = sp[:, 0]
                p2 = np.full(m, np.inf)
            else:
                two = np.partition(sp, 1, axis=1)[:, :2]
                p1, p2 = two[:, 0], two[:, 1]

            V1 = value[U] - p1[None, :]
            j1 = np.argmax(V1, axis=1)
            rows = np.arange(U.size)
            v1 = V1[rows, j1]
            vown = value[U, j1]
            V1[rows, j1] = -np.inf
            alt = np.max(V1, axis=1) if m > 1 else np.full(U.size, -np.inf)
            # the second-best SLOT may be the same column's 2nd-cheapest slot
            v2 = np.maximum(alt, vown - p2[j1])
            bids = p1[j1] + (v1 - v2) + eps

            for j in np.unique(j1):
                mask = j1 == j
                pts = U[mask]
                prs = bids[mask]
                order = np.argsort(-prs)
                s, o = sp[j], occ[j]
                for idx in order:
                    slot = int(np.argmin(s))
                    if prs[idx] <= s[slot]:
                        continue            # stale bid; point re-bids later
                    old = o[slot]
                    if old >= 0:
                        assignment[old] = -1
                    s[slot] = prs[idx]
                    o[slot] = pts[idx]
                    assignment[pts[idx]] = j

        if eps <= eps_final:
            out = np.empty(n, np.int64)
            for j in range(m):
                out[occ[j, : caps[j]]] = j
            return out
        eps = max(eps / scale_factor, eps_final)


def constrained_assignment(cost: np.ndarray, caps: np.ndarray) -> np.ndarray:
    """Exact equal-size assignment on float costs (scaled to integers)."""
    ci = np.round(cost * _COST_SCALE)
    return auction_assign_balanced(ci, caps)


def balanced_caps(n: int, k: int) -> np.ndarray:
    """floor/ceil(n/k) capacities summing to n (first n%k clusters get +1)."""
    q, r = divmod(n, k)
    caps = np.full(k, q, np.int64)
    caps[:r] += 1
    return caps


def kmeans_constrained(X: np.ndarray, k: int,
                       n_init: int = 3, max_iter: int = 100,
                       random_state: int = 42,
                       tol: float = 1e-4) -> Tuple[np.ndarray, np.ndarray]:
    """Exact-balance constrained k-means; returns (centers (k,2), labels (n,)).

    Defaults mirror the reference call (random_state=42, n_init=3,
    max_iter=100); every cluster holds exactly floor(n/k) or ceil(n/k)
    points, and each Lloyd assignment is the exact min-cost solution."""
    X = np.asarray(X, np.float64)
    n = len(X)
    caps = balanced_caps(n, k)
    rng = np.random.RandomState(random_state)

    best = None
    for _ in range(n_init):
        centers = _kmeans_pp_np(X, k, rng)
        prev = np.inf
        labels = None
        for _ in range(max_iter):
            cost = _pairwise_d2(X, centers)
            labels = constrained_assignment(cost, caps)
            inertia = float(cost[np.arange(n), labels].sum())
            for j in range(k):
                pts = X[labels == j]
                if len(pts):
                    centers[j] = pts.mean(axis=0)
            if prev - inertia <= tol * max(abs(prev), 1.0):
                break
            prev = inertia
        if best is None or inertia < best[0]:
            best = (inertia, centers.copy(), labels.copy())
    return best[1], best[2]


def _kmeans_pp_np(X: np.ndarray, k: int, rng: np.random.RandomState
                  ) -> np.ndarray:
    n = len(X)
    centers = np.empty((k, X.shape[1]))
    centers[0] = X[rng.randint(n)]
    d2 = ((X - centers[0]) ** 2).sum(1)
    for j in range(1, k):
        probs = d2 / max(d2.sum(), 1e-12)
        centers[j] = X[rng.choice(n, p=probs)]
        d2 = np.minimum(d2, ((X - centers[j]) ** 2).sum(1))
    return centers
