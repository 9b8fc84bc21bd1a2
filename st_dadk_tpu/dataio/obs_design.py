"""Observation-mask design: who is observed, and how train/valid/test split.

These functions define the benchmark scenarios and are *seed-compatible* with
the reference: given the same numpy seed they issue the identical sequence of
np.random calls and therefore produce bit-identical masks
(ref scripts/train_st_interp.py:251-410). They run on host once per
experiment — mask generation is data preparation, not hot-path compute.
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def spatial_obs_probs(coords: np.ndarray, pattern: str = "uniform",
                      intensity: float = 1.0) -> Optional[np.ndarray]:
    """Per-site relative observation weights.

    'corner': Cauchy-like p ~ 1/(1 + intensity * ||s||^2)^2, peaked at (0,0)
    (ref train_st_interp.py:266-276). 'uniform' returns None.
    """
    if pattern == "uniform" or pattern is None:
        return None
    if pattern == "corner":
        dist_sq = coords[:, 0] ** 2 + coords[:, 1] ** 2
        return 1.0 / (1.0 + intensity * dist_sq) ** 2
    raise ValueError(f"Unknown pattern: {pattern}")


def sample_observations(
    z_data: np.ndarray,
    coords: np.ndarray,
    obs_method: str = "site-wise",
    obs_ratio: float = 0.5,
    obs_weights: Optional[np.ndarray] = None,
    seed: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sample the observation mask (ref train_st_interp.py:282-342).

    Args:
        z_data: (T, S) full field (only the shape is used)
        obs_weights: per-site relative weights from spatial_obs_probs, or None
    Returns:
        obs_mask: (T, S) bool; obs_sites: indices of sites with >=1 observation
    """
    if seed is not None:
        np.random.seed(seed)
    T, S = z_data.shape

    if obs_weights is not None:
        obs_probs = obs_weights / obs_weights.mean() * obs_ratio
        obs_probs = np.clip(obs_probs, 0, 1)
    else:
        obs_probs = np.ones(S) * obs_ratio

    if obs_method == "site-wise":
        n_obs_sites = int(S * obs_ratio)
        p = obs_probs / obs_probs.sum()
        obs_sites = np.random.choice(S, size=n_obs_sites, replace=False, p=p)
        obs_mask = np.zeros((T, S), dtype=bool)
        obs_mask[:, obs_sites] = True
        return obs_mask, obs_sites

    if obs_method == "random":
        obs_probs_expanded = obs_probs[np.newaxis, :].repeat(T, axis=0)
        obs_mask = np.random.rand(T, S) < obs_probs_expanded
        obs_sites = np.where(obs_mask.any(axis=0))[0]
        return obs_mask, obs_sites

    raise ValueError(f"Unknown obs_method: {obs_method}")


def split_train_valid(
    obs_mask: np.ndarray,
    obs_sites: np.ndarray,
    split_method: str = "site-wise",
    train_ratio: float = 0.8,
    seed: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Split observed points into train/valid (ref train_st_interp.py:345-410)."""
    if seed is not None:
        np.random.seed(seed)
    T, S = obs_mask.shape

    if split_method == "site-wise":
        n_train_sites = int(len(obs_sites) * train_ratio)
        shuffled = np.array(obs_sites).copy()
        np.random.shuffle(shuffled)
        train_sites = shuffled[:n_train_sites]
        valid_sites = shuffled[n_train_sites:]
        train_mask = np.zeros((T, S), dtype=bool)
        valid_mask = np.zeros((T, S), dtype=bool)
        train_mask[:, train_sites] = obs_mask[:, train_sites]
        valid_mask[:, valid_sites] = obs_mask[:, valid_sites]
        return train_mask, valid_mask

    if split_method == "random":
        obs_indices = np.argwhere(obs_mask)          # row-major (t, s) order
        n_obs = len(obs_indices)
        n_train = int(n_obs * train_ratio)
        shuffled_idx = np.random.permutation(n_obs)
        train_pts = obs_indices[shuffled_idx[:n_train]]
        valid_pts = obs_indices[shuffled_idx[n_train:]]
        train_mask = np.zeros((T, S), dtype=bool)
        valid_mask = np.zeros((T, S), dtype=bool)
        train_mask[train_pts[:, 0], train_pts[:, 1]] = True
        valid_mask[valid_pts[:, 0], valid_pts[:, 1]] = True
        return train_mask, valid_mask

    raise ValueError(f"Unknown split_method: {split_method}")
