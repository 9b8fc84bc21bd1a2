"""Optimizer stack: per-group AdamW, LR state machine, clipping, damping, EMA.

The reference's learning-rate behavior is an *interaction* of four mechanisms
that all mutate optimizer param-group LRs in place (train_st_interp.py):
  1. per-step linear warmup, applied after each optimizer step (:714-718)
  2. progressive basis unfreeze + linear ramp at epoch starts (:581-602)
  3. torch CosineAnnealingLR stepped once per epoch after warmup (:523-531,
     :820-823) — torch's *recursive* formula, which diverges from the closed
     form whenever the LR was externally modified (as the ramp does)
  4. differential basis LR = lr * basis_lr_ratio (:470-499)

Rather than approximating, `build_lr_tables` simulates that assignment
timeline exactly (numpy, host-side, once per fit) and emits per-step LR
tables; the jitted training step just gathers lr[step]. A unit test replays
the same timeline against real torch optim + CosineAnnealingLR.

AdamW matches torch.optim.AdamW: decoupled weight decay p *= (1 - lr*wd),
bias-corrected moments, eps added after sqrt.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from st_dadk_tpu.config import ExperimentConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# LR tables
# ---------------------------------------------------------------------------

def build_lr_tables(cfg: ExperimentConfig, batches_per_epoch: int
                    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-step LR tables (epochs*B,) for the MLP group and the basis group,
    plus the per-epoch "recorded" LR (epochs,) — the group-0 LR the reference
    writes into training history after the epoch's batches and before the
    scheduler step (train_st_interp.py:812-814).

    Faithful simulation of the reference's LR assignment timeline, including
    torch CosineAnnealingLR's recursive update semantics on externally
    modified LRs. The basis table is all-zeros when the basis is fixed.
    """
    E = int(cfg.epochs)
    B = int(batches_per_epoch)
    base = float(cfg.lr)
    learnable = bool(cfg.spatial_learnable)
    ratio = float(cfg.basis_lr_ratio)
    target = base * ratio
    unfreeze = int(cfg.basis_unfreeze_epoch) if learnable else 0
    rampup = int(cfg.basis_lr_rampup_epochs) if learnable else 0
    warmup_epochs = int(cfg.warmup_epochs)
    W = warmup_epochs * B
    cosine = cfg.scheduler == "cosine"
    eta_min = base * 0.5          # ref: eta_min = lr * 0.5 (:525)
    T_max = E

    initial_mlp = base
    initial_basis = (0.0 if unfreeze > 0 else target) if learnable else 0.0

    lr = {"mlp": initial_mlp, "basis": initial_basis}
    initial = {"mlp": initial_mlp, "basis": initial_basis}
    mlp_tab = np.zeros(E * B, dtype=np.float64)
    basis_tab = np.zeros(E * B, dtype=np.float64)
    recorded = np.zeros(E, dtype=np.float64)

    t_sched = 0
    for e in range(E):
        # start-of-epoch unfreeze / ramp events (ref :581-602)
        if learnable and unfreeze > 0:
            if e == unfreeze:
                lr["basis"] = target * 0.1 if rampup > 0 else target
            elif unfreeze < e < unfreeze + rampup:
                progress = (e - unfreeze) / rampup
                lr["basis"] = target * (0.1 + 0.9 * progress)
        for b in range(B):
            s = e * B + b
            mlp_tab[s] = lr["mlp"]
            basis_tab[s] = lr["basis"]
            # post-step warmup assignment (ref :714-718)
            if s < W:
                factor = (s + 1) / W
                lr["mlp"] = initial["mlp"] * factor
                lr["basis"] = initial["basis"] * factor
        recorded[e] = lr["mlp"]
        # end-of-epoch scheduler step (ref :820-823); torch recursive form.
        # the basis group only exists when the basis is learnable.
        if cosine and e >= warmup_epochs:
            t_sched += 1
            num = 1.0 + math.cos(math.pi * t_sched / T_max)
            den = 1.0 + math.cos(math.pi * (t_sched - 1) / T_max)
            groups = ("mlp", "basis") if learnable else ("mlp",)
            for g in groups:
                lr[g] = (lr[g] - eta_min) * (num / den) + eta_min

    return (mlp_tab.astype(np.float32), basis_tab.astype(np.float32),
            recorded.astype(np.float64))


# ---------------------------------------------------------------------------
# Gradient transforms
# ---------------------------------------------------------------------------

def clip_by_global_norm(tree: Any, max_norm: float) -> Any:
    """torch.nn.utils.clip_grad_norm_ semantics: scale the whole group if its
    global L2 norm exceeds max_norm (with torch's 1e-6 stabilizer)."""
    leaves = jax.tree_util.tree_leaves(tree)
    total = jnp.sqrt(sum(jnp.sum(l.astype(jnp.float32) ** 2) for l in leaves))
    scale = jnp.minimum(1.0, max_norm / (total + 1e-6))
    return jax.tree_util.tree_map(lambda l: l * scale, tree)


def gradient_damping(center_grad: jax.Array, centers: jax.Array,
                     centers_init: jax.Array, threshold: float,
                     strength: float) -> jax.Array:
    """Distance-based gradient damping on basis centers
    (ref st_interp.py:111-142): rows that moved beyond `threshold` from their
    initial position get exponentially suppressed gradients."""
    movement = centers - centers_init
    distances = jnp.linalg.norm(movement, axis=1, keepdims=True)
    excess = jnp.maximum(distances - threshold, 0.0)
    factor = jnp.exp(-strength * excess)
    return center_grad * jax.lax.stop_gradient(factor)


# ---------------------------------------------------------------------------
# AdamW (torch-parity)
# ---------------------------------------------------------------------------

def adamw_init(params: Params) -> Dict[str, Any]:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return {"m": zeros, "v": jax.tree_util.tree_map(jnp.zeros_like, params),
            "step": jnp.zeros((), jnp.int32)}


def adamw_update(params: Params, grads: Params, state: Dict[str, Any],
                 lr_tree: Params, weight_decay: float,
                 b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8
                 ) -> Tuple[Params, Dict[str, Any]]:
    """One AdamW step. `lr_tree` holds a (traced) scalar LR per leaf so
    parameter groups can carry different learning rates."""
    step = state["step"] + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - b1 ** t
    bc2 = 1.0 - b2 ** t

    new_m = jax.tree_util.tree_map(lambda m, g: b1 * m + (1 - b1) * g,
                                   state["m"], grads)
    new_v = jax.tree_util.tree_map(lambda v, g: b2 * v + (1 - b2) * g * g,
                                   state["v"], grads)

    def upd(p, m, v, lr):
        mhat = m / bc1
        vhat = v / bc2
        return p * (1.0 - lr * weight_decay) - lr * mhat / (jnp.sqrt(vhat) + eps)

    new_params = jax.tree_util.tree_map(upd, params, new_m, new_v, lr_tree)
    return new_params, {"m": new_m, "v": new_v, "step": step}


def lr_tree_for(params: Params, lr_mlp: jax.Array, lr_basis: jax.Array) -> Params:
    """Per-leaf LR: everything under the 'basis' subtree gets lr_basis."""
    def assign(path, leaf):
        is_basis = any(getattr(k, "key", None) == "basis" for k in path)
        return lr_basis if is_basis else lr_mlp
    return jax.tree_util.tree_map_with_path(assign, params)


def ema_update(ema: Params, params: Params, decay: float) -> Params:
    """shadow = decay*shadow + (1-decay)*param (ref stnf/utils/ema.py:52-66)."""
    return jax.tree_util.tree_map(
        lambda s, p: decay * s + (1.0 - decay) * p, ema, params)
