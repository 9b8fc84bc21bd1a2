"""Optimizer parity tests: AdamW, clipping, and the LR state machine are
cross-validated against real torch (CPU) replaying the reference's
assignment timeline."""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from st_dadk_tpu.config import ExperimentConfig
from st_dadk_tpu.train.optimizer import (
    adamw_init,
    adamw_update,
    build_lr_tables,
    clip_by_global_norm,
    ema_update,
    gradient_damping,
    lr_tree_for,
)

torch = pytest.importorskip("torch")


class TestAdamW:
    def test_matches_torch(self):
        rng = np.random.default_rng(0)
        w0 = rng.normal(size=(4, 3)).astype(np.float32)
        b0 = rng.normal(size=(3,)).astype(np.float32)
        grads_seq = [
            {"w": rng.normal(size=(4, 3)).astype(np.float32),
             "b": rng.normal(size=(3,)).astype(np.float32)}
            for _ in range(5)
        ]
        lr, wd = 2e-2, 5e-4

        # torch
        tw = torch.nn.Parameter(torch.tensor(w0))
        tb = torch.nn.Parameter(torch.tensor(b0))
        opt = torch.optim.AdamW([tw, tb], lr=lr, weight_decay=wd)
        for g in grads_seq:
            opt.zero_grad()
            tw.grad = torch.tensor(g["w"])
            tb.grad = torch.tensor(g["b"])
            opt.step()

        # ours
        params = {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}
        state = adamw_init(params)
        for g in grads_seq:
            gj = {"w": jnp.asarray(g["w"]), "b": jnp.asarray(g["b"])}
            lr_tree = jax.tree_util.tree_map(lambda _: jnp.asarray(lr), params)
            params, state = adamw_update(params, gj, state, lr_tree, wd)

        # f32 op-ordering differences (torch fuses addcdiv) accumulate ~1e-5
        assert np.allclose(np.asarray(params["w"]), tw.detach().numpy(),
                           atol=5e-5, rtol=1e-4)
        assert np.allclose(np.asarray(params["b"]), tb.detach().numpy(),
                           atol=5e-5, rtol=1e-4)


class TestClip:
    def test_matches_torch_clip_grad_norm(self):
        rng = np.random.default_rng(1)
        g1 = rng.normal(size=(8, 8)).astype(np.float32) * 3
        g2 = rng.normal(size=(8,)).astype(np.float32) * 3
        t1 = torch.nn.Parameter(torch.zeros(8, 8)); t1.grad = torch.tensor(g1)
        t2 = torch.nn.Parameter(torch.zeros(8)); t2.grad = torch.tensor(g2)
        torch.nn.utils.clip_grad_norm_([t1, t2], 1.0)

        ours = clip_by_global_norm({"a": jnp.asarray(g1), "b": jnp.asarray(g2)}, 1.0)
        assert np.allclose(np.asarray(ours["a"]), t1.grad.numpy(), atol=1e-6)
        assert np.allclose(np.asarray(ours["b"]), t2.grad.numpy(), atol=1e-6)

    def test_no_clip_when_small(self):
        g = {"a": jnp.ones((2, 2)) * 0.01}
        out = clip_by_global_norm(g, 10.0)
        assert np.allclose(np.asarray(out["a"]), 0.01)


class TestDamping:
    def test_factor(self):
        centers_init = jnp.zeros((3, 2))
        centers = jnp.asarray([[0.0, 0.0], [0.4, 0.0], [0.0, 1.0]])
        grad = jnp.ones((3, 2))
        out = np.asarray(gradient_damping(grad, centers, centers_init,
                                          threshold=0.3, strength=2.0))
        # row 0: distance 0 -> no damping; row 1: excess 0.1 -> exp(-0.2);
        # row 2: excess 0.7 -> exp(-1.4)
        assert np.allclose(out[0], 1.0)
        assert np.allclose(out[1], math.exp(-0.2), atol=1e-6)
        assert np.allclose(out[2], math.exp(-1.4), atol=1e-6)


class TestEMA:
    def test_update(self):
        ema = {"w": jnp.ones(3)}
        p = {"w": jnp.zeros(3)}
        out = ema_update(ema, p, 0.9)
        assert np.allclose(np.asarray(out["w"]), 0.9)


class TestLrTree:
    def test_basis_subtree_gets_basis_lr(self):
        params = {"basis": {"centers": jnp.zeros((2, 2))},
                  "mlp": {"linear_0": {"w": jnp.zeros((2, 2))}}}
        tree = lr_tree_for(params, jnp.asarray(1.0), jnp.asarray(0.5))
        assert float(tree["basis"]["centers"]) == 0.5
        assert float(tree["mlp"]["linear_0"]["w"]) == 1.0


def _torch_lr_timeline(cfg: ExperimentConfig, B: int):
    """Independent replay of the reference's LR mutations using REAL torch
    optimizer + CosineAnnealingLR (the component under test is our numpy
    simulation; torch is ground truth here)."""
    E = cfg.epochs
    base = float(cfg.lr)
    learnable = cfg.spatial_learnable
    target = base * cfg.basis_lr_ratio
    unfreeze = cfg.basis_unfreeze_epoch if learnable else 0
    rampup = cfg.basis_lr_rampup_epochs if learnable else 0
    W = cfg.warmup_epochs * B

    p_mlp = torch.nn.Parameter(torch.zeros(1))
    groups = [{"params": [p_mlp], "lr": base, "name": "mlp"}]
    if learnable:
        p_basis = torch.nn.Parameter(torch.zeros(1))
        init_basis = 0.0 if unfreeze > 0 else target
        groups.append({"params": [p_basis], "lr": init_basis, "name": "basis"})
    opt = torch.optim.AdamW(groups, weight_decay=0.0)
    for g in opt.param_groups:
        g["initial_lr"] = g["lr"]
        if g.get("name") == "basis":
            g["target_lr"] = target

    sched = None
    if cfg.scheduler == "cosine":
        sched = torch.optim.lr_scheduler.CosineAnnealingLR(
            opt, T_max=E, eta_min=base * 0.5)

    mlp_tl, basis_tl, recorded = [], [], []
    step = 0
    for e in range(E):
        if learnable and unfreeze > 0:
            if e == unfreeze:
                for g in opt.param_groups:
                    if g.get("name") == "basis":
                        g["lr"] = g["target_lr"] * (0.1 if rampup > 0 else 1.0)
            elif unfreeze < e < unfreeze + rampup:
                prog = (e - unfreeze) / rampup
                for g in opt.param_groups:
                    if g.get("name") == "basis":
                        g["lr"] = g["target_lr"] * (0.1 + 0.9 * prog)
        for b in range(B):
            mlp_tl.append(opt.param_groups[0]["lr"])
            basis_tl.append(opt.param_groups[1]["lr"] if learnable else 0.0)
            if step < W:
                f = (step + 1) / W
                for g in opt.param_groups:
                    g["lr"] = g["initial_lr"] * f
            step += 1
        recorded.append(opt.param_groups[0]["lr"])
        if sched is not None and e >= cfg.warmup_epochs:
            sched.step()
    return np.array(mlp_tl), np.array(basis_tl), np.array(recorded)


class TestLrTables:
    @pytest.mark.parametrize("learnable,unfreeze,rampup,warmup,sched", [
        (False, 0, 0, 0, None),
        (False, 0, 0, 3, "cosine"),
        (True, 0, 0, 3, "cosine"),
        (True, 5, 4, 3, "cosine"),
        (True, 3, 4, 3, "cosine"),     # default-config shape: unfreeze==warmup
        (True, 5, 0, 2, "cosine"),     # instant unfreeze
        (True, 5, 4, 3, None),         # no scheduler
        (True, 2, 10, 5, "cosine"),    # unfreeze during warmup
    ])
    def test_vs_torch(self, learnable, unfreeze, rampup, warmup, sched):
        cfg = ExperimentConfig(
            epochs=20, lr=2e-2, basis_lr_ratio=0.05,
            spatial_learnable=learnable, basis_unfreeze_epoch=unfreeze,
            basis_lr_rampup_epochs=rampup, warmup_epochs=warmup,
            scheduler=sched)
        B = 4
        mlp, basis, rec = build_lr_tables(cfg, B)
        t_mlp, t_basis, t_rec = _torch_lr_timeline(cfg, B)
        assert np.allclose(mlp, t_mlp, rtol=1e-5, atol=1e-9)
        assert np.allclose(basis, t_basis, rtol=1e-5, atol=1e-9)
        assert np.allclose(rec, t_rec, rtol=1e-5, atol=1e-9)

    def test_default_config_shape(self):
        cfg = ExperimentConfig(epochs=500, lr=2e-2, warmup_epochs=10,
                               scheduler="cosine", spatial_learnable=True,
                               basis_unfreeze_epoch=10,
                               basis_lr_rampup_epochs=10, basis_lr_ratio=0.05)
        B = 16
        mlp, basis, _ = build_lr_tables(cfg, B)
        # warmup: first step uses full LR (reference quirk: warmup is applied
        # after each step, so step 0 sees the unscaled LR)
        assert np.isclose(mlp[0], 2e-2)
        assert np.isclose(mlp[1], 2e-2 * 1 / 160)
        # basis frozen during warmup epochs
        assert np.all(basis[: 10 * B] == 0.0)
        # unfreeze at epoch 10 at 10% of target
        assert np.isclose(basis[10 * B], 2e-2 * 0.05 * 0.1)
        # cosine floor: post-warmup mlp LR never below eta_min
        assert mlp[10 * B:].min() >= 2e-2 * 0.5 - 1e-9
