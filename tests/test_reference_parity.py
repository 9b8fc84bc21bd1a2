"""Golden parity vs the actual reference implementation.

The reference PyTorch package (mounted read-only at /root/reference) is used
purely as a numerical oracle: we inject OUR initialized parameters into THEIR
model and require identical forward values. This pins down the exact-match
parity tier promised in SURVEY.md section 7.3(a): same params + same inputs
=> same outputs/losses. Skipped when the reference mount is absent.
"""
import sys
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
torch = pytest.importorskip("torch")

REF = Path("/root/reference")
if not (REF / "stnf").exists():
    pytest.skip("reference mount not available", allow_module_level=True)
sys.path.insert(0, str(REF))

import jax.numpy as jnp  # noqa: E402

from st_dadk_tpu.models.st_interp import (  # noqa: E402
    ModelSpec, forward, init_model)
from st_dadk_tpu.ops.losses import (  # noqa: E402
    multi_quantile_loss, non_crossing_penalty, p_nc_delta_penalty)


def _make_pair(output_dim=1, use_delta=False, learnable=False,
               basis="wendland", seed=0):
    """Build (jax spec/params/consts, torch model with identical weights)."""
    from stnf.models.st_interp import STInterpMLP

    spec = ModelSpec(k_spatial_centers=(9, 16), k_temporal_centers=(4, 6),
                     hidden_dims=(24, 12), dropout=0.0, layernorm=True,
                     spatial_basis_function=basis, spatial_learnable=learnable,
                     output_dim=output_dim,
                     use_delta_reparameterization=use_delta)
    params, consts = init_model(jax.random.PRNGKey(seed), spec)

    tm = STInterpMLP(p=0, k_spatial_centers=[9, 16], k_temporal_centers=[4, 6],
                     hidden_dims=[24, 12], dropout=0.0, layernorm=True,
                     spatial_learnable=learnable,
                     spatial_basis_function=basis,
                     output_dim=output_dim,
                     use_delta_reparameterization=use_delta)
    sd = tm.state_dict()

    t = lambda x: torch.tensor(np.asarray(x))
    if learnable:
        sd["spatial_basis.centers"] = t(params["basis"]["centers"])
        sd["spatial_basis.log_bandwidths"] = t(params["basis"]["log_bandwidths"])
        sd["spatial_basis.centers_init"] = t(consts["spatial_centers_init"])
    else:
        sd["spatial_basis.centers"] = t(consts["spatial_centers_init"])
        sd["spatial_basis._bandwidths"] = t(consts["spatial_bandwidths_init"])
    sd["temporal_basis.centers"] = t(consts["temporal_centers"])
    sd["temporal_basis.bandwidths"] = t(consts["temporal_bandwidths"])

    prefix = "mlp_trunk" if (use_delta and output_dim > 1) else "mlp"
    mlp = params["mlp"]
    # Sequential layout with dropout=0: [Linear, LayerNorm, ReLU] per hidden
    # (the reference omits the Dropout module when dropout == 0)
    stride = 3
    for i in range(2):
        sd[f"{prefix}.{stride*i}.weight"] = t(mlp[f"linear_{i}"]["w"]).T.contiguous()
        sd[f"{prefix}.{stride*i}.bias"] = t(mlp[f"linear_{i}"]["b"])
        sd[f"{prefix}.{stride*i+1}.weight"] = t(mlp[f"ln_{i}"]["scale"])
        sd[f"{prefix}.{stride*i+1}.bias"] = t(mlp[f"ln_{i}"]["bias"])
    if use_delta and output_dim > 1:
        for k in range(output_dim):
            sd[f"delta_params.{k}"] = t(mlp["delta"][k])
    else:
        sd[f"mlp.{stride*2}.weight"] = t(mlp["out"]["w"]).T.contiguous()
        sd[f"mlp.{stride*2}.bias"] = t(mlp["out"]["b"])

    tm.load_state_dict(sd)
    tm.eval()
    return spec, params, consts, tm


def _inputs(n=64, seed=1):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(size=(n, 2)).astype(np.float32)
    tt = rng.uniform(size=(n, 1)).astype(np.float32)
    return coords, tt


@pytest.mark.parametrize("basis", ["wendland", "gaussian", "triangular"])
def test_forward_parity_mean(basis):
    spec, params, consts, tm = _make_pair(basis=basis)
    coords, tt = _inputs()
    ours = np.asarray(forward(spec, params, consts, None,
                              jnp.asarray(coords), jnp.asarray(tt)))
    with torch.no_grad():
        theirs = tm(torch.zeros(64, 0), torch.tensor(coords),
                    torch.tensor(tt)).numpy()
    assert np.allclose(ours, theirs, atol=2e-5), np.abs(ours - theirs).max()


def test_forward_parity_multiquantile_direct():
    spec, params, consts, tm = _make_pair(output_dim=5)
    coords, tt = _inputs(128, 2)
    ours = np.asarray(forward(spec, params, consts, None,
                              jnp.asarray(coords), jnp.asarray(tt)))
    with torch.no_grad():
        theirs = tm(torch.zeros(128, 0), torch.tensor(coords),
                    torch.tensor(tt)).numpy()
    assert ours.shape == theirs.shape == (128, 5)
    assert np.allclose(ours, theirs, atol=2e-5)


def test_forward_parity_delta_head():
    spec, params, consts, tm = _make_pair(output_dim=5, use_delta=True)
    coords, tt = _inputs(96, 3)
    ours = np.asarray(forward(spec, params, consts, None,
                              jnp.asarray(coords), jnp.asarray(tt)))
    with torch.no_grad():
        theirs = tm(torch.zeros(96, 0), torch.tensor(coords),
                    torch.tensor(tt)).numpy()
    assert np.allclose(ours, theirs, atol=2e-5), np.abs(ours - theirs).max()


def test_forward_parity_learnable_basis():
    spec, params, consts, tm = _make_pair(learnable=True)
    coords, tt = _inputs(64, 4)
    ours = np.asarray(forward(spec, params, consts, None,
                              jnp.asarray(coords), jnp.asarray(tt)))
    with torch.no_grad():
        theirs = tm(torch.zeros(64, 0), torch.tensor(coords),
                    torch.tensor(tt)).numpy()
    assert np.allclose(ours, theirs, atol=2e-5)


def test_loss_parity_multiquantile_with_penalties():
    """Composite multi-quantile loss + prediction-level non-crossing penalty
    and P_nc(delta) against the reference's loss functions."""
    sys.path.insert(0, str(REF / "scripts"))
    import importlib
    ref_train = importlib.import_module("train_st_interp")

    rng = np.random.default_rng(5)
    preds = rng.normal(size=(32, 5)).astype(np.float32)
    y = rng.normal(size=(32, 1)).astype(np.float32)
    qs = [0.05, 0.25, 0.5, 0.75, 0.95]

    ours = float(multi_quantile_loss(jnp.asarray(preds), jnp.asarray(y),
                                     jnp.asarray(qs)))
    tp, ty = torch.tensor(preds), torch.tensor(y)
    theirs = float(torch.mean(torch.stack(
        [ref_train.quantile_loss(tp[:, i:i+1], ty, q)
         for i, q in enumerate(qs)])))
    assert np.isclose(ours, theirs, atol=1e-6)

    ours_nc = float(non_crossing_penalty(jnp.asarray(preds), "mean", 2))
    theirs_nc = float(ref_train.non_crossing_penalty(tp, "mean", 2))
    assert np.isclose(ours_nc, theirs_nc, atol=1e-5)

    delta = rng.normal(size=(5, 13)).astype(np.float32)
    ours_d = float(p_nc_delta_penalty(jnp.asarray(delta)))
    theirs_d = float(ref_train.compute_p_nc_delta_penalty(
        [torch.tensor(delta[k]) for k in range(5)]))
    assert np.isclose(ours_d, theirs_d, atol=1e-5)

    # CRPS
    from st_dadk_tpu.ops.losses import compute_crps_multi_quantile
    ours_c = compute_crps_multi_quantile(preds, y, qs)
    theirs_c = ref_train.compute_crps_multi_quantile(preds, y, qs)
    assert np.isclose(ours_c, theirs_c, atol=1e-7)
