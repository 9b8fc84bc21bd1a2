"""Pallas basis-kernel parity vs the jnp reference implementation.

On CPU the kernel runs in Pallas interpret mode (bit-faithful semantics,
no Mosaic compile); on a real TPU the same tests exercise the compiled
kernel. Forward values and all three gradient groups are compared."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import st_dadk_tpu.ops.pallas_basis as pb
from st_dadk_tpu.ops.basis import spatial_basis_embed

ON_TPU = jax.default_backend() == "tpu"


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    if not ON_TPU:
        try:
            from jax.experimental.pallas import tpu as pltpu
        except Exception:
            pytest.skip("pallas tpu backend unavailable")
        ctx = pltpu.force_tpu_interpret_mode()
        ctx.__enter__()
        yield
        ctx.__exit__(None, None, None)
    else:
        yield


def _case(n=300, k=227, seed=0):
    rng = np.random.default_rng(seed)
    coords = rng.uniform(size=(n, 2)).astype(np.float32)
    centers = rng.uniform(size=(k, 2)).astype(np.float32)
    bw = rng.uniform(0.1, 0.8, size=(k,)).astype(np.float32)
    return (jnp.asarray(coords), jnp.asarray(centers), jnp.asarray(bw))


@pytest.mark.parametrize("basis", ["wendland", "gaussian", "triangular"])
def test_forward_parity(basis):
    coords, centers, bw = _case()
    got = pb.spatial_basis_embed_pallas(coords, centers, bw, basis)
    want = spatial_basis_embed(coords, centers, bw, basis)
    assert got.shape == want.shape
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-6)


@pytest.mark.parametrize("basis", ["wendland", "gaussian"])
def test_gradient_parity(basis):
    coords, centers, bw = _case(n=128, k=96, seed=1)

    def loss_pallas(coords, centers, bw):
        return jnp.sum(jnp.sin(
            pb.spatial_basis_embed_pallas(coords, centers, bw, basis)))

    def loss_ref(coords, centers, bw):
        return jnp.sum(jnp.sin(spatial_basis_embed(coords, centers, bw, basis)))

    g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(coords, centers, bw)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(coords, centers, bw)
    for gp, gr, name in zip(g_p, g_r, ("coords", "centers", "bandwidths")):
        assert np.allclose(np.asarray(gp), np.asarray(gr),
                           atol=5e-4, rtol=5e-3), name


def test_triangular_gradient_parity():
    # triangular has a kink at r=1; compare away from the boundary
    coords, centers, bw = _case(n=64, k=32, seed=2)
    bw = bw + 2.0  # keep r well below 1

    def lp(c):
        return jnp.sum(pb.spatial_basis_embed_pallas(coords, c, bw,
                                                     "triangular"))

    def lr(c):
        return jnp.sum(spatial_basis_embed(coords, c, bw, "triangular"))

    assert np.allclose(np.asarray(jax.grad(lp)(centers)),
                       np.asarray(jax.grad(lr)(centers)),
                       atol=5e-4, rtol=5e-3)


def test_zero_distance_gradient_finite():
    # a center exactly on a data point must not produce NaN grads
    coords = jnp.asarray([[0.5, 0.5], [0.1, 0.9]], jnp.float32)
    centers = jnp.asarray([[0.5, 0.5], [0.7, 0.7]], jnp.float32)
    bw = jnp.asarray([0.3, 0.3], jnp.float32)

    g = jax.grad(lambda c: jnp.sum(
        pb.spatial_basis_embed_pallas(coords, c, bw, "wendland")))(centers)
    assert np.isfinite(np.asarray(g)).all()


def test_non_tile_aligned_shapes():
    coords, centers, bw = _case(n=100, k=37, seed=3)
    got = pb.spatial_basis_embed_pallas(coords, centers, bw, "wendland")
    want = spatial_basis_embed(coords, centers, bw, "wendland")
    assert got.shape == (100, 37)
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-6)
