"""Model-forward A/B parity vs the actual reference torch implementations.

For each architecture, instantiate the reference torch module (via
reference_shim), transplant its weights into the flax counterpart
(torch_to_flax), and assert eval-mode forward outputs agree within 1e-5 —
the north-star acceptance criterion (BASELINE.md) on the model side,
using the reference's own translation-test methodology
(deepof/clustering/*_translation_tests.ipynb).
"""

from __future__ import annotations

import os

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/deepof"),
    reason="upstream reference tree not available",
)

TOL = 1e-5
T, N, E = 10, 6, 7
EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (3, 5), (4, 5)]


def _adjacency():
    adj = np.zeros((N, N), np.float32)
    for i, j in EDGES:
        adj[i, j] = adj[j, i] = 1.0
    return adj


@pytest.fixture(scope="module")
def ref_models():
    from reference_shim import load_reference

    load_reference()
    import deepof.clustering.models_new as models_new

    return models_new


def _inputs(batch=4, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(batch, T, N, 3)).astype(np.float32)
    a = rng.normal(size=(batch, T, E, 1)).astype(np.float32)
    return x, a


def ref_stream_scramble(x: np.ndarray) -> np.ndarray:
    """The fixed (T, N, F)-block bijection hidden in the reference's
    tf_style_group_reshape (models_new.py:121-141).

    The reference's reshape chain permutes to (G*F, T, B) and then
    reinterprets the leading G*F axis TOGETHER with T as (F, T, G) — so
    its "per-node" streams receive features scrambled across nodes,
    channels, AND time steps (a TF->torch layout translation quirk; the
    edge stream has F=1 and T*E reinterpreted as (1, T, E) is the identity,
    so only the node stream is affected). Our encoders use the clean
    transpose split; feeding them this bijection of the input reproduces
    the reference bit-for-bit: ref_stream[b, g, t, f] ==
    clean_stream(scramble(x))[b, g, t, f]. Applies to BOTH the node and
    edge streams (for F=1 the (E, T) axes are still jointly reinterpreted
    as (T, E)).
    """
    b, t_len, n, f = x.shape
    out = np.empty_like(x)
    fp, tp, gp = np.meshgrid(
        np.arange(f), np.arange(t_len), np.arange(n), indexing="ij"
    )
    m = fp * t_len * n + tp * n + gp          # ref flat offset (f', t', g')
    i, t_src = np.divmod(m, t_len)            # m = i*T + t over (i, t)
    n_src, c_src = np.divmod(i, f)            # i = n*F + c (row-major)
    out[:, tp, gp, fp] = x[:, t_src, n_src, c_src]
    return out


@pytest.mark.parametrize("use_gnn", [False, True])
@pytest.mark.parametrize("latent_dim", [8, 80])
def test_recurrent_encoder_parity(ref_models, use_gnn, latent_dim):
    """latent 8 exercises the projection-skip branch (internal == latent);
    latent 80 exercises the 64-cap + projection branch."""
    import torch

    import jax.numpy as jnp

    from deepof_tpu.models.encoders import RecurrentEncoder
    from torch_to_flax import assign_tree, recurrent_encoder_params

    adj = _adjacency()
    torch.manual_seed(0)
    te = ref_models.RecurrentEncoderPT(
        input_shape=(T, N, 3),
        edge_feature_shape=(T, E, 1),
        adjacency_matrix=adj,
        latent_dim=latent_dim,
        use_gnn=use_gnn,
    ).eval()

    fe = RecurrentEncoder(latent_dim=latent_dim, adjacency=adj, use_gnn=use_gnn)
    x, a = _inputs()
    variables = fe.init(
        {"params": __import__("jax").random.PRNGKey(0)},
        jnp.asarray(x), jnp.asarray(a), train=False,
    )
    params = assign_tree(variables["params"], recurrent_encoder_params(te))

    with torch.no_grad():
        want = te(torch.from_numpy(x), torch.from_numpy(a)).numpy()
    # GNN mode: feed the scrambled layout the reference's stream split
    # actually consumes (see ref_stream_scramble).
    x_in = ref_stream_scramble(x) if use_gnn else x
    a_in = ref_stream_scramble(a) if use_gnn else a
    got = np.asarray(
        fe.apply({"params": params}, jnp.asarray(x_in), jnp.asarray(a_in))
    )

    assert got.shape == want.shape == (4, latent_dim)
    np.testing.assert_allclose(got, want, rtol=0, atol=TOL)


@pytest.mark.parametrize("use_gnn", [False, True])
def test_tcn_encoder_parity(ref_models, use_gnn):
    import torch

    import jax
    import jax.numpy as jnp

    from deepof_tpu.models.encoders import TCNEncoder
    from torch_to_flax import assign_tree, tcn_encoder_params

    adj = _adjacency()
    torch.manual_seed(1)
    te = ref_models.TCNEncoderPT(
        input_shape=(T, N, 3),
        edge_feature_shape=(T, E, 1),
        adjacency_matrix=adj,
        latent_dim=8,
        use_gnn=use_gnn,
    ).eval()
    # Perturb BN running stats away from the (0, 1) init so the transplant
    # is actually exercised.
    with torch.no_grad():
        for m in te.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.add_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.mul_(1.2)

    fe = TCNEncoder(latent_dim=8, adjacency=adj, use_gnn=use_gnn)
    x, a = _inputs(seed=1)
    variables = fe.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x), jnp.asarray(a), train=False,
    )
    with torch.no_grad():
        # First forward also builds the lazy CensNet params.
        want = te(torch.from_numpy(x), torch.from_numpy(a)).numpy()
    src_params, src_stats = tcn_encoder_params(te)
    params = assign_tree(variables["params"], src_params)
    stats = assign_tree(variables["batch_stats"], src_stats)
    x_in = ref_stream_scramble(x) if use_gnn else x
    a_in = ref_stream_scramble(a) if use_gnn else a
    got = np.asarray(fe.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x_in), jnp.asarray(a_in), train=False,
    ))
    assert got.shape == want.shape == (4, 8)
    np.testing.assert_allclose(got, want, rtol=0, atol=TOL)


@pytest.mark.parametrize("use_gnn", [False, True])
def test_transformer_encoder_parity(ref_models, use_gnn):
    import torch

    import jax
    import jax.numpy as jnp

    from deepof_tpu.models.encoders import TransformerEncoder
    from torch_to_flax import assign_tree, tfm_encoder_params

    adj = _adjacency()
    torch.manual_seed(2)
    te = ref_models.TFMEncoderPT(
        input_shape=(T, N, 3),
        edge_feature_shape=(T, E, 1),
        adjacency_matrix=adj,
        latent_dim=8,
        use_gnn=use_gnn,
    ).eval()
    with torch.no_grad():
        for m in te.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.add_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.mul_(1.2)

    fe = TransformerEncoder(latent_dim=8, adjacency=adj, use_gnn=use_gnn)
    x, a = _inputs(seed=2)
    variables = fe.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x), jnp.asarray(a), train=False,
    )
    with torch.no_grad():
        # First forward also builds the lazy CensNet params.
        want = te(torch.from_numpy(x), torch.from_numpy(a)).numpy()
    src_params, src_stats = tfm_encoder_params(te)
    params = assign_tree(variables["params"], src_params)
    stats = assign_tree(variables["batch_stats"], src_stats)
    x_in = ref_stream_scramble(x) if use_gnn else x
    a_in = ref_stream_scramble(a) if use_gnn else a
    got = np.asarray(fe.apply(
        {"params": params, "batch_stats": stats},
        jnp.asarray(x_in), jnp.asarray(a_in), train=False,
    ))
    assert got.shape == want.shape == (4, 8)
    np.testing.assert_allclose(got, want, rtol=0, atol=TOL)


def test_vqvae_full_model_parity(ref_models):
    """Full VQVAE forward (recurrent encoder, no GNN to keep the decoder
    target unscrambled): quantized latents, soft counts, and both
    reconstruction means match after weight transplant."""
    import torch

    import jax
    import jax.numpy as jnp

    from deepof_tpu.models import build_model
    from torch_to_flax import assign_tree, vqvae_model_params

    adj = _adjacency()
    torch.manual_seed(3)
    tm = ref_models.VQVAEPT(
        input_shape=(T, N, 3), edge_feature_shape=(T, E, 1),
        adjacency_matrix=adj, latent_dim=8, n_components=5,
        encoder_type="recurrent", use_gnn=False,
    ).eval()

    fm = build_model(
        "VQVAE", (T, N, 3), (T, E, 1), adj, latent_dim=8, n_components=5,
        encoder_type="recurrent", use_gnn=False,
    )
    x, a = _inputs(seed=3)
    variables = fm.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x), jnp.asarray(a),
        train=False,
    )
    params = assign_tree(variables["params"], vqvae_model_params(tm))

    with torch.no_grad():
        # reference returns (encoding_recon=dec(quantized), recon=dec(enc),
        # quantized, soft_counts, losses...)
        ref_out = tm(torch.from_numpy(x), torch.from_numpy(a),
                     return_losses=True, return_all_outputs=True)
    out = fm.apply({"params": params}, jnp.asarray(x), jnp.asarray(a),
                   train=False)

    np.testing.assert_allclose(
        np.asarray(out["quantized"]), ref_out[2].numpy(), rtol=0, atol=TOL
    )
    np.testing.assert_allclose(
        np.asarray(out["soft_counts"]), ref_out[3].numpy(), rtol=0, atol=TOL
    )
    np.testing.assert_allclose(
        np.asarray(out["quantized_reconstruction"].mean),
        ref_out[0].mean.numpy(), rtol=0, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["encoding_reconstruction"].mean),
        ref_out[1].mean.numpy(), rtol=0, atol=1e-4,
    )


def test_vade_full_model_parity(ref_models):
    """Full VaDE eval forward: latent, categorical posterior, and the
    reconstruction mean match after weight transplant."""
    import torch

    import jax
    import jax.numpy as jnp

    from deepof_tpu.models import build_model
    from torch_to_flax import assign_tree, vade_model_params

    adj = _adjacency()
    torch.manual_seed(4)
    tm = ref_models.VaDEPT(
        input_shape=(T, N, 3), edge_feature_shape=(T, E, 1),
        adjacency_matrix=adj, latent_dim=8, n_components=5,
        encoder_type="recurrent", use_gnn=False,
    ).eval()

    fm = build_model(
        "VaDE", (T, N, 3), (T, E, 1), adj, latent_dim=8, n_components=5,
        encoder_type="recurrent", use_gnn=False,
    )
    x, a = _inputs(seed=4)
    variables = fm.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x), jnp.asarray(a),
        train=False,
    )
    params = assign_tree(variables["params"], vade_model_params(tm))

    with torch.no_grad():
        recon_dist, latent, categorical, _ = tm(
            torch.from_numpy(x), torch.from_numpy(a)
        )
    out = fm.apply({"params": params}, jnp.asarray(x), jnp.asarray(a),
                   train=False)

    np.testing.assert_allclose(
        np.asarray(out["latent"]), latent.numpy(), rtol=0, atol=TOL
    )
    np.testing.assert_allclose(
        np.asarray(out["categorical"]), categorical.numpy(), rtol=0, atol=TOL
    )
    np.testing.assert_allclose(
        np.asarray(out["reconstruction"].mean), recon_dist.mean.numpy(),
        rtol=0, atol=1e-4,
    )


@pytest.mark.parametrize("encoder_type", ["TCN", "transformer"])
def test_vqvae_full_model_parity_other_encoders(ref_models, encoder_type):
    """Full VQVAE forward parity for the TCN and transformer families
    (covers TCNDecoderPT / TFMDecoderPT transplants)."""
    import torch

    import jax
    import jax.numpy as jnp

    from deepof_tpu.models import build_model
    from torch_to_flax import assign_tree, vqvae_model_params_typed

    adj = _adjacency()
    torch.manual_seed(5)
    tm = ref_models.VQVAEPT(
        input_shape=(T, N, 3), edge_feature_shape=(T, E, 1),
        adjacency_matrix=adj, latent_dim=8, n_components=5,
        encoder_type=encoder_type, use_gnn=False,
    ).eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.add_(torch.randn_like(m.running_mean) * 0.1)
                m.running_var.mul_(1.2)

    fm = build_model(
        "VQVAE", (T, N, 3), (T, E, 1), adj, latent_dim=8, n_components=5,
        encoder_type=encoder_type, use_gnn=False,
    )
    x, a = _inputs(seed=5)
    variables = fm.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.asarray(x), jnp.asarray(a), train=False,
    )
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x), torch.from_numpy(a),
                     return_losses=True, return_all_outputs=True)
    src_params, src_stats = vqvae_model_params_typed(tm, encoder_type)
    params = assign_tree(variables["params"], src_params)
    apply_vars = {"params": params}
    if "batch_stats" in variables:
        apply_vars["batch_stats"] = assign_tree(
            variables["batch_stats"], src_stats
        )
    out = fm.apply(apply_vars, jnp.asarray(x), jnp.asarray(a), train=False)

    np.testing.assert_allclose(
        np.asarray(out["quantized"]), ref_out[2].numpy(), rtol=0, atol=TOL
    )
    np.testing.assert_allclose(
        np.asarray(out["quantized_reconstruction"].mean),
        ref_out[0].mean.numpy(), rtol=0, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["encoding_reconstruction"].mean),
        ref_out[1].mean.numpy(), rtol=0, atol=1e-4,
    )
