"""Pallas window-gather kernel + scanned inference path tests (CPU).

The Pallas kernel runs under the interpreter off-TPU; equality against the
XLA gather oracle validates the kernel logic, and the scanned inference
program is checked end-to-end against the plain batched forward.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from deepof_tpu.ops.pallas_kernels import (
    window_gather_standardize,
    window_gather_standardize_xla,
)


@pytest.mark.parametrize("t,window,block", [(300, 25, 64), (100, 10, 128)])
def test_pallas_window_kernel_interpret_matches_xla(t, window, block):
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(t, 12)).astype(np.float32))
    mu = jnp.asarray(rng.normal(size=(12,)).astype(np.float32))
    sd = jnp.asarray(np.abs(rng.normal(size=(12,))).astype(np.float32) + 0.5)

    got = window_gather_standardize(
        feats, mu, sd, window, block=block, interpret=True
    )
    want = window_gather_standardize_xla(feats, mu, sd, window)
    assert got.shape == (t - window + 1, window, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_rolling_windows_host_matches_loop():
    from deepof_tpu.ops.windows import rolling_windows_host

    rng = np.random.default_rng(1)
    arr = rng.normal(size=(50, 7)).astype(np.float32)
    for window, step in [(10, 1), (10, 3), (50, 1)]:
        got = rolling_windows_host(arr, window, step)
        starts = np.arange(0, 50 - window + 1, step)
        want = np.stack([arr[s : s + window] for s in starts])
        np.testing.assert_array_equal(got, want)
    assert rolling_windows_host(arr[:5], 10).shape == (0, 10, 7)


@pytest.mark.parametrize("model_name", ["VaDE", "VQVAE", "Contrastive"])
@pytest.mark.parametrize("use_pallas", [False, True])
def test_scanned_forward_matches_batched(model_name, use_pallas):
    """The single-dispatch scanned program == the plain batched forward."""
    import jax

    from deepof_tpu.models import build_model
    from deepof_tpu.train.harness import ModelBundle
    from deepof_tpu.train.inference import (
        _batched_forward,
        scanned_windowed_forward,
    )

    n, e, window = 4, 3, 8
    adj = np.zeros((n, n), np.float32)
    for i, j in [(0, 1), (1, 2), (2, 3)]:
        adj[i, j] = adj[j, i] = 1.0

    kwargs = dict(latent_dim=4, encoder_type="recurrent", use_gnn=True)
    if model_name != "Contrastive":
        kwargs["n_components"] = 3
    model = build_model(
        model_name, (window, n, 3), (window, e, 1), adj, **kwargs
    )
    half = window // 2
    xs = (window, n, 3) if model_name != "Contrastive" else (half, n, 3)
    as_ = (window, e, 1) if model_name != "Contrastive" else (half, e, 1)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        jnp.zeros((1,) + xs, jnp.float32), jnp.zeros((1,) + as_, jnp.float32),
        train=False,
    )
    spec = {
        "model": model_name, "input_shape": [window, n, 3],
        "edge_feature_shape": [window, e, 1], "use_angles": False,
    }
    bundle = ModelBundle(model=model, variables=variables, rebuild_spec=spec)

    t = 73  # odd length: exercises block padding + trim
    f = 3 * n + e
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(t, f)).astype(np.float32)
    layout = {
        "node": list(range(3 * n)), "edge": list(range(3 * n, f)),
        "angle": None,
    }

    # Contrastive operates on half-windows: the caller (embedding_per_video)
    # re-preprocesses at window // 2 and feeds each window whole, so the
    # scan window IS the half (reference model_utils_new.py:553).
    scan_window = half if model_name == "Contrastive" else window
    emb, sc = scanned_windowed_forward(
        bundle, feats, layout, scan_window, model_name, block=16,
        use_pallas=use_pallas, interpret=use_pallas,
    )

    # Oracle: host-materialized windows through the plain batched forward.
    from deepof_tpu.graph_dataset import reorder_and_reshape
    from deepof_tpu.ops.windows import rolling_windows_host

    w = rolling_windows_host(feats, scan_window)
    x_all = reorder_and_reshape(w[:, :, : 3 * n])
    a_all = w[:, :, 3 * n :][..., None]
    emb_ref, sc_ref = _batched_forward(bundle, x_all, a_all, model_name, 32)

    assert emb.shape == (t - scan_window + 1, 4)
    np.testing.assert_allclose(emb, emb_ref, rtol=2e-4, atol=1e-5)
    if model_name == "Contrastive":
        assert sc is None
    else:
        np.testing.assert_allclose(sc, sc_ref, rtol=2e-4, atol=1e-5)


def test_pallas_gru_matches_masked_scan():
    """ops/pallas_gru.gru_scan_pallas == the MaskedGRU lax.scan path
    (flax GRUCell math + masked-carry semantics), both directions, with
    trailing-padding masks — the DEEPOF_TPU_GRU_PALLAS experiment's
    correctness gate (interpret mode off-TPU)."""
    import jax

    from deepof_tpu.models.blocks import MaskedGRU

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(6, 9, 5)), jnp.float32)
    lengths = rng.integers(2, 10, 6)
    mask = jnp.asarray(np.arange(9)[None] < lengths[:, None])

    for reverse in (False, True):
        m = MaskedGRU(8, reverse=reverse)
        v = m.init(jax.random.PRNGKey(1), x, mask)
        out_scan, fin_scan = m.apply(v, x, mask)
        os.environ["DEEPOF_TPU_GRU_PALLAS"] = "1"
        try:
            out_pal, fin_pal = m.apply(v, x, mask)
        finally:
            del os.environ["DEEPOF_TPU_GRU_PALLAS"]
        np.testing.assert_allclose(out_pal, out_scan, atol=1e-6)
        np.testing.assert_allclose(fin_pal, fin_scan, atol=1e-6)
