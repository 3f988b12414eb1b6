"""Model regression tests with auto-created golden baselines.

Mirrors the reference strategy (tests/regression/test_model_regression.py
in mlfpm/deepof): train each model family for a few epochs with pinned
seeds on a fixed synthetic dataset, summarize losses / embedding statistics
/ parameter norms into a DataFrame, and compare against a CSV baseline that
is auto-created on first run (cached by CI) with loose tolerances.
"""

import os

import numpy as np
import pandas as pd
import pytest

import jax

from deepof_tpu.core.table_dict import TableDict
from deepof_tpu.train.harness import train_deepof_model

BASELINE_DIR = os.path.join(os.path.dirname(__file__), "baselines")
N, E, W = 6, 7, 8
EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (3, 5), (4, 5)]
RTOL = 2e-2
ATOL = 2e-2


def _adjacency():
    adj = np.zeros((N, N), dtype=np.float32)
    for i, j in EDGES:
        adj[i, j] = adj[j, i] = 1.0
    return adj


def _dataset(seed=11):
    rng = np.random.default_rng(seed)

    def mk(n):
        return (
            rng.normal(size=(n, W, 3 * N)).astype(np.float32),
            rng.normal(size=(n, W, E)).astype(np.float32),
            np.zeros((n, W, 0), np.float32),
        )

    train = TableDict({"v1": mk(32), "v2": mk(32)}, typ="merged")
    test = TableDict({"v3": mk(16)}, typ="merged")
    return train, test


def _param_norm(variables):
    flat, _ = jax.tree_util.tree_flatten(variables["params"])
    return float(np.sqrt(sum(float((np.asarray(p) ** 2).sum()) for p in flat)))


def _summarize(model_name, bundle, summary):
    rng = np.random.default_rng(3)
    x = rng.normal(size=(8, W, N, 3)).astype(np.float32)
    a = rng.normal(size=(8, W, E, 1)).astype(np.float32)
    if model_name == "Contrastive":
        z = np.asarray(bundle.encode(x[:, : W // 2], a[:, : W // 2]))
    else:
        z = np.asarray(bundle.embed(x, a))
    row = {
        "param_norm": _param_norm(bundle.variables),
        "emb_mean": float(z.mean()),
        "emb_std": float(z.std()),
        "emb_abs_max": float(np.abs(z).max()),
    }
    sim = z @ z.T
    row["emb_sim_trace"] = float(np.trace(sim))
    for key in ("total_loss", "val_total_loss", "reconstruct_loss"):
        if key in summary and summary[key] is not None:
            row[f"last_{key}"] = float(summary[key])
    return row


@pytest.mark.parametrize("model_name", ["VQVAE", "VaDE", "Contrastive"])
def test_model_regression(model_name):
    train, test = _dataset()
    adj = _adjacency()
    kwargs = dict(
        adjacency_matrix=adj, model_name=model_name, encoder_type="recurrent",
        batch_size=16, latent_dim=4, epochs=2, n_clusters=3,
        save_weights=False, verbose=False, random_seed=7,
        limit_train_batches=2, limit_val_batches=1,
    )
    if model_name == "VaDE":
        kwargs["pretrain_epochs"] = 1
    bundle, _, _, summary = train_deepof_model(((train, test), {}, adj), **kwargs)

    row = _summarize(model_name, bundle, summary)
    current = pd.DataFrame([row], index=[model_name])

    os.makedirs(BASELINE_DIR, exist_ok=True)
    baseline_path = os.path.join(BASELINE_DIR, f"{model_name}.csv")
    if not os.path.exists(baseline_path):
        current.to_csv(baseline_path)
        pytest.skip(f"Baseline created at {baseline_path}; rerun to verify.")

    baseline = pd.read_csv(baseline_path, index_col=0)
    shared = [c for c in current.columns if c in baseline.columns]
    np.testing.assert_allclose(
        current[shared].to_numpy(float),
        baseline[shared].to_numpy(float),
        rtol=RTOL,
        atol=ATOL,
        err_msg=f"{model_name} drifted from the golden baseline",
    )
