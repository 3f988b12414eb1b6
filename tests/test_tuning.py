"""Hyperparameter-search tests (random search + successive halving)."""

import numpy as np
import pytest

from deepof_tpu.core.table_dict import TableDict
from deepof_tpu.train.tuning import _sample, tune_deepof_model

N, E, W = 6, 7, 8
EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (3, 5), (4, 5)]


def _adjacency():
    adj = np.zeros((N, N), dtype=np.float32)
    for i, j in EDGES:
        adj[i, j] = adj[j, i] = 1.0
    return adj


def _preprocessed(n_train=32, n_test=16, seed=0):
    rng = np.random.default_rng(seed)

    def mk(n):
        return (
            rng.normal(size=(n, W, 3 * N)).astype(np.float32),
            rng.normal(size=(n, W, E)).astype(np.float32),
            np.zeros((n, W, 0), np.float32),
        )

    return (
        TableDict({"v1": mk(n_train)}, typ="merged"),
        TableDict({"v3": mk(n_test)}, typ="merged"),
    )


def test_sample_grammar():
    rng = np.random.default_rng(0)
    space = {
        "choice": [1, 2, 3],
        "flt": {"low": 0.1, "high": 0.2},
        "lg": {"low": 1e-4, "high": 1e-1, "log": True},
        "num": {"low": 2, "high": 8, "int": True},
    }
    for _ in range(20):
        s = _sample(space, rng)
        assert s["choice"] in (1, 2, 3)
        assert 0.1 <= s["flt"] <= 0.2
        assert 1e-4 <= s["lg"] <= 1e-1
        assert isinstance(s["num"], int) and 2 <= s["num"] <= 8


@pytest.mark.slow
def test_random_search_vqvae():
    train, test = _preprocessed()
    adj = _adjacency()
    result = tune_deepof_model(
        ((train, test), {}, adj), adj,
        search_space={"latent_dim": [4], "learning_rate": {"low": 1e-4, "high": 1e-2, "log": True}},
        n_trials=2, epochs_per_trial=1, seed=1,
        model_name="VQVAE", encoder_type="recurrent", batch_size=16,
        n_clusters=3, limit_train_batches=2, limit_val_batches=1,
        use_optuna=False, verbose=False,
    )
    assert len(result["trials"]) == 2
    assert result["best_value"] == min(t["value"] for t in result["trials"])
    assert result["best_params"]["latent_dim"] == 4


@pytest.mark.slow
def test_successive_halving(tmp_path):
    train, test = _preprocessed()
    adj = _adjacency()
    result = tune_deepof_model(
        ((train, test), {}, adj), adj,
        search_space={"learning_rate": {"low": 1e-4, "high": 1e-2, "log": True}},
        n_trials=2, epochs_per_trial=2, seed=2,
        halving=True, trial_dir=str(tmp_path),
        model_name="VQVAE", encoder_type="recurrent", batch_size=16,
        latent_dim=4, n_clusters=3, limit_train_batches=2, limit_val_batches=1,
        use_optuna=False, verbose=False,
    )
    assert np.isfinite(result["best_value"])
    # The winner ran the full epoch budget (resumed via checkpoints).
    winners = [t for t in result["trials"] if t["epochs"] == 2]
    assert winners
