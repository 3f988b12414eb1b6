"""TURTLE teacher tests: standalone fit, GMM init from tau*, and the
teacher-distilled VaDE path with mid-training refresh."""

import numpy as np
import pytest

from deepof_tpu.core.table_dict import TableDict
from deepof_tpu.train.config import CommonFitCfg, TurtleTeacherCfg
from deepof_tpu.train.dataset import WindowDataset
from deepof_tpu.train.harness import train_deepof_model
from deepof_tpu.train.teacher import (
    fit_turtle_teacher,
    initialize_gmm_from_teacher,
)

N, E, W = 6, 7, 8
EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (3, 5), (4, 5)]


def _adjacency():
    adj = np.zeros((N, N), dtype=np.float32)
    for i, j in EDGES:
        adj[i, j] = adj[j, i] = 1.0
    return adj


def _preprocessed(n_train=48, seed=0):
    rng = np.random.default_rng(seed)

    def mk(n):
        return (
            rng.normal(size=(n, W, 3 * N)).astype(np.float32),
            rng.normal(size=(n, W, E)).astype(np.float32),
            np.zeros((n, W, 0), np.float32),
        )

    return (
        TableDict({"v1": mk(n_train)}, typ="merged"),
        TableDict({"v2": mk(16)}, typ="merged"),
    )


def test_fit_turtle_teacher_shapes():
    train, _ = _preprocessed(n_train=64)
    ds = WindowDataset(train)
    rng = np.random.default_rng(0)
    latents = rng.normal(size=(len(ds), 4)).astype(np.float32)
    common = CommonFitCfg(n_components=3, latent_dim=4, batch_size=16)
    tcfg = TurtleTeacherCfg(
        use_turtle_teacher=True, teacher_outer_steps=6,
        teacher_inner_steps=3, teacher_batch_size=32,
    )
    tau, cw = fit_turtle_teacher(latents, ds, common, tcfg, verbose=False)
    assert tau.shape == (len(ds), 3)
    np.testing.assert_allclose(tau.sum(1), 1.0, rtol=1e-4)
    if cw is not None:
        assert cw.shape == (3,) and np.isfinite(cw).all()


def test_initialize_gmm_from_teacher():
    rng = np.random.default_rng(1)
    z = np.concatenate([
        rng.normal(-3, 0.2, (60, 4)), rng.normal(3, 0.2, (60, 4)),
    ]).astype(np.float32)
    tau = np.zeros((120, 2), np.float32)
    tau[:60, 0] = 1.0
    tau[60:, 1] = 1.0
    means, log_vars, prior = initialize_gmm_from_teacher(z, tau)
    assert means.shape == (2, 4) and log_vars.shape == (2, 4)
    got = sorted(float(m) for m in means.mean(1))
    assert got[0] < -2.5 and got[1] > 2.5
    np.testing.assert_allclose(np.asarray(prior).sum(), 1.0, rtol=1e-5)


@pytest.mark.slow
def test_vade_best_score_checkpoint():
    """Distilled VaDE tracks a separate best-score model (the reference's
    second return value; training.py:1196-1248, 1252-1255)."""
    train, test = _preprocessed()
    adj = _adjacency()
    bundle, bundle_score, _, _ = train_deepof_model(
        ((train, test), {}, adj), adjacency_matrix=adj, model_name="VaDE",
        encoder_type="recurrent", batch_size=16, latent_dim=4, epochs=6,
        n_clusters=3, pretrain_epochs=0, save_weights=False, verbose=False,
        limit_train_batches=1, limit_val_batches=1,
        use_turtle_teacher=True,
        teacher_outer_steps=4, teacher_inner_steps=2, teacher_batch_size=32,
    )
    # Score history is recorded on the main phase's validation logs.
    assert "val_alignment_score" in bundle.history
    scores = bundle.history["val_alignment_score"]
    assert len(scores) == 6 and all(0.0 <= s <= 1.0 for s in scores)
    # Best-score snapshot exists (score can only be tracked after
    # max(3, ceil(0.1*epochs)) epochs, so 6 epochs guarantee a window).
    assert bundle_score is not None
    assert 0.0 <= bundle_score.best_score <= 1.0
    x = np.random.default_rng(0).normal(size=(2, W, N, 3)).astype(np.float32)
    a = np.random.default_rng(1).normal(size=(2, W, E, 1)).astype(np.float32)
    q = np.asarray(bundle_score.group(x, a))
    np.testing.assert_allclose(q.sum(1), 1.0, rtol=1e-4)


@pytest.mark.slow
def test_vade_with_teacher_and_refresh():
    """Distilled VaDE trains end-to-end with a mid-training TURTLE refresh
    and GMM reinit (training.py:1770-1810)."""
    train, test = _preprocessed()
    adj = _adjacency()
    bundle, _, _, summary = train_deepof_model(
        ((train, test), {}, adj), adjacency_matrix=adj, model_name="VaDE",
        encoder_type="recurrent", batch_size=16, latent_dim=4, epochs=2,
        n_clusters=3, pretrain_epochs=0, save_weights=False, verbose=False,
        limit_train_batches=2, limit_val_batches=1,
        use_turtle_teacher=True,
        teacher_outer_steps=4, teacher_inner_steps=2, teacher_batch_size=32,
        teacher_refresh_every=1, teacher_freeze_at=None,
        reinit_gmm_on_refresh=True,
    )
    assert any("total_loss" in k for k in summary)
    assert all(
        np.isfinite(v) for v in summary.values() if isinstance(v, float)
    )
