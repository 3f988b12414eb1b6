"""Orbax checkpoint/resume tests for the training harness."""

import os

import numpy as np
import pytest

from deepof_tpu.core.table_dict import TableDict
from deepof_tpu.train.checkpoint import TrainCheckpointer, maybe_resume
from deepof_tpu.train.harness import train_deepof_model

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

    train = TableDict({"v1": mk(n_train)}, typ="merged")
    return train, TableDict({}, typ="merged")


def test_checkpointer_roundtrip(tmp_path):
    import jax.numpy as jnp
    import optax

    params = {"w": jnp.arange(6.0).reshape(2, 3)}
    tx = optax.adam(1e-3)
    state = {"params": params, "opt_state": tx.init(params), "rest": {}}

    with TrainCheckpointer(str(tmp_path / "ckpt"), max_to_keep=2) as ck:
        st = dict(state)
        st["epoch"] = 0
        assert ck.save(0, st)
        st["epoch"] = 1
        st["params"] = {"w": params["w"] + 1.0}
        assert ck.save(1, st)

    ck2 = TrainCheckpointer(str(tmp_path / "ckpt"))
    assert ck2.latest_epoch() == 1
    start, restored = maybe_resume(ck2, state)
    assert start == 2
    np.testing.assert_allclose(
        np.asarray(restored["params"]["w"]), np.arange(6.0).reshape(2, 3) + 1.0
    )
    ck2.close()


@pytest.mark.slow
def test_save_interval(tmp_path):
    import jax.numpy as jnp

    state = {"params": {"w": jnp.zeros(2)}, "epoch": 0}
    with TrainCheckpointer(str(tmp_path), save_interval_epochs=2) as ck:
        assert not ck.save(0, state)     # (0+1) % 2 != 0
        assert ck.save(1, state)
        assert ck.save(0, state, force=True)


@pytest.mark.parametrize("model_name", ["VQVAE", "VaDE"])
@pytest.mark.slow
def test_fit_resume(tmp_path, model_name):
    """Interrupted fit resumes from the last epoch and matches params of an
    uninterrupted run's structure (exact values differ via data order)."""
    train, test = _preprocessed()
    adj = _adjacency()
    ckdir = str(tmp_path / "run_ck")
    kw = dict(
        adjacency_matrix=adj, model_name=model_name,
        encoder_type="recurrent", batch_size=16, latent_dim=4,
        n_clusters=3, save_weights=False, verbose=False,
        limit_train_batches=2, checkpoint_dir=ckdir,
    )
    if model_name == "VaDE":
        kw["pretrain_epochs"] = 0

    # "Interrupted" run: 1 epoch saved.
    train_deepof_model(((train, test), {}, adj), epochs=1, **kw)
    ck = TrainCheckpointer(ckdir)
    assert ck.latest_epoch() == 0
    ck.close()

    # Resumed run asks for 2 epochs: only epoch 1 executes, checkpoint
    # advances, and history holds exactly the resumed epoch.
    bundle, _, _, _ = train_deepof_model(((train, test), {}, adj), epochs=2, **kw)
    ck = TrainCheckpointer(ckdir)
    assert ck.latest_epoch() == 1
    ck.close()
    tl = [k for k in bundle.history if k.endswith("total_loss")]
    assert tl and len(bundle.history[tl[0]]) == 1
    if model_name == "VaDE":
        # Post-GMM-init snapshot saved alongside the epoch checkpoints.
        assert os.path.exists(os.path.join(ckdir, "teacher_init.pkl"))


@pytest.mark.slow
def test_best_val_snapshot(tmp_path):
    """Best-val variables are tracked and saved as a *_best.ckpt."""
    from deepof_tpu.train.harness import ModelBundle

    train, test = _preprocessed()
    test = TableDict({"v2": train["v1"]}, typ="merged")
    bundle, _, _, _ = train_deepof_model(
        ((train, test), {}, _adjacency()), adjacency_matrix=_adjacency(),
        model_name="VQVAE", encoder_type="recurrent", batch_size=16,
        latent_dim=4, epochs=2, n_clusters=3, verbose=False,
        limit_train_batches=2, limit_val_batches=1,
        save_weights=True, output_path=str(tmp_path),
    )
    assert bundle.best_variables is not None
    assert np.isfinite(bundle.best_val)
    best_files = [f for f in os.listdir(tmp_path / "models") if f.endswith("_best.ckpt")]
    assert len(best_files) == 1
    restored = ModelBundle.load(str(tmp_path / "models" / best_files[0]))
    assert restored.rebuild_spec["model"] == "VQVAE"
