"""Training harness tests: losses, schedules, datasets, short fits."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepof_tpu.core.table_dict import TableDict
from deepof_tpu.train.augment import (
    build_rotation_precomp,
    make_augmented_view,
    recompute_edges,
    slice_time_per_sample,
)
from deepof_tpu.train.config import ContrastiveCfg
from deepof_tpu.train.dataset import WindowDataset
from deepof_tpu.train.harness import ModelBundle, train_deepof_model
from deepof_tpu.train.losses import (
    _off_diagonal,
    nce_loss,
    select_contrastive_loss,
    cosine_similarity_matrix,
)
from deepof_tpu.train.schedules import WeightSchedule

N, E, W = 6, 7, 8
EDGES = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (3, 5), (4, 5)]


def _adjacency():
    adj = np.zeros((N, N), dtype=np.float32)
    for i, j in EDGES:
        adj[i, j] = adj[j, i] = 1.0
    return adj


def _preprocessed(n_train=48, n_test=24, seed=0):
    rng = np.random.default_rng(seed)

    def mk(n):
        return (
            rng.normal(size=(n, W, 3 * N)).astype(np.float32),
            rng.normal(size=(n, W, E)).astype(np.float32),
            np.zeros((n, W, 0), np.float32),
        )

    train = TableDict({"v1": mk(n_train // 2), "v2": mk(n_train // 2)}, typ="merged")
    test = TableDict({"v3": mk(n_test)}, typ="merged")
    return train, test


# --------------------------------------------------------------------- #
# losses / schedules
# --------------------------------------------------------------------- #


def test_off_diagonal_static_trick():
    sim = jnp.arange(16.0).reshape(4, 4)
    out = np.asarray(_off_diagonal(sim))
    expected = np.array(
        [[1, 2, 3], [4, 6, 7], [8, 9, 11], [12, 13, 14]], dtype=float
    )
    np.testing.assert_array_equal(out, expected)


def test_nce_loss_identical_views_low_loss():
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    loss_same, pos, neg = nce_loss(z, z, cosine_similarity_matrix)
    other = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    loss_rand, _, _ = nce_loss(z, other, cosine_similarity_matrix)
    assert float(loss_same) < float(loss_rand)
    assert float(pos) > float(neg)


@pytest.mark.parametrize("loss_fn", ["nce", "dcl", "fc", "hard_dcl"])
@pytest.mark.parametrize("similarity", ["cosine", "dot", "euclidean"])
def test_contrastive_losses_finite(loss_fn, similarity):
    rng = np.random.default_rng(1)
    # Row-normalized, as in the train step (embeddings are normalized
    # before the loss; raw dot products would overflow exp at temp=0.1).
    h = rng.normal(size=(12, 6)).astype(np.float32)
    f = rng.normal(size=(12, 6)).astype(np.float32)
    h = jnp.asarray(h / np.linalg.norm(h, axis=1, keepdims=True))
    f = jnp.asarray(f / np.linalg.norm(f, axis=1, keepdims=True))
    loss, pos, neg = select_contrastive_loss(
        h, f, similarity=similarity, loss_fn=loss_fn
    )
    assert np.isfinite(float(loss))


def test_weight_schedule_shapes():
    s = WeightSchedule(
        n_batches_per_epoch=10, mode="linear", warmup_epochs=2,
        max_weight=1.0, cooldown_epochs=2, end_weight=0.5,
    )
    assert s.weight_at(0) == 0.0
    assert abs(s.weight_at(20) - 1.0) < 1e-9
    assert abs(s.weight_at(40) - 0.5) < 1e-9
    assert abs(s.weight_at(1000) - 0.5) < 1e-9
    mid = s.weight_at(10)
    assert 0.0 < mid < 1.0


# --------------------------------------------------------------------- #
# augmentations
# --------------------------------------------------------------------- #


def test_recompute_edges_matches_distances():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(3, W, N, 3)).astype(np.float32))
    edge_index = np.asarray(EDGES, np.int32)
    a = np.asarray(recompute_edges(x, edge_index))
    for k, (i, j) in enumerate(EDGES):
        d = np.linalg.norm(
            np.asarray(x)[..., i, :2] - np.asarray(x)[..., j, :2], axis=-1
        )
        np.testing.assert_allclose(a[..., k, 0], d, rtol=1e-5)


def test_slice_time_per_sample():
    x = jnp.arange(2 * 10).reshape(2, 10, 1, 1).astype(jnp.float32)
    out = np.asarray(slice_time_per_sample(x, jnp.asarray([0, 3]), 4))
    np.testing.assert_array_equal(out[0, :, 0, 0], [0, 1, 2, 3])
    np.testing.assert_array_equal(out[1, :, 0, 0], [13, 14, 15, 16])


def test_make_augmented_view_shapes():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, W, N, 3)).astype(np.float32))
    edge_index = np.asarray(EDGES, np.int32)
    precomp = build_rotation_precomp(edge_index, N)
    cfg = ContrastiveCfg(aug_p_rot=0.5, aug_p_noise=0.5, aug_max_interp=3, aug_min_interp=2)
    x_aug, a_aug = make_augmented_view(
        jax.random.PRNGKey(0), x, edge_index, precomp, cfg
    )
    assert x_aug.shape == (4, W // 2, N, 3)
    assert a_aug.shape == (4, W // 2, E, 1)
    assert np.isfinite(np.asarray(x_aug)).all()


def test_rotation_precomp_branches_disjoint_from_pivot():
    edge_index = np.asarray(EDGES, np.int32)
    pre = build_rotation_precomp(edge_index, N)
    for k in range(len(pre.centers)):
        assert not pre.branch_a_masks[k][pre.centers[k]]
        assert not pre.branch_c_masks[k][pre.centers[k]]


# --------------------------------------------------------------------- #
# dataset
# --------------------------------------------------------------------- #


def test_window_dataset_batches_cover_all():
    train, _ = _preprocessed()
    from deepof_tpu.train.harness import _dataset_from_preprocessed

    ds = _dataset_from_preprocessed(train)
    assert len(ds) == 48
    seen = []
    for x, a, ang, idx in ds.batches(16, shuffle=True, rng=np.random.default_rng(0)):
        assert x.shape[1:] == (W, N, 3)
        assert a.shape[1:] == (W, E, 1)
        seen.extend(idx.tolist())
    assert sorted(seen) == list(range(48))


def test_window_dataset_bootstrap_and_shards():
    train, _ = _preprocessed()
    from deepof_tpu.train.harness import _dataset_from_preprocessed

    ds = _dataset_from_preprocessed(train)
    rng = np.random.default_rng(0)
    boot = list(ds.batches(16, rng=rng, bootstrap=True, block_size=8))
    assert len(boot) >= 1
    s0 = [i for *_, idx in ds.batches(16, shard_id=0, n_shards=2, block_size=8) for i in idx]
    s1 = [i for *_, idx in ds.batches(16, shard_id=1, n_shards=2, block_size=8) for i in idx]
    assert not set(s0) & set(s1)
    assert len(s0) + len(s1) == 48


def test_window_dataset_h5_spill(tmp_path):
    train, _ = _preprocessed()
    from deepof_tpu.graph_dataset import reorder_and_reshape
    from deepof_tpu.core.storage import get_dt

    shaped = {
        k: (reorder_and_reshape(v[0]), v[1][..., None], v[2])
        for k, v in train.items()
    }
    ds = WindowDataset(
        shaped, dataset_folder=str(tmp_path), dataset_name="t", spill_to_disk=True
    )
    assert len(ds) == 48
    x, a, ang, idx = next(ds.batches(8, shuffle=False))
    assert x.shape == (8, W, N, 3)
    # Rebuild detection: same data -> reuses file.
    ds2 = WindowDataset(
        shaped, dataset_folder=str(tmp_path), dataset_name="t", spill_to_disk=True
    )
    assert len(ds2) == 48


# --------------------------------------------------------------------- #
# short end-to-end fits
# --------------------------------------------------------------------- #


@pytest.mark.parametrize("model_name", ["VQVAE", "Contrastive"])
@pytest.mark.slow
def test_short_fit(model_name):
    train, test = _preprocessed()
    adj = _adjacency()
    bundle, _, _, summary = train_deepof_model(
        ((train, test), {}, adj), adjacency_matrix=adj, model_name=model_name,
        encoder_type="recurrent", batch_size=16, latent_dim=4, epochs=1,
        n_clusters=3, save_weights=False, verbose=False,
        limit_train_batches=2, limit_val_batches=1,
    )
    assert "total_loss" in summary or any("total_loss" in k for k in summary)
    x = np.zeros((2, W, N, 3), np.float32)
    a = np.zeros((2, W, E, 1), np.float32)
    if model_name == "Contrastive":
        z = bundle.encode(x[:, : W // 2], a[:, : W // 2])
    else:
        z = bundle.encode(x, a)
    assert np.asarray(z).shape == (2, 4)


@pytest.mark.slow
def test_vade_short_fit_and_roundtrip(tmp_path):
    train, test = _preprocessed()
    adj = _adjacency()
    bundle, _, _, _ = train_deepof_model(
        ((train, test), {}, adj), adjacency_matrix=adj, model_name="VaDE",
        encoder_type="recurrent", batch_size=16, latent_dim=4, epochs=1,
        n_clusters=3, pretrain_epochs=1, save_weights=False, verbose=False,
        limit_train_batches=2, limit_val_batches=1,
    )
    x = np.random.default_rng(0).normal(size=(3, W, N, 3)).astype(np.float32)
    a = np.random.default_rng(1).normal(size=(3, W, E, 1)).astype(np.float32)
    g = np.asarray(bundle.group(x, a))
    np.testing.assert_allclose(g.sum(1), 1.0, rtol=1e-4)

    path = str(tmp_path / "vade.ckpt")
    bundle.save(path)
    restored = ModelBundle.load(path)
    z1 = np.asarray(bundle.embed(x, a))
    z2 = np.asarray(restored.embed(x, a))
    np.testing.assert_allclose(z1, z2, rtol=1e-5)


def test_prefetch_iterator():
    from deepof_tpu.train.dataset import prefetch

    items = list(prefetch(iter(range(20)), depth=3))
    assert items == list(range(20))

    def boom():
        yield 1
        raise RuntimeError("worker failed")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="worker failed"):
        list(it)


@pytest.mark.slow
def test_epoch_callback_early_stop():
    """An epoch_callback returning True stops training early
    (optuna-pruning hook surface, training.py:1224-1228)."""
    train, test = _preprocessed()
    adj = _adjacency()

    calls = []

    def stop_after_two(epoch, train_logs, val_logs):
        calls.append(epoch)
        return epoch >= 1

    bundle, _, _, _ = train_deepof_model(
        ((train, test), {}, adj), adjacency_matrix=adj, model_name="VQVAE",
        encoder_type="recurrent", batch_size=16, latent_dim=4, epochs=6,
        n_clusters=3, save_weights=False, verbose=False,
        limit_train_batches=2, limit_val_batches=1,
        epoch_callback=stop_after_two,
    )
    assert calls == [0, 1]
    assert len(bundle.history["total_loss"]) == 2


@pytest.mark.slow
def test_vade_freeze_gmm_epochs():
    """With freeze_gmm_epochs=1 and one main epoch, the GMM prior params
    stay at their init while other params move (training.py:1746-1768)."""
    train, test = _preprocessed()
    adj = _adjacency()
    bundle, _, _, _ = train_deepof_model(
        ((train, test), {}, adj), adjacency_matrix=adj, model_name="VaDE",
        encoder_type="recurrent", batch_size=16, latent_dim=4, epochs=1,
        n_clusters=3, pretrain_epochs=0, save_weights=False, verbose=False,
        limit_train_batches=2, limit_val_batches=1,
        freeze_gmm_epochs=1,
    )
    hist_keys = [k for k in bundle.history if k.endswith("total_loss")]
    assert hist_keys
    # GMM means were initialized by the data GMM and must be untouched by
    # the frozen main epoch: gradients reached other params though.
    # (We can't see the pre-main snapshot here, so assert indirectly: a
    # second run WITHOUT freezing moves the means differently.)
    bundle2, _, _, _ = train_deepof_model(
        ((train, test), {}, adj), adjacency_matrix=adj, model_name="VaDE",
        encoder_type="recurrent", batch_size=16, latent_dim=4, epochs=1,
        n_clusters=3, pretrain_epochs=0, save_weights=False, verbose=False,
        limit_train_batches=2, limit_val_batches=1,
    )
    m_frozen = np.asarray(bundle.variables["params"]["latent_space"]["gmm_means"])
    m_free = np.asarray(bundle2.variables["params"]["latent_space"]["gmm_means"])
    # Same seeds -> same GMM init; the unfrozen run moves away from it.
    assert not np.allclose(m_frozen, m_free)


def _preprocessed_with_angles(n_train=48, n_test=24, seed=0, n_angles=5):
    rng = np.random.default_rng(seed)

    def mk(n):
        return (
            rng.normal(size=(n, W, 3 * N)).astype(np.float32),
            rng.normal(size=(n, W, E)).astype(np.float32),
            rng.normal(size=(n, W, n_angles)).astype(np.float32),
        )

    train = TableDict({"v1": mk(n_train // 2), "v2": mk(n_train // 2)}, typ="merged")
    test = TableDict({"v3": mk(n_test)}, typ="merged")
    return train, test


@pytest.mark.slow
def test_vade_with_angle_stream(tmp_path):
    """Training with use_angles=True changes the encoder params and the
    embedding, and round-trips through save/load."""
    train, test = _preprocessed_with_angles()
    adj = _adjacency()
    bundle, _, _, _ = train_deepof_model(
        ((train, test), {}, adj), adjacency_matrix=adj, model_name="VaDE",
        encoder_type="recurrent", batch_size=16, latent_dim=4, epochs=1,
        n_clusters=3, pretrain_epochs=0, save_weights=False, verbose=False,
        use_angles=True, limit_train_batches=2, limit_val_batches=1,
    )
    assert bundle.rebuild_spec["use_angles"] is True
    assert bundle.rebuild_spec["angle_feature_shape"] == [W, 5, 1]

    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, W, N, 3)).astype(np.float32)
    a = rng.normal(size=(3, W, E, 1)).astype(np.float32)
    ang = rng.normal(size=(3, W, 5, 1)).astype(np.float32)
    z = np.asarray(bundle.embed(x, a, ang))
    assert z.shape == (3, 4)
    # Angles actually influence the embedding.
    z2 = np.asarray(bundle.embed(x, a, ang + 1.0))
    assert np.abs(z - z2).max() > 1e-6

    path = str(tmp_path / "vade_ang.ckpt")
    bundle.save(path)
    restored = ModelBundle.load(path)
    np.testing.assert_allclose(
        z, np.asarray(restored.embed(x, a, ang)), rtol=1e-5
    )


def test_angles_default_off_is_identical_shape():
    """Without use_angles, an angles-bearing dataset trains the plain model."""
    train, test = _preprocessed_with_angles(seed=1)
    adj = _adjacency()
    bundle, _, _, _ = train_deepof_model(
        ((train, test), {}, adj), adjacency_matrix=adj, model_name="VQVAE",
        encoder_type="recurrent", batch_size=16, latent_dim=4, epochs=1,
        n_clusters=3, save_weights=False, verbose=False,
        limit_train_batches=2, limit_val_batches=1,
    )
    assert bundle.rebuild_spec["use_angles"] is False
    x = np.zeros((2, W, N, 3), np.float32)
    a = np.zeros((2, W, E, 1), np.float32)
    z = bundle.encode(x, a)
    assert np.asarray(z).shape == (2, 4)


@pytest.mark.slow
def test_bf16_compute_policy_trains():
    """use_amp=True trains with bfloat16 compute (float32 params) — the
    TPU equivalent of the reference's AMP autocast (SURVEY §2.3)."""
    train, test = _preprocessed(seed=2)
    adj = _adjacency()
    bundle, _, _, summary = train_deepof_model(
        ((train, test), {}, adj), adjacency_matrix=adj, model_name="VQVAE",
        encoder_type="recurrent", batch_size=16, latent_dim=4, epochs=1,
        n_clusters=3, save_weights=False, verbose=False, use_amp=True,
        limit_train_batches=2, limit_val_batches=1,
    )
    assert any("total_loss" in k for k in summary)
    # Params remain float32 (param_dtype), compute dtype is bfloat16.
    leaf = jax.tree_util.tree_leaves(bundle.variables["params"])[0]
    assert leaf.dtype == jnp.float32
    x = np.zeros((2, W, N, 3), np.float32)
    a = np.zeros((2, W, E, 1), np.float32)
    z = np.asarray(bundle.encode(x, a))
    assert z.shape == (2, 4) and np.isfinite(z).all()
