"""End-to-end: fixture project -> graph dataset -> train -> per-video
embeddings (mirrors the reference's test_deep_unsupervised_embedding)."""

import os
import shutil

import numpy as np
import pytest

from deepof_tpu.data import Project
from deepof_tpu.train.inference import embedding_per_video

FIXTURES = "/root/reference/tests/test_examples"


@pytest.fixture(scope="module")
def coords(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    src = os.path.join(FIXTURES, "test_single_topview")
    (tmp / "Tables").mkdir()
    (tmp / "Videos").mkdir()
    for f in os.listdir(os.path.join(src, "Tables")):
        if f.endswith("h5"):
            shutil.copy(os.path.join(src, "Tables", f), tmp / "Tables" / f)
    for f in os.listdir(os.path.join(src, "Videos")):
        shutil.copy(os.path.join(src, "Videos", f), tmp / "Videos" / f)
    proj = Project(
        project_path=str(tmp), project_name="e2e", video_path=str(tmp / "Videos"),
        table_path=str(tmp / "Tables"), arena="circular-autodetect",
        video_scale="380 mm", table_format="h5", frame_rate=25,
    )
    return proj.create(force=True, test=True, verbose=False)


def test_train_and_embed_vqvae(coords):
    dataset, meta, adjacency, tab_dict, scaler = coords.get_graph_dataset(
        window_size=10
    )
    bundle, _, _, summary = coords.deep_unsupervised_embedding(
        (dataset, meta, adjacency),
        adjacency_matrix=adjacency,
        embedding_model="VQVAE",
        encoder_type="recurrent",
        batch_size=32,
        latent_dim=4,
        epochs=1,
        n_clusters=4,
        save_checkpoints=False,
        verbose=False,
        limit_train_batches=2,
        limit_val_batches=1,
    )
    assert any("total_loss" in k for k in summary)

    embeddings, soft_counts = embedding_per_video(
        coords, tab_dict, bundle, meta, global_scaler=scaler,
    )
    assert set(embeddings.keys()) == {"test", "test2"}
    emb = np.asarray(embeddings["test"])
    sc = np.asarray(soft_counts["test"])
    # stride-1 windows over 100 frames with window 10 -> 91 chunks
    assert emb.shape == (91, 4)
    assert sc.shape == (91, 4)
    np.testing.assert_allclose(sc.sum(1), 1.0, rtol=1e-4)

    # Post-hoc consumes the outputs directly.
    import deepof_tpu.posthoc as posthoc

    toc = posthoc.get_time_on_cluster(soft_counts)
    assert toc.shape[0] == 2
    np.testing.assert_allclose(toc.sum(1), 1.0, rtol=1e-6)

    # Gated extraction paths (single-animal -> one ungated "" gate).
    for method, k_expect in [("gmm", 3), ("combined", 3 + 3)]:
        emb2, sc2 = embedding_per_video(
            coords, tab_dict, bundle, meta, global_scaler=scaler,
            softcounts_extraction_method=method,
            states_per_gate=3, n_micro=12, lagtime=1,
        )
        p = np.asarray(sc2["test"])
        assert p.shape == (91, k_expect)
        np.testing.assert_allclose(p.sum(1), 1.0, rtol=1e-4)


def test_scaled_frame_reuse_matches_full_preprocess(coords):
    """embedding_per_video reuses get_graph_dataset's stashed scaled
    tables when the scaler and standardize modes match; the shortcut must
    be bit-identical to re-running the preprocess pass."""
    import jax
    import jax.numpy as jnp

    from deepof_tpu.models import build_model, init_variables
    from deepof_tpu.train.harness import ModelBundle

    dataset, meta, adjacency, tab_dict, scaler = coords.get_graph_dataset(
        window_size=10
    )
    assert hasattr(tab_dict, "_scaled_frames")
    n = len(meta["node_columns"]) // 3
    e = len(meta["edge_columns"])
    model = build_model(
        "VQVAE", (10, n, 3), (10, e, 1), adjacency, latent_dim=4,
        n_components=4, encoder_type="recurrent", use_gnn=True,
    )
    variables = init_variables(
        model, {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 10, n, 3), jnp.float32),
        jnp.zeros((1, 10, e, 1), jnp.float32), train=False,
    )
    bundle = ModelBundle(
        model=model, variables=variables,
        rebuild_spec={
            "model": "VQVAE", "input_shape": [10, n, 3],
            "edge_feature_shape": [10, e, 1], "n_components": 4,
            "use_angles": False,
        },
    )
    emb_cached, _ = embedding_per_video(
        coords, tab_dict, bundle, meta, global_scaler=scaler
    )
    del tab_dict._scaled_sig  # force the full preprocess path
    emb_full, _ = embedding_per_video(
        coords, tab_dict, bundle, meta, global_scaler=scaler
    )
    for k in emb_cached.keys():
        np.testing.assert_array_equal(
            np.asarray(emb_cached[k]), np.asarray(emb_full[k])
        )


def test_angles_flow_through_training_and_inference(coords):
    """VERDICT item 5: angles reach the dataset, the model, and inference."""
    dataset, meta, adjacency, tab_dict, scaler = coords.get_graph_dataset(
        window_size=10
    )
    # The windowed third tensor (angles) is non-empty by default.
    from deepof_tpu.core.storage import get_dt

    train_part = dataset[0]
    first = get_dt(train_part, list(train_part.keys())[0])
    assert first[2].size > 0, "angle tensor should be populated"
    assert len(meta["angle_columns"]) == first[2].shape[2]

    bundle, _, _, summary = coords.deep_unsupervised_embedding(
        (dataset, meta, adjacency),
        adjacency_matrix=adjacency,
        embedding_model="VaDE",
        encoder_type="recurrent",
        batch_size=32,
        latent_dim=4,
        epochs=1,
        n_clusters=4,
        pretrain_epochs=1,
        use_angles=True,
        save_checkpoints=False,
        verbose=False,
        limit_train_batches=2,
        limit_val_batches=1,
    )
    assert bundle.rebuild_spec["use_angles"] is True
    assert any("total_loss" in k for k in summary)

    embeddings, soft_counts = embedding_per_video(
        coords, tab_dict, bundle, meta, global_scaler=scaler,
    )
    emb = np.asarray(embeddings["test"])
    assert emb.shape == (91, 4)
    assert np.isfinite(emb).all()


def test_device_scale_end_to_end(coords, monkeypatch):
    """With the device scaling fast path forced on, get_graph_dataset
    stashes device-resident scaled frames and embedding_per_video consumes
    them without a host round trip, matching the host-path embeddings."""
    import jax
    import jax.numpy as jnp

    from deepof_tpu.models import build_model, init_variables
    from deepof_tpu.train.harness import ModelBundle

    monkeypatch.setenv("DEEPOF_TPU_DEVICE_SCALE", "1")
    dataset, meta, adjacency, tab_dict, scaler = coords.get_graph_dataset(
        window_size=10
    )
    assert getattr(tab_dict, "_scaled_device", None)
    n = len(meta["node_columns"]) // 3
    e = len(meta["edge_columns"])
    model = build_model(
        "VQVAE", (10, n, 3), (10, e, 1), adjacency, latent_dim=4,
        n_components=4, encoder_type="recurrent", use_gnn=True,
    )
    variables = init_variables(
        model, {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 10, n, 3), jnp.float32),
        jnp.zeros((1, 10, e, 1), jnp.float32), train=False,
    )
    bundle = ModelBundle(
        model=model, variables=variables,
        rebuild_spec={
            "model": "VQVAE", "input_shape": [10, n, 3],
            "edge_feature_shape": [10, e, 1], "n_components": 4,
            "use_angles": False,
        },
    )
    emb_dev, sc_dev = embedding_per_video(
        coords, tab_dict, bundle, meta, global_scaler=scaler
    )
    monkeypatch.setenv("DEEPOF_TPU_DEVICE_SCALE", "0")
    _, _, _, tab_host, scaler_host = coords.get_graph_dataset(window_size=10)
    emb_host, _ = embedding_per_video(
        coords, tab_host, bundle, meta, global_scaler=scaler_host
    )
    for k in emb_host.keys():
        np.testing.assert_allclose(
            np.asarray(emb_dev[k]), np.asarray(emb_host[k]),
            atol=5e-4, rtol=5e-3,
        )
