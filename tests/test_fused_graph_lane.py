"""Fused device lane of get_graph_dataset (graph_dataset.py): the merged
feature table is produced by one device program per experiment and stays on
the accelerator; the user-facing TableDict holds LazyFrames realized only
on access (core/storage.LazyFrame).

A/B-gates the lane against the eager host path (DEEPOF_TPU_DEVICE_SCALE=0)
on the reference fixtures: merged values, NaN patterns, columns, index, the
windowed training tensors, and the fitted global scaler. On the CPU parity
path both lanes run in float64, so merged values agree to ~1e-13.
"""

import os
import shutil
import tempfile

import numpy as np
import pytest

from deepof_tpu.core.storage import LazyFrame, get_dt

FIXROOT = "/root/reference/tests/test_examples"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXROOT), reason="reference fixtures not available"
)


def _build_project(fixture):
    src = os.path.join(FIXROOT, fixture)
    tmp = tempfile.mkdtemp(prefix="deepof_tpu_fused_")
    os.makedirs(f"{tmp}/Tables")
    os.makedirs(f"{tmp}/Videos")
    for f in os.listdir(f"{src}/Tables"):
        if f.endswith(".h5"):
            shutil.copy(f"{src}/Tables/{f}", f"{tmp}/Tables/{f}")
    for f in os.listdir(f"{src}/Videos"):
        shutil.copy(f"{src}/Videos/{f}", f"{tmp}/Videos/{f}")
    return tmp


def _run(tmp, animal_ids, device_scale, monkeypatch, **ggd_kwargs):
    monkeypatch.setenv("DEEPOF_TPU_DEVICE_SCALE", device_scale)
    from deepof_tpu.data import Project

    proj = Project(
        project_path=tmp, project_name="p", video_path=f"{tmp}/Videos",
        table_path=f"{tmp}/Tables", arena="circular-autodetect",
        video_scale="380 mm", table_format="h5", frame_rate=25,
        animal_ids=animal_ids,
    )
    coords = proj.create(force=True, test=True, verbose=False)
    return coords, coords.get_graph_dataset(window_size=10, **ggd_kwargs)


@pytest.mark.parametrize(
    "fixture,animal_ids",
    [("test_single_topview", None), ("test_multi_topview", ["B", "W"])],
)
def test_fused_lane_matches_host_path(fixture, animal_ids, monkeypatch, tmp_path):
    tmp = _build_project(fixture)
    try:
        _, (ds0, meta0, adj0, tab0, sc0) = _run(tmp, animal_ids, "0", monkeypatch)
        _, (ds1, meta1, adj1, tab1, sc1) = _run(tmp, animal_ids, "1", monkeypatch)

        # The fused lane engaged: merged values are LazyFrames.
        assert all(isinstance(tab1[k], LazyFrame) for k in tab1.keys())
        assert getattr(tab1, "_device_frames", None)

        np.testing.assert_array_equal(np.asarray(adj0), np.asarray(adj1))

        for k in tab0.keys():
            f0, f1 = get_dt(tab0, k), get_dt(tab1, k)
            assert list(f0.columns) == list(f1.columns)
            assert list(f0.index) == list(f1.index)
            a, b = f0.to_numpy(float), f1.to_numpy(float)
            np.testing.assert_array_equal(np.isfinite(a), np.isfinite(b))
            m = np.isfinite(a)
            np.testing.assert_allclose(a[m], b[m], atol=1e-6)

        # Windowed training tensors and scaler agree.
        for part0, part1 in zip(ds0, ds1):
            assert sorted(part0.keys()) == sorted(part1.keys())
            for k in part0.keys():
                for x0, x1 in zip(get_dt(part0, k), get_dt(part1, k)):
                    if np.asarray(x0).size:
                        np.testing.assert_allclose(
                            np.asarray(x0), np.asarray(x1), atol=5e-5
                        )
        for name in ("speed", "dist", "coord"):
            s0, s1 = sc0.get(name), sc1.get(name)
            assert (s0 is None) == (s1 is None)
            if s0 is not None:
                # float32 device statistics vs the float64 host fit — the
                # same drift budget as the eager device-scaling path.
                np.testing.assert_allclose(
                    s0.mean_, s1.mean_, rtol=1e-5, atol=1e-5
                )
                np.testing.assert_allclose(
                    s0.scale_, s1.scale_, rtol=1e-5, atol=1e-5
                )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_fused_lane_falls_back_when_binned(monkeypatch):
    """bin_size forces the eager lane (LazyFrames never appear)."""
    tmp = _build_project("test_single_topview")
    try:
        _, (_, _, _, tab, _) = _run(
            tmp, None, "1", monkeypatch, bin_size=4, bin_index=0
        )
        assert not any(isinstance(tab[k], LazyFrame) for k in tab.keys())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_lazy_frame_protocol():
    """LazyFrame: metainfo without realize, realize caching, pickling."""
    import pandas as pd
    import pickle

    calls = []

    def make():
        calls.append(1)
        return np.arange(12.0, dtype=np.float64).reshape(4, 3)

    cols = pd.Index([("a", "x"), ("a", "y"), "a"], dtype=object, tupleize_cols=False)
    lf = LazyFrame(make, cols, 4)
    d = {"k": lf}

    meta = get_dt(d, "k", only_metainfo=True)
    assert meta["num_rows"] == 4 and meta["num_cols"] == 3
    assert meta["columns"] == list(cols)
    assert not calls  # metainfo never realizes

    df = get_dt(d, "k")
    assert isinstance(df, pd.DataFrame) and df.shape == (4, 3)
    get_dt(d, "k")
    assert len(calls) == 1  # realize is cached

    rt = pickle.loads(pickle.dumps(lf))
    np.testing.assert_array_equal(rt.realize().to_numpy(), df.to_numpy())


def test_fused_lane_drops_all_nan_tables(monkeypatch):
    """An all-NaN experiment is dropped from the scaled output, matching
    the host pass-1 skip — detected from the stats fetch, no extra RPC."""
    tmp = _build_project("test_single_topview")
    try:
        coords, _ = _run(tmp, None, "1", monkeypatch)
        first = sorted(coords._tables.keys())[0]
        coords._tables[first] = np.full_like(
            np.asarray(coords._tables[first]), np.nan
        )
        ds, meta, _, tab, _ = coords.get_graph_dataset(window_size=10)
        assert all(isinstance(tab[k], LazyFrame) for k in tab.keys())
        train_keys = set(ds[0].keys())
        assert first not in train_keys
        assert len(train_keys) >= 1
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_lazy_windows_protocol():
    """LazyWindows: metainfo without realize, cached realize, tuple
    behavior, range loads, pickling."""
    import pickle

    from deepof_tpu.core.storage import LazyWindows

    calls = []

    def make():
        calls.append(1)
        return (
            np.arange(24.0, dtype=np.float32).reshape(4, 2, 3),
            np.arange(8.0, dtype=np.float32).reshape(4, 2, 1),
            np.zeros((4, 2, 0), dtype=np.float32),
        )

    lw = LazyWindows(make, ((4, 2, 3), (4, 2, 1), (4, 2, 0)))
    d = {"k": lw}

    meta = get_dt(d, "k", only_metainfo=True)
    assert meta["shape"] == [(4, 2, 3), (4, 2, 1), (4, 2, 0)]
    assert meta["num_rows"] == 4
    assert not calls  # metainfo never realizes

    nodes, edges, angles = get_dt(d, "k")
    assert nodes.shape == (4, 2, 3) and angles.shape == (4, 2, 0)
    get_dt(d, "k")
    assert len(calls) == 1  # realize is cached

    part = get_dt(d, "k", load_range=(1, 2))
    assert part[0].shape == (2, 2, 3)

    rt = pickle.loads(pickle.dumps(lw))
    for a, b in zip(rt, (nodes, edges, angles)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_lane_defers_training_windows(monkeypatch):
    """Device lane: the returned training tensors are LazyWindows whose
    source matrix is never fetched by the inference flow — only a
    consumer that actually reads them pays the device->host transfer."""
    import jax
    import jax.numpy as jnp

    from deepof_tpu.core.storage import LazyWindows
    from deepof_tpu.models import build_model, init_variables
    from deepof_tpu.train.harness import ModelBundle
    from deepof_tpu.train.inference import embedding_per_video

    tmp = _build_project("test_single_topview")
    try:
        coords, (ds, meta, adjacency, tab, scaler) = _run(
            tmp, None, "1", monkeypatch
        )
        train = ds[0]
        assert train.keys()
        assert all(isinstance(train[k], LazyWindows) for k in train.keys())
        holders = getattr(train, "_deferred_f32", None)
        assert holders and all(h._host is None for h in holders.values())

        # metainfo answers shapes without realizing anything.
        for k in train.keys():
            m = get_dt(train, k, only_metainfo=True)
            assert m["shape"][0][1] == 10  # window size
        assert all(h._host is None for h in holders.values())

        # The inference flow never touches the training tensors.
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
        emb, _ = embedding_per_video(
            coords, tab, bundle, meta, global_scaler=scaler
        )
        assert emb and all(len(v) for v in emb.values())
        assert all(h._host is None for h in holders.values())

        # Reading a training tensor realizes it (once) from the shared
        # holder; the shapes match the promised metainfo.
        k0 = sorted(train.keys())[0]
        nodes, edges, angles = get_dt(train, k0)
        assert nodes.shape == tuple(
            get_dt(train, k0, only_metainfo=True)["shape"][0]
        )
        assert any(h._host is not None for h in holders.values())
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_fused_lane_with_tiny_scale_budget_matches_host(monkeypatch, tmp_path):
    """Fused lane + a tiny DEEPOF_TPU_DEVICE_SCALE_BUDGET_BYTES: the
    device scaling pass must bail to the host path mid-build (the OOM
    protection) and still produce the exact host-path training tensors."""
    tmp = _build_project("test_single_topview")
    try:
        _, (ds0, meta0, _, tab0, sc0) = _run(tmp, None, "0", monkeypatch)
        monkeypatch.setenv("DEEPOF_TPU_DEVICE_SCALE_BUDGET_BYTES", "64")
        _, (ds1, meta1, _, tab1, sc1) = _run(tmp, None, "1", monkeypatch)

        for part0, part1 in zip(ds0, ds1):
            assert sorted(part0.keys()) == sorted(part1.keys())
            for key in part0.keys():
                for x0, x1 in zip(get_dt(part0, key), get_dt(part1, key)):
                    if np.asarray(x0).size:
                        np.testing.assert_allclose(
                            np.asarray(x1), np.asarray(x0),
                            atol=2e-4, rtol=2e-3,
                        )
        np.testing.assert_allclose(
            sc1["dist"].mean_, sc0["dist"].mean_, atol=1e-6
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
