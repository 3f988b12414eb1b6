"""Gated soft-count extraction tests: chaos labels, gating series,
quantile edges, and the gated GMM decoder on the multi-animal fixture."""

import os
import shutil

import numpy as np
import pytest

from deepof_tpu.data import Project
from deepof_tpu.gating import (
    _build_gate_masks,
    _gate_to_tag,
    _mask_to_runs,
    _reservoir_sample,
    add_chaos_gates,
    compute_gate_edges,
    get_contrastive_soft_counts_gmm,
    get_pairwise_distances,
    get_supervised_chaos,
)

FIXTURES = "/root/reference/tests/test_examples"


@pytest.fixture(scope="module")
def multi_coords(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gating")
    src = os.path.join(FIXTURES, "test_multi_topview")
    (tmp / "Tables").mkdir()
    (tmp / "Videos").mkdir()
    for f in os.listdir(os.path.join(src, "Tables")):
        if f.endswith("h5"):
            shutil.copy(os.path.join(src, "Tables", f), tmp / "Tables" / f)
    for f in os.listdir(os.path.join(src, "Videos")):
        shutil.copy(os.path.join(src, "Videos", f), tmp / "Videos" / f)
    proj = Project(
        project_path=str(tmp), project_name="gating",
        video_path=str(tmp / "Videos"), table_path=str(tmp / "Tables"),
        arena="circular-autodetect", video_scale="380 mm",
        table_format="h5", frame_rate=25, animal_ids=["B", "W"],
    )
    return proj.create(force=True, test=True, verbose=False)


def test_helpers():
    assert _gate_to_tag(("B", "W")) == "B_W"
    assert _gate_to_tag("") == "all"
    runs = _mask_to_runs(np.array([1, 1, 0, 1, 0, 1, 1, 1], bool), min_len=2)
    assert runs == [(0, 2), (5, 8)]
    segs = [np.arange(10).reshape(5, 2), np.arange(8).reshape(4, 2)]
    samp = _reservoir_sample(segs, 4, seed=0)
    assert samp.shape == (4, 2)
    full = _reservoir_sample(segs, 100, seed=0)
    assert full.shape == (9, 2)


def test_supervised_chaos(multi_coords):
    chaos = get_supervised_chaos(multi_coords, quality_threshold=0.9)
    key = list(chaos.keys())[0]
    tab = chaos[key]
    assert set(tab.columns) == {"B_chaos", "W_chaos", "anychaos"}
    vals = tab.to_numpy()
    assert set(np.unique(vals)) <= {0.0, 1.0}
    # anychaos is the OR of the per-animal flags.
    np.testing.assert_array_equal(
        tab["anychaos"].to_numpy(),
        np.maximum(tab["B_chaos"].to_numpy(), tab["W_chaos"].to_numpy()),
    )


def test_distance_gating_series_and_edges(multi_coords):
    series = get_pairwise_distances(multi_coords, window_len=12)
    key = list(series.keys())[0]
    assert ("B", "W") in series[key]
    g = series[key][("B", "W")]
    assert np.isfinite(g).all() and (g >= 0).all()

    edges = compute_gate_edges(multi_coords, window_size=12, M_gates=3)
    e = edges[("B", "W")]
    assert len(e) == 4 and e[0] == -np.inf and e[-1] == np.inf
    assert np.all(np.diff(e[1:-1]) >= 0)

    # Masks partition every embedding row into exactly one bin.
    emb_len = {k: len(series[k][("B", "W")]) for k in series}
    masks = _build_gate_masks(
        list(series.keys()), emb_len, series, [("B", "W")], 3,
        gate_edges=edges,
    )
    total = sum(
        masks[("B", "W")][b][key].astype(int) for b in range(3)
    )
    assert (total == 1).all()


def test_behavior_gating_series(multi_coords):
    import pandas as pd
    from deepof_tpu.core.table_dict import TableDict

    t = len(multi_coords.get_quality()[list(multi_coords._tables.keys())[0]])
    rng = np.random.default_rng(0)
    sup = TableDict(
        {
            k: pd.DataFrame({
                "B_W_nose2nose": rng.integers(0, 2, t).astype(float),
                "B_climb_arena": rng.integers(0, 2, t).astype(float),
            })
            for k in multi_coords._tables.keys()
        },
        typ="supervised_annotation",
    )
    series = get_pairwise_distances(
        multi_coords, 12, supervised_annotations=sup,
        embedding_gates=["B_W_nose2nose", "B_climb_arena"],
    )
    key = list(series.keys())[0]
    codes = series[key]["behavior_combinations"]
    assert codes.min() >= 0 and codes.max() <= 3  # 2 behaviors -> 4 codes


def test_gated_gmm_and_chaos_gates(multi_coords):
    rng = np.random.default_rng(1)
    keys = list(multi_coords._tables.keys())
    win = 12
    lens = {
        k: len(multi_coords.get_quality()[k]) - win + 1 for k in keys
    }
    emb = {k: rng.normal(size=(lens[k], 6)).astype(np.float32) for k in keys}

    sc = get_contrastive_soft_counts_gmm(
        multi_coords, emb, window_size=win,
        N_clusters_per_gate=3, M_gates=2, sample_size=5000,
    )
    assert ("B", "W") in sc
    p = np.asarray(sc[("B", "W")][keys[0]])
    assert p.shape == (lens[keys[0]], 6)  # 2 bins x 3 clusters
    np.testing.assert_allclose(p.sum(1), 1.0, rtol=1e-4)

    # Chaos composition: gate the same embeddings on chaos labels and merge.
    chaos = get_supervised_chaos(multi_coords, quality_threshold=0.9)
    sc_chaos = get_contrastive_soft_counts_gmm(
        multi_coords, emb, window_size=win,
        supervised_annotations=chaos, embedding_gates=["anychaos"],
        N_clusters_per_gate=3, sample_size=5000,
    )
    assert "behavior_combinations" in sc_chaos
    combined = add_chaos_gates(multi_coords, sc, sc_chaos, chaos, win)
    cp = np.asarray(combined[("B", "W")][keys[0]])
    assert cp.shape == (lens[keys[0]], 6 + 3)


def test_gated_msm_pcca(multi_coords):
    from deepof_tpu.gating import get_contrastive_soft_counts_msm_pcca

    rng = np.random.default_rng(2)
    keys = list(multi_coords._tables.keys())
    win = 12
    lens = {k: len(multi_coords.get_quality()[k]) - win + 1 for k in keys}
    # Two well-separated metastable states with slow switching.
    emb = {}
    for k in keys:
        state = (np.cumsum(rng.random(lens[k]) < 0.05) % 2).astype(float)
        emb[k] = (
            state[:, None] * 4.0 + rng.normal(size=(lens[k], 4)) * 0.3
        ).astype(np.float32)

    sc = get_contrastive_soft_counts_msm_pcca(
        multi_coords, emb, window_size=win,
        N_clusters_per_gate=2, M_gates=1, n_micro=20, lagtime=1,
        sample_size=5000,
    )
    p = np.asarray(sc[("B", "W")][keys[0]])
    assert p.shape == (lens[keys[0]], 2)
    np.testing.assert_allclose(p.sum(1), 1.0, rtol=1e-4)
    assert np.isfinite(p).all()
