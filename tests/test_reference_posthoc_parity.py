"""Post-hoc statistics A/B parity vs the actual reference implementations.

Runs the reference's post_hoc functions (under reference_shim) and
deepof_tpu's on identical synthetic soft counts / embeddings and pins the
outputs: time-on-cluster, aggregated embeddings, enrichment tables,
cluster transition matrices, and steady-state distributions.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/deepof"),
    reason="upstream reference tree not available",
)


@pytest.fixture(scope="module")
def ref_posthoc():
    from reference_shim import load_reference

    load_reference()
    import deepof.post_hoc as ph

    return ph


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    keys = ["e1", "e2", "e3", "e4"]
    sc = {}
    emb = {}
    for k in keys:
        p = np.exp(rng.normal(size=(200, 5)))
        sc[k] = (p / p.sum(1, keepdims=True)).astype(np.float64)
        emb[k] = rng.normal(size=(200, 8))
    conds = {k: ("A" if i % 2 else "B") for i, k in enumerate(keys)}
    return sc, emb, conds


def test_time_on_cluster_parity(ref_posthoc, data):
    sc, _, _ = data
    from deepof_tpu.posthoc import get_time_on_cluster

    for normalize in (True, False):
        want = ref_posthoc.get_time_on_cluster(
            dict(sc), normalize=normalize
        ).sort_index()
        got = get_time_on_cluster(dict(sc), normalize=normalize).sort_index()
        assert list(want.index) == list(got.index)
        np.testing.assert_allclose(
            got.to_numpy(float), want.to_numpy(float), rtol=1e-12
        )


def test_aggregated_embedding_parity(ref_posthoc, data):
    _, emb, _ = data
    from deepof_tpu.posthoc import get_aggregated_embedding

    for agg in ("mean", "median"):
        want = ref_posthoc.get_aggregated_embedding(
            dict(emb), agg=agg
        ).sort_index()
        got = get_aggregated_embedding(dict(emb), agg=agg).sort_index()
        np.testing.assert_allclose(
            got.to_numpy(float), want.to_numpy(float), rtol=1e-12
        )


def test_enrichment_parity(ref_posthoc, data):
    sc, _, conds = data
    from deepof_tpu.posthoc import enrichment_across_conditions

    want = ref_posthoc.enrichment_across_conditions(
        soft_counts=dict(sc), exp_conditions=dict(conds), normalize=True
    )
    got = enrichment_across_conditions(
        soft_counts=dict(sc), exp_conditions=dict(conds), normalize=True
    )
    assert list(want.columns) == list(got.columns)
    wk = want.sort_values(["exp_id", "cluster"]).reset_index(drop=True)
    gk = got.sort_values(["exp_id", "cluster"]).reset_index(drop=True)
    assert (wk["exp_id"] == gk["exp_id"]).all()
    assert (wk["cluster"] == gk["cluster"]).all()
    np.testing.assert_allclose(
        gk["time on cluster"].to_numpy(float),
        wk["time on cluster"].to_numpy(float),
        rtol=1e-12,
    )
    assert (wk["exp condition"].astype(str) == gk["exp condition"].astype(str)).all()


def test_transition_and_steady_state_parity(ref_posthoc, data):
    sc, _, conds = data
    import deepof.utils as ref_utils

    from deepof_tpu.posthoc import (
        cluster_transition_matrix,
        compute_steady_state,
        compute_transition_matrix_per_condition,
    )

    seq = np.asarray(sc["e1"]).argmax(1)
    want_t, want_ac = ref_utils.cluster_transition_matrix(
        seq, nclusts=5, autocorrelation=True, return_graph=False
    )
    got_t, got_ac = cluster_transition_matrix(seq, 5, autocorrelation=True)
    np.testing.assert_allclose(got_t, want_t, rtol=1e-12)
    np.testing.assert_allclose(got_ac, want_ac, rtol=1e-12)

    # The reference's per-condition path requires bin_info unconditionally.
    bin_info = {k: {"time": np.arange(len(sc[k]))} for k in sc}
    for silence in (False, True):
        want_m = ref_posthoc.compute_transition_matrix_per_condition(
            dict(sc), dict(conds), silence_diagonal=silence,
            bin_info=bin_info, aggregate=True, normalize=True,
        )
        got_m = compute_transition_matrix_per_condition(
            dict(sc), dict(conds), silence_diagonal=silence,
            bin_info=bin_info, aggregate=True, normalize=True,
        )
        assert sorted(want_m) == sorted(got_m)
        for c in want_m:
            np.testing.assert_allclose(got_m[c], want_m[c], rtol=1e-10)

    want_s = ref_posthoc.compute_steady_state(dict(want_m), return_entropy=True)
    got_s = compute_steady_state(got_m, return_entropy=True)
    for c in want_s:
        np.testing.assert_allclose(got_s[c], want_s[c], rtol=1e-8)

    # Per-video (aggregate=False) raw count semantics, diagonal silencing
    # applied BEFORE normalization.
    want_v = ref_posthoc.compute_transition_matrix_per_condition(
        dict(sc), dict(conds), silence_diagonal=True,
        bin_info=bin_info, aggregate=False, normalize=False,
    )
    got_v = compute_transition_matrix_per_condition(
        dict(sc), dict(conds), silence_diagonal=True,
        bin_info=bin_info, aggregate=False, normalize=False,
    )
    assert sorted(want_v) == sorted(got_v)
    for c in want_v:
        np.testing.assert_allclose(got_v[c], want_v[c], rtol=1e-12)
