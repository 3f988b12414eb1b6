"""HMM and MSM/PCCA+ soft-count extraction tests."""

import numpy as np
import pytest

from deepof_tpu.msm import (
    GaussianHMM,
    estimate_transition_matrix,
    fit_hmm_range,
    get_soft_counts_hmm,
    get_soft_counts_msm,
    pcca_plus,
)


def _two_state_sequences(n=3, t=400, seed=0):
    rng = np.random.default_rng(seed)
    states = np.zeros((n, t), dtype=int)
    for i in range(n):
        s = 0
        for j in range(t):
            if rng.random() < 0.05:
                s = 1 - s
            states[i, j] = s
    x = np.where(
        states[..., None] == 0,
        rng.normal(0, 0.3, (n, t, 2)),
        rng.normal(4, 0.3, (n, t, 2)),
    ).astype(np.float32)
    return x, states


def test_hmm_recovers_states():
    x, states = _two_state_sequences()
    hmm = GaussianHMM(2, n_iter=30).fit(x)
    post = hmm.predict_proba(x[0])
    np.testing.assert_allclose(post.sum(1), 1.0, rtol=1e-4)
    hard = post.argmax(1)
    acc = max((hard == states[0]).mean(), (hard != states[0]).mean())
    assert acc > 0.95
    # EM increases the data likelihood.
    lls = hmm.log_likelihoods_
    assert lls[-1] > lls[0]


def test_hmm_range_selection():
    x, _ = _two_state_sequences(n=2, t=200)
    embeddings = {f"e{i}": x[i] for i in range(2)}
    model, scores = fit_hmm_range(embeddings, "bic", 2, 4, n_iter=15)
    assert len(scores) == 3
    assert model.n_states in (2, 3, 4)


def test_transition_matrix():
    d = np.array([0, 0, 1, 1, 2, 2, 0])
    p = estimate_transition_matrix([d], 3, lagtime=1, reversible=False)
    np.testing.assert_allclose(p.sum(1), 1.0, rtol=1e-6)
    assert p[0, 0] > p[0, 2]


def test_pcca_memberships():
    # Block-diagonal-ish metastable transition matrix over 6 microstates.
    p = np.full((6, 6), 0.01)
    for block in ([0, 1, 2], [3, 4, 5]):
        for i in block:
            for j in block:
                p[i, j] = 0.3
    p = p / p.sum(1, keepdims=True)
    chi = pcca_plus(p, 2)
    np.testing.assert_allclose(chi.sum(1), 1.0, rtol=1e-6)
    hard = chi.argmax(1)
    assert len(set(hard[:3])) == 1 and len(set(hard[3:])) == 1
    assert hard[0] != hard[3]


def _metastable_embeddings(seed=0):
    rng = np.random.default_rng(seed)
    centers = np.array([[0, 0], [5, 0], [0, 5]], float)
    embs = {}
    for k in range(3):
        s = 0
        seq = []
        for _ in range(400):
            if rng.random() < 0.02:
                s = (s + 1) % 3
            seq.append(centers[s] + rng.normal(0, 0.4, 2))
        embs[f"e{k}"] = np.asarray(seq, np.float32)
    return embs


def test_msm_soft_counts():
    embs = _metastable_embeddings()
    counts = get_soft_counts_msm(embs, n_components=3, n_micro=30)
    for c in counts.values():
        assert c.shape[1] == 3
        np.testing.assert_allclose(c.sum(1), 1.0, rtol=1e-4)
    assert len(np.unique(counts["e0"].argmax(1))) == 3


def test_hmm_soft_counts_entry():
    embs = _metastable_embeddings()
    counts = get_soft_counts_hmm(embs, n_states=3)
    for c in counts.values():
        assert c.shape[1] == 3
        np.testing.assert_allclose(c.sum(1), 1.0, rtol=1e-4)
