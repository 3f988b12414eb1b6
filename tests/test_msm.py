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


# --------------------------------------------------------------------- #
# Numeric pins for PCCA+ / MSM (VERDICT r3 item 5): analytic fixtures
# with closed-form memberships and hand-derivable coarse kinetics.
# --------------------------------------------------------------------- #

from deepof_tpu.msm import coarse_grain_transition, stationary_distribution


def _match_macros(chi, true_macro, n_macro):
    """Permutation mapping macro columns to ground-truth labels."""
    perm = {}
    for m in range(n_macro):
        rows = np.flatnonzero(true_macro == m)
        perm[m] = int(np.argmax(chi[rows].mean(0)))
    assert len(set(perm.values())) == n_macro, "macro columns not distinct"
    return perm


def test_pcca_plus_exact_on_decoupled_blocks():
    """Fully decoupled block-diagonal chain: PCCA+ memberships are the
    block indicators EXACTLY (closed form), including unequal blocks."""
    blocks = [[0, 1, 2], [3, 4], [5, 6]]
    n = 7
    p = np.zeros((n, n))
    for block in blocks:
        k = len(block)
        sub = np.full((k, k), 0.1 / max(k - 1, 1))
        np.fill_diagonal(sub, 0.9)
        sub /= sub.sum(1, keepdims=True)
        for a, i in enumerate(block):
            for b, j in enumerate(block):
                p[i, j] = sub[a, b]
    true_macro = np.empty(n, int)
    for m, block in enumerate(blocks):
        true_macro[block] = m

    chi = pcca_plus(p, 3)
    perm = _match_macros(chi, true_macro, 3)
    expected = np.zeros((n, 3))
    for i in range(n):
        expected[i, perm[true_macro[i]]] = 1.0
    np.testing.assert_allclose(chi, expected, atol=1e-8)


def _two_scale_chain(a=0.3, eps=0.02):
    """4-state reversible chain: macro blocks {0,1} and {2,3}, fast
    within-block mixing (rate a), slow between-block hops (rate eps).
    Eigenvectors are the Z2xZ2 characters, so the top-2 eigenspace is
    EXACTLY block-constant: memberships are crisp in closed form and the
    coarse transition matrix is [[1-eps, eps], [eps, 1-eps]]."""
    p = np.array(
        [
            [1 - a - eps, a, eps, 0.0],
            [a, 1 - a - eps, 0.0, eps],
            [eps, 0.0, 1 - a - eps, a],
            [0.0, eps, a, 1 - a - eps],
        ]
    )
    return p


def test_pcca_plus_two_scale_chain_golden():
    eps = 0.02
    p = _two_scale_chain(a=0.3, eps=eps)
    true_macro = np.array([0, 0, 1, 1])

    pi = stationary_distribution(p)
    np.testing.assert_allclose(pi, np.full(4, 0.25), atol=1e-12)

    chi = pcca_plus(p, 2)
    perm = _match_macros(chi, true_macro, 2)
    expected = np.zeros((4, 2))
    for i in range(4):
        expected[i, perm[true_macro[i]]] = 1.0
    np.testing.assert_allclose(chi, expected, atol=1e-10)

    # Hand-derived coarse kinetics: block-to-block hop probability is
    # exactly eps (each state hops to its mirror in the other block).
    pc = coarse_grain_transition(p, chi, pi)
    want = np.array([[1 - eps, eps], [eps, 1 - eps]])
    # undo the macro column permutation
    cols = [perm[0], perm[1]]
    pc = pc[np.ix_(cols, cols)]
    np.testing.assert_allclose(pc, want, atol=1e-10)


def test_pcca_plus_three_block_ring_golden():
    """6-state chain, 3 macro blocks of 2 on a ring (Z3 x Z2 symmetry):
    the 1-3eps eigenspace is block-constant, so memberships are exactly
    crisp, and every block hops to each neighbor with probability eps."""
    a, eps = 0.25, 0.01
    n = 6
    p = np.zeros((n, n))
    for b in range(3):
        for i in range(2):
            s = 2 * b + i
            p[s, s] = 1 - a - 2 * eps
            p[s, 2 * b + (1 - i)] = a
            p[s, 2 * ((b + 1) % 3) + i] = eps
            p[s, 2 * ((b - 1) % 3) + i] = eps
    np.testing.assert_allclose(p.sum(1), 1.0, atol=1e-12)
    true_macro = np.array([0, 0, 1, 1, 2, 2])

    chi = pcca_plus(p, 3)
    perm = _match_macros(chi, true_macro, 3)
    expected = np.zeros((n, 3))
    for i in range(n):
        expected[i, perm[true_macro[i]]] = 1.0
    np.testing.assert_allclose(chi, expected, atol=1e-8)

    pc = coarse_grain_transition(p, chi)
    cols = [perm[m] for m in range(3)]
    pc = pc[np.ix_(cols, cols)]
    want = np.full((3, 3), eps)
    np.fill_diagonal(want, 1 - 2 * eps)
    np.testing.assert_allclose(pc, want, atol=1e-8)


def test_stationary_distribution_birth_death_golden():
    """Birth-death chain with detailed balance: pi proportional to
    (1, 2, 1) in closed form."""
    p = np.array([[0.5, 0.5, 0.0], [0.25, 0.5, 0.25], [0.0, 0.5, 0.5]])
    pi = stationary_distribution(p)
    np.testing.assert_allclose(pi, [0.25, 0.5, 0.25], atol=1e-12)
    # detailed balance holds
    np.testing.assert_allclose(pi[:, None] * p, (pi[:, None] * p).T, atol=1e-12)


def test_msm_soft_counts_pinned_on_two_scale_data():
    """Composed pipeline on clean two-scale data: with 4 well-separated
    microstates following the two-scale chain, the decoded soft counts
    recover the ground-truth macrostate of EVERY frame with >= 0.9
    membership (the exact-symmetry value is 1.0; finite-sample count
    noise perturbs it O(1/sqrt(T)/spectral-gap))."""
    rng = np.random.default_rng(0)
    p = _two_scale_chain(a=0.3, eps=0.02)
    t = 4000
    micro = np.empty(t, int)
    micro[0] = 0
    for i in range(1, t):
        micro[i] = rng.choice(4, p=p[micro[i - 1]])
    centers = np.array([[0, 0], [8, 0], [0, 8], [8, 8]], float)
    z = centers[micro] + rng.normal(0, 0.05, (t, 2))
    true_macro = micro // 2

    counts = get_soft_counts_msm(
        {"e0": z.astype(np.float32)}, n_components=2, n_micro=4,
        lagtime=1, temporal_smooth_win=None,
    )["e0"]
    assert counts.shape == (t, 2)
    np.testing.assert_allclose(counts.sum(1), 1.0, atol=1e-4)
    hard = counts.argmax(1)
    # column permutation via majority vote
    flip = (hard != true_macro).mean() > 0.5
    if flip:
        hard = 1 - hard
    assert (hard == true_macro).all()
    assert counts.max(1).min() >= 0.9


# --------------------------------------------------------------------- #
# Prior-biased HMM decode (reference post_hoc.py:146-375 legacy path)
# --------------------------------------------------------------------- #


def test_hmm_prior_biasing_moves_posteriors():
    x, states = _two_state_sequences(n=2, t=300)
    embs = {"e0": x[0], "e1": x[1]}
    base = get_soft_counts_hmm(embs, n_states=2)

    # A confident prior toward state "argmax of base" flipped: biasing
    # must pull posteriors toward the prior.
    prior = {}
    for k, c in base.items():
        flip = 1 - c.argmax(1)
        pr = np.full_like(c, 0.02)
        pr[np.arange(len(c)), flip] = 0.98
        prior[k] = pr
    # The fixture's emissions are strongly separated (log-density gap
    # ~1.8e2 per frame), so the prior needs a large weight to move the
    # smoothed posteriors measurably.
    biased = get_soft_counts_hmm(
        embs, n_states=2, soft_counts=prior, min_confidence=0.5,
        prior_weight=100.0,
    )
    for k in embs:
        toward_prior_base = (base[k] * prior[k]).sum(1).mean()
        toward_prior_biased = (biased[k] * prior[k]).sum(1).mean()
        assert toward_prior_biased > toward_prior_base + 0.2


def test_hmm_prior_min_confidence_gates_to_uniform():
    x, _ = _two_state_sequences(n=2, t=200)
    embs = {"e0": x[0], "e1": x[1]}
    base = get_soft_counts_hmm(embs, n_states=2)
    # Every prior row below the confidence bar -> gated to uniform ->
    # uniform log-bias is a constant shift -> identical posteriors.
    prior = {k: np.full((len(v), 2), [0.6, 0.4]) for k, v in embs.items()}
    gated = get_soft_counts_hmm(
        embs, n_states=2, soft_counts=prior, min_confidence=0.75,
        prior_weight=3.0,
    )
    for k in embs:
        np.testing.assert_allclose(gated[k], base[k], atol=1e-5)


def test_hmm_prior_infers_k_and_validates():
    x, _ = _two_state_sequences(n=2, t=150)
    embs = {"e0": x[0], "e1": x[1]}
    prior = {"e0": np.full((150, 3), 1 / 3)}
    # K inferred from the prior (3), padding/truncation handled
    counts = get_soft_counts_hmm(embs, soft_counts=prior)
    assert counts["e0"].shape == (150, 3)
    assert counts["e1"].shape == (150, 3)
    with pytest.raises(ValueError, match="must match"):
        get_soft_counts_hmm(embs, n_states=2, soft_counts=prior)
    with pytest.raises(ValueError, match="overlap"):
        get_soft_counts_hmm(embs, soft_counts={"zz": np.ones((10, 2))})


def test_hmm_prior_shorter_padded_and_longer_truncated():
    x, _ = _two_state_sequences(n=2, t=100)
    embs = {"e0": x[0], "e1": x[1]}
    short = {"e0": np.tile([0.9, 0.1], (40, 1)), "e1": np.tile([0.9, 0.1], (160, 1))}
    counts = get_soft_counts_hmm(
        embs, soft_counts=short, min_confidence=0.5, prior_weight=1.0
    )
    assert counts["e0"].shape == (100, 2)
    assert counts["e1"].shape == (100, 2)
