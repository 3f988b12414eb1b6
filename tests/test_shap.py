"""Self-contained Kernel SHAP validation (VERDICT r3 item 6).

Pins deepof_tpu.shap_kernel.KernelExplainer against EXACT Shapley values,
computed independently via the permutation-average definition with the same
interventional value function v(S) = E_bg[f(x_S, bg_!S)] — on a linear model
(closed form) and a depth-2 decision tree (brute force). Then executes the
full product path (explain_clusters + plot_shap_swarm_per_cluster,
reference: deepof/post_hoc.py:2824-2869, deepof/visuals.py:3661-3711)
without the optional shap package.
"""

from itertools import combinations
from math import factorial

import numpy as np
import pandas as pd
import pytest

from deepof_tpu.shap_kernel import (
    BackgroundData,
    KernelExplainer,
    kmeans_background,
)


def _exact_shapley(f, x, bg, bgw):
    """Exact Shapley values of v(S) = sum_b w_b f(x_S, bg_b) by direct
    subset enumeration — independent of the KernelExplainer machinery."""
    m = len(x)

    def v(subset):
        mask = np.zeros(m, bool)
        mask[list(subset)] = True
        synth = np.where(mask[None, :], x[None, :], bg)
        out = np.atleast_2d(np.asarray(f(synth), float))
        if out.shape[0] != len(bg):  # single-output 1-D result
            out = out.T
        return bgw @ out  # (K,)

    k = v(()).shape[0]
    phi = np.zeros((m, k))
    others = list(range(m))
    for i in range(m):
        rest = [j for j in others if j != i]
        for size in range(m):
            w = factorial(size) * factorial(m - size - 1) / factorial(m)
            for subset in combinations(rest, size):
                phi[i] += w * (v(subset + (i,)) - v(subset))
    return phi


def test_kernel_shap_exact_on_linear_model():
    """Full-enumeration Kernel SHAP == w_i * (x_i - E_bg[x_i]) for linear f."""
    rng = np.random.default_rng(0)
    m = 6
    w = rng.normal(size=m)
    b = 0.7
    f = lambda X: X @ w + b  # noqa: E731
    bg = rng.normal(size=(5, m))
    bgw = np.array([0.1, 0.3, 0.2, 0.25, 0.15])
    x = rng.normal(size=m)

    ex = KernelExplainer(f, BackgroundData(bg, bgw))
    phi = ex.shap_values(x[None, :], nsamples=2**m)[0]

    closed_form = w * (x - bgw @ bg)
    np.testing.assert_allclose(phi, closed_form, atol=1e-8)
    # additivity: phi_0 + sum phi = f(x)
    np.testing.assert_allclose(
        ex.expected_value + phi.sum(), f(x[None, :])[0], atol=1e-8
    )


def test_kernel_shap_exact_on_depth2_tree():
    """Full-enumeration Kernel SHAP matches brute-force exact Shapley values
    on a depth-2 tree's predict_proba (multi-output path)."""
    from sklearn.tree import DecisionTreeClassifier

    rng = np.random.default_rng(1)
    m = 5
    X = rng.normal(size=(200, m))
    y = ((X[:, 0] > 0).astype(int) + (X[:, 2] > 0.5).astype(int)).clip(0, 1)
    y[X[:, 1] > 1.0] = 2
    tree = DecisionTreeClassifier(max_depth=2, random_state=0).fit(X, y)

    bg = X[:7]
    bgw = np.full(7, 1 / 7)
    ex = KernelExplainer(tree.predict_proba, BackgroundData(bg, bgw))

    xs = X[50:53]
    out = ex.shap_values(xs, nsamples=2**m)
    assert isinstance(out, list) and len(out) == len(tree.classes_)

    for row, x in enumerate(xs):
        phi_exact = _exact_shapley(tree.predict_proba, x, bg, bgw)  # (m, K)
        for cls in range(len(tree.classes_)):
            np.testing.assert_allclose(
                out[cls][row], phi_exact[:, cls], atol=1e-8,
                err_msg=f"row {row} class {cls}",
            )


def test_kernel_shap_sampled_budget():
    """Below full enumeration: the additivity constraint holds exactly and
    the estimates stay close to the exact values."""
    rng = np.random.default_rng(2)
    m = 12
    w = rng.normal(size=m)
    f = lambda X: np.tanh(X @ w)  # noqa: E731
    bg = rng.normal(size=(4, m))
    x = rng.normal(size=m)

    ex = KernelExplainer(f, bg)
    assert 800 < 2**m - 2
    phi = ex.shap_values(x[None, :], nsamples=800)[0]
    np.testing.assert_allclose(
        float(ex.expected_value) + phi.sum(), f(x[None, :])[0], atol=1e-8
    )
    phi_exact = _exact_shapley(lambda X: f(X), x, bg, np.full(4, 0.25))[:, 0]
    assert np.abs(phi - phi_exact).max() < 0.05


def test_kmeans_background_summary():
    rng = np.random.default_rng(3)
    X = rng.normal(size=(60, 4))
    bgd = kmeans_background(X, 3)
    assert bgd.data.shape == (3, 4)
    np.testing.assert_allclose(bgd.weights.sum(), 1.0)
    # every centroid coordinate is snapped to an observed value
    for j in range(4):
        assert all(np.isin(bgd.data[:, j], X[:, j]))


def test_explain_clusters_and_swarm_execute_without_shap(tmp_path):
    """The full reference path — trained SMOTE+GBM detector pipeline ->
    explain_clusters -> plot_shap_swarm_per_cluster — executes end to end
    on the self-contained backend and satisfies SHAP additivity."""
    pytest.importorskip("matplotlib")
    import matplotlib

    matplotlib.use("Agg")

    import deepof_tpu.posthoc as posthoc
    import deepof_tpu.visuals as visuals

    rng = np.random.default_rng(0)
    x = pd.DataFrame(
        rng.normal(size=(120, 5)), columns=[f"stat_{j}" for j in range(5)]
    )
    y = pd.Series(rng.integers(0, 3, 120))
    x.iloc[:, 0] += 3.0 * y
    bin_info = {f"exp{i}": np.arange(30) + 30 * i for i in range(4)}
    full_clf, _, _ = posthoc.train_supervised_cluster_detectors(
        x, y, bin_info, verbose=0
    )

    shap_values, explainer, processed = posthoc.explain_clusters(
        x, y.values, full_clf, samples=40
    )
    n_clusters = len(np.unique(y))
    assert isinstance(shap_values, list) and len(shap_values) == n_clusters
    assert all(sv.shape == (processed.shape[0], 5) for sv in shap_values)

    # Additivity against the pipeline's classifier on the processed rows.
    clf = full_clf.named_steps["classifier"]
    proba = clf.predict_proba(processed.to_numpy(float))
    recon = np.stack(
        [explainer.expected_value[c] + shap_values[c].sum(1) for c in
         range(n_clusters)], axis=1,
    )
    np.testing.assert_allclose(recon, proba, atol=1e-6)

    fig = visuals.plot_shap_swarm_per_cluster(None, processed, shap_values)
    assert fig is not None
    fig2 = visuals.plot_shap_swarm_per_cluster(
        None, processed, shap_values, cluster=0
    )
    assert fig2 is not None
    import matplotlib.pyplot as plt

    plt.close("all")
