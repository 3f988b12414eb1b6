"""Self-contained Kernel SHAP (Lundberg & Lee 2017, alg. of
shap.KernelExplainer) — makes ``explain_clusters`` executable without the
optional ``shap`` package (reference behavior: deepof/post_hoc.py:2824-2869,
which runs shap.KernelExplainer over a shap.kmeans background).

The estimator solves the Shapley-kernel-weighted least squares
    min_phi  sum_z pi(z) * (f(h_x(z)) - phi_0 - sum_i z_i phi_i)^2
    s.t.     phi_0 = E_bg[f],  sum_i phi_i = f(x) - phi_0
with the interventional value function v(S) = E_bg[f(x_S, bg_!S)] (the
background expectation is a weighted mean over the k-means summary, exactly
like shap's DenseData path). When the sample budget covers all 2^M - 2
non-trivial coalitions the solution equals the EXACT Shapley values of v —
the property the test suite pins (tests/test_posthoc_visuals.py).

Parity notes vs shap.KernelExplainer:
  * coalition enumeration fills complementary subset-size pairs inward by
    Shapley-kernel mass, then randomly samples the remaining sizes — the
    same budget strategy shap uses (simplified: no duplicate-coalition
    bookkeeping).
  * multi-output models (predict_proba) return the legacy list-per-output
    format the reference's swarm plot consumes (visuals.py:3661-3711).
"""

from __future__ import annotations

from math import comb
from typing import Callable, List, Optional, Sequence, Tuple, Union

import numpy as np
import pandas as pd


class BackgroundData:
    """Weighted background sample (the counterpart of shap's DenseData)."""

    def __init__(self, data: np.ndarray, weights: Optional[np.ndarray] = None):
        self.data = np.asarray(data, float)
        if weights is None:
            weights = np.ones(len(self.data))
        w = np.asarray(weights, float)
        self.weights = w / w.sum()


def kmeans_background(X, k: int, round_values: bool = True) -> BackgroundData:
    """K-means background summary — the counterpart of ``shap.kmeans``:
    k centroids, each coordinate snapped to the nearest actually-observed
    value in its column, weighted by cluster population."""
    from sklearn.cluster import KMeans

    X = np.asarray(X, float)
    k = min(int(k), len(X))
    km = KMeans(n_clusters=k, n_init=10, random_state=0).fit(X)
    centers = km.cluster_centers_.copy()
    if round_values:
        for j in range(X.shape[1]):
            col = X[:, j]
            for c in range(k):
                centers[c, j] = col[np.argmin(np.abs(col - centers[c, j]))]
    weights = np.bincount(km.labels_, minlength=k).astype(float)
    return BackgroundData(centers, weights)


def _shapley_kernel_weight(m: int, s: int) -> float:
    """pi(z) for a coalition of size s out of m features."""
    return (m - 1) / (comb(m, s) * s * (m - s))


def _build_coalitions(
    m: int, nsamples: int, rng: np.random.Generator
) -> Tuple[np.ndarray, np.ndarray, bool]:
    """(masks (S, m) bool, kernel weights (S,), exact) — complete
    complementary subset-size pairs while the budget allows, then random
    masks over the remaining sizes with the leftover kernel mass spread
    uniformly across them."""
    total = 2**m - 2
    if total <= nsamples:
        masks = np.zeros((total, m), bool)
        weights = np.empty(total)
        i = 0
        for bits in range(1, 2**m - 1):
            row = np.array([(bits >> j) & 1 for j in range(m)], bool)
            masks[i] = row
            weights[i] = _shapley_kernel_weight(m, int(row.sum()))
            i += 1
        return masks, weights, True

    # Kernel mass per subset size, paired (s, m-s) from the outside in.
    size_mass = np.array(
        [comb(m, s) * _shapley_kernel_weight(m, s) for s in range(1, m)]
    )
    size_mass = size_mass / size_mass.sum()
    order: List[int] = []
    lo, hi = 1, m - 1
    while lo <= hi:
        order.append(lo)
        if hi != lo:
            order.append(hi)
        lo += 1
        hi -= 1

    masks_list: List[np.ndarray] = []
    weights_list: List[float] = []
    budget = nsamples
    remaining_sizes: List[int] = []
    for s in order:
        n_s = comb(m, s)
        if n_s <= budget - len(remaining_sizes):
            from itertools import combinations

            # Normalized per-coalition weight (size_mass[s-1] spread over
            # the C(m, s) coalitions of that size) so enumerated and sampled
            # coalitions share ONE scale — mirroring shap's weight_left
            # bookkeeping. Using the raw kernel weight here would inflate
            # the enumerated group by the normalization constant Z.
            w = size_mass[s - 1] / n_s
            for idx in combinations(range(m), s):
                row = np.zeros(m, bool)
                row[list(idx)] = True
                masks_list.append(row)
                weights_list.append(w)
            budget -= n_s
        else:
            remaining_sizes.append(s)
    if remaining_sizes and budget > 0:
        rem_mass = sum(size_mass[s - 1] for s in remaining_sizes)
        probs = np.array(
            [size_mass[s - 1] / rem_mass for s in remaining_sizes]
        )
        sizes = rng.choice(remaining_sizes, size=budget, p=probs)
        w_each = rem_mass / budget  # leftover mass spread over the draws
        for s in sizes:
            idx = rng.choice(m, size=int(s), replace=False)
            row = np.zeros(m, bool)
            row[idx] = True
            masks_list.append(row)
            weights_list.append(w_each)
    return np.asarray(masks_list), np.asarray(weights_list), False


class KernelExplainer:
    """Drop-in stand-in for ``shap.KernelExplainer`` (the subset the
    reference pipeline uses: multi-output model + weighted background +
    ``shap_values(X, nsamples=...)``)."""

    def __init__(
        self,
        model: Callable[[np.ndarray], np.ndarray],
        data: Union[np.ndarray, BackgroundData, Tuple[np.ndarray, np.ndarray]],
        normalize: bool = False,
        link: str = "identity",
    ):
        if link != "identity":
            raise NotImplementedError("only the identity link is supported")
        self.model = model
        if isinstance(data, tuple):
            data = BackgroundData(*data)
        elif not isinstance(data, BackgroundData):
            if hasattr(data, "data") and hasattr(data, "weights"):
                data = BackgroundData(
                    np.asarray(data.data), np.asarray(data.weights)
                )
            else:
                data = BackgroundData(np.asarray(data, float))
        self.bg = data
        out = np.asarray(self.model(self.bg.data), float)
        self._single_output = out.ndim == 1
        if self._single_output:
            out = out[:, None]
        self.expected_value = self.bg.weights @ out  # (K,)
        if self._single_output:
            self.expected_value = float(self.expected_value[0])

    # ------------------------------------------------------------------ #

    def shap_values(
        self,
        X,
        nsamples: Union[int, str] = "auto",
        n_jobs: int = -1,  # accepted for API parity; evaluation is vectorized
        random_state: int = 0,
    ):
        """Shapley value estimates for each row of ``X``.

        Returns (n, M) for single-output models, else the legacy
        list-of-(n, M)-arrays format, one entry per model output."""
        if isinstance(X, pd.DataFrame):
            X = X.to_numpy(float)
        X = np.atleast_2d(np.asarray(X, float))
        n, m = X.shape
        if nsamples == "auto" or nsamples is None:
            nsamples = 2048 + 2 * m
        rng = np.random.default_rng(random_state)
        masks, kweights, _ = _build_coalitions(m, int(nsamples), rng)

        fnull = np.atleast_1d(np.asarray(self.expected_value, float))
        k = fnull.shape[0]
        phis = np.empty((n, m, k))
        for i in range(n):
            phis[i] = self._explain_one(X[i], masks, kweights, fnull)
        if self._single_output:
            return phis[:, :, 0]
        return [phis[:, :, j] for j in range(k)]

    def _explain_one(
        self,
        x: np.ndarray,
        masks: np.ndarray,
        kweights: np.ndarray,
        fnull: np.ndarray,
    ) -> np.ndarray:
        s, m = masks.shape
        bg, bgw = self.bg.data, self.bg.weights
        b = len(bg)

        # v(z) = sum_b w_b f(where(z, x, bg_b)), all coalitions in one
        # model call (chunked to bound memory).
        y = np.empty((s, fnull.shape[0]))
        chunk = max(1, 200_000 // max(b * m, 1))
        for lo in range(0, s, chunk):
            mk = masks[lo : lo + chunk]  # (c, m)
            synth = np.where(
                mk[:, None, :], x[None, None, :], bg[None, :, :]
            ).reshape(-1, m)
            out = np.asarray(self.model(synth), float)
            if out.ndim == 1:
                out = out[:, None]
            out = out.reshape(len(mk), b, -1)
            y[lo : lo + chunk] = np.einsum("cbk,b->ck", out, bgw)

        fx = np.asarray(self.model(x[None, :]), float)
        if fx.ndim == 1:
            fx = fx[:, None]
        fx = fx[0]

        # Constrained WLS: eliminate the last feature via
        # phi_last = (fx - fnull) - sum(others).
        z = masks.astype(float)
        zlast = z[:, -1]
        a = z[:, :-1] - zlast[:, None]  # (s, m-1)
        rhs = y - fnull[None, :] - zlast[:, None] * (fx - fnull)[None, :]
        aw = a * kweights[:, None]
        ata = a.T @ aw
        atb = aw.T @ rhs
        # Tiny ridge: random coalition sets can be rank-deficient.
        phi_rest = np.linalg.solve(ata + 1e-12 * np.eye(m - 1), atb)
        phi_last = (fx - fnull)[None, :] - phi_rest.sum(axis=0, keepdims=True)
        return np.vstack([phi_rest, phi_last])  # (m, k)


def summary_beeswarm(
    shap_values,
    features: pd.DataFrame,
    max_display: int = 10,
    show: bool = False,
    class_names: Optional[Sequence[str]] = None,
):
    """Matplotlib stand-in for ``shap.summary_plot``: a beeswarm colored by
    feature value for a single output's (n, M) matrix, or a stacked
    mean(|SHAP|) bar chart for the multi-output list format — the two modes
    the reference swarm plot reaches (deepof/visuals.py:3661-3711)."""
    import matplotlib.pyplot as plt

    if isinstance(features, pd.DataFrame):
        names = [str(c) for c in features.columns]
        fvals = features.to_numpy(float)
    else:
        fvals = np.asarray(features, float)
        names = [f"Feature {j}" for j in range(fvals.shape[1])]

    fig, ax = plt.subplots(figsize=(8, 0.45 * min(max_display, len(names)) + 2))
    if isinstance(shap_values, list):
        mean_abs = np.stack(
            [np.abs(sv).mean(axis=0) for sv in shap_values]
        )  # (K, M)
        order = np.argsort(mean_abs.sum(axis=0))[::-1][:max_display]
        bottoms = np.zeros(len(order))
        cmap = plt.get_cmap("tab10")
        for cls in range(mean_abs.shape[0]):
            vals = mean_abs[cls, order]
            label = (
                class_names[cls] if class_names is not None else f"Cluster {cls}"
            )
            ax.barh(
                np.arange(len(order)), vals, left=bottoms,
                color=cmap(cls % 10), label=label,
            )
            bottoms += vals
        ax.set_yticks(np.arange(len(order)), [names[j] for j in order])
        ax.invert_yaxis()
        ax.set_xlabel("mean(|SHAP value|)")
        ax.legend(fontsize=8)
    else:
        sv = np.asarray(shap_values, float)
        order = np.argsort(np.abs(sv).mean(axis=0))[::-1][:max_display]
        rng = np.random.default_rng(0)
        for row, j in enumerate(order):
            v = fvals[:, j]
            vmin, vmax = np.nanmin(v), np.nanmax(v)
            span = (vmax - vmin) or 1.0
            ax.scatter(
                sv[:, j],
                np.full(len(sv), row) + rng.normal(0, 0.08, len(sv)),
                c=(v - vmin) / span, cmap="coolwarm", s=14, alpha=0.8,
            )
        ax.set_yticks(np.arange(len(order)), [names[j] for j in order])
        ax.invert_yaxis()
        ax.axvline(0.0, color="grey", linewidth=0.8)
        ax.set_xlabel("SHAP value (impact on model output)")
    fig.tight_layout()
    if show:  # pragma: no cover
        plt.show()
    return fig
