"""Embedding-quality metrics and GMM model selection.

Behavioral spec: deepof/utils.py:4040-4255 — bootstrap BIC-based GMM model
selection and the three embedding evaluation metrics (compactness by
covariance trace, logistic-regression average-precision separability, and
kNN label agreement).
"""

from __future__ import annotations

from typing import Dict, List, Tuple, Union

import numpy as np
import pandas as pd


def gmm_compute(x: np.ndarray, n_components: int, cv_type: str) -> list:
    """Fit one GMM and return [model, BIC]."""
    from sklearn import mixture

    gmm = mixture.GaussianMixture(
        n_components=n_components,
        covariance_type=cv_type,
        max_iter=100000,
        init_params="kmeans",
        random_state=0,
    )
    gmm.fit(x)
    return [gmm, gmm.bic(x)]


def gmm_model_selection(
    x: pd.DataFrame,
    n_components_range,
    part_size: int,
    n_runs: int = 100,
    n_cores: int = 0,
    cv_types: Tuple = ("spherical", "tied", "diag", "full"),
) -> Tuple[List[list], List[float], object]:
    """Bootstrap BIC scan over component counts and covariance types.

    Returns (all BICs per setting, median BICs, best model).
    """
    from joblib import Parallel, delayed

    if not n_cores:
        import multiprocessing

        n_cores = min(multiprocessing.cpu_count(), n_runs)

    bic, m_bic = [], []
    lowest_bic, best = np.inf, None
    for cv_type in cv_types:
        for n_components in n_components_range:
            res = Parallel(n_jobs=n_cores, prefer="threads")(
                delayed(gmm_compute)(
                    x.sample(part_size, replace=True), n_components, cv_type
                )
                for _ in range(n_runs)
            )
            bic.append([r[1] for r in res])
            m_bic.append(float(np.median(bic[-1])))
            if m_bic[-1] < lowest_bic:
                lowest_bic = m_bic[-1]
                best = res[0][0]
    return bic, m_bic, best


def _total_variance(z: np.ndarray) -> float:
    """Total variance (= trace of the covariance matrix) of a point cloud.

    Computed as the sum of per-dimension unbiased sample variances, which
    avoids materializing the full DxD covariance.
    """
    z = np.asarray(z, np.float64)
    if z.shape[0] < 2:
        return float("nan")
    return float(np.var(z, axis=0, ddof=1).sum())


def compute_compactness(
    z_pos: np.ndarray, z_all: np.ndarray, eps: float = 1e-12
) -> Dict[str, float]:
    """Spread of positive embeddings, absolute and relative to the global set.

    Behavioral spec: deepof/utils.py:4122-4144 (trace-of-covariance
    compactness); same output keys, closed-form total-variance computation.
    """
    tr_p = _total_variance(z_pos)
    return {
        "trace_cov_pos": tr_p,
        "trace_cov_pos_norm_global": tr_p / max(eps, _total_variance(z_all)),
    }


def _stratified_folds(
    labels: np.ndarray, n_splits: int, rng: np.random.Generator
) -> np.ndarray:
    """Assign each sample a fold id with per-class balance.

    Shuffles within each class and deals samples round-robin across folds, so
    every fold sees (almost) the same class ratio as the full set.
    """
    fold_of = np.empty(labels.shape[0], dtype=np.int64)
    for cls in np.unique(labels):
        members = rng.permutation(np.flatnonzero(labels == cls))
        fold_of[members] = np.arange(members.size) % n_splits
    return fold_of


def _average_precision(y_true: np.ndarray, score: np.ndarray) -> float:
    """Area under the precision-recall curve (step interpolation).

    AP = sum over ranks of (recall step) * precision-at-rank, scanning
    predictions from highest to lowest score.
    """
    order = np.argsort(-score, kind="stable")
    hits = y_true[order].astype(np.float64)
    tp = np.cumsum(hits)
    precision = tp / np.arange(1, hits.size + 1)
    n_pos = tp[-1]
    if n_pos == 0:
        return float("nan")
    return float((precision * hits).sum() / n_pos)


def _fit_logreg_weighted(
    x: "jnp_array", y: "jnp_array", l2: float, steps: int = 200
):
    """Balanced L2-regularized logistic regression by full-batch Newton steps.

    Runs a fixed-iteration IRLS loop under ``lax.scan`` — the whole fit is one
    XLA program (features are tiny: D = latent dim, so the Hessian solve is a
    small dense op that XLA maps straight onto the MXU).
    """
    import jax
    import jax.numpy as jnp

    n, d = x.shape
    # class-balanced sample weights: n / (2 * n_class)
    n_pos = y.sum()
    w_pos = n / (2.0 * jnp.maximum(n_pos, 1.0))
    w_neg = n / (2.0 * jnp.maximum(n - n_pos, 1.0))
    sw = jnp.where(y > 0.5, w_pos, w_neg)
    xb = jnp.concatenate([x, jnp.ones((n, 1), x.dtype)], axis=1)
    reg = l2 * jnp.eye(d + 1, dtype=x.dtype).at[d, d].set(0.0)

    def newton_step(beta, _):
        logits = xb @ beta
        p = jax.nn.sigmoid(logits)
        grad = xb.T @ (sw * (p - y)) + reg @ beta
        h = (xb * (sw * p * (1.0 - p))[:, None]).T @ xb + reg
        # damped solve keeps early steps stable when classes separate cleanly
        delta = jnp.linalg.solve(h + 1e-6 * jnp.eye(d + 1, dtype=x.dtype), grad)
        return beta - delta, None

    beta0 = jnp.zeros(d + 1, dtype=x.dtype)
    beta, _ = jax.lax.scan(newton_step, beta0, None, length=steps)
    return beta


def compute_separability_logreg(
    x: np.ndarray,
    y: np.ndarray,
    n_splits: int = 5,
    seed: int = 0,
    c: float = 1.0,
    max_train: int = 100_000,
) -> Dict[str, float]:
    """Class separability: cross-validated balanced-logreg average precision.

    Behavioral spec: deepof/utils.py:4146-4199 (stratified-CV balanced
    logistic regression AP). Same output keys; the classifier here is a
    jitted Newton/IRLS fit instead of sklearn's lbfgs, and folds/AP are
    computed in-repo.
    """
    import jax.numpy as jnp

    yb = (np.asarray(y) > 0.5).astype(np.int32)
    if yb.min() == yb.max():
        return {"ap_mean": float("nan"), "ap_std": float("nan"), "n_used": 0}

    rng = np.random.default_rng(seed)
    x = np.asarray(x, np.float64)
    # proportional subsample down to max_train, preserving the class ratio
    if yb.size > max_train:
        keep = []
        for cls in (0, 1):
            members = np.flatnonzero(yb == cls)
            quota = int(round(max_train * members.size / yb.size))
            keep.append(rng.choice(members, size=min(quota, members.size), replace=False))
        idx = rng.permutation(np.concatenate(keep))
        x, yb = x[idx], yb[idx]

    fold_of = _stratified_folds(yb, n_splits, rng)
    n_iter = max(25, int(round(25 * np.log10(10 * c + 1))))
    aps = []
    for f in range(n_splits):
        te = fold_of == f
        tr = ~te
        mu, sd = x[tr].mean(axis=0), x[tr].std(axis=0) + 1e-12
        xtr = jnp.asarray((x[tr] - mu) / sd)
        xte = np.asarray((x[te] - mu) / sd)
        beta = np.asarray(
            _fit_logreg_weighted(xtr, jnp.asarray(yb[tr], xtr.dtype), l2=1.0 / c, steps=n_iter)
        )
        score = xte @ beta[:-1] + beta[-1]
        aps.append(_average_precision(yb[te], score))

    return {
        "ap_mean": float(np.mean(aps)),
        "ap_std": float(np.std(aps)),
        "n_used": int(yb.size),
    }


def compute_knn_agreement(
    x: np.ndarray,
    y: np.ndarray,
    k: int = 25,
    seed: int = 0,
    max_points: int = 50_000,
    max_pos_queries: int = 10_000,
    metric: str = "cosine",
) -> Dict[str, float]:
    """Fraction of each positive sample's k nearest neighbors that are positive.

    Behavioral spec: deepof/utils.py:4201-4255 (positive-class kNN label
    agreement). Same output keys; neighbors are found with a chunked
    brute-force top-k over a similarity matmul (jit-compiled) rather than a
    CPU tree index — the distance computation IS a GEMM, which is the
    TPU-native shape for this op.
    """
    import jax
    import jax.numpy as jnp

    x = np.asarray(x)
    yb = (np.asarray(y) > 0.5).astype(np.int32)
    pos = np.flatnonzero(yb == 1)
    if pos.size == 0 or x.shape[0] < k + 2:
        return {
            "k": int(k), "pos_knn_agree_mean": float("nan"),
            "pos_knn_agree_std": float("nan"), "n_ref": 0, "n_pos_queries": 0,
        }

    rng = np.random.default_rng(seed)
    if x.shape[0] > max_points:
        ref = rng.choice(x.shape[0], size=max_points, replace=False)
    else:
        ref = np.arange(x.shape[0])
    if pos.size > max_pos_queries:
        queries = rng.choice(pos, size=max_pos_queries, replace=False)
    else:
        queries = pos

    x_ref = jnp.asarray(x[ref], jnp.float32)
    y_ref = jnp.asarray(yb[ref], jnp.float32)
    if metric == "cosine":
        x_ref = x_ref / (jnp.linalg.norm(x_ref, axis=1, keepdims=True) + 1e-12)
    ref_sq = (x_ref * x_ref).sum(axis=1)
    n_neigh = min(k + 1, int(x_ref.shape[0]))

    @jax.jit
    def topk_pos_fraction(xq):
        if metric == "cosine":
            xq = xq / (jnp.linalg.norm(xq, axis=1, keepdims=True) + 1e-12)
            sim = xq @ x_ref.T
        else:
            # negative squared euclidean, via the |a-b|^2 expansion
            sim = 2.0 * (xq @ x_ref.T) - ref_sq[None, :]
        _, nbr = jax.lax.top_k(sim, n_neigh)
        # drop the self/nearest match, as the reference does
        return y_ref[nbr[:, 1:n_neigh]].mean(axis=1)

    chunk = 4096
    fracs = []
    for start in range(0, queries.size, chunk):
        xq = jnp.asarray(x[queries[start : start + chunk]], jnp.float32)
        fracs.append(np.asarray(topk_pos_fraction(xq)))
    frac = np.concatenate(fracs)
    return {
        "k": int(k),
        "pos_knn_agree_mean": float(frac.mean()),
        "pos_knn_agree_std": float(frac.std()),
        "n_ref": int(ref.size),
        "n_pos_queries": int(queries.size),
    }
