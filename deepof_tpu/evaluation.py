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


def compute_compactness(
    z_pos: np.ndarray, z_all: np.ndarray, eps: float = 1e-12
) -> Dict[str, float]:
    """Covariance-trace spread of positive embeddings vs the global set."""
    tr_p = float(np.trace(np.cov(np.asarray(z_pos, np.float64), rowvar=False)))
    tr_a = float(np.trace(np.cov(np.asarray(z_all, np.float64), rowvar=False)))
    return {
        "trace_cov_pos": tr_p,
        "trace_cov_pos_norm_global": tr_p / max(eps, tr_a),
    }


def compute_separability_logreg(
    x: np.ndarray,
    y: np.ndarray,
    n_splits: int = 5,
    seed: int = 0,
    c: float = 1.0,
    max_train: int = 100_000,
) -> Dict[str, float]:
    """Stratified-CV balanced logistic-regression average precision."""
    from sklearn.linear_model import LogisticRegression
    from sklearn.metrics import average_precision_score
    from sklearn.model_selection import StratifiedKFold
    from sklearn.preprocessing import StandardScaler

    yb = (np.asarray(y) > 0.5).astype(np.int32)
    if yb.min() == yb.max():
        return {"ap_mean": float("nan"), "ap_std": float("nan"), "n_used": 0}
    rng = np.random.default_rng(seed)
    idx_pos, idx_neg = np.where(yb == 1)[0], np.where(yb == 0)[0]
    n_pos, n_neg = len(idx_pos), len(idx_neg)
    n_target = min(max_train, n_pos + n_neg)
    n_pos_t = int(round(n_target * n_pos / (n_pos + n_neg)))
    idx = np.concatenate(
        [
            rng.choice(idx_pos, size=min(n_pos_t, n_pos), replace=False),
            rng.choice(idx_neg, size=min(n_target - n_pos_t, n_neg), replace=False),
        ]
    )
    rng.shuffle(idx)
    xs, ys = np.asarray(x)[idx].astype(np.float64), yb[idx]
    skf = StratifiedKFold(n_splits=n_splits, shuffle=True, random_state=seed)
    aps = []
    for tr, te in skf.split(xs, ys):
        sc = StandardScaler()
        xtr, xte = sc.fit_transform(xs[tr]), sc.transform(xs[te])
        clf = LogisticRegression(
            C=c, max_iter=2000, class_weight="balanced", solver="lbfgs"
        )
        clf.fit(xtr, ys[tr])
        aps.append(average_precision_score(ys[te], clf.predict_proba(xte)[:, 1]))
    return {
        "ap_mean": float(np.mean(aps)),
        "ap_std": float(np.std(aps)),
        "n_used": int(len(idx)),
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
    """Fraction of each positive sample's k nearest neighbors that are
    positive."""
    from sklearn.neighbors import NearestNeighbors

    x = np.asarray(x)
    yb = (np.asarray(y) > 0.5).astype(np.int32)
    idx_pos = np.where(yb == 1)[0]
    if idx_pos.size == 0 or x.shape[0] < k + 2:
        return {
            "k": int(k), "pos_knn_agree_mean": float("nan"),
            "pos_knn_agree_std": float("nan"), "n_ref": 0, "n_pos_queries": 0,
        }
    rng = np.random.default_rng(seed)
    idx_all = np.arange(x.shape[0])
    idx_ref = (
        rng.choice(idx_all, size=max_points, replace=False)
        if idx_all.size > max_points else idx_all
    )
    idx_q = (
        rng.choice(idx_pos, size=max_pos_queries, replace=False)
        if idx_pos.size > max_pos_queries else idx_pos
    )
    x_ref, y_ref = x[idx_ref].astype(np.float32), yb[idx_ref]
    nn = NearestNeighbors(n_neighbors=min(k + 1, x_ref.shape[0]), metric=metric)
    nn.fit(x_ref)
    neigh = nn.kneighbors(x[idx_q].astype(np.float32), return_distance=False)
    neigh_k = neigh[:, 1 : min(k + 1, neigh.shape[1])]
    frac = y_ref[neigh_k].mean(axis=1)
    return {
        "k": int(k),
        "pos_knn_agree_mean": float(frac.mean()),
        "pos_knn_agree_std": float(frac.std()),
        "n_ref": int(x_ref.shape[0]),
        "n_pos_queries": int(len(idx_q)),
    }
