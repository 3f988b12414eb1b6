"""Markov state models and Gaussian HMMs for soft-count extraction.

Behavioral spec: deepof/post_hoc.py — contrastive soft-count extraction via
pomegranate Gaussian HMMs (:65-140) and MSM + PCCA+ coarse-graining over
k-means microstates (:1028-1595). Neither pomegranate nor deeptime exist in
this environment, so both algorithms are implemented natively:

  - a diagonal-covariance Gaussian HMM with log-space forward-backward EM,
    fully jitted and batched over sequences (replacing pomegranate);
  - an MSM pipeline (standardize -> k-means microstates -> lagged
    transition matrix -> PCCA+ fuzzy coarse-graining) in numpy (replacing
    deeptime), with the membership decode vectorized.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------- #
# Gaussian HMM (diagonal covariance), log-space EM
# --------------------------------------------------------------------------- #


def _log_gaussian(x, means, log_vars):
    """(T, D) obs vs (K, D) diagonal Gaussians -> (T, K) log densities."""
    diff = x[:, None, :] - means[None]
    return -0.5 * jnp.sum(
        jnp.log(2 * jnp.pi) + log_vars[None] + diff**2 * jnp.exp(-log_vars[None]),
        axis=-1,
    )


def _forward_backward(log_b, log_pi, log_a):
    """Log-space forward-backward. log_b: (T, K). Returns (gamma (T, K),
    xi_sum (K, K), log_likelihood)."""

    def fwd_step(carry, lb):
        la = carry
        new = lb + jax.scipy.special.logsumexp(la[:, None] + log_a, axis=0)
        return new, new

    la0 = log_pi + log_b[0]
    _, las = jax.lax.scan(fwd_step, la0, log_b[1:])
    log_alpha = jnp.concatenate([la0[None], las], axis=0)
    log_likelihood = jax.scipy.special.logsumexp(log_alpha[-1])

    def bwd_step(carry, lb):
        lbeta = carry
        new = jax.scipy.special.logsumexp(
            log_a + (lb + lbeta)[None, :], axis=1
        )
        return new, new

    lbT = jnp.zeros_like(log_pi)
    _, lbs = jax.lax.scan(bwd_step, lbT, log_b[1:][::-1])
    log_beta = jnp.concatenate([lbs[::-1], lbT[None]], axis=0)

    log_gamma = log_alpha + log_beta - log_likelihood
    gamma = jnp.exp(log_gamma)
    # Explicit renormalization absorbs float32 round-off in the scans.
    gamma = gamma / jnp.clip(gamma.sum(-1, keepdims=True), 1e-12)

    # xi_t(i,j) summed over t.
    log_xi = (
        log_alpha[:-1, :, None]
        + log_a[None]
        + (log_b[1:] + log_beta[1:])[:, None, :]
        - log_likelihood
    )
    xi_sum = jnp.exp(jax.scipy.special.logsumexp(log_xi, axis=0))
    return gamma, xi_sum, log_likelihood


@partial(jax.jit, static_argnames=("n_iter",))
def _hmm_em(x, means, log_vars, log_pi, log_a, n_iter: int):
    """EM over a batch of equal-length sequences x: (N, T, D)."""

    def e_step(params, seq):
        means, log_vars, log_pi, log_a = params
        log_b = _log_gaussian(seq, means, log_vars)
        return _forward_backward(log_b, log_pi, log_a)

    def em_iter(carry, _):
        means, log_vars, log_pi, log_a = carry
        gamma, xi, ll = jax.vmap(
            lambda seq: e_step((means, log_vars, log_pi, log_a), seq)
        )(x)
        # M-step (pooled over sequences).
        gsum = gamma.sum(axis=(0, 1))                    # (K,)
        gx = jnp.einsum("ntk,ntd->kd", gamma, x)
        new_means = (gx / jnp.clip(gsum[:, None], 1e-8)).astype(means.dtype)
        gx2 = jnp.einsum("ntk,ntd->kd", gamma, x**2)
        var = gx2 / jnp.clip(gsum[:, None], 1e-8) - new_means**2
        new_log_vars = jnp.log(jnp.clip(var, 1e-5)).astype(log_vars.dtype)
        new_pi = jnp.clip(gamma[:, 0].mean(0), 1e-8)
        new_log_pi = jnp.log(new_pi / new_pi.sum()).astype(log_pi.dtype)
        a = xi.sum(0)
        a = a / jnp.clip(a.sum(1, keepdims=True), 1e-8)
        new_log_a = jnp.log(jnp.clip(a, 1e-8)).astype(log_a.dtype)
        return (new_means, new_log_vars, new_log_pi, new_log_a), ll.sum()

    (means, log_vars, log_pi, log_a), lls = jax.lax.scan(
        em_iter, (means, log_vars, log_pi, log_a), None, length=n_iter
    )
    return means, log_vars, log_pi, log_a, lls


class GaussianHMM:
    """Diagonal-covariance Gaussian HMM trained with jitted batched EM."""

    def __init__(self, n_states: int, n_iter: int = 50, seed: int = 0):
        self.n_states = n_states
        self.n_iter = n_iter
        self.seed = seed
        self.params = None

    def fit(self, x: np.ndarray) -> "GaussianHMM":
        """x: (N, T, D) batch of sequences."""
        x = jnp.asarray(x, jnp.float32)
        n, t, d = x.shape
        k = self.n_states
        rng = np.random.default_rng(self.seed)
        flat = np.asarray(x).reshape(-1, d)
        init_idx = rng.choice(len(flat), size=k, replace=False)
        means = jnp.asarray(flat[init_idx], jnp.float32)
        log_vars = jnp.log(jnp.var(x.reshape(-1, d), axis=0) + 1e-3)[None].repeat(
            k, 0
        ).astype(jnp.float32)
        log_pi = jnp.log(jnp.ones(k, jnp.float32) / k)
        log_a = jnp.log(
            jnp.asarray(
                np.full((k, k), 0.1 / max(k - 1, 1))
                + np.eye(k) * (0.9 - 0.1 / max(k - 1, 1)),
                jnp.float32,
            )
        )
        m, lv, lp, la, lls = _hmm_em(x, means, log_vars, log_pi, log_a, self.n_iter)
        self.params = (m, lv, lp, la)
        self.log_likelihoods_ = np.asarray(lls)
        return self

    def log_probability(self, x: np.ndarray) -> float:
        m, lv, lp, la = self.params
        x = jnp.asarray(x, jnp.float32)

        def one(seq):
            log_b = _log_gaussian(seq, m, lv)
            _, _, ll = _forward_backward(log_b, lp, la)
            return ll

        return float(jnp.sum(jax.vmap(one)(x)))

    def predict_proba(
        self, seq: np.ndarray, log_bias: Optional[np.ndarray] = None
    ) -> np.ndarray:
        """State posteriors gamma for one sequence (T, D) -> (T, K).

        ``log_bias`` (T, K) is added to the log emissions before smoothing
        — the prior-biased decode of the reference's legacy contrastive
        extractor (post_hoc.py:352-355: log_emiss += prior_weight*log(P))."""
        m, lv, lp, la = self.params
        log_b = _log_gaussian(jnp.asarray(seq, jnp.float32), m, lv)
        if log_bias is not None:
            log_b = log_b + jnp.asarray(log_bias, jnp.float32)
        gamma, _, _ = _forward_backward(log_b, lp, la)
        return np.asarray(gamma)

    def n_params(self, d: int) -> int:
        k = self.n_states
        return k * (2 * d) + k * (k - 1)


def fit_hmm_range(
    embeddings: Dict[str, np.ndarray],
    states: str = "bic",
    min_states: int = 2,
    max_states: int = 15,
    n_iter: int = 30,
) -> Tuple[GaussianHMM, list]:
    """Fit HMMs across a state range, select by AIC/BIC
    (post_hoc.py:65-140)."""
    seqs = [np.asarray(v, np.float32) for v in embeddings.values()]
    d = seqs[0].shape[1]
    min_t = min(s.shape[0] for s in seqs)
    x = np.stack([s[:min_t] for s in seqs], axis=0)
    n_obs = x.shape[0] * x.shape[1]

    scores, best, best_score = [], None, np.inf
    for k in range(min_states, max_states + 1):
        model = GaussianHMM(k, n_iter=n_iter).fit(x)
        ll = model.log_probability(x)
        p = model.n_params(d)
        score = 2 * p - 2 * ll if states == "aic" else p * np.log(n_obs) - 2 * ll
        scores.append(score)
        if score < best_score:
            best, best_score = model, score
    return best, scores


def _align_prior(
    p: np.ndarray, t: int, k: int, min_confidence: Optional[float], eps: float = 1e-12
) -> np.ndarray:
    """Align a (T', K) per-frame prior to T rows and gate low-confidence
    rows to uniform — the reference's _get_prior (post_hoc.py:256-283):
    shorter priors are padded with uniform rows, longer ones truncated,
    rows are clipped/renormalized, and rows whose max <= min_confidence
    are replaced by 1/K."""
    p = np.asarray(p, np.float64)
    if p.ndim != 2:
        raise ValueError(f"soft-count priors must be (T, K); got {p.shape}")
    if p.shape[1] != k:
        raise ValueError(
            f"K mismatch: prior has {p.shape[1]} states, expected {k}"
        )
    if p.shape[0] < t:
        p = np.vstack([p, np.full((t - p.shape[0], k), 1.0 / k)])
    elif p.shape[0] > t:
        p = p[:t]
    p = np.maximum(p, eps)
    p = p / p.sum(axis=1, keepdims=True)
    if min_confidence is not None:
        low = p.max(axis=1) <= float(min_confidence)
        p[low] = 1.0 / k
    return p


def get_soft_counts_hmm(
    embeddings,
    states="bic",
    min_states: int = 2,
    max_states: int = 15,
    n_states: Optional[int] = None,
    soft_counts: Optional[Dict[str, np.ndarray]] = None,
    min_confidence: Optional[float] = 0.75,
    prior_weight: float = 1.0,
) -> Dict[str, np.ndarray]:
    """Per-experiment HMM state posteriors as soft counts.

    When ``soft_counts`` priors are given, the decode is prior-biased like
    the reference's legacy contrastive extractor (post_hoc.py:146-375): K
    is taken from the prior's second dimension (state selection is
    skipped), rows with max prior <= ``min_confidence`` fall back to
    uniform, and the smoothing adds ``prior_weight * log(prior)`` to the
    log emissions."""
    from deepof_tpu.core.storage import get_dt

    seqs = {k: np.asarray(get_dt(embeddings, k), np.float32) for k in embeddings.keys()}
    if soft_counts is not None:
        k0 = next((k for k in seqs if k in soft_counts), None)
        if k0 is None:
            raise ValueError(
                "soft_counts provided but no keys overlap with embeddings"
            )
        k_prior = int(np.asarray(soft_counts[k0]).shape[1])
        if n_states is not None and int(n_states) != k_prior:
            raise ValueError(
                f"n_states={n_states} but soft_counts implies K={k_prior}; "
                "they must match"
            )
        n_states = k_prior
    if n_states is not None:
        min_t = min(s.shape[0] for s in seqs.values())
        x = np.stack([s[:min_t] for s in seqs.values()])
        model = GaussianHMM(n_states).fit(x)
    else:
        model, _ = fit_hmm_range(seqs, states, min_states, max_states)

    out = {}
    for k, s in seqs.items():
        log_bias = None
        if soft_counts is not None and k in soft_counts:
            prior = _align_prior(
                soft_counts[k], s.shape[0], model.n_states, min_confidence
            )
            log_bias = float(prior_weight) * np.log(prior)
        out[k] = model.predict_proba(s, log_bias=log_bias)
    return out


# --------------------------------------------------------------------------- #
# MSM + PCCA+
# --------------------------------------------------------------------------- #


def estimate_transition_matrix(
    dtrajs, n_states: int, lagtime: int = 1, reversible: bool = True
) -> np.ndarray:
    """Row-stochastic transition matrix from discrete trajectories."""
    c = np.zeros((n_states, n_states))
    for d in dtrajs:
        d = np.asarray(d)
        if len(d) > lagtime:
            np.add.at(c, (d[:-lagtime], d[lagtime:]), 1.0)
    if reversible:
        c = 0.5 * (c + c.T)
    c += 1e-8
    return c / c.sum(1, keepdims=True)


def stationary_distribution(p: np.ndarray) -> np.ndarray:
    """Stationary distribution of a row-stochastic matrix (left Perron
    eigenvector, normalized to a probability vector)."""
    vals, vecs = np.linalg.eig(p.T)
    pi = np.real(vecs[:, np.argmax(np.real(vals))])
    pi = np.abs(pi)
    return pi / pi.sum()


def coarse_grain_transition(
    p: np.ndarray, chi: np.ndarray, pi: Optional[np.ndarray] = None
) -> np.ndarray:
    """PCCA+ coarse-grained macro transition matrix
    ``P_c = (chi^T D chi)^{-1} chi^T D P chi`` with ``D = diag(pi)`` —
    the coarse kinetics deeptime exposes via ``PCCAModel.coarse_grained_
    transition_matrix`` (reference consumes the memberships only; the
    projected kinetics pin the algorithm numerically in tests)."""
    if pi is None:
        pi = stationary_distribution(p)
    d = chi * pi[:, None]  # D @ chi without forming diag
    m = chi.T @ d
    return np.linalg.solve(m, d.T @ p @ chi)


def pcca_plus(p: np.ndarray, n_macro: int) -> np.ndarray:
    """PCCA+ fuzzy coarse-graining: micro-to-macro membership matrix chi
    (n_micro, n_macro), rows summing to 1.

    Deuflhard-Weber inner-simplex construction on the dominant eigenvectors
    of the transition matrix (the algorithm deeptime implements).
    """
    n = p.shape[0]
    n_macro = min(n_macro, n)
    vals, vecs = np.linalg.eig(p)
    order = np.argsort(-np.real(vals))
    x = np.real(vecs[:, order[:n_macro]])
    # Normalize the stationary eigenvector to 1.
    x[:, 0] = 1.0

    # Inner simplex: greedily pick the most spread-out rows as vertices.
    idx = np.zeros(n_macro, dtype=int)
    d = np.linalg.norm(x - x.mean(0), axis=1)
    idx[0] = int(np.argmax(d))
    ortho = x - x[idx[0]]
    for k in range(1, n_macro):
        norms = np.linalg.norm(ortho, axis=1)
        idx[k] = int(np.argmax(norms))
        v = ortho[idx[k]]
        nv = np.linalg.norm(v)
        if nv > 1e-12:
            ortho = ortho - np.outer(ortho @ v, v) / (nv**2)

    a = np.linalg.pinv(x[idx])
    chi = x @ a
    chi = np.clip(chi, 0.0, None)
    rs = chi.sum(1, keepdims=True)
    return chi / np.maximum(rs, 1e-12)


def fit_msm_pcca(
    embeddings: Dict[str, np.ndarray],
    n_macro: int = 10,
    n_micro: int = 200,
    lagtime: int = 3,
    sample_size: int = 200_000,
    random_state: int = 0,
):
    """Fit the k-means microstate MSM + PCCA+ pipeline.

    Returns a dict with scaler, kmeans, transition matrix, and the
    micro-to-macro membership chi (post_hoc.py:_fit_msmpcca_models).
    """
    from sklearn.cluster import MiniBatchKMeans
    from sklearn.preprocessing import StandardScaler

    pooled = np.concatenate([np.asarray(v, np.float32) for v in embeddings.values()])
    if len(pooled) > sample_size:
        rng = np.random.default_rng(random_state)
        pooled_fit = pooled[rng.choice(len(pooled), sample_size, replace=False)]
    else:
        pooled_fit = pooled
    n_micro = min(n_micro, max(n_macro, len(pooled_fit) // 5))

    scaler = StandardScaler().fit(pooled_fit)
    kmeans = MiniBatchKMeans(
        n_clusters=n_micro, random_state=random_state, n_init=3
    ).fit(scaler.transform(pooled_fit))

    dtrajs = [
        kmeans.predict(scaler.transform(np.asarray(v, np.float32)))
        for v in embeddings.values()
    ]
    p = estimate_transition_matrix(dtrajs, n_micro, lagtime=lagtime)
    chi = pcca_plus(p, n_macro)
    return {"scaler": scaler, "kmeans": kmeans, "transition": p, "chi": chi}


def _temporal_smooth(p: np.ndarray, win: int) -> np.ndarray:
    kernel = np.ones(win) / win
    out = np.empty_like(p)
    for j in range(p.shape[1]):
        out[:, j] = np.convolve(p[:, j], kernel, mode="same")
    return out


def get_soft_counts_msm(
    embeddings,
    n_components: int = 10,
    n_micro: int = 200,
    lagtime: int = 3,
    temporal_smooth_win: Optional[int] = 3,
    random_state: int = 0,
) -> Dict[str, np.ndarray]:
    """Per-experiment MSM/PCCA+ macro-state memberships as soft counts
    (the un-gated core of post_hoc.py:1474-1595)."""
    from deepof_tpu.core.storage import get_dt

    seqs = {k: np.asarray(get_dt(embeddings, k), np.float32) for k in embeddings.keys()}
    model = fit_msm_pcca(
        seqs, n_macro=n_components, n_micro=n_micro, lagtime=lagtime,
        random_state=random_state,
    )
    out = {}
    for key, z in seqs.items():
        d = model["kmeans"].predict(model["scaler"].transform(z))
        p = model["chi"][d]
        if temporal_smooth_win and temporal_smooth_win > 1:
            p = _temporal_smooth(p, temporal_smooth_win)
        rs = p.sum(1, keepdims=True)
        out[key] = (p / np.maximum(rs, 1e-12)).astype(np.float32)
    return out


# --------------------------------------------------------------------------- #
# Sticky-HMM contrastive extractor (reference public API)
# --------------------------------------------------------------------------- #


def get_contrastive_soft_counts(
    coordinates,
    embeddings,
    states="bic",
    min_states: int = 2,
    max_states: int = 25,
    reg_covar: float = 1e-5,
    sample_size: int = 500000,
    random_state: int = 0,
    p_stay: float = 0.95,
    soft_counts: Optional[Dict[str, np.ndarray]] = None,
    min_confidence: Optional[float] = 0.75,
    prior_weight: float = 1.0,
):
    """Sticky-HMM soft counts for the contrastive model — the reference's
    legacy public extractor (post_hoc.py:146-375): diagonal-GMM emissions
    fitted on pooled samples (no HMM EM), a sticky transition matrix
    ``A = p_stay*I + (1-p_stay)*1 pi^T``, AIC/BIC state selection via the
    forward log-likelihood, optional per-frame priors with confidence
    gating (``log_emiss += prior_weight * log(P)``), and forward-backward
    smoothing (run through the jitted log-space kernels above).

    Returns a TableDict of (T, K) posteriors when ``coordinates`` is
    given (saved through the pointer protocol for very large projects),
    else a plain dict.
    """
    import os

    from sklearn.mixture import GaussianMixture

    from deepof_tpu.core.storage import get_dt, save_dt

    keys = list(embeddings.keys())
    if not keys:
        raise ValueError("Embeddings are empty.")
    seqs = {k: np.asarray(get_dt(embeddings, k), np.float32) for k in keys}

    def _sample_rows():
        if hasattr(embeddings, "sample_windows_from_data"):
            per = max(int(sample_size / len(keys)), 1)
            z = embeddings.sample_windows_from_data(n_windows=per, seed=random_state)[0]
            z = np.asarray(z, np.float32)
            if z.ndim > 2:
                z = z.reshape(len(z), -1)
            if len(z):
                return z
        pooled = np.concatenate(list(seqs.values()))
        if len(pooled) > sample_size:
            rng = np.random.default_rng(random_state)
            pooled = pooled[rng.choice(len(pooled), sample_size, replace=False)]
        return pooled

    rows = _sample_rows()

    def _fit_params(k: int):
        gm = GaussianMixture(
            n_components=k, covariance_type="diag", reg_covar=reg_covar,
            max_iter=200, tol=1e-3, random_state=random_state,
            init_params="kmeans",
        ).fit(rows)
        return (
            gm.means_.astype(np.float32),
            gm.covariances_.astype(np.float32),
            gm.weights_.astype(np.float64),
        )

    def _hmm_terms(mu, var, pi):
        a = float(p_stay) * np.eye(len(pi)) + (1.0 - float(p_stay)) * (
            np.ones((len(pi), 1)) @ pi[None, :]
        )
        a = np.maximum(a, 1e-12)
        a /= a.sum(axis=1, keepdims=True)
        return (
            jnp.asarray(mu),
            jnp.asarray(np.log(np.maximum(var, 1e-10)), jnp.float32),
            jnp.asarray(np.log(np.maximum(pi, 1e-12)), jnp.float32),
            jnp.asarray(np.log(a), jnp.float32),
        )

    d = seqs[keys[0]].shape[1]
    if soft_counts is not None:
        k0 = next((k for k in keys if k in soft_counts), None)
        if k0 is None:
            raise ValueError(
                "soft_counts provided but no keys overlap with embeddings"
            )
        k_prior = int(np.asarray(get_dt(soft_counts, k0)).shape[1])
        if isinstance(states, int) and int(states) != k_prior:
            raise ValueError(
                f"states={states} but soft_counts implies K={k_prior}; "
                "they must match"
            )
        k_best = k_prior
    elif isinstance(states, int):
        k_best = int(states)
    else:
        crit = str(states).lower()
        if crit not in ("aic", "bic"):
            raise NotImplementedError(
                'invalid states type; try "aic", "bic" or an int'
            )
        t_total = sum(len(s) for s in seqs.values())
        best_score = k_best = None
        for k in range(max(2, min_states), max(min_states, max_states) + 1):
            mu, lv, lp, la = _hmm_terms(*_fit_params(k))
            ll = 0.0
            for s in seqs.values():
                log_b = _log_gaussian(jnp.asarray(s), mu, lv)
                _, _, seq_ll = _forward_backward(log_b, lp, la)
                ll += float(seq_ll)
            p = 2 * k * d + (k - 1)
            score = 2 * p - 2 * ll if crit == "aic" else p * np.log(
                max(t_total, 1)
            ) - 2 * ll
            if best_score is None or score < best_score:
                best_score, k_best = score, k

    mu, lv, lp, la = _hmm_terms(*_fit_params(k_best))
    out = {}
    for key in keys:
        s = seqs[key]
        log_b = _log_gaussian(jnp.asarray(s), mu, lv)
        if soft_counts is not None and key in soft_counts:
            prior = _align_prior(
                np.asarray(get_dt(soft_counts, key)), s.shape[0], k_best,
                min_confidence,
            )
            log_b = log_b + jnp.asarray(
                float(prior_weight) * np.log(prior), jnp.float32
            )
        gamma, _, _ = _forward_backward(log_b, lp, la)
        out[str(key)] = np.asarray(gamma)

    if coordinates is None:
        return out

    from deepof_tpu.core.table_dict import TableDict

    table_path = os.path.join(
        coordinates._project_path, coordinates._project_name, "Tables"
    )
    saved = {
        key: save_dt(
            counts,
            os.path.join(table_path, key, f"{key}_soft_counts"),
            coordinates._very_large_project,
        )
        for key, counts in out.items()
    }
    return TableDict(
        saved, typ="unsupervised_counts", table_path=table_path,
        exp_conditions=coordinates.get_exp_conditions,
    )
