"""Training diagnostics: cluster-quality metrics, console tables, and
TensorBoard logging.

Behavioral spec: deepof/clustering/logging.py — per-model soft-assignment
extractors (:37-120), diagnostics (teacher-alignment score, mean
confidence, balance score, populated-cluster count, GMM health, :149-350),
console loss tables (:352) and a TensorBoard writer (:436).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------- #
# Soft-assignment extractors
# --------------------------------------------------------------------------- #


def get_q(bundle, x, a, angles=None) -> np.ndarray:
    """Soft cluster assignments (B, K) for any model bundle."""
    model_name = bundle.rebuild_spec["model"]
    if model_name in ("VaDE", "VQVAE"):
        q = np.asarray(bundle.group(x, a, angles))
    else:
        # Contrastive has no native head; group() via a GMM requires
        # inference-time reclustering — use posthoc.recluster for that.
        raise ValueError(
            "Contrastive models need a fitted GMM for assignments; use "
            "deepof_tpu.train.inference.embedding_per_video."
        )
    q = np.clip(q, 1e-8, None)
    return q / q.sum(-1, keepdims=True)


# --------------------------------------------------------------------------- #
# Diagnostics
# --------------------------------------------------------------------------- #


def compute_diagnostics(
    q: np.ndarray,
    tau_star: Optional[np.ndarray] = None,
) -> Dict[str, float]:
    """Cluster-quality metrics from a batch of soft assignments.

    Returns confidence, balance (normalized usage entropy), populated
    cluster count, and (when a teacher is present) the teacher-alignment
    score (mean agreement between hard q and hard tau*).
    """
    q = np.asarray(q)
    k = q.shape[1]
    hard = q.argmax(1)
    out = {
        "diag/confidence": float(q.max(1).mean()),
        "diag/populated_clusters": float(len(np.unique(hard))),
    }
    usage = np.clip(q.mean(0), 1e-9, None)
    out["diag/balance"] = float(
        -(usage * np.log(usage)).sum() / np.log(max(k, 2))
    )
    if tau_star is not None and len(tau_star) == len(q):
        out["diag/teacher_alignment"] = float(
            (hard == np.asarray(tau_star).argmax(1)).mean()
        )
    return out


def alignment_score(
    q: np.ndarray, tau_star: Optional[np.ndarray] = None
) -> Dict[str, float]:
    """Balance-and-certainty score used for best-score checkpointing.

    Reference semantics (logging.py:236-293): conf_norm = 1 - mean
    per-sample entropy of q over log K; bal_norm = 1 - KL(q_marginal ||
    tau_marginal)/log K when a teacher marginal is available, else the
    normalized marginal entropy of q; alignment_score = conf_norm *
    bal_norm. Only marginals of tau_star are used, so the teacher rows
    need not align with the q rows.
    """
    q = np.clip(np.asarray(q, np.float64), 1e-8, None)
    q = q / q.sum(axis=1, keepdims=True)
    k = q.shape[1]
    log_k = np.log(max(float(k), 2.0))
    mean_entropy = float(-(q * np.log(q)).sum(axis=1).mean())
    q_marg = np.clip(q.mean(axis=0), 1e-9, None)
    conf_norm = float(np.clip(1.0 - mean_entropy / log_k, 0.0, 1.0))
    if tau_star is not None:
        tau_marg = np.clip(np.asarray(tau_star, np.float64).mean(axis=0), 1e-9, None)
        kl = max(0.0, float((q_marg * (np.log(q_marg) - np.log(tau_marg))).sum()))
        bal_norm = float(np.clip(1.0 - kl / log_k, 0.0, 1.0))
    else:
        bal_norm = float(
            np.clip(-(q_marg * np.log(q_marg)).sum() / log_k, 0.0, 1.0)
        )
    return {
        "conf_norm": conf_norm,
        "bal_norm": bal_norm,
        "alignment_score": conf_norm * bal_norm,
    }


def compute_gmm_diagnostics(params: Dict) -> Dict[str, float]:
    """GMM-health metrics from VaDE latent-space parameters."""
    out = {}
    ls = params.get("latent_space", {})
    if "gmm_log_vars" in ls:
        glv = np.asarray(ls["gmm_log_vars"])
        out["diag/gmm_logvar_min"] = float(glv.min())
        out["diag/gmm_logvar_max"] = float(glv.max())
        means = np.asarray(ls["gmm_means"])
        d = np.linalg.norm(means[:, None] - means[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        out["diag/gmm_min_center_distance"] = float(d.min())
    return out


# --------------------------------------------------------------------------- #
# Console + TensorBoard logging
# --------------------------------------------------------------------------- #


def format_loss_table(history: Dict[str, List[float]], last_n: int = 1) -> str:
    """Console loss table of the most recent values (logging.py:352)."""
    rows = []
    width = max((len(k) for k in history), default=10)
    for key in sorted(history):
        values = history[key]
        if not values:
            continue
        recent = values[-last_n:]
        rows.append(f"  {key:<{width}}  {np.mean(recent):>12.5f}")
    return "\n".join(rows)


class MetricsWriter:
    """TensorBoard writer with a no-op fallback (logging.py:436)."""

    def __init__(self, logdir: Optional[str] = None):
        self._writer = None
        if logdir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._writer = SummaryWriter(logdir)
            except ImportError:  # pragma: no cover
                try:
                    import tensorflow as tf

                    self._writer = tf.summary.create_file_writer(logdir)
                except ImportError:
                    self._writer = None

    def log_scalars(self, metrics: Dict[str, float], step: int):
        if self._writer is None:
            return
        if hasattr(self._writer, "add_scalar"):
            for k, v in metrics.items():
                self._writer.add_scalar(k, float(v), step)
        else:  # pragma: no cover - tf writer
            import tensorflow as tf

            with self._writer.as_default():
                for k, v in metrics.items():
                    tf.summary.scalar(k, float(v), step=step)

    def close(self):
        if self._writer is not None and hasattr(self._writer, "close"):
            self._writer.close()


def label_separation_score(
    embeddings: np.ndarray,
    labels: np.ndarray,
    pos_thr: float = 0.5,
    neg_thr: float = 0.5,
    min_pos: int = 2,
    min_neg: int = 2,
    normalize_embeddings: bool = True,
    eps: float = 1e-8,
) -> float:
    """Supervised-label separation of an embedding batch.

    For each label: between-centroid distance over within-class dispersion,
    weighted-averaged across labels with enough samples
    (deepof/clustering/training.py:375-446).

    Args:
        embeddings: (B, H).
        labels: (B, L) or (B, 1, L) in [0, 1].
    """
    x = np.asarray(embeddings, np.float64)
    y = np.asarray(labels, np.float64)
    if y.ndim == 3 and y.shape[1] == 1:
        y = y[:, 0]
    if normalize_embeddings:
        x = x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), eps)

    pos = (y >= pos_thr).astype(np.float64)
    neg = (y <= neg_thr).astype(np.float64)
    n_pos = pos.sum(0)
    n_neg = neg.sum(0)
    valid = (n_pos >= min_pos) & (n_neg >= min_neg)
    if not valid.any():
        return 0.0

    mu_pos = (pos.T @ x) / (n_pos[:, None] + eps)
    mu_neg = (neg.T @ x) / (n_neg[:, None] + eps)
    between = ((mu_pos - mu_neg) ** 2).sum(1)

    x2 = (x**2).sum(1)
    within = (
        np.clip(pos.T @ x2 - n_pos * (mu_pos**2).sum(1), 0, None)
        + np.clip(neg.T @ x2 - n_neg * (mu_neg**2).sum(1), 0, None)
    ) / (n_pos + n_neg + eps)
    per_label = between / (within + eps)
    weights = n_pos + n_neg
    return float(
        (per_label[valid] * weights[valid]).sum() / (weights[valid].sum() + eps)
    )
