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


def get_q(bundle, x, a) -> np.ndarray:
    """Soft cluster assignments (B, K) for any model bundle."""
    model_name = bundle.rebuild_spec["model"]
    if model_name in ("VaDE", "VQVAE"):
        q = np.asarray(bundle.group(x, a))
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
