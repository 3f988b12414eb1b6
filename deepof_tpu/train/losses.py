"""Model losses as pure JAX functions.

Behavioral spec: deepof/clustering/losses.py —
  - contrastive NCE / DCL / FC / hard-DCL with cosine / dot / euclidean
    similarities (:35-255);
  - Gram-matrix kmeans regularizer (:257, lives in models.heads);
  - VaDE composite loss (:362-803): masked-Normal reconstruction NLL,
    KL (standard-Normal in pretrain, 32-sample Monte-Carlo vs the GMM prior
    in main), activity L1, cluster-usage, repel / non-empty / scatter /
    temporal-cohesion regularizers, and teacher-distillation CE.

Everything here takes explicit weight scalars so the whole loss fuses into
a single jitted train step (schedules feed iteration-dependent weights as
scalar args, not recompiles).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

_LOG_2PI = math.log(2.0 * math.pi)


# --------------------------------------------------------------------------- #
# Similarities and contrastive losses
# --------------------------------------------------------------------------- #


def cosine_similarity_matrix(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)
    yn = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), 1e-8)
    return xn @ yn.T


def dot_similarity_matrix(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return x @ y.T


def euclidean_similarity_matrix(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    d2 = jnp.sum((x[:, None] - y[None]) ** 2, axis=-1)
    return 1.0 / (1.0 + jnp.sqrt(jnp.clip(d2, 0.0)))


SIMILARITIES: Dict[str, Callable] = {
    "cosine": cosine_similarity_matrix,
    "dot": dot_similarity_matrix,
    "euclidean": euclidean_similarity_matrix,
    "edit": euclidean_similarity_matrix,
}


def _off_diagonal(sim: jnp.ndarray) -> jnp.ndarray:
    """Row-wise off-diagonal entries, (N, N-1) — static-shape (jittable)."""
    n = sim.shape[0]
    return (
        sim.reshape(-1)[:-1].reshape(n - 1, n + 1)[:, 1:].reshape(n, n - 1)
    )


def nce_loss(history, future, similarity, temperature=0.1):
    """InfoNCE with in-batch negatives (SimCLR-style)."""
    sim = similarity(history, future) / temperature
    n = sim.shape[0]
    log_probs = jax.nn.log_softmax(sim, axis=1)
    loss = -jnp.mean(jnp.diag(log_probs))
    mean_pos = jnp.mean(jnp.diag(sim)) * temperature
    mean_neg = jnp.mean(_off_diagonal(sim * temperature))
    return loss, mean_pos, mean_neg


def dcl_loss(history, future, similarity, temperature=0.1, debiased=True, tau_plus=0.1):
    """Debiased contrastive loss (Chuang et al. 2020)."""
    n = history.shape[0]
    sim = similarity(history, future)
    pos = jnp.exp(jnp.diag(sim) / temperature)
    neg_raw = _off_diagonal(sim)
    neg = jnp.exp(neg_raw / temperature)
    if debiased:
        n_eff = n - 1
        ng = (-tau_plus * n_eff * pos + neg.sum(-1)) / (1.0 - tau_plus)
        ng = jnp.clip(ng, n_eff * math.e ** (-1.0 / temperature))
    else:
        ng = neg.sum(-1)
    loss = jnp.mean(-jnp.log(pos / (pos + ng)))
    return loss, jnp.mean(jnp.diag(sim)), jnp.mean(neg_raw)


def fc_loss(history, future, similarity, temperature=0.1, elimination_topk=0.1):
    """False-negative elimination: drop top-k most similar negatives."""
    n = history.shape[0]
    k = max(1, int(math.ceil(min(elimination_topk, 0.5) * n)))
    sim = similarity(history, future) / temperature
    pos = jnp.exp(jnp.diag(sim))
    neg_raw = _off_diagonal(sim)
    keep = max((n - 1) - k, 0)
    trimmed = jnp.sort(neg_raw, axis=1)[:, :keep]
    neg_sum = jnp.exp(trimmed).sum(-1) if keep > 0 else jnp.zeros(n)
    loss = jnp.mean(-jnp.log(pos / (pos + neg_sum)))
    mean_neg = jnp.mean(trimmed) * temperature if keep > 0 else jnp.array(0.0)
    return loss, jnp.mean(jnp.diag(sim)) * temperature, mean_neg


def hard_loss(history, future, similarity, temperature=0.1, beta=0.0, debiased=True, tau_plus=0.1):
    """Hard-negative reweighted DCL (Robinson et al. 2021)."""
    n = history.shape[0]
    sim = similarity(history, future)
    pos = jnp.exp(jnp.diag(sim) / temperature)
    neg_raw = _off_diagonal(sim)
    neg = jnp.exp(neg_raw / temperature)
    if beta == 0.0:
        reweight = jnp.ones_like(neg)
    else:
        reweight = (beta * neg) / neg.mean(axis=1, keepdims=True)
    if debiased:
        n_eff = n - 1
        ng = (-tau_plus * n_eff * pos + (reweight * neg).sum(-1)) / (1.0 - tau_plus)
        ng = jnp.clip(ng, math.e ** (-1.0 / temperature))
    else:
        ng = neg.sum(-1)
    loss = jnp.mean(-jnp.log(pos / (pos + ng)))
    return loss, jnp.mean(jnp.diag(sim)), jnp.mean(neg_raw)


def select_contrastive_loss(
    history, future,
    similarity: str = "cosine",
    loss_fn: str = "nce",
    temperature: float = 0.1,
    tau: float = 0.1,
    beta: float = 0.1,
    elimination_topk: float = 0.1,
):
    sim_fn = SIMILARITIES[similarity]
    if loss_fn == "nce":
        return nce_loss(history, future, sim_fn, temperature)
    if loss_fn == "dcl":
        return dcl_loss(history, future, sim_fn, temperature, True, tau)
    if loss_fn == "fc":
        return fc_loss(history, future, sim_fn, temperature, elimination_topk)
    if loss_fn == "hard_dcl":
        return hard_loss(history, future, sim_fn, temperature, beta, True, tau)
    raise ValueError(f"Unknown loss_fn: {loss_fn}")


def soft_ce_logits(logits: jnp.ndarray, soft_targets: jnp.ndarray, reduction="mean"):
    """Cross-entropy between soft targets and logits."""
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    targets = jnp.clip(soft_targets, 1e-8, 1.0)
    per_sample = -(targets * log_probs).sum(-1)
    if reduction == "mean":
        return per_sample.mean()
    if reduction == "sum":
        return per_sample.sum()
    return per_sample


def cluster_frequencies_regularizer(soft_counts: jnp.ndarray) -> jnp.ndarray:
    """KL(uniform || mean cluster usage)."""
    mean_freq = jnp.mean(soft_counts, axis=0)
    k = soft_counts.shape[1]
    uniform = jnp.ones(k) / k
    return jnp.sum(uniform * (jnp.log(uniform) - jnp.log(mean_freq + 1e-9)))


# --------------------------------------------------------------------------- #
# VaDE loss
# --------------------------------------------------------------------------- #


@dataclass(frozen=True)
class VadeLossParams:
    """Static weights of the VaDE loss for one phase (pretrain or main)."""

    n_components: int
    l1_activity_weight: float = 0.1
    tf_cluster_weight: float = 0.0
    reg_cat_clusters_weight: float = 0.0
    temporal_cohesion_weight: float = 0.0
    reg_scatter_weight: float = 0.0
    reg_scatter_beta: float = 1.0
    kmeans_loss_weight: float = 0.0
    repel_weight: float = 0.0
    repel_length_scale: float = 1.0
    nonempty_weight: float = 0.0
    nonempty_floor: float = 1e-4
    nonempty_p: int = 2
    pretrain_mode: bool = True
    distill_sharpen_T: float = 0.5
    distill_conf_weight: bool = False
    distill_conf_thresh: float = 0.3
    gmm_logvar_clamp: Tuple[float, float] = (-8.0, 8.0)
    mc_kl_samples: int = 32


def _log_normal_diag(x, mean, log_var):
    return -0.5 * jnp.sum(
        _LOG_2PI + log_var + (x - mean) ** 2 * jnp.exp(-log_var), axis=-1
    )


def _monte_carlo_kl(rng, z_mean, z_log_var, gmm_means, gmm_log_vars, prior, params):
    z_log_var = jnp.clip(z_log_var, -4.0, 4.0)
    s = params.mc_kl_samples
    b, d = z_mean.shape
    scale_q = jnp.exp(0.5 * z_log_var)
    eps = jax.random.normal(rng, (s, b, d), z_mean.dtype)
    z = z_mean[None] + eps * scale_q[None]
    log_q = _log_normal_diag(z, z_mean[None], z_log_var[None])

    glv = jnp.clip(gmm_log_vars, *params.gmm_logvar_clamp)
    log_prior = jnp.log(jnp.clip(prior, 1e-8))
    log_p_zc = _log_normal_diag(
        z[:, :, None, :], gmm_means[None, None], glv[None, None]
    )
    log_p = jax.scipy.special.logsumexp(log_prior[None, None] + log_p_zc, axis=-1)
    return jnp.clip((log_q - log_p).mean(), 0.0)


def vade_loss(
    outputs: Dict,
    x_original: jnp.ndarray,
    params: VadeLossParams,
    kl_weight: float,
    rng: jax.Array,
    tau_star_batch: Optional[jnp.ndarray] = None,
    lambda_distill: float = 0.0,
    class_weight: Optional[jnp.ndarray] = None,
    teacher_marginal: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """Composite VaDE loss; mirrors VadeLoss.forward (losses.py:567-803).

    Args:
        outputs: VaDE forward dict (reconstruction, latent, categorical, ...).
        x_original: (B, T, N, F) input windows.
        params: static per-phase weights.
        kl_weight: scheduled KL weight (scalar traced arg).
        rng: PRNG key for the Monte-Carlo KL.
        tau_star_batch: (B, C) teacher assignments for this batch, or None.
        lambda_distill: scheduled distillation weight.
    """
    recon_dist = outputs["reconstruction"]
    latent_z = outputs["latent"]
    q = outputs["categorical"]
    kmeans_loss = outputs["kmeans_loss"]
    z_mean = outputs["z_mean"]
    z_log_var = outputs["z_log_var"]
    gmm = outputs["gmm_params"]

    b, t = x_original.shape[:2]
    x_flat = x_original.reshape(b, t, -1)

    reconstruction_loss = -jnp.mean(recon_dist.log_prob(x_flat))

    q = jnp.clip(q, 1e-8)
    q = q / q.sum(-1, keepdims=True)

    activity_l1 = params.l1_activity_weight * jnp.mean(
        jnp.sum(jnp.abs(z_log_var), axis=-1)
    )

    z_mean32 = z_mean.astype(jnp.float32)
    z_log_var32 = jnp.clip(z_log_var.astype(jnp.float32), -4.0, 2.0)

    if params.pretrain_mode:
        kl_vec = 0.5 * jnp.sum(
            z_mean32**2 + jnp.exp(z_log_var32) - 1.0 - z_log_var32, axis=-1
        ) / z_log_var32.shape[-1]
        kl_batch = kl_weight * kl_vec.mean()
    else:
        kl_batch = kl_weight * _monte_carlo_kl(
            rng, z_mean32, z_log_var32,
            gmm["means"].astype(jnp.float32),
            gmm["log_vars"].astype(jnp.float32),
            gmm["prior"].astype(jnp.float32),
            params,
        )

    kmeans_term = params.kmeans_loss_weight * kmeans_loss

    # Repel: RBF kernel between soft centroids.
    repel_loss = jnp.array(0.0)
    if params.repel_weight > 0.0:
        qf = jax.lax.stop_gradient(q.astype(jnp.float32))
        zf = latent_z.astype(jnp.float32)
        pi_b = jnp.clip(qf.sum(0), 1e-8)
        means = (qf.T @ zf) / pi_b[:, None]
        d2 = jnp.sum((means[:, None] - means[None]) ** 2, axis=-1)
        kmat = jnp.exp(-d2 / max(1e-9, 2.0 * params.repel_length_scale**2))
        kmat = kmat - jnp.diag(jnp.diag(kmat))
        c = means.shape[0]
        repel_loss = params.repel_weight * kmat.sum() / max(1, c * c - c)

    # Non-empty: penalize clusters used less than the floor.
    nonempty_loss = jnp.array(0.0)
    if params.nonempty_weight > 0.0:
        q_marg = q.mean(0)
        if teacher_marginal is not None:
            floor_c = jnp.maximum(
                params.nonempty_floor, 0.9 * jnp.clip(teacher_marginal, 1e-8)
            )
        else:
            floor_c = jnp.full_like(q_marg, params.nonempty_floor)
        underuse = jnp.clip(floor_c - q_marg, 0.0)
        nonempty_loss = params.nonempty_weight * jnp.sum(
            underuse**params.nonempty_p
        )

    tf_cluster = jnp.array(0.0)
    prior_loss = jnp.array(0.0)
    cat_cluster_loss = jnp.array(0.0)
    temporal_loss = jnp.array(0.0)
    scatter_loss = jnp.array(0.0)
    if not params.pretrain_mode:
        glv = jnp.clip(gmm["log_vars"].astype(jnp.float32), *params.gmm_logvar_clamp)
        scale = jnp.maximum(jnp.exp(0.5 * glv), 1e-3)
        diff = latent_z.astype(jnp.float32)[:, None] - gmm["means"].astype(jnp.float32)[None]
        logp = -0.5 * jnp.sum(
            jnp.log(2 * jnp.pi * scale[None] ** 2) + (diff / scale[None]) ** 2, axis=-1
        )
        post_like = jax.nn.softmax(logp, axis=-1)
        tf_cluster = -jnp.mean((q * post_like).sum(-1)) * params.tf_cluster_weight

        log_pi = math.log(1.0 / max(1, params.n_components))
        prior_loss = -jnp.mean((q * log_pi).sum(-1))

        if params.reg_cat_clusters_weight > 0:
            cat_cluster_loss = (
                params.reg_cat_clusters_weight * cluster_frequencies_regularizer(q)
            )
        if params.temporal_cohesion_weight > 0.0 and q.shape[0] > 1:
            temporal_loss = params.temporal_cohesion_weight * jnp.mean(
                jnp.abs(q[1:] - q[:-1]).sum(-1)
            )
        if params.reg_scatter_weight > 0.0:
            qf = q.astype(jnp.float32)
            z = z_mean.astype(jnp.float32)
            pi_b = jnp.clip(qf.sum(0), 1e-8)
            mu = (qf.T @ z) / pi_b[:, None]
            diff = z[:, None] - mu[None]
            scat_c = (qf[..., None] * diff**2).sum(0) / pi_b[:, None]
            w = ((pi_b / pi_b.mean()) ** (-params.reg_scatter_beta))[:, None]
            scatter_loss = params.reg_scatter_weight * jnp.mean(w * scat_c)

    # Teacher distillation CE (lambda_distill == 0 nulls the term; the
    # branch is static on tau presence only, so it jits cleanly).
    distill_loss = jnp.array(0.0)
    if tau_star_batch is not None:
        tau_b = tau_star_batch
        if params.distill_sharpen_T and params.distill_sharpen_T > 0.0:
            logits_t = jnp.log(jnp.clip(tau_b, 1e-8)) / params.distill_sharpen_T
            tau_b = jax.nn.softmax(logits_t, axis=-1)
        per_sample = -(tau_b * jnp.log(jnp.clip(q, 1e-8))).sum(-1)
        w_total = None
        if params.distill_conf_weight:
            conf = tau_b.max(1)
            thr = params.distill_conf_thresh
            w_total = jax.lax.stop_gradient(
                jnp.clip((conf - thr) / max(1e-6, 1.0 - thr), 0.0, 1.0)
            )
        if class_weight is not None:
            w_class = tau_b @ class_weight
            w_class = jax.lax.stop_gradient(
                w_class / jnp.clip(w_class.mean(), 1e-8)
            )
            w_total = w_class if w_total is None else w_total * w_class
        distill_loss = (
            (w_total * per_sample).mean() if w_total is not None else per_sample.mean()
        )
        distill_loss = lambda_distill * distill_loss

    total = (
        reconstruction_loss
        + kl_batch
        + cat_cluster_loss
        + temporal_loss
        + nonempty_loss
        + tf_cluster
        + prior_loss
        + kmeans_term
        + activity_l1
        + scatter_loss
        + repel_loss
        + distill_loss
    )
    return {
        "total_loss": total,
        "reconstruct_loss": reconstruction_loss,
        "kl_div": kl_batch,
        "kl_weight": jnp.asarray(kl_weight),
        "tf_clust_loss": tf_cluster,
        "prior_loss": prior_loss,
        "kmeans_loss": kmeans_term,
        "activity_l1": activity_l1,
        "cat_clust_loss": cat_cluster_loss,
        "distill_loss": distill_loss,
        "nonempty_loss": nonempty_loss,
        "temporal_loss": temporal_loss,
        "scatter_loss": scatter_loss,
        "repel_loss": repel_loss,
    }


def vade_params_from_cfg(common, vade_cfg, teacher_cfg, pretrain: bool) -> VadeLossParams:
    """Build the per-phase static weights from config dataclasses."""
    if pretrain:
        return VadeLossParams(
            n_components=common.n_components,
            tf_cluster_weight=vade_cfg.tf_cluster_weight,
            reg_cat_clusters_weight=vade_cfg.reg_cat_clusters,
            temporal_cohesion_weight=vade_cfg.temporal_cohesion_weight,
            reg_scatter_weight=vade_cfg.reg_scatter_weight,
            reg_scatter_beta=vade_cfg.reg_scatter_beta,
            kmeans_loss_weight=vade_cfg.kmeans_loss_pretrain,
            repel_weight=vade_cfg.repel_weight_pretrain,
            repel_length_scale=vade_cfg.repel_length_scale_pretrain,
            nonempty_weight=vade_cfg.nonempty_weight_pretrain,
            nonempty_floor=max(
                1e-4, vade_cfg.nonempty_floor_percent_pretrain / common.n_components
            ),
            nonempty_p=int(vade_cfg.nonempty_p_pretrain),
            pretrain_mode=True,
            distill_sharpen_T=teacher_cfg.distill_sharpen_T,
            distill_conf_weight=teacher_cfg.distill_conf_weight,
            distill_conf_thresh=teacher_cfg.distill_conf_thresh,
        )
    return VadeLossParams(
        n_components=common.n_components,
        tf_cluster_weight=vade_cfg.tf_cluster_weight,
        reg_cat_clusters_weight=vade_cfg.reg_cat_clusters,
        temporal_cohesion_weight=vade_cfg.temporal_cohesion_weight,
        reg_scatter_weight=vade_cfg.reg_scatter_weight,
        reg_scatter_beta=vade_cfg.reg_scatter_beta,
        kmeans_loss_weight=common.kmeans_loss,
        repel_weight=vade_cfg.repel_weight,
        repel_length_scale=vade_cfg.repel_length_scale,
        nonempty_weight=vade_cfg.nonempty_weight,
        nonempty_floor=max(
            1e-4, vade_cfg.nonempty_floor_percent / common.n_components
        ),
        nonempty_p=int(vade_cfg.nonempty_p),
        pretrain_mode=False,
        distill_sharpen_T=teacher_cfg.distill_sharpen_T,
        distill_conf_weight=teacher_cfg.distill_conf_weight,
        distill_conf_thresh=teacher_cfg.distill_conf_thresh,
    )
