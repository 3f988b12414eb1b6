"""Latent heads: VQ codebook and Gaussian-mixture latent.

Behavioral spec: deepof/clustering/models_new.py (VectorQuantizerPT :1330,
GaussianMixtureLatentPT :1679, ClusterControlPT :1643).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def compute_kmeans_loss(latent: jnp.ndarray, weight: float) -> jnp.ndarray:
    """Gram-matrix singular-value regularizer encouraging orthogonal latents
    (deepof/clustering/losses.py:257-286)."""
    b = latent.shape[0]
    gram = (latent.T @ latent) / b
    singular_values = jnp.linalg.svd(gram.astype(jnp.float32), compute_uv=False)
    penalization = jnp.sqrt(jnp.clip(singular_values, 1e-9))
    return weight * jnp.nanmean(penalization)


class VectorQuantizer(nn.Module):
    """L2 codebook quantization with straight-through gradients.

    Call: x (B, D) -> (quantized (B, D), soft_counts (B, K), losses dict).
    """

    n_components: int
    embedding_dim: int
    beta: float = 1.0
    kmeans_loss: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, return_losses: bool = True):
        codebook = self.param(
            "codebook",
            nn.initializers.uniform(scale=1.0),
            (self.embedding_dim, self.n_components),
        )
        flat = x.reshape(-1, self.embedding_dim)

        similarity = flat @ codebook
        distances = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            + jnp.sum(codebook**2, axis=0)
            - 2 * similarity
        )
        indices = jnp.argmin(distances, axis=1)
        inv_sq = (1.0 / distances) ** 2
        soft_counts = inv_sq / jnp.sum(inv_sq, axis=1, keepdims=True)

        quantized = codebook.T[indices].reshape(x.shape)
        # Straight-through estimator.
        quantized_st = x + jax.lax.stop_gradient(quantized - x)

        losses: Dict[str, jnp.ndarray] = {}
        if return_losses:
            commitment = self.beta * jnp.mean(
                (jax.lax.stop_gradient(quantized) - x) ** 2
            )
            codebook_loss = jnp.mean((quantized - jax.lax.stop_gradient(x)) ** 2)
            losses["vq_loss"] = commitment + codebook_loss
            if self.kmeans_loss:
                losses["kmeans_loss"] = compute_kmeans_loss(flat, self.kmeans_loss)
        return quantized_st, soft_counts, losses

    def get_code_indices(self, codebook, flat: jnp.ndarray) -> jnp.ndarray:
        distances = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            + jnp.sum(codebook**2, axis=0)
            - 2 * flat @ codebook
        )
        return jnp.argmin(distances, axis=1)


def cluster_metrics(z_cat: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Populated-cluster count and mean confidence (ClusterControlPT)."""
    confidence = jnp.max(z_cat, axis=1)
    hard = jnp.argmax(z_cat, axis=1)
    one_hot = jax.nn.one_hot(hard, z_cat.shape[1])
    populated = jnp.sum(jnp.any(one_hot > 0, axis=0))
    return {
        "number_of_populated_clusters": populated.astype(jnp.float32),
        "confidence_in_selected_cluster": jnp.mean(confidence),
    }


class GaussianMixtureLatent(nn.Module):
    """VaDE latent: reparameterized diagonal Gaussian encoder + learnable
    GMM prior with softmax posterior assignment.

    Call: enc (B, D_in) -> dict with z, categorical, metrics, kmeans_loss,
    z_mean, z_log_var.
    """

    input_dim: int
    n_components: int
    latent_dim: int
    kmeans: float = 1.0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ):
        gmm_means = self.param(
            "gmm_means",
            nn.initializers.xavier_normal(),
            (self.n_components, self.latent_dim),
        )
        gmm_log_vars = self.param(
            "gmm_log_vars",
            nn.initializers.xavier_normal(),
            (self.n_components, self.latent_dim),
        )
        prior = jnp.ones(self.n_components) / self.n_components

        z_mean = nn.Dense(self.latent_dim, name="encoder_mean")(x)
        z_log_var = nn.softplus(nn.Dense(self.latent_dim, name="encoder_log_var")(x))

        if train and rng is not None:
            eps = jax.random.normal(rng, z_mean.shape, z_mean.dtype)
            z = z_mean + jnp.exp(0.5 * z_log_var) * eps
        else:
            z = z_mean

        # Posterior p(c|z) under the GMM prior.
        gmm_std = jnp.maximum(jnp.exp(0.5 * gmm_log_vars), 1e-3)
        diff = z[:, None, :] - gmm_means[None]
        log_p_z_given_c = -0.5 * jnp.sum(
            jnp.log(2 * jnp.pi * gmm_std[None] ** 2) + (diff / gmm_std[None]) ** 2,
            axis=-1,
        )
        log_post = jnp.log(prior + 1e-9)[None] + log_p_z_given_c
        z_cat = jax.nn.softmax(log_post, axis=-1)

        kmeans_loss = (
            compute_kmeans_loss(z, self.kmeans) if self.kmeans > 0 else jnp.array(0.0)
        )

        return {
            "z": z,
            "categorical": z_cat,
            "metrics": cluster_metrics(z_cat),
            "kmeans_loss": kmeans_loss,
            "z_mean": z_mean,
            "z_log_var": z_log_var,
            "gmm_means": gmm_means,
            "gmm_log_vars": gmm_log_vars,
            "prior": prior,
        }
