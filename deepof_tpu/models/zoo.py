"""Top-level models: VQVAE, VaDE, Contrastive.

Behavioral spec: deepof/clustering/models_new.py (VQVAEPT :1507,
VaDEPT :1794, ContrastivePT :1978). Each model composes an encoder
(recurrent / TCN / transformer, optionally GNN-fused), a matching decoder,
and a latent head; forward passes are pure functions suitable for jit/pjit.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from deepof_tpu.models.decoders import (
    RecurrentDecoder,
    TCNDecoder,
    TransformerDecoder,
)
from deepof_tpu.models.encoders import (
    RecurrentEncoder,
    TCNEncoder,
    TransformerEncoder,
)
from deepof_tpu.models.heads import GaussianMixtureLatent, VectorQuantizer


def _make_encoder(encoder_type, latent_dim, adjacency, use_gnn, dtype):
    if encoder_type == "recurrent":
        return RecurrentEncoder(
            latent_dim=latent_dim, adjacency=adjacency, use_gnn=use_gnn, dtype=dtype
        )
    if encoder_type == "TCN":
        return TCNEncoder(
            latent_dim=latent_dim, adjacency=adjacency, use_gnn=use_gnn, dtype=dtype
        )
    if encoder_type == "transformer":
        return TransformerEncoder(
            latent_dim=latent_dim, adjacency=adjacency, use_gnn=use_gnn, dtype=dtype
        )
    raise NotImplementedError(
        'invalid encoder type, try "recurrent", "TCN" or "transformer"'
    )


def _make_decoder(encoder_type, output_dim, window_size, latent_dim, dtype):
    if encoder_type == "recurrent":
        return RecurrentDecoder(
            output_dim=output_dim, latent_dim=latent_dim, dtype=dtype
        )
    if encoder_type == "TCN":
        return TCNDecoder(
            output_dim=output_dim, window_size=window_size, latent_dim=latent_dim,
            dtype=dtype,
        )
    return TransformerDecoder(
        output_dim=output_dim, window_size=window_size, latent_dim=latent_dim,
        dtype=dtype,
    )


class VQVAE(nn.Module):
    """Vector-quantized autoencoder over pose windows."""

    input_shape: Tuple[int, int, int]          # (T, N, F_node)
    edge_feature_shape: Tuple[int, int, int]   # (T, E, F_edge)
    adjacency: np.ndarray
    latent_dim: int
    n_components: int
    encoder_type: str = "recurrent"
    use_gnn: bool = True
    kmeans_loss: float = 0.0
    beta: float = 1.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        t, n, f = self.input_shape
        self.encoder = _make_encoder(
            self.encoder_type, self.latent_dim, self.adjacency, self.use_gnn, self.dtype
        )
        self.decoder = _make_decoder(
            self.encoder_type, n * f, t, self.latent_dim, self.dtype
        )
        self.vq_layer = VectorQuantizer(
            n_components=self.n_components,
            embedding_dim=self.latent_dim,
            beta=self.beta,
            kmeans_loss=self.kmeans_loss,
        )

    def __call__(self, x, a, angles=None, train: bool = False,
                 return_losses: bool = True):
        """Returns dict with both reconstruction distributions, latents,
        soft counts, and VQ losses."""
        enc = self.encoder(x, a, angles=angles, train=train)
        quantized, soft_counts, vq_losses = self.vq_layer(enc, return_losses)
        b, t, n, f = x.shape
        x_flat = x.reshape(b, t, n * f)
        quant_recon = self.decoder(quantized, x_flat, train=train)
        enc_recon = self.decoder(enc, x_flat, train=train)
        return {
            "quantized_reconstruction": quant_recon,
            "encoding_reconstruction": enc_recon,
            "quantized": quantized,
            "soft_counts": soft_counts,
            "encoder_output": enc,
            "vq_losses": vq_losses,
        }

    def encode(self, x, a, angles=None):
        return self.encoder(x, a, angles=angles, train=False)

    def group(self, x, a, angles=None):
        enc = self.encoder(x, a, angles=angles, train=False)
        _, soft_counts, _ = self.vq_layer(enc, return_losses=False)
        return soft_counts


class VaDE(nn.Module):
    """Variational deep embedding with a Gaussian-mixture latent."""

    input_shape: Tuple[int, int, int]
    edge_feature_shape: Tuple[int, int, int]
    adjacency: np.ndarray
    latent_dim: int
    n_components: int
    encoder_type: str = "recurrent"
    use_gnn: bool = True
    kmeans_loss: float = 1.0
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        t, n, f = self.input_shape
        self.encoder = _make_encoder(
            self.encoder_type, self.latent_dim, self.adjacency, self.use_gnn, self.dtype
        )
        self.decoder = _make_decoder(
            self.encoder_type, n * f, t, self.latent_dim, self.dtype
        )
        self.latent_space = GaussianMixtureLatent(
            input_dim=self.latent_dim,
            n_components=self.n_components,
            latent_dim=self.latent_dim,
            kmeans=self.kmeans_loss,
        )

    def __call__(self, x, a, angles=None, train: bool = False,
                 rng: Optional[jax.Array] = None):
        """Returns dict: reconstruction, latent z, categorical, kmeans_loss,
        z_mean, z_log_var, gmm params."""
        enc = self.encoder(x, a, angles=angles, train=train)
        latent = self.latent_space(enc, train=train, rng=rng)
        b, t, n, f = x.shape
        x_flat = x.reshape(b, t, n * f)
        recon = self.decoder(latent["z"], x_flat, train=train)
        return {
            "reconstruction": recon,
            "latent": latent["z"],
            "categorical": latent["categorical"],
            "kmeans_loss": latent["kmeans_loss"],
            "z_mean": latent["z_mean"],
            "z_log_var": latent["z_log_var"],
            "gmm_params": {
                "means": latent["gmm_means"],
                "log_vars": latent["gmm_log_vars"],
                "prior": latent["prior"],
            },
            "encoder_output": enc,
        }

    def embed(self, x, a, angles=None):
        enc = self.encoder(x, a, angles=angles, train=False)
        return self.latent_space(enc, train=False)["z"]

    def group(self, x, a, angles=None):
        enc = self.encoder(x, a, angles=angles, train=False)
        return self.latent_space(enc, train=False)["categorical"]


class Contrastive(nn.Module):
    """Encoder-only contrastive model over half-windows."""

    input_shape: Tuple[int, int, int]          # (T_full, N, F)
    edge_feature_shape: Tuple[int, int, int]
    adjacency: np.ndarray
    latent_dim: int = 8
    encoder_type: str = "TCN"
    use_gnn: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def window_size(self) -> int:
        return self.input_shape[0] // 2

    def setup(self):
        self.encoder = _make_encoder(
            self.encoder_type, self.latent_dim, self.adjacency, self.use_gnn, self.dtype
        )

    def __call__(self, x, a, angles=None, train: bool = False):
        """Encode a half-window: x (B, T/2, N, F) -> (B, latent_dim)."""
        return self.encoder(x, a, angles=angles, train=train)


def init_variables(model, rngs, x, a, angles=None, train: bool = False):
    """Initialize model variables under ONE jitted program.

    Eager `model.init` dispatches every initializer op individually; on a
    remote-tunneled TPU the per-call latency makes that take minutes for
    the deeper encoders (measured 134s -> 15s cold / <1s cached for the
    recurrent+GNN VQVAE). On CPU the eager path is already fast and the
    compile would only add overhead, so it stays eager there.
    """
    if jax.default_backend() == "cpu":
        return model.init(rngs, x, a, angles, train=train)
    return jax.jit(
        lambda r, *args: model.init(r, *args, train=train)
    )(rngs, x, a, angles)


def build_model(
    model: str,
    input_shape,
    edge_feature_shape,
    adjacency,
    latent_dim: int,
    n_components: int = 10,
    encoder_type: str = "recurrent",
    use_gnn: bool = True,
    dtype=jnp.float32,
    **kwargs,
):
    """Factory mirroring the reference's model dispatch
    (deepof/clustering/training.py:988-1031)."""
    common = dict(
        input_shape=tuple(input_shape),
        edge_feature_shape=tuple(edge_feature_shape),
        adjacency=np.asarray(adjacency),
        latent_dim=latent_dim,
        encoder_type=encoder_type,
        use_gnn=use_gnn,
        dtype=dtype,
    )
    if model in ("VaDE", "vade"):
        return VaDE(n_components=n_components, **common, **kwargs)
    if model in ("VQVAE", "vqvae"):
        return VQVAE(n_components=n_components, **common, **kwargs)
    if model in ("Contrastive", "contrastive"):
        return Contrastive(**common, **kwargs)
    raise ValueError(f"Unknown model: {model}")
