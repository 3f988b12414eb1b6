"""Sequence decoders producing masked-Normal reconstruction distributions.

Behavioral spec: deepof/clustering/models_new.py (RecurrentDecoderPT :281,
TCNDecoderPT :713, TransformerDecoderPT :1167, ProbabilisticDecoderPT :660).
The probabilistic head emits a unit-variance diagonal Normal whose mean is
zeroed on invalid frames; MaskedNormal carries (loc, mask) and computes
log-probabilities with masked frames contributing zero.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from deepof_tpu.models.blocks import (
    BiGRU,
    CausalSelfAttentionLayer,
    TCN,
    rms_stabilize,
    sinusoidal_positional_encoding,
)

_LOG_2PI = float(np.log(2.0 * np.pi))


@jax.tree_util.register_pytree_node_class
@dataclass
class MaskedNormal:
    """Diagonal unit-variance Normal over frames with a validity mask.

    Attributes:
        loc: (B, T, D) means (zeroed on masked frames).
        mask: (B, T) frame validity (1 = valid).
    """

    loc: jnp.ndarray
    mask: jnp.ndarray

    @property
    def mean(self) -> jnp.ndarray:
        return self.loc * self.mask[..., None]

    def log_prob(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, T) log-probabilities; masked frames contribute 0."""
        per_dim = -0.5 * (_LOG_2PI + (x - self.loc) ** 2)
        return jnp.sum(per_dim, axis=-1) * self.mask

    def sample(self, rng) -> jnp.ndarray:
        eps = jax.random.normal(rng, self.loc.shape, self.loc.dtype)
        return (self.loc + eps) * self.mask[..., None]

    def tree_flatten(self):
        return (self.loc, self.mask), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


class ProbabilisticHead(nn.Module):
    """Linear projection to per-frame means + MaskedNormal construction."""

    data_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden: jnp.ndarray, validity_mask: jnp.ndarray) -> MaskedNormal:
        loc = nn.Dense(self.data_dim, dtype=jnp.float32, param_dtype=jnp.float32)(
            hidden.astype(jnp.float32)
        )
        loc = jnp.nan_to_num(loc, nan=0.0, posinf=1e6, neginf=-1e6)
        return MaskedNormal(loc=loc, mask=validity_mask.astype(loc.dtype))


def _validity_from_target(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, D) or (B, T, N, F) target -> (B, T) frame validity."""
    if x.ndim == 4:
        x = x.reshape(x.shape[0], x.shape[1], -1)
    return ~jnp.all(x == 0.0, axis=-1)


class RecurrentDecoder(nn.Module):
    """RepeatVector -> BiGRU x2 -> Conv1D -> masked Normal head."""

    output_dim: int
    latent_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, g: jnp.ndarray, x_target: jnp.ndarray, train: bool = False) -> MaskedNormal:
        if x_target.ndim == 4:
            x_target = x_target.reshape(x_target.shape[0], x_target.shape[1], -1)
        t = x_target.shape[1]
        mask = _validity_from_target(x_target)

        h = jnp.repeat(g[:, None, :], t, axis=1).astype(self.dtype)
        h, _ = BiGRU(self.latent_dim, dtype=self.dtype)(h, mask)
        h = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype)(h)
        h, _ = BiGRU(2 * self.latent_dim, dtype=self.dtype)(h, mask)
        h = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype)(h)
        h = nn.Conv(
            features=2 * self.latent_dim, kernel_size=(5,), padding="SAME",
            use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
        )(h)
        h = nn.relu(h)
        h = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype)(h)
        return ProbabilisticHead(self.output_dim, dtype=self.dtype)(h, mask)


class TCNDecoder(nn.Module):
    """Dense x3 (BN) -> RepeatVector -> TCN -> masked Normal head."""

    output_dim: int
    window_size: int
    latent_dim: int
    conv_filters: int = 64
    kernel_size: int = 4
    conv_stacks: int = 1
    conv_dilations: Tuple[int, ...] = (8, 4, 2, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, g: jnp.ndarray, x_target: jnp.ndarray, train: bool = False) -> MaskedNormal:
        mask = _validity_from_target(x_target)
        z = rms_stabilize(g.astype(jnp.float32))

        def bn(inp):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                dtype=self.dtype, param_dtype=jnp.float32,
            )(inp)

        z = bn(nn.Dense(self.latent_dim, dtype=self.dtype, param_dtype=jnp.float32)(z))
        z = bn(nn.relu(nn.Dense(2 * self.latent_dim, dtype=self.dtype, param_dtype=jnp.float32)(z)))
        z = bn(nn.relu(nn.Dense(4 * self.latent_dim, dtype=self.dtype, param_dtype=jnp.float32)(z)))

        z_rep = jnp.repeat(z[:, None, :], self.window_size, axis=1)
        h = TCN(
            conv_filters=self.conv_filters,
            kernel_size=self.kernel_size,
            conv_stacks=self.conv_stacks,
            conv_dilations=self.conv_dilations,
            return_sequences=True,
            dtype=self.dtype,
        )(z_rep, train=train)
        return ProbabilisticHead(self.output_dim, dtype=self.dtype)(h, mask)


class TransformerDecoder(nn.Module):
    """Latent-expansion MLP -> repeated latent + PE -> causal self-attention
    stack -> masked Normal head (latent forced at every timestep)."""

    output_dim: int
    window_size: int
    latent_dim: int
    num_layers: int = 2
    num_heads: int = 8      # reference: init_encoder_decoder num_heads=8
    dff: int = 128
    dropout_rate: float = 0.2  # reference: dropout_rate=0.2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, g: jnp.ndarray, x_target: jnp.ndarray, train: bool = False) -> MaskedNormal:
        mask = _validity_from_target(x_target)
        d_model = 4 * self.latent_dim
        # Largest head count (<= requested) dividing d_model: the
        # reference asserts divisibility and would crash on odd latent
        # sizes; degrading the head count keeps those usable.
        num_heads = self.num_heads
        while num_heads > 1 and d_model % num_heads:
            num_heads //= 2

        z = nn.Dense(self.latent_dim, dtype=self.dtype, param_dtype=jnp.float32)(g.astype(self.dtype))
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(2 * self.latent_dim, dtype=self.dtype, param_dtype=jnp.float32)(z)
        z = nn.gelu(z, approximate=False)
        z = nn.Dense(d_model, dtype=self.dtype, param_dtype=jnp.float32)(z)
        z = nn.gelu(z, approximate=False)

        h = jnp.repeat(z[:, None, :], self.window_size, axis=1)
        pe = jnp.asarray(
            sinusoidal_positional_encoding(self.window_size, d_model), self.dtype
        )
        h = h + pe
        for _ in range(self.num_layers):
            h = CausalSelfAttentionLayer(
                d_model=d_model,
                num_heads=num_heads,
                dff=self.dff,
                rate=self.dropout_rate,
                dtype=self.dtype,
            )(h, train=train)
        h = nn.Dense(self.output_dim, dtype=self.dtype, param_dtype=jnp.float32)(h)
        return ProbabilisticHead(self.output_dim, dtype=self.dtype)(h, mask)
