"""Sequence encoders: recurrent, TCN, transformer — each optionally fused
with a CensNet graph conv over the body graph.

Behavioral spec: deepof/clustering/models_new.py (RecurrentEncoderPT :37,
TCNEncoderPT :521, TFMEncoderPT :958). TPU-first: the per-node / per-edge
streams are folded into the batch axis ((B, G, T, F) -> (B*G, T, F)) so the
GRU/TCN/attention kernels see one large batch instead of a python loop over
groups.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from deepof_tpu.models.blocks import (
    RecurrentBlock,
    TCN,
    TransformerEncoderLayer,
    frame_validity_mask,
    rms_stabilize,
    sinusoidal_positional_encoding,
    tf_style_group_reshape,
)
from deepof_tpu.models.gnn import CensNetConv, censnet_operators


def _has_angles(angles) -> bool:
    """Whether an optional angles tensor carries features (static shapes
    under trace, so this is a compile-time branch)."""
    return angles is not None and angles.shape[-2] > 0


def _flatten_angles(angles: jnp.ndarray) -> jnp.ndarray:
    """(B, T, A[, F]) -> (B, T, A*F) time-major angle features."""
    b, t = angles.shape[:2]
    return angles.reshape(b, t, -1)


class RecurrentEncoder(nn.Module):
    """Conv1D -> stacked BiGRU per node/edge stream -> CensNet -> Dense.

    Call: x (B, T, N, F_node), a (B, T, E, F_edge),
    optional angles (B, T, A, 1) -> (B, latent_dim). The angles stream
    (bridge angles of the body graph, reference contract
    deepof/clustering/dataset.py:16-26) runs its own recurrent summary and
    concatenates before the final projection.
    """

    latent_dim: int
    adjacency: np.ndarray = None
    use_gnn: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, a: jnp.ndarray,
        angles: Optional[jnp.ndarray] = None, train: bool = False,
    ):
        b, t, n, f_node = x.shape

        if self.use_gnn:
            _, _, e, f_edge = a.shape
            ops = censnet_operators(self.adjacency)

            xg = tf_style_group_reshape(x).reshape(b * n, t, f_node)
            ag = tf_style_group_reshape(a).reshape(b * e, t, f_edge)

            node_emb = RecurrentBlock(self.latent_dim, dtype=self.dtype)(xg)
            edge_emb = RecurrentBlock(self.latent_dim, dtype=self.dtype)(ag)
            node_emb = node_emb.reshape(b, n, -1)
            edge_emb = edge_emb.reshape(b, e, -1)

            node_g, edge_g = CensNetConv(
                node_channels=self.latent_dim,
                edge_channels=self.latent_dim,
                operators=ops,
                dtype=self.dtype,
            )(node_emb, edge_emb)
            enc = jnp.concatenate(
                [node_g.reshape(b, -1), edge_g.reshape(b, -1)], axis=-1
            )
        else:
            flat = x.reshape(b, t, n * f_node)
            enc = RecurrentBlock(self.latent_dim, dtype=self.dtype)(flat)

        if _has_angles(angles):
            ang_emb = RecurrentBlock(self.latent_dim, dtype=self.dtype)(
                _flatten_angles(angles)
            )
            enc = jnp.concatenate([enc, ang_emb], axis=-1)

        return nn.Dense(self.latent_dim, dtype=self.dtype, param_dtype=jnp.float32)(enc)


class TCNEncoder(nn.Module):
    """Per-stream dilated TCN -> CensNet -> MLP head with BatchNorm.

    Call: x (B, T, N, F_node), a (B, T, E, F_edge) -> (B, latent_dim).
    """

    latent_dim: int
    adjacency: np.ndarray = None
    use_gnn: bool = True
    conv_filters: int = 32
    kernel_size: int = 4
    conv_stacks: int = 2
    conv_dilations: Tuple[int, ...] = (1, 2, 4, 8)
    dropout_rate: float = 0.0
    use_batch_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, a: jnp.ndarray,
        angles: Optional[jnp.ndarray] = None, train: bool = False,
    ):
        b, t, n, f_node = x.shape
        tcn_kwargs = dict(
            conv_filters=self.conv_filters,
            kernel_size=self.kernel_size,
            conv_stacks=self.conv_stacks,
            conv_dilations=self.conv_dilations,
            dropout_rate=self.dropout_rate,
            use_batch_norm=self.use_batch_norm,
            return_sequences=False,
            dtype=self.dtype,
        )

        if self.use_gnn:
            _, _, e, f_edge = a.shape
            ops = censnet_operators(self.adjacency)
            xg = tf_style_group_reshape(x).reshape(b * n, t, f_node)
            ag = tf_style_group_reshape(a).reshape(b * e, t, f_edge)
            node_emb = TCN(**tcn_kwargs)(xg, train=train).reshape(b, n, -1)
            edge_emb = TCN(**tcn_kwargs)(ag, train=train).reshape(b, e, -1)
            node_g, edge_g = CensNetConv(
                node_channels=self.latent_dim,
                edge_channels=self.latent_dim,
                operators=ops,
                dtype=self.dtype,
            )(node_emb, edge_emb)
            enc = jnp.concatenate(
                [node_g.reshape(b, -1), edge_g.reshape(b, -1)], axis=-1
            )
        else:
            enc = TCN(**tcn_kwargs)(x.reshape(b, t, n * f_node), train=train)

        if _has_angles(angles):
            ang_emb = TCN(**tcn_kwargs)(_flatten_angles(angles), train=train)
            enc = jnp.concatenate([enc, ang_emb], axis=-1)

        # MLP head with the reference's numeric guards (models_new.py:648-668).
        h = rms_stabilize(enc)
        h = nn.Dense(2 * self.latent_dim, dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(h)
        h = nn.Dense(self.latent_dim, dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(h)
        return nn.Dense(self.latent_dim, dtype=self.dtype, param_dtype=jnp.float32)(h)


class TransformerEncoder(nn.Module):
    """Linear embed -> sinusoidal PE -> encoder layers -> last timestep.

    Call: x (B, T, N, F_node), a (B, T, E, F_edge) -> (B, latent_dim).
    With use_gnn, node/edge streams run shared-architecture transformers and
    fuse through CensNet, mirroring TFMEncoderPT (models_new.py:958-1166).
    """

    latent_dim: int
    adjacency: np.ndarray = None
    use_gnn: bool = True
    num_layers: int = 2
    num_heads: int = 4
    dff: int = 128
    dropout_rate: float = 0.1
    key_dim: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    def _core(self, y: jnp.ndarray, key_dim: int, train: bool) -> jnp.ndarray:
        """Transformer core over (B', T, F) -> (B', key_dim)."""
        pad = ~frame_validity_mask(y)
        h = nn.Dense(key_dim, dtype=self.dtype, param_dtype=jnp.float32)(y.astype(self.dtype))
        h = nn.relu(h) * jnp.asarray(key_dim, self.dtype) ** 0.5
        pe = jnp.asarray(
            sinusoidal_positional_encoding(y.shape[1], key_dim), self.dtype
        )
        h = h + pe
        if self.dropout_rate:
            h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        for _ in range(self.num_layers):
            h = TransformerEncoderLayer(
                key_dim=key_dim,
                num_heads=self.num_heads,
                dff=self.dff,
                rate=self.dropout_rate,
                dtype=self.dtype,
            )(h, pad_mask=pad, train=train)
        return h[:, -1, :]

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, a: jnp.ndarray,
        angles: Optional[jnp.ndarray] = None, train: bool = False,
    ):
        b, t, n, f_node = x.shape
        # Reference default: min(64, N*F) rounded down to a heads multiple
        # (models_new.py:1014-1020).
        key_dim = self.key_dim or min(64, n * f_node)
        key_dim = max((key_dim // self.num_heads) * self.num_heads, self.num_heads)

        if self.use_gnn:
            _, _, e, f_edge = a.shape
            ops = censnet_operators(self.adjacency)
            xg = tf_style_group_reshape(x).reshape(b * n, t, f_node)
            ag = tf_style_group_reshape(a).reshape(b * e, t, f_edge)
            node_emb = self._core(xg, key_dim, train).reshape(b, n, -1)
            edge_emb = self._core(ag, key_dim, train).reshape(b, e, -1)
            node_g, edge_g = CensNetConv(
                node_channels=self.latent_dim,
                edge_channels=self.latent_dim,
                operators=ops,
                dtype=self.dtype,
            )(node_emb, edge_emb)
            enc = jnp.concatenate(
                [node_g.reshape(b, -1), edge_g.reshape(b, -1)], axis=-1
            )
        else:
            enc = self._core(x.reshape(b, t, n * f_node), key_dim, train)

        if _has_angles(angles):
            ang_emb = self._core(_flatten_angles(angles), key_dim, train)
            enc = jnp.concatenate([enc, ang_emb], axis=-1)

        # MLP head with numeric guards, shared with the TCN encoder
        # (models_new.py:1074-1082, 1152-1162).
        h = rms_stabilize(enc)
        h = nn.Dense(2 * self.latent_dim, dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(h)
        h = nn.Dense(self.latent_dim, dtype=self.dtype, param_dtype=jnp.float32)(h)
        h = nn.relu(h)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(h)
        out = nn.Dense(self.latent_dim, dtype=self.dtype, param_dtype=jnp.float32)(h)
        if train and out.shape[0] > 1:
            # Train-time batch standardization forcing embedding diversity
            # (models_new.py:1164-1166).
            out = (out - out.mean(axis=0, keepdims=True)) / jnp.maximum(
                out.std(axis=0, keepdims=True), 0.1
            )
        return out
