"""Shared building blocks: masked bidirectional GRUs, TCN stacks,
transformer layers, positional encodings.

Behavioral spec from deepof/clustering/models_new.py (RecurrentBlockPT
:188-279, TemporalBlockPT/TCN1DPT :378-510, TransformerCorePT :832-1050),
re-expressed TPU-first: per-node streams are folded into the batch axis so
every op is one large batched matmul/conv; variable-length masking is a
masked-carry lax.scan instead of pack_padded_sequence (identical semantics
for trailing zero-padding, which is the only padding the pipeline emits).
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def frame_validity_mask(x: jnp.ndarray) -> jnp.ndarray:
    """(..., T, F) -> (..., T) True where the frame has any nonzero feature."""
    return jnp.any(x != 0.0, axis=-1)


class MaskedGRU(nn.Module):
    """Unidirectional GRU with masked carry: invalid steps pass the hidden
    state through unchanged (equivalent to packing with trailing padding)."""

    hidden_size: int
    reverse: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray):
        """x: (B, T, F), mask: (B, T) -> (outputs (B, T, H), final (B, H))."""
        import os

        if self.reverse:
            x = x[:, ::-1]
            mask = mask[:, ::-1]

        # Experimental Pallas fused scan (DEEPOF_TPU_GRU_PALLAS=1): keeps
        # the carry in VMEM across the whole time axis instead of a
        # per-step HBM round trip — see ops/pallas_gru.py and the scan
        # experiments in docs/ARCHITECTURE.md. Inference-path only (no
        # custom VJP) and f32-exact vs the lax.scan path.
        if (
            os.environ.get("DEEPOF_TPU_GRU_PALLAS") == "1"
            and not self.is_initializing()
            and self.dtype == jnp.float32
            and self.has_variable("params", "GRUCell_0")
        ):
            from deepof_tpu.ops.pallas_gru import gru_scan_pallas

            outputs, final = gru_scan_pallas(
                x, mask, self.get_variable("params", "GRUCell_0"),
                interpret=jax.default_backend() != "tpu",
            )
            if self.reverse:
                outputs = outputs[:, ::-1]
            return outputs, final

        cell = nn.GRUCell(features=self.hidden_size, dtype=self.dtype, param_dtype=jnp.float32)
        b = x.shape[0]
        h0 = cell.initialize_carry(jax.random.PRNGKey(0), (b, x.shape[-1]))

        def step(cell, carry, inp):
            xt, mt = inp
            new_carry, out = cell(carry, xt)
            carry = jnp.where(mt[:, None], new_carry, carry)
            out = jnp.where(mt[:, None], out, jnp.zeros_like(out))
            return carry, out

        import os

        scan = nn.scan(
            step,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=1,
            out_axes=1,
            unroll=int(os.environ.get("DEEPOF_TPU_GRU_UNROLL", "1")),
        )
        final, outputs = scan(cell, h0, (x.astype(self.dtype), mask))
        if self.reverse:
            outputs = outputs[:, ::-1]
        return outputs, final


class BiGRU(nn.Module):
    """Bidirectional GRU (concat merge) with masked carry."""

    hidden_size: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray):
        """Returns (outputs (B, T, 2H), final (B, 2H))."""
        fwd_out, fwd_final = MaskedGRU(self.hidden_size, dtype=self.dtype)(x, mask)
        bwd_out, bwd_final = MaskedGRU(self.hidden_size, reverse=True, dtype=self.dtype)(
            x, mask
        )
        return (
            jnp.concatenate([fwd_out, bwd_out], axis=-1),
            jnp.concatenate([fwd_final, bwd_final], axis=-1),
        )


class RecurrentBlock(nn.Module):
    """Conv1D(k=5) -> BiGRU(2d) -> LN -> BiGRU(d) final state -> LN ->
    Dense(2*latent). One temporal summary vector per stream.

    Ref: deepof/clustering/models_new.py:188-279 (RecurrentBlockPT).
    """

    latent_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, T, F) -> (B, 2*latent)."""
        d = min(64, self.latent_dim)
        y = nn.Conv(
            features=2 * d, kernel_size=(5,), padding="SAME", use_bias=False,
            dtype=self.dtype, param_dtype=jnp.float32,
        )(x.astype(self.dtype))
        y = nn.relu(y)
        # The reference packs the GRU sequences with lengths counted from
        # the post-relu conv activations (models_new.py:233-236): a step
        # whose 2d conv channels are ALL zero shortens the packed length,
        # and pack_padded_sequence keeps the first `length` steps — a
        # PREFIX mask, regardless of where the zero landed. With masked
        # carries, gating on this prefix reproduces packing exactly
        # (forward processes steps [0, L); backward starts its scan at
        # L-1; outputs past L are zero-padded).
        lengths = jnp.sum(jnp.any(y > 0, axis=-1), axis=1)
        mask = jnp.arange(y.shape[1])[None, :] < lengths[:, None]
        y, _ = BiGRU(2 * d, dtype=self.dtype)(y, mask)
        y = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype)(y)
        _, final = BiGRU(d, dtype=self.dtype)(y, mask)
        final = nn.LayerNorm(epsilon=1e-3, dtype=self.dtype)(final)
        if d == self.latent_dim:
            # The reference projects only when the capped internal width
            # differs from latent_dim (models_new.py:275-277).
            return final
        return nn.Dense(2 * self.latent_dim, dtype=self.dtype, param_dtype=jnp.float32)(final)


class TemporalBlock(nn.Module):
    """Residual TCN block: (conv -> BN -> act -> drop) x2 + residual.

    Ref: deepof/clustering/models_new.py:378-445 (TemporalBlockPT).
    """

    out_channels: int
    kernel_size: int
    dilation: int
    causal: bool = True
    dropout_rate: float = 0.0
    use_batch_norm: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        """x: (B, T, C_in) -> (out (B, T, C_out), skip (B, T, C_out))."""

        def conv(name, inp):
            pad = (
                [((self.kernel_size - 1) * self.dilation, 0)]
                if self.causal
                else "SAME"
            )
            return nn.Conv(
                features=self.out_channels,
                kernel_size=(self.kernel_size,),
                kernel_dilation=(self.dilation,),
                padding=pad,
                name=name,
                kernel_init=nn.initializers.normal(0.05),
                dtype=self.dtype,
                param_dtype=jnp.float32,
            )(inp)

        def bn(name, inp):
            if not self.use_batch_norm:
                return inp
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=1e-3,
                name=name, dtype=self.dtype, param_dtype=jnp.float32,
            )(inp)

        y = nn.relu(bn("bn1", conv("conv1", x)))
        if self.dropout_rate:
            y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        y = nn.relu(bn("bn2", conv("conv2", y)))
        if self.dropout_rate:
            y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        skip = y
        if x.shape[-1] != self.out_channels:
            res = nn.Conv(
                features=self.out_channels, kernel_size=(1,),
                kernel_init=nn.initializers.normal(0.05), name="downsample",
                dtype=self.dtype, param_dtype=jnp.float32,
            )(x)
        else:
            res = x
        return nn.relu(y + res), skip


class TCN(nn.Module):
    """Dilated TCN over (B, T, C): conv_stacks x conv_dilations residual
    blocks with summed skip connections.

    Ref: deepof/clustering/models_new.py:447-510 (TCN1DPT).
    """

    conv_filters: int = 32
    kernel_size: int = 4
    conv_stacks: int = 2
    conv_dilations: Tuple[int, ...] = (1, 2, 4, 8)
    causal: bool = True
    use_skip_connections: bool = True
    dropout_rate: float = 0.0
    use_batch_norm: bool = True
    return_sequences: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        y = x.astype(self.dtype)
        skip_sum = None
        for s in range(self.conv_stacks):
            for d in self.conv_dilations:
                y, skip = TemporalBlock(
                    out_channels=self.conv_filters,
                    kernel_size=self.kernel_size,
                    dilation=int(d),
                    causal=self.causal,
                    dropout_rate=self.dropout_rate,
                    use_batch_norm=self.use_batch_norm,
                    dtype=self.dtype,
                )(y, train=train)
                if self.use_skip_connections:
                    skip_sum = skip if skip_sum is None else skip_sum + skip
        out = nn.relu(skip_sum if self.use_skip_connections else y)
        return out if self.return_sequences else out[:, -1, :]


def sinusoidal_positional_encoding(max_len: int, d_model: int) -> np.ndarray:
    """Standard transformer positional encodings (static constant)."""
    pe = np.zeros((max_len, d_model), dtype=np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(
        np.arange(0, d_model, 2, dtype=np.float32) * (-np.log(10000.0) / d_model)
    )
    pe[:, 0::2] = np.sin(position * div_term)
    n_odd = pe[:, 1::2].shape[1]
    pe[:, 1::2] = np.cos(position * div_term)[:, :n_odd]
    return pe[None]


class TransformerEncoderLayer(nn.Module):
    """Post-norm transformer encoder layer with key-padding masking.

    Ref: deepof/clustering/models_new.py:898-930 (TransformerEncoderLayerPT).
    """

    key_dim: int
    num_heads: int
    dff: int
    rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, pad_mask: Optional[jnp.ndarray] = None, train: bool = False):
        attn_mask = None
        if pad_mask is not None:
            # pad_mask: (B, T) True = PADDING. Broadcast to (B, 1, T, T) keys.
            attn_mask = ~pad_mask[:, None, None, :]
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.key_dim,
            out_features=self.key_dim,
            use_bias=False,
            dropout_rate=self.rate,
            deterministic=not train,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x, x, mask=attn_mask)
        if self.rate:
            attn = nn.Dropout(self.rate, deterministic=not train)(attn)
        x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x + attn)
        ff = nn.Dense(self.dff, dtype=self.dtype, param_dtype=jnp.float32)(x)
        ff = nn.relu(ff)
        ff = nn.Dense(self.key_dim, dtype=self.dtype, param_dtype=jnp.float32)(ff)
        if self.rate:
            ff = nn.Dropout(self.rate, deterministic=not train)(ff)
        return nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x + ff)


class CausalSelfAttentionLayer(nn.Module):
    """Pre-norm causal self-attention layer for the transformer decoder.

    Ref: deepof/clustering/models_new.py:1256-1329.
    """

    d_model: int
    num_heads: int
    dff: int
    rate: float = 0.1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        t = x.shape[1]
        causal = jnp.tril(jnp.ones((1, 1, t, t), dtype=bool))
        xn = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.num_heads,
            qkv_features=self.d_model,
            out_features=self.d_model,
            use_bias=False,
            dropout_rate=self.rate,
            deterministic=not train,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(xn, xn, mask=causal)
        if self.rate:
            attn = nn.Dropout(self.rate, deterministic=not train)(attn)
        x = x + attn
        xn = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype)(x)
        ff = nn.Dense(self.dff, dtype=self.dtype, param_dtype=jnp.float32)(xn)
        ff = nn.gelu(ff, approximate=False)
        if self.rate:
            ff = nn.Dropout(self.rate, deterministic=not train)(ff)
        ff = nn.Dense(self.d_model, dtype=self.dtype, param_dtype=jnp.float32)(ff)
        if self.rate:
            ff = nn.Dropout(self.rate, deterministic=not train)(ff)
        return x + ff


def rms_stabilize(x: jnp.ndarray) -> jnp.ndarray:
    """Per-sample RMS normalization + clamp, matching the reference's
    numeric guards around encoder outputs (models_new.py:652-660)."""
    rms = jnp.sqrt(jnp.mean(x**2, axis=-1, keepdims=True))
    x = x / jnp.maximum(rms, 1.0)
    x = jnp.clip(x, -1e4, 1e4)
    return jnp.nan_to_num(x, nan=0.0, posinf=1e4, neginf=-1e4)


def tf_style_group_reshape(x: jnp.ndarray) -> jnp.ndarray:
    """(B, T, G, F) -> (B, G, T, F) stream split used by all encoders
    (models_new.py:121-141)."""
    return jnp.transpose(x, (0, 2, 1, 3))
