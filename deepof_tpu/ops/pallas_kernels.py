"""Pallas TPU kernels for the hot inference path.

The stride-1 sliding-window extraction feeding the encoders is the most
HBM-hungry op in the preprocess->embed pipeline: an XLA gather reads every
feature row ``window`` times from HBM (25x read amplification at the
default window). The Pallas kernel here DMAs each overlapping row block
into VMEM once and emits all windows of the block from on-chip memory,
fusing the global standardization affine into the same pass.

Grid: one program per window-batch block. The feature matrix stays in
HBM/ANY; the kernel issues one async copy of rows
[i*block, i*block + block + window - 1) into VMEM scratch (overlap handled
by element-offset DMA, which uniform BlockSpecs cannot express), then an
unrolled static loop slices the windows out on-chip.

Falls back to a jnp gather implementation off-TPU; the interpret flag runs
the same kernel under the Pallas interpreter for CPU tests.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _window_kernel(feats_hbm, mu_ref, sd_ref, out_ref, *, window: int, block: int):
    """One grid step: DMA an overlapping row block, emit `block` windows.

    feats_hbm: (T_padded, F) in ANY/HBM.
    mu_ref, sd_ref: (1, F) VMEM.
    out_ref: (block, window, F) VMEM block for this grid step.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    i = pl.program_id(0)
    rows = block + window - 1
    f = out_ref.shape[-1]

    def body(scratch, sem):
        copy = pltpu.make_async_copy(
            feats_hbm.at[pl.ds(i * block, rows), :], scratch, sem
        )
        copy.start()
        copy.wait()
        mu = mu_ref[0, :]
        inv_sd = 1.0 / sd_ref[0, :]
        # Static unrolled loop over window offsets: VMEM-to-VMEM strided
        # copies with the standardization affine fused in.
        for w in range(window):
            out_ref[:, w, :] = (scratch[w : w + block, :] - mu[None, :]) * inv_sd[
                None, :
            ]

    pl.run_scoped(
        body,
        scratch=pltpu.VMEM((rows, f), out_ref.dtype),
        sem=pltpu.SemaphoreType.DMA,
    )


def window_gather_standardize(
    feats: jnp.ndarray,
    mu: jnp.ndarray,
    sd: jnp.ndarray,
    window: int,
    block: int = 256,
    interpret: bool = False,
) -> jnp.ndarray:
    """All stride-1 windows of ``feats``, standardized: (W_n, window, F).

    Args:
        feats: (T, F) per-frame features.
        mu, sd: (F,) standardization constants.
        window: window length (static).
        block: windows emitted per grid step (static).
        interpret: run under the Pallas interpreter (CPU tests).

    Returns:
        (T - window + 1, window, F) standardized windows.
    """
    from jax.experimental import pallas as pl

    t, f = feats.shape
    n_windows = t - window + 1
    # Mosaic memref slices must be lane-aligned: pad the feature axis to a
    # multiple of 128 (sd pads with ones to keep the affine finite).
    f_pad = -(-f // 128) * 128
    # Cap the per-grid-step block so the VMEM working set (the out block,
    # double-buffered by the pipeline, plus the overlapping row scratch)
    # stays well under the ~16 MB scoped-vmem limit; the grid absorbs the
    # extra steps. Without this, wide features x large blocks OOM at
    # compile time (e.g. 2048x25x256 f32 = 52 MB).
    bytes_per = jnp.dtype(feats.dtype).itemsize
    budget = 4 * 1024 * 1024
    max_block = max(64, budget // max(window * f_pad * bytes_per, 1))
    max_block = 1 << (int(max_block).bit_length() - 1)  # floor pow2
    block = min(block, max_block)
    n_blocks = -(-n_windows // block)
    padded_t = n_blocks * block + window - 1
    if padded_t > t or f_pad > f:
        feats = jnp.pad(feats, ((0, padded_t - t), (0, f_pad - f)))
    mu2 = jnp.pad(mu.reshape(1, f), ((0, 0), (0, f_pad - f))).astype(feats.dtype)
    sd2 = jnp.pad(
        sd.reshape(1, f), ((0, 0), (0, f_pad - f)), constant_values=1.0
    ).astype(feats.dtype)

    out = pl.pallas_call(
        partial(_window_kernel, window=window, block=block),
        out_shape=jax.ShapeDtypeStruct(
            (n_blocks * block, window, f_pad), feats.dtype
        ),
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, f_pad), lambda i: (0, 0)),
            pl.BlockSpec((1, f_pad), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((block, window, f_pad), lambda i: (i, 0, 0)),
        interpret=interpret,
    )(feats, mu2, sd2)
    return out[:n_windows, :, :f]


def window_gather_standardize_xla(
    feats: jnp.ndarray, mu: jnp.ndarray, sd: jnp.ndarray, window: int
) -> jnp.ndarray:
    """Reference XLA gather implementation (fallback / correctness oracle)."""
    t = feats.shape[0]
    n_windows = t - window + 1
    idx = jnp.arange(n_windows)[:, None] + jnp.arange(window)[None, :]
    w = feats[idx]
    return (w - mu[None, None, :]) / sd[None, None, :]


def supports_pallas() -> bool:
    """True when running on a TPU backend where the Mosaic path exists."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False
