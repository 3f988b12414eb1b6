"""Pallas fused GRU scan — the round-4 MFU-ceiling experiment.

The embed program is HBM-bound (arithmetic intensity ~2.2 FLOP/B vs the
v5e ridge of ~240, scripts/mfu_ceiling.py): the XLA `lax.scan` GRU writes
and re-reads the carry and per-step outputs through HBM every step. This
kernel keeps the hidden state in VMEM across the whole time axis: the
input projections run as ONE MXU GEMM outside the kernel, and each grid
step recurs over all T steps of a batch tile on-chip, touching HBM once
for the gate block and once for the outputs.

Math is flax.linen.GRUCell-exact (r/z gates share the summed biasing of
the input projection; the candidate gate biases the recurrent projection
separately), with the masked-carry semantics of models.blocks.MaskedGRU:
masked steps pass the carry through and zero the output.

Enabled in MaskedGRU via DEEPOF_TPU_GRU_PALLAS=1 (inference path, f32).
Benchmark result lives in docs/ARCHITECTURE.md next to the other scan
experiments.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gru_kernel(xg_ref, mask_ref, wh_ref, bhn_ref, out_ref, fin_ref, *,
                t_len: int, hidden: int):
    """One grid step: recur over all T steps of a (block, T, 3H) gate tile.

    xg_ref: (block, T, 3H) input-projected gates (x @ Wi + bi), VMEM.
    mask_ref: (block, T) float validity mask.
    wh_ref: (H, 3H) stacked recurrent kernels [hr | hz | hn].
    bhn_ref: (1, H) candidate-gate recurrent bias.
    out_ref: (block, T, H) outputs; fin_ref: (block, H) final carry.
    """
    wh = wh_ref[...]
    bhn = bhn_ref[0, :]
    h = jnp.zeros((xg_ref.shape[0], hidden), xg_ref.dtype)
    for t in range(t_len):  # static unroll: T is a compile-time window
        g = xg_ref[:, t, :]
        hg = jnp.dot(h, wh, preferred_element_type=jnp.float32)
        r = jax.nn.sigmoid(g[:, :hidden] + hg[:, :hidden])
        z = jax.nn.sigmoid(g[:, hidden : 2 * hidden] + hg[:, hidden : 2 * hidden])
        n = jnp.tanh(g[:, 2 * hidden :] + r * (hg[:, 2 * hidden :] + bhn))
        hn = (1.0 - z) * n + z * h
        m = mask_ref[:, t][:, None] > 0
        h = jnp.where(m, hn, h)
        out_ref[:, t, :] = jnp.where(m, hn, 0.0)
    fin_ref[...] = h


def gru_scan_pallas(
    x: jnp.ndarray,
    mask: jnp.ndarray,
    cell_params: dict,
    block: int = 128,
    interpret: bool = False,
):
    """Masked GRU over the time axis of ``x`` with flax-GRUCell params.

    Args:
        x: (B, T, F) inputs (forward order — the caller flips for the
            reverse direction, as MaskedGRU already does).
        mask: (B, T) bool/float validity mask.
        cell_params: flax GRUCell param dict (ir/iz/in/hr/hz/hn).
        block: batch-tile rows per grid step.
        interpret: run under the Pallas interpreter (CPU tests).

    Returns:
        (outputs (B, T, H), final carry (B, H)).
    """
    from jax.experimental import pallas as pl

    b, t, f = x.shape
    hidden = cell_params["hr"]["kernel"].shape[0]
    wi = jnp.concatenate(
        [cell_params[k]["kernel"] for k in ("ir", "iz", "in")], axis=1
    )  # (F, 3H)
    bi = jnp.concatenate(
        [cell_params[k]["bias"] for k in ("ir", "iz", "in")]
    )  # (3H,)
    wh = jnp.concatenate(
        [cell_params[k]["kernel"] for k in ("hr", "hz", "hn")], axis=1
    )  # (H, 3H)
    bhn = cell_params["hn"]["bias"].reshape(1, hidden)

    # Input projections as one large MXU GEMM outside the recurrence.
    xg = jnp.einsum("btf,fg->btg", x.astype(jnp.float32), wi) + bi

    b_pad = -(-b // block) * block
    if b_pad > b:
        xg = jnp.pad(xg, ((0, b_pad - b), (0, 0), (0, 0)))
    maskf = mask.astype(jnp.float32)
    if b_pad > b:
        maskf = jnp.pad(maskf, ((0, b_pad - b), (0, 0)))

    outs, fin = pl.pallas_call(
        partial(_gru_kernel, t_len=t, hidden=hidden),
        grid=(b_pad // block,),
        in_specs=[
            pl.BlockSpec((block, t, 3 * hidden), lambda i: (i, 0, 0)),
            pl.BlockSpec((block, t), lambda i: (i, 0)),
            pl.BlockSpec((hidden, 3 * hidden), lambda i: (0, 0)),
            pl.BlockSpec((1, hidden), lambda i: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block, t, hidden), lambda i: (i, 0, 0)),
            pl.BlockSpec((block, hidden), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, t, hidden), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, hidden), jnp.float32),
        ],
        interpret=interpret,
    )(xg, maskf, wh, bhn)
    return outs[:b], fin[:b]
