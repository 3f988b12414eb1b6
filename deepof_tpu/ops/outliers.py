"""Outlier masking over pose trajectories.

Reimplements the reference's moving-average-residual + likelihood outlier
criterion (deepof/utils.py:3536-3674 mask_outliers / full_outlier_mask /
remove_outliers) as one batched XLA kernel over ``(T, B, 2)`` position
tensors — the per-bodypart pandas loop becomes a vmap.

Quirk kept for parity: the residual threshold is
``mean(residual[lag:-lag]) + n_std * std(residual[lag:-lag])`` computed on
the *signed* residuals, compared against ``|residual|``.
"""

from __future__ import annotations

import jax.numpy as jnp

from deepof_tpu.ops.smoothing import moving_average


def mask_outliers(
    xy: jnp.ndarray,
    likelihood: jnp.ndarray,
    likelihood_tolerance: float,
    lag: int = 5,
    n_std: float = 3.0,
    mode: str = "or",
) -> jnp.ndarray:
    """Boolean outlier mask for a batch of bodypart trajectories.

    Args:
        xy: (T, B, 2) positions.
        likelihood: (T, B) tracking likelihoods.
        likelihood_tolerance: likelihoods below this are outliers.
        lag: moving-average window.
        n_std: residual deviation threshold in (signed-residual) stds.
        mode: "and" requires both coords to deviate, "or" either.

    Returns:
        (T, B) boolean mask, True = outlier.
    """
    t, b, _ = xy.shape
    flat = xy.reshape(t, b * 2)
    avg = moving_average(flat, lag)
    resid = flat - avg

    interior = resid[lag : t - lag]
    mu = jnp.mean(interior, axis=0)
    sd = jnp.std(interior, axis=0)
    dev_mask = jnp.abs(resid) > (mu + n_std * sd)
    dev_mask = dev_mask.reshape(t, b, 2)

    if mode == "and":
        coord_mask = dev_mask[..., 0] & dev_mask[..., 1]
    else:
        coord_mask = dev_mask[..., 0] | dev_mask[..., 1]

    return coord_mask | (likelihood < likelihood_tolerance)


def remove_outliers(
    xy: jnp.ndarray,
    likelihood: jnp.ndarray,
    likelihood_tolerance: float,
    lag: int = 5,
    n_std: float = 3.0,
    mode: str = "or",
):
    """NaN out detected outliers (interpolation happens downstream).

    Returns (cleaned (T, B, 2), outlier_fraction scalar) — the fraction
    drives the reference's >30% NaN warning (deepof/utils.py:3664-3668).
    """
    mask = mask_outliers(xy, likelihood, likelihood_tolerance, lag, n_std, mode)
    cleaned = jnp.where(mask[..., None], jnp.nan, xy)
    frac = jnp.mean(mask.astype(jnp.float32))
    return cleaned, frac
