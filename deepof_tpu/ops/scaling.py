"""Device-side two-stage feature scaling — the TPU fast path of
``TableDict.preprocess``.

Semantics: the two-stage table scaler (deepof/utils.py:2425-2566 —
body-size division, log1p distance compression, per-column local
standardization) plus the global-scaler application, standardized-outlier
clip + re-interpolation, and final sanitize of the preprocess pipeline
(deepof/data.py:3773-3916), re-expressed as three jitted programs over the
whole (T, F) feature matrix. The host keeps only the column bookkeeping;
every O(T*F) op runs on the accelerator, and the per-section pandas
selection/assignment copies of the host path disappear entirely.

Host/device split:
  * ``scale_stage12``  — stage 1 + stage 2 local scaling, and the
    per-column (count, sum) sufficient statistics for the global fit.
  * ``col_ssd``        — per-column sum of squared deviations around the
    cohort mean (second pass of the global standard-scaler fit).
  * ``finish_scaled``  — global transform, |x| > thresh outlier clip,
    NaN re-interpolation, and nan_to_num.
All three are shape-polymorphic only in T (one compile per distinct
recording length).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@jax.jit
def interp_nan_columns(x: jnp.ndarray) -> jnp.ndarray:
    """Per-column linear interpolation of NaN runs with nearest-value fill
    at both edges — pandas ``interpolate(limit_direction="both")`` on a
    positional index (the host twin is ``_interp_nan_block``,
    core/table_dict.py). All-NaN columns stay NaN.

    Args:
        x: (T, F) matrix.
    """
    t = x.shape[0]
    idx = jnp.arange(t, dtype=jnp.int32)[:, None]
    valid = ~jnp.isnan(x)
    # Index of the nearest valid row at-or-before / at-or-after each row.
    prev_i = jax.lax.cummax(jnp.where(valid, idx, -1), axis=0)
    next_i = jax.lax.cummin(jnp.where(valid, idx, t), axis=0, reverse=True)
    prev_v = jnp.take_along_axis(x, jnp.clip(prev_i, 0, t - 1), axis=0)
    next_v = jnp.take_along_axis(x, jnp.clip(next_i, 0, t - 1), axis=0)
    has_prev = prev_i >= 0
    has_next = next_i < t
    span = jnp.maximum(next_i - prev_i, 1).astype(x.dtype)
    w = (idx - prev_i).astype(x.dtype) / span
    interior = prev_v + w * (next_v - prev_v)
    filled = jnp.where(
        has_prev & has_next,
        interior,
        jnp.where(has_prev, prev_v, jnp.where(has_next, next_v, x)),
    )
    return jnp.where(valid, x, filled)


# Global-fit sufficient statistics come back as per-block partial sums
# (rows grouped into _STAT_BLOCK-row blocks) so the caller can combine
# them in float64 on the host: a single f32 accumulation over samples_max
# (~227k) rows per column would carry O(sqrt(T)*eps) error into the
# PERSISTED global scaler, which inference then reuses (ADVICE r3).
_STAT_BLOCK = 4096


def _blocked(x: jnp.ndarray) -> jnp.ndarray:
    """(T, F) -> (ceil(T/B), B, F) with NaN padding (ignored by the
    NaN-masked reductions downstream)."""
    t, f = x.shape
    nb = -(-t // _STAT_BLOCK)
    x = jnp.pad(x, ((0, nb * _STAT_BLOCK - t), (0, 0)), constant_values=jnp.nan)
    return x.reshape(nb, _STAT_BLOCK, f)


@jax.jit
def scale_stage12(
    x: jnp.ndarray,
    divisor: jnp.ndarray,
    log_mask: jnp.ndarray,
    local_mask: jnp.ndarray,
):
    """Stage 1 (size normalization + distance compression) and stage 2
    (per-column local standardization) of the two-stage scaler, plus the
    per-column sufficient statistics for the global fit.

    Args:
        x: (T, F) merged feature matrix (NaNs allowed).
        divisor: (F,) body-size divisors (1.0 where untouched).
        log_mask: (F,) bool — distance columns (log1p compression).
        local_mask: (F,) bool — columns standardized locally (speeds +
            distances, per the standardize modes).

    Returns:
        (scaled (T, F), blocked valid-count (nb, F), blocked sum (nb, F))
        — count/sum taken AFTER local scaling, which is what the global
        fit consumes; combine the blocks in float64 on the host.
    """
    x = x / divisor
    x = jnp.where(log_mask, jnp.log1p(jnp.clip(x, 0.0, None)), x)
    isn = jnp.isnan(x)
    cnt = jnp.sum(~isn, axis=0).astype(x.dtype)
    safe = jnp.maximum(cnt, 1.0)
    mean = jnp.sum(jnp.where(isn, 0.0, x), axis=0) / safe
    d = jnp.where(isn, 0.0, x - mean)
    var = jnp.sum(d * d, axis=0) / safe
    scale = jnp.sqrt(var)
    # sklearn's _handle_zeros_in_scale: constant features divide by 1.
    scale = jnp.where((scale == 0.0) | ~jnp.isfinite(scale), 1.0, scale)
    x = jnp.where(local_mask, (x - mean) / scale, x)
    xb = _blocked(x)
    isn2 = jnp.isnan(xb)
    cnt2 = jnp.sum(~isn2, axis=1)
    sum2 = jnp.sum(jnp.where(isn2, 0.0, xb), axis=1)
    return x, cnt2, sum2


@partial(jax.jit, static_argnames=("quads",))
def size_divisors(
    x: jnp.ndarray, w: jnp.ndarray, c: jnp.ndarray, quads
) -> jnp.ndarray:
    """Per-column body-size divisors computed ON DEVICE — the device twin
    of utils.compute_size_factors + _size_divisor_plan (reference
    deepof/utils.py:2474-2530), so the fused graph-dataset lane never
    round-trips a table to the host just to take a nan-median.

    Args:
        x: (T, F) merged feature matrix (mm, NaNs allowed).
        w: (F, A+1) host-built weights mapping [per-animal factors,
            cohort default] to each column's divisor.
        c: (F,) constant term (1.0 for columns that never size-scale).
        quads: static per-animal 4-tuples of column indices
            (nose_x, nose_y, tail_x, tail_y), or None when the animal's
            reference bodyparts are absent (factor = cohort default).
    """
    raws = []
    for q in quads:
        if q is None:
            raws.append(jnp.asarray(jnp.nan, x.dtype))
        else:
            ax, ay, bx, by = q
            raws.append(
                jnp.nanmedian(jnp.hypot(x[:, ax] - x[:, bx], x[:, ay] - x[:, by]))
            )
    raw = jnp.stack(raws)
    valid = jnp.isfinite(raw) & (raw > 0)
    default = jnp.nanmedian(jnp.where(valid, raw, jnp.nan))
    default = jnp.where(jnp.isfinite(default), default, 1.0)
    fin = jnp.where(valid, raw, default)
    ext = jnp.concatenate([fin, default[None]])
    return w @ ext + c


@jax.jit
def col_ssd(x: jnp.ndarray, mean: jnp.ndarray) -> jnp.ndarray:
    """Per-column NaN-ignoring sum of squared deviations around ``mean``,
    as (nb, F) per-block partials for float64 host combination (second
    pass of the streamed standard-scaler fit — host twin:
    ``_fast_fit_standard``)."""
    xb = _blocked(x)
    d = jnp.where(jnp.isnan(xb), 0.0, xb - mean)
    return jnp.sum(d * d, axis=1)


@partial(jax.jit, static_argnames=("interp_thresh",))
def finish_scaled(
    x: jnp.ndarray,
    gmean: jnp.ndarray,
    gscale: jnp.ndarray,
    global_mask: jnp.ndarray,
    clip_mask: jnp.ndarray,
    interp_thresh: float,
):
    """Pass-3 finish: apply the global per-column scaler, NaN out
    standardized outliers beyond ``interp_thresh``, linearly re-interpolate
    every NaN run, and zero whatever remains (all-NaN columns)."""
    x = jnp.where(global_mask, (x - gmean) / gscale, x)
    if interp_thresh:
        x = jnp.where(clip_mask & (jnp.abs(x) > interp_thresh), jnp.nan, x)
    x = interp_nan_columns(x)
    return jnp.nan_to_num(x, nan=0.0)
