"""Gap-filling primitives: forward/backward fill and limited linear interp.

Replaces ``pandas.DataFrame.interpolate(method="linear", limit=k,
limit_direction="both")`` (used by the reference's MouseTrackingImputer,
deepof/utils.py:291-305) with an O(T) fully-parallel XLA program built on
cumulative maxima instead of sequential scans, so it vectorizes across
(video, bodypart, coord) without host loops.

Semantics pinned against pandas:
  - interior gaps: linear interpolation between anchors, but a NaN is only
    filled if it is within ``limit`` steps of a valid anchor on either side;
  - leading gaps: backfilled with the first valid value (within limit);
  - trailing gaps: forward-filled with the last valid value (within limit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_BIG = jnp.int32(2**30)


def ffill_indices(valid: jnp.ndarray) -> jnp.ndarray:
    """Index of the most recent True in ``valid`` at or before each position.

    Args:
        valid: boolean array (T,). Positions with no prior True get -1.
    """
    t = valid.shape[0]
    idx = jnp.arange(t, dtype=jnp.int32)
    marked = jnp.where(valid, idx, jnp.int32(-1))
    return jax.lax.associative_scan(jnp.maximum, marked)


def bfill_indices(valid: jnp.ndarray) -> jnp.ndarray:
    """Index of the next True in ``valid`` at or after each position (T if none)."""
    t = valid.shape[0]
    rev = ffill_indices(valid[::-1])[::-1]
    return jnp.where(rev >= 0, t - 1 - rev, _BIG)


def nearest_valid_distances(valid: jnp.ndarray):
    """Distances (in steps) to the nearest valid sample on the left and right.

    Returns (dist_left, dist_right), each (T,), huge where no anchor exists.
    """
    t = valid.shape[0]
    idx = jnp.arange(t, dtype=jnp.int32)
    li = ffill_indices(valid)
    ri = bfill_indices(valid)
    dl = jnp.where(li >= 0, idx - li, _BIG)
    dr = jnp.where(ri < t, ri - idx, _BIG)
    return dl, dr


def linear_interpolate_limit(
    x: jnp.ndarray, limit: int | None = None
) -> jnp.ndarray:
    """Linear interpolation over NaNs along axis 0 with a pandas-style limit.

    Args:
        x: (T,) float array with NaNs at missing samples.
        limit: max consecutive fills counted from each side of a gap
            (None = unlimited).
    """
    t = x.shape[0]
    valid = jnp.isfinite(x)
    idx = jnp.arange(t, dtype=jnp.int32)

    li = ffill_indices(valid)
    ri_raw = bfill_indices(valid)

    li_c = jnp.clip(li, 0, t - 1)
    ri_c = jnp.clip(ri_raw, 0, t - 1)
    left_val = x[li_c]
    right_val = x[ri_c]

    has_left = li >= 0
    has_right = ri_raw < t

    dl = (idx - li).astype(x.dtype)
    dr = (ri_raw - idx).astype(x.dtype)
    span = (ri_c - li_c).astype(x.dtype)
    frac = jnp.where(span > 0, dl / jnp.maximum(span, 1), 0.0)

    interp = jnp.where(
        has_left & has_right,
        left_val + (right_val - left_val) * frac,
        jnp.where(has_left, left_val, right_val),
    )

    fillable = has_left | has_right
    if limit is not None:
        dl_i = jnp.where(has_left, idx - li, _BIG)
        dr_i = jnp.where(has_right, ri_raw - idx, _BIG)
        fillable = fillable & ((dl_i <= limit) | (dr_i <= limit))

    return jnp.where(valid, x, jnp.where(fillable, interp, jnp.nan))


def masked_linear_interpolate(
    x: jnp.ndarray, present: jnp.ndarray, limit: int | None = None
) -> jnp.ndarray:
    """Linear interpolation over NaNs restricted to ``present`` frames.

    Reproduces the reference's trick of imputing on the presence-masked
    row subset (deepof/utils.py:630-650): absent frames are neither filled
    nor used as anchors, and the fill limit counts only present frames.

    Args:
        x: (T,) values with NaNs.
        present: (T,) bool; False frames are passed through untouched.
        limit: pandas-style fill limit, counted in present-frame steps.
    """
    t = x.shape[0]
    valid = jnp.isfinite(x) & present
    # Virtual index: position within the present-frame subsequence.
    vidx = jnp.cumsum(present.astype(jnp.int32)) - 1

    li = ffill_indices(valid)
    ri_raw = bfill_indices(valid)
    li_c = jnp.clip(li, 0, t - 1)
    ri_c = jnp.clip(ri_raw, 0, t - 1)
    left_val = x[li_c]
    right_val = x[ri_c]
    has_left = li >= 0
    has_right = ri_raw < t

    dl_v = (vidx - vidx[li_c]).astype(x.dtype)
    span_v = (vidx[ri_c] - vidx[li_c]).astype(x.dtype)
    frac = jnp.where(span_v > 0, dl_v / jnp.maximum(span_v, 1), 0.0)

    interp = jnp.where(
        has_left & has_right,
        left_val + (right_val - left_val) * frac,
        jnp.where(has_left, left_val, right_val),
    )

    fillable = (has_left | has_right) & present
    if limit is not None:
        dl_i = jnp.where(has_left, vidx - vidx[li_c], _BIG)
        dr_i = jnp.where(has_right, vidx[ri_c] - vidx, _BIG)
        fillable = fillable & ((dl_i <= limit) | (dr_i <= limit))

    return jnp.where(jnp.isfinite(x), x, jnp.where(fillable, interp, jnp.nan))


def interpolate_nans(x: jnp.ndarray, limit: int | None = None) -> jnp.ndarray:
    """Vectorized linear_interpolate_limit over all trailing axes of (T, ...)."""
    flat = x.reshape(x.shape[0], -1)
    out = jax.vmap(lambda col: linear_interpolate_limit(col, limit), in_axes=1, out_axes=1)(flat)
    return out.reshape(x.shape)
