"""Kinematic feature kernels: distances, angles, areas, speeds, polar coords.

These are the reference's per-DataFrame feature passes
(deepof/utils.py:863-1023 compute_dist/bpart_distance/angle/compute_areas,
deepof/utils.py:3788 rolling_speed, deepof/utils.py:814-861 tab2polar)
rebuilt as batched gathers + vector math over ``(T, N, 2)`` keypoint
tensors, so one jit compiles the whole feature pass for a cohort.
"""

from __future__ import annotations

from itertools import combinations
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def all_pair_indices(n: int) -> np.ndarray:
    """(P, 2) indices of all unordered bodypart pairs, in combinations order
    (matches the reference's distance column order, deepof/utils.py:896)."""
    pairs = list(combinations(range(n), 2))
    return np.asarray(pairs, dtype=np.int32) if pairs else np.zeros((0, 2), np.int32)


def pairwise_distances(x: jnp.ndarray, pairs: np.ndarray) -> jnp.ndarray:
    """Euclidean distances for the given bodypart pairs.

    Args:
        x: (..., T, N, 2) positions.
        pairs: (P, 2) static index array.

    Returns:
        (..., T, P) distances.
    """
    a = jnp.take(x, jnp.asarray(pairs[:, 0]), axis=-2)
    b = jnp.take(x, jnp.asarray(pairs[:, 1]), axis=-2)
    d = a - b
    return jnp.sqrt(jnp.sum(d * d, axis=-1))


def bridge_angles(x: jnp.ndarray, bridges: np.ndarray) -> jnp.ndarray:
    """Unsigned angle at the center of each 3-node bridge, in radians.

    Args:
        x: (..., T, N, 2) positions.
        bridges: (A, 3) static (a, center, b) index trios.

    Returns:
        (..., T, A) angles in [0, pi].
    """
    a = jnp.take(x, jnp.asarray(bridges[:, 0]), axis=-2)
    c = jnp.take(x, jnp.asarray(bridges[:, 1]), axis=-2)
    b = jnp.take(x, jnp.asarray(bridges[:, 2]), axis=-2)
    ca = a - c
    cb = b - c
    cos = jnp.sum(ca * cb, axis=-1) / (
        jnp.linalg.norm(ca, axis=-1) * jnp.linalg.norm(cb, axis=-1)
    )
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))


def polygon_areas(x: jnp.ndarray, poly: np.ndarray) -> jnp.ndarray:
    """Shoelace area of the polygon over the given vertex indices per frame.

    NaN vertices propagate to NaN areas (matching the reference's skip rule,
    deepof/utils.py:971-976).

    Args:
        x: (..., T, N, 2) positions.
        poly: (V,) static vertex index array.

    Returns:
        (..., T) areas.
    """
    v = jnp.take(x, jnp.asarray(poly), axis=-2)          # (..., T, V, 2)
    nxt = jnp.roll(v, -1, axis=-2)
    cross = v[..., 0] * nxt[..., 1] - nxt[..., 0] * v[..., 1]
    return jnp.abs(jnp.sum(cross, axis=-1)) / 2.0


def to_polar(x: jnp.ndarray) -> jnp.ndarray:
    """Cartesian (..., 2) -> polar (..., 2) as (rho, phi).

    phi is the complex argument of x + iy (deepof/utils.py:814-826).
    """
    rho = jnp.hypot(x[..., 0], x[..., 1])
    phi = jnp.arctan2(x[..., 1], x[..., 0])
    return jnp.stack([rho, phi], axis=-1)


def _windowed_mean_nan(d: jnp.ndarray, window: int) -> jnp.ndarray:
    """Trailing rolling mean (pandas min_periods=window) along axis 0.

    Interior NaNs poison exactly the windows that cover them (conv-based,
    not cumsum-based, so propagation width is bounded by the window).
    """
    t, f = d.shape
    lhs = d.T[:, None, :]
    rhs = jnp.full((1, 1, window), 1.0 / window, dtype=d.dtype)
    core = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID"
    )[:, 0, :].T                                           # (T - window + 1, F)
    head = jnp.full((window - 1, f), jnp.nan, dtype=d.dtype)
    return jnp.concatenate([head, core], axis=0)


def rolling_speed(
    x: jnp.ndarray,
    frame_rate: float = 1.0,
    window: int = 3,
    rounds: int = 3,
    deriv: int = 1,
    shift: int = 2,
    is_coords: bool = True,
) -> jnp.ndarray:
    """n-th order speed (mm/s for deriv=1, then accel, jerk, ...).

    Reference semantics (deepof/utils.py:3788-3860): per derivative order,
    displacement norm between frame t and t-shift divided by shift, then a
    trailing rolling mean of ``window`` frames rounded to ``rounds``
    decimals; the final result is scaled by ``frame_rate``. Leading frames
    (t < shift, and incomplete rolling windows) are NaN.

    Args:
        x: (T, B, 2) positions if is_coords, else (T, B) scalar series.

    Returns:
        (T, B) derivative magnitudes.
    """
    if is_coords:
        t, b, _ = x.shape
        cur = x
    else:
        t, b = x.shape
        cur = x

    for der in range(deriv):
        two_d = der == 0 and is_coords
        if two_d:
            delta = cur[shift:] - cur[:-shift]             # (T-shift, B, 2)
            dist = jnp.sqrt(jnp.sum((delta / shift) ** 2, axis=-1))
        else:
            delta = (cur[shift:] - cur[:-shift]) / shift   # (T-shift, B)
            dist = jnp.abs(delta)
        dist = jnp.concatenate(
            [jnp.full((shift, b), jnp.nan, dtype=dist.dtype), dist], axis=0
        )
        rolled = _windowed_mean_nan(dist, window)
        scale = jnp.asarray(10.0**rounds, dtype=rolled.dtype)
        cur = jnp.round(rolled * scale) / scale

    return cur * frame_rate
