"""Trajectory smoothing kernels.

Savitzky-Golay smoothing with scipy-identical 'interp' edge handling
(replacing deepof/utils.py:3477 smooth_mult_trajectory), uniform moving
averages with numpy ``convolve(..., "same")`` conventions
(deepof/utils.py:3499), and the binary moving median used for behavior
post-processing (deepof/utils.py:3519 binary_moving_median_numba).

The Savitzky-Golay filter is lowered to one interior correlation plus two
small edge matmuls whose operators are precomputed (statically, per
(window, polyorder)) from scipy — the whole filter is a single fused XLA
program and batches over every (video, feature) column at once.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from scipy.signal import savgol_coeffs, savgol_filter


@lru_cache(maxsize=64)
def _savgol_operators(window: int, polyorder: int):
    """(central_coeffs, start_edge_matrix, end_edge_matrix) as numpy arrays.

    The edge matrices are the exact linear operators scipy applies in
    mode='interp': rows 0..half-1 (resp. -half..-1) of the filter output
    depend only on the first (resp. last) ``window`` samples, so applying
    savgol_filter to an identity matrix of size ``window`` recovers them.
    """
    half = window // 2
    central = savgol_coeffs(window, polyorder)[::-1].copy()
    op = savgol_filter(np.eye(window), window, polyorder, axis=0)
    e_start = op[:half].copy()
    e_end = op[window - half:].copy()
    return central, e_start, e_end


def savgol_edges_host(x_np: np.ndarray, window: int, polyorder: int):
    """scipy-exact edge rows of a mode='interp' Savitzky-Golay filter.

    The first/last ``window // 2`` output rows depend only on the first/last
    ``window`` input samples, so we run scipy's own filter on those slices.
    This matters at high polyorder (the reference's default ``smooth_alpha=1``
    means polyorder 14 at window 15): the edge polyfit is so ill-conditioned
    that any reimplementation differs from scipy by ~1e-3 in pixel units, so
    bit-parity requires scipy's literal float path. Cost: 2*window rows on
    host, negligible.

    Returns (start_rows (window//2, F), end_rows (window//2, F)) float64.
    """
    x_np = np.asarray(x_np, dtype=np.float64)
    half = window // 2
    head = savgol_filter(x_np[:window], window, polyorder, axis=0)
    tail = savgol_filter(x_np[-window:], window, polyorder, axis=0)
    return head[:half], tail[window - half:]


def savgol_smooth(
    x: jnp.ndarray,
    window: int = 15,
    polyorder: int = 13,
    edges=None,
) -> jnp.ndarray:
    """Savitzky-Golay smooth along axis 0 of (T, F), scipy 'interp' edges.

    The reference calls this with ``polyorder = window - alpha`` where alpha
    is the Project's ``smooth_alpha`` (deepof/utils.py:3477-3500).

    Args:
        edges: optional (start_rows, end_rows) precomputed on host via
            :func:`savgol_edges_host` for scipy-bit-exact edge values; when
            None the edges use precomputed linear operators (identical in
            exact arithmetic, ~1e-3 off at polyorder close to window).
    """
    central, e_start, e_end = _savgol_operators(window, polyorder)
    central_j = jnp.asarray(central, dtype=x.dtype)
    half = window // 2

    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]

    t, f = x.shape
    if t < window:
        raise ValueError(f"signal length {t} < window {window}")

    # Interior: correlation along time. (F, 1, T) conv (1, 1, W) -> (F, 1, T-W+1)
    lhs = x.T[:, None, :]
    rhs = central_j[None, None, :]
    interior = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID"
    )[:, 0, :].T  # (T - window + 1, F)

    if edges is not None:
        start = jnp.asarray(edges[0], dtype=x.dtype)
        end = jnp.asarray(edges[1], dtype=x.dtype)
        if squeeze and start.ndim == 1:
            start, end = start[:, None], end[:, None]
    else:
        start = jnp.asarray(e_start, dtype=x.dtype) @ x[:window]   # (half, F)
        end = jnp.asarray(e_end, dtype=x.dtype) @ x[t - window:]   # (half, F)

    out = jnp.concatenate([start, interior, end], axis=0)
    return out[:, 0] if squeeze else out


def moving_average(x: jnp.ndarray, lag: int = 5) -> jnp.ndarray:
    """Uniform moving average along axis 0, numpy convolve 'same' convention.

    For even ``lag`` the window is asymmetric exactly as np.convolve places
    it: output[i] averages x[i - (lag - 1 - (lag-1)//2) .. i + (lag-1)//2]
    with zero padding outside the signal.
    """
    squeeze = x.ndim == 1
    if squeeze:
        x = x[:, None]
    x = x.astype(jnp.result_type(x.dtype, jnp.float32))

    pad_r = (lag - 1) // 2
    pad_l = lag - 1 - pad_r
    padded = jnp.pad(x, ((pad_l, pad_r), (0, 0)))
    csum = jnp.concatenate(
        [jnp.zeros((1, x.shape[1]), padded.dtype), jnp.cumsum(padded, axis=0)], axis=0
    )
    out = (csum[lag:] - csum[:-lag]) / lag
    return out[:, 0] if squeeze else out


def binary_moving_median(x: jnp.ndarray, lag: int) -> jnp.ndarray:
    """Binary moving median: True where a centered window of size ``lag``
    holds strictly more than ``(lag-1)//2`` True values; edges are False.

    Matches deepof/utils.py:3519 (same result for lag=N and N+1 when N odd).
    """
    pad = (lag - 1) // 2
    t = x.shape[0]
    xf = x.astype(jnp.float32)
    squeeze = xf.ndim == 1
    if squeeze:
        xf = xf[:, None]
    csum = jnp.concatenate(
        [jnp.zeros((1, xf.shape[1]), xf.dtype), jnp.cumsum(xf, axis=0)], axis=0
    )
    win = 2 * pad + 1
    counts = csum[win:] - csum[:-win]            # (T - 2*pad, F)
    core = counts > pad
    out = jnp.zeros_like(core, shape=(t, core.shape[1]))
    out = out.at[pad : t - pad].set(core)
    return out[:, 0] if squeeze else out
