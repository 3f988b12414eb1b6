"""Sliding-window extraction for model input tensorization.

The reference materializes windows with numpy stride tricks
(deepof/utils.py:3354-3377 rolling_window) inside a per-video loop; here
windows are a static gather index matrix applied on device, which XLA turns
into an efficient dynamic-slice loop / gather and can fuse with the scaler
that follows.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sliding_window_indices(t: int, window_size: int, window_step: int) -> np.ndarray:
    """(W, window_size) int32 frame indices; W = floor((t - size) / step) + 1
    over the stride-tricks starts [0, step, 2*step, ...]."""
    starts = np.arange(0, t - window_size + 1, window_step, dtype=np.int32)
    return starts[:, None] + np.arange(window_size, dtype=np.int32)[None, :]


def rolling_windows(
    x: jnp.ndarray, window_size: int, window_step: int = 1
) -> jnp.ndarray:
    """Extract sliding windows along axis 0.

    Args:
        x: (T, ...) array.

    Returns:
        (W, window_size, ...) windows.
    """
    idx = sliding_window_indices(x.shape[0], window_size, window_step)
    return jnp.take(x, jnp.asarray(idx), axis=0)


def rolling_windows_host(
    arr: np.ndarray, window_size: int, window_step: int = 1,
    contiguous: bool = True,
) -> np.ndarray:
    """Host-side window materialization via numpy stride tricks.

    Replaces per-window Python-loop stacking in the dataset build (the
    reference's own approach, deepof/utils.py:3354-3377). With
    ``contiguous=False`` the (W, window, F) array is returned as a
    zero-copy strided VIEW of the per-frame data: stride-1 windows are
    ~window_size-fold redundant, so skipping the copy keeps the training
    set at per-frame memory footprint; consumers that batch (WindowDataset)
    or serialize (h5 spill) materialize only what they touch. The device
    paths (inference, bench) gather windows on-chip instead
    (rolling_windows / the Pallas kernel).
    """
    arr = np.asarray(arr)
    if arr.shape[0] < window_size:
        return np.zeros((0, window_size) + arr.shape[1:], arr.dtype)
    view = np.lib.stride_tricks.sliding_window_view(arr, window_size, axis=0)
    # view: (W, ...features, window) -> (W, window, ...features)
    view = np.moveaxis(view, -1, 1)[::window_step]
    return np.ascontiguousarray(view) if contiguous else view


def aggregate_windows(windows: jnp.ndarray, aggregate: str | None) -> jnp.ndarray:
    """Window aggregation modes from the reference's extract_windows
    (deepof/utils.py:3380-3470): None (raw), "mid", "mean".

    ("wta"/"lta" operate on integer label windows and live host-side in
    deepof_tpu.utils.)
    """
    if aggregate is None:
        return windows
    if aggregate == "mid":
        mid = windows.shape[1] // 2
        return windows[:, mid : mid + 1]
    if aggregate == "mean":
        return jnp.mean(windows, axis=1, keepdims=True)
    raise ValueError(f"Unknown aggregate mode: {aggregate}")


def aggregate_windows_labels(windows: np.ndarray, aggregate: str) -> np.ndarray:
    """Host-side "wta"/"lta" label aggregation (deepof/utils.py:3448-3463).

    "wta" is the per-column mode over the window (the reference applies
    scipy.stats.mode along the window axis; ties resolve to the smallest
    value). "lta" picks the least frequent *row combination* in each window
    (the reference's np.unique(..., axis=0) argmin-count loop; ties resolve
    to the lexicographically smallest row, matching np.unique's sort order).
    """
    n, _, d = windows.shape
    out = np.empty((n, 1, d), dtype=windows.dtype)
    if aggregate == "wta":
        # vectorized per-column mode: count occurrences of each distinct
        # value per (window, column) cell, pick the max (first on ties —
        # values are scanned in sorted order, matching scipy.stats.mode)
        values = np.unique(windows)
        counts = np.stack(
            [(windows == v).sum(axis=1) for v in values], axis=0
        )  # (V, N, D)
        out[:, 0, :] = values[np.argmax(counts, axis=0)]
    elif aggregate == "lta":
        for i in range(n):
            rows, counts = np.unique(windows[i], return_counts=True, axis=0)
            out[i, 0] = rows[np.argmin(counts)]
    else:
        raise ValueError(f"Unknown label aggregate mode: {aggregate}")
    return out
