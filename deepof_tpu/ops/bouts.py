"""Behavior-bout post-processing kernels.

Vectorized XLA replacements for the reference's bout filters:
  - deepof/utils.py:3999-4036 filter_short_true_segments_numba
    -> run-length filtering via parallel prefix scans (no sequential loop)
  - deepof/utils.py:3260-3352 multi_step_paired_smoothing
    -> same merge/resolve/median/filter cascade, fully batched
  - deepof/utils.py:1026-1064 extend_behaviors_numba
    -> bout extension via a windowed-maximum of offset markers
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from deepof_tpu.ops.interp import ffill_indices
from deepof_tpu.ops.smoothing import binary_moving_median, moving_average


def _run_bounds(a: jnp.ndarray):
    """For each True element, the start and end indices of its run."""
    t = a.shape[0]
    idx = jnp.arange(t, dtype=jnp.int32)
    prev = jnp.concatenate([jnp.array([False]), a[:-1]])
    nxt = jnp.concatenate([a[1:], jnp.array([False])])
    starts = a & ~prev
    ends = a & ~nxt
    start_idx = ffill_indices(starts)                     # start of current run
    # backward min of end markers = end of current run
    end_marked = jnp.where(ends, idx, t + 1)
    end_idx = -jax.lax.associative_scan(jnp.maximum, -end_marked[::-1])[::-1]
    return start_idx, end_idx


def filter_short_true_segments(a: jnp.ndarray, min_length: int) -> jnp.ndarray:
    """Drop True runs shorter than min_length frames.

    Args:
        a: (T,) boolean array.
    """
    a = a.astype(bool)
    start_idx, end_idx = _run_bounds(a)
    run_len = end_idx - start_idx + 1
    return a & (run_len >= min_length)


def extend_behaviors(
    behaviors: jnp.ndarray, delta_t: float = 2.0, frame_rate: float = 1.0
) -> jnp.ndarray:
    """Extend every behavior bout by delta_t seconds past its offset.

    Args:
        behaviors: (K, T) boolean detections per behavior.

    Returns:
        (K, T) extended detections.
    """
    ext = int(frame_rate * delta_t)
    if ext <= 0:
        return behaviors
    b = behaviors.astype(bool)
    # A frame becomes True if any of the previous `ext` frames ended a bout
    # (reference fills [offset, offset+ext) after each True->False edge) —
    # equivalently if any of the previous ext frames (or self) was True.
    t = b.shape[1]
    padded = jnp.pad(b, ((0, 0), (ext, 0)))
    stacked = jnp.stack([padded[:, i : i + t] for i in range(ext + 1)], axis=0)
    return jnp.any(stacked, axis=0)


def multi_step_paired_smoothing(
    behavior_in: jnp.ndarray,
    not_behavior: jnp.ndarray | None = None,
    exclude: jnp.ndarray | None = None,
    min_length: int = 6,
    get_both: bool = False,
):
    """Merge close bouts, resolve behavior/not-behavior conflicts, and drop
    isolated blips — the reference's replacement for Kleinberg smoothing.

    Args:
        behavior_in: (T,) raw boolean detections.
        not_behavior: (T,) raw not-behavior detections (default: complement
            within ``exclude``).
        exclude: (T,) boolean; False frames are forced to no-behavior.
        min_length: smoothing scale (frames).
        get_both: also return the smoothed not-behavior signal.
    """
    t = behavior_in.shape[0]
    if exclude is None:
        exclude = jnp.ones(t, dtype=bool)
    exclude = exclude.astype(bool)

    if not_behavior is None:
        behavior = exclude & behavior_in.astype(bool)
        not_behavior = exclude & ~behavior_in.astype(bool)
    else:
        behavior = behavior_in.astype(bool)
        not_behavior = not_behavior.astype(bool)

    # Widen both signals.
    behavior = moving_average(behavior.astype(jnp.float32), min_length) > 0
    not_behavior = moving_average(not_behavior.astype(jnp.float32), min_length) > 0

    # Resolve frames claimed by both using a wider context average.
    behavior_avg = moving_average(behavior.astype(jnp.float32), min_length * 4)
    not_behavior_avg = moving_average(not_behavior.astype(jnp.float32), min_length * 4)
    conflict = behavior & not_behavior
    behavior_wins = behavior_avg >= not_behavior_avg
    behavior = jnp.where(conflict & ~behavior_wins, False, behavior)
    not_behavior = jnp.where(conflict & behavior_wins, False, not_behavior)

    behavior = behavior & exclude
    not_behavior = not_behavior & exclude

    # Binary median widens consistent behavior blocks.
    behavior = binary_moving_median(behavior, min_length * 4 + 1)
    not_behavior = not_behavior & ~behavior

    behavior = filter_short_true_segments(behavior, min_length)
    not_behavior = filter_short_true_segments(not_behavior, min_length)

    behavior = behavior & exclude
    not_behavior = not_behavior & exclude

    if get_both:
        return behavior, not_behavior
    return behavior


# --------------------------------------------------------------------------- #
# Host twins (bit-exact with the reference cascade)
# --------------------------------------------------------------------------- #


def _filter_short_host(a: np.ndarray, min_length: int) -> np.ndarray:
    """Host run-length filter: drop True runs shorter than min_length."""
    from deepof_tpu.native import native_filter_short

    out = native_filter_short(a, min_length)
    if out is not None:
        return out
    a = a.astype(bool)
    edges = np.diff(np.concatenate([[0], a.view(np.uint8), [0]]))
    starts = np.flatnonzero(edges == 1)
    ends = np.flatnonzero(edges == -1)
    keep = (ends - starts) >= min_length
    out = np.zeros(len(a), dtype=bool)
    for s, e in zip(starts[keep], ends[keep]):
        out[s:e] = True
    return out


def _binary_median_host(a: np.ndarray, lag: int) -> np.ndarray:
    """Host binary moving median: window of size ``2*((lag-1)//2)+1`` holds
    strictly more True than False; edges False (utils.py:3519-3534)."""
    from deepof_tpu.native import native_binary_median

    out = native_binary_median(a, lag)
    if out is not None:
        return out
    pad = (lag - 1) // 2
    t = len(a)
    csum = np.concatenate([[0], np.cumsum(a.astype(np.int64))])
    win = 2 * pad + 1
    out = np.zeros(t, dtype=bool)
    if t >= win:
        out[pad : t - pad] = (csum[win:] - csum[:-win]) > pad
    return out


def multi_step_paired_smoothing_host(
    behavior_in: np.ndarray,
    not_behavior: np.ndarray | None = None,
    exclude: np.ndarray | None = None,
    min_length: int = 6,
    get_both: bool = False,
):
    """Host numpy twin of :func:`multi_step_paired_smoothing`.

    The supervised annotators run this per 1-D series on the host (the
    series are tiny; a device round-trip per behavior costs more than the
    op).  Crucially the conflict-resolution averages are computed with
    ``np.convolve(x, ones(lag)/lag, "same")`` — the reference's own
    ``moving_average`` (utils.py:3504-3517) — so exact mathematical ties
    in ``behavior_avg >= not_behavior_avg`` resolve through the *same*
    float64 accumulation noise and the output is bit-identical to the
    reference cascade (utils.py:3260-3352), not just 95%-equal.
    """
    t = len(behavior_in)
    if exclude is None:
        exclude = np.ones(t, dtype=bool)
    exclude = np.asarray(exclude, dtype=bool)

    if not_behavior is None:
        behavior = exclude & np.asarray(behavior_in, dtype=bool)
        not_behavior = exclude & ~np.asarray(behavior_in, dtype=bool)
    else:
        behavior = np.asarray(behavior_in, dtype=bool)
        not_behavior = np.asarray(not_behavior, dtype=bool)

    def _avg(x, lag):
        return np.convolve(x, np.ones(lag) / lag, mode="same")

    # Widen both signals (any overlap with the window -> True).
    behavior = _avg(behavior, min_length).astype(bool)
    not_behavior = _avg(not_behavior, min_length).astype(bool)

    # Resolve frames claimed by both using a wider context average; the
    # reference's per-frame loop only reads the precomputed averages, so it
    # vectorizes exactly (utils.py:3285-3296).
    behavior_avg = _avg(behavior.astype(float), min_length * 4)
    not_behavior_avg = _avg(not_behavior.astype(float), min_length * 4)
    conflict = behavior & not_behavior
    behavior_wins = behavior_avg >= not_behavior_avg
    behavior[conflict & ~behavior_wins] = False
    not_behavior[conflict & behavior_wins] = False

    behavior &= exclude
    not_behavior &= exclude

    behavior = _binary_median_host(behavior, min_length * 4 + 1)
    not_behavior &= ~behavior

    behavior = _filter_short_host(behavior, min_length)
    not_behavior = _filter_short_host(not_behavior, min_length)

    behavior &= exclude
    not_behavior &= exclude

    if get_both:
        return behavior, not_behavior
    return behavior
