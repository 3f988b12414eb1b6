"""Kleinberg burst detection (legacy behavior smoothing).

Host-side implementation of Kleinberg's 2-parameter burst model
(deepof/utils.py:3030-3212 in the reference, itself adapted from pybursts).
The Viterbi-style DP is sequential in time, so it stays off-device; the
inner state loop is vectorized over the k burst levels, and a C++ kernel
(deepof_tpu/native) is used when built. This path is legacy — behavior
smoothing now goes through ops.bouts.multi_step_paired_smoothing — but is
kept for API completeness.
"""

from __future__ import annotations

import math

import numpy as np

from deepof_tpu.native import native_kleinberg_q


def _kleinberg_q(gaps: np.ndarray, s: float, gamma: float, n: int, T: float, k: int):
    """Optimal burst-level sequence via min-cost dynamic programming."""
    native = native_kleinberg_q(gaps, s, gamma, n, T, k)
    if native is not None:
        return native

    g_hat = T / n
    gamma_log_n = gamma * math.log(n)
    levels = np.arange(k)
    alpha = s**levels / g_hat

    # Transition cost from state i to state j: (j - i) * gamma_log_n if j > i.
    trans = np.maximum(levels[None, :] - levels[:, None], 0) * gamma_log_n

    c = np.full(k, np.inf)
    c[0] = 0.0
    back = np.zeros((len(gaps), k), dtype=np.int32)

    log_alpha = np.log(alpha)
    for t in range(len(gaps)):
        cost = c[:, None] + trans          # (from, to)
        best_from = np.argmin(cost, axis=0)
        best_cost = cost[best_from, levels]
        emission = -(log_alpha - alpha * gaps[t])
        c = best_cost + emission
        back[t] = best_from

    # Backtrack.
    q = np.empty(len(gaps), dtype=np.int32)
    state = int(np.argmin(c))
    for t in range(len(gaps) - 1, -1, -1):
        q[t] = state + 1                   # reference stores 1-based levels
        state = int(back[t, state])
    return q.astype(np.float64)


def kleinberg(
    offsets, s: float = 2.0, gamma: float = 1.0, n=None, T=None, k=None
) -> np.ndarray:
    """Burst intervals [level, start, end] for a sequence of event offsets.

    API-compatible with the reference (deepof/utils.py:3030).
    """
    if s <= 1:
        raise ValueError("s must be greater than 1!")
    if gamma <= 0:
        raise ValueError("gamma must be positive!")
    if n is not None and n <= 0:
        raise ValueError("n must be positive!")
    if T is not None and T <= 0:
        raise ValueError("T must be positive!")
    offsets = np.asarray(offsets)
    if offsets.size < 1:
        raise ValueError("offsets must be non-empty!")
    if offsets.size == 1:
        return np.array([[0, offsets[0], offsets[0]]], dtype=object)

    offsets = np.sort(offsets)
    gaps = np.diff(offsets).astype(np.float64)
    if not np.all(gaps):
        raise ValueError("Input cannot contain events with zero time between!")

    if T is None:
        T = float(np.sum(gaps))
    if n is None:
        n = int(gaps.size)
    if k is None:
        k = min(
            6,
            int(
                math.ceil(
                    1
                    + math.log(T) / math.log(s)
                    + math.log(1.0 / float(np.amin(gaps))) / math.log(s)
                )
            ),
        )

    q = _kleinberg_q(gaps, float(s), float(gamma), n, float(T), int(k))

    # Convert the level sequence into nested [level, start, end] intervals.
    n_opens = 0
    prev = 0
    for level in q:
        if level > prev:
            n_opens += int(level - prev)
        prev = level

    bursts = np.empty((n_opens, 3), dtype=object)
    stack = []
    counter = 0
    prev = 0
    for t, level in enumerate(q):
        level = int(level)
        if level > prev:
            for i in range(level - prev):
                bursts[counter] = [prev + i, offsets[t], offsets[t]]
                stack.append(counter)
                counter += 1
        elif level < prev:
            for _ in range(prev - level):
                bursts[stack.pop(), 2] = offsets[t]
        prev = level
    while stack:
        bursts[stack.pop(), 2] = offsets[len(q)]
    return bursts


def smooth_boolean_array(
    a: np.ndarray, scale: int = 1, sigma: float = 2.0, batch_size: int = 50000
) -> np.ndarray:
    """Kleinberg-based smoothing of a boolean detection array (legacy;
    deepof/utils.py:3215-3258)."""
    n = len(a)
    out = np.zeros(n, dtype=bool)
    for start in range(0, n, batch_size // 2):
        end = min(start + batch_size, n)
        batch = np.asarray(a[start:end])
        offsets = np.where(batch)[0]
        if len(offsets) == 0:
            continue
        bursts = kleinberg(offsets, gamma=0.3, s=sigma)
        smoothed = np.zeros(batch.size, dtype=bool)
        for level, b_start, b_end in bursts:
            if level == scale:
                smoothed[int(b_start) : int(b_end)] = True
        out[start:end] = smoothed
    return out
