"""Occlusion imputation kernels: Kalman/RTS smoothing, skeleton constraints,
and an iterative ridge imputer.

TPU-native rebuild of the reference's MouseTrackingImputer stack:
  - deepof/utils.py:69-145  rts_smoother_numba  -> kalman_rts_smooth
    (lax.scan forward + backward, vmapped over every bodypart/coord channel
    at once instead of a python loop per channel)
  - deepof/utils.py:148-195 enforce_skeleton_constraints_numba
    -> enforce_skeleton_constraints (vmap over frames, unrolled over the
    static constraint list; sequential update order within a frame kept)
  - sklearn IterativeImputer (deepof/utils.py:385-413) -> iterative_ridge_impute
    (fixed-round ridge sweep; a documented approximation of MICE that is
    shape-static and jittable — used only in full_imputation mode)

Parity quirks intentionally kept from the reference:
  - the Kalman initial state broadcasts the first measurement into both the
    position AND velocity components (utils.py:108-110);
  - a frame is skipped by the constraint solver iff bodypart 0 is original
    (utils.py:173-175);
  - "original" for the move-one-endpoint rule checks only the x flag.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Kalman model constants (deepof/utils.py:352-366), dt = 1.
_F = np.array([[1.0, 1.0], [0.0, 1.0]])
_Q = np.array([[0.25, 0.5], [0.5, 1.0]]) * 0.01
_R = 0.1
_P0 = 1000.0


def _inv2(m: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a 2x2 matrix, explicit adjugate form."""
    det = m[0, 0] * m[1, 1] - m[0, 1] * m[1, 0]
    return jnp.array([[m[1, 1], -m[0, 1]], [-m[1, 0], m[0, 0]]]) / det


def _kalman_rts_1d(measurements: jnp.ndarray) -> jnp.ndarray:
    """RTS-smoothed positions for one scalar measurement channel (T,)."""
    f = jnp.asarray(_F, measurements.dtype)
    q = jnp.asarray(_Q, measurements.dtype)
    r = jnp.asarray(_R, measurements.dtype)

    x0 = jnp.array([measurements[0], measurements[0]], measurements.dtype)
    p0 = jnp.eye(2, dtype=measurements.dtype) * _P0

    def forward(carry, z):
        x_prev, p_prev = carry
        x_pred = f @ x_prev
        p_pred = f @ p_prev @ f.T + q
        s = p_pred[0, 0] + r
        k = p_pred[:, 0] / s
        innov = z - x_pred[0]
        x_filt = x_pred + k * innov
        p_filt = p_pred - jnp.outer(k, p_pred[0, :])
        return (x_filt, p_filt), (x_pred, p_pred, x_filt, p_filt)

    (_, _), (x_pred, p_pred, x_filt, p_filt) = jax.lax.scan(
        forward, (x0, p0), measurements[1:]
    )
    # Prepend t=0 (no prediction stored for it in the reference either).
    x_filt = jnp.concatenate([x0[None], x_filt], axis=0)
    p_filt = jnp.concatenate([p0[None], p_filt], axis=0)

    def backward(carry, inp):
        x_next_s, p_next_s = carry
        x_f, p_f, x_pr_next, p_pr_next = inp
        c = p_f @ f.T @ _inv2(p_pr_next)
        x_s = x_f + c @ (x_next_s - x_pr_next)
        p_s = p_f + c @ (p_next_s - p_pr_next) @ c.T
        return (x_s, p_s), x_s

    init = (x_filt[-1], p_filt[-1])
    (_, _), x_smooth_rev = jax.lax.scan(
        backward,
        init,
        (x_filt[:-1][::-1], p_filt[:-1][::-1], x_pred[::-1], p_pred[::-1]),
    )
    x_smooth = jnp.concatenate([x_filt[-1][None], x_smooth_rev], axis=0)[::-1]
    return x_smooth[:, 0]


def kalman_rts_smooth(data: jnp.ndarray) -> jnp.ndarray:
    """RTS smoothing of every channel of (T, B, 2) at once."""
    t = data.shape[0]
    flat = data.reshape(t, -1)
    out = jax.vmap(_kalman_rts_1d, in_axes=1, out_axes=1)(flat)
    return out.reshape(data.shape)


def estimate_skeleton_constraints(
    data: np.ndarray,
    edges: Sequence[Tuple[int, int]],
    n_samples: int = 100,
) -> List[Tuple[int, int, float]]:
    """Per-edge rest lengths from a sample of fully-tracked frames.

    Host-side (numpy) initialization, matching the reference's sampling of
    every (n_complete // n_samples)-th complete frame
    (deepof/utils.py:227-258).

    Args:
        data: (T, B, 2) positions with NaNs at missing samples.
        edges: (i, j) bodypart index pairs (directed, as the reference
            iterates the adjacency both ways).
    """
    complete = np.where(np.isfinite(data).all(axis=(1, 2)))[0]
    if complete.size == 0:
        raise ValueError("No complete frames found; cannot estimate constraints.")
    step = max(1, complete.size // n_samples)
    sampled = data[complete[::step]]
    constraints = []
    for i, j in edges:
        d = np.sqrt(((sampled[:, i] - sampled[:, j]) ** 2).sum(-1))
        constraints.append((int(i), int(j), float(d.mean())))
    return constraints


def enforce_skeleton_constraints(
    data: jnp.ndarray,
    constraints: Sequence[Tuple[int, int, float]],
    original_pos: jnp.ndarray,
    tolerance: float = 0.1,
    correction_factor: float = 0.5,
) -> jnp.ndarray:
    """Pull imputed bodyparts toward their skeleton rest lengths.

    Args:
        data: (T, B, 2) positions.
        constraints: static list of (part1, part2, rest_length).
        original_pos: (T, B, 2) bool, True where the sample is original
            (not imputed).
    """

    def per_frame(frame: jnp.ndarray, orig: jnp.ndarray) -> jnp.ndarray:
        skip = jnp.all(orig[0])

        def apply_constraints(fr):
            for p1, p2, rest in constraints:
                a, b = fr[p1], fr[p2]
                cur = jnp.sqrt(jnp.sum((a - b) ** 2))
                out_of_tol = (cur > rest * (1 + tolerance)) | (
                    cur < rest * (1 - tolerance)
                )
                corr = (cur - rest) / (2 * cur + 1e-5) * correction_factor
                corr = jnp.where(out_of_tol, corr, 0.0)
                pm = (a + b) / 2
                a_orig = orig[p1, 0]
                b_orig = orig[p2, 0]
                # a original -> move only b (doubled); else b original ->
                # move only a (doubled); neither -> move both by half.
                coef_a = jnp.where(a_orig, 0.0, jnp.where(b_orig, 2.0, 1.0))
                coef_b = jnp.where(a_orig, 2.0, jnp.where(b_orig, 0.0, 1.0))
                fr = fr.at[p1].add(coef_a * corr * (pm - a))
                fr = fr.at[p2].add(coef_b * corr * (pm - b))
            return fr

        return jnp.where(skip, frame, apply_constraints(frame))

    return jax.vmap(per_frame)(data, original_pos)


def iterative_ridge_impute(
    data: jnp.ndarray,
    n_rounds: int = 10,
    ridge: float = 1e-3,
) -> jnp.ndarray:
    """Fill NaNs by round-robin ridge regression of each feature on the rest.

    A shape-static, jittable analog of sklearn's IterativeImputer
    (BayesianRidge round-robin, deepof/utils.py:385-413): features are
    standardized, missing entries initialized at the feature mean, then for
    ``n_rounds`` sweeps each feature with missing data is re-predicted from
    all others via an observed-row-weighted ridge solve.

    Args:
        data: (T, F) matrix with NaNs.

    Returns:
        (T, F) with NaNs replaced (observed entries untouched).
    """
    obs = jnp.isfinite(data)
    mu = jnp.nanmean(data, axis=0)
    sd = jnp.nanstd(data, axis=0)
    sd = jnp.where(sd > 0, sd, 1.0)
    z = (data - mu) / sd
    filled = jnp.where(obs, z, 0.0)

    t, f = data.shape
    eye = jnp.eye(f, dtype=data.dtype)

    def sweep(filled, _):
        def impute_feature(j, filled):
            mask_j = obs[:, j]
            y = filled[:, j]
            x_others = filled * (1 - eye[j])[None, :]
            w = mask_j.astype(data.dtype)
            xtw = x_others.T * w[None, :]
            gram = xtw @ x_others + ridge * eye
            beta = jnp.linalg.solve(gram, xtw @ y)
            pred = x_others @ beta
            new_col = jnp.where(mask_j, y, pred)
            return filled.at[:, j].set(new_col)

        filled = jax.lax.fori_loop(0, f, impute_feature, filled)
        return filled, None

    filled, _ = jax.lax.scan(sweep, filled, None, length=n_rounds)
    out = filled * sd + mu
    return jnp.where(obs, data, out)
