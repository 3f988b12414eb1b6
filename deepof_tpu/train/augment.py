"""Contrastive data augmentations, jit-compatible.

Behavioral spec: deepof/clustering/training.py:2051-2403 — time-shifted
half-window slicing, articulated joint rotations over precomputed graph
branches, per-bodypart axis noise, and linear segment interpolation; edge
features are recomputed from the augmented coordinates.

All randomness flows through explicit PRNG keys, all shapes are static, and
the per-sample dynamic window start is a batched dynamic_slice — the whole
augmentation pipeline lives inside the jitted train step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def recompute_edges(x: jnp.ndarray, edge_index: np.ndarray) -> jnp.ndarray:
    """Edge distances from node coordinates.

    Args:
        x: (B, T, N, >=2) with (x, y, ...) per node.
        edge_index: (E, 2) static node index pairs.

    Returns:
        (B, T, E, 1) Euclidean distances.
    """
    coords = x[..., 0:2]
    a = jnp.take(coords, jnp.asarray(edge_index[:, 0]), axis=2)
    b = jnp.take(coords, jnp.asarray(edge_index[:, 1]), axis=2)
    return jnp.linalg.norm(a - b, axis=-1, keepdims=True)


def slice_time_per_sample(x: jnp.ndarray, starts: jnp.ndarray, length: int) -> jnp.ndarray:
    """Per-sample window slice: x (B, T, ...), starts (B,) -> (B, length, ...)."""

    def one(sample, start):
        return jax.lax.dynamic_slice_in_dim(sample, start, length, axis=0)

    return jax.vmap(one)(x, starts)


def augment_time_shift(
    rng, x: jnp.ndarray, min_shift: int, max_shift: int, p: float
) -> jnp.ndarray:
    """Half-window slice with a random per-sample +/- start shift."""
    b, t = x.shape[0], x.shape[1]
    half = t // 2
    base = (t - half) // 2
    k1, k2, k3 = jax.random.split(rng, 3)
    apply = jax.random.uniform(k1, (b,)) < p
    mag = jax.random.randint(k2, (b,), min_shift, max_shift + 1)
    sgn = jax.random.randint(k3, (b,), 0, 2) * 2 - 1
    shift = jnp.where(apply, mag * sgn, 0)
    starts = jnp.clip(base + shift, 0, t - half)
    return slice_time_per_sample(x, starts, half)


@dataclass(frozen=True)
class RotationPrecomp:
    """Static articulated-rotation structure from the body graph.

    For every 3-node bridge (a, b, c): the branch of nodes reachable from a
    (resp. c) when traversal through center b is forbidden, as fixed-size
    boolean masks over nodes.
    """

    centers: np.ndarray          # (M,)
    branch_a_masks: np.ndarray   # (M, N) bool
    branch_c_masks: np.ndarray   # (M, N) bool


def build_rotation_precomp(edge_index: np.ndarray, n_nodes: int) -> RotationPrecomp:
    """Host-side precompute of rotation branches (training.py:2064-2126)."""
    adj: List[set] = [set() for _ in range(n_nodes)]
    for i, j in edge_index:
        adj[int(i)].add(int(j))
        adj[int(j)].add(int(i))

    def component_from(start: int, forbidden: int) -> set:
        seen = {start}
        stack = [start]
        while stack:
            u = stack.pop()
            for v in adj[u]:
                if v != forbidden and v not in seen:
                    seen.add(v)
                    stack.append(v)
        return seen

    centers, a_masks, c_masks = [], [], []
    for b in range(n_nodes):
        neigh = sorted(adj[b])
        for ai in range(len(neigh)):
            for ci in range(ai + 1, len(neigh)):
                a, c = neigh[ai], neigh[ci]
                comp_a = component_from(a, b)
                comp_c = component_from(c, b)
                if b in comp_a or b in comp_c:
                    continue  # cycle through b; rotation would hit the pivot
                ma = np.zeros(n_nodes, dtype=bool)
                ma[list(comp_a)] = True
                mc = np.zeros(n_nodes, dtype=bool)
                mc[list(comp_c)] = True
                centers.append(b)
                a_masks.append(ma)
                c_masks.append(mc)
    if not centers:
        return RotationPrecomp(
            np.zeros(0, np.int32), np.zeros((0, n_nodes), bool), np.zeros((0, n_nodes), bool)
        )
    return RotationPrecomp(
        np.asarray(centers, np.int32), np.stack(a_masks), np.stack(c_masks)
    )


def augment_angle_rotations(
    rng, x: jnp.ndarray, precomp: RotationPrecomp, n_rot: int, max_rot: float, p: float
) -> jnp.ndarray:
    """Rotate random articulated branches around their joint per sample."""
    m = precomp.centers.shape[0]
    if n_rot <= 0 or max_rot <= 0.0 or p <= 0.0 or m == 0:
        return x
    b, t, n, _ = x.shape
    max_rad = float(max_rot) * np.pi / 180.0

    coords = x[..., 0:2]
    keys = jax.random.split(rng, n_rot + 2)
    apply = (jax.random.uniform(keys[0], (b,)) < p).astype(x.dtype)
    which = jax.random.randint(keys[1], (n_rot,), 0, m)

    centers = jnp.asarray(precomp.centers)
    a_masks = jnp.asarray(precomp.branch_a_masks)
    c_masks = jnp.asarray(precomp.branch_c_masks)

    for r in range(n_rot):
        k_theta, k_side = jax.random.split(keys[r + 2])
        idx = which[r]
        pivot_node = centers[idx]
        side = jax.random.bernoulli(k_side)
        mask = jnp.where(side, a_masks[idx], c_masks[idx]).astype(x.dtype)  # (N,)

        theta = (jax.random.uniform(k_theta, (b,), x.dtype) * 2 - 1) * max_rad * apply
        cos_t = jnp.cos(theta)[:, None, None]
        sin_t = jnp.sin(theta)[:, None, None]
        pivot = jnp.take(coords, pivot_node, axis=2)[:, :, None, :]  # (B, T, 1, 2)
        rel = coords - pivot
        rx = rel[..., 0] * cos_t - rel[..., 1] * sin_t
        ry = rel[..., 0] * sin_t + rel[..., 1] * cos_t
        rotated = jnp.stack([rx, ry], axis=-1) + pivot
        coords = jnp.where(mask[None, None, :, None] > 0, rotated, coords)

    return x.at[..., 0:2].set(coords)


def augment_noise_xys(rng, x: jnp.ndarray, sigma: float, p: float) -> jnp.ndarray:
    """Per-(sample, node) constant offset on a random axis + speed channel."""
    if sigma <= 0.0 or p <= 0.0:
        return x
    b, t, n, f = x.shape
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    apply = (jax.random.uniform(k1, (b,)) < p).astype(x.dtype)[:, None]
    axis = jax.random.randint(k2, (b, n), 0, 2)
    offset = sigma * jax.random.normal(k3, (b, n), x.dtype) * apply
    dx = offset * (axis == 0)
    dy = offset * (axis == 1)
    ds = sigma * jax.random.normal(k4, (b, n), x.dtype) * apply
    x = x.at[..., 0].add(dx[:, None, :])
    x = x.at[..., 1].add(dy[:, None, :])
    if f > 2:
        x = x.at[..., 2].add(ds[:, None, :])
    return x


def augment_linear_interpolate_segments(
    rng, x: jnp.ndarray, min_len: int, max_len: int, p: float
) -> jnp.ndarray:
    """Replace one random contiguous segment with linear interpolation."""
    if max_len <= 0 or p <= 0.0:
        return x
    b, t = x.shape[0], x.shape[1]
    if t < 3:
        return x
    k1, k2, k3 = jax.random.split(rng, 3)
    apply = jax.random.uniform(k1, (b,)) < p
    seg_len = jax.random.randint(k2, (b,), min_len, max_len + 1)
    t0 = jax.random.randint(k3, (b,), 1, t - 1)
    t0 = jnp.minimum(t0, jnp.clip(t - seg_len - 1, 1))

    batch_idx = jnp.arange(b)
    start = x[batch_idx, t0 - 1]                  # (B, N, F)
    end = x[batch_idx, jnp.clip(t0 + seg_len, 0, t - 1)]

    tt = jnp.arange(t)[None, :]
    mask = (tt >= t0[:, None]) & (tt < (t0 + seg_len)[:, None]) & apply[:, None]
    alpha = jnp.clip(
        (tt.astype(x.dtype) - (t0[:, None] - 1)) / (seg_len[:, None] + 1), 0.0, 1.0
    )
    interp = (1.0 - alpha[..., None, None]) * start[:, None] + alpha[
        ..., None, None
    ] * end[:, None]
    return jnp.where(mask[..., None, None], interp, x)


def make_augmented_view(
    rng,
    x: jnp.ndarray,
    edge_index: np.ndarray,
    precomp: RotationPrecomp,
    cfg,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full augmentation cascade producing the positive view
    (training.py:2373-2403): time-shifted half-window -> rotations ->
    segment interpolation -> noise -> edges recomputed."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    x_aug = augment_time_shift(
        k1, x, cfg.aug_min_shift, cfg.aug_max_shift, cfg.aug_p_shift
    )
    x_aug = augment_angle_rotations(
        k2, x_aug, precomp, cfg.aug_n_rot, cfg.aug_max_rot, cfg.aug_p_rot
    )
    x_aug = augment_linear_interpolate_segments(
        k3, x_aug, cfg.aug_min_interp, cfg.aug_max_interp, cfg.aug_p_interp
    )
    x_aug = augment_noise_xys(k4, x_aug, cfg.aug_noise_sigma, cfg.aug_p_noise)
    a_aug = recompute_edges(x_aug, edge_index)
    return x_aug, a_aug
