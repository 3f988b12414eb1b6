"""Egocentric rotation / alignment kernels.

Replaces the reference's per-frame rotation loops
(deepof/utils.py:1322-1399 rotate_all_numba/rotate_numba and
deepof/utils.py:2097-2142 align_trajectories) with one batched rotation —
a (T, 2, 2) rotation-matrix einsum that XLA fuses with its producers.
"""

from __future__ import annotations

import jax.numpy as jnp


def rotate2d(points: jnp.ndarray, angles: jnp.ndarray) -> jnp.ndarray:
    """Rotate 2D points counter-clockwise by per-frame angles around origin.

    Args:
        points: (T, B, 2) positions.
        angles: (T,) radians.

    Returns:
        (T, B, 2) rotated positions.
    """
    c, s = jnp.cos(angles), jnp.sin(angles)
    rot = jnp.stack(
        [jnp.stack([c, -s], axis=-1), jnp.stack([s, c], axis=-1)], axis=-2
    )  # (T, 2, 2)
    return jnp.einsum("tij,tbj->tbi", rot, points)


def align_trajectories(
    data: jnp.ndarray, mode: str = "all"
) -> jnp.ndarray:
    """Rotate every frame so the aligned bodypart (feature column 0) lands on
    the y-axis.

    Reference semantics (deepof/utils.py:2097-2142): the rotation angle is
    ``arctan2(x_align, y_align)`` — i.e. the aligned part's azimuth from the
    +y axis — applied CCW per frame.

    Args:
        data: (T, B, 2) centered positions where bodypart 0 is the alignment
            target, OR (W, L, B, 2) windowed data for mode="center".
        mode: "all" aligns every frame; "center" aligns each window by its
            center frame's angle; "none" is identity.
    """
    if mode == "none":
        return data

    if mode == "center":
        # (W, L, B, 2): one angle per window from the center frame.
        center_time = (data.shape[1] - 1) // 2
        ref = data[:, center_time, 0]                     # (W, 2)
        angles = jnp.arctan2(ref[..., 0], ref[..., 1])    # (W,)
        w, l, b, _ = data.shape
        flat = data.reshape(w, l * b, 2)
        out = rotate2d(flat, angles)
        return out.reshape(w, l, b, 2)

    # mode == "all": (T, B, 2)
    ref = data[:, 0]
    angles = jnp.arctan2(ref[..., 0], ref[..., 1])
    return rotate2d(data, angles)
