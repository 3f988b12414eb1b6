"""Arena/ROI geometry kernels: point-in-polygon, point-to-polygon distance,
field-of-view tests.

Vectorized XLA replacements for the reference's prange numba kernels
(deepof/utils.py:1417-1870): ray casting and segment distances are expressed
as reductions over a static edge axis, so one jit handles every frame of
every animal against the arena polygon at once.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _close_polygon(polygon: np.ndarray) -> np.ndarray:
    """Drop a repeated closing vertex if present (host-side, static)."""
    polygon = np.asarray(polygon, dtype=np.float64)
    if len(polygon) >= 2 and np.allclose(polygon[0], polygon[-1]):
        polygon = polygon[:-1]
    return polygon


def point_in_polygon(points: jnp.ndarray, polygon: np.ndarray) -> jnp.ndarray:
    """Ray-casting point-in-polygon test.

    Matches the reference's crossing rule (deepof/utils.py:1443-1476):
    an edge is crossed when ``min(y1,y2) < y <= max(y1,y2)`` and the point
    lies left of the intersection (or the edge is vertical at/right of x).

    Args:
        points: (..., 2) query points.
        polygon: (V, 2) static polygon vertices.

    Returns:
        (...) boolean, True = inside.
    """
    poly = _close_polygon(polygon)
    p1 = jnp.asarray(poly)
    p2 = jnp.asarray(np.roll(poly, -1, axis=0))

    x = points[..., 0:1]
    y = points[..., 1:2]
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]

    y_in_range = (y > jnp.minimum(y1, y2)) & (y <= jnp.maximum(y1, y2))
    x_ok = x <= jnp.maximum(x1, x2)
    dy = y2 - y1
    # Guard vertical edges; where y1 == y2 the branch is inactive anyway.
    xinters = jnp.where(dy != 0, (y - y1) * (x2 - x1) / jnp.where(dy == 0, 1.0, dy) + x1, x1)
    crosses = y_in_range & x_ok & ((x1 == x2) | (x <= xinters))
    return jnp.sum(crosses, axis=-1) % 2 == 1


def point_to_polygon_distance(points: jnp.ndarray, polygon: np.ndarray) -> jnp.ndarray:
    """Distance from each point to the polygon boundary (not signed).

    Matches deepof/utils.py:1494-1541 (get_point_polygon_distance_numba):
    min over edges of the point-to-segment distance; NaN points yield NaN.

    Args:
        points: (..., 2) query points.
        polygon: (V, 2) static polygon vertices.

    Returns:
        (...) distances.
    """
    poly = _close_polygon(polygon)
    a = jnp.asarray(poly)
    b = jnp.asarray(np.roll(poly, -1, axis=0))

    p = points[..., None, :]              # (..., 1, 2)
    av = a[None, :, :] if points.ndim > 1 else a
    bv = b[None, :, :] if points.ndim > 1 else b
    v = bv - av                            # (1, E, 2)
    w = p - av                             # (..., E, 2)

    c1 = jnp.sum(w * v, axis=-1)
    c2 = jnp.sum(v * v, axis=-1)
    t = jnp.clip(jnp.where(c2 > 0, c1 / jnp.where(c2 == 0, 1.0, c2), 0.0), 0.0, 1.0)
    proj = av + t[..., None] * v
    d2 = jnp.sum((p - proj) ** 2, axis=-1)
    dist = jnp.sqrt(jnp.min(d2, axis=-1))
    finite = jnp.all(jnp.isfinite(points), axis=-1)
    return jnp.where(finite, dist, jnp.nan)


def ellipse_to_polygon(
    center: np.ndarray, axes: np.ndarray, angle_deg: float, n_points: int = 100
) -> np.ndarray:
    """Rasterize an ellipse arena spec into a polygon (host-side).

    The reference stores circular arenas as (center, axes, angle) ellipses
    (deepof/arena_utils.py:85-97) and rasterizes them for geometry tests.
    """
    theta = np.linspace(0, 2 * np.pi, n_points, endpoint=False)
    ang = np.deg2rad(angle_deg)
    x = axes[0] * np.cos(theta)
    y = axes[1] * np.sin(theta)
    xr = x * np.cos(ang) - y * np.sin(ang) + center[0]
    yr = x * np.sin(ang) + y * np.cos(ang) + center[1]
    return np.stack([xr, yr], axis=1)


def shrink_polygon(polygon: np.ndarray, factor: float) -> np.ndarray:
    """Scale a polygon toward its centroid (host-side helper for inner-ROI
    construction, cf. deepof/arena_utils.py:1071)."""
    poly = _close_polygon(polygon)
    centroid = poly.mean(axis=0)
    return (poly - centroid) * factor + centroid
