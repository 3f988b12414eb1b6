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


def point_polygon_host(points: np.ndarray, polygon: np.ndarray):
    """Fused host (distance, inside) against a polygon — the supervised
    battery's hottest host op (arena climb/sniff bands over every frame).

    Uses the native C++ kernel when available (one O(T*E) scan, O(1)
    temporaries); falls back to the numpy twins, whose (T, E, 2) float64
    broadcast intermediates dominate at recording scale.
    """
    from deepof_tpu.native import native_point_polygon

    poly = _close_polygon(polygon)
    pts = np.asarray(points, dtype=np.float64)
    if pts.ndim == 2:
        out = native_point_polygon(pts, poly)
        if out is not None:
            return out
    return (
        point_to_polygon_distance_host(pts, poly),
        point_in_polygon_host(pts, poly),
    )


def point_in_polygon_host(points: np.ndarray, polygon: np.ndarray) -> np.ndarray:
    """Host numpy twin of :func:`point_in_polygon` (same crossing rule).

    The supervised rule battery runs on tiny (T,) series where a device
    round-trip per rule costs far more than the op; this twin keeps that
    path dispatch-free while the jitted version serves device pipelines.
    """
    poly = _close_polygon(polygon)
    p1 = poly
    p2 = np.roll(poly, -1, axis=0)

    points = np.asarray(points, dtype=np.float64)
    x = points[..., 0:1]
    y = points[..., 1:2]
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]

    y_in_range = (y > np.minimum(y1, y2)) & (y <= np.maximum(y1, y2))
    x_ok = x <= np.maximum(x1, x2)
    dy = y2 - y1
    with np.errstate(invalid="ignore", divide="ignore"):
        xinters = np.where(
            dy != 0, (y - y1) * (x2 - x1) / np.where(dy == 0, 1.0, dy) + x1, x1
        )
        crosses = y_in_range & x_ok & ((x1 == x2) | (x <= xinters))
    return np.sum(crosses, axis=-1) % 2 == 1


def point_to_polygon_distance_host(
    points: np.ndarray, polygon: np.ndarray
) -> np.ndarray:
    """Host numpy twin of :func:`point_to_polygon_distance`."""
    poly = _close_polygon(polygon)
    a = poly
    b = np.roll(poly, -1, axis=0)

    points = np.asarray(points, dtype=np.float64)
    p = points[..., None, :]              # (..., 1, 2)
    av = a[None, :, :] if points.ndim > 1 else a
    bv = b[None, :, :] if points.ndim > 1 else b
    v = bv - av                            # (1, E, 2)
    w = p - av                             # (..., E, 2)

    c1 = np.sum(w * v, axis=-1)
    c2 = np.sum(v * v, axis=-1)
    with np.errstate(invalid="ignore", divide="ignore"):
        t = np.clip(np.where(c2 > 0, c1 / np.where(c2 == 0, 1.0, c2), 0.0), 0.0, 1.0)
    proj = av + t[..., None] * v
    d2 = np.sum((p - proj) ** 2, axis=-1)
    with np.errstate(invalid="ignore"):
        dist = np.sqrt(np.min(d2, axis=-1))
    finite = np.all(np.isfinite(points), axis=-1)
    return np.where(finite, dist, np.nan)


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


# --------------------------------------------------------------------------- #
# Field-of-view cone vs ROI polygon
# --------------------------------------------------------------------------- #


def _orient(ax, ay, bx, by, cx, cy):
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _segments_intersect(a, b, c, d, eps=1e-10):
    """Vectorized proper+collinear segment intersection.

    a,b: (..., 2) first segment endpoints; c,d broadcastable second segment.
    """
    o1 = _orient(a[..., 0], a[..., 1], b[..., 0], b[..., 1], c[..., 0], c[..., 1])
    o2 = _orient(a[..., 0], a[..., 1], b[..., 0], b[..., 1], d[..., 0], d[..., 1])
    o3 = _orient(c[..., 0], c[..., 1], d[..., 0], d[..., 1], a[..., 0], a[..., 1])
    o4 = _orient(c[..., 0], c[..., 1], d[..., 0], d[..., 1], b[..., 0], b[..., 1])
    proper = (
        ((o1 > eps) & (o2 < -eps) | (o1 < -eps) & (o2 > eps))
        & ((o3 > eps) & (o4 < -eps) | (o3 < -eps) & (o4 > eps))
    )

    def on_seg(p, q, r):
        collinear = jnp.abs(
            _orient(p[..., 0], p[..., 1], q[..., 0], q[..., 1], r[..., 0], r[..., 1])
        ) <= eps
        within = (
            (r[..., 0] >= jnp.minimum(p[..., 0], q[..., 0]) - eps)
            & (r[..., 0] <= jnp.maximum(p[..., 0], q[..., 0]) + eps)
            & (r[..., 1] >= jnp.minimum(p[..., 1], q[..., 1]) - eps)
            & (r[..., 1] <= jnp.maximum(p[..., 1], q[..., 1]) + eps)
        )
        return collinear & within

    touch = on_seg(a, b, c) | on_seg(a, b, d) | on_seg(c, d, a) | on_seg(c, d, b)
    return proper | touch


def _point_in_triangle(p, a, b, c, eps=1e-10):
    """Same-side triangle membership, boundary included. p: (..., 2)."""
    abp = _orient(a[..., 0], a[..., 1], b[..., 0], b[..., 1], p[..., 0], p[..., 1])
    bcp = _orient(b[..., 0], b[..., 1], c[..., 0], c[..., 1], p[..., 0], p[..., 1])
    cap = _orient(c[..., 0], c[..., 1], a[..., 0], a[..., 1], p[..., 0], p[..., 1])
    has_neg = (abp < -eps) | (bcp < -eps) | (cap < -eps)
    has_pos = (abp > eps) | (bcp > eps) | (cap > eps)
    return ~(has_neg & has_pos)


def in_field_of_view(
    mouse_pts: jnp.ndarray,
    fov_angle_deg: float,
    roi_polygon: np.ndarray,
    eps: float = 1e-10,
) -> jnp.ndarray:
    """Per-frame test of whether the FOV cone intersects the ROI polygon.

    Vectorized XLA rebuild of in_field_of_view_numba
    (deepof/utils.py:1725-1870): the gaze direction is the ear-midpoint ->
    nose perpendicular; a triangle spanning the cone (reaching past the ROI
    bounding box) is intersected with the polygon by testing (a) cone
    vertices inside the polygon, (b) polygon vertices inside the triangle,
    (c) any edge-pair crossing.

    Args:
        mouse_pts: (N, 3, 2) = (left ear, nose, right ear) positions.
        fov_angle_deg: cone opening angle in degrees, (0, 180).
        roi_polygon: static (M, 2) polygon.

    Returns:
        (N,) float: 1.0 in-view, 0.0 not, NaN where inputs are invalid.
    """
    poly = _close_polygon(roi_polygon)
    poly_j = jnp.asarray(poly)
    n = mouse_pts.shape[0]
    nan_out = jnp.full(n, jnp.nan)
    if not (0.0 < fov_angle_deg < 180.0) or fov_angle_deg < 1e-6:
        return nan_out

    half = np.deg2rad(fov_angle_deg) * 0.5
    left = mouse_pts[:, 0]
    nose = mouse_pts[:, 1]
    right = mouse_pts[:, 2]
    finite = jnp.all(jnp.isfinite(mouse_pts), axis=(1, 2))

    apex = 0.5 * (left + right)
    ear = right - left
    ear_ok = jnp.sum(ear**2, axis=1) >= eps**2

    perp = jnp.stack([-ear[:, 1], ear[:, 0]], axis=1)
    flip = jnp.sum(perp * (nose - apex), axis=1) < 0.0
    perp = jnp.where(flip[:, None], -perp, perp)
    norm = jnp.linalg.norm(perp, axis=1, keepdims=True)
    fwd = perp / jnp.maximum(norm, eps)

    def rot(v, ang):
        c, s = np.cos(ang), np.sin(ang)
        return jnp.stack(
            [c * v[:, 0] - s * v[:, 1], s * v[:, 0] + c * v[:, 1]], axis=1
        )

    d1 = rot(fwd, +half)
    d2 = rot(fwd, -half)
    rays_ok = jnp.abs(d1[:, 0] * d2[:, 1] - d1[:, 1] * d2[:, 0]) >= 1e-12

    # Reach past the ROI bounding box from every apex.
    corners = np.array(
        [
            [poly[:, 0].min(), poly[:, 1].min()],
            [poly[:, 0].min(), poly[:, 1].max()],
            [poly[:, 0].max(), poly[:, 1].min()],
            [poly[:, 0].max(), poly[:, 1].max()],
        ]
    )
    d2max = jnp.max(
        jnp.sum((jnp.asarray(corners)[None] - apex[:, None]) ** 2, axis=-1), axis=1
    )
    r = (1.05 * jnp.sqrt(d2max) + 1e-6) / np.cos(half)

    a = apex
    b = apex + r[:, None] * d1
    c = apex + r[:, None] * d2
    tri_ok = jnp.abs(
        _orient(a[:, 0], a[:, 1], b[:, 0], b[:, 1], c[:, 0], c[:, 1])
    ) >= 1e-12

    # (a) cone vertices inside polygon.
    vert_in = (
        point_in_polygon(a, poly)
        | point_in_polygon(b, poly)
        | point_in_polygon(c, poly)
    )
    # (b) polygon vertices inside the triangle.
    pv = poly_j[None, :, :]                      # (1, M, 2)
    poly_in_tri = jnp.any(
        _point_in_triangle(pv, a[:, None], b[:, None], c[:, None], eps), axis=1
    )
    # (c) triangle edges vs polygon edges.
    p1 = poly_j[None, :, :]
    p2 = jnp.asarray(np.roll(poly, -1, axis=0))[None, :, :]
    edge_hits = (
        _segments_intersect(a[:, None], b[:, None], p1, p2, eps)
        | _segments_intersect(b[:, None], c[:, None], p1, p2, eps)
        | _segments_intersect(c[:, None], a[:, None], p1, p2, eps)
    )
    intersects = vert_in | poly_in_tri | jnp.any(edge_hits, axis=1)

    valid = finite & ear_ok & rays_ok & tri_ok
    return jnp.where(valid, intersects.astype(jnp.float32), jnp.nan)
