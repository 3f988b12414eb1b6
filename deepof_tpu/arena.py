"""Arena & ROI calibration: scaling, geometry fits, and detection.

Behavioral spec from deepof/arena_utils.py (studied, not copied):
  - ``scales[key] = [x_center_mm, y_center_mm, length_px, length_mm]``
    (arena_utils.py:79-84); arena params / ROIs are stored in mm and scaled
    back to px for display (arena_utils.py:435-486);
  - circular arenas are ellipses ``(center_xy, axes, angle)``; polygonal
    arenas are vertex arrays;
  - test mode substitutes fixed synthetic user inputs for every GUI path
    (arena_utils.py:253-287), which is how headless CI runs;
  - SAM-based autodetection (arena_utils.py:611-723) needs the
    segment-anything package; when absent we fall back to a pure-OpenCV
    contour detector over the median frame, which covers the common
    high-contrast open-field videos.

Interactive (GUI) annotation is host-side by nature and requires a display;
it is gated behind ``arena_params`` injection so pipelines stay headless.
"""

from __future__ import annotations

import math
import os
import warnings
from dataclasses import dataclass
from enum import Enum
from typing import Dict, List, Optional, Tuple

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


# --------------------------------------------------------------------------- #
# Geometry helpers
# --------------------------------------------------------------------------- #


def extract_corners_from_arena(
    arena_params: Tuple = None, num_points: int = 100,
    ellipse_params: Tuple = None, n_points: int = None,
) -> np.ndarray:
    """Polygon corners from arena parameters (arena_utils.py:1192-1230):
    polygonal arrays pass through; (center, axes, angle_deg) ellipses are
    rasterized into ``num_points`` vertices. ``ellipse_params``/
    ``n_points`` are the repo's historical names."""
    if arena_params is None:
        arena_params = ellipse_params
    if n_points is not None:
        num_points = n_points
    n_points = num_points
    # Disambiguation follows the reference (arena_utils.py:1215-1235):
    # lists and arrays are polygons; only a structurally-valid
    # ((cx, cy), (ax, ay), angle_deg) tuple is an ellipse — so a 3-vertex
    # polygon given as a list or tuple of points stays a polygon.
    def _is_ellipse_tuple(p):
        return (
            isinstance(p, tuple)
            and len(p) == 3
            and np.ndim(p[0]) == 1 and len(p[0]) == 2
            and np.ndim(p[1]) == 1 and len(p[1]) == 2
            and np.ndim(p[2]) == 0
        )

    if not _is_ellipse_tuple(arena_params):
        return np.asarray(arena_params, float)
    center, axes, angle = arena_params
    theta = np.linspace(0, 2 * np.pi, n_points, endpoint=False)
    ang = np.deg2rad(angle)
    x = axes[0] * np.cos(theta)
    y = axes[1] * np.sin(theta)
    xr = x * np.cos(ang) - y * np.sin(ang) + center[0]
    yr = x * np.sin(ang) + y * np.cos(ang) + center[1]
    return np.stack([xr, yr], axis=1)


def fit_ellipse_to_polygon(polygon, return_ellipse: bool = True):
    """Fit an ellipse to polygon vertices (cv2.fitEllipse; a minimum
    enclosing circle stands in for degenerate <5-vertex polygons, which
    cv2.fitEllipse rejects)."""
    pts = np.asarray(polygon, dtype=np.float32)
    if len(pts) < 5:
        (cx, cy), r = cv2.minEnclosingCircle(pts)
        ellipse = ((cx, cy), (r, r), 0.0)
        return ellipse if return_ellipse else extract_corners_from_arena(ellipse)
    (cx, cy), (w, h), angle = cv2.fitEllipse(pts)
    ellipse = ((cx, cy), (w / 2, h / 2), angle)
    if return_ellipse:
        return ellipse
    return extract_corners_from_arena(ellipse)


def simplify_polygon(polygon, n_points: int = None, relative_tolerance: float = 0.05, preserve_topology: bool = False):
    """Simplify a dense polygon.

    Without ``n_points``: cv2.approxPolyDP at a perimeter-relative
    tolerance. With ``n_points``: exactly that many vertices, picked by a
    fixed-count Douglas-Peucker-style farthest-point refinement (the
    reference simplifies the detected contour to ``len(arena_reference)``
    corners before side matching, arena_utils.py:335-336,487-560)."""
    pts = np.asarray(polygon, dtype=np.float32)
    if n_points is None:
        perimeter = cv2.arcLength(pts, True)
        eps = relative_tolerance * perimeter
        return cv2.approxPolyDP(pts, eps, True)[:, 0, :]
    m = len(pts)
    if m <= n_points:
        return pts.copy()
    # Seed with the two mutually farthest vertices, then greedily add the
    # vertex with the largest distance to the current corner polygon.
    d2 = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    i0, i1 = np.unravel_index(int(np.argmax(d2)), d2.shape)
    corners = sorted([int(i0), int(i1)])
    while len(corners) < n_points:
        best_gain, best_idx = -1.0, None
        for a_pos in range(len(corners)):
            a = corners[a_pos]
            b = corners[(a_pos + 1) % len(corners)]
            # candidate vertices strictly between corners a and b
            seg = (
                np.arange(a + 1, b)
                if b > a
                else np.concatenate([np.arange(a + 1, m), np.arange(0, b)])
            )
            if len(seg) == 0:
                continue
            pa, pb = pts[a], pts[b]
            ab = pb - pa
            denom = float(ab @ ab) or 1.0
            tt = np.clip(((pts[seg] - pa) @ ab) / denom, 0.0, 1.0)
            dist2 = ((pts[seg] - (pa + tt[:, None] * ab)) ** 2).sum(-1)
            k = int(np.argmax(dist2))
            if dist2[k] > best_gain:
                best_gain, best_idx = float(dist2[k]), int(seg[k])
        if best_idx is None:  # pragma: no cover - degenerate input
            break
        corners = sorted(corners + [best_idx])
    return pts[np.asarray(corners, int)]


def get_first_length(arena_corners, w_ratio: float = 1.0, h_ratio: float = 1.0) -> float:
    """Length of the first polygon edge, optionally anisotropically scaled
    (arena_utils.py:1028-1033)."""
    return math.dist(
        (arena_corners[0][0] * w_ratio, arena_corners[0][1] * h_ratio),
        (arena_corners[1][0] * w_ratio, arena_corners[1][1] * h_ratio),
    )


def closest_side(polygon, reference_side) -> list:
    """The polygon side most similar to a user-annotated reference side,
    scored by |Δlength| + |Δorientation| (the reference's matching rule,
    arena_utils.py:577-608) — the side the mm calibration is taken from
    for autodetected polygonal arenas (arena_utils.py:337-341).

    Deliberately reproduces the reference's scoring verbatim, including
    its direction sensitivity: the raw atan2 difference is not wrapped,
    so a reference side annotated in the opposite traversal direction
    carries a ~pi orientation penalty, exactly as upstream."""
    poly = np.asarray(polygon, float)
    (r0x, r0y), (r1x, r1y) = np.asarray(reference_side, float)[:2]
    ref_len = math.dist((r0x, r0y), (r1x, r1y))
    ref_ang = math.atan2(r1y - r0y, r1x - r0x)
    best, best_score = None, float("inf")
    for i in range(len(poly)):
        p1, p2 = poly[i], poly[(i + 1) % len(poly)]
        score = abs(math.dist(p1, p2) - ref_len) + abs(
            math.atan2(p2[1] - p1[1], p2[0] - p1[0]) - ref_ang
        )
        if score < best_score:
            best_score, best = score, [p1, p2]
    return best


# --------------------------------------------------------------------------- #
# mm <-> pixel scaling
# --------------------------------------------------------------------------- #


def scale_arenas_to_mm(arena_params: Dict, scales: Dict) -> Dict:
    out = {}
    for key, params in arena_params.items():
        ratio = scales[key][3] / scales[key][2]
        if isinstance(params, (np.ndarray, list)):
            out[key] = np.array(params) * ratio
        elif isinstance(params, tuple):
            out[key] = (
                tuple(np.array(params[0]) * ratio),
                tuple(np.array(params[1]) * ratio),
                params[2],
            )
        else:
            raise ValueError("Could not scale arena to mm!")
    return out


def scale_arenas_to_pixel(arena_params: Dict, scales: Dict) -> Dict:
    out = {}
    for key, params in arena_params.items():
        ratio = scales[key][2] / scales[key][3]
        if isinstance(params, np.ndarray):
            out[key] = np.round(np.array(params) * ratio).astype(int)
        elif isinstance(params, tuple):
            ellipse = (
                tuple((np.array(params[0]) * ratio).astype(int)),
                tuple((np.array(params[1]) * ratio).astype(int)),
                params[2],
            )
            out[key] = np.round(extract_corners_from_arena(ellipse)).astype(int)
        else:
            raise ValueError("Could not scale arena to pixel!")
    return out


def scale_rois_to_mm(roi_dicts: Dict, scales: Dict) -> Dict:
    return {
        key: {
            k: np.array(roi) * (scales[key][3] / scales[key][2])
            for k, roi in rois.items()
        }
        for key, rois in roi_dicts.items()
    }


def scale_rois_to_pixel(roi_dicts: Dict, scales: Dict) -> Dict:
    return {
        key: {
            k: np.round(np.array(roi) * (scales[key][2] / scales[key][3])).astype(int)
            for k, roi in rois.items()
        }
        for key, rois in roi_dicts.items()
    }


# --------------------------------------------------------------------------- #
# Automatic detection (video -> arena polygon)
# --------------------------------------------------------------------------- #


def median_frame(video_path: str, n_samples: int = 20) -> np.ndarray:
    """Median of uniformly sampled frames (robust background estimate).

    The reference medians 100 random frames before running SAM
    (arena_utils.py:611-650); for fixture-sized videos fewer suffice.
    """
    cap = cv2.VideoCapture(video_path)
    n_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    idx = np.linspace(0, max(n_frames - 1, 0), min(n_samples, max(n_frames, 1)), dtype=int)
    frames = []
    for i in idx:
        cap.set(cv2.CAP_PROP_POS_FRAMES, int(i))
        ok, frame = cap.read()
        if ok:
            frames.append(frame)
    cap.release()
    if not frames:
        raise ValueError(f"Could not read frames from {video_path}")
    return np.median(np.stack(frames), axis=0).astype(np.uint8)


def detect_arena_contour(
    frame: np.ndarray, arena_type: str
) -> Tuple[np.ndarray, Optional[Tuple]]:
    """Detect the arena as the largest high-contrast contour.

    Pure-OpenCV fallback for when segment-anything is unavailable.
    Returns (polygon_px, ellipse_or_None).
    """
    gray = cv2.cvtColor(frame, cv2.COLOR_BGR2GRAY) if frame.ndim == 3 else frame
    blur = cv2.GaussianBlur(gray, (7, 7), 0)
    _, thresh = cv2.threshold(blur, 0, 255, cv2.THRESH_BINARY + cv2.THRESH_OTSU)
    # Try both polarities; keep the largest contour that is not the full frame.
    best = None
    hh, ww = gray.shape[:2]
    area_frame = hh * ww
    for img in (thresh, 255 - thresh):
        contours, _ = cv2.findContours(img, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
        for c in contours:
            a = cv2.contourArea(c)
            if not 0.05 * area_frame < a < 0.98 * area_frame:
                continue
            # The background region always touches the frame border; the
            # arena almost never does. Penalize border-touching contours so
            # an interior arena beats a larger background blob.
            x0, y0, cw, chh = cv2.boundingRect(c)
            touches = x0 <= 0 or y0 <= 0 or x0 + cw >= ww or y0 + chh >= hh
            score = a * (0.25 if touches else 1.0)
            if best is None or score > best[0]:
                best = (score, c)
    best = best[1] if best is not None else None
    if best is None:  # pragma: no cover
        h, w = gray.shape
        poly = np.array([[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]])
        return poly, None

    poly = best[:, 0, :].astype(float)
    if "circular" in arena_type:
        ellipse = fit_ellipse_to_polygon(poly)
        return extract_corners_from_arena(ellipse), ellipse
    return simplify_polygon(poly), None


def mask_to_arena_params(mask: np.ndarray, arena_type: str):
    """Fit arena parameters to a binary segmentation mask.

    The offline-testable core of SAM autodetection (reference
    arena_utils.py:1036-1068 ``arena_parameter_extraction``): largest
    contour of the mask, then an ellipse fit for circular arenas or a
    simplified vertex polygon for polygonal ones.

    Returns ``(polygon_px, ellipse_or_None)`` in the same convention as
    :func:`detect_arena_contour`.
    """
    m = (np.asarray(mask) > 0).astype(np.uint8) * 255
    contours, _ = cv2.findContours(m, cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE)
    if not contours:
        raise ValueError("Segmentation mask is empty; cannot fit an arena.")
    cnt = max(contours, key=cv2.contourArea)[:, 0, :].astype(float)
    if "circular" in arena_type:
        ellipse = fit_ellipse_to_polygon(cnt)
        return extract_corners_from_arena(ellipse), ellipse
    return simplify_polygon(cnt), None


def _inset_polygon(poly: np.ndarray, d: float) -> np.ndarray:
    """Offset a simple polygon inward by d: shift each edge along its
    inward normal and re-intersect adjacent edge lines."""
    p = np.asarray(poly, float)
    # ensure counter-clockwise so the left normal points inward
    if 0.5 * (np.dot(p[:, 0], np.roll(p[:, 1], -1)) - np.dot(p[:, 1], np.roll(p[:, 0], -1))) < 0:
        p = p[::-1]
    n = len(p)
    a, b = p, np.roll(p, -1, axis=0)
    e = b - a
    ln = np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)
    normal = np.stack([-e[:, 1], e[:, 0]], axis=1) / ln  # left normal (inward, CCW)
    a_off, b_off = a + d * normal, b + d * normal
    out = []
    for i in range(n):
        j = (i - 1) % n
        # intersect offset line j with offset line i
        p1, d1 = a_off[j], b_off[j] - a_off[j]
        p2, d2 = a_off[i], b_off[i] - a_off[i]
        denom = d1[0] * d2[1] - d1[1] * d2[0]
        if abs(denom) < 1e-12:
            out.append(a_off[i])
            continue
        t = ((p2[0] - p1[0]) * d2[1] - (p2[1] - p1[1]) * d2[0]) / denom
        out.append(p1 + t * d1)
    return np.asarray(out)


def create_inner_polygon(
    outer_vertices,
    target_area_ratio: float = 0.7,
    tolerance: float = 0.01,
    max_iterations: int = 100,
    return_inner: bool = True,
):
    """Inner polygon covering ~``target_area_ratio`` of the outer area
    (arena_utils.py:1071-1190), found by binary search over an inward edge
    offset — reimplemented without shapely (inward normal offsets with
    adjacent-line re-intersection stand in for ``Polygon.buffer``). With
    ``return_inner=False``, returns the ring as the outer vertices
    followed by the reversed inner vertices (the standard hole-polygon
    vertex representation)."""
    outer = np.asarray(outer_vertices, float)
    if target_area_ratio == 0.0:
        return outer_vertices if not return_inner else np.array([])
    outer_area = _polygon_area(outer)
    target = outer_area * float(target_area_ratio)
    span = max(np.ptp(outer[:, 0]), np.ptp(outer[:, 1]))
    lo, hi = 0.0, span / 2
    best = outer.copy()
    for _ in range(max_iterations):
        d = (lo + hi) / 2
        inner = _inset_polygon(outer, d)
        area = _polygon_area(inner)
        # a too-large offset flips the polygon inside out; treat as zero
        if not np.all(np.isfinite(inner)) or area > outer_area:
            area = 0.0
        ratio = area / outer_area
        if abs(ratio - target_area_ratio) <= tolerance:
            best = inner
            break
        if area > target:
            best = inner
            lo = d
        else:
            hi = d
    if return_inner:
        return best
    return np.vstack([outer, best[::-1], outer[:1]])


def _polygon_area(poly: np.ndarray) -> float:
    """Shoelace area of a polygon given as an (N, 2) vertex array."""
    p = np.asarray(poly, dtype=float)
    x, y = p[:, 0], p[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1)))


def select_mask_by_reference(
    masks: np.ndarray,
    scores: np.ndarray,
    arena_type: str,
    arena_reference: Optional[np.ndarray] = None,
):
    """Pick one of SAM's multimask proposals and fit the arena to it.

    Mirrors arena_utils.py:700-723: with a user-annotated reference arena,
    choose the proposal whose fitted arena area is closest to the
    reference's; otherwise take the highest-scoring mask.
    """
    if arena_reference is None:
        best = int(np.argmax(scores))
        return mask_to_arena_params(masks[best], arena_type)
    ref_area = _polygon_area(arena_reference)
    fits, deltas = [], []
    for m in masks:
        try:
            poly, ellipse = mask_to_arena_params(m, arena_type)
        except ValueError:
            continue
        fits.append((poly, ellipse))
        deltas.append(abs(_polygon_area(poly) - ref_area))
    if not fits:
        raise ValueError("No SAM mask proposal contained a fittable arena.")
    return fits[int(np.argmin(deltas))]


def _detect_with_sam(
    frame: np.ndarray,
    segmentation_model,
    arena_type: str,
    arena_reference: Optional[np.ndarray] = None,
):
    """SAM arena detection: centre-point prompt on the median frame, then
    reference-guided proposal selection (requires segment-anything)."""
    predictor = segmentation_model
    predictor.set_image(frame)
    h, w = frame.shape[:2]
    masks, scores, _ = predictor.predict(
        point_coords=np.array([[w // 2, h // 2]]),
        point_labels=np.array([1]),
        multimask_output=True,
    )
    return select_mask_by_reference(masks, scores, arena_type, arena_reference)


# --------------------------------------------------------------------------- #
# Reference-named entry points (migration layer)
# --------------------------------------------------------------------------- #


def get_random_frame(video_path: str) -> np.ndarray:
    """One uniformly random frame of a video (arena_utils.py:848-856)."""
    cap = cv2.VideoCapture(video_path)
    total = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    cap.set(cv2.CAP_PROP_POS_FRAMES, int(np.random.choice(max(total, 1))))
    _, frame = cap.read()
    cap.release()
    return frame


def arena_parameter_extraction(frame: np.ndarray, arena_type: str):
    """Fit arena parameters to a binary mask frame
    (arena_utils.py:1036-1068): ``(center, axes, angle)`` for circular
    arenas, an (N, 2) vertex array for polygonal ones."""
    poly, ellipse = mask_to_arena_params(frame, arena_type)
    return ellipse if "circular" in arena_type else poly


def automatically_recognize_arena(
    videos: dict,
    vid_key: str,
    path: str = ".",
    arena_type: str = "circular-autodetect",
    arena_reference=None,
    segmentation_model=None,
    num_sample_frames: int = 100,
):
    """Detect the arena from the median of sampled video frames
    (arena_utils.py:611-723). With a segmentation predictor (SAM or a
    backend registered via :func:`set_segmentation_predictor`) the
    reference's prompt-and-select flow runs; otherwise the pure-OpenCV
    contour fallback is used.

    Returns ``(arena, h, w)`` — ``(center, axes, angle)`` for circular
    arenas, vertex array for polygonal ones.
    """
    video_path = os.path.join(path, videos[vid_key]) if isinstance(
        videos, dict
    ) else os.path.join(path, vid_key)
    frame = median_frame(video_path, n_samples=num_sample_frames)
    h, w = frame.shape[:2]
    if segmentation_model is None:
        segmentation_model = _maybe_load_sam(None)
    if segmentation_model is not None:
        poly, ellipse = _detect_with_sam(
            frame, segmentation_model, arena_type,
            None if arena_reference is None else np.asarray(arena_reference),
        )
    else:
        poly, ellipse = detect_arena_contour(frame, arena_type)
    arena = ellipse if "circular" in arena_type and ellipse is not None else poly
    return arena, h, w


def _arena_image_export_path(coordinates) -> Optional[str]:
    """<project>/<name>/Arena_detection, where detection snapshots land
    (reference arena_utils.py:131-137); None when no project context."""
    ppath = getattr(
        coordinates, "project_path", getattr(coordinates, "_project_path", None)
    )
    pname = getattr(
        coordinates, "project_name", getattr(coordinates, "_project_name", None)
    )
    if not ppath or not pname:
        return None
    path = os.path.join(ppath, pname, "Arena_detection")
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:  # pragma: no cover - unwritable project dir
        return None
    return path


def save_arena_image(
    numpy_im, roi, image_export_path, name, arena_reference=None, color=None
):
    """Save one annotated arena/ROI frame (arena_utils.py:725-790):
    the detected ellipse or polygon outline, a translucent fill for
    colored ROIs, and — when ``arena_reference`` is given — circles on
    the endpoints of the side the mm scale was taken from (the scale
    overlay at arena_utils.py:768-780)."""
    frame = np.ascontiguousarray(np.asarray(numpy_im), dtype=np.uint8)
    add_overlay = color is not None
    draw_color = color if color is not None else (40, 86, 236)

    if isinstance(roi, tuple):  # circular: (center, axes, angle)
        cv2.ellipse(
            frame,
            center=tuple(map(int, roi[0])),
            axes=tuple(map(int, roi[1])),
            angle=float(roi[2]),
            startAngle=0.0,
            endAngle=360.0,
            color=draw_color,
            thickness=3,
        )
    else:  # polygonal: (N, 2) vertices
        pts = np.asarray(roi, float).astype(int)
        cv2.polylines(frame, [pts], isClosed=True, color=draw_color, thickness=3)
        if add_overlay:
            overlay = frame.copy()
            cv2.fillPoly(overlay, [pts.reshape(-1, 1, 2)], draw_color)
            cv2.addWeighted(overlay, 0.3, frame, 0.7, 0, frame)
        if arena_reference is not None:
            for point in closest_side(
                simplify_polygon(pts), np.asarray(arena_reference, float)[:2]
            ):
                cv2.circle(
                    frame, tuple(map(int, point)), radius=10,
                    color=(40, 86, 236), thickness=2,
                )
    out = os.path.join(image_export_path, f"{name}.png")
    cv2.imwrite(out, frame)
    return out


# --------------------------------------------------------------------------- #
# Operator annotation surface (reference arena_utils.py:791-1560)
# --------------------------------------------------------------------------- #


def display_message(message: List[str], duration_ms: int = 2500) -> None:
    """Show a multi-line notice to the operator (arena_utils.py:791-846).
    Headless environments (no display) get it on stdout."""
    try:  # pragma: no cover - needs a display
        canvas = np.full((60 + 30 * len(message), 640, 3), 30, np.uint8)
        for i, line in enumerate(message):
            cv2.putText(
                canvas, str(line), (20, 40 + 30 * i),
                cv2.FONT_HERSHEY_SIMPLEX, 0.6, (255, 255, 255), 1,
            )
        cv2.imshow("deepof_tpu", canvas)
        cv2.waitKey(duration_ms)
        cv2.destroyWindow("deepof_tpu")
    except Exception:
        print("\n".join(map(str, message)))


def confirm_action(prompt: str = None, responder=None, message: str = None, window_name: str = "deepof") -> bool:
    """Yes/no confirmation (arena_utils.py GUI confirm_action). A
    ``responder(prompt) -> bool`` makes it scriptable; without one, the
    operator answers y/n on the terminal. ``message``/``window_name`` are
    the reference's GUI kwarg names."""
    prompt = prompt if prompt is not None else (message or "confirm?")
    if responder is not None:
        return bool(responder(prompt))
    ans = input(f"{prompt} [y/n] ")  # pragma: no cover - interactive
    return ans.strip().lower().startswith("y")  # pragma: no cover


class Arena_GUI_exit_flag(Enum):
    """Arena-GUI navigation outcomes (arena_utils.py:41-46): how the
    operator left the per-video annotation dialog. The headless provider
    flow here always completes a video (NEXT); the other states exist for
    reference-compatible navigation code."""

    UNKNOWN = 1
    PREVIOUS = 2
    NEXT = 3
    PROPAGATE = 4
    UNOPENED = 5


@dataclass
class DropdownConfig:
    """Rendering parameters of the reference's OpenCV dropdown
    (arena_utils.py:1339-1351); kept for signature compatibility — the
    terminal selector below has no pixels to style."""

    margin_right: int = 10
    margin_top: int = 10
    width: int = 60
    height: int = 25
    option_height: int = 25
    font_scale: float = 0.5
    font_thickness: int = 1
    border_color: Tuple[int, int, int] = (100, 100, 100)
    fill_color: Tuple[int, int, int] = (200, 200, 200)
    text_color: Tuple[int, int, int] = (0, 0, 0)
    main_box_color: Tuple[int, int, int] = (220, 220, 220)


class DropdownUI:
    """Minimal option selector (counterpart of the reference's OpenCV
    DropdownUI): renders numbered options and returns the chosen one.
    ``chooser(options) -> index`` makes it scriptable."""

    def __init__(
        self, options: List[str] = None, title: str = "Select an option",
        window_name: str = None, window_width: int = None,
        hidden: bool = False, config: DropdownConfig = None,
    ):
        self.options = list(options or [])
        self.title = window_name or title
        self.config = config or DropdownConfig()
        self.hidden = hidden

    def select(self, chooser=None) -> str:
        if chooser is not None:
            return self.options[int(chooser(self.options))]
        print(self.title)  # pragma: no cover - interactive
        for i, opt in enumerate(self.options):  # pragma: no cover
            print(f"  [{i}] {opt}")  # pragma: no cover
        return self.options[int(input("> "))]  # pragma: no cover


def retrieve_corners_from_image(
    frame: np.ndarray, arena_type: str, key: str = "", point_provider=None
) -> np.ndarray:
    """Collect arena corner annotations on one frame
    (arena_utils.py:1353-1456): polygon vertices (polygonal) or perimeter
    points (circular). Injectable provider for headless runs; the OpenCV
    click collector otherwise."""
    provider = point_provider or _collect_points_gui
    corners = np.asarray(provider(frame, key, "arena"), float)
    assert corners.ndim == 2 and corners.shape[0] >= 3, (
        "arena annotation needs at least 3 points"
    )
    return corners


def extract_polygonal_arena_coordinates(
    video_path_full: str,
    arena_type: str,
    video_index: int = 0,
    videos: Dict[str, str] = None,
    arena_dims: float = 1.0,
    image_export_path: str = None,
    point_provider=None,
    key_current: str = "",
):
    """Annotate one video's arena + scale (the per-video core of the
    reference's GUI loop, arena_utils.py:860-1000, without the
    next/previous/propagate navigation): returns
    ``(arena_corners, arena_dist_px, h, w)`` where ``arena_dist_px`` is
    the pixel length of the first drawn side — the side the operator is
    told corresponds to ``arena_dims`` mm (arena_utils.py:146-152)."""
    frame = median_frame(video_path_full)
    h, w = frame.shape[:2]
    corners = retrieve_corners_from_image(
        frame, arena_type, key_current, point_provider
    )
    arena_dist = get_first_length(corners)
    if image_export_path:
        save_arena_image(
            frame, corners, image_export_path,
            f"{key_current or video_index}_arena",
        )
    return corners, arena_dist, h, w


# --------------------------------------------------------------------------- #
# Main entry point
# --------------------------------------------------------------------------- #

# Fixed synthetic user inputs substituted in test mode, matching the
# reference's headless-CI fixtures (arena_utils.py:253-287).
_TEST_POLY_SCALES = {"test2": [279.5, 213.5, 420.12, 380], "test": [279.5, 213.5, 420.12, 380]}
_TEST_POLY_ARENAS = {
    "test2": np.array([(108, 30), (539, 29), (533, 438), (104, 431)]),
    "test": np.array([(108, 30), (323, 29), (539, 29), (533, 434), (323, 434), (104, 431)]),
}
_TEST_POLY_RES = {"test2": (480, 640), "test": (480, 640)}
_TEST_POLY_ROIS = {
    1: ((106, 230), (533, 230), (533, 438), (104, 431)),
    2: ((106, 230), (323, 230), (323, 438), (104, 431)),
}
_TEST_CIRC_SCALES = {"test2": [300.0, 38.0, 252.0, 380], "test": [300.0, 38.0, 252.0, 380]}
_TEST_CIRC_ELLIPSE = ((200, 195), (166, 169), 13.54)
_TEST_CIRC_RES = {"test2": (404, 416), "test": (404, 416)}
_TEST_CIRC_ROIS = {
    1: ((145, 130), (145, 255), (260, 255), (260, 130)),
    2: ((145, 190), (145, 255), (260, 255), (260, 190)),
}


def get_arenas(
    coordinates,
    arena: str,
    arena_dims: float,
    number_of_rois: int,
    segmentation_model_path: Optional[str],
    video_path: str,
    videos: Dict[str, str] = None,
    test: bool = False,
    roi_dicts: Dict = None,
    arena_params: Dict = None,
    scales: Dict = None,
    point_provider=None,
    arena_reference=None,
):
    """Arena calibration for every video.

    ``arena_reference`` (polygonal-autodetect only) is the user-annotated
    reference polygon whose FIRST SIDE spans the known ``arena_dims`` mm:
    each detected contour is simplified to ``len(arena_reference)``
    vertices and calibrated off the side closest to that reference side
    (reference flow: arena_utils.py:335-341,577-608). Without it the
    first side of the simplified detection is used — correct only for
    regular polygons. When a ``point_provider`` is given and no reference
    is passed, the provider is asked once (purpose "arena_reference") on
    the first video, mirroring the reference's first-video GUI annotation
    (arena_utils.py:296-326).

    Returns (scales, arena_params_mm, roi_dicts_mm, video_resolution).
    """
    if arena_params is not None and scales is not None:
        # Editing path: parameters already known; store in mm.
        arena_params_mm = scale_arenas_to_mm(
            scale_arenas_to_pixel(arena_params, scales), scales
        )
        roi_mm = scale_rois_to_mm(roi_dicts, scales) if roi_dicts else {}
        resolutions = {k: None for k in scales}
        return scales, arena_params_mm, roi_mm, resolutions

    if test:
        if "polygonal" in arena:
            scales = dict(_TEST_POLY_SCALES)
            arena_params = {k: v.copy() for k, v in _TEST_POLY_ARENAS.items()}
            video_resolution = dict(_TEST_POLY_RES)
            roi_dicts = {"test": dict(_TEST_POLY_ROIS), "test2": dict(_TEST_POLY_ROIS)}
        else:
            scales = dict(_TEST_CIRC_SCALES)
            arena_params = {
                "test2": extract_corners_from_arena(_TEST_CIRC_ELLIPSE),
                "test": _TEST_CIRC_ELLIPSE,
            }
            video_resolution = dict(_TEST_CIRC_RES)
            roi_dicts = {"test": dict(_TEST_CIRC_ROIS), "test2": dict(_TEST_CIRC_ROIS)}
        arena_params = scale_arenas_to_mm(arena_params, scales)
        roi_dicts = scale_rois_to_mm(roi_dicts, scales)
        return scales, arena_params, roi_dicts, video_resolution

    if arena is None or not arena:
        return None, None, None, None

    if "autodetect" in arena:
        scales, arena_params, video_resolution = {}, {}, {}
        roi_dicts = {}
        segmentation_model = _maybe_load_sam(segmentation_model_path, download=True)
        keys = list((videos or {}).keys())
        if (
            "polygonal" in arena
            and arena_reference is None
            and point_provider is not None
            and keys
        ):
            first = median_frame(os.path.join(video_path, videos[keys[0]]))
            arena_reference = point_provider(first, keys[0], "arena_reference")
        if arena_reference is not None:
            arena_reference = np.asarray(arena_reference, float)
        image_export_path = _arena_image_export_path(coordinates)
        for key, vid in (videos or {}).items():
            frame = median_frame(os.path.join(video_path, vid))
            h, w = frame.shape[:2]
            video_resolution[key] = (h, w)
            if segmentation_model is not None:
                poly, ellipse = _detect_with_sam(
                    frame, segmentation_model, arena, arena_reference
                )
            else:
                poly, ellipse = detect_arena_contour(frame, arena)

            if "circular" in arena and ellipse is not None:
                length_px = 2 * float(np.mean(ellipse[1]))
                center_px = np.array(ellipse[0])
                arena_params[key] = ellipse
            elif arena_reference is not None and "polygonal" in arena:
                # Reference-matched calibration (arena_utils.py:335-341):
                # simplify to the annotated vertex count and take the mm
                # scale off the side closest to the user's reference side
                # — NOT off an arbitrary first side.
                poly = simplify_polygon(
                    np.asarray(poly), n_points=len(arena_reference)
                )
                side = closest_side(poly, arena_reference[:2])
                length_px = math.dist(*side)
                center_px = np.mean(np.asarray(poly), axis=0)
                arena_params[key] = np.asarray(poly)
            else:
                length_px = get_first_length(poly)
                center_px = np.mean(np.asarray(poly), axis=0)
                arena_params[key] = np.asarray(poly)
            if image_export_path:
                try:
                    save_arena_image(
                        frame, arena_params[key], image_export_path,
                        f"{key}_arena", arena_reference=arena_reference,
                    )
                except Exception:  # pragma: no cover - diagnostics only
                    pass
            ratio = arena_dims / length_px
            scales[key] = [
                float(center_px[0] * ratio),
                float(center_px[1] * ratio),
                float(length_px),
                float(arena_dims),
            ]
            roi_dicts[key] = {}
        arena_params = scale_arenas_to_mm(arena_params, scales)
        roi_dicts = scale_rois_to_mm(roi_dicts, scales)
        return scales, arena_params, roi_dicts, video_resolution

    if "manual" in arena:
        return annotate_arenas_manual(
            arena, arena_dims, number_of_rois, video_path, videos or {},
            point_provider=point_provider,
        )

    raise ValueError(
        f"Unknown arena type {arena!r}: expected circular/polygonal "
        "-autodetect or -manual, or provide arena_params/scales directly."
    )


def annotate_arenas_manual(
    arena: str,
    arena_dims: float,
    number_of_rois: int,
    video_path: str,
    videos: Dict[str, str],
    point_provider=None,
):
    """Manual arena + ROI annotation (spec: deepof/arena_utils.py:160-238).

    The reference collects clicks through an OpenCV GUI; here point
    collection is injectable so the same flow runs headless (notebooks,
    scripts, tests):

        point_provider(frame, key, purpose) -> (P, 2) pixel points

    with purpose one of "arena" (polygon corners / ellipse perimeter
    points), "distance" (two points spanning a known ``arena_dims`` mm
    length), or "roi_<i>". Without a provider, the interactive OpenCV
    click collector is used (requires a display).

    Returns (scales, arena_params_mm, roi_dicts_mm, video_resolution) —
    scales[key] = [x_center_mm, y_center_mm, length_px, length_mm] with
    length_px the user-drawn calibration distance, mirroring the
    reference's manual-scale layout (arena_utils.py:204-216).
    """
    provider = point_provider or _collect_points_gui
    scales, arena_params, roi_dicts, video_resolution = {}, {}, {}, {}
    for key, vid in videos.items():
        try:
            frame = median_frame(os.path.join(video_path, vid))
        except ValueError:
            if point_provider is None:
                raise
            # Unreadable video (e.g. git-lfs stub): programmatic providers
            # may not need pixels — hand them a placeholder frame.
            frame = np.zeros((480, 640, 3), np.uint8)
        h, w = frame.shape[:2]
        video_resolution[key] = (h, w)

        corners = np.asarray(provider(frame, key, "arena"), float)
        assert corners.ndim == 2 and corners.shape[0] >= 3, (
            "arena annotation needs at least 3 points"
        )
        dist_pts = np.asarray(provider(frame, key, "distance"), float)
        assert dist_pts.shape == (2, 2), (
            "distance annotation needs exactly 2 points"
        )
        length_px = float(np.linalg.norm(dist_pts[1] - dist_pts[0]))
        assert length_px > 0, "calibration points must be distinct"

        # Scale center: for circular arenas, from the ellipse fitted to the
        # clicked perimeter points; else the polygon centroid.
        if "circular" in arena:
            scale_ref = extract_corners_from_arena(
                fit_ellipse_to_polygon(corners)
            )
        else:
            scale_ref = corners
        center_px = np.mean(np.asarray(scale_ref, float), axis=0)
        ratio = arena_dims / length_px
        scales[key] = [
            float(center_px[0] * ratio),
            float(center_px[1] * ratio),
            length_px,
            float(arena_dims),
        ]
        arena_params[key] = corners
        roi_dicts[key] = {
            i: np.asarray(provider(frame, key, f"roi_{i}"), float)
            for i in range(1, int(number_of_rois) + 1)
        }
    arena_params = scale_arenas_to_mm(arena_params, scales)
    roi_dicts = scale_rois_to_mm(roi_dicts, scales)
    return scales, arena_params, roi_dicts, video_resolution


def _collect_points_gui(frame: np.ndarray, key: str, purpose: str):  # pragma: no cover
    """Interactive OpenCV click collector (display required): left-click
    adds a point, right-click/backspace removes the last, Enter confirms
    (the reference's GUI interaction model, arena_utils.py:1353-1560)."""
    points = []
    window = f"deepof_tpu: {key} - click {purpose}, Enter to confirm"

    def on_mouse(event, x, y, flags, param):
        if event == cv2.EVENT_LBUTTONDOWN:
            points.append((x, y))
        elif event == cv2.EVENT_RBUTTONDOWN and points:
            points.pop()

    cv2.namedWindow(window)
    cv2.setMouseCallback(window, on_mouse)
    while True:
        canvas = frame.copy()
        for p in points:
            cv2.circle(canvas, tuple(map(int, p)), 4, (0, 255, 0), -1)
        if len(points) > 1:
            cv2.polylines(
                canvas, [np.asarray(points, np.int32)], False, (0, 255, 0), 2
            )
        cv2.imshow(window, canvas)
        key_code = cv2.waitKey(30) & 0xFF
        if key_code in (13, 10):  # Enter
            break
        if key_code == 8 and points:  # Backspace
            points.pop()
    cv2.destroyWindow(window)
    return np.asarray(points, float)


# Where the reference hosts its SAM vit_h checkpoint (utils.py:3743-3780,
# arena_utils.py:289-293) and where it caches it relative to the package.
SAM_CHECKPOINT_URL = "https://datashare.mpcdf.mpg.de/s/GccLGXXZmw34f8o/download"
SAM_CHECKPOINT_RELPATH = os.path.join(
    "trained_models", "arena_segmentation", "sam_vit_h_4b8939.pth"
)


def resolve_segmentation_checkpoint(
    segmentation_model_path: Optional[str],
    download: bool = True,
    fetcher=None,
) -> Optional[str]:
    """Resolve (and, on miss, download) the SAM checkpoint path.

    Mirrors the reference's ``load_precompiled_model`` checkpoint handling
    (utils.py:3743-3780): when no path is given, default to the package
    cache location; when the file is absent and ``download`` is on, stream
    it from the reference's public URL.  ``fetcher(url, dest_path)`` is
    injectable so tests (and air-gapped deploys) can supply the bytes
    without network access.  Returns the existing path, or None when it
    could not be materialized.
    """
    if segmentation_model_path is None:
        segmentation_model_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), SAM_CHECKPOINT_RELPATH
        )
    if os.path.exists(segmentation_model_path):
        return segmentation_model_path
    if not download:
        return None
    os.makedirs(os.path.dirname(segmentation_model_path) or ".", exist_ok=True)
    try:
        if fetcher is not None:
            fetcher(SAM_CHECKPOINT_URL, segmentation_model_path)
        else:  # pragma: no cover - needs network
            import urllib.request

            print("Arena segmentation model not found. Downloading...")
            tmp = segmentation_model_path + ".part"
            urllib.request.urlretrieve(SAM_CHECKPOINT_URL, tmp)
            os.replace(tmp, segmentation_model_path)
    except Exception as exc:
        warnings.warn(
            f"Could not download the SAM checkpoint ({exc}); falling back "
            "to contrast-based arena detection."
        )
        return None
    return segmentation_model_path if os.path.exists(segmentation_model_path) else None


# Pluggable segmentation backend: any object with SAM's predictor
# protocol (set_image(frame); predict(point_coords, point_labels,
# multimask_output) -> (masks, scores, logits)) can drive the automatic
# arena-detection flow — an alternative SAM variant, a lighter model, or
# the stub that exercises the flow in CI (reference counterpart:
# arena_utils.py:611-723, which hard-requires segment-anything ViT-H).
_SEGMENTATION_PREDICTOR_FACTORY = None


def set_segmentation_predictor(factory) -> None:
    """Register ``factory() -> predictor`` as the segmentation backend
    used by ``*-autodetect`` arenas, in place of segment-anything ViT-H.
    Pass None to restore the default (segment-anything when importable,
    else OpenCV contour detection)."""
    global _SEGMENTATION_PREDICTOR_FACTORY
    _SEGMENTATION_PREDICTOR_FACTORY = factory


def _maybe_load_sam(segmentation_model_path: Optional[str], download: bool = False):
    """Load a SAM predictor when segment-anything is importable; else None."""
    if _SEGMENTATION_PREDICTOR_FACTORY is not None:
        return _SEGMENTATION_PREDICTOR_FACTORY()
    try:  # pragma: no cover
        from segment_anything import SamPredictor, sam_model_registry
    except ImportError:
        return None
    path = resolve_segmentation_checkpoint(  # pragma: no cover
        segmentation_model_path, download=download
    )
    if path is None:  # pragma: no cover
        return None
    sam = sam_model_registry["vit_h"](checkpoint=path)  # pragma: no cover
    sam.to(device="cpu")  # pragma: no cover
    return SamPredictor(sam)  # pragma: no cover
