"""Supervised annotation engine: rule-based behavior tagging.

Behavioral spec: deepof/annotation_utils.py (studied, not copied) — the
DeepOF_behavior framework (:131), geometry detectors close_single_contact /
close_double_contact (:434,469), climb_arena / sniff_object (:554,631),
immobility + window-neighbor augmentation (:739,817), stationary_lookaround
/ detect_activity / sniff_around (:900-1230), following_path (:1250), and
the supervised_tagging orchestration (:1370-1700).

Design notes (TPU-first / dependency divergences):
  - Arena-band tests (climb / sniff) use exact signed distances to the
    arena polygon (ops.geometry) instead of shapely polygon buffering —
    equivalent up to shapely's rounded buffer corners.
  - The immobility classifier: the reference downloads a pre-trained
    sklearn pickle (deepof/data.py:3079-3084), unavailable offline. The
    default here is a packaged trained MLP over the same windowed kinematic
    features (PretrainedImmobilityClassifier, trained by
    scripts/train_immobility_classifier.py against the behavior's published
    definition); any sklearn-compatible estimator can be passed via
    ``immobility_estimator`` for exact parity with the reference pickle.
  - All frame-parallel geometry runs through the jittable ops kernels.
"""

from __future__ import annotations

import os
import warnings
from dataclasses import dataclass, field, replace
from enum import Enum, auto
from itertools import combinations, cycle
import re
from typing import Any, Callable, Dict, List, Mapping, Optional, Tuple, Union

import numpy as np
import pandas as pd

from deepof_tpu.config import (
    ASYMMETRIC_BEHAVIORS,
    CONTINUOUS_BEHAVIORS,
    CUSTOM_BEHAVIOR_COLOR_MAP,
    SINGLE_BEHAVIORS,
    SYMMETRIC_BEHAVIORS,
)
from deepof_tpu.core.storage import get_dt, save_dt
from deepof_tpu.core.table_dict import TableDict
# The rule battery operates on tiny per-experiment 1-D series; every op
# below has a host numpy twin that is bit-identical to its jitted sibling
# (pinned by tests/test_ops.py) and avoids a device dispatch + fetch round
# trip per rule — which on a real TPU costs orders of magnitude more than
# the op itself. Device pipelines keep using the jitted versions.
from deepof_tpu.ops.bouts import (
    _binary_median_host,
    _filter_short_host,
    multi_step_paired_smoothing_host,
)
from deepof_tpu.ops.geometry import ellipse_to_polygon, point_polygon_host


# --------------------------------------------------------------------------- #
# Framework
# --------------------------------------------------------------------------- #


class Behavior_scope(Enum):
    INDIVIDUAL = auto()
    PAIR_DIRECTIONAL = auto()
    PAIR_NONDIRECTIONAL = auto()


class Behavior_output(Enum):
    BINARY = auto()
    CONTINUOUS = auto()


@dataclass
class BehaviorContext:
    """All per-experiment tables a behavior rule may consume."""

    key: str
    animal_ids: List[str]
    frame_rate: float
    arena_type: Any
    arena_params: Any
    roi_dict: dict

    raw_coords: pd.DataFrame
    coords: pd.DataFrame
    dists: pd.DataFrame
    angles: pd.DataFrame
    speeds: pd.DataFrame
    likelihoods: pd.DataFrame
    full_features: Any

    params: Dict[str, Any]
    run_numba: bool = False
    extra: Dict[str, Any] = field(default_factory=dict)

    def prefix(self, animal_id: str) -> str:
        return f"{animal_id}_" if animal_id else ""

    def bp(self, animal_id: str, bodypart: str) -> str:
        return f"{animal_id}_{bodypart}" if animal_id else bodypart


def postprocess_median_filtering(y, ctx: BehaviorContext, behavior_output=None) -> np.ndarray:
    y = np.nan_to_num(np.asarray(y), nan=0.0).astype(bool)
    out = _binary_median_host(y, int(ctx.params["median_filter_width"]))
    return out.astype(float)


def postprocess_following(y, ctx: BehaviorContext, animal_ids) -> np.ndarray:
    y = postprocess_median_filtering(y, ctx, Behavior_output.BINARY).astype(bool)
    y = _filter_short_host(y, int(ctx.params["min_follow_frames"]))
    return y.astype(float)


def postprocess_identity(y, ctx: BehaviorContext, animal_ids) -> np.ndarray:
    return np.asarray(y, dtype=float)


@dataclass(frozen=True)
class DeepOF_behavior:
    """A named behavior rule with scope, output type, compute + postprocess."""

    name: str
    scope: Behavior_scope
    output_type: Behavior_output
    compute: Callable
    unit: Optional[str] = "a.u."
    postprocess: Optional[Callable] = None
    requires: Tuple[str, ...] = ()
    order: int = 0
    color: Optional[str] = None

    def set_color(self, color: Optional[str]) -> "DeepOF_behavior":
        return replace(self, color=color)

    def column_name(self, ctx: BehaviorContext, animal_ids) -> str:
        if self.scope is Behavior_scope.INDIVIDUAL:
            return f"{ctx.prefix(animal_ids)}{self.name}"
        a, b = animal_ids
        return f"{a}_{b}_{self.name}"

    def annotate_behavior(self, ctx: BehaviorContext, animal_ids):
        res = self.compute(ctx, animal_ids)
        if isinstance(res, Mapping):
            out = {}
            for subkey, arr in res.items():
                y = np.asarray(arr)
                if self.postprocess is not None:
                    y = self.postprocess(y, ctx, animal_ids)
                out[subkey] = y
            return out
        y = np.asarray(res)
        if self.postprocess is not None:
            return np.asarray(self.postprocess(y, ctx, animal_ids))
        return postprocess_median_filtering(y, ctx, self.output_type)


# --------------------------------------------------------------------------- #
# Geometry detectors
# --------------------------------------------------------------------------- #


def close_single_contact(pos_dframe: pd.DataFrame, left: str, right=None, tol: float = None) -> np.ndarray:
    """True where ||left - right|| < tol; right may be a list (any-of)."""
    pos = pos_dframe
    if isinstance(right, str):
        return np.linalg.norm(pos[left].to_numpy(float) - pos[right].to_numpy(float), axis=1) < tol
    return np.any(
        [
            np.linalg.norm(pos[left].to_numpy(float) - pos[r].to_numpy(float), axis=1) < tol
            for r in right
        ],
        axis=0,
    )


def close_double_contact(
    pos_dframe: pd.DataFrame, left1: str, left2: str, right1: str, right2: str,
    rel_tol: float, rev: bool = False,
) -> np.ndarray:
    """True where both endpoint pairs are within tol (side-by-side tests)."""
    pos = pos_dframe
    tol = rel_tol

    def d(a, b):
        return np.linalg.norm(pos[a].to_numpy(float) - pos[b].to_numpy(float), axis=1)

    if rev:
        return (d(right1, left2) < tol) & (d(right2, left1) < tol)
    return (d(right1, left1) < tol) & (d(right2, left2) < tol)


def _arena_polygon(arena) -> np.ndarray:
    """Arena spec -> polygon vertex array (ellipses rasterized)."""
    if isinstance(arena, tuple):
        return ellipse_to_polygon(
            np.asarray(arena[0], float), np.asarray(arena[1], float), float(arena[2])
        )
    return np.asarray(arena, float)


def _signed_distance_to_arena(points: np.ndarray, arena) -> np.ndarray:
    """Signed distance to the arena boundary: positive outside."""
    poly = _arena_polygon(arena)
    pts = np.asarray(points, dtype=np.float64)
    dist, inside = point_polygon_host(pts, poly)
    return np.where(inside, -dist, dist)


def climb_arena(
    arena_type: str, arena, pos_dict: pd.DataFrame, rel_tol: float, id: str,
    mouse_len: float = 50, centered_data: bool = False, run_numba: bool = False,
) -> np.ndarray:
    """True when the nose is more than mouse_len * rel_tol outside the wall."""
    nose = pos_dict[id + "Nose"].interpolate(limit_direction="both")
    tol = mouse_len * rel_tol
    if isinstance(arena, tuple) and centered_data:
        arena = (np.zeros(2), arena[1], arena[2])
    signed = _signed_distance_to_arena(nose.to_numpy(float), arena)
    climbing = np.array(signed > tol)
    climbing[~np.isfinite(signed)] = False
    return climbing


def sniff_object(
    speed_dframe: pd.DataFrame, arena, pos_dict: pd.DataFrame, tol: float,
    tol_speed: float, nose: str, center_name: str = "Center",
    centered_data: bool = False, s_object: str = "arena", animal_id: str = "",
    run_numba: bool = False,
) -> np.ndarray:
    """True when the nose is within +-tol of the arena wall and the body is
    slow."""
    if s_object != "arena":
        raise NotImplementedError("Only arena sniffing is supported.")
    nose_pos = pos_dict[nose].to_numpy(float)
    if animal_id:
        animal_id += "_"
    if isinstance(arena, tuple) and centered_data:
        arena = (np.zeros(2), arena[1], arena[2])
    signed = _signed_distance_to_arena(nose_pos, arena)
    nosing = np.array(np.abs(signed) <= tol)
    nosing[~np.isfinite(signed)] = False
    slow = (speed_dframe[animal_id + center_name] < tol_speed).to_numpy()
    return nosing & slow


def following_path(
    distance_dframe: pd.DataFrame, position_dframe: pd.DataFrame,
    speed_dframe: pd.DataFrame, follower: str, followed: str,
    frames: int = 20, tol: float = 0, tol_speed: float = 0,
) -> np.ndarray:
    """True when follower's nose tracks the path followed's tail walked over
    the last ``frames`` frames, with nose->tail orientation."""
    tail = position_dframe[followed + "_Tail_base"].to_numpy(float)
    nose = position_dframe[follower + "_Nose"].to_numpy(float)
    t = len(tail)
    dists = np.full((t, frames), np.nan)
    for i in range(frames):
        if i == 0:
            diff = nose - tail
        else:
            diff = nose[i:] - tail[:-i]
            diff = np.concatenate([np.full((i, 2), np.nan), diff], axis=0)
        dists[:, i] = np.linalg.norm(diff, axis=1)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", category=RuntimeWarning)
        min_dist = np.nanmin(dists, axis=1)

    def col(a, b):
        return tuple(sorted((a, b)))

    nose_tail = distance_dframe[col(follower + "_Nose", followed + "_Tail_base")].to_numpy(float)
    right1 = nose_tail < distance_dframe[
        col(follower + "_Tail_base", followed + "_Tail_base")
    ].to_numpy(float)
    right2 = nose_tail < distance_dframe[
        col(follower + "_Nose", followed + "_Nose")
    ].to_numpy(float)
    follow = (min_dist < tol) & right1 & right2
    speed = (speed_dframe[follower + "_Nose"] > tol_speed).to_numpy()
    return follow & speed


def calculate_close_range(df: pd.DataFrame, mouse_id: str, bodypart: str, threshold: float):
    """True where the target bodypart is close to ANY other animal's part."""
    target = f"{mouse_id}{bodypart}"
    cols = []
    for col in df.columns:
        p1, p2 = col
        if p1 == target or p2 == target:
            other = p2 if p1 == target else p1
            if mouse_id not in other:
                cols.append(col)
    if not cols:
        return np.zeros(len(df), dtype=int)
    return (df[cols] < threshold).any(axis=1).astype(int).to_numpy()


# --------------------------------------------------------------------------- #
# Activity detectors
# --------------------------------------------------------------------------- #


def _smoothed_immobility(speed: np.ndarray, tol: float, min_length: int) -> np.ndarray:
    # Host path: the series are tiny 1-D signals, and np.convolve matches the
    # reference's moving_average float semantics exactly (utils.py:3504-3517).
    imm = np.convolve((speed <= tol).astype(float), np.ones(min_length) / min_length, mode="same") > 0
    return _filter_short_host(imm, min_length)


def stationary_lookaround(
    speed_dframe, dist_dframe, likelihood_dframe, mouse_identity, close_range,
    tol_speed, tol_likelihood, min_length, animal_id="",
) -> np.ndarray:
    """Standing still (Tail_base slow) while actively moving the nose with
    the head up (ear-nose distances above 0.9x their medians) and the rear
    body inactive (spec: deepof/annotation_utils.py:992-1096)."""
    if animal_id:
        animal_id += "_"
    speed_dframe = speed_dframe.copy()
    nan_pos = speed_dframe[speed_dframe[animal_id + "Tail_base"].isnull()].index
    speed_dframe.interpolate(method="linear", inplace=True)
    immobile = _smoothed_immobility(
        speed_dframe[animal_id + "Tail_base"].to_numpy(float), tol_speed * 2, min_length
    )
    nose_activity = (
        (speed_dframe[animal_id + "Nose"].to_numpy(float) > tol_speed)
        & (likelihood_dframe[animal_id + "Nose"].to_numpy(float) > tol_likelihood)
    )
    bparts = [animal_id + "Left_bhip", animal_id + "Right_bhip"]
    if all(bp in speed_dframe.columns for bp in bparts):
        body_inactivity = np.all(
            [
                (speed_dframe[bp].to_numpy(float) <= tol_speed * 2)
                & (likelihood_dframe[bp].to_numpy(float) > tol_likelihood)
                for bp in bparts
            ],
            axis=0,
        )
    else:
        body_inactivity = np.ones(len(speed_dframe), dtype=bool)

    def ear_dist(ear):
        c1 = (f"{mouse_identity}{ear}", f"{mouse_identity}Nose")
        c2 = (f"{mouse_identity}Nose", f"{mouse_identity}{ear}")
        col = c1 if c1 in dist_dframe.columns else c2 if c2 in dist_dframe.columns else None
        if col is None:
            return np.ones(len(dist_dframe), dtype=bool)
        arr = dist_dframe[col].to_numpy(float)
        return arr > 0.9 * np.nanmedian(arr)

    head_up = ear_dist("Left_ear") & ear_dist("Right_ear")
    active = immobile & nose_activity & body_inactivity & head_up & ~close_range.astype(bool)
    inactive = immobile & ~(nose_activity & body_inactivity & head_up & ~close_range.astype(bool))
    out = multi_step_paired_smoothing_host(active, inactive, immobile, min_length)
    pos_idx = speed_dframe.index.get_indexer(nan_pos)
    out[pos_idx[pos_idx >= 0]] = False
    return out


def rotate(origin, point, ang):
    """Rotate (x, y) around a pivot — the reference's climb/sniff helper
    (annotation_utils.py:521-537). Returns (qx, qy)."""
    ox, oy = origin
    px, py = point
    qx = ox + np.cos(ang) * (px - ox) - np.sin(ang) * (py - oy)
    qy = oy + np.sin(ang) * (px - ox) + np.cos(ang) * (py - oy)
    return qx, qy


def outside_ellipse(x, y, e_center, e_axes, e_angle, threshold=0.0):
    """True where (x, y) lies outside the (possibly threshold-inflated)
    ellipse — the reference's climb/sniff helper
    (annotation_utils.py:540-552). Vectorized over x/y arrays."""
    x, y = rotate(e_center, (x, y), np.radians(e_angle))
    term_x = (x - e_center[0]) ** 2 / max(e_axes[0] + threshold, 1e-12) ** 2
    term_y = (y - e_center[1]) ** 2 / max(e_axes[1] + threshold, 1e-12) ** 2
    return term_x + term_y > 1


def digging(
    speed_dframe, dist_dframe, likelihood_dframe, mouse_identity, close_range,
    tol_speed, tol_likelihood, min_length, center_name="Center", animal_id="",
) -> np.ndarray:
    """The reference's EXPERIMENTAL digging detector
    (annotation_utils.py:874-987; public but its only call site is
    commented out upstream): look-around-style stationary activity
    centered on ``center_name``, gated on ear-nose distances BELOW 0.9x
    their medians (head-down posture). Faithful to the upstream body,
    including that rear-body inactivity is computed but unused; missing
    ear columns default to True (upstream would crash on them — dead-code
    quality preserved charitably)."""
    if animal_id:
        animal_id += "_"
    speed_dframe = speed_dframe.copy()
    nan_pos = speed_dframe[speed_dframe[animal_id + center_name].isnull()].index
    speed_dframe.interpolate(method="linear", inplace=True)
    immobile = _smoothed_immobility(
        speed_dframe[animal_id + center_name].to_numpy(float),
        tol_speed * 2, min_length,
    )
    nose_activity = (
        (speed_dframe[animal_id + "Nose"].to_numpy(float) > tol_speed)
        & (likelihood_dframe[animal_id + "Nose"].to_numpy(float) > tol_likelihood)
    )

    def ear_close(ear):
        c1 = (f"{mouse_identity}{ear}", f"{mouse_identity}Nose")
        c2 = (f"{mouse_identity}Nose", f"{mouse_identity}{ear}")
        col = c1 if c1 in dist_dframe.columns else c2 if c2 in dist_dframe.columns else None
        if col is None:
            return np.ones(len(dist_dframe), dtype=bool)
        arr = dist_dframe[col].to_numpy(float)
        return arr < 0.9 * np.nanmedian(arr)

    head_down = ear_close("Left_ear") & ear_close("Right_ear")
    core = nose_activity & head_down & ~close_range.astype(bool)
    out = multi_step_paired_smoothing_host(
        immobile & core, immobile & ~core, immobile, min_length
    )
    pos_idx = speed_dframe.index.get_indexer(nan_pos)
    out[pos_idx[pos_idx >= 0]] = False
    return out


def detect_activity(
    speed_dframe, likelihood_dframe, tol_speed, tol_likelihood, min_length,
    center_name="Center", animal_id="",
):
    """(stationary_active, stationary_passive, moving) triple."""
    if animal_id:
        animal_id += "_"
    speed_dframe = speed_dframe.copy()
    nan_pos = speed_dframe[speed_dframe[animal_id + center_name].isnull()].index
    speed_dframe.interpolate(method="linear", inplace=True)
    immobile = _smoothed_immobility(
        speed_dframe[animal_id + center_name].to_numpy(float), tol_speed, min_length
    )
    bodyparts = [
        animal_id + bp
        for bp in ("Nose", "Left_fhip", "Right_fhip", "Left_bhip", "Right_bhip")
        if animal_id + bp in speed_dframe.columns
    ]
    activity = np.any(
        [
            (speed_dframe[bp].to_numpy(float) > tol_speed)
            & (likelihood_dframe[bp].to_numpy(float) > tol_likelihood)
            for bp in bodyparts
        ],
        axis=0,
    )
    stat_active = immobile & activity
    stat_passive = immobile & ~activity
    stat_active, stat_passive = multi_step_paired_smoothing_host(
        stat_active, stat_passive, immobile, min_length, get_both=True
    )
    moving = ~(stat_active | stat_passive)
    idx = speed_dframe.index.get_indexer(nan_pos)
    idx = idx[idx >= 0]
    stat_active[idx] = False
    stat_passive[idx] = False
    moving[idx] = False
    return stat_active, stat_passive, moving


def sniff_around(
    speed_dframe, likelihood_dframe, tol_speed, tol_likelihood,
    center_name="Center", animal_id="",
):
    """Slow body + fast, confidently-tracked nose."""
    if animal_id:
        animal_id += "_"
    slow = speed_dframe[animal_id + center_name].to_numpy(float) < tol_speed
    nose_fast = speed_dframe[animal_id + "Nose"].to_numpy(float) > tol_speed
    nose_sure = likelihood_dframe[animal_id + "Nose"].to_numpy(float) > tol_likelihood
    return slow & nose_fast & nose_sure


def rearing(
    pos_dframe, speed_dframe, likelihood_dframe=None, rearing_tol=None,
    tol_likelihood=None, tol_speed=None, animal_id="",
):
    """Nose close to tail base (top view) while the tail base is slow.
    ``likelihood_dframe``/``tol_likelihood`` match the reference signature
    (annotation_utils.py:1215-1222); its own likelihood gate is commented
    out upstream (:1242), so they are accepted and unused here too."""
    if animal_id:
        animal_id += "_"
    close = (
        np.linalg.norm(
            pos_dframe[animal_id + "Nose"].to_numpy(float)
            - pos_dframe[animal_id + "Tail_base"].to_numpy(float),
            axis=1,
        )
        < rearing_tol
    )
    slow_tail = speed_dframe[animal_id + "Tail_base"].to_numpy(float) < tol_speed
    return close & slow_tail


# --------------------------------------------------------------------------- #
# Immobility
# --------------------------------------------------------------------------- #

IMMOBILITY_FEATURES_DISTS = [
    ("Right_bhip", "Spine_2"), ("Spine_2", "Tail_base"), ("Left_bhip", "Spine_2"),
    ("Center", "Spine_2"), ("Left_ear", "Nose"), ("Nose", "Right_ear"),
    ("Center", "Right_fhip"), ("Center", "Left_fhip"), ("Center", "Spine_1"),
    ("Right_ear", "Spine_1"), ("Left_ear", "Spine_1"),
]
IMMOBILITY_FEATURES_AREAS = ["head_area", "torso_area", "back_area", "full_area"]
IMMOBILITY_FEATURES_SPEEDS = [
    "Center", "Left_bhip", "Left_ear", "Left_fhip", "Nose", "Right_bhip",
    "Right_ear", "Right_fhip", "Spine_1", "Spine_2", "Tail_base",
]


def augment_with_neighbors(X_huddle: pd.DataFrame, window: int = 5, step: int = 1, window_out: int = 11):
    """Lead/lag window means per feature; keeps only speed-based outputs
    (deepof/annotation_utils.py:817-870).

    Vectorized: one NaN-propagating (skipna=False) windowed mean over a
    (T, n_shifts, F) shift tensor replaces the per-column pandas
    shift/concat/mean cascade. Only columns whose augmented names survive
    the final "speed" filter are computed at all — the dropped distance /
    area augmentations were dead work.
    """
    cols = [c for c in X_huddle.columns if "speed" in f"{c}_0"]
    l = 2 * window + 1
    b = l / window_out
    ranges = [(round(i * b), round((i + 1) * b)) for i in range(window_out)]

    x = X_huddle[cols].to_numpy(dtype=np.float64)  # (T, F)
    t, f = x.shape
    # shifts ordered as the reference builds them: leads window*step..step,
    # self, lags step..window*step — i.e. x shifted by -window*step..window*step.
    offsets = list(range(-window * step, window * step + 1, step))
    block = np.full((t, len(offsets), f), np.nan)
    for j, off in enumerate(offsets):
        if off < 0:
            block[: t + off, j] = x[-off:]
        elif off > 0:
            block[off:, j] = x[: t - off]
        else:
            block[:, j] = x

    feats = {}
    for k in range(window_out):
        s, e = ranges[k]
        if e > s:
            seg = block[:, s:e].mean(axis=1)  # NaN-propagating, like skipna=False
        else:  # empty sub-window: pandas yields NaN silently
            seg = np.full((t, f), np.nan)
        for ci, col in enumerate(cols):
            feats[f"{col}_{k - window_out // 2}"] = seg[:, ci]

    # Reference column order is per-column-major (all k for col 0, then col 1).
    ordered = [f"{col}_{k - window_out // 2}" for col in cols for k in range(window_out)]
    return pd.DataFrame(feats, index=X_huddle.index)[ordered]


class RuleBasedImmobilityEstimator:
    """Fallback immobility classifier: windowed mean z-scored speed below a
    fixed margin. Kept as the asset-free fallback; the default is the
    packaged trained classifier (PretrainedImmobilityClassifier)."""

    def __init__(self, speed_threshold: float = 20.0):
        self.speed_threshold = speed_threshold

    def predict(self, X_huddle: np.ndarray) -> np.ndarray:
        # X_huddle is standardized; raw sign information survives: immobile frames
        # have below-average windowed speeds across features.
        return (np.nanmean(X_huddle, axis=1) < -0.3).astype(float)


def _default_immobility_estimator():
    """Packaged trained classifier when its asset exists, else the rule."""
    if os.path.exists(PretrainedImmobilityClassifier._ASSET):
        return PretrainedImmobilityClassifier()
    return RuleBasedImmobilityEstimator()  # pragma: no cover


class PretrainedImmobilityClassifier:
    """Packaged immobility classifier (the default estimator).

    A 121->32->1 MLP over the annotation pipeline's windowed z-scored speed
    features, trained by scripts/train_immobility_classifier.py against the
    behavior's published definition (the reference's own pre-trained
    pipeline, deepof/data.py:3079-3084, is download-only and unavailable
    offline — documented divergence). Before the forward pass, each feature
    column is shifted by its 1st percentile, anchoring "zero speed" at ~0
    so predictions are invariant to the recording's immobility base rate.
    """

    _ASSET = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "assets",
        "immobility_classifier.npz",
    )

    def __init__(self, weights_path: str = None):
        self._path = weights_path or self._ASSET
        self._weights = None

    def _load(self):
        if self._weights is None:
            with np.load(self._path) as z:
                self._weights = {k: z[k] for k in ("w0", "b0", "w1", "b1")}
        return self._weights

    def predict(self, x: np.ndarray) -> np.ndarray:
        w = self._load()
        x = np.asarray(x, np.float32)
        x = x - np.nanpercentile(x, 1, axis=0)
        h = np.maximum(x @ w["w0"] + w["b0"], 0.0)
        logits = (h @ w["w1"] + w["b1"]).ravel()
        return (logits > 0).astype(float)


def immobility(
    X_huddle: pd.DataFrame,
    huddle_estimator,
    animal_id: str = "",
    median_filter_width: int = 11,
    min_immobility: int = 25,
    max_immobility: int = 3000,
):
    """Classifier-based immobility with window-neighbor augmentation."""
    from sklearn.preprocessing import StandardScaler

    required = (
        [f"('{animal_id}{a}', '{animal_id}{b}')_raw" for a, b in IMMOBILITY_FEATURES_DISTS]
        + [f"{animal_id}{a}_raw" for a in IMMOBILITY_FEATURES_AREAS]
        + [f"{animal_id}{bp}_speed" for bp in IMMOBILITY_FEATURES_SPEEDS]
    )
    try:
        x = X_huddle[required]
    except KeyError:
        warnings.warn(
            "Skipping immobility annotation: not all required body parts are "
            "present (needs deepof_11 or deepof_14 labelling)."
        )
        n = X_huddle.shape[0]
        return np.full(n, np.nan), np.full(n, np.nan)

    x = augment_with_neighbors(x)
    mask = np.isnan(x).mean(axis=1) > 0.1
    y = huddle_estimator.predict(
        StandardScaler().fit_transform(np.nan_to_num(x))
    ).astype(float)
    y[np.asarray(mask)] = False
    y = _binary_median_host(y.astype(bool), median_filter_width)
    y = _filter_short_host(y, min_immobility)
    return y, y


# --------------------------------------------------------------------------- #
# compute_* rule wrappers
# --------------------------------------------------------------------------- #


def compute_nose2nose(ctx, mice_pair):
    a, b = mice_pair
    return close_single_contact(
        ctx.raw_coords, ctx.bp(a, "Nose"), ctx.bp(b, "Nose"),
        float(ctx.params["close_contact_tol"]),
    )


def compute_sidebyside(ctx, mice_pair):
    a, b = mice_pair
    return close_double_contact(
        ctx.raw_coords, ctx.bp(a, "Nose"), ctx.bp(a, "Tail_base"),
        ctx.bp(b, "Nose"), ctx.bp(b, "Tail_base"),
        rel_tol=float(ctx.params["side_contact_tol"]), rev=False,
    )


def compute_sidereside(ctx, mice_pair):
    a, b = mice_pair
    return close_double_contact(
        ctx.raw_coords, ctx.bp(a, "Nose"), ctx.bp(a, "Tail_base"),
        ctx.bp(b, "Nose"), ctx.bp(b, "Tail_base"),
        rel_tol=float(ctx.params["side_contact_tol"]), rev=True,
    )


def compute_nose2tail(ctx, mice_pair):
    a, b = mice_pair
    return close_single_contact(
        ctx.raw_coords, ctx.bp(a, "Nose"), ctx.bp(b, "Tail_base"),
        float(ctx.params["close_contact_tol"]),
    )


def compute_nose2body(ctx, mice_pair):
    a, b = mice_pair
    body_cols = [ctx.bp(b, bp) for bp in ctx.extra["main_body"]]
    return close_single_contact(
        ctx.raw_coords, ctx.bp(a, "Nose"), body_cols,
        float(ctx.params["close_contact_tol"]),
    )


def compute_following(ctx, mice_pair):
    a, b = mice_pair
    return following_path(
        ctx.dists, ctx.raw_coords, ctx.speeds, follower=a, followed=b,
        frames=int(ctx.params["follow_frames"]),
        tol=float(ctx.params["follow_tol"]),
        tol_speed=float(ctx.params["stationary_threshold"]),
    )


def compute_climb_arena(ctx, animal_id):
    prefix = ctx.prefix(animal_id)
    mouse_len = ctx.extra.get("mouse_lens", {}).get(prefix, 50)
    return climb_arena(
        arena_type=ctx.arena_type, arena=ctx.arena_params,
        pos_dict=ctx.raw_coords, rel_tol=float(ctx.params["climb_tol"]),
        id=prefix, mouse_len=mouse_len,
    )


def compute_sniff_arena(ctx, animal_id):
    return sniff_object(
        speed_dframe=ctx.speeds, arena=ctx.arena_params, pos_dict=ctx.raw_coords,
        tol=float(ctx.params["sniff_arena_tol"]),
        tol_speed=float(ctx.params["stationary_threshold"]),
        nose=ctx.bp(animal_id, "Nose"), animal_id=animal_id,
    )


def compute_immobility(ctx, animal_id):
    est = ctx.extra["immobility_estimator"] or _default_immobility_estimator()
    features = ctx.full_features[animal_id] if animal_id else ctx.full_features
    x = get_dt(features, ctx.key)
    y, _ = immobility(
        x, est, animal_id=ctx.prefix(animal_id),
        median_filter_width=int(ctx.params["median_filter_width"]),
        min_immobility=int(ctx.params["min_immobility"]),
    )
    return y


def compute_stat_lookaround(ctx, animal_id):
    if len(ctx.animal_ids) > 1:
        close_range = calculate_close_range(
            ctx.dists, ctx.prefix(animal_id), "Nose",
            float(ctx.params["side_contact_tol"]),
        )
    else:
        close_range = np.zeros(len(ctx.dists), dtype=int)
    return stationary_lookaround(
        ctx.speeds, ctx.dists, ctx.likelihoods, ctx.prefix(animal_id), close_range,
        tol_speed=float(ctx.params["stationary_threshold"]),
        tol_likelihood=float(ctx.params["nose_likelihood"]),
        min_length=int(ctx.params["min_follow_frames"]),
        animal_id=animal_id,
    )


def compute_detect_activity(ctx, animal_id):
    stat_a, stat_p, mov = detect_activity(
        ctx.speeds, ctx.likelihoods,
        tol_speed=float(ctx.params["stationary_threshold"]),
        tol_likelihood=float(ctx.params["nose_likelihood"]),
        min_length=int(ctx.params["min_follow_frames"]),
        animal_id=animal_id,
    )
    return {"stat-active": stat_a, "stat-passive": stat_p, "moving": mov}


def compute_sniffing(ctx, animal_id):
    return sniff_around(
        ctx.speeds, ctx.likelihoods,
        tol_speed=float(ctx.params["stationary_threshold"]),
        tol_likelihood=float(ctx.params["nose_likelihood"]),
        animal_id=animal_id,
    )


def compute_rearing(ctx, animal_id):
    return rearing(
        ctx.raw_coords, ctx.speeds,
        rearing_tol=float(ctx.params.get("rearing_tol", 50)),
        tol_speed=float(ctx.params["stationary_threshold"]),
        animal_id=animal_id,
    )


def compute_continuous_measures(ctx, aid):
    bparts = [
        "Center", "Spine_1", "Spine_2", "Nose", "Left_ear", "Right_ear",
        "Left_fhip", "Right_fhip", "Left_bhip", "Right_bhip", "Tail_base",
    ]
    cols = [ctx.bp(aid, bp) for bp in bparts if ctx.bp(aid, bp) in ctx.speeds.columns]
    n = len(ctx.speeds)
    if not cols:
        nan = np.full(n, np.nan)
        return {"distance": nan, "cum-distance": nan, "speed": nan}
    arr = ctx.speeds[cols].to_numpy(float)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", category=RuntimeWarning)
        avg_speed = np.nanmedian(arr[1:], axis=1)
    avg_speed = np.insert(avg_speed, 0, np.nan)
    avg_distance = avg_speed / float(ctx.frame_rate)
    return {
        "distance": avg_distance,
        "cum-distance": np.cumsum(np.nan_to_num(avg_distance)),
        "speed": avg_speed,
    }


# --------------------------------------------------------------------------- #
# Built-in behavior catalog
# --------------------------------------------------------------------------- #


def default_behaviors() -> Dict[str, DeepOF_behavior]:
    """The built-in rule catalog (annotation_utils.py:1444-1554)."""
    return {
        "nose2nose": DeepOF_behavior(
            "nose2nose", Behavior_scope.PAIR_DIRECTIONAL, Behavior_output.BINARY,
            compute_nose2nose, requires=("raw_coords",),
        ),
        "sidebyside": DeepOF_behavior(
            "sidebyside", Behavior_scope.PAIR_DIRECTIONAL, Behavior_output.BINARY,
            compute_sidebyside, requires=("raw_coords",),
        ),
        "sidereside": DeepOF_behavior(
            "sidereside", Behavior_scope.PAIR_DIRECTIONAL, Behavior_output.BINARY,
            compute_sidereside, requires=("raw_coords",),
        ),
        "nose2tail": DeepOF_behavior(
            "nose2tail", Behavior_scope.PAIR_DIRECTIONAL, Behavior_output.BINARY,
            compute_nose2tail, requires=("raw_coords",),
        ),
        "nose2body": DeepOF_behavior(
            "nose2body", Behavior_scope.PAIR_DIRECTIONAL, Behavior_output.BINARY,
            compute_nose2body, requires=("raw_coords",),
        ),
        "following": DeepOF_behavior(
            "following", Behavior_scope.PAIR_DIRECTIONAL, Behavior_output.BINARY,
            compute_following, postprocess=postprocess_following,
            requires=("dists", "raw_coords", "speeds"),
        ),
        "climb-arena": DeepOF_behavior(
            "climb-arena", Behavior_scope.INDIVIDUAL, Behavior_output.BINARY,
            compute_climb_arena, requires=("raw_coords",),
        ),
        "sniff-arena": DeepOF_behavior(
            "sniff-arena", Behavior_scope.INDIVIDUAL, Behavior_output.BINARY,
            compute_sniff_arena, requires=("raw_coords", "speeds"),
        ),
        "immobility": DeepOF_behavior(
            "immobility", Behavior_scope.INDIVIDUAL, Behavior_output.BINARY,
            compute_immobility, postprocess=postprocess_identity,
        ),
        "stat-lookaround": DeepOF_behavior(
            "stat-lookaround", Behavior_scope.INDIVIDUAL, Behavior_output.BINARY,
            compute_stat_lookaround, postprocess=postprocess_identity,
        ),
        "detect_activity": DeepOF_behavior(
            "detect_activity", Behavior_scope.INDIVIDUAL, Behavior_output.BINARY,
            compute_detect_activity, postprocess=postprocess_identity,
        ),
        "sniffing": DeepOF_behavior(
            "sniffing", Behavior_scope.INDIVIDUAL, Behavior_output.BINARY,
            compute_sniffing, postprocess=postprocess_identity,
        ),
        "continuous": DeepOF_behavior(
            "continuous", Behavior_scope.INDIVIDUAL, Behavior_output.CONTINUOUS,
            compute_continuous_measures, postprocess=postprocess_identity,
        ),
    }


def validate_custom_behaviors(custom_behaviors=None, custom_behavior_inputs=None):
    """Name/scope validation of user extension behaviors
    (annotation_utils.py:1736-1770)."""
    if not custom_behaviors:
        return None
    if not isinstance(custom_behaviors, list) or not isinstance(
        custom_behaviors[0], DeepOF_behavior
    ):
        raise ValueError(
            "custom_behaviors must be a list of DeepOF_behavior objects or None."
        )
    if custom_behavior_inputs is not None and not isinstance(custom_behavior_inputs, dict):
        raise ValueError("custom_behavior_inputs must be a dictionary.")
    seen = []
    for cb in custom_behaviors:
        if "_" in cb.name:
            raise ValueError('No "_" allowed in behavior names; use "-".')
        if cb.scope is not Behavior_scope.INDIVIDUAL and cb.output_type is Behavior_output.CONTINUOUS:
            raise NotImplementedError(
                "Continuous behaviors are only supported for individuals."
            )
        if cb.name in (
            SINGLE_BEHAVIORS + SYMMETRIC_BEHAVIORS + ASYMMETRIC_BEHAVIORS
            + CONTINUOUS_BEHAVIORS
        ):
            raise ValueError(f"The behavior name {cb.name} is already in use.")
        if cb.name in seen:
            raise ValueError(f"Custom behavior names must be unique: {cb.name}.")
        seen.append(cb.name)


def assign_custom_behavior_colors(custom_behaviors=None):
    if custom_behaviors is None:
        return None
    pal = cycle(pair[0] for pair in CUSTOM_BEHAVIOR_COLOR_MAP.values())
    for i, cb in enumerate(custom_behaviors):
        if not (
            cb.color and isinstance(cb.color, str)
            and re.search(r"^#(?:[0-9a-fA-F]{3}){1,2}$", cb.color)
        ):
            custom_behaviors[i] = cb.set_color(next(pal))
    return custom_behaviors


# --------------------------------------------------------------------------- #
# Main tagging entry
# --------------------------------------------------------------------------- #


def supervised_tagging(
    coord_object,
    raw_coords,
    coords,
    dists,
    angles,
    speeds,
    full_features,
    key: str,
    immobility_estimator=None,
    center: str = "Center",
    params: Dict = None,
    run_numba: bool = False,
    custom_behaviors: Optional[List[DeepOF_behavior]] = None,
    custom_behavior_context: Dict = None,
) -> pd.DataFrame:
    """Tag every built-in (and custom) behavior for one experiment."""
    animal_ids = coord_object._animal_ids
    undercond = "_" if len(animal_ids) > 1 else ""

    raw_coords = get_dt(raw_coords, key).reset_index(drop=True)
    coords_t = get_dt(coords, key).reset_index(drop=True)
    dists_t = get_dt(dists, key).reset_index(drop=True)
    angles_t = get_dt(angles, key).reset_index(drop=True)
    speeds_t = get_dt(speeds, key).reset_index(drop=True)
    likelihoods = get_dt(coord_object.get_quality(), key).reset_index(drop=True)

    ctx = BehaviorContext(
        key=key,
        animal_ids=animal_ids,
        frame_rate=coord_object._frame_rate,
        arena_type=coord_object._arena,
        arena_params=coord_object._arena_params[key],
        roi_dict=(coord_object._roi_dicts or {}).get(key, {}),
        raw_coords=raw_coords,
        coords=coords_t,
        dists=dists_t,
        angles=angles_t,
        speeds=speeds_t,
        likelihoods=likelihoods,
        full_features=full_features,
        params=params or {},
        run_numba=run_numba,
    )

    behaviors = default_behaviors()

    # Mouse lengths/areas for relative tolerances (annotation_utils:1578-1614).
    main_body = [
        bp for bp in (
            "Left_ear", "Right_ear", "Spine_1", "Center", "Spine_2",
            "Left_fhip", "Right_fhip", "Left_bhip", "Right_bhip",
        )
        if any(bp in col[0] for col in coords_t.columns)
    ]
    mouse_lens, mouse_areas = {}, {}
    for aid in animal_ids:
        prefix = f"{aid}_" if aid else ""
        backbone = [
            prefix + bp
            for bp in ("Nose", "Spine_1", "Center", "Spine_2", "Tail_base")
            if (prefix + bp) in {c[0] for c in raw_coords.columns}
        ]
        subset = [c for c in raw_coords.columns if c[0] in backbone]
        valid = raw_coords.dropna(subset=subset)
        if len(backbone) > 1 and len(valid) >= 400:
            idx = np.random.choice(
                valid.index, size=min(5000, len(valid)), replace=False
            )
            total = np.zeros(len(idx))
            for i in range(len(backbone) - 1):
                total += np.linalg.norm(
                    raw_coords[backbone[i + 1]].loc[idx].to_numpy(float)
                    - raw_coords[backbone[i]].loc[idx].to_numpy(float),
                    axis=1,
                )
            mouse_lens[prefix] = np.nanpercentile(total, 80)
        else:
            mouse_lens[prefix] = 50
        area_key = prefix + "full_area"
        areas = coord_object._areas.get(key)
        if areas is not None and area_key in getattr(
            coord_object, "_area_names", []
        ):
            col = coord_object._area_names.index(area_key)
            mouse_areas[prefix] = np.nanpercentile(np.asarray(areas)[:, col], 80)

    ctx.extra["main_body"] = main_body
    ctx.extra["immobility_estimator"] = immobility_estimator
    ctx.extra["mouse_lens"] = mouse_lens
    ctx.extra["mouse_areas"] = mouse_areas
    ctx.extra.update(custom_behavior_context or {})

    tag_dict: Dict[str, np.ndarray] = {}
    pairs = list(combinations(animal_ids, 2))
    if len(animal_ids) >= 2:
        for a, b in pairs:
            for cb in custom_behaviors or []:
                if cb.scope is Behavior_scope.PAIR_NONDIRECTIONAL:
                    tag_dict[f"{a}_{b}_{cb.name}"] = cb.annotate_behavior(ctx, (a, b))
                elif cb.scope is Behavior_scope.PAIR_DIRECTIONAL:
                    tag_dict[f"{a}_{b}_{cb.name}"] = cb.annotate_behavior(ctx, (a, b))
                    tag_dict[f"{b}_{a}_{cb.name}"] = cb.annotate_behavior(ctx, (b, a))
            tag_dict[f"{a}_{b}_nose2nose"] = behaviors["nose2nose"].annotate_behavior(ctx, (a, b))
            tag_dict[f"{a}_{b}_sidebyside"] = behaviors["sidebyside"].annotate_behavior(ctx, (a, b))
            tag_dict[f"{a}_{b}_sidereside"] = behaviors["sidereside"].annotate_behavior(ctx, (a, b))
            tag_dict[f"{a}_{b}_nose2tail"] = behaviors["nose2tail"].annotate_behavior(ctx, (a, b))
            tag_dict[f"{b}_{a}_nose2tail"] = behaviors["nose2tail"].annotate_behavior(ctx, (b, a))
            tag_dict[f"{a}_{b}_nose2body"] = behaviors["nose2body"].annotate_behavior(ctx, (a, b))
            tag_dict[f"{b}_{a}_nose2body"] = behaviors["nose2body"].annotate_behavior(ctx, (b, a))
            tag_dict[f"{a}_{b}_following"] = behaviors["following"].annotate_behavior(ctx, (a, b))
            tag_dict[f"{b}_{a}_following"] = behaviors["following"].annotate_behavior(ctx, (b, a))

    for aid in animal_ids:
        for cb in custom_behaviors or []:
            if cb.scope is Behavior_scope.INDIVIDUAL:
                tag_dict[aid + undercond + cb.name] = cb.annotate_behavior(ctx, aid)
        tag_dict[aid + undercond + "climb-arena"] = behaviors["climb-arena"].annotate_behavior(ctx, aid)
        tag_dict[aid + undercond + "sniff-arena"] = behaviors["sniff-arena"].annotate_behavior(ctx, aid)
        tag_dict[aid + undercond + "immobility"] = behaviors["immobility"].annotate_behavior(ctx, aid)
        tag_dict[aid + undercond + "stat-lookaround"] = behaviors["stat-lookaround"].annotate_behavior(ctx, aid)
        activity = behaviors["detect_activity"].annotate_behavior(ctx, aid)
        tag_dict[aid + undercond + "stat-active"] = activity["stat-active"]
        tag_dict[aid + undercond + "stat-passive"] = activity["stat-passive"]
        tag_dict[aid + undercond + "moving"] = activity["moving"]
        tag_dict[aid + undercond + "sniffing"] = behaviors["sniffing"].annotate_behavior(ctx, aid)
        cont = behaviors["continuous"].annotate_behavior(ctx, aid)
        tag_dict[aid + undercond + "distance"] = cont["distance"]
        tag_dict[aid + undercond + "cum-distance"] = cont["cum-distance"]
        tag_dict[aid + undercond + "speed"] = cont["speed"]

    return pd.DataFrame(tag_dict).fillna(0).astype(float)


def supervised_annotation(
    coordinates,
    params: Dict = None,
    center: str = "Center",
    immobility_estimator=None,
    custom_behaviors: Optional[List[DeepOF_behavior]] = None,
    custom_behavior_context: Dict = None,
    verbose: bool = True,
) -> TableDict:
    """Full supervised pipeline over every experiment
    (deepof/data.py:3041-3243): gather features, tag behaviors, add the
    per-animal missing flag, return a "supervised" TableDict."""
    validate_custom_behaviors(custom_behaviors, custom_behavior_context)
    if custom_behaviors:
        coordinates._custom_behaviors = assign_custom_behavior_colors(
            list(custom_behaviors)
        )

    tag_params = coordinates.get_supervised_parameters()
    if params:
        tag_params.update(params)

    from deepof_tpu.profiling import stage as _profile_stage

    with _profile_stage("supervised_feature_gather"):
        raw_coords = coordinates.get_coords(center=False)
        coords = coordinates.get_coords(center=center, align="Spine_1")
        # Graph-filtered distances, as the reference pipeline feeds the
        # rules (deepof/data.py:3128): close-range scans then only see the
        # skeleton's inter-animal links (Nose/Tail_base), not every
        # bodypart pair.
        dists = coordinates.get_distances()
        angles = coordinates.get_angles()
        speeds = coordinates.get_coords(speed=1)

        from deepof_tpu.posthoc import _kinematics_table_views

        # One device pass per experiment; the per-animal tables the rules
        # need are host-side column views of the same full computation.
        # Only the immobility rule reads full_features, and only 11
        # distance pairs per animal — restrict the distance fetch to them
        # unless user custom behaviors (which receive full_features in
        # their context) are in play.
        distance_pairs = None
        if not custom_behaviors:
            aids = coordinates._animal_ids or [""]
            distance_pairs = [
                (
                    f"{aid}_{a}" if aid else a,
                    f"{aid}_{b}" if aid else b,
                )
                for aid in aids
                for a, b in IMMOBILITY_FEATURES_DISTS
            ]
        if len(coordinates._animal_ids) > 1:
            full_features = _kinematics_table_views(
                coordinates, views=list(coordinates._animal_ids),
                include_angles=False, file_name=None,
                distance_pairs=distance_pairs,
            )
        else:
            full_features = _kinematics_table_views(
                coordinates, views=[None], include_angles=False,
                file_name=None, distance_pairs=distance_pairs,
            )[None]

    tabs = {}
    from deepof_tpu.utils import progress

    for key in progress(
        list(coordinates._tables.keys()), desc="Tagging behaviors", verbose=verbose
    ):
        with _profile_stage("supervised_tagging"):
            tag = supervised_tagging(
                coordinates,
                raw_coords=raw_coords,
                coords=coords,
                dists=dists,
                angles=angles,
                speeds=speeds,
                full_features=full_features,
                key=key,
                immobility_estimator=immobility_estimator,
                center=center,
                params=tag_params,
                custom_behaviors=custom_behaviors,
                custom_behavior_context=custom_behavior_context or {},
            )
        with _profile_stage("supervised_postprocess"):
            # Per-animal missing flag (deepof/data.py:3219-3223).
            presence = coordinates._presence[key]
            n = min(len(tag), len(presence))
            undercond = "_" if len(coordinates._animal_ids) > 1 else ""
            for ai, aid in enumerate(coordinates._animal_ids):
                missing = (presence[:n, ai] == 0).astype(float)
                tag[aid + undercond + "missing"] = 0.0
                tag.loc[tag.index[:n], aid + undercond + "missing"] = missing
            tag.index = coordinates._time_index(len(tag))
            tabs[key] = tag

    return TableDict(
        tabs,
        typ="supervised",
        table_path=coordinates._table_path,
        animal_ids=coordinates._animal_ids,
        arena=coordinates._arena,
        exp_conditions=coordinates._exp_conditions,
    )


def max_behaviour(
    behaviour_dframe: pd.DataFrame, window_size: int = 10, stepped: bool = False
) -> np.ndarray:
    """Most frequent behavior per sliding window
    (annotation_utils.py:1320-1352): rolling centered sums over the binary
    columns, argmax per window."""
    speeds = [c for c in behaviour_dframe.columns if "speed" in str(c).lower()]
    tab = behaviour_dframe.drop(columns=speeds).astype(float)
    win = tab.rolling(window_size, center=True).sum()
    if stepped:
        win = win[::window_size]
    # Edge windows are all-NaN under centered rolling; fill so idxmax is
    # defined (older pandas returned NaN rows silently).
    return np.array(win.iloc[1:].fillna(-np.inf).idxmax(axis=1))


def frame_corners(w: int, h: int, corners: dict = None) -> dict:
    """Text-anchor positions at the corners of a video frame
    (annotation_utils.py:1354-1370)."""
    defaults = {
        "downleft": (int(w * 0.3 / 10), int(h / 1.05)),
        "downright": (int(w * 6.5 / 10), int(h / 1.05)),
        "upleft": (int(w * 0.3 / 10), int(h / 20)),
        "upright": (int(w * 6.3 / 10), int(h / 20)),
    }
    defaults.update(corners or {})
    return defaults
