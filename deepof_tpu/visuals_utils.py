"""Shared analysis utilities: the time-binning engine and plot helpers.

The binning engine is the single entry point every plot and the preprocess
pipeline use to turn (bin_size, bin_index | time strings | precomputed
arrays) into per-experiment frame-index arrays — behavioral spec from
deepof/visuals_utils.py:957-1331 (_preprocess_time_bins and strategies).
"""

from __future__ import annotations

import re
import warnings
from typing import Any, Dict, Optional, Union

import numpy as np

import deepof_tpu.utils as dutils
from deepof_tpu.core.storage import get_dt

_TIME_STR = r"^\d{1,6}:\d{1,6}:\d{1,6}(?:\.\d{1,12})?$"


def apply_rois_to_bin_info(
    coordinates,
    roi_number: Optional[int],
    bin_info_time: Optional[Dict[str, np.ndarray]] = None,
    in_roi_criterion: str = "Center",
    invert_roi: bool = False,
) -> Dict[str, dict]:
    """Attach per-animal in-ROI masks to time-bin info
    (spec: deepof/visuals_utils.py:1334-1379 _apply_rois_to_bin_info).

    Returns {key: {"time": frame_idx, aid: bool_mask_over_those_frames}}.
    The mask says, per selected frame, whether the animal's
    ``in_roi_criterion`` bodypart(s) lie inside ROI ``roi_number``.
    """
    animal_ids = list(coordinates._animal_ids or [""])

    if bin_info_time is None:
        bin_info_time = {
            key: np.arange(len(get_dt(coordinates._tables, key)), dtype=int)
            for key in coordinates._tables.keys()
        }
    bin_info: Dict[str, dict] = {}
    for key, time_idx in bin_info_time.items():
        time_idx = np.asarray(time_idx)
        # (start, end) pairs are expanded to inclusive ranges.
        if len(time_idx) == 2 and time_idx[0] + 1 < time_idx[1]:
            time_idx = np.arange(time_idx[0], time_idx[1] + 1, dtype=int)
        bin_info[key] = {"time": time_idx}
        if roi_number is not None:
            import jax.numpy as jnp

            from deepof_tpu.ops import point_in_polygon

            # Tensor-first: positions live as a (T, B, 2) mm tensor with
            # coordinates._nodes naming the bodypart axis.
            pos = np.array(get_dt(coordinates._tables, key), np.float64)
            nodes = list(coordinates._nodes)
            roi_polygon = np.asarray(coordinates._roi_dicts[key][roi_number])
            criteria = (
                [in_roi_criterion]
                if isinstance(in_roi_criterion, str) else list(in_roi_criterion)
            )
            for aid in animal_ids:
                prefix = f"{aid}_" if aid else ""
                if "all" in criteria:
                    bps = [bp for bp in nodes if bp.startswith(prefix)]
                else:
                    bps = [f"{prefix}{c}" for c in criteria]
                mask = np.ones(len(pos), dtype=bool)
                for bp in bps:
                    if bp not in nodes:
                        continue
                    inside = np.asarray(point_in_polygon(
                        jnp.asarray(pos[:, nodes.index(bp)]), roi_polygon
                    ))
                    mask &= inside
                if invert_roi:
                    mask = ~mask
                bin_info[key][aid] = mask[time_idx]
    return bin_info


def preprocess_time_bins(
    coordinates,
    bin_size: Optional[Union[int, str]] = None,
    bin_index: Optional[Union[int, str]] = None,
    precomputed_bins: Optional[np.ndarray] = None,
    tab_dict_for_binning=None,
    experiment_id: Optional[str] = None,
    start_marker: Optional[str] = None,
    samples_max: int = 20000,
    down_sample: bool = True,
    given_in_frames: bool = False,
) -> Dict[str, np.ndarray]:
    """Resolve user time-bin inputs into per-experiment frame index arrays.

    Accepted combinations (anything else warns and defaults to 60 s @ 0):
      - precomputed_bins: boolean/index array applied per video;
      - int bin_size (seconds) + int bin_index (bin number);
      - "HH:MM:SS(.sss)" bin_size (duration) + bin_index (absolute start);
      - both None: the full range.
    Bins are start-marker shifted, length-aligned across videos, validated
    against video lengths, and downsampled to ``samples_max``.
    """
    if precomputed_bins is not None and (bin_size is not None or bin_index is not None):
        warnings.warn("precomputed_bins is provided. Ignoring bin_size and bin_index.")

    frame_rate = coordinates._frame_rate
    start_times = coordinates.get_start_times(start_marker=start_marker)
    start_frames = {
        key: int(np.round(dutils.time_to_seconds(t) * frame_rate))
        for key, t in start_times.items()
    }
    table_lengths = coordinates.get_table_lengths(
        tab_dict_for_binning=tab_dict_for_binning
    )
    start_frames = {k: v for k, v in start_frames.items() if k in table_lengths}

    if experiment_id:
        if experiment_id not in table_lengths:
            raise KeyError(f"Experiment ID '{experiment_id}' not found.")
        start_frames = {experiment_id: start_frames[experiment_id]}
        table_lengths = {experiment_id: table_lengths[experiment_id]}

    bin_info: Dict[str, np.ndarray] = {}
    start_too_late: Dict[str, bool] = {}
    end_too_late: Dict[str, bool] = {}
    bin_size_frames = None

    def windowed(start_frame: int, size_frames: int):
        for key, length in table_lengths.items():
            if start_frame >= length:
                start_too_late[key] = True
            if start_frame + size_frames > length:
                end_too_late[key] = True
            lo = min(length, start_frame + start_frames[key])
            hi = min(length, start_frame + size_frames + start_frames[key])
            bin_info[key] = np.arange(lo, hi)

    if precomputed_bins is not None:
        bin_size_frames = len(precomputed_bins)
        for key, length in table_lengths.items():
            arr = np.zeros(length, dtype=bool)
            eff = min(length - start_frames[key], len(precomputed_bins))
            if eff <= 0:
                eff = 0
                start_too_late[key] = True
            arr[:eff] = precomputed_bins[:eff]
            bin_info[key] = np.where(arr)[0] + start_frames[key]
            if len(precomputed_bins) > length:
                end_too_late[key] = True
    elif isinstance(bin_size, int) and isinstance(bin_index, int) and given_in_frames:
        bin_size_frames = bin_size
        if bin_size_frames <= 0:
            raise ValueError("bin_size must be > 0 frames.")
        windowed(bin_index, bin_size_frames)
    elif isinstance(bin_size, int) and isinstance(bin_index, int):
        bin_size_frames = int(round(bin_size * frame_rate))
        if bin_size_frames <= 0:
            raise ValueError("bin_size must round to > 0 frames.")
        windowed(bin_size_frames * bin_index, bin_size_frames)
    elif (
        isinstance(bin_size, str)
        and re.match(_TIME_STR, bin_size)
        and isinstance(bin_index, str)
        and re.match(_TIME_STR, bin_index)
    ):
        bin_size_frames = int(round(dutils.time_to_seconds(bin_size) * frame_rate))
        if bin_size_frames <= 0:
            raise ValueError("bin_size must represent a duration > 0.")
        start = int(round(dutils.time_to_seconds(bin_index) * frame_rate))
        for key, length in table_lengths.items():
            if start >= length:
                start_too_late[key] = True
            lo = int(np.clip(start + start_frames[key], 0, length))
            hi = int(np.clip(lo + bin_size_frames, 0, length))
            if lo + bin_size_frames > length:
                end_too_late[key] = True
            bin_info[key] = np.arange(lo, hi)
    elif bin_size is None and bin_index is None:
        for key in table_lengths:
            bin_info[key] = np.arange(start_frames[key], table_lengths[key])
    else:
        warnings.warn(
            "Invalid or mismatched bin_size/bin_index format. "
            "Defaulting to a 60-second bin starting at 0."
        )
        return preprocess_time_bins(
            coordinates=coordinates, bin_size=60, bin_index=0,
            tab_dict_for_binning=tab_dict_for_binning, experiment_id=experiment_id,
            samples_max=samples_max, down_sample=down_sample,
        )

    # Length-align across videos.
    if bin_info:
        min_len = min(len(v) for v in bin_info.values())
        bin_info = {k: v[:min_len] for k, v in bin_info.items()}

    # Validation.
    for key, late in start_too_late.items():
        if late:
            max_time = dutils.seconds_to_time(table_lengths[key] / frame_rate, False)
            raise ValueError(
                f"[Error in {key}]: bin_index is out of range (max {max_time})."
            )
    for key, truncated in end_too_late.items():
        if truncated:
            warnings.warn(
                f"[For {key} and possibly others]: chosen time range exceeds "
                "signal length; bin was truncated."
            )
            break

    # Downsampling.
    if samples_max is not None:
        out = {}
        for key, idx in bin_info.items():
            if len(idx) > samples_max:
                if down_sample:
                    sel = np.linspace(0, len(idx) - 1, samples_max, dtype=int)
                else:
                    sel = np.arange(samples_max)
                out[key] = idx[sel]
            else:
                out[key] = idx
        bin_info = out

    return bin_info


# --------------------------------------------------------------------------- #
# Color utilities (reference: deepof/visuals_utils.py:60-176)
# --------------------------------------------------------------------------- #


def hex_to_BGR(hex_color):
    h = hex_color.lstrip("#")
    return tuple(int(h[i : i + 2], 16) for i in (4, 2, 0))


def BGR_to_hex(bgr_color):
    b, g, r = bgr_color
    return f"#{r:02x}{g:02x}{b:02x}"


def RGB_to_hex(rgb_color):
    r, g, b = rgb_color
    return f"#{r:02x}{g:02x}{b:02x}"


def RGB_to_BGR(rgb_color):
    return tuple(reversed(rgb_color))


def BGR_to_RGB(bgr_color):
    return tuple(reversed(bgr_color))


def get_behavior_colors(behaviors, animal_ids=None, custom_behaviors=None):
    """Stable color per behavior from the config color maps
    (reference: deepof/visuals_utils.py:80-176)."""
    import pandas as pd

    from deepof_tpu import config as _cfg

    if isinstance(animal_ids, pd.DataFrame):
        candidates = set()
        for col in animal_ids.columns:
            name = str(col)
            if "_" in name:
                candidates.add(name.split("_")[0])
        animal_ids = sorted(candidates) or None
    if animal_ids is None:
        animal_ids = [""]

    colors = []
    custom_map = {
        cb.name: cb.color for cb in (custom_behaviors or []) if cb.color
    }
    for behavior in behaviors:
        base = str(behavior)
        aid_idx = 0
        for i, aid in enumerate(animal_ids):
            if aid and base.startswith(f"{aid}_"):
                base = base[len(aid) + 1 :]
                aid_idx = i
                break
        # Strip pair prefixes like "B_W_".
        for single in (
            list(_cfg.ONE_ANIMAL_COLOR_MAP) + list(_cfg.CONTINUOUS_COLOR_MAP)
            + list(_cfg.TWO_ANIMALS_COLOR_MAP_NONDIRECTIONAL)
            + list(_cfg.TWO_ANIMALS_COLOR_MAP_DIRECTIONAL)
            + list(custom_map)
        ):
            if base.endswith(single):
                base = single
                break
        if base in custom_map:
            colors.append(custom_map[base])
        elif base in _cfg.ONE_ANIMAL_COLOR_MAP:
            colors.append(_cfg.ONE_ANIMAL_COLOR_MAP[base][aid_idx % 2])
        elif base in _cfg.TWO_ANIMALS_COLOR_MAP_NONDIRECTIONAL:
            colors.append(_cfg.TWO_ANIMALS_COLOR_MAP_NONDIRECTIONAL[base])
        elif base in _cfg.TWO_ANIMALS_COLOR_MAP_DIRECTIONAL:
            colors.append(_cfg.TWO_ANIMALS_COLOR_MAP_DIRECTIONAL[base][aid_idx % 2])
        elif base in _cfg.CONTINUOUS_COLOR_MAP:
            colors.append(_cfg.CONTINUOUS_COLOR_MAP[base][aid_idx % 2])
        else:
            colors.append("#7f7f7f")
    return colors


# --------------------------------------------------------------------------- #
# Statistics helpers (reference: deepof/visuals_utils.py:726-1470)
# --------------------------------------------------------------------------- #


def create_bin_pairs(l_array: int, n_time_bins: int):
    """Split [0, l_array) into n_time_bins (start, end) pairs."""
    edges = np.linspace(0, l_array, n_time_bins + 1, dtype=int)
    return list(zip(edges[:-1], edges[1:]))


def cohend(array_a, array_b) -> float:
    """Cohen's d effect size between two samples."""
    a = np.asarray(array_a, float)
    b = np.asarray(array_b, float)
    na, nb = len(a), len(b)
    pooled = np.sqrt(
        ((na - 1) * np.nanvar(a, ddof=1) + (nb - 1) * np.nanvar(b, ddof=1))
        / max(na + nb - 2, 1)
    )
    if pooled == 0:
        return 0.0
    return float((np.nanmean(a) - np.nanmean(b)) / pooled)


def cohend_effect_size(d: float) -> int:
    """Bucketize |d|: 3 large (>=0.8), 2 medium (>=0.5), 1 small."""
    if abs(d) >= 0.8:
        return 3
    if abs(d) >= 0.5:
        return 2
    if abs(d) < 0.5:
        return 1
    return 0


def contiguous_segments(mask: np.ndarray):
    """(starts, ends) of True runs in a boolean array."""
    mask = np.asarray(mask).astype(bool)
    padded = np.concatenate([[False], mask, [False]])
    diff = np.diff(padded.astype(int))
    starts = np.where(diff == 1)[0]
    ends = np.where(diff == -1)[0]
    return starts, ends


def calculate_FSTTC(
    preceding_behavior, proximate_behavior, frame_rate: float, delta_T: float = 2.0
) -> float:
    """Forward Spike-Time Tiling Coefficient between two behavior trains
    (reference: deepof/visuals_utils.py:1382-1424)."""
    pre = np.asarray(preceding_behavior).astype(bool)
    prox = np.asarray(proximate_behavior).astype(bool)
    n = len(pre)
    dt = int(round(delta_T * frame_rate))
    if dt <= 0 or not pre.any() or not prox.any():
        return 0.0

    def tiled(mask):
        out = np.zeros(n, dtype=bool)
        starts, ends = contiguous_segments(mask)
        for s, e in zip(starts, ends):
            out[s : min(e + dt, n)] = True
        return out

    tile_pre = tiled(pre)
    tile_prox = tiled(prox)
    ta = tile_pre.mean()
    tb = tile_prox.mean()
    # P(prox onset inside pre tile), P(pre offset inside prox tile-before)
    prox_starts, _ = contiguous_segments(prox)
    p_a = tile_pre[prox_starts].mean() if len(prox_starts) else 0.0
    pre_starts, _ = contiguous_segments(pre)
    p_b = tile_prox[pre_starts].mean() if len(pre_starts) else 0.0
    denom_a = 1 - p_a * ta
    denom_b = 1 - p_b * tb
    if denom_a == 0 or denom_b == 0:
        return 0.0
    return float(0.5 * ((p_a - ta) / denom_a + (p_b - tb) / denom_b))


def calculate_simple_association(
    behavior_a, behavior_b, frame_rate: float = 1.0, min_T: float = 10.0
) -> float:
    """Yule's-Q style association between two binary behavior trains."""
    a = np.asarray(behavior_a).astype(bool)
    b = np.asarray(behavior_b).astype(bool)
    n11 = float(np.sum(a & b))
    n00 = float(np.sum(~a & ~b))
    n10 = float(np.sum(a & ~b))
    n01 = float(np.sum(~a & b))
    denom = n11 * n00 + n10 * n01
    if denom == 0:
        return 0.0
    return float((n11 * n00 - n10 * n01) / denom)


def scale_units(coordinates, key, data, unit: str, target_distance=None, target_time=None):
    """Convert internal mm / seconds data to the requested display unit."""
    from deepof_tpu.config import DistanceUnit, TimeUnit

    factor = 1.0
    if unit in DistanceUnit.__members__:
        f = DistanceUnit[unit].value
        if f == 0.0:  # pixel: mm -> px using the arena scale
            scales = coordinates._scales[key]
            factor = scales[2] / scales[3]
        else:
            factor = 1.0 / f
    elif unit in TimeUnit.__members__:
        factor = 1.0 / TimeUnit[unit].value
    return data * factor


def get_square_shape_for_gridlike_plot(n: int):
    """(rows, cols) grid for n panels."""
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    return rows, cols


def calculate_average_arena(coordinates, n_points: int = 100):
    """Average arena polygon across videos (in mm), resampled to
    n_points (reference: deepof/visuals_utils.py:281-358)."""
    from deepof_tpu.ops.geometry import _close_polygon
    from deepof_tpu.arena import extract_corners_from_arena

    polys = []
    for key, params in coordinates._arena_params.items():
        if isinstance(params, tuple):
            poly = extract_corners_from_arena(params, n_points=n_points)
        else:
            poly = _close_polygon(np.asarray(params, float))
            # Resample along the perimeter to n_points.
            closed = np.vstack([poly, poly[:1]])
            seg = np.linalg.norm(np.diff(closed, axis=0), axis=1)
            cum = np.concatenate([[0], np.cumsum(seg)])
            targets = np.linspace(0, cum[-1], n_points, endpoint=False)
            poly = np.stack(
                [
                    np.interp(targets, cum, closed[:, 0]),
                    np.interp(targets, cum, closed[:, 1]),
                ],
                axis=1,
            )
        polys.append(poly)
    return np.mean(np.stack(polys), axis=0)


def plot_arena(coordinates, center, color, ax, key: str):
    """Draw one experiment's arena (mm space) onto an axis
    (reference: deepof/visuals_utils.py:1721-1790)."""
    from deepof_tpu.arena import extract_corners_from_arena

    if key == "average":
        poly = calculate_average_arena(coordinates)
    else:
        params = coordinates._arena_params[key]
        poly = (
            extract_corners_from_arena(params)
            if isinstance(params, tuple)
            else np.asarray(params, float)
        )
    if center == "arena":
        scales = coordinates._scales[
            key if key != "average" else list(coordinates._scales)[0]
        ]
        poly = poly - np.asarray(scales[:2])[None, :]
    closed = np.vstack([poly, poly[:1]])
    ax.plot(closed[:, 0], closed[:, 1], color=color, lw=2)
    return ax


def heatmap(
    dframe, bodyparts, xlim=None, ylim=None, title=None, mask=None,
    save=False, dpi=100, ax=None, **kwargs,
):
    """2D position density heatmap for the given bodyparts
    (reference: deepof/visuals_utils.py:1792-1913)."""
    import matplotlib.pyplot as plt

    if ax is None:
        _, ax = plt.subplots(dpi=dpi)
    for bp in bodyparts:
        x = np.asarray(dframe[(bp, "x")], float)
        y = np.asarray(dframe[(bp, "y")], float)
        valid = np.isfinite(x) & np.isfinite(y)
        if mask is not None:
            valid &= np.asarray(mask, bool)
        ax.hist2d(x[valid], y[valid], bins=50, cmap="magma", **kwargs)
    if xlim is not None:
        ax.set_xlim(xlim)
    if ylim is not None:
        ax.set_ylim(ylim)
    if title:
        ax.set_title(title)
    ax.invert_yaxis()
    return ax


def generate_behavior_combinations(
    animal_ids,
    symmetric_behaviors=True,
    asymmetric_behaviors=True,
    single_behaviors=True,
    continuous_behaviors=True,
    custom_behaviors=None,
):
    """Full supervised column names + their plot colors for a cohort
    (visuals_utils.py:176-278): symmetric behaviors per unordered animal
    pair, asymmetric per ordered pair, single/continuous per animal, with
    custom behaviors slotted by scope. Pass True for the built-in catalog
    or a list to restrict."""
    import itertools

    from deepof_tpu.annotate import Behavior_output, Behavior_scope
    from deepof_tpu.config import (
        ASYMMETRIC_BEHAVIORS,
        CONTINUOUS_BEHAVIORS,
        CONTINUOUS_COLOR_MAP,
        CUSTOM_BEHAVIOR_COLOR_MAP,
        ONE_ANIMAL_COLOR_MAP,
        SINGLE_BEHAVIORS,
        SYMMETRIC_BEHAVIORS,
        TWO_ANIMALS_COLOR_MAP_DIRECTIONAL,
        TWO_ANIMALS_COLOR_MAP_NONDIRECTIONAL,
    )

    custom_behaviors = custom_behaviors or []
    sym = list(SYMMETRIC_BEHAVIORS) if symmetric_behaviors is True else (
        list(symmetric_behaviors) if isinstance(symmetric_behaviors, list) else []
    )
    asym = list(ASYMMETRIC_BEHAVIORS) if asymmetric_behaviors is True else (
        list(asymmetric_behaviors) if isinstance(asymmetric_behaviors, list) else []
    )
    single = list(SINGLE_BEHAVIORS) if single_behaviors is True else (
        list(single_behaviors) if isinstance(single_behaviors, list) else []
    )
    cont = list(CONTINUOUS_BEHAVIORS) if continuous_behaviors is True else (
        list(continuous_behaviors) if isinstance(continuous_behaviors, list) else []
    )

    for b in custom_behaviors:
        if b.scope is Behavior_scope.PAIR_NONDIRECTIONAL:
            sym.append(b.name)
        elif b.scope is Behavior_scope.PAIR_DIRECTIONAL:
            asym.append(b.name)
        elif b.output_type is Behavior_output.CONTINUOUS:
            cont.append(b.name)
        else:
            single.append(b.name)

    if not animal_ids or animal_ids == [""] or animal_ids == "":
        ids = [""]
    else:
        ids = [f"{aid}_" for aid in animal_ids]
    n = len(ids)

    palette = itertools.cycle(CUSTOM_BEHAVIOR_COLOR_MAP.values())
    custom_colors = {
        b.name: (b.color if b.color is not None else next(palette))
        for b in custom_behaviors
    }

    def _first(c):
        return c[0] if isinstance(c, (tuple, list)) else c

    result, color_dict = [], {}

    for beh in sym:
        c = custom_colors.get(beh, TWO_ANIMALS_COLOR_MAP_NONDIRECTIONAL.get(beh))
        for a, b in itertools.combinations(ids, 2):
            key = f"{a}{b}{beh}"
            result.append(key)
            color_dict[key] = _first(c)

    for beh in asym:
        c = custom_colors.get(beh, TWO_ANIMALS_COLOR_MAP_DIRECTIONAL.get(beh))
        c0, c1 = c if isinstance(c, (tuple, list)) else (c, c)
        remember = []
        for a, b in itertools.permutations(ids, 2):
            key = f"{a}{b}{beh}"
            result.append(key)
            color_dict[key] = c0 if b + a not in remember else c1
            remember.append(a + b)

    for i, aid in enumerate(ids):
        for beh in single:
            if beh == "missing":
                continue
            key = f"{aid}{beh}"
            result.append(key)
            c = custom_colors.get(beh, ONE_ANIMAL_COLOR_MAP.get(beh))
            if isinstance(c, (tuple, list)):
                color_dict[key] = c[0] if n <= 1 else c[i % 2]
            else:
                color_dict[key] = c

    if "missing" in single:
        for i, aid in enumerate(ids):
            key = f"{aid}missing"
            result.append(key)
            c0, c1 = ONE_ANIMAL_COLOR_MAP["missing"]
            color_dict[key] = c0 if n <= 1 else (c0 if i % 2 == 0 else c1)

    for i, aid in enumerate(ids):
        for beh in cont:
            key = f"{aid}{beh}"
            result.append(key)
            c = custom_colors.get(beh, CONTINUOUS_COLOR_MAP.get(beh))
            if isinstance(c, (tuple, list)):
                color_dict[key] = c[0] if n <= 1 else c[i % 2]
            else:
                color_dict[key] = c

    return result, color_dict


# --------------------------------------------------------------------------- #
# Binned-trend plot machinery (visuals_utils.py:2337-2860)
# --------------------------------------------------------------------------- #


def build_valid_multibins(table_lengths, n_time_bins: int = 24,
                          custom_time_bins=None):
    """Consecutive (start, end) frame bins shared by all experiments
    (visuals_utils.py:768-840): defaults to N equal bins over the shortest
    table; custom bins are validated for order and bounds."""
    l_short = min(table_lengths.values()) if isinstance(table_lengths, dict) \
        else int(min(table_lengths))
    if not custom_time_bins:
        return create_bin_pairs(l_short, n_time_bins)
    pairs = [tuple(map(int, p)) for p in custom_time_bins]
    assert all(a < b for a, b in pairs), "custom_time_bins must be ordered"
    assert all(
        pairs[i][1] <= pairs[i + 1][0] for i in range(len(pairs) - 1)
    ), "custom_time_bins must not overlap"
    assert pairs[-1][1] <= l_short, "custom_time_bins exceed the shortest table"
    return pairs


def ensure_axis(ax=None, polar_depiction: bool = False):
    """(fig, ax, created) with in-place polar conversion when needed
    (visuals_utils.py:2577-2605)."""
    import matplotlib.pyplot as plt

    if ax is None:
        fig, ax = plt.subplots(
            subplot_kw={"projection": "polar"} if polar_depiction else None
        )
        return fig, ax, True
    if polar_depiction and ax.name != "polar":
        fig = ax.figure
        pos = ax.get_position()
        ax.remove()
        ax = fig.add_axes(pos, projection="polar")
        return fig, ax, False
    return ax.figure, ax, False


def get_binned_geometry(bin_lengths):
    """Polar geometry of consecutive bins: centers/widths/edges in radians
    proportional to bin length, plus 1..N labels
    (visuals_utils.py:2607-2626)."""
    bl = np.asarray(bin_lengths, dtype=float)
    if bl.ndim != 1 or bl.size == 0:
        raise ValueError("bin_lengths must be a 1D non-empty sequence")
    total = bl.sum()
    widths = 2 * np.pi * bl / total
    edges = np.concatenate([[0.0], np.cumsum(widths)])
    centers = (edges[:-1] + edges[1:]) / 2
    return {
        "centers": centers,
        "widths": widths,
        "edges": edges,
        "labels": [str(i + 1) for i in range(len(bl))],
    }


def format_time_binned_axis(ax, geom, polar_depiction, max_value,
                            title=None, xlabel=None, ylabel=None):
    """Shared axis formatting for binned trend plots
    (visuals_utils.py:2628-2675)."""
    if polar_depiction:
        ax.set_xticks(geom["centers"])
        ax.set_xticklabels([])
        ax.set_theta_zero_location("N")
        ax.set_theta_direction(-1)
        if max_value and np.isfinite(max_value):
            ax.set_rmax(max_value * 1.05)
    else:
        ax.set_xticks(np.arange(len(geom["labels"])))
        ax.set_xticklabels(geom["labels"])
        if xlabel:
            ax.set_xlabel(xlabel)
        if ylabel:
            ax.set_ylabel(ylabel)
    if title:
        ax.set_title(title)


def add_polar_bin_labels(ax, geom, radius_factor: float = 1.166):
    """Bin-number labels outside the polar plot; call after plotting so
    rmax is final (visuals_utils.py:2677-2681)."""
    r = ax.get_rmax() * radius_factor
    for theta, label in zip(geom["centers"], geom["labels"]):
        ax.text(theta, r, label, ha="center", va="center")


def postprocess_df_bins(df, bin_lengths, hide_time_bins):
    """Binned-trend table post-processing (reference visuals_utils.py:840):
    inserts a ``bin_length`` column after ``time_bin``, hides any bin
    where some condition group has under 5% non-NaN coverage (with a
    user-facing warning), and asserts the behavior was measured at all.

    Returns (df, hide_time_bins)."""
    min_frac = 0.05
    num_bins = len(bin_lengths)
    condition_values = sorted(df["exp_condition"].astype(str).unique().tolist())
    behavior = df.columns[2]

    loc = df.columns.get_loc("time_bin")
    df.insert(
        loc + 1, "bin_length",
        np.asarray(bin_lengths)[df["time_bin"].astype(int)],
    )

    coverage = (
        df.pivot_table(
            index="time_bin", columns="exp_condition", values=behavior,
            aggfunc=lambda s: s.notna().mean(),
        )
        .reindex(index=range(num_bins), columns=list(condition_values))
        .fillna(0.0)
    )
    enough = coverage.ge(min_frac).all(axis=1).to_numpy()
    hide_time_bins = hide_time_bins | ~enough
    if not enough.all():
        warnings.warn(
            f"Time bins {np.where(~enough)[0] + 1} hold data for under "
            f"{min_frac:.0%} of tables in some condition and were excluded."
        )
    assert np.nansum(df[behavior]) > 1e-6, (
        "None of the selected behavior was measured within the given time "
        "bins and ROI!"
    )
    return df, hide_time_bins


def plot_effectsize_histogram(
    ax, geom, effect_size_categories, hide_time_bins, max_value, bottom,
    show_histogram=True, cmap=("#9370DB", "#6A5ACD", "#4B0082"),
    hidden_color="#C0C0C0", alpha=0.8,
):
    """Per-bin effect-size bars under a binned trend plot (reference
    visuals_utils.py:2722): bar height encodes the Cohen's-d category
    (1=small..3=large) at 10% of the plot's value range, hidden bins are
    greyed, and polar axes get their r-limits expanded to fit the bars.

    Returns (legend_handles, stat_text_color)."""
    from matplotlib.patches import Patch

    if not show_histogram:
        return None, "k"

    cats = np.asarray(effect_size_categories, dtype=float)
    unit = max_value * 0.1 if max_value > 0 else 0.1
    values = cats * unit
    colors = [
        cmap[int(np.clip(int(c) - 1, 0, len(cmap) - 1))]
        for c in cats.astype(int)
    ]
    for k in range(min(len(colors), len(hide_time_bins))):
        if hide_time_bins[k]:
            colors[k] = hidden_color
            values[k] = unit

    bars = ax.bar(
        geom["centers"], values, width=geom["widths"], bottom=bottom,
        align="center",
    )
    for color, bar in zip(colors, bars):
        bar.set_facecolor(color)
        bar.set_alpha(alpha)

    if getattr(ax, "name", "") == "polar":
        lower = ax.get_ylim()[0]
        ticks = ax.get_yticks()
        pad = np.diff(ticks)[0] if len(ticks) >= 2 else 0.0
        ax.set_rlim(lower, ax.get_rmax() + pad)

    handles = [
        Patch(color=c, label=lab)
        for c, lab in zip(list(cmap)[::-1], ("large", "medium", "small"))
    ]
    return handles, "#FFFF00"


def plot_binned_line(ax, x, y, yerr=None, hide_time_bins=None, color="C0",
                     label=None, polar_depiction=False):
    """One condition's binned trend line with an error band, with hidden
    bins masked out (visuals_utils.py:2439-2575)."""
    x = np.asarray(x, float)
    y = np.asarray(y, float)
    if hide_time_bins is not None:
        y = np.where(np.asarray(hide_time_bins, bool), np.nan, y)
    if polar_depiction and len(x):
        x = np.concatenate([x, x[:1] + 2 * np.pi])
        y = np.concatenate([y, y[:1]])
        if yerr is not None:
            yerr = np.concatenate([np.asarray(yerr, float), np.asarray(yerr, float)[:1]])
    (line,) = ax.plot(x, y, color=color, label=label)
    if yerr is not None:
        ax.fill_between(x, y - yerr, y + yerr, color=color, alpha=0.3)
    return line


def plot_binned_groups(ax, x_radians, mean_values, error_values,
                       condition_values, hide_time_bins=None, colors=None):
    """All conditions' trend lines on a polar axis
    (visuals_utils.py:2684-2721). Returns {condition: line handle}."""
    handles = {}
    for i, cond in enumerate(condition_values):
        color = (colors or {}).get(cond, f"C{i}")
        handles[cond] = plot_binned_line(
            ax, x_radians, mean_values[cond],
            yerr=None if error_values is None else error_values.get(cond),
            hide_time_bins=hide_time_bins, color=color, label=str(cond),
            polar_depiction=True,
        )
    return handles


def annotate_binwise_stats(ax, test_dict, geom=None, polar_depiction=False,
                           alpha: float = 0.05):
    """Significance markers per bin from a {bin_index: p_value} dict
    (visuals_utils.py:2776-2812)."""
    if not test_dict:
        return
    if polar_depiction:
        yt = ax.get_yticks()
        y = yt[-1] + (yt[-1] - yt[-2]) * 1.166 if len(yt) >= 2 else ax.get_rmax()
        xs = geom["centers"]
    else:
        y = ax.get_ylim()[1]
        xs = np.arange(len(test_dict))
    for bi, p in test_dict.items():
        if p is None or not np.isfinite(p):
            continue
        mark = "***" if p < 0.001 else "**" if p < 0.01 else "*" if p < alpha else ""
        if mark:
            x = xs[bi] if bi < len(xs) else bi
            ax.text(x, y, mark, ha="center", va="bottom")


def add_binned_legends(ax, condition_handles, condition_labels=None,
                       effect_handles=None, polar_depiction=False,
                       show_histogram=True):
    """Condition (and optional effect-size) legends placed clear of a
    polar plot (visuals_utils.py:2814-2860)."""
    handles = (
        list(condition_handles.values())
        if isinstance(condition_handles, dict) else list(condition_handles)
    )
    labels = condition_labels or (
        list(condition_handles.keys())
        if isinstance(condition_handles, dict) else None
    )
    loc = "upper left"
    anchor = (1.12, 1.1) if polar_depiction else (1.02, 1.0)
    leg = ax.legend(handles, labels, loc=loc, bbox_to_anchor=anchor)
    if effect_handles:
        ax.add_artist(leg)
        ax.legend(
            handles=effect_handles, loc="lower left",
            bbox_to_anchor=(anchor[0], 0.0), title="effect size",
        )
    return leg


def process_df(df, value_col: str = "value", bin_col: str = "bin",
               cond_col: str = "condition", error_bars: str = "sem"):
    """Per-condition mean and error arrays over consecutive bins
    (visuals_utils.py:2337-2437)."""
    conditions = sorted(df[cond_col].astype(str).unique())
    n_bins = int(df[bin_col].max()) + 1
    mean_values, error_values = {}, {}
    for cond in conditions:
        sub = df[df[cond_col].astype(str) == cond].groupby(bin_col)[value_col]
        mean = sub.mean().reindex(range(n_bins))
        err = (sub.sem() if error_bars == "sem" else sub.std()).reindex(range(n_bins))
        mean_values[cond] = mean.to_numpy(float)
        error_values[cond] = np.nan_to_num(err.to_numpy(float))
    return mean_values, error_values, conditions


def binwise_group_tests(df, value_col: str = "value", bin_col: str = "bin",
                        cond_col: str = "condition"):
    """Mann-Whitney p-value per bin between exactly two conditions; empty
    dict otherwise."""
    from scipy.stats import mannwhitneyu

    conditions = sorted(df[cond_col].astype(str).unique())
    if len(conditions) != 2:
        return {}
    out = {}
    for bi in sorted(df[bin_col].unique()):
        a = df[(df[bin_col] == bi) & (df[cond_col].astype(str) == conditions[0])][value_col]
        b = df[(df[bin_col] == bi) & (df[cond_col].astype(str) == conditions[1])][value_col]
        if len(a) > 0 and len(b) > 0 and (a.nunique() > 1 or b.nunique() > 1):
            try:
                out[int(bi)] = float(mannwhitneyu(a, b).pvalue)
            except ValueError:
                out[int(bi)] = np.nan
    return out


def cohens_d(a, b) -> float:
    """Cohen's d effect size with pooled standard deviation
    (spec: deepof/visuals_utils.py:875-955)."""
    a = np.asarray(a, float)
    b = np.asarray(b, float)
    na, nb = len(a), len(b)
    if na < 2 or nb < 2:
        return float("nan")
    pooled = np.sqrt(
        ((na - 1) * a.var(ddof=1) + (nb - 1) * b.var(ddof=1)) / (na + nb - 2)
    )
    if pooled == 0:
        return 0.0
    return float((a.mean() - b.mean()) / pooled)


def p_to_stars(p: float) -> str:
    """statannotations-style significance stars."""
    if not np.isfinite(p):
        return "ns"
    for thresh, stars in ((1e-4, "****"), (1e-3, "***"), (1e-2, "**"), (5e-2, "*")):
        if p <= thresh:
            return stars
    return "ns"


def add_significance_bracket(
    ax, x1: float, x2: float, y: float, p: float, effect_size: float = None,
    height: float = None, fontsize: int = 9,
):
    """Draw a statannotations-style bracket with stars (and Cohen's d)
    between two x positions (spec: deepof/visuals_utils.py:875-1030)."""
    if height is None:
        lo, hi = ax.get_ylim()
        height = 0.02 * (hi - lo)
    ax.plot(
        [x1, x1, x2, x2], [y, y + height, y + height, y],
        lw=1.0, color="0.25", clip_on=False,
    )
    label = p_to_stars(p)
    if effect_size is not None and np.isfinite(effect_size):
        label += f" (d={effect_size:.2f})"
    ax.text(
        (x1 + x2) / 2, y + height, label, ha="center", va="bottom",
        fontsize=fontsize, color="0.25",
    )
