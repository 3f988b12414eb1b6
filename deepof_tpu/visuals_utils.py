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
