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
