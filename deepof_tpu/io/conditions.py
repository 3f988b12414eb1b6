"""Experimental condition / start-marker CSV loading.

Spec: deepof/utils.py:760-816 (_load_conditions_csv, load_exp_conditions,
load_start_markers) — each experiment maps to a one-row DataFrame of
condition values; start markers accept frame ints or "HH:MM:SS(.sss)"
strings, normalized to time strings.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from deepof_tpu.utils import seconds_to_time


def _load_conditions_csv(filepath: str) -> dict:
    table = pd.read_csv(filepath, index_col=0)
    out = {}
    for exp_id in table.iloc[:, 0]:
        row = table.loc[table.iloc[:, 0] == exp_id, :].iloc[0, 1:]
        out[exp_id] = pd.DataFrame(row).T
    for key, df in out.items():
        assert isinstance(df, pd.DataFrame) and df.shape[0] == 1, (
            "Conditions could not be loaded!"
        )
    return out


def load_exp_conditions(filepath: str) -> dict:
    conditions = _load_conditions_csv(filepath)
    for key, df in conditions.items():
        for col in df.columns:
            assert isinstance(df[col].iloc[0], str), (
                "Condition values need to be strings!"
            )
    return conditions


def load_start_markers(filepath: str, frame_rate: float) -> dict:
    markers = _load_conditions_csv(filepath)
    for key, df in markers.items():
        for col in df.columns:
            raw = df[col].iloc[0]
            value = raw.strip().strip('"').strip("'") if isinstance(raw, str) else raw
            is_frame = isinstance(value, (int, np.integer))
            is_time = isinstance(value, str) and re.fullmatch(
                r"\d{1,6}:\d{1,6}:\d{1,6}(?:\.\d{1,9})?", value
            )
            if is_frame:
                value = seconds_to_time(value / frame_rate, cut_milliseconds=False)
            assert is_frame or is_time, (
                "Start markers must be frame integers or time strings "
                '("xx:xx:xx.xxx").'
            )
            df[col] = [value]
    return markers
