"""Host-side utilities: column conventions, time strings, two-stage scaling.

The column-shape conventions are the reference's load-bearing API
(deepof/utils.py:2395-2422): coords are ``(bp, "x"|"y")`` tuples, speeds are
plain ``bp`` strings, distances sorted ``(bp1, bp2)`` tuples, angles
3-tuples, areas ``"{aid}_head_area"``-style strings. The two-stage scaler
reproduces deepof/utils.py:2425-2566 scale_table: per-animal size
normalization from the Nose-Tail_base median, log1p on distances, then
statistical standardization per section.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from sklearn.preprocessing import MinMaxScaler, RobustScaler, StandardScaler

from deepof_tpu.io.readers import natural_sorted  # noqa: F401  (re-export)

SCALERS = {"standard": StandardScaler, "minmax": MinMaxScaler, "robust": RobustScaler}


# --------------------------------------------------------------------------- #
# Time strings (reference: deepof/utils.py:717-760)
# --------------------------------------------------------------------------- #


def time_to_seconds(time_string: str) -> Optional[float]:
    """Parse "HH:MM:SS(.sss)" into float seconds (None if malformed)."""
    if re.match(r"^\b\d{1,6}:\d{1,6}:\d{1,6}(?:\.\d{1,9})?$", time_string) is None:
        return None
    parts = np.array(re.findall(r"[-+]?\d*\.?\d+", time_string)).astype(float)
    seconds = 3600 * parts[0] + 60 * parts[1] + parts[2]
    return float(np.round(seconds * 10**9) / 10**9)


def seconds_to_time(seconds: float, cut_milliseconds: bool = True) -> str:
    """Format float seconds as "HH:MM:SS(.sssssssss)"."""
    hours = int(np.floor(seconds / 3600))
    minutes = int(np.floor((seconds - hours * 3600) / 60))
    secs = int(np.floor(seconds - hours * 3600 - minutes * 60))
    if cut_milliseconds:
        return f"{hours:02d}:{minutes:02d}:{secs:02d}"
    millis = seconds - np.floor(seconds)
    out = f"{hours:02d}:{minutes:02d}:{secs:02d}.{int(np.round(millis * 10**9)):09d}"
    return out[: out.find(".") + 10]


def make_time_index(n_frames: int, frame_rate: float) -> pd.Index:
    """String time index at the video frame rate, ms-rounded, with the
    pandas "0 days " prefix stripped (reference: deepof/data.py:941-948)."""
    freq_ns = np.round(1e9 / frame_rate)
    idx = pd.timedelta_range(start="0s", periods=n_frames, freq=f"{freq_ns}ns")
    return idx.round("ms").map(lambda t: str(t)[7:])


# --------------------------------------------------------------------------- #
# Column conventions
# --------------------------------------------------------------------------- #


def infer_column_types(df: pd.DataFrame) -> Dict[str, list]:
    """Classify columns into coords / speeds / distances / angles by shape."""
    coord_cols = [
        c for c in df.columns
        if isinstance(c, tuple) and len(c) == 2 and c[1] in ("x", "y")
    ]
    bodyparts = {c[0] for c in coord_cols}
    speed_cols = [c for c in df.columns if isinstance(c, str) and c in bodyparts]
    dist_cols = [
        c for c in df.columns
        if isinstance(c, tuple) and len(c) == 2 and c[0] in bodyparts and c[1] in bodyparts
    ]
    angle_cols = [c for c in df.columns if isinstance(c, tuple) and len(c) == 3]

    def _prefix(bp: str):
        return bp.split("_", 1)[0] if "_" in bp else None

    inner = [d for d in dist_cols if _prefix(d[0]) == _prefix(d[1])]
    intra = [d for d in dist_cols if _prefix(d[0]) != _prefix(d[1])]
    return {
        "coords": coord_cols,
        "speeds": speed_cols,
        "dists": dist_cols,
        "inner_dists": inner,
        "intra_dists": intra,
        "angles": angle_cols,
        "bodyparts": bodyparts,
        "scalars": speed_cols + dist_cols,
    }


def filter_columns(columns, selected_id: Optional[str], table_type: str = None) -> list:
    """Columns belonging to one animal id (reference column-matching rules,
    deepof/utils.py:3698-3741)."""
    if selected_id is None:
        return list(columns)
    keep = []
    for column in columns:
        if isinstance(column, str):
            if table_type == "supervised" and selected_id in column:
                keep.append(column)
            elif column.startswith(selected_id):
                keep.append(column)
            continue
        if column[0].startswith(selected_id) and column[1] in ("x", "y", "rho", "phi"):
            keep.append(column)
        elif len(column) in (2, 3) and all(str(c).startswith(selected_id) for c in column):
            keep.append(column)
        elif str(column[0]).lower().startswith("pheno"):
            keep.append(column)
    return keep


def filter_animal_id_in_table(
    table: pd.DataFrame, selected_id: str = None, table_type: str = None
) -> pd.DataFrame:
    """Keep only one animal's columns."""
    if selected_id is None:
        return table
    keep = filter_columns(table.columns, selected_id, table_type)
    return table.loc[:, [c for c in table.columns if c in keep]]


# --------------------------------------------------------------------------- #
# Two-stage scaling (size normalization + standardization)
# --------------------------------------------------------------------------- #


def _split_aid(bp: str):
    return bp.split("_", 1) if "_" in bp else (None, bp)


def compute_size_factors(
    df: pd.DataFrame,
    animal_ids: Sequence[Optional[str]],
    size_ref: Tuple[str, str] = ("Nose", "Tail_base"),
) -> Dict[Optional[str], float]:
    """Per-animal body-size factors: nan-median Nose-Tail_base distance;
    animals with no valid measure fall back to the cohort median."""
    ref_a, ref_b = size_ref
    factors: Dict[Optional[str], float] = {}
    for aid in animal_ids:
        a = ref_a if not aid else f"{aid}_{ref_a}"
        b = ref_b if not aid else f"{aid}_{ref_b}"
        need = [(a, "x"), (a, "y"), (b, "x"), (b, "y")]
        if all(c in df.columns for c in need):
            dx = df[(a, "x")].to_numpy(float) - df[(b, "x")].to_numpy(float)
            dy = df[(a, "y")].to_numpy(float) - df[(b, "y")].to_numpy(float)
            factors[aid] = float(np.nanmedian(np.hypot(dx, dy)))
        else:
            factors[aid] = np.nan
    valid = [v for v in factors.values() if np.isfinite(v) and v > 0]
    default = float(np.nanmedian(valid)) if valid else 1.0
    return {
        aid: (v if np.isfinite(v) and v > 0 else default) for aid, v in factors.items()
    }, default


def scale_table(
    df: pd.DataFrame,
    scale: str = "standard",
    animal_ids=None,
    size_ref: Tuple[str, str] = ("Nose", "Tail_base"),
    inter_scale: str = "mean",
    standardize: bool = True,
    dist_standardize: Optional[str] = "per_column",
    speed_standardize: Optional[str] = "per_column",
    coord_standardize: Optional[str] = "per_column",
    log_distances: bool = True,
) -> pd.DataFrame:
    """Size-normalize per animal, log1p distances, then standardize sections.

    Matches the reference's scale_table semantics (deepof/utils.py:2425-2566).
    """
    if not scale:
        return df.copy()
    if scale not in SCALERS:
        raise ValueError("scale must be one of {'standard','minmax','robust'}")
    for mode in (dist_standardize, speed_standardize, coord_standardize):
        if mode not in ("per_column", "groupwise", None):
            raise ValueError("standardize modes must be per_column/groupwise/None")
    if inter_scale not in ("mean", "geom", "global"):
        raise ValueError("inter_scale must be one of {'mean','geom','global'}")

    out = df.copy()
    col_types = infer_column_types(out)
    bodyparts = sorted(col_types["bodyparts"])

    if animal_ids is None:
        prefixes = {_split_aid(bp)[0] for bp in bodyparts if _split_aid(bp)[0]}
        animal_ids = sorted(prefixes) or [None]
    animal_ids = [aid if aid else None for aid in animal_ids]

    bp_to_aid = {bp: _split_aid(bp)[0] for bp in bodyparts}
    factors, default = compute_size_factors(out, animal_ids, size_ref)

    def combined(a1, a2):
        s1 = factors.get(a1, default)
        s2 = factors.get(a2, default)
        if inter_scale == "mean":
            return 0.5 * (s1 + s2)
        if inter_scale == "geom":
            return float(np.sqrt(s1 * s2))
        return default

    # Stage 1: size normalization.
    for aid in animal_ids:
        bps = [bp for bp in bodyparts if bp_to_aid.get(bp) == aid]
        if not bps:
            continue
        s = factors[aid]
        xy = [(bp, ax) for bp in bps for ax in ("x", "y") if (bp, ax) in out.columns]
        if xy:
            out.loc[:, xy] = out.loc[:, xy].to_numpy(float) / s
        sp = [bp for bp in bps if bp in out.columns]
        if sp:
            out.loc[:, sp] = out.loc[:, sp].to_numpy(float) / s

    for (bp1, bp2) in col_types["dists"]:
        a1, a2 = bp_to_aid.get(bp1), bp_to_aid.get(bp2)
        s = factors.get(a1, default) if a1 == a2 else combined(a1, a2)
        out.loc[:, [(bp1, bp2)]] = out.loc[:, [(bp1, bp2)]].to_numpy(float) / s

    if log_distances and col_types["dists"]:
        arr = np.array(out[col_types["dists"]].to_numpy(float))
        arr[arr < 0] = 0.0
        out.loc[:, col_types["dists"]] = np.log1p(arr)

    if not standardize:
        return out

    # Stage 2: statistical standardization.
    scaler_cls = SCALERS[scale]

    def fit_transform(cols, mode):
        if not cols or mode is None:
            return
        sc = scaler_cls()
        if mode == "per_column":
            out.loc[:, cols] = sc.fit_transform(out[cols].to_numpy(float))
        else:  # groupwise
            arr = out[cols].to_numpy(float)
            out.loc[:, cols] = sc.fit_transform(arr.reshape(-1, 1)).reshape(arr.shape)

    fit_transform(col_types["speeds"], speed_standardize)
    if dist_standardize == "per_column":
        fit_transform(col_types["dists"], "per_column")
    elif dist_standardize == "groupwise":
        fit_transform(col_types["inner_dists"], "groupwise")
        fit_transform(col_types["intra_dists"], "groupwise")
    fit_transform(col_types["coords"], coord_standardize)

    return out


def make_scaler(scale_kind: str):
    if scale_kind not in SCALERS:
        raise ValueError(f"Invalid scaler: {scale_kind}.")
    return SCALERS[scale_kind]()


def str2bool(v) -> bool:
    """Lenient string -> bool conversion (CLI helper)."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise ValueError("Boolean compatible value expected.")


def progress(iterable, desc: str = "", verbose: bool = True, total=None):
    """tqdm progress bar with the reference's fixed-width labels
    (deepof/config.py:12; bars wrap every per-experiment loop, e.g.
    data.py:926). Falls back to a plain iterator when tqdm is missing or
    verbose is False."""
    if not verbose:
        return iterable
    try:
        import tqdm as _tqdm

        from deepof_tpu.config import PROGRESS_BAR_FIXED_WIDTH

        return _tqdm.tqdm(
            iterable, desc=f"{desc:<{PROGRESS_BAR_FIXED_WIDTH}}", total=total
        )
    except ImportError:  # pragma: no cover
        return iterable
