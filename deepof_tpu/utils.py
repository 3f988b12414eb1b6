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
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
from sklearn.preprocessing import MinMaxScaler, RobustScaler, StandardScaler

from deepof_tpu.io.readers import natural_sorted  # noqa: F401  (re-export)

SCALERS = {"standard": StandardScaler, "minmax": MinMaxScaler, "robust": RobustScaler}


def import_optional(name: str):
    """Import an OPTIONAL accelerated backend, rejecting stand-in stubs.

    Test harnesses (e.g. ``tests/reference_shim.py``, which makes the
    upstream reference importable) may install auto-stub modules for
    absent packages into ``sys.modules``; a plain ``import shap`` would
    silently pick those up and produce garbage. Real installed packages
    always carry ``__file__`` — stubs don't — so this raises ImportError
    for them and the caller falls back to the self-contained
    implementation."""
    import importlib

    mod = importlib.import_module(name)
    if getattr(mod, "__file__", None) is None:
        raise ImportError(f"optional module {name!r} resolves to a stub")
    return mod


# --------------------------------------------------------------------------- #
# Time strings (reference: deepof/utils.py:717-760)
# --------------------------------------------------------------------------- #


_TIME_RE = re.compile(r"(\d{1,6}):(\d{1,6}):(\d{1,6})(\.\d{1,9})?")


def time_to_seconds(time_string: str) -> Optional[float]:
    """Parse "HH:MM:SS(.sss)" into float seconds at ns resolution
    (None if malformed; spec: deepof/utils.py:717-737)."""
    m = _TIME_RE.fullmatch(time_string)
    if m is None:
        return None
    h, mi, sec, frac = m.groups()
    total_ns = (int(h) * 3600 + int(mi) * 60 + int(sec)) * 10**9
    if frac:
        # ".123" -> 123000000 ns: right-pad the fractional digits.
        total_ns += int(round(float(frac) * 10**9))
    return total_ns / 10**9


def seconds_to_time(seconds: float, cut_milliseconds: bool = True) -> str:
    """Format float seconds as "HH:MM:SS" or "HH:MM:SS.sssssssss"
    (ns precision; spec: deepof/utils.py:740-760)."""
    whole = int(seconds)
    hours, rem = divmod(whole, 3600)
    minutes, secs = divmod(rem, 60)
    stamp = f"{hours:02d}:{minutes:02d}:{secs:02d}"
    if cut_milliseconds:
        return stamp
    frac_ns = int(round((seconds - whole) * 10**9))
    # %09d then truncate to 9 digits (a full-second rounding carry keeps
    # the stamp unchanged, matching the spec's behavior).
    return f"{stamp}.{frac_ns:09d}"[: len(stamp) + 10]


def make_time_index(n_frames: int, frame_rate: float) -> pd.Index:
    """String time index at the video frame rate, ms-rounded, with the
    pandas "0 days " prefix stripped (reference: deepof/data.py:941-948).

    Formats the stamps from the integer ns values directly instead of
    ``.map(lambda t: str(t)[7:])`` — same strings, without one Python
    ``str(Timedelta)`` call per frame (>1 s/recording at 90k frames)."""
    freq_ns = np.round(1e9 / frame_rate)
    idx = pd.timedelta_range(start="0s", periods=n_frames, freq=f"{freq_ns}ns")
    vals = idx.round("ms").asi8  # int64 ns, multiples of 1e6
    secs = vals // 10**9
    us = (vals % 10**9) // 1000  # ms-rounded -> ns part is zero
    hh = (secs % 86400) // 3600  # str(Timedelta)[7:] drops the "D days "
    mm = (secs % 3600) // 60  # prefix, so hours wrap at 24 (parity)
    ss = secs % 60
    return pd.Index(
        [
            f"{h:02d}:{m:02d}:{s:02d}" if u == 0
            else f"{h:02d}:{m:02d}:{s:02d}.{u:06d}"
            for h, m, s, u in zip(
                hh.tolist(), mm.tolist(), ss.tolist(), us.tolist()
            )
        ],
        dtype=object,
    )


# --------------------------------------------------------------------------- #
# Column conventions
# --------------------------------------------------------------------------- #


def classify_column(col, bodyparts) -> Optional[str]:
    """Column kind from its shape (the load-bearing naming convention,
    deepof/utils.py:2395-2422): "coord" for ``(bp, "x"|"y")``, "speed" for
    a bare bodypart string, "dist" for a bodypart pair, "angle" for any
    3-tuple; None otherwise."""
    if isinstance(col, str):
        return "speed" if col in bodyparts else None
    if not isinstance(col, tuple):
        return None
    if len(col) == 3:
        return "angle"
    if len(col) != 2:
        return None
    if col[1] in ("x", "y"):
        return "coord"
    if col[0] in bodyparts and col[1] in bodyparts:
        return "dist"
    return None


def animal_of(bodypart: str) -> Optional[str]:
    """Animal-id prefix of a "{aid}_{bp}" name (None if unprefixed)."""
    head, sep, _ = bodypart.partition("_")
    return head if sep else None


def infer_column_types(df: pd.DataFrame) -> Dict[str, list]:
    """Classify every column into coords / speeds / distances / angles.

    Single pass over the columns via classify_column; distances are
    additionally split into within-animal ("inner") and between-animal
    ("intra") groups because the scaler standardizes them separately.
    """
    bodyparts = {
        c[0] for c in df.columns
        if isinstance(c, tuple) and len(c) == 2 and c[1] in ("x", "y")
    }
    buckets: Dict[str, list] = {
        "coords": [], "speeds": [], "dists": [], "angles": [],
    }
    kind_to_bucket = {
        "coord": "coords", "speed": "speeds", "dist": "dists",
        "angle": "angles",
    }
    for col in df.columns:
        kind = classify_column(col, bodyparts)
        if kind is not None:
            buckets[kind_to_bucket[kind]].append(col)
    same_animal = lambda d: animal_of(d[0]) == animal_of(d[1])  # noqa: E731
    return {
        **buckets,
        "inner_dists": [d for d in buckets["dists"] if same_animal(d)],
        "intra_dists": [d for d in buckets["dists"] if not same_animal(d)],
        "bodyparts": bodyparts,
        "scalars": buckets["speeds"] + buckets["dists"],
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


def compute_size_factors(
    df: pd.DataFrame,
    animal_ids: Sequence[Optional[str]],
    size_ref: Tuple[str, str] = ("Nose", "Tail_base"),
) -> Dict[Optional[str], float]:
    """Per-animal body-size factors: nan-median Nose-Tail_base distance;
    animals with no valid measure fall back to the cohort median.

    Name construction matches the reference exactly (utils.py:2477-2485):
    only ``aid is None`` maps to unprefixed names — the empty-string id the
    pipeline passes for single-animal projects yields "_Nose"-style names
    that miss, so such projects get NO size normalization (divisor 1.0),
    reproducing the reference's behavior bit-for-bit.
    """
    ref_a, ref_b = size_ref
    factors: Dict[Optional[str], float] = {}
    for aid in animal_ids:
        a = ref_a if aid is None else f"{aid}_{ref_a}"
        b = ref_b if aid is None else f"{aid}_{ref_b}"
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


def _size_divisor_plan(
    col_types: Dict[str, list],
    factors: Dict[Optional[str], float],
    default: float,
    inter_scale: str,
) -> List[Tuple[list, float]]:
    """Stage-1 plan: (columns, divisor) groups for body-size normalization.

    Coordinates and speeds divide by their own animal's size factor — only
    when the bodypart's inferred prefix names a known animal (bodyparts
    like "Tail_base" infer a bogus "Tail" prefix in single-animal tables
    and stay unscaled, matching the spec). Distances always scale: by the
    owning animal's factor, or (between animals) the mean / geometric mean
    / cohort default, per ``inter_scale``.
    """
    plan: Dict[tuple, list] = {}
    known = set(factors)

    def add(kind, cols, divisor):
        # Bucket per (column kind, divisor): pandas .loc selection must not
        # mix tuple- and string-typed column keys in one assignment.
        plan.setdefault((kind, float(divisor)), []).extend(cols)

    for bp, axis in col_types["coords"]:
        if animal_of(bp) in known:
            add("coord", [(bp, axis)], factors[animal_of(bp)])
    for bp in col_types["speeds"]:
        if animal_of(bp) in known:
            add("speed", [bp], factors[animal_of(bp)])
    for dist in col_types["dists"]:
        a1, a2 = animal_of(dist[0]), animal_of(dist[1])
        if a1 == a2:
            divisor = factors.get(a1, default)
        elif inter_scale == "mean":
            divisor = (factors.get(a1, default) + factors.get(a2, default)) / 2
        elif inter_scale == "geom":
            divisor = float(
                np.sqrt(factors.get(a1, default) * factors.get(a2, default))
            )
        else:  # "global"
            divisor = default
        add("dist", [dist], divisor)
    return [(cols, div) for (_, div), cols in plan.items()]


def _standardize_section_plan(
    col_types: Dict[str, list],
    dist_standardize: Optional[str],
    speed_standardize: Optional[str],
    coord_standardize: Optional[str],
) -> List[Tuple[list, str]]:
    """Stage-2 plan: (columns, mode) sections to standardize.

    Groupwise distance scaling splits within-animal and between-animal
    distances into separate sections (their scales differ systematically).
    """
    plan: List[Tuple[list, str]] = []
    if speed_standardize:
        plan.append((col_types["speeds"], speed_standardize))
    if dist_standardize == "per_column":
        plan.append((col_types["dists"], "per_column"))
    elif dist_standardize == "groupwise":
        plan.append((col_types["inner_dists"], "groupwise"))
        plan.append((col_types["intra_dists"], "groupwise"))
    if coord_standardize:
        plan.append((col_types["coords"], coord_standardize))
    return [(cols, mode) for cols, mode in plan if cols]


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
    """Two-stage table scaler (semantics: deepof/utils.py:2425-2566).

    Stage 1 divides every section by a body-size factor (nan-median
    Nose-Tail_base length per animal) and log1p-compresses distances;
    stage 2 standardizes each section with a sklearn scaler. Both stages
    are driven by declarative (columns, op) plans built from
    infer_column_types, so section membership and the numeric ops stay
    separated.
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

    num_cols = df.select_dtypes(include=[np.number]).columns
    col_types = infer_column_types(df)

    if animal_ids is None:
        animal_ids = sorted(
            {animal_of(bp) for bp in col_types["bodyparts"] if animal_of(bp)}
        ) or [None]
    # Keep ids exactly as passed: "" stays "" (see compute_size_factors).
    animal_ids = list(animal_ids)
    factors, default = compute_size_factors(df, animal_ids, size_ref)

    # All-numeric tables (the hot feature-table case) run both stages on
    # ONE positional float64 matrix — per-section pandas .loc label
    # resolution and block splitting would otherwise dominate; the
    # numeric ops are identical either way, and the input frame is never
    # touched (no defensive df.copy / astype passes — at recording scale
    # those are two extra ~100 MB copies per call). Mixed-dtype or
    # duplicate-label tables take the label-based path.
    positional = df.shape[1] == len(num_cols) and df.columns.is_unique
    if positional:
        vals = df.to_numpy(dtype=np.float64)
        if not vals.flags.writeable:
            # pandas 3 returns a read-only CoW view when no dtype
            # conversion is needed.
            vals = vals.copy()
        pos = {c: i for i, c in enumerate(df.columns)}

        def read(cols):
            return vals[:, [pos[c] for c in cols]]

        def write(cols, arr):
            vals[:, [pos[c] for c in cols]] = arr

        def finish():
            return pd.DataFrame(
                vals, index=df.index, columns=df.columns, copy=False
            )
    else:
        out = df.copy()
        # Normalize numeric dtypes: feature tables built on the float32
        # device path would otherwise reject float64 scaled values on
        # assignment.
        if len(num_cols) and not all(
            out[c].dtype == np.float64 for c in num_cols
        ):
            out[num_cols] = out[num_cols].astype(np.float64)

        def read(cols):
            return out.loc[:, cols].to_numpy(float)

        def write(cols, arr):
            out.loc[:, cols] = arr

        def finish():
            return out

    # Stage 1: size normalization + distance compression.
    for cols, divisor in _size_divisor_plan(
        col_types, factors, default, inter_scale
    ):
        write(cols, read(cols) / divisor)
    if log_distances and col_types["dists"]:
        write(
            col_types["dists"],
            np.log1p(np.clip(read(col_types["dists"]), 0.0, None)),
        )

    if not standardize:
        return finish()

    # Stage 2: statistical standardization per section.
    for cols, mode in _standardize_section_plan(
        col_types, dist_standardize, speed_standardize, coord_standardize
    ):
        arr = read(cols)
        scaler = SCALERS[scale]()
        if mode == "per_column":
            write(cols, scaler.fit_transform(arr))
        else:  # groupwise: one shared scale across the whole section
            write(
                cols,
                scaler.fit_transform(arr.reshape(-1, 1)).reshape(arr.shape),
            )
    return finish()


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


# --------------------------------------------------------------------------- #
# Reference-parity utility surface (deepof/utils.py public functions)
# --------------------------------------------------------------------------- #


def row_nanargmax(arr):
    """Per-row argmax ignoring NaNs; all-NaN rows yield NaN
    (spec: deepof/utils.py row_nanargmax)."""
    arr = np.asarray(arr, float)
    finite = ~np.isnan(arr)
    out = np.where(np.isnan(arr), -np.inf, arr).argmax(axis=1).astype(float)
    out[~finite.any(axis=1)] = np.nan
    return out


def infer_scalar_cols(df: pd.DataFrame):
    """Speed + distance column names of a merged feature table."""
    return infer_column_types(df)["scalars"]


def edges_to_weighted_adj(adj: np.ndarray, edges: np.ndarray):
    """Per-sample weighted adjacency from edge features.

    ``edges[..., k]`` is the weight of the k-th edge in sorted
    upper-triangle order (the graph-dataset edge convention); the weight is
    scattered symmetrically into (i, j) and (j, i). Leading axes of
    ``edges`` (samples, optionally time) become leading axes of the output.
    Spec: deepof/utils.py:514-529 (whose row-major fill this replaces with
    an explicit symmetric scatter).
    """
    adj = np.asarray(adj)
    edges = np.asarray(edges, float)
    ii, jj = np.nonzero(np.triu(adj, k=1))
    if edges.shape[-1] != len(ii):
        raise ValueError(
            f"{edges.shape[-1]} edge features for {len(ii)} graph edges"
        )
    out = np.zeros(edges.shape[:-1] + adj.shape, float)
    out[..., ii, jj] = edges
    out[..., jj, ii] = edges
    return out


def count_events(
    binary_behavior: np.ndarray, counting_mode: str = "Events", frame_rate: float = 1
):
    """Count a binary behavior trace as Frames / Time / Events / Transitions
    (utils.py count_events)."""
    b = np.asarray(binary_behavior)
    if counting_mode == "Frames":
        return np.sum(b)
    if counting_mode == "Time":
        return np.sum(b) / frame_rate
    if counting_mode == "Events":
        onsets = np.diff(b.astype(np.int8))
        n = int(np.sum(onsets == 1))
        if len(b) > 0 and int(b[0]) == 1:
            n += 1
        return n
    if counting_mode == "Transitions":
        return int(np.sum((b[:-1] == 1) & (b[1:] == 1)))
    raise ValueError(f"Unknown counting_mode: {counting_mode!r}")


def filter_short_bouts(
    cluster_assignments: np.ndarray,
    cluster_confidence: np.ndarray,
    confidence_indices: np.ndarray,
    min_confidence: float = 0.0,
    min_bout_duration: int = None,
):
    """Keep-mask over frames: drop bouts shorter than min_bout_duration and
    bouts whose mean confidence falls below min_confidence
    (spec: deepof/utils.py:3910-3958).

    Fully vectorized: frames are labeled with a bout id (cumulative count
    of assignment changes); per-bout lengths and confidence means come from
    bincount over those ids.
    """
    cluster_assignments = np.asarray(cluster_assignments)
    keep = np.asarray(confidence_indices, bool).copy()

    is_new_bout = np.ones(len(cluster_assignments), bool)
    is_new_bout[1:] = cluster_assignments[1:] != cluster_assignments[:-1]
    bout_id = np.cumsum(is_new_bout) - 1

    lengths = np.bincount(bout_id)
    if min_bout_duration is None:
        min_bout_duration = lengths.mean()
    keep &= (lengths >= min_bout_duration)[bout_id]

    conf_sums = np.bincount(bout_id, weights=np.asarray(cluster_confidence, float))
    mean_conf = conf_sums / lengths
    return (mean_conf[bout_id] >= min_confidence) & keep


def align_embeddings_at_key(
    embeddings, supervised_annotations, key, window_size=None,
    alignment_mode="center",
):
    """Align window embeddings with frame-level supervised labels for one
    experiment: pick the window-center label ("center") or the per-window
    OR ("any") (utils.py align_embeddings_at_key)."""
    from deepof_tpu.core.storage import get_dt

    assert key in embeddings.keys() and key in supervised_annotations.keys(), (
        "Key not found in at least one of both table dicts!"
    )
    cur_emb = get_dt(embeddings, key)
    cur_sup = get_dt(supervised_annotations, key)
    assert cur_emb.shape[0] <= cur_sup.shape[0], "Labels exceed windows!"
    if window_size is None:
        window_size = cur_sup.shape[0] - cur_emb.shape[0] + 1
    start = window_size // 2
    end = start + cur_emb.shape[0]
    if alignment_mode == "center":
        aligned = cur_sup.iloc[start:end].reset_index(drop=True)
    elif alignment_mode == "any":
        aligned = (
            cur_sup.rolling(window=window_size, min_periods=window_size)
            .max().reset_index(drop=True)
        )
        aligned = aligned.iloc[start:end].reset_index(drop=True)
    else:
        raise NotImplementedError('Only "center" and "any" modes are available')
    assert cur_emb.shape[0] == aligned.shape[0], "Alignment unsuccessful!"
    return cur_emb, aligned


def get_total_Frames(video_paths) -> int:
    """Total frame count over a {key: path} dict of videos."""
    try:
        import cv2
    except ImportError:  # pragma: no cover
        raise ImportError("get_total_Frames requires OpenCV")
    total = 0
    paths = video_paths.values() if isinstance(video_paths, dict) else video_paths
    for path in paths:
        cap = cv2.VideoCapture(str(path))
        total += int(cap.get(cv2.CAP_PROP_FRAME_COUNT) or 0)
        cap.release()
    return total


def rename_track_bps(loaded_tab: pd.DataFrame, rename_bodyparts_dict: list = None, animal_ids: list = None, rename_bodyparts: list = None):
    """Rename body parts in a loaded tracking DataFrame: maps current
    bodypart names (order of appearance) to the provided list, preserving
    animal-id prefixes (utils.py rename_track_bps). ``rename_bodyparts``
    is the repo alias of the reference's ``rename_bodyparts_dict``."""
    rename_bodyparts = (
        rename_bodyparts if rename_bodyparts is not None else rename_bodyparts_dict
    )
    tab = loaded_tab.copy()
    prefixes = [f"{aid}_" for aid in animal_ids] if animal_ids and animal_ids != [""] else [""]
    current = list(dict.fromkeys(tab.columns.get_level_values(0)))
    bare = list(dict.fromkeys(
        c[len(p):] if any(c.startswith(p) and p for p in prefixes) else c
        for c in current
        for p in [next((p for p in prefixes if p and c.startswith(p)), "")]
    ))
    mapping = dict(zip(bare, rename_bodyparts))
    new_cols = []
    for col in tab.columns:
        name = col[0]
        pref = next((p for p in prefixes if p and name.startswith(p)), "")
        base = name[len(pref):]
        new_cols.append((pref + mapping.get(base, base),) + tuple(col[1:]))
    tab.columns = pd.MultiIndex.from_tuples(new_cols, names=tab.columns.names)
    return tab


def validate_parameter(
    param_name, param_value, valid_options, is_list: bool = False,
    custom_error_if_empty=None, only_one_of_many: bool = True,
    can_be_dict: bool = False,
):
    """Validate a parameter against valid options with actionable errors
    (utils.py validate_parameter)."""
    if param_value is None or (is_list and not param_value):
        if custom_error_if_empty:
            raise ValueError(custom_error_if_empty)
        return
    if can_be_dict and isinstance(param_value, dict):
        values = list(param_value.keys())
    elif is_list or isinstance(param_value, (list, tuple)):
        values = list(param_value) if isinstance(param_value, (list, tuple)) else [param_value]
        if only_one_of_many and not is_list and len(values) > 1:
            raise ValueError(f"{param_name} accepts a single value, got {values}")
    else:
        values = [param_value]
    invalid = [v for v in values if v not in valid_options]
    if invalid:
        raise ValueError(
            f"Invalid value(s) {invalid} for {param_name!r}; valid options "
            f"are {list(valid_options)}"
        )


def mouse_in_roi(tab, aid, in_roi_criterion, roi_polygon, invert_roi=False,
                 run_numba=False):
    """Boolean in-ROI mask for an animal in a coordinate table by
    criterion bodypart(s) or "all" (utils.py mouse_in_roi)."""
    import jax.numpy as jnp

    from deepof_tpu.ops import point_in_polygon

    if isinstance(in_roi_criterion, str):
        in_roi_criterion = [in_roi_criterion]
    if aid:
        if "all" in in_roi_criterion:
            bodyparts = [
                c for c in tab.columns.get_level_values(0).unique()
                if c.startswith(aid)
            ]
        else:
            bodyparts = [f"{aid}_{bp}" for bp in in_roi_criterion]
    else:
        bodyparts = (
            tab.columns.get_level_values(0).unique()
            if "all" in in_roi_criterion else in_roi_criterion
        )
    roi_polygon = np.asarray(roi_polygon)
    mask = np.ones(len(tab), dtype=bool)
    for bp in bodyparts:
        pts = np.array(tab.loc[:, pd.IndexSlice[bp, ["x", "y"]]].to_numpy())
        mask &= np.asarray(point_in_polygon(jnp.asarray(pts), roi_polygon))
    return np.invert(mask) if invert_roi else mask


def get_behavior_mask_and_confidence(tab, behaviors, supervised_export: bool):
    """Boolean mask + confidence frame for behaviors: >0.1 columns for
    supervised tables, argmax identity for soft counts (utils.py)."""
    if isinstance(behaviors, str):
        behaviors = [behaviors]
    if isinstance(tab, pd.DataFrame) and supervised_export:
        assert all(b in list(tab.columns) for b in behaviors), (
            "Some behavior names do not exist in the table!"
        )
        mask = tab[behaviors] > 0.1
        confidence = tab[behaviors]
    else:
        df = pd.DataFrame(np.asarray(tab))
        df.columns = [str(c) for c in df.columns]
        most_likely = df.idxmax(axis=1)
        behaviors = [str(b) for b in behaviors]
        mask = pd.DataFrame({b: (most_likely == b) for b in behaviors})
        confidence = df[behaviors]
    return mask, confidence


def get_supervised_behaviors_in_roi(cur_supervised, local_bin_info, animal_ids,
                                    roi_mode: str = "mousewise"):
    """NaN-out supervised detections outside the ROI
    (spec: deepof/utils.py:1986-2024).

    local_bin_info maps animal_id -> boolean in-ROI array per frame (plus
    the "time" index array). "mousewise" blanks whole frames where any
    requested animal leaves the ROI; "behaviorwise" blanks only the
    behavior columns involving an out-of-ROI animal (and all columns not
    involving the requested animals).
    """
    if not animal_ids:
        return cur_supervised
    if isinstance(animal_ids, str):
        animal_ids = [animal_ids]
    out = cur_supervised.copy()

    if roi_mode == "mousewise":
        combined = np.logical_and.reduce(
            [np.asarray(local_bin_info[aid], bool) for aid in animal_ids]
        )
        out.loc[~combined, :] = np.nan
        return out
    if roi_mode != "behaviorwise":
        raise NotImplementedError(
            'roi_mode must be "mousewise" or "behaviorwise"'
        )

    def base_name(col):
        return col[0] if isinstance(col, tuple) else col

    valid = {
        c for c in out.columns
        if any(str(base_name(c)).startswith(aid) for aid in animal_ids)
    }
    invalid = [c for c in out.columns if c not in valid]
    if invalid:
        out[invalid] = np.nan
    mask_ids = [k for k in local_bin_info.keys() if k != "time"]
    for aid in mask_ids:
        token = f"{aid}_" if len(mask_ids) > 1 else aid
        cols = [c for c in valid if token in str(base_name(c))]
        if cols:
            out.loc[~np.asarray(local_bin_info[aid], bool), cols] = np.nan
    return out


def get_behavior_frames_in_roi(behavior, local_bin_info, animal_ids):
    """Frame indices for which the relevant animals are inside the ROI
    (spec: deepof/utils.py:2054-2100).

    For a supervised behavior name carrying an "{aid}_" prefix, only that
    animal's mask applies; otherwise all requested animals must be inside.
    """
    if isinstance(animal_ids, str):
        animal_ids = [animal_ids]
    elif animal_ids is None:
        animal_ids = [""]
    frames = np.array(local_bin_info["time"], copy=True)
    prefixed = behavior is not None and any(
        f"{aid}_" in str(behavior) for aid in animal_ids
    )
    if prefixed:
        for aid in local_bin_info.keys():
            if aid != "time" and f"{aid}_" in str(behavior):
                frames[~np.asarray(local_bin_info[aid], bool)] = -1
    else:
        for aid in animal_ids:
            frames[~np.asarray(local_bin_info[aid], bool)] = -1
    return frames[frames >= 0]


def get_unsupervised_behaviors_in_roi(cur_unsupervised, local_bin_info, animal_ids):
    """Mask unsupervised assignments outside the ROI: NaN for 2D soft
    counts, -1 for 1D hard labels (utils.py)."""
    out = np.array(cur_unsupervised)
    if isinstance(animal_ids, str):
        animal_ids = [animal_ids]
    elif animal_ids is None:
        animal_ids = [""]
    for aid in animal_ids:
        bad = ~np.asarray(local_bin_info[aid], bool)
        if out.ndim == 1:
            out[bad] = -1
        else:
            out = out.astype(float)
            out[bad] = np.nan
    return out


def _compute_transition_matrices(
    extended_behaviors: np.ndarray,
    frame_rate: float,
    diagonal_behavior_counting: str,
    normalize_events: bool,
):
    """(associations, paired_events) from (K, T) extended detections
    (utils.py _compute_transition_matrices): off-diagonal [i, j] counts
    onsets of j while i is active; diagonal uses count_events in the
    requested mode. Onset detection and the active-at-onset sums are
    vectorized over all behavior pairs."""
    eb = np.nan_to_num(np.asarray(extended_behaviors, float))
    k, t = eb.shape
    onsets = np.zeros_like(eb, dtype=np.int8)
    onsets[:, :-1] = np.diff(eb.astype(np.int8), axis=1)
    onset_mask = (onsets == 1).astype(float)
    # associations[i, j] = sum over t of eb[i, t] * onset_j[t]
    associations = eb @ onset_mask.T
    for i in range(k):
        associations[i, i] = count_events(
            eb[i], counting_mode=diagonal_behavior_counting,
            frame_rate=frame_rate,
        )
    paired_events = np.zeros((k, k))
    if normalize_events:
        ev = np.array([count_events(eb[i], "Events") for i in range(k)], float)
        paired_events = ev[:, None] + ev[None, :]
    return associations, paired_events


def count_transitions(
    tab_dict,
    exp_conditions: dict,
    bin_info: dict = None,
    animals_in_roi: list = None,
    delta_T: float = 0.5,
    frame_rate: float = 1,
    silence_diagonal: bool = False,
    aggregate: bool = True,
    normalize: bool = True,
    diagonal_behavior_counting: str = "Transitions",
    custom_continuous_behavior_names: list = (),
):
    """Behavior-to-behavior transition matrices over supervised tables or
    soft counts (utils.py count_transitions).

    Supervised DataFrames keep their binary columns (continuous behaviors
    dropped) and each bout is extended by delta_T seconds before counting;
    soft-count arrays are argmax-hardened into Cluster_i indicators.
    Returns (transitions_dict keyed by condition or experiment, columns,
    combined "A-x-B" pair names).
    """
    import jax.numpy as jnp

    from deepof_tpu.config import CONTINUOUS_BEHAVIORS
    from deepof_tpu.core.storage import get_dt
    from deepof_tpu.ops.bouts import extend_behaviors

    transitions_dict, paired_events_dict = {}, {}
    first = get_dt(tab_dict, list(tab_dict.keys())[0])
    is_pandas = isinstance(first, pd.DataFrame)
    normalize_events = bool(is_pandas and normalize)
    drop_suffixes = tuple(CONTINUOUS_BEHAVIORS) + tuple(
        custom_continuous_behavior_names
    )

    columns = None
    combined_columns = None
    for z, key in enumerate(tab_dict.keys()):
        tab = get_dt(tab_dict, key)
        if bin_info is not None and key in bin_info:
            idx = bin_info[key]["time"] if isinstance(bin_info[key], dict) \
                else bin_info[key]
            tab = tab.iloc[idx] if hasattr(tab, "iloc") else np.asarray(tab)[idx]
            if (
                animals_in_roi
                and isinstance(bin_info[key], dict)
                and hasattr(tab, "columns")
            ):
                # NaN-out detections where the requested animals are
                # outside the ROI before transition counting.
                tab = get_supervised_behaviors_in_roi(
                    tab.reset_index(drop=True), bin_info[key], animals_in_roi
                )
        if isinstance(tab, np.ndarray) or not hasattr(tab, "columns"):
            arr = np.asarray(tab)
            hard = np.zeros_like(arr, dtype=int)
            hard[np.arange(arr.shape[0]), arr.argmax(1)] = 1
            cols = [f"Cluster_{i}" for i in range(arr.shape[1])]
            tab = pd.DataFrame(hard, columns=cols)
        keep = [c for c in tab.columns if not str(c).endswith(drop_suffixes)]
        tab = tab[keep]
        columns = list(tab.columns)
        combined_columns = [f"{a}-x-{b}" for a in columns for b in columns]

        eb = np.asarray(
            extend_behaviors(
                jnp.asarray(np.nan_to_num(tab.to_numpy(float)).T > 0),
                delta_T, frame_rate,
            )
        ).astype(float)

        if z == 0 and aggregate:
            n = len(columns)
            for cond in set(map(str, exp_conditions.values())):
                transitions_dict[cond] = np.zeros((n, n))
                paired_events_dict[cond] = np.zeros((n, n))

        associations, paired_events = _compute_transition_matrices(
            eb, frame_rate=frame_rate,
            diagonal_behavior_counting=diagonal_behavior_counting,
            normalize_events=normalize_events,
        )
        if silence_diagonal:
            np.fill_diagonal(associations, 0)

        if aggregate:
            cond = str(exp_conditions[key])
            transitions_dict[cond] += associations
            paired_events_dict[cond] += paired_events
        else:
            transitions_dict[key] = associations
            paired_events_dict[key] = paired_events

    if normalize and not normalize_events:
        transitions_dict = {
            k: np.nan_to_num(v / v.sum(axis=1, keepdims=True))
            for k, v in transitions_dict.items()
        }
    elif normalize_events:
        transitions_dict = {
            k: np.nan_to_num(v / (paired_events_dict[k] - 1))
            for k, v in transitions_dict.items()
        }
    return transitions_dict, columns, combined_columns


# --------------------------------------------------------------------------- #
# Reference-named numeric API (migration layer)
# --------------------------------------------------------------------------- #
# The reference exposes its kernel library as public functions on
# deepof.utils (deepof/utils.py:814-3632). The TPU-native implementations
# live in deepof_tpu.ops under idiomatic names; these wrappers keep the
# reference's exact names, signatures, and pandas in/out contracts so
# migrating user code keeps working.


def bp2polar(tab) -> pd.DataFrame:
    """Cartesian (x, y) table of ONE bodypart -> polar (rho, phi)
    DataFrame (deepof/utils.py:814-831)."""
    arr = np.array(tab, dtype=float)
    if arr.ndim == 1:
        arr = arr.reshape(1, -1)
    z = arr[:, 0] + 1j * arr[:, 1]
    return pd.DataFrame({"rho": np.abs(z), "phi": np.angle(z)})


def tab2polar(cartesian_df: pd.DataFrame) -> pd.DataFrame:
    """Whole coordinate table -> polar, preserving bodypart order and
    index (deepof/utils.py:833-861)."""
    if isinstance(cartesian_df.columns, pd.MultiIndex):
        bps = [c[0] for c in cartesian_df.columns]
        bps = list(np.array(bps)[np.unique(bps, return_index=True)[1]])
    else:
        bps = list(cartesian_df.columns)
    parts = [bp2polar(cartesian_df[bp]) for bp in bps]
    out = pd.concat(parts, axis=1)
    out.columns = pd.MultiIndex.from_product([bps, ["rho", "phi"]])
    out.index = cartesian_df.index
    return out


def compute_dist(pair_array: np.ndarray) -> pd.DataFrame:
    """Euclidean distance over time for one bodypart pair given as an
    (N, 4) [ax, ay, bx, by] (or (N, 2) 1-D) stack
    (deepof/utils.py:863-881)."""
    pair_array = np.asarray(pair_array, dtype=float)
    lim = 2 if pair_array.shape[1] == 4 else 1
    ab = pair_array[:, :lim] - pair_array[:, lim:]
    return pd.DataFrame(np.sqrt(np.einsum("...i,...i", ab, ab)))


def bpart_distance(dataframe: pd.DataFrame) -> pd.DataFrame:
    """All-pairs bodypart distances of a MultiIndex coordinate table,
    columns named by sorted-combination tuples (deepof/utils.py:884-903).
    Runs as one jitted all-pairs kernel (ops.pairwise_distances)."""
    from itertools import combinations

    import jax.numpy as jnp

    from deepof_tpu.ops import all_pair_indices, pairwise_distances

    bps = list(dataframe.columns.levels[0])
    pos = np.stack(
        [dataframe[bp].to_numpy(float) for bp in bps], axis=1
    )  # (T, B, 2)
    pairs = all_pair_indices(len(bps))
    dists = np.asarray(
        pairwise_distances(jnp.asarray(pos), np.asarray(pairs, np.int32))
    )
    cols = [tuple(idx) for idx in combinations(bps, 2)]
    return pd.DataFrame(dists, columns=cols, index=dataframe.index)


def angle(bpart_array: np.ndarray) -> np.ndarray:
    """Unsigned angle at b for (a, b, c) position stacks of shape
    (3, T, 2) (deepof/utils.py:906-929)."""
    a, b, c = np.asarray(bpart_array, dtype=float)
    ba, bc = a - b, c - b
    cos = np.einsum("...i,...i", ba, bc) / (
        np.linalg.norm(ba, axis=1) * np.linalg.norm(bc, axis=1)
    )
    return np.arccos(np.clip(cos, -1, 1))


def signed_angle(bpart_array: np.ndarray) -> np.ndarray:
    """(sin, cos) of the signed angle at b for (a, b, c) stacks
    (deepof/utils.py:932-954)."""
    a, b, c = np.asarray(bpart_array, dtype=float)
    ab, bc = a - b, c - b
    dot = (ab * bc).sum(-1)
    det = ab[..., 0] * bc[..., 1] - ab[..., 1] * bc[..., 0]
    theta = np.arctan2(det, dot)
    return np.stack([np.sin(theta), np.cos(theta)], axis=1)


def compute_areas(polygon_xy_stack: np.ndarray) -> np.ndarray:
    """Shoelace polygon areas for an (N, P, 2) stack; NaN where any
    vertex is missing (deepof/utils.py:957-979)."""
    import jax.numpy as jnp

    from deepof_tpu.ops import polygon_areas

    stack = np.asarray(polygon_xy_stack, dtype=float)
    areas = np.array(  # device arrays surface read-only; copy before edit
        polygon_areas(
            jnp.asarray(stack), np.arange(stack.shape[1], dtype=np.int32)
        )
    )
    areas[np.isnan(stack).any(axis=(1, 2))] = np.nan
    return areas


def rolling_window(
    a: np.ndarray, window_size: int, window_step: int, automatic_changepoints=False, precomputed_breaks=None,
):
    """Stride-tricks sliding windows (deepof/utils.py:3354-3377)."""
    from deepof_tpu.ops.windows import rolling_windows_host

    return rolling_windows_host(np.asarray(a), window_size, window_step)


def smooth_mult_trajectory(
    series: np.ndarray, alpha: int = 0, w_length: int = 15
) -> np.ndarray:
    """Savitzky-Golay smoothing with the reference's alpha->polyorder
    convention (polyorder = w_length - alpha; alpha 0 = identity)
    (deepof/utils.py:3477-3516)."""
    import jax.numpy as jnp

    from deepof_tpu.ops import savgol_edges_host, savgol_smooth

    series = np.asarray(series, dtype=float)
    if not alpha:
        return series
    squeeze = series.ndim == 1
    x = series.reshape(len(series), -1)
    polyorder = w_length - int(alpha)
    e_start, e_end = savgol_edges_host(x, w_length, polyorder)
    out = np.asarray(
        savgol_smooth(
            jnp.asarray(x), w_length, polyorder,
            (jnp.asarray(e_start), jnp.asarray(e_end)),
        )
    )
    return out.reshape(series.shape) if not squeeze else out[:, 0]


def get_point_polygon_distance(points: np.ndarray, polygon) -> np.ndarray:
    """Distance of each point to a polygon's boundary
    (deepof/utils.py:1477-1512; shapely replaced by the jitted
    segment-distance kernel). ``polygon`` is an (M, 2) vertex array or a
    shapely-like object exposing exterior coordinates."""
    import jax.numpy as jnp

    from deepof_tpu.ops.geometry import point_to_polygon_distance

    if hasattr(polygon, "exterior"):
        polygon = np.asarray(polygon.exterior.coords)
    return np.asarray(
        point_to_polygon_distance(
            jnp.asarray(np.asarray(points, float)), np.asarray(polygon, float)
        )
    )


def compute_animal_presence_mask(quality, threshold: float = 0.5):
    """Per-frame animal presence from median tracking quality
    (deepof/utils.py:576-603). Returns a TableDict of (T, A) 0/1 frames."""
    from deepof_tpu.core.table_dict import TableDict

    masks = {}
    for exp in quality.keys():
        per_animal = {}
        for aid in quality._animal_ids:
            per_animal[aid] = (
                quality.filter_id(aid)[exp].median(axis=1) > threshold
            ).astype(int)
        masks[exp] = pd.DataFrame(per_animal)
    return TableDict(
        masks, typ="animal_presence_mask",
        table_path=getattr(quality, "_table_path", None),
        animal_ids=quality._animal_ids,
    )


def set_missing_animals(coordinates, tab_dict, lik_dict, animal_ids=None):
    """NaN out frames where an animal is absent, per table
    (deepof/utils.py:676-713). Works on dicts of DataFrames; presence
    comes from the coordinates' stored masks."""
    for key, tab in tab_dict.items():
        if isinstance(tab, pd.DataFrame):
            tab_dict[key] = coordinates._set_missing_animals_frame(tab, key)
    return tab_dict


def load_precompiled_model(path, download_path, model_path, model_name):
    """Download-on-miss loader for the precompiled SAM/immobility models
    (deepof/utils.py:3743-3780): resolves the checkpoint (fetching it to
    ``model_path`` when absent), then loads a SAM predictor for ``.pth``
    or a legacy sklearn pickle for ``.pkl``."""
    import os

    from deepof_tpu.legacy_compat import load_pickle_compat

    if path is None:
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), model_path
        )
    if not os.path.exists(path) and download_path:
        import urllib.request

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        print(f"{model_name} not found. Downloading...")
        urllib.request.urlretrieve(download_path, path)
    if path.endswith(".pth"):
        from deepof_tpu.arena import _maybe_load_sam

        predictor = _maybe_load_sam(path)
        if predictor is None:
            raise ImportError(
                "segment-anything is required to load SAM checkpoints "
                "(or register a backend via "
                "deepof_tpu.arena.set_segmentation_predictor)."
            )
        return predictor
    return load_pickle_compat(path)


def full_outlier_mask(
    experiment: pd.DataFrame,
    likelihood: pd.DataFrame,
    likelihood_tolerance: float,
    exclude: str,
    lag: int,
    n_std: int,
    mode: str,
) -> pd.DataFrame:
    """Boolean outlier mask over every bodypart of one experiment
    (deepof/utils.py:3584-3631) — runs as ONE batched jitted kernel
    (ops.mask_outliers) instead of the reference's per-bodypart loop."""
    import jax.numpy as jnp

    from deepof_tpu.ops import mask_outliers

    bps = [bp for bp in experiment.columns.levels[0] if bp != exclude]
    xy = np.stack([experiment[bp].to_numpy(float) for bp in bps], axis=1)
    lik = np.stack([likelihood[bp].to_numpy(float).reshape(-1) for bp in bps], axis=1)
    mask = np.asarray(
        mask_outliers(
            jnp.asarray(xy), jnp.asarray(lik), float(likelihood_tolerance),
            lag=int(lag), n_std=float(n_std), mode=mode,
        )
    )
    # Build the boolean frame directly (pandas 3 refuses lossy bool->float
    # setitem into the copied float table), preserving column order.
    kept_cols = [
        c for c in experiment.columns if not (exclude and c[0] == exclude)
    ]
    data = {}
    for i, bp in enumerate(bps):
        data[(bp, "x")] = mask[:, i]
        data[(bp, "y")] = mask[:, i]
    out = pd.DataFrame(data, index=experiment.index)
    return out[kept_cols]


class MouseTrackingImputer:
    """Gap imputation for tracking tables (deepof/utils.py:198-413):
    linear interpolation for small gaps (limit 3), and — in full mode —
    iterative ridge imputation, Kalman/RTS smoothing, and skeleton-length
    constraints estimated from complete frames, all running through the
    jitted kernels in deepof_tpu.ops.imputation."""

    def __init__(self, n_iterations=10, connectivity=None, full_imputation=False):
        self.full_imputation = full_imputation
        self.n_iterations = n_iterations
        self.connectivity = connectivity
        self.lin_interp_limit = 3

    def fit_transform(self, data: pd.DataFrame) -> np.ndarray:
        import jax.numpy as jnp

        from deepof_tpu.ops import (
            enforce_skeleton_constraints,
            estimate_skeleton_constraints,
            iterative_ridge_impute,
            kalman_rts_smooth,
        )

        coord_cols = [c for c in data.columns if c[0] != "Row"]
        tab = data[coord_cols]
        filled = tab.interpolate(
            method="linear", limit=self.lin_interp_limit,
            limit_direction="both",
        )
        out = data.copy()
        out[coord_cols] = filled
        if not self.full_imputation or not filled.isna().any().any():
            return out.to_numpy()

        bps = list(dict.fromkeys(c[0] for c in coord_cols))
        block = np.stack([filled[bp].to_numpy(float) for bp in bps], axis=1)
        original = np.isfinite(block)
        edges = []
        if self.connectivity is not None:
            idx = {bp: i for i, bp in enumerate(bps)}
            for p1, nbrs in self.connectivity.adj.items():
                for p2 in nbrs:
                    if p1 in idx and p2 in idx:
                        edges.append((idx[p1], idx[p2]))
        constraints = (
            estimate_skeleton_constraints(block, edges) if edges else None
        )
        t = block.shape[0]
        imputed = np.array(
            iterative_ridge_impute(jnp.asarray(block.reshape(t, -1), jnp.float32))
        ).reshape(block.shape)
        imputed[original] = block[original]
        smoothed = np.array(kalman_rts_smooth(jnp.asarray(imputed, jnp.float32)))
        smoothed[original] = block[original]
        if constraints is not None:
            smoothed = np.asarray(
                enforce_skeleton_constraints(
                    jnp.asarray(smoothed, jnp.float32), constraints,
                    jnp.asarray(original),
                )
            )
        for i, bp in enumerate(bps):
            out[(bp, "x")] = smoothed[:, i, 0]
            out[(bp, "y")] = smoothed[:, i, 1]
        return out.to_numpy()


def iterative_imputation(project, tab_dict, lik_dict, full_imputation: bool = False):
    """Impute occluded bodyparts per animal and experiment
    (deepof/utils.py:605-674): presence-masked rows of each animal are
    imputed with MouseTrackingImputer and written back in place."""
    presence = compute_animal_presence_mask(
        _as_quality_dict(project, lik_dict)
    )
    for key, tab in list(tab_dict.items()):
        if not isinstance(tab, pd.DataFrame):
            continue
        tab = tab.copy()
        for aid in project.animal_ids:
            cols = filter_columns(tab.columns, aid) if aid else list(tab.columns)
            if not cols:
                continue
            rows = np.where(presence[key][aid].to_numpy())[0]
            if len(rows) < 2:
                continue
            sub = tab.loc[tab.index[rows], cols]
            imputer = MouseTrackingImputer(
                connectivity=(
                    project.connectivity.get(aid)
                    if isinstance(getattr(project, "connectivity", None), dict)
                    else getattr(project, "connectivity", None)
                ),
                full_imputation=full_imputation,
            )
            imputed = imputer.fit_transform(sub)
            tab.loc[tab.index[rows], cols] = imputed
        tab_dict[key] = tab
    return tab_dict


def _as_quality_dict(project, lik_dict):
    """Wrap raw likelihood frames into the TableDict quality container
    compute_animal_presence_mask expects."""
    from deepof_tpu.core.table_dict import TableDict

    return TableDict(
        dict(lik_dict), typ="quality", table_path=None,
        animal_ids=list(project.animal_ids),
    )


class KeyErrorMessage(str):
    """str whose repr prints verbatim, so multi-line KeyError messages stay
    readable (deepof/utils.py:63-64)."""

    def __repr__(self):
        return str(self)


# --------------------------------------------------------------------------- #
# Remaining reference-name surface (migration layer, part 2)
# --------------------------------------------------------------------------- #
# The implementations live under idiomatic homes (deepof_tpu.ops,
# io.conditions, core.graph, evaluation, posthoc); these wrappers and
# re-exports make `from deepof.utils import <name>` migrations work for
# every public deepof.utils name.


def moving_average(time_series, lag: int = 5) -> np.ndarray:
    """Same-mode moving average (deepof/utils.py:3504-3517)."""
    return np.convolve(np.asarray(time_series, float), np.ones(lag) / lag, mode="same")


def rotate(p, angles, origin=np.array([0, 0])) -> np.ndarray:
    """2D rotation of positions by ``angles`` radians around ``origin``
    (deepof/utils.py:1298-1320)."""
    r = np.array(
        [[np.cos(angles), -np.sin(angles)], [np.sin(angles), np.cos(angles)]]
    )
    o = np.atleast_2d(origin)
    p = np.atleast_2d(p)
    return np.squeeze((r @ (p.T - o.T) + o.T).T)


def align_trajectories(data, mode: str = "all", run_numba: bool = False):
    """Remove rotational variance: rotate so feature column 0's bodypart
    lands on the +y axis (deepof/utils.py:2097-2142). ``run_numba`` is
    accepted for parity; everything runs the jitted kernel."""
    import jax.numpy as jnp

    from deepof_tpu.ops import align_trajectories as _align

    data = np.asarray(data, float)
    dshape = data.shape
    l = dshape[-1]
    if mode == "center":
        arr = data.reshape(dshape[0], dshape[1], l // 2, 2)
        out = np.asarray(_align(jnp.asarray(arr), mode="center"))
        return out.reshape(dshape)
    flat = data.reshape(-1, l // 2, 2)
    out = np.asarray(_align(jnp.asarray(flat), mode=mode))
    return out.reshape(dshape)


def mask_outliers(
    time_series: pd.DataFrame,
    likelihood,
    likelihood_tolerance: float,
    lag: int,
    n_std: int,
    mode: str,
):
    """Outlier mask for ONE bodypart's (x, y) table
    (deepof/utils.py:3536-3583): moving-average residual deviation plus a
    likelihood floor."""
    import jax.numpy as jnp

    from deepof_tpu.ops import mask_outliers as _mask

    xy = np.stack(
        [np.asarray(time_series["x"], float), np.asarray(time_series["y"], float)],
        axis=1,
    )[:, None, :]
    lik = np.asarray(likelihood, float).reshape(-1, 1)
    mask = np.asarray(
        _mask(
            jnp.asarray(xy), jnp.asarray(lik), float(likelihood_tolerance),
            lag=int(lag), n_std=float(n_std), mode=mode,
        )
    )[:, 0]
    return pd.Series(mask, index=time_series.index)


def remove_outliers(
    experiment: pd.DataFrame,
    likelihood: pd.DataFrame,
    likelihood_tolerance: float,
    exclude: str = "",
    lag: int = 5,
    n_std: int = 3,
    mode: str = "or",
):
    """NaN out detected outliers across all bodyparts; returns
    ``(masked_experiment, warn_nans)`` with the reference's >30% NaN
    warning flag (deepof/utils.py:3632-3673)."""
    mask = full_outlier_mask(
        experiment, likelihood, likelihood_tolerance, exclude, lag, n_std, mode
    )
    out = experiment.copy()
    out[mask] = np.nan
    warn_nans = float(mask.to_numpy().mean()) > 0.3
    return out, warn_nans


def rolling_speed(
    dframe: pd.DataFrame,
    frame_rate: int = 1,
    window: int = 3,
    rounds: int = 3,
    deriv: int = 1,
    shift: int = 2,
    typ: str = "coords",
) -> pd.DataFrame:
    """n-th order speed (mm/s) per bodypart (deepof/utils.py:3788-3860):
    displacement over ``shift`` frames, trailing ``window``-frame rolling
    mean rounded to ``rounds`` decimals, times ``frame_rate``."""
    import jax.numpy as jnp

    from deepof_tpu.ops import rolling_speed as _rs

    if isinstance(dframe.columns, pd.MultiIndex):
        seen = list(dict.fromkeys(c[0] for c in dframe.columns))
        # Reference quirk reproduced for drop-in compatibility: the data
        # stays in DataFrame column order, but the output labels come from
        # the np.unique first-occurrence trick, which SORTS them
        # (deepof/utils.py:3810-3815,3850). For unsorted inputs the labels
        # are therefore permuted relative to the data, exactly as upstream.
        labels = list(
            np.array(seen)[np.unique(seen, return_index=True)[1]]
        )
    else:
        seen = labels = list(dframe.columns)
    is_coords = typ == "coords"
    if is_coords:
        arr = np.stack([dframe[bp].to_numpy(float) for bp in seen], axis=1)
    else:
        arr = dframe.to_numpy(float)
    out = np.asarray(
        _rs(
            jnp.asarray(arr), frame_rate=float(frame_rate), window=int(window),
            rounds=int(rounds), deriv=int(deriv), shift=int(shift),
            is_coords=is_coords,
        )
    )
    return pd.DataFrame(out, index=dframe.index, columns=labels)


def multi_step_paired_smoothing(
    behavior_in,
    not_behavior=None,
    exclude=None,
    min_length: int = 6,
    get_both: bool = False,
):
    """Paired bout smoothing (deepof/utils.py:3260-3352); runs the exact
    host twin of the vectorized cascade (ops.bouts)."""
    from deepof_tpu.ops.bouts import multi_step_paired_smoothing_host

    return multi_step_paired_smoothing_host(
        np.asarray(behavior_in),
        None if not_behavior is None else np.asarray(not_behavior),
        None if exclude is None else np.asarray(exclude),
        min_length=int(min_length),
        get_both=get_both,
    )


def filter_short_true_segments(array, min_length: int) -> np.ndarray:
    """Drop True runs shorter than min_length (deepof/utils.py:3961-3998)."""
    import jax.numpy as jnp

    from deepof_tpu.ops import filter_short_true_segments as _filt

    return np.asarray(_filt(jnp.asarray(np.asarray(array, bool)), int(min_length)))


def _polygon_vertices(polygon) -> np.ndarray:
    """(V, 2) vertex array from a shapely Polygon or array-like."""
    if hasattr(polygon, "exterior"):
        return np.asarray(polygon.exterior.coords, float)[:-1]
    return np.asarray(polygon, float)


def point_in_polygon(points, polygon) -> np.ndarray:
    """Point-in-polygon membership (deepof/utils.py:1400-1416); accepts a
    shapely Polygon or a vertex array."""
    import jax.numpy as jnp

    from deepof_tpu.ops import point_in_polygon as _pip

    return np.asarray(
        _pip(jnp.asarray(np.asarray(points, float)), _polygon_vertices(polygon))
    )


def in_field_of_view(mouse_pts, fov_angle_deg, roi, plot: bool = True, eps: float = 1e-10):
    """FOV-cone / ROI intersection per frame (deepof/utils.py:1542-1724);
    accepts a shapely Polygon or a vertex array. ``plot`` is accepted for
    parity and ignored (the reference uses it for debug rendering)."""
    import jax.numpy as jnp

    from deepof_tpu.ops.geometry import in_field_of_view as _fov

    pts = np.asarray(mouse_pts, float)
    if pts.ndim == 2:
        pts = pts[None]
    return np.asarray(
        _fov(jnp.asarray(pts), float(fov_angle_deg), _polygon_vertices(roi), eps=eps)
    )


def kleinberg(offsets, s: float = 2.0, gamma: float = 1.0, n=None, T=None, k=None):
    """Kleinberg burst detection (deepof/utils.py:3030-3141)."""
    from deepof_tpu.ops.bursts import kleinberg as _kb

    return _kb(offsets, s=s, gamma=gamma, n=n, T=T, k=k)


def smooth_boolean_array(a, scale: int = 1, sigma=2.0, batch_size: int = 50000):
    """Legacy Kleinberg-based boolean smoothing (deepof/utils.py:3215-3258)."""
    from deepof_tpu.ops.bursts import smooth_boolean_array as _sba

    return _sba(np.asarray(a), scale=scale, sigma=sigma, batch_size=batch_size)


def extract_windows(to_window, window_size: int, window_step: int, **kwargs):
    """Sliding-window extraction over a TableDict
    (deepof/utils.py:3380-3470); see core.table_dict.extract_windows."""
    from deepof_tpu.core.table_dict import extract_windows as _ew

    kwargs.pop("windows_desc", None)  # progress label, cosmetic
    return _ew(to_window, window_size, window_step, **kwargs)


def cluster_transition_matrix(
    cluster_sequence, nclusts: int, autocorrelation: bool = True,
    return_graph: bool = False,
):
    """Cluster transition matrix + lag-1 autocorrelation
    (deepof/utils.py:4256-4306); see posthoc.cluster_transition_matrix."""
    from deepof_tpu.posthoc import cluster_transition_matrix as _ctm

    return _ctm(
        cluster_sequence, nclusts, autocorrelation=autocorrelation,
        return_graph=return_graph,
    )


def load_exp_conditions(filepath: str):
    """Experimental-condition CSV loader (deepof/utils.py:775-784)."""
    from deepof_tpu.io.conditions import load_exp_conditions as _lec

    return _lec(filepath)


def load_start_markers(filepath, frame_rate):
    """Start-marker CSV loader (deepof/utils.py:786-816)."""
    from deepof_tpu.io.conditions import load_start_markers as _lsm

    return _lsm(filepath, frame_rate)


def connect_mouse(*args, **kwargs):
    """Body-part graph presets (deepof/utils.py:416-510); see
    core.graph.connect_mouse."""
    from deepof_tpu.core.graph import connect_mouse as _cm

    return _cm(*args, **kwargs)


def enumerate_all_bridges(G):
    """All 3-node bridges of a body graph (deepof/utils.py:531-560)."""
    from deepof_tpu.core.graph import enumerate_all_bridges as _eab

    return _eab(G)


def load_table(*args, **kwargs):
    """DLC/SLEAP table reader (deepof/utils.py:2188-2341); see
    io.readers.load_table. Accepts the reference's
    ``rename_bodyparts_dict`` keyword."""
    from deepof_tpu.io.readers import load_table as _lt

    if "rename_bodyparts_dict" in kwargs:
        kwargs["rename_bodyparts"] = kwargs.pop("rename_bodyparts_dict")
    return _lt(*args, **kwargs)


def gmm_compute(x, n_components: int, cv_type: str):
    """Single GMM fit + BIC (deepof/utils.py:4040-4076)."""
    from deepof_tpu.evaluation import gmm_compute as _gc

    return _gc(x, n_components, cv_type)


def gmm_model_selection(*args, **kwargs):
    """BIC model selection over GMM sizes (deepof/utils.py:4078-4121)."""
    from deepof_tpu.evaluation import gmm_model_selection as _gms

    return _gms(*args, **kwargs)


def compute_compactness(Z_pos, Z_all, eps: float = 1e-12):
    """Embedding compactness metric, reference keyword names included
    (deepof/utils.py:4122-4144)."""
    from deepof_tpu.evaluation import compute_compactness as _cc

    return _cc(Z_pos, Z_all, eps=eps)


def compute_separability_logreg(
    X, y, n_splits: int = 5, seed: int = 0, C: float = 1.0,
    max_train: int = 100_000,
):
    """Embedding separability metric, reference keyword names included
    (deepof/utils.py:4146-4199)."""
    from deepof_tpu.evaluation import compute_separability_logreg as _cs

    return _cs(X, y, n_splits=n_splits, seed=seed, c=C, max_train=max_train)


def compute_knn_agreement(
    X, y, k: int = 25, seed: int = 0, max_points: int = 50_000,
    max_pos_queries: int = 10_000, metric: str = "cosine",
):
    """kNN label-agreement metric, reference keyword names included
    (deepof/utils.py:4201-4255)."""
    from deepof_tpu.evaluation import compute_knn_agreement as _ck

    return _ck(
        X, y, k=k, seed=seed, max_points=max_points,
        max_pos_queries=max_pos_queries, metric=metric,
    )


# --------------------------------------------------------------------------- #
# Reference kernel-name tier (the *_numba functions)
# --------------------------------------------------------------------------- #
# The reference exposes its 23 numba JIT kernels as public names on
# deepof.utils. These keep those exact names and signatures while running
# the XLA kernels from deepof_tpu.ops (the TPU-native replacements).
# They exist purely for migration; framework code calls the ops directly.


def rts_smoother_numba(measurements, F, H, Q, R):
    """Generic Kalman forward + RTS backward smoother
    (deepof/utils.py:70-145): same math and initialization (first
    measurement broadcast into the state, 1000*I prior covariance), run as
    one jitted lax.scan pair instead of a per-step Python loop."""
    import jax
    import jax.numpy as jnp

    measurements = np.asarray(measurements, np.float64)
    F, H, Q, R = (np.asarray(m, np.float64) for m in (F, H, Q, R))
    n_state = F.shape[0]
    x0 = np.zeros(n_state)
    x0[:] = measurements[0]  # broadcast like the reference's assignment
    p0 = np.eye(n_state) * 1000.0

    @jax.jit
    def _smooth(ms, f, h, q, r, x_init, p_init):
        def fwd(carry, z):
            x, p = carry
            xp = f @ x
            pp = f @ p @ f.T + q
            s = h @ pp @ h.T + r
            k = pp @ h.T @ jnp.linalg.inv(s)
            xf = xp + k @ (z - h @ xp)
            pf = (jnp.eye(n_state) - k @ h) @ pp
            return (xf, pf), (xf, pf, xp, pp)

        (_, _), (xf, pf, xp, pp) = jax.lax.scan(fwd, (x_init, p_init), ms[1:])
        xf = jnp.concatenate([x_init[None], xf])
        pf = jnp.concatenate([p_init[None], pf])

        def bwd(carry, inp):
            xs_next, _ = carry
            xf_t, pf_t, xp_next, pp_next = inp
            c = pf_t @ f.T @ jnp.linalg.inv(pp_next)
            xs = xf_t + c @ (xs_next - xp_next)
            ps = pf_t  # covariances are not consumed downstream
            return (xs, ps), xs

        (_, _), xs_rev = jax.lax.scan(
            bwd, (xf[-1], pf[-1]),
            (xf[:-1][::-1], pf[:-1][::-1], xp[::-1], pp[::-1]),
        )
        return jnp.concatenate([xs_rev[::-1], xf[-1][None]])

    return np.asarray(_smooth(measurements, F, H, Q, R, x0, p0))


def enforce_skeleton_constraints_numba(
    data, skeleton_constraints, original_pos, tolerance=0.1,
    correction_factor=0.5,
):
    """Bone-length projection after imputation (deepof/utils.py:149-195);
    delegates to the jitted scan kernel (ops.imputation)."""
    import jax.numpy as jnp

    from deepof_tpu.ops import enforce_skeleton_constraints

    return np.asarray(
        enforce_skeleton_constraints(
            jnp.asarray(np.asarray(data, float)),
            [(int(a), int(b), float(d)) for a, b, d in skeleton_constraints],
            jnp.asarray(np.asarray(original_pos, bool)),
            tolerance=float(tolerance),
            correction_factor=float(correction_factor),
        )
    )


def polygon_area_numba(vertices: np.ndarray) -> float:
    """Shoelace area of one polygon (deepof/utils.py:1003-1023)."""
    v = np.asarray(vertices, float)
    x, y = v[:, 0], v[:, 1]
    return float(abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y)) / 2)


def compute_areas_numba(polygon_xy_stack: np.ndarray) -> np.ndarray:
    """Per-frame shoelace areas for a (T, V, 2) polygon stack
    (deepof/utils.py:982-999) through the batched XLA kernel."""
    import jax.numpy as jnp

    from deepof_tpu.ops import polygon_areas

    stack = np.asarray(polygon_xy_stack, float)
    return np.asarray(
        polygon_areas(jnp.asarray(stack), np.arange(stack.shape[1])),
        np.float64,
    )


def extend_behaviors_numba(
    behaviors: np.ndarray, delta_T: float = 2.0, frame_rate: float = 1,
) -> np.ndarray:
    """Extend every (K, T) behavior bout by delta_T seconds past its
    offset (deepof/utils.py:1027-1064)."""
    import jax.numpy as jnp

    from deepof_tpu.ops import extend_behaviors

    out = np.asarray(
        extend_behaviors(
            jnp.asarray(np.asarray(behaviors, bool)),
            delta_t=float(delta_T), frame_rate=float(frame_rate),
        )
    )
    return out.astype(np.asarray(behaviors).dtype, copy=False)


def rotate_numba(p, angles, origin=None):
    """Rotate 2D points by a single angle around ``origin``
    (deepof/utils.py:1360-1414)."""
    p = np.asarray(p, float)
    if p.ndim <= 1:
        p = p.reshape(1, p.size)
    origin = np.zeros(2) if origin is None else np.asarray(origin, float)
    c, s = np.cos(angles), np.sin(angles)
    rot = np.array([[c, -s], [s, c]])
    return (rot @ (p - origin).T).T + origin


def rotate_all_numba(data: np.ndarray, angles: np.ndarray) -> np.ndarray:
    """Per-frame rotation of interleaved [x1,y1,x2,y2,...] rows by
    per-frame angles (deepof/utils.py:1323-1357) — one jitted batched
    kernel (ops.rotate2d) instead of a frame loop."""
    import jax.numpy as jnp

    from deepof_tpu.ops import rotate2d

    data = np.asarray(data, float)
    t, f = data.shape
    pts = data.reshape(t, f // 2, 2)
    out = np.asarray(
        rotate2d(jnp.asarray(pts), jnp.asarray(np.asarray(angles, float)))
    )
    return out.reshape(t, f)


def point_in_polygon_numba(points: np.ndarray, polygon: np.ndarray) -> np.ndarray:
    """Ray-casting membership per point (deepof/utils.py:1418-1476)."""
    import jax.numpy as jnp

    from deepof_tpu.ops import point_in_polygon

    return np.asarray(
        point_in_polygon(
            jnp.asarray(np.asarray(points, float)), np.asarray(polygon, float)
        )
    )


def get_point_polygon_distance_numba(points, poly_xy):
    """Min point-to-boundary distances (deepof/utils.py:1515-1541)."""
    return get_point_polygon_distance(points, poly_xy)


def in_field_of_view_numba(mouse_pts, fov_angle_deg, roi_poly, eps=1e-10):
    """FOV-cone vs ROI intersection per frame, (T,) of {1.0, 0.0, nan}
    (deepof/utils.py:1757-1870)."""
    import jax.numpy as jnp

    from deepof_tpu.ops.geometry import in_field_of_view

    mouse_pts = np.asarray(mouse_pts, float)
    if not (0.0 < fov_angle_deg < 180.0):
        return np.full(mouse_pts.shape[0], np.nan)
    return np.asarray(
        in_field_of_view(
            jnp.asarray(mouse_pts), float(fov_angle_deg),
            np.asarray(roi_poly, float), eps=float(eps),
        ),
        np.float64,
    )


def kleinberg_core_numba(gaps, s, gamma, n, T, k):
    """Optimal burst-level sequence (1-based) for inter-event gaps
    (deepof/utils.py:3143-3212); runs the C++ DP kernel when built."""
    from deepof_tpu.ops.bursts import _kleinberg_q

    return _kleinberg_q(
        np.asarray(gaps, float), float(s), float(gamma), int(n), float(T),
        int(k),
    )


def binary_moving_median_numba(time_series, lag):
    """Centered binary moving median (deepof/utils.py:3520-3533)."""
    import jax.numpy as jnp

    from deepof_tpu.ops import binary_moving_median

    arr = np.asarray(time_series)
    return np.asarray(
        binary_moving_median(jnp.asarray(arr.astype(bool)), int(lag))
    ).astype(arr.dtype, copy=False)


def filter_short_true_segments_numba(array: np.ndarray, min_length: int):
    """Drop True runs shorter than min_length (deepof/utils.py:4000-4037)."""
    import jax.numpy as jnp

    from deepof_tpu.ops import filter_short_true_segments

    return np.asarray(
        filter_short_true_segments(
            jnp.asarray(np.asarray(array, bool)), int(min_length)
        )
    )


@dataclass
class GlobalScalerSpec:
    """Typed container for global scalers fitted across videos
    (deepof/utils.py:2343-2381). The preprocess pipeline keeps the legacy
    dict format at its boundary; this wraps/unwraps it for user code that
    wants a structured view."""

    kind: str
    speed_mode: "Optional[str]"
    dist_mode: "Optional[str]"
    coord_mode: "Optional[str]"
    log_distances: bool
    speed: "Any" = None
    dist: "Any" = None
    dist_inner: "Any" = None
    dist_intra: "Any" = None
    coord: "Any" = None

    def to_legacy_dict(self):
        return {
            "kind": self.kind,
            "speed": self.speed,
            "dist": self.dist,
            "dist_inner": self.dist_inner,
            "dist_intra": self.dist_intra,
            "coord": self.coord,
            "speed_mode": self.speed_mode,
            "dist_mode": self.dist_mode,
            "coord_mode": self.coord_mode,
            "log_distances": self.log_distances,
        }

    @classmethod
    def from_legacy_dict(cls, d):
        return cls(
            kind=d.get("kind", "standard"),
            speed_mode=d.get("speed_mode"),
            dist_mode=d.get("dist_mode"),
            coord_mode=d.get("coord_mode"),
            log_distances=bool(d.get("log_distances", False)),
            speed=d.get("speed"),
            dist=d.get("dist"),
            dist_inner=d.get("dist_inner"),
            dist_intra=d.get("dist_intra"),
            coord=d.get("coord"),
        )

    def is_effectively_empty(self) -> bool:
        return all(
            getattr(self, k) is None
            for k in ("speed", "dist", "dist_inner", "dist_intra", "coord")
        )
