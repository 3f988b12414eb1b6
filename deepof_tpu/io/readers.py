"""Pose-table readers: DeepLabCut (csv/h5) and SLEAP (analysis.h5/npy/slp).

Format spec studied from the reference (deepof/utils.py:2188-2341 load_table
and deepof/data.py:784-830 header handling), rebuilt tensor-first: every
reader lands directly in a RawTable of dense ``(T, B, 2)`` positions plus a
``(T, B)`` likelihood matrix, with multi-animal tables flattened to
``{animal_id}_{bodypart}`` names. Pandas DataFrames only exist at the public
API boundary, not inside the pipeline.

Notes:
  - DLC .h5 is a pandas "fixed"-format store; it is parsed directly with
    h5py (pytables-free) — see _read_pandas_fixed_frame.
  - SLEAP likelihood is imputed 1.0/0.0 from coordinate finiteness
    (reference: deepof/utils.py:2266-2271).
  - .slp requires sleap-io, which is optional; a clear ImportError is
    raised when absent.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import h5py
import numpy as np
import pandas as pd


def natural_sorted(items: Sequence[str]) -> List[str]:
    """Natural (os-style) sort: digit runs compare numerically.

    Mirrors the reference's use of natsort.os_sorted for bodypart column
    ordering (deepof/data.py:872-878).
    """

    def key(s: str):
        return [
            int(tok) if tok.isdigit() else tok.lower()
            for tok in re.split(r"(\d+)", str(s))
        ]

    return sorted(items, key=key)


@dataclass
class RawTable:
    """One experiment's tracks in dense tensor form.

    Attributes:
        positions: (T, B, 2) float64 x/y pixel positions (NaN = missing).
        likelihood: (T, B) float64 tracking likelihoods.
        bodyparts: names per column of axis B, flattened multi-animal style
            ("{aid}_{bp}"), in file order.
        animal_ids: ids found in / implied by the file ([""] if single).
        has_individuals: whether the source table carried an explicit
            individuals header row.
    """

    positions: np.ndarray
    likelihood: np.ndarray
    bodyparts: List[str]
    animal_ids: List[str]
    has_individuals: bool = False

    def rename(self, mapping: Optional[Dict[str, str]]) -> "RawTable":
        """Apply a bodypart rename mapping (regex replace, like the
        reference's rename_track_bps, deepof/utils.py:2300-2341)."""
        if not mapping:
            return self
        renamed = []
        for bp in self.bodyparts:
            out = bp
            for old, new in mapping.items():
                out = re.sub(old, new, out)
            renamed.append(out)
        self.bodyparts = renamed
        return self

    def reorder(self, order: Sequence[str]) -> "RawTable":
        """Reorder columns to the given bodypart name order."""
        idx = [self.bodyparts.index(bp) for bp in order]
        return RawTable(
            positions=self.positions[:, idx],
            likelihood=self.likelihood[:, idx],
            bodyparts=list(order),
            animal_ids=self.animal_ids,
            has_individuals=self.has_individuals,
        )


def _decode(arr) -> List[str]:
    return [x.decode() if isinstance(x, bytes) else str(x) for x in arr]


def _read_pandas_fixed_frame(path: str):
    """Minimal h5py-based reader for a pandas 'fixed' HDF5 frame as written
    by DLC: one float block with a 2-3 level column MultiIndex.

    Returns (values (T, C) float64, column_tuples list of tuples).
    """
    with h5py.File(path, "r") as f:
        # Find the frame group (usually 'df' or the first group).
        group_name = next(iter(f.keys()))
        g = f[group_name]
        nlevels = int(g.attrs.get("axis0_nlevels", 1))
        levels = []
        labels = []
        for lvl in range(nlevels):
            levels.append(_decode(g[f"axis0_level{lvl}"][:]))
            labels.append(g[f"axis0_label{lvl}"][:].astype(np.int64))
        columns = [
            tuple(levels[lvl][labels[lvl][c]] for lvl in range(nlevels))
            for c in range(len(labels[0]))
        ]
        values = np.asarray(g["block0_values"][:], dtype=np.float64)
        block_items = None
        if "block0_items_label0" in g:
            bl_levels, bl_labels = [], []
            for lvl in range(nlevels):
                bl_levels.append(_decode(g[f"block0_items_level{lvl}"][:]))
                bl_labels.append(g[f"block0_items_label{lvl}"][:].astype(np.int64))
            block_items = [
                tuple(bl_levels[lvl][bl_labels[lvl][c]] for lvl in range(nlevels))
                for c in range(len(bl_labels[0]))
            ]
        if block_items is not None and block_items != columns:
            reorder = [block_items.index(c) for c in columns]
            values = values[:, reorder]
    return values, columns


def _from_dlc_columns(values: np.ndarray, columns: List[tuple]) -> RawTable:
    """Assemble a RawTable from DLC-style column tuples.

    Column tuples are (scorer, [individuals,] bodypart, coord); the scorer
    level is dropped and multi-animal bodyparts are prefixed with their
    individual id (reference: deepof/data.py:798-806).
    """
    has_individuals = len(columns[0]) == 4

    per_bp: Dict[str, Dict[str, int]] = {}
    order: List[str] = []
    animal_ids: List[str] = []
    for ci, col in enumerate(columns):
        if has_individuals:
            _, indiv, bp, coord = col
            name = f"{indiv}_{bp}"
            if indiv not in animal_ids:
                animal_ids.append(indiv)
        else:
            _, bp, coord = col
            name = bp
        if name not in per_bp:
            per_bp[name] = {}
            order.append(name)
        per_bp[name][coord] = ci

    t = values.shape[0]
    b = len(order)
    positions = np.full((t, b, 2), np.nan)
    likelihood = np.zeros((t, b))
    for bi, name in enumerate(order):
        cols = per_bp[name]
        positions[:, bi, 0] = values[:, cols["x"]]
        positions[:, bi, 1] = values[:, cols["y"]]
        if "likelihood" in cols:
            likelihood[:, bi] = values[:, cols["likelihood"]]
        else:
            likelihood[:, bi] = np.isfinite(positions[:, bi]).all(-1)

    return RawTable(
        positions=positions,
        likelihood=np.nan_to_num(likelihood, nan=0.0),
        bodyparts=order,
        animal_ids=animal_ids if has_individuals else [""],
        has_individuals=has_individuals,
    )


def _read_dlc_csv(path: str) -> RawTable:
    """DLC csv: 2-3 meta header rows (scorer[, individuals], bodyparts,
    coords), then an integer frame index column."""
    head = pd.read_csv(path, header=None, nrows=4, index_col=0)
    meta_rows = list(head.index[:4])
    has_individuals = "individuals" in meta_rows
    n_meta = 3 if has_individuals else 2
    df = pd.read_csv(path, header=list(range(n_meta + 1)), index_col=0, low_memory=False)
    values = df.to_numpy(dtype=np.float64)
    columns = [tuple(str(x) for x in c) for c in df.columns]
    return _from_dlc_columns(values, columns)


def _read_dlc_h5(path: str) -> RawTable:
    values, columns = _read_pandas_fixed_frame(path)
    return _from_dlc_columns(values, columns)


def _from_sleap_array(
    tracks: np.ndarray,
    node_names: List[str],
    track_names: List[str],
    animal_ids: Optional[List[str]],
) -> RawTable:
    """tracks: (T, A, B, 2). Likelihood = finiteness (1.0 / 0.0)."""
    t, a, b, _ = tracks.shape
    if animal_ids and animal_ids[0]:
        ids = list(animal_ids)
    else:
        ids = list(track_names)
    single = a == 1 and (not animal_ids or not animal_ids[0])

    likelihood = np.isfinite(tracks).all(axis=-1).astype(np.float64)  # (T, A, B)
    if single:
        names = list(node_names)
        positions = tracks[:, 0]
        lik = likelihood[:, 0]
        return RawTable(positions, lik, names, [""], has_individuals=False)

    names = [f"{ids[ai]}_{bp}" for ai in range(a) for bp in node_names]
    positions = tracks.reshape(t, a * b, 2)
    lik = likelihood.reshape(t, a * b)
    return RawTable(positions, lik, names, ids, has_individuals=True)


def _read_sleap_analysis_h5(path: str, animal_ids) -> RawTable:
    with h5py.File(path, "r") as f:
        tracks = np.transpose(f["tracks"][:], [3, 0, 2, 1]).astype(np.float64)
        node_names = _decode(f["node_names"][:])
        track_names = _decode(f["track_names"][:])
    return _from_sleap_array(tracks, node_names, track_names, animal_ids)


def _read_sleap_npy(path: str, bodyparts: List[str], animal_ids) -> RawTable:
    tracks = np.asarray(np.load(path), dtype=np.float64)  # (T, A, B, 2)
    if tracks.shape[2] != len(bodyparts):
        raise ValueError(
            f"The table has {tracks.shape[2]} bodyparts but {len(bodyparts)} "
            "names were provided via rename_bodyparts."
        )
    if animal_ids and animal_ids[0]:
        track_names = list(animal_ids)
    else:
        track_names = [str(i) for i in range(tracks.shape[1])]
    return _from_sleap_array(tracks, bodyparts, track_names, animal_ids)


def _read_slp(path: str, animal_ids) -> RawTable:
    try:
        import sleap_io as sio  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "Reading .slp files requires the optional 'sleap-io' package; "
            "export your SLEAP project to .analysis.h5 or .npy instead."
        ) from e
    labels = sio.load_slp(path)  # pragma: no cover
    node_names = [n.name for n in labels.skeletons[0].nodes]  # pragma: no cover
    track_names = [t.name for t in labels.tracks]  # pragma: no cover
    tracks = np.asarray(labels.numpy(), dtype=np.float64)  # pragma: no cover
    return _from_sleap_array(tracks, node_names, track_names, animal_ids)  # pragma: no cover


def load_table(
    tab: str,
    table_path: str,
    table_format: str,
    rename_bodyparts: Optional[Dict[str, str]] = None,
    animal_ids: Optional[List[str]] = None,
) -> RawTable:
    """Load one experiment's pose table into a RawTable.

    Args:
        tab: file name.
        table_path: directory containing the file.
        table_format: "h5" | "csv" | "npy" | "slp" | "analysis.h5".
        rename_bodyparts: mapping of file bodypart names to canonical names.
        animal_ids: animal ids (required for multi-animal npy).
    """
    path = os.path.join(table_path, tab)
    if table_format == "h5":
        raw = _read_dlc_h5(path)
    elif table_format == "csv":
        raw = _read_dlc_csv(path)
    elif table_format == "analysis.h5":
        raw = _read_sleap_analysis_h5(path, animal_ids)
    elif table_format == "npy":
        if not rename_bodyparts:
            raise ValueError(
                "Loading .npy tracks requires bodypart names via rename_bodyparts."
            )
        raw = _read_sleap_npy(path, list(rename_bodyparts.keys()), animal_ids)
        rename_bodyparts = {
            k: v for k, v in rename_bodyparts.items() if k != v
        }
    elif table_format == "slp":
        raw = _read_slp(path, animal_ids)
    else:
        raise NotImplementedError(
            "Tracking files must be in h5, csv, npy, slp or analysis.h5 format"
        )
    return raw.rename(rename_bodyparts)
