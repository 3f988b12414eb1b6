"""Out-of-core table storage.

Plays the role of the reference's DuckDB-backed store
(deepof/data_loading.py:66-188 get_dt/save_dt and deepof/data_manager.py
DataManager), rebuilt on HDF5: a TableDict value is either the in-memory
object itself or a ``{"h5_file": path, "table": name}`` pointer, resolved
transparently by ``get_dt``. Supports DataFrames (with tuple/MultiIndex
columns), ndarrays, and tuples of ndarrays, plus metainfo-only and
row-range loads for the very-large-project path.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Tuple, Union

import h5py
import numpy as np
import pandas as pd

_COLS_ATTR = "deepof_columns"
_INDEX_ATTR = "deepof_index"
_KIND_ATTR = "deepof_kind"


def _encode_columns(columns) -> str:
    enc = []
    for c in columns:
        if isinstance(c, tuple):
            enc.append({"t": "tuple", "v": list(map(str, c))})
        else:
            enc.append({"t": "str", "v": str(c)})
    return json.dumps(enc)


def _decode_columns(payload: str):
    cols = []
    for item in json.loads(payload):
        cols.append(tuple(item["v"]) if item["t"] == "tuple" else item["v"])
    return cols


def is_pointer(obj: Any) -> bool:
    return isinstance(obj, dict) and "h5_file" in obj


class LazyFrame:
    """A TableDict value that realizes to a DataFrame on first access.

    Extends the reference's own out-of-core convention — a TableDict value
    is either the object itself or a pointer resolved by ``get_dt``
    (deepof/data_loading.py:66-165) — with a third pointer kind: a frame
    whose values still live on the accelerator. ``get_dt`` realizes it
    (one device->host transfer, cached); ``only_metainfo`` answers from
    host metadata without touching the device, so column/shape queries
    stay free. Used by the fused graph-dataset lane, where the merged
    feature tables are produced on device and most consumers only ever
    need the scaled tensors derived from them."""

    __slots__ = ("_realize", "_columns", "_nrows", "_index_fn", "_cache")

    def __init__(self, realize_fn, columns, nrows: int, index_fn=None):
        self._realize = realize_fn
        self._columns = columns
        self._nrows = int(nrows)
        self._index_fn = index_fn
        self._cache = None

    @property
    def columns(self):
        return self._columns

    @property
    def shape(self):
        return (self._nrows, len(self._columns))

    def index(self):
        if self._index_fn is None:
            return pd.RangeIndex(self._nrows)
        return self._index_fn(self._nrows)

    def realize(self) -> pd.DataFrame:
        if self._cache is None:
            df = self._realize()
            if not isinstance(df, pd.DataFrame):
                df = pd.DataFrame(
                    np.asarray(df, np.float64), columns=self._columns,
                    copy=False,
                )
                df.index = self.index()
            self._cache = df
        return self._cache

    def __len__(self):
        return self._nrows

    def __array__(self, dtype=None, copy=None):
        out = self.realize().to_numpy()
        if dtype is not None and out.dtype != dtype:
            out = out.astype(dtype)
        elif copy:
            out = out.copy()
        return out

    def __getstate__(self):  # pickle: realize (device handles don't pickle)
        return {"frame": self.realize()}

    def __setstate__(self, state):
        frame = state["frame"]
        self._realize = lambda: frame
        self._columns = frame.columns
        self._nrows = len(frame)
        self._index_fn = None
        self._cache = frame


class LazyWindows:
    """A TableDict value for windowed ``(nodes, edges, angles)`` tensors
    that realizes on first access.

    Fourth pointer kind of the out-of-core protocol (after in-memory
    objects, ``{"h5_file", "table"}`` pointers, and :class:`LazyFrame`):
    the window tuple's SOURCE matrix still lives on the accelerator, and
    materializing it costs one device->host transfer plus the window
    gathers. ``get_dt`` resolves it (cached); ``only_metainfo`` answers
    shape queries from host metadata without touching the device. Used by
    the fused graph-dataset lane so that inference-only flows — which
    consume the device-resident scaled matrices directly — never pay for
    training tensors they don't read (the reference's own
    ``return_as_paths`` mode likewise hands back unmaterialized DuckDB
    pointers, deepof/data_loading.py:66-165)."""

    __slots__ = ("_realize_fn", "_shapes", "_cache")

    def __init__(self, realize_fn, shapes):
        self._realize_fn = realize_fn
        self._shapes = tuple(tuple(int(d) for d in s) for s in shapes)
        self._cache = None

    @property
    def shapes(self):
        return self._shapes

    def realize(self) -> tuple:
        if self._cache is None:
            self._cache = tuple(self._realize_fn())
        return self._cache

    def __len__(self):
        return len(self._shapes)

    def __iter__(self):
        return iter(self.realize())

    def __getitem__(self, i):
        return self.realize()[i]

    def __getstate__(self):  # pickle: realize (device handles don't pickle)
        return {"windows": self.realize()}

    def __setstate__(self, state):
        windows = state["windows"]
        self._realize_fn = lambda: windows
        self._shapes = tuple(np.shape(w) for w in windows)
        self._cache = windows


def save_dt(dt: Any, path: Optional[str], return_path: bool = False):
    """Persist a table and (optionally) return a pointer to it.

    Args:
        dt: DataFrame | ndarray | tuple of ndarrays.
        path: base path (no extension) to store under.
        return_path: if True, write to HDF5 and return the pointer dict;
            otherwise return ``dt`` unchanged (in-memory mode).
    """
    if not return_path or path is None:
        return dt
    if isinstance(dt, LazyWindows):
        dt = dt.realize()
    elif isinstance(dt, LazyFrame):
        dt = dt.realize()

    os.makedirs(os.path.dirname(path), exist_ok=True)
    h5_file = path + ".h5"
    table = os.path.basename(path)

    with h5py.File(h5_file, "w") as f:
        if isinstance(dt, pd.DataFrame):
            g = f.create_group(table)
            g.create_dataset("values", data=dt.to_numpy(dtype=np.float64))
            g.attrs[_KIND_ATTR] = "frame"
            g.attrs[_COLS_ATTR] = _encode_columns(dt.columns)
            g.attrs[_INDEX_ATTR] = json.dumps([str(i) for i in dt.index])
        elif isinstance(dt, tuple):
            g = f.create_group(table)
            g.attrs[_KIND_ATTR] = "tuple"
            for i, arr in enumerate(dt):
                g.create_dataset(f"item_{i}", data=np.asarray(arr))
        else:
            g = f.create_group(table)
            g.attrs[_KIND_ATTR] = "array"
            g.create_dataset("values", data=np.asarray(dt))

    return {"h5_file": h5_file, "table": table}


def get_dt(
    tab_dict: dict,
    key: str,
    return_path: bool = False,
    only_metainfo: bool = False,
    load_range: Optional[Tuple[int, int]] = None,
    load_index: bool = False,
):
    """Resolve a TableDict value, loading from HDF5 if it is a pointer.

    Args:
        tab_dict: mapping of experiment id -> table or pointer.
        key: experiment id.
        return_path: also return the pointer (or None for in-memory).
        only_metainfo: return {"shape":..., "columns":...} without data.
        load_range: (start, end) inclusive row range to load.
        load_index: with only_metainfo, also include the row index under
            "index_column" (reference data_loading.py:66-88 contract).
    """
    entry = tab_dict[key]

    if isinstance(entry, LazyWindows):
        if only_metainfo:
            meta = {
                "shape": [tuple(s) for s in entry.shapes],
                "columns": None,
                "num_rows": entry.shapes[0][0] if entry.shapes else 0,
            }
            return (meta, None) if return_path else meta
        obj = entry.realize()
        if load_range is not None:
            obj = _slice_obj(obj, load_range)
        return (obj, None) if return_path else obj

    if isinstance(entry, LazyFrame):
        if only_metainfo:
            meta = {
                "shape": entry.shape,
                "columns": list(entry.columns),
                "num_cols": entry.shape[1],
                "num_rows": entry.shape[0],
                "start_time": None,
                "end_time": None,
            }
            return (meta, None) if return_path else meta
        obj = entry.realize()
        if load_range is not None:
            obj = _slice_obj(obj, load_range)
        return (obj, None) if return_path else obj

    if not is_pointer(entry):
        obj = entry
        if only_metainfo:
            meta = _metainfo_inmem(obj)
            if load_index and isinstance(obj, pd.DataFrame):
                meta["index_column"] = obj.index
            obj = meta
        elif load_range is not None:
            obj = _slice_obj(obj, load_range)
        return (obj, None) if return_path else obj

    h5_file, table = entry["h5_file"], entry["table"]
    with h5py.File(h5_file, "r") as f:
        g = f[table]
        kind = g.attrs[_KIND_ATTR]
        if only_metainfo:
            if kind == "tuple":
                shapes = [g[k].shape for k in sorted(g.keys())]
                meta = {"shape": shapes, "columns": None, "num_rows": shapes[0][0]}
            else:
                shape = g["values"].shape
                cols = (
                    _decode_columns(g.attrs[_COLS_ATTR])
                    if _COLS_ATTR in g.attrs
                    else None
                )
                meta = {
                    "shape": shape,
                    "columns": cols,
                    "num_cols": shape[1] if len(shape) > 1 else 1,
                    "num_rows": shape[0],
                    "start_time": None,
                    "end_time": None,
                }
                if _INDEX_ATTR in g.attrs:
                    index = json.loads(g.attrs[_INDEX_ATTR])
                    if index:
                        meta["start_time"], meta["end_time"] = index[0], index[-1]
            return (meta, entry) if return_path else meta

        sl = slice(None)
        if load_range is not None:
            if np.ndim(load_range) > 1 or (
                hasattr(load_range, "__len__") and len(load_range) != 2
            ):
                sl = np.asarray(load_range)
            else:
                sl = slice(int(load_range[0]), int(load_range[1]) + 1)

        if kind == "tuple":
            obj = tuple(g[k][sl] for k in sorted(g.keys()))
        elif kind == "frame":
            values = g["values"][sl]
            cols = _decode_columns(g.attrs[_COLS_ATTR])
            index = json.loads(g.attrs[_INDEX_ATTR])
            if isinstance(sl, slice):
                index = index[sl]
            else:
                index = [index[i] for i in np.atleast_1d(sl)]
            if cols and all(isinstance(c, tuple) for c in cols):
                columns = pd.MultiIndex.from_tuples(cols)
            else:
                columns = cols
            obj = pd.DataFrame(values, columns=columns, index=index)
        else:
            obj = g["values"][sl]

    return (obj, entry) if return_path else obj


def get_dt_rows(tab_dict, key, idx):
    """Row load where ``idx`` is ALWAYS a positional frame-index array.

    ``get_dt`` keeps the reference's load_range convention in which a
    2-element sequence means an inclusive [start, end] span (reference
    data_loading.py:91-92). A genuine index array of length exactly 2
    (e.g. an ROI filter leaving two surviving frames) would be misread
    as a span and silently load the rows between them, so this wrapper
    applies short index arrays host-side instead.
    """
    if idx is None:
        return get_dt(tab_dict, key)
    idx = np.asarray(idx)
    if len(idx) != 2:
        return get_dt(tab_dict, key, load_range=idx)
    tab = get_dt(tab_dict, key)
    if isinstance(tab, pd.DataFrame):
        return tab.iloc[idx.astype(int)]
    if isinstance(tab, tuple):
        return tuple(np.asarray(o)[idx.astype(int)] for o in tab)
    return np.asarray(tab)[idx.astype(int)]


def _metainfo_inmem(obj):
    if isinstance(obj, pd.DataFrame):
        meta = {
            "shape": obj.shape,
            "columns": list(obj.columns),
            "num_cols": obj.shape[1],
            "num_rows": obj.shape[0],
            "start_time": str(obj.index[0]) if len(obj) else None,
            "end_time": str(obj.index[-1]) if len(obj) else None,
        }
        return meta
    if isinstance(obj, tuple):
        return {"shape": [np.shape(o) for o in obj], "columns": None,
                "num_rows": np.shape(obj[0])[0] if obj else 0}
    arr = np.asarray(obj)
    return {
        "shape": arr.shape,
        "columns": None,
        "num_cols": arr.shape[1] if arr.ndim > 1 else 1,
        "num_rows": arr.shape[0] if arr.ndim > 0 else 0,
    }


def _slice_obj(obj, load_range):
    if hasattr(load_range, "__len__") and len(load_range) == 2 and np.ndim(load_range) == 1:
        sl = slice(int(load_range[0]), int(load_range[1]) + 1)
    else:
        sl = np.asarray(load_range)
    if isinstance(obj, pd.DataFrame):
        return obj.iloc[sl]
    if isinstance(obj, tuple):
        return tuple(np.asarray(o)[sl] for o in obj)
    return np.asarray(obj)[sl]
