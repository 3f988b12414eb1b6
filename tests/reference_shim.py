"""Import shim for the upstream reference package at /root/reference.

The reference (mlfpm/deepof v0.9.0) depends on ~17 packages that are not
installed here (duckdb, umap, numba, shapely, shap, ...). None of them are
needed for the A/B parity surface we test (pure-numpy/pandas kernels, torch
model forwards, Project.create on the bundled fixtures), so this module
installs auto-attribute stub modules for the missing names before importing
``deepof``. numba gets a real shim (``njit`` -> identity decorator,
``prange`` -> ``range``) so the reference's numba kernels run as plain
Python.

Usage::

    from reference_shim import load_reference
    deepof = load_reference()          # the real reference package
    ref_utils = deepof.utils

This module never touches /root/reference on disk; it only imports it.
"""

from __future__ import annotations

import importlib
import importlib.abc
import importlib.machinery
import sys
import types

REFERENCE_ROOT = "/root/reference"

#: top-level module names absent from this environment (checked 2026-08-16)
STUB_MODULES = (
    "catboost",
    "deeptime",
    "duckdb",
    "optuna",
    "ot",
    "pomegranate",
    "seglearn",
    "segment_anything",
    "shap",
    "sleap_io",
    "spektral",
    "statannotations",
    "umap",
    "xgboost",
)


class _AutoStub:
    """Placeholder object: any attribute access returns another _AutoStub.

    Calling it returns another stub, so decorator-style and constructor-style
    uses at import time don't explode. Actually *executing* a stubbed code
    path raises via ``__iter__``/``__bool__`` being unusual rather than
    silently producing garbage data.
    """

    def __init__(self, name: str):
        self._name = name

    def __getattr__(self, item: str) -> "_AutoStub":
        if item.startswith("__") and item.endswith("__"):
            raise AttributeError(item)
        return _AutoStub(f"{self._name}.{item}")

    def __call__(self, *args, **kwargs) -> "_AutoStub":
        return _AutoStub(f"{self._name}()")

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"<reference_shim stub {self._name}>"

    def __mro_entries__(self, bases):
        # Allow ``class X(stub.Base):`` at import time.
        return (object,)


class _StubModule(types.ModuleType):
    def __getattr__(self, item: str):
        if item.startswith("__") and item.endswith("__"):
            raise AttributeError(item)
        stub = _AutoStub(f"{self.__name__}.{item}")
        setattr(self, item, stub)
        return stub


class _StubFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    """Meta-path finder serving stub modules for STUB_MODULES subtrees."""

    def find_spec(self, fullname, path=None, target=None):
        top = fullname.split(".", 1)[0]
        if top in STUB_MODULES:
            return importlib.machinery.ModuleSpec(fullname, self)
        return None

    def create_module(self, spec):
        mod = _StubModule(spec.name)
        mod.__path__ = []  # mark as package so submodule imports resolve here
        return mod

    def exec_module(self, module):
        pass


def _make_natsort_shim() -> types.ModuleType:
    """Real (tiny) natural-sort implementation — file ordering is load-bearing."""
    import re

    ns = types.ModuleType("natsort")

    def _key(s):
        return [
            int(tok) if tok.isdigit() else tok.lower()
            for tok in re.split(r"(\d+)", str(s))
        ]

    def natsorted(seq, key=None):
        if key is None:
            return sorted(seq, key=_key)
        return sorted(seq, key=lambda x: _key(key(x)))

    ns.natsorted = natsorted
    ns.os_sorted = natsorted
    ns.__path__ = []
    return ns


def _make_shapely_shim() -> types.ModuleType:
    """Pure-numpy stand-ins for the small shapely surface the reference uses.

    Covers Polygon (.area shoelace, .exterior.coords, .contains, .bounds,
    .distance) and Point (.distance, .x/.y). Operations with no exact cheap
    equivalent (buffer, simplify, intersection) raise NotImplementedError so
    a test that needs them fails loudly instead of silently diverging.
    """
    import numpy as np

    shapely = types.ModuleType("shapely")
    geometry = types.ModuleType("shapely.geometry")
    polygon_mod = types.ModuleType("shapely.geometry.polygon")

    class _Coords:
        def __init__(self, pts):
            self._pts = [tuple(p) for p in pts]

        def __iter__(self):
            return iter(self._pts)

        def __len__(self):
            return len(self._pts)

        @property
        def xy(self):
            a = np.asarray(self._pts, dtype=float)
            return a[:, 0], a[:, 1]

    class Point:
        def __init__(self, *args):
            if len(args) == 1:
                args = tuple(np.asarray(args[0], dtype=float).ravel())
            self.x, self.y = float(args[0]), float(args[1])

        @property
        def coords(self):
            return _Coords([(self.x, self.y)])

        def distance(self, other):
            if isinstance(other, Point):
                return float(np.hypot(self.x - other.x, self.y - other.y))
            return other.distance(self)

    class _Exterior:
        def __init__(self, pts):
            self.coords = _Coords(pts)

    class Polygon:
        def __init__(self, shell):
            if isinstance(shell, Polygon):
                # shapely's copy construction; the reference hits this via
                # a `type(x != y)` truthiness bug in point_in_polygon.
                shell = shell._pts
            pts = np.asarray([tuple(p) for p in shell], dtype=float)
            if len(pts) and not np.allclose(pts[0], pts[-1]):
                closed = np.vstack([pts, pts[:1]])
            else:
                closed = pts
            self._pts = pts
            self._closed = closed
            self.exterior = _Exterior(closed.tolist())

        @property
        def area(self):
            x, y = self._closed[:-1, 0], self._closed[:-1, 1]
            xn, yn = self._closed[1:, 0], self._closed[1:, 1]
            return float(abs(np.sum(x * yn - xn * y)) / 2.0)

        @property
        def bounds(self):
            p = self._pts
            return (
                float(p[:, 0].min()),
                float(p[:, 1].min()),
                float(p[:, 0].max()),
                float(p[:, 1].max()),
            )

        @property
        def centroid(self):
            x, y = self._closed[:-1, 0], self._closed[:-1, 1]
            xn, yn = self._closed[1:, 0], self._closed[1:, 1]
            cross = x * yn - xn * y
            a = np.sum(cross) / 2.0
            if abs(a) < 1e-12:
                return Point(float(x.mean()), float(y.mean()))
            cx = np.sum((x + xn) * cross) / (6.0 * a)
            cy = np.sum((y + yn) * cross) / (6.0 * a)
            return Point(float(cx), float(cy))

        def contains(self, point):
            # even-odd crossing rule, matching the reference's numba kernel
            # (reference utils.py:1417-1476)
            x, y = point.x, point.y
            pts = self._closed
            inside = False
            for i in range(len(pts) - 1):
                x1, y1 = pts[i]
                x2, y2 = pts[i + 1]
                if (y1 > y) != (y2 > y):
                    xin = (x2 - x1) * (y - y1) / (y2 - y1) + x1
                    if x < xin:
                        inside = not inside
            return inside

        def distance(self, point):
            if self.contains(point):
                return 0.0
            p = np.array([point.x, point.y])
            a = self._closed[:-1]
            b = self._closed[1:]
            ab = b - a
            t = np.clip(
                np.einsum("ij,ij->i", p - a, ab)
                / np.maximum(np.einsum("ij,ij->i", ab, ab), 1e-30),
                0.0,
                1.0,
            )
            proj = a + t[:, None] * ab
            return float(np.sqrt(((p - proj) ** 2).sum(1).min()))

        def buffer(self, distance, quad_segs: int = 16, **k):
            """Convex-polygon buffer.

            Positive distance: Minkowski sum with a disk — offset edges
            joined by vertex arcs (round joins, like shapely; finer
            discretization than shapely's default 8 quad segments so the
            result approaches the exact disk sum). Negative distance:
            erosion — intersection of inward-offset edge lines (exact for
            convex polygons). Good enough for the fixtures' convex arena
            polygons; non-convex shells would need real shapely.
            """
            pts = self._closed[:-1]
            n = len(pts)
            edges = np.roll(pts, -1, axis=0) - pts
            lengths = np.maximum(np.hypot(edges[:, 0], edges[:, 1]), 1e-30)
            # Outward unit normals: the edge-perpendicular pointing away
            # from the centroid (robust to vertex orientation for the
            # convex shells the fixtures use).
            centroid = pts.mean(axis=0)
            perp = np.stack([edges[:, 1], -edges[:, 0]], axis=1) / lengths[:, None]
            mids = pts + edges / 2
            flip = np.einsum("ij,ij->i", perp, mids - centroid) < 0
            normals = np.where(flip[:, None], -perp, perp)

            if distance >= 0:
                out = []
                for i in range(n):
                    v = pts[i]
                    n_prev = normals[i - 1]
                    n_next = normals[i]
                    a0 = np.arctan2(n_prev[1], n_prev[0])
                    a1 = np.arctan2(n_next[1], n_next[0])
                    # Convex vertex: sweep the short way between the two
                    # edge normals.
                    diff = (a1 - a0 + np.pi) % (2 * np.pi) - np.pi
                    steps = max(
                        1, int(np.ceil(abs(diff) / (np.pi / 2) * quad_segs))
                    )
                    for ang in np.linspace(a0, a0 + diff, steps + 1):
                        out.append(v + distance * np.array(
                            [np.cos(ang), np.sin(ang)]
                        ))
                    # Offset edge endpoints.
                    out.append(pts[i] + distance * n_next)
                    out.append(np.roll(pts, -1, axis=0)[i] + distance * n_next)
                return Polygon(np.asarray(out))

            # Erosion: intersect consecutive inward-offset edge lines.
            d = -float(distance)
            p0 = pts + (-d) * normals            # offset edge base points
            dirs = edges / lengths[:, None]
            verts = []
            for i in range(n):
                a1, d1 = p0[i - 1], dirs[i - 1]
                a2, d2 = p0[i], dirs[i]
                denom = d1[0] * d2[1] - d1[1] * d2[0]
                if abs(denom) < 1e-12:
                    verts.append((a1 + a2) / 2)
                    continue
                t = ((a2[0] - a1[0]) * d2[1] - (a2[1] - a1[1]) * d2[0]) / denom
                verts.append(a1 + t * d1)
            return Polygon(np.asarray(verts))

        def simplify(self, *a, **k):
            raise NotImplementedError("shapely shim: simplify")

        def intersection(self, *a, **k):
            raise NotImplementedError("shapely shim: intersection")

    geometry.Point = Point
    geometry.Polygon = Polygon
    polygon_mod.Polygon = Polygon
    geometry.polygon = polygon_mod
    shapely.geometry = geometry
    shapely.Point = Point
    shapely.Polygon = Polygon
    shapely.__path__ = []
    geometry.__path__ = []
    sys.modules["shapely.geometry"] = geometry
    sys.modules["shapely.geometry.polygon"] = polygon_mod
    return shapely


def _make_numba_shim() -> types.ModuleType:
    nb = types.ModuleType("numba")

    def njit(*args, **kwargs):
        if len(args) == 1 and callable(args[0]) and not kwargs:
            return args[0]

        def deco(fn):
            return fn

        return deco

    nb.njit = njit
    nb.jit = njit
    nb.prange = range
    nb.__path__ = []
    return nb


def _read_hdf_via_h5py(path, *args, **kwargs):
    """pytables-free replacement for pd.read_hdf, enough for DLC 'fixed' frames.

    Reconstructs the (T, C) float block + n-level column MultiIndex (with
    level names) + row index directly from the HDF5 datasets pandas writes
    in 'fixed' format.
    """
    import h5py
    import numpy as np
    import pandas as pd

    def _dec(a):
        return [x.decode() if isinstance(x, bytes) else x for x in a]

    with h5py.File(path, "r") as f:
        g = f[next(iter(f.keys()))]
        nlevels = int(g.attrs.get("axis0_nlevels", 1))
        levels, labels, names = [], [], []
        for lvl in range(nlevels):
            ds = g[f"axis0_level{lvl}"]
            levels.append(_dec(ds[:]))
            labels.append(g[f"axis0_label{lvl}"][:].astype(int))
            nm = ds.attrs.get("name")
            names.append(nm.decode() if isinstance(nm, bytes) else nm)
        columns = pd.MultiIndex.from_tuples(
            [
                tuple(levels[lvl][labels[lvl][c]] for lvl in range(nlevels))
                for c in range(len(labels[0]))
            ],
            names=names,
        )
        values = np.asarray(g["block0_values"][:], dtype=np.float64)
        if "block0_items_label0" in g:
            bl_levels, bl_labels = [], []
            for lvl in range(nlevels):
                bl_levels.append(_dec(g[f"block0_items_level{lvl}"][:]))
                bl_labels.append(g[f"block0_items_label{lvl}"][:].astype(int))
            block_items = [
                tuple(bl_levels[lvl][bl_labels[lvl][c]] for lvl in range(nlevels))
                for c in range(len(bl_labels[0]))
            ]
            col_tuples = list(columns)
            if block_items != col_tuples:
                values = values[:, [block_items.index(c) for c in col_tuples]]
        index = _dec(g["axis1"][:]) if "axis1" in g else None
    return pd.DataFrame(values, columns=columns, index=index)


_installed = False


def install() -> None:
    """Install the stub finder + numba shim and put the reference on sys.path."""
    global _installed
    if _installed:
        return
    if "numba" not in sys.modules:
        sys.modules["numba"] = _make_numba_shim()
    if "natsort" not in sys.modules:
        sys.modules["natsort"] = _make_natsort_shim()
    if "shapely" not in sys.modules:
        sys.modules["shapely"] = _make_shapely_shim()
    if not any(isinstance(f, _StubFinder) for f in sys.meta_path):
        sys.meta_path.insert(0, _StubFinder())
    # torch is installed but tensorboard may not be importable under it.
    try:
        importlib.import_module("torch.utils.tensorboard")
    except Exception:
        tb = _StubModule("torch.utils.tensorboard")
        tb.SummaryWriter = _AutoStub("SummaryWriter")
        sys.modules["torch.utils.tensorboard"] = tb
    # pandas.read_hdf needs pytables, which is absent here; DLC .h5 fixture
    # loading goes through it (reference utils.py:2213).
    try:
        importlib.import_module("tables")
    except Exception:
        import pandas as pd

        pd.read_hdf = _read_hdf_via_h5py
    if REFERENCE_ROOT not in sys.path:
        sys.path.append(REFERENCE_ROOT)
    _installed = True


def _apply_compat_patches() -> None:
    """Monkeypatch reference functions that are broken by pandas 3.0.

    Each patch preserves the reference's exact semantics; it only changes
    the pandas idiom used (old pandas silently coerced dtypes where 3.0
    raises). The reference tree itself is never modified.
    """
    import numpy as np
    import pandas as pd

    ref_utils = sys.modules["deepof.utils"]

    # pandas 3.0 returns read-only views from to_numpy(); the reference
    # mutates such arrays in place (e.g. scale_table's distance clamp,
    # utils.py:2534). Wrap to_numpy so read-only results come back as
    # writable copies — identical values, pandas-2 aliasing semantics.
    if not getattr(pd.DataFrame.to_numpy, "_deepof_writable_patch", False):
        _orig_to_numpy = pd.DataFrame.to_numpy

        def _writable_to_numpy(self, *args, **kwargs):
            arr = _orig_to_numpy(self, *args, **kwargs)
            if isinstance(arr, np.ndarray) and not arr.flags.writeable:
                arr = arr.copy()
            return arr

        _writable_to_numpy._deepof_writable_patch = True
        pd.DataFrame.to_numpy = _writable_to_numpy

    # reference utils.py:2425-2566 scale_table: pandas 3.0 breaks its
    # stage-1 idioms on the mixed tuple/string column Index the pipeline
    # produces (scalar-tuple .loc raises or silently no-ops; the string
    # speed loop divides repeatedly). Under the reference's pinned pandas
    # ^1.5 each section divides exactly once. Faithful port of the same
    # semantics with per-column assignment (values identical under the
    # pinned environment).
    from sklearn.preprocessing import (
        MinMaxScaler as _MM, RobustScaler as _RS, StandardScaler as _SS,
    )

    def scale_table_compat(
        df, scale="standard", animal_ids=None, size_ref=("Nose", "Tail_base"),
        inter_scale="mean", standardize=True, dist_standardize="per_column",
        speed_standardize="per_column", coord_standardize="per_column",
        log_distances=True,
    ):
        if not scale:
            return df.copy()
        if scale not in {"standard", "minmax", "robust"}:
            raise ValueError("scale must be one of {'standard','minmax','robust', None/False}")
        for m in (dist_standardize, speed_standardize, coord_standardize):
            if m not in {"per_column", "groupwise", None}:
                raise ValueError("standardize modes must be per_column/groupwise/None")
        if inter_scale not in {"mean", "geom", "global"}:
            raise ValueError("inter_scale must be one of {'mean','geom','global'}")

        out = df.copy()
        ct = ref_utils.infer_column_types(out)
        bodyparts = sorted(ct["bodyparts"])

        def _split_bp(bp):
            return bp.split("_", 1) if "_" in bp else (None, bp)

        if animal_ids is None:
            prefixes = {_split_bp(bp)[0] for bp in bodyparts if _split_bp(bp)[0] is not None}
            animal_ids = sorted(prefixes) or [None]
        animal_ids = list(animal_ids)
        bp_to_aid = {bp: _split_bp(bp)[0] for bp in bodyparts}

        ref_a, ref_b = size_ref
        s_by_aid = {}
        for aid in animal_ids:
            a = ref_a if aid is None else f"{aid}_{ref_a}"
            b = ref_b if aid is None else f"{aid}_{ref_b}"
            need = [(a, "x"), (a, "y"), (b, "x"), (b, "y")]
            if all(c in out.columns for c in need):
                dx = out[(a, "x")].to_numpy() - out[(b, "x")].to_numpy()
                dy = out[(a, "y")].to_numpy() - out[(b, "y")].to_numpy()
                s_by_aid[aid] = np.nanmedian(np.hypot(dx, dy))
            else:
                s_by_aid[aid] = np.nan
        valid = [v for v in s_by_aid.values() if np.isfinite(v) and v > 0]
        s_default = float(np.nanmedian(valid)) if valid else 1.0
        s_by_aid = {
            aid: (v if np.isfinite(v) and v > 0 else s_default)
            for aid, v in s_by_aid.items()
        }

        def _comb(s1, s2):
            if inter_scale == "mean":
                return 0.5 * (s1 + s2)
            if inter_scale == "geom":
                return float(np.sqrt(s1 * s2))
            return s_default

        for aid in animal_ids:
            if aid is None:
                bps = [bp for bp in bodyparts if bp_to_aid.get(bp) is None]
            else:
                bps = [bp for bp in bodyparts if bp_to_aid.get(bp) == aid]
            if not bps:
                continue
            s_val = s_by_aid[aid]
            for bp in bps:
                for ax in ("x", "y"):
                    if (bp, ax) in out.columns:
                        out[(bp, ax)] = out[(bp, ax)].to_numpy() / s_val
                if bp in out.columns:
                    out[bp] = out[bp].to_numpy() / s_val
        for (bp1, bp2) in ct["dists"]:
            a1, a2 = bp_to_aid.get(bp1), bp_to_aid.get(bp2)
            s_val = (
                s_by_aid.get(a1, s_default)
                if a1 == a2
                else _comb(s_by_aid.get(a1, s_default), s_by_aid.get(a2, s_default))
            )
            out[(bp1, bp2)] = out[(bp1, bp2)].to_numpy() / s_val
        if log_distances and ct["dists"]:
            for c in ct["dists"]:
                arr = out[c].to_numpy().copy()
                arr[arr < 0] = 0.0
                out[c] = np.log1p(arr)
        if not standardize:
            return out

        scaler_cls = {"standard": _SS, "minmax": _MM, "robust": _RS}[scale]

        def _fit_transform(cols, mode):
            if not cols or mode is None:
                return
            sc = scaler_cls()
            arr = np.column_stack([out[c].to_numpy() for c in cols])
            if mode == "per_column":
                res = sc.fit_transform(arr)
            else:
                res = sc.fit_transform(arr.reshape(-1, 1)).reshape(arr.shape)
            for i, c in enumerate(cols):
                out[c] = res[:, i]

        _fit_transform(ct["speeds"], speed_standardize)
        if dist_standardize == "per_column":
            _fit_transform(ct["dists"], "per_column")
        elif dist_standardize == "groupwise":
            _fit_transform(ct["inner_dists"], "groupwise")
            _fit_transform(ct["intra_dists"], "groupwise")
        _fit_transform(ct["coords"], coord_standardize)
        return out

    ref_utils.scale_table = scale_table_compat

    # reference utils.py:3584-3629 builds the outlier mask by assigning bool
    # arrays into a float frame copy (TypeError under pandas 3.0). Identical
    # semantics, bool frame from the start.
    _mask_outliers = ref_utils.mask_outliers

    def full_outlier_mask(
        experiment, likelihood, likelihood_tolerance, exclude, lag, n_std, mode
    ):
        body_parts = experiment.columns.levels[0]
        cols = [c for c in experiment.columns if not (exclude and c[0] == exclude)]
        full_mask = pd.DataFrame(
            False,
            index=experiment.index,
            columns=pd.MultiIndex.from_tuples(cols, names=experiment.columns.names),
        )
        for bpart in body_parts:
            if bpart != exclude:
                mask = _mask_outliers(
                    experiment[bpart],
                    likelihood[bpart],
                    likelihood_tolerance,
                    lag,
                    n_std,
                    mode,
                )
                full_mask.loc[:, (bpart, "x")] = np.asarray(mask)
                full_mask.loc[:, (bpart, "y")] = np.asarray(mask)
        return full_mask

    ref_utils.full_outlier_mask = full_outlier_mask


def load_reference():
    """Import and return the reference ``deepof`` package (cached)."""
    install()
    # deepof.utils and deepof.data import each other; importing data first
    # resolves the cycle the same way the package's own __init__ does.
    importlib.import_module("deepof.data")
    _apply_compat_patches()
    return importlib.import_module("deepof")


if __name__ == "__main__":
    pkg = load_reference()
    print("reference deepof loaded:", pkg.__file__)
    from deepof.clustering import models_new

    print("models_new loaded:", models_new.__file__)
