"""Project and Coordinates: the public pipeline API of deepof_tpu.

API-compatible rebuild of deepof/data.py's Project (ingest + preprocess,
:242-1563) and Coordinates (feature access, :1565-3404) — redesigned
tensor-first: every per-frame computation (smoothing, outlier masking,
imputation, mm scaling, distances/angles/areas, centering/alignment/speed)
runs as ONE jitted XLA program over a batched ``(T, B, 2)`` keypoint tensor
per video (vmapped across the cohort), instead of the reference's pandas
per-DataFrame loops. DataFrames exist only at the public API boundary.
"""

from __future__ import annotations

import copy
import os
import pickle
import re
import warnings
from collections import OrderedDict
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

import deepof_tpu.arena as arena_mod
import deepof_tpu.utils as dutils
from deepof_tpu import config
from deepof_tpu.core.graph import BodyGraph, build_body_graph, connect_mouse
from deepof_tpu.core.storage import get_dt, save_dt
from deepof_tpu.core.table_dict import TableDict
from deepof_tpu.io.readers import RawTable, load_table, natural_sorted
from deepof_tpu.ops import (
    align_trajectories,
    all_pair_indices,
    bridge_angles,
    pairwise_distances,
    polygon_areas,
    remove_outliers,
    rolling_speed,
    savgol_edges_host,
    savgol_smooth,
    to_polar,
)
from deepof_tpu.ops.interp import masked_linear_interpolate
from deepof_tpu.ops.geometry import point_in_polygon

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

CURRENT_VERSION = "0.1.0"


def is_display_available() -> bool:  # pragma: no cover
    """Whether interactive OpenCV windows can be opened
    (reference data.py:24-46): requires an X display on Linux and a GUI
    -capable cv2 build. Used to gate the manual arena-annotation GUIs."""
    import sys

    if sys.platform.startswith("linux") and not os.environ.get("DISPLAY"):
        return False
    if cv2 is None:
        return False
    try:
        cv2.namedWindow("__deepof_tpu_display_probe__", cv2.WINDOW_NORMAL)
        cv2.destroyWindow("__deepof_tpu_display_probe__")
        return True
    except cv2.error:
        return False


# --------------------------------------------------------------------------- #
# Jitted preprocessing core
# --------------------------------------------------------------------------- #


@partial(
    jax.jit,
    static_argnames=(
        "smooth_polyorder",
        "smooth_window",
        "do_smooth",
        "do_outliers",
        "interp_limit",
        "n_std",
        "likelihood_tol",
        "animal_slices",
    ),
)
def _preprocess_positions(
    pos: jnp.ndarray,
    lik: jnp.ndarray,
    smooth_edges,
    do_smooth: bool,
    smooth_window: int,
    smooth_polyorder: int,
    do_outliers: bool,
    likelihood_tol: float,
    n_std: float,
    interp_limit: int,
    animal_slices: Tuple[Tuple[int, int], ...],
):
    """Fused preprocess for one video: Savitzky-Golay -> outlier NaN ->
    presence-masked linear interpolation -> missing-animal NaN.

    Mirrors deepof/data.py:867-912 _apply_optional_transforms but as a
    single compiled program.

    Args:
        pos: (T, B, 2) raw pixel positions.
        lik: (T, B) likelihoods.
        animal_slices: per-animal (start, stop) column ranges.

    Returns:
        (positions (T, B, 2), presence (T, A) bool)
    """
    t, b, _ = pos.shape

    if do_smooth:
        flat = pos.reshape(t, b * 2)
        pos = savgol_smooth(
            flat, smooth_window, smooth_polyorder, edges=smooth_edges
        ).reshape(t, b, 2)

    if do_outliers:
        pos, _ = remove_outliers(pos, lik, likelihood_tol, lag=5, n_std=n_std, mode="or")

    # Animal presence: median likelihood across the animal's bodyparts
    # (deepof/utils.py:576-600 compute_animal_presence_mask).
    presences = []
    for (lo, hi) in animal_slices:
        presences.append(jnp.median(lik[:, lo:hi], axis=1) > 0.5)
    presence = jnp.stack(presences, axis=1)  # (T, A)

    # Presence-masked linear interpolation per animal block and channel.
    out_blocks = []
    for ai, (lo, hi) in enumerate(animal_slices):
        block = pos[:, lo:hi].reshape(t, -1)
        pres = presence[:, ai]
        filled = jax.vmap(
            lambda col: masked_linear_interpolate(col, pres, interp_limit),
            in_axes=1,
            out_axes=1,
        )(block)
        # NaN out absent frames entirely (set_missing_animals,
        # deepof/utils.py:676-710).
        filled = jnp.where(pres[:, None], filled, jnp.nan)
        out_blocks.append(filled.reshape(t, hi - lo, 2))
    pos = jnp.concatenate(out_blocks, axis=1)

    return pos, presence


@partial(jax.jit, static_argnames=("pairs", "bridges", "polys"))
def _feature_pass(pos: jnp.ndarray, pairs, bridges, polys):
    """All kinematic features for one video in one compiled program.

    Args:
        pos: (T, B, 2) positions in mm.
        pairs/bridges/polys: static index tuples.

    Returns:
        (distances (T, P), angles (T, A), areas (T, n_areas))
    """
    pairs = np.asarray(pairs, dtype=np.int32).reshape(-1, 2)
    dists = pairwise_distances(pos, pairs)
    if len(bridges):
        angles = bridge_angles(pos, np.asarray(bridges, dtype=np.int32).reshape(-1, 3))
    else:
        angles = jnp.zeros((pos.shape[0], 0), dtype=pos.dtype)
    areas = []
    for poly in polys:
        areas.append(polygon_areas(pos, np.asarray(poly, dtype=np.int32)))
    areas = (
        jnp.stack(areas, axis=1)
        if areas
        else jnp.zeros((pos.shape[0], 0), dtype=pos.dtype)
    )
    return dists, angles, areas


from functools import partial as _partial


@_partial(
    jax.jit,
    static_argnames=("pairs", "bridges", "frame_rate", "include_angles"),
)
def _merged_features_program(
    pos, presence, center_xy, owner_mask,
    pairs, bridges, frame_rate, include_angles,
):
    """One fused device program producing the MERGED graph-dataset feature
    matrix for one experiment: arena-centered coords | speeds | bridge
    angles | graph-edge distances, with per-animal missing-frame NaNs —
    the device twin of get_coords(center="arena") + get_coords(speed=1) +
    get_distances + get_angles + TableDict.merge (reference pipeline
    deepof/data.py:2718-2747), with no host round trip.

    Args:
        pos: (T, B, 2) mm positions.
        presence: (T, A) per-animal presence (0 = missing frame).
        center_xy: (2,) arena center in mm.
        owner_mask: (A, F) bool — column j is NaNed when animal a is
            absent (all of the column's bodyparts belong to a, matching
            utils.filter_columns; inter-animal distances belong to nobody).
        pairs/bridges: static index tuples into the node axis.
    """
    t = pos.shape[0]
    coords = (pos - center_xy[None, None, :]).reshape(t, -1)
    speeds = rolling_speed(pos, frame_rate=frame_rate, deriv=1)
    blocks = [coords, speeds]
    if include_angles and len(bridges):
        blocks.append(
            bridge_angles(pos, np.asarray(bridges, np.int32).reshape(-1, 3))
        )
    if len(pairs):
        blocks.append(
            pairwise_distances(pos, np.asarray(pairs, np.int32).reshape(-1, 2))
        )
    merged = jnp.concatenate(blocks, axis=1)
    absent = presence == 0  # (T, A)
    nan_mask = jnp.any(absent[:, :, None] & owner_mask[None, :, :], axis=1)
    return jnp.where(nan_mask, jnp.nan, merged)


class _DerivedKinematics:
    """On-demand derived kinematics (the reference computes and stores
    these eagerly at create() time, deepof/data.py:996-1100).

    Distances, angles and areas are pure functions of the stored mm
    positions, so instead of materializing the full all-pairs distance
    matrix on the host (C(n,2) columns x T rows per video — by far the
    largest device->host transfer in create()), each video's triple is
    recomputed by the same fused device program on first access, and only
    the requested column subsets ever cross to the host. A small LRU keeps
    the most recent triples on device. Nothing heavy is pickled: the
    positions dict is the same object as Coordinates._tables, so pickle
    memoization stores it once, and the device cache is dropped."""

    def __init__(self, tables, pairs, bridges, polys, cache_size: int = 4):
        self._tables = tables
        self._pairs = tuple(map(tuple, pairs))
        self._bridges = tuple(map(tuple, bridges))
        self._polys = tuple(tuple(int(i) for i in p) for p in polys)
        self._cache_size = int(cache_size)
        self._cache = OrderedDict()

    def parts(self, key):
        trip = self._cache.pop(key, None)
        if trip is None:
            trip = _feature_pass(
                jnp.asarray(self._tables[key]),
                self._pairs, self._bridges, self._polys,
            )
        self._cache[key] = trip
        while len(self._cache) > self._cache_size:
            self._cache.popitem(last=False)
        return trip

    def __getstate__(self):
        state = self.__dict__.copy()
        state["_cache"] = OrderedDict()
        return state


class _LazyArray:
    """Stub standing in for one derived table inside the _distances /
    _angles / _areas dicts; realizes to a device array on demand and
    pickles as a thin reference into the shared _DerivedKinematics."""

    __slots__ = ("store", "key", "part")

    def __init__(self, store: _DerivedKinematics, key: str, part: int):
        self.store, self.key, self.part = store, key, part

    def realize(self):
        return self.store.parts(self.key)[self.part]

    def __array__(self, dtype=None, copy=None):
        out = np.asarray(self.realize())
        if dtype is not None and out.dtype != dtype:
            out = out.astype(dtype)
        elif copy:
            out = out.copy()
        return out

    def __len__(self):
        return len(self.store._tables[self.key])

    def __getstate__(self):
        return (self.store, self.key, self.part)

    def __setstate__(self, state):
        self.store, self.key, self.part = state


def _gather_columns_device(arr, keep_idx, n_cols):
    """Device-side column gather (no host transfer): returns a device
    array (or host ndarray for host-resident tables) holding only the
    kept columns of a (T, C) table."""
    if isinstance(arr, _LazyArray):
        arr = arr.realize()
    full = len(keep_idx) == n_cols
    if isinstance(arr, jax.Array) and not isinstance(arr, np.ndarray):
        if not full:
            arr = jnp.take(
                arr, jnp.asarray(np.asarray(keep_idx, np.int32)), axis=1
            )
        return arr
    a = np.asarray(arr)
    if not full:
        a = a[:, keep_idx]
    return a


def _fetch_all(arrs) -> list:
    """Host copies of a mixed list of device/host arrays, COALESCING the
    device-resident ones into one transfer per dtype.

    Flattening the device arrays and concatenating them ON DEVICE (a
    cheap fused copy) turns the whole batch into ONE wire crossing per
    dtype; the host then splits the flat buffer back with zero-copy
    views. Tunneled-TPU wire facts shaping this design: ~35 MB/s
    download bandwidth, ~25 ms per-transfer latency, and catastrophic
    contention between CONCURRENT transfers (two parallel 28 MB fetches
    measured 287 s vs 2 s coalesced) — so everything is one serial,
    maximally-batched stream."""
    arrs = list(arrs)
    dev = [
        i for i, a in enumerate(arrs)
        if isinstance(a, jax.Array) and not isinstance(a, np.ndarray)
    ]
    if len(dev) > 1:
        groups: dict = {}
        for i in dev:
            groups.setdefault(np.dtype(arrs[i].dtype), []).append(i)
        pending = []  # (indices, flat device array) per dtype group
        for idxs in groups.values():
            if len(idxs) == 1:
                pending.append((idxs, arrs[idxs[0]]))
                continue
            try:
                flat = jnp.concatenate(
                    [arrs[i].reshape(-1) for i in idxs]
                )
            except Exception:  # ragged/odd layouts: fetch individually
                pending.extend(([i], arrs[i]) for i in idxs)
                continue
            pending.append((idxs, flat))
        # Groups are fetched SERIALLY: concurrent transfers through the
        # tunnel contend catastrophically (measured 287 s for two parallel
        # 28 MB fetches vs 2 s coalesced), and per-transfer latency is only
        # ~25 ms, so serialization costs nothing.
        fetched = [np.asarray(p[1]) for p in pending]
        for (idxs, _), host in zip(pending, fetched):
            if len(idxs) == 1:
                arrs[idxs[0]] = host
                continue
            off = 0
            for i in idxs:
                size = int(np.prod(arrs[i].shape, dtype=np.int64))
                arrs[i] = host[off : off + size].reshape(arrs[i].shape)
                off += size
    return [np.asarray(a) for a in arrs]


def _fetch_columns(arr, keep_idx, n_cols) -> np.ndarray:
    """Writable host float64 copy of the selected columns of a (T, C)
    table that may be numpy, a device array, or a _LazyArray —
    device-resident tables are gathered ON device so only the kept
    columns cross the host boundary."""
    return np.array(
        np.asarray(_gather_columns_device(arr, keep_idx, n_cols)),
        dtype=np.float64,
    )


# --------------------------------------------------------------------------- #
# Project
# --------------------------------------------------------------------------- #


class Project:
    """Loads and preprocesses motion-tracking data of one or more animals.

    Same public surface as the reference Project (deepof/data.py:242-276);
    computations are batched XLA programs.
    """

    def __init__(
        self,
        animal_ids: List = None,
        arena: str = "polygonal-autodetect",
        bodypart_graph: Union[str, dict] = "deepof_14",
        iterative_imputation: str = "partial",
        exclude_bodyparts: List = tuple([""]),
        exp_conditions: Union[str, dict] = None,
        start_markers: Union[str, dict] = None,
        remove_outliers: bool = True,
        interpolation_limit: int = 5,
        interpolation_std: int = 3,
        likelihood_tol: float = 0.75,
        model: str = "mouse_topview",
        project_name: str = "deepof_project",
        project_path: str = os.path.join("."),
        video_path: str = None,
        table_path: str = None,
        rename_bodyparts: list = None,
        sam_checkpoint_path: str = None,
        smooth_alpha: float = 1,
        table_format: str = "autodetect",
        video_format: str = ".mp4",
        video_scale: str = None,
        number_of_rois: int = 0,
        frame_rate: float = None,
        fast_implementations_threshold: int = 50000,
        precision: str = "auto",
        point_provider=None,
        arena_reference=None,
    ):
        assert precision in ("auto", "float32", "float64"), precision
        self.precision = precision
        # Manual-arena annotation hook: (frame, key, purpose) -> points.
        # None = interactive OpenCV collector (arena.annotate_arenas_manual).
        self.point_provider = point_provider
        # Polygonal-autodetect calibration reference: the user-annotated
        # polygon whose FIRST side spans `video_scale` mm; detected arenas
        # are simplified to its vertex count and mm-calibrated off the
        # closest side (reference arena_utils.py:335-341). The reference
        # collects this via a first-video GUI; here it is injectable.
        self.arena_reference = arena_reference
        self.version = CURRENT_VERSION
        self.project_path = project_path
        self.project_name = project_name
        self.video_path = video_path
        self.table_path = table_path
        self.source_table_path = table_path
        self.trained_path = os.path.join(project_path, project_name, "trained_models")

        # --- file discovery -------------------------------------------- #
        self.table_format = table_format
        if self.table_format != "analysis.h5":
            self.table_format = self.table_format.replace(".", "")
        if self.table_format == "autodetect":
            known = ("analysis.h5", "h5", "csv", "npy", "slp")
            candidates = [
                f
                for f in os.listdir(self.source_table_path)
                if os.path.isfile(os.path.join(self.source_table_path, f))
                and not f.startswith(".")
                and f.endswith(known)
            ]
            if not candidates:
                raise ValueError(
                    f"No tracking tables ({'/'.join(known)}) found in "
                    f"{self.source_table_path}"
                )
            # Majority format wins (deterministic: ties break by the
            # `known` priority order, not os.listdir order — Tables dirs
            # holding e.g. both csv and h5 exports are common).
            counts = {
                ext: sum(f.endswith(ext) for f in candidates) for ext in known
            }
            # "analysis.h5" files also end with "h5"; don't double-count.
            counts["h5"] -= counts["analysis.h5"]
            self.table_format = max(known, key=lambda e: counts[e])

        video_list = natural_sorted(
            [
                v
                for v in os.listdir(self.video_path)
                if v.endswith(video_format) and not v.startswith(".")
            ]
        )
        table_list = natural_sorted(
            [
                t
                for t in os.listdir(self.source_table_path)
                if t.endswith(self.table_format) and not t.startswith(".")
            ]
        )
        assert len(video_list) == len(table_list), (
            "Unequal number of videos and tables. Please check your file structure"
        )

        self.tables, self.videos = {}, {}
        for i, tab in enumerate(table_list):
            m = re.findall("(.*?)DLC", tab)
            key = m[0] if m else tab.split(".")[0]
            self.tables[key] = tab
            self.videos[key] = video_list[i]

        # --- frame rate ------------------------------------------------ #
        fpses = {}
        for key, vid in self.videos.items():
            cap = cv2.VideoCapture(os.path.join(self.video_path, vid))
            fpses[key] = float(cap.get(cv2.CAP_PROP_FPS))
            cap.release()
        readable = {k: v for k, v in fpses.items() if v > 0}
        if readable and max(readable.values()) - min(readable.values()) > 0.01:
            warnings.warn(
                "The sampling rates of your videos deviate. Proceed with caution."
            )
        if frame_rate is not None:
            self.frame_rate = frame_rate
        elif readable:
            self.frame_rate = readable[next(iter(readable))]
        else:
            warnings.warn(
                "Could not read a frame rate from the videos; defaulting to 25 fps. "
                "Pass frame_rate explicitly to override."
            )
            self.frame_rate = 25.0

        # --- arena dims ------------------------------------------------ #
        self.arena = arena
        pattern = re.compile(r"[+-]?(?:\d+(?:\.\d+)?|\.\d+)\s+\S+")
        if isinstance(video_scale, str) and pattern.fullmatch(video_scale):
            value, unit = video_scale.split(" ")
            self.arena_dims = float(value) * config.DistanceUnit[unit].value
            if self.arena_dims < 50 or self.arena_dims > 5000:
                warnings.warn(
                    f"The arena dimension you entered is {self.arena_dims} mm."
                )
        else:
            raise ValueError(
                'Please enter video_scale as "[value] [unit]", e.g. "380 mm"'
            )

        self.number_of_rois = number_of_rois
        self.ellipse_detection = None

        # --- scale switches -------------------------------------------- #
        total_frames = []
        for key, vid in self.videos.items():
            cap = cv2.VideoCapture(os.path.join(self.video_path, vid))
            total_frames.append(int(cap.get(cv2.CAP_PROP_FRAME_COUNT)))
            cap.release()
        frames_sum, frames_max = int(np.sum(total_frames)), int(np.max(total_frames))
        # All kernels here are XLA-compiled; run_numba is kept for API parity.
        self.run_numba = frames_sum > fast_implementations_threshold
        # Optional ego body part: restrict distances to pairs involving it
        # (deepof/data.py:475,1089); set project.ego = "Nose" before create().
        self.ego = False
        self.very_large_project = (
            frames_max > config.VERY_LARGE_VIDEO_FRAMES
            or frames_sum > config.VERY_LARGE_TOTAL_FRAMES
        )

        # --- bodypart renaming ----------------------------------------- #
        rename_dict = None
        if rename_bodyparts is not None and isinstance(rename_bodyparts, list) and "npy" not in table_format:
            preset = {8: "deepof_8", 11: "deepof_11", 14: "deepof_14"}.get(
                len(rename_bodyparts)
            )
            if preset is None:
                raise NotImplementedError(
                    "Number of custom bodypart names should be 8, 11 or 14."
                )
            nodes = connect_mouse(graph_preset=preset).nodes
            rename_dict = {
                custom: canonical for canonical, custom in zip(nodes, rename_bodyparts)
            }
        elif "npy" in table_format:
            rename_dict = {bp: bp for bp in (rename_bodyparts or [])}

        # --- the rest --------------------------------------------------- #
        self.angles = True
        self.animal_ids = (
            animal_ids if animal_ids not in (None, "") else [""]
        )
        if isinstance(self.animal_ids, str):
            self.animal_ids = [self.animal_ids]
        self.areas = True
        self.bodypart_graph = bodypart_graph
        self.connectivity = None
        self.distances = "all"
        self.ego = False
        if isinstance(exp_conditions, str):
            from deepof_tpu.io.conditions import load_exp_conditions

            self.exp_conditions = load_exp_conditions(exp_conditions)
        else:
            self.exp_conditions = exp_conditions
        if isinstance(start_markers, str):
            from deepof_tpu.io.conditions import load_start_markers

            self.start_markers = load_start_markers(start_markers, self.frame_rate)
        else:
            self.start_markers = start_markers
        self.remove_outliers = remove_outliers
        self.interpolation_limit = interpolation_limit
        self.interpolation_std = interpolation_std
        self.likelihood_tolerance = likelihood_tol
        self.model = model
        self.smooth_alpha = smooth_alpha
        self.video_format = video_format
        self.iterative_imputation = iterative_imputation
        self.exclude_bodyparts = exclude_bodyparts
        self.segmentation_path = sam_checkpoint_path
        self.rename_bodyparts_dict = rename_dict

    def __str__(self):  # pragma: no cover
        return f"deepof_tpu analysis of {len(self.videos)} videos"

    __repr__ = __str__

    # ------------------------------------------------------------------ #
    # Pipeline stages
    # ------------------------------------------------------------------ #

    def set_up_project_directory(self, debug: bool = False):
        """Create the output directory tree."""
        root = os.path.join(self.project_path, self.project_name)
        for sub in ("Tables", "Coordinates", "Figures", "Arena_detection", "trained_models"):
            os.makedirs(os.path.join(root, sub), exist_ok=True)

    def _load_raw_tables(self) -> Dict[str, RawTable]:
        raws = {}
        found_individuals = None
        for key, tab in self.tables.items():
            raw = load_table(
                tab,
                self.source_table_path,
                self.table_format,
                self.rename_bodyparts_dict,
                self.animal_ids,
            )
            if found_individuals is None:
                found_individuals = raw.has_individuals
            else:
                assert raw.has_individuals == found_individuals, (
                    f"Table {key} has inconsistent 'individuals' formatting!"
                )
            if raw.has_individuals and len(self.animal_ids) == 1:
                self.animal_ids = list(raw.animal_ids)
            raws[key] = raw
        return raws

    def _build_graph(self, bodyparts: Sequence[str]) -> BodyGraph:
        exclude = [bp for bp in self.exclude_bodyparts if bp]
        return build_body_graph(
            bodyparts,
            animal_ids=self.animal_ids,
            graph_preset=self.bodypart_graph,
            exclude_bodyparts=exclude or None,
        )

    def preprocess_tables(self, raws: Dict[str, RawTable], verbose: bool = False):
        """Smoothing, outlier removal, imputation and missing-animal
        masking — one fused jit per video (cohort-batched when lengths
        match)."""
        # Canonical node order: sorted graph-relevant bodyparts.
        sample = next(iter(raws.values()))
        graph = self._build_graph(sorted(sample.bodyparts))
        self.body_graph = graph
        self.connectivity = {
            aid: connect_mouse(
                aid if aid else None,
                exclude_bodyparts=[bp for bp in self.exclude_bodyparts if bp] or None,
                graph_preset=self.bodypart_graph,
            )
            for aid in self.animal_ids
        }

        nodes = list(graph.nodes)
        # Per-animal contiguous column ranges in sorted node order.
        animal_slices = []
        for aid in self.animal_ids:
            cols = [
                i
                for i, bp in enumerate(nodes)
                if (bp.startswith(f"{aid}_") if aid else True)
            ]
            animal_slices.append((min(cols), max(cols) + 1))
        self._animal_slices = tuple(animal_slices)

        do_smooth = bool(self.smooth_alpha)
        polyorder = 15 - int(self.smooth_alpha) if do_smooth else 0

        from deepof_tpu.utils import progress

        # Preprocess dtype: float64 matches the reference's pandas numerics
        # bit-for-bit (parity), float32 keeps the TPU path fast. "auto"
        # resolves by platform: f64 on CPU, f32 on accelerators (TPU f64 is
        # emulated and slow).
        if self.precision == "auto":
            use_f64 = (
                jax.default_backend() == "cpu" and jax.config.jax_enable_x64
            )
        else:
            use_f64 = self.precision == "float64"
        dtype = jnp.float64 if use_f64 else jnp.float32

        tab_dict, lik_dict, presence_dict = {}, {}, {}
        # Phase 1: enqueue every video's fused device program (no fetches
        # in this loop — the device pipelines all videos back to back).
        pending = []
        for key, raw in progress(
            list(raws.items()), desc="Preprocessing tables", verbose=verbose
        ):
            ordered = raw.reorder(
                [bp for bp in nodes]
            )
            pos = jnp.asarray(ordered.positions, dtype=dtype)
            lik = jnp.asarray(ordered.likelihood, dtype=dtype)
            smooth_edges = None
            if do_smooth:
                # scipy-exact edge rows, computed on host (ops/smoothing.py:
                # savgol_edges_host) — required for 1e-5 parity with the
                # reference at its default alpha=1 (polyorder 14).
                t_total = ordered.positions.shape[0]
                flat_np = ordered.positions.reshape(t_total, -1)
                e_start, e_end = savgol_edges_host(flat_np, 15, polyorder)
                smooth_edges = (
                    jnp.asarray(e_start, dtype=dtype),
                    jnp.asarray(e_end, dtype=dtype),
                )
            out_pos, presence = _preprocess_positions(
                pos,
                lik,
                smooth_edges,
                do_smooth,
                15,
                polyorder,
                bool(self.remove_outliers),
                float(self.likelihood_tolerance),
                float(self.interpolation_std),
                int(3),  # lin_interp_limit (deepof/utils.py:230)
                self._animal_slices,
            )
            # Host copy straight from the raw table: `lik` was only moved
            # to device as a kernel input, pulling it back would be a
            # pointless device round trip.
            lik_host = np.asarray(
                ordered.likelihood, dtype=np.float64 if use_f64 else np.float32
            )
            pending.append((key, out_pos, presence, lik_host))

        # Phase 2: collect — all transfers overlap (threaded fetch).
        flat = _fetch_all(
            [a for _, op, pr, _ in pending for a in (op, pr)]
        )
        for i, (key, _, _, lik_host) in enumerate(pending):
            # Keep the device dtype (f64 on the CPU parity path, f32 on
            # accelerators): getters upcast on access, and f32 storage
            # halves both host materialization and the pickled project.
            out_pos = flat[2 * i]
            presence = flat[2 * i + 1]
            if self.iterative_imputation == "full":
                # f64 copy: the device array surfaces as a read-only view,
                # _full_imputation writes imputed blocks in place, and the
                # MICE sweep is specified in double precision.
                out_pos = self._full_imputation(
                    np.array(out_pos, dtype=np.float64), presence
                )

            tab_dict[key] = out_pos
            lik_dict[key] = lik_host
            presence_dict[key] = presence

        self._presence = presence_dict
        return tab_dict, lik_dict

    def _full_imputation(self, pos: np.ndarray, presence: np.ndarray) -> np.ndarray:
        """Iterative ridge + Kalman/RTS + skeleton constraints for large
        gaps (reference MouseTrackingImputer full mode,
        deepof/utils.py:291-382)."""
        from deepof_tpu.ops import (
            enforce_skeleton_constraints,
            estimate_skeleton_constraints,
            iterative_ridge_impute,
            kalman_rts_smooth,
        )

        graph = self.body_graph
        for ai, aid in enumerate(self.animal_ids):
            lo, hi = self._animal_slices[ai]
            pres = presence[:, ai].astype(bool)
            block = pos[pres, lo:hi]  # (Tp, Ba, 2)
            if not np.isnan(block).any() or block.shape[0] < 2:
                continue
            original = np.isfinite(block)
            t_p, b_a, _ = block.shape
            try:
                edges = [
                    (int(i) - lo, int(j) - lo)
                    for i, j in graph.edges
                    if lo <= i < hi and lo <= j < hi
                ]
                constraints = estimate_skeleton_constraints(block, edges)
            except ValueError:
                warnings.warn(
                    f"Animal {aid} has not enough data. Skipping full imputation."
                )
                continue
            flat = block.reshape(t_p, -1)
            # np.array (not asarray): device arrays surface as read-only
            # views, and the observed positions are written back in place.
            imputed = np.array(iterative_ridge_impute(jnp.asarray(flat, jnp.float32)))
            imputed = imputed.reshape(t_p, b_a, 2)
            imputed[original] = block[original]
            smoothed = np.array(kalman_rts_smooth(jnp.asarray(imputed, jnp.float32)))
            smoothed[original] = block[original]
            constrained = np.asarray(
                enforce_skeleton_constraints(
                    jnp.asarray(smoothed, jnp.float32),
                    constraints,
                    jnp.asarray(original),
                )
            )
            pos[np.where(pres)[0][:, None], np.arange(lo, hi)[None, :]] = constrained
        return pos

    def get_arena(
        self, tables=None, arena_path: str = None, debug: bool = False,
        test: bool = False, verbose: bool = False, load_also_rois: bool = False,
    ):
        """Arena calibration (deepof/data.py:687 -> arena_utils.get_arenas).

        With ``arena_path``, previously saved arena data is loaded instead
        of re-running detection (reference data.py:711-718). ``debug`` is
        accepted for signature parity; detection always exports the
        per-video arena overlay images into the project's Arena folder.
        """
        if arena_path is not None:
            roi_dicts, arena_params, scales, video_resolution = (
                self.load_arena_data(arena_path, load_also_rois=True)
            )
            if roi_dicts is None:
                # Saved file holds no ROIs: fail loudly at load time if the
                # project expects them, instead of propagating None into
                # Coordinates where every later ROI call would crash.
                if self.number_of_rois > 0:
                    raise ValueError(
                        f"Project expects {self.number_of_rois} ROIs but the "
                        f"arena file '{arena_path}' contains none; re-run "
                        "arena detection or save ROI data into the file."
                    )
                roi_dicts = {key: {} for key in arena_params}
            self.scales = scales
            return scales, arena_params, roi_dicts, video_resolution
        out = arena_mod.get_arenas(
            self,
            self.arena,
            self.arena_dims,
            self.number_of_rois,
            self.segmentation_path,
            self.video_path,
            self.videos,
            test=test,
            point_provider=self.point_provider,
            arena_reference=self.arena_reference,
        )
        self.scales = out[0]
        return out

    def save_arena_data(
        self, arena_path: str, arena_params: dict = None, roi_dicts: dict = None,
        scales: dict = None, video_resolution: dict = None,
    ) -> None:
        """Persist arena parameters / ROIs / scales as one pickle
        (deepof/data.py:588-615)."""
        os.makedirs(os.path.dirname(os.path.abspath(arena_path)), exist_ok=True)
        payload = {
            "roi_dicts": roi_dicts, "arena_params": arena_params,
            "scales": scales, "video_resolution": video_resolution,
        }
        with open(arena_path, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)

    def load_arena_data(self, arena_path: str, load_also_rois: bool = False):
        """Load (roi_dicts, arena_params, scales, video_resolution) from a
        pickle, validating keys against the project's videos
        (deepof/data.py:618-683)."""
        if not os.path.isfile(arena_path):
            raise FileNotFoundError(f"Arena file not found: {arena_path}")
        with open(arena_path, "rb") as f:
            data = pickle.load(f)
        if isinstance(data, dict) and {
            "roi_dicts", "arena_params", "scales"
        } <= set(data.keys()):
            roi_dicts = data["roi_dicts"]
            arena_params = data["arena_params"]
            scales = data["scales"]
            video_resolution = data.get("video_resolution")
        elif isinstance(data, (tuple, list)) and len(data) == 4:
            roi_dicts, arena_params, scales, video_resolution = data
        else:
            raise ValueError("Invalid arena pickle format.")
        assert set(arena_params.keys()) == set(self.videos.keys()), (
            "Keys of Arena objects do not match project keys, could not "
            "load arena info"
        )
        if not load_also_rois:
            return None, arena_params, scales, video_resolution
        return roi_dicts, arena_params, scales, video_resolution

    def load_exp_conditions(self, filepath: str):
        """Load experimental conditions pre-create (deepof/data.py:562)."""
        from deepof_tpu.io.conditions import load_exp_conditions

        self.exp_conditions = load_exp_conditions(filepath)

    def load_start_markers(self, filepath: str):
        """Load start markers pre-create (deepof/data.py:557-559)."""
        from deepof_tpu.io.conditions import load_start_markers

        self.start_markers = load_start_markers(filepath, self.frame_rate)

    # -- pipeline stages exposed standalone (deepof/data.py:996-1200) -- #

    def _as_tensor(self, tab):
        """(T, B, 2) float array from a tensor or a DLC-style DataFrame."""
        if isinstance(tab, pd.DataFrame):
            nodes = list(self.body_graph.nodes)
            arr = np.stack(
                [tab[node].loc[:, ["x", "y"]].to_numpy(float) for node in nodes],
                axis=1,
            )
            return arr
        return np.asarray(tab, np.float64)

    def _derived_parts(self, tab_dict):
        nodes = list(self.body_graph.nodes)
        pairs = tuple(map(tuple, all_pair_indices(len(nodes))))
        bridges = tuple(map(tuple, self.body_graph.bridges))
        poly_list, area_names = [], []
        for aid in self.animal_ids:
            for area_name, poly in self.body_graph.area_polys.get(aid, {}).items():
                poly_list.append(tuple(int(i) for i in poly))
                area_names.append(f"{aid}_{area_name}" if aid else area_name)
        tensors = {k: self._as_tensor(v) for k, v in tab_dict.items()}
        store = _DerivedKinematics(tensors, pairs, bridges, tuple(poly_list))
        pair_names = [
            tuple(sorted((nodes[i], nodes[j]))) for i, j in pairs
        ]
        return store, pair_names, list(self.body_graph.bridge_names), area_names

    def scale_tables(self, tab_dict):
        """Scale raw px tables to mm using the arena scales
        (deepof/data.py:996-1026). Requires :meth:`get_arena` to have run
        (or ``arena_path`` data loaded) so per-video scales exist."""
        scales = getattr(self, "scales", None)
        assert scales is not None, (
            "run get_arena() (or create()) before scale_tables(): per-video "
            "px->mm scales are produced by arena detection"
        )
        out = {}
        for key, tab in tab_dict.items():
            ratio = scales[key][3] / scales[key][2]
            out[key] = tab * ratio
        return out

    def get_distances(self, tab_dict) -> dict:
        """All-pairs bodypart distances per video (deepof/data.py:1031);
        computed by the fused device kernel, returned as DataFrames."""
        store, pair_names, _, _ = self._derived_parts(tab_dict)
        return {
            key: pd.DataFrame(
                np.asarray(store.parts(key)[0]), columns=pair_names
            )
            for key in tab_dict
        }

    def get_distances_tab(self, tab) -> pd.DataFrame:
        """Single-table variant of :meth:`get_distances`
        (deepof/data.py:1065)."""
        return self.get_distances({"__tab__": tab})["__tab__"]

    def get_angles(self, tab_dict) -> dict:
        """Bridge-trio angles per video (deepof/data.py:1100)."""
        store, _, bridge_names, _ = self._derived_parts(tab_dict)
        return {
            key: pd.DataFrame(
                np.asarray(store.parts(key)[1]), columns=bridge_names
            )
            for key in tab_dict
        }

    def get_areas(self, tab_dict) -> dict:
        """Head/torso/back polygon areas per video (deepof/data.py:1165)."""
        store, _, _, area_names = self._derived_parts(tab_dict)
        return {
            key: pd.DataFrame(
                np.asarray(store.parts(key)[2]), columns=area_names
            )
            for key in tab_dict
        }

    # ------------------------------------------------------------------ #
    # create
    # ------------------------------------------------------------------ #

    def create(
        self, verbose: bool = True, force: bool = False, debug: bool = False,
        test: bool = False, arena_path: str = None, _to_extend=None,
    ) -> "Coordinates":
        """Run the full pipeline and return a Coordinates object.

        ``arena_path`` loads previously saved arena/ROI/scale data instead
        of re-running detection (reference data.py:1294-1353);
        ``_to_extend`` is accepted for reference signature parity (the
        repo's extend flow lives on :meth:`extend`)."""
        project_dir = os.path.join(self.project_path, self.project_name)
        if os.path.exists(os.path.join(project_dir, "Coordinates")) and not force:
            existing = os.listdir(os.path.join(project_dir, "Coordinates"))
            if existing:
                raise OSError(
                    "Project already exists. Use force=True to overwrite."
                )
        self.set_up_project_directory(debug=debug)

        raws = self._load_raw_tables()
        tab_dict, lik_dict = self.preprocess_tables(raws, verbose=verbose)

        scales, arena_params, roi_dicts, video_resolution = self.get_arena(
            arena_path=arena_path, test=test,
        )

        nodes = list(self.body_graph.nodes)
        # Pixel -> mm scaling (deepof/data.py:996-1026).
        for key in tab_dict:
            ratio = scales[key][3] / scales[key][2]
            tab_dict[key] = tab_dict[key] * ratio

        # Kinematic features, one fused program per video.
        pairs = tuple(map(tuple, all_pair_indices(len(nodes))))
        bridges = tuple(map(tuple, self.body_graph.bridges))
        poly_list, area_names = [], []
        for aid in self.animal_ids:
            for area_name, poly in self.body_graph.area_polys.get(aid, {}).items():
                poly_list.append(tuple(int(i) for i in poly))
                area_names.append(f"{aid}_{area_name}" if aid else area_name)
        if any(
            len(self.body_graph.area_polys.get(aid, {})) != 4
            for aid in self.animal_ids
        ):
            warnings.warn(
                "Not all areas could be computed with the available bodyparts."
            )

        # Derived kinematics stay DEFERRED: each video's
        # distances/angles/areas triple is recomputed on device on first
        # access and only requested column subsets are fetched
        # (_DerivedKinematics). Eager computation shipped the full
        # all-pairs matrix host-side — the single largest create() cost.
        store = _DerivedKinematics(tab_dict, pairs, bridges, tuple(poly_list))
        dist_dict = {k: _LazyArray(store, k, 0) for k in tab_dict}
        angle_dict = {k: _LazyArray(store, k, 1) for k in tab_dict}
        area_dict = {k: _LazyArray(store, k, 2) for k in tab_dict}

        pair_names = [
            tuple(sorted((nodes[i], nodes[j]))) for i, j in all_pair_indices(len(nodes))
        ]
        bridge_names = list(self.body_graph.bridge_names)

        coordinates = Coordinates(
            project_path=self.project_path,
            project_name=self.project_name,
            animal_ids=self.animal_ids,
            arena=self.arena,
            arena_dims=self.arena_dims,
            bodypart_graph=self.bodypart_graph,
            body_graph=self.body_graph,
            nodes=nodes,
            pair_names=pair_names,
            bridge_names=bridge_names,
            area_names=area_names,
            path=self.project_path,
            quality=lik_dict,
            scales=scales,
            frame_rate=self.frame_rate,
            arena_params=arena_params,
            roi_dicts=roi_dicts,
            tables=tab_dict,
            distances=dist_dict,
            angles=angle_dict,
            areas=area_dict,
            presence=self._presence,
            source_table_path=self.source_table_path,
            table_paths=list(self.tables.values()),
            trained_model_path=self.trained_path,
            videos=self.videos,
            video_path=self.video_path,
            video_resolution=video_resolution,
            connectivity=self.connectivity,
            excluded_bodyparts=list(self.exclude_bodyparts),
            exp_conditions=self.exp_conditions,
            start_markers=self.start_markers,
            number_of_rois=self.number_of_rois,
            run_numba=self.run_numba,
            very_large_project=self.very_large_project,
            ego=self.ego,
            version=self.version,
        )
        coordinates.reset_supervised_parameters(save=False)
        coordinates.save(timestamp=False)
        if verbose:
            print("Done!")
        return coordinates

    def extend(
        self,
        project_to_extend: str,
        video_path: str = None,
        table_path: str = None,
        verbose: bool = True,
        debug: bool = False,
        test: bool = False,
    ) -> "Coordinates":
        """Extend an existing project with this project's new experiments
        (deepof/data.py:1459-1563): process only the keys absent from the
        saved Coordinates, then merge the per-experiment stores."""
        import shutil

        previous = load_project(project_to_extend)
        assert previous._number_of_rois == self.number_of_rois, (
            "Cannot extend: the number of ROIs must match."
        )
        new_keys = sorted(set(self.videos) - set(previous._videos))
        if verbose:
            print(f"Processing data from {len(new_keys)} new experiments...")
        if not new_keys:
            return previous

        self.videos = {k: self.videos[k] for k in new_keys}
        self.tables = {k: self.tables[k] for k in new_keys}

        prev_vid_path = previous._video_path
        prev_tab_path = previous._source_table_path
        if video_path is None:
            video_path = self.video_path
        if table_path is None:
            table_path = self.source_table_path
        if os.path.abspath(video_path) != os.path.abspath(prev_vid_path):
            for vid in self.videos.values():
                shutil.copy2(
                    os.path.join(video_path, vid), os.path.join(prev_vid_path, vid)
                )
        if os.path.abspath(table_path) != os.path.abspath(prev_tab_path):
            for tab in self.tables.values():
                shutil.copy2(
                    os.path.join(table_path, tab), os.path.join(prev_tab_path, tab)
                )
        self.video_path = prev_vid_path
        self.source_table_path = prev_tab_path

        new_coords = self.create(verbose=verbose, force=True, debug=debug, test=test)

        # Merge per-experiment stores into the previous Coordinates.
        for attr in (
            "_tables", "_quality", "_distances", "_angles", "_areas",
            "_presence", "_scales", "_arena_params", "_videos",
            "_video_resolution",
        ):
            getattr(previous, attr).update(getattr(new_coords, attr))
        if previous._roi_dicts is not None and new_coords._roi_dicts is not None:
            previous._roi_dicts.update(new_coords._roi_dicts)
        if new_coords._exp_conditions:
            previous._exp_conditions = {
                **(previous._exp_conditions or {}), **new_coords._exp_conditions
            }
        previous.save(timestamp=False)
        return previous


# --------------------------------------------------------------------------- #
# Coordinates
# --------------------------------------------------------------------------- #


class Coordinates:
    """Stores a processed project: batched keypoint tensors + metadata, with
    reference-compatible DataFrame getters."""

    def __init__(
        self,
        project_path,
        project_name,
        animal_ids,
        arena,
        arena_dims,
        bodypart_graph,
        body_graph: BodyGraph,
        nodes: List[str],
        pair_names: List[tuple],
        bridge_names: List[tuple],
        area_names: List[str],
        path,
        quality: Dict[str, np.ndarray],
        scales,
        frame_rate,
        arena_params,
        roi_dicts,
        tables: Dict[str, np.ndarray],
        distances: Dict[str, np.ndarray],
        angles: Dict[str, np.ndarray],
        areas: Dict[str, np.ndarray],
        presence: Dict[str, np.ndarray],
        source_table_path,
        table_paths,
        trained_model_path,
        videos,
        video_path,
        video_resolution,
        connectivity=None,
        excluded_bodyparts=None,
        exp_conditions=None,
        start_markers=None,
        number_of_rois: int = 0,
        run_numba: bool = False,
        very_large_project: bool = False,
        ego=False,
        version: str = None,
    ):
        self._project_path = project_path
        self._project_name = project_name
        self._animal_ids = animal_ids
        self._arena = arena
        self._arena_params = arena_params
        self._roi_dicts = roi_dicts
        self._arena_dims = arena_dims
        self._bodypart_graph = bodypart_graph
        self._body_graph = body_graph
        self._nodes = list(nodes)
        self._pair_names = pair_names
        self._bridge_names = bridge_names
        self._area_names = area_names
        self._excluded = excluded_bodyparts
        self._exp_conditions = exp_conditions
        self._start_markers = start_markers
        self._frame_rate = frame_rate
        self._path = path
        self._quality = quality
        self._scales = scales
        self._tables = tables
        self._distances = distances
        self._angles = angles
        self._areas = areas
        self._presence = presence
        self._source_table_path = source_table_path
        self._table_paths = table_paths
        self._trained_model_path = trained_model_path
        self._videos = videos
        self._video_path = video_path
        self._video_resolution = video_resolution
        self._connectivity = connectivity
        self._number_of_rois = number_of_rois
        self._run_numba = run_numba
        self._very_large_project = very_large_project
        self._ego = ego
        self._version = version
        self._custom_behaviors = None
        self._custom_continuous_behavior_names = []

    def __str__(self):  # pragma: no cover
        n = len(self._videos)
        return f"deepof_tpu analysis of {n} video{'s' if n > 1 else ''}"

    __repr__ = __str__

    # ------------------------------------------------------------------ #
    # Basic accessors
    # ------------------------------------------------------------------ #

    def get_table_keys(self):
        return self._tables.keys()

    @property
    def _table_path(self):
        return os.path.join(self._project_path, self._project_name, "Tables")

    def _time_index(self, n: int):
        # Building the string index costs one str(Timedelta) per frame;
        # every getter re-indexes, so cache per (length, frame_rate).
        cache = getattr(self, "_time_index_cache", None)
        if cache is None:
            cache = {}
            object.__setattr__(self, "_time_index_cache", cache)
        key = (n, self._frame_rate)
        if key not in cache:
            cache[key] = dutils.make_time_index(n, self._frame_rate)
        return cache[key]

    def get_start_times(self, start_marker: Optional[str] = None) -> Dict[str, str]:
        """Per-experiment start times as "HH:MM:SS(.sss)" strings."""
        if start_marker and self._start_markers:
            return {
                key: str(self._start_markers[key][start_marker].iloc[0])
                for key in self._tables
            }
        return {key: "00:00:00.000" for key in self._tables}

    @property
    def get_exp_conditions(self):
        """Stored per-experiment condition tables (property, like the
        reference deepof/data.py:2448)."""
        return self._exp_conditions

    def get_condition_values(self, exp_cond):
        """Unique values of one experimental condition across experiments
        (deepof/data.py:2458)."""
        conditions = []
        for key in (self._exp_conditions or {}):
            df = self._exp_conditions[key]
            if hasattr(df, "columns") and exp_cond in df.columns:
                conditions.append(df[exp_cond].iloc[0])
        assert len(conditions) > 0, (
            f"Given experiment condition {exp_cond} not in experiment conditions!"
        )
        return list(np.unique(conditions))

    @property
    def get_start_markers(self):
        """Stored start markers per experiment (deepof/data.py:2454)."""
        return self._start_markers

    def get_start_marker_values(self, start_marker, return_frames: bool = True):
        """Start marker per experiment, as frame index or time string
        (deepof/data.py:2466)."""
        starts = {}
        markers = self._start_markers or {}
        for key, df in markers.items():
            assert start_marker in df, (
                f"given start_marker is missing at key {key}"
            )
            value = df[start_marker].iloc[0]
            if return_frames:
                starts[key] = int(
                    np.round(dutils.time_to_seconds(value) * self._frame_rate)
                )
            else:
                starts[key] = value
        return starts

    def get_end_times(self):
        """End timestamp per experiment table (deepof/data.py:2410)."""
        return {
            key: dutils.seconds_to_time(
                (len(self._tables[key]) - 1) / self._frame_rate,
                cut_milliseconds=False,
            )
            for key in self._tables
        }

    def get_table_lengths(self, tab_dict_for_binning=None, start_marker=None):
        """Frame count per experiment, optionally measured on another
        TableDict and shortened by a start marker (deepof/data.py:2419)."""
        if tab_dict_for_binning is None:
            lengths = {key: len(self._tables[key]) for key in self._tables}
        else:
            # Metainfo-only: never materialize the table just to count rows.
            lengths = {
                k: int(
                    get_dt(tab_dict_for_binning, k, only_metainfo=True)[
                        "num_rows"
                    ]
                )
                for k in tab_dict_for_binning.keys()
            }
        if start_marker is None:
            return lengths
        out = {}
        for key, full in lengths.items():
            start_time = self._start_markers[key][start_marker].iloc[0]
            start_frame = np.round(
                dutils.time_to_seconds(start_time) * self._frame_rate
            )
            short = int(np.round(full - start_frame))
            assert short > 0, (
                f"start marker {start_marker} at experiment {key} is exceeding "
                "the length of the experiment table!"
            )
            out[key] = short
        return out

    def edit_arenas(
        self, video_keys: list = None, arena_type: str = None,
        verbose: bool = True, test: bool = False, point_provider=None,
    ):
        """Re-annotate arenas for selected videos and persist the result
        (deepof/data.py:2510-2575). Autodetect types are re-run; manual
        types take points from ``point_provider`` (see
        arena.annotate_arenas_manual) or the interactive OpenCV collector
        (display required); test=True keeps the fixture path. Updated
        parameters overwrite the stored arena pickle."""
        import deepof_tpu.arena as arena_mod

        if video_keys is None:
            video_keys = list(self._videos.keys())
        if arena_type is None:
            arena_type = self._arena
        unknown = [k for k in video_keys if k not in self._videos]
        assert not unknown, f"Unknown video keys: {unknown}"
        if verbose:
            print(f"Editing {len(video_keys)} arena(s)")

        scales, arena_params, roi_dicts, video_resolution = arena_mod.get_arenas(
            self, arena_type, self._arena_dims, self._number_of_rois,
            None, self._video_path,
            {k: self._videos[k] for k in video_keys}, test=test,
            point_provider=point_provider,
        )
        self._scales.update(scales)
        self._arena_params.update(arena_params)
        if roi_dicts:
            (self._roi_dicts or {}).update(roi_dicts)
        self.save(timestamp=False)

    def save_arena_data(
        self, arena_path: str, arena_params: dict = None, roi_dicts: dict = None,
        scales: dict = None, video_resolution: dict = None,
    ) -> None:
        """Persist arena parameters / ROIs / scales as one pickle
        (deepof/data.py:588-615)."""
        arena_params = arena_params if arena_params is not None else self._arena_params
        roi_dicts = roi_dicts if roi_dicts is not None else self._roi_dicts
        scales = scales if scales is not None else self._scales
        video_resolution = (
            video_resolution if video_resolution is not None
            else self._video_resolution
        )
        os.makedirs(os.path.dirname(os.path.abspath(arena_path)), exist_ok=True)
        payload = {
            "roi_dicts": roi_dicts, "arena_params": arena_params,
            "scales": scales, "video_resolution": video_resolution,
        }
        with open(arena_path, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)

    def load_arena_data(self, arena_path: str, load_also_rois: bool = False):
        """Load (roi_dicts, arena_params, scales, video_resolution) from a
        pickle with key-consistency checks (deepof/data.py:618-683)."""
        if not os.path.isfile(arena_path):
            raise FileNotFoundError(f"Arena file not found: {arena_path}")
        with open(arena_path, "rb") as f:
            data = pickle.load(f)
        if isinstance(data, dict) and {
            "roi_dicts", "arena_params", "scales"
        } <= set(data.keys()):
            roi_dicts = data["roi_dicts"]
            arena_params = data["arena_params"]
            scales = data["scales"]
            video_resolution = data.get("video_resolution")
        elif isinstance(data, (tuple, list)) and len(data) == 4:
            roi_dicts, arena_params, scales, video_resolution = data
        else:
            raise ValueError("Invalid arena pickle format.")
        expected = set(arena_params.keys())
        assert expected == set(self._tables.keys()), (
            "Keys of Arena objects do not match project keys, could not load "
            "arena info"
        )
        if not load_also_rois:
            return None, arena_params, scales, video_resolution
        return roi_dicts, arena_params, scales, video_resolution

    def load_exp_conditions(self, filepath: str):  # pragma: no cover
        from deepof_tpu.io.conditions import load_exp_conditions

        self._exp_conditions = load_exp_conditions(filepath)

    def load_start_markers(self, filepath: str):
        """Load per-experiment start markers from CSV
        (deepof/data.py:2477-2482)."""
        from deepof_tpu.io.conditions import load_start_markers

        self._start_markers = load_start_markers(filepath, self._frame_rate)

    def get_quality(self) -> TableDict:
        """Tracking likelihood per bodypart as DataFrames."""
        tabs = {}
        for key, lik in self._quality.items():
            df = pd.DataFrame(
                np.asarray(lik, dtype=np.float64), columns=self._nodes
            )
            df.index = self._time_index(len(df))
            tabs[key] = df
        return TableDict(
            tabs, typ="quality", table_path=self._table_path,
            animal_ids=self._animal_ids,
        )

    def get_arenas(self):
        return self._arena, [self._arena_dims], self._arena_params

    def get_videos(self, full_paths: bool = False, play: bool = False):
        """Videos per experiment; with full_paths, absolute paths
        (deepof/data.py:2376-2384)."""
        if play:  # pragma: no cover — interactive
            raise NotImplementedError
        if full_paths:
            return {
                key: os.path.join(self._video_path, video)
                for key, video in self._videos.items()
            }
        return self._videos

    # ------------------------------------------------------------------ #
    # DataFrame builders
    # ------------------------------------------------------------------ #

    def _coords_frame(self, key: str, arr: np.ndarray, polar: bool = False) -> pd.DataFrame:
        coords = ("rho", "phi") if polar else ("x", "y")
        cols = pd.MultiIndex.from_product([self._nodes, list(coords)])
        df = pd.DataFrame(arr.reshape(arr.shape[0], -1), columns=cols)
        df.index = self._time_index(len(df))
        return df

    # ------------------------------------------------------------------ #
    # get_coords
    # ------------------------------------------------------------------ #

    def get_coords_at_key(
        self,
        key: str,
        scale=None,
        quality=None,
        center: Union[bool, str] = False,
        polar: bool = False,
        speed: int = 0,
        align: Union[bool, str] = False,
        align_group: bool = False,
        align_inplace: bool = True,
        to_video: bool = False,
        selected_id: str = None,
        roi_number: int = None,
        animals_in_roi=None,
        in_roi_criterion: str = "Center",
        invert_roi: bool = False,
        _finalize: bool = True,
    ):
        """Coordinate getter pipeline for one experiment
        (deepof/data.py:1936-2021): ROI filter -> animal select -> polar ->
        center -> align -> derivative -> missing-animal NaN.

        With ``_finalize=False``, stops before any device->host transfer
        and returns ``(array-or-device-array, col_order)`` for
        _coords_finalize — get_coords uses this to overlap transfers
        across experiments."""
        if scale is None:
            scale = self._scales[key]
        pos = np.array(self._tables[key], dtype=np.float64)  # (T, B, 2) mm
        nodes = self._nodes
        presence = self._presence[key]

        # ROI filter.
        if roi_number is not None:
            pos = self._apply_roi_mask(
                pos, key, roi_number, animals_in_roi, in_roi_criterion, invert_roi
            )

        # Animal selection.
        animal_ids = [selected_id] if selected_id else list(self._animal_ids)
        node_idx = list(range(len(nodes)))
        if selected_id:
            node_idx = [
                i for i, bp in enumerate(nodes) if bp.startswith(selected_id)
            ]
            pos = pos[:, node_idx]
            nodes = [nodes[i] for i in node_idx]

        # Polar / center / align / speed.
        if polar:
            polar_scale = np.array(
                [np.hypot(scale[0], scale[1]), np.arctan2(scale[1], scale[0])]
            )
            work = np.asarray(to_polar(jnp.asarray(pos)))
            if center == "arena":
                work[..., 0] -= polar_scale[0]
                work[..., 1] -= polar_scale[1]
            elif isinstance(center, str) and center:
                work = self._center_on_bodypart(work, nodes, animal_ids, center)
            pos_out = work
        else:
            work = pos
            if center == "arena":
                work = work - np.array(scale[:2])[None, None, :]
            elif isinstance(center, str) and center:
                work = self._center_on_bodypart(work, nodes, animal_ids, center)
            if to_video:
                work = work * (scale[2] / scale[3])
            pos_out = work

        col_order = nodes
        if align and align_inplace and not polar:
            pos_out, col_order = self._align(pos_out, nodes, animal_ids, align, align_group)

        if speed:
            # (T, N, 2) -> per-bodypart n-th derivative magnitude, straight
            # from the position array (building the intermediate coords
            # frame first, as the reference does, only adds pandas copies).
            out = rolling_speed(
                jnp.asarray(
                    np.ascontiguousarray(
                        pos_out.reshape(pos_out.shape[0], -1, 2),
                        dtype=np.float64,
                    )
                ),
                frame_rate=self._frame_rate,
                deriv=speed,
            )
        else:
            out = pos_out

        if not _finalize:
            return out, col_order
        return self._coords_finalize(key, out, col_order, polar, speed)

    def _coords_finalize(self, key, out, col_order, polar, speed) -> pd.DataFrame:
        """Fetch (if on device), build the DataFrame, and apply the
        missing-animal NaN mask — the host half of get_coords_at_key."""
        arr = np.asarray(out)
        if speed:
            df = pd.DataFrame(arr, columns=list(col_order))
        else:
            df = pd.DataFrame(
                arr.reshape(arr.shape[0], -1),
                columns=pd.MultiIndex.from_product(
                    [col_order, ["rho", "phi"] if polar else ["x", "y"]]
                ),
            )
        df.index = self._time_index(len(df))
        # Missing-animal NaN.
        return self._set_missing_animals_frame(df, key)

    def get_coords(
        self,
        center: Union[bool, str] = False,
        polar: bool = False,
        speed: int = 0,
        align: Union[bool, str] = False,
        align_group: bool = False,
        align_inplace: bool = True,
        to_video: bool = False,
        selected_id: str = None,
        roi_number: int = None,
        animals_in_roi=None,
        in_roi_criterion: str = "Center",
        invert_roi: bool = False,
        file_name: str = "coords",
        return_path: bool = False,
    ) -> TableDict:
        """TableDict of per-experiment coordinate DataFrames."""
        # Two phases: enqueue every experiment's device work first, then
        # finalize — transfers overlap instead of serializing per key.
        pending = {}
        for key in self._tables.keys():
            pending[key] = self.get_coords_at_key(
                key,
                scale=self._scales[key],
                center=center,
                polar=polar,
                speed=speed,
                align=align,
                align_group=align_group,
                align_inplace=align_inplace,
                to_video=to_video,
                selected_id=selected_id,
                roi_number=roi_number,
                animals_in_roi=animals_in_roi,
                in_roi_criterion=in_roi_criterion,
                invert_roi=invert_roi,
                _finalize=False,
            )
        fetched = _fetch_all([out for out, _ in pending.values()])
        tabs = {}
        for host, (key, (_, col_order)) in zip(fetched, pending.items()):
            tab = self._coords_finalize(key, host, col_order, polar, speed)
            path = os.path.join(self._table_path, key, f"{key}_{file_name}")
            tabs[key] = save_dt(tab, path, return_path)
        return TableDict(
            tabs,
            typ="coords",
            table_path=self._table_path,
            animal_ids=self._animal_ids,
            arena=self._arena,
            arena_dims=self._scales,
            center=center,
            connectivity=self._connectivity,
            polar=polar,
            exp_conditions=self._exp_conditions,
        )

    def _center_on_bodypart(self, work, nodes, animal_ids, center):
        out = work.copy()
        for aid in animal_ids:
            bp_name = f"{aid}{'_' if aid else ''}{center}"
            if bp_name not in nodes:
                continue
            ci = nodes.index(bp_name)
            cols = [
                i
                for i, bp in enumerate(nodes)
                if (bp.startswith(aid) if aid else True)
            ]
            out[:, cols, :] = out[:, cols, :] - out[:, ci : ci + 1, :]
        return out

    def _align(self, pos, nodes, animal_ids, align, align_group):
        """Per-animal egocentric alignment with reference column-reorder
        semantics (deepof/data.py:1884-1933): the first animal's align
        bodypart goes first and drives its rotation; with align_group, the
        remaining animals keep their column order and rotate about their
        first column (reference quirk, kept for parity)."""
        if not isinstance(animal_ids, list) or len(animal_ids) <= 1:
            align_group = False
        first = animal_ids[0]
        out_blocks, col_order = [], []
        for aid in animal_ids:
            prefix = f"{aid}_" if aid else ""
            bp_name = (
                f"{first}{'_' if first else ''}{align}"
                if align_group
                else f"{prefix}{align}"
            )
            own = [bp for bp in nodes if (bp.startswith(prefix) if prefix else True)]
            if aid == first or not align_group:
                ordered = [bp_name] + [bp for bp in own if bp != bp_name]
            else:
                ordered = [bp for bp in own if bp != bp_name]
            idx = [nodes.index(bp) for bp in ordered]
            block = pos[:, idx, :]
            aligned = np.array(
                align_trajectories(jnp.asarray(block), mode="all")
            )
            aligned[np.abs(aligned) < 1e-5] = 0.0
            out_blocks.append(aligned)
            col_order.extend(ordered)
        return np.concatenate(out_blocks, axis=1), col_order

    def _apply_roi_mask(
        self, pos, key, roi_number, animals_in_roi, in_roi_criterion, invert_roi
    ):
        if isinstance(animals_in_roi, str):
            check = [animals_in_roi]
        elif animals_in_roi:
            check = animals_in_roi
        else:
            check = self._animal_ids
        roi_polygon = np.asarray(self._roi_dicts[key][roi_number])
        pos = pos.copy()
        for aid in check:
            crit = f"{aid}{'_' if aid else ''}{in_roi_criterion}"
            if crit not in self._nodes:
                continue
            ci = self._nodes.index(crit)
            base = np.array(self._tables[key], dtype=np.float64)
            inside = np.asarray(
                point_in_polygon(jnp.asarray(base[:, ci]), roi_polygon)
            )
            if invert_roi:
                inside = ~inside
            cols = [
                i
                for i, bp in enumerate(self._nodes)
                if (bp.startswith(aid) if aid else True)
            ]
            pos[np.ix_(~inside, cols)] = np.nan
        return pos

    def _set_missing_animals_frame(self, df: pd.DataFrame, key: str) -> pd.DataFrame:
        presence = self._presence[key]
        n = min(len(df), len(presence))
        for ai, aid in enumerate(self._animal_ids):
            absent = presence[:n, ai] == 0
            cols = dutils.filter_columns(df.columns, aid) if aid else list(df.columns)
            if cols:
                df.loc[df.index[:n][absent], cols] = np.nan
        return df

    # ------------------------------------------------------------------ #
    # get_distances / get_angles / get_areas
    # ------------------------------------------------------------------ #

    def _distance_keep_idx(self, selected_id, filter_on_graph, pairs=None) -> list:
        """Key-independent kept-column indices for distance tables
        (ego -> selected_id -> graph -> explicit-pairs filters, in
        reference order)."""
        pair_cols = list(self._pair_names)
        keep_idx = list(range(len(pair_cols)))
        if getattr(self, "_ego", False):
            # Keep only distances involving the ego body part
            # (deepof/data.py:1089-1092).
            keep_idx = [
                i for i in keep_idx
                if any(self._ego in str(x) for x in pair_cols[i])
            ]
        if selected_id:
            sel = set(
                dutils.filter_columns(
                    [pair_cols[i] for i in keep_idx], selected_id
                )
            )
            keep_idx = [i for i in keep_idx if pair_cols[i] in sel]
        if filter_on_graph:
            edges = set(self._body_graph.edge_names)
            keep_idx = [
                i for i in keep_idx
                if tuple(sorted(pair_cols[i])) in edges
            ]
        if pairs is not None:
            wanted = {tuple(sorted(map(str, p))) for p in pairs}
            keep_idx = [
                i for i in keep_idx
                if tuple(sorted(map(str, pair_cols[i]))) in wanted
            ]
        return keep_idx

    def _angle_keep_idx(self, selected_id) -> list:
        """Key-independent kept-column indices for angle tables."""
        angle_cols = [tuple(b) for b in self._bridge_names]
        if selected_id:
            sel = set(dutils.filter_columns(angle_cols, selected_id))
            return [i for i, c in enumerate(angle_cols) if c in sel]
        return list(range(len(angle_cols)))

    def get_distances_at_key(
        self,
        key: str,
        quality=None,
        speed: int = 0,
        selected_id: str = None,
        roi_number: int = None,
        animals_in_roi=None,
        invert_roi: bool = False,
        filter_on_graph: bool = True,
        pairs=None,
        _gathered=None,
    ) -> pd.DataFrame:
        # All column filters (ego / selected_id / graph / pairs) commute
        # with the row-wise ops below (ROI nan-masking, per-column speed,
        # missing-animal masking), so resolve the kept column set FIRST and
        # slice the stored array once — the full all-pairs matrix (C(n,2)
        # cols x T rows) is never materialized as a DataFrame. At recording
        # scale this is the difference between copying ~20 graph edges and
        # copying 378 pair columns per call.
        #
        # ``pairs``: an explicit list of (bp_a, bp_b) pairs to keep (order
        # within a pair is irrelevant); composes with the other filters.
        pair_cols = list(self._pair_names)
        keep_idx = self._distance_keep_idx(selected_id, filter_on_graph, pairs)
        if _gathered is not None:
            arr = np.array(np.asarray(_gathered), dtype=np.float64)
        else:
            arr = _fetch_columns(
                self._distances[key], keep_idx, len(pair_cols)
            )
        df = pd.DataFrame(arr, columns=[pair_cols[i] for i in keep_idx])
        df.index = self._time_index(len(df))

        if roi_number is not None:
            mask_df = self._roi_row_mask(key, roi_number, animals_in_roi, invert_roi)
            for aid, rows in mask_df.items():
                cols = [
                    c for c in df.columns
                    if all(str(x).startswith(aid) for x in c)
                ] if aid else list(df.columns)
                df.loc[rows, cols] = np.nan
        if speed:
            sp = np.asarray(
                rolling_speed(
                    jnp.asarray(df.to_numpy(np.float64)),
                    frame_rate=self._frame_rate,
                    deriv=speed + 1,
                    is_coords=False,
                )
            )
            df = pd.DataFrame(sp, columns=df.columns, index=df.index)
        df = self._set_missing_animals_frame(df, key)
        return df

    def get_distances(
        self,
        speed: int = 0,
        selected_id: str = None,
        roi_number: int = None,
        animals_in_roi=None,
        invert_roi: bool = False,
        filter_on_graph: bool = True,
        file_name: str = "got_distances",
        return_path: bool = False,
    ) -> TableDict:
        # Gather every experiment's kept columns on device first, then
        # fetch with overlapping transfers (see _fetch_all).
        keep_idx = self._distance_keep_idx(selected_id, filter_on_graph)
        gathered = {
            key: _gather_columns_device(
                self._distances[key], keep_idx, len(self._pair_names)
            )
            for key in self._distances.keys()
        }
        gathered = dict(zip(gathered, _fetch_all(gathered.values())))
        tabs = {}
        for key in self._distances.keys():
            tab = self.get_distances_at_key(
                key,
                speed=speed,
                selected_id=selected_id,
                roi_number=roi_number,
                animals_in_roi=animals_in_roi,
                invert_roi=invert_roi,
                filter_on_graph=filter_on_graph,
                _gathered=gathered[key],
            )
            path = os.path.join(self._table_path, key, f"{key}_{file_name}")
            tabs[key] = save_dt(tab, path, return_path)
        return TableDict(
            tabs, typ="dists", table_path=self._table_path,
            animal_ids=self._animal_ids, connectivity=self._connectivity,
            exp_conditions=self._exp_conditions,
        )

    def get_angles_at_key(
        self,
        key: str,
        quality=None,
        degrees: bool = False,
        speed: int = 0,
        selected_id: str = None,
        roi_number: int = None,
        animals_in_roi=None,
        invert_roi: bool = False,
        _gathered=None,
    ) -> pd.DataFrame:
        # Column filters commute with the row ops below — subset the
        # stored array before any DataFrame is built (see
        # get_distances_at_key).
        angle_cols = [tuple(b) for b in self._bridge_names]
        keep_idx = self._angle_keep_idx(selected_id)
        if _gathered is not None:
            arr = np.array(np.asarray(_gathered), dtype=np.float64)
        else:
            arr = _fetch_columns(self._angles[key], keep_idx, len(angle_cols))
        if degrees:
            np.degrees(arr, out=arr)
        df = pd.DataFrame(arr, columns=[angle_cols[i] for i in keep_idx])
        df.index = self._time_index(len(df))
        if speed:
            sp = np.asarray(
                rolling_speed(
                    jnp.asarray(df.to_numpy(np.float64)),
                    frame_rate=self._frame_rate,
                    deriv=speed + 1,
                    is_coords=False,
                )
            )
            df = pd.DataFrame(sp, columns=df.columns, index=df.index)
        df = self._set_missing_animals_frame(df, key)
        return df

    def get_angles(
        self,
        degrees: bool = False,
        speed: int = 0,
        selected_id: str = None,
        roi_number: int = None,
        animals_in_roi=None,
        invert_roi: bool = False,
        file_name: str = "got_angles",
        return_path: bool = False,
    ) -> TableDict:
        keep_idx = self._angle_keep_idx(selected_id)
        gathered = {
            key: _gather_columns_device(
                self._angles[key], keep_idx, len(self._bridge_names)
            )
            for key in self._angles.keys()
        }
        gathered = dict(zip(gathered, _fetch_all(gathered.values())))
        tabs = {}
        for key in self._angles.keys():
            tab = self.get_angles_at_key(
                key, degrees=degrees, speed=speed, selected_id=selected_id,
                roi_number=roi_number, animals_in_roi=animals_in_roi,
                invert_roi=invert_roi, _gathered=gathered[key],
            )
            path = os.path.join(self._table_path, key, f"{key}_{file_name}")
            tabs[key] = save_dt(tab, path, return_path)
        return TableDict(
            tabs, typ="angles", table_path=self._table_path,
            animal_ids=self._animal_ids, connectivity=self._connectivity,
            exp_conditions=self._exp_conditions,
        )

    def get_areas_at_key(
        self,
        key: str,
        quality=None,
        speed: int = 0,
        selected_id: str = "all",
        roi_number: int = None,
        animals_in_roi=None,
        invert_roi: bool = False,
        _gathered=None,
    ) -> pd.DataFrame:
        arr = np.array(
            np.asarray(_gathered) if _gathered is not None
            else self._areas[key],
            dtype=np.float64,
        )
        df = pd.DataFrame(arr, columns=self._area_names)
        df.index = self._time_index(len(df))
        if selected_id and selected_id != "all":
            df = df.loc[:, [c for c in df.columns if c.startswith(selected_id)]]
        if speed:
            sp = np.asarray(
                rolling_speed(
                    jnp.asarray(df.to_numpy(np.float64)),
                    frame_rate=self._frame_rate,
                    deriv=speed + 1,
                    is_coords=False,
                )
            )
            df = pd.DataFrame(sp, columns=df.columns, index=df.index)
        df = self._set_missing_animals_frame(df, key)
        return df

    def get_areas(
        self,
        speed: int = 0,
        selected_id: str = "all",
        roi_number: int = None,
        animals_in_roi=None,
        invert_roi: bool = False,
        file_name: str = "got_areas",
        return_path: bool = False,
    ) -> TableDict:
        n_areas = len(self._area_names)
        gathered = {
            key: _gather_columns_device(
                self._areas[key], list(range(n_areas)), n_areas
            )
            for key in self._areas.keys()
        }
        gathered = dict(zip(gathered, _fetch_all(gathered.values())))
        tabs = {}
        for key in self._areas.keys():
            tab = self.get_areas_at_key(
                key, speed=speed, selected_id=selected_id,
                roi_number=roi_number, animals_in_roi=animals_in_roi,
                invert_roi=invert_roi, _gathered=gathered[key],
            )
            path = os.path.join(self._table_path, key, f"{key}_{file_name}")
            tabs[key] = save_dt(tab, path, return_path)
        return TableDict(
            tabs, typ="areas", table_path=self._table_path,
            animal_ids=self._animal_ids, connectivity=self._connectivity,
            exp_conditions=self._exp_conditions,
        )

    def _roi_row_mask(self, key, roi_number, animals_in_roi, invert_roi):
        if isinstance(animals_in_roi, str):
            check = [animals_in_roi]
        elif animals_in_roi:
            check = animals_in_roi
        else:
            check = self._animal_ids
        roi_polygon = np.asarray(self._roi_dicts[key][roi_number])
        out = {}
        base = np.array(self._tables[key], dtype=np.float64)
        for aid in check:
            crit = f"{aid}{'_' if aid else ''}Center"
            if crit not in self._nodes:
                continue
            ci = self._nodes.index(crit)
            inside = np.asarray(
                point_in_polygon(jnp.asarray(base[:, ci]), roi_polygon)
            )
            if invert_roi:
                inside = ~inside
            out[aid] = self._time_index(len(base))[~inside]
        return out

    def get_rois(self) -> dict:
        """ROI polygons per experiment: key -> {roi_number: (V, 2) px array}."""
        if not self._roi_dicts:
            return {}
        return {
            key: {n: np.asarray(poly) for n, poly in rois.items()}
            for key, rois in self._roi_dicts.items()
        }

    # ------------------------------------------------------------------ #
    # Supervised parameters (deepof/data.py:2957-3031)
    # ------------------------------------------------------------------ #

    def get_supervised_parameters(self) -> dict:
        if not hasattr(self, "_supervised_parameters"):
            self.reset_supervised_parameters()
        return copy.copy(self._supervised_parameters)

    def reset_supervised_parameters(self, save: bool = True):
        self._supervised_parameters = config.default_supervised_parameters(
            self._frame_rate
        )
        # create() saves the whole project right after resetting; skipping
        # the inner save there avoids pickling recording-scale tables twice.
        if save:
            self.save(timestamp=False)

    def set_supervised_parameters(self, hparams: dict = None):
        params = self.get_supervised_parameters()
        for k, v in (hparams or {}).items():
            if k in params:
                params[k] = v
            else:
                warnings.warn(
                    "At least one parameter name does not match any supervised "
                    "parameter name."
                )
        self._supervised_parameters = params
        self.save(timestamp=False)

    # ------------------------------------------------------------------ #
    # Persistence
    # ------------------------------------------------------------------ #

    def save(self, filename: str = None, timestamp: bool = True, file: str = None):
        """Pickle the Coordinates object (deepof/data.py:2612-2636).
        ``file`` is the reference's name for ``filename``."""
        filename = filename or file
        out_dir = os.path.join(
            self._project_path, self._project_name, "Coordinates"
        )
        os.makedirs(out_dir, exist_ok=True)
        name = filename or "deepof_coordinates"
        if timestamp:  # pragma: no cover
            from datetime import datetime

            name += datetime.now().strftime("%Y%m%d-%H%M%S")
        with open(os.path.join(out_dir, f"{name}.pkl"), "wb") as f:
            # Protocol 5: numpy blocks serialize via out-of-band buffers —
            # materially faster on recording-scale tables.
            pickle.dump(self, f, protocol=5)

    # ------------------------------------------------------------------ #
    # Analysis entry points (wired to later layers)
    # ------------------------------------------------------------------ #

    def get_graph_dataset(self, *args, **kwargs):
        from deepof_tpu.graph_dataset import get_graph_dataset as _ggd

        return _ggd(self, *args, **kwargs)

    def merged_graph_features_device(self, include_angles: bool = True):
        """Per-experiment merged graph-dataset feature matrices, computed
        and KEPT ON DEVICE (the fused lane of get_graph_dataset).

        The eager path builds the same table through four getters, four
        device->host transfer phases and a host-side merge; at ~35 MB/s
        through a tunneled TPU those transfers dominate the public-path
        wall clock. This method dispatches ONE fused program per
        experiment and returns
        ``({key: (T, F) float32 device array}, columns)`` — nothing
        crosses to the host. Consumers: the device scaling pass feeds the
        frames straight into ``scale_stage12``; the user-facing merged
        TableDict wraps them in LazyFrames realized only on access.

        Assumes the get_graph_dataset getter configuration: center="arena",
        no alignment, no ROI/animal filters, cartesian coordinates.
        """
        nodes = self._nodes
        keep_idx = self._distance_keep_idx(None, True)
        all_pairs = all_pair_indices(len(nodes))
        pairs = tuple(tuple(map(int, all_pairs[i])) for i in keep_idx)
        bridges = (
            tuple(tuple(map(int, b)) for b in self._body_graph.bridges)
            if include_angles
            else ()
        )

        cols: list = [(bp, ax) for bp in nodes for ax in ("x", "y")]
        cols += list(nodes)
        if include_angles:
            cols += [tuple(b) for b in self._bridge_names]
        cols += [self._pair_names[i] for i in keep_idx]

        owner = np.zeros((len(self._animal_ids), len(cols)), bool)
        for ai, aid in enumerate(self._animal_ids):
            if not aid:
                # Reference behavior: the empty/None id masks EVERY column
                # (data.py _set_missing_animals_frame <- filter_columns).
                owner[ai, :] = True
                continue
            for j, c in enumerate(cols):
                if isinstance(c, tuple) and len(c) == 2 and c[1] in ("x", "y"):
                    parts = [c[0]]
                elif isinstance(c, str):
                    parts = [c]
                else:
                    parts = list(c)
                owner[ai, j] = all(str(p).startswith(aid) for p in parts)
        owner_dev = jnp.asarray(owner)

        dev_frames = {}
        for key in self._tables.keys():
            pos_h = np.asarray(self._tables[key])
            # Match the eager getters' working precision exactly: the
            # stored-table dtype (float64 on the CPU parity path, float32
            # on accelerators). rolling_speed's 3-decimal rounding makes
            # tie frames flip between f32 and f64, so the fused lane must
            # not change precision relative to the platform's eager path.
            dtype = jnp.float64 if (
                pos_h.dtype == np.float64 and jax.config.jax_enable_x64
                and jax.default_backend() == "cpu"
            ) else jnp.float32
            t = pos_h.shape[0]
            pres_h = np.asarray(self._presence[key])
            absent_rows = min(t, pres_h.shape[0])
            pres = np.ones((t, len(self._animal_ids)), np.float32)
            pres[:absent_rows] = pres_h[:absent_rows]
            dev_frames[key] = _merged_features_program(
                jnp.asarray(pos_h, dtype),
                jnp.asarray(pres),
                jnp.asarray(np.asarray(self._scales[key][:2]), dtype),
                owner_dev,
                pairs,
                bridges,
                float(self._frame_rate),
                bool(include_angles),
            )
        columns = pd.Index(cols, dtype=object, tupleize_cols=False)
        return dev_frames, columns

    def supervised_annotation(self, *args, **kwargs):
        from deepof_tpu.annotate import supervised_annotation as _sa

        return _sa(self, *args, **kwargs)

    def deep_unsupervised_embedding(self, *args, **kwargs):
        from deepof_tpu.train.harness import deep_unsupervised_embedding as _due

        return _due(self, *args, **kwargs)


def load_project(project_path: str) -> Coordinates:
    """Load a previously saved Coordinates pickle
    (deepof/data.py:111-239)."""
    coord_dir = os.path.join(project_path, "Coordinates")
    candidates = sorted(
        f for f in os.listdir(coord_dir) if f.endswith(".pkl")
    )
    if not candidates:
        raise FileNotFoundError(f"No saved coordinates found in {coord_dir}")
    with open(os.path.join(coord_dir, candidates[-1]), "rb") as f:
        return pickle.load(f)
