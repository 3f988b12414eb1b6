"""TableDict: the dataset container that travels between every layer.

API-compatible rebuild of the reference's TableDict
(deepof/data.py:3407-4045): a dict of {experiment_id: DataFrame | ndarray |
storage pointer} with dataset metadata, filters, merges, projections, a
video-level train/test split, and the preprocess pipeline (bin -> fit global
scaler -> scale -> sliding windows) that feeds model training.

The preprocess pipeline keeps the reference's exact scaling semantics
(local two-stage scale_table + global scalers fitted on sampled rows,
deepof/utils.py:2665-3028) but extracts windows as device gathers.
"""

from __future__ import annotations

import copy
import os
import warnings
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np
import pandas as pd

import deepof_tpu.utils as dutils
from deepof_tpu.core.storage import get_dt, save_dt
from deepof_tpu.ops.windows import aggregate_windows_labels


class TableDict(dict):
    """Dict of per-experiment tables with dataset-level metadata."""

    def __init__(
        self,
        tabs: Dict,
        typ: str,
        table_path: str = None,
        arena: str = None,
        arena_dims=None,
        animal_ids: List = tuple([""]),
        center: str = None,
        connectivity=None,
        polar: bool = None,
        exp_conditions: dict = None,
        shapes: Dict = None,
    ):
        super().__init__(tabs)
        self._type = typ
        self._center = center
        self._connectivity = connectivity
        self._polar = polar
        self._arena = arena
        self._arena_dims = arena_dims
        self._animal_ids = animal_ids
        self._exp_conditions = exp_conditions
        self._table_path = table_path
        self._shapes = shapes or {}

    # ------------------------------------------------------------------ #
    # Filters
    # ------------------------------------------------------------------ #

    def new_dict_same_header(self, tabs: dict = None, only_keys: bool = False):
        """New TableDict with this one's metadata."""
        if tabs is None and only_keys:
            tabs = {key: None for key in self.keys()}
        elif tabs is None:
            tabs = {}
        return TableDict(
            tabs,
            typ=self._type,
            table_path=self._table_path,
            arena=self._arena,
            arena_dims=self._arena_dims,
            animal_ids=self._animal_ids,
            center=self._center,
            connectivity=self._connectivity,
            polar=self._polar,
            exp_conditions=self._exp_conditions,
        )

    def filter_videos(self, keys: list) -> "TableDict":
        """Subset to the given experiment keys."""
        assert all(k in self.keys() for k in keys), "Invalid keys selected"
        return self.new_dict_same_header({k: v for k, v in self.items() if k in keys})

    def filter_condition(self, exp_filters: dict) -> "TableDict":
        """Subset to videos matching the given experimental conditions."""
        table = self
        for cond, value in exp_filters.items():
            filtered = {
                k: v
                for k, v in table.items()
                if table._exp_conditions is not None
                and k in table._exp_conditions
                and np.all(table._exp_conditions[k][cond].values == value)
            }
            new = table.new_dict_same_header(filtered)
            new._exp_conditions = {
                k: v
                for k, v in (table._exp_conditions or {}).items()
                if k in filtered
            }
            table = new
        return table

    def filter_id(self, selected_id: str = None) -> "TableDict":
        """Keep only one animal's columns in every table."""
        tabs = {}
        for key, val in self.items():
            tab = get_dt({key: val}, key)
            tabs[key] = dutils.filter_animal_id_in_table(tab, selected_id, self._type)
        return self.new_dict_same_header(tabs)

    # ------------------------------------------------------------------ #
    # Projections
    # ------------------------------------------------------------------ #

    def _prepare_projection(self) -> Tuple[np.ndarray, Any]:
        x = {k: np.mean(np.asarray(get_dt(self, k), dtype=float), axis=0) for k in self.keys()}
        x = np.stack(list(x.values()), axis=0)
        return x, None

    def _projection(self, projection_type: str, n_components: int = 2, kernel: str = None):
        x, labels = self._prepare_projection()
        if projection_type == "random":
            from sklearn import random_projection

            proj = random_projection.GaussianRandomProjection(n_components=n_components)
        elif projection_type == "pca":
            from sklearn.decomposition import KernelPCA

            proj = KernelPCA(n_components=n_components, kernel=kernel)
        elif projection_type == "umap":  # pragma: no cover
            try:
                from deepof_tpu.utils import import_optional

                umap_lib = import_optional("umap")  # stub-rejecting
            except ImportError as e:
                raise ImportError("UMAP projections require the optional 'umap-learn' package.") from e
            proj = umap_lib.UMAP(n_components=n_components)
        else:
            raise ValueError(f"Unknown projection {projection_type}")
        x = proj.fit_transform(x)
        if labels is not None:
            return x, labels, proj
        return x, proj

    def random_projection(self, n_components: int = 2, kernel: str = "linear"):
        return self._projection("random", n_components=n_components, kernel=kernel)

    def pca(self, n_components: int = 2, kernel: str = "linear"):
        return self._projection("pca", n_components=n_components, kernel=kernel)

    def umap(self, n_components: int = 2):  # pragma: no cover
        return self._projection("umap", n_components=n_components)

    # ------------------------------------------------------------------ #
    # Merge / split
    # ------------------------------------------------------------------ #

    def merge(self, *args, ignore_index=False, file_name="merged", save_as_paths=False):
        """Concatenate several TableDicts column-wise per experiment."""
        dicts = [self] + list(args)
        merged = {}
        for key in self.keys():
            tabs = [get_dt(td, key) for td in dicts]
            merged_tab = _hconcat_single_block(tabs)
            path = (
                os.path.join(self._table_path, key, f"{key}_{file_name}")
                if self._table_path
                else None
            )
            merged[key] = save_dt(merged_tab, path, save_as_paths)
        out = TableDict(
            merged, typ="merged", table_path=self._table_path,
            connectivity=self._connectivity,
        )
        out._animal_ids = self._animal_ids
        return out

    def get_training_set(
        self, current_table_dict: "TableDict", test_videos: Union[int, list] = 0
    ) -> tuple:
        """Video-level train/test split (seeded identically to the
        reference, deepof/data.py:3706-3757)."""
        keys = np.array(list(current_table_dict.keys()))
        if isinstance(test_videos, int):
            np.random.seed(42)
            test_indices = np.random.choice(
                range(len(current_table_dict)), test_videos, replace=False
            )
            test_keys = keys[test_indices]
        elif isinstance(test_videos, list) and all(k in keys for k in test_videos):
            test_keys = test_videos
        else:
            raise ValueError(
                "test_videos must be an int or a list of valid experiment keys."
            )
        train_keys = list(set(keys) - set(test_keys))

        x_test = TableDict({}, current_table_dict._type, current_table_dict._table_path)
        if len(test_keys) > 0:
            x_test = current_table_dict.filter_videos(test_keys)
            x_train = current_table_dict.filter_videos(train_keys)
        else:
            # Shallow copy: downstream windowing REPLACES dict entries, it
            # never mutates the tables in place, so deep-copying every
            # DataFrame (the reference's approach) is pure overhead.
            x_train = current_table_dict.filter_videos(list(keys))
        return x_train, x_test, test_keys

    # ------------------------------------------------------------------ #
    # Preprocess: bin -> fit scaler -> scale -> window
    # ------------------------------------------------------------------ #

    def preprocess(
        self,
        coordinates,
        window_size: int = None,
        window_step: int = 1,
        bin_size=None,
        bin_index=None,
        precomputed_bins=None,
        samples_max: int = 227272,
        scale: str = "standard",
        pretrained_scaler=None,
        test_videos: int = 0,
        interpolate_normalized: int = 10,
        filter_low_variance: bool = False,
        file_name: str = "preprocessed",
        save_as_paths: Optional[bool] = None,
        shuffle: bool = False,
        quality_to_load=None,
        dist_standardize: str = "groupwise",
        speed_standardize: str = "groupwise",
        coord_standardize: str = "groupwise",
        log_distances: bool = True,
        return_windows: bool = True,
    ) -> tuple:
        """Bin, scale (two-stage local + global), and window the dataset.

        Returns ((X_train, X_test) TableDicts of (W, L, F) stacks, metainfo
        dict, global_scaler dict) — same contract as the reference
        (deepof/data.py:3773-3916).
        """
        if window_size is None:
            window_size = int(np.round(coordinates._frame_rate))
        if scale and scale not in dutils.SCALERS:
            raise ValueError(f"Invalid scaler: {scale}")
        if save_as_paths is None:
            save_as_paths = bool(getattr(coordinates, "_very_large_project", False))

        keys_list = sorted(self.keys())
        animal_ids = coordinates._animal_ids

        from deepof_tpu.visuals_utils import preprocess_time_bins

        bin_info = preprocess_time_bins(
            coordinates=coordinates,
            bin_size=bin_size,
            bin_index=bin_index,
            precomputed_bins=precomputed_bins,
            tab_dict_for_binning=self,
            samples_max=samples_max,
        )

        # Device fast path: when the whole scaling pipeline fits the
        # accelerator formulation (standard scaler, per-column/None modes,
        # in-memory tables), run passes 1-3 as three jitted programs on the
        # (T, F) matrices instead of per-section host pandas math.
        table_temp = global_scaler = None
        if _device_scale_applicable(
            scale, filter_low_variance,
            dist_standardize, speed_standardize, coord_standardize,
        ):
            fast = self._preprocess_scale_device(
                keys_list, bin_info, animal_ids, pretrained_scaler,
                samples_max, interpolate_normalized, log_distances,
                dist_standardize, speed_standardize, coord_standardize,
                file_name, save_as_paths,
            )
            if fast is not None:
                table_temp, global_scaler = fast
        if table_temp is None:
            # Pass 1: per-table local scaling; sample rows for the global fit.
            rng = np.random.RandomState(2)
            samples = {"speed": [], "dist": [], "coord": [], "inner": [], "intra": []}
            valid_keys: List[str] = []

            # Pass 3 applies the IDENTICAL local scaling (scale_table never
            # touches angle columns, and both passes run with
            # coord_standardize=None), so cache pass-1 results and reuse them —
            # recomputing the two-stage scaler per table is the single largest
            # preprocess cost at recording scale. Bounded by a byte budget so
            # many-video projects fall back to rescaling instead of holding
            # every scaled frame in RAM. Only valid without low-variance
            # filtering (which runs before scaling in pass 1 only).
            scaled_cache: Dict[str, pd.DataFrame] = {}
            cache_budget = int(
                os.environ.get("DEEPOF_TPU_SCALE_CACHE_BYTES", 2_000_000_000)
            )
            cache_ok = bool(scale) and pretrained_scaler is None and not filter_low_variance

            for key in keys_list:
                tab = get_dt(self, key)
                tab = _take_rows(tab, bin_info[key])
                if tab.isna().all().all():
                    continue
                valid_keys.append(key)
                tab = _filter_low_variance(tab, filter_low_variance)

                if scale and pretrained_scaler is None:
                    local = dutils.scale_table(
                        tab,
                        scale=scale,
                        animal_ids=animal_ids,
                        standardize=True,
                        dist_standardize=dist_standardize,
                        speed_standardize=speed_standardize,
                        coord_standardize=None,
                        log_distances=log_distances,
                    )
                    if cache_ok and cache_budget > 0:
                        nbytes = int(local.shape[0]) * int(local.shape[1]) * 8
                        if nbytes <= cache_budget:
                            scaled_cache[key] = local
                            cache_budget -= nbytes
                    ct = dutils.infer_column_types(local)
                    # Sample positionally from ONE matrix view — per-section
                    # label selection (take_nd) copies the full column set per
                    # section at recording scale.
                    lv = local.to_numpy()
                    pos = {c: i for i, c in enumerate(local.columns)}
                    n_take = min(samples_max, len(local))
                    if n_take > 0:
                        idx = rng.choice(len(local), size=n_take, replace=False)
                        if speed_standardize and ct["speeds"]:
                            _collect_section(lv, pos, samples["speed"], ct["speeds"], idx, speed_standardize)
                        if dist_standardize and ct["dists"]:
                            if dist_standardize == "per_column":
                                _collect_section(lv, pos, samples["dist"], ct["dists"], idx, "per_column")
                            else:
                                if ct["inner_dists"]:
                                    _collect_section(lv, pos, samples["inner"], ct["inner_dists"], idx, "groupwise")
                                if ct["intra_dists"]:
                                    _collect_section(lv, pos, samples["intra"], ct["intra_dists"], idx, "groupwise")
                        coord_cols = [
                            c for c in local.columns
                            if isinstance(c, tuple) and len(c) == 2 and c[1] in ("x", "y")
                        ]
                        if coord_standardize and coord_cols:
                            _collect_section(lv, pos, samples["coord"], coord_cols, idx, coord_standardize)

            # Pass 2: fit the global scalers.
            global_scaler = _fit_global_scaler(
                scale, pretrained_scaler, samples,
                dist_standardize, speed_standardize, coord_standardize,
            )

            # Pass 3: apply scaling per table (reusing pass-1 local scaling
            # when cached — the two passes are identical by construction).
            table_temp = self.new_dict_same_header({})
            for key in valid_keys:
                cached = scaled_cache.pop(key, None)

                def _positional_ok(frame):
                    return frame.columns.is_unique and all(
                        dt == np.float64 for dt in frame.dtypes
                    )

                fast = None
                if cached is not None and _positional_ok(cached):
                    fast = cached
                elif cached is None and not filter_low_variance:
                    # Pretrained-scaler / unscaled runs never populate the
                    # cache; scale locally here and take the same positional
                    # finish (low-variance filtering changes the column set,
                    # so it stays on the label path below).
                    tab = _take_rows(get_dt(self, key), bin_info[key])
                    if _positional_ok(tab):
                        if scale:
                            tab = dutils.scale_table(
                                tab,
                                scale=scale,
                                animal_ids=animal_ids,
                                standardize=True,
                                dist_standardize=dist_standardize,
                                speed_standardize=speed_standardize,
                                coord_standardize=None,
                                log_distances=log_distances,
                            )
                        fast = tab
                if fast is not None:
                    # Fully positional finish on ONE matrix: global-scaler
                    # sections, outlier clip + reinterpolation, angle
                    # interpolation, and the final sanitize all write in place;
                    # column order never changes so no reindex/concat copies.
                    tab = _finish_scaled_positional(
                        fast, global_scaler if scale else None, scale,
                        interpolate_normalized,
                        speed_standardize, dist_standardize, coord_standardize,
                    )
                    path = (
                        os.path.join(self._table_path, key, f"{key}_{file_name}")
                        if self._table_path
                        else None
                    )
                    table_temp[key] = save_dt(tab, path, save_as_paths)
                    continue
                if cached is not None:
                    orig_cols = cached.columns
                    ct = dutils.infer_column_types(cached)
                    angle_cols = ct["angles"]
                    # Angle columns pass through scale_table untouched, so the
                    # cached frame still holds their original values.
                    angles_df = cached[angle_cols].copy() if angle_cols else None
                    tab = cached.drop(columns=angle_cols, errors="ignore")
                else:
                    tab = _take_rows(get_dt(self, key), bin_info[key])
                    orig_cols = tab.columns
                    ct = dutils.infer_column_types(tab)

                    angle_cols = ct["angles"]
                    angles_df = tab[angle_cols].copy() if angle_cols else None
                    tab = tab.drop(columns=angle_cols, errors="ignore")
                    tab = _filter_low_variance(tab, filter_low_variance)

                    if scale:
                        tab = dutils.scale_table(
                            tab,
                            scale=scale,
                            animal_ids=animal_ids,
                            standardize=True,
                            dist_standardize=dist_standardize,
                            speed_standardize=speed_standardize,
                            coord_standardize=None,
                            log_distances=log_distances,
                        )

                if scale:
                    tab = _apply_global_scaler(
                        tab, global_scaler,
                        speed_standardize, dist_standardize, coord_standardize,
                    )
                    # Clip standardized outliers and re-interpolate.
                    if scale == "standard" and interpolate_normalized:
                        clip_cols = list(dict.fromkeys(
                            [c for c in ct["scalars"] if c in tab.columns]
                            + [
                                c for c in tab.columns
                                if isinstance(c, tuple) and len(c) == 2 and c[1] in ("x", "y")
                            ]
                        ))
                        if clip_cols:
                            arr = np.array(tab[clip_cols].to_numpy(float))
                            arr[np.abs(arr) > interpolate_normalized] = np.nan
                            tab[clip_cols] = pd.DataFrame(
                                _interp_nan_block(arr),
                                index=tab.index, columns=clip_cols,
                            )

                if angles_df is not None:
                    angles_df = angles_df.interpolate(limit_direction="both")
                    tab = pd.concat([tab, angles_df], axis=1)
                tab = tab.reindex(columns=orig_cols)
                tab = _sanitize_numeric(tab)

                path = (
                    os.path.join(self._table_path, key, f"{key}_{file_name}")
                    if self._table_path
                    else None
                )
                table_temp[key] = save_dt(tab, path, save_as_paths)

        # Pass 4: split and window.
        x_train, x_test, test_index = self.get_training_set(table_temp, test_videos)
        dev_frames = getattr(table_temp, "_device_frames", None)
        if dev_frames:
            x_train._device_frames = {
                k: dev_frames[k] for k in x_train.keys() if k in dev_frames
            }
        host_f32 = getattr(table_temp, "_host_f32", None)
        if host_f32:
            for part in (x_train, x_test):
                part._host_f32 = {
                    k: host_f32[k] for k in part.keys() if k in host_f32
                }
        deferred_f32 = getattr(table_temp, "_deferred_f32", None)
        if deferred_f32:
            for part in (x_train, x_test):
                part._deferred_f32 = {
                    k: deferred_f32[k] for k in part.keys() if k in deferred_f32
                }
        if not return_windows:
            # Inference path: keep scaled per-frame tables; the device
            # pipeline gathers windows on-chip (train/inference.py).
            # Shapes come from metainfo so lazy (device-resident) frames
            # are not realized just to be measured.
            metainfo = {
                "shape_train": tuple(
                    tuple(get_dt(x_train, k, only_metainfo=True)["shape"])
                    for k in x_train.keys()
                ),
                "shape_test": (0,),
                "dist_standardize": dist_standardize,
                "speed_standardize": speed_standardize,
                "coord_standardize": coord_standardize,
            }
            return (x_train, x_test), metainfo, global_scaler
        x_train, train_shape = extract_windows(
            x_train, window_size, window_step, save_as_paths, shuffle
        )
        if test_videos and len(test_index) > 0:
            x_test, test_shape = extract_windows(
                x_test, window_size, window_step, save_as_paths, shuffle
            )
        else:
            test_shape = (0,)

        metainfo = {
            "shape_train": train_shape,
            "shape_test": test_shape,
            "dist_standardize": dist_standardize,
            "speed_standardize": speed_standardize,
            "coord_standardize": coord_standardize,
        }
        return (x_train, x_test), metainfo, global_scaler

    def _preprocess_scale_device(
        self, keys_list, bin_info, animal_ids, pretrained_scaler,
        samples_max, interpolate_normalized, log_distances,
        dist_standardize, speed_standardize, coord_standardize,
        file_name, save_as_paths,
    ):
        """Passes 1-3 of :meth:`preprocess` on the accelerator: one
        ``scale_stage12`` program per table (size normalization + local
        standardization + global-fit statistics), a tiny host-side global
        fit from per-column sufficient statistics, and one
        ``finish_scaled`` program per table (global transform, outlier
        clip, re-interpolation, sanitize). Returns ``(table_temp,
        global_scaler)`` or None when any table falls outside the fast
        formulation (the caller then runs the host passes — identical
        semantics, float64)."""
        import jax.numpy as jnp

        from deepof_tpu.core.storage import LazyFrame
        from deepof_tpu.ops.scaling import (
            col_ssd, finish_scaled, scale_stage12, size_divisors,
        )

        meta = None
        pend = {}
        # HBM residency bound (ADVICE r3): the two-pass global fit keeps
        # every recording's input+scaled f32 matrix live simultaneously;
        # past this budget we fall back to the host path instead of
        # OOMing the accelerator.
        budget = int(os.environ.get(
            "DEEPOF_TPU_DEVICE_SCALE_BUDGET_BYTES", 8_000_000_000
        ))
        live_bytes = 0
        dev_in = getattr(self, "_device_frames", None) or {}
        divisor_enc = None
        nan_flags = {}
        for key in keys_list:
            dev = dev_in.get(key)
            entry = self[key]
            if dev is not None and isinstance(entry, LazyFrame):
                # Fused-lane input: the merged feature matrix is already on
                # device (data.py merged_graph_features_device) — nothing
                # host-side exists to take rows from, so this branch
                # requires the full row range (the fused lane only engages
                # for unbinned builds).
                n_rows = int(dev.shape[0])
                if not _rows_are_full_range(bin_info[key], n_rows):
                    return None
                if n_rows == 0 or n_rows > samples_max:
                    return None
                columns = entry.columns
                if not columns.is_unique:
                    return None
                if meta is None:
                    meta = _build_scale_meta(
                        pd.DataFrame(
                            np.empty((0, len(columns))), columns=columns
                        ),
                        log_distances,
                        dist_standardize, speed_standardize, coord_standardize,
                        float(interpolate_normalized or 0.0),
                    )
                elif not columns.equals(meta["columns"]):
                    return None
                live_bytes += 2 * int(dev.size) * dev.dtype.itemsize
                if live_bytes > budget:
                    return None
                if divisor_enc is None:
                    divisor_enc = _divisor_encoding(meta, list(animal_ids))
                w_enc, c_enc, quads = divisor_enc
                divisor = size_divisors(
                    dev.astype(jnp.float32), jnp.asarray(w_enc),
                    jnp.asarray(c_enc), quads,
                )
                xs, cnt, sm = scale_stage12(
                    dev.astype(jnp.float32), divisor,
                    meta["log_mask"], meta["local_mask"],
                )
                # All-NaN tables are dropped like the host pass-1 skip —
                # detected from the already-fetched count statistics
                # (all-NaN <=> every per-column valid count is zero), so
                # no extra device round trip is paid.
                nan_flags[key] = True
                pend[key] = (xs, cnt, sm, entry.index)
                continue
            tab = _take_rows(get_dt(self, key), bin_info[key])
            if len(tab) == 0 or len(tab) > samples_max:
                return None
            if not (
                tab.columns.is_unique
                and all(np.issubdtype(dt, np.floating) for dt in tab.dtypes)
            ):
                return None
            if meta is None:
                meta = _build_scale_meta(
                    tab, log_distances,
                    dist_standardize, speed_standardize, coord_standardize,
                    float(interpolate_normalized or 0.0),
                )
            elif not tab.columns.equals(meta["columns"]):
                return None
            vals = tab.to_numpy(np.float32)
            if np.isnan(vals).all():
                continue  # dropped, like the host pass-1 all-NaN skip
            live_bytes += 2 * vals.nbytes  # input + scaled output resident
            if live_bytes > budget:
                return None
            factors, default = dutils.compute_size_factors(
                tab, list(animal_ids), ("Nose", "Tail_base")
            )
            divisor = np.ones(vals.shape[1], np.float32)
            for cs, div in dutils._size_divisor_plan(
                meta["ct"], factors, default, "mean"
            ):
                divisor[[meta["pos"][c] for c in cs]] = div
            xs, cnt, sm = scale_stage12(
                jnp.asarray(vals), jnp.asarray(divisor),
                meta["log_mask"], meta["local_mask"],
            )
            pend[key] = (xs, cnt, sm, tab.index)
        if not pend:
            return None

        from deepof_tpu.data import _fetch_all

        f = len(meta["columns"])
        modes = (speed_standardize, dist_standardize, coord_standardize)
        if pretrained_scaler is not None:
            global_scaler = pretrained_scaler
            gvec = _global_scaler_vectors(global_scaler, meta, f, modes)
            if gvec is None:
                return None
            if nan_flags:
                # No stats fetch happens on this branch; drop fused-lane
                # all-NaN tables from one coalesced count fetch.
                fused_keys = [k for k in nan_flags if k in pend]
                cnts = _fetch_all([pend[k][1] for k in fused_keys])
                for k, cb in zip(fused_keys, cnts):
                    if float(np.asarray(cb).sum()) == 0.0:
                        del pend[k]
                if not pend:
                    return None
        else:
            # Streamed standard fit, matching _fast_fit_standard: cohort
            # mean from (count, sum), then one ssd pass around it. The
            # device programs return (nb, F) per-block partials; combining
            # them HERE in float64 keeps the persisted scaler's
            # accumulation error bounded at recording scale (ADVICE r3).
            nk = len(pend)
            stats = _fetch_all(
                [p[1] for p in pend.values()] + [p[2] for p in pend.values()]
            )
            # Fused-lane all-NaN drop, free-riding on the stats fetch: an
            # all-NaN table has zero valid count in every column (and
            # contributes nothing to the sums below).
            for i, key in enumerate(list(pend.keys())):
                if key in nan_flags and float(np.asarray(stats[i]).sum()) == 0.0:
                    del pend[key]
            if not pend:
                return None
            cnt_h = np.zeros(f, np.float64)
            sum_h = np.zeros(f, np.float64)
            for cb in stats[:nk]:
                cnt_h += np.asarray(cb, np.float64).sum(axis=0)
            for sb in stats[nk:]:
                sum_h += np.asarray(sb, np.float64).sum(axis=0)
            mean_h = sum_h / np.maximum(cnt_h, 1.0)
            mean_dev = jnp.asarray(mean_h, jnp.float32)
            ssd_blocks = _fetch_all(
                [col_ssd(xs, mean_dev) for xs, _, _, _ in pend.values()]
            )
            ssd_h = np.zeros(f, np.float64)
            for b in ssd_blocks:
                ssd_h += np.asarray(b, np.float64).sum(axis=0)
            var_h = ssd_h / np.maximum(cnt_h, 1.0)
            mean_h = np.array(mean_h)
            mean_h[cnt_h == 0] = np.nan
            var_h[cnt_h == 0] = np.nan
            global_scaler = {
                "kind": "standard", "speed": None, "dist": None,
                "dist_inner": None, "dist_intra": None, "coord": None,
            }
            for name, mode, cols in (
                ("speed", speed_standardize, meta["ct"]["speeds"]),
                ("dist", dist_standardize, meta["ct"]["dists"]),
                ("coord", coord_standardize, meta["coord_cols"]),
            ):
                if mode == "per_column" and cols:
                    ii = [meta["pos"][c] for c in cols]
                    global_scaler[name] = _StandardScalerLite(
                        mean_h[ii], var_h[ii]
                    )
            if all(v is None for k, v in global_scaler.items() if k != "kind"):
                global_scaler = None
            gvec = _global_scaler_vectors(global_scaler, meta, f, modes)

        gmean, gscale, gmask = gvec
        gmean_d, gscale_d, gmask_d = (
            jnp.asarray(gmean), jnp.asarray(gscale), jnp.asarray(gmask)
        )
        finished = {}
        for key in list(pend):
            xs, _, _, index = pend.pop(key)  # free each input as it's consumed
            finished[key] = (
                finish_scaled(
                    xs, gmean_d, gscale_d, gmask_d,
                    meta["clip_mask"], meta["interp_thresh"],
                ),
                index,
            )
            del xs

        table_temp = self.new_dict_same_header({})
        dev_frames = {}
        # Device-residency budget for the scaled frames the windowed
        # inference path consumes directly (skipping a host round trip per
        # key); past the budget a frame is NOT pinned and inference
        # re-uploads it from the host table (ADVICE r3: unbounded
        # _device_frames retention could OOM HBM at recording scale).
        frames_budget = int(os.environ.get(
            "DEEPOF_TPU_DEVICE_FRAMES_BYTES", 4_000_000_000
        ))
        # Frames that fit the device budget are NOT fetched here at all:
        # the scaled matrix stays on the accelerator and the table value
        # is a LazyFrame whose realization fetches on first host access.
        # Inference-only flows consume the device copies directly, so the
        # dominant wire cost of the public path (the full scaled-matrix
        # download, ~6 s of an 8.5 s pass at the 1-hour workload) is paid
        # only by consumers that actually read the host tensors (training
        # via WindowDataset, or user code touching the DataFrames).
        deferred = {}
        eager = []  # (key, out, index) past the pin budget (or paths mode)
        entries = {}
        for key in list(finished):
            out, index = finished.pop(key)
            out_bytes = int(out.size) * out.dtype.itemsize
            if frames_budget >= out_bytes and not save_as_paths:
                dev_frames[key] = out
                frames_budget -= out_bytes
                holder = _DeferredScaledFrame(out)
                deferred[key] = holder
                if callable(index):  # fused lane: index built lazily
                    index_fn = (lambda n, f=index: f())
                else:
                    index_fn = (lambda n, ix=index: ix)
                # float64 realization: the host path returns float64
                # tables, and downstream code may rely on that dtype
                # (ADVICE r3); LazyFrame wraps the array with columns +
                # index on first access.
                entries[key] = LazyFrame(
                    (lambda h=holder: np.asarray(h.f32(), np.float64)),
                    meta["columns"], int(out.shape[0]), index_fn=index_fn,
                )
            else:
                eager.append((key, out, index))
        host_f32 = {}
        if eager:
            # ONE coalesced transfer for the eagerly-fetched frames
            # (concurrent per-key fetches through the tunnel contend
            # catastrophically — measured 287 s vs 2 s for two 28 MB
            # arrays), then serial host DataFrame builds.
            arrs = _fetch_all([out for _, out, _ in eager])
            for host, (key, out, index) in zip(arrs, eager):
                if callable(index):
                    index = index()
                df = pd.DataFrame(
                    np.asarray(host, np.float64), index=index,
                    columns=meta["columns"], copy=False,
                )
                path = (
                    os.path.join(self._table_path, key, f"{key}_{file_name}")
                    if self._table_path
                    else None
                )
                entries[key] = save_dt(df, path, save_as_paths)
                if host.dtype == np.float32:
                    # The fetched f32 matrix, kept for the windowing pass:
                    # gathering windows from it halves the copy bytes vs
                    # the float64 table (training consumes f32 regardless).
                    host_f32[key] = host
                out_bytes = int(out.size) * out.dtype.itemsize
                if frames_budget >= out_bytes:
                    # Paths mode still pins scaled frames (budget-checked)
                    # so the windowed-inference path can skip re-uploads.
                    dev_frames[key] = out
                    frames_budget -= out_bytes
        for key in keys_list:  # original key order
            if key in entries:
                table_temp[key] = entries[key]
        table_temp._host_f32 = host_f32
        table_temp._deferred_f32 = deferred
        # Scaled matrices stay resident on device: the windowed-inference
        # path consumes them directly, skipping a host round trip per key.
        table_temp._device_frames = dev_frames
        return table_temp, global_scaler


# --------------------------------------------------------------------------- #
# Preprocess helpers
# --------------------------------------------------------------------------- #


class _DeferredScaledFrame:
    """A scaled ``(T, F)`` float32 matrix still resident on the
    accelerator, fetched once on first host access.

    Shared by every lazy host view of the same frame (the scaled
    LazyFrame, the LazyWindows training tensors, the inference scale
    cache), so however many of them are realized, the wire is crossed at
    most once per frame — and not at all for inference-only flows, which
    read the device copy directly."""

    __slots__ = ("dev", "_host")

    def __init__(self, dev):
        self.dev = dev
        self._host = None

    def f32(self) -> np.ndarray:
        if self._host is None:
            self._host = np.asarray(self.dev)
        return self._host


def _device_scale_applicable(
    scale, filter_low_variance,
    dist_standardize, speed_standardize, coord_standardize,
) -> bool:
    """Gate for the device scaling fast path: standard scaler, per-column
    (or disabled) standardize modes, no low-variance filtering, and an
    accelerator backend (DEEPOF_TPU_DEVICE_SCALE=1 forces it on CPU for
    tests; =0 disables it everywhere). The float32 device math diverges
    from the float64 host path at roundoff scale only."""
    mode = os.environ.get("DEEPOF_TPU_DEVICE_SCALE", "auto")
    if mode == "0":
        return False
    if scale != "standard" or filter_low_variance:
        return False
    if any(
        m not in (None, "per_column")
        for m in (dist_standardize, speed_standardize, coord_standardize)
    ):
        return False
    if mode == "1":
        return True
    try:
        import jax

        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover
        return False


def _build_scale_meta(
    tab, log_distances,
    dist_standardize, speed_standardize, coord_standardize, interp_thresh,
):
    """Column bookkeeping for the device scaling path: per-column masks
    (distance log, local standardize, outlier clip) and the section
    layouts the global scaler dict is keyed by."""
    import jax.numpy as jnp

    cols = tab.columns
    ct = dutils.infer_column_types(tab)
    pos = {c: i for i, c in enumerate(cols)}
    f = len(cols)
    log_mask = np.zeros(f, bool)
    if log_distances:
        log_mask[[pos[c] for c in ct["dists"]]] = True
    local_mask = np.zeros(f, bool)
    if speed_standardize and ct["speeds"]:
        local_mask[[pos[c] for c in ct["speeds"]]] = True
    if dist_standardize and ct["dists"]:
        local_mask[[pos[c] for c in ct["dists"]]] = True
    coord_cols = [
        c for c in cols
        if isinstance(c, tuple) and len(c) == 2 and c[1] in ("x", "y")
    ]
    clip_cols = list(dict.fromkeys(ct["scalars"] + coord_cols))
    clip_mask = np.zeros(f, bool)
    if clip_cols:
        clip_mask[[pos[c] for c in clip_cols]] = True
    return {
        "columns": cols, "ct": ct, "pos": pos, "coord_cols": coord_cols,
        "log_mask": jnp.asarray(log_mask),
        "local_mask": jnp.asarray(local_mask),
        "clip_mask": jnp.asarray(clip_mask),
        "interp_thresh": float(interp_thresh),
    }


def _divisor_encoding(meta, animal_ids, size_ref=("Nose", "Tail_base")):
    """Host-side encoding of the body-size divisor plan for
    ``ops.scaling.size_divisors``: weights ``w (F, A+1)`` over
    [per-animal factors, cohort default], constant ``c (F,)``, and the
    static per-animal (nose_x, nose_y, tail_x, tail_y) column-index quads
    (None when absent — compute_size_factors' name-miss rule). Mirrors
    utils.compute_size_factors + _size_divisor_plan with
    inter_scale="mean" exactly."""
    ct, pos = meta["ct"], meta["pos"]
    f = len(meta["columns"])
    n_a = len(animal_ids)
    aid_idx = {aid: i for i, aid in enumerate(animal_ids)}
    w = np.zeros((f, n_a + 1), np.float32)
    c = np.ones(f, np.float32)

    def set_owned(col, owner):
        j = pos[col]
        w[j, aid_idx[owner]] = 1.0
        c[j] = 0.0

    for bp, axis in ct["coords"]:
        a = dutils.animal_of(bp)
        if a in aid_idx:
            set_owned((bp, axis), a)
    for bp in ct["speeds"]:
        a = dutils.animal_of(bp)
        if a in aid_idx:
            set_owned(bp, a)
    for dist in ct["dists"]:
        a1, a2 = dutils.animal_of(dist[0]), dutils.animal_of(dist[1])
        j = pos[dist]
        c[j] = 0.0
        if a1 == a2:
            w[j, aid_idx.get(a1, n_a)] = 1.0
        else:  # inter_scale="mean"
            w[j, aid_idx.get(a1, n_a)] += 0.5
            w[j, aid_idx.get(a2, n_a)] += 0.5

    quads = []
    ref_a, ref_b = size_ref
    for aid in animal_ids:
        a = ref_a if aid is None else f"{aid}_{ref_a}"
        b = ref_b if aid is None else f"{aid}_{ref_b}"
        need = [(a, "x"), (a, "y"), (b, "x"), (b, "y")]
        if all(col in pos for col in need):
            quads.append(tuple(pos[col] for col in need))
        else:
            quads.append(None)
    return w, c, tuple(quads)


def _rows_are_full_range(rows, n: int) -> bool:
    rows = np.asarray(rows)
    if rows.dtype == bool:
        return rows.size == n and bool(rows.all())
    return (
        rows.ndim == 1
        and rows.size == n
        and n > 0
        and int(rows[0]) == 0
        and int(rows[-1]) == n - 1
        and np.array_equal(rows, np.arange(n))
    )


def _global_scaler_vectors(gs, meta, f, modes):
    """Flatten the section global-scaler dict into full-length per-column
    (mean, scale, mask) vectors for ``finish_scaled``. Returns None when
    the dict holds anything the per-column device formulation can't
    express (groupwise sections, non-standard kinds, size mismatches).

    ``modes`` is (speed, dist, coord) standardize modes: a section is
    applied ONLY when its mode is "per_column", matching the host
    ``_apply_global_scaler`` — a pretrained scaler may carry fitted
    sections whose mode is disabled for this call (ADVICE r3)."""
    speed_standardize, dist_standardize, coord_standardize = modes
    gmean = np.zeros(f, np.float32)
    gscale = np.ones(f, np.float32)
    gmask = np.zeros(f, bool)
    if gs is None:
        return gmean, gscale, gmask
    if gs.get("kind", "standard") != "standard":
        return None
    if gs.get("dist_inner") is not None or gs.get("dist_intra") is not None:
        return None
    for name, mode, cols in (
        ("speed", speed_standardize, meta["ct"]["speeds"]),
        ("dist", dist_standardize, meta["ct"]["dists"]),
        ("coord", coord_standardize, meta["coord_cols"]),
    ):
        sc = gs.get(name)
        if sc is None or not cols or mode != "per_column":
            continue
        mean = getattr(sc, "mean_", None)
        scale = getattr(sc, "scale_", None)
        if mean is None or scale is None or np.size(mean) != len(cols):
            return None
        ii = [meta["pos"][c] for c in cols]
        gmean[ii] = np.asarray(mean, np.float64)
        gscale[ii] = np.asarray(scale, np.float64)
        gmask[ii] = True
    return gmean, gscale, gmask


def _hconcat_single_block(tabs: List[pd.DataFrame]):
    """Column-wise concat that produces a SINGLE consolidated float64
    block when every part is an all-float64 frame on the same index.

    ``pd.concat(axis=1)`` keeps each part as its own block; every later
    ``to_numpy`` on the merged feature table then pays a full
    ``_interleave`` copy (~100 MB at recording scale, several times per
    preprocess). Building the frame from one hstacked float64 matrix makes
    all of those reads single-block — and performs any float32→float64
    upcast (device-dtype speed tables) exactly once, here. Falls back to
    ``pd.concat`` (identical semantics) for non-float dtypes or mismatched
    indexes."""
    if all(isinstance(t, pd.DataFrame) for t in tabs) and len(tabs) > 1:
        idx = tabs[0].index
        if all(t.index.equals(idx) for t in tabs[1:]):
            blocks = []
            for t in tabs:
                if not all(
                    np.issubdtype(dt, np.floating) for dt in t.dtypes
                ):
                    break
                blocks.append(t.to_numpy())
            else:
                cols = tabs[0].columns
                for t in tabs[1:]:
                    cols = cols.append(t.columns)
                out = np.empty(
                    (len(idx), sum(b.shape[1] for b in blocks)), np.float64
                )
                start = 0
                for b in blocks:
                    out[:, start : start + b.shape[1]] = b
                    start += b.shape[1]
                return pd.DataFrame(out, index=idx, columns=cols, copy=False)
    return pd.concat(tabs, axis=1, join="inner")


def _filter_low_variance(tab: pd.DataFrame, threshold) -> pd.DataFrame:
    if not threshold:
        return tab
    keep = list(np.where(tab.var(axis=0) > threshold)[0]) + [
        i for i, c in enumerate(tab.columns) if str(c).lower().startswith("pheno")
    ]
    keep = sorted(set(keep))
    return tab.iloc[:, keep]


def _interp_nan_block(arr: np.ndarray) -> np.ndarray:
    """Linear interpolation of NaN runs per column, nearest-filled at both
    edges — pandas ``interpolate(limit_direction="both")`` semantics on a
    positional index, computed with np.interp per NaN-carrying column
    (vectorized rows; orders of magnitude faster than the per-column
    pandas path on long recordings). All-NaN columns are left as NaN."""
    nan_cols = np.flatnonzero(np.isnan(arr).any(axis=0))
    if nan_cols.size == 0:
        return arr
    t = np.arange(arr.shape[0], dtype=np.float64)
    for c in nan_cols:
        col = arr[:, c]
        m = np.isnan(col)
        if m.all():
            continue
        arr[m, c] = np.interp(t[m], t[~m], col[~m])
    return arr


def _sanitize_numeric(df: pd.DataFrame) -> pd.DataFrame:
    num = df.select_dtypes(include=[np.number]).columns
    if len(num) == len(df.columns):
        # all-numeric (the feature-table hot path): build the result frame
        # directly from the sanitized block — no .copy() consolidation,
        # and no extra copy when to_numpy already converted dtypes.
        block = df.to_numpy(np.float64)
        if not block.flags.writeable:
            block = block.copy()
        block = np.nan_to_num(_interp_nan_block(block), nan=0.0, copy=False)
        return pd.DataFrame(
            block, index=df.index, columns=df.columns, copy=False
        )
    out = df.copy()
    if len(num) > 0:
        block = out[num].to_numpy(np.float64).copy()
        block = np.nan_to_num(_interp_nan_block(block), nan=0.0, copy=False)
        out[num] = pd.DataFrame(block, index=out.index, columns=num)
    return out


class _StandardScalerLite:
    """Drop-in for a fitted ``sklearn.preprocessing.StandardScaler``
    (transform / inverse_transform / mean_ / var_ / scale_), fitted
    NaN-aware in two passes over a list of sample blocks WITHOUT
    materializing ``np.vstack(bucket)`` — at recording scale that vstack
    is a full extra copy of every sampled frame per section."""

    def __init__(self, mean, var):
        self.mean_ = mean
        self.var_ = var
        scale = np.sqrt(var)
        # sklearn's _handle_zeros_in_scale: constant features divide by 1.
        scale[(scale == 0.0) | ~np.isfinite(scale)] = 1.0
        self.scale_ = scale

    def transform(self, x):
        return (np.asarray(x, dtype=np.float64) - self.mean_) / self.scale_

    def inverse_transform(self, x):
        return np.asarray(x, dtype=np.float64) * self.scale_ + self.mean_


def _fast_fit_standard(bucket) -> _StandardScalerLite:
    n_cols = bucket[0].shape[1]
    count = np.zeros(n_cols, dtype=np.int64)
    total = np.zeros(n_cols, dtype=np.float64)
    for a in bucket:
        count += np.sum(~np.isnan(a), axis=0)
        total += np.nansum(a, axis=0)
    safe = np.maximum(count, 1)
    mean = total / safe
    ssd = np.zeros(n_cols, dtype=np.float64)
    for a in bucket:
        d = a - mean
        ssd += np.nansum(d * d, axis=0)
    var = ssd / safe
    mean[count == 0] = np.nan
    var[count == 0] = np.nan
    return _StandardScalerLite(mean, var)


def _collect_section(vals, pos, bucket, cols, idx, mode):
    """Gather the sampled rows of one column section straight out of the
    table's matrix view (``vals``): ``np.ix_`` copies only the sample,
    where label selection would copy every row of the section first."""
    arr = vals[np.ix_(idx, [pos[c] for c in cols])]
    if arr.dtype != np.float64:
        arr = arr.astype(np.float64)
    if mode == "per_column":
        bucket.append(arr)
    else:
        bucket.append(arr.reshape(-1))


def _take_rows(tab: pd.DataFrame, rows) -> pd.DataFrame:
    """``tab.iloc[rows]`` that recognizes a contiguous row range and slices
    instead — ``.iloc`` with an index array materializes a full copy of the
    table, which at recording scale (rows = the whole table, the common
    case) is a ~100 MB memcpy per pass."""
    rows = np.asarray(rows)
    if rows.ndim == 1 and rows.size > 1:
        first, last = int(rows[0]), int(rows[-1])
        if last - first + 1 == rows.size and np.array_equal(
            rows, np.arange(first, last + 1)
        ):
            if first == 0 and last + 1 == len(tab):
                return tab
            return tab.iloc[first : last + 1]
    return tab.iloc[rows]


def _finish_scaled_positional(
    local: pd.DataFrame,
    global_scaler,
    scale,
    interpolate_normalized,
    speed_standardize,
    dist_standardize,
    coord_standardize,
) -> pd.DataFrame:
    """Pass-3 finish for an all-float64, unique-column locally-scaled table,
    done entirely on one (T, F) matrix: apply the global section scalers,
    clip + reinterpolate standardized outliers, interpolate the (unscaled)
    angle columns, and sanitize — semantically identical to the label-based
    path (_apply_global_scaler + per-frame concat/reindex/_sanitize_numeric)
    but with zero block splitting or column reordering copies."""
    ct = dutils.infer_column_types(local)
    cols = local.columns
    m = local.to_numpy()
    if not m.flags.writeable:
        m = m.copy()
    pos = {c: i for i, c in enumerate(cols)}

    def section(section_cols):
        return np.asarray([pos[c] for c in section_cols], dtype=int)

    coord_cols = [
        c for c in cols
        if isinstance(c, tuple) and len(c) == 2 and c[1] in ("x", "y")
    ]
    if global_scaler is not None:

        def app2d(section_cols, scaler):
            if section_cols and scaler is not None:
                ii = section(section_cols)
                m[:, ii] = scaler.transform(m[:, ii])

        def app1d(section_cols, scaler):
            if section_cols and scaler is not None:
                ii = section(section_cols)
                arr = m[:, ii]
                m[:, ii] = scaler.transform(arr.reshape(-1, 1)).reshape(arr.shape)

        if speed_standardize == "per_column":
            app2d(ct["speeds"], global_scaler.get("speed"))
        elif speed_standardize == "groupwise":
            app1d(ct["speeds"], global_scaler.get("speed"))
        if dist_standardize == "per_column":
            app2d(ct["dists"], global_scaler.get("dist"))
        elif dist_standardize == "groupwise":
            app1d(ct["inner_dists"], global_scaler.get("dist_inner"))
            app1d(ct["intra_dists"], global_scaler.get("dist_intra"))
        if coord_standardize == "per_column":
            app2d(coord_cols, global_scaler.get("coord"))
        elif coord_standardize == "groupwise":
            app1d(coord_cols, global_scaler.get("coord"))

    if scale == "standard" and interpolate_normalized:
        clip_cols = list(dict.fromkeys(ct["scalars"] + coord_cols))
        if clip_cols:
            ii = section(clip_cols)
            sub = m[:, ii]
            sub[np.abs(sub) > interpolate_normalized] = np.nan
            m[:, ii] = _interp_nan_block(sub)

    if ct["angles"]:
        ii = section(ct["angles"])
        m[:, ii] = _interp_nan_block(m[:, ii])

    # _sanitize_numeric semantics, in place on the same matrix.
    m = np.nan_to_num(_interp_nan_block(m), nan=0.0, copy=False)
    return pd.DataFrame(m, index=local.index, columns=cols, copy=False)


def _fit_global_scaler(
    scale, pretrained_scaler, samples,
    dist_standardize, speed_standardize, coord_standardize,
):
    """Fit the global section scalers; returns the legacy dict format
    {"kind", "speed", "dist", "dist_inner", "dist_intra", "coord"}."""
    if pretrained_scaler is not None:
        return pretrained_scaler
    if not scale:
        return None

    def fit_2d(bucket):
        if not bucket:
            return None
        if scale == "standard":
            return _fast_fit_standard(bucket)
        sc = dutils.make_scaler(scale)
        sc.fit(np.vstack(bucket))
        return sc

    def fit_1d(bucket):
        if not bucket:
            return None
        if scale == "standard":
            return _fast_fit_standard([b.reshape(-1, 1) for b in bucket])
        sc = dutils.make_scaler(scale)
        sc.fit(np.concatenate(bucket).reshape(-1, 1))
        return sc

    gs = {"kind": scale, "speed": None, "dist": None,
          "dist_inner": None, "dist_intra": None, "coord": None}
    if speed_standardize == "per_column":
        gs["speed"] = fit_2d(samples["speed"])
    elif speed_standardize == "groupwise":
        gs["speed"] = fit_1d(samples["speed"])
    if dist_standardize == "per_column":
        gs["dist"] = fit_2d(samples["dist"])
    elif dist_standardize == "groupwise":
        gs["dist_inner"] = fit_1d(samples["inner"])
        gs["dist_intra"] = fit_1d(samples["intra"])
    if coord_standardize == "per_column":
        gs["coord"] = fit_2d(samples["coord"])
    elif coord_standardize == "groupwise":
        gs["coord"] = fit_1d(samples["coord"])

    if all(v is None for k, v in gs.items() if k != "kind"):
        return None
    return gs


def _apply_global_scaler(
    tab, global_scaler, speed_standardize, dist_standardize, coord_standardize
):
    if global_scaler is None:
        return tab

    def apply_1d(cols, scaler):
        if not cols or scaler is None:
            return
        arr = tab[cols].to_numpy(float)
        tab.loc[:, cols] = scaler.transform(arr.reshape(-1, 1)).reshape(arr.shape)

    def apply_2d(cols, scaler):
        if not cols or scaler is None:
            return
        tab.loc[:, cols] = scaler.transform(tab[cols].to_numpy(float))

    ct = dutils.infer_column_types(tab)
    if speed_standardize == "per_column":
        apply_2d(ct["speeds"], global_scaler.get("speed"))
    elif speed_standardize == "groupwise":
        apply_1d(ct["speeds"], global_scaler.get("speed"))
    if dist_standardize == "per_column":
        apply_2d(ct["dists"], global_scaler.get("dist"))
    elif dist_standardize == "groupwise":
        apply_1d(ct["inner_dists"], global_scaler.get("dist_inner"))
        apply_1d(ct["intra_dists"], global_scaler.get("dist_intra"))
    coord_cols = [
        c for c in tab.columns
        if isinstance(c, tuple) and len(c) == 2 and c[1] in ("x", "y")
    ]
    if coord_standardize == "per_column":
        apply_2d(coord_cols, global_scaler.get("coord"))
    elif coord_standardize == "groupwise":
        apply_1d(coord_cols, global_scaler.get("coord"))
    return tab


def extract_windows(
    to_window: TableDict,
    window_size: int,
    window_step: int,
    save_as_paths: bool = False,
    shuffle: bool = False,
    aggregate: str = None,
) -> Tuple[TableDict, tuple]:
    """Slide windows over every table; returns (windowed dict, total shape).

    Matches the reference's extract_windows contract
    (deepof/utils.py:3380-3470); aggregation supports None/mid/mean/wta/lta.
    """
    out_len, window_len, n_features = 0, 0, 0
    from deepof_tpu.ops.windows import rolling_windows_host

    for key in to_window.keys():
        tab, tab_path = get_dt(to_window, key, True)
        arr = np.asarray(tab)
        windows = rolling_windows_host(arr, window_size, window_step)

        if aggregate == "mid":
            mid = windows.shape[1] // 2
            windows = windows[:, mid : mid + 1]
        elif aggregate == "mean":
            windows = windows.mean(axis=1)[:, None, :]
        elif aggregate in ("wta", "lta"):
            windows = aggregate_windows_labels(windows.astype(int), aggregate)

        if shuffle:
            windows = windows[np.random.choice(len(windows), len(windows), replace=False)]

        out_len += windows.shape[0]
        window_len = windows.shape[1]
        n_features = windows.shape[2] if windows.ndim > 2 else 1

        path = None
        if isinstance(tab_path, dict):
            path = os.path.splitext(tab_path["h5_file"])[0]
        to_window[key] = save_dt(windows, path, save_as_paths)

    return to_window, (out_len, window_len, n_features)


def _sample_windows_methods(cls):
    """Attach the window-sampling API used by plots and diagnostics
    (deepof/data.py:3930-4045)."""

    def sample_windows_from_data(
        self,
        time_bin_info: Dict[str, np.ndarray] = None,
        n_windows: int = 10000,
        no_nans: bool = False,
        return_edges: bool = False,
        seed: int = 0,
        N_windows_tab: int = None,
    ):
        """Sample a random contiguous block of windows per experiment.

        Matches the reference's sampling contract
        (deepof/data.py:3931-4045 _get_sample_indices +
        sample_windows_from_data): when ``time_bin_info`` covers every key
        those indices are used verbatim; otherwise a random-start
        contiguous block of up to ``n_windows`` rows is drawn (after
        NaN-row filtering when ``no_nans``), with returned indices always
        relative to the original table. ``N_windows_tab`` is the
        reference's name for ``n_windows``.

        Returns (X (N, ...), a (N, ...), per-key index dict).
        """
        if N_windows_tab is not None:
            n_windows = N_windows_tab
        rng = np.random.default_rng(seed)
        use_provided = bool(time_bin_info) and set(self.keys()).issubset(
            time_bin_info.keys()
        )
        xs, edges, indices = [], [], {}
        for key in self.keys():
            main, edge = self._get_data_tables(key)
            arr = np.asarray(main)
            if use_provided:
                # Provided indices are used verbatim (data.py:4019-4025).
                take_idx = np.asarray(time_bin_info[key])
                take_idx = take_idx[take_idx < len(arr)]
            else:
                base_idx = np.arange(len(arr))
                pool = arr
                if no_nans:
                    valid = ~np.isnan(arr).any(axis=tuple(range(1, arr.ndim)))
                    pool = arr[valid]
                    base_idx = base_idx[valid]
                take = min(n_windows, len(pool))
                if take == 0:
                    indices[key] = np.zeros(0, dtype=int)
                    continue
                start = rng.integers(0, max(1, len(pool) - take + 1))
                take_idx = base_idx[start : start + take]
            xs.append(arr[take_idx])
            indices[key] = take_idx
            if edge is not None:
                edges.append(np.asarray(edge)[take_idx])
            else:
                edges.append(np.zeros_like(arr[take_idx]))
        x = np.concatenate(xs) if xs else np.zeros((0,))
        a = np.concatenate(edges) if edges else np.zeros((0,))
        if return_edges:
            return x, a, indices
        return x, indices

    def _get_data_tables(self, key):
        raw = get_dt(self, key)
        if isinstance(raw, tuple) and len(raw) > 0:
            return raw[0], raw[1] if len(raw) > 1 else None
        return raw, None

    cls.sample_windows_from_data = sample_windows_from_data
    cls._get_data_tables = _get_data_tables
    return cls


_sample_windows_methods(TableDict)
