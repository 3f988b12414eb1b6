"""Post-hoc statistics over embeddings and cluster assignments.

Behavioral spec: deepof/post_hoc.py — time-on-cluster (:1742), aggregated
embeddings (:1834), condition separability via classifier-AUC or
Wasserstein distances (:1946,2023), normative GMM scoring (:2097),
enrichment across conditions (:2126), transition matrices + steady states
(:2248,2324), kinematics alignment (:2389), chunk summary statistics
(:2536), chunk annotation (:2562), supervised cluster detectors with
leave-one-experiment-out CV (:2745), SHAP explanations (:2824), and
reclustering (:1596).

Library divergences (documented): catboost -> sklearn
HistGradientBoosting; seglearn base features -> a numpy implementation of
the same statistics; shap/umap stay optional imports with clear errors.
"""

from __future__ import annotations

import os
import warnings
from collections import Counter
from itertools import product
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np
import pandas as pd

from deepof_tpu.core.storage import get_dt, save_dt
from deepof_tpu.core.table_dict import TableDict
from deepof_tpu.msm import get_contrastive_soft_counts  # noqa: F401 — reference public API lives here (post_hoc.py:146)
from deepof_tpu.gating import (  # noqa: F401 — reference post_hoc public names (post_hoc.py:385-1593)
    add_chaos_gates,
    compute_gate_edges,
    get_contrastive_soft_counts_gmm,
    get_contrastive_soft_counts_msm_pcca,
    get_pairwise_distances,
    get_supervised_chaos,
)


# --------------------------------------------------------------------------- #
# Kinematics alignment
# --------------------------------------------------------------------------- #


def align_deepof_kinematics_with_unsupervised_labels(
    deepof_project,
    kin_derivative: int = 1,
    center: str = "Center",
    align: str = "Spine_1",
    include_feature_derivatives: bool = False,
    include_distances: bool = True,
    include_angles: bool = True,
    include_areas: bool = True,
    animal_id: str = None,
    file_name: Optional[str] = "kinematics",
    return_path: bool = False,
) -> TableDict:
    """Per-experiment feature table: raw + derivative kinematics with
    _raw/_speed/_acceleration suffixes (post_hoc.py:2389-2520)."""
    return _kinematics_table_views(
        deepof_project,
        views=[animal_id],
        kin_derivative=kin_derivative,
        center=center,
        align=align,
        include_feature_derivatives=include_feature_derivatives,
        include_distances=include_distances,
        include_angles=include_angles,
        include_areas=include_areas,
        file_name=file_name,
        return_path=return_path,
    )[animal_id]


def _kinematics_table_views(
    deepof_project,
    views,
    kin_derivative: int = 1,
    center: str = "Center",
    align: str = "Spine_1",
    include_feature_derivatives: bool = False,
    include_distances: bool = True,
    include_angles: bool = True,
    include_areas: bool = True,
    file_name: Optional[str] = "kinematics",
    return_path: bool = False,
    distance_pairs=None,
):
    """Kinematics tables for several animal views in ONE device pass.

    ``views`` is a list of animal ids (None = all animals). Each underlying
    per-key table (coords derivative, distances, angles, areas) is computed
    once and every view is a host-side column filter of it — the per-animal
    tables the supervised pipeline needs are subsets of the full ones, so
    recomputing (and re-fetching) the device programs per animal is pure
    waste. Returns {view: TableDict}.

    ``distance_pairs``: optional explicit (bp_a, bp_b) list restricting the
    distance columns fetched from the device — when a consumer only reads a
    known subset (the immobility classifier reads 11 pairs per animal),
    fetching all C(n, 2) pair columns per experiment is pure wire cost.
    """
    from deepof_tpu.data import _fetch_all, _gather_columns_device
    from deepof_tpu.utils import filter_animal_id_in_table

    def _view_filter(df, view, is_areas=False):
        if view is None:
            return df
        if is_areas:  # get_areas_at_key(selected_id=view) column rule
            return df.loc[:, [c for c in df.columns if c.startswith(view)]]
        return filter_animal_id_in_table(df, view)

    keys = list(deepof_project.get_table_keys())

    # Phase 1: enqueue the column-sliced device gathers for EVERY key
    # (distances / angles / areas are key-independent slices of the
    # stored arrays), then collect them in one coalesced transfer
    # (_fetch_all: one wire crossing per dtype through the tunnel)
    # instead of one blocking fetch per key per part.
    handles, owners = [], []
    if include_distances:
        d_keep = deepof_project._distance_keep_idx(
            None, False, pairs=distance_pairs
        )
        for key in keys:
            handles.append(_gather_columns_device(
                deepof_project._distances[key], d_keep,
                len(deepof_project._pair_names),
            ))
            owners.append(("dists", key))
    if include_angles:
        a_keep = deepof_project._angle_keep_idx(None)
        for key in keys:
            handles.append(_gather_columns_device(
                deepof_project._angles[key], a_keep,
                len(deepof_project._bridge_names),
            ))
            owners.append(("angles", key))
    if include_areas:
        n_areas = len(deepof_project._area_names)
        for key in keys:
            handles.append(_gather_columns_device(
                deepof_project._areas[key], list(range(n_areas)), n_areas,
            ))
            owners.append(("areas", key))
    fetched = dict(zip(owners, _fetch_all(handles)))

    out = {view: {} for view in views}
    for key in keys:
        kin = {view: pd.DataFrame() for view in views}
        for der in range(kin_derivative + 1):
            parts = []  # (DataFrame, is_areas)
            if der != 0:
                parts.append((
                    deepof_project.get_coords_at_key(
                        key=key, scale=deepof_project._scales[key],
                        center=center, align=align, speed=der,
                    ),
                    False,
                ))
            if include_distances and (der == 0 or include_feature_derivatives):
                parts.append((
                    deepof_project.get_distances_at_key(
                        key=key, speed=der, filter_on_graph=False,
                        pairs=distance_pairs, _gathered=fetched[("dists", key)],
                    ),
                    False,
                ))
            if include_angles and (der == 0 or include_feature_derivatives):
                parts.append((
                    deepof_project.get_angles_at_key(
                        key=key, speed=der, _gathered=fetched[("angles", key)]
                    ),
                    False,
                ))
            if include_areas and (der == 0 or include_feature_derivatives):
                parts.append((
                    deepof_project.get_areas_at_key(
                        key=key, speed=der, selected_id="all",
                        _gathered=fetched[("areas", key)],
                    ),
                    True,
                ))
            suffix = {0: "_raw", 1: "_speed", 2: "_acceleration"}.get(
                der, f"_kinematics_{der}"
            )
            for view in views:
                cur = pd.concat(
                    [_view_filter(df, view, is_areas) for df, is_areas in parts],
                    axis=1,
                ) if parts else pd.DataFrame()
                cur = cur.copy()
                cur.columns = [f"{c}{suffix}" for c in cur.columns]
                kin[view] = pd.concat([kin[view], cur], axis=1)
        for view in views:
            # Single-view calls keep the reference's exact save name
            # ({key}_{file_name}, post_hoc.py:2525). Multi-view calls get
            # a per-view suffix: with several views sharing one name,
            # later saves would overwrite earlier ones and every view's
            # pointer would resolve to the last view's table.
            path = None
            if file_name:
                stem = f"{key}_{file_name}"
                if len(views) > 1:
                    stem += f"_{view}" if view else "_all"
                path = os.path.join(deepof_project._table_path, key, stem)
            out[view][key] = save_dt(kin[view], path, return_path)
    return {
        view: TableDict(
            tabs, typ="annotations", table_path=deepof_project._table_path
        )
        for view, tabs in out.items()
    }


# --------------------------------------------------------------------------- #
# Cluster usage statistics
# --------------------------------------------------------------------------- #


def _resolve_range(bin_info, key):
    if isinstance(bin_info, np.ndarray):
        return bin_info
    if isinstance(bin_info, dict):
        entry = bin_info[key]
        return entry["time"] if isinstance(entry, dict) else entry
    return None


def get_time_on_cluster(
    soft_counts: TableDict,
    normalize: bool = True,
    reduce_dim: bool = False,
    bin_info=None,
    roi_number=None,
    animals_in_roi=None,
) -> pd.DataFrame:
    """Fraction (or count) of frames assigned to each cluster per
    experiment."""
    from deepof_tpu.utils import get_unsupervised_behaviors_in_roi

    counters = {}
    for key in soft_counts.keys():
        arr = np.asarray(get_dt(soft_counts, key, load_range=_resolve_range(bin_info, key)))
        valid = ~np.isnan(arr).all(axis=1)
        hard = np.full(len(arr), np.nan)
        hard[valid] = np.argmax(np.nan_to_num(arr[valid], nan=-np.inf), axis=1)
        if roi_number is not None:
            # bin_info entries carry per-animal in-ROI masks
            # (visuals_utils.apply_rois_to_bin_info); out-of-ROI frames
            # drop from the usage counts (post_hoc.py:1797-1799).
            hard = get_unsupervised_behaviors_in_roi(
                hard, bin_info[key], animals_in_roi
            )
            hard = hard[hard >= 0]
        counts = Counter(hard[~np.isnan(hard)])
        if normalize and counts:
            total = sum(counts.values())
            counts = {k: v / total for k, v in counts.items()}
        counters[key] = counts
    df = pd.DataFrame(counters).T.fillna(0)
    df = df[sorted(df.columns)]
    if reduce_dim:
        from sklearn.decomposition import PCA
        from sklearn.pipeline import Pipeline
        from sklearn.preprocessing import StandardScaler

        pipe = Pipeline([("PCA", PCA(n_components=2)), ("scaler", StandardScaler())])
        df = pd.DataFrame(pipe.fit_transform(df), index=df.index)
    return df


def get_aggregated_embedding(
    embedding: TableDict,
    reduce_dim: bool = False,
    agg: str = "mean",
    bin_info=None,
    roi_number=None,
    animals_in_roi=None,
    roi_mode: str = "mousewise",
) -> pd.DataFrame:
    """One embedding row per experiment (mean/median over chunks)."""
    from deepof_tpu.utils import (
        get_supervised_behaviors_in_roi,
        get_unsupervised_behaviors_in_roi,
    )

    rows = {}
    columns = None
    for key in embedding.keys():
        cur = get_dt(embedding, key, load_range=_resolve_range(bin_info, key))
        if roi_number is not None:
            # NaN-out chunks where the requested animals left the ROI
            # (post_hoc.py:1892-1895).
            if isinstance(cur, pd.DataFrame):
                cur = get_supervised_behaviors_in_roi(
                    cur, bin_info[key], animals_in_roi, roi_mode
                )
            else:
                cur = get_unsupervised_behaviors_in_roi(
                    np.asarray(cur, float), bin_info[key], animals_in_roi
                )
        cur = pd.DataFrame(cur)
        columns = cur.columns
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", category=RuntimeWarning)
            rows[key] = (
                np.nanmean(cur, axis=0) if agg == "mean" else np.nanmedian(cur, axis=0)
            )
    df = pd.DataFrame(rows, index=columns).T
    drop = [c for c in df.columns if "distance" in str(c)]
    df = df.drop(columns=drop)
    if df.isnull().any().any():
        df = df.dropna()
    if reduce_dim:
        from sklearn.decomposition import PCA
        from sklearn.pipeline import Pipeline
        from sklearn.preprocessing import StandardScaler

        pipe = Pipeline([("PCA", PCA(n_components=2)), ("scaler", StandardScaler())])
        df = pd.DataFrame(pipe.fit_transform(df), index=df.index)
    return df


# Behaviors reported as continuous traces rather than binary flags
# (reference config.py:57); they are excluded from enrichment counts.
CONTINUOUS_BEHAVIORS = ["distance", "cum-distance", "speed"]


def enrichment_across_conditions(
    embedding: TableDict = None,
    soft_counts: TableDict = None,
    supervised_annotations: TableDict = None,
    exp_conditions: dict = None,
    plot_speed: bool = False,
    bin_info=None,
    normalize: bool = False,
    roi_number=None,
    animals_in_roi=None,
    roi_mode: str = "mousewise",
    custom_continuous_behavior_names: list = (),
) -> pd.DataFrame:
    """Long-form cluster/behavior usage per experiment annotated with the
    experimental condition.

    Output columns and their order — ``exp_id``, ``exp condition``,
    ``cluster``, ``time on cluster`` — match the reference
    (post_hoc.py:2126-2220), including the cluster-dtype cast (float for
    integer cluster labels, str otherwise).
    """
    if supervised_annotations is not None:
        from deepof_tpu.utils import get_supervised_behaviors_in_roi

        cols = {}
        for key in supervised_annotations.keys():
            tab = pd.DataFrame(
                get_dt(
                    supervised_annotations, key,
                    load_range=_resolve_range(bin_info, key),
                )
            )
            if roi_number is not None:
                tab = get_supervised_behaviors_in_roi(
                    tab, bin_info[key], animals_in_roi, roi_mode
                )
            drop = tuple(CONTINUOUS_BEHAVIORS) + tuple(
                custom_continuous_behavior_names
            )
            if plot_speed:
                selected = [
                    c for c in tab.columns if str(c).endswith("speed")
                ]
            else:
                selected = [
                    c for c in tab.columns if not str(c).endswith(drop)
                ]
            table = tab[selected]
            # np.sum(DataFrame) became a full reduction in pandas 3; the
            # reference (pinned to pandas ^1.5) gets a per-column Series.
            sums = table.sum(axis=0)
            if normalize or plot_speed:
                sums = sums / len(table)
            cols[key] = sums
        counter_df = pd.DataFrame(cols).T
    else:
        counter_df = get_time_on_cluster(
            soft_counts, normalize=normalize, reduce_dim=False,
            bin_info=bin_info, roi_number=roi_number,
            animals_in_roi=animals_in_roi,
        )

    conditions = exp_conditions or {}

    def _cond_of(k):
        c = conditions.get(k)
        if hasattr(c, "iloc"):
            c = c.iloc[0, 0]
        return str(c)

    counter_df["exp condition"] = counter_df.index.map(_cond_of)
    enrichment = (
        counter_df
        .reset_index(names="exp_id")
        .melt(
            id_vars=["exp_id", "exp condition"],
            var_name="cluster",
            value_name="time on cluster",
        )
    )
    if len(enrichment) and enrichment["cluster"].iloc[0] == 0:
        enrichment["cluster"] = enrichment["cluster"].astype(float)
    else:
        enrichment["cluster"] = enrichment["cluster"].astype(str)
    return enrichment


# --------------------------------------------------------------------------- #
# Transitions
# --------------------------------------------------------------------------- #


def get_transitions(
    state_sequence: np.ndarray,
    n_states: int,
    index_sequence: np.ndarray = None,
) -> np.ndarray:
    """Raw transition COUNTS of a hard state sequence.

    When ``index_sequence`` (the frame indices the states were sampled at)
    is given, transitions across gaps — consecutive entries whose frame
    indices are not adjacent, e.g. across time-bin or ROI boundaries —
    are skipped (post_hoc.py:2222-2245). Vectorized with np.add.at
    instead of the reference's Python loop.
    """
    seq = np.asarray(state_sequence).astype(int)
    trans = np.zeros((n_states, n_states))
    if len(seq) < 2:
        return trans
    cur, nex = seq[:-1], seq[1:]
    if index_sequence is not None:
        idx = np.asarray(index_sequence)
        keep = (idx[1:] - idx[:-1]) == 1
        cur, nex = cur[keep], nex[keep]
    np.add.at(trans, (cur, nex), 1.0)
    return trans


def cluster_transition_matrix(
    cluster_sequence: np.ndarray,
    nclusts: int,
    autocorrelation: bool = True,
    return_graph: bool = False,
) -> Tuple:
    """Row-normalized transition matrix of a hard cluster sequence, with
    the reference's exact numerics (deepof/utils.py:4256-4306): +1e-5
    Laplace term in the row denominators and 3-decimal rounding. With
    ``autocorrelation=True`` additionally returns the lag-1 correlation
    matrix of the sequence. Counting is vectorized bigram counting, which
    matches the reference's overlapped-regex string matching for every
    nclusts (and stays correct past 10 clusters, where digit
    concatenation makes the reference's string encoding ambiguous).
    """
    cluster_sequence = np.asarray(cluster_sequence)
    cluster_sequence = cluster_sequence[~np.isnan(cluster_sequence)].astype(int)
    trans = get_transitions(cluster_sequence, nclusts)
    trans_normed = np.round(trans / (trans.sum(axis=1, keepdims=True) + 1e-5), 3)
    if return_graph:
        import networkx as nx

        trans_normed = nx.Graph(trans_normed)
    if autocorrelation:
        autocorr = np.corrcoef(cluster_sequence[:-1], cluster_sequence[1:])
        return trans_normed, autocorr
    return trans_normed


def compute_transition_matrix_per_condition(
    soft_counts: TableDict,
    exp_conditions: dict,
    silence_diagonal: bool = False,
    bin_info=None,
    roi_number=None,
    animals_in_roi=None,
    aggregate: bool = True,
    normalize: bool = True,
) -> Dict[str, np.ndarray]:
    """Transition matrices grouped by condition.

    Matches the reference semantics (post_hoc.py:2248-2322): raw
    transition counts are SUMMED over all videos of a condition (not
    averaged after per-video normalization), diagonals are optionally
    silenced per video before aggregation, and row normalization happens
    once on the aggregated counts. Transitions across gaps in the frame
    range (time bins, ROI exits) are excluded via get_transitions'
    index_sequence. With roi_number set, only frames where the requested
    animals are inside the ROI enter the counts.
    """
    from deepof_tpu.utils import get_behavior_frames_in_roi

    from deepof_tpu.core.storage import get_dt_rows

    matrices: Dict[str, np.ndarray] = {}
    for key in soft_counts.keys():
        if roi_number is not None:
            # A genuine frame-index array: load it index-true (a length-2
            # array would otherwise be misread as an inclusive span).
            load_range = get_behavior_frames_in_roi(
                None, bin_info[key], animals_in_roi
            )
            arr = np.asarray(get_dt_rows(soft_counts, key, load_range))
        else:
            load_range = _resolve_range(bin_info, key)
            arr = np.asarray(get_dt(soft_counts, key, load_range=load_range))
        n_clusters = arr.shape[1]
        hard = np.argmax(arr, axis=1)
        index_sequence = load_range
        if (
            index_sequence is not None
            and len(index_sequence) == 2
            and len(hard) != 2
        ):
            # get_dt treated the 2-element load_range as an inclusive
            # [start, end] span; expand to the matching frame indices so
            # the gap-exclusion mask lines up with the loaded rows.
            index_sequence = np.arange(
                index_sequence[0], index_sequence[1] + 1
            )
        trans = get_transitions(hard, n_clusters, index_sequence=index_sequence)
        if silence_diagonal:
            np.fill_diagonal(trans, 0)
        if aggregate:
            cond = exp_conditions.get(key)
            if hasattr(cond, "iloc"):
                cond = cond.iloc[0, 0]
            cond = str(cond)
            matrices[cond] = matrices.get(cond, 0) + trans
        else:
            matrices[key] = trans
    if normalize:
        with np.errstate(divide="ignore", invalid="ignore"):
            matrices = {
                key: np.nan_to_num(value / value.sum(axis=1)[:, np.newaxis])
                for key, value in matrices.items()
            }
    return matrices


def compute_steady_state(
    transition_matrices: Dict[str, np.ndarray],
    return_entropy: bool = False,
    n_iters: int = 100000,
) -> Dict[str, Union[np.ndarray, float]]:
    """Stationary distribution per condition via repeated squaring of the
    transition matrix (np.linalg.matrix_power — O(log n_iters) matmuls),
    column-summed and renormalized exactly as the reference does
    (post_hoc.py:2325-2357); optionally its Shannon entropy."""
    from scipy import stats

    out = {}
    for cond, trans in transition_matrices.items():
        power = np.linalg.matrix_power(np.asarray(trans, float), n_iters)
        with np.errstate(divide="ignore", invalid="ignore"):
            steady = np.nan_to_num(power.sum(axis=0) / power.sum())
        out[cond] = float(stats.entropy(steady)) if return_entropy else steady
    return out


# --------------------------------------------------------------------------- #
# Condition separability
# --------------------------------------------------------------------------- #


def condition_distance_binning(
    embedding: TableDict,
    soft_counts: TableDict,
    exp_conditions: dict,
    start_bin: int = None,
    end_bin: int = None,
    step_bin: int = None,
    scan_mode: str = "growing_window",
    precomputed_bins: np.ndarray = None,
    agg: str = "mean",
    metric: str = "auc",
    n_jobs: int = 1,
) -> np.ndarray:
    """Separability of conditions across time bins (post_hoc.py:1946-2021).

    Scan modes mirror the reference exactly:

    - ``growing_window``: bins ``[0, i]`` for ``i in range(start_bin,
      end_bin, step_bin)`` (inclusive frame ranges, like ``get_dt``'s
      ``load_range``).
    - ``per-bin``: bins ``[i*step_bin, (i+1)*step_bin - 1]`` for ``i in
      range(end_bin // step_bin)``.
    - anything else: ``precomputed`` — ``precomputed_bins`` holds bin
      *sizes*; bin ``i`` spans ``[cumsum[i], cumsum[i+1]]`` (the reference's
      inclusive-end overlap of one frame between consecutive bins is
      preserved, post_hoc.py:2002).

    ``end_bin`` may be omitted (repo extension): it falls back to the
    shortest soft-count table, which is what the reference's callers pass
    (visuals.py:3990).
    """
    if scan_mode in ("growing_window", "per-bin"):
        if end_bin is None:
            end_bin = min(
                len(np.asarray(get_dt(soft_counts, key)))
                for key in soft_counts.keys()
            )
        if start_bin is None:
            start_bin = max(10, end_bin // 10)
        if step_bin is None:
            step_bin = max(10, end_bin // 10)

    if scan_mode == "per-bin":
        bin_infos = [
            np.array([i * step_bin, (i + 1) * step_bin - 1])
            for i in range(end_bin // step_bin)
        ]
    elif scan_mode == "growing_window":
        bin_infos = [
            np.array([0, i]) for i in range(start_bin, end_bin, step_bin)
        ]
    else:
        assert precomputed_bins is not None, (
            "For precomputed binning, provide a numpy array with bin IDs "
            "under the precomputed_bins parameter"
        )
        cumsums = np.insert(np.cumsum(precomputed_bins), 0, 0)
        bin_infos = [
            np.array([cumsums[i], cumsums[i + 1]])
            for i in range(len(precomputed_bins))
        ]

    distances = [
        separation_between_conditions(
            embedding, soft_counts, bin_info, exp_conditions, agg, metric=metric
        )
        for bin_info in bin_infos
    ]
    return np.asarray(distances)


def _plain_condition(value):
    """Flatten a one-cell exp-condition DataFrame to its scalar value."""
    if hasattr(value, "iloc"):
        return value.iloc[0, 0]
    return value


def _sliced_wasserstein(a: np.ndarray, b: np.ndarray, n_projections: int = 10000, seed: int = 0) -> float:
    """Sliced 2-Wasserstein distance between equal-size samples.

    Numpy replacement for ``ot.sliced_wasserstein_distance`` (POT default
    p=2): project onto ``n_projections`` random unit directions, take the
    exact 1-D W2 per direction (sorted-difference form), return the root
    mean of the squared distances. Used when POT is not installed.
    """
    rng = np.random.default_rng(seed)
    proj = rng.normal(size=(a.shape[1], n_projections))
    proj /= np.maximum(np.linalg.norm(proj, axis=0, keepdims=True), 1e-30)
    pa = np.sort(a @ proj, axis=0)
    pb = np.sort(b @ proj, axis=0)
    return float(np.sqrt(np.mean((pa - pb) ** 2)))


def separation_between_conditions(
    cur_embedding: TableDict,
    cur_soft_counts: TableDict,
    bin_info: Union[dict, np.ndarray],
    exp_conditions: dict,
    agg: str,
    metric: str = "auc",
) -> float:
    """Distance between the embeddings of two conditions in one time bin
    (post_hoc.py:2023-2094).

    ``agg``: "time_on_cluster" aggregates soft counts, "mean"/"median"
    aggregate the embeddings — always with ``reduce_dim=True`` (PCA to 2
    components + standard scaling), like the reference. ``metric``:
    "auc" fits an unpenalized logistic regression on the aggregated rows
    and reports its in-sample ROC-AUC (the reference's exact procedure);
    "wasserstein" KDE-resamples each condition to 100 points and reports
    the sliced 2-Wasserstein distance over 10k projections.
    """
    if agg == "time_on_cluster":
        aggregated = get_time_on_cluster(
            cur_soft_counts, reduce_dim=True, bin_info=bin_info
        )
    elif agg in ("mean", "median"):
        aggregated = get_aggregated_embedding(
            cur_embedding, agg=agg, reduce_dim=True, bin_info=bin_info
        )
    else:
        raise ValueError(f"Unknown aggregation method: {agg}")

    labels = aggregated.index.map(lambda k: _plain_condition(exp_conditions[k]))

    if metric == "auc":
        from sklearn.linear_model import LogisticRegression
        from sklearn.metrics import roc_auc_score
        from sklearn.preprocessing import LabelEncoder

        y = LabelEncoder().fit_transform(labels)
        clf = LogisticRegression(penalty=None)
        clf.fit(aggregated, y)
        return float(roc_auc_score(y, clf.predict_proba(aggregated)[:, 1]))

    if metric == "wasserstein":
        from sklearn.neighbors import KernelDensity

        conditions = sorted({_plain_condition(v) for v in exp_conditions.values()})
        if len(conditions) != 2:
            raise ValueError("Exactly two conditions are required.")
        arrays = [
            KernelDensity()
            .fit(aggregated.loc[np.asarray(labels) == cond].to_numpy(float))
            .sample(100, random_state=0)
            for cond in conditions
        ]
        try:
            from deepof_tpu.utils import import_optional

            ot = import_optional("ot")  # stub-rejecting (see import_optional)
            d = ot.sliced_wasserstein_distance(*arrays, n_projections=10000)
            return float(d)
        except (ImportError, TypeError, AttributeError):
            return _sliced_wasserstein(*arrays)

    raise ValueError(f"Unknown metric: {metric}")


# --------------------------------------------------------------------------- #
# Normative modeling
# --------------------------------------------------------------------------- #


def fit_normative_global_model(global_normal_embeddings: pd.DataFrame):
    """Gaussian KDE fit on control-condition embeddings with the bandwidth
    grid-searched over ``linspace(0.1, 10, 200)`` (post_hoc.py:2097-2124,
    procedure reproduced exactly: ``GridSearchCV`` with
    ``cv=min(10, n_rows)``, then a fresh ``KernelDensity`` refit at the
    best bandwidth)."""
    from sklearn.model_selection import GridSearchCV
    from sklearn.neighbors import KernelDensity

    params = {"bandwidth": np.linspace(0.1, 10, 200)}
    grid_search = GridSearchCV(
        KernelDensity(kernel="gaussian"),
        params,
        cv=int(np.minimum(10, global_normal_embeddings.shape[0])),
    )
    grid_search.fit(global_normal_embeddings.values)
    return KernelDensity(
        kernel="gaussian", bandwidth=grid_search.best_params_["bandwidth"]
    ).fit(global_normal_embeddings.values)


def score_against_normative(model, embeddings: pd.DataFrame) -> pd.Series:
    """Per-experiment log-likelihood under the normative KDE model."""
    return pd.Series(
        model.score_samples(embeddings.to_numpy(float)), index=embeddings.index
    )


# --------------------------------------------------------------------------- #
# Chunk statistics and annotation
# --------------------------------------------------------------------------- #

_BASE_FEATURES = {
    "mean": lambda x: np.nanmean(x, axis=1),
    "median": lambda x: np.nanmedian(x, axis=1),
    "abs_energy": lambda x: np.nansum(x**2, axis=1),
    "std": lambda x: np.nanstd(x, axis=1),
    "var": lambda x: np.nanvar(x, axis=1),
    "min": lambda x: np.nanmin(x, axis=1),
    "max": lambda x: np.nanmax(x, axis=1),
    "skew": lambda x: _skew(x),
    "kurt": lambda x: _kurt(x),
    "mse": lambda x: np.nanmean(x**2, axis=1),
    "mnx": lambda x: np.nanmean(np.abs(np.diff(x, axis=1)), axis=1),
}


def _skew(x):
    from scipy.stats import skew

    return skew(x, axis=1, nan_policy="omit")


def _kurt(x):
    from scipy.stats import kurtosis

    return kurtosis(x, axis=1, nan_policy="omit")


def chunk_summary_statistics(chunked_dataset: np.ndarray, body_part_names: list) -> pd.DataFrame:
    """Summary statistics per chunk and feature (seglearn-equivalent base
    features; post_hoc.py:2536-2560)."""
    n, t, f = chunked_dataset.shape
    blocks = []
    for name, fn in _BASE_FEATURES.items():
        with warnings.catch_warnings():
            warnings.simplefilter("ignore", category=RuntimeWarning)
            vals = np.stack(
                [fn(chunked_dataset[:, :, j]) for j in range(f)], axis=1
            )
        blocks.append(vals)
    data = np.concatenate(blocks, axis=1)
    # Blocks are feature-major: every feature over all bodyparts.
    columns = [
        f"{bp}_{feat}"
        for feat in _BASE_FEATURES.keys()
        for bp in body_part_names
    ]
    return pd.DataFrame(data, columns=columns)


def annotate_time_chunks(
    deepof_project,
    soft_counts: TableDict,
    supervised_annotations: TableDict = None,
    window_size: int = None,
    window_step: int = 1,
    animal_id: str = None,
    samples: int = 10000,
    min_confidence: float = 0.0,
    kin_derivative: int = 1,
    include_distances: bool = False,
    include_angles: bool = False,
    include_areas: bool = False,
    aggregate: str = "mean",
) -> Tuple[pd.DataFrame, pd.Series, dict]:
    """Kinematic feature windows annotated with hard cluster labels
    (post_hoc.py:2562-2707).

    Returns, like the reference: the per-chunk summary features, the hard
    cluster label per chunk, and ``bin_info`` mapping each experiment to
    the window start indices of its surviving chunks (the format
    :func:`chunk_cv_splitter` consumes).
    """
    kinematics = align_deepof_kinematics_with_unsupervised_labels(
        deepof_project,
        kin_derivative=kin_derivative,
        include_distances=include_distances,
        include_angles=include_angles,
        include_areas=include_areas,
        animal_id=animal_id,
        file_name=None,
    )
    if window_size is None:
        window_size = int(np.round(deepof_project._frame_rate))

    feats, labels, bin_info = [], [], {}
    offset = 0
    for key in soft_counts.keys():
        kin = pd.DataFrame(get_dt(kinematics, key))
        if supervised_annotations is not None:
            # Merge supervised labels as extra per-frame features
            # (post_hoc.py:2617-2622).
            sup = pd.DataFrame(get_dt(supervised_annotations, key))
            m = min(len(kin), len(sup))
            kin = pd.concat(
                [
                    kin.iloc[:m].reset_index(drop=True),
                    sup.iloc[:m].reset_index(drop=True),
                ],
                axis=1,
            )
        counts = np.asarray(get_dt(soft_counts, key))
        windows = np.lib.stride_tricks.sliding_window_view(
            kin.to_numpy(float), (window_size,), axis=0
        )[::window_step].transpose(0, 2, 1)
        m = min(len(windows), len(counts))
        windows, cnt = windows[:m], counts[:m]
        keep = cnt.max(axis=1) > min_confidence
        feats.append(windows[keep])
        labels.append(np.argmax(cnt[keep], axis=1))
        bin_info[key] = offset + np.arange(m)[keep] * window_step
        offset += m * window_step

    x = np.concatenate(feats) if feats else np.zeros((0, window_size, 1))
    y = np.concatenate(labels) if labels else np.zeros(0)
    if samples is not None and len(x) > samples:
        idx = np.sort(np.random.choice(len(x), samples, replace=False))
        x, y = x[idx], y[idx]
        flat = np.concatenate([bin_info[k] for k in bin_info])
        bounds = np.cumsum([0] + [len(bin_info[k]) for k in bin_info])
        for i, k in enumerate(bin_info):
            sel = idx[(idx >= bounds[i]) & (idx < bounds[i + 1])]
            bin_info[k] = flat[sel]

    body_part_names = [str(c) for c in kin.columns]
    if aggregate == "mean":
        stats = pd.DataFrame(
            np.nanmean(x, axis=1), columns=body_part_names
        )
    else:
        stats = chunk_summary_statistics(x, body_part_names)
    return stats, pd.Series(y), bin_info


# --------------------------------------------------------------------------- #
# Cluster detectors + explanations
# --------------------------------------------------------------------------- #


def chunk_cv_splitter(
    chunk_stats: pd.DataFrame,
    bin_info: dict,
    n_folds: int = None,
) -> list:
    """Grouped CV folds that never split one experiment across train/test
    (post_hoc.py:2709-2742).

    ``bin_info`` maps each experiment to its chunk index array; chunks are
    assumed sorted by experiment, so repeating the experiment ordinal per
    chunk yields the group labels. One fold per experiment by default
    (leave-one-experiment-out).
    """
    from sklearn.model_selection import GroupKFold

    fold_lengths = np.array([len(value) for value in bin_info.values()])
    cv_indices = np.repeat(np.arange(len(bin_info)), fold_lengths)
    splitter = GroupKFold(
        n_splits=(n_folds if n_folds is not None else len(bin_info))
    ).split(chunk_stats, groups=cv_indices)
    return list(splitter)


def _make_cluster_detector(verbose: int):
    """Scaler -> SMOTE-resampled gradient-boosting pipeline
    (post_hoc.py:2764-2773; catboost is replaced by sklearn's
    HistGradientBoosting, the closest available GBM)."""
    from sklearn.ensemble import HistGradientBoostingClassifier
    from sklearn.pipeline import Pipeline
    from sklearn.preprocessing import StandardScaler

    from deepof_tpu.legacy_compat import ResampledClassifier, SimpleSMOTE

    return Pipeline(
        [
            ("normalization", StandardScaler()),
            ("classifier", ResampledClassifier(
                estimator=HistGradientBoostingClassifier(
                    max_iter=200, verbose=int(verbose > 2),
                ),
                resampler=SimpleSMOTE(random_state=42),
            )),
        ]
    )


def train_supervised_cluster_detectors(
    chunk_stats: pd.DataFrame,
    hard_counts: np.ndarray,
    bin_info: dict,
    n_folds: int = None,
    verbose: int = 1,
):
    """Supervised cluster detectors from kinematic chunk features
    (post_hoc.py:2745-2818).

    Cross-validates a scaler -> SMOTE-resampled GBM pipeline over
    leave-one-experiment-out folds (chunks from the same experiment are
    never shared between train and test), then refits on the full dataset
    for SHAP explainability.

    Returns:
        full_cluster_clf: pipeline trained on all chunks.
        cluster_gbm_performance: sklearn cross_validate dict with weighted
            OVO/OVR ROC-AUC train+test scores and the fold estimators.
        groups: the CV folds used.
    """
    from sklearn.model_selection import cross_validate

    groups = chunk_cv_splitter(chunk_stats, bin_info, n_folds=n_folds)

    hard_values = (
        hard_counts.values if hasattr(hard_counts, "values") else np.asarray(hard_counts)
    )
    if verbose:
        print("Training cross-validated models for performance estimation...")
    cluster_gbm_performance = cross_validate(
        _make_cluster_detector(verbose),
        chunk_stats.values,
        hard_values,
        scoring=["roc_auc_ovo_weighted", "roc_auc_ovr_weighted"],
        cv=groups,
        return_train_score=True,
        return_estimator=True,
        n_jobs=-1,
        verbose=(verbose > 1),
    )

    if verbose:
        print("Training on full dataset for feature importance estimation...")
    full_cluster_clf = _make_cluster_detector(verbose)
    full_cluster_clf.fit(chunk_stats.values, hard_values)

    if verbose:
        print("Done!")
    return full_cluster_clf, cluster_gbm_performance, groups


def explain_clusters(
    chunk_stats: pd.DataFrame,
    hard_counts: np.ndarray,
    full_cluster_clf,
    samples: int = 10000,
    n_jobs: int = -1,
):
    """SHAP feature importance for the trained cluster detectors
    (post_hoc.py:2824-2869). Runs on the self-contained Kernel SHAP in
    deepof_tpu.shap_kernel (validated against exact Shapley values); the
    optional shap package is used as an accelerated backend when present.

    Scales (and SMOTE-resamples, matching the training distribution) the
    chunk features before passing them to a KernelExplainer whose
    background set is a k-means summary with one centroid per cluster.

    Returns (shap_values, explainer, processed_stats).
    """
    try:  # pragma: no cover - optional accelerated backend
        from deepof_tpu.utils import import_optional

        shap = import_optional("shap")

        make_explainer = lambda fn, bg: shap.KernelExplainer(  # noqa: E731
            fn, data=shap.kmeans(bg[0], bg[1]), normalize=False
        )
    except ImportError:
        from deepof_tpu.shap_kernel import KernelExplainer, kmeans_background

        make_explainer = lambda fn, bg: KernelExplainer(  # noqa: E731
            fn, data=kmeans_background(bg[0], bg[1]), normalize=False
        )
    from sklearn.base import clone

    scaler = full_cluster_clf.named_steps["normalization"]
    clfwrap = full_cluster_clf.named_steps["classifier"]

    x_scaled = scaler.transform(chunk_stats.values)
    resampler = getattr(clfwrap, "resampler_", None) or getattr(
        clfwrap, "resampler", None
    )
    if resampler is not None:
        x_scaled, _ = clone(resampler).fit_resample(x_scaled, hard_counts)
    processed_stats = pd.DataFrame(x_scaled, columns=chunk_stats.columns)

    n_clusters = len(np.unique(hard_counts))
    explainer = make_explainer(
        clfwrap.predict_proba, (processed_stats, n_clusters)
    )
    if samples is not None and samples < chunk_stats.shape[0]:
        processed_stats = processed_stats.sample(samples)
    shap_values = explainer.shap_values(
        processed_stats, nsamples=samples, n_jobs=n_jobs
    )
    return shap_values, explainer, processed_stats


def compute_UMAP(
    embeddings: np.ndarray,
    cluster_assignments: np.ndarray,
    random_state: int = 0,
    reducer=None,
):
    """LDA-then-UMAP 2D projection for embedding visualization
    (post_hoc.py:2359-2386).

    Reduces embeddings with a supervised LDA (components capped at
    min(dim, n_clusters - 1)) and projects the result to 2D with UMAP
    (min_dist=0.99, random init), matching the reference's parameters.
    ``reducer`` injects any fit_transform-able 2D projector in place of
    UMAP (used by tests when umap-learn is absent; the LDA stage and the
    pipeline shape contract execute either way).
    """
    assert np.unique(cluster_assignments).size > 1, (
        "LDA could not be computed, as these soft_counts correspond to a "
        "collapsed model that only contains a single cluster!"
    )
    from sklearn.discriminant_analysis import LinearDiscriminantAnalysis

    lda = LinearDiscriminantAnalysis(
        n_components=int(
            min(embeddings.shape[1], len(set(cluster_assignments)) - 1)
        ),
    )
    reduced = lda.fit_transform(embeddings, cluster_assignments)
    if reducer is None:  # pragma: no cover — requires optional umap-learn
        try:
            from deepof_tpu.utils import import_optional

            umap = import_optional("umap")
        except ImportError as e:
            raise ImportError(
                "compute_UMAP requires the optional 'umap-learn' package "
                "(or pass reducer=...)."
            ) from e

        reducer = umap.UMAP(
            min_dist=0.99,
            n_components=2,
            random_state=random_state,
            n_jobs=1 if random_state is not None else -1,
            transform_seed=random_state,
            init="random",
        )
    return reducer.fit_transform(reduced)


def recluster(
    coordinates,
    embeddings: TableDict,
    soft_counts: TableDict = None,
    min_confidence: float = 0.75,
    states: Union[int, str] = "aic",
    pretrained: Union[bool, str] = False,
    covariance_type: str = "diag",
    min_states: int = 2,
    max_states: int = 12,
    save: bool = True,
) -> TableDict:
    """HMM-based reclustering of the embedding space
    (post_hoc.py:1596-1740).

    With ``soft_counts``, fits a semi-supervised HMM whose decode is
    biased by the given soft assignments (rows below ``min_confidence``
    fall back to a uniform prior, like the reference). Without them,
    selects the state count by AIC/BIC over ``[min_states, max_states]``
    (or uses ``states`` directly when it is an int). The HMM is the
    repo's jitted log-space EM (:mod:`deepof_tpu.msm`) rather than
    pomegranate; it is diagonal-covariance, which is also what the
    reference effectively fits (it hard-codes ``covariance_type="diag"``
    in its state scan and falls back to diag in the prior path).

    ``pretrained`` may be a pickle path or True (resolved under the
    project's ``Trained_models``); ``save`` pickles the fitted model
    there when a project is given.
    """
    import pickle

    from deepof_tpu.msm import GaussianHMM, fit_hmm_range, get_soft_counts_hmm

    if covariance_type != "diag":
        warnings.warn(
            "deepof_tpu HMMs are diagonal-covariance; ignoring "
            f"covariance_type={covariance_type!r} (the reference also "
            "fits diag in its state scan)."
        )

    def _model_path():
        return os.path.join(
            coordinates._project_path, coordinates._project_name,
            "Trained_models", f"hmm_trained_{states}.pkl",
        )

    seqs = {
        k: np.asarray(get_dt(embeddings, k), np.float32)
        for k in embeddings.keys()
    }
    model = None
    if pretrained:
        path = pretrained if isinstance(pretrained, str) else _model_path()
        with open(path, "rb") as f:
            model = pickle.load(f)[0]

    if model is None and soft_counts is not None:
        counts = get_soft_counts_hmm(
            embeddings, soft_counts={
                k: np.asarray(get_dt(soft_counts, k)) for k in soft_counts.keys()
            },
            min_confidence=min_confidence,
        )
        out = {k: pd.DataFrame(v) for k, v in counts.items()}
        model = None  # the biased decode is per-key; nothing to persist
    else:
        if model is None:
            if isinstance(states, int):
                min_t = min(s.shape[0] for s in seqs.values())
                x = np.stack([s[:min_t] for s in seqs.values()])
                model = GaussianHMM(int(states)).fit(x)
            else:
                model, _ = fit_hmm_range(
                    seqs, states, min_states=min_states, max_states=max_states
                )
            if save and coordinates is not None:
                os.makedirs(os.path.dirname(_model_path()), exist_ok=True)
                with open(_model_path(), "wb") as f:
                    pickle.dump([model], f)
        out = {
            k: pd.DataFrame(model.predict_proba(s)) for k, s in seqs.items()
        }

    return TableDict(
        out, typ="unsupervised_counts", table_path=embeddings._table_path,
        animal_ids=embeddings._animal_ids,
        exp_conditions=embeddings._exp_conditions,
    )
