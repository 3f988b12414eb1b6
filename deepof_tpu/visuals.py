"""Visualization layer: the plot_* / export_* public surface.

Behavioral spec: deepof/visuals.py (26 public functions, :80-4961) —
heatmaps, Gantt charts, enrichment, transitions, FSTTC associations,
stationary entropy, embeddings, embedding-quality panels, training metrics,
skeleton animation, cluster-detector performance, SHAP swarms, annotated
videos, between-condition distances, behavior trends, and ROI interaction
summaries. Everything shares the time-binning engine in visuals_utils.

Rendering is matplotlib; all device math (distances, assignments) happens
upstream, so these stay thin.
"""

from __future__ import annotations

import os
import warnings
from itertools import combinations
from typing import Any, Dict, List, Optional, Tuple, Union

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

import deepof_tpu.posthoc as posthoc
import deepof_tpu.visuals_utils as vu
from deepof_tpu.core.storage import get_dt
from deepof_tpu.core.table_dict import TableDict
from deepof_tpu.evaluation import (
    compute_compactness,
    compute_knn_agreement,
    compute_separability_logreg,
)


def _maybe_save(fig, save, default_name: str):
    if save:
        path = save if isinstance(save, str) else f"{default_name}.png"
        fig.savefig(path, bbox_inches="tight")
    return fig


def _conditions_of(coordinates, keys, exp_condition: str = None):
    """Per-key condition labels; ``exp_condition`` picks which condition
    column to group by when experiments carry several
    (visuals.py:979-1050 exp_condition handling)."""
    conds = {}
    exp = coordinates._exp_conditions or {}
    for k in keys:
        c = exp.get(k)
        if hasattr(c, "iloc"):
            if exp_condition is not None:
                assert exp_condition in c.columns, (
                    f"{exp_condition!r} not among condition columns "
                    f"{list(c.columns)}"
                )
                c = str(c[exp_condition].iloc[0])
            else:
                c = str(c.iloc[0, 0])
        conds[k] = str(c)
    return conds


# --------------------------------------------------------------------------- #
# Position plots
# --------------------------------------------------------------------------- #


def plot_heatmaps(
    coordinates,
    bodyparts: List[str],
    center: str = "arena",
    align: str = None,
    exp_condition: str = None,
    condition_value: str = None,
    display_arena: bool = True,
    experiment_id: str = "average",
    bin_size=None,
    bin_index=None,
    precomputed_bins=None,
    samples_max: int = 20000,
    save: bool = False,
    dpi: int = 100,
    ax: Any = None,
    **kwargs,
):
    """2D occupancy heatmaps per bodypart (visuals.py:80-246)."""
    coords = coordinates.get_coords(center=center, align=align)
    bin_info = vu.preprocess_time_bins(
        coordinates, bin_size, bin_index, precomputed_bins,
        samples_max=samples_max,
    )
    keys = (
        list(coords.keys()) if experiment_id == "average" else [experiment_id]
    )
    if condition_value is not None:
        conds = _conditions_of(coordinates, keys)
        keys = [k for k in keys if conds[k] == str(condition_value)]

    stacked = pd.concat([coords[k].iloc[bin_info[k]] for k in keys], axis=0)
    own_fig = ax is None
    if own_fig:
        fig, ax = plt.subplots(dpi=dpi)
    else:
        fig = ax.figure
    vu.heatmap(stacked, bodyparts, title=f"{experiment_id}", ax=ax, **kwargs)
    if display_arena:
        vu.plot_arena(coordinates, center, "#ffffff", ax, experiment_id)
    return _maybe_save(fig, save, "heatmaps")


# --------------------------------------------------------------------------- #
# Gantt
# --------------------------------------------------------------------------- #


def plot_gantt(
    coordinates,
    experiment_id: str,
    soft_counts: TableDict = None,
    supervised_annotations: TableDict = None,
    behaviors: List[str] = None,
    bin_size=None,
    bin_index=None,
    precomputed_bins=None,
    save: bool = False,
    ax: Any = None,
    **kwargs,
):
    """Behavior/cluster occurrence Gantt chart for one experiment.

    When both soft_counts and supervised_annotations are given, renders
    stacked panels sharing the time axis (the reference's multi-panel
    gantt machinery, visuals.py:346-978 _plot_experiment_gantt /
    gantt_plotter).
    """
    bin_info = vu.preprocess_time_bins(
        coordinates, bin_size, bin_index, precomputed_bins,
        experiment_id=experiment_id, samples_max=None,
    )
    rng = bin_info[experiment_id]

    def supervised_series():
        tab = pd.DataFrame(get_dt(supervised_annotations, experiment_id)).iloc[rng]
        names = behaviors or [
            c for c in tab.columns
            if not any(s in str(c) for s in ("speed", "distance"))
        ]
        series = {b: (tab[b] > 0.1).to_numpy() for b in names}
        return series, vu.get_behavior_colors(names, coordinates._animal_ids)

    def cluster_series():
        counts = np.asarray(get_dt(soft_counts, experiment_id))[rng]
        hard = counts.argmax(axis=1)
        clusters = sorted(np.unique(hard))
        series = {f"Cluster {c}": hard == c for c in clusters}
        cmap = plt.get_cmap("tab20")
        return series, [
            matplotlib.colors.to_hex(cmap(i % 20)) for i in range(len(clusters))
        ]

    panels = []
    if soft_counts is not None:
        panels.append(("unsupervised clusters",) + cluster_series())
    if supervised_annotations is not None:
        panels.append(("supervised behaviors",) + supervised_series())
    assert panels, "pass soft_counts and/or supervised_annotations"

    own_fig = ax is None
    if own_fig:
        heights = [0.4 * len(series) + 1 for _, series, _ in panels]
        fig, axes = plt.subplots(
            len(panels), 1, figsize=(10, sum(heights)), sharex=True,
            gridspec_kw={"height_ratios": heights}, squeeze=False,
        )
        axes = axes[:, 0]
    else:
        fig = ax.figure
        axes = np.atleast_1d(ax)
        assert len(axes) >= len(panels), "need one axis per panel"

    for panel_ax, (title, series, colors) in zip(axes, panels):
        for i, (name, mask) in enumerate(series.items()):
            starts, ends = vu.contiguous_segments(mask)
            for seg_s, seg_e in zip(starts, ends):
                panel_ax.barh(
                    i, (seg_e - seg_s) / coordinates._frame_rate,
                    left=seg_s / coordinates._frame_rate,
                    color=colors[i % len(colors)], height=0.8,
                )
        panel_ax.set_yticks(range(len(series)))
        panel_ax.set_yticklabels(list(series.keys()))
        panel_ax.set_title(title if len(panels) > 1 else experiment_id)
    axes[len(panels) - 1].set_xlabel("time (s)")
    if len(panels) > 1:
        fig.suptitle(experiment_id)
    return _maybe_save(fig, save, "gantt")


def gantt_plotter(
    coordinates,
    gantt_matrix: np.ndarray,
    plot_type: str,
    instance_id: str,
    n_available_instances: int,
    instances_to_plot: list,
    colors: list,
    behavior_mode: bool = False,
    bin_info: dict = None,
    bin_indices: np.ndarray = None,
    additional_checkpoints=None,
    signal_overlay=None,
    ax: Any = None,
    save: bool = False,
):
    """Low-level gantt renderer over a precomputed occurrence matrix —
    the reference's helper under plot_gantt (visuals.py:768): one barh
    lane per instance (behavior or experiment), optional changepoint
    vlines and a continuous signal overlay on a twin axis.

    Args:
        gantt_matrix: (n_instances, T) binary occurrence matrix.
        plot_type: "supervised" | "unsupervised" (title framing only).
        instance_id: experiment (behavior_mode=False) or behavior name.
        n_available_instances / instances_to_plot: lane bookkeeping.
        colors: one hex color per plotted instance.
        bin_indices: frame indices plotted (defaults to all columns).
        additional_checkpoints: DataFrame/array of frame indices drawn as
            dashed vlines (changepoints).
        signal_overlay: pd.Series drawn on a twin y-axis.
    """
    gantt_matrix = np.atleast_2d(np.asarray(gantt_matrix))
    frame_origin = 0
    if bin_indices is not None:
        idx = np.asarray(bin_indices, int)
        gantt_matrix = gantt_matrix[:, idx]
        # keep bars on the ABSOLUTE time axis so checkpoint vlines and the
        # signal overlay (both absolute-frame artists) stay aligned.
        frame_origin = int(idx[0]) if len(idx) else 0
    frame_rate = float(coordinates._frame_rate)

    own_fig = ax is None
    if own_fig:
        fig, ax = plt.subplots(
            figsize=(10, 0.4 * len(instances_to_plot) + 1)
        )
    else:
        fig = ax.figure

    for i, name in enumerate(instances_to_plot):
        mask = gantt_matrix[i] > 0
        starts, ends = vu.contiguous_segments(mask)
        for seg_s, seg_e in zip(starts, ends):
            ax.barh(
                i, (seg_e - seg_s) / frame_rate,
                left=(seg_s + frame_origin) / frame_rate,
                color=colors[i % len(colors)], height=0.8,
            )
    if additional_checkpoints is not None:
        pts = np.asarray(additional_checkpoints).reshape(-1)
        for p in pts[np.isfinite(pts.astype(float))]:
            ax.axvline(float(p) / frame_rate, ls="--", lw=0.8, color="k")
    if signal_overlay is not None:
        twin = ax.twinx()
        sig = np.asarray(signal_overlay, float)
        twin.plot(np.arange(len(sig)) / frame_rate, sig, lw=0.8, color="0.3")
        twin.set_ylabel(getattr(signal_overlay, "name", "") or "signal")
    ax.set_yticks(range(len(instances_to_plot)))
    ax.set_yticklabels([str(n) for n in instances_to_plot])
    ax.set_xlabel("time (s)")
    ax.set_title(
        f"{plot_type} gantt — {instance_id}"
        + (f" ({len(instances_to_plot)}/{n_available_instances})"
           if n_available_instances else "")
    )
    return _maybe_save(fig, save, "gantt")


# --------------------------------------------------------------------------- #
# Enrichment and trends
# --------------------------------------------------------------------------- #


def plot_enrichment(
    coordinates,
    embeddings: TableDict = None,
    soft_counts: TableDict = None,
    supervised_annotations: TableDict = None,
    exp_condition: str = None,
    roi_number: int = None,
    animals_in_roi: list = None,
    roi_mode: str = "mousewise",
    bin_size=None,
    bin_index=None,
    precomputed_bins=None,
    normalize: bool = True,
    add_stats: str = "Mann-Whitney",
    verbose: bool = False,
    save: bool = False,
    ax: Any = None,
    **kwargs,
):
    """Boxplots of cluster/behavior usage per condition with pairwise
    significance markers (visuals.py:979-1477)."""
    bin_info = vu.preprocess_time_bins(
        coordinates, bin_size, bin_index, precomputed_bins, samples_max=None,
        tab_dict_for_binning=(supervised_annotations or soft_counts),
    )
    if roi_number is not None:
        if animals_in_roi is None:
            animals_in_roi = list(coordinates._animal_ids or [""])
        bin_info = vu.apply_rois_to_bin_info(
            coordinates, roi_number, bin_info
        )
    source = supervised_annotations or soft_counts or embeddings
    cond_map = _conditions_of(
        coordinates, list(source.keys()), exp_condition=exp_condition
    )
    counters = posthoc.enrichment_across_conditions(
        embedding=embeddings,
        soft_counts=soft_counts,
        supervised_annotations=supervised_annotations,
        exp_conditions=cond_map,
        bin_info=bin_info,
        normalize=normalize,
        roi_number=roi_number,
        animals_in_roi=animals_in_roi,
        roi_mode=roi_mode,
    )
    own_fig = ax is None
    if own_fig:
        fig, ax = plt.subplots(figsize=(12, 5))
    else:
        fig = ax.figure
    clusters = sorted(counters["cluster"].unique(), key=str)
    conditions = sorted(counters["exp condition"].unique())
    width = 0.8 / max(len(conditions), 1)
    stats = {}
    for ci, cond in enumerate(conditions):
        sub = counters[counters["exp condition"] == cond]
        pos, vals = [], []
        for ki, cl in enumerate(clusters):
            v = sub[sub["cluster"] == cl]["time on cluster"].to_numpy()
            pos.append(ki + ci * width)
            vals.append(v)
        bp = ax.boxplot(
            vals, positions=pos, widths=width * 0.9, patch_artist=True,
            manage_ticks=False,
        )
        color = plt.get_cmap("tab10")(ci)
        for box in bp["boxes"]:
            box.set_facecolor(color)
    if add_stats and len(conditions) == 2:
        from scipy.stats import mannwhitneyu, ttest_ind

        ymax = counters["time on cluster"].max()
        for ki, cl in enumerate(clusters):
            a = counters[
                (counters["exp condition"] == conditions[0])
                & (counters["cluster"] == cl)
            ]["time on cluster"]
            b = counters[
                (counters["exp condition"] == conditions[1])
                & (counters["cluster"] == cl)
            ]["time on cluster"]
            if len(a) > 1 and len(b) > 1:
                try:
                    if add_stats == "Mann-Whitney":
                        p = mannwhitneyu(a, b).pvalue
                    else:
                        p = ttest_ind(a, b, equal_var=False).pvalue
                except ValueError:
                    p = np.nan
                stats[cl] = p
                if np.isfinite(p) and p < 0.05:
                    # statannotations-style bracket + Cohen's d
                    # (visuals_utils.py:875).
                    y = max(a.max(), b.max()) + 0.03 * ymax
                    vu.add_significance_bracket(
                        ax, ki, ki + width, y, p,
                        effect_size=vu.cohens_d(a, b),
                    )
    ax.set_xticks(np.arange(len(clusters)) + width * (len(conditions) - 1) / 2)
    ax.set_xticklabels([str(c) for c in clusters], rotation=45, ha="right")
    ax.set_ylabel("time on cluster" + (" (fraction)" if normalize else ""))
    handles = [
        matplotlib.patches.Patch(color=plt.get_cmap("tab10")(i), label=c)
        for i, c in enumerate(conditions)
    ]
    ax.legend(handles=handles)
    if verbose and stats:
        print(stats)
    return _maybe_save(fig, save, "enrichment")


def plot_behavior_trends(
    coordinates,
    embeddings: TableDict = None,
    soft_counts: TableDict = None,
    supervised_annotations: TableDict = None,
    behavior: str = None,
    polar_depiction: bool = False,
    n_time_bins: int = 24,
    error_bars: str = "sem",
    normalize: bool = True,
    save: bool = False,
    ax: Any = None,
    **kwargs,
):
    """Behavior occurrence over consecutive time bins, per condition
    (visuals.py:4093-4515)."""
    source = supervised_annotations if supervised_annotations is not None else soft_counts
    lengths = {k: len(np.asarray(get_dt(source, k))) for k in source.keys()}
    pairs = vu.build_valid_multibins(
        lengths, n_time_bins, kwargs.pop("custom_time_bins", None)
    )
    conds = _conditions_of(coordinates, list(source.keys()))

    rows = []
    for key in source.keys():
        tab = np.asarray(get_dt(source, key))
        for bi, (lo, hi) in enumerate(pairs):
            seg = tab[lo:hi]
            if supervised_annotations is not None:
                cols = list(get_dt(source, key).columns)
                j = cols.index(behavior)
                val = float(np.nanmean(seg[:, j] > 0.1))
            else:
                hard = seg.argmax(axis=1)
                val = float(np.mean(hard == int(behavior)))
            rows.append({"exp id": key, "bin": bi, "value": val,
                         "condition": conds[key]})
    df = pd.DataFrame(rows)

    mean_values, error_values, conditions = vu.process_df(
        df, error_bars=error_bars
    )
    if not normalize:
        scale = np.array([hi - lo for lo, hi in pairs], float)
        mean_values = {c: m * scale for c, m in mean_values.items()}
        error_values = {c: e * scale for c, e in error_values.items()}
    geom = vu.get_binned_geometry([hi - lo for lo, hi in pairs])
    fig, ax, _created = vu.ensure_axis(ax, polar_depiction)

    if polar_depiction:
        handles = vu.plot_binned_groups(
            ax, geom["centers"], mean_values, error_values, conditions,
        )
        vu.add_polar_bin_labels(ax, geom)
    else:
        handles = {}
        for i, cond in enumerate(conditions):
            handles[cond] = vu.plot_binned_line(
                ax, np.arange(len(pairs)), mean_values[cond],
                yerr=error_values[cond], color=f"C{i}", label=str(cond),
            )
    max_val = float(np.nanmax([np.nanmax(m) for m in mean_values.values()]))
    vu.format_time_binned_axis(
        ax, geom, polar_depiction, max_val,
        title=str(behavior), xlabel="time bin", ylabel="occurrence",
    )
    vu.annotate_binwise_stats(
        ax, vu.binwise_group_tests(df), geom=geom,
        polar_depiction=polar_depiction,
    )
    vu.add_binned_legends(ax, handles, polar_depiction=polar_depiction)
    return _maybe_save(fig, save, "behavior_trends")


# --------------------------------------------------------------------------- #
# Transitions / entropy
# --------------------------------------------------------------------------- #


def return_transitions(
    coordinates,
    soft_counts: TableDict = None,
    supervised_annotations: TableDict = None,
    bin_size=None,
    bin_index=None,
    precomputed_bins=None,
    exp_condition: str = None,
    roi_number: int = None,
    animals_in_roi: list = None,
    silence_diagonal: bool = False,
    normalize: bool = True,
    delta_T: float = 0.0,
    diagonal_behavior_counting: str = "Transitions",
    **kwargs,
):
    """Per-condition transition matrices for cluster sequences or
    supervised behavior tables (visuals.py:1479-1534); with roi_number,
    out-of-ROI frames are excluded from the counts."""
    source = (
        supervised_annotations if supervised_annotations is not None
        else soft_counts
    )
    bin_info = vu.preprocess_time_bins(
        coordinates, bin_size, bin_index, precomputed_bins,
        tab_dict_for_binning=source, samples_max=None,
    )
    if roi_number is not None:
        if animals_in_roi is None:
            animals_in_roi = list(coordinates._animal_ids or [""])
        bin_info = vu.apply_rois_to_bin_info(
            coordinates, roi_number, bin_info
        )
    conds = _conditions_of(
        coordinates, list(source.keys()), exp_condition=exp_condition
    )
    if supervised_annotations is not None:
        from deepof_tpu.utils import count_transitions

        mats, _, _ = count_transitions(
            supervised_annotations, conds, bin_info=bin_info,
            animals_in_roi=animals_in_roi if roi_number is not None else None,
            delta_T=delta_T, frame_rate=coordinates._frame_rate,
            silence_diagonal=silence_diagonal, aggregate=True,
            normalize=normalize,
            diagonal_behavior_counting=diagonal_behavior_counting,
        )
        return mats
    mats = posthoc.compute_transition_matrix_per_condition(
        soft_counts, conds, silence_diagonal=silence_diagonal,
        bin_info=bin_info, aggregate=True, normalize=normalize,
        roi_number=roi_number, animals_in_roi=animals_in_roi,
    )
    return mats


def plot_transitions(
    coordinates,
    soft_counts: TableDict = None,
    supervised_annotations: TableDict = None,
    bin_size=None,
    bin_index=None,
    precomputed_bins=None,
    visualization: str = "heatmaps",
    silence_diagonal: bool = False,
    save: bool = False,
    **kwargs,
):
    """Transition matrices as heatmaps or directed graphs
    (visuals.py:1536-1721)."""
    mats = return_transitions(
        coordinates, soft_counts, supervised_annotations,
        bin_size, bin_index, precomputed_bins,
        silence_diagonal=silence_diagonal, **kwargs,
    )
    n = len(mats)
    fig, axes = plt.subplots(1, n, figsize=(5 * n, 4), squeeze=False)
    for ax, (cond, mat) in zip(axes[0], mats.items()):
        if visualization == "networks":
            import networkx as nx

            g = nx.from_numpy_array(mat, create_using=nx.DiGraph)
            pos = nx.circular_layout(g)
            weights = [5 * g[u][v]["weight"] for u, v in g.edges]
            nx.draw(
                g, pos, ax=ax, with_labels=True, width=weights,
                node_color="lightblue",
            )
        else:
            im = ax.imshow(mat, cmap="viridis")
            fig.colorbar(im, ax=ax)
        ax.set_title(str(cond))
    return _maybe_save(fig, save, "transitions")


def plot_stationary_entropy(
    coordinates,
    soft_counts: TableDict,
    bin_size=None,
    bin_index=None,
    precomputed_bins=None,
    save: bool = False,
    ax: Any = None,
    **kwargs,
):
    """Entropy of the per-condition steady-state distributions
    (visuals.py:2126-2291)."""
    mats = return_transitions(
        coordinates, soft_counts, bin_size=bin_size, bin_index=bin_index,
        precomputed_bins=precomputed_bins,
    )
    entropy = posthoc.compute_steady_state(mats, return_entropy=True)
    own_fig = ax is None
    if own_fig:
        fig, ax = plt.subplots()
    else:
        fig = ax.figure
    ax.bar(list(map(str, entropy.keys())), list(entropy.values()))
    ax.set_ylabel("stationary entropy (nats)")
    return _maybe_save(fig, save, "entropy")


# --------------------------------------------------------------------------- #
# Associations (FSTTC)
# --------------------------------------------------------------------------- #


def count_all_events(supervised_annotations: TableDict) -> pd.DataFrame:
    """Bout counts per behavior per experiment (visuals.py:1723-1828)."""
    rows = {}
    for key in supervised_annotations.keys():
        tab = pd.DataFrame(get_dt(supervised_annotations, key))
        counts = {}
        for col in tab.columns:
            if any(s in str(col) for s in ("speed", "distance")):
                continue
            starts, _ = vu.contiguous_segments((tab[col] > 0.1).to_numpy())
            counts[col] = len(starts)
        rows[key] = counts
    return pd.DataFrame(rows).T.fillna(0)


def plot_associations(
    coordinates,
    supervised_annotations: TableDict,
    behaviors: List[str] = None,
    frame_rate: float = None,
    delta_T: float = 2.0,
    association_metric: str = "fsttc",
    save: bool = False,
    ax: Any = None,
    **kwargs,
):
    """Pairwise temporal association (FSTTC / Yule's Q) between behaviors
    (visuals.py:1830-2124)."""
    frame_rate = frame_rate or coordinates._frame_rate
    first = pd.DataFrame(get_dt(supervised_annotations, list(supervised_annotations.keys())[0]))
    if behaviors is None:
        behaviors = [
            c for c in first.columns
            if not any(s in str(c) for s in ("speed", "distance", "missing"))
        ]
    n = len(behaviors)
    mat = np.zeros((n, n))
    counts = np.zeros((n, n))
    for key in supervised_annotations.keys():
        tab = pd.DataFrame(get_dt(supervised_annotations, key))
        for i, a in enumerate(behaviors):
            for j, b in enumerate(behaviors):
                if i == j:
                    continue
                if association_metric == "fsttc":
                    v = vu.calculate_FSTTC(
                        tab[a] > 0.1, tab[b] > 0.1, frame_rate, delta_T
                    )
                else:
                    v = vu.calculate_simple_association(
                        tab[a] > 0.1, tab[b] > 0.1, frame_rate
                    )
                if np.isfinite(v):
                    mat[i, j] += v
                    counts[i, j] += 1
    mat = np.divide(mat, counts, out=np.zeros_like(mat), where=counts > 0)
    own_fig = ax is None
    if own_fig:
        fig, ax = plt.subplots(figsize=(1 + 0.5 * n, 1 + 0.5 * n))
    else:
        fig = ax.figure
    im = ax.imshow(mat, cmap="coolwarm", vmin=-1, vmax=1)
    ax.set_xticks(range(n))
    ax.set_xticklabels(behaviors, rotation=90)
    ax.set_yticks(range(n))
    ax.set_yticklabels(behaviors)
    fig.colorbar(im, ax=ax)
    return _maybe_save(fig, save, "associations")


# --------------------------------------------------------------------------- #
# Embeddings
# --------------------------------------------------------------------------- #


def plot_embeddings(
    coordinates,
    embeddings: TableDict = None,
    soft_counts: TableDict = None,
    supervised_annotations: TableDict = None,
    aggregate_experiments: str = None,
    exp_condition: str = None,
    projection: str = "pca",
    bin_size=None,
    bin_index=None,
    precomputed_bins=None,
    samples_max: int = 5000,
    save: bool = False,
    ax: Any = None,
    **kwargs,
):
    """2D scatter of chunk embeddings (colored by cluster) or of
    aggregated per-experiment embeddings (colored by condition)
    (visuals.py:2421-2862). ``projection``: "pca" | "umap" | "tsne".
    """
    from sklearn.decomposition import PCA

    def reduce_2d(arr):
        if projection == "pca":
            return PCA(n_components=2).fit_transform(arr)
        if projection == "tsne":
            from sklearn.manifold import TSNE

            perp = float(min(30, max(2, len(arr) - 1)))
            return TSNE(n_components=2, perplexity=perp).fit_transform(arr)
        if projection == "umap":
            try:
                import umap as umap_lib
            except ImportError as e:  # pragma: no cover
                raise ImportError(
                    "projection='umap' requires the optional 'umap-learn' "
                    "package; use 'pca' or 'tsne' instead."
                ) from e
            return umap_lib.UMAP(n_components=2).fit_transform(arr)
        raise ValueError(f"Unknown projection {projection!r}")

    own_fig = ax is None
    if own_fig:
        fig, ax = plt.subplots()
    else:
        fig = ax.figure

    if aggregate_experiments:
        agg = posthoc.get_aggregated_embedding(
            embeddings, agg=aggregate_experiments,
        )
        reduced = reduce_2d(agg.to_numpy(float))
        conds = _conditions_of(
            coordinates, list(agg.index), exp_condition=exp_condition
        )
        for cond in sorted(set(conds.values())):
            sel = [i for i, k in enumerate(agg.index) if conds[k] == cond]
            ax.scatter(reduced[sel, 0], reduced[sel, 1], label=cond, s=60)
        ax.legend()
    else:
        chunks, labels = [], []
        for key in embeddings.keys():
            emb = np.asarray(get_dt(embeddings, key))
            sc = np.asarray(get_dt(soft_counts, key)) if soft_counts else None
            chunks.append(emb)
            labels.append(
                sc.argmax(axis=1) if sc is not None else np.zeros(len(emb))
            )
        x = np.concatenate(chunks)
        y = np.concatenate(labels)
        if len(x) > samples_max:
            idx = np.random.default_rng(0).choice(len(x), samples_max, replace=False)
            x, y = x[idx], y[idx]
        reduced = reduce_2d(x)
        scat = ax.scatter(reduced[:, 0], reduced[:, 1], c=y, cmap="tab20", s=4)
        fig.colorbar(scat, ax=ax, label="cluster")
    ax.set_xlabel(f"{projection.upper()} 1")
    ax.set_ylabel(f"{projection.upper()} 2")
    return _maybe_save(fig, save, "embeddings")


def return_embedding_evaluation(
    embeddings: TableDict,
    supervised_annotations: TableDict,
    behaviors: List[str] = None,
    window_size: int = None,
) -> pd.DataFrame:
    """Compactness / separability / kNN-agreement per behavior
    (visuals.py:2864-2906 over deepof/utils.py:4122-4255)."""
    from deepof_tpu.utils import natural_sorted

    embs, sups = [], []
    for key in embeddings.keys():
        emb = np.asarray(get_dt(embeddings, key))
        sup = pd.DataFrame(get_dt(supervised_annotations, key))
        if window_size is None:
            window_size = len(sup) - len(emb) + 1
        center = window_size // 2
        aligned = sup.iloc[center : center + len(emb)].reset_index(drop=True)
        m = min(len(emb), len(aligned))
        embs.append(emb[:m])
        sups.append(aligned.iloc[:m])
    z = np.concatenate(embs)
    sup = pd.concat(sups, axis=0).reset_index(drop=True)
    if behaviors is None:
        behaviors = [
            c for c in sup.columns
            if not any(s in str(c) for s in ("speed", "distance"))
        ]
    rows = {}
    for b in behaviors:
        y = (sup[b] > 0.5).to_numpy()
        if y.sum() < 2:
            continue
        row = {}
        row.update(compute_compactness(z[y], z))
        row.update(compute_separability_logreg(z, y))
        row.update(compute_knn_agreement(z, y))
        rows[b] = row
    return pd.DataFrame(rows).T


def plot_embedding_evaluation(
    embeddings: TableDict,
    supervised_annotations: TableDict,
    behaviors: List[str] = None,
    save: bool = False,
    ax: Any = None,
    **kwargs,
):
    """Bar panel of the embedding-quality metrics (visuals.py:2908-3000)."""
    df = return_embedding_evaluation(embeddings, supervised_annotations, behaviors)
    metrics = ["trace_cov_pos_norm_global", "ap_mean", "pos_knn_agree_mean"]
    fig, axes = plt.subplots(1, len(metrics), figsize=(5 * len(metrics), 4))
    for ax_i, metric in zip(np.atleast_1d(axes), metrics):
        if metric in df.columns:
            df[metric].plot.bar(ax=ax_i)
        ax_i.set_title(metric)
    return _maybe_save(fig, save, "embedding_evaluation")


def plot_training_metrics(log_summary: dict, save: bool = False) -> Any:
    """Loss curves from a training history dict (visuals.py:3001-3108)."""
    fig, ax = plt.subplots(figsize=(8, 4))
    for key, values in (log_summary or {}).items():
        if isinstance(values, (list, np.ndarray)) and len(np.atleast_1d(values)) > 1:
            ax.plot(values, label=key)
    ax.set_xlabel("epoch")
    ax.legend(fontsize=7)
    return _maybe_save(fig, save, "training_metrics")


# --------------------------------------------------------------------------- #
# Skeleton animation
# --------------------------------------------------------------------------- #


def animate_skeleton(
    coordinates,
    experiment_id: str,
    animal_id: str = None,
    center: str = "arena",
    frame_limit: int = 250,
    cluster_assignments=None,
    save: Optional[str] = None,
    dpi: int = 100,
    **kwargs,
):
    """Matplotlib animation of the moving skeleton (visuals.py:3110-3519)."""
    from matplotlib.animation import FuncAnimation

    coords = coordinates.get_coords_at_key(
        key=experiment_id, scale=coordinates._scales[experiment_id],
        center=center, selected_id=animal_id,
    )
    nodes = sorted({c[0] for c in coords.columns})
    edges = [
        (a, b) for (a, b) in coordinates._body_graph.edge_names
        if a in nodes and b in nodes
    ]
    n_frames = min(frame_limit, len(coords))

    fig, ax = plt.subplots(dpi=dpi)
    x_all = coords.loc[:, (slice(None), "x")].to_numpy(float)
    y_all = coords.loc[:, (slice(None), "y")].to_numpy(float)
    ax.set_xlim(np.nanmin(x_all), np.nanmax(x_all))
    ax.set_ylim(np.nanmin(y_all), np.nanmax(y_all))
    ax.invert_yaxis()

    scat = ax.scatter([], [], s=15)
    lines = [ax.plot([], [], "k-", lw=1)[0] for _ in edges]
    title = ax.set_title("")

    def frame(i):
        pts = np.array([[coords[(n, "x")].iloc[i], coords[(n, "y")].iloc[i]] for n in nodes])
        scat.set_offsets(pts)
        for line, (a, b) in zip(lines, edges):
            line.set_data(
                [coords[(a, "x")].iloc[i], coords[(b, "x")].iloc[i]],
                [coords[(a, "y")].iloc[i], coords[(b, "y")].iloc[i]],
            )
        label = f"{experiment_id} frame {i}"
        if cluster_assignments is not None and i < len(cluster_assignments):
            label += f" | cluster {int(cluster_assignments[i])}"
        title.set_text(label)
        return [scat, *lines, title]

    anim = FuncAnimation(fig, frame, frames=n_frames, interval=1000 / coordinates._frame_rate)
    if save:
        anim.save(save, dpi=dpi)
    return anim


# --------------------------------------------------------------------------- #
# Detector performance / SHAP
# --------------------------------------------------------------------------- #


def _balanced_accuracy_from_cm(cm: np.ndarray, cluster_index: int) -> float:
    """((TP/(TP+FN)) + (TN/(TN+FP))) / 2 for one cluster of a confusion
    matrix (visuals.py:3588-3601)."""
    tp = cm[cluster_index, cluster_index]
    fp = cm[:, cluster_index].sum() - tp
    fn = cm[cluster_index, :].sum() - tp
    tn = cm.sum() - tp - fp - fn
    return float(((tp / (tp + fn)) + (tn / (tn + fp))) / 2)


def plot_cluster_detection_performance(
    coordinates,
    chunk_stats: pd.DataFrame,
    cluster_gbm_performance: dict,
    hard_counts: np.ndarray,
    groups: list,
    save: bool = False,
    visualization: str = "confusion_matrix",
    ax: Any = None,
    **kwargs,
):
    """Per-fold confusion matrix or balanced-accuracy bars for the
    cross-validated cluster detectors (visuals.py:3521-3659).

    Consumes the (cluster_gbm_performance, groups) output of
    posthoc.train_supervised_cluster_detectors: each fold's estimator is
    evaluated on its held-out chunks, and the fold confusion matrices are
    summed (confusion_matrix view) or per-cluster balanced accuracies
    plotted with their spread (balanced_accuracy view).
    """
    from sklearn.metrics import confusion_matrix

    hard_values = (
        hard_counts.values if hasattr(hard_counts, "values") else np.asarray(hard_counts)
    )
    labels = np.unique(hard_values)
    n_clusters = len(labels)
    confusion_matrices = [
        confusion_matrix(
            hard_values[fold[1]],
            clf.predict(chunk_stats.values[fold[1]]),
            labels=labels,
        )
        for clf, fold in zip(cluster_gbm_performance["estimator"], groups)
    ]

    own_fig = ax is None
    if own_fig:
        fig, ax = plt.subplots(figsize=(10, 10))
    else:
        fig = ax.figure

    cluster_names = [f"cluster {i}" for i in sorted(set(np.asarray(hard_values)))]
    if visualization == "confusion_matrix":
        from scipy.cluster.hierarchy import dendrogram, linkage

        cm = np.stack(confusion_matrices).sum(axis=0).astype(float)
        cm = cm / cm.sum(axis=1)[:, np.newaxis]
        cm = pd.DataFrame(cm, index=cluster_names, columns=cluster_names)
        # reorder rows/columns so similar clusters sit together
        order = dendrogram(
            linkage(cm, method="average", metric="euclidean"), no_plot=True
        )["leaves"]
        cm = cm.iloc[order, order]
        im = ax.imshow(cm.to_numpy(), cmap="Blues")
        ax.set_xticks(range(n_clusters), cm.columns, rotation=90)
        ax.set_yticks(range(n_clusters), cm.index)
        for i in range(n_clusters):
            for j in range(n_clusters):
                ax.text(j, i, f"{cm.iloc[i, j]:.2f}", ha="center", va="center",
                        fontsize=8)
        fig.colorbar(im, ax=ax)
        ax.set_title("Confusion matrix for multiclass state prediction")
    elif visualization == "balanced_accuracy":
        per_cluster = np.array(
            [
                [_balanced_accuracy_from_cm(cm, c) for cm in confusion_matrices]
                for c in range(n_clusters)
            ]
        )
        means = per_cluster.mean(axis=1)
        ax.bar(range(n_clusters), means, color="#5b8db8")
        for c in range(n_clusters):
            ax.scatter(
                np.full(per_cluster.shape[1], c), per_cluster[c],
                color="black", s=12, zorder=3,
            )
        ax.axhline(1 / n_clusters, linestyle="--", color="black")
        ax.set_ylim(0, 1)
        ax.set_xticks(range(n_clusters), [str(c) for c in range(n_clusters)])
        ax.set_xlabel("Cluster")
        ax.set_ylabel("Balanced accuracy")
        ax.set_title("Supervised cluster mapping performance")
    else:
        raise ValueError(
            "visualization should be 'confusion_matrix' or 'balanced_accuracy'"
        )
    return _maybe_save(fig, save, "cluster_detection")


def plot_shap_swarm_per_cluster(
    coordinates,
    chunk_stats: pd.DataFrame,
    shap_values,
    cluster: Union[int, str] = "all",
    max_display: int = 10,
    save: bool = False,
    **kwargs,
):
    """SHAP beeswarm per cluster (visuals.py:3661-3711). Uses the shap
    package's summary_plot when installed; otherwise the self-contained
    beeswarm/bar fallback in deepof_tpu.shap_kernel."""
    if cluster != "all":
        shap_values = shap_values[int(cluster)]
    try:  # pragma: no cover - optional accelerated backend
        from deepof_tpu.utils import import_optional

        shap = import_optional("shap")

        shap.summary_plot(
            shap_values, chunk_stats, max_display=max_display, show=False
        )
        fig = plt.gcf()
    except ImportError:
        from deepof_tpu.shap_kernel import summary_beeswarm

        fig = summary_beeswarm(
            shap_values, chunk_stats, max_display=max_display, show=False
        )
    return _maybe_save(fig, save, "shap_swarm")


# --------------------------------------------------------------------------- #
# Condition distances / supervised summary
# --------------------------------------------------------------------------- #


def plot_distance_between_conditions(
    coordinates,
    embeddings: TableDict,
    soft_counts: TableDict,
    exp_condition: str = None,
    embedding_aggregation_method: str = "median",
    distance_metric: str = "wasserstein",
    n_jobs: int = 1,
    save: bool = False,
    ax: Any = None,
    **kwargs,
):
    """Condition separability across a growing time window, with the
    reference's optimal-bin overlay (visuals.py:3932-4091).

    Procedure: (1) growing-window scan starting at 10x the frame rate in
    frames, stepping one frame-rate; (2) Savitzky-Golay smooth the curve
    and take its argmax + 10 as the optimal bin size in seconds; (3)
    re-scan per-bin at that size; (4) plot the growing-window curve in
    grey with the per-bin points on top.

    Repo extensions via kwargs: ``metric``/``agg`` alias the reference's
    ``distance_metric``/``embedding_aggregation_method``; ``start_bin``/
    ``step_bin`` (frames) override the frame-rate-derived scan defaults,
    which tiny demo recordings need.
    """
    from deepof_tpu.core.storage import get_dt as _get_dt

    distance_metric = kwargs.pop("metric", distance_metric)
    embedding_aggregation_method = kwargs.pop("agg", embedding_aggregation_method)
    frame_rate = float(getattr(coordinates, "_frame_rate", 25) or 25)
    min_len = int(min(
        len(np.asarray(_get_dt(soft_counts, key))) for key in soft_counts.keys()
    ))
    start_bin = kwargs.pop("start_bin", None) or int(np.round(10 * frame_rate))
    step_bin = kwargs.pop("step_bin", None) or int(np.round(frame_rate))
    start_bin = min(start_bin, max(min_len - step_bin, 1))
    kwargs.pop("scan_mode", None)

    conds = {
        key: (
            str(val[exp_condition].values[0])
            if exp_condition is not None and hasattr(val, "columns")
            else (str(val.iloc[0, 0]) if hasattr(val, "iloc") else str(val))
        )
        for key, val in (coordinates._exp_conditions or {}).items()
    }

    distance_array = posthoc.condition_distance_binning(
        embeddings, soft_counts, conds,
        start_bin, min_len, step_bin,
        agg=embedding_aggregation_method, metric=distance_metric,
        n_jobs=n_jobs,
    )

    # Optimal bin: argmax of the smoothed growing-window curve, in
    # seconds (visuals.py:3986). Savitzky-Golay needs >10 samples; fall
    # back to the raw argmax on short demo scans.
    if len(distance_array) > 10:
        from scipy.signal import savgol_filter

        smoothed = savgol_filter(distance_array, 10, 2)
    else:
        smoothed = distance_array
    optimal_bin = int(np.argmax(smoothed)) + 10

    distance_per_bin = posthoc.condition_distance_binning(
        embeddings, soft_counts, conds,
        start_bin, min_len,
        max(min(int(np.round(optimal_bin * frame_rate)), min_len), 1),
        scan_mode="per-bin",
        agg=embedding_aggregation_method, metric=distance_metric,
        n_jobs=n_jobs,
    )

    own_fig = ax is None
    if own_fig:
        fig, ax = plt.subplots()
    else:
        fig = ax.figure
    t_grow = np.linspace(10, min_len, len(distance_array)) / frame_rate
    ax.plot(t_grow, distance_array, color="#d6dbd2", label="growing window")
    if len(distance_per_bin):
        t_bin = np.concatenate(
            [optimal_bin * np.arange(1, len(distance_per_bin)),
             [min_len / frame_rate]]
        )
        ax.plot(t_bin, distance_per_bin, color="#0b7189", zorder=100)
        ax.scatter(
            t_bin, distance_per_bin, color="#0b7189", s=200,
            linewidth=1, zorder=100,
        )
    ax.set_xlabel("Time")
    ax.set_ylabel(distance_metric)
    if own_fig:
        ax.set_title("deepOF - distance between conditions")
    return _maybe_save(fig, save, "condition_distance")


def return_supervised_summary(
    coordinates, supervised_annotations: TableDict
) -> pd.DataFrame:
    """Per-experiment behavior summary table (visuals.py:4961-5108)."""
    rows = {}
    for key in supervised_annotations.keys():
        tab = pd.DataFrame(get_dt(supervised_annotations, key))
        summary = {}
        for col in tab.columns:
            if any(s in str(col) for s in ("speed", "distance")):
                summary[f"{col}_mean"] = float(np.nanmean(tab[col]))
            else:
                summary[f"{col}_fraction"] = float(np.nanmean(tab[col] > 0.1))
        rows[key] = summary
    return pd.DataFrame(rows).T


# --------------------------------------------------------------------------- #
# ROI interaction
# --------------------------------------------------------------------------- #


def get_roi_data(
    coordinates, roi_number: int, experiment_id: str, animal_id: str = None,
    in_roi_criterion: str = "Center",
):
    """Boolean in-ROI mask for one experiment/animal (visuals.py:4868-4959)."""
    import jax.numpy as jnp

    from deepof_tpu.ops import point_in_polygon

    aid = animal_id if animal_id is not None else coordinates._animal_ids[0]
    crit = f"{aid}{'_' if aid else ''}{in_roi_criterion}"
    base = np.array(coordinates._tables[experiment_id], dtype=np.float64)
    ci = coordinates._nodes.index(crit)
    roi = np.asarray(coordinates._roi_dicts[experiment_id][roi_number])
    return np.asarray(point_in_polygon(jnp.asarray(base[:, ci]), roi))


def return_mouse_roi_interaction(
    coordinates, roi_number: int = 1, in_roi_criterion: str = "Center",
) -> pd.DataFrame:
    """Fraction of time each animal spends inside the ROI per experiment
    (visuals.py:4519-4612)."""
    rows = {}
    for key in coordinates._tables.keys():
        row = {}
        for aid in coordinates._animal_ids:
            inside = get_roi_data(coordinates, roi_number, key, aid, in_roi_criterion)
            row[aid or "animal"] = float(np.mean(inside))
        rows[key] = row
    return pd.DataFrame(rows).T


def plot_mouse_roi_interaction(
    coordinates, roi_number: int = 1, save: bool = False, ax: Any = None, **kwargs
):
    """Bar chart of ROI occupancy per animal/experiment
    (visuals.py:4614-4866)."""
    df = return_mouse_roi_interaction(coordinates, roi_number)
    own_fig = ax is None
    if own_fig:
        fig, ax = plt.subplots()
    else:
        fig = ax.figure
    df.plot.bar(ax=ax)
    ax.set_ylabel(f"fraction of time in ROI {roi_number}")
    return _maybe_save(fig, save, "roi_interaction")


def plot_normative_log_likelihood(
    coordinates,
    embeddings: TableDict,
    normative_model,
    save: bool = False,
    ax: Any = None,
    **kwargs,
):
    """Per-experiment log-likelihood under the normative GMM
    (visuals.py:2293-2419)."""
    agg = posthoc.get_aggregated_embedding(embeddings)
    scores = posthoc.score_against_normative(normative_model, agg)
    conds = _conditions_of(coordinates, list(scores.index))
    own_fig = ax is None
    if own_fig:
        fig, ax = plt.subplots()
    else:
        fig = ax.figure
    for ci, cond in enumerate(sorted(set(conds.values()))):
        vals = [scores[k] for k in scores.index if conds[k] == cond]
        ax.scatter([ci] * len(vals), vals, label=cond)
    ax.set_xticks(range(len(set(conds.values()))))
    ax.set_xticklabels(sorted(set(conds.values())))
    ax.set_ylabel("normative log-likelihood")
    return _maybe_save(fig, save, "normative_ll")


def export_annotated_video(coordinates, *args, **kwargs):
    """Delegates to deepof_tpu.export_video (visuals.py:3713-3930)."""
    from deepof_tpu.export_video import output_annotated_video

    return output_annotated_video(coordinates, *args, **kwargs)
