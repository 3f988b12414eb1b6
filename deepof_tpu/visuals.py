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
    display_rois: bool = False,
    experiment_id: str = "average",
    bin_size=None,
    bin_index=None,
    precomputed_bins=None,
    start_marker: str = None,
    samples_max: int = 20000,
    roi_number: int = None,
    animals_in_roi: list = None,
    in_roi_criterion: str = "Center",
    invert_roi: bool = False,
    xlim: Tuple[float, float] = None,
    ylim: Tuple[float, float] = None,
    save: bool = False,
    dpi: int = 100,
    ax: Any = None,
    show: bool = False,
    **kwargs,
):
    """2D occupancy heatmaps per bodypart (visuals.py:80-246).

    ``roi_number`` restricts the occupancy to frames where the requested
    animals' ``in_roi_criterion`` bodypart lies inside (or outside, with
    ``invert_roi``) the ROI; ``display_rois`` overlays the ROI polygons
    (only meaningful without centering/alignment, like the arena
    overlay). ``xlim``/``ylim`` fix the axis extents.
    """
    from deepof_tpu.utils import get_behavior_frames_in_roi

    if roi_number is not None and animals_in_roi is None:
        animals_in_roi = list(coordinates._animal_ids or [""])
    coords = coordinates.get_coords(center=center, align=align)
    bin_info_time = vu.preprocess_time_bins(
        coordinates, bin_size, bin_index, precomputed_bins,
        start_marker=start_marker, samples_max=samples_max,
    )
    bin_info = vu.apply_rois_to_bin_info(
        coordinates, roi_number, bin_info_time, in_roi_criterion,
        invert_roi=invert_roi,
    )
    keys = (
        list(coords.keys()) if experiment_id == "average" else [experiment_id]
    )
    if condition_value is not None:
        conds = _conditions_of(coordinates, keys, exp_condition=exp_condition)
        keys = [k for k in keys if conds[k] == str(condition_value)]

    parts = []
    for k in keys:
        rng = bin_info[k]["time"]
        if roi_number is not None:
            rng = get_behavior_frames_in_roi(None, bin_info[k], animals_in_roi)
        parts.append(coords[k].iloc[rng])
    stacked = pd.concat(parts, axis=0)
    own_fig = ax is None
    if own_fig:
        fig, ax = plt.subplots(dpi=dpi)
    else:
        fig = ax.figure
    vu.heatmap(stacked, bodyparts, title=f"{experiment_id}", ax=ax, **kwargs)
    if display_arena:
        vu.plot_arena(coordinates, center, "#ffffff", ax, experiment_id)
    if display_rois and getattr(coordinates, "_roi_dicts", None):
        roi_key = keys[0] if experiment_id != "average" else list(coords.keys())[0]
        for poly in (coordinates._roi_dicts.get(roi_key) or {}).values():
            poly = np.asarray(poly, float)
            ax.plot(
                np.append(poly[:, 0], poly[0, 0]),
                np.append(poly[:, 1], poly[0, 1]),
                color="#ffffff", linestyle=":", linewidth=1.5,
            )
    if xlim is not None:
        ax.set_xlim(xlim)
    if ylim is not None:
        ax.set_ylim(ylim)
    if show:  # pragma: no cover — interactive display
        plt.show()
    return _maybe_save(fig, save, "heatmaps")


# --------------------------------------------------------------------------- #
# Gantt
# --------------------------------------------------------------------------- #


def plot_gantt(
    coordinates,
    instance_id: str = None,
    soft_counts: TableDict = None,
    supervised_annotations: TableDict = None,
    behaviors: List[str] = None,
    bin_size=None,
    bin_index=None,
    precomputed_bins=None,
    start_marker: str = None,
    samples_max: int = 20000,
    roi_number: int = None,
    animals_in_roi: list = None,
    roi_mode: str = "mousewise",
    in_roi_criterion: str = "Center",
    invert_roi: bool = False,
    additional_checkpoints=None,
    signal_overlay: pd.Series = None,
    instances_to_plot: List[str] = None,
    save: bool = False,
    ax: Any = None,
    experiment_id: str = None,
    **kwargs,
):
    """Behavior/cluster occurrence Gantt chart (visuals.py:248-978).

    ``instance_id`` routes like the reference: an experiment id renders
    that experiment's behaviors/clusters as rows; a behavior (or
    ``Cluster_i``) name renders one row per experiment showing where that
    behavior occurs. ``instances_to_plot`` restricts the rows (behaviors
    in the first mode, experiments in the second). ``experiment_id`` is
    kept as a repo alias for the first mode. With both soft_counts and
    supervised_annotations in experiment mode, stacked panels share the
    time axis. ``additional_checkpoints`` frame positions draw dashed
    vlines; ``signal_overlay`` draws a continuous trace on a twin axis.
    """
    from deepof_tpu.utils import (
        get_supervised_behaviors_in_roi,
        get_unsupervised_behaviors_in_roi,
    )

    instance_id = instance_id if instance_id is not None else experiment_id
    assert instance_id is not None, "pass instance_id (experiment or behavior)"
    experiment_mode = instance_id in coordinates._tables.keys()
    source = (
        supervised_annotations if supervised_annotations is not None
        else soft_counts
    )
    assert source is not None, "pass soft_counts and/or supervised_annotations"

    bin_info_time = vu.preprocess_time_bins(
        coordinates, bin_size, bin_index, precomputed_bins,
        experiment_id=instance_id if experiment_mode else None,
        start_marker=start_marker, samples_max=samples_max,
        tab_dict_for_binning=source,
    )
    roi_bin_info = vu.apply_rois_to_bin_info(
        coordinates, roi_number, bin_info_time, in_roi_criterion,
        invert_roi=invert_roi,
    )

    frame_rate = coordinates._frame_rate

    def supervised_series(key, names=None):
        # Masks are positional over rng (the possibly strided/offset bin
        # index array); rng is returned so rendering can map positions
        # back to ABSOLUTE frame indices — bars, checkpoint vlines and the
        # signal overlay must share one time origin.
        rng = np.asarray(roi_bin_info[key]["time"])
        tab = pd.DataFrame(get_dt(supervised_annotations, key)).iloc[rng]
        if roi_number is not None:
            tab = get_supervised_behaviors_in_roi(
                tab, roi_bin_info[key], animals_in_roi, roi_mode
            )
        names = names or [
            c for c in tab.columns
            if not any(s in str(c) for s in ("speed", "distance"))
        ]
        series = {b: (tab[b].fillna(0) > 0.1).to_numpy() for b in names}
        return series, vu.get_behavior_colors(names, coordinates._animal_ids), rng

    def cluster_series(key, names=None):
        rng = np.asarray(roi_bin_info[key]["time"])
        counts = np.asarray(get_dt(soft_counts, key))[rng]
        hard = counts.argmax(axis=1).astype(float)
        if roi_number is not None:
            hard = get_unsupervised_behaviors_in_roi(
                hard, roi_bin_info[key], animals_in_roi
            )
        clusters = sorted(int(c) for c in np.unique(hard) if c >= 0)
        series = {f"Cluster {c}": hard == c for c in clusters}
        if names:
            wanted = {str(n).replace("_", " ") for n in names}
            series = {k: v for k, v in series.items() if k in wanted}
        cmap = plt.get_cmap("tab20")
        return series, [
            matplotlib.colors.to_hex(cmap(i % 20)) for i in range(len(series))
        ], rng

    panels = []  # (title, {row: (mask, frame_index_array)}, colors)
    if experiment_mode:
        wanted = instances_to_plot or behaviors
        if soft_counts is not None:
            s, colors, rng = cluster_series(instance_id, wanted)
            panels.append(
                ("unsupervised clusters",
                 {k: (v, rng) for k, v in s.items()}, colors)
            )
        if supervised_annotations is not None:
            s, colors, rng = supervised_series(instance_id, wanted)
            panels.append(
                ("supervised behaviors",
                 {k: (v, rng) for k, v in s.items()}, colors)
            )
    else:
        # behavior mode: one row per experiment for this behavior; each
        # experiment keeps its OWN bin index array.
        keys = instances_to_plot or list(source.keys())
        series, colors = {}, []
        cmap = plt.get_cmap("tab20")
        for i, key in enumerate(keys):
            if supervised_annotations is not None:
                s, _, rng = supervised_series(key, [instance_id])
            else:
                s, _, rng = cluster_series(
                    key, [str(instance_id).replace("_", " ")]
                )
                if not s:  # accept "Cluster_3" or "Cluster 3"
                    s = {str(instance_id): np.zeros(0, bool)}
            mask = next(iter(s.values())) if s else np.zeros(0, bool)
            series[key] = (mask, rng)
            colors.append(matplotlib.colors.to_hex(cmap(i % 20)))
        panels.append((str(instance_id), series, colors))
    assert panels and any(len(s) for _, s, _ in panels), "nothing to plot"

    own_fig = ax is None
    if own_fig:
        heights = [0.4 * len(series) + 1 for _, series, _ in panels]
        fig, axes = plt.subplots(
            len(panels), 1, figsize=(10, sum(heights)), sharex=True,
            gridspec_kw={"height_ratios": heights}, squeeze=False,
        )
        axes = axes[:, 0]
    else:
        fig = ax.figure if not isinstance(ax, (list, np.ndarray)) else np.atleast_1d(ax)[0].figure
        axes = np.atleast_1d(ax)
        assert len(axes) >= len(panels), "need one axis per panel"

    for panel_ax, (title, series, colors) in zip(axes, panels):
        panel_rng = None
        for i, (name, (mask, rng)) in enumerate(series.items()):
            panel_rng = rng if panel_rng is None else panel_rng
            starts, ends = vu.contiguous_segments(mask)
            for seg_s, seg_e in zip(starts, ends):
                # Positional segments map back to ABSOLUTE frame indices
                # through rng, so bars share the time origin with the
                # checkpoint vlines and the signal overlay even when the
                # bin is offset (bin_index > 0) or strided (samples_max
                # downsampling).
                f0 = rng[seg_s]
                f1 = rng[seg_e - 1] + 1
                panel_ax.barh(
                    i, (f1 - f0) / frame_rate,
                    left=f0 / frame_rate,
                    color=colors[i % len(colors)], height=0.8,
                )
        panel_ax.set_yticks(range(len(series)))
        panel_ax.set_yticklabels(list(series.keys()))
        panel_ax.set_title(title if len(panels) > 1 else str(instance_id))
        if additional_checkpoints is not None:
            marks = np.asarray(additional_checkpoints, float).ravel()
            for m in marks[np.isfinite(marks)]:
                panel_ax.axvline(
                    m / frame_rate, color="k", linestyle="--", linewidth=1,
                )
        if signal_overlay is not None:
            twin = panel_ax.twinx()
            sig = np.asarray(signal_overlay, float)
            if panel_rng is not None and len(panel_rng):
                # Slice to the plotted bin and place at absolute time.
                in_sig = panel_rng[panel_rng < len(sig)]
                twin.plot(
                    in_sig / frame_rate, sig[in_sig],
                    color="#555555", alpha=0.6, linewidth=1,
                )
            else:
                twin.plot(
                    np.arange(len(sig)) / frame_rate, sig,
                    color="#555555", alpha=0.6, linewidth=1,
                )
            twin.set_ylabel(getattr(signal_overlay, "name", "") or "signal")
    axes[len(panels) - 1].set_xlabel("time (s)")
    if len(panels) > 1:
        fig.suptitle(str(instance_id))
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
    exp_condition_order: list = None,
    roi_number: int = None,
    animals_in_roi: list = None,
    roi_mode: str = "mousewise",
    in_roi_criterion: str = "Center",
    invert_roi: bool = False,
    bin_size=None,
    bin_index=None,
    precomputed_bins=None,
    start_marker: str = None,
    samples_max: int = None,
    normalize: bool = True,
    plot_speed: bool = False,
    polar_depiction: bool = False,
    add_stats: str = "Mann-Whitney",
    verbose: bool = False,
    save: bool = False,
    ax: Any = None,
    **kwargs,
):
    """Boxplots of cluster/behavior usage per condition with pairwise
    significance markers (visuals.py:979-1477).

    ``plot_speed`` switches the supervised mode to per-animal speed
    distributions; ``exp_condition_order`` fixes the condition ordering;
    ``polar_depiction`` renders on a polar axis like the reference's
    radial variant.
    """
    bin_info = vu.preprocess_time_bins(
        coordinates, bin_size, bin_index, precomputed_bins,
        samples_max=samples_max, start_marker=start_marker,
        tab_dict_for_binning=(supervised_annotations or soft_counts),
    )
    if roi_number is not None:
        if animals_in_roi is None:
            animals_in_roi = list(coordinates._animal_ids or [""])
        bin_info = vu.apply_rois_to_bin_info(
            coordinates, roi_number, bin_info, in_roi_criterion,
            invert_roi=invert_roi,
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
        plot_speed=plot_speed,
        roi_number=roi_number,
        animals_in_roi=animals_in_roi,
        roi_mode=roi_mode,
    )
    own_fig = ax is None
    if own_fig:
        fig, ax, _ = vu.ensure_axis(None, polar_depiction=polar_depiction)
        if not polar_depiction:
            fig.set_size_inches(12, 5)
    else:
        fig = ax.figure
    clusters = sorted(counters["cluster"].unique(), key=str)
    conditions = sorted(counters["exp condition"].unique())
    if exp_condition_order:
        order = [str(c) for c in exp_condition_order]
        assert set(order) == set(map(str, conditions)), (
            f"exp_condition_order must be a permutation of {conditions}"
        )
        conditions = order
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
    start_marker: str = None,
    samples_max: int = None,
    exp_condition: str = None,
    roi_number: int = None,
    animals_in_roi: list = None,
    in_roi_criterion: str = "Center",
    invert_roi: bool = False,
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
        tab_dict_for_binning=source, start_marker=start_marker,
        samples_max=samples_max,
    )
    if roi_number is not None:
        if animals_in_roi is None:
            animals_in_roi = list(coordinates._animal_ids or [""])
        bin_info = vu.apply_rois_to_bin_info(
            coordinates, roi_number, bin_info, in_roi_criterion,
            invert_roi=invert_roi,
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
    ax: Any = None,
    **kwargs,
):
    """Transition matrices as heatmaps or directed graphs
    (visuals.py:1536-1721). ``ax`` may be one axis or a list with one
    axis per condition."""
    mats = return_transitions(
        coordinates, soft_counts, supervised_annotations,
        bin_size, bin_index, precomputed_bins,
        silence_diagonal=silence_diagonal, **kwargs,
    )
    n = len(mats)
    if ax is None:
        fig, axes = plt.subplots(1, n, figsize=(5 * n, 4), squeeze=False)
        axes = axes[0]
    else:
        axes = np.atleast_1d(ax)
        fig = axes[0].figure
    for ax, (cond, mat) in zip(axes, mats.items()):
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
    embeddings: TableDict = None,
    bin_size=None,
    bin_index=None,
    precomputed_bins=None,
    start_marker: str = None,
    samples_max: int = None,
    exp_condition: str = None,
    roi_number: int = None,
    animals_in_roi: list = None,
    in_roi_criterion: str = "Center",
    invert_roi: bool = False,
    save: bool = False,
    ax: Any = None,
    **kwargs,
):
    """Entropy of the per-condition steady-state distributions
    (visuals.py:2126-2291). ``embeddings`` is accepted for reference
    signature compatibility; the entropy only needs the soft counts."""
    mats = return_transitions(
        coordinates, soft_counts, bin_size=bin_size, bin_index=bin_index,
        precomputed_bins=precomputed_bins, start_marker=start_marker,
        samples_max=samples_max, exp_condition=exp_condition,
        roi_number=roi_number, animals_in_roi=animals_in_roi,
        in_roi_criterion=in_roi_criterion, invert_roi=invert_roi,
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


def count_all_events(
    coordinates=None,
    supervised_annotations: TableDict = None,
    soft_counts: TableDict = None,
    bin_size=None,
    bin_index=None,
    precomputed_bins=None,
    start_marker: str = None,
    samples_max: int = 20000,
    roi_number: int = None,
    animals_in_roi: list = None,
    in_roi_criterion: str = "Center",
    invert_roi: bool = False,
    counting_mode: str = "Events",
) -> pd.DataFrame:
    """Event/frame/time/transition counts per behavior per experiment
    (visuals.py:1723-1828).

    Accepts exactly one of ``supervised_annotations`` / ``soft_counts``
    (clusters count via their per-frame argmax as ``Cluster_i`` columns),
    the shared time-binning and ROI parameters, and the reference's four
    counting modes ("Frames" / "Time" / "Events" / "Transitions").
    """
    from deepof_tpu.utils import count_events, get_behavior_frames_in_roi

    modes = ["Frames", "Time", "Events", "Transitions"]
    if counting_mode not in modes:
        raise ValueError(
            f'"counting_mode" needs to be one of {modes}'
        )
    if (supervised_annotations is None) == (soft_counts is None):
        raise ValueError(
            "Need either supervised_annotations or soft_counts, not both "
            "or neither!"
        )
    tab_dict = supervised_annotations if supervised_annotations is not None else soft_counts
    frame_rate = float(getattr(coordinates, "_frame_rate", 1) or 1)
    if roi_number is not None and animals_in_roi is None:
        animals_in_roi = list(coordinates._animal_ids or [""])

    bin_info = None
    if coordinates is not None:
        bin_info_time = vu.preprocess_time_bins(
            coordinates, bin_size, bin_index, precomputed_bins,
            start_marker=start_marker, tab_dict_for_binning=tab_dict,
            samples_max=samples_max, down_sample=False,
        )
        bin_info = vu.apply_rois_to_bin_info(
            coordinates, roi_number, bin_info_time, in_roi_criterion,
            invert_roi=invert_roi,
        )

    from deepof_tpu.core.storage import get_dt_rows

    results = {}
    for key in tab_dict.keys():
        load_range = None
        if bin_info is not None:
            load_range = bin_info[key]["time"]
            if len(bin_info[key]) > 1:
                load_range = get_behavior_frames_in_roi(
                    None, bin_info[key], animals_in_roi
                )
        tab = get_dt_rows(tab_dict, key, load_range)
        if not isinstance(tab, pd.DataFrame):
            arr = np.asarray(tab)
            hard = np.zeros_like(arr, dtype=int)
            hard[np.arange(len(arr)), arr.argmax(axis=1)] = 1
            tab = pd.DataFrame(
                hard, columns=[f"Cluster_{i}" for i in range(arr.shape[1])]
            )
        counts = {}
        for col in tab.columns:
            series = tab[col].fillna(0)
            if (series > 1.0001).any():  # continuous columns (speed etc.)
                continue
            counts[col] = count_events(
                series, counting_mode=counting_mode, frame_rate=frame_rate
            )
        results[key] = pd.Series(counts)
    return pd.DataFrame.from_dict(results, orient="index")


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
    start_marker: str = None,
    samples_max: int = 5000,
    samples: int = None,
    roi_number: int = None,
    animals_in_roi: list = None,
    roi_mode: str = "mousewise",
    in_roi_criterion: str = "Center",
    invert_roi: bool = False,
    min_confidence: float = 0.0,
    colour_by: str = "cluster",
    normative_model=None,
    add_stats: str = None,
    show_aggregated_density: bool = False,
    umap_random_state: int = None,
    verbose: bool = False,
    save: bool = False,
    ax: Any = None,
    **kwargs,
):
    """2D scatter of chunk embeddings (colored by cluster, condition, or
    video) or of aggregated per-experiment embeddings (colored by
    condition) (visuals.py:2421-2862). ``projection``: "pca" | "umap" |
    "tsne".

    ``min_confidence`` drops chunks whose max soft count is below the
    threshold; ``normative_model`` (a fitted KDE from
    :func:`deepof_tpu.posthoc.fit_normative_global_model`) colors the
    aggregated points by normative log-likelihood, with ``add_stats``
    running a Mann-Whitney test between the condition score groups;
    ``show_aggregated_density`` overlays a Gaussian-KDE contour.
    """
    from sklearn.decomposition import PCA

    samples_max = samples if samples is not None else samples_max

    def reduce_2d(arr):
        if projection == "pca":
            return PCA(n_components=2).fit_transform(arr)
        if projection == "tsne":
            from sklearn.manifold import TSNE

            perp = float(min(30, max(2, len(arr) - 1)))
            return TSNE(n_components=2, perplexity=perp).fit_transform(arr)
        if projection == "umap":
            try:
                from deepof_tpu.utils import import_optional

                umap_lib = import_optional("umap")  # stub-rejecting
            except ImportError as e:  # pragma: no cover
                raise ImportError(
                    "projection='umap' requires the optional 'umap-learn' "
                    "package; use 'pca' or 'tsne' instead."
                ) from e
            return umap_lib.UMAP(
                n_components=2, random_state=umap_random_state
            ).fit_transform(arr)
        raise ValueError(f"Unknown projection {projection!r}")

    bin_info = vu.preprocess_time_bins(
        coordinates, bin_size, bin_index, precomputed_bins,
        start_marker=start_marker, samples_max=None,
        tab_dict_for_binning=embeddings,
    )
    roi_bin_info = vu.apply_rois_to_bin_info(
        coordinates, roi_number, bin_info, in_roi_criterion,
        invert_roi=invert_roi,
    )

    own_fig = ax is None
    if own_fig:
        fig, ax = plt.subplots()
    else:
        fig = ax.figure

    if aggregate_experiments:
        agg = posthoc.get_aggregated_embedding(
            embeddings, agg=aggregate_experiments, bin_info=roi_bin_info,
            roi_number=roi_number, animals_in_roi=animals_in_roi,
            roi_mode=roi_mode,
        )
        reduced = reduce_2d(agg.to_numpy(float))
        conds = _conditions_of(
            coordinates, list(agg.index), exp_condition=exp_condition
        )
        if normative_model is not None:
            scores = posthoc.score_against_normative(normative_model, agg)
            scat = ax.scatter(
                reduced[:, 0], reduced[:, 1], c=scores.to_numpy(),
                cmap="viridis", s=60,
            )
            fig.colorbar(scat, ax=ax, label="normative log-likelihood")
            if add_stats:
                from scipy.stats import mannwhitneyu

                groups = {}
                for k, c in conds.items():
                    groups.setdefault(c, []).append(float(scores[k]))
                if len(groups) == 2:
                    (ga, gb) = groups.values()
                    try:
                        p = mannwhitneyu(ga, gb).pvalue
                        ax.set_title(f"normative scores: MWU p={p:.3g}")
                    except ValueError:
                        pass
        else:
            for cond in sorted(set(conds.values())):
                sel = [i for i, k in enumerate(agg.index) if conds[k] == cond]
                ax.scatter(reduced[sel, 0], reduced[sel, 1], label=cond, s=60)
            ax.legend()
        if show_aggregated_density and len(reduced) > 3:
            from scipy.stats import gaussian_kde

            try:
                kde = gaussian_kde(reduced.T)
                gx, gy = np.meshgrid(
                    np.linspace(*ax.get_xlim(), 60),
                    np.linspace(*ax.get_ylim(), 60),
                )
                dens = kde(np.vstack([gx.ravel(), gy.ravel()])).reshape(gx.shape)
                ax.contour(gx, gy, dens, levels=5, alpha=0.4, colors="grey")
            except np.linalg.LinAlgError:  # degenerate spread
                pass
    else:
        chunks, labels, videos = [], [], []
        for vi, key in enumerate(embeddings.keys()):
            rng = roi_bin_info[key]["time"]
            emb = np.asarray(get_dt(embeddings, key, load_range=rng))
            sc = (
                np.asarray(get_dt(soft_counts, key, load_range=rng))
                if soft_counts else None
            )
            if sc is not None and min_confidence:
                keep = sc.max(axis=1) >= min_confidence
                emb, sc = emb[keep], sc[keep]
            chunks.append(emb)
            labels.append(
                sc.argmax(axis=1) if sc is not None else np.zeros(len(emb))
            )
            videos.append(np.full(len(emb), vi))
        x = np.concatenate(chunks)
        if colour_by == "exp_condition":
            conds = _conditions_of(
                coordinates, list(embeddings.keys()), exp_condition=exp_condition
            )
            names = sorted(set(conds.values()))
            per_key = np.array(
                [names.index(conds[k]) for k in embeddings.keys()]
            )
            y = per_key[np.concatenate(videos).astype(int)]
            label = "condition"
        elif colour_by == "video":
            y = np.concatenate(videos)
            label = "video"
        else:
            y = np.concatenate(labels)
            label = "cluster"
        if len(x) > samples_max:
            idx = np.random.default_rng(0).choice(len(x), samples_max, replace=False)
            x, y = x[idx], y[idx]
        reduced = reduce_2d(x)
        scat = ax.scatter(reduced[:, 0], reduced[:, 1], c=y, cmap="tab20", s=4)
        fig.colorbar(scat, ax=ax, label=label)
    ax.set_xlabel(f"{projection.upper()} 1")
    ax.set_ylabel(f"{projection.upper()} 2")
    return _maybe_save(fig, save, "embeddings")


def return_embedding_evaluation(
    coordinates=None,
    embeddings: TableDict = None,
    supervised_annotations: TableDict = None,
    include_behaviors: List[str] = None,
    window_size: int = None,
    alignment_mode: str = "any",
    minimum_number_of_positives: int = 200,
    normalize: bool = True,
    random_state: int = 0,
    behaviors: List[str] = None,
) -> pd.DataFrame:
    """Compactness / separability / kNN-agreement per binary behavior
    (visuals.py:2864-2906 over deepof/utils.py:4122-4255).

    ``alignment_mode``: "center" labels each embedding window by its
    central frame; "any" labels it positive when the behavior occurs in
    any window frame. ``minimum_number_of_positives`` skips rare
    behaviors; ``normalize`` divides AP and kNN agreement by the positive
    rate (chance level), like the reference. ``behaviors`` is a repo
    alias of ``include_behaviors``; ``coordinates`` is accepted for
    reference signature parity (metrics only need the tables). Calls
    with the old repo layout (embeddings first) are detected and
    re-shuffled.
    """
    if coordinates is not None and hasattr(coordinates, "keys") and not hasattr(
        coordinates, "_tables"
    ):
        # legacy repo call: (embeddings, supervised_annotations, ...)
        coordinates, embeddings, supervised_annotations, include_behaviors = (
            None, coordinates, embeddings, supervised_annotations
            if isinstance(supervised_annotations, list) else include_behaviors,
        )
    include_behaviors = include_behaviors or behaviors
    assert alignment_mode in ("any", "center"), (
        'alignment_mode must be "any" or "center"'
    )

    embs, sups = [], []
    for key in embeddings.keys():
        emb = np.asarray(get_dt(embeddings, key))
        sup = pd.DataFrame(get_dt(supervised_annotations, key))
        if window_size is None:
            window_size = len(sup) - len(emb) + 1
        if alignment_mode == "center":
            center = window_size // 2
            aligned = sup.iloc[center : center + len(emb)].reset_index(drop=True)
        else:  # any: window positive if the behavior occurs in any frame
            arr = sup.to_numpy(float)
            w = max(window_size, 1)
            windows = np.lib.stride_tricks.sliding_window_view(arr, (w,), axis=0)
            binary = np.nanmax(windows, axis=2)
            cont = np.nanmean(windows, axis=2)
            is_binary = np.nanmax(arr, axis=0) <= 1.0001
            aligned = pd.DataFrame(
                np.where(is_binary[None, :], binary, cont), columns=sup.columns
            )
        m = min(len(emb), len(aligned))
        embs.append(emb[:m])
        sups.append(aligned.iloc[:m])
    z = np.concatenate(embs)
    sup = pd.concat(sups, axis=0).reset_index(drop=True)
    if include_behaviors is None:
        include_behaviors = [
            c for c in sup.columns
            if not any(s in str(c) for s in ("speed", "distance"))
        ]
    rows = {}
    for b in include_behaviors:
        y = (sup[b] > 0.5).to_numpy()
        if y.sum() < max(minimum_number_of_positives, 2):
            continue
        row = {}
        row.update(compute_compactness(z[y], z))
        row.update(compute_separability_logreg(z, y, seed=random_state))
        row.update(compute_knn_agreement(z, y))
        if normalize:
            rate = float(y.mean())
            for k in list(row):
                if k.startswith("ap") or "knn" in k:
                    row[k] = row[k] / rate if rate > 0 else np.nan
        rows[b] = row
    return pd.DataFrame(rows).T


def plot_embedding_evaluation(
    coordinates=None,
    embeddings: TableDict = None,
    supervised_annotations: TableDict = None,
    include_behaviors: List[str] = None,
    window_size: int = None,
    alignment_mode: str = "any",
    minimum_number_of_positives: int = 200,
    normalize: bool = True,
    random_state: int = 0,
    behaviors: List[str] = None,
    save: bool = False,
    ax: Any = None,
    **kwargs,
):
    """Bar panel of the embedding-quality metrics (visuals.py:2908-3000)."""
    df = return_embedding_evaluation(
        coordinates, embeddings, supervised_annotations,
        include_behaviors=include_behaviors or behaviors,
        window_size=window_size, alignment_mode=alignment_mode,
        minimum_number_of_positives=minimum_number_of_positives,
        normalize=normalize, random_state=random_state,
    )
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
    embeddings: TableDict = None,
    soft_counts: TableDict = None,
    bin_size=None,
    bin_index=None,
    precomputed_bins=None,
    start_marker: str = None,
    samples_max: int = 20000,
    roi_number: int = None,
    animals_in_roi=None,
    in_roi_criterion: str = "Center",
    invert_roi: bool = False,
    animal_id: str = None,
    center: str = "arena",
    align: str = None,
    sampling_rate: float = None,
    min_confidence: float = 0.0,
    min_bout_duration: int = None,
    selected_cluster: int = None,
    display_arena: bool = True,
    legend: bool = True,
    umap_random_state: int = 0,
    frame_limit: int = 250,
    cluster_assignments=None,
    save: Optional[str] = None,
    dpi: int = 100,
    **kwargs,
):
    """Matplotlib animation of the moving skeleton (visuals.py:3110-3519).

    Reference surface: frames come from the shared time-binning engine
    (with start markers, ROI filtering and downsampling); with
    ``soft_counts`` each frame is labeled by its hard cluster, and
    ``selected_cluster`` + ``min_confidence`` + ``min_bout_duration``
    restrict the animation to confident bouts of one cluster. With
    ``embeddings``, a second panel animates the 2D-reduced latent
    trajectory (PCA; deterministic — ``umap_random_state`` is accepted
    for signature parity and seeds the reduction when umap is used).
    ``frame_limit`` is a repo extension bounding the rendered frames.
    """
    from matplotlib.animation import FuncAnimation

    from deepof_tpu.utils import get_behavior_frames_in_roi

    coords = coordinates.get_coords_at_key(
        key=experiment_id, scale=coordinates._scales[experiment_id],
        center=center, align=align if align else False,
        selected_id=animal_id,
    )
    bin_info_time = vu.preprocess_time_bins(
        coordinates, bin_size, bin_index, precomputed_bins,
        experiment_id=experiment_id, start_marker=start_marker,
        samples_max=samples_max,
    )
    roi_bin_info = vu.apply_rois_to_bin_info(
        coordinates, roi_number, bin_info_time, in_roi_criterion,
        invert_roi=invert_roi,
    )
    frames_idx = roi_bin_info[experiment_id]["time"]
    if roi_number is not None:
        if animals_in_roi is None:
            animals_in_roi = list(coordinates._animal_ids or [""])
        frames_idx = get_behavior_frames_in_roi(
            None, roi_bin_info[experiment_id], animals_in_roi
        )
    frames_idx = np.asarray(frames_idx)
    frames_idx = frames_idx[frames_idx < len(coords)]

    hard = conf = None
    if soft_counts is not None:
        sc = np.asarray(get_dt(soft_counts, experiment_id))
        hard = sc.argmax(axis=1)
        conf = sc.max(axis=1)
        if cluster_assignments is None:
            cluster_assignments = hard
    if selected_cluster is not None and hard is not None:
        valid = np.zeros(len(hard), bool)
        in_range = frames_idx[frames_idx < len(hard)]
        valid[in_range] = True
        mask = valid & (hard == int(selected_cluster)) & (conf >= min_confidence)
        if min_bout_duration:
            starts, ends = vu.contiguous_segments(mask)
            for s, e in zip(starts, ends):
                if e - s < min_bout_duration:
                    mask[s:e] = False
        frames_idx = np.where(mask)[0]

    nodes = sorted({c[0] for c in coords.columns})
    edges = [
        (a, b) for (a, b) in coordinates._body_graph.edge_names
        if a in nodes and b in nodes
    ]
    frames_idx = frames_idx[: frame_limit if frame_limit else None]
    n_frames = len(frames_idx)
    assert n_frames > 0, "no frames left after filtering"

    emb2d = None
    if embeddings is not None:
        from sklearn.decomposition import PCA

        emb = np.asarray(get_dt(embeddings, experiment_id))
        emb2d = (
            PCA(n_components=2, random_state=umap_random_state)
            .fit_transform(emb)
        )

    if emb2d is not None:
        fig, (ax, ax_emb) = plt.subplots(1, 2, figsize=(11, 5), dpi=dpi)
    else:
        fig, ax = plt.subplots(dpi=dpi)
        ax_emb = None
    x_all = coords.loc[:, (slice(None), "x")].to_numpy(float)
    y_all = coords.loc[:, (slice(None), "y")].to_numpy(float)
    ax.set_xlim(np.nanmin(x_all), np.nanmax(x_all))
    ax.set_ylim(np.nanmin(y_all), np.nanmax(y_all))
    ax.invert_yaxis()
    if display_arena and center == "arena":
        try:
            vu.plot_arena(coordinates, center, "#999999", ax, experiment_id)
        except Exception:  # arena overlay is cosmetic; never kill the render
            pass

    scat = ax.scatter([], [], s=15)
    lines = [ax.plot([], [], "k-", lw=1)[0] for _ in edges]
    title = ax.set_title("")
    artists = [scat, *lines, title]
    if ax_emb is not None:
        colors = (
            cluster_assignments[: len(emb2d)]
            if cluster_assignments is not None else None
        )
        ax_emb.scatter(
            emb2d[:, 0], emb2d[:, 1], s=6, alpha=0.3,
            c=colors, cmap="tab20",
        )
        marker = ax_emb.scatter([], [], s=90, color="red", zorder=10)
        ax_emb.set_xlabel("latent 1")
        ax_emb.set_ylabel("latent 2")
        artists.append(marker)
        if legend and cluster_assignments is not None:
            shown = np.unique(np.asarray(cluster_assignments)[:10])
            ax_emb.set_title(f"clusters: {list(map(int, shown))[:10]}")

    def frame(j):
        i = int(frames_idx[j])
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
        if ax_emb is not None and i < len(emb2d):
            marker.set_offsets(emb2d[i : i + 1])
        return artists

    interval = 1000 / (sampling_rate or coordinates._frame_rate)
    anim = FuncAnimation(fig, frame, frames=n_frames, interval=interval)
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
    coordinates,
    supervised_annotations: TableDict,
    roi_number: int = None,
    animals_in_roi: list = None,
    roi_mode: str = "mousewise",
    in_roi_criterion: str = "Center",
    invert_roi: bool = False,
    N_time_bins: int = 10,
    start_marker: str = None,
    custom_time_bins=None,
    hide_time_bins=None,
    samples_max: int = 20000,
    unit_time: str = "s",
    unit_distance: str = "m",
    save_table: bool = True,
) -> pd.DataFrame:
    """Per-experiment × per-time-bin supervised summary table
    (visuals.py:4961-5108).

    One row per (time bin, experiment): ``bin_number`` (only with more
    than one bin), ``experiment_id``, the experiment's condition columns,
    each binary behavior as total time ``[unit_time]``, and each
    continuous behavior's mean/std converted to ``unit_distance`` /
    ``unit_time``. When ``save_table``, also written to the project's
    ``Out_tables/supervised_summary.csv``.
    """
    from deepof_tpu.config import CONTINUOUS_BEHAVIORS, DistanceUnit, TimeUnit
    from deepof_tpu.utils import get_supervised_behaviors_in_roi

    animal_ids = coordinates._animal_ids or [""]
    frame_rate = float(coordinates._frame_rate)
    t_factor = 1.0 / TimeUnit[unit_time].value
    d_factor = 1.0 / DistanceUnit[unit_distance].value

    # Load each experiment's table once; the bins loop below only slices
    # it (pointer-backed tables would otherwise deserialize once per bin).
    tables = {
        key: pd.DataFrame(get_dt(supervised_annotations, key))
        for key in supervised_annotations.keys()
    }
    lengths = {key: len(tab) for key, tab in tables.items()}
    bins = vu.build_valid_multibins(lengths, N_time_bins, custom_time_bins)
    if hide_time_bins is not None:
        bins = [b for b, hide in zip(bins, hide_time_bins) if not hide]

    binary_names, _ = vu.generate_behavior_combinations(
        animal_ids, True, True, True, False,
        custom_behaviors=coordinates._custom_behaviors,
    )
    prefixes = [f"{aid}_" if aid else "" for aid in animal_ids]

    rows = []
    for j, (bin_start, bin_end) in enumerate(bins):
        bin_info_time = vu.preprocess_time_bins(
            coordinates, bin_size=bin_end - bin_start, bin_index=bin_start,
            start_marker=start_marker,
            tab_dict_for_binning=supervised_annotations,
            samples_max=int(samples_max / max(len(bins), 1)),
            given_in_frames=True,
        )
        roi_bin_info = vu.apply_rois_to_bin_info(
            coordinates, roi_number, bin_info_time, in_roi_criterion,
            invert_roi=invert_roi,
        )
        for key in supervised_annotations.keys():
            binned = tables[key].iloc[roi_bin_info[key]["time"]]
            if roi_number is not None:
                binned = get_supervised_behaviors_in_roi(
                    binned, roi_bin_info[key], animals_in_roi, roi_mode
                )
            row = {}
            if len(bins) > 1:
                row["bin_number"] = j
            row["experiment_id"] = key
            cond = (coordinates._exp_conditions or {}).get(key)
            if cond is not None and hasattr(cond, "columns"):
                for c in cond.columns:
                    row[c] = cond[c].iloc[0]
            for b in binary_names:
                if b in binned.columns:
                    row[f"{b} [{unit_time}]"] = (
                        float(np.nansum(binned[b])) / frame_rate * t_factor
                    )
            for base in CONTINUOUS_BEHAVIORS + [
                cb.name for cb in (coordinates._custom_behaviors or [])
                if getattr(cb, "output_type", None) is not None
                and getattr(cb.output_type, "name", "") == "CONTINUOUS"
            ]:
                # distance-like columns are mm; speed is mm/s
                if base == "speed":
                    factor = d_factor / t_factor
                    unit = f"{unit_distance}/{unit_time}"
                else:
                    factor = d_factor
                    unit = unit_distance
                for prefix in prefixes:
                    col = f"{prefix}{base}"
                    if col not in binned.columns:
                        continue
                    row[f"{col}_mean [{unit}]"] = (
                        float(np.nanmean(binned[col])) * factor
                    )
                    row[f"{col}_std [{unit}]"] = (
                        float(np.nanstd(binned[col], ddof=1)) * factor
                    )
            rows.append(row)

    df = pd.DataFrame(rows)
    if save_table:
        out_path = os.path.join(
            coordinates._project_path, coordinates._project_name, "Out_tables"
        )
        os.makedirs(out_path, exist_ok=True)
        df.to_csv(
            os.path.join(out_path, "supervised_summary.csv"), sep=",", na_rep=""
        )
    return df


# --------------------------------------------------------------------------- #
# ROI interaction
# --------------------------------------------------------------------------- #


def _roi_mask(
    coordinates, roi_number: int, experiment_id: str, animal_id: str = None,
    in_roi_criterion: str = "Center",
):
    """Boolean in-ROI mask for one experiment/animal."""
    import jax.numpy as jnp

    from deepof_tpu.ops import point_in_polygon

    aid = animal_id if animal_id is not None else coordinates._animal_ids[0]
    crit = f"{aid}{'_' if aid else ''}{in_roi_criterion}"
    base = np.array(coordinates._tables[experiment_id], dtype=np.float64)
    ci = coordinates._nodes.index(crit)
    roi = np.asarray(coordinates._roi_dicts[experiment_id][roi_number])
    return np.asarray(point_in_polygon(jnp.asarray(base[:, ci]), roi))


def get_roi_data(
    coordinates,
    table_dict: TableDict,
    roi_number: int,
    animals_in_roi: list = None,
    roi_mode: str = "mousewise",
    in_roi_criterion: str = "Center",
    invert_roi: bool = False,
    bin_index=None,
    bin_size=None,
    precomputed_bins=None,
    start_marker: str = None,
    samples_max: int = 100000,
    experiment_id: str = None,
):
    """ROI-masked view of a supervised or unsupervised table dict
    (visuals.py:4868-4959): frames are restricted to the requested time
    bin; supervised tables get out-of-ROI behavior cells NaN-masked per
    ``roi_mode``, unsupervised arrays get out-of-ROI rows dropped. With
    ``experiment_id``, returns that single table; otherwise a dict over
    all experiments.
    """
    from deepof_tpu.utils import (
        get_supervised_behaviors_in_roi,
        get_unsupervised_behaviors_in_roi,
    )

    if animals_in_roi is None or roi_mode == "behaviorwise":
        animals_in_roi = coordinates._animal_ids
    exp_ids = [experiment_id] if experiment_id else list(table_dict.keys())

    bin_info_time = vu.preprocess_time_bins(
        coordinates, bin_size, bin_index, precomputed_bins,
        start_marker=start_marker, tab_dict_for_binning=table_dict,
        samples_max=samples_max,
    )
    bin_info = vu.apply_rois_to_bin_info(
        coordinates, roi_number, bin_info_time, in_roi_criterion,
        invert_roi=invert_roi,
    )

    out = {}
    for key in exp_ids:
        tab = get_dt(table_dict, key)
        if isinstance(tab, pd.DataFrame):
            binned = pd.DataFrame(tab.iloc[bin_info[key]["time"]])
            masked = get_supervised_behaviors_in_roi(
                binned, bin_info[key], animals_in_roi, roi_mode
            )
        else:
            binned = np.asarray(tab)[bin_info[key]["time"]]
            masked = get_unsupervised_behaviors_in_roi(
                binned, bin_info[key], animals_in_roi
            )
        out[key] = masked
    return out[experiment_id] if experiment_id else out


def _arena_or_roi_polygon(coordinates, key: str, roi_number: int = None):
    """The ROI polygon, or the arena boundary polygon when roi_number is
    None (both in the tables' coordinate space)."""
    from deepof_tpu.arena import extract_corners_from_arena

    if roi_number is not None:
        return np.asarray(coordinates._roi_dicts[key][roi_number], float)
    params = coordinates._arena_params[key]
    if isinstance(params, tuple):
        return extract_corners_from_arena(params)
    return np.asarray(params, float)


def return_mouse_roi_interaction(
    coordinates,
    bodyparts: list = None,
    animal_id: str = None,
    N_time_bins: int = 24,
    custom_time_bins=None,
    start_marker: str = None,
    samples_max: int = 20000,
    roi_number: int = None,
    hide_time_bins: list = None,
    experiment_ids: list = None,
    exp_condition: str = None,
    condition_values=None,
    mode: str = "distance",
    add_stats: str = "Mann-Whitney",
    error_bars: str = "sem",
    unit_distance: str = "m",
    fov_angle_deg: float = 90,
    get_raw_data: bool = False,
    in_roi_criterion: str = "Center",
    **kwargs,
):
    """Binned mouse↔ROI interaction statistics (visuals.py:4519-4612).

    ``mode="distance"``: per-frame distance of each selected bodypart to
    the ROI (or arena) boundary, converted to ``unit_distance``.
    ``mode="fov"``: per-frame indicator of whether the ROI/arena falls in
    the animal's field-of-view cone (``fov_angle_deg``, gaze from the
    Left_ear/Nose/Right_ear triplet). ``mode="occupancy"`` (repo
    extension, the previous behavior): fraction of frames inside the ROI.

    With ``get_raw_data``, returns the per-frame values as one long
    DataFrame. Otherwise returns ``(effect_sizes_df, group_df)``:
    per-(bin, experiment) means with the requested error measure and the
    per-bin Cohen's d (+ Mann-Whitney p when ``add_stats``) between the
    two compared condition groups (when conditions are available).
    """
    import jax.numpy as jnp

    from deepof_tpu.config import DistanceUnit
    from deepof_tpu.ops.geometry import in_field_of_view, point_to_polygon_distance

    if mode not in ("distance", "fov", "occupancy"):
        raise ValueError('mode must be one of "distance", "fov", "occupancy"')
    aid = animal_id if animal_id is not None else (coordinates._animal_ids or [""])[0]
    prefix = f"{aid}_" if aid else ""
    if bodyparts is None:
        bodyparts = ["Nose"]
    d_factor = 1.0
    if mode == "distance":
        f = DistanceUnit[unit_distance].value
        d_factor = 1.0 / f if f else 1.0

    keys = experiment_ids or list(coordinates._tables.keys())
    if isinstance(condition_values, str):
        condition_values = [condition_values]
    conds = _conditions_of(coordinates, keys, exp_condition=exp_condition)
    if condition_values:
        keys = [k for k in keys if conds[k] in map(str, condition_values)]

    nodes = list(coordinates._nodes)
    raw = {}
    for key in keys:
        pos = np.array(coordinates._tables[key], dtype=np.float64)
        poly = _arena_or_roi_polygon(coordinates, key, roi_number)
        cols = {}
        if mode == "distance":
            for bp in bodyparts:
                name = f"{prefix}{bp}" if f"{prefix}{bp}" in nodes else bp
                pts = pos[:, nodes.index(name)]
                cols[name] = np.asarray(
                    point_to_polygon_distance(jnp.asarray(pts), poly)
                ) * d_factor
        elif mode == "fov":
            triplet = [f"{prefix}Left_ear", f"{prefix}Nose", f"{prefix}Right_ear"]
            pts = np.stack([pos[:, nodes.index(t)] for t in triplet], axis=1)
            cols["fov"] = np.asarray(
                in_field_of_view(jnp.asarray(pts), fov_angle_deg, poly)
            )
        else:  # occupancy
            for a in coordinates._animal_ids or [""]:
                cols[a or "animal"] = _roi_mask(
                    coordinates, roi_number if roi_number is not None else 1,
                    key, a, in_roi_criterion,
                ).astype(float)
        raw[key] = pd.DataFrame(cols)

    if get_raw_data:
        long = []
        for key, df in raw.items():
            df = df.copy()
            df.insert(0, "experiment_id", key)
            long.append(df)
        return pd.concat(long, ignore_index=True)

    lengths = {k: len(v) for k, v in raw.items()}
    bins = vu.build_valid_multibins(lengths, N_time_bins, custom_time_bins)
    if hide_time_bins is not None:
        bins = [b for b, hide in zip(bins, hide_time_bins) if not hide]

    group_rows = []
    for j, (lo, hi) in enumerate(bins):
        for key in keys:
            seg = raw[key].iloc[lo:hi].to_numpy(float)
            vals = seg[np.isfinite(seg)]
            if not len(vals):
                continue
            err = (
                float(np.nanstd(vals, ddof=1)) if error_bars == "std"
                else float(np.nanstd(vals, ddof=1)) / np.sqrt(len(vals))
            )
            group_rows.append({
                "bin_number": j, "experiment_id": key,
                "exp_condition": conds[key],
                "mean": float(np.nanmean(vals)), error_bars: err,
            })
    group_df = pd.DataFrame(group_rows)

    effect_rows = []
    groups = sorted(group_df["exp_condition"].unique()) if len(group_df) else []
    if len(groups) == 2:
        from scipy.stats import mannwhitneyu

        for j in sorted(group_df["bin_number"].unique()):
            sub = group_df[group_df["bin_number"] == j]
            a = sub[sub["exp_condition"] == groups[0]]["mean"].to_numpy()
            b = sub[sub["exp_condition"] == groups[1]]["mean"].to_numpy()
            if len(a) < 1 or len(b) < 1:
                continue
            pooled = np.sqrt(
                ((len(a) - 1) * np.var(a, ddof=1) + (len(b) - 1) * np.var(b, ddof=1))
                / max(len(a) + len(b) - 2, 1)
            ) if len(a) + len(b) > 2 else np.nan
            row = {
                "bin_number": j,
                "cohens_d": float((np.mean(a) - np.mean(b)) / pooled)
                if pooled and np.isfinite(pooled) and pooled > 0 else np.nan,
            }
            if add_stats and len(a) and len(b):
                try:
                    row["p_value"] = float(mannwhitneyu(a, b).pvalue)
                except ValueError:
                    row["p_value"] = np.nan
            effect_rows.append(row)
    effect_df = pd.DataFrame(effect_rows)
    return effect_df, group_df


def plot_mouse_roi_interaction(
    coordinates,
    roi_number: int = None,
    mode: str = "distance",
    error_bars: str = "sem",
    save: bool = False,
    ax: Any = None,
    show_histogram: bool = False,
    polar_depiction: bool = False,
    **kwargs,
):
    """Binned mouse↔ROI interaction curves per condition with error bars
    (visuals.py:4614-4866); ``show_histogram`` instead draws the
    distribution of raw per-frame values."""
    own_fig = ax is None
    if own_fig:
        fig, ax, _ = vu.ensure_axis(None, polar_depiction=polar_depiction)
    else:
        fig = ax.figure
    if show_histogram:
        raw = return_mouse_roi_interaction(
            coordinates, roi_number=roi_number, mode=mode,
            get_raw_data=True, **kwargs,
        )
        vals = raw.drop(columns=["experiment_id"]).to_numpy(float).ravel()
        ax.hist(vals[np.isfinite(vals)], bins=30)
        ax.set_xlabel(mode)
        return _maybe_save(fig, save, "roi_interaction")
    _, group_df = return_mouse_roi_interaction(
        coordinates, roi_number=roi_number, mode=mode,
        error_bars=error_bars, **kwargs,
    )
    for cond in sorted(group_df["exp_condition"].unique()):
        sub = (
            group_df[group_df["exp_condition"] == cond]
            .groupby("bin_number")
            .agg(mean=("mean", "mean"), err=(error_bars, "mean"))
        )
        ax.errorbar(
            sub.index, sub["mean"], yerr=sub["err"], label=str(cond),
            marker="o", capsize=3,
        )
    ax.set_xlabel("time bin")
    ax.set_ylabel(mode)
    ax.legend()
    return _maybe_save(fig, save, "roi_interaction")


def plot_normative_log_likelihood(
    coordinates=None,
    embeddings: TableDict = None,
    normative_model=None,
    embedding_dataset: pd.DataFrame = None,
    exp_condition: str = None,
    add_stats: str = "Mann-Whitney",
    verbose: bool = False,
    save: bool = False,
    ax: Any = None,
    **kwargs,
):
    """Normative log-likelihood per experimental condition
    (visuals.py:2293-2419).

    Reference mode: pass ``embedding_dataset`` (rows = experiments with
    "PCA-1"/"PCA-2"/"experimental condition" columns) and
    ``normative_model`` as the CONTROL COHORT NAME — the KDE is fitted on
    the control rows, all rows are scored and centered on the control
    mean, and a boxplot+strip per condition renders (on the second axis
    when ``ax`` is a two-element list). Returns the augmented dataset.

    Repo mode (previous behavior): pass ``coordinates``, ``embeddings``
    and a FITTED model; per-experiment scores render as a scatter. With
    ``add_stats``, a Mann-Whitney p-value between two condition groups is
    annotated (printed too when ``verbose``).
    """
    from scipy.stats import mannwhitneyu

    if embedding_dataset is not None:
        assert isinstance(normative_model, str), (
            "in reference mode normative_model names the control cohort"
        )
        ds = embedding_dataset.copy()
        control = ds["experimental condition"] == normative_model
        model = posthoc.fit_normative_global_model(
            ds.loc[control, ["PCA-1", "PCA-2"]]
        )
        ds["norm_scores"] = model.score_samples(
            ds.loc[:, ["PCA-1", "PCA-2"]].values
        )
        ds["norm_scores"] -= ds.loc[control, "norm_scores"].mean()

        if ax is None:
            fig, (ax, ax2) = plt.subplots(
                1, 2, figsize=(12, 6), gridspec_kw={"width_ratios": [3, 1]}
            )
        elif isinstance(ax, (list, tuple)):
            ax, ax2 = ax
            fig = ax.figure
        else:
            raise ValueError(
                "Passing normative_model produces two plots; pass a list "
                "with two axes instead of a single one."
            )
        conds = sorted(
            ds["experimental condition"].unique(),
            key=lambda c: c != normative_model,  # control first
        )
        data = [
            ds.loc[ds["experimental condition"] == c, "norm_scores"] for c in conds
        ]
        ax2.boxplot([d.to_numpy() for d in data], tick_labels=conds)
        rng = np.random.default_rng(42)
        for i, d in enumerate(data):
            ax2.scatter(
                1 + i + rng.normal(0, 0.06, len(d)), d, s=12, alpha=0.7,
            )
        ax2.set_ylabel("normative log-likelihood (centered)")
        if add_stats and len(conds) == 2 and all(len(d) for d in data):
            try:
                p = mannwhitneyu(data[0], data[1]).pvalue
                ax2.set_title(f"{add_stats}: p={p:.3g}")
                if verbose:
                    print(f"{add_stats} between {conds}: p={p:.5g}")
            except ValueError:
                pass
        _maybe_save(fig, save, "normative_ll")
        return ds

    agg = posthoc.get_aggregated_embedding(embeddings)
    scores = posthoc.score_against_normative(normative_model, agg)
    conds = _conditions_of(
        coordinates, list(scores.index), exp_condition=exp_condition
    )
    own_fig = ax is None
    if own_fig:
        fig, ax = plt.subplots()
    else:
        fig = ax.figure
    names = sorted(set(conds.values()))
    groups = {c: [scores[k] for k in scores.index if conds[k] == c] for c in names}
    for ci, cond in enumerate(names):
        ax.scatter([ci] * len(groups[cond]), groups[cond], label=cond)
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(names)
    ax.set_ylabel("normative log-likelihood")
    if add_stats and len(names) == 2 and all(len(v) for v in groups.values()):
        try:
            p = mannwhitneyu(*groups.values()).pvalue
            ax.set_title(f"{add_stats}: p={p:.3g}")
            if verbose:
                print(f"{add_stats} between {names}: p={p:.5g}")
        except ValueError:
            pass
    return _maybe_save(fig, save, "normative_ll")


def export_annotated_video(
    coordinates,
    soft_counts: TableDict = None,
    supervised_annotations: TableDict = None,
    bin_size=None,
    bin_index=None,
    precomputed_bins=None,
    start_marker: str = None,
    frame_limit_per_video: int = 250,
    roi_number: int = None,
    animals_in_roi: list = None,
    roi_mode: str = "mousewise",
    in_roi_criterion: str = "Center",
    invert_roi: bool = False,
    behaviors: List[str] = None,
    experiment_id: str = None,
    min_confidence: float = 0.0,
    min_bout_duration: int = None,
    display_time: bool = False,
    display_counter: bool = False,
    display_arena: bool = True,
    display_markers: bool = True,
    display_mouse_labels: bool = False,
    display_roi: int = None,
    exp_conditions=None,
    cluster_names: dict = None,
    **kwargs,
):
    """Annotated-video export (visuals.py:3713-3930), routed like the
    reference: with ``experiment_id``, renders that experiment's full
    video with overlays; without it, concatenates per-cluster (or
    per-behavior) bout snippets across experiments. Display toggles map
    onto :class:`deepof_tpu.export_video.VideoExportConfig`;
    ``cluster_names`` relabels ``Cluster_i`` columns before export.
    Requires readable experiment videos on disk.
    """
    from deepof_tpu.export_video import (
        VideoExportConfig,
        output_annotated_video,
        output_videos_per_cluster,
    )

    if cluster_names and soft_counts is not None:
        renamed = {}
        for key in soft_counts.keys():
            arr = get_dt(soft_counts, key)
            if isinstance(arr, pd.DataFrame):
                arr = arr.rename(columns=cluster_names)
            renamed[key] = arr
        soft_counts = TableDict(
            renamed, typ="unsupervised_counts",
        )

    if experiment_id is not None:
        config = VideoExportConfig(
            display_time=display_time,
            display_counter=display_counter,
            display_arena=display_arena,
            display_markers=display_markers,
            display_mouse_labels=display_mouse_labels,
            display_roi=display_roi if display_roi is not None else roi_number,
        )
        return output_annotated_video(
            coordinates, experiment_id,
            supervised_annotations=supervised_annotations,
            soft_counts=soft_counts, behaviors=behaviors,
            frame_limit=frame_limit_per_video, config=config,
            **kwargs,
        )
    exp_condition = condition_value = None
    if isinstance(exp_conditions, dict) and exp_conditions:
        # {condition_name: value} selects the cohort, like the reference
        exp_condition, condition_value = next(iter(exp_conditions.items()))
    return output_videos_per_cluster(
        coordinates, soft_counts=soft_counts,
        supervised_annotations=supervised_annotations, behaviors=behaviors,
        min_confidence=min_confidence, min_bout_duration=min_bout_duration,
        exp_condition=exp_condition, condition_value=condition_value,
        frame_limit_per_video=frame_limit_per_video, **kwargs,
    )
