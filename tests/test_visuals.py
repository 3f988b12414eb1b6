"""Visuals tests: render every main plot on the fixture project."""

import os
import shutil

import matplotlib
import numpy as np
import pandas as pd
import pytest

matplotlib.use("Agg")

import deepof_tpu.visuals as visuals
from deepof_tpu.core.table_dict import TableDict
from deepof_tpu.data import Project

FIXTURES = "/root/reference/tests/test_examples"


@pytest.fixture(scope="module")
def coords(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("viz")
    src = os.path.join(FIXTURES, "test_single_topview")
    (tmp / "Tables").mkdir()
    (tmp / "Videos").mkdir()
    for f in os.listdir(os.path.join(src, "Tables")):
        if f.endswith("h5"):
            shutil.copy(os.path.join(src, "Tables", f), tmp / "Tables" / f)
    for f in os.listdir(os.path.join(src, "Videos")):
        shutil.copy(os.path.join(src, "Videos", f), tmp / "Videos" / f)
    proj = Project(
        project_path=str(tmp), project_name="viz", video_path=str(tmp / "Videos"),
        table_path=str(tmp / "Tables"), arena="circular-autodetect",
        video_scale="380 mm", table_format="h5", frame_rate=25,
        exp_conditions={
            "test": pd.DataFrame({"cond": ["A"]}),
            "test2": pd.DataFrame({"cond": ["B"]}),
        },
    )
    return proj.create(force=True, test=True, verbose=False)


@pytest.fixture(scope="module")
def soft_counts(coords):
    rng = np.random.default_rng(0)
    tabs = {}
    for key in coords._tables:
        p = np.exp(rng.normal(size=(100, 5)))
        tabs[key] = p / p.sum(1, keepdims=True)
    return TableDict(tabs, typ="unsupervised_counts")


@pytest.fixture(scope="module")
def embeddings(coords):
    rng = np.random.default_rng(1)
    return TableDict(
        {key: pd.DataFrame(rng.normal(size=(100, 6))) for key in coords._tables},
        typ="unsupervised_embedding",
    )


@pytest.fixture(scope="module")
def supervised(coords):
    return coords.supervised_annotation()


def test_plot_heatmaps(coords):
    fig = visuals.plot_heatmaps(coords, ["Nose"], center="arena")
    assert fig.axes


def test_plot_gantt_supervised(coords, supervised):
    fig = visuals.plot_gantt(coords, "test", supervised_annotations=supervised)
    assert fig.axes


def test_plot_gantt_absolute_time_alignment(coords):
    """Bars, checkpoint vlines and the signal overlay share one absolute
    time origin: with bin_index > 0 a bout at frames [60, 80) must render
    at 60/fps..80/fps seconds, not at slice-relative 10/fps."""
    frame_rate = 25.0
    tabs = {}
    for key in coords._tables:
        tab = pd.DataFrame(0.0, index=range(100), columns=["lookaround"])
        tab.iloc[60:80] = 1.0
        tabs[key] = tab
    sup = TableDict(tabs, typ="supervised")

    fig = visuals.plot_gantt(
        coords, "test", supervised_annotations=sup,
        bin_size=2, bin_index=1,  # 2-second bins, second bin = frames [50, 100)
        additional_checkpoints=np.array([70.0]),
        signal_overlay=pd.Series(np.linspace(0, 1, 100), name="sig"),
    )
    ax = fig.axes[0]
    bars = [p for p in ax.patches if p.get_width() > 0]
    assert bars, "expected at least one bout bar"
    x0 = min(p.get_x() for p in bars)
    x1 = max(p.get_x() + p.get_width() for p in bars)
    assert abs(x0 - 60 / frame_rate) < 1e-6
    assert abs(x1 - 80 / frame_rate) < 1e-6
    # the checkpoint vline sits inside the bout on the same axis
    vline_xs = [
        l.get_xdata()[0] for l in ax.lines if len(set(l.get_xdata())) == 1
    ]
    assert any(abs(v - 70 / frame_rate) < 1e-6 for v in vline_xs)
    # the overlay is sliced to the bin and placed at absolute time
    twin = [a for a in fig.axes if a is not ax and a.bbox.bounds == ax.bbox.bounds]
    assert twin and twin[0].lines
    ox = twin[0].lines[0].get_xdata()
    assert ox.min() >= 50 / frame_rate - 1e-6 and ox.max() <= 99 / frame_rate + 1e-6


def test_plot_gantt_clusters(coords, soft_counts):
    fig = visuals.plot_gantt(coords, "test", soft_counts=soft_counts)
    assert fig.axes


def test_plot_enrichment(coords, soft_counts):
    fig = visuals.plot_enrichment(coords, soft_counts=soft_counts)
    assert fig.axes


def test_plot_enrichment_supervised(coords, supervised):
    fig = visuals.plot_enrichment(coords, supervised_annotations=supervised)
    assert fig.axes


def test_plot_transitions_and_entropy(coords, soft_counts):
    mats = visuals.return_transitions(coords, soft_counts)
    assert set(mats) == {"A", "B"}
    fig = visuals.plot_transitions(coords, soft_counts)
    assert fig.axes
    fig = visuals.plot_transitions(coords, soft_counts, visualization="networks")
    assert fig.axes
    fig = visuals.plot_stationary_entropy(coords, soft_counts)
    assert fig.axes


def test_plot_embeddings(coords, embeddings, soft_counts):
    fig = visuals.plot_embeddings(coords, embeddings, soft_counts)
    assert fig.axes
    fig = visuals.plot_embeddings(
        coords, embeddings, soft_counts, aggregate_experiments="mean"
    )
    assert fig.axes


def test_plot_embeddings_colour_modes(coords, embeddings, soft_counts):
    """Reference kwargs wired in round 5: colour_by, min_confidence,
    normative_model + add_stats (visuals.py:2421-2862)."""
    for mode, label in [("video", "video"), ("exp_condition", "condition")]:
        fig = visuals.plot_embeddings(
            coords, embeddings, soft_counts, colour_by=mode,
        )
        assert any(
            label in (a.get_ylabel() or "") for a in fig.axes
        ), f"colorbar label missing for {mode}"

    # min_confidence filters chunks: stricter threshold plots fewer points
    fig_all = visuals.plot_embeddings(coords, embeddings, soft_counts)
    fig_conf = visuals.plot_embeddings(
        coords, embeddings, soft_counts, min_confidence=0.45,
    )
    n_all = fig_all.axes[0].collections[0].get_offsets().shape[0]
    n_conf = fig_conf.axes[0].collections[0].get_offsets().shape[0]
    assert 0 < n_conf < n_all


def test_plot_embeddings_normative(coords, embeddings):
    from deepof_tpu import posthoc

    agg = posthoc.get_aggregated_embedding(embeddings)
    model = posthoc.fit_normative_global_model(agg)
    fig = visuals.plot_embeddings(
        coords, embeddings, aggregate_experiments="mean",
        normative_model=model, add_stats="Mann-Whitney",
        show_aggregated_density=False,
    )
    # normative coloring produces a colorbar instead of a legend
    assert any(
        "normative" in (a.get_ylabel() or "") for a in fig.axes
    )


def test_plot_associations_and_events(coords, supervised):
    counts = visuals.count_all_events(coords, supervised)
    assert counts.shape[0] == 2
    # reference counting modes: Frames/frame_rate == Time, and binary
    # columns only (speed/distance columns are dropped)
    frames = visuals.count_all_events(coords, supervised, counting_mode="Frames")
    times = visuals.count_all_events(coords, supervised, counting_mode="Time")
    np.testing.assert_allclose(
        times.to_numpy(float),
        frames.to_numpy(float) / coords._frame_rate,
    )
    assert not any("speed" in str(c) for c in counts.columns)
    fig = visuals.plot_associations(
        coords, supervised, behaviors=["sniffing", "moving", "stat-passive"]
    )
    assert fig.axes


def test_behavior_trends(coords, supervised):
    fig = visuals.plot_behavior_trends(
        coords, supervised_annotations=supervised, behavior="moving",
        n_time_bins=5,
    )
    assert fig.axes


def test_embedding_evaluation(coords, embeddings, supervised):
    # legacy repo layout still works (embeddings first, behaviors alias)
    df = visuals.return_embedding_evaluation(
        embeddings, supervised, behaviors=["moving", "sniffing"], window_size=1,
        minimum_number_of_positives=2,
    )
    assert "ap_mean" in df.columns
    # reference layout: coordinates first, include_behaviors,
    # alignment_mode and normalization (visuals.py:2864-2917)
    ref = visuals.return_embedding_evaluation(
        coords, embeddings, supervised, include_behaviors=["moving"],
        window_size=5, alignment_mode="any", minimum_number_of_positives=2,
        normalize=False, random_state=1,
    )
    assert "moving" in ref.index
    norm = visuals.return_embedding_evaluation(
        coords, embeddings, supervised, include_behaviors=["moving"],
        window_size=5, alignment_mode="center", minimum_number_of_positives=2,
        normalize=True,
    )
    # normalization divides AP by the positive rate -> larger values
    assert norm.loc["moving", "ap_mean"] > 0
    # rare behaviors are skipped under the reference's positives floor
    empty = visuals.return_embedding_evaluation(
        coords, embeddings, supervised, include_behaviors=["moving"],
        window_size=5, minimum_number_of_positives=10_000,
    )
    assert empty.empty
    fig = visuals.plot_embedding_evaluation(
        embeddings, supervised, behaviors=["moving"],
        minimum_number_of_positives=2,
    )
    assert fig.axes


def test_normative_plot_reference_mode():
    """Reference-mode plot_normative_log_likelihood (visuals.py:2293-2419):
    normative_model names the control cohort, the KDE fits on control
    PCA rows, scores center on the control mean, and the augmented
    dataset returns."""
    rng = np.random.default_rng(0)
    ds = pd.DataFrame({
        "PCA-1": np.concatenate([rng.normal(0, 1, 10), rng.normal(4, 1, 10)]),
        "PCA-2": np.concatenate([rng.normal(0, 1, 10), rng.normal(4, 1, 10)]),
        "experimental condition": ["ctrl"] * 10 + ["treated"] * 10,
    })
    out = visuals.plot_normative_log_likelihood(
        embedding_dataset=ds, normative_model="ctrl",
        add_stats="Mann-Whitney", verbose=False,
    )
    assert "norm_scores" in out.columns
    ctrl = out.loc[out["experimental condition"] == "ctrl", "norm_scores"]
    treated = out.loc[out["experimental condition"] == "treated", "norm_scores"]
    np.testing.assert_allclose(ctrl.mean(), 0.0, atol=1e-9)  # centered
    assert treated.mean() < ctrl.mean()  # off-cohort scores lower
    import matplotlib.pyplot as plt

    plt.close("all")


def test_training_metrics_plot():
    fig = visuals.plot_training_metrics({"loss": [3, 2, 1], "val": [4, 3, 2]})
    assert fig.axes


def test_supervised_summary(coords, supervised):
    # Reference schema (visuals.py:4961-5108): one row per (bin, exp),
    # binary behaviors as total time in unit_time, continuous behaviors
    # unit-converted with mean/std suffixes.
    summary = visuals.return_supervised_summary(
        coords, supervised, N_time_bins=2, save_table=False,
        unit_time="s", unit_distance="mm",
    )
    assert "experiment_id" in summary.columns
    assert "bin_number" in summary.columns
    assert summary.shape[0] == 2 * len(supervised)
    assert "moving [s]" in summary.columns
    assert "speed_mean [mm/s]" in summary.columns
    tab = next(iter(supervised.values()))
    # full-range single bin: moving seconds == frames_sum / frame_rate
    one = visuals.return_supervised_summary(
        coords, supervised, N_time_bins=1, save_table=False,
    )
    assert "bin_number" not in one.columns
    key = one["experiment_id"].iloc[0]
    want = float(supervised[key]["moving"].sum()) / coords._frame_rate
    np.testing.assert_allclose(one["moving [s]"].iloc[0], want, rtol=1e-9)
    # unit conversion: minutes = seconds / 60
    mins = visuals.return_supervised_summary(
        coords, supervised, N_time_bins=1, save_table=False, unit_time="min",
    )
    np.testing.assert_allclose(
        mins["moving [min]"].iloc[0], want / 60.0, rtol=1e-9
    )


def test_roi_interaction(coords):
    # reference surface (visuals.py:4519-4866): distance mode, binned
    # (effect_sizes, group) tables, raw per-frame export, fov mode
    effect, group = visuals.return_mouse_roi_interaction(
        coords, roi_number=1, N_time_bins=4,
    )
    assert set(group["experiment_id"]) == {"test", "test2"}
    assert {"bin_number", "mean", "sem", "exp_condition"} <= set(group.columns)
    assert group["bin_number"].nunique() == 4
    # two conditions (A/B) -> per-bin effect sizes and MW p-values
    assert len(effect) == 4 and "cohens_d" in effect and "p_value" in effect

    raw = visuals.return_mouse_roi_interaction(
        coords, roi_number=1, get_raw_data=True,
    )
    assert len(raw) == 200 and "Nose" in raw.columns
    assert (raw["Nose"].dropna() >= 0).all()

    # distances convert with unit_distance (mm = 1000x m)
    raw_mm = visuals.return_mouse_roi_interaction(
        coords, roi_number=1, get_raw_data=True, unit_distance="mm",
    )
    np.testing.assert_allclose(
        raw_mm["Nose"].to_numpy(), raw["Nose"].to_numpy() * 1000.0, rtol=1e-9
    )

    fov = visuals.return_mouse_roi_interaction(
        coords, roi_number=1, mode="fov", get_raw_data=True,
    )
    vals = fov["fov"].dropna().unique()
    assert set(vals) <= {0.0, 1.0}

    fig = visuals.plot_mouse_roi_interaction(coords, roi_number=1)
    assert fig.axes
    fig = visuals.plot_mouse_roi_interaction(
        coords, roi_number=1, show_histogram=True,
    )
    assert fig.axes


def test_get_roi_data_reference_semantics(coords, supervised, soft_counts):
    """get_roi_data returns ROI-masked tables like the reference
    (visuals.py:4868-4959): NaN-masked supervised frames, row-filtered
    unsupervised arrays."""
    out = visuals.get_roi_data(coords, supervised, roi_number=1)
    assert set(out) == set(supervised.keys())
    tab = out["test"]
    assert isinstance(tab, pd.DataFrame)
    full = supervised["test"]
    assert tab["moving"].isna().sum() >= 0  # masked cells are NaN
    assert len(tab) == len(full)

    single = visuals.get_roi_data(
        coords, soft_counts, roi_number=1, experiment_id="test",
    )
    assert isinstance(single, np.ndarray)
    assert single.shape[0] <= np.asarray(soft_counts["test"]).shape[0]


def test_normative_plot(coords, embeddings):
    import deepof_tpu.posthoc as posthoc

    agg = posthoc.get_aggregated_embedding(embeddings)
    model = posthoc.fit_normative_global_model(agg)
    fig = visuals.plot_normative_log_likelihood(coords, embeddings, model)
    assert fig.axes


def test_animate_skeleton(coords):
    anim = visuals.animate_skeleton(coords, "test", frame_limit=5)
    assert anim is not None


def test_animate_skeleton_reference_surface(coords, embeddings, soft_counts):
    """Reference kwargs (visuals.py:3110-3519): embeddings side panel,
    cluster-filtered frames, time binning."""
    # embeddings panel -> two axes, cluster coloring from soft_counts
    anim = visuals.animate_skeleton(
        coords, "test", embeddings=embeddings, soft_counts=soft_counts,
        frame_limit=5,
    )
    assert len(anim._fig.axes) == 2

    # selected_cluster restricts frames to that cluster's confident bouts
    hard = np.asarray(soft_counts["test"]).argmax(1)
    target = int(np.bincount(hard).argmax())
    anim = visuals.animate_skeleton(
        coords, "test", soft_counts=soft_counts,
        selected_cluster=target, min_confidence=0.0, frame_limit=1000,
    )
    assert anim._save_count if hasattr(anim, "_save_count") else True
    # bin selection narrows the frame range
    anim = visuals.animate_skeleton(
        coords, "test", bin_size=1, bin_index=0, frame_limit=1000,
    )
    assert anim is not None
    import matplotlib.pyplot as plt

    plt.close("all")


def test_condition_distance_plot(coords, embeddings, soft_counts):
    fig = visuals.plot_distance_between_conditions(
        coords, embeddings, soft_counts, metric="auc", start_bin=30, step_bin=30,
    )
    assert fig.axes


def test_sanitycheck_render(coords):
    from deepof_tpu.sanitycheck import render_frame

    ax = render_frame(coords, "test", 0, show_speeds=True, show_distances=True)
    assert ax is not None


def test_generate_behavior_combinations():
    from deepof_tpu.visuals_utils import generate_behavior_combinations

    names, colors = generate_behavior_combinations(["B", "W"])
    assert "B_W_nose2nose" in names
    assert "B_W_following" in names and "W_B_following" in names
    assert "B_climb-arena" in names and "W_climb-arena" in names
    assert "B_speed" in names
    assert all(n in colors for n in names)
    # Single-animal projects drop the id prefixes and pair behaviors.
    solo, _ = generate_behavior_combinations([""])
    assert "climb-arena" in solo
    assert not any("nose2nose" in n for n in solo)


def test_behavior_trends_polar(coords, supervised):
    fig = visuals.plot_behavior_trends(
        coords, supervised_annotations=supervised, behavior="moving",
        n_time_bins=5, polar_depiction=True,
    )
    assert fig.axes and fig.axes[0].name == "polar"


def test_binned_trend_helpers():
    import matplotlib.pyplot as plt

    from deepof_tpu import visuals_utils as vu

    pairs = vu.build_valid_multibins({"a": 100, "b": 120}, n_time_bins=4)
    assert pairs[-1][1] <= 100 and len(pairs) == 4
    custom = vu.build_valid_multibins({"a": 100}, custom_time_bins=[(0, 50), (50, 100)])
    assert custom == [(0, 50), (50, 100)]
    with pytest.raises(AssertionError):
        vu.build_valid_multibins({"a": 100}, custom_time_bins=[(0, 60), (50, 100)])

    geom = vu.get_binned_geometry([10, 10, 20])
    np.testing.assert_allclose(geom["edges"][-1], 2 * np.pi)
    assert geom["widths"][2] == pytest.approx(2 * geom["widths"][0])

    df = pd.DataFrame({
        "bin": [0, 1, 0, 1, 0, 1, 0, 1],
        "value": [1.0, 2.0, 1.2, 2.2, 5.0, 6.0, 5.2, 6.3],
        "condition": ["x", "x", "x", "x", "y", "y", "y", "y"],
    })
    means, errs, conds = vu.process_df(df)
    assert conds == ["x", "y"]
    np.testing.assert_allclose(means["x"], [1.1, 2.1])
    tests = vu.binwise_group_tests(df)
    assert set(tests) == {0, 1}

    fig, ax, created = vu.ensure_axis(None, polar_depiction=True)
    assert created and ax.name == "polar"
    vu.plot_binned_groups(ax, geom["centers"],
                          {c: np.ones(3) * (i + 1) for i, c in enumerate(conds)},
                          None, conds)
    vu.format_time_binned_axis(ax, geom, True, 2.0, title="t")
    vu.add_polar_bin_labels(ax, geom)
    plt.close(fig)


def test_supervised_transitions(coords, supervised):
    mats = visuals.return_transitions(
        coordinates=coords, supervised_annotations=supervised, delta_T=0.2,
    )
    assert set(mats) == {"A", "B"}
    m = list(mats.values())[0]
    assert m.shape[0] == m.shape[1] and np.isfinite(m).all()
    fig = visuals.plot_transitions(
        coords, supervised_annotations=supervised, silence_diagonal=True,
    )
    assert fig.axes


def test_binned_plots_nondefault_bins(coords, supervised, soft_counts,
                                      embeddings):
    """Every bin_size-accepting plot with non-default bin_size/bin_index.

    Regression guard for the positional-arg bug where
    plot_stationary_entropy passed bin_size into return_transitions'
    supervised_annotations slot.
    """
    kw = dict(bin_size=2, bin_index=1)
    assert visuals.plot_heatmaps(coords, ["Nose"], center="arena", **kw).axes
    assert visuals.plot_gantt(
        coords, "test", supervised_annotations=supervised, **kw
    ).axes
    assert visuals.plot_enrichment(coords, soft_counts=soft_counts, **kw).axes
    mats = visuals.return_transitions(coords, soft_counts, **kw)
    assert set(mats) == {"A", "B"}
    assert visuals.plot_transitions(coords, soft_counts, **kw).axes
    assert visuals.plot_stationary_entropy(coords, soft_counts, **kw).axes
    assert visuals.plot_embeddings(coords, embeddings, soft_counts, **kw).axes


def test_gantt_reference_surface(coords, supervised, soft_counts):
    """Reference plot_gantt surface (visuals.py:248-978): behavior-mode
    instance routing, instances_to_plot filtering, checkpoint vlines and
    signal overlay."""
    # behavior mode: instance_id names a behavior -> one row per experiment
    fig = visuals.plot_gantt(
        coords, "moving", supervised_annotations=supervised,
    )
    labels = [t.get_text() for t in fig.axes[0].get_yticklabels()]
    assert labels == list(supervised.keys())

    # restrict to one experiment
    fig = visuals.plot_gantt(
        coords, "moving", supervised_annotations=supervised,
        instances_to_plot=["test"],
    )
    assert [t.get_text() for t in fig.axes[0].get_yticklabels()] == ["test"]

    # experiment mode with instances_to_plot as the behavior filter
    fig = visuals.plot_gantt(
        coords, "test", supervised_annotations=supervised,
        instances_to_plot=["moving", "sniffing"],
    )
    assert len(fig.axes[0].get_yticklabels()) == 2

    # overlays: checkpoints draw vlines; signal_overlay adds a twin axis
    sig = pd.Series(
        np.sin(np.arange(100) / 5.0), name="speed trace"
    )
    fig = visuals.plot_gantt(
        coords, "test", supervised_annotations=supervised,
        additional_checkpoints=[10, 50], signal_overlay=sig,
    )
    main_ax = fig.axes[0]
    assert sum(1 for ln in main_ax.lines if ln.get_linestyle() == "--") == 2
    assert len(fig.axes) == 2  # twin axis created
    assert fig.axes[1].get_ylabel() == "speed trace"


def test_visuals_depth_upgrades(coords, supervised, soft_counts, embeddings):
    """VERDICT item 10: richer kwargs actually change the output."""
    # Multi-panel gantt: both sources stack into shared-x panels.
    fig = visuals.plot_gantt(
        coords, "test", soft_counts=soft_counts,
        supervised_annotations=supervised,
    )
    assert len(fig.axes) == 2
    assert fig.axes[0].get_title() == "unsupervised clusters"

    # Heatmap align is no longer ignored: without the (identical) arena
    # overlay, the occupancy extents change under egocentric alignment.
    import numpy as np

    f1 = visuals.plot_heatmaps(
        coords, ["Nose"], center="arena", display_arena=False
    )
    f2 = visuals.plot_heatmaps(
        coords, ["Nose"], center="arena", align="Spine_1",
        display_arena=False,
    )
    assert f1.axes[0].dataLim.bounds != f2.axes[0].dataLim.bounds

    # exp_condition picks the grouping column (and validates it).
    fig = visuals.plot_enrichment(
        coords, supervised_annotations=supervised, exp_condition="cond",
    )
    assert fig.axes
    with pytest.raises(AssertionError):
        visuals.plot_enrichment(
            coords, supervised_annotations=supervised, exp_condition="nope",
        )

    # Significance brackets render line + star/effect-size text when a
    # cluster differs between conditions.
    from deepof_tpu import visuals_utils as vu

    fig, ax = visuals.plt.subplots()
    vu.add_significance_bracket(ax, 0, 1, 1.0, p=0.003, effect_size=1.2)
    texts = [t.get_text() for t in ax.texts]
    assert any("**" in t and "d=1.20" in t for t in texts)
    assert vu.p_to_stars(0.2) == "ns" and vu.p_to_stars(1e-5) == "****"
    d = vu.cohens_d([1, 2, 3, 4], [3, 4, 5, 6])
    assert d == pytest.approx(-1.549, abs=1e-3)

    # Embedding projections: tsne works, umap raises a clear error when
    # the optional package is missing.
    fig = visuals.plot_embeddings(
        coords, embeddings, soft_counts, projection="tsne", samples_max=50,
    )
    assert fig.axes[0].get_xlabel() == "TSNE 1"
    try:
        import umap  # noqa: F401
        has_umap = True
    except ImportError:
        has_umap = False
    if not has_umap:
        with pytest.raises(ImportError):
            visuals.plot_embeddings(
                coords, embeddings, soft_counts, projection="umap",
            )


def test_sanitycheck_rich_overlays(coords):
    """Richer QC overlays: selection, per-edge labels, angle readouts,
    speed coloring, arena/ROI outlines."""
    from deepof_tpu.sanitycheck import render_frame

    ax = render_frame(
        coords, "test", 3,
        bodyparts=["Nose", "Center", "Spine_1", "Spine_2", "Tail_base"],
        show_distances=True, show_angles=True, show_speeds=True,
        show_arena=True, show_labels=True,
    )
    texts = [t.get_text() for t in ax.texts]
    assert any("°" in t for t in texts)          # angle readouts
    assert any(t == "Nose" for t in texts)       # bodypart labels
    assert len(ax.lines) > len(list(coords._body_graph.edges))  # arena overlay
