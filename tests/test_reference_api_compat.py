"""Reference-named public API compatibility layer.

The reference exposes its kernel library as public functions on
deepof.utils (and helper surfaces on annotation_utils / visuals_utils /
export_video / post_hoc). These tests pin the migration wrappers added in
round 4 against independent numpy/scipy oracles and against the
TPU-idiomatic implementations they delegate to.
"""

import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pytest

import deepof_tpu.utils as du


def _coords_frame(t=40, bps=("Nose", "Center", "Tail_base"), seed=0):
    rng = np.random.default_rng(seed)
    cols = pd.MultiIndex.from_product([list(bps), ["x", "y"]])
    return pd.DataFrame(rng.normal(10, 3, size=(t, len(bps) * 2)), columns=cols)


def test_bp2polar_tab2polar():
    tab = _coords_frame()
    polar = du.tab2polar(tab)
    # The reference's bodypart-order expression (np.unique without
    # re-sorting the first-occurrence indices) yields SORTED bodypart
    # order — reproduced faithfully (deepof/utils.py:845-848).
    assert list(polar.columns) == [
        (bp, c) for bp in ("Center", "Nose", "Tail_base") for c in ("rho", "phi")
    ]
    xy = tab[("Nose",)].to_numpy()
    np.testing.assert_allclose(
        polar[("Nose", "rho")], np.hypot(xy[:, 0], xy[:, 1]), rtol=1e-12
    )
    np.testing.assert_allclose(
        polar[("Nose", "phi")], np.arctan2(xy[:, 1], xy[:, 0]), rtol=1e-12
    )
    one = du.bp2polar(tab[("Nose",)])
    np.testing.assert_allclose(one["rho"], polar[("Nose", "rho")])


def test_compute_dist_and_bpart_distance():
    tab = _coords_frame()
    pair = np.hstack([tab[("Nose",)].to_numpy(), tab[("Center",)].to_numpy()])
    d = du.compute_dist(pair)
    brute = np.linalg.norm(pair[:, :2] - pair[:, 2:], axis=1)
    np.testing.assert_allclose(d[0], brute, rtol=1e-12)

    alld = du.bpart_distance(tab)
    # combinations run over the SORTED level values, like the reference.
    assert ("Center", "Nose") in alld.columns
    np.testing.assert_allclose(alld[("Center", "Nose")], brute, rtol=1e-5)
    assert alld.shape[1] == 3  # C(3, 2)


def test_angle_and_signed_angle():
    t = 25
    rng = np.random.default_rng(1)
    stack = rng.normal(size=(3, t, 2))
    ang = du.angle(stack)
    a, b, c = stack
    ba, bc = a - b, c - b
    cos = (ba * bc).sum(1) / (
        np.linalg.norm(ba, axis=1) * np.linalg.norm(bc, axis=1)
    )
    np.testing.assert_allclose(ang, np.arccos(np.clip(cos, -1, 1)), rtol=1e-10)

    sc = du.signed_angle(stack)
    assert sc.shape == (t, 2)
    np.testing.assert_allclose(np.hypot(sc[:, 0], sc[:, 1]), 1.0, rtol=1e-10)
    # unsigned angle of the SIGNED construction (ab vs bc) relates via
    # arccos(cos(theta)) == angle between ab and bc
    np.testing.assert_allclose(
        np.arccos(np.clip(sc[:, 1], -1, 1)), du.angle(stack), rtol=1e-10
    )


def test_compute_areas_shoelace_and_nan():
    sq = np.array([[0, 0], [2, 0], [2, 2], [0, 2]], float)
    stack = np.stack([sq, sq * 3])
    np.testing.assert_allclose(du.compute_areas(stack), [4.0, 36.0], rtol=1e-6)
    stack[1, 0, 0] = np.nan
    out = du.compute_areas(stack)
    assert out[0] == pytest.approx(4.0) and np.isnan(out[1])


def test_rolling_window_and_savgol():
    a = np.arange(40, dtype=float).reshape(20, 2)
    w = du.rolling_window(a, 5, 2)
    assert w.shape == (8, 5, 2)
    np.testing.assert_array_equal(w[0, :, 0], np.arange(0, 10, 2) * 0 + a[:5, 0])

    scipy_signal = pytest.importorskip("scipy.signal")
    series = np.sin(np.linspace(0, 6, 100)) + np.random.default_rng(0).normal(
        0, 0.05, 100
    )
    sm = du.smooth_mult_trajectory(series, alpha=2, w_length=15)
    ref = scipy_signal.savgol_filter(series, 15, 13)
    np.testing.assert_allclose(sm, ref, atol=1e-4)
    np.testing.assert_array_equal(
        du.smooth_mult_trajectory(series, alpha=0), series
    )


def test_full_outlier_mask():
    tab = _coords_frame(t=100)
    tab.loc[50, ("Nose", "x")] += 500.0  # gross outlier
    lik = pd.DataFrame(
        np.ones((100, 3)), columns=["Nose", "Center", "Tail_base"]
    )
    lik.loc[10, "Center"] = 0.0  # low-likelihood frame
    mask = du.full_outlier_mask(tab, lik, 0.5, "Tail_base", lag=5, n_std=3, mode="or")
    assert "Tail_base" not in mask.columns.levels[0] or (
        ("Tail_base", "x") not in mask.columns
    )
    assert bool(mask.loc[50, ("Nose", "x")])
    assert bool(mask.loc[10, ("Center", "x")])
    assert not bool(mask.loc[5, ("Nose", "x")])


def test_point_polygon_distance():
    poly = np.array([[0, 0], [4, 0], [4, 4], [0, 4]], float)
    pts = np.array([[2, 5], [2, 2], [-3, 0]], float)
    d = du.get_point_polygon_distance(pts, poly)
    np.testing.assert_allclose(d, [1.0, 2.0, 3.0], atol=1e-6)


def test_mouse_tracking_imputer_partial_and_full():
    import networkx as nx

    t = 60
    rng = np.random.default_rng(0)
    base = rng.normal(size=(t, 2)).cumsum(0)
    cols = pd.MultiIndex.from_product([["Nose", "Center"], ["x", "y"]])
    tab = pd.DataFrame(
        np.hstack([base, base + [5.0, 0.0]]), columns=cols
    )
    tab.iloc[10:12, 0] = np.nan        # small gap: linear interp
    tab.iloc[30:45, 2] = np.nan        # big gap: full mode only

    part = du.MouseTrackingImputer().fit_transform(tab)
    assert not np.isnan(part[10:12, 0]).any()
    assert np.isnan(part[35, 2])  # beyond the 3-frame interp limit

    conn = nx.Graph([("Nose", "Center")])
    full = du.MouseTrackingImputer(
        connectivity=conn, full_imputation=True
    ).fit_transform(tab)
    assert not np.isnan(full).any()


def test_iterative_imputation_and_presence_mask():
    from types import SimpleNamespace

    t = 50
    rng = np.random.default_rng(2)
    cols = pd.MultiIndex.from_product([["B_Nose", "B_Center"], ["x", "y"]])
    tab = pd.DataFrame(rng.normal(size=(t, 4)).cumsum(0), columns=cols)
    tab.iloc[5:7, 1] = np.nan
    lik = pd.DataFrame(np.ones((t, 2)), columns=["B_Nose", "B_Center"])
    lik.iloc[:3] = 0.0  # animal absent at the start

    project = SimpleNamespace(animal_ids=["B"], connectivity=None)
    quality = du._as_quality_dict(project, {"exp": lik})
    masks = du.compute_animal_presence_mask(quality)
    assert list(masks["exp"]["B"][:4]) == [0, 0, 0, 1]

    out = du.iterative_imputation(project, {"exp": tab.copy()}, {"exp": lik})
    filled = out["exp"]
    assert not filled.iloc[5:7, 1].isna().any()  # small gap imputed
    assert filled.iloc[4:, :].notna().all().all()


def test_set_missing_animals_delegates():
    calls = []

    class Coords:
        def _set_missing_animals_frame(self, tab, key):
            calls.append(key)
            return tab * 0

    tabs = {"e": pd.DataFrame(np.ones((3, 2)))}
    out = du.set_missing_animals(Coords(), tabs, {})
    assert calls == ["e"] and (out["e"].to_numpy() == 0).all()


def test_digging_rotate_outside_ellipse():
    from deepof_tpu.annotate import digging, outside_ellipse, rotate

    qx, qy = rotate((0.0, 0.0), (1.0, 0.0), np.pi / 2)
    assert qx == pytest.approx(0.0, abs=1e-12) and qy == pytest.approx(1.0)

    outside = outside_ellipse(
        np.array([0.0, 5.0]), np.array([0.0, 0.0]), (0.0, 0.0), (2.0, 1.0), 0.0
    )
    np.testing.assert_array_equal(outside, [False, True])

    t = 120
    rng = np.random.default_rng(3)
    speeds = pd.DataFrame(
        {
            "Center": np.r_[np.zeros(60) + 0.1, np.ones(60) * 9],
            "Nose": np.ones(t) * 5.0,
        }
    )
    lik = pd.DataFrame({"Nose": np.ones(t)})
    dists = pd.DataFrame(
        {
            ("Left_ear", "Nose"): np.ones(t) * 0.5,
            ("Nose", "Right_ear"): np.ones(t) * 0.5,
        }
    )
    # make ear distances drop below 0.9*median in the immobile half
    dists.iloc[:60] = 0.2
    out = digging(
        speeds, dists, lik, "", np.zeros(t, bool), tol_speed=2.0,
        tol_likelihood=0.5, min_length=5,
    )
    assert out.dtype == bool and out[:40].mean() > 0.5 and not out[70:].any()


def test_get_contrastive_soft_counts_sticky_hmm():
    from deepof_tpu.msm import get_contrastive_soft_counts

    rng = np.random.default_rng(0)
    t = 400
    states = (np.arange(t) // 100) % 2
    z = np.where(states[:, None] == 0, -4.0, 4.0) + rng.normal(0, 0.3, (t, 3))
    embs = {"e0": z.astype(np.float32), "e1": z[::-1].astype(np.float32)}

    counts = get_contrastive_soft_counts(None, embs, states="bic", max_states=4)
    assert set(counts) == {"e0", "e1"}
    c = counts["e0"]
    assert c.shape == (t, 2)  # BIC recovers the 2 true states
    np.testing.assert_allclose(c.sum(1), 1.0, atol=1e-4)
    hard = c.argmax(1)
    flip = (hard != states).mean() > 0.5
    acc = ((1 - hard if flip else hard) == states).mean()
    assert acc > 0.98

    # prior biasing pulls posteriors toward a confident prior pointing
    # AWAY from the data-driven decode. The emissions here are extremely
    # separated (~1e3 nats/frame), so the weight must exceed that:
    # 500 * log(0.98/0.02) ~ 1.9e3 nats.
    prior = np.full((t, 2), 0.02)
    prior[np.arange(t), 1 - hard] = 0.98
    base_toward = (c * prior).sum(1).mean()
    biased = get_contrastive_soft_counts(
        None, embs, states=2, soft_counts={"e0": prior},
        min_confidence=0.5, prior_weight=500.0,
    )["e0"]
    assert (biased * prior).sum(1).mean() > base_toward + 0.3

    with pytest.raises(ValueError, match="must match"):
        get_contrastive_soft_counts(
            None, embs, states=3, soft_counts={"e0": prior}
        )


def test_postprocess_df_bins_and_effectsize_histogram():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from deepof_tpu.visuals_utils import (
        get_binned_geometry,
        plot_effectsize_histogram,
        postprocess_df_bins,
    )

    df = pd.DataFrame(
        {
            "exp_condition": ["A", "B"] * 6,
            "time_bin": [0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2],
            "behav": [1.0, 2.0, 1.5, 2.5, 3.0, 1.0, 2.0, 2.0,
                      np.nan, np.nan, np.nan, np.nan],
        }
    )
    hide = np.zeros(3, bool)
    with pytest.warns(UserWarning, match="excluded"):
        out, hide2 = postprocess_df_bins(df, [10, 10, 10], hide)
    assert "bin_length" in out.columns
    np.testing.assert_array_equal(hide2, [False, False, True])

    geom = get_binned_geometry([10, 10, 10])
    fig, ax = plt.subplots(subplot_kw={"projection": "polar"})
    handles, color = plot_effectsize_histogram(
        ax, geom, effect_size_categories=[1, 3, 2], hide_time_bins=hide2,
        max_value=5.0, bottom=0.0,
    )
    assert len(handles) == 3 and color == "#FFFF00"
    none_h, k = plot_effectsize_histogram(
        ax, geom, [1, 2, 3], hide2, 5.0, 0.0, show_histogram=False
    )
    assert none_h is None and k == "k"
    plt.close("all")


def test_gantt_plotter_renders_matrix():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from types import SimpleNamespace

    from deepof_tpu.visuals import gantt_plotter

    coords = SimpleNamespace(_frame_rate=25.0)
    m = np.zeros((2, 100), int)
    m[0, 10:30] = 1
    m[1, 50:60] = 1
    fig = gantt_plotter(
        coords, m, "supervised", "exp0", 5, ["a", "b"], ["#ff0000", "#00ff00"],
        behavior_mode=False, bin_info=None, bin_indices=np.arange(100),
        additional_checkpoints=np.array([40.0]),
        signal_overlay=pd.Series(np.sin(np.linspace(0, 3, 100)), name="sig"),
    )
    assert fig is not None
    plt.close("all")


def test_video_export_config_annotates_real_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    from types import SimpleNamespace

    from deepof_tpu.export_video import (
        VideoExportConfig,
        VideoExportProps,
        output_annotated_video,
    )

    vid = str(tmp_path / "e0.mp4")
    writer = cv2.VideoWriter(
        vid, cv2.VideoWriter_fourcc(*"mp4v"), 25.0, (64, 48)
    )
    for _ in range(10):
        writer.write(np.zeros((48, 64, 3), np.uint8))
    writer.release()

    t = 10
    coords = SimpleNamespace(
        _video_path=str(tmp_path),
        _videos={"e0": "e0.mp4"},
        _frame_rate=25.0,
        _project_path=str(tmp_path),
        _project_name="p",
        _animal_ids=[""],
        _nodes=["Nose", "Center"],
        _tables={"e0": np.tile([[10.0, 10.0], [30.0, 20.0]], (t, 1, 1))},
        _scales={"e0": [0, 0, 100.0, 100.0]},
        _arena="circular-autodetect",
        _arena_params={"e0": ((32, 24), (20, 15), 0.0)},
        _roi_dicts={"e0": {}},
    )
    sup = pd.DataFrame({"walking": np.ones(t)})
    out = output_annotated_video(
        coords, "e0", supervised_annotations={"e0": sup},
        config=VideoExportConfig(
            display_video_name=True, display_time=True, display_counter=True,
            display_arena=True, display_markers=True,
        ),
        props=VideoExportProps(font_scale=0.4),
        out_path=str(tmp_path / "out.mp4"),
    )
    assert os.path.exists(out) and os.path.getsize(out) > 0

    # The visuals-level wrapper routes the reference's kwarg surface
    # (visuals.py:3713-3930): experiment mode with display toggles, and
    # per-cluster snippet mode without experiment_id.
    from deepof_tpu.visuals import export_annotated_video

    out2 = export_annotated_video(
        coords, supervised_annotations={"e0": sup}, experiment_id="e0",
        display_time=True, display_counter=True, frame_limit_per_video=5,
        out_path=str(tmp_path / "out2.mp4"),
    )
    assert os.path.exists(out2) and os.path.getsize(out2) > 0

    sc = np.tile([0.1, 0.9], (t, 1))
    per_cluster = export_annotated_video(
        coords, soft_counts={"e0": sc}, min_bout_duration=1,
        frame_limit_per_video=5, cluster_names={1: "walking"},
        out_path=str(tmp_path / "clusters"),
    )
    assert isinstance(per_cluster, dict) and len(per_cluster) >= 1
    assert all(os.path.getsize(p) > 0 for p in per_cluster.values())


def test_numba_named_kernel_aliases():
    """The reference's *_numba kernel names (deepof/utils.py:70-4037)
    delegate to the XLA ops with identical contracts."""
    import deepof_tpu.utils as du

    # RTS smoother reduces measurement noise (constant-velocity model)
    T = 50
    F = np.array([[1.0, 1.0], [0.0, 1.0]])
    H = np.array([[1.0, 0.0]])
    rng = np.random.default_rng(0)
    true = np.cumsum(np.full(T, 0.3))
    meas = (true + rng.normal(0, 0.7, T)).reshape(-1, 1)
    sm = du.rts_smoother_numba(meas, F, H, np.eye(2) * 1e-3, np.eye(1) * 0.5)
    assert sm.shape == (T, 2)
    assert np.abs(sm[:, 0] - true).mean() < np.abs(meas[:, 0] - true).mean()

    # shoelace areas
    poly = np.array([[0, 0], [2, 0], [2, 1], [0, 1]], float)
    assert du.polygon_area_numba(poly) == 2.0
    np.testing.assert_allclose(
        du.compute_areas_numba(np.repeat(poly[None], 5, 0)), 2.0
    )

    # rotations
    np.testing.assert_allclose(
        du.rotate_numba(np.array([[1.0, 0.0]]), np.pi / 2), [[0, 1]],
        atol=1e-12,
    )
    np.testing.assert_allclose(
        du.rotate_all_numba(
            np.array([[1.0, 0.0, 0.0, 1.0]]), np.array([np.pi / 2])
        ),
        [[0, 1, -1, 0]], atol=1e-6,
    )

    # polygon membership + distances
    pts = np.array([[1.0, 0.5], [5.0, 5.0]])
    assert list(du.point_in_polygon_numba(pts, poly)) == [True, False]
    np.testing.assert_allclose(
        du.get_point_polygon_distance_numba(pts, poly),
        [0.5, np.hypot(3, 4)], atol=1e-6,
    )

    # bout utilities
    b = np.zeros((1, 10), bool)
    b[0, 2] = True
    ext = du.extend_behaviors_numba(b, delta_T=2.0, frame_rate=1.0)
    assert ext[0, 2:5].all() and not ext[0, 5:].any() and not ext[0, :2].any()
    fs = du.filter_short_true_segments_numba(
        np.array([1, 1, 0, 1, 0, 0, 1, 1, 1], bool), 2
    )
    assert list(fs) == [True, True, False, False, False, False, True, True, True]
    mm = du.binary_moving_median_numba(np.array([0, 1, 1, 1, 0, 0, 0, 1, 0, 0]), 3)
    assert mm[1:4].all() and not mm[4:].any()

    # Kleinberg DP returns 1-based levels, bursty gaps get higher states
    q = du.kleinberg_core_numba(
        np.array([1.0, 1.0, 0.05, 0.05, 1.0]), 2.0, 1.0, 6, 10.0, 4
    )
    assert q.shape == (5,) and q.min() >= 1

    # FOV kernel: angle out of (0, 180) -> all-nan, valid angle -> {0,1,nan}
    mp = np.stack([np.array([[0, -1], [0, 1], [1, 0]], float)] * 3)
    roi = np.array([[2, -1], [3, -1], [3, 1], [2, 1]], float)
    assert np.isnan(du.in_field_of_view_numba(mp, 200.0, roi)).all()
    fov = du.in_field_of_view_numba(mp, 90.0, roi)
    assert fov.shape == (3,)
    assert np.isin(fov[~np.isnan(fov)], [0.0, 1.0]).all()

    # skeleton constraints: the reference SKIPS frames whose bodypart 0 is
    # original; when it isn't, far-apart parts get pulled together
    dat = np.zeros((3, 2, 2))
    dat[:, 1, 0] = 3.0
    orig = np.zeros((3, 2, 2), bool)
    adj = du.enforce_skeleton_constraints_numba(dat, [(0, 1, 1.0)], orig)
    d_adj = np.abs(adj[:, 0, 0] - adj[:, 1, 0])
    assert (d_adj < 3.0).all()
    orig[:, 0] = True  # bodypart 0 original -> frame skipped upstream
    dat2 = du.enforce_skeleton_constraints_numba(dat, [(0, 1, 1.0)], orig)
    np.testing.assert_allclose(dat2, dat)

    assert repr(du.KeyErrorMessage("a\nb")) == "a\nb"


def test_arena_reference_named_entry_points(tmp_path):
    """automatically_recognize_arena / arena_parameter_extraction /
    get_random_frame (reference arena_utils.py:611-723,848,1036)."""
    cv2 = pytest.importorskip("cv2")
    from deepof_tpu import arena as da

    # disk mask -> ellipse params for circular, vertices for polygonal
    yy, xx = np.mgrid[:80, :100]
    disk = ((xx - 50) ** 2 + (yy - 40) ** 2 < 30**2).astype(np.uint8)
    (cx, cy), (a, b), ang = da.arena_parameter_extraction(
        disk, "circular-autodetect"
    )
    assert abs(cx - 50) < 2 and abs(cy - 40) < 2 and abs(a - 30) < 3
    poly = da.arena_parameter_extraction(disk, "polygonal-manual")
    assert poly.ndim == 2 and poly.shape[1] == 2

    # synthetic video with a bright circular arena
    vid = str(tmp_path / "arena.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 5, (100, 80))
    frame = np.zeros((80, 100, 3), np.uint8)
    cv2.circle(frame, (50, 40), 30, (255, 255, 255), -1)
    for _ in range(12):
        w.write(frame)
    w.release()

    rf = da.get_random_frame(vid)
    assert rf is not None and rf.shape[:2] == (80, 100)

    arena_fit, h, wdt = da.automatically_recognize_arena(
        {"v": "arena.mp4"}, "v", path=str(tmp_path),
        arena_type="circular-autodetect", num_sample_frames=5,
    )
    (cx, cy), (a, b), ang = arena_fit
    assert (h, wdt) == (80, 100)
    assert abs(cx - 50) < 3 and abs(cy - 40) < 3 and abs(a - 30) < 4


# --------------------------------------------------------------------------- #
# Migration layer part 2: the remaining deepof.utils public names
# (VERDICT r4 missing #3), A/B-pinned against the REAL reference where its
# dependency surface allows, independent oracles otherwise.
# --------------------------------------------------------------------------- #


@pytest.fixture(scope="module")
def ref_utils():
    from reference_shim import load_reference

    return load_reference().utils


def test_moving_average_and_rotate_ab(ref_utils):
    rng = np.random.default_rng(3)
    x = rng.normal(size=200)
    np.testing.assert_allclose(
        du.moving_average(x, lag=7), ref_utils.moving_average(pd.Series(x), 7),
        rtol=1e-12,
    )
    p = rng.normal(size=(10, 2))
    for ang in (0.0, 0.7, -2.1):
        np.testing.assert_allclose(
            du.rotate(p, ang), ref_utils.rotate(p, ang), rtol=1e-12
        )
    np.testing.assert_allclose(
        du.rotate(p, 0.5, origin=np.array([2.0, -1.0])),
        ref_utils.rotate(p, 0.5, origin=np.array([2.0, -1.0])),
        rtol=1e-12,
    )


def test_align_trajectories_ab(ref_utils):
    rng = np.random.default_rng(4)
    data = rng.normal(size=(6, 11, 8))  # (windows, length, 4 bps x 2)
    for mode in ("all", "center", "none"):
        np.testing.assert_allclose(
            du.align_trajectories(data, mode=mode),
            ref_utils.align_trajectories(data.copy(), mode=mode),
            rtol=1e-5, atol=1e-5,
        )


def test_mask_and_remove_outliers_ab(ref_utils):
    rng = np.random.default_rng(5)
    t = 120
    tab = _coords_frame(t=t)
    # Inject genuine spikes so the masks are non-trivial.
    tab.iloc[40, 0] += 80.0
    tab.iloc[40, 1] += 80.0
    tab.iloc[77, 2] -= 60.0
    lik = pd.DataFrame(
        np.clip(rng.beta(9, 1, size=(t, 3)), 0, 1),
        columns=pd.MultiIndex.from_product(
            [["Nose", "Center", "Tail_base"], ["likelihood"]]
        ),
    )
    lik.iloc[10, 0] = 0.1  # low-likelihood outlier
    ref_lik = lik.copy()
    ref_lik.columns = ["Nose", "Center", "Tail_base"]

    ours = du.mask_outliers(
        tab[("Nose",)], lik[("Nose", "likelihood")], 0.75, 5, 2, "or"
    )
    theirs = ref_utils.mask_outliers(
        tab[("Nose",)], ref_lik["Nose"], 0.75, 5, 2, "or"
    )
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(theirs))
    assert ours.to_numpy().any()

    ours_exp, ours_warn = du.remove_outliers(tab, ref_lik, 0.75, "", 5, 2, "or")
    theirs_exp, theirs_warn = ref_utils.remove_outliers(
        tab, ref_lik, 0.75, "", 5, 2, "or"
    )
    np.testing.assert_allclose(
        ours_exp.to_numpy(), theirs_exp.to_numpy(), rtol=1e-10, equal_nan=True
    )
    assert ours_warn == theirs_warn


def test_rolling_speed_ab(ref_utils):
    # NOTE: _coords_frame's bodyparts are unsorted (Nose before Center), so
    # this also pins the reference's label-permutation quirk (data in
    # DataFrame order, labels np.unique-sorted) being reproduced.
    tab = _coords_frame(t=60)
    for deriv in (1, 2):
        ours = du.rolling_speed(tab, frame_rate=25, deriv=deriv)
        theirs = ref_utils.rolling_speed(tab, frame_rate=25, deriv=deriv)
        assert list(ours.columns) == list(theirs.columns)
        o, t = ours.to_numpy(), theirs.to_numpy()
        if deriv == 1:
            np.testing.assert_allclose(o, t, rtol=1e-4, atol=1e-4, equal_nan=True)
        else:
            # deriv>=2 inputs are 3-decimal-rounded speeds, so window means
            # land EXACTLY on round-half boundaries; accumulation-order ULPs
            # flip the tie by one rounding step (0.001 * frame_rate = 0.025).
            # Allow that flip on isolated elements, nothing more.
            close = np.isclose(o, t, atol=0.026) | (np.isnan(o) & np.isnan(t))
            assert close.all()
            exact = np.isclose(o, t, atol=1e-9) | (np.isnan(o) & np.isnan(t))
            assert exact.mean() > 0.95


def test_multi_step_paired_smoothing_and_filter_ab(ref_utils):
    rng = np.random.default_rng(6)
    raw = rng.random(400) < 0.3
    ours = du.multi_step_paired_smoothing(raw, min_length=6)
    theirs = ref_utils.multi_step_paired_smoothing(raw.copy(), min_length=6)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(theirs))
    both_o = du.multi_step_paired_smoothing(raw, min_length=4, get_both=True)
    both_t = ref_utils.multi_step_paired_smoothing(
        raw.copy(), min_length=4, get_both=True
    )
    for a, b in zip(both_o, both_t):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    seg = rng.random(200) < 0.4
    np.testing.assert_array_equal(
        du.filter_short_true_segments(seg, 4),
        ref_utils.filter_short_true_segments(seg.copy(), 4),
    )


def test_kleinberg_and_smooth_boolean_ab(ref_utils):
    rng = np.random.default_rng(7)
    offsets = np.unique(rng.choice(3000, size=120, replace=False))
    ours = du.kleinberg(offsets, s=2.0, gamma=1.0)
    theirs = ref_utils.kleinberg(offsets, s=2.0, gamma=1.0)
    assert np.asarray(ours).shape == np.asarray(theirs).shape
    np.testing.assert_array_equal(
        np.asarray(ours, float), np.asarray(theirs, float)
    )

    raw = rng.random(1500) < 0.15
    np.testing.assert_array_equal(
        du.smooth_boolean_array(raw, scale=1, sigma=2.0),
        ref_utils.smooth_boolean_array(raw.copy(), scale=1, sigma=2.0),
    )


def test_cluster_transition_matrix_ab(ref_utils):
    rng = np.random.default_rng(8)
    seq = rng.integers(0, 5, size=400)
    ours, ours_ac = du.cluster_transition_matrix(seq.astype(float), 5)
    theirs, theirs_ac = ref_utils.cluster_transition_matrix(seq.copy(), 5)
    np.testing.assert_allclose(ours, theirs, atol=2e-3)
    np.testing.assert_allclose(ours_ac, theirs_ac, rtol=1e-8)


def test_point_in_polygon_and_fov_wrappers():
    # Polygon given as vertex array AND as a shapely-like object with
    # .exterior.coords (the reference's call convention).
    square = np.array([(0, 0), (10, 0), (10, 10), (0, 10)], float)

    class _FakePolygon:
        class _Ext:
            coords = [(0, 0), (10, 0), (10, 10), (0, 10), (0, 0)]

        exterior = _Ext()

    pts = np.array([(5, 5), (11, 5), (-1, -1), (9.5, 0.5)])
    inside = du.point_in_polygon(pts, square)
    np.testing.assert_array_equal(inside, [True, False, False, True])
    np.testing.assert_array_equal(
        du.point_in_polygon(pts, _FakePolygon()), inside
    )

    # Mouse at the center looking +x: ROI to the right is in view, after
    # rotating the mouse 180 degrees it is not.
    ears_nose = np.array([[(0, 1), (2, 0), (0, -1)]], float)  # gaze +x
    roi = np.array([(5, -1), (7, -1), (7, 1), (5, 1)], float)
    assert du.in_field_of_view(ears_nose, 60.0, roi)[0] == 1.0
    flipped = ears_nose * np.array([-1, 1])
    assert du.in_field_of_view(flipped, 60.0, roi)[0] == 0.0
    # 2D single-frame input is promoted like the reference's.
    assert du.in_field_of_view(ears_nose[0], 60.0, roi).shape == (1,)


def test_extract_windows_wrapper():
    rng = np.random.default_rng(9)
    tabs = {"a": rng.normal(size=(30, 4)), "b": rng.normal(size=(21, 4))}
    out, shape = du.extract_windows(
        {k: v.copy() for k, v in tabs.items()}, window_size=5, window_step=1
    )
    assert shape == (26 + 17, 5, 4)
    windows_a = np.asarray(out["a"])
    np.testing.assert_allclose(windows_a[0], tabs["a"][:5], rtol=1e-12)
    np.testing.assert_allclose(windows_a[-1], tabs["a"][25:30], rtol=1e-12)
    # Aggregations reduce the window axis to one row.
    out_mid, shape_mid = du.extract_windows(
        {k: v.copy() for k, v in tabs.items()}, 5, 1, aggregate="mid"
    )
    assert shape_mid[1] == 1
    np.testing.assert_allclose(np.asarray(out_mid["a"])[0, 0], tabs["a"][2])


def test_condition_loaders_ab(ref_utils, tmp_path):
    csv = tmp_path / "conditions.csv"
    csv.write_text(
        ",experiment_id,CSDS,sex\n0,test,Stressed,male\n1,test2,Control,female\n"
    )
    ours = du.load_exp_conditions(str(csv))
    theirs = ref_utils.load_exp_conditions(str(csv))
    assert set(ours) == set(theirs) == {"test", "test2"}
    for key in ours:
        pd.testing.assert_frame_equal(ours[key], theirs[key])

    # Uniform dtypes per file (mixed int/str columns read as all-str,
    # which both implementations reject): one frame-int file, one
    # time-string file.
    m_int = tmp_path / "markers_int.csv"
    m_int.write_text(",experiment_id,start\n0,test,250\n1,test2,500\n")
    m_time = tmp_path / "markers_time.csv"
    m_time.write_text(
        ",experiment_id,start\n0,test,00:01:30.5\n1,test2,00:02:00\n"
    )
    ours_m = du.load_start_markers(str(m_time), frame_rate=25)
    theirs_m = ref_utils.load_start_markers(str(m_time), frame_rate=25)
    for key in ours_m:
        assert list(ours_m[key].iloc[0]) == list(theirs_m[key].iloc[0])
    # Frame-int markers: the reference converts them to time strings via a
    # chained assignment (utils.py:810) that silently no-ops under
    # pandas 3, so no direct A/B is possible — pin the INTENDED behavior
    # (the conversion) against the reference's own seconds_to_time.
    ours_i = du.load_start_markers(str(m_int), frame_rate=25)
    assert ours_i["test"].iloc[0, 0] == ref_utils.seconds_to_time(
        250 / 25, cut_milliseconds=False
    )
    assert ours_i["test2"].iloc[0, 0] == ref_utils.seconds_to_time(
        500 / 25, cut_milliseconds=False
    )


def test_reexported_graph_and_evaluation_names():
    g = du.connect_mouse(graph_preset="deepof_14")
    assert len(g.nodes) == 14
    bridges = du.enumerate_all_bridges(g)
    assert all(len(b) == 3 for b in bridges)

    rng = np.random.default_rng(10)
    x = np.vstack(
        [rng.normal(0, 1, size=(40, 3)), rng.normal(6, 1, size=(40, 3))]
    )
    model, bic = du.gmm_compute(x, 2, "full")
    assert np.isfinite(bic) and model.means_.shape == (2, 3)


def test_utils_public_name_diff_is_empty():
    """Every public deepof.utils name resolves on deepof_tpu.utils."""
    import ast

    ref_ast = ast.parse(open("/root/reference/deepof/utils.py").read())
    ref_names = {
        n.name
        for n in ref_ast.body
        if isinstance(n, (ast.FunctionDef, ast.ClassDef))
        and not n.name.startswith("_")
    }
    missing = sorted(ref_names - set(dir(du)))
    assert missing == [], missing


@pytest.mark.parametrize(
    "ref_file,repo_module",
    [
        ("arena_utils.py", "deepof_tpu.arena"),
        ("annotation_utils.py", "deepof_tpu.annotate"),
        ("post_hoc.py", "deepof_tpu.posthoc"),
        ("visuals.py", "deepof_tpu.visuals"),
        ("visuals_utils.py", "deepof_tpu.visuals_utils"),
        ("data_loading.py", "deepof_tpu.core.storage"),
        ("export_video.py", "deepof_tpu.export_video"),
    ],
)
def test_module_public_name_diff_is_empty(ref_file, repo_module):
    """Every public top-level name of each reference module resolves on
    its deepof_tpu counterpart (the migration-layer completeness check
    the round-4 verdict asked for, generalized beyond utils)."""
    import ast
    import importlib

    ref_ast = ast.parse(open(f"/root/reference/deepof/{ref_file}").read())
    ref_names = {
        n.name
        for n in ref_ast.body
        if isinstance(n, (ast.FunctionDef, ast.ClassDef))
        and not n.name.startswith("_")
    }
    mod = importlib.import_module(repo_module)
    missing = sorted(ref_names - set(dir(mod)))
    assert missing == [], missing
