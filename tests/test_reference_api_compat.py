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
