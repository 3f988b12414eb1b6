"""Kernel parity tests: deepof_tpu.ops vs pandas/scipy/numpy oracles.

These oracles reproduce the reference implementations' behavior (they use
the same underlying libraries the reference calls), so passing here means
matching mlfpm/deepof's numerics without importing its code.
"""

import numpy as np
import pandas as pd
import pytest
from scipy.signal import savgol_filter

import jax.numpy as jnp

from deepof_tpu import ops

RNG = np.random.default_rng(42)


# --------------------------------------------------------------------- #
# interp
# --------------------------------------------------------------------- #


@pytest.mark.parametrize("limit", [None, 1, 3])
def test_linear_interpolate_limit_matches_pandas(limit):
    x = RNG.normal(size=200).astype(np.float64)
    mask = RNG.random(200) < 0.3
    x[mask] = np.nan
    x[:4] = np.nan
    x[-5:] = np.nan

    expected = (
        pd.Series(x)
        .interpolate(method="linear", limit=limit, limit_direction="both")
        .values
    )
    got = np.asarray(ops.linear_interpolate_limit(jnp.asarray(x), limit))
    np.testing.assert_allclose(got, expected, rtol=1e-6, equal_nan=True)


def test_interpolate_all_nan_column():
    x = np.full(50, np.nan)
    got = np.asarray(ops.linear_interpolate_limit(jnp.asarray(x), 3))
    assert np.isnan(got).all()


# --------------------------------------------------------------------- #
# smoothing
# --------------------------------------------------------------------- #


@pytest.mark.parametrize("window,alpha", [(15, 1), (15, 2), (11, 4)])
def test_savgol_matches_scipy(window, alpha):
    polyorder = window - alpha
    x = RNG.normal(size=(300, 6)).astype(np.float64)
    expected = savgol_filter(x, polyorder=polyorder, window_length=window, axis=0)
    got = np.asarray(ops.savgol_smooth(jnp.asarray(x), window, polyorder))
    # polyorder close to window-1 makes the edge polynomial fit nearly
    # singular (condition ~1e12); scipy's own result carries ~1e-5 noise
    # there, so the comparison tolerance scales with the degeneracy.
    atol = 1e-4 if polyorder >= window - 2 else 1e-8
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=atol)


@pytest.mark.parametrize("lag", [3, 4, 5, 8])
def test_moving_average_matches_numpy_convolve(lag):
    x = RNG.normal(size=157)
    expected = np.convolve(x, np.ones(lag) / lag, mode="same")
    got = np.asarray(ops.moving_average(jnp.asarray(x), lag))
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("lag", [5, 11, 25])
def test_binary_moving_median(lag):
    x = RNG.random(300) < 0.4
    pad = (lag - 1) // 2
    expected = np.zeros(len(x), dtype=bool)
    for i in range(pad, len(x) - pad):
        expected[i] = np.sum(x[i - pad : i + pad + 1]) > pad
    got = np.asarray(ops.binary_moving_median(jnp.asarray(x), lag))
    np.testing.assert_array_equal(got, expected)


# --------------------------------------------------------------------- #
# outliers
# --------------------------------------------------------------------- #


def _reference_mask_outliers(xy, lik, tol, lag, n_std, mode):
    """Direct numpy transcription of the reference criterion."""
    t, b, _ = xy.shape
    mask = np.zeros((t, b), dtype=bool)
    for j in range(b):
        mx = np.convolve(xy[:, j, 0], np.ones(lag) / lag, mode="same")
        my = np.convolve(xy[:, j, 1], np.ones(lag) / lag, mode="same")
        rx = xy[:, j, 0] - mx
        ry = xy[:, j, 1] - my
        ox = np.abs(rx) > np.mean(rx[lag:-lag]) + n_std * np.std(rx[lag:-lag])
        oy = np.abs(ry) > np.mean(ry[lag:-lag]) + n_std * np.std(ry[lag:-lag])
        ol = lik[:, j] < tol
        mask[:, j] = ((ox & oy) if mode == "and" else (ox | oy)) | ol
    return mask


@pytest.mark.parametrize("mode", ["and", "or"])
def test_mask_outliers(mode):
    t, b = 400, 5
    xy = np.cumsum(RNG.normal(size=(t, b, 2)), axis=0)
    xy[100, 2] += 50.0  # inject an outlier
    lik = RNG.random((t, b))
    expected = _reference_mask_outliers(xy, lik, 0.1, 5, 3.0, mode)
    got = np.asarray(
        ops.mask_outliers(jnp.asarray(xy), jnp.asarray(lik), 0.1, 5, 3.0, mode)
    )
    np.testing.assert_array_equal(got, expected)


# --------------------------------------------------------------------- #
# kinematics
# --------------------------------------------------------------------- #


def test_pairwise_distances():
    x = RNG.normal(size=(50, 6, 2))
    pairs = ops.all_pair_indices(6)
    got = np.asarray(ops.pairwise_distances(jnp.asarray(x), pairs))
    for p, (i, j) in enumerate(pairs):
        expected = np.linalg.norm(x[:, i] - x[:, j], axis=-1)
        np.testing.assert_allclose(got[:, p], expected, rtol=1e-6)


def test_bridge_angles():
    x = RNG.normal(size=(50, 5, 2))
    bridges = np.array([[0, 1, 2], [2, 3, 4]], dtype=np.int32)
    got = np.asarray(ops.bridge_angles(jnp.asarray(x), bridges))
    for k, (a, c, b) in enumerate(bridges):
        ba = x[:, a] - x[:, c]
        bc = x[:, b] - x[:, c]
        cos = np.einsum("ti,ti->t", ba, bc) / (
            np.linalg.norm(ba, axis=1) * np.linalg.norm(bc, axis=1)
        )
        expected = np.arccos(np.clip(cos, -1, 1))
        np.testing.assert_allclose(got[:, k], expected, rtol=1e-5, atol=1e-6)


def test_polygon_areas_shoelace_and_nan():
    # Unit square has area 1.
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    x = np.tile(sq[None], (10, 1, 1))
    x = np.concatenate([x, np.zeros((10, 1, 2))], axis=1)  # extra unused node
    poly = np.array([0, 1, 2, 3], dtype=np.int32)
    got = np.asarray(ops.polygon_areas(jnp.asarray(x), poly))
    np.testing.assert_allclose(got, np.ones(10), rtol=1e-6)

    x[3, 1] = np.nan
    got = np.asarray(ops.polygon_areas(jnp.asarray(x), poly))
    assert np.isnan(got[3]) and not np.isnan(got[4])


def test_rolling_speed_matches_pandas():
    t, b = 200, 4
    frame_rate = 25.0
    xy = np.cumsum(RNG.normal(size=(t, b, 2)), axis=0)

    #

    def pandas_speed(xy, window=3, rounds=3, shift=2):
        flat = pd.DataFrame(xy.reshape(t, -1))
        shifted = flat.shift(shift)
        d = (flat.values - shifted.values) / shift
        dist = np.sqrt(d[:, 0::2] ** 2 + d[:, 1::2] ** 2)
        dist = pd.DataFrame(dist)
        return np.round(dist.rolling(window).mean(), rounds).values * frame_rate

    expected = pandas_speed(xy)
    got = np.asarray(ops.rolling_speed(jnp.asarray(xy), frame_rate=frame_rate))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4, equal_nan=True)


def test_to_polar():
    x = RNG.normal(size=(30, 3, 2))
    got = np.asarray(ops.to_polar(jnp.asarray(x)))
    c = x[..., 0] + 1j * x[..., 1]
    np.testing.assert_allclose(got[..., 0], np.abs(c), rtol=1e-6)
    np.testing.assert_allclose(got[..., 1], np.angle(c), rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------------- #
# alignment
# --------------------------------------------------------------------- #


def test_align_trajectories_puts_part0_on_y_axis():
    x = RNG.normal(size=(40, 5, 2))
    aligned = np.asarray(ops.align_trajectories(jnp.asarray(x), mode="all"))
    # part 0 should land on the +y axis: x ~ 0, y = radius
    np.testing.assert_allclose(aligned[:, 0, 0], 0.0, atol=1e-5)
    np.testing.assert_allclose(
        aligned[:, 0, 1], np.linalg.norm(x[:, 0], axis=-1), rtol=1e-5
    )
    # distances are preserved by rotation
    d_before = np.linalg.norm(x[:, 1] - x[:, 3], axis=-1)
    d_after = np.linalg.norm(aligned[:, 1] - aligned[:, 3], axis=-1)
    np.testing.assert_allclose(d_before, d_after, rtol=1e-5)


# --------------------------------------------------------------------- #
# imputation
# --------------------------------------------------------------------- #


def test_kalman_rts_smooth_tracks_signal():
    t = 300
    clean = np.stack(
        [np.sin(np.linspace(0, 8, t)), np.cos(np.linspace(0, 8, t))], axis=-1
    )[:, None, :]
    noisy = clean + RNG.normal(size=clean.shape) * 0.05
    smoothed = np.asarray(ops.kalman_rts_smooth(jnp.asarray(noisy)))
    err_noisy = np.abs(noisy - clean).mean()
    err_smooth = np.abs(smoothed[20:-20] - clean[20:-20]).mean()
    assert err_smooth < err_noisy


def test_skeleton_constraints_pull_to_rest_length():
    t, b = 20, 3
    data = np.zeros((t, b, 2))
    data[:, 1, 0] = 10.0  # edge 0-1 at 10, rest length 5 -> should shrink
    data[:, 2, 1] = 5.0
    orig = np.zeros((t, b, 2), dtype=bool)  # nothing original -> all adjusted
    constraints = [(0, 1, 5.0)]
    out = np.asarray(
        ops.enforce_skeleton_constraints(
            jnp.asarray(data), constraints, jnp.asarray(orig)
        )
    )
    d_after = np.linalg.norm(out[:, 0] - out[:, 1], axis=-1)
    assert (d_after < 10.0).all() and (d_after > 5.0).all()


def test_skeleton_constraints_skips_original_frames():
    t, b = 4, 2
    data = np.zeros((t, b, 2))
    data[:, 1, 0] = 10.0
    orig = np.ones((t, b, 2), dtype=bool)  # bodypart 0 original -> frame skipped
    out = np.asarray(
        ops.enforce_skeleton_constraints(
            jnp.asarray(data), [(0, 1, 5.0)], jnp.asarray(orig)
        )
    )
    np.testing.assert_allclose(out, data)


def test_iterative_ridge_impute_fills_correlated_features():
    t = 400
    z = RNG.normal(size=(t, 1))
    data = np.concatenate([z, 2 * z + 0.01 * RNG.normal(size=(t, 1))], axis=1)
    truth = data.copy()
    miss = RNG.random(t) < 0.2
    data[miss, 1] = np.nan
    out = np.asarray(ops.iterative_ridge_impute(jnp.asarray(data)))
    assert np.isfinite(out).all()
    err = np.abs(out[miss, 1] - truth[miss, 1]).mean()
    assert err < 0.2


def test_estimate_skeleton_constraints():
    t = 500
    data = RNG.normal(size=(t, 3, 2))
    data[:, 1] = data[:, 0] + np.array([3.0, 4.0])  # dist 5
    data[10, 0, 0] = np.nan
    cons = ops.estimate_skeleton_constraints(data, [(0, 1)])
    assert len(cons) == 1
    assert abs(cons[0][2] - 5.0) < 1e-6


# --------------------------------------------------------------------- #
# geometry
# --------------------------------------------------------------------- #


def test_point_in_polygon_square():
    square = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    pts = np.array([[5, 5], [15, 5], [-1, 3], [9.99, 9.99]])
    got = np.asarray(ops.point_in_polygon(jnp.asarray(pts), square))
    np.testing.assert_array_equal(got, [True, False, False, True])


def test_point_to_polygon_distance():
    square = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float)
    pts = np.array([[5, 5], [5, -3], [12, 5], [np.nan, 1.0]])
    got = np.asarray(ops.point_to_polygon_distance(jnp.asarray(pts), square))
    np.testing.assert_allclose(got[:3], [5.0, 3.0, 2.0], rtol=1e-6)
    assert np.isnan(got[3])


def test_geometry_host_twins_match_jitted():
    """The host numpy twins the supervised rule battery uses are equal to
    the jitted kernels on random points (NaNs included) and polygons."""
    from deepof_tpu.ops.geometry import (
        ellipse_to_polygon,
        point_in_polygon_host,
        point_to_polygon_distance_host,
    )

    polys = [
        np.array([[0, 0], [10, 0], [10, 10], [0, 10]], dtype=float),
        ellipse_to_polygon(np.array([5.0, -2.0]), np.array([7.0, 3.0]), 30.0),
        np.array([[0, 0], [8, 1], [9, 7], [4, 10], [-2, 5]], dtype=float),
    ]
    pts = RNG.normal(scale=8.0, size=(300, 2))
    pts[::17] = np.nan
    pts[5, 0] = np.nan  # one-coordinate NaN
    for poly in polys:
        want_in = np.asarray(ops.point_in_polygon(jnp.asarray(pts), poly))
        got_in = point_in_polygon_host(pts, poly)
        np.testing.assert_array_equal(got_in, want_in)

        want_d = np.asarray(
            ops.point_to_polygon_distance(jnp.asarray(pts), poly)
        )
        got_d = point_to_polygon_distance_host(pts, poly)
        np.testing.assert_allclose(got_d, want_d, rtol=1e-5, equal_nan=True)

        # the fused host path (native C++ when available) agrees too
        from deepof_tpu.ops.geometry import point_polygon_host

        fd, fi = point_polygon_host(pts, poly)
        np.testing.assert_allclose(fd, want_d, rtol=1e-9, equal_nan=True)
        np.testing.assert_array_equal(fi, want_in)


# --------------------------------------------------------------------- #
# windows
# --------------------------------------------------------------------- #


@pytest.mark.parametrize("step", [1, 2, 5])
def test_rolling_windows_matches_stride_tricks(step):
    x = RNG.normal(size=(101, 7))
    w = 25
    shape = (x.shape[0] - w + 1, w) + x.shape[1:]
    strides = (x.strides[0],) + x.strides
    expected = np.lib.stride_tricks.as_strided(x, shape=shape, strides=strides)[::step]
    got = np.asarray(ops.rolling_windows(jnp.asarray(x), w, step))
    np.testing.assert_allclose(got, expected, rtol=1e-7)


def test_wta_matches_scipy_mode():
    from scipy.stats import mode

    from deepof_tpu.ops.windows import aggregate_windows_labels

    labels = RNG.integers(0, 3, size=(40, 9, 5))
    got = aggregate_windows_labels(labels, "wta")
    expected = mode(labels, axis=1).mode
    np.testing.assert_array_equal(got[:, 0, :], expected)


def test_lta_least_frequent_row():
    from deepof_tpu.ops.windows import aggregate_windows_labels

    # reference semantics: least frequent row combination per window
    # (deepof/utils.py:3455-3462)
    labels = RNG.integers(0, 2, size=(30, 7, 4))
    got = aggregate_windows_labels(labels, "lta")
    for i in range(labels.shape[0]):
        rows, counts = np.unique(labels[i], return_counts=True, axis=0)
        np.testing.assert_array_equal(got[i, 0], rows[np.argmin(counts)])


# --------------------------------------------------------------------- #
# bouts
# --------------------------------------------------------------------- #


def _reference_filter_short(array, min_length):
    n = len(array)
    out = np.zeros(n, dtype=bool)
    count = 0
    for i in range(n):
        if array[i]:
            count += 1
        else:
            if count >= min_length:
                out[i - count : i] = True
            count = 0
    if count >= min_length:
        out[n - count : n] = True
    return out


@pytest.mark.parametrize("min_length", [1, 3, 6])
def test_filter_short_true_segments(min_length):
    a = RNG.random(500) < 0.5
    expected = _reference_filter_short(a, min_length)
    got = np.asarray(ops.filter_short_true_segments(jnp.asarray(a), min_length))
    np.testing.assert_array_equal(got, expected)


def test_extend_behaviors():
    b = np.zeros((2, 50), dtype=bool)
    b[0, 10:15] = True
    ext = np.asarray(ops.extend_behaviors(jnp.asarray(b), delta_t=2.0, frame_rate=2.0))
    assert ext[0, 10:19].all()  # extended by 4 frames past offset at 15
    assert not ext[0, 19 + 1 :].any()
    assert not ext[1].any()


def test_multi_step_paired_smoothing_merges_and_filters():
    a = np.zeros(200, dtype=bool)
    a[50:70] = True
    a[72:90] = True  # close bouts should merge
    a[150] = True    # isolated blip should vanish
    out = np.asarray(ops.multi_step_paired_smoothing(jnp.asarray(a), min_length=6))
    assert out[55:85].all()
    assert not out[145:155].any()


def _reference_paired_smoothing(behavior, not_behavior, exclude, min_length):
    """Inline emulation of the reference cascade (utils.py:3260-3352):
    np.convolve moving averages, a per-frame conflict loop, binary moving
    median, and short-segment filtering — the bit-exact oracle."""

    def mavg(x, lag):
        return np.convolve(x, np.ones(lag) / lag, mode="same")

    b = mavg(behavior, min_length).astype(bool)
    n = mavg(not_behavior, min_length).astype(bool)
    b_avg = mavg(b.astype(float), min_length * 4)
    n_avg = mavg(n.astype(float), min_length * 4)
    for i in range(len(b)):  # utils.py:3285-3296
        if b[i] and n[i]:
            if b_avg[i] >= n_avg[i]:
                n[i] = False
            else:
                b[i] = False
    b &= exclude
    n &= exclude
    pad = (min_length * 4) // 2
    med = np.zeros(len(b), dtype=bool)
    for i in range(pad, len(b) - pad):  # utils.py:3519-3534
        med[i] = b[i - pad : i + pad + 1].sum() > pad
    b = med
    n &= ~b

    def fshort(x):
        out = np.zeros(len(x), dtype=bool)
        count = 0
        for i in range(len(x)):  # utils.py:4000-4036
            if x[i]:
                count += 1
            else:
                if count >= min_length:
                    out[i - count : i] = True
                count = 0
        if count >= min_length:
            out[len(x) - count :] = True
        return out

    b, n = fshort(b), fshort(n)
    return b & exclude, n & exclude


def test_multi_step_paired_smoothing_host_matches_reference_cascade():
    """The host twin used by the supervised annotators is bit-identical to
    the reference cascade — including exact conflict-average ties, which
    both sides resolve through the same np.convolve float64 noise."""
    from deepof_tpu.ops.bouts import multi_step_paired_smoothing_host

    rng = np.random.default_rng(7)
    for _ in range(8):
        a = rng.random(300) < 0.35
        nb = rng.random(300) < 0.35
        excl = rng.random(300) < 0.9
        host_b, host_n = multi_step_paired_smoothing_host(
            a, nb, excl, min_length=6, get_both=True
        )
        ref_b, ref_n = _reference_paired_smoothing(a.copy(), nb.copy(), excl, 6)
        np.testing.assert_array_equal(host_b, ref_b)
        np.testing.assert_array_equal(host_n, ref_n)

    # And it agrees with the jitted cascade on a tie-free input (the two
    # only ever differ on exact conflict-average ties).
    a = np.zeros(200, dtype=bool)
    a[40:80] = True
    a[83:120] = True
    host = multi_step_paired_smoothing_host(a, min_length=6)
    jit = np.asarray(ops.multi_step_paired_smoothing(jnp.asarray(a), min_length=6))
    np.testing.assert_array_equal(host, jit)


# --------------------------------------------------------------------- #
# bursts (kleinberg, host-side)
# --------------------------------------------------------------------- #


def test_kleinberg_finds_burst():
    # Sparse background with one dense burst in the middle.
    offsets = np.concatenate(
        [np.arange(0, 100, 10), np.arange(100, 110, 1), np.arange(110, 200, 10)]
    )
    bursts = ops.kleinberg(offsets, s=2.0, gamma=1.0)
    # Level-0 burst always spans the full range.
    assert bursts[0][0] == 0
    levels = [b[0] for b in bursts]
    assert max(levels) >= 1
    hi = [b for b in bursts if b[0] >= 1]
    assert any(b[1] >= 99 and b[2] <= 111 for b in hi)


def test_smooth_boolean_array():
    # Sparse background detections with one dense block: the dense block
    # reaches a higher burst level and survives smoothing.
    a = np.zeros(500, dtype=bool)
    a[::25] = True
    a[100:140:2] = True
    out = ops.smooth_boolean_array(a, scale=1)
    assert out[110:130].any()
    assert not out[300:].any()


def test_parity_utils_batch():
    """New reference-parity utilities (utils.py public surface)."""
    import pandas as pd

    from deepof_tpu.utils import (
        align_embeddings_at_key,
        count_events,
        edges_to_weighted_adj,
        filter_short_bouts,
        get_behavior_mask_and_confidence,
        get_unsupervised_behaviors_in_roi,
        infer_scalar_cols,
        mouse_in_roi,
        row_nanargmax,
        validate_parameter,
    )

    b = np.array([0, 1, 1, 0, 1, 1, 1, 0], float)
    assert count_events(b, "Events") == 2
    assert count_events(b, "Frames") == 5
    assert count_events(b, "Time", frame_rate=5) == 1.0
    assert count_events(b, "Transitions") == 3
    assert count_events(np.array([1, 1, 0.0]), "Events") == 1  # starts active

    arr = np.array([[np.nan, np.nan], [1.0, 2.0], [3.0, 0.0]])
    got = row_nanargmax(arr)
    assert np.isnan(got[0]) and got[1] == 1 and got[2] == 0

    assigns = np.array([0, 0, 0, 1, 0, 0, 0])
    conf = np.array([0.9, 0.9, 0.9, 0.2, 0.9, 0.9, 0.9])
    keep = filter_short_bouts(assigns, conf, np.ones(7, bool),
                              min_confidence=0.5, min_bout_duration=2)
    assert not keep[3] and keep[0] and keep[-1]

    adj = np.array([[0, 1], [1, 0]], float)
    edges = np.ones((3, 1))  # 3 samples, 1 edge
    w = edges_to_weighted_adj(adj, edges)
    assert w.shape == (3, 2, 2) and w[0, 0, 1] == 1.0

    df = pd.DataFrame({
        ("Nose", "x"): [0.0], ("Nose", "y"): [0.0],
        ("Center", "x"): [0.0], ("Center", "y"): [0.0],
        "Nose": [1.0], ("Center", "Nose"): [2.0],
    })
    cols = infer_scalar_cols(df)
    assert "Nose" in cols and ("Center", "Nose") in cols

    # Embedding/label alignment: centers of stride-1 windows.
    emb = pd.DataFrame(np.arange(6)[:, None])          # 6 windows
    sup = pd.DataFrame({"beh": np.arange(10) % 2})     # 10 frames, W=5
    e, s = align_embeddings_at_key({"k": emb}, {"k": sup}, "k")
    assert len(e) == len(s) == 6
    np.testing.assert_array_equal(s["beh"].to_numpy(), (np.arange(2, 8) % 2))

    with pytest.raises(ValueError):
        validate_parameter("mode", "bad", ["a", "b"])
    validate_parameter("mode", "a", ["a", "b"])

    # ROI masking of soft/hard assignments.
    soft = np.ones((4, 2))
    masked = get_unsupervised_behaviors_in_roi(soft, {"": [True, False, True, False]}, None)
    assert np.isnan(masked[1]).all() and not np.isnan(masked[0]).any()
    hard = np.array([0, 1, 1, 0])
    masked_h = get_unsupervised_behaviors_in_roi(hard, {"": [True, False, True, True]}, "")
    assert masked_h[1] == -1

    # Behavior mask for supervised and soft tables.
    sup_tab = pd.DataFrame({"B_moving": [0.0, 1.0], "B_speed": [3.0, 4.0]})
    m, c = get_behavior_mask_and_confidence(sup_tab, ["B_moving"], True)
    assert bool(m["B_moving"][1]) and not bool(m["B_moving"][0])

    # mouse_in_roi over a MultiIndex coordinate table.
    tab = pd.DataFrame({
        ("A_Nose", "x"): [0.5, 5.0], ("A_Nose", "y"): [0.5, 5.0],
    })
    tab.columns = pd.MultiIndex.from_tuples(tab.columns)
    square = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], float)
    inroi = mouse_in_roi(tab, "A", "Nose", square, invert_roi=False)
    np.testing.assert_array_equal(inroi, [True, False])
