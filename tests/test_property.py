"""Hypothesis property-based tests for the kernel layer.

Mirrors the reference's heavy use of hypothesis strategies
(tests/test_utils.py in mlfpm/deepof) on the rebuilt XLA kernels.
"""

import numpy as np
from hypothesis import given, settings, strategies as st
from hypothesis.extra import numpy as hnp

import jax.numpy as jnp

from deepof_tpu import ops

FINITE = dict(allow_nan=False, allow_infinity=False, min_value=-1e3, max_value=1e3)


@settings(max_examples=15, deadline=None)
@given(
    hnp.arrays(np.float64, hnp.array_shapes(min_dims=3, max_dims=3,
                                            min_side=4, max_side=20),
               elements=st.floats(**FINITE))
)
def test_polar_roundtrip(x):
    """cartesian -> polar -> cartesian is the identity."""
    x = x[..., :2]
    if x.shape[-1] < 2:
        return
    polar = np.asarray(ops.to_polar(jnp.asarray(x)))
    back = np.stack(
        [polar[..., 0] * np.cos(polar[..., 1]), polar[..., 0] * np.sin(polar[..., 1])],
        axis=-1,
    )
    np.testing.assert_allclose(back, x, rtol=1e-6, atol=1e-6)


@settings(max_examples=15, deadline=None)
@given(
    hnp.arrays(np.float64, (10, 5, 2), elements=st.floats(**FINITE)),
    st.floats(min_value=-np.pi, max_value=np.pi),
)
def test_rotation_preserves_distances(x, angle):
    rotated = np.asarray(ops.rotate2d(jnp.asarray(x), jnp.full(10, angle)))
    d_before = np.linalg.norm(x[:, 0] - x[:, 3], axis=-1)
    d_after = np.linalg.norm(rotated[:, 0] - rotated[:, 3], axis=-1)
    np.testing.assert_allclose(d_before, d_after, rtol=1e-6, atol=1e-6)


@settings(max_examples=15, deadline=None)
@given(
    st.integers(min_value=10, max_value=60),
    st.integers(min_value=2, max_value=8),
    st.integers(min_value=1, max_value=4),
)
def test_window_extraction_counts(t, size, step):
    if size > t:
        return
    x = np.arange(t, dtype=np.float64)[:, None]
    windows = np.asarray(ops.rolling_windows(jnp.asarray(x), size, step))
    expected_n = len(range(0, t - size + 1, step))
    assert windows.shape == (expected_n, size, 1)
    # Every window is a contiguous slice.
    for i in range(windows.shape[0]):
        start = windows[i, 0, 0]
        np.testing.assert_allclose(windows[i, :, 0], np.arange(start, start + size))


@settings(max_examples=15, deadline=None)
@given(hnp.arrays(np.bool_, st.integers(min_value=5, max_value=200),
                  elements=st.booleans()),
       st.integers(min_value=1, max_value=10))
def test_filter_short_segments_properties(a, min_length):
    out = np.asarray(ops.filter_short_true_segments(jnp.asarray(a), min_length))
    # Output is a subset of the input.
    assert not np.any(out & ~a)
    # No surviving run is shorter than min_length.
    from deepof_tpu.visuals_utils import contiguous_segments

    starts, ends = contiguous_segments(out)
    assert all((e - s) >= min_length for s, e in zip(starts, ends))


@settings(max_examples=10, deadline=None)
@given(
    hnp.arrays(np.float64, (30,), elements=st.floats(**FINITE)),
    st.integers(min_value=0, max_value=25),
    st.integers(min_value=1, max_value=4),
)
def test_interpolation_preserves_observed(x, n_missing, limit):
    rng = np.random.default_rng(0)
    miss = rng.choice(30, size=n_missing, replace=False)
    y = x.copy()
    y[miss] = np.nan
    out = np.asarray(ops.linear_interpolate_limit(jnp.asarray(y), limit))
    observed = np.isfinite(y)
    np.testing.assert_allclose(out[observed], y[observed])
    # Filled values lie within the observed range (linear interp + fills).
    if observed.any() and np.isfinite(out).any():
        lo, hi = np.nanmin(y), np.nanmax(y)
        filled = np.isfinite(out) & ~observed
        assert np.all(out[filled] >= lo - 1e-9)
        assert np.all(out[filled] <= hi + 1e-9)


@settings(max_examples=10, deadline=None)
@given(hnp.arrays(np.float64, (20, 4, 2),
                  elements=st.floats(min_value=-100, max_value=100)))
def test_pairwise_distances_symmetry_and_triangle(x):
    pairs = ops.all_pair_indices(4)
    d = np.asarray(ops.pairwise_distances(jnp.asarray(x), pairs))
    assert (d >= -1e-9).all()
    # d(i,j) matches the direct computation for every pair.
    for p, (i, j) in enumerate(pairs):
        np.testing.assert_allclose(
            d[:, p], np.linalg.norm(x[:, i] - x[:, j], axis=-1), rtol=1e-6, atol=1e-6
        )
