"""Behavior-rule unit tests, including a hand-built consistency scenario
and the custom-behavior extension API (mirrors
tests/test_annotation_utils.py + test_objects.py in the reference)."""

import numpy as np
import pandas as pd
import pytest

import deepof_tpu.annotate as annotate
from deepof_tpu.annotate import (
    Behavior_output,
    Behavior_scope,
    DeepOF_behavior,
    calculate_close_range,
    climb_arena,
    close_double_contact,
    close_single_contact,
    detect_activity,
    following_path,
    rearing,
    sniff_around,
    sniff_object,
    validate_custom_behaviors,
)


def _pos_frame(points: dict, t: int = 20) -> pd.DataFrame:
    """Constant-position DataFrame with (bp, x/y) columns."""
    cols, data = [], []
    for bp, (x, y) in points.items():
        cols += [(bp, "x"), (bp, "y")]
        data += [np.full(t, float(x)), np.full(t, float(y))]
    return pd.DataFrame(np.stack(data, 1), columns=pd.MultiIndex.from_tuples(cols))


def test_close_single_contact():
    pos = _pos_frame({"A_Nose": (0, 0), "B_Nose": (10, 0), "B_Tail_base": (100, 0)})
    assert close_single_contact(pos, "A_Nose", "B_Nose", tol=15).all()
    assert not close_single_contact(pos, "A_Nose", "B_Tail_base", tol=15).any()
    # Any-of list form.
    assert close_single_contact(pos, "A_Nose", ["B_Nose", "B_Tail_base"], 15).all()


def test_close_double_contact_and_reverse():
    pos = _pos_frame(
        {
            "A_Nose": (0, 0), "A_Tail_base": (50, 0),
            "B_Nose": (5, 0), "B_Tail_base": (55, 0),      # side by side
        }
    )
    assert close_double_contact(
        pos, "A_Nose", "A_Tail_base", "B_Nose", "B_Tail_base", rel_tol=10
    ).all()
    # Reverse orientation (nose-to-tail both ways) fails here.
    assert not close_double_contact(
        pos, "A_Nose", "A_Tail_base", "B_Nose", "B_Tail_base", rel_tol=10, rev=True
    ).any()


def test_climb_and_sniff_arena_polygonal():
    arena = np.array([[0, 0], [100, 0], [100, 100], [0, 100]], float)
    pos_out = _pos_frame({"Nose": (130, 50)})       # far outside
    pos_edge = _pos_frame({"Nose": (98, 50)})       # near the wall, inside
    pos_center = _pos_frame({"Nose": (50, 50)})

    assert climb_arena("polygonal-autodetect", arena, pos_out, 0.15, "", mouse_len=50).all()
    assert not climb_arena("polygonal-autodetect", arena, pos_center, 0.15, "", mouse_len=50).any()

    speeds = pd.DataFrame({"Center": np.full(20, 1.0), "Nose": np.full(20, 1.0)})
    sniff = sniff_object(
        speeds, arena, pos_edge, tol=5.0, tol_speed=10.0, nose="Nose",
    )
    assert sniff.all()
    assert not sniff_object(
        speeds, arena, pos_center, tol=5.0, tol_speed=10.0, nose="Nose",
    ).any()


def test_climb_arena_elliptical():
    ellipse = ((50.0, 50.0), (30.0, 30.0), 0.0)
    outside = _pos_frame({"Nose": (95, 50)})
    inside = _pos_frame({"Nose": (55, 50)})
    assert climb_arena("circular", ellipse, outside, 0.15, "", mouse_len=50).all()
    assert not climb_arena("circular", ellipse, inside, 0.15, "", mouse_len=50).any()


def test_following_path_detects_follower():
    t = 60
    # B walks right; A's nose tracks B's tail-base path with a short delay.
    bx = np.linspace(0, 100, t)
    pos = pd.DataFrame(
        {
            ("B_Tail_base", "x"): bx, ("B_Tail_base", "y"): np.zeros(t),
            ("B_Nose", "x"): bx + 20, ("B_Nose", "y"): np.zeros(t),
            ("A_Nose", "x"): bx - 5, ("A_Nose", "y"): np.zeros(t),
            ("A_Tail_base", "x"): bx - 25, ("A_Tail_base", "y"): np.zeros(t),
        }
    )
    dists = pd.DataFrame(
        {
            ("A_Nose", "B_Tail_base"): np.full(t, 5.0),
            ("A_Tail_base", "B_Tail_base"): np.full(t, 25.0),
            ("A_Nose", "B_Nose"): np.full(t, 25.0),
        }
    )
    speeds = pd.DataFrame({"A_Nose": np.full(t, 50.0)})
    follow = following_path(
        dists, pos, speeds, follower="A", followed="B",
        frames=10, tol=8.0, tol_speed=10.0,
    )
    assert follow[15:].mean() > 0.9


def test_detect_activity_splits_states():
    t = 300
    rng = np.random.default_rng(0)
    center = np.concatenate([np.full(150, 5.0), np.full(150, 80.0)])
    speeds = pd.DataFrame(
        {
            "Center": center,
            "Nose": np.full(t, 50.0),
            "Left_fhip": np.full(t, 5.0),
            "Right_fhip": np.full(t, 5.0),
            "Left_bhip": np.full(t, 5.0),
            "Right_bhip": np.full(t, 5.0),
        }
    )
    lik = pd.DataFrame({c: np.ones(t) for c in speeds.columns})
    stat_a, stat_p, moving = detect_activity(
        speeds, lik, tol_speed=40.0, tol_likelihood=0.85, min_length=6
    )
    # First half: immobile but nose active; second half: moving.
    assert stat_a[:140].mean() > 0.8
    assert moving[160:].mean() > 0.8


def test_sniff_around_and_rearing():
    t = 50
    speeds = pd.DataFrame({"Center": np.full(t, 5.0), "Nose": np.full(t, 60.0),
                           "Tail_base": np.full(t, 5.0)})
    lik = pd.DataFrame({"Nose": np.ones(t)})
    assert sniff_around(speeds, lik, 40.0, 0.85).all()

    pos = _pos_frame({"Nose": (0, 0), "Tail_base": (10, 0)}, t)
    assert rearing(pos, speeds, rearing_tol=20, tol_speed=40).all()
    pos_far = _pos_frame({"Nose": (0, 0), "Tail_base": (100, 0)}, t)
    assert not rearing(pos_far, speeds, rearing_tol=20, tol_speed=40).any()


def test_calculate_close_range():
    dists = pd.DataFrame(
        {
            ("A_Nose", "B_Center"): [10.0, 100.0],
            ("A_Nose", "A_Tail_base"): [5.0, 5.0],  # same-animal: ignored
        }
    )
    mask = calculate_close_range(dists, "A_", "Nose", threshold=20.0)
    np.testing.assert_array_equal(mask, [1, 0])


# --------------------------------------------------------------------- #
# Custom behavior extension API
# --------------------------------------------------------------------- #


def _custom_behavior(name="still-nose"):
    def compute(ctx, aid):
        return (ctx.speeds[ctx.bp(aid, "Nose")] < 10).to_numpy()

    return DeepOF_behavior(
        name=name,
        scope=Behavior_scope.INDIVIDUAL,
        output_type=Behavior_output.BINARY,
        compute=compute,
    )


def test_validate_custom_behaviors():
    validate_custom_behaviors([_custom_behavior()], {})
    with pytest.raises(ValueError):
        validate_custom_behaviors([_custom_behavior("bad_name")], {})
    with pytest.raises(ValueError):
        validate_custom_behaviors([_custom_behavior("moving")], {})
    with pytest.raises(ValueError):
        validate_custom_behaviors(
            [_custom_behavior("dup"), _custom_behavior("dup")], {}
        )


def test_assign_custom_behavior_colors():
    cbs = annotate.assign_custom_behavior_colors(
        [_custom_behavior("one"), _custom_behavior("two")]
    )
    assert all(cb.color and cb.color.startswith("#") for cb in cbs)


def test_full_features_restriction_lifted_for_custom_behaviors(tmp_path):
    """Without custom behaviors the kinematics feature table fetches only
    the immobility distance pairs; WITH custom behaviors (which receive
    full_features in their context) the full pair set must be present."""
    import os
    import shutil

    from deepof_tpu.data import Project

    src = "/root/reference/tests/test_examples/test_single_topview"
    (tmp_path / "Tables").mkdir()
    (tmp_path / "Videos").mkdir()
    for f in os.listdir(f"{src}/Tables"):
        if f.endswith("h5"):
            shutil.copy(f"{src}/Tables/{f}", tmp_path / "Tables" / f)
    for f in os.listdir(f"{src}/Videos"):
        shutil.copy(f"{src}/Videos/{f}", tmp_path / "Videos" / f)
    proj = Project(
        project_path=str(tmp_path), project_name="p",
        video_path=str(tmp_path / "Videos"), table_path=str(tmp_path / "Tables"),
        arena="circular-autodetect", video_scale="380 mm",
        table_format="h5", frame_rate=25,
    )
    coords = proj.create(force=True, test=True, verbose=False)

    seen = {}

    def spy(ctx, aid):
        ff = ctx.full_features[aid] if aid else ctx.full_features
        from deepof_tpu.core.storage import get_dt

        tab = get_dt(ff, ctx.key)
        seen["n_dist_cols"] = sum(
            1 for c in tab.columns if str(c).startswith("('")
        )
        return (ctx.speeds[ctx.bp(aid, "Nose")] < 10).to_numpy()

    cb = DeepOF_behavior(
        name="spying", scope=Behavior_scope.INDIVIDUAL,
        output_type=Behavior_output.BINARY, compute=spy,
    )
    sup = coords.supervised_annotation(custom_behaviors=[cb], verbose=False)
    n_bp = 14
    assert seen["n_dist_cols"] == n_bp * (n_bp - 1) // 2  # all 91 pairs
    assert any("spying" in c for c in next(iter(sup.values())).columns)

    # default flow: restricted to the 11 immobility pairs
    from deepof_tpu.annotate import IMMOBILITY_FEATURES_DISTS
    from deepof_tpu.posthoc import _kinematics_table_views

    restricted = _kinematics_table_views(
        coords, views=[None], include_angles=False, file_name=None,
        distance_pairs=[(a, b) for a, b in IMMOBILITY_FEATURES_DISTS],
    )[None]
    tab = next(iter(restricted.values()))
    n_dist = sum(1 for c in tab.columns if str(c).startswith("('"))
    assert n_dist == len(IMMOBILITY_FEATURES_DISTS)


def test_max_behaviour_labels():
    df = pd.DataFrame(
        {
            "moving": [1] * 10 + [0] * 10,
            "sniffing": [0] * 10 + [1] * 10,
            "speed": np.ones(20),
        }
    )
    labels = annotate.max_behaviour(df, window_size=4)
    assert labels[3] == "moving"
    assert labels[-3] == "sniffing"


def test_augment_with_neighbors_matches_pandas_oracle():
    """The vectorized lead/lag augmentation equals the direct pandas
    shift/concat/mean construction (the reference procedure,
    annotation_utils.py:817-870) — names, order, and NaN propagation."""
    import pandas as pd

    from deepof_tpu.annotate import augment_with_neighbors

    rng = np.random.default_rng(3)
    t = 140
    df = pd.DataFrame(
        {
            "A_Nose_speed": rng.normal(size=t),
            "('A_Nose', 'A_Spine_1')_raw": rng.normal(size=t),
            "A_head_area_raw": rng.normal(size=t),
            "A_Center_speed": rng.normal(size=t),
        }
    )
    df.iloc[7, 0] = np.nan
    df.iloc[50:53, 3] = np.nan

    def oracle(X, window=5, step=1, window_out=11):
        cols = X.columns.tolist()
        l = 2 * window + 1
        b = l / window_out
        ranges = [(round(i * b), round((i + 1) * b)) for i in range(window_out)]
        frames = []
        for col in cols:
            shifted = [X[col].shift(-lead) for lead in range(window * step, 0, -step)]
            shifted.append(X[col])
            shifted += [X[col].shift(lag) for lag in range(step, window * step + 1, step)]
            block = pd.concat(shifted, axis=1)
            feats = {}
            for k in range(window_out):
                s, e = ranges[k]
                feats[f"{col}_{k - window_out // 2}"] = block.iloc[:, s:e].mean(
                    axis=1, skipna=False
                )
            frames.append(pd.DataFrame(feats))
        out = pd.concat(frames, axis=1)
        return out[[c for c in out.columns if "speed" in c]]

    for window, step, window_out in [(5, 1, 11), (3, 2, 5), (2, 1, 7)]:
        want = oracle(df, window, step, window_out)
        got = augment_with_neighbors(df, window, step, window_out)
        assert list(got.columns) == list(want.columns)
        np.testing.assert_allclose(
            got.to_numpy(), want.to_numpy(), rtol=1e-12, equal_nan=True
        )


def test_pretrained_immobility_classifier():
    """The packaged MLP detects immobility bouts in synthetic kinematics
    across different base rates (VERDICT item 7)."""
    import pandas as pd

    from deepof_tpu.annotate import (
        IMMOBILITY_FEATURES_SPEEDS,
        PretrainedImmobilityClassifier,
        _default_immobility_estimator,
        augment_with_neighbors,
    )
    from sklearn.preprocessing import StandardScaler

    assert isinstance(
        _default_immobility_estimator(), PretrainedImmobilityClassifier
    )

    rng = np.random.default_rng(7)
    t = 2000
    for frac in (0.2, 0.5, 0.8):
        # Block-structured ground truth: alternating bouts whose immobile
        # share is ~frac. (Both states must occur: per-recording z-scoring
        # makes an all-immobile recording scale-free and ill-posed — a
        # blind spot shared with the reference's pipeline.)
        labels = np.zeros(t, bool)
        i = 0
        state = True
        while i < t:
            dwell = int(rng.uniform(50, 200))
            dwell = int(dwell * (frac if state else 1 - frac) * 2)
            labels[i : i + dwell] = state
            i += dwell
            state = not state
        assert 0 < labels.mean() < 1
        speeds = np.where(
            labels[:, None],
            np.abs(rng.normal(0, 2.0, size=(t, 11))),
            rng.gamma(4.0, 12.0, size=(t, 11)),
        )
        df = pd.DataFrame(
            speeds,
            columns=[f"{bp}_speed" for bp in IMMOBILITY_FEATURES_SPEEDS],
        )
        feats = StandardScaler().fit_transform(
            np.nan_to_num(augment_with_neighbors(df))
        )
        pred = PretrainedImmobilityClassifier().predict(feats).astype(bool)
        acc = (pred[10:-10] == labels[10:-10]).mean()
        assert acc > 0.9, f"accuracy {acc:.3f} at base rate {frac}"
