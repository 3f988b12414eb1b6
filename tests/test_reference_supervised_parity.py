"""Supervised-annotation A/B parity vs the actual reference engine.

Runs the real reference supervised_annotation (under reference_shim, with
numba->pure-python and a convex-polygon shapely shim) and deepof_tpu's
side by side on the bundled fixtures, with the SAME packaged immobility
estimator injected into both (the reference's own pre-trained pickle is
download-only and unreachable offline).

Expected agreement:
  - column sets AND order: identical (the ordering is load-bearing API,
    reference annotation_utils.py:1646-1700);
  - continuous columns (speed): <= 1e-6;
  - binary behaviors: exact, INCLUDING the detect_activity triple
    (stat-active / stat-passive / moving). The reference resolves exact
    mathematical ties in its conflict-smoothing averages through float64
    convolution rounding noise (utils.py:3285-3296); the annotators run
    the host smoothing twin whose averages are np.convolve itself, so
    that noise is reproduced bit-for-bit and parity is exact.
"""

from __future__ import annotations

import os
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/deepof"),
    reason="upstream reference tree not available",
)

FIXROOT = "/root/reference/tests/test_examples"


def _copy_fixture(src: str, dst: str) -> None:
    os.makedirs(f"{dst}/Tables")
    os.makedirs(f"{dst}/Videos")
    for f in os.listdir(f"{src}/Tables"):
        if f.endswith(".h5") and not f.endswith("analysis.h5"):
            shutil.copy(f"{src}/Tables/{f}", f"{dst}/Tables/{f}")
    for f in os.listdir(f"{src}/Videos"):
        shutil.copy(f"{src}/Videos/{f}", f"{dst}/Videos/{f}")


def _project_kwargs(root: str) -> dict:
    return dict(
        project_name="p",
        video_path=f"{root}/Videos",
        table_path=f"{root}/Tables",
        arena="circular-autodetect",
        video_scale="380 mm",
        table_format="h5",
        frame_rate=25,
    )


@pytest.fixture(scope="module", params=["single", "multi"])
def ab_supervised(request, tmp_path_factory):
    from reference_shim import load_reference

    load_reference()
    import deepof.data as ref_data
    import deepof.utils as ref_utils

    from deepof_tpu.annotate import PretrainedImmobilityClassifier
    from deepof_tpu.data import Project as TpuProject

    # Both sides use the SAME estimator: the reference's downloaded pickle
    # is unreachable offline, so its loader is patched to our packaged one.
    estimator = PretrainedImmobilityClassifier()
    ref_utils.load_precompiled_model = lambda *a, **k: estimator

    name = request.param
    src = f"{FIXROOT}/test_{name}_topview"
    animal_ids = ["B", "W"] if name == "multi" else None

    ref_root = str(tmp_path_factory.mktemp(f"refsup_{name}"))
    tpu_root = str(tmp_path_factory.mktemp(f"tpusup_{name}"))
    _copy_fixture(src, ref_root)
    _copy_fixture(src, tpu_root)

    ref_coords = ref_data.Project(
        project_path=ref_root, animal_ids=animal_ids,
        **_project_kwargs(ref_root),
    ).create(force=True, test=True, verbose=False)
    ref_sup = ref_coords.supervised_annotation()

    tpu_coords = TpuProject(
        project_path=tpu_root, animal_ids=animal_ids,
        **_project_kwargs(tpu_root),
    ).create(force=True, test=True, verbose=False)
    tpu_sup = tpu_coords.supervised_annotation(
        immobility_estimator=estimator
    )

    from deepof.data_loading import get_dt

    return ref_sup, tpu_sup, get_dt


def test_supervised_column_surface(ab_supervised):
    """Same behaviors, same load-bearing column ORDER, every experiment."""
    ref_sup, tpu_sup, get_dt = ab_supervised
    assert sorted(ref_sup.keys()) == sorted(tpu_sup.keys())
    for key in ref_sup.keys():
        rcols = [str(c) for c in get_dt(ref_sup, key).columns]
        tcols = [str(c) for c in tpu_sup[key].columns]
        assert rcols == tcols, f"{key}: column order differs"


def test_supervised_values_parity(ab_supervised):
    ref_sup, tpu_sup, get_dt = ab_supervised
    for key in ref_sup.keys():
        rtab = get_dt(ref_sup, key)
        ttab = tpu_sup[key]
        for c in rtab.columns:
            r = rtab[c].to_numpy(float)
            t = ttab[c].to_numpy(float)
            finite = ~np.isnan(r)
            if set(np.unique(r[finite])) <= {0.0, 1.0}:
                agree = np.mean((r == t) | (np.isnan(r) & np.isnan(t)))
                # Exact for every column, including the detect_activity
                # triple: the annotators now run the host smoothing twin,
                # whose conflict averages are np.convolve itself, so the
                # reference's tie-resolution float noise is reproduced
                # bit-for-bit (ops/bouts.py multi_step_paired_smoothing_host).
                assert agree == 1.0, (
                    f"{key}/{c}: {int(round((1 - agree) * len(r)))} "
                    "frames differ"
                )
            else:
                d = np.nanmax(np.abs(r - t))
                assert d <= 1e-6, f"{key}/{c}: max|delta| {d:.2e}"
