"""SLEAP-format ingest and ROI-filtering tests on the reference fixtures."""

import os
import shutil

import numpy as np
import pytest

from deepof_tpu.data import Project

FIXTURES = "/root/reference/tests/test_examples"


def _copy_videos(src, videos_dir, n=2):
    vids = sorted(
        f for f in os.listdir(os.path.join(src, "Videos")) if f.endswith(".mp4")
    )[:n]
    for f in vids:
        shutil.copy(os.path.join(src, "Videos", f), videos_dir / f)


def test_sleap_analysis_h5_project(tmp_path):
    src = os.path.join(FIXTURES, "test_single_topview")
    tables = tmp_path / "Tables"
    videos = tmp_path / "Videos"
    tables.mkdir()
    videos.mkdir()
    for f in os.listdir(os.path.join(src, "Tables", "SLEAP")):
        if f.endswith("analysis.h5"):
            shutil.copy(os.path.join(src, "Tables", "SLEAP", f), tables / f)
    _copy_videos(src, videos)
    proj = Project(
        project_path=str(tmp_path), project_name="sleap_proj",
        video_path=str(videos), table_path=str(tables),
        arena="circular-autodetect", video_scale="380 mm",
        table_format="analysis.h5", frame_rate=25,
    )
    coords = proj.create(force=True, test=True, verbose=False)
    c = coords.get_coords()
    key = list(c.keys())[0]
    assert c[key].shape[1] == 28  # 14 bodyparts x 2
    # SLEAP likelihoods are 1.0/0.0 imputations.
    q = coords.get_quality()[key]
    assert set(np.unique(q.to_numpy())) <= {0.0, 1.0}


def test_sleap_npy_project(tmp_path):
    src = os.path.join(FIXTURES, "test_single_topview")
    tables = tmp_path / "Tables"
    videos = tmp_path / "Videos"
    tables.mkdir()
    videos.mkdir()
    for f in os.listdir(os.path.join(src, "Tables", "SLEAP")):
        if f.endswith(".npy"):
            shutil.copy(os.path.join(src, "Tables", "SLEAP", f), tables / f)
    _copy_videos(src, videos)
    bodyparts = [
        "Nose", "Left_ear", "Right_ear", "Spine_1", "Center", "Spine_2",
        "Tail_base", "Tail_1", "Tail_2", "Tail_tip", "Left_fhip",
        "Right_fhip", "Left_bhip", "Right_bhip",
    ]
    proj = Project(
        project_path=str(tmp_path), project_name="npy_proj",
        video_path=str(videos), table_path=str(tables),
        arena="circular-autodetect", video_scale="380 mm",
        table_format="npy", frame_rate=25,
        rename_bodyparts=bodyparts,
    )
    coords = proj.create(force=True, test=True, verbose=False)
    c = coords.get_coords()
    key = list(c.keys())[0]
    assert c[key].shape[1] == 28


@pytest.fixture(scope="module")
def roi_coords(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("roi")
    src = os.path.join(FIXTURES, "test_single_topview")
    (tmp / "Tables").mkdir()
    (tmp / "Videos").mkdir()
    for f in os.listdir(os.path.join(src, "Tables")):
        if f.endswith("h5"):
            shutil.copy(os.path.join(src, "Tables", f), tmp / "Tables" / f)
    _copy_videos(src, tmp / "Videos")
    proj = Project(
        project_path=str(tmp), project_name="roi_proj",
        video_path=str(tmp / "Videos"), table_path=str(tmp / "Tables"),
        arena="circular-autodetect", video_scale="380 mm",
        table_format="h5", frame_rate=25, number_of_rois=2,
    )
    return proj.create(force=True, test=True, verbose=False)


def test_roi_filter_coords(roi_coords):
    full = roi_coords.get_coords()
    inside = roi_coords.get_coords(roi_number=1)
    key = "test"
    # ROI filtering can only add NaNs, never change values.
    f = full[key].to_numpy()
    i = inside[key].to_numpy()
    changed = np.isfinite(i) & np.isfinite(f) & (i != f)
    assert not changed.any()
    inverted = roi_coords.get_coords(roi_number=1, invert_roi=True)
    v = inverted[key].to_numpy()
    # Every frame is NaN in exactly one of inside/inverted (or in both if
    # globally missing).
    frame_nan_in = np.isnan(i).all(axis=1)
    frame_nan_out = np.isnan(v).all(axis=1)
    assert (frame_nan_in | frame_nan_out).all()


def test_roi_distances_filter(roi_coords):
    d_full = roi_coords.get_distances()
    d_roi = roi_coords.get_distances(roi_number=1)
    key = "test"
    assert d_roi[key].shape == d_full[key].shape
    assert np.isnan(d_roi[key].to_numpy()).sum() >= np.isnan(
        d_full[key].to_numpy()
    ).sum()
