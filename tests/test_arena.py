"""Arena autodetection: mask fitting, SAM proposal selection, checkpoint
resolution (reference arena_utils.py:611-723, 1036-1068; utils.py:3743-3780).

The mask->arena fit stage is exercised offline with synthetic masks — no
segment-anything needed — and the SAM flow itself through a fake predictor.
"""

from __future__ import annotations

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from deepof_tpu.arena import (
    SAM_CHECKPOINT_URL,
    _detect_with_sam,
    mask_to_arena_params,
    resolve_segmentation_checkpoint,
    select_mask_by_reference,
)


def _ellipse_mask(h=480, w=640, center=(320, 240), axes=(200, 150), angle=20.0):
    mask = np.zeros((h, w), np.uint8)
    cv2.ellipse(mask, center, axes, angle, 0, 360, 255, -1)
    return mask


def test_mask_to_arena_params_circular():
    center, axes, angle = (320, 240), (200, 150), 20.0
    poly, ellipse = mask_to_arena_params(_ellipse_mask(), "circular-autodetect")
    (cx, cy), (a, b), ang = ellipse
    assert cx == pytest.approx(center[0], abs=2)
    assert cy == pytest.approx(center[1], abs=2)
    assert sorted([a, b]) == pytest.approx(sorted(axes), abs=3)
    # fitEllipse may report the minor axis first with the angle rotated 90
    # degrees — the same ellipse; compare major-axis orientation mod 180.
    major_ang = (ang if a >= b else ang + 90.0) % 180.0
    assert major_ang == pytest.approx(angle, abs=3)
    # The rasterized polygon traces the same ellipse.
    assert poly.shape[1] == 2 and len(poly) >= 32
    d = np.linalg.norm(poly - np.array(center), axis=1)
    assert d.min() >= min(axes) - 5 and d.max() <= max(axes) + 5


def test_mask_to_arena_params_polygonal():
    mask = np.zeros((480, 640), np.uint8)
    corners = np.array([(100, 60), (540, 60), (540, 420), (100, 420)])
    cv2.fillPoly(mask, [corners], 255)
    poly, ellipse = mask_to_arena_params(mask, "polygonal-autodetect")
    assert ellipse is None
    assert 4 <= len(poly) <= 8
    # Every true corner is recovered within a couple of pixels.
    for c in corners:
        assert np.linalg.norm(np.asarray(poly, float) - c, axis=1).min() < 3

    with pytest.raises(ValueError):
        mask_to_arena_params(np.zeros((10, 10), np.uint8), "circular-autodetect")


def test_select_mask_by_reference_prefers_closest_area():
    right = _ellipse_mask(axes=(200, 150))
    small = _ellipse_mask(axes=(40, 30))
    big = _ellipse_mask(axes=(310, 230))
    masks = np.stack([small, right, big]) > 0
    scores = np.array([0.9, 0.2, 0.5])  # SAM confidence favors the wrong one

    # Without a reference: highest score wins (the small mask).
    _, ellipse = select_mask_by_reference(masks, scores, "circular-autodetect")
    assert max(ellipse[1]) < 60

    # With a reference arena of the true size: area match overrides score.
    ref = mask_to_arena_params(right, "circular-autodetect")[0]
    _, ellipse = select_mask_by_reference(
        masks, scores, "circular-autodetect", arena_reference=ref
    )
    assert sorted(ellipse[1]) == pytest.approx([150, 200], abs=3)


class _FakePredictor:
    """Duck-typed SamPredictor: center-point prompt -> three proposals."""

    def __init__(self, masks, scores):
        self.masks, self.scores = masks, scores
        self.image = None

    def set_image(self, image):
        self.image = image

    def predict(self, point_coords, point_labels, multimask_output):
        assert self.image is not None and multimask_output
        h, w = self.image.shape[:2]
        np.testing.assert_array_equal(point_coords, [[w // 2, h // 2]])
        return self.masks, self.scores, None


def test_detect_with_sam_flow():
    frame = np.zeros((480, 640, 3), np.uint8)
    masks = np.stack([_ellipse_mask(axes=(200, 150)), _ellipse_mask(axes=(50, 40))]) > 0
    predictor = _FakePredictor(masks, np.array([0.3, 0.8]))
    poly, ellipse = _detect_with_sam(frame, predictor, "circular-autodetect")
    assert max(ellipse[1]) < 60  # highest score
    ref = mask_to_arena_params(masks[0].astype(np.uint8) * 255, "circular-autodetect")[0]
    poly, ellipse = _detect_with_sam(
        frame, predictor, "circular-autodetect", arena_reference=ref
    )
    assert sorted(ellipse[1]) == pytest.approx([150, 200], abs=3)


def test_resolve_segmentation_checkpoint(tmp_path):
    existing = tmp_path / "sam.pth"
    existing.write_bytes(b"weights")
    assert resolve_segmentation_checkpoint(str(existing)) == str(existing)

    # Missing + download off -> None, nothing created.
    missing = tmp_path / "sub" / "sam.pth"
    assert resolve_segmentation_checkpoint(str(missing), download=False) is None
    assert not missing.exists()

    # Download-on-miss through an injected fetcher (utils.py:3743-3780).
    fetched = []

    def fetcher(url, dest):
        fetched.append(url)
        with open(dest, "wb") as f:
            f.write(b"sam-bytes")

    out = resolve_segmentation_checkpoint(str(missing), fetcher=fetcher)
    assert out == str(missing) and missing.read_bytes() == b"sam-bytes"
    assert fetched == [SAM_CHECKPOINT_URL]

    # A failing fetcher degrades to the contrast fallback with a warning.
    def bad_fetcher(url, dest):
        raise OSError("no network")

    with pytest.warns(UserWarning, match="falling back"):
        assert (
            resolve_segmentation_checkpoint(str(tmp_path / "other.pth"), fetcher=bad_fetcher)
            is None
        )


def test_autodetect_flow_with_injected_segmentation_backend(monkeypatch):
    """The FULL ``*-autodetect`` get_arenas branch runs through a
    registered segmentation backend (set_segmentation_predictor): median
    frame -> SAM-protocol predict -> multimask selection -> ellipse fit ->
    px->mm scales (reference arena_utils.py:611-723, whose default path
    hard-requires segment-anything ViT-H)."""
    import deepof_tpu.arena as arena_mod

    center, axes = (320, 240), (200, 150)
    masks = np.stack(
        [
            _ellipse_mask(center=center, axes=axes) ,
            _ellipse_mask(center=center, axes=(40, 30)),
        ]
    ) > 0
    predictor = _FakePredictor(masks, np.array([0.9, 0.2]))
    monkeypatch.setattr(
        arena_mod, "median_frame", lambda path, n_samples=20: np.zeros(
            (480, 640, 3), np.uint8
        )
    )
    arena_mod.set_segmentation_predictor(lambda: predictor)
    try:
        scales, params, rois, res = arena_mod.get_arenas(
            coordinates=None,
            arena="circular-autodetect",
            arena_dims=380.0,
            number_of_rois=0,
            segmentation_model_path=None,
            video_path="/nonexistent",
            videos={"exp0": "exp0.mp4"},
        )
    finally:
        arena_mod.set_segmentation_predictor(None)

    assert res["exp0"] == (480, 640)
    # Highest-score proposal (the true ellipse) drives the calibration:
    # length_px = 2 * mean(axes); scales = [cx_mm, cy_mm, len_px, len_mm].
    cx_mm, cy_mm, length_px, length_mm = scales["exp0"]
    assert length_mm == 380.0
    assert length_px == pytest.approx(2 * np.mean(axes), abs=6)
    ratio = 380.0 / length_px
    assert cx_mm == pytest.approx(center[0] * ratio, abs=4)
    assert cy_mm == pytest.approx(center[1] * ratio, abs=4)
    # Stored arena params are the mm-scaled ellipse.
    (ecx, ecy), (ea, eb), _ = params["exp0"]
    assert sorted([ea, eb]) == pytest.approx(
        [a * ratio for a in sorted(axes)], abs=4
    )


def test_closest_side_and_fixed_n_simplification():
    """closest_side picks the side matching the reference in length and
    orientation (arena_utils.py:577-608); simplify_polygon(n_points=k)
    returns exactly k denoised corners."""
    from deepof_tpu.arena import closest_side, simplify_polygon

    # Right trapezoid with four clearly different side characteristics.
    quad = np.array([(100, 100), (500, 100), (460, 380), (140, 380)], float)
    side = closest_side(quad, [(140, 380), (460, 380)])
    got = {tuple(map(float, p)) for p in side}
    assert got == {(460.0, 380.0), (140.0, 380.0)}
    # Reference side matching the TOP side instead.
    side = closest_side(quad, [(0, 0), (400, 0)])
    got = {tuple(map(float, p)) for p in side}
    assert got == {(100.0, 100.0), (500.0, 100.0)}

    # Densify the trapezoid boundary and recover exactly 4 corners.
    dense = []
    for i in range(4):
        a, b = quad[i], quad[(i + 1) % 4]
        for t in np.linspace(0, 1, 60, endpoint=False):
            dense.append(a + t * (b - a))
    dense = np.asarray(dense)
    approx = simplify_polygon(dense, n_points=4)
    assert len(approx) == 4
    for c in quad:
        assert np.linalg.norm(np.asarray(approx, float) - c, axis=1).min() < 2.5


def test_polygonal_autodetect_calibrates_off_closest_side(monkeypatch, tmp_path):
    """Autodetected polygonal arenas take the mm scale from the side
    closest to the user's arena_reference side, not from an arbitrary
    first side (reference arena_utils.py:335-341): on a non-regular
    trapezoid whose detected first side is NOT the annotated one, the
    stored length_px must pin to the annotated side's 320 px."""
    import deepof_tpu.arena as arena_mod
    from deepof_tpu.arena import detect_arena_contour, get_first_length

    # Synthetic video frame: bright trapezoid arena on dark background.
    frame = np.zeros((480, 640, 3), np.uint8)
    quad = np.array([(100, 100), (500, 100), (460, 380), (140, 380)])
    cv2.fillPoly(frame, [quad], (220, 220, 220))

    # Sanity: the raw detection's first side is NOT the 320 px bottom one
    # (otherwise this test could pass by accident).
    raw_poly, _ = detect_arena_contour(frame, "polygonal-autodetect")
    assert abs(get_first_length(raw_poly) - 320.0) > 20.0

    monkeypatch.setattr(
        arena_mod, "median_frame",
        lambda path, n_samples=20: frame,
    )

    class _Proj:
        project_path = str(tmp_path)
        project_name = "arena_test"

    scales, params, rois, res = arena_mod.get_arenas(
        coordinates=_Proj(),
        arena="polygonal-autodetect",
        arena_dims=380.0,
        number_of_rois=0,
        segmentation_model_path=None,
        video_path="/nonexistent",
        videos={"exp0": "exp0.mp4"},
        arena_reference=[(140, 380), (460, 380), (500, 100), (100, 100)],
    )
    # length_px = the annotated bottom side (320 px), length_mm = 380.
    assert scales["exp0"][2] == pytest.approx(320.0, abs=4.0)
    assert scales["exp0"][3] == 380.0
    # The stored polygon was simplified to the reference's 4 vertices
    # (returned in mm).
    ratio = scales["exp0"][3] / scales["exp0"][2]
    poly_px = np.asarray(params["exp0"], float) / ratio
    assert len(poly_px) == 4
    for c in quad:
        assert np.linalg.norm(poly_px - c, axis=1).min() < 4.0
    # The scale-reference overlay snapshot landed in Arena_detection
    # (arena_utils.py:768-780).
    out = tmp_path / "arena_test" / "Arena_detection" / "exp0_arena.png"
    assert out.exists()


def test_create_inner_polygon_and_arena_kwargs():
    """Reference arena helpers (arena_utils.py:1028-1230): inner-polygon
    shrink by target area ratio, ring representation, scaled first-edge
    length, and extract_corners_from_arena's reference kwargs."""
    import numpy as np

    from deepof_tpu.arena import (
        _polygon_area,
        create_inner_polygon,
        extract_corners_from_arena,
        get_first_length,
    )

    sq = np.array([[0, 0], [10, 0], [10, 10], [0, 10]], float)
    inner = create_inner_polygon(sq, 0.49, tolerance=0.001)
    assert abs(_polygon_area(inner) / 100.0 - 0.49) < 0.01
    # inner polygon lies strictly inside the outer
    assert inner[:, 0].min() > 0 and inner[:, 0].max() < 10

    irregular = np.array([[0, 0], [8, 1], [10, 6], [5, 9], [1, 7]], float)
    inner2 = create_inner_polygon(irregular, 0.6, tolerance=0.005)
    ratio = _polygon_area(inner2) / _polygon_area(irregular)
    assert abs(ratio - 0.6) < 0.02

    ring = create_inner_polygon(sq, 0.5, return_inner=False)
    assert ring.shape[1] == 2 and len(ring) > len(sq)
    assert create_inner_polygon(sq, 0.0).size == 0
    np.testing.assert_allclose(create_inner_polygon(sq, 0.0, return_inner=False), sq)

    # kwarg parity: arena_params/num_points vs legacy ellipse_params/n_points
    a = extract_corners_from_arena(((5, 5), (3, 2), 0.0), num_points=16)
    b = extract_corners_from_arena(ellipse_params=((5, 5), (3, 2), 0.0), n_points=16)
    np.testing.assert_allclose(a, b)
    np.testing.assert_allclose(extract_corners_from_arena(sq), sq)

    assert get_first_length(sq) == 10.0
    assert get_first_length(sq, w_ratio=2.0, h_ratio=1.0) == 20.0

    # A 3-vertex polygon given as a list/tuple of points stays a polygon
    # (reference arena_utils.py:1215-1235 disambiguates structurally; a
    # naive len==3 check used to misparse it as an ellipse and crash).
    tri = [(0.0, 0.0), (10.0, 0.0), (5.0, 8.0)]
    np.testing.assert_allclose(extract_corners_from_arena(tri), np.asarray(tri))
    np.testing.assert_allclose(
        extract_corners_from_arena(tuple(tri)), np.asarray(tri)
    )
    # while a structurally-valid ellipse tuple still rasterizes
    assert len(extract_corners_from_arena(((5, 5), (3, 2), 10.0))) == 100
