"""Interactive QC: frame-by-frame viewer overlaying kinematics on video.

Behavioral spec: deepof/sanitycheck.py:27-318 — an ipywidgets GUI that
steps through video frames and overlays bodypart markers plus selected
angle/distance/speed readouts. Needs a notebook frontend (ipywidgets) and
readable videos; both are optional here, with a matplotlib fallback that
renders a single annotated frame headlessly. Per-edge distance labels,
per-bodypart speed coloring, angle readouts at the vertex bodypart, and
arena/ROI outlines mirror the reference overlays.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def _read_video_frame(coordinates, experiment_id: str, frame_index: int):
    import os

    video_path = os.path.join(
        coordinates._video_path, coordinates._videos[experiment_id]
    )
    if cv2 is None:
        return None
    cap = cv2.VideoCapture(video_path)
    frame = None
    if cap.isOpened() and cap.get(cv2.CAP_PROP_FRAME_COUNT) > frame_index:
        cap.set(cv2.CAP_PROP_POS_FRAMES, frame_index)
        ok, img = cap.read()
        if ok:
            frame = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    cap.release()
    return frame


def _px_arena_overlays(coordinates, experiment_id: str):
    """Arena polygon + ROI polygons in pixel coordinates."""
    import deepof_tpu.arena as arena_mod

    overlays = []
    scales = {experiment_id: coordinates._scales[experiment_id]}
    params = (coordinates._arena_params or {}).get(experiment_id)
    if params is not None:
        px = arena_mod.scale_arenas_to_pixel({experiment_id: params}, scales)
        overlays.append(("arena", px[experiment_id]))
    rois = (coordinates._roi_dicts or {}).get(experiment_id) or {}
    if rois:
        px_rois = arena_mod.scale_rois_to_pixel({experiment_id: rois}, scales)
        for num, poly in px_rois[experiment_id].items():
            overlays.append((f"ROI {num}", poly))
    return overlays


def render_frame(
    coordinates,
    experiment_id: str,
    frame_index: int = 0,
    bodyparts: Optional[List[str]] = None,
    show_distances: bool = False,
    show_angles: bool = False,
    show_speeds: bool = False,
    show_arena: bool = True,
    show_labels: bool = False,
    ax=None,
):
    """Render one annotated frame (video background when readable,
    skeleton-only otherwise).

    Args:
        bodyparts: restrict markers/labels/readouts to these bodyparts
            (None = all).
        show_distances: draw the length of every skeleton edge (both ends
            selected) at its midpoint, in mm.
        show_angles: draw the bridge angle (degrees) at each selected
            vertex bodypart.
        show_speeds: color markers by instantaneous speed (viridis) and
            print the median.
        show_arena: overlay the arena outline and any annotated ROIs.
        show_labels: print bodypart names next to their markers.
    """
    import matplotlib.pyplot as plt

    from deepof_tpu.export_video import _px_positions

    own = ax is None
    if own:
        _, ax = plt.subplots()

    frame = _read_video_frame(coordinates, experiment_id, frame_index)
    if frame is not None:
        ax.imshow(frame)

    nodes = list(coordinates._nodes)
    selected = set(bodyparts) if bodyparts else set(nodes)
    pts = _px_positions(coordinates, experiment_id)[frame_index]

    # Markers (speed-colored when requested).
    sel_idx = [i for i, bp in enumerate(nodes) if bp in selected]
    colors = "red"
    speeds_row = None
    if show_speeds:
        sp = coordinates.get_coords(speed=1)[experiment_id]
        if frame_index < len(sp):
            speeds_row = sp.iloc[frame_index]
            colors = [float(speeds_row.get(nodes[i], np.nan)) for i in sel_idx]
    scat = ax.scatter(
        pts[sel_idx, 0], pts[sel_idx, 1],
        c=colors, s=14, cmap="viridis" if show_speeds else None, zorder=3,
    )
    if show_speeds and speeds_row is not None:
        plt.colorbar(scat, ax=ax, label="speed (mm/s)", shrink=0.7)
    if show_labels:
        for i in sel_idx:
            ax.annotate(
                nodes[i], pts[i], fontsize=6, color="w",
                xytext=(2, 2), textcoords="offset points",
            )

    # Skeleton + per-edge distance labels.
    dists = (
        coordinates.get_distances()[experiment_id] if show_distances else None
    )
    for i, j in coordinates._body_graph.edges:
        ax.plot([pts[i, 0], pts[j, 0]], [pts[i, 1], pts[j, 1]], "y-", lw=1)
        if (
            dists is not None
            and frame_index < len(dists)
            and nodes[i] in selected
            and nodes[j] in selected
        ):
            pair = tuple(sorted((nodes[i], nodes[j])))
            if pair in dists.columns:
                mid = (pts[i] + pts[j]) / 2
                ax.annotate(
                    f"{dists.iloc[frame_index][pair]:.0f}", mid, fontsize=6,
                    color="c", ha="center",
                )

    # Bridge-angle readouts at the vertex bodypart.
    if show_angles:
        angles = coordinates.get_angles()[experiment_id]
        if frame_index < len(angles):
            row = angles.iloc[frame_index]
            for col in angles.columns:
                vertex = col[1] if isinstance(col, tuple) else None
                if vertex in selected and vertex in nodes:
                    vi = nodes.index(vertex)
                    ax.annotate(
                        f"{np.degrees(row[col]):.0f}°", pts[vi],
                        fontsize=6, color="m",
                        xytext=(2, -6), textcoords="offset points",
                    )

    if show_arena:
        for name, poly in _px_arena_overlays(coordinates, experiment_id):
            poly = np.asarray(poly, float)
            closed = np.vstack([poly, poly[:1]])
            style = "w--" if name.startswith("ROI") else "w-"
            ax.plot(closed[:, 0], closed[:, 1], style, lw=1, alpha=0.8)

    lines = [f"{experiment_id} | frame {frame_index}"]
    if show_speeds and speeds_row is not None:
        lines.append(f"median speed: {np.nanmedian(speeds_row):.1f} mm/s")
    ax.set_title("\n".join(lines), fontsize=8)
    if frame is None:
        ax.invert_yaxis()
    return ax


class GUI:
    """ipywidgets frame browser with experiment/bodypart selection
    (deepof/sanitycheck.py:27-318)."""

    def __init__(self, coordinates, experiment_id: Optional[str] = None):
        self.coordinates = coordinates
        self.experiment_id = experiment_id or list(coordinates._tables)[0]

    def show(self):  # pragma: no cover - needs notebook frontend
        try:
            import ipywidgets as widgets
            from IPython.display import display
        except ImportError as e:
            raise ImportError(
                "The interactive sanity-check GUI requires ipywidgets in a "
                "notebook; use deepof_tpu.sanitycheck.render_frame for "
                "headless single-frame rendering."
            ) from e
        keys = list(self.coordinates._tables)
        exp = widgets.Dropdown(
            options=keys, value=self.experiment_id, description="experiment"
        )
        n = len(self.coordinates._tables[self.experiment_id])
        slider = widgets.IntSlider(min=0, max=n - 1, description="frame")
        bps = widgets.SelectMultiple(
            options=list(self.coordinates._nodes), description="bodyparts"
        )
        toggles = {
            name: widgets.Checkbox(description=name)
            for name in ("distances", "angles", "speeds", "arena", "labels")
        }
        toggles["arena"].value = True

        def update(experiment, frame, selected, distances, angles, speeds,
                   arena, labels):
            import matplotlib.pyplot as plt

            plt.close("all")
            slider.max = len(self.coordinates._tables[experiment]) - 1
            render_frame(
                self.coordinates, experiment, min(frame, slider.max),
                bodyparts=list(selected) or None,
                show_distances=distances, show_angles=angles,
                show_speeds=speeds, show_arena=arena, show_labels=labels,
            )
            plt.show()

        display(
            widgets.interactive(
                update, experiment=exp, frame=slider, selected=bps,
                distances=toggles["distances"], angles=toggles["angles"],
                speeds=toggles["speeds"], arena=toggles["arena"],
                labels=toggles["labels"],
            )
        )
