"""Interactive QC: frame-by-frame viewer overlaying kinematics on video.

Behavioral spec: deepof/sanitycheck.py:27-318 — an ipywidgets GUI that
steps through video frames and overlays bodypart markers plus selected
angle/distance/speed readouts. Needs a notebook frontend (ipywidgets) and
readable videos; both are optional here, with a matplotlib fallback that
renders a single annotated frame headlessly.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


def render_frame(
    coordinates,
    experiment_id: str,
    frame_index: int = 0,
    show_distances: bool = False,
    show_angles: bool = False,
    show_speeds: bool = False,
    ax=None,
):
    """Render one annotated frame (video background when readable,
    skeleton-only otherwise)."""
    import os

    import matplotlib.pyplot as plt

    from deepof_tpu.export_video import _px_positions

    own = ax is None
    if own:
        _, ax = plt.subplots()

    frame = None
    video_path = os.path.join(
        coordinates._video_path, coordinates._videos[experiment_id]
    )
    if cv2 is not None:
        cap = cv2.VideoCapture(video_path)
        if cap.isOpened() and cap.get(cv2.CAP_PROP_FRAME_COUNT) > frame_index:
            cap.set(cv2.CAP_PROP_POS_FRAMES, frame_index)
            ok, img = cap.read()
            if ok:
                frame = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        cap.release()
    if frame is not None:
        ax.imshow(frame)

    pts = _px_positions(coordinates, experiment_id)[frame_index]
    ax.scatter(pts[:, 0], pts[:, 1], c="red", s=12)
    for i, j in coordinates._body_graph.edges:
        ax.plot([pts[i, 0], pts[j, 0]], [pts[i, 1], pts[j, 1]], "y-", lw=1)

    lines = [f"{experiment_id} | frame {frame_index}"]
    if show_speeds:
        sp = coordinates.get_coords(speed=1)[experiment_id]
        if frame_index < len(sp):
            med = np.nanmedian(sp.iloc[frame_index])
            lines.append(f"median speed: {med:.1f} mm/s")
    if show_distances:
        d = coordinates.get_distances()[experiment_id]
        if frame_index < len(d):
            lines.append(f"median edge length: {np.nanmedian(d.iloc[frame_index]):.1f} mm")
    if show_angles:
        a = coordinates.get_angles()[experiment_id]
        if frame_index < len(a):
            lines.append(f"median angle: {np.degrees(np.nanmedian(a.iloc[frame_index])):.0f} deg")
    ax.set_title("\n".join(lines), fontsize=8)
    if frame is None:
        ax.invert_yaxis()
    return ax


class GUI:
    """ipywidgets frame browser (requires a notebook frontend)."""

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
        n = len(self.coordinates._tables[self.experiment_id])
        slider = widgets.IntSlider(min=0, max=n - 1, description="frame")
        toggles = {
            name: widgets.Checkbox(description=name)
            for name in ("distances", "angles", "speeds")
        }

        def update(frame, distances, angles, speeds):
            import matplotlib.pyplot as plt

            plt.close("all")
            render_frame(
                self.coordinates, self.experiment_id, frame,
                show_distances=distances, show_angles=angles, show_speeds=speeds,
            )
            plt.show()

        display(
            widgets.interactive(
                update, frame=slider,
                distances=toggles["distances"],
                angles=toggles["angles"],
                speeds=toggles["speeds"],
            )
        )
