"""Video export: per-cluster snippets and annotated overlay videos.

Behavioral spec: deepof/export_video.py — cluster snippet export (:113),
annotated videos with arena/ROI/marker/label overlays (:254-574). Rendering
is OpenCV; the per-frame data (positions in px, behavior masks, cluster
assignments) comes from the device pipeline.
"""

from __future__ import annotations

import os
import warnings
from typing import Dict, List, Optional, Union

import numpy as np
import pandas as pd

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None

from dataclasses import dataclass, field
from typing import Any, Tuple

from deepof_tpu.core.storage import get_dt
from deepof_tpu.config import ARENA_COLOR, BODYPART_COLORS, ROI_COLORS
from deepof_tpu.visuals_utils import contiguous_segments, get_behavior_colors, hex_to_BGR


@dataclass
class VideoExportConfig:
    """Annotation toggles for exported videos — same fields and defaults
    as the reference's config object (export_video.py:43-56)."""

    display_behavior_names: bool = True
    display_video_name: bool = False
    display_time: bool = False
    display_counter: bool = False
    display_arena: bool = False
    display_markers: bool = False
    display_mouse_labels: bool = False
    display_loading_bar: bool = True
    display_roi: Optional[int] = None
    supervised_export: bool = True


@dataclass
class VideoExportProps:
    """Drawing parameters for text and shapes on exported frames
    (reference export_video.py:58-69)."""

    font: Any = field(
        default_factory=lambda: getattr(cv2, "FONT_HERSHEY_DUPLEX", 2)
    )
    font_scale: float = 0.5
    thickness: int = 1
    padding: int = 5
    text_color: Tuple[int, int, int] = (255, 255, 255)
    outline_color: Tuple[int, int, int] = (0, 0, 0)
    arena_color: Tuple[int, int, int] = (40, 86, 236)
    arena_thickness: int = 3
    marker_radius: int = 3


def _open_video(path: str):
    cap = cv2.VideoCapture(path)
    if not cap.isOpened() or cap.get(cv2.CAP_PROP_FRAME_COUNT) <= 0:
        cap.release()
        raise IOError(f"Could not open video {path}")
    return cap


def _px_positions(coordinates, key: str) -> np.ndarray:
    """Positions back in pixel space (T, B, 2)."""
    scales = coordinates._scales[key]
    mm = np.array(coordinates._tables[key], dtype=np.float64)
    return mm * (scales[2] / scales[3])


def _draw_arena(frame, coordinates, key):
    from deepof_tpu.arena import extract_corners_from_arena

    params = coordinates._arena_params[key]
    scales = coordinates._scales[key]
    ratio = scales[2] / scales[3]
    poly = (
        extract_corners_from_arena(params)
        if isinstance(params, tuple)
        else np.asarray(params, float)
    )
    poly_px = np.round(poly * ratio).astype(np.int32)
    cv2.polylines(frame, [poly_px], isClosed=True, color=ARENA_COLOR, thickness=2)
    return frame


def _draw_rois(frame, coordinates, key):
    rois = (coordinates._roi_dicts or {}).get(key, {})
    scales = coordinates._scales[key]
    ratio = scales[2] / scales[3]
    for i, (_, roi) in enumerate(sorted(rois.items())):
        poly = np.round(np.asarray(roi, float) * ratio).astype(np.int32)
        cv2.polylines(
            frame, [poly], isClosed=True,
            color=ROI_COLORS[i % len(ROI_COLORS)], thickness=1,
        )
    return frame


def _draw_markers(frame, positions_px, frame_idx):
    pts = positions_px[frame_idx]
    for bi in range(pts.shape[0]):
        x, y = pts[bi]
        if np.isfinite(x) and np.isfinite(y):
            cv2.circle(
                frame, (int(x), int(y)), 3,
                BODYPART_COLORS[bi % len(BODYPART_COLORS)], -1,
            )
    return frame


def _draw_mouse_labels(frame, coordinates, positions_px, frame_idx):
    """Animal-id labels at each animal's Center bodypart
    (deepof/export_video.py:326-354)."""
    nodes = list(coordinates._nodes)
    for aid in coordinates._animal_ids:
        if not aid:
            continue
        bp = f"{aid}_Center"
        if bp not in nodes:
            bp = next((n for n in nodes if n.startswith(f"{aid}_")), None)
            if bp is None:
                continue
        pt = positions_px[frame_idx, nodes.index(bp)]
        if np.isfinite(pt).all():
            cv2.putText(
                frame, aid, (int(pt[0]) + 6, int(pt[1]) - 6),
                cv2.FONT_HERSHEY_SIMPLEX, 0.5, (0, 255, 255), 1, cv2.LINE_AA,
            )
    return frame


def _filter_keys_by_condition(coordinates, keys, exp_condition, condition_value):
    """Restrict experiments to one condition value
    (deepof/export_video.py:72-90)."""
    if condition_value is None:
        return keys
    out = []
    for k in keys:
        cond = (coordinates._exp_conditions or {}).get(k)
        if hasattr(cond, "iloc"):
            if exp_condition is not None and exp_condition in cond.columns:
                cond = str(cond[exp_condition].iloc[0])
            else:
                cond = str(cond.iloc[0, 0])
        if str(cond) == str(condition_value):
            out.append(k)
    return out


def _draw_behavior_info(frame, behaviors_active: List[str], colors: List[str]):
    y = 20
    for name, color in zip(behaviors_active, colors):
        cv2.putText(
            frame, name, (10, y), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
            hex_to_BGR(color), 1, cv2.LINE_AA,
        )
        y += 18
    return frame


def output_annotated_video(
    coordinates,
    experiment_id: str,
    supervised_annotations=None,
    soft_counts=None,
    behaviors: Optional[List[str]] = None,
    frame_limit: Optional[int] = None,
    display_arena: bool = True,
    display_markers: bool = True,
    display_rois: bool = False,
    display_mouse_labels: bool = False,
    out_path: Optional[str] = None,
    config: Optional[VideoExportConfig] = None,
    props: Optional[VideoExportProps] = None,
) -> str:
    """Render one experiment's video with overlays; returns the output path
    (deepof/export_video.py:399-574).

    ``config``/``props`` carry the reference's annotation-toggle and
    drawing-parameter objects; when ``config`` is given its fields
    override the individual boolean kwargs and additionally enable the
    video-name, timestamp, and per-behavior seconds-counter overlays."""
    if config is not None:
        display_arena = config.display_arena
        display_markers = config.display_markers
        display_rois = config.display_roi is not None
        display_mouse_labels = config.display_mouse_labels
    props = props or VideoExportProps()
    video_path = os.path.join(
        coordinates._video_path, coordinates._videos[experiment_id]
    )
    cap = _open_video(video_path)
    fps = cap.get(cv2.CAP_PROP_FPS) or coordinates._frame_rate
    w = int(cap.get(cv2.CAP_PROP_FRAME_WIDTH))
    h = int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))
    n_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    if frame_limit:
        n_frames = min(n_frames, frame_limit)

    if out_path is None:
        out_dir = os.path.join(
            coordinates._project_path, coordinates._project_name, "Videos"
        )
        os.makedirs(out_dir, exist_ok=True)
        out_path = os.path.join(out_dir, f"{experiment_id}_annotated.mp4")
    writer = cv2.VideoWriter(
        out_path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (w, h)
    )

    positions_px = _px_positions(coordinates, experiment_id)

    sup_tab = None
    colors: List[str] = []
    if supervised_annotations is not None:
        sup_tab = pd.DataFrame(get_dt(supervised_annotations, experiment_id))
        if behaviors is None:
            behaviors = [
                c for c in sup_tab.columns
                if not any(s in str(c) for s in ("speed", "distance"))
            ]
        colors = get_behavior_colors(behaviors, coordinates._animal_ids)
    counts = (
        np.asarray(get_dt(soft_counts, experiment_id))
        if soft_counts is not None else None
    )
    behavior_seconds: Dict[str, int] = {}

    for i in range(n_frames):
        ok, frame = cap.read()
        if not ok:
            break
        if display_arena:
            frame = _draw_arena(frame, coordinates, experiment_id)
        if display_rois:
            frame = _draw_rois(frame, coordinates, experiment_id)
        if display_markers and i < len(positions_px):
            frame = _draw_markers(frame, positions_px, i)
        if display_mouse_labels and i < len(positions_px):
            frame = _draw_mouse_labels(frame, coordinates, positions_px, i)
        if sup_tab is not None and i < len(sup_tab) and (
            config is None or (config.supervised_export and config.display_behavior_names)
        ):
            active = [b for b in behaviors if sup_tab[b].iloc[i] > 0.1]
            active_colors = [c for b, c in zip(behaviors, colors) if sup_tab[b].iloc[i] > 0.1]
            if config is not None and config.display_counter:
                for b in active:
                    behavior_seconds[b] = behavior_seconds.get(b, 0) + 1
                active = [
                    f"{b} ({behavior_seconds.get(b, 0) / fps:.1f}s)" for b in active
                ]
            frame = _draw_behavior_info(frame, active, active_colors)
        if config is not None and (config.display_video_name or config.display_time):
            header = []
            if config.display_video_name:
                header.append(experiment_id)
            if config.display_time:
                header.append(f"{i / fps:7.2f}s")
            y = props.padding + 15
            cv2.putText(
                frame, "  ".join(header), (props.padding, y),
                props.font, props.font_scale, props.outline_color,
                props.thickness + 1, cv2.LINE_AA,
            )
            cv2.putText(
                frame, "  ".join(header), (props.padding, y),
                props.font, props.font_scale, props.text_color,
                props.thickness, cv2.LINE_AA,
            )
        if counts is not None and i < len(counts):
            cv2.putText(
                frame, f"cluster {int(counts[i].argmax())}", (10, h - 10),
                cv2.FONT_HERSHEY_SIMPLEX, 0.6, (255, 255, 255), 1, cv2.LINE_AA,
            )
        writer.write(frame)

    cap.release()
    writer.release()
    return out_path


def output_videos_per_cluster(
    coordinates,
    soft_counts=None,
    supervised_annotations=None,
    behaviors: Optional[List[str]] = None,
    min_confidence: float = 0.0,
    min_bout_duration: Optional[int] = None,
    exp_condition: Optional[str] = None,
    condition_value: Optional[str] = None,
    out_path: Optional[str] = None,
    single_output_resolution: tuple = (500, 500),
    frame_limit_per_video: int = 250,
) -> Dict[str, str]:
    """Concatenate video snippets per cluster / behavior into one clip each
    (deepof/export_video.py:113-238). Returns {cluster: output path}."""
    if out_path is None:
        out_path = os.path.join(
            coordinates._project_path, coordinates._project_name, "Videos"
        )
    os.makedirs(out_path, exist_ok=True)
    if min_bout_duration is None:
        min_bout_duration = int(coordinates._frame_rate // 2)

    # Collect bouts per label across (optionally condition-filtered)
    # experiments.
    keys = _filter_keys_by_condition(
        coordinates, list(coordinates._tables.keys()),
        exp_condition, condition_value,
    )
    bouts: Dict[str, List] = {}
    for key in keys:
        if soft_counts is not None:
            counts = np.asarray(get_dt(soft_counts, key))
            hard = counts.argmax(axis=1)
            conf = counts.max(axis=1)
            for cluster in np.unique(hard):
                mask = (hard == cluster) & (conf >= min_confidence)
                starts, ends = contiguous_segments(mask)
                for s, e in zip(starts, ends):
                    if e - s >= min_bout_duration:
                        bouts.setdefault(str(cluster), []).append((key, s, e))
        else:
            tab = pd.DataFrame(get_dt(supervised_annotations, key))
            names = behaviors or [
                c for c in tab.columns
                if not any(s in str(c) for s in ("speed", "distance"))
            ]
            for b in names:
                mask = (tab[b] > 0.1).to_numpy()
                starts, ends = contiguous_segments(mask)
                for s, e in zip(starts, ends):
                    if e - s >= min_bout_duration:
                        bouts.setdefault(str(b), []).append((key, s, e))

    outputs = {}
    for label, segments in bouts.items():
        clip_path = os.path.join(out_path, f"cluster_{label}.mp4")
        writer = None
        written = 0
        for key, s, e in segments:
            if written >= frame_limit_per_video:
                break
            video_path = os.path.join(
                coordinates._video_path, coordinates._videos[key]
            )
            try:
                cap = _open_video(video_path)
            except IOError:
                warnings.warn(f"Could not open video for {key}; skipping.")
                continue
            cap.set(cv2.CAP_PROP_POS_FRAMES, int(s))
            for _ in range(int(e - s)):
                ok, frame = cap.read()
                if not ok or written >= frame_limit_per_video:
                    break
                frame = cv2.resize(frame, single_output_resolution)
                if writer is None:
                    writer = cv2.VideoWriter(
                        clip_path, cv2.VideoWriter_fourcc(*"mp4v"),
                        coordinates._frame_rate, single_output_resolution,
                    )
                writer.write(frame)
                written += 1
            cap.release()
        if writer is not None:
            writer.release()
            outputs[label] = clip_path
    return outputs
