"""Global constants, enums, and canonical catalogs for deepof_tpu.

TPU-native rebuild of the constants layer of mlfpm/deepof
(reference: deepof/config.py). Color maps, body-part catalogs, behavior
catalogs and unit enums are part of the public API surface and are kept
value-compatible with the reference so downstream consumers (plots, exports,
behavior tables) line up.
"""

from __future__ import annotations

from contextvars import ContextVar
from enum import Enum

suppress_warnings_context = ContextVar("suppress_warnings", default=True)

PROGRESS_BAR_FIXED_WIDTH = 30

# --------------------------------------------------------------------------- #
# Color maps (reference: deepof/config.py:13-52)
# --------------------------------------------------------------------------- #

ONE_ANIMAL_COLOR_MAP = {
    "climb-arena": ("#1f77b4", "#aec7e8"),
    "sniff-arena": ("#17becf", "#9edae5"),
    "immobility": ("#9467bd", "#c5b0d5"),
    "stat-lookaround": ("#bcbd22", "#dbdb8d"),
    "stat-active": ("#d62728", "#ff9896"),
    "stat-passive": ("#8c564b", "#c49c94"),
    "moving": ("#ff7f0e", "#ffbb78"),
    "sniffing": ("#2ca02c", "#98df8a"),
    "missing": ("#7f7f7f", "#c7c7c7"),
}
TWO_ANIMALS_COLOR_MAP_NONDIRECTIONAL = {
    "nose2nose": "#081ee4",
    "sidebyside": "#aa2e47",
    "sidereside": "#d62246",
}
TWO_ANIMALS_COLOR_MAP_DIRECTIONAL = {
    "nose2tail": ("#179c79", "#06d6a0"),
    "nose2body": ("#0b565f", "#028090"),
    "following": ("#c4a31e", "#f1c40f"),
}
CONTINUOUS_COLOR_MAP = {
    "distance": ("#1f1f1f", "#9e9e9e"),
    "cum-distance": ("#2b2b2b", "#b0b0b0"),
    "speed": ("#141414", "#8a8a8a"),
}
CUSTOM_BEHAVIOR_COLOR_MAP = {
    "custom_0": ("#0B3C5D", "#6A9AC8"),
    "custom_1": ("#004B23", "#4D9E6F"),
    "custom_2": ("#6A040F", "#C15F7A"),
    "custom_3": ("#3A0CA3", "#9B7ED9"),
    "custom_4": ("#7209B7", "#B78CE8"),
    "custom_5": ("#9A3412", "#E39E7A"),
    "custom_6": ("#7F4F24", "#C9A47F"),
    "custom_7": ("#8F7A00", "#D9C25C"),
    "custom_8": ("#006D77", "#4EB8C2"),
    "custom_9": ("#37474F", "#7A9EB3"),
}

# --------------------------------------------------------------------------- #
# Body-part catalogs (reference: deepof/config.py:51-53)
# --------------------------------------------------------------------------- #

DEEPOF_8_BODYPARTS = [
    "Center", "Left_ear", "Left_fhip", "Nose",
    "Right_ear", "Right_fhip", "Tail_base", "Tail_tip",
]
DEEPOF_11_BODYPARTS = [
    "Center", "Left_bhip", "Left_ear", "Left_fhip", "Nose", "Right_bhip",
    "Right_ear", "Right_fhip", "Spine_1", "Spine_2", "Tail_base",
]
DEEPOF_14_BODYPARTS = [
    "Center", "Left_bhip", "Left_ear", "Left_fhip", "Nose", "Right_bhip",
    "Right_ear", "Right_fhip", "Spine_1", "Spine_2", "Tail_1", "Tail_2",
    "Tail_base", "Tail_tip",
]

# --------------------------------------------------------------------------- #
# Behavior catalogs (reference: deepof/config.py:54-58)
# --------------------------------------------------------------------------- #

SINGLE_BEHAVIORS = [
    "climb-arena", "sniff-arena", "immobility", "stat-lookaround",
    "stat-active", "stat-passive", "moving", "sniffing", "missing",
]
SYMMETRIC_BEHAVIORS = ["nose2nose", "sidebyside", "sidereside"]
ASYMMETRIC_BEHAVIORS = ["nose2tail", "nose2body", "following"]
CONTINUOUS_BEHAVIORS = ["distance", "cum-distance", "speed"]
CUSTOM_BEHAVIORS: list = []
CONTINUOUS_UNITS = ["[mm]", "[mm]", "[mm/s]"]

# --------------------------------------------------------------------------- #
# Drawing constants (reference: deepof/config.py:60-105)
# --------------------------------------------------------------------------- #

ROI_COLORS = [
    (204, 20, 20), (204, 131, 20), (167, 204, 20), (57, 204, 20),
    (20, 204, 94), (20, 204, 204), (20, 94, 204), (57, 20, 204),
    (167, 20, 204), (204, 20, 131), (153, 15, 15), (153, 98, 15),
    (125, 153, 15), (43, 153, 15), (15, 153, 70), (15, 153, 153),
    (15, 70, 153), (43, 15, 153), (125, 15, 153), (153, 15, 98),
]
ARENA_COLOR = (40, 86, 236)
BODYPART_COLORS = [
    (0, 0, 255), (255, 0, 0), (0, 255, 0), (255, 255, 0),
    (0, 255, 255), (255, 0, 255), (0, 0, 125), (125, 0, 0),
    (0, 125, 0), (125, 125, 0), (0, 125, 125), (125, 0, 125),
    (125, 153, 15), (43, 153, 15), (15, 153, 70), (15, 153, 153),
    (15, 70, 153), (43, 15, 153), (125, 15, 153), (153, 15, 98),
]
IMG_H_MAX = 700
IMG_W_MAX = 1000

# --------------------------------------------------------------------------- #
# Unit enums (reference: deepof/config.py:109-171). Internal distances are mm.
# --------------------------------------------------------------------------- #


class DistanceUnit(Enum):
    """Conversion factors to internal mm storage. pixel maps to 0 (no scale)."""

    pixel = 0.0
    px = 0.0
    mm = 1.0
    millimeter = 1.0
    cm = 10
    centimeter = 10
    m = 1000
    meter = 1000
    km = 1000000
    kilometer = 1000000
    inch = 25.4


class TimeUnit(Enum):
    """Conversion factors to internal second storage."""

    ms = 0.001
    millisecond = 0.001
    s = 1.0
    sec = 1.0
    second = 1.0
    min = 60
    minute = 60
    h = 3600
    hour = 3600
    day = 86400


class SpeedUnit(Enum):
    """Composite speed units: distance unit per time unit."""

    mm_per_s = (DistanceUnit.mm, TimeUnit.s)
    cm_per_s = (DistanceUnit.cm, TimeUnit.s)
    m_per_s = (DistanceUnit.m, TimeUnit.s)
    km_per_h = (DistanceUnit.km, TimeUnit.h)


# Alias kept for name-compatibility with the reference enum spelling.
Speed_Unit = SpeedUnit

# --------------------------------------------------------------------------- #
# Pipeline thresholds (reference: deepof/data.py:275,434-437,2652)
# --------------------------------------------------------------------------- #

# Above this total frame count, the reference enables its numba fast paths;
# our XLA kernels are always on, but the constant is kept for API parity.
FAST_IMPLEMENTATIONS_THRESHOLD = 50_000

# Out-of-core switch: frames in one video / total frames across videos.
VERY_LARGE_VIDEO_FRAMES = 360_000
VERY_LARGE_TOTAL_FRAMES = 900_000

# Row cap for scaler fitting in preprocess (≈1 GB of RAM in the reference).
PREPROCESS_SAMPLES_MAX = 227_272

def default_supervised_parameters(frame_rate: float) -> dict:
    """Default supervised-annotation parameters.

    Value-parity with the reference (deepof/data.py:2985-2999). Tolerances are
    in mm (the internal distance unit); frame counts derive from frame rate.
    """
    return {
        "close_contact_tol": 25,
        "side_contact_tol": 50,
        "median_filter_width": int(frame_rate / 2),
        "follow_frames": int(frame_rate / 2),
        "min_follow_frames": int(frame_rate / 4),
        "follow_tol": 25,
        "climb_tol": 0.15,
        "sniff_arena_tol": 12.5,
        "min_immobility": int(frame_rate),
        "stationary_threshold": 40,
        "nose_likelihood": 0.85,
    }
