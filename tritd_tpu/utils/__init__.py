"""Config presets, artifacts, checkpointing, timing."""

from .config import (
    COMPLETION_TRITD,
    VIDEO_TRITD,
    COMPLETION_MISSING_RATIO,
    README_MISSING_RATIO,
    VIDEO_MISSING_RATIO,
    COMPLETION_DATASETS,
    VIDEO_DATASETS,
    TTNN_PRESET,
    RING_PRESET,
    FCTN_PRESET,
    SOFIA_PRESET,
)
from .artifacts import artifact_path, save_artifact, load_artifact, save_raw
from .timing import sync, device_timer, PhaseTimer, time_fn
from .checkpoint import save_state, load_state, CheckpointManager
from .debug import nan_debug, strict_determinism, check_finite
from .timing import profiler_trace

__all__ = [
    "COMPLETION_TRITD",
    "VIDEO_TRITD",
    "COMPLETION_MISSING_RATIO",
    "README_MISSING_RATIO",
    "VIDEO_MISSING_RATIO",
    "COMPLETION_DATASETS",
    "VIDEO_DATASETS",
    "TTNN_PRESET",
    "RING_PRESET",
    "FCTN_PRESET",
    "SOFIA_PRESET",
    "artifact_path",
    "save_artifact",
    "load_artifact",
    "save_raw",
    "sync",
    "device_timer",
    "PhaseTimer",
    "time_fn",
    "save_state",
    "load_state",
    "CheckpointManager",
    "nan_debug",
    "strict_determinism",
    "check_finite",
    "profiler_trace",
]
