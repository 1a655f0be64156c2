"""TriTD solver layer (L1 of SURVEY §1)."""

from .base import TriTDConfig, TriTDResult, TriTDState, trim_history
from .admm import tritd_admm, admm_iteration, init_state, init_factors, update_factors
from .als import tritd_als, tritd_mals
from .outlier import OutlierConfig, tritd_admm_outlier
from .checkpointed import tritd_admm_checkpointed, run_segment

__all__ = [
    "TriTDConfig",
    "TriTDResult",
    "TriTDState",
    "trim_history",
    "tritd_admm",
    "admm_iteration",
    "init_state",
    "init_factors",
    "update_factors",
    "tritd_als",
    "tritd_mals",
    "OutlierConfig",
    "tritd_admm_outlier",
    "tritd_admm_checkpointed",
    "run_segment",
]
