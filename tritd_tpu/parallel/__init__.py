"""Multi-chip sharding layer: mesh helpers + sharded ADMM."""

from .mesh import make_mesh, slab_sharding, replicated, pad_to_multiple
from .sharded_admm import tritd_admm_sharded, tritd_admm_auto, tritd_admm_batch_sharded

__all__ = [
    "make_mesh",
    "slab_sharding",
    "replicated",
    "pad_to_multiple",
    "tritd_admm_sharded",
    "tritd_admm_auto",
    "tritd_admm_batch_sharded",
]
