from montecarlosolvers_tpu.utils import observables, profiling
from montecarlosolvers_tpu.utils.checkpoint import (
    CheckpointedAnneal,
    validate_state,
    save_neighbor_table,
    load_neighbor_table,
)

__all__ = [
    "observables",
    "profiling",
    "CheckpointedAnneal",
    "validate_state",
    "save_neighbor_table",
    "load_neighbor_table",
]
