from montecarlosolvers_tpu.ops.metropolis import (
    colored_metropolis_sweep,
    metropolis_accept,
)
from montecarlosolvers_tpu.ops import piqmc, svmc_ops, cluster

__all__ = [
    "colored_metropolis_sweep",
    "metropolis_accept",
    "piqmc",
    "svmc_ops",
    "cluster",
]
