from montecarlosolvers_tpu.parallel.mesh import (
    make_mesh,
    shard_chains,
    chain_sharding,
)
from montecarlosolvers_tpu.parallel import trotter

__all__ = ["make_mesh", "shard_chains", "chain_sharding", "trotter"]
from montecarlosolvers_tpu.parallel import disorder  # noqa: E402

__all__.append("disorder")
from montecarlosolvers_tpu.parallel import multihost  # noqa: E402

__all__.append("multihost")
