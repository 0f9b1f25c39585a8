from montecarlosolvers_tpu.bench.mst import (
    mst_benchmark,
    sa_arm,
    piqmc_arm,
    plot_results,
)

__all__ = ["mst_benchmark", "sa_arm", "piqmc_arm", "plot_results"]
