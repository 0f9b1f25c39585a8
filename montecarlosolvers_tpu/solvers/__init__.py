from montecarlosolvers_tpu.solvers import sa, qmc, svmc

__all__ = ["sa", "qmc", "svmc"]
