from montecarlosolvers_tpu.solvers import sa, qmc, svmc, pt

__all__ = ["sa", "qmc", "svmc", "pt"]
