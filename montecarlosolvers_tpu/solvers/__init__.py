from montecarlosolvers_tpu.solvers import sa, qmc, svmc, pt, pa

__all__ = ["sa", "qmc", "svmc", "pt", "pa"]
