from montecarlosolvers_tpu.models.ising import (
    IsingProblem,
    generate_neighbors,
    classical_ising_energy,
    bits2spins,
    spins2bits,
)
from montecarlosolvers_tpu.models.coloring import greedy_coloring
from montecarlosolvers_tpu.models import instances

__all__ = [
    "IsingProblem",
    "generate_neighbors",
    "classical_ising_energy",
    "greedy_coloring",
    "bits2spins",
    "spins2bits",
    "instances",
]
