"""On-TPU data generation (L1): Gaussian random fields, pseudo-spectral
Navier-Stokes, KS (ETDRK4), and Burgers solvers, plus writers for the
dataset file formats the data layer reads.
"""

from resolution_pde_tpu.datagen.random_fields import GaussianRF
from resolution_pde_tpu.datagen.navier_stokes import navier_stokes_2d
from resolution_pde_tpu.datagen.ks import solve_ks
from resolution_pde_tpu.datagen.burgers import solve_burgers
from resolution_pde_tpu.datagen.writers import (
    write_ks_file,
    write_pdebench_file,
    write_ns_file,
)

__all__ = [
    "GaussianRF",
    "navier_stokes_2d",
    "solve_ks",
    "solve_burgers",
    "write_ks_file",
    "write_pdebench_file",
    "write_ns_file",
]
