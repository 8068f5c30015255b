"""tpusph — a TPU-native multiphase smoothed-particle-hydrodynamics engine.

A from-scratch JAX/XLA/Pallas reimplementation of the capability surface of
``quang-ha/lammps-sph-multiphase`` (LAMMPS + USER-SPH multiphase fork; see
SURVEY.md for the component inventory). The compute path is jitted XLA and
fused Pallas kernels over a sorted cell grid; distribution is
``jax.shard_map`` bricks with ``ppermute`` halo exchange over a TPU mesh.

Reference capability map (SURVEY.md §2):
  - atom_style meso per-particle state        -> tpusph.state.ParticleState
  - SPH smoothing kernels (Lucy/quintic/...)  -> tpusph.kernels
  - pair_sph_* force styles                   -> tpusph.ops.*
  - fix meso / fix meso/stationary integrator -> tpusph.integrate
  - neighbor binning + lists                  -> tpusph.grid (sorted cell grid)
  - MPI domain decomposition + halo exchange  -> tpusph.dist (Mesh + ppermute)
  - read_data / thermo / dump / restart       -> tpusph.io
  - input-script language                     -> tpusph.script
  - C/Python API (library.cpp, lammps.py)     -> tpusph.api.Simulation
"""

__version__ = "0.1.0"

from tpusph.state import ParticleState, Box
from tpusph.params import PhysicsSpec, PairTables
from tpusph.api import Simulation

__all__ = [
    "ParticleState",
    "Box",
    "PhysicsSpec",
    "PairTables",
    "Simulation",
    "__version__",
]
