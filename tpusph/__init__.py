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

import os as _os


def _enable_compile_cache():
    """Persistent XLA compilation cache: the strip kernels cost minutes of
    Mosaic compile per (spec, geometry) — pay it once per kernel version,
    not per process. Opt out with TPUSPH_NO_COMPILE_CACHE=1; relocate with
    TPUSPH_COMPILE_CACHE_DIR."""
    if _os.environ.get("TPUSPH_NO_COMPILE_CACHE"):
        return
    cache_dir = _os.environ.get(
        "TPUSPH_COMPILE_CACHE_DIR",
        _os.path.join(_os.path.expanduser("~"), ".cache", "tpusph-xla"))
    try:
        import jax
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything, however small/fast — process restarts during
        # iteration re-pay every entry otherwise
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # old jax without the knobs: run uncached


_enable_compile_cache()

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
