"""Python-first user API — the TPU-native equivalent of the reference's
C API (src/library.{cpp,h}) + ctypes wrapper (python/lammps.py), SURVEY §2.10.

``Simulation`` owns the config, particle state, and compiled step; the
input-script layer (tpusph.script) drives this same object, so reference
LAMMPS scripts and direct Python use share one engine.
"""

from __future__ import annotations

from tpusph.params import PairTables, PhysicsSpec
from tpusph.state import Box, ParticleState


class Simulation:
    """Owns everything a run needs (the LAMMPS top-level object's role,
    src/lammps.cpp — minus the service-locator pattern: dependencies are
    explicit here)."""

    def __init__(self, dim: int = 3):
        self.spec = PhysicsSpec(dim=dim)
        self.tables: PairTables | None = None
        self.state: ParticleState | None = None
        self.box: Box | None = None
        self.dt: float = 0.0
        self.step_count: int = 0

    # The full run loop lands with tpusph.runner (stage 2 of SURVEY §7.3).
