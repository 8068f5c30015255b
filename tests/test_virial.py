"""Virial `press` (thermo.cpp pressure parity — SURVEY §2.8, VERDICT r2 #9).

Gate: on a uniform periodic Tait lattice compressed to rho > rho0 at rest,
the virial pressure P = 0.5 sum_i vir_i / (dim V) must match the EOS
pressure B((rho/rho0)^7 - 1): the SPH sum rule sum_j grad W . r_ij ->
-dim rho/m makes them equal in the continuum limit, and a lattice at
h = 3 dx is well inside a few % of it.
"""

import numpy as np
import pytest

from tpusph.api import Simulation


def _uniform_tait_sim(backend: str, n_side=8, rho=1.05):
    dx = 1.0
    L = n_side * dx
    h = 3.0 * dx
    sim = Simulation(dim=3, screen=False)
    sim.backend_name = backend
    sim.create_box([0, 0, 0], [L, L, L], periodic=(True,) * 3, ntypes=1)
    ax = np.arange(n_side, dtype=np.float32) * dx
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
    # geometric mass density must equal the set rho (the virial sum rule
    # sum_j m grad W . r -> -dim rho_geom); otherwise press is off by
    # (rho_geom/rho)^2 by construction, not by error
    sim.add_particles(g, 1, rho=rho, rmass=rho * dx**3)
    sim.pair_taitwater()
    sim.tables.set_taitwater(1, 1, rho0=1.0, c0=10.0, viscosity=0.0, h=h)
    sim.neighbor_skin = 0.5 * dx
    sim.thermo_style(["step", "press"])
    sim.thermo(0)
    return sim


@pytest.mark.parametrize("backend", ["dense", "cellgrid", "band", "strip"])
def test_virial_press_matches_eos(backend):
    # strip: small boxes are below the seam-band minimum (L >= ~6h); 18
    # strips fine and exercises the OVIR row plumbing of the production 1M
    # backend (strip_pair OVIR output row — VERDICT r3 weak #7)
    sim = _uniform_tait_sim(backend, n_side=18 if backend == "strip" else 8)
    assert sim.spec.virial  # thermo_style press flipped the flag
    sim.run(0)              # Verlet::setup computes forces (and vir)
    if backend == "strip":
        from tpusph.ops.strip_pair import StripBackend
        assert isinstance(sim._ensure_runner().backend, StripBackend)
    press = sim._thermo_values(sim.state, 0)["press"]
    rho = 1.05
    b = 10.0**2 * 1.0 / 7.0
    p_eos = b * (rho**7 - 1.0)
    assert press == pytest.approx(p_eos, rel=0.05), (press, p_eos)


def test_virial_vir_zero_without_flag():
    sim = _uniform_tait_sim("dense")
    sim.thermo_style(["step", "ke"])   # press removed -> flag off
    assert not sim.spec.virial
    sim.run(0)
    assert float(np.abs(np.asarray(sim.state.vir)).max()) == 0.0
