"""Config 1 of BASELINE.md: 2D heat-conduction slab vs the analytic erf
solution of the diffusion equation — the minimum end-to-end slice
(SURVEY.md §7.4): Simulation API -> force stage -> integrator -> thermo.
"""

import math

import numpy as np
from scipy.special import erf  # noqa — fallback below if scipy missing

from tpusph import lattice
from tpusph.api import Simulation


def build_heat_slab(dx=0.05, lx=2.0, ly=0.4, d_coef=0.1, e1=1.0, e2=2.0):
    # NOTE: ly must be >= 2 * h (= 6 dx here) or periodic minimum-image drops
    # wrapped neighbors and the effective conductivity falls short.
    sim = Simulation(dim=2, screen=False)
    sim.set_kernel("quintic")
    sim.create_box([0, 0, 0], [lx, ly, 1.0],
                   periodic=(False, True, False), ntypes=1)
    # y is periodic: the fill must TILE the box (rows at 0, dx, ..., ly-dx),
    # otherwise a seam gap at the wrap starves neighbors there.
    region = lattice.Block(lo=[dx / 2, -dx / 4, 0], hi=[lx - dx / 2, ly - dx / 2, 0])
    rho0 = 1.0
    m = rho0 * dx * dx
    sim.create_atoms_lattice(1, "sq", dx, region, rho=rho0, cv=1.0, rmass=m)
    x = sim._staged["x"]
    e = np.where(x[:, 0] < lx / 2, e1, e2).astype(np.float32)
    sim.set_values(np.ones(len(x), bool), e=e)
    sim.pair_heatconduction()
    sim.spec = sim.spec._replace(continuity=False)
    sim.tables.set_heatconduction(1, 1, d=d_coef, h=3.0 * dx)
    return sim


def test_heat_slab_matches_erf_profile(tmp_path):
    dx = 0.05
    lx, d_coef, e1, e2 = 2.0, 0.1, 1.0, 2.0
    sim = build_heat_slab(dx=dx, lx=lx, d_coef=d_coef, e1=e1, e2=e2)
    sim.dt = 5e-4
    sim.thermo(50)
    sim.log_path = str(tmp_path / "log.heat")
    sim.thermo_style(["step", "time", "pe"])
    n0 = sim.natoms
    assert n0 > 150
    e_tot0 = float(np.sum(sim._staged["e"]))

    sim.run(100)
    t = 100 * sim.dt

    x = sim.get("x")[:, 0]
    e = sim.get("e")
    x0 = lx / 2 - dx / 2  # particles at lx/2 start on the hot side
    expect = 0.5 * (e1 + e2) + 0.5 * (e2 - e1) * erf((x - x0) / math.sqrt(4 * d_coef * t))
    # interior only: the erf solution assumes an infinite domain
    interior = (x > 0.3) & (x < lx - 0.3)
    err = np.sqrt(np.mean((e[interior] - expect[interior]) ** 2)) / (e2 - e1)
    assert err < 0.01, f"L2 error vs erf = {err}"

    # energy ledger: total internal energy conserved
    assert abs(float(e.sum()) - e_tot0) / e_tot0 < 1e-5

    # thermo log exists, has LAMMPS-format header and step lines
    log = (tmp_path / "log.heat").read_text().splitlines()
    assert log[0].split() == ["Step", "Time", "PotEng"]
    assert log[1].split()[0] == "0"
    assert any(line.startswith("Loop time of") for line in log)


def test_thermo_nan_aborts(tmp_path):
    """SURVEY §5.3: NaN in a thermo column must abort with a clear message."""
    import jax.numpy as jnp
    import dataclasses
    import pytest
    from tpusph.io.thermo import ThermoError

    sim = build_heat_slab(dx=0.1, lx=1.0, ly=0.3)
    sim.thermo(1)
    sim.thermo_style(["step", "pe"])
    sim._build_state()
    sim.state = dataclasses.replace(
        sim.state, e=sim.state.e.at[0].set(jnp.nan))
    with pytest.raises(ThermoError, match="NaN"):
        sim.run(1)
