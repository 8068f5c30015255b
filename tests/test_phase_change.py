"""fix phase_change tests: insertion into the pool, grow-neighbor transfer,
conservation ledgers (mass exact, energy minus latent heat), interface
gating, rebuild trigger (SURVEY §3.5)."""

import numpy as np
import pytest

from tpusph.script import Interpreter

# A hot liquid slab with a vapor layer above it; heat conduction keeps the
# interface hot, evaporation transfers mass to the vapor phase.
EVAP_SCRIPT = """
dimension      2
units          si
atom_style     meso
boundary       p f p

region         box block 0 0.6 0 1.0 -0.05 0.05 units box
create_box     2 box
lattice        sq 0.05

region         liquid block 0.0 0.59 0.0 0.4 -0.1 0.1 units box
region         vapor  block 0.0 0.59 0.425 0.6 -0.1 0.1 units box
create_atoms   1 region liquid
create_atoms   2 region vapor

group          liquid type 1
group          vapor type 2

set            group liquid meso/rho 1.0 meso/e 5.0 meso/cv 1.0 mass 2.5e-3
set            group vapor  meso/rho 0.1 meso/e 1.0 meso/cv 1.0 mass 2.5e-4

# conduction-only physics: no pressure forces, so the energy ledger is
# exactly (latent heat) x (converted mass) — the cleanest gate on the fix
pair_style     sph/heatconduction
pair_coeff     * * 0.05 0.15

fix            integrate all meso
fix            evap liquid phase_change 2.0 0.5 1.0e-4 1 2 every 5 offset 0.01 seed 7
timestep       1.0e-4
thermo_style   custom step time ke
"""


@pytest.fixture()
def evap():
    interp = Interpreter()
    interp.sim.screen = False
    interp.run_string(EVAP_SCRIPT)
    return interp


def _ledger(sim):
    t = sim.get("type")
    m = sim.get("rmass")
    e = sim.get("e")
    return dict(
        n=len(t),
        n_vapor=int((t == 2).sum()),
        mass=float(m.sum()),
        mass_liquid=float(m[t == 1].sum()),
        e_total=float(e.sum()),
    )


def test_evaporation_inserts_vapor_and_conserves(evap):
    sim = evap.sim
    cfg = sim.phase_change_config
    before = _ledger(sim)

    sim.run(50)

    after = _ledger(sim)
    # particles were created
    assert after["n"] > before["n"]
    assert after["n_vapor"] > before["n_vapor"]
    n_events_mass = (before["mass_liquid"] - after["mass_liquid"]) / cfg.dm
    n_created = after["n"] - before["n"]
    assert n_events_mass == pytest.approx(n_created, abs=0.01)

    # exact mass conservation
    assert after["mass"] == pytest.approx(before["mass"], rel=1e-6)

    # energy ledger: heat conduction conserves sum(e); evaporation debits
    # exactly latent * dm per event
    e_drop = before["e_total"] - after["e_total"]
    expected_drop = cfg.latent * cfg.dm * n_created
    assert e_drop == pytest.approx(expected_drop, rel=0.01)  # f32 accumulation

    assert np.isfinite(sim.get("x")).all()


def test_phase_change_interface_gating():
    """Liquid with NO vapor anywhere and require_interface: nothing happens."""
    interp = Interpreter()
    interp.sim.screen = False
    script = EVAP_SCRIPT.replace("""region         vapor  block 0.0 0.59 0.425 0.6 -0.1 0.1 units box
create_atoms   1 region liquid
create_atoms   2 region vapor
""", """create_atoms   1 region liquid
""").replace("group          vapor type 2\n", "").replace(
        "set            group vapor  meso/rho 0.1 meso/e 1.0 meso/cv 1.0 mass 2.5e-4\n", "")
    interp.run_string(script)
    sim = interp.sim
    n0 = sim.natoms
    sim.run(20)
    assert sim.natoms == n0  # no vapor neighbors -> no evaporation


def test_phase_change_threshold_gating(evap):
    """Below the temperature threshold nothing evaporates."""
    sim = evap.sim
    mask = np.ones(sim.natoms, bool)
    sim.set_values(mask, e=0.5)  # T = 0.5 < Tc = 2.0
    n0 = sim.natoms
    sim.run(20)
    assert sim.natoms == n0


def test_phase_change_grow_mode():
    interp = Interpreter()
    interp.sim.screen = False
    script = EVAP_SCRIPT.replace(
        "fix            evap liquid phase_change 2.0 0.5 1.0e-4 1 2 every 5 offset 0.01 seed 7",
        "fix            evap liquid phase_change 2.0 0.5 1.0e-4 1 2 every 5 mode grow seed 7")
    interp.run_string(script)
    sim = interp.sim
    before = _ledger(sim)
    sim.run(50)
    after = _ledger(sim)
    # no new particles; vapor phase gained mass
    assert after["n"] == before["n"]
    assert after["mass"] == pytest.approx(before["mass"], rel=1e-6)
    assert after["mass_liquid"] < before["mass_liquid"]
