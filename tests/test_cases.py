"""All five BASELINE case scripts parse and run a few steps at coarse
resolution (the example-as-regression pattern of the reference, SURVEY §4).
Full-resolution physics gates live in the dedicated test files."""

import numpy as np
import pytest

from tpusph.script import Interpreter


def run_case(path, nsteps=5, var=None, stop_before_run=True):
    interp = Interpreter(variables=var or {})
    interp.sim.screen = False
    text = open(path).read()
    lines = [l for l in text.splitlines()
             if not l.strip().startswith(("run", "dump"))]
    interp.run_string("\n".join(lines))
    interp.command(f"run {nsteps}")
    return interp.sim


def test_heat_slab_case():
    sim = run_case("cases/heat_slab/in.heat_slab", var={"dx": "0.04"})
    assert sim.natoms > 2000
    assert np.isfinite(sim.get("e")).all()
    # both temperature levels still present after 5 steps
    t = sim.get("e")
    assert t.min() < 1.1 and t.max() > 1.9


def test_water_collapse_case():
    sim = run_case("cases/water_collapse/in.water_collapse")
    assert np.isfinite(sim.get("x")).all()


def test_droplet_case():
    sim = run_case("cases/droplet/in.droplet")
    assert np.isfinite(sim.get("rho")).all()


def test_bubble_rise_case():
    sim = run_case("cases/bubble_rise/in.bubble_rise", var={"dx": "0.08"})
    assert sim.spec.phase_change and sim.spec.gravity
    # the REAL /phasechange conduction variant, not an alias to plain
    # conduction, with T_sat pinned on the liquid/vapor cross pair
    assert sim.spec.surface_tension and sim.spec.heat_phasechange
    assert not sim.spec.heatconduction
    assert float(np.asarray(sim.tables.tsat)[1, 2]) == 2.0
    assert np.isfinite(sim.get("x")).all()
    assert (sim.get("type") == 2).sum() > 0


def test_boiling_case():
    sim = run_case("cases/boiling/in.boiling", var={"dx": "0.08"},
                   nsteps=12)
    assert sim.spec.phase_change
    # the superheated droplet starts evaporating immediately
    assert np.isfinite(sim.get("x")).all()


def test_full_size_counts():
    """The case scripts reach their BASELINE particle budgets at the
    documented full-resolution dx (build only, no run)."""
    interp = Interpreter(variables={"dx": "0.01"})
    interp.sim.screen = False
    text = open("cases/bubble_rise/in.bubble_rise").read()
    lines = [l for l in text.splitlines()
             if not l.strip().startswith(("run", "dump", "pair_", "fix",
                                          "thermo", "neighbor", "timestep"))]
    interp.run_string("\n".join(lines))
    assert interp.sim.natoms > 450_000  # config-4 budget ~500k
