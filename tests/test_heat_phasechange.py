"""sph/heatconduction/phasechange — the fork's interface-pinned conduction
(SURVEY §2.3, expected src/USER-SPH/pair_sph_heatconduction_phasechange.cpp).

Physics gate: pairs whose tsat entry is > 0 conduct against the saturation
point cv*T_sat instead of the neighbor's energy, so a superheated liquid
held against vapor relaxes its INTERFACE to T_sat while the bulk (no vapor
neighbors, uniform T) stays hot. Plain sph/heatconduction would do nothing
here (uniform T => zero flux) — the variant is genuinely different physics.
"""

import numpy as np
import pytest
import jax

from tpusph import kernels
from tpusph.api import Simulation
from tpusph.params import PhysicsSpec


def make_slab(pin_tsat):
    """Liquid slab (x < 4) against vapor slab (x >= 4), both superheated at
    T = 3; conduction only (no EOS => no motion)."""
    sim = Simulation(dim=2, screen=False)
    sim.backend_name = "cellgrid"
    dx = 0.5
    nx, ny = 16, 8
    ax = np.arange(nx) * dx
    ay = np.arange(ny) * dx
    g = np.stack(np.meshgrid(ax, ay, indexing="ij"), -1).reshape(-1, 2)
    types = np.where(g[:, 0] < 4.0, 1, 2).astype(np.int32)
    sim.create_box([0, 0, 0], [nx * dx, ny * dx, 1.0],
                   periodic=(False, True, False), ntypes=2)
    sim.add_particles(g.astype(np.float32), types, rho=1.0, e=3.0, cv=1.0,
                      rmass=0.25)
    sim.pair_heatconduction(phasechange=True)
    h = 2.2 * dx
    # conduction across the interface only: the pinned channel in isolation
    sim.tables.set_heatconduction(1, 2, d=0.4, h=h,
                                  tsat=2.0 if pin_tsat else 0.0)
    sim.dt = 2e-3
    sim.thermo(0)
    sim.run(1500)
    return sim


def test_interface_pins_to_tsat_bulk_stays_hot():
    sim = make_slab(pin_tsat=True)
    x = sim.get("x")
    T = sim.get("t")
    types = sim.get("type")
    liquid = types == 1
    interface = liquid & (x[:, 0] > 3.3)   # the last liquid column
    bulk = liquid & (x[:, 0] < 2.0)
    t_int = float(T[interface].mean())
    t_bulk = float(T[bulk].mean())
    # interface relaxed to T_sat = 2.0; bulk exactly 3.0 (no same-phase
    # conduction in this setup — the pinned channel in isolation)
    assert 1.8 < t_int < 2.2, t_int
    np.testing.assert_allclose(T[bulk], 3.0, rtol=1e-5)
    assert t_bulk > 2.9


def test_without_tsat_uniform_t_is_inert():
    sim = make_slab(pin_tsat=False)
    T = sim.get("t")
    np.testing.assert_allclose(T, 3.0, rtol=1e-5)


def test_heat_phasechange_backend_equivalence():
    """cellgrid == pallas == band for the pinned-conduction spec."""
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_pallas import lattice_system
    from test_band import run_band_stage, run_cellgrid_stage, by_tag
    from tpusph import grid as gridlib
    from tpusph.ops.cellgrid import CellGridBackend
    from tpusph.ops.pallas_pair import PallasBackend
    from tpusph.forces import compute_forces

    st, box, tables = lattice_system(3, nside=8, seed=41)
    tables.set_heatconduction(1, 2, d=0.15, h=float(tables.max_cut()),
                              tsat=1.0)
    spec = PhysicsSpec(dim=3, kernel=kernels.LUCY, tait=True,
                       heat_phasechange=True, rhosum_every=1)

    out_c = run_cellgrid_stage(st, box, tables, spec)

    geom = gridlib.make_geometry(box, tables.max_cut(), 3, skin=0.2, cap=64)
    cgb = CellGridBackend(geom)
    st_s, data = cgb.init_aux(st, box)
    pb = PallasBackend(geom, box, ntypes=2, interpret=True)
    out_p = compute_forces(st_s, tables, spec, box, pb, istep=0, aux=data)

    out_b = run_band_stage(st, box, tables, spec)

    (de_c,) = by_tag(out_c, "de")
    for out in (out_p, out_b):
        (de,) = by_tag(out, "de")
        np.testing.assert_allclose(de, de_c, rtol=2e-4, atol=5e-4)


def test_script_wires_phasechange_variant():
    """The script name must select the VARIANT spec (not alias to plain
    conduction) and parse the optional Tsat coefficient."""
    from tpusph.script import Interpreter
    script = """
dimension      2
atom_style     meso
boundary       f p f
region         box block 0 4 0 2 0 1 units box
create_box     2 box
lattice        sq 0.5
region         fill block 0 3.9 0 1.9 0 1 units box
create_atoms   1 region fill
pair_style     hybrid/overlay sph/heatconduction/phasechange
pair_coeff     * * sph/heatconduction/phasechange 0.3 1.1
pair_coeff     1 2 sph/heatconduction/phasechange 0.3 1.1 2.5
fix            1 all meso
timestep       0.001
"""
    it = Interpreter(Simulation(screen=False))
    it.run_string(script)
    sim = it.sim
    assert sim.spec.heat_phasechange
    assert not sim.spec.heatconduction
    t = np.asarray(sim.tables.tsat)
    assert t[1, 2] == t[2, 1] == 2.5
    assert t[1, 1] == 0.0
