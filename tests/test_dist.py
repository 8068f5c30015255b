"""Distributed-mode tests on the 8-virtual-device CPU mesh (SURVEY §4:
serial-vs-parallel equivalence is THE distributed correctness gate, here as
1-device vs N-brick runs of identical physics)."""

import numpy as np
import pytest
import jax

from tpusph.script import Interpreter

pytestmark = pytest.mark.skipif(
    jax.device_count() < 4, reason="needs >= 4 (virtual) devices")


PERIODIC_SCRIPT = """
dimension      2
units          si
atom_style     meso
boundary       p p p

region         box block 0 {lx} 0 1.6 -0.05 0.05 units box
create_box     1 box
lattice        sq 0.1
region         fill block 0.0 {lxf} 0.0 1.55 -0.1 0.1 units box
create_atoms   1 region fill
mass           1 0.01

set            group all meso/rho 1.0 meso/e 1.0 meso/cv 1.0

pair_style     hybrid/overlay sph/rhosum 3 sph/taitwater
pair_coeff     * * sph/rhosum 0.3
pair_coeff     * * sph/taitwater 1.0 5.0 0.3 0.3

fix            integrate all meso
velocity       all set 0.15 0.05 0
neighbor       0.1 bin
timestep       2.0e-4
thermo_style   custom step time ke
"""


def run_case(nbricks, nsteps=60, lx=3.2, backend=None):
    interp = Interpreter()
    interp.sim.screen = False
    interp.run_string(PERIODIC_SCRIPT.format(lx=lx, lxf=lx - 0.05))
    sim = interp.sim
    if backend:
        sim.backend_name = backend
    if nbricks > 1:
        sim.set_mesh(nbricks)
    elif not backend:
        sim.backend_name = "cellgrid"
    sim.run(nsteps)
    order = None
    out = {}
    for f in ("x", "v", "rho", "e", "tag"):
        out[f] = sim.get(f)
    return sim, out


def test_bricks_match_single_device():
    """Same trajectory on 1 device and on 4 bricks, to f32 roundoff.
    Uniform drift drives particles across brick boundaries (migration) and
    through the periodic seam."""
    sim1, a = run_case(1)
    sim4, b = run_case(4)
    assert np.array_equal(a["tag"], b["tag"])
    # positions: compare modulo the periodic box
    L = np.array([3.2, 1.6, 1.0])
    dx = a["x"] - b["x"]
    dx -= L * np.round(dx / L)
    np.testing.assert_allclose(dx, 0.0, atol=5e-4)
    np.testing.assert_allclose(a["rho"], b["rho"], rtol=1e-4)
    np.testing.assert_allclose(a["e"], b["e"], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(a["v"], b["v"], atol=5e-4)
    # nothing lost
    assert sim4.natoms == sim1.natoms


def test_bricks_8way():
    sim1, a = run_case(1, nsteps=30, lx=6.4)
    sim8, b = run_case(8, nsteps=30, lx=6.4)
    assert sim8.natoms == sim1.natoms
    L = np.array([6.4, 1.6, 1.0])
    dx = a["x"] - b["x"]
    dx -= L * np.round(dx / L)
    np.testing.assert_allclose(dx, 0.0, atol=5e-4)


def test_bricks_with_pallas_inner():
    """Bricks with the fused Pallas kernel per brick (interpret mode on CPU)
    match the single-device trajectory — the multi-chip perf path."""
    sim1, a = run_case(1, nsteps=30)
    sim4, b = run_case(4, nsteps=30, backend="pallas")
    assert sim4.natoms == sim1.natoms
    L = np.array([3.2, 1.6, 1.0])
    dx = a["x"] - b["x"]
    dx -= L * np.round(dx / L)
    np.testing.assert_allclose(dx, 0.0, atol=5e-4)
    np.testing.assert_allclose(a["rho"], b["rho"], rtol=2e-4)


def test_dist_overflow_counter_visible():
    """The aux overflow counter is observable from the host."""
    interp = Interpreter()
    interp.sim.screen = False
    interp.run_string(PERIODIC_SCRIPT.format(lx=3.2, lxf=3.15))
    sim = interp.sim
    sim.set_mesh(4)
    sim.run(10)
    ov = int(np.sum(np.asarray(jax.device_get(sim.aux.overflow))))
    assert ov == 0
