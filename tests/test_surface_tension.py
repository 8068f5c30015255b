"""Config 3 (BASELINE): CSF surface tension via color gradient + Hu-Adams
capillary stress. Gates: instantaneous force sanity on a circular droplet,
then the Laplace law dP = sigma/R at relaxed equilibrium (2D)."""

import numpy as np
import pytest

from tpusph.script import Interpreter

R_DROP = 0.2
SIGMA = 1.0
RHO0 = 1.0
C0 = 10.0
DX = 0.025

DROPLET_SCRIPT = f"""
dimension      2
units          si
atom_style     meso
boundary       p p p

region         box block 0 0.8 0 0.8 -0.05 0.05 units box
create_box     2 box
lattice        sq {DX}
region         fill block 0.0 0.79 0.0 0.79 -0.1 0.1 units box
create_atoms   2 region fill
region         drop sphere 0.4 0.4 0.0 {R_DROP} units box
set            region drop type 1

group          drop type 1
group          ambient type 2

set            group all meso/rho {RHO0} meso/e 0.0 meso/cv 1.0 mass {RHO0 * DX * DX}

pair_style     hybrid/overlay sph/rhosum 1 sph/taitwater/morris sph/surfacetension
pair_coeff     * * sph/rhosum {3 * DX}
pair_coeff     * * sph/taitwater/morris {RHO0} {C0} 1.0 {3 * DX}
pair_coeff     1 2 sph/surfacetension {SIGMA} {3 * DX}

fix            integrate all meso
neighbor       {DX} bin
timestep       2.5e-4
thermo_style   custom step time ke
"""


@pytest.fixture(scope="module")
def droplet():
    interp = Interpreter()
    interp.sim.screen = False
    interp.run_string(DROPLET_SCRIPT)
    return interp


def tait_pressure(rho):
    b = C0 * C0 * RHO0 / 7.0
    return b * ((rho / RHO0) ** 7 - 1.0)


def test_instantaneous_capillary_forces(droplet):
    """At t=0 (sharp circular interface): net force ~ 0, interface forces
    significant, far-field forces ~ 0."""
    sim = droplet.sim
    sim._build_state()
    runner = sim._ensure_runner()
    if sim.aux is None and hasattr(runner.backend, "init_aux"):
        sim.state, sim.aux = runner.backend.init_aux(sim.state, sim.box)
    sim.state = runner.setup(sim.state, sim.tables, istep=0, aux=sim.aux)

    f = sim.get("f")
    x = sim.get("x")
    r = np.linalg.norm(x[:, :2] - 0.4, axis=1)
    fmag = np.linalg.norm(f, axis=1)

    # net force on the whole system vanishes (momentum conservation)
    assert np.abs(f.sum(axis=0)).max() < 1e-3 * fmag.max()

    near = np.abs(r - R_DROP) < 2 * DX
    far = np.abs(r - R_DROP) > 6 * DX
    assert fmag[near].max() > 50 * max(fmag[far].max(), 1e-12)


def test_laplace_pressure(droplet):
    """Relax the droplet under Morris viscosity (overdamped); interior
    pressure must exceed exterior by sigma/R within 5%."""
    sim = droplet.sim
    sim.run(1000)

    x = sim.get("x")
    rho = sim.get("rho")
    types = sim.get("type")
    assert np.isfinite(rho).all()

    r = np.linalg.norm(x[:, :2] - 0.4, axis=1)
    inside = (r < 0.6 * R_DROP) & (types == 1)
    outside = (r > 1.8 * R_DROP) & (types == 2)
    assert inside.sum() > 20 and outside.sum() > 100

    p_in = tait_pressure(np.median(rho[inside]))
    p_out = tait_pressure(np.median(rho[outside]))
    dp = p_in - p_out
    dp_expect = SIGMA / R_DROP
    assert dp == pytest.approx(dp_expect, rel=0.05), \
        f"dP = {dp}, expected sigma/R = {dp_expect}"

    # the relaxation is overdamped: residual kinetic energy is tiny
    v = sim.get("v")
    ke = 0.5 * np.sum(sim.get("rmass") * np.sum(v**2, axis=1))
    assert ke < 1e-4
