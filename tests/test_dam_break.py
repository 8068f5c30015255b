"""Config 2 (BASELINE): 2D water-collapse dam break at reduced resolution —
full physics pipeline (rhosum + taitwater/morris + gravity + stationary
walls + cell grid + rebuilds) with physical gates: containment, mass
conservation, weak compressibility, wavefront advance."""

import numpy as np
import pytest

from tpusph.script import Interpreter

DAM_SCRIPT = """
dimension      2
units          si
atom_style     meso
boundary       f f p

region         box block 0 2 0 1.5 -0.05 0.05 units box
create_box     2 box
lattice        sq 0.05

region         wbottom block 0.0 2.0 0.0 0.18 -0.05 0.05 units box
region         wleft   block 0.0 0.18 0.18 1.5 -0.05 0.05 units box
region         wright  block 1.82 2.0 0.18 1.5 -0.05 0.05 units box
region         walls union 3 wbottom wleft wright
region         water block 0.2 0.65 0.2 0.9 -0.05 0.05 units box

create_atoms   1 region water
create_atoms   2 region walls

group          water type 1
group          walls type 2

set            group all meso/rho 1000.0 meso/e 0.0 meso/cv 1.0 mass 2.5

pair_style     hybrid/overlay sph/rhosum 1 sph/taitwater/morris
pair_coeff     * * sph/rhosum 0.15
pair_coeff     * * sph/taitwater/morris 1000.0 20.0 0.3 0.15

fix            gfix water gravity -9.81 vector 0 1 0
fix            integrate water meso
fix            wallfix walls meso/stationary

neighbor       0.05 bin
timestep       1.0e-4
thermo_style   custom step time ke
"""


@pytest.fixture(scope="module")
def dam():
    interp = Interpreter()
    interp.sim.screen = False
    interp.run_string(DAM_SCRIPT)
    return interp


def test_dam_break_dynamics(dam):
    sim = dam.sim
    water0 = sim.group_mask("water")
    n_water = int(water0.sum())
    assert n_water > 100
    mass0 = float(np.sum(sim._staged["rmass"]))

    x0 = sim.get("x")
    front0 = x0[sim.get("type") == 1][:, 0].max()

    sim.run(600)  # t = 0.06 s

    x = sim.get("x")
    types = sim.get("type")
    rho = sim.get("rho")
    water = types == 1

    # 1. no NaN anywhere
    assert np.isfinite(x).all() and np.isfinite(rho).all()

    # 2. containment: water stays inside the tank (above floor, within walls)
    assert x[water, 0].min() > 0.05
    assert x[water, 0].max() < 1.95
    assert x[water, 1].min() > 0.05

    # 3. mass conservation (rmass untouched by this physics)
    mass = float(np.sum(sim.get("rmass")))
    assert mass == pytest.approx(mass0, rel=1e-6)

    # 4. weakly compressible: density within 15% of rho0 for the bulk
    assert np.percentile(rho[water], 5) > 800.0  # free-surface kernel deficiency
    assert np.percentile(rho[water], 95) < 1150.0

    # 5. the front advanced to the right (dam collapse began)
    front = x[water, 0].max()
    assert front > front0 + 0.1, f"front {front0} -> {front}"

    # 6. kinetic energy is nonzero (flow happening) but bounded
    v = sim.get("v")
    ke = 0.5 * np.sum(sim.get("rmass") * np.sum(v**2, axis=1))
    assert 0.0 < ke < 2.0 * mass0 * 9.81 * 0.9  # below total PE budget


def test_dam_break_wavefront_scaling(dam):
    """Front position vs the classic dam-break similarity solution: by
    t* = t sqrt(2g/H) ~ 1 the front should have moved roughly 0.5-1.5 H
    beyond the initial column (Martin & Moyce-type behavior, loose gate)."""
    sim = dam.sim
    # continue the run to t = 0.18 s total; H = 0.7, sqrt(2g/H) = 5.3
    sim.run(1200)
    x = sim.get("x")
    water = sim.get("type") == 1
    front = x[water, 0].max()
    h0 = 0.7
    assert front - 0.65 > 0.3 * h0
    assert np.isfinite(sim.get("rho")).all()
