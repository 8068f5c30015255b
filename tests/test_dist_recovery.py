"""Dist-mode adaptive geometry recovery (r3 VERDICT #5): a strip coverage
violation on a multi-brick mesh must NOT abort the run — the reference's MPI
re-neighboring continues unconditionally (SURVEY §3.2 rebuild branch).
api.run pulls the state (brick-local -> global via _host_x), re-chooses the
shared strip geometry from the evolved per-brick views with the measured
shortfall as a margin floor, repartitions, and continues with steps-kept
accounting."""

import numpy as np
import pytest
import jax

pytestmark = pytest.mark.skipif(
    jax.device_count() < 4, reason="needs >= 4 (virtual) devices")


def _fluid_sim(nbricks):
    from tpusph.api import Simulation

    n_side, dx = 16, 1.0
    L = n_side * dx
    sim = Simulation(dim=3, screen=False)
    sim.backend_name = "strip"
    sim.create_box([0, 0, 0], [L, L, L], periodic=(True,) * 3, ntypes=1)
    rng = np.random.default_rng(5)
    ax = np.arange(n_side, dtype=np.float32) * dx
    g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
    g = (g + rng.uniform(-0.05, 0.05, g.shape)).astype(np.float32)
    sim.add_particles(g, np.ones(len(g), np.int32), rho=1.0, e=1.0, cv=1.0,
                      rmass=1.0)
    sim.tables.set_taitwater(1, 1, rho0=1.0, c0=8.0, viscosity=0.4, h=3.0)
    sim.tables.set_rhosum(1, 1, h=3.0)
    sim.pair_taitwater()
    sim.pair_rhosum(every=1)
    sim.set_values(np.ones(sim.natoms, bool),
                   v=rng.normal(0.0, 0.15, (sim.natoms, 3)))
    sim.neighbor_skin = 0.5
    sim.dt = 5e-3
    sim.thermo(5)
    if nbricks > 1:
        sim.set_mesh(nbricks, shape=(2, 2), axes=(0, 1))
    return sim


@pytest.mark.slow
def test_dist_coverage_violation_recovers():
    """Squeeze the first shared geometry's rank-window margins to a
    guaranteed-violating 1 chunk per side (the deterministic analog of
    margins outgrown mid-run, test_strip_window_violation_detected); the
    run must complete all steps through a re-choose instead of raising,
    and the re-chosen geometry must carry the measured shortfall floor."""
    from tpusph import dist as distmod
    from tpusph.ops.strip_pair import StripBackend

    real = distmod.choose_strip_geometry_dist
    calls = []

    def squeezing(*args, **kw):
        geom, cap = real(*args, **kw)
        calls.append((geom.mlo, geom.mhi) if geom is not None else None)
        if len(calls) == 1 and geom is not None:
            geom = geom._replace(mlo=1, mhi=1)
        return geom, cap

    distmod.choose_strip_geometry_dist = squeezing
    try:
        sim = _fluid_sim(4)
        nsteps = 20
        sim.run(nsteps)
    finally:
        distmod.choose_strip_geometry_dist = real

    # the violation fired and was recovered, not raised
    assert getattr(sim, "_strip_violations", 0) >= 1
    assert len(calls) >= 2, calls
    # the re-choice carried the measured shortfall as a margin floor
    assert getattr(sim, "_strip_extra", (0, 0)) > (0, 0)
    # steps-kept accounting: every step executed exactly once
    assert sim.step_count == nsteps
    assert sim.time_acc == pytest.approx(nsteps * sim.dt)
    # still the strip kernel per brick (no silent demotion), margins clean
    backend = sim._runner.backend
    assert isinstance(getattr(backend, "inner", None), StripBackend)
    assert int(np.sum(np.asarray(jax.device_get(sim.aux.overflow)))) == 0
    # physics stayed finite and nothing was lost in the repartition
    assert sim.natoms == 16 ** 3
    e = sim.get("e")
    assert np.isfinite(e).all()
    assert np.isfinite(sim.get("v")).all()


@pytest.mark.slow
def test_dist_recovery_matches_uninterrupted():
    """The recovered 4-brick run must land on the same state as an
    UNINTERRUPTED 4-brick run of the same case (the re-choose changes the
    geometry/partition, not the physics): positions/velocities/energies
    agree to f32 roundoff."""
    from tpusph import dist as distmod

    sim_ref = _fluid_sim(4)
    sim_ref.run(20)

    real = distmod.choose_strip_geometry_dist
    ncall = [0]

    def squeezing(*args, **kw):
        geom, cap = real(*args, **kw)
        ncall[0] += 1
        if ncall[0] == 1 and geom is not None:
            geom = geom._replace(mlo=1, mhi=1)
        return geom, cap

    distmod.choose_strip_geometry_dist = squeezing
    try:
        sim = _fluid_sim(4)
        sim.run(20)
    finally:
        distmod.choose_strip_geometry_dist = real

    assert getattr(sim, "_strip_violations", 0) >= 1
    a = {f: sim_ref.get(f) for f in ("tag", "x", "v", "e", "rho")}
    b = {f: sim.get(f) for f in ("tag", "x", "v", "e", "rho")}
    assert np.array_equal(a["tag"], b["tag"])
    L = 16.0
    dx = a["x"] - b["x"]
    dx -= L * np.round(dx / L)
    np.testing.assert_allclose(dx, 0.0, atol=5e-4)
    np.testing.assert_allclose(b["v"], a["v"], atol=5e-4)
    np.testing.assert_allclose(b["e"], a["e"], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(b["rho"], a["rho"], rtol=2e-4)
