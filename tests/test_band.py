"""Band-kernel (ops/band_pair) equivalence vs the XLA cell-grid backend
(itself validated against the dense O(N^2) oracle). Interpret mode on CPU;
the same kernels compile via Mosaic on TPU (TPUSPH_TEST_TPU=1).

The band backend stores state SLOT-RESIDENT (row = cell*cap + rank), so all
comparisons join on particle tag."""

import dataclasses as dc

import numpy as np
import pytest
import jax

from tpusph import kernels
from tpusph import grid as gridlib
from tpusph.forces import compute_forces
from tpusph.ops.band_pair import (
    BandBackend, BandGeometry, build_slots, choose_band_geometry)
from tpusph.ops.cellgrid import CellGridBackend
from tpusph.params import PhysicsSpec
from tpusph.state import Box

from test_pallas import lattice_system


def by_tag(state, *fields):
    dev = jax.device_get(state)
    alive = np.asarray(dev.type) > 0
    order = np.argsort(np.asarray(dev.tag)[alive], kind="stable")
    out = []
    for f in fields:
        arr = np.asarray(getattr(dev, f))
        out.append(arr[alive][order])
    return out


def run_cellgrid_stage(st, box, tables, spec):
    geom = gridlib.make_geometry(box, tables.max_cut(), spec.dim, skin=0.2,
                                 cap=64)
    cgb = CellGridBackend(geom)
    st_s, data = cgb.init_aux(st, box)
    assert int(data.overflow[0]) == 0
    return compute_forces(st_s, tables, spec, box, cgb, istep=0, aux=data)


def run_band_stage(st, box, tables, spec, skin=0.2):
    x = np.asarray(st.x)[np.asarray(st.type) > 0]
    geom = choose_band_geometry(box, tables.max_cut(), spec.dim, skin, x=x)
    assert geom is not None, "band geometry must exist for this box"
    bb = BandBackend(geom, box, ntypes=tables.ntypes, interpret=True)
    st_b, data = bb.init_aux(st, box)
    assert int(data.overflow[0]) == 0
    return bb.force_stage(st_b, tables, spec, box, data, istep=0)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("periodic", [True, False])
def test_band_matches_cellgrid(dim, periodic):
    st, box, tables = lattice_system(dim, periodic=periodic, seed=dim + 20)
    spec = PhysicsSpec(dim=dim, kernel=kernels.WENDLAND_C2, tait=True,
                       heatconduction=True, surface_tension=True,
                       rhosum_every=1)
    out_c = run_cellgrid_stage(st, box, tables, spec)
    out_b = run_band_stage(st, box, tables, spec)

    for field, rtol, atol in (("rho", 2e-5, 1e-6), ("f", 2e-4, 5e-4),
                              ("drho", 2e-4, 1e-4), ("de", 2e-4, 5e-4)):
        (a,) = by_tag(out_c, field)
        (b,) = by_tag(out_b, field)
        np.testing.assert_allclose(b, a, rtol=rtol, atol=atol,
                                   err_msg=field)


def test_band_variants_match_cellgrid():
    st, box, tables = lattice_system(3, nside=8, seed=31)
    for spec in (
        PhysicsSpec(dim=3, kernel=kernels.LUCY, morris=True, tait=False),
        PhysicsSpec(dim=3, kernel=kernels.LUCY, ideal_gas=True, tait=False),
        PhysicsSpec(dim=3, kernel=kernels.LUCY, lj=True, tait=False),
    ):
        out_c = run_cellgrid_stage(st, box, tables, spec)
        out_b = run_band_stage(st, box, tables, spec)
        for field in ("f", "de", "drho"):
            (a,) = by_tag(out_c, field)
            (b,) = by_tag(out_b, field)
            np.testing.assert_allclose(b, a, rtol=2e-4, atol=5e-4,
                                       err_msg=field)


def test_band_scalar_fold_flags_preserve_physics():
    st, box, tables = lattice_system(3, nside=8, ntypes=2, seed=9)
    h = float(tables.max_cut())
    for i in (1, 2):
        for j in (i, 2):
            tables.set_heatconduction(i, j, d=0.15, h=h)
            tables.set_surfacetension(i, j, sigma=0.8, h=h)
    base = PhysicsSpec(dim=3, kernel=kernels.LUCY, tait=True,
                       heatconduction=True, surface_tension=True,
                       rhosum_every=1)
    flagged = base._replace(
        scalar_tables=("cut", "cut_heat", "cut_rho", "cut_tension",
                       "visc", "heat_D", "sigma", "rho0", "tait_b", "c0",
                       "gas_gamma"),
        shared_wfd=True)
    out0 = run_band_stage(st, box, tables, base)
    out1 = run_band_stage(st, box, tables, flagged)
    for field in ("rho", "f", "de", "drho"):
        (a,) = by_tag(out0, field)
        (b,) = by_tag(out1, field)
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6, err_msg=field)


@pytest.mark.slow
def test_band_dynamics_matches_cellgrid():
    """A short dynamic run (rebuilds firing) through the Simulation API must
    agree between band and cellgrid backends."""
    from tpusph.api import Simulation

    def make(backend):
        sim = Simulation(dim=3, screen=False)
        sim.backend_name = backend
        rng = np.random.default_rng(7)
        side, dx = 10, 0.5
        ax = np.arange(side) * dx
        g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
        g = g + rng.uniform(-0.05, 0.05, g.shape)
        L = side * dx
        sim.create_box([0, 0, 0], [L, L, L], periodic=(True,) * 3, ntypes=1)
        v = rng.normal(0, 0.05, g.shape)
        sim.add_particles(g.astype(np.float32), 1, v=v.astype(np.float32),
                          rho=1.0, e=1.0, cv=1.0, rmass=0.125)
        sim.pair_rhosum(1)
        sim.pair_taitwater()
        sim.tables.set_taitwater(1, 1, rho0=1.0, c0=8.0, viscosity=0.3,
                                 h=2.2 * dx)
        sim.tables.set_rhosum(1, 1, h=2.2 * dx)
        sim.neighbor_skin = 0.25
        sim.dt = 5e-4
        sim.thermo(0)
        sim.run(40)
        return sim

    sim_b = make("band")
    from tpusph.ops.band_pair import BandBackend as BB
    assert isinstance(sim_b._backend_cache["backend"], BB)
    sim_c = make("cellgrid")
    for field in ("x", "v", "rho", "e"):
        a = sim_c.get(field)
        b = sim_b.get(field)
        np.testing.assert_allclose(b, a, rtol=5e-4, atol=5e-4, err_msg=field)


def test_band_overflow_counts_and_drops():
    """A deliberately tiny slot capacity must COUNT the overflow (the host
    check aborts) rather than silently mis-sum."""
    st, box, tables = lattice_system(3, nside=8, seed=3)
    x = np.asarray(st.x)[np.asarray(st.type) > 0]
    geom = choose_band_geometry(box, tables.max_cut(), 3, 0.2, x=x)
    tight = geom._replace(c=8)
    n_alive = int((np.asarray(st.type) > 0).sum())
    bb = BandBackend(tight, box, ntypes=2, interpret=True)
    st_b = bb.resize(st)
    st_b, data = build_slots(st_b, tight, box)
    assert int(data.overflow[0]) > 0
    kept = int(np.asarray(jax.device_get(st_b.alive)).sum())
    assert kept + int(data.overflow[0]) == n_alive
