"""Pallas column-kernel equivalence vs the XLA cell-grid backend (which is
itself validated against the dense O(N^2) oracle). Runs in interpret mode on
CPU; the same code compiles via Mosaic on TPU (TPUSPH_TEST_TPU=1)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpusph import grid as gridlib
from tpusph import kernels
from tpusph.ops.cellgrid import CellGridBackend
from tpusph.ops.pallas_pair import PallasBackend
from tpusph.params import PairTables, PhysicsSpec
from tpusph.state import Box, ParticleState


def lattice_system(dim, nside=8, dx=0.5, ntypes=2, seed=0, periodic=True):
    rng = np.random.default_rng(seed)
    ax = [np.arange(nside) * dx] * (2 if dim == 2 else 3)
    pts = np.stack(np.meshgrid(*ax, indexing="ij"), -1).reshape(-1, dim)
    if dim == 2:
        pts = np.concatenate([pts, np.zeros((len(pts), 1))], axis=1)
    pts = pts + rng.uniform(-0.1 * dx, 0.1 * dx, pts.shape)
    if dim == 2:
        pts[:, 2] = 0.0
    n = len(pts)
    v = rng.normal(0, 0.1, (n, 3)).astype(np.float32)
    if dim == 2:
        v[:, 2] = 0
    types = rng.integers(1, ntypes + 1, n)
    st = ParticleState.from_arrays(
        pts.astype(np.float32), types, rmass=np.full(n, 0.1), v=v,
        rho=rng.uniform(0.9, 1.2, n).astype(np.float32),
        e=rng.uniform(0.5, 1.5, n).astype(np.float32),
        capacity=((n + 127) // 128) * 128)
    L = nside * dx
    per = (periodic, periodic, periodic if dim == 3 else False)
    box = Box.create([0, 0, 0], [L, L, L if dim == 3 else 1.0], per)
    tables = PairTables.zeros(ntypes)
    h = 2.2 * dx
    for i in range(1, ntypes + 1):
        for j in range(i, ntypes + 1):
            tables.set_taitwater(i, j, rho0=1.0, c0=6.0, viscosity=0.4, h=h)
            tables.set_rhosum(i, j, h=h)
            tables.set_heatconduction(i, j, d=0.15, h=0.9 * h)
    tables.set_surfacetension(1, 2, sigma=0.8, h=h)
    return st, box, tables


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("periodic", [True, False])
def test_pallas_matches_cellgrid(dim, periodic):
    st, box, tables = lattice_system(dim, periodic=periodic, seed=dim)
    spec = PhysicsSpec(dim=dim, kernel=kernels.WENDLAND_C2, tait=True,
                       heatconduction=True, surface_tension=True,
                       rhosum_every=1)
    geom = gridlib.make_geometry(box, tables.max_cut(), dim, skin=0.2,
                                 cap=32)
    cgb = CellGridBackend(geom)
    st_s, data = cgb.init_aux(st, box)
    assert int(data.overflow[0]) == 0

    pb = PallasBackend(geom, box, ntypes=2, interpret=True)

    rho_c = cgb.rho_summation(st_s, tables, spec, box, aux=data)
    rho_p = pb.rho_summation(st_s, tables, spec, box, aux=data)
    np.testing.assert_allclose(np.asarray(rho_p), np.asarray(rho_c),
                               rtol=2e-5, atol=1e-6)

    cg_c = cgb.color_gradient(st_s, tables, spec, box, aux=data)
    cg_p = pb.color_gradient(st_s, tables, spec, box, aux=data)
    np.testing.assert_allclose(np.asarray(cg_p), np.asarray(cg_c),
                               rtol=1e-4, atol=1e-4)

    f_c, drho_c, de_c = cgb.force(st_s, tables, spec, box, aux=data, cg=cg_c)
    f_p, drho_p, de_p = pb.force(st_s, tables, spec, box, aux=data, cg=cg_c)
    np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_c),
                               rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(drho_p), np.asarray(drho_c),
                               rtol=2e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(de_p), np.asarray(de_c),
                               rtol=2e-4, atol=5e-4)


def test_pallas_perf_flags_preserve_physics():
    """scalar-table folding + shared-wfd are pure optimizations: with
    uniform tables the flagged kernel must equal the unflagged one."""
    st, box, tables = lattice_system(3, nside=6, ntypes=2, seed=9)
    # make every table uniform (including tension on all pairs, same cut)
    h = float(tables.max_cut())
    for i in (1, 2):
        for j in (i, 2):
            tables.set_heatconduction(i, j, d=0.15, h=h)
            tables.set_surfacetension(i, j, sigma=0.8, h=h)
    geom = gridlib.make_geometry(box, tables.max_cut(), 3, skin=0.2, cap=32)
    cgb = CellGridBackend(geom)
    st_s, data = cgb.init_aux(st, box)
    base = PhysicsSpec(dim=3, kernel=kernels.LUCY, tait=True,
                       heatconduction=True, surface_tension=True,
                       rhosum_every=1)
    flagged = base._replace(
        scalar_tables=("cut", "cut_heat", "cut_rho", "cut_tension",
                       "visc", "heat_D", "sigma", "rho0", "tait_b", "c0",
                       "gas_gamma"),
        shared_wfd=True)
    pb = PallasBackend(geom, box, ntypes=2, interpret=True)
    cgrad = pb.color_gradient(st_s, tables, base, box, aux=data)
    f0, dr0, de0 = pb.force(st_s, tables, base, box, aux=data, cg=cgrad)
    f1, dr1, de1 = pb.force(st_s, tables, flagged, box, aux=data, cg=cgrad)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(de1), np.asarray(de0),
                               rtol=1e-5, atol=1e-6)


def test_pallas_force_stage_matches_sweeps():
    """The fused force_stage (pack once, dense patches) equals the
    separate-sweep path."""
    import dataclasses as dc
    st, box, tables = lattice_system(3, nside=6, ntypes=2, seed=11)
    spec = PhysicsSpec(dim=3, kernel=kernels.WENDLAND_C2, tait=True,
                       heatconduction=True, surface_tension=True,
                       rhosum_every=1)
    geom = gridlib.make_geometry(box, tables.max_cut(), 3, skin=0.2, cap=32)
    pb = PallasBackend(geom, box, ntypes=2, interpret=True)
    st_s, data = pb.init_aux(st, box)

    rho = pb.rho_summation(st_s, tables, spec, box, aux=data)
    st_sep = dc.replace(st_s, rho=rho)
    cgrad = pb.color_gradient(st_sep, tables, spec, box, aux=data)
    f, drho, de = pb.force(st_sep, tables, spec, box, aux=data, cg=cgrad)

    st_fused = pb.force_stage(st_s, tables, spec, box, data, istep=0)
    np.testing.assert_allclose(np.asarray(st_fused.rho), np.asarray(rho),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(st_fused.f), np.asarray(f),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_fused.drho), np.asarray(drho),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(st_fused.de), np.asarray(de),
                               rtol=1e-5, atol=1e-6)


def test_pallas_morris_and_idealgas():
    st, box, tables = lattice_system(3, nside=6, seed=5)
    geom = gridlib.make_geometry(box, tables.max_cut(), 3, skin=0.2, cap=32)
    cgb = CellGridBackend(geom)
    st_s, data = cgb.init_aux(st, box)
    pb = PallasBackend(geom, box, ntypes=2, interpret=True)

    for spec in (
        PhysicsSpec(dim=3, kernel=kernels.LUCY, morris=True, tait=False),
        PhysicsSpec(dim=3, kernel=kernels.LUCY, ideal_gas=True, tait=False),
        PhysicsSpec(dim=3, kernel=kernels.LUCY, lj=True, tait=False),
    ):
        f_c, drho_c, de_c = cgb.force(st_s, tables, spec, box, aux=data)
        f_p, drho_p, de_p = pb.force(st_s, tables, spec, box, aux=data)
        np.testing.assert_allclose(np.asarray(f_p), np.asarray(f_c),
                                   rtol=2e-4, atol=5e-4)
        np.testing.assert_allclose(np.asarray(de_p), np.asarray(de_c),
                                   rtol=2e-4, atol=5e-4)
