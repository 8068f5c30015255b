"""Cell-grid backend vs the dense O(N^2) oracle: identical physics on random
systems (SURVEY §4: brute-force pair reference vs the grid path)."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpusph import grid as gridlib
from tpusph import kernels
from tpusph.ops import dense
from tpusph.ops.cellgrid import CellGridBackend
from tpusph.params import PairTables, PhysicsSpec
from tpusph.state import Box, ParticleState


def random_system(n=96, dim=3, seed=0, box_l=3.0, periodic=(True, True, True),
                  ntypes=2):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, box_l, size=(n, 3)).astype(np.float32)
    if dim == 2:
        x[:, 2] = 0.0
        periodic = (periodic[0], periodic[1], False)
    v = rng.normal(0, 0.2, size=(n, 3)).astype(np.float32)
    if dim == 2:
        v[:, 2] = 0.0
    st = ParticleState.from_arrays(
        x, rng.integers(1, ntypes + 1, n), rmass=np.full(n, 0.25), v=v,
        rho=rng.uniform(0.9, 1.3, n).astype(np.float32),
        e=rng.uniform(0.5, 2.0, n).astype(np.float32),
        capacity=128)
    box = Box.create([0, 0, 0], [box_l, box_l, box_l if dim == 3 else 1.0],
                     periodic=periodic)
    tables = PairTables.zeros(ntypes)
    for i in range(1, ntypes + 1):
        for j in range(i, ntypes + 1):
            tables.set_taitwater(i, j, rho0=1.0, c0=8.0, viscosity=0.4, h=0.9)
            tables.set_rhosum(i, j, h=0.9)
            tables.set_heatconduction(i, j, d=0.2, h=0.8)
            tables.set_surfacetension(i, j, sigma=0.5, h=0.9)
    return st, box, tables


def grid_backend(st, box, tables, dim, cap=64):
    geom = gridlib.make_geometry(box, tables.max_cut(), dim, skin=0.1, cap=cap)
    be = CellGridBackend(geom)
    st_sorted, data = be.init_aux(st, box)
    return be, st_sorted, data


def unsort(values, sorted_state, orig_state):
    """Map per-particle outputs from sorted order back to tag order."""
    stags = np.asarray(sorted_state.tag)
    otags = np.asarray(orig_state.tag)
    pos = {t: i for i, t in enumerate(stags)}
    idx = np.array([pos[t] for t in otags])
    return np.asarray(values)[idx]


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("periodic", [(True, True, True), (False, False, False)])
def test_cellgrid_matches_dense(dim, periodic):
    st, box, tables = random_system(dim=dim, periodic=periodic, seed=dim)
    spec = PhysicsSpec(dim=dim, kernel=kernels.LUCY, tait=True,
                       heatconduction=True, surface_tension=True,
                       rhosum_every=1)

    rho_d = dense.rho_summation(st, tables, spec, box)
    cg_d = dense.color_gradient(st, tables, spec, box)
    f_d, drho_d, de_d = dense.force(st, tables, spec, box, cg=cg_d)

    be, st_s, data = grid_backend(st, box, tables, dim)
    assert int(data.overflow[0]) == 0
    rho_g = be.rho_summation(st_s, tables, spec, box, aux=data)
    cg_g = be.color_gradient(st_s, tables, spec, box, aux=data)
    f_g, drho_g, de_g = be.force(st_s, tables, spec, box, aux=data, cg=cg_g)

    np.testing.assert_allclose(unsort(rho_g, st_s, st)[:96],
                               np.asarray(rho_d)[:96], rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(unsort(cg_g, st_s, st)[:96],
                               np.asarray(cg_d)[:96], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(unsort(f_g, st_s, st)[:96],
                               np.asarray(f_d)[:96], rtol=2e-4, atol=5e-4)
    np.testing.assert_allclose(unsort(drho_g, st_s, st)[:96],
                               np.asarray(drho_d)[:96], rtol=2e-4, atol=5e-5)
    np.testing.assert_allclose(unsort(de_g, st_s, st)[:96],
                               np.asarray(de_d)[:96], rtol=2e-4, atol=5e-4)


def test_cellgrid_small_periodic_box_self_image():
    """A box under 2 cells wide: a particle must see its own periodic image.
    The dense min-image path CANNOT represent this; compare against an
    analytic 2-image computation instead."""
    # one particle alone in a periodic box of size L < 2*cut
    cut = 0.9
    L = 1.2
    st = ParticleState.from_arrays(np.array([[0.1, 0.6, 0.6]]), [1],
                                   rmass=[1.0], rho=[1.0], capacity=128)
    box = Box.create([0, 0, 0], [L, L, L])
    tables = PairTables.zeros(1)
    tables.set_rhosum(1, 1, h=cut)
    spec = PhysicsSpec(dim=3, kernel=kernels.LUCY)
    geom = gridlib.make_geometry(box, cut, 3, skin=0.0, cap=16)
    be = CellGridBackend(geom)
    st_s, data = be.init_aux(st, box)
    rho = be.rho_summation(st_s, tables, spec, box, aux=data)
    w = kernels.kernel_w(kernels.LUCY, 3)
    # self + 2 x-images at distance L (0.9 < 1.2 -> outside cut, so only self)
    # use a tighter box so images ARE in range:
    expect = float(w(jnp.asarray(0.0), cut))
    got = float(rho[np.asarray(st_s.type) > 0][0])
    assert got == pytest.approx(expect, rel=1e-5)

    # now shrink the box so the own-image at distance L=0.8 < cut contributes
    L2 = 0.8
    st2 = ParticleState.from_arrays(np.array([[0.1, 0.4, 0.4]]), [1],
                                    rmass=[1.0], rho=[1.0], capacity=128)
    box2 = Box.create([0, 0, 0], [L2, L2, L2])
    geom2 = gridlib.make_geometry(box2, cut, 3, skin=0.0, cap=16)
    be2 = CellGridBackend(geom2)
    st2_s, data2 = be2.init_aux(st2, box2)
    rho2 = be2.rho_summation(st2_s, tables, spec, box2, aux=data2)
    # six face images at distance 0.8 (<0.9) + self + diagonals out of range
    expect2 = float(w(jnp.asarray(0.0), cut)) + 6 * float(w(jnp.asarray(L2), cut))
    got2 = float(rho2[np.asarray(st2_s.type) > 0][0])
    assert got2 == pytest.approx(expect2, rel=1e-4)


def stable_lattice_system(dim=2, nside=12, dx=0.1, seed=3):
    """A perturbed lattice at equilibrium density — physically stable, so
    trajectories stay bounded and backend differences are attributable."""
    rng = np.random.default_rng(seed)
    ax = [np.arange(nside) * dx] * (2 if dim == 2 else 3)
    pts = np.stack(np.meshgrid(*ax, indexing="ij"), -1).reshape(-1, dim)
    if dim == 2:
        pts = np.concatenate([pts, np.zeros((len(pts), 1))], axis=1)
    n = len(pts)
    v = rng.normal(0, 0.02, size=(n, 3)).astype(np.float32)
    if dim == 2:
        v[:, 2] = 0
    rho0 = 1.0
    m = rho0 * dx**dim
    st = ParticleState.from_arrays(pts.astype(np.float32), np.ones(n), rmass=np.full(n, m),
                                   v=v, rho=np.full(n, rho0),
                                   e=np.full(n, 1.0), capacity=256)
    L = nside * dx
    box = Box.create([0, 0, 0], [L, L, L if dim == 3 else 1.0],
                     periodic=(True, True, dim == 3))
    tables = PairTables.zeros(1)
    tables.set_taitwater(1, 1, rho0=rho0, c0=5.0, viscosity=0.3, h=3 * dx)
    tables.set_rhosum(1, 1, h=3 * dx)
    tables.set_heatconduction(1, 1, d=0.05, h=3 * dx)
    return st, box, tables


def test_cellgrid_dynamics_match_dense():
    """Run 40 steps of full dynamics with both backends; thermo must agree."""
    from tpusph.runner import Runner, thermo_scalars

    st, box, tables = stable_lattice_system(dim=2)
    spec = PhysicsSpec(dim=2, kernel=kernels.QUINTIC_SPLINE, tait=True,
                       rhosum_every=4, heatconduction=True)

    dt = 2e-4
    n = int(np.sum(np.asarray(st.type) > 0))

    r_dense = Runner(spec, box, dense)
    s1 = r_dense.setup(st, tables, istep=0, aux=None)
    s1, _ = r_dense.run(s1, tables, dt, 40, every=40)

    geom = gridlib.make_geometry(box, tables.max_cut(), 2, skin=0.15, cap=64)
    be = CellGridBackend(geom)
    s2, data = be.init_aux(st, box)
    r_grid = Runner(spec, box, be)
    s2 = r_grid.setup(s2, tables, istep=0, aux=data)
    s2, _ = r_grid.run(s2, tables, dt, 40, every=40, aux=data)

    t1 = jax.device_get(thermo_scalars(s1))
    t2 = jax.device_get(thermo_scalars(s2))
    for k in ("ke", "ie", "rho_avg"):
        np.testing.assert_allclose(t1[k], t2[k], rtol=5e-4)
    # per-particle positions agree (sorted back to tag order)
    x1 = unsort(s1.x, s1, st)[:n]
    x2 = unsort(s2.x, s2, st)[:n]
    np.testing.assert_allclose(np.asarray(box.wrap(jnp.asarray(x1))),
                               np.asarray(box.wrap(jnp.asarray(x2))), atol=5e-4)
