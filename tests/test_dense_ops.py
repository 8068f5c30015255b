"""Dense-backend physics tests: conservation laws, analytic values, and
symmetry properties (SURVEY.md §4's analytic-gate strategy)."""

import numpy as np
import pytest
import jax.numpy as jnp

from tpusph import kernels
from tpusph.ops import dense
from tpusph.params import PairTables, PhysicsSpec
from tpusph.state import Box, ParticleState


def make_random_state(n=64, ntypes=1, seed=0, box_l=4.0, dim=3, vel=True):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, box_l, size=(n, 3)).astype(np.float32)
    if dim == 2:
        x[:, 2] = 0.0
    types = rng.integers(1, ntypes + 1, size=n)
    v = rng.normal(0, 0.1, size=(n, 3)).astype(np.float32) if vel else None
    if v is not None and dim == 2:
        v[:, 2] = 0.0
    st = ParticleState.from_arrays(
        x, types, rmass=np.full(n, 0.3), v=v,
        rho=np.full(n, 1.1), e=rng.uniform(0.5, 1.5, n), cv=np.full(n, 1.0),
    )
    per = (True, True, True) if dim == 3 else (True, True, False)
    box = Box.create([0, 0, 0], [box_l, box_l, box_l if dim == 3 else 1.0],
                     periodic=per)
    return st, box


def test_rho_summation_uniform_lattice_approximates_density():
    """On a uniform periodic lattice with m = rho0 * dx^3, summed density
    must come out near rho0 (standard SPH sanity check)."""
    nside = 8
    dx = 0.5
    rho0 = 1.0
    m = rho0 * dx**3
    grid = np.stack(np.meshgrid(*[np.arange(nside) * dx] * 3, indexing="ij"),
                    axis=-1).reshape(-1, 3).astype(np.float32)
    n = grid.shape[0]
    st = ParticleState.from_arrays(grid, np.ones(n), rmass=np.full(n, m),
                                   rho=np.full(n, rho0))
    box = Box.create([0, 0, 0], [nside * dx] * 3)
    tables = PairTables.zeros(1)
    tables.set_rhosum(1, 1, h=3.0 * dx)
    spec = PhysicsSpec(dim=3, kernel=kernels.QUINTIC_SPLINE)
    rho = np.asarray(dense.rho_summation(st, tables, spec, box))
    np.testing.assert_allclose(rho, rho0, rtol=2e-2)


def test_tait_eos_pressure_values():
    from tpusph.ops.pair_terms import eos_pressure_over_rhosq
    tables = PairTables.zeros(1)
    tables.set_taitwater(1, 1, rho0=1000.0, c0=10.0, viscosity=0.0, h=1.0)
    spec = PhysicsSpec(tait=True)
    rho = jnp.asarray([1000.0, 1100.0, 900.0])
    p_over, p = eos_pressure_over_rhosq(
        rho, jnp.zeros(3), jnp.ones(3),
        tables.rho0[1], tables.tait_b[1], tables.gas_gamma[1], spec)
    b = 10.0**2 * 1000.0 / 7.0
    expect = b * ((np.array([1000.0, 1100, 900]) / 1000.0) ** 7 - 1.0)
    np.testing.assert_allclose(np.asarray(p), expect, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_over), expect / rho**2, rtol=1e-5)


@pytest.mark.parametrize("morris", [False, True])
def test_momentum_conservation(morris):
    """Pressure+viscous pair forces must be antisymmetric: total force = 0."""
    st, box = make_random_state(n=48, seed=1)
    tables = PairTables.zeros(1)
    tables.set_taitwater(1, 1, rho0=1.0, c0=5.0, viscosity=0.5, h=1.2)
    spec = PhysicsSpec(tait=not morris, morris=morris, kernel=kernels.LUCY)
    f, drho, de = dense.force(st, tables, spec, box)
    total = np.asarray(jnp.sum(f, axis=0))
    np.testing.assert_allclose(total, 0.0, atol=5e-4)


def test_heatconduction_conserves_energy_and_directs_heat():
    st, box = make_random_state(n=40, seed=2, vel=False)
    tables = PairTables.zeros(1)
    tables.set_heatconduction(1, 1, d=0.3, h=1.5)
    spec = PhysicsSpec(heatconduction=True, tait=False, continuity=False)
    f, drho, de = dense.force(st, tables, spec, box)
    # antisymmetric exchange -> sum(de) = 0
    assert float(jnp.sum(de)) == pytest.approx(0.0, abs=1e-4)
    assert np.allclose(np.asarray(f), 0.0)
    assert np.allclose(np.asarray(drho), 0.0)
    # two-particle check: heat flows from hot to cold
    x = np.array([[0.0, 0, 0], [0.5, 0, 0]], np.float32)
    st2 = ParticleState.from_arrays(x, [1, 1], rmass=[1.0, 1.0],
                                    rho=[1.0, 1.0], e=[2.0, 1.0])
    box2 = Box.create([-2, -2, -2], [2, 2, 2], periodic=(False,) * 3)
    _, _, de2 = dense.force(st2, tables, spec, box2)
    assert float(de2[0]) < 0.0 < float(de2[1])
    assert float(de2[0] + de2[1]) == pytest.approx(0.0, abs=1e-6)


def test_continuity_drho_sign():
    """Two particles approaching -> local compression -> drho > 0."""
    x = np.array([[0.0, 0, 0], [1.0, 0, 0]], np.float32)
    v = np.array([[0.5, 0, 0], [-0.5, 0, 0]], np.float32)
    st = ParticleState.from_arrays(x, [1, 1], rmass=[1.0, 1.0], v=v,
                                   rho=[1.0, 1.0])
    box = Box.create([-3, -3, -3], [3, 3, 3], periodic=(False,) * 3)
    tables = PairTables.zeros(1)
    tables.set_taitwater(1, 1, rho0=1.0, c0=5.0, viscosity=0.0, h=2.0)
    spec = PhysicsSpec(tait=True)
    _, drho, _ = dense.force(st, tables, spec, box)
    assert float(drho[0]) > 0.0
    assert float(drho[1]) > 0.0


def test_artificial_viscosity_only_when_approaching():
    tables = PairTables.zeros(1)
    tables.set_taitwater(1, 1, rho0=1.0, c0=5.0, viscosity=1.0, h=2.0)
    spec = PhysicsSpec(tait=True)
    box = Box.create([-5, -5, -5], [5, 5, 5], periodic=(False,) * 3)
    x = np.array([[0.0, 0, 0], [1.0, 0, 0]], np.float32)

    def fx(v0):
        v = np.array([[v0, 0, 0], [-v0, 0, 0]], np.float32)
        st = ParticleState.from_arrays(x, [1, 1], rmass=[1.0, 1.0], v=v,
                                       rho=[1.0, 1.0])
        f, _, _ = dense.force(st, tables, spec, box)
        return float(f[0, 0])

    # rho == rho0 -> zero pressure; receding pairs -> zero viscosity -> no force
    assert fx(-0.5) == pytest.approx(0.0, abs=1e-7)
    # approaching -> repulsive viscous force pushes particle 0 (the left one,
    # moving +x toward its neighbor) back in -x, decelerating the approach
    assert fx(0.5) < -1e-5


def test_dead_slots_do_not_contribute():
    st, box = make_random_state(n=32, seed=3)
    tables = PairTables.zeros(1)
    tables.set_taitwater(1, 1, rho0=1.0, c0=5.0, viscosity=0.2, h=1.2)
    tables.set_heatconduction(1, 1, d=0.1, h=1.2)
    spec = PhysicsSpec(tait=True, heatconduction=True)
    f_full, drho_full, de_full = dense.force(st, tables, spec, box)

    # embed same particles in a larger pool with dead slots
    import dataclasses
    import jax
    big = ParticleState.zeros(64)
    big = jax.tree_util.tree_map(
        lambda b, s: b.at[: s.shape[0]].set(s), big, st)
    f_big, drho_big, de_big = dense.force(big, tables, spec, box)
    np.testing.assert_allclose(np.asarray(f_big[:32]), np.asarray(f_full), atol=1e-5)
    np.testing.assert_allclose(np.asarray(f_big[32:]), 0.0)
    assert not np.any(np.isnan(np.asarray(f_big)))
    np.testing.assert_allclose(np.asarray(de_big[:32]), np.asarray(de_full), atol=1e-5)


def test_surface_tension_momentum_conservation_and_interface_only():
    """Two-phase random blob: CSF capillary forces conserve momentum and are
    ~zero away from the interface."""
    rng = np.random.default_rng(5)
    n = 60
    x = rng.uniform(0, 3.0, size=(n, 3)).astype(np.float32)
    types = np.where(x[:, 0] < 1.5, 1, 2)
    st = ParticleState.from_arrays(x, types, rmass=np.full(n, 0.2),
                                   rho=np.full(n, 1.0))
    box = Box.create([0, 0, 0], [3, 3, 3], periodic=(False,) * 3)
    tables = PairTables.zeros(2)
    for i in (1, 2):
        for j in (1, 2):
            if j >= i:
                tables.set_surfacetension(i, j, sigma=1.0, h=1.0)
    spec = PhysicsSpec(surface_tension=True, tait=False, continuity=False)
    cg = dense.color_gradient(st, tables, spec, box)
    assert np.asarray(jnp.max(jnp.abs(cg))) > 0.0
    f, _, _ = dense.force(st, tables, spec, box, cg=cg)
    np.testing.assert_allclose(np.asarray(jnp.sum(f, axis=0)), 0.0, atol=2e-4)


def test_lj_eos_values_and_momentum():
    """sph/lj: the vdW-form LJ EOS (pair_terms.LJ_VDW_A/B) gives
    P = rho T/(1-b rho) - a rho^2 with T = (gamma-1) e/m; pair forces
    conserve momentum (pair_sph_lj.cpp capability — SURVEY §2.2)."""
    from tpusph.ops.pair_terms import (LJ_VDW_A, LJ_VDW_B,
                                       eos_pressure_over_rhosq)

    spec = PhysicsSpec(dim=3, lj=True, tait=False)
    rho, e, m, gamma = 0.2, 1.5, 1.0, 1.4
    _, p = eos_pressure_over_rhosq(
        jnp.float32(rho), jnp.float32(e), jnp.float32(m),
        jnp.float32(1.0), jnp.float32(0.0), jnp.float32(gamma), spec)
    t = (gamma - 1.0) * e / m
    expect = rho * t / (1.0 - LJ_VDW_B * rho) - LJ_VDW_A * rho * rho
    assert float(p) == pytest.approx(expect, rel=1e-6)

    st, box = make_random_state(n=48, seed=3)
    tables = PairTables.zeros(1)
    tables.set_lj(1, 1, viscosity=0.5, h=1.0)
    f, drho, de = dense.force(st, tables, spec, box)
    np.testing.assert_allclose(np.asarray(jnp.sum(f, axis=0)), 0.0, atol=1e-4)
    assert np.isfinite(np.asarray(f)).all()
