"""SPH velocity-Verlet integration — the ``fix meso`` / ``fix
meso/stationary`` equivalent (SURVEY.md §2.2, §3.2).

Reference semantics (src/USER-SPH/fix_meso.cpp):

  initial_integrate:  e    += dtf * de
                      rho  += dtf * drho
                      vest  = v + 2*dtf/m * f      (extrapolated v at t+dt)
                      v    += dtf/m * f
                      x    += dt * v
  final_integrate:    v    += dtf/m * f
                      e    += dtf * de
                      rho  += dtf * drho

with dtf = dt/2. ``fix meso/stationary`` integrates only rho and e (wall
particles) — here that's the per-particle ``mobile`` mask, so one fused
update covers both fixes with no divergent control flow.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from tpusph.state import Box, ParticleState


def initial_integrate(state: ParticleState, dt: float, box: Box) -> ParticleState:
    dtf = 0.5 * dt
    alive = state.alive
    move = alive & state.mobile
    movef = move[:, None]

    e = jnp.where(alive, state.e + dtf * state.de, state.e)
    rho = jnp.where(alive, state.rho + dtf * state.drho, state.rho)

    m_safe = jnp.where(move, state.rmass, 1.0)
    dtfm = (dtf / m_safe)[:, None]
    vest = jnp.where(movef, state.v + 2.0 * dtfm * state.f, state.vest)
    v = jnp.where(movef, state.v + dtfm * state.f, state.v)
    x = jnp.where(movef, state.x + dt * v, state.x)
    # NOTE: positions are NOT wrapped here. Like Domain::pbc in the reference,
    # wrapping happens only at neighbor-rebuild time (the backend's `prepare`),
    # so the cell grid's periodic-image topology stays consistent between
    # rebuilds. The dense backend wraps every step.

    return dataclasses.replace(state, x=x, v=v, vest=vest, e=e, rho=rho)


def final_integrate(state: ParticleState, dt: float) -> ParticleState:
    dtf = 0.5 * dt
    alive = state.alive
    move = alive & state.mobile

    m_safe = jnp.where(move, state.rmass, 1.0)
    dtfm = (dtf / m_safe)[:, None]
    v = jnp.where(move[:, None], state.v + dtfm * state.f, state.v)
    e = jnp.where(alive, state.e + dtf * state.de, state.e)
    rho = jnp.where(alive, state.rho + dtf * state.drho, state.rho)
    return dataclasses.replace(state, v=v, e=e, rho=rho)
