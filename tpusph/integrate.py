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


def _kahan_add(acc, comp, inc):
    """Compensated acc += inc (two-sum): fp32 `rho += dtf*drho` rounds at
    ulp(acc) per add, a random walk past 1e-3 relative over 5k steps
    (SURVEY §7.2 accuracy gate); the compensation keeps the lost bits.
    XLA preserves IEEE ordering, so the correction is not folded away."""
    y = inc - comp
    t = acc + y
    comp = (t - acc) - y
    return t, comp


def initial_integrate(state: ParticleState, dt: float, box: Box) -> ParticleState:
    dtf = 0.5 * dt
    alive = state.alive
    move = alive & state.mobile
    movef = move[:, None]

    e, e_c = _kahan_add(state.e, state.e_c,
                        jnp.where(alive, dtf * state.de, 0.0))
    rho, rho_c = _kahan_add(state.rho, state.rho_c,
                            jnp.where(alive, dtf * state.drho, 0.0))

    m_safe = jnp.where(move, state.rmass, 1.0)
    dtfm = (dtf / m_safe)[:, None]
    vest = jnp.where(movef, state.v + 2.0 * dtfm * state.f, state.vest)
    v = jnp.where(movef, state.v + dtfm * state.f, state.v)
    x = jnp.where(movef, state.x + dt * v, state.x)
    # NOTE: positions are NOT wrapped here. Like Domain::pbc in the reference,
    # wrapping happens only at neighbor-rebuild time (the backend's `prepare`),
    # so the cell grid's periodic-image topology stays consistent between
    # rebuilds. The dense backend wraps every step.

    return dataclasses.replace(state, x=x, v=v, vest=vest, e=e, rho=rho,
                               e_c=e_c, rho_c=rho_c)


def final_integrate(state: ParticleState, dt: float) -> ParticleState:
    dtf = 0.5 * dt
    alive = state.alive
    move = alive & state.mobile

    m_safe = jnp.where(move, state.rmass, 1.0)
    dtfm = (dtf / m_safe)[:, None]
    v = jnp.where(move[:, None], state.v + dtfm * state.f, state.v)
    e, e_c = _kahan_add(state.e, state.e_c,
                        jnp.where(alive, dtf * state.de, 0.0))
    rho, rho_c = _kahan_add(state.rho, state.rho_c,
                            jnp.where(alive, dtf * state.drho, 0.0))
    return dataclasses.replace(state, v=v, e=e, rho=rho, e_c=e_c,
                               rho_c=rho_c)
