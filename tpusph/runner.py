"""The step loop — TPU-native shape of Verlet::setup + Verlet::run
(src/verlet.cpp, SURVEY.md §3.2).

Design (SURVEY §7.2): ONE jit region per run block. A block of
``thermo_every`` steps runs as a single compiled ``lax.fori_loop`` with the
state buffers donated; thermo reductions are a second small jitted function.
Host Python only sees state at thermo/dump cadence — the hot loop never
leaves the device.
"""

from __future__ import annotations


import time
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

from tpusph import integrate
from tpusph.forces import compute_forces
from tpusph.params import PairTables, PhysicsSpec
from tpusph.state import Box, ParticleState


class Runner:
    """Owns the compiled step. Rebuilt whenever static config changes
    (spec, box periodicity, backend, dt is traced so it's cheap to change)."""

    def __init__(self, spec: PhysicsSpec, box: Box, backend: Any,
                 end_of_step: Optional[Callable] = None):
        self.spec = spec
        self.box = box
        self.backend = backend
        self.end_of_step = end_of_step  # fix hook (phase change), jit-safe
        self.timings = {"loop": 0.0, "steps": 0}
        self._phase_cache = None  # measured per-phase fractions (Timer parity)

        spec_ = spec
        box_ = box
        backend_ = backend
        eos_hook = end_of_step

        prepare = getattr(backend, "prepare", None)

        def _one_step(istep, carry):
            # Freeze-on-overflow. Violated windows/cells drop pairs
            # ASYMMETRICALLY, and the violation magnitude at detection is
            # unbounded (the rebuild that detects it reveals density drift
            # accumulated since the previous build — measured: ONE force
            # pass on a just-violated strip geometry injected |dP| ~ 0.5
            # into a conserved-momentum system). So the violating step's
            # force pass must never run: detect right after prepare and
            # abandon the step, returning the PRE-step state with the
            # counter-carrying aux (the host check at the block boundary
            # aborts or re-chooses the geometry; the aux/state layout
            # mismatch of the frozen pair is never integrated because the
            # outer latch skips every later step). A later clean rebuild
            # resetting the per-build counter can therefore never mask a
            # violation from the host.
            def body(carry):
                state0, tables, dt, aux0, nok = carry
                state = integrate.initial_integrate(state0, dt, box_)
                if prepare is not None:
                    # Neighbor::decide + Domain::pbc + rebuild (SURVEY §3.2)
                    state, aux = prepare(state, aux0, istep, box_)
                else:
                    aux = aux0

                def rest(st):
                    st = compute_forces(st, tables, spec_, box_, backend_,
                                        istep=istep, aux=aux)
                    st = integrate.final_integrate(st, dt)
                    a = aux
                    if eos_hook is not None:
                        # Modify::end_of_step (fix phase_change — SURVEY
                        # §3.5)
                        st, a = eos_hook(st, tables, dt, istep, a,
                                         backend_, box_)
                    return (st, tables, dt, a, nok + 1)

                ov = getattr(aux, "overflow", None)
                if ov is None:
                    return rest(state)
                return jax.lax.cond(
                    jnp.sum(ov) > 0,
                    lambda: (state0, tables, dt, aux, nok),
                    lambda: rest(state))

            aux = carry[3]
            ov = getattr(aux, "overflow", None)
            if ov is None:
                return body(carry)
            return jax.lax.cond(jnp.sum(ov) > 0, lambda c: c, body, carry)

        @partial(jax.jit, static_argnames=("nsteps",), donate_argnums=(0,))
        def _run_block(state, tables, dt, istep0, aux, nsteps):
            carry = (state, tables, dt, aux, jnp.zeros((), jnp.int32))
            carry = jax.lax.fori_loop(
                istep0, istep0 + nsteps,
                _one_step, carry)
            state, tables, dt, aux, nok = carry
            return state, aux, nok

        @jax.jit
        def _setup_forces(state, tables, istep, aux):
            # Verlet::setup: forces must exist before the first
            # initial_integrate (SURVEY §3.2).
            return compute_forces(state, tables, spec_, box_, backend_,
                                  istep=istep, aux=aux)

        self._run_block = _run_block
        self._setup_forces = _setup_forces

    def setup(self, state: ParticleState, tables: PairTables,
              istep: int = 0, aux=None) -> ParticleState:
        return self._setup_forces(state, tables, istep, aux)

    def run(self, state: ParticleState, tables: PairTables, dt: float,
            nsteps: int, istep0: int = 0, every: int = 0,
            callback: Optional[Callable] = None, aux=None):
        """Run ``nsteps`` steps from global step ``istep0``. ``callback`` is
        invoked as callback(state, istep) at step 0 (after setup) and every
        ``every`` steps (thermo/dump cadence). Returns (state, aux)."""
        dt = jnp.asarray(dt, jnp.float32)
        if every <= 0:
            every = nsteps
        done = 0
        self.ok_steps = 0  # executed (non-frozen) steps this run
        t0 = time.perf_counter()
        while done < nsteps:
            chunk = min(every, nsteps - done)
            state, aux, nok = self._run_block(
                state, tables, dt,
                jnp.asarray(istep0 + done, jnp.int32),
                aux, nsteps=chunk)
            done += chunk
            # one tiny scalar transfer per chunk (the callback path blocks
            # on state.x anyway); updated BEFORE the callback so an
            # aborting overflow check reads the true executed count
            self.ok_steps += int(nok)
            if callback is not None:
                jax.block_until_ready(state.x)
                # pass the CURRENT aux so the overflow check sees this
                # block's counters, not the previous run's
                callback(state, istep0 + done, aux)
        jax.block_until_ready(state.x)
        self.timings["loop"] += time.perf_counter() - t0
        self.timings["steps"] += nsteps
        return state, aux

    def phase_fractions(self, state, tables, dt, aux=None, istep: int = 0):
        """Per-phase time fractions for the run-end Timer table (src/timer.cpp
        parity — SURVEY §5.1). Measured once per compiled runner by timing
        each phase as its own jitted call (the production loop is one fused
        block), then cached: the relative split is stable across a run."""
        if self._phase_cache is None:
            phases = profile_step(self, state, tables, dt, aux=aux,
                                  istep=istep, reps=1)
            total = max(sum(phases.values()), 1e-30)
            self._phase_cache = {k: v / total for k, v in phases.items()}
        return self._phase_cache


def profile_step(runner: "Runner", state: ParticleState, tables: PairTables,
                 dt: float, aux=None, istep: int = 0, reps: int = 5):
    """Per-phase wall-time breakdown (Timer::barrier buckets — SURVEY §5.1).

    The production loop is ONE fused jit block (phases can't be timed from
    the host), so this times each phase as a separate jitted call on the
    same state: Modify (integrate halves), Neigh (rebuild/sort), Pair (the
    sweeps). Returns {phase: seconds} averaged over ``reps``.
    """
    import time as _time

    spec, box, backend = runner.spec, runner.box, runner.backend
    dt = jnp.asarray(dt, jnp.float32)

    phases = {}

    def timeit(name, fn, *args):
        out = fn(*args)            # compile + warm
        jax.block_until_ready(out)
        t0 = _time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        phases[name] = (_time.perf_counter() - t0) / reps
        return out

    ii = jax.jit(lambda s: integrate.initial_integrate(s, dt, box))
    state = timeit("Modify", ii, state)

    prepare = getattr(backend, "prepare", None)
    if prepare is not None:
        prep = jax.jit(lambda s, a: prepare(s, a, istep, box))
        state, aux = timeit("Neigh", prep, state, aux)

    force = jax.jit(lambda s, a: compute_forces(s, tables, spec, box,
                                                backend, istep=istep, aux=a))
    state = timeit("Pair", force, state, aux)

    fi = jax.jit(lambda s: integrate.final_integrate(s, dt))
    state = timeit("Modify2", fi, state)
    phases["Modify"] += phases.pop("Modify2")
    return phases


# -- global thermo reductions (Thermo::compute, MPI_Allreduce -> psum) -------

@partial(jax.jit, static_argnames=("spec",))
def thermo_pressure(state: ParticleState, tables: PairTables,
                    spec: PhysicsSpec):
    """Mean EOS pressure over alive owned particles — the `press` thermo
    column for a particle fluid (no virial wall terms). On-device reduction:
    one scalar transfer per thermo line, EOS matching the active pair style
    (pair_terms.eos_pressure_over_rhosq forms)."""
    from tpusph.ops.pair_terms import eos_pressure_over_rhosq
    alive = state.alive & state.owned
    t = state.type
    rho = jnp.where(alive, state.rho, 1.0)
    m = jnp.maximum(state.rmass, 1e-30)
    _, p = eos_pressure_over_rhosq(rho, state.e, m, tables.rho0[t],
                                   tables.tait_b[t], tables.gas_gamma[t],
                                   spec)
    n = jnp.maximum(jnp.sum(alive.astype(jnp.int32)), 1)
    return jnp.sum(jnp.where(alive, p, 0.0)) / n


@partial(jax.jit, static_argnames=("dim",))
def thermo_virial_pressure(state: ParticleState, box: Box, dim: int):
    """LAMMPS-compatible pressure from the pair virial (src/thermo.cpp
    pressure [H], SURVEY §2.8): P = (sum m v^2 + 0.5 sum_i vir_i)/(dim V)
    with vir_i = sum_j f_ij . r_ij accumulated in the force sweep
    (PhysicsSpec.virial). The 0.5 corrects the full (non-Newton-halved)
    per-i sums visiting every pair twice."""
    alive = state.alive & state.owned
    m = jnp.where(alive, state.rmass, 0.0)
    mv2 = jnp.sum(m * jnp.sum(state.v * state.v, axis=-1))
    w = jnp.sum(jnp.where(alive, state.vir, 0.0))
    L = box.length
    vol = L[0] * L[1] * (L[2] if dim == 3 else 1.0)
    return (mv2 + 0.5 * w) / (dim * vol)


@jax.jit
def thermo_scalars(state: ParticleState):
    """Fused global reductions for thermo output. Returns a dict of device
    scalars; one host transfer per thermo step."""
    alive = state.alive & state.owned  # ghosts are the owner's copies
    m = jnp.where(alive, state.rmass, 0.0)
    ke = 0.5 * jnp.sum(m * jnp.sum(state.v * state.v, axis=-1))
    ie = jnp.sum(jnp.where(alive, state.e, 0.0))
    natoms = jnp.sum(alive.astype(jnp.int32))
    cv = jnp.where(alive, state.cv, 1.0)
    t_avg = jnp.sum(jnp.where(alive, state.e / cv, 0.0)) / jnp.maximum(natoms, 1)
    rho_avg = jnp.sum(jnp.where(alive, state.rho, 0.0)) / jnp.maximum(natoms, 1)
    mass = jnp.sum(m)
    vmax = jnp.max(jnp.where(alive[:, None], jnp.abs(state.v), 0.0))
    return dict(ke=ke, ie=ie, natoms=natoms, t_avg=t_avg, rho_avg=rho_avg,
                mass=mass, vmax=vmax)
