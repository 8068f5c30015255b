"""Force-stage orchestration: the TPU-native analog of LAMMPS's
``Pair::compute`` dispatch over hybrid/overlay styles (SURVEY.md §3.2 HOT #1).

One call = the full force stage of a timestep:
  1. optional sph/rhosum density overwrite (every `rhosum_every` steps),
  2. optional color-gradient pass (if surface tension on),
  3. the fused force sweep (pressure + viscosity + heat + tension),
all through a selectable backend (dense | cellgrid | pallas) sharing the
same per-pair physics.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from tpusph.params import PairTables, PhysicsSpec
from tpusph.state import Box, ParticleState


def compute_forces(state: ParticleState, tables: PairTables, spec: PhysicsSpec,
                   box: Box, backend: Any, istep: jax.Array | int = 0,
                   aux: Any = None) -> ParticleState:
    """Run the force stage; returns state with fresh f, drho, de (and rho if
    rhosum fired this step). ``backend`` is a module exposing
    rho_summation / color_gradient / force with the dense.py signatures
    (grid backends close over their aux data via functools.partial).
    """
    kw = {} if aux is None else dict(aux=aux)

    if hasattr(backend, "force_stage"):
        # fused stage (Pallas): one pack, dense-to-dense rho/cg patches,
        # three kernels, one unpack — no per-sweep scatter/gather
        return backend.force_stage(state, tables, spec, box, aux, istep)

    if spec.rhosum_every > 0:
        recompute = (jnp.asarray(istep) % spec.rhosum_every) == 0
        rho_new = backend.rho_summation(state, tables, spec, box, **kw)
        rho = jnp.where(recompute, rho_new, state.rho)
        state = dataclasses.replace(state, rho=rho)

    cg = None
    if spec.surface_tension:
        cg = backend.color_gradient(state, tables, spec, box, **kw)

    out = backend.force(state, tables, spec, box, cg=cg, **kw)
    if spec.virial:
        f, drho, de, vir = out
        state = dataclasses.replace(state, vir=vir)
    else:
        f, drho, de = out

    if spec.gravity:
        # fix gravity: constant body acceleration on mobile alive particles
        gmask = (state.alive & state.mobile)[:, None]
        f = f + jnp.where(gmask, state.rmass[:, None] * tables.gravity[None, :], 0.0)

    return dataclasses.replace(state, f=f, drho=drho, de=de)
