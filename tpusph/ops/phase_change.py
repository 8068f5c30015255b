"""Evaporation / phase-change mass exchange — the ``fix phase_change``
equivalent (SURVEY.md §2.3, §3.5).

Reference behavior: at end-of-step, interface liquid particles above the
temperature threshold transfer a mass quantum dm to the vapor phase —
either growing a neighboring vapor particle or creating a new vapor atom —
debiting latent heat from the liquid's internal energy and forcing a
neighbor rebuild.

TPU-native shape (SURVEY §7.2 / §2.11 item 6): the particle pool has fixed
capacity with dead slots; insertion = activating the k-th dead slot for the
k-th selected liquid particle via masked scatters (mode="drop"), entirely
on-device — no host round-trip, no reallocation. Selection uses a
deterministic per-step jax.random stream. Conservation ledger:

    total mass:  exactly conserved (dm moves between phases)
    energy:      sum(e) decreases by latent * dm per event (absorbed as
                 latent heat); the carried energy (e_i/m_i) dm moves with
                 the mass.
    momentum:    new vapor inherits the liquid particle's velocity.

Script syntax (ours; the fork's exact arg list is unrecorded — SURVEY
marks it [M]):

  fix ID group phase_change Tc L dm liquid_type vapor_type \
      [every N] [prob P] [mmin M] [offset D] [mode insert|grow] \
      [vapor_rho R] [vapor_cv C] [seed S] [nointerface]
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tpusph.params import PairTables, PhysicsSpec
from tpusph.state import Box, ParticleState


@dataclasses.dataclass(frozen=True)
class PhaseChangeConfig:
    t_threshold: float
    latent: float
    dm: float
    liquid_type: int
    vapor_type: int
    every: int = 1
    prob: float = 1.0
    m_min: float = 0.0
    insert_offset: float = 0.0
    mode: str = "insert"          # "insert" new vapor | "grow" nearest vapor
    vapor_rho: float = 1.0
    vapor_cv: float = 1.0         # heat capacity per unit mass of new vapor
    seed: int = 12345
    require_interface: bool = True
    cutoff: float = 0.0           # interface query radius; 0 = max pair cut

    @staticmethod
    def from_script_args(args):
        tc, latent, dm = float(args[0]), float(args[1]), float(args[2])
        lt, vt = int(args[3]), int(args[4])
        kw = {}
        i = 5
        while i < len(args):
            k = args[i]
            if k == "nointerface":
                kw["require_interface"] = False
                i += 1
                continue
            v = args[i + 1]
            if k == "every":
                kw["every"] = int(v)
            elif k == "prob":
                kw["prob"] = float(v)
            elif k == "mmin":
                kw["m_min"] = float(v)
            elif k == "offset":
                kw["insert_offset"] = float(v)
            elif k == "mode":
                kw["mode"] = v
            elif k == "vapor_rho":
                kw["vapor_rho"] = float(v)
            elif k == "vapor_cv":
                kw["vapor_cv"] = float(v)
            elif k == "seed":
                kw["seed"] = int(v)
            elif k == "cutoff":
                kw["cutoff"] = float(v)
            else:
                raise ValueError(f"fix phase_change: unknown keyword '{k}'")
            i += 2
        return PhaseChangeConfig(tc, latent, dm, lt, vt, **kw)


def _vapor_neighbor_dense(state: ParticleState, box: Box, vtype: int,
                          cut: float):
    """(count, nearest_idx, nearest_rsq, nearest_owned_idx,
    nearest_owned_rsq) of vapor neighbors per particle. Dense O(N^2)
    version for the dense backend / oracle. The owned-restricted pair feeds
    grow mode: growing a ghost copy would discard the transferred mass at
    the next halo refresh while the liquid owner is debited."""
    x = state.x
    dx = x[:, None, :] - x[None, :, :]
    dx = box.min_image(dx)
    rsq = jnp.sum(dx * dx, axis=-1)
    n = state.capacity
    eye = jnp.eye(n, dtype=bool)
    is_vap = (state.type == vtype) & state.alive
    mask = is_vap[None, :] & ~eye & (rsq < cut * cut) & state.alive[:, None]
    count = jnp.sum(mask, axis=1)
    big = jnp.where(mask, rsq, jnp.inf)
    nearest = jnp.argmin(big, axis=1).astype(jnp.int32)
    big_o = jnp.where(mask & state.owned[None, :], rsq, jnp.inf)
    near_o = jnp.argmin(big_o, axis=1).astype(jnp.int32)
    return (count, nearest, jnp.min(big, axis=1),
            near_o, jnp.min(big_o, axis=1))


def make_end_of_step_hook(config: PhaseChangeConfig, spec: PhysicsSpec):
    """Returns hook(state, tables, dt, istep, aux, backend, box) applied by
    the Runner after final_integrate (Modify::end_of_step slot)."""

    def hook(state: ParticleState, tables: PairTables, dt, istep, aux,
             backend, box: Box):
        def apply(state):
            return _apply_phase_change(state, tables, istep, config, spec,
                                       backend, box, aux)

        fire = (jnp.asarray(istep) % config.every) == 0
        new_state, changed = jax.lax.cond(
            fire, apply, lambda s: (s, jnp.asarray(False)), state)

        # insertion invalidates the cell sort: force a rebuild next step by
        # blowing up the displacement reference (Neighbor trigger).
        if aux is not None and hasattr(aux, "x_ref"):
            bump = jnp.where(changed, jnp.inf, 0.0)
            aux = dataclasses.replace(aux, x_ref=aux.x_ref + bump)
        return new_state, aux

    return hook


def _apply_phase_change(state: ParticleState, tables: PairTables, istep,
                        config: PhaseChangeConfig, spec: PhysicsSpec,
                        backend, box: Box, aux=None):
    n = state.capacity
    cut = config.cutoff
    if cut <= 0.0:
        cut = 1.0  # caller should set; fallback unit radius

    t_part = state.e / jnp.maximum(state.cv, 1e-30)
    liquid = state.alive & state.owned & (state.type == config.liquid_type)

    if config.require_interface or config.mode == "grow":
        if aux is not None and hasattr(backend, "vapor_neighbor"):
            # cell-window sweep (O(N * window)); aux is the GridData
            vcount, vnearest, _, vnear_o, vrsq_o = backend.vapor_neighbor(
                state, box, config.vapor_type, cut, aux)
        else:
            vcount, vnearest, _, vnear_o, vrsq_o = _vapor_neighbor_dense(
                state, box, config.vapor_type, cut)
    else:
        vcount = jnp.ones(n, jnp.int32)
        vnearest = jnp.zeros(n, jnp.int32)
        vnear_o = jnp.zeros(n, jnp.int32)
        vrsq_o = jnp.zeros(n, jnp.float32)

    # energy budget: the event must leave e positive after carried + latent
    dm = config.dm
    carried_per_mass = state.e / jnp.maximum(state.rmass, 1e-30)
    e_cost = carried_per_mass * dm + config.latent * dm
    eligible = (liquid
                & (t_part > config.t_threshold)
                & (state.rmass > config.m_min + dm)
                & (state.e > e_cost))
    if config.require_interface:
        eligible = eligible & (vcount > 0)

    # deterministic stochastic selection (Marsaglia-RNG analog: threefry)
    key = jax.random.fold_in(jax.random.PRNGKey(config.seed),
                             jnp.asarray(istep, jnp.int32))
    u = jax.random.uniform(key, (n,))
    sel = eligible & (u < config.prob)

    if config.mode == "grow":
        # in dist mode the nearest vapor may be a GHOST row: growing it would
        # discard the transferred mass at the next rebuild while the liquid
        # owner is still debited. Grow the nearest OWNED vapor instead (the
        # backends resolve same-device seam copies to their source rows, so
        # single-device behavior is unchanged); an event with no owned vapor
        # in reach at all is deferred and re-fires after migration.
        tgt = jnp.clip(vnear_o, 0, n - 1)
        do = sel & (vcount > 0) & jnp.isfinite(vrsq_o) & state.owned[tgt]
        dm_add = jnp.zeros(n).at[tgt].add(jnp.where(do, dm, 0.0))
        e_add = jnp.zeros(n).at[tgt].add(
            jnp.where(do, carried_per_mass * dm, 0.0))
        # momentum: receiving vapor keeps its velocity; exact momentum
        # bookkeeping would need a velocity update — do it:
        mom_add = jnp.zeros((n, 3)).at[tgt].add(
            jnp.where(do[:, None], dm * state.v, 0.0))
        new_rmass = state.rmass + dm_add - jnp.where(do, dm, 0.0)
        new_v = jnp.where(
            (dm_add > 0)[:, None],
            (state.v * state.rmass[:, None] + mom_add) /
            jnp.maximum(new_rmass, 1e-30)[:, None],
            state.v)
        new_e = state.e + e_add - jnp.where(do, e_cost, 0.0)
        new_cv = state.cv + jnp.where(dm_add > 0, config.vapor_cv * dm_add, 0.0)
        changed = jnp.any(do)
        state = dataclasses.replace(state, rmass=new_rmass, e=new_e,
                                    v=new_v, cv=new_cv)
        return state, changed

    # ---- insert mode: activate dead slots ---------------------------------
    dead = ~state.alive
    n_dead = jnp.sum(dead.astype(jnp.int32))
    dead_idx = jnp.nonzero(dead, size=n, fill_value=n)[0].astype(jnp.int32)
    sel_rank = jnp.cumsum(sel.astype(jnp.int32)) - 1
    can = sel & (sel_rank < n_dead)
    target = jnp.where(can, dead_idx[jnp.clip(sel_rank, 0, n - 1)], n)

    # liquid side (only where the insert actually happens)
    state = dataclasses.replace(
        state,
        rmass=state.rmass - jnp.where(can, dm, 0.0),
        e=state.e - jnp.where(can, e_cost, 0.0),
    )

    # new vapor particle fields. Insertion direction: TOWARD the nearest
    # vapor neighbor when there is one (the new vapor joins the vapor
    # phase; a random direction rams a full-mass vapor particle into the
    # liquid lattice and locally crushes both phases), random otherwise.
    theta = jax.random.uniform(jax.random.fold_in(key, 1), (n,)) * 2 * jnp.pi
    if spec.dim == 3:
        phi = jnp.arccos(jnp.clip(
            jax.random.uniform(jax.random.fold_in(key, 2), (n,)) * 2 - 1,
            -1, 1))
        offset = jnp.stack([jnp.sin(phi) * jnp.cos(theta),
                            jnp.sin(phi) * jnp.sin(theta),
                            jnp.cos(phi)], axis=-1)
    else:
        offset = jnp.stack([jnp.cos(theta), jnp.sin(theta),
                            jnp.zeros(n)], axis=-1)
    if config.require_interface:
        vx = state.x[jnp.clip(vnearest, 0, n - 1)]
        to_vap = box.min_image(vx - state.x)
        nrm = jnp.sqrt(jnp.sum(to_vap * to_vap, axis=-1, keepdims=True))
        dir_v = to_vap / jnp.maximum(nrm, 1e-30)
        offset = jnp.where(((vcount > 0) & (nrm[:, 0] > 1e-12))[:, None],
                           dir_v, offset)
    new_x = state.x + config.insert_offset * offset
    max_tag = jnp.max(jnp.where(state.alive, state.tag, 0))
    if getattr(backend, "is_dist", False):
        # per-brick tag minting must stay globally unique: take the global
        # max and stride by the pool capacity (bounds inserts per brick)
        from tpusph.dist import AXIS
        max_tag = jax.lax.pmax(max_tag, AXIS)
        max_tag = max_tag + jax.lax.axis_index(AXIS) * n
    new_tag = (max_tag + 1 + sel_rank).astype(jnp.int32)

    def put(arr, vals):
        return arr.at[target].set(vals, mode="drop")

    state = dataclasses.replace(
        state,
        x=put(state.x, new_x),
        v=put(state.v, state.v),
        vest=put(state.vest, state.v),
        f=put(state.f, jnp.zeros_like(state.f)),
        rho=put(state.rho, jnp.full((n,), config.vapor_rho)),
        drho=put(state.drho, jnp.zeros(n)),
        e=put(state.e, carried_per_mass * dm),
        de=put(state.de, jnp.zeros(n)),
        vir=put(state.vir, jnp.zeros(n)),
        cv=put(state.cv, jnp.full((n,), config.vapor_cv * dm)),
        rmass=put(state.rmass, jnp.full((n,), dm)),
        type=put(state.type, jnp.full((n,), config.vapor_type, jnp.int32)),
        tag=put(state.tag, new_tag),
        mobile=put(state.mobile, jnp.ones(n, bool)),
        owned=put(state.owned, jnp.ones(n, bool)),
    )
    return state, jnp.any(can)
