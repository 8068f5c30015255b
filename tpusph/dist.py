"""Spatial domain decomposition over a TPU device mesh — the TPU-native
replacement for the reference's MPI brick decomposition + halo exchange
(src/comm.cpp: setup/forward_comm/exchange/borders — SURVEY.md §2.5, §5.7).

Design
------
1D brick decomposition along one spatial axis. Each device owns a brick and
stores positions in BRICK-LOCAL coordinates along that axis (x_local =
x_global - brick_index * width). That makes every ring transfer uniform:
payloads moving to the right neighbor subtract one width, to the left add
one — including across the periodic seam — so the shard_map program is
identical on every device with zero seam special-casing.

MPI primitive -> ICI collective mapping (SURVEY §2.11 item 4, §5.8):
  Comm::exchange   (migration)   -> masked fixed-capacity pack + lax.ppermute
  Comm::borders    (ghost setup) -> edge-slab pack + ppermute; ghosts merged
                                    into the local pool as owned=False
  Comm::forward_comm (each step) -> gather at persistent send rows +
                                    ppermute + scatter to persistent ghost
                                    rows (x, vest, rho, e — the meso set)
  Pair::pack_forward_comm        -> extra halo refresh after rhosum / color
                                    gradient (their mid-force comm)
  MPI_Allreduce (thermo)         -> reductions on the global sharded array
                                    outside shard_map (XLA inserts them)
  Comm::reverse_comm             -> deleted by design: no Newton halving
                                    (SURVEY §7.2) — owners compute full sums
                                    from ghosts; ghost f/drho/de discarded

Rebuild (exchange + borders + sort) fires when ANY brick's max displacement
exceeds skin/2 (psum'd trigger — matches the reference's global
Neighbor::decide). Between rebuilds the send-row/ghost-row correspondence is
persistent; grid.build's ``extra`` pytree carries it through the cell sort.
All buffers are fixed-capacity with on-device overflow counters (the TPU
analog of "dangerous builds" — SURVEY §5.2).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpusph import grid as gridlib
from tpusph.ops.cellgrid import CellGridBackend
from tpusph.state import Box, ParticleState

AXIS = "bricks"

# per-step forward-comm field set (atom_vec_meso pack_comm: x, vest, rho, e)
_FWD_FIELDS = ("x", "vest", "rho", "e")
# full payload for borders/migration
_ALL_FIELDS = ("x", "v", "vest", "f", "rho", "drho", "e", "de", "cv",
               "rmass", "type", "tag", "mobile")


class BrickSpec(NamedTuple):
    """Static decomposition geometry (hashable)."""
    ndev: int
    axis_dim: int      # spatial axis of the decomposition
    lo: float          # global box lo along the axis
    width: float       # brick width
    margin: float      # halo margin = cutoff + skin
    ghost_cap: int     # max ghosts per side
    migrate_cap: int   # max migrants per side per rebuild
    periodic: bool     # global periodicity along the axis


def _shift(arr, direction: int):
    """Ring ppermute: direction=+1 sends to the right neighbor (brick
    index + 1). On the ICI torus this is a physical-neighbor permute."""
    n = jax.lax.axis_size(AXIS)
    perm = [(i, (i + direction) % n) for i in range(n)]
    return jax.lax.ppermute(arr, AXIS, perm)


def _select_rows(mask, cap: int):
    """First `cap` set rows of mask -> (rows (cap,), count (1,), overflow
    (1,)). Counts are (1,)-shaped so they can live in the shard_map-carried
    aux pytree (a ()-leaf cannot take a P(AXIS) out-spec)."""
    n = mask.shape[0]
    rows = jnp.nonzero(mask, size=cap, fill_value=n)[0].astype(jnp.int32)
    total = jnp.sum(mask.astype(jnp.int32))
    return rows, jnp.minimum(total, cap)[None], jnp.maximum(total - cap, 0)[None]


def _pack_rows(state: ParticleState, rows, count):
    """Gather the full payload at ``rows``; entries >= count are dead."""
    cap = rows.shape[0]
    valid = jnp.arange(cap) < count
    out = {}
    for f in _ALL_FIELDS:
        v = getattr(state, f)[jnp.clip(rows, 0, state.capacity - 1)]
        mask = valid if v.ndim == 1 else valid[:, None]
        out[f] = jnp.where(mask, v, jnp.zeros_like(v))
    out["type"] = jnp.where(valid, out["type"], 0)
    return out


def _merge_payload(state: ParticleState, payload, count, owned_val: bool,
                   used_dead: int = 0):
    """Activate dead slots for payload's valid rows. Dead slots are consumed
    in ascending row order starting at offset ``used_dead`` (so successive
    merges use disjoint slots and preserve buffer order — the slot-order
    invariant the post-sort ghost bookkeeping relies on)."""
    n = state.capacity
    g = payload["type"].shape[0]
    dead = ~state.alive
    dead_idx = jnp.nonzero(dead, size=n, fill_value=n)[0].astype(jnp.int32)
    slot = jnp.arange(g, dtype=jnp.int32) + used_dead
    valid = payload["type"] > 0
    n_dead = jnp.sum(dead.astype(jnp.int32))
    can = valid & (slot < n_dead)
    target = jnp.where(can, dead_idx[jnp.clip(slot, 0, n - 1)], n)

    def put(arr, vals):
        return arr.at[target].set(vals, mode="drop")

    new = {f: put(getattr(state, f), payload[f]) for f in _ALL_FIELDS}
    new["owned"] = state.owned.at[target].set(
        jnp.full((g,), owned_val), mode="drop")
    overflow = jnp.sum((valid & ~can).astype(jnp.int32))[None]
    return dataclasses.replace(state, **new), overflow


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DistAux:
    """Per-brick distribution state (inside shard_map)."""
    grid: gridlib.GridData
    send_left: jax.Array    # (G,) i32 rows packed for the left neighbor
    send_right: jax.Array   # (G,) i32
    n_send_left: jax.Array
    n_send_right: jax.Array
    ghost_left: jax.Array   # (G,) i32 rows holding ghosts from the left
    ghost_right: jax.Array  # (G,) i32
    n_ghost_left: jax.Array
    n_ghost_right: jax.Array
    overflow: jax.Array     # () i32 cumulative buffer overflow


class DistBackend:
    """Backend for the Runner in dist mode: wraps a per-brick
    CellGridBackend; prepare() is the comm stack."""

    is_dist = True  # hooks branch on this (e.g. global tag minting)

    def __init__(self, spec: BrickSpec, box_global: Box, dim: int,
                 cutoff: float, skin: float, cap: int | None = None,
                 avg_per_cell: float | None = None, rebuild_every: int = 0,
                 use_pallas: bool = False, ntypes: int = 1):
        self.spec = spec
        ax = spec.axis_dim
        lo = np.asarray(box_global.lo, np.float64).copy()
        hi = np.asarray(box_global.hi, np.float64).copy()
        lo[ax] = -spec.margin
        hi[ax] = spec.width + spec.margin
        per = list(box_global.periodic)
        per[ax] = False  # ghosts materialize cross-brick images explicitly
        self.box_local = Box.create(lo, hi, tuple(per))
        self.box_global = box_global
        self.geom = gridlib.make_geometry(self.box_local, cutoff, dim,
                                          skin=skin, cap=cap,
                                          avg_per_cell=avg_per_cell)
        if use_pallas:
            # fused Pallas kernels per brick (the sweeps run on each
            # device's block inside shard_map)
            from tpusph.ops.pallas_pair import PallasBackend
            self.inner = PallasBackend(self.geom, self.box_local,
                                       ntypes=ntypes)
        else:
            self.inner = CellGridBackend(self.geom)
        self.rebuild_every = rebuild_every

    # -- mid-force halo refresh (rhosum rho / colorgradient cg) -------------

    def _halo_refresh(self, field, aux: DistAux):
        g = self.spec.ghost_cap
        n = field.shape[0]

        def one_side(send_rows, n_send, ghost_rows, n_ghost, direction, fld):
            vals = fld[jnp.clip(send_rows, 0, n - 1)]
            smask = jnp.arange(g) < n_send
            vals = jnp.where(smask if vals.ndim == 1 else smask[:, None],
                             vals, jnp.zeros_like(vals))
            recv = _shift(vals, direction)
            gmask = jnp.arange(g) < n_ghost
            tgt = jnp.where(gmask, ghost_rows, n)
            return fld.at[tgt].set(recv, mode="drop")

        # my left-edge pack -> left neighbor (direction -1); it lands in the
        # RECEIVER's right-ghost rows. I symmetrically receive from my right.
        field = one_side(aux.send_left, aux.n_send_left,
                         aux.ghost_right, aux.n_ghost_right, -1, field)
        field = one_side(aux.send_right, aux.n_send_right,
                         aux.ghost_left, aux.n_ghost_left, +1, field)
        return field

    def rho_summation(self, state, tables, spec, box, aux: DistAux, **_):
        rho = self.inner.rho_summation(state, tables, spec, self.box_local,
                                       aux=aux.grid)
        return self._halo_refresh(rho, aux)

    def color_gradient(self, state, tables, spec, box, aux: DistAux, **_):
        cg = self.inner.color_gradient(state, tables, spec, self.box_local,
                                       aux=aux.grid)
        return self._halo_refresh(cg, aux)

    def force(self, state, tables, spec, box, aux: DistAux, cg=None, **_):
        return self.inner.force(state, tables, spec, self.box_local,
                                aux=aux.grid, cg=cg)

    def vapor_neighbor(self, state, box, vtype, cut, aux):
        # aux here is the GridData (the hook passes DistAux.grid)
        return self.inner.vapor_neighbor(state, self.box_local, vtype, cut,
                                         aux)

    # -- comm stack ----------------------------------------------------------

    def init_aux(self, state: ParticleState, box: Box):
        return self._rebuild(state)

    def prepare(self, state: ParticleState, aux: DistAux, istep, box: Box):
        trigger = gridlib.needs_rebuild(state, aux.grid, self.geom)
        if self.rebuild_every > 0:
            trigger = trigger | (jnp.asarray(istep) % self.rebuild_every == 0)
        trigger = jax.lax.psum(trigger.astype(jnp.int32), AXIS) > 0

        return jax.lax.cond(
            trigger,
            lambda sa: self._rebuild(sa[0], prev_overflow=sa[1].overflow),
            lambda sa: self._forward_comm(*sa),
            (state, aux))

    def _forward_comm(self, state: ParticleState, aux: DistAux):
        """Owner -> ghost per-step refresh of x, vest, rho, e."""
        g = self.spec.ghost_cap
        n = state.capacity
        w = self.spec.width
        ax = self.spec.axis_dim

        def one_side(send_rows, n_send, ghost_rows, n_ghost, direction, st):
            smask = jnp.arange(g) < n_send
            gmask = jnp.arange(g) < n_ghost
            tgt = jnp.where(gmask, ghost_rows, n)
            updates = {}
            for f in _FWD_FIELDS:
                v = getattr(state, f)[jnp.clip(send_rows, 0, n - 1)]
                v = jnp.where(smask if v.ndim == 1 else smask[:, None], v,
                              jnp.zeros_like(v))
                if f == "x":
                    # brick-local frames: +w when moving left, -w right
                    v = v.at[:, ax].add(-direction * w)
                recv = _shift(v, direction)
                updates[f] = getattr(st, f).at[tgt].set(recv, mode="drop")
            return dataclasses.replace(st, **updates)

        st = one_side(aux.send_left, aux.n_send_left,
                      aux.ghost_right, aux.n_ghost_right, -1, state)
        st = one_side(aux.send_right, aux.n_send_right,
                      aux.ghost_left, aux.n_ghost_left, +1, st)
        return st, aux

    def _rebuild(self, state: ParticleState, prev_overflow=None):
        """exchange + borders + sort (SURVEY §3.2 rebuild branch).
        ``prev_overflow`` accumulates across rebuilds so the host check at
        thermo cadence cannot miss an overflow from an earlier rebuild."""
        spec = self.spec
        ax = spec.axis_dim
        w = spec.width
        n = state.capacity
        idx = jax.lax.axis_index(AXIS)

        # drop previous ghosts; wrap non-decomposed periodic axes
        state = dataclasses.replace(
            state,
            type=jnp.where(state.owned, state.type, 0),
            owned=jnp.ones_like(state.owned),
            x=self._wrap_other_axes(state.x))

        # ---- exchange (migration): local coords outside [0, w) leave ----
        alive = state.alive
        xa = state.x[:, ax]
        gone_l = alive & (xa < 0.0)
        gone_r = alive & (xa >= w)
        if not spec.periodic:
            # at the global boundary nothing leaves (walls/fixed boundary:
            # particles may overhang; they stay owned by the edge brick)
            gone_l = gone_l & (idx > 0)
            gone_r = gone_r & (idx < spec.ndev - 1)
        mrows_l, mcnt_l, mov_l = _select_rows(gone_l, spec.migrate_cap)
        mrows_r, mcnt_r, mov_r = _select_rows(gone_r, spec.migrate_cap)
        pay_l = _pack_rows(state, mrows_l, mcnt_l)
        pay_r = _pack_rows(state, mrows_r, mcnt_r)
        pay_l["x"] = pay_l["x"].at[:, ax].add(w)    # into left frame
        pay_r["x"] = pay_r["x"].at[:, ax].add(-w)   # into right frame
        killed = jnp.zeros(n, bool).at[mrows_l].set(True, mode="drop") \
            | jnp.zeros(n, bool).at[mrows_r].set(True, mode="drop")
        state = dataclasses.replace(state,
                                    type=jnp.where(killed, 0, state.type))
        recv_from_left = jax.tree_util.tree_map(lambda a: _shift(a, +1), pay_r)
        recv_from_right = jax.tree_util.tree_map(lambda a: _shift(a, -1), pay_l)
        cnt_from_left = _shift(mcnt_r, +1)
        cnt_from_right = _shift(mcnt_l, -1)
        # (count already encoded in payload's dead types; merge both)
        state, ov1 = _merge_payload(state, recv_from_left, cnt_from_left, True)
        state, ov2 = _merge_payload(state, recv_from_right, cnt_from_right,
                                    True, used_dead=spec.migrate_cap)

        # ---- borders (ghosts) ----
        alive = state.alive
        xa = state.x[:, ax]
        edge_l = alive & (xa < spec.margin)
        edge_r = alive & (xa >= w - spec.margin)
        if not spec.periodic:
            edge_l = edge_l & (idx > 0)
            edge_r = edge_r & (idx < spec.ndev - 1)
        srows_l, scnt_l, sov_l = _select_rows(edge_l, spec.ghost_cap)
        srows_r, scnt_r, sov_r = _select_rows(edge_r, spec.ghost_cap)
        gpay_l = _pack_rows(state, srows_l, scnt_l)
        gpay_r = _pack_rows(state, srows_r, scnt_r)
        gpay_l["x"] = gpay_l["x"].at[:, ax].add(w)
        gpay_r["x"] = gpay_r["x"].at[:, ax].add(-w)
        ghosts_from_left = jax.tree_util.tree_map(lambda a: _shift(a, +1), gpay_r)
        ghosts_from_right = jax.tree_util.tree_map(lambda a: _shift(a, -1), gpay_l)
        gcnt_l = _shift(scnt_r, +1)
        gcnt_r = _shift(scnt_l, -1)

        # forward-comm send markers (survive the sort via `extra`)
        send_slot_l = jnp.full((n,), -1, jnp.int32).at[srows_l].set(
            jnp.arange(spec.ghost_cap, dtype=jnp.int32), mode="drop")
        send_slot_r = jnp.full((n,), -1, jnp.int32).at[srows_r].set(
            jnp.arange(spec.ghost_cap, dtype=jnp.int32), mode="drop")

        state, ov3 = _merge_payload(state, ghosts_from_left, gcnt_l, False)
        state, ov4 = _merge_payload(state, ghosts_from_right, gcnt_r, False,
                                    used_dead=spec.ghost_cap)

        # Ghost slot reconstruction: dead slots are consumed in ascending row
        # order, left buffer before right (disjoint offset ranges), and each
        # buffer in slot order — so among activated (!owned & alive) rows in
        # row order, the first gcnt_l are left slots 0..; the rest right.
        act = state.alive & (~state.owned)
        act_rank = jnp.cumsum(act.astype(jnp.int32)) - 1
        slot_l = jnp.where(act & (act_rank < gcnt_l), act_rank, -1)
        slot_r = jnp.where(act & (act_rank >= gcnt_l), act_rank - gcnt_l, -1)

        # ---- sort into the local cell grid, carrying the markers ----
        extra = dict(send_l=send_slot_l, send_r=send_slot_r,
                     slot_l=slot_l, slot_r=slot_r)
        state, grid_data, extra = gridlib.build(state, self.geom, extra=extra)

        def rows_from_slots(slots):
            valid = slots >= 0
            tgt = jnp.where(valid, slots, spec.ghost_cap)
            return jnp.full((spec.ghost_cap,), n, jnp.int32).at[tgt].set(
                jnp.arange(n, dtype=jnp.int32), mode="drop")

        aux = DistAux(
            grid=grid_data,
            send_left=rows_from_slots(extra["send_l"]),
            send_right=rows_from_slots(extra["send_r"]),
            n_send_left=scnt_l, n_send_right=scnt_r,
            ghost_left=rows_from_slots(extra["slot_l"]),
            ghost_right=rows_from_slots(extra["slot_r"]),
            n_ghost_left=gcnt_l, n_ghost_right=gcnt_r,
            # fold in the per-brick cell-grid overflow too (a dense brick
            # cell beyond cap silently drops pairs — must surface, CLAUDE.md
            # invariant), plus any overflow carried from earlier rebuilds
            overflow=(mov_l + mov_r + sov_l + sov_r + ov1 + ov2 + ov3 + ov4
                      + grid_data.overflow
                      + (0 if prev_overflow is None else prev_overflow)),
        )
        return state, aux

    def _wrap_other_axes(self, x):
        wrapped = self.box_global.wrap(x)
        ax = self.spec.axis_dim
        return wrapped.at[:, ax].set(x[:, ax])


# --------------------------------------------------------------------------
# Host-side setup
# --------------------------------------------------------------------------

def make_brick_spec(box: Box, ndev: int, cutoff: float, skin: float,
                    n_particles: int, axis_dim: int = 0,
                    ghost_cap: int | None = None,
                    migrate_cap: int | None = None) -> BrickSpec:
    lo = float(np.asarray(box.lo)[axis_dim])
    hi = float(np.asarray(box.hi)[axis_dim])
    width = (hi - lo) / ndev
    margin = cutoff + skin
    if margin >= width:
        raise ValueError(
            f"halo margin {margin} >= brick width {width}: too many bricks "
            f"for this box/cutoff (need width > cutoff + skin)")
    if ghost_cap is None:
        per_brick = max(n_particles // ndev, 1)
        frac = min(margin / width, 1.0)
        ghost_cap = int(math.ceil(per_brick * frac * 3.0 / 8.0) * 8) + 8
    if migrate_cap is None:
        migrate_cap = max(int(ghost_cap), 16)
    return BrickSpec(ndev=ndev, axis_dim=axis_dim, lo=lo, width=width,
                     margin=margin, ghost_cap=int(ghost_cap),
                     migrate_cap=int(migrate_cap),
                     periodic=box.periodic[axis_dim])


def choose_local_cap(spec: BrickSpec, counts_max: int) -> int:
    """Pool capacity per brick: peak occupancy + ghosts + migration slack."""
    cap = counts_max + 2 * spec.ghost_cap + 2 * spec.migrate_cap
    return ((cap + 127) // 128) * 128


def partition_state(staged: dict, spec: BrickSpec, mesh: Mesh,
                    local_cap: int | None = None
                    ) -> Tuple[ParticleState, int]:
    """Scatter host-staged arrays onto the mesh in brick-local coordinates:
    global shape (ndev * local_cap, ...), sharded along axis 0."""
    x = np.asarray(staged["x"], np.float32).copy()
    ax = spec.axis_dim
    owner = np.clip(((x[:, ax] - spec.lo) / spec.width).astype(int),
                    0, spec.ndev - 1)
    x[:, ax] -= spec.lo + owner * spec.width  # brick-local
    counts = np.bincount(owner, minlength=spec.ndev)
    if local_cap is None:
        local_cap = choose_local_cap(spec, int(counts.max()))
    if counts.max() > local_cap:
        raise ValueError(f"brick occupancy {counts.max()} > local capacity "
                         f"{local_cap}")

    fields = dict(staged)
    fields["x"] = x
    n_tot = spec.ndev * local_cap

    def scatter(v, dtype=None):
        v = np.asarray(v)
        dt = dtype or (v.dtype if v.dtype != np.float64 else np.float32)
        buf = np.zeros((n_tot,) + v.shape[1:], dt)
        for d in range(spec.ndev):
            sel = owner == d
            buf[d * local_cap: d * local_cap + int(sel.sum())] = v[sel]
        return buf

    glob = {k: scatter(v) for k, v in fields.items()}
    st = ParticleState(
        x=jnp.asarray(glob["x"]),
        v=jnp.asarray(glob["v"]),
        vest=jnp.asarray(glob["v"]),
        f=jnp.zeros((n_tot, 3), jnp.float32),
        rho=jnp.asarray(glob["rho"]),
        drho=jnp.zeros(n_tot, jnp.float32),
        e=jnp.asarray(glob["e"]),
        de=jnp.zeros(n_tot, jnp.float32),
        cv=jnp.asarray(glob["cv"]),
        rmass=jnp.asarray(glob["rmass"]),
        type=jnp.asarray(glob["type"], jnp.int32),
        tag=jnp.asarray(glob["tag"], jnp.int32),
        mobile=jnp.asarray(glob["mobile"], bool),
        owned=jnp.asarray(glob["type"] > 0),
    )
    sharding = NamedSharding(mesh, P(AXIS))
    st = jax.tree_util.tree_map(lambda a: jax.device_put(a, sharding), st)
    return st, local_cap


class DistRunner:
    """The multi-brick run loop: ONE jitted shard_map region per run block
    (Verlet::run over bricks — SURVEY §3.2 with the comm stack of §2.5).
    Same interface as tpusph.runner.Runner."""

    def __init__(self, phys_spec, box: Box, backend: DistBackend, mesh: Mesh,
                 end_of_step=None):
        import time as _time
        from functools import partial
        from tpusph import integrate as _integrate
        from tpusph.forces import compute_forces as _forces

        self.spec = phys_spec
        self.box = box
        self.backend = backend
        self.mesh = mesh
        self.timings = {"loop": 0.0, "steps": 0}
        box_local = backend.box_local

        def _one_step(istep, carry):
            state, tables, dt, aux = carry
            state = _integrate.initial_integrate(state, dt, box_local)
            state, aux = backend.prepare(state, aux, istep, box_local)
            state = _forces(state, tables, phys_spec, box_local, backend,
                            istep=istep, aux=aux)
            state = _integrate.final_integrate(state, dt)
            if end_of_step is not None:
                state, aux2 = end_of_step(state, tables, dt, istep, aux.grid,
                                          backend, box_local)
                aux = dataclasses.replace(aux, grid=aux2)
            return (state, tables, dt, aux)

        state_spec = P(AXIS)
        rep = P()

        @partial(jax.jit, static_argnames=("nsteps",), donate_argnums=(0,))
        def _run_block(state, tables, dt, istep0, aux, nsteps):
            def body(state_l, tables_l, dt_l, istep0_l, aux_l):
                carry = (state_l, tables_l, dt_l, aux_l)
                carry = jax.lax.fori_loop(istep0_l, istep0_l + nsteps,
                                          _one_step, carry)
                return carry[0], carry[3]

            return jax.shard_map(
                body, mesh=mesh,
                in_specs=(state_spec, rep, rep, rep, state_spec),
                out_specs=(state_spec, state_spec),
                check_vma=False,
            )(state, tables, dt, istep0, aux)

        @jax.jit
        def _setup(state, tables, istep):
            def body(state_l, tables_l, istep_l):
                state2, aux = backend.init_aux(state_l, box_local)
                state2 = _forces(state2, tables_l, phys_spec, box_local,
                                 backend, istep=istep_l, aux=aux)
                return state2, aux

            return jax.shard_map(
                body, mesh=mesh,
                in_specs=(state_spec, rep, rep),
                out_specs=(state_spec, state_spec),
                check_vma=False,
            )(state, tables, istep)

        self._run_block = _run_block
        self._setup_fn = _setup
        self._time = _time

    def setup(self, state, tables, istep=0, aux=None):
        state, aux = self._setup_fn(state, tables, jnp.asarray(istep, jnp.int32))
        self.aux = aux
        return state

    def run(self, state, tables, dt, nsteps, istep0=0, every=0,
            callback=None, aux=None):
        dt = jnp.asarray(dt, jnp.float32)
        if aux is None:
            aux = self.aux
        if every <= 0:
            every = nsteps
        done = 0
        t0 = self._time.perf_counter()
        while done < nsteps:
            chunk = min(every, nsteps - done)
            state, aux = self._run_block(
                state, tables, dt, jnp.asarray(istep0 + done, jnp.int32),
                aux, nsteps=chunk)
            done += chunk
            if callback is not None:
                jax.block_until_ready(state.x)
                callback(state, istep0 + done)
        jax.block_until_ready(state.x)
        self.timings["loop"] += self._time.perf_counter() - t0
        self.timings["steps"] += nsteps
        return state, aux


def globalize_positions(x_host: np.ndarray, spec: BrickSpec,
                        local_cap: int) -> np.ndarray:
    """Brick-local -> global coordinates for host-side output (dump/get)."""
    x = np.array(x_host, np.float32)
    rows = np.arange(len(x))
    brick = rows // local_cap
    x[:, spec.axis_dim] += spec.lo + brick * spec.width
    return x
