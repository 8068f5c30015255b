"""Cell-grid backend: XLA gather/mask/reduce pair sweeps over the sorted
cell grid (tpusph.grid). The default fast path; same per-pair physics as the
dense oracle (ops.pair_terms), different candidate generation.

Per cell: gather the 27/9 neighbor-cell windows (fixed cap, masked), compute
masked all-pairs terms against the cell's own particles, reduce over
candidates. Periodic images come from per-stencil box shifts computed at
geometry time — no minimum-image in the inner loop, and a particle correctly
sees its own periodic image in sub-2-cell boxes.

Replaces: neigh_half_bin.cpp binning + the per-style neighbor loops
(SURVEY.md §2.6). The Pallas kernel (ops.pallas_pair) reuses this exact data
layout.
"""

from __future__ import annotations

import dataclasses

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpusph import grid as gridlib
from tpusph import kernels
from tpusph.ops import pair_terms
from tpusph.params import PairTables, PhysicsSpec
from tpusph.state import Box, ParticleState


class CellGridBackend:
    """Stateful host-side wrapper owning the static geometry; all methods are
    jit-safe (pure in state/aux)."""

    def __init__(self, geom: gridlib.GridGeometry, cells_per_block: int | None = None,
                 rebuild_every: int = 0):
        self.geom = geom
        nbr_flat, nbr_shift = gridlib.neighbor_cell_ids(geom)
        cb = cells_per_block or (4 if geom.dim == 3 else 16)
        ncells = geom.total_cells
        self.ncells_pad = ((ncells + cb - 1) // cb) * cb
        pad = self.ncells_pad - ncells
        # padding cells point at the sentinel (count 0) so they contribute nothing
        self.nbr_flat = jnp.asarray(
            np.concatenate([nbr_flat,
                            np.full((pad, nbr_flat.shape[1]), ncells, np.int32)]))
        self.nbr_shift = jnp.asarray(
            np.concatenate([nbr_shift,
                            np.zeros((pad,) + nbr_shift.shape[1:], np.float32)]))
        self.cb = cb
        self.rebuild_every = rebuild_every  # 0 = displacement-triggered only

    # -- lifecycle ---------------------------------------------------------

    def init_aux(self, state: ParticleState, box: Box):
        state = dataclasses.replace(state, x=box.wrap(state.x))
        return gridlib.build(state, self.geom)

    def prepare(self, state: ParticleState, aux: gridlib.GridData, istep,
                box: Box):
        """Per-step rebuild decision (Neighbor::decide + Domain::pbc +
        re-sort — SURVEY §3.2 rebuild branch)."""
        trigger = gridlib.needs_rebuild(state, aux, self.geom)
        if self.rebuild_every > 0:
            trigger = trigger | (jnp.asarray(istep) % self.rebuild_every == 0)

        def do_build(s):
            s = dataclasses.replace(s, x=box.wrap(s.x))
            return gridlib.build(s, self.geom, nbuilds=aux.nbuilds)

        return jax.lax.cond(trigger, do_build, lambda s: (s, aux), state)

    # -- candidate window machinery ----------------------------------------

    def _cell_windows(self, c, data: gridlib.GridData, box_len):
        """For one cell id ``c``: (i_rows, i_valid) of its own particles and
        (j_rows, j_valid, j_shift) of the stencil candidates."""
        geom = self.geom
        cap = geom.cap
        ncells = geom.total_cells
        counts_ext = jnp.concatenate([data.counts, jnp.zeros(1, jnp.int32)])
        starts = data.starts

        c = jnp.minimum(c, ncells)  # padded block cells -> sentinel (count 0)
        k = jnp.arange(cap, dtype=jnp.int32)
        i_valid = k < counts_ext[c]
        i_rows = jnp.clip(starts[c] + k, 0, data.cell_id.shape[0] - 1)

        j_cells = self.nbr_flat[jnp.minimum(c, self.nbr_flat.shape[0] - 1)]  # (S,)
        j_shift = self.nbr_shift[c]                    # (S, 3)
        j_valid = k[None, :] < counts_ext[j_cells][:, None]          # (S, cap)
        j_rows = starts[jnp.minimum(j_cells, ncells)][:, None] + k[None, :]
        j_rows = jnp.clip(j_rows, 0, data.cell_id.shape[0] - 1)
        j_off = j_shift[:, None, :] * box_len          # (S, 1->cap, 3)
        return i_rows, i_valid, j_rows.reshape(-1), j_valid.reshape(-1), \
            jnp.broadcast_to(j_off, (j_shift.shape[0], cap, 3)).reshape(-1, 3), \
            jnp.any(j_shift != 0.0, axis=-1)[:, None].repeat(cap, 1).reshape(-1)

    def _sweep(self, state: ParticleState, data: gridlib.GridData, box: Box,
               cell_fn: Callable, out_zero):
        """Run ``cell_fn(i_rows, i_valid, j_rows, j_valid, j_off, j_imaged)``
        over all cells in blocks; returns per-particle outputs scattered back
        to the sorted particle order."""
        geom = self.geom
        box_len = box.length

        def one_cell(c):
            return cell_fn(*self._cell_windows(c, data, box_len))

        cells = jnp.arange(self.ncells_pad, dtype=jnp.int32).reshape(-1, self.cb)
        out_cells = jax.lax.map(jax.vmap(one_cell), cells)
        # (nblocks, cb, cap, ...) -> (ncells_pad * cap, ...)
        out_cells = jax.tree_util.tree_map(
            lambda a: a.reshape((self.ncells_pad * geom.cap,) + a.shape[3:]),
            out_cells)

        # map back: particle at sorted row i lives at (cell_id, rank)
        flat_pos = data.cell_id * geom.cap + data.rank
        ok = state.alive & (data.rank < geom.cap) & (data.cell_id < geom.total_cells)
        flat_pos = jnp.where(ok, flat_pos, 0)
        out = jax.tree_util.tree_map(lambda a: a[flat_pos], out_cells)
        return jax.tree_util.tree_map(
            lambda a: jnp.where(ok.reshape(ok.shape + (1,) * (a.ndim - 1)), a, 0.0),
            out), ok

    # -- sweeps ------------------------------------------------------------

    def rho_summation(self, state, tables: PairTables, spec: PhysicsSpec,
                      box: Box, aux: gridlib.GridData, **_):
        geom = self.geom

        def cell_fn(i_rows, i_valid, j_rows, j_valid, j_off, j_imaged):
            xi = state.x[i_rows]                       # (cap, 3)
            xj = state.x[j_rows] + j_off               # (J, 3)
            dx = xi[:, None, :] - xj[None, :, :]
            rsq = jnp.sum(dx * dx, axis=-1)
            it = state.type[i_rows]
            jt = state.type[j_rows]
            cut_ij = tables.cut_rho[it[:, None], jt[None, :]]
            pair_ok = (i_valid[:, None] & j_valid[None, :]
                       & ((i_rows[:, None] != j_rows[None, :]) | j_imaged[None, :])
                       & (rsq < cut_ij * cut_ij))
            r = jnp.sqrt(jnp.maximum(rsq, 0.0))
            pj = dict(rmass=state.rmass[j_rows][None, :])
            contrib = pair_terms.rho_summation_pair(pj, r, cut_ij, pair_ok, spec)
            return jnp.sum(contrib, axis=1)

        (rho,), _ = self._sweep(state, aux, box, lambda *w: (cell_fn(*w),), 0.0)
        self_cut = tables.cut_rho[state.type, state.type]
        w0 = kernels.kernel_w(spec.kernel, spec.dim)(
            jnp.zeros_like(self_cut), jnp.maximum(self_cut, 1e-30))
        sm = 1.0 if spec.rhosum_nd else state.rmass
        rho = rho + jnp.where(state.alive & (self_cut > 0.0), sm * w0, 0.0)
        if spec.rhosum_nd:
            rho = rho * state.rmass
        return jnp.where(state.alive, rho, state.rho)

    def color_gradient(self, state, tables: PairTables, spec: PhysicsSpec,
                       box: Box, aux: gridlib.GridData, **_):
        def cell_fn(i_rows, i_valid, j_rows, j_valid, j_off, j_imaged):
            xi = state.x[i_rows]
            xj = state.x[j_rows] + j_off
            dx = xi[:, None, :] - xj[None, :, :]
            rsq = jnp.sum(dx * dx, axis=-1)
            pair_ok = (i_valid[:, None] & j_valid[None, :]
                       & ((i_rows[:, None] != j_rows[None, :]) | j_imaged[None, :]))
            pi = {k: _bi(v, i_rows) for k, v in _fields(state).items()}
            pj = {k: _bj(v, j_rows) for k, v in _fields(state).items()}
            r = jnp.sqrt(jnp.maximum(rsq, 1e-30))
            coefs = pair_terms.make_pair_coefs(
                tables, state.type[i_rows][:, None],
                state.type[j_rows][None, :], spec)
            contrib = pair_terms.color_gradient_pair(pi, pj, dx, r, coefs,
                                                     pair_ok, spec)
            return jnp.sum(contrib, axis=1)

        (cg,), _ = self._sweep(state, aux, box, lambda *w: (cell_fn(*w),), 0.0)
        return jnp.where(state.alive[:, None], cg, 0.0)

    def vapor_neighbor(self, state, box: Box, vtype: int, cut: float,
                       aux: gridlib.GridData):
        """(count, nearest_row, nearest_rsq) of type-`vtype` neighbors within
        `cut` — the phase-change fix's interface query (SURVEY §3.5), as a
        cell-window sweep instead of the O(N^2) fallback."""
        n = state.capacity

        def cell_fn(i_rows, i_valid, j_rows, j_valid, j_off, j_imaged):
            xi = state.x[i_rows]
            xj = state.x[j_rows] + j_off
            dx = xi[:, None, :] - xj[None, :, :]
            rsq = jnp.sum(dx * dx, axis=-1)
            is_vap = (state.type[j_rows] == vtype)[None, :]
            ok = (i_valid[:, None] & j_valid[None, :]
                  & ((i_rows[:, None] != j_rows[None, :]) | j_imaged[None, :])
                  & is_vap & (rsq < cut * cut))
            count = jnp.sum(ok, axis=1).astype(jnp.float32)
            big = jnp.where(ok, rsq, jnp.inf)
            k = jnp.argmin(big, axis=1)
            nearest = j_rows[k].astype(jnp.float32)
            # nearest OWNED vapor: grow mode must never target a ghost (its
            # update is lost at the next halo refresh while the liquid is
            # debited) — the owned fallback keeps seam events firing
            big_o = jnp.where(ok & state.owned[j_rows][None, :], rsq, jnp.inf)
            k_o = jnp.argmin(big_o, axis=1)
            near_o = j_rows[k_o].astype(jnp.float32)
            return (count, nearest, jnp.min(big, axis=1),
                    near_o, jnp.min(big_o, axis=1))

        (count, nearest, dmin, near_o, dmin_o), ok = self._sweep(
            state, aux, box, cell_fn, 0.0)
        return (count.astype(jnp.int32),
                nearest.astype(jnp.int32),
                jnp.where(count > 0, dmin, jnp.inf),
                near_o.astype(jnp.int32),
                dmin_o)

    def force(self, state, tables: PairTables, spec: PhysicsSpec, box: Box,
              aux: gridlib.GridData, cg: Optional[jax.Array] = None, **_):
        if spec.surface_tension and cg is None:
            cg = self.color_gradient(state, tables, spec, box, aux)

        def cell_fn(i_rows, i_valid, j_rows, j_valid, j_off, j_imaged):
            xi = state.x[i_rows]
            xj = state.x[j_rows] + j_off
            dx = xi[:, None, :] - xj[None, :, :]
            rsq = jnp.sum(dx * dx, axis=-1)
            pair_ok = (i_valid[:, None] & j_valid[None, :]
                       & ((i_rows[:, None] != j_rows[None, :]) | j_imaged[None, :]))
            pi = {k: _bi(v, i_rows) for k, v in _fields(state).items()}
            pj = {k: _bj(v, j_rows) for k, v in _fields(state).items()}
            kw = {}
            if spec.surface_tension:
                kw = dict(cg_i=cg[i_rows][:, None, :], cg_j=cg[j_rows][None, :, :])
            coefs = pair_terms.make_pair_coefs(
                tables, state.type[i_rows][:, None],
                state.type[j_rows][None, :], spec)
            out = pair_terms.force_pair(pi, pj, dx, rsq, pair_ok, coefs, spec, **kw)
            outs = (jnp.sum(out["f"], axis=1), jnp.sum(out["drho"], axis=1),
                    jnp.sum(out["de"], axis=1))
            if spec.virial:
                outs = outs + (jnp.sum(out["vir"], axis=1),)
            return outs

        outs, ok = self._sweep(state, aux, box, cell_fn, 0.0)
        return outs


def _fields(state: ParticleState):
    return dict(vest=state.vest, rho=state.rho, e=state.e, cv=state.cv,
                rmass=state.rmass, type=state.type)


def _bi(v, rows):
    out = v[rows]
    return out[:, None] if out.ndim == 1 else out[:, None, :]


def _bj(v, rows):
    out = v[rows]
    return out[None, :] if out.ndim == 1 else out[None, :, :]
