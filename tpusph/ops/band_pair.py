"""Banded Pallas TPU pair kernels over a slot-resident sub-cell grid — the
second-generation speed-of-light path for the reference's pair-style inner
loops (same capability surface as ops/pallas_pair.py: pair_sph_taitwater
[/morris], _idealgas, _lj, _heatconduction, _rhosum, _colorgradient,
_surfacetension — SURVEY.md §2.11 item 1).

Why a second kernel shape
-------------------------
The column kernel (ops/pallas_pair.py) issues, per i-particle row, 27
j-tiles whose lane dimension (cell capacity, ~80) is padded to 128 by the
hardware — ~4300 issued lane-ops per particle against ~113 true neighbors.
Two structural fixes, measured on v5e:

1. **Slot-resident state.** Particle row index IS the cell slot
   (row = cell*cap + rank), re-scattered only at rebuild. The per-step
   pack becomes reshape+stack (bandwidth) instead of a 1M-row XLA scatter
   (~100 ms/step at 1M particles).
2. **Z-banded j-windows.** Cells are split into sub-cells along the column
   axis (z in 3D, y in 2D). A GROUP of G sub-cells (G*c slots, the i-tile,
   on sublanes) shares ONE j-window per xy-neighbor column: the group's
   sub-cells plus k margin sub-cells each side, (G+2k)*c lanes, pre-gathered
   XLA-side into a "band" array (roll+concat — no dynamic lane slicing in
   the kernel, which Mosaic cannot do unaligned). Issued lane-ops per
   particle ≈ 9 * (G+2k)*c/G / occupancy — 4-6x below the column kernel.

Physics is stated once in ops/pair_terms.py; this kernel mirrors it term by
term with per-particle factors HOISTED out of the pair tiles:
EOS p/rho^2, sound speeds, 1/rho, tension stress norms are computed on
(G*c, 1) i-columns and (1, W) j-rows, not (G*c, W) tiles. Equivalence tests
(tests/test_band.py) enforce agreement with the cell-grid/dense oracles.

Coefficient tables, one-hot MXU lookups, and scalar-table folding are
shared with the column kernel (pack_tables, _TABLES_*).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusph import grid as gridlib
from tpusph import kernels
from tpusph.ops.pallas_pair import (
    F_ROWS, RX, RY, RZ, RVX, RVY, RVZ, RRHO, RE, RM, RTYPE, RCGX, RCGY, RCGZ,
    RCV, RMIX, RSLOT, OFX, OFY, OFZ, ODRHO, ODE, ORHO, OCGX, OCGY,
    _TABLES_1D, _TABLES_2D, _onehot, _onehot_t, pack_tables,
)
from tpusph.params import PairTables, PhysicsSpec
from tpusph.state import Box, ParticleState

# Far-sentinel position for dead layout slots: any real-vs-dead pair fails
# the rsq < cut^2 distance test outright (rsq ~ 4e12), and dead-vs-dead
# pairs coincide exactly and self-exclude via rsq > 1e-12 — so the tile
# kernels' pair liveness is a pure distance test (tile_physics
# sentinel_dead) with no per-lane alive compares. Must stay far beyond any
# box length +- periodic image shifts, and well inside f32 (rsq ~ 1.2e13).
DEAD_X = 2.0e6


def dead_lane_fill(row_id: int) -> float:
    """Fill value for a dead window lane under the sentinel_dead contract:
    far position (the distance kill), UNIT rho/m/cv. The units matter even
    though dead lanes never pass the distance test: jnp.where discards a
    dead lane's value but not a NaN produced while COMBINING it — e.g. the
    Hu-Adams a_j = cg2_j * inv_nr_j is 0 * inf = NaN at rho_j = 0, and
    0-coef * NaN = NaN would poison the live fold."""
    if row_id == RX:
        return DEAD_X
    if row_id in (RRHO, RM, RCV):
        return 1.0
    return 0.0


class BandGeometry(NamedTuple):
    """Static band-kernel geometry (hashable, part of the jit cache key).

    3D: columns tile the xy plane, sub-cells run along z.
    2D: columns tile the x axis, sub-cells run along y (ncy == 1).
    """
    ncx: int
    ncy: int          # 1 in 2D
    nsub: int         # sub-cells per column (multiple of G when periodic)
    G: int            # sub-cells per i-group
    c: int            # slots per sub-cell (multiple of 8)
    k: int            # margin sub-cells per side (k * s_sub >= cutoff + skin)
    dim: int
    periodic: tuple   # box periodicity (3,)
    lengths: tuple    # global box lengths (Lx, Ly, Lz)
    origin: tuple
    cell_xy: tuple    # cell side along the column-plane axes
    s_sub: float      # sub-cell height along the column axis
    skin: float

    @property
    def ncols(self) -> int:
        return self.ncx * self.ncy if self.dim == 3 else self.ncx

    @property
    def col_axis(self) -> int:
        return 2 if self.dim == 3 else 1

    @property
    def ngroups(self) -> int:
        return -(-self.nsub // self.G)

    @property
    def nsub_pad(self) -> int:
        return self.ngroups * self.G

    @property
    def n_slots(self) -> int:
        return self.ncols * self.nsub_pad * self.c

    @property
    def total_cells(self) -> int:
        return self.ncols * self.nsub_pad

    @property
    def w_real(self) -> int:
        return (self.G + 2 * self.k) * self.c

    @property
    def w_pad(self) -> int:
        return -(-self.w_real // 128) * 128

    @property
    def gc(self) -> int:
        return self.G * self.c

    @property
    def nnbr(self) -> int:
        return 9 if self.dim == 3 else 3

    @property
    def col_periodic(self) -> bool:
        return bool(self.periodic[self.col_axis])


def choose_band_geometry(box: Box, cutoff: float, dim: int, skin: float,
                         x: np.ndarray | None = None,
                         max_gc: int = 512,
                         headroom: float = 1.2) -> BandGeometry | None:
    """Host-side geometry search: enumerate (sub-cell split p, group size G)
    candidates, size the slot capacity from the MEASURED per-sub-cell
    occupancy of ``x``, and pick the candidate minimizing issued lane-ops
    per particle. Returns None when no valid candidate exists (tiny boxes)
    — callers fall back to the column kernel."""
    lo = np.asarray(box.lo, np.float64)
    hi = np.asarray(box.hi, np.float64)
    length = hi - lo
    side = cutoff + skin
    if side <= 0:
        return None
    col_axis = 2 if dim == 3 else 1
    plane_axes = (0, 1) if dim == 3 else (0,)
    nc_plane = {a: max(int(length[a] // side), 1) for a in plane_axes}
    lc = float(length[col_axis])
    col_per = bool(box.periodic[col_axis])

    if x is None:
        return None
    x = np.asarray(x)
    if len(x) == 0:
        return None

    _occ_cache = {}

    def occupancy(nsub_real):
        """(max, mean-over-occupied) particles per sub-cell. Memoized: the
        histogram depends only on nsub, not on (G, k)."""
        if nsub_real in _occ_cache:
            return _occ_cache[nsub_real]
        ncs = np.ones(3, np.int64)
        for a in plane_axes:
            ncs[a] = nc_plane[a]
        ncs[col_axis] = nsub_real
        sizes = np.where(length > 0, length, 1.0) / np.maximum(ncs, 1)
        cc = np.clip(((x - lo) // sizes).astype(np.int64), 0, ncs - 1)
        flat = (cc[:, 0] * ncs[1] + cc[:, 1]) * ncs[2] + cc[:, 2]
        counts = np.bincount(flat)
        occupied = counts[counts > 0]
        out = int(counts.max()), float(occupied.mean())
        _occ_cache[nsub_real] = out
        return out

    best = None
    for p in (1, 2, 3, 4, 5, 6):
        nsub0 = int(lc * p // side)
        if nsub0 < 1:
            continue
        for G in range(4, 33):
            if col_per:
                nsub = nsub0 - nsub0 % G
                if nsub < G:
                    continue
            else:
                nsub = nsub0
            s_sub = lc / nsub
            k = max(int(math.ceil(side / s_sub - 1e-9)), 1)
            if k > G:
                continue
            if col_per and G + 2 * k > nsub:
                continue  # window would wrap onto itself
            max_occ, mean_occ = occupancy(nsub)
            c = max(int(math.ceil((max_occ * headroom + 2) / 8.0)) * 8, 8)
            gc = G * c
            if gc > max_gc:
                continue
            w_real = (G + 2 * k) * c
            w_pad = -(-w_real // 128) * 128
            if gc * w_pad > 512_000:   # VMEM working-set guard (~2MB/array)
                continue
            nnbr = 9 if dim == 3 else 3
            # issued lane-ops per alive particle (the quantity the VPU pays)
            cost = nnbr * w_pad / max(G * mean_occ, 1e-9)
            if best is None or cost < best[0]:
                best = (cost, nsub, G, c, k, s_sub)
    if best is None:
        return None
    _, nsub, G, c, k, s_sub = best
    if dim == 3:
        ncx, ncy = nc_plane[0], nc_plane[1]
        cell_xy = (length[0] / ncx, length[1] / ncy)
    else:
        ncx, ncy = nc_plane[0], 1
        cell_xy = (length[0] / ncx, 0.0)
    return BandGeometry(
        ncx=int(ncx), ncy=int(ncy), nsub=int(nsub), G=int(G), c=int(c),
        k=int(k), dim=dim, periodic=box.periodic,
        lengths=tuple(float(v) for v in length),
        origin=tuple(float(v) for v in lo),
        cell_xy=tuple(float(v) for v in cell_xy),
        s_sub=float(s_sub), skin=float(skin))


# --------------------------------------------------------------------------
# slot-resident state build (the rebuild-cadence scatter)
# --------------------------------------------------------------------------

def subcell_id(x: jax.Array, geom: BandGeometry) -> jax.Array:
    """(N, 3) positions -> flat (col * nsub_pad + sub) cell id. Clamped on
    non-periodic axes, wrapped on periodic ones (positions are wrapped at
    build time, but roundoff can land exactly on the hi face)."""
    if geom.dim == 3:
        ncs = np.array([geom.ncx, geom.ncy, geom.nsub])
        sizes = np.array([geom.cell_xy[0], geom.cell_xy[1], geom.s_sub])
    else:
        ncs = np.array([geom.ncx, geom.nsub, 1])
        sizes = np.array([geom.cell_xy[0], geom.s_sub,
                          max(geom.lengths[2], 1.0)])
    origin = jnp.asarray(geom.origin, jnp.float32)
    cc = jnp.floor((x - origin) / jnp.asarray(sizes, jnp.float32)
                   ).astype(jnp.int32)
    per = jnp.asarray(geom.periodic)
    ncs_j = jnp.asarray(ncs, jnp.int32)
    cc = jnp.where(per, jnp.mod(cc, ncs_j), jnp.clip(cc, 0, ncs_j - 1))
    if geom.dim == 3:
        col = cc[:, 0] * geom.ncy + cc[:, 1]
        sub = cc[:, 2]
    else:
        col = cc[:, 0]
        sub = cc[:, 1]
    return col * geom.nsub_pad + sub


def build_slots(state: ParticleState, geom: BandGeometry, box: Box,
                nbuilds=None):
    """Scatter particles into the slot-resident layout: row = cell*c + rank.
    The band analog of grid.build (Neighbor::build + the atom sort); runs at
    rebuild cadence only. Positions wrap here (Domain::pbc semantics).
    Overflowed particles (rank >= c) are counted AND dropped — the host
    check (Simulation._check_overflow) aborts with a remedy."""
    n = state.capacity
    assert n == geom.n_slots, (n, geom.n_slots)
    ncells = geom.total_cells
    c = geom.c

    state = dataclasses.replace(state, x=box.wrap(state.x))
    cid = subcell_id(state.x, geom)
    cid = jnp.where(state.alive, cid, ncells)
    perm = jnp.argsort(cid, stable=True)
    cid_s = cid[perm]

    counts = jnp.zeros(ncells + 1, jnp.int32).at[cid_s].add(1)[:ncells]
    starts = jnp.concatenate([
        jnp.zeros(1, jnp.int32), jnp.cumsum(counts).astype(jnp.int32)])
    rank = jnp.arange(n, dtype=jnp.int32) - starts[jnp.minimum(cid_s, ncells - 1)]
    ok = (cid_s < ncells) & (rank < c)
    slot = jnp.where(ok, cid_s * c + rank, n)    # drop target
    overflow = jnp.sum(jnp.maximum(counts - c, 0))[None]

    def scatter(a):
        dest = jnp.zeros(a.shape, a.dtype)
        return dest.at[slot].set(a[perm], mode="drop")

    new_state = jax.tree_util.tree_map(scatter, state)
    # sentinel-fill the unfilled slots (tile_physics sentinel_dead
    # contract): far positions make the kernels' distance test the
    # liveness test; unit rho/m/cv keep every hoisted denominator finite
    dead = ~new_state.alive
    new_state = dataclasses.replace(
        new_state,
        x=jnp.where(dead[:, None], DEAD_X, new_state.x),
        rho=jnp.where(dead, 1.0, new_state.rho),
        cv=jnp.where(dead, 1.0, new_state.cv),
        rmass=jnp.where(dead, 1.0, new_state.rmass))

    if nbuilds is None:
        nbuilds = jnp.zeros(1, jnp.int32)
    rows = jnp.arange(n, dtype=jnp.int32)
    data = gridlib.GridData(
        cell_id=jnp.where(new_state.alive, rows // c, ncells),
        starts=jnp.arange(ncells + 1, dtype=jnp.int32) * c,
        counts=counts,
        rank=rows % c,
        x_ref=new_state.x,
        overflow=overflow,
        nbuilds=nbuilds + 1)
    return new_state, data


def needs_rebuild(state: ParticleState, data: gridlib.GridData,
                  skin: float) -> jax.Array:
    """Neighbor::decide() displacement trigger (skin/2)."""
    if skin <= 0.0:
        return jnp.asarray(True)
    disp = state.x - data.x_ref
    maxd2 = jnp.max(jnp.where(state.alive[:, None], disp * disp, 0.0).sum(-1))
    return maxd2 > (0.5 * skin) ** 2


# --------------------------------------------------------------------------
# XLA-side packing: slot fields -> i-array and banded j-array
# --------------------------------------------------------------------------

def _field_list(fields: dict):
    """Ordered F_ROWS field arrays ((n_slots,) each) per the R* row ids.
    (Row order is the narrow-fetch contract in pallas_pair: rho/cgrad/
    vapor-needed rows first — keep in sync with the R* constants.)"""
    n = fields["x0"].shape[0]
    z = jnp.zeros(n, jnp.float32)
    cols = [None] * F_ROWS
    cols[RX], cols[RY], cols[RZ] = fields["x0"], fields["x1"], fields["x2"]
    cols[RM], cols[RTYPE], cols[RRHO] = (fields["m"], fields["type_f"],
                                         fields["rho"])
    cols[RSLOT] = fields.get("slot", z)
    cols[RMIX] = fields.get("mix", z)
    cols[RVX], cols[RVY], cols[RVZ] = fields["v0"], fields["v1"], fields["v2"]
    cols[RE], cols[RCV] = fields["e"], fields["cv"]
    cols[RCGX] = fields.get("cg0", z)
    cols[RCGY] = fields.get("cg1", z)
    cols[RCGZ] = fields.get("cg2", z)
    return [z if c is None else c for c in cols]


def pack_i(fields: dict, geom: BandGeometry) -> jax.Array:
    """(ncols, ngroups, G*c, F): the i-tiles. Pure reshape+stack."""
    cols = _field_list(fields)
    arr = jnp.stack(cols, axis=1)   # (n_slots, F)
    return arr.reshape(geom.ncols, geom.ngroups, geom.gc, F_ROWS)


def band_row(f, row_id: int, geom: BandGeometry) -> jax.Array:
    """One field row of the band array: (ncols, ngroups, W). Periodic
    column axis: the wrap margins get the box-length image shift applied
    to the column-axis coordinate row; non-periodic: the outside margins
    are killed (type row zeroed)."""
    kc = geom.k * geom.c
    g_idx = jnp.arange(geom.ngroups)
    col_row = RZ if geom.dim == 3 else RY
    lz = geom.lengths[geom.col_axis]
    a = f.reshape(geom.ncols, geom.ngroups, geom.gc)
    lo = jnp.roll(a, 1, axis=1)[:, :, -kc:]
    hi = jnp.roll(a, -1, axis=1)[:, :, :kc]
    if geom.col_periodic:
        if row_id == col_row:
            lo = lo + jnp.where((g_idx == 0)[None, :, None], -lz, 0.0)
            hi = hi + jnp.where((g_idx == geom.ngroups - 1)[None, :, None],
                                lz, 0.0)
    else:
        if row_id == RTYPE:
            lo = jnp.where((g_idx == 0)[None, :, None], 0.0, lo)
            hi = jnp.where((g_idx == geom.ngroups - 1)[None, :, None],
                           0.0, hi)
        elif row_id == RX:
            # distance-kill for the sentinel_dead kernels (type row alone
            # no longer masks pairs)
            lo = jnp.where((g_idx == 0)[None, :, None], DEAD_X, lo)
            hi = jnp.where((g_idx == geom.ngroups - 1)[None, :, None],
                           DEAD_X, hi)
    pad = geom.w_pad - geom.w_real
    pieces = [lo, a, hi]
    if pad:
        pieces.append(jnp.full((geom.ncols, geom.ngroups, pad),
                               dead_lane_fill(row_id), jnp.float32))
    return jnp.concatenate(pieces, axis=-1)


def pack_band(fields: dict, geom: BandGeometry) -> jax.Array:
    """(ncols + 1, ngroups, F, W): per (column, group), the group's j-window
    = [group - k sub-cells, group + G + k sub-cells) pre-gathered into the
    lane axis (+ zero pad to W_pad, + an all-dead sentinel column for
    non-periodic plane edges)."""
    cols = _field_list(fields)
    band = jnp.stack([band_row(f, r, geom) for r, f in enumerate(cols)],
                     axis=2)
    fill = jnp.array([dead_lane_fill(r) for r in range(F_ROWS)],
                     jnp.float32)
    sentinel = jnp.broadcast_to(fill[None, None, :, None],
                                (1,) + band.shape[1:])
    return jnp.concatenate([band, sentinel], axis=0)


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------

def _neighbor_offsets(geom: BandGeometry):
    if geom.dim == 3:
        return [(ox, oy) for ox in (-1, 0, 1) for oy in (-1, 0, 1)]
    return [(ox, 0) for ox in (-1, 0, 1)]


def _band_index_map(geom: BandGeometry, ox: int, oy: int):
    """(col, group) program -> block index of the (ox, oy)-offset neighbor
    column's band; invalid plane-edge neighbors -> the sentinel column."""
    ncx, ncy = geom.ncx, geom.ncy
    px = geom.periodic[0]
    py = geom.periodic[1] if geom.dim == 3 else False

    def imap(cidx, g):
        if geom.dim == 3:
            cx = cidx // ncy
            cy = cidx % ncy
            nx = cx + ox
            ny = cy + oy
            if px:
                nx = jax.lax.rem(nx + ncx, ncx)
            if py:
                ny = jax.lax.rem(ny + ncy, ncy)
            valid = jnp.logical_and(
                jnp.logical_and(nx >= 0, nx < ncx),
                jnp.logical_and(ny >= 0, ny < ncy))
            idx = nx * ncy + ny
        else:
            nx = cidx + ox
            if px:
                nx = jax.lax.rem(nx + ncx, ncx)
            valid = jnp.logical_and(nx >= 0, nx < ncx)
            idx = nx
        return (jnp.where(valid, idx, geom.ncols), g, 0, 0)

    return imap


def _plane_shift(geom: BandGeometry, ox: int, oy: int, cidx):
    """Per-neighbor-column periodic image shifts (traced scalars) for the
    plane axes. The j positions get += shift to sit next to this column."""
    if geom.dim == 3:
        cx = cidx // geom.ncy
        cy = cidx % geom.ncy
    else:
        cx = cidx
        cy = 0
    nx = cx + ox
    ny = cy + oy
    sx = jnp.where(nx < 0, -geom.lengths[0],
                   jnp.where(nx >= geom.ncx, geom.lengths[0], 0.0)) \
        if geom.periodic[0] else jnp.float32(0.0)
    py = geom.periodic[1] if geom.dim == 3 else False
    sy = jnp.where(ny < 0, -geom.lengths[1],
                   jnp.where(ny >= geom.ncy, geom.lengths[1], 0.0)) \
        if py else jnp.float32(0.0)
    return sx, sy


def make_band_kernel(geom: BandGeometry, spec: PhysicsSpec, ntypes: int,
                     sweep: str, interpret: bool = False):
    """Build the pallas_call for one sweep: 'force' | 'rho' | 'cgrad'.
    The pair physics lives in ops/tile_physics.py (shared with the strip
    kernel), which mirrors ops/pair_terms.py term by term."""
    from tpusph.ops import tile_physics

    gc = geom.gc
    W = geom.w_pad
    T1 = ntypes + 1
    offs = _neighbor_offsets(geom)
    n_out = tile_physics.sweep_n_out(sweep, spec)

    def kernel(scal_ref, tabs_ref, i_ref, *refs):
        out_ref = refs[-1]
        band_refs = refs[:-1]
        cidx = pl.program_id(0)
        tabs2d, vec_cols, vec_rows = tile_physics.unpack_tables(tabs_ref, T1)
        i_tile = i_ref[0, 0]                   # (gc, F)

        def _body(i_tile):
            lk = tile_physics.Lookups(scal_ref, tabs2d, vec_cols, vec_rows,
                                      spec, T1)
            hoist = tile_physics.hoist_i(i_tile, lk, spec, sweep,
                                         sentinel_dead=True)
            K = tile_physics.fold_width(W)
            accs = [jnp.zeros((gc, K), jnp.float32) for _ in range(n_out)]
            for kk, (ox, oy) in enumerate(offs):
                sx, sy = _plane_shift(geom, ox, oy, cidx)
                j_tile = band_refs[kk][0, 0]    # (F, W)
                parts = tile_physics.tile_part_sums(
                    i_tile, j_tile, (sx, sy), hoist, lk, spec, sweep, True,
                    sentinel_dead=True)
                accs = [a + p for a, p in zip(accs, parts)]

            out_rows = {"rho": (ORHO,), "cgrad": (OCGX, OCGY, ODE),
                        "force": (OFX, OFY, OFZ, ODRHO, ODE)}[sweep]
            if sweep == "force" and spec.virial:
                out_rows = out_rows + (ORHO,)   # OVIR: rho row free here
            # cross-lane tree once per output (tile_physics.fold_width)
            for row, acc in zip(out_rows, accs):
                v = jnp.sum(acc, axis=1)
                if sweep == "rho" and tile_physics.rho_self_in_kernel(spec):
                    # rhosum self term folded here (tile_physics.rho_self)
                    v = v + tile_physics.rho_self(i_tile, lk, spec)
                out_ref[0, 0, :, row] = v

        # empty i-group: nothing to compute or write (dead output slots are
        # masked by the caller before they reach state)
        @pl.when(jnp.any(i_tile[:, RTYPE] > 0.5))
        def _():
            _body(i_tile)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, gc, F_ROWS),
                             index_map=lambda c, g: (c, g, 0, 0),
                             memory_space=pltpu.VMEM)]
    for ox, oy in offs:
        in_specs.append(
            pl.BlockSpec((1, 1, F_ROWS, W),
                         index_map=_band_index_map(geom, ox, oy),
                         memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, 1, gc, 8),
                            index_map=lambda c, g: (c, g, 0, 0),
                            memory_space=pltpu.VMEM)

    def call(tabs, i_arr, band):
        scal, tab_mat = tabs
        args = [scal, tab_mat, i_arr] + [band] * len(offs)
        return pl.pallas_call(
            kernel,
            grid=(geom.ncols, geom.ngroups),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(
                (geom.ncols, geom.ngroups, gc, 8), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*args)

    return call


# --------------------------------------------------------------------------
# backend
# --------------------------------------------------------------------------

def _state_fields(state: ParticleState) -> dict:
    """Per-slot field dict feeding pack_i/pack_band. Pair forces use vest
    (atom_vec_meso forward-comm field set — SURVEY §2.2)."""
    return dict(
        x0=state.x[:, 0], x1=state.x[:, 1], x2=state.x[:, 2],
        v0=state.vest[:, 0], v1=state.vest[:, 1], v2=state.vest[:, 2],
        rho=state.rho, e=state.e, m=state.rmass, cv=state.cv,
        type_f=state.type.astype(jnp.float32))


class BandBackend:
    """Slot-resident banded-kernel backend (single device; the dist path
    keeps the column kernel). Same lifecycle protocol as CellGridBackend:
    init_aux / prepare / force_stage."""

    def __init__(self, geom: BandGeometry, box: Box, ntypes: int,
                 rebuild_every: int = 0, interpret: bool | None = None):
        self.geom = geom
        self.ntypes = ntypes
        self.rebuild_every = rebuild_every
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        self._calls = {}

    def _call(self, spec: PhysicsSpec, sweep: str):
        key = (spec, sweep)
        if key not in self._calls:
            self._calls[key] = make_band_kernel(
                self.geom, spec, self.ntypes, sweep,
                interpret=self.interpret)
        return self._calls[key]

    # packer dispatch (overridden by the strip backend, ops/strip_pair)
    def _pack_i(self, fields):
        return pack_i(fields, self.geom)

    def _pack_band(self, fields):
        return pack_band(fields, self.geom)

    def _band_row(self, f, row_id: int):
        return band_row(f, row_id, self.geom)

    def _sweep_call(self, spec, sweep, tabs, i_arr, band, aux):
        """One kernel sweep (the strip backend adds its scalar-prefetched
        window-retarget tables here)."""
        return self._call(spec, sweep)(tabs, i_arr, band)

    def _mixed_flags(self, fields, aux=None):
        """Per-slot mixed-phase-neighborhood flag for the cgrad skip, or
        None when the backend's kernel doesn't implement the skip."""
        return None

    def _update_rows(self, i_arr, band, fields, row_ids):
        """Refresh only the given F-rows of the packed arrays after a sweep
        updated their fields (rho after rhosum, cg after colorgradient) —
        the other 13 rows are unchanged within a step. Contiguous row_ids
        (the cg triple RCGX..RCGZ) are written in ONE slice-update per
        array instead of one scatter pass per row: the i-array's F axis is
        minor, so each single-row set is a stride-F scatter over the whole
        array, and three of them tripled the patch cost (PERFORMANCE.md
        r4 glue table)."""
        names = {RRHO: "rho", RCGX: "cg0", RCGY: "cg1", RCGZ: "cg2"}
        ish = i_arr.shape      # (ncols, ngroups|ntiles, rows, F)
        row_ids = sorted(row_ids)
        r0, r1 = row_ids[0], row_ids[-1] + 1
        assert list(row_ids) == list(range(r0, r1)), row_ids
        fs = [fields[names[r]] for r in row_ids]
        iupd = jnp.stack([f.reshape(ish[:-1]) for f in fs], axis=-1)
        i_arr = jax.lax.dynamic_update_slice_in_dim(i_arr, iupd, r0, axis=3)
        bupd = jnp.stack([self._band_row(f, r)
                          for r, f in zip(row_ids, fs)], axis=2)
        # extend the update over the all-dead sentinel column (with each
        # row's dead-lane fill — rho must stay 1 there, see dead_lane_fill)
        # so ONE in-place slice update covers the full band array
        fill = jnp.array([dead_lane_fill(r) for r in row_ids], jnp.float32)
        bupd = jnp.concatenate(
            [bupd, jnp.broadcast_to(fill[None, None, :, None],
                                    (1,) + bupd.shape[1:])], axis=0)
        band = jax.lax.dynamic_update_slice_in_dim(band, bupd, r0, axis=2)
        return i_arr, band

    # -- lifecycle -----------------------------------------------------------

    def resize(self, state: ParticleState) -> ParticleState:
        """Pad (or shrink) the state pool to exactly n_slots rows. Shrinking
        only ever removes trailing rows and requires them dead."""
        n = self.geom.n_slots
        cap = state.capacity
        if cap == n:
            return state

        if cap < n:
            def pad(a):
                padding = [(0, n - cap)] + [(0, 0)] * (a.ndim - 1)
                return jnp.pad(a, padding)
            return jax.tree_util.tree_map(pad, state)

        tail_alive = int(jnp.sum(state.alive[n:].astype(jnp.int32)))
        if tail_alive:
            raise ValueError(
                f"band backend: {tail_alive} alive particles beyond the "
                f"{n}-slot grid capacity; raise cell capacity "
                "(Simulation.cell_cap)")
        return jax.tree_util.tree_map(lambda a: a[:n], state)

    def init_aux(self, state: ParticleState, box: Box):
        return build_slots(self.resize(state), self.geom, box)

    def prepare(self, state: ParticleState, aux: gridlib.GridData, istep,
                box: Box):
        trigger = needs_rebuild(state, aux, self.geom.skin)
        if self.rebuild_every > 0:
            trigger = trigger | (jnp.asarray(istep) % self.rebuild_every == 0)

        def do_build(s):
            return build_slots(s, self.geom, box, nbuilds=aux.nbuilds)

        return jax.lax.cond(trigger, do_build, lambda s: (s, aux), state)

    # -- the fused force stage ------------------------------------------------

    def force_stage(self, state: ParticleState, tables: PairTables,
                    spec: PhysicsSpec, box: Box, aux, istep, halo=None):
        """``halo``: optional field -> field callable applied to freshly
        computed rho / color gradients before they re-enter the packed
        arrays — the dist mode's mid-force owner->ghost refresh
        (Pair::pack_forward_comm analog, SURVEY §2.5)."""
        geom = self.geom
        n = geom.n_slots
        alive = state.alive
        fields = _state_fields(state)
        if spec.surface_tension:
            # per-tile mixed-phase flag (RMIX row): single-phase tiles
            # skip the cgrad sweep entirely (their cg is exactly zero).
            # The strip backend computes it once per REBUILD and carries
            # it on the aux (GridData.mix — types change only through
            # phase-change insertion, which forces a rebuild before the
            # next force pass); per-step recomputation was measured at
            # ~1/3 of the dynamic stage glue (PERFORMANCE.md r4).
            mix = getattr(aux, "mix", None)
            if mix is None:
                mix = self._mixed_flags(fields, aux)
            if mix is not None:
                fields["mix"] = mix
        tabs = pack_tables(tables)
        i_arr = self._pack_i(fields)
        band = self._pack_band(fields)

        def run(sweep):
            out = self._sweep_call(spec, sweep, tabs, i_arr, band, aux)
            return out.reshape(n, 8)

        rho = state.rho
        if spec.rhosum_every > 0:
            from tpusph.ops import tile_physics
            out = run("rho")
            rho_sum = out[:, ORHO]
            if tile_physics.rho_self_in_kernel(spec):
                # scalar-folded cut_rho: the tile kernels already added
                # the self term to their output row (tile_physics.rho_self)
                total = rho_sum
            else:
                # self term W(0), per-type scalar (no per-row table
                # gather); x m_i per term for mass summation, or once over
                # the whole sum for the multiphase number-density form
                w_fn = kernels.kernel_w(spec.kernel, spec.dim)
                sm = 1.0 if spec.rhosum_nd else state.rmass
                w0 = jnp.zeros(n, jnp.float32)
                for t in range(1, self.ntypes + 1):
                    cut_t = tables.cut_rho[t, t]
                    w0_t = jnp.where(cut_t > 0.0,
                                     w_fn(jnp.zeros(()),
                                          jnp.maximum(cut_t, 1e-30)), 0.0)
                    w0 = w0 + jnp.where(state.type == t, sm * w0_t, 0.0)
                total = rho_sum + w0
            if spec.rhosum_nd:
                total = total * state.rmass
            recompute = (jnp.asarray(istep) % spec.rhosum_every) == 0
            rho = jnp.where(recompute & alive, total, rho)
            if halo is not None:
                rho = halo(rho)
            fields["rho"] = rho
            i_arr, band = self._update_rows(i_arr, band, fields, (RRHO,))

        if spec.surface_tension:
            out = run("cgrad")
            cg0 = jnp.where(alive, out[:, OCGX], 0.0)
            cg1 = jnp.where(alive, out[:, OCGY], 0.0)
            cg2 = jnp.where(alive, out[:, ODE], 0.0)
            if halo is not None:
                cgs = halo(jnp.stack([cg0, cg1, cg2], axis=1))
                cg0, cg1, cg2 = cgs[:, 0], cgs[:, 1], cgs[:, 2]
            fields["cg0"], fields["cg1"], fields["cg2"] = cg0, cg1, cg2
            i_arr, band = self._update_rows(i_arr, band, fields,
                                            (RCGX, RCGY, RCGZ))

        out = run("force")
        f = out[:, OFX:OFZ + 1]    # rows 0:3 are contiguous: one slice
        upd = dict(
            rho=rho,
            f=jnp.where(alive[:, None], f, 0.0),
            drho=jnp.where(alive, out[:, ODRHO], 0.0),
            de=jnp.where(alive, out[:, ODE], 0.0),
        )
        if spec.virial:
            from tpusph.ops.pallas_pair import OVIR
            upd["vir"] = jnp.where(alive, out[:, OVIR], 0.0)
        state = dataclasses.replace(state, **upd)
        if spec.gravity:
            gmask = (state.alive & state.mobile)[:, None]
            state = dataclasses.replace(
                state,
                f=state.f + jnp.where(
                    gmask, state.rmass[:, None] * tables.gravity[None, :],
                    0.0))
        return state
