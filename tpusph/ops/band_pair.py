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
    RCV, OFX, OFY, OFZ, ODRHO, ODE, ORHO, OCGX, OCGY,
    _TABLES_1D, _TABLES_2D, _onehot, _onehot_t, pack_tables,
)
from tpusph.params import PairTables, PhysicsSpec
from tpusph.state import Box, ParticleState


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
    """Ordered F_ROWS field arrays ((n_slots,) each) per the R* row ids."""
    n = fields["x0"].shape[0]
    z = jnp.zeros(n, jnp.float32)
    cols = [fields["x0"], fields["x1"], fields["x2"],
            fields["v0"], fields["v1"], fields["v2"],
            fields["rho"], fields["e"], fields["m"], fields["type_f"],
            fields.get("cg0", z), fields.get("cg1", z), fields.get("cg2", z),
            fields["cv"]]
    cols += [z] * (F_ROWS - len(cols))
    return cols


def pack_i(fields: dict, geom: BandGeometry) -> jax.Array:
    """(ncols, ngroups, G*c, F): the i-tiles. Pure reshape+stack."""
    cols = _field_list(fields)
    arr = jnp.stack(cols, axis=1)   # (n_slots, F)
    return arr.reshape(geom.ncols, geom.ngroups, geom.gc, F_ROWS)


def pack_band(fields: dict, geom: BandGeometry) -> jax.Array:
    """(ncols + 1, ngroups, F, W): per (column, group), the group's j-window
    = [group - k sub-cells, group + G + k sub-cells) pre-gathered into the
    lane axis (+ zero pad to W_pad, + an all-dead sentinel column for
    non-periodic plane edges). Periodic column axis: the wrap margins get
    the box-length image shift applied to the column-axis coordinate row;
    non-periodic: the outside margins are killed (type row zeroed)."""
    kc = geom.k * geom.c
    g_idx = jnp.arange(geom.ngroups)
    col_row = RZ if geom.dim == 3 else RY
    lz = geom.lengths[geom.col_axis]

    def band_one(f, row_id):
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
        pad = geom.w_pad - geom.w_real
        pieces = [lo, a, hi]
        if pad:
            pieces.append(jnp.zeros((geom.ncols, geom.ngroups, pad),
                                    jnp.float32))
        return jnp.concatenate(pieces, axis=-1)

    cols = _field_list(fields)
    band = jnp.stack([band_one(f, r) for r, f in enumerate(cols)], axis=2)
    sentinel = jnp.zeros((1,) + band.shape[1:], jnp.float32)
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
    Mirrors ops/pair_terms.py term by term (see module docstring); the
    hoisting of per-particle factors is the only structural difference from
    ops/pallas_pair.make_column_kernel."""
    gc = geom.gc
    W = geom.w_pad
    T1 = ntypes + 1
    offs = _neighbor_offsets(geom)
    dim3 = geom.dim == 3
    w_fn = kernels.kernel_w(spec.kernel, spec.dim)
    wfd_fn = kernels.kernel_wfd(spec.kernel, spec.dim)
    n_out = {"rho": 1, "cgrad": 3, "force": 5}[sweep]
    _ORDER = list(_TABLES_2D) + list(_TABLES_1D)

    def kernel(scal_ref, tabs_ref, i_ref, *refs):
        out_ref = refs[-1]
        band_refs = refs[:-1]
        cidx = pl.program_id(0)

        tabs2d = {}
        ti = 0
        for name in _TABLES_2D:
            tabs2d[name] = tabs_ref[ti * 8: ti * 8 + T1, :T1]
            ti += 1
        vec_cols = {}
        vec_rows = {}
        for name in _TABLES_1D:
            blk = tabs_ref[ti * 8: ti * 8 + 8, :]
            vec_cols[name] = blk[:T1, 0:1]     # (T1, 1)
            vec_rows[name] = blk[7:8, :T1]     # (1, T1)
            ti += 1

        i_tile = i_ref[0, 0]                   # (gc, F)

        def _body(i_tile):
            def icol(r):
                return i_tile[:, r:r + 1]       # (gc, 1)

            it = icol(RTYPE)
            oh_i = _onehot(i_tile[:, RTYPE], T1)          # (gc, T1)

            def ci_1d(name):
                if name in spec.scalar_tables:
                    return scal_ref[_ORDER.index(name)]
                return jnp.dot(oh_i, vec_cols[name],
                               preferred_element_type=jnp.float32)  # (gc,1)

            # ---- hoisted per-i quantities (sanitized for dead rows) ----
            alive_i = it > 0.5
            rho_i = jnp.where(alive_i, icol(RRHO), 1.0)
            m_i = jnp.where(alive_i, icol(RM), 1.0)
            e_i = icol(RE)
            inv_rho_i = 1.0 / rho_i
            hoist_i = {}
            if sweep == "force" and (spec.tait or spec.morris
                                     or spec.ideal_gas or spec.lj):
                hoist_i["fi"] = _eos_over_rhosq(
                    rho_i, e_i, m_i, ci_1d("rho0"), ci_1d("tait_b"),
                    ci_1d("gas_gamma"), spec)
                if spec.lj or (spec.ideal_gas and not spec.tait):
                    hoist_i["ci"] = _gas_sound_speed(
                        rho_i, e_i, m_i, ci_1d("gas_gamma"), spec)
                else:
                    hoist_i["ci"] = ci_1d("c0")
            if sweep == "force" and spec.surface_tension:
                cgx_i, cgy_i, cgz_i = icol(RCGX), icol(RCGY), icol(RCGZ)
                cg2_i = cgx_i * cgx_i + cgy_i * cgy_i + cgz_i * cgz_i
                inv_nr_i = 1.0 / (jnp.sqrt(jnp.maximum(cg2_i, 1e-12))
                                  * rho_i * rho_i)
                hoist_i["st"] = (cgx_i, cgy_i, cgz_i,
                                 cg2_i * inv_nr_i / spec.dim, inv_nr_i)
            if sweep == "cgrad":
                hoist_i["color"] = ci_1d("color")

            accs = [jnp.zeros((gc,), jnp.float32) for _ in range(n_out)]
            for kk, (ox, oy) in enumerate(offs):
                sx, sy = _plane_shift(geom, ox, oy, cidx)
                j_tile = band_refs[kk][0, 0]    # (F, W)
                parts = _part_sums(
                    i_tile, j_tile, (sx, sy), oh_i, ci_1d, hoist_i,
                    alive_i, rho_i, m_i, inv_rho_i)
                accs = [a + p for a, p in zip(accs, parts)]

            out_rows = {"rho": (ORHO,), "cgrad": (OCGX, OCGY, ODE),
                        "force": (OFX, OFY, OFZ, ODRHO, ODE)}[sweep]
            for row, acc in zip(out_rows, accs):
                out_ref[0, 0, :, row] = acc

        def _part_sums(i_tile, j_tile, shift, oh_i, ci_1d, hoist_i,
                       alive_i, rho_i, m_i, inv_rho_i):
            """Physics of one (gc x W) neighbor band; returns n_out (gc,)
            partial sums. Mirrors ops/pair_terms term by term."""
            def icol(r):
                return i_tile[:, r:r + 1]       # (gc, 1)

            def jrow(r):
                return j_tile[r, :][None, :]    # (1, W)

            oh_jt = _onehot_t(j_tile[RTYPE, :], T1)       # (T1, W)

            def c2d(name):
                if name in spec.scalar_tables:
                    return scal_ref[_ORDER.index(name)]
                return jnp.dot(
                    jnp.dot(oh_i, tabs2d[name],
                            preferred_element_type=jnp.float32),
                    oh_jt, preferred_element_type=jnp.float32)

            def cj_1d(name):
                if name in spec.scalar_tables:
                    return scal_ref[_ORDER.index(name)]
                return jnp.dot(vec_rows[name], oh_jt,
                               preferred_element_type=jnp.float32)  # (1, W)

            sx, sy = shift
            # column-axis image shifts are baked into the band (pack_band);
            # sy is 0 in 2D (the y axis IS the column axis there)
            dx0 = icol(RX) - (jrow(RX) + sx)
            dx1 = icol(RY) - (jrow(RY) + sy)
            dx2 = icol(RZ) - jrow(RZ)
            rsq = dx0 * dx0 + dx1 * dx1 + dx2 * dx2
            jt = jrow(RTYPE)
            alive_j = jt > 0.5
            mask = (alive_i & alive_j) & (rsq > 1e-12)
            r = jnp.sqrt(jnp.maximum(rsq, 1e-30))
            m_j_raw = jrow(RM)

            # hoisted per-j quantities (sanitized)
            rho_j = jnp.where(alive_j, jrow(RRHO), 1.0)
            m_j = jnp.where(alive_j, m_j_raw, 1.0)
            inv_rho_j = 1.0 / rho_j
            e_j = jrow(RE)

            _ctx = {}

            def term_ctx(cut_name):
                key = "shared" if spec.shared_wfd else cut_name
                if key not in _ctx:
                    cut = c2d(cut_name)
                    live = mask & (rsq < cut * cut) & (cut > 0.0)
                    wfd = jnp.where(
                        live, wfd_fn(r, jnp.maximum(cut, 1e-30)), 0.0)
                    _ctx[key] = (cut, live, wfd)
                return _ctx[key]

            if sweep == "rho":
                cut = c2d("cut_rho")
                live = mask & (rsq < cut * cut) & (cut > 0.0)
                w = w_fn(r, jnp.maximum(cut, 1e-30))
                return (jnp.sum(jnp.where(live, m_j_raw * w, 0.0), axis=1),)

            if sweep == "cgrad":
                cut, live, wfd = term_ctx("cut_tension")
                coef = jnp.where(
                    live,
                    c2d("sigma") * (m_j * inv_rho_j)
                    * (cj_1d("color") - hoist_i["color"]) * wfd,
                    0.0)
                return (jnp.sum(coef * dx0, axis=1),
                        jnp.sum(coef * dx1, axis=1),
                        jnp.sum(coef * dx2, axis=1))

            # ---- force sweep ----
            f0 = f1 = f2 = drho = de = jnp.zeros((gc, W), jnp.float32)
            dv0 = icol(RVX) - jrow(RVX)
            dv1 = icol(RVY) - jrow(RVY)
            dv2 = icol(RVZ) - jrow(RVZ)
            dvdr = dv0 * dx0 + dv1 * dx1 + dv2 * dx2

            if spec.tait or spec.morris or spec.ideal_gas or spec.lj:
                cut, live, wfd = term_ctx("cut")
                fi = hoist_i["fi"]                       # (gc, 1) hoisted
                fj = _eos_over_rhosq(rho_j, e_j, m_j, cj_1d("rho0"),
                                     cj_1d("tait_b"), cj_1d("gas_gamma"),
                                     spec)               # (1, W) hoisted

                if spec.morris:
                    fvisc = jnp.where(
                        live,
                        (m_i * inv_rho_i) * (m_j * inv_rho_j)
                        * 2.0 * c2d("visc") * wfd,
                        0.0)
                    fpair = jnp.where(live, -m_i * m_j * (fi + fj) * wfd, 0.0)
                    f0 = f0 + fpair * dx0 + fvisc * dv0
                    f1 = f1 + fpair * dx1 + fvisc * dv1
                    f2 = f2 + fpair * dx2 + fvisc * dv2
                    dvsq = dv0 * dv0 + dv1 * dv1 + dv2 * dv2
                    de = de + jnp.where(
                        live, -0.5 * (fpair * dvdr + fvisc * dvsq), 0.0)
                else:
                    h_ij = jnp.maximum(cut, 1e-30)
                    mu = h_ij * dvdr / (rsq + 0.01 * h_ij * h_ij)
                    ci = hoist_i["ci"]                   # (gc, 1) hoisted
                    if spec.lj or (spec.ideal_gas and not spec.tait):
                        cj = _gas_sound_speed(rho_j, e_j, m_j,
                                              cj_1d("gas_gamma"), spec)
                    else:
                        cj = cj_1d("c0")
                    fvisc = jnp.where(
                        dvdr < 0.0,
                        -c2d("visc") * (ci + cj) * mu / (rho_i + rho_j),
                        0.0)
                    fpair = jnp.where(
                        live, -m_i * m_j * (fi + fj + fvisc) * wfd, 0.0)
                    f0 = f0 + fpair * dx0
                    f1 = f1 + fpair * dx1
                    f2 = f2 + fpair * dx2
                    de = de + jnp.where(live, -0.5 * fpair * dvdr, 0.0)

                if spec.continuity:
                    drho = drho + jnp.where(live, m_j_raw * dvdr * wfd, 0.0)

            if spec.heatconduction or spec.heat_phasechange:
                cut, live, wfd = term_ctx("cut_heat")
                # (rho_i+rho_j)/(rho_i*rho_j) == 1/rho_i + 1/rho_j: one
                # division hoisted per side instead of one per pair
                coef = (2.0 * m_i * m_j / (m_i + m_j)) * \
                    (inv_rho_i + inv_rho_j)
                ediff = icol(RE) - e_j
                if spec.heat_phasechange:
                    # tsat > 0 pairs conduct against cv_i*T_sat (interface
                    # pinning — pair_terms.py is the statement of record)
                    tsat = c2d("tsat")
                    ediff = jnp.where(tsat > 0.0,
                                      icol(RE) - icol(RCV) * tsat, ediff)
                de = de + jnp.where(
                    live, coef * c2d("heat_D") * ediff * wfd, 0.0)

            if spec.surface_tension:
                cut, live, wfd = term_ctx("cut_tension")
                coef = jnp.where(live, m_i * m_j * wfd, 0.0)
                cgx_i, cgy_i, cgz_i, a_i, b_i = hoist_i["st"]
                cgx_j = jrow(RCGX)
                cgy_j = jrow(RCGY)
                cgz_j = jrow(RCGZ)
                cg2_j = cgx_j * cgx_j + cgy_j * cgy_j + cgz_j * cgz_j
                inv_nr_j = 1.0 / (jnp.sqrt(jnp.maximum(cg2_j, 1e-12))
                                  * rho_j * rho_j)
                a_j = cg2_j * inv_nr_j / spec.dim

                cdi = (cgx_i * dx0 + cgy_i * dx1 + cgz_i * dx2) * b_i
                cdj = (cgx_j * dx0 + cgy_j * dx1 + cgz_j * dx2) * inv_nr_j
                f0 = f0 + coef * ((a_i + a_j) * dx0 - cdi * cgx_i - cdj * cgx_j)
                f1 = f1 + coef * ((a_i + a_j) * dx1 - cdi * cgy_i - cdj * cgy_j)
                f2 = f2 + coef * ((a_i + a_j) * dx2 - cdi * cgz_i - cdj * cgz_j)

            return (jnp.sum(f0, axis=1), jnp.sum(f1, axis=1),
                    jnp.sum(f2, axis=1), jnp.sum(drho, axis=1),
                    jnp.sum(de, axis=1))

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


def _eos_over_rhosq(rho, e, rmass, rho0, b, gamma, spec: PhysicsSpec):
    """p/rho^2 per particle — hoisted EOS, mirrors
    pair_terms.eos_pressure_over_rhosq forms."""
    if spec.lj:
        from tpusph.ops import pair_terms as _pt
        t = (gamma - 1.0) * e / rmass
        denom = jnp.maximum(1.0 - _pt.LJ_VDW_B * rho, _pt.LJ_DENOM_FLOOR)
        p = rho * t / denom - _pt.LJ_VDW_A * rho * rho
    elif spec.ideal_gas and not spec.tait:
        p = (gamma - 1.0) * rho * e / rmass
    else:
        q = rho / rho0
        q3 = q * q * q
        p = b * (q3 * q3 * q - 1.0)
    return p / (rho * rho)


def _gas_sound_speed(rho, e, rmass, gamma, spec: PhysicsSpec):
    if spec.lj:
        from tpusph.ops.pair_terms import lj_sound_speed
        return lj_sound_speed(rho, e, rmass, gamma)
    return jnp.sqrt(jnp.maximum(gamma * (gamma - 1.0) * e / rmass, 0.0))


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
                    spec: PhysicsSpec, box: Box, aux, istep):
        geom = self.geom
        n = geom.n_slots
        alive = state.alive
        fields = _state_fields(state)
        tabs = pack_tables(tables)

        def run(sweep):
            i_arr = pack_i(fields, geom)
            band = pack_band(fields, geom)
            out = self._call(spec, sweep)(tabs, i_arr, band)
            return out.reshape(n, 8)

        rho = state.rho
        if spec.rhosum_every > 0:
            out = run("rho")
            rho_sum = out[:, ORHO]
            # self term m_i W(0), per-type scalar (no per-row table gather)
            w_fn = kernels.kernel_w(spec.kernel, spec.dim)
            w0 = jnp.zeros(n, jnp.float32)
            for t in range(1, self.ntypes + 1):
                cut_t = tables.cut_rho[t, t]
                w0_t = jnp.where(cut_t > 0.0,
                                 w_fn(jnp.zeros(()),
                                      jnp.maximum(cut_t, 1e-30)), 0.0)
                w0 = w0 + jnp.where(state.type == t, state.rmass * w0_t, 0.0)
            recompute = (jnp.asarray(istep) % spec.rhosum_every) == 0
            rho = jnp.where(recompute & alive, rho_sum + w0, rho)
            fields["rho"] = rho

        if spec.surface_tension:
            out = run("cgrad")
            fields["cg0"] = jnp.where(alive, out[:, OCGX], 0.0)
            fields["cg1"] = jnp.where(alive, out[:, OCGY], 0.0)
            fields["cg2"] = jnp.where(alive, out[:, ODE], 0.0)

        out = run("force")
        f = jnp.stack([out[:, OFX], out[:, OFY], out[:, OFZ]], axis=1)
        state = dataclasses.replace(
            state,
            rho=rho,
            f=jnp.where(alive[:, None], f, 0.0),
            drho=jnp.where(alive, out[:, ODRHO], 0.0),
            de=jnp.where(alive, out[:, ODE], 0.0),
        )
        if spec.gravity:
            gmask = (state.alive & state.mobile)[:, None]
            state = dataclasses.replace(
                state,
                f=state.f + jnp.where(
                    gmask, state.rmass[:, None] * tables.gravity[None, :],
                    0.0))
        return state
