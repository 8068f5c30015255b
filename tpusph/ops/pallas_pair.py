"""Fused Pallas TPU pair kernels over the sorted cell grid — the
speed-of-light path for the reference's pair-style inner loops
(SURVEY.md §2.11 item 1: one family of fused kernels replacing
pair_sph_taitwater[/morris], _idealgas, _heatconduction, _rhosum,
_colorgradient, _surfacetension).

Kernel shape (the "column kernel")
----------------------------------
Particles are sorted by cell id (tpusph.grid). Cells are grouped into
COLUMNS along the innermost grid axis (z in 3D, y in 2D), so a column's
particles occupy ONE contiguous lane range of a dense (ncols, F, ncz*cap)
cell-major array. Each Pallas program processes one column:

  - fetches its own column + the 8 (3D) / 2 (2D) xy-neighbor columns as
    pipelined VMEM blocks (automatic double-buffering via BlockSpec
    index maps — pure arithmetic on the program id, no gather tables);
  - loops over the column's cells; per cell the j-candidates are the
    z-triplet bands of each neighbor column, taken as dynamic VMEM slices
    (periodic wrap via modular slice starts + per-slice image shifts);
  - computes masked all-pairs physics on (cap, S*cap) f32 tiles — sublane
    dim cap, lane dim a multiple of 128: the VPU-native layout;
  - type-pair coefficients come from one-hot contractions on the MXU
    (integer gathers don't lower well in Mosaic);
  - per-particle sums are written to a (ncols, 8, ncz*cap) output block.

Vector components are unrolled into separate (cap, J) arrays — no
(..., 3)-trailing-dim tensors anywhere (lane-dim-3 layouts are pathological
on TPU). The physics matches ops/pair_terms.py term by term; the
equivalence tests enforce it against the XLA cell-grid/dense oracles.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusph import grid as gridlib
from tpusph import kernels
from tpusph.params import PairTables, PhysicsSpec
from tpusph.state import Box, ParticleState

# packed field rows (F = 16). Ordered so every row the rho / cgrad /
# vapor-neighbor sweeps read sits in the FIRST 8: those sweeps fetch a
# (8, W) window sub-block instead of the full (16, W) — half the window
# DMA per neighbor offset (the force sweep reads 14 of 16 and fetches all).
F_ROWS = 16
RX, RY, RZ = 0, 1, 2
RM = 3      # mass
RTYPE = 4   # type as f32 (0 = dead)
RRHO = 5
RSLOT = 6   # j-slot index as f32 (strip vapor-neighbor sweep: the argmin
#             target row; exact for pools < 2^24 slots)
RMIX = 7    # per-tile mixed-phase flag (strip cgrad sweep skip; i-tile only)
RVX, RVY, RVZ = 8, 9, 10
RE = 11
RCGX, RCGY, RCGZ = 12, 13, 14
RCV = 15    # per-particle heat capacity (heatconduction/phasechange pinning)
# output rows (8)
OFX, OFY, OFZ, ODRHO, ODE, ORHO, OCGX, OCGY = range(8)
OVIR = ORHO  # force sweep only: the rho row is free there; reused for the
#              per-particle pair virial when spec.virial


class ColumnGrid(NamedTuple):
    """Static column-kernel geometry derived from GridGeometry."""
    ncx: int
    ncy: int
    ncz: int          # cells per column (innermost axis)
    cap: int
    dim: int
    periodic: tuple
    lengths: tuple    # global box lengths (Lx, Ly, Lz)
    col_axis: int     # 2 in 3D, 1 in 2D

    @property
    def ncols(self) -> int:
        return self.ncx * self.ncy if self.dim == 3 else self.ncx

    @property
    def nnbr(self) -> int:
        return 9 if self.dim == 3 else 3

    @property
    def col_cap(self) -> int:
        return self.ncz * self.cap


def make_column_grid(geom: gridlib.GridGeometry, box: Box) -> ColumnGrid:
    ncx, ncy, ncz = geom.ncells
    L = tuple(float(v) for v in np.asarray(box.hi) - np.asarray(box.lo))
    if geom.dim == 3:
        return ColumnGrid(ncx, ncy, ncz, geom.cap, 3, geom.periodic, L, 2)
    # 2D: grid is (ncx, ncy, 1); columns run along y
    return ColumnGrid(ncx, 1, ncy, geom.cap, 2, geom.periodic, L, 1)


# --------------------------------------------------------------------------
# XLA-side packing: sorted rows -> dense (ncols, F, col_cap) cell-major array
# --------------------------------------------------------------------------

def pack_dense(state: ParticleState, data: gridlib.GridData, cg: ColumnGrid,
               cgrad=None):
    n = state.capacity
    flat_pos = data.cell_id * cg.cap + data.rank
    ok = state.alive & (data.rank < cg.cap) & \
        (data.cell_id < cg.ncols * cg.ncz)
    flat_pos = jnp.where(ok, flat_pos, cg.ncols * cg.col_cap)

    z = jnp.zeros(n)
    cols = [None] * F_ROWS
    cols[RX], cols[RY], cols[RZ] = state.x[:, 0], state.x[:, 1], state.x[:, 2]
    cols[RVX], cols[RVY], cols[RVZ] = (state.vest[:, 0], state.vest[:, 1],
                                       state.vest[:, 2])
    cols[RRHO], cols[RE], cols[RM] = state.rho, state.e, state.rmass
    cols[RTYPE] = state.type.astype(jnp.float32)
    if cgrad is not None:
        cols[RCGX], cols[RCGY], cols[RCGZ] = (cgrad[:, 0], cgrad[:, 1],
                                              cgrad[:, 2])
    else:
        cols[RCGX] = cols[RCGY] = cols[RCGZ] = z
    cols[RCV] = state.cv
    cols = [z if c is None else c for c in cols]
    packed_rows = jnp.stack(cols, axis=1)  # (n, F)

    dense = jnp.zeros((cg.ncols * cg.col_cap, F_ROWS), jnp.float32)
    dense = dense.at[flat_pos].set(
        jnp.where(ok[:, None], packed_rows, 0.0), mode="drop")
    # (ncols, ncz, F, cap): the per-cell page is selected by a LEADING-dim
    # dynamic index in the kernel (Mosaic allows that; dynamic LANE offsets
    # would need 128-multiple proofs)
    dense = dense.reshape(cg.ncols, cg.ncz, cg.cap, F_ROWS).transpose(0, 1, 3, 2)
    return dense, flat_pos, ok


def unpack_dense(out, flat_pos, ok, rows_wanted):
    """out: (ncols, ncz, 8, cap) -> per-sorted-row arrays for `rows_wanted`
    (list of output-row ids)."""
    ncols, ncz, _, cap = out.shape
    flat = out.transpose(0, 1, 3, 2).reshape(ncols * ncz * cap, 8)
    safe = jnp.where(ok, flat_pos, 0)
    per_row = flat[safe]
    outs = [jnp.where(ok, per_row[:, r], 0.0) for r in rows_wanted]
    return outs


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------

def _neighbor_offsets(cg: ColumnGrid):
    if cg.dim == 3:
        return [(ox, oy) for ox in (-1, 0, 1) for oy in (-1, 0, 1)]
    return [(ox, 0) for ox in (-1, 0, 1)]


def _col_index_map(cg: ColumnGrid, ox: int, oy: int):
    """Block index of the (ox, oy)-offset neighbor column; invalid neighbors
    (non-periodic edge) map to the sentinel column (index ncols)."""
    ncx, ncy = cg.ncx, cg.ncy
    px = cg.periodic[0]
    py = cg.periodic[1] if cg.dim == 3 else False

    def imap(c):
        if cg.dim == 3:
            cx = c // ncy
            cy = c % ncy
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
            nx = c + ox
            if px:
                nx = jax.lax.rem(nx + ncx, ncx)
            valid = jnp.logical_and(nx >= 0, nx < ncx)
            idx = nx
        return (jnp.where(valid, idx, cg.ncols), 0, 0, 0)

    return imap


def _col_shift(cg: ColumnGrid, ox: int, oy: int, c):
    """Per-neighbor-column x/y image shifts (traced scalars)."""
    if cg.dim == 3:
        cx = c // cg.ncy
        cy = c % cg.ncy
    else:
        cx = c
        cy = 0
    nx = cx + ox
    ny = cy + oy
    sx = jnp.where(nx < 0, -cg.lengths[0],
                   jnp.where(nx >= cg.ncx, cg.lengths[0], 0.0)) \
        if cg.periodic[0] else jnp.float32(0.0)
    axis_y_len = cg.lengths[1]
    py = cg.periodic[1] if cg.dim == 3 else False
    sy = jnp.where(ny < 0, -axis_y_len,
                   jnp.where(ny >= cg.ncy, axis_y_len, 0.0)) \
        if py else jnp.float32(0.0)
    # shift convention: j positions += shift brings the neighbor's particles
    # next to this column. A neighbor at nx = -1 lives physically at the far
    # +x end -> its particles must be shifted by -Lx.
    return sx, sy


def _onehot(t, ntypes1):
    """(n,) float type ids -> (n, ntypes1) one-hot (types are small ints)."""
    k = jax.lax.broadcasted_iota(jnp.int32, (t.shape[0], ntypes1), 1
                                 ).astype(jnp.float32)
    return (t[:, None] == k).astype(jnp.float32)


def _onehot_t(t, ntypes1):
    """(n,) float type ids -> (ntypes1, n) TRANSPOSED one-hot (built directly
    — a (n,1)->(1,n) transpose is a lane/sublane swap TPUs hate)."""
    k = jax.lax.broadcasted_iota(jnp.int32, (ntypes1, t.shape[0]), 0
                                 ).astype(jnp.float32)
    return (t[None, :] == k).astype(jnp.float32)


def make_column_kernel(cg: ColumnGrid, spec: PhysicsSpec, ntypes: int,
                       sweep: str, interpret: bool = False):
    """Build the pallas_call for one sweep: 'force' | 'rho' | 'cgrad'.

    The kernel accumulates per-neighbor-slice (cap, cap) partial sums —
    no lane-dim concatenation (Mosaic cannot register-cast non-128-aligned
    lane concats), scalar image shifts, small VMEM footprint.
    """
    cap = cg.cap
    ncz = cg.ncz
    T1 = ntypes + 1
    offs = _neighbor_offsets(cg)
    lz = cg.lengths[cg.col_axis]
    pz = cg.periodic[cg.col_axis]
    dim3 = cg.dim == 3
    w_fn = kernels.kernel_w(spec.kernel, spec.dim)
    wfd_fn = kernels.kernel_wfd(spec.kernel, spec.dim)

    n_out = {"rho": 1, "cgrad": 3, "force": 5}[sweep]
    if sweep == "force" and spec.virial:
        n_out += 1

    _ORDER = list(_TABLES_2D) + list(_TABLES_1D)

    def kernel(scal_ref, tabs_ref, *refs):
        out_ref = refs[-1]
        col_refs = refs[:-1]
        c = pl.program_id(0)
        center = col_refs[offs.index((0, 0))]

        # static table blocks (hoisted out of the cell loop by the compiler)
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

        def part_sums(i_tile, oh_i, ci_1d, j_tile, shift, zvalid):
            """Physics of one (cap_i x cap_j) neighbor slice; returns a
            tuple of n_out (cap,) partial sums. Mirrors
            ops/pair_terms.force_pair term by term."""

            def irow(r):
                return i_tile[r, :][:, None]              # (cap, 1)

            def jrow(r):
                return j_tile[r, :][None, :]              # (1, cap)

            oh_jt = _onehot_t(j_tile[RTYPE, :], T1)       # (T1, cap)

            def c2d(name):
                # scalar-table folding: a uniform table needs no MXU lookup
                if name in spec.scalar_tables:
                    return scal_ref[_ORDER.index(name)]   # SMEM scalar
                return jnp.dot(
                    jnp.dot(oh_i, tabs2d[name],
                            preferred_element_type=jnp.float32),
                    oh_jt, preferred_element_type=jnp.float32)

            def cj_1d(name):
                if name in spec.scalar_tables:
                    return scal_ref[_ORDER.index(name)]   # SMEM scalar
                return jnp.dot(vec_rows[name], oh_jt,
                               preferred_element_type=jnp.float32)  # (1, cap)

            sx, sy, sz = shift
            dx0 = irow(RX) - (jrow(RX) + sx)
            dx1 = irow(RY) - (jrow(RY) + sy)
            dx2 = irow(RZ) - (jrow(RZ) + sz)
            rsq = dx0 * dx0 + dx1 * dx1 + dx2 * dx2
            mask = ((irow(RTYPE) > 0.5) & (jrow(RTYPE) > 0.5)
                    & (rsq > 1e-12) & zvalid)
            r = jnp.sqrt(jnp.maximum(rsq, 1e-30))
            m_j = jrow(RM)

            # shared cutoff context: with spec.shared_wfd all active cutoffs
            # are one value, so live/wfd/sanitized fields are computed once
            _ctx_cache = {}

            def term_ctx(cut_name):
                key = "shared" if spec.shared_wfd else cut_name
                if key not in _ctx_cache:
                    cut = c2d(cut_name)
                    live = mask & (rsq < cut * cut) & (cut > 0.0)
                    wfd = jnp.where(
                        live, wfd_fn(r, jnp.maximum(cut, 1e-30)), 0.0)
                    rho_i = jnp.where(live, irow(RRHO), 1.0)
                    rho_j = jnp.where(live, jrow(RRHO), 1.0)
                    mi = jnp.where(live, irow(RM), 1.0)
                    mj = jnp.where(live, m_j, 1.0)
                    _ctx_cache[key] = (cut, live, wfd, rho_i, rho_j, mi, mj)
                return _ctx_cache[key]

            if sweep == "rho":
                cut = c2d("cut_rho")
                live = mask & (rsq < cut * cut) & (cut > 0.0)
                w = w_fn(r, jnp.maximum(cut, 1e-30))
                mass = 1.0 if spec.rhosum_nd else m_j
                return (jnp.sum(jnp.where(live, mass * w, 0.0), axis=1),)

            if sweep == "cgrad":
                cut = c2d("cut_tension")
                live = mask & (rsq < cut * cut) & (cut > 0.0)
                wfd = jnp.where(live, wfd_fn(r, jnp.maximum(cut, 1e-30)), 0.0)
                rho_j = jnp.where(live, jrow(RRHO), 1.0)
                coef = jnp.where(
                    live,
                    c2d("sigma") * (m_j / rho_j)
                    * (cj_1d("color") - ci_1d["color"]) * wfd,
                    0.0)
                return (jnp.sum(coef * dx0, axis=1),
                        jnp.sum(coef * dx1, axis=1),
                        jnp.sum(coef * dx2, axis=1))

            # ---- force sweep ----
            f0 = f1 = f2 = drho = de = jnp.zeros((cap, cap), jnp.float32)
            m_i = irow(RM)
            dv0 = irow(RVX) - jrow(RVX)
            dv1 = irow(RVY) - jrow(RVY)
            dv2 = irow(RVZ) - jrow(RVZ)
            dvdr = dv0 * dx0 + dv1 * dx1 + dv2 * dx2

            if spec.tait or spec.morris or spec.ideal_gas or spec.lj:
                cut, live, wfd, rho_i, rho_j, mi, mj = term_ctx("cut")

                def eos(rho, e, rmass, rho0, b, gamma):
                    if spec.lj:
                        # vdW-form LJ EOS (pair_terms.LJ_VDW_A/B)
                        from tpusph.ops import pair_terms as _pt
                        t = (gamma - 1.0) * e / rmass
                        denom = jnp.maximum(1.0 - _pt.LJ_VDW_B * rho,
                                            _pt.LJ_DENOM_FLOOR)
                        p = rho * t / denom - _pt.LJ_VDW_A * rho * rho
                    elif spec.ideal_gas and not spec.tait:
                        p = (gamma - 1.0) * rho * e / rmass
                    else:
                        q = rho / rho0
                        q3 = q * q * q
                        p = b * (q3 * q3 * q - 1.0)
                    return p / (rho * rho)

                fi = eos(rho_i, irow(RE), mi, ci_1d["rho0"],
                         ci_1d["tait_b"], ci_1d["gas_gamma"])
                fj = eos(rho_j, jrow(RE), mj, cj_1d("rho0"),
                         cj_1d("tait_b"), cj_1d("gas_gamma"))

                if spec.morris:
                    fvisc = jnp.where(
                        live,
                        mi * mj * 2.0 * c2d("visc") / (rho_i * rho_j) * wfd,
                        0.0)
                    fpair = jnp.where(live, -mi * mj * (fi + fj) * wfd, 0.0)
                    f0 = f0 + fpair * dx0 + fvisc * dv0
                    f1 = f1 + fpair * dx1 + fvisc * dv1
                    f2 = f2 + fpair * dx2 + fvisc * dv2
                    dvsq = dv0 * dv0 + dv1 * dv1 + dv2 * dv2
                    de = de + jnp.where(
                        live, -0.5 * (fpair * dvdr + fvisc * dvsq), 0.0)
                else:
                    h_ij = jnp.maximum(cut, 1e-30)
                    ci = ci_1d["c0"]
                    cj = cj_1d("c0")
                    if spec.lj:
                        from tpusph.ops.pair_terms import lj_sound_speed
                        gi = ci_1d["gas_gamma"]
                        gj = cj_1d("gas_gamma")
                        ci = lj_sound_speed(rho_i, irow(RE), mi, gi)
                        cj = lj_sound_speed(rho_j, jrow(RE), mj, gj)
                    elif spec.ideal_gas and not spec.tait:
                        gi = ci_1d["gas_gamma"]
                        gj = cj_1d("gas_gamma")
                        ci = jnp.sqrt(jnp.maximum(
                            gi * (gi - 1.0) * irow(RE) / mi, 0.0))
                        cj = jnp.sqrt(jnp.maximum(
                            gj * (gj - 1.0) * jrow(RE) / mj, 0.0))
                    # mu + Monaghan prefactor fused into ONE divide
                    fvisc = jnp.where(
                        dvdr < 0.0,
                        -c2d("visc") * (ci + cj) * h_ij * dvdr
                        / ((rsq + 0.01 * h_ij * h_ij) * (rho_i + rho_j)),
                        0.0)
                    fpair = jnp.where(
                        live, -mi * mj * (fi + fj + fvisc) * wfd, 0.0)
                    f0 = f0 + fpair * dx0
                    f1 = f1 + fpair * dx1
                    f2 = f2 + fpair * dx2
                    de = de + jnp.where(live, -0.5 * fpair * dvdr, 0.0)

                if spec.continuity:
                    drho = drho + jnp.where(live, m_j * dvdr * wfd, 0.0)

            if spec.heatconduction or spec.heat_phasechange:
                cut, live, wfd, rho_i, rho_j, mi, mj = term_ctx("cut_heat")
                coef = (2.0 * mi * mj / (mi + mj)) * \
                    ((rho_i + rho_j) / (rho_i * rho_j))
                ediff = irow(RE) - jrow(RE)
                if spec.heat_phasechange:
                    # tsat > 0 pairs conduct against cv_i*T_sat (interface
                    # pinning — pair_terms.py is the statement of record)
                    tsat = c2d("tsat")
                    ediff = jnp.where(tsat > 0.0,
                                      irow(RE) - irow(RCV) * tsat, ediff)
                de = de + jnp.where(
                    live, coef * c2d("heat_D") * ediff * wfd, 0.0)

            if spec.surface_tension:
                cut, live, wfd, rho_i, rho_j, mi, mj = term_ctx("cut_tension")
                coef = jnp.where(live, mi * mj * wfd, 0.0)

                def stress_dot_dx(c0, c1, c2, inv_r2):
                    cg2 = c0 * c0 + c1 * c1 + c2 * c2
                    norm = jnp.sqrt(jnp.maximum(cg2, 1e-12))
                    cdotdx = c0 * dx0 + c1 * dx1 + c2 * dx2
                    s0 = (cg2 * dx0 / spec.dim - cdotdx * c0) / norm
                    s1 = (cg2 * dx1 / spec.dim - cdotdx * c1) / norm
                    s2 = (cg2 * dx2 / spec.dim - cdotdx * c2) / norm
                    return s0 * inv_r2, s1 * inv_r2, s2 * inv_r2

                si = stress_dot_dx(irow(RCGX), irow(RCGY), irow(RCGZ),
                                   1.0 / (rho_i * rho_i))
                sj = stress_dot_dx(jrow(RCGX), jrow(RCGY), jrow(RCGZ),
                                   1.0 / (rho_j * rho_j))
                f0 = f0 + coef * (si[0] + sj[0])
                f1 = f1 + coef * (si[1] + sj[1])
                f2 = f2 + coef * (si[2] + sj[2])

            outs = (jnp.sum(f0, axis=1), jnp.sum(f1, axis=1),
                    jnp.sum(f2, axis=1), jnp.sum(drho, axis=1),
                    jnp.sum(de, axis=1))
            if spec.virial:
                # pair virial sum_j f_ij . r_ij over the accumulated tiles
                outs = outs + (jnp.sum(f0 * dx0 + f1 * dx1 + f2 * dx2,
                                       axis=1),)
            return outs

        def per_cell(cz, _):
            i_tile = center[0, cz]                        # (F, cap)
            # empty i-cell: nothing to compute or write (no alive particle
            # maps to this cell's output slots)
            @pl.when(jnp.any(i_tile[RTYPE, :] > 0.5))
            def _():
                _per_cell_body(cz, i_tile)
            return 0

        def _per_cell_body(cz, i_tile):
            oh_i = _onehot(i_tile[RTYPE, :], T1)          # (cap, T1)
            ci_1d = {name: (scal_ref[_ORDER.index(name)]  # SMEM scalar
                            if name in spec.scalar_tables else
                            jnp.dot(oh_i, vec_cols[name],
                                    preferred_element_type=jnp.float32))
                     for name in _TABLES_1D}              # (cap,1) or scalar

            accs = [jnp.zeros((cap,), jnp.float32) for _ in range(n_out)]
            for k, (ox, oy) in enumerate(offs):
                sx, sy = _col_shift(cg, ox, oy, c)
                for dz in (-1, 0, 1):
                    zz = cz + dz
                    if pz:
                        zzm = jax.lax.rem(zz + ncz, ncz)
                        zvalid = jnp.bool_(True)
                        sz = jnp.where(
                            zz < 0, -lz, jnp.where(zz >= ncz, lz, 0.0))
                    else:
                        zzm = jnp.clip(zz, 0, ncz - 1)
                        zvalid = jnp.logical_and(zz >= 0, zz < ncz)
                        sz = jnp.float32(0.0)
                    j_tile = col_refs[k][0, zzm]          # (F, cap)
                    # 3D: slice axis is z; 2D: slice axis is y, z unused
                    shift = (sx, sy, sz) if dim3 else (sx, sz, 0.0)
                    # NOTE: a per-slice lax.cond empty-skip was measured and
                    # REVERTED — the branch machinery costs ~2x on dense
                    # systems (27 conds/cell defeat Mosaic's pipelining).
                    # Sparse skipping only pays at cell granularity (below).
                    parts = part_sums(i_tile, oh_i, ci_1d, j_tile, shift,
                                      zvalid)
                    accs = [a + p for a, p in zip(accs, parts)]

            out_rows = {"rho": (ORHO,), "cgrad": (OCGX, OCGY, ODE),
                        "force": (OFX, OFY, OFZ, ODRHO, ODE)}[sweep]
            if sweep == "force" and spec.virial:
                out_rows = out_rows + (OVIR,)   # rho row free in force sweep
            for row, acc in zip(out_rows, accs):
                out_ref[0, cz, row] = acc

        jax.lax.fori_loop(0, ncz, per_cell, 0)

    # scalar fold values in SMEM, tables in VMEM
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)]
    for ox, oy in offs:
        in_specs.append(
            pl.BlockSpec((1, ncz, F_ROWS, cap),
                         index_map=_make_block_imap(cg, ox, oy),
                         memory_space=pltpu.VMEM))

    out_spec = pl.BlockSpec((1, ncz, 8, cap),
                            index_map=lambda c: (c, 0, 0, 0),
                            memory_space=pltpu.VMEM)

    def call(tabs, dense):
        scal, tab_mat = tabs
        args = [scal, tab_mat] + [dense] * len(offs)
        return pl.pallas_call(
            kernel,
            grid=(cg.ncols,),
            in_specs=in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((cg.ncols, cg.ncz, 8, cap),
                                           jnp.float32),
            compiler_params=pltpu.CompilerParams(
                # the unrolled 27-slice body needs more scoped VMEM than the
                # 16M default (v5e has 128M/core)
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*args)

    return call


def _make_block_imap(cg: ColumnGrid, ox: int, oy: int):
    base = _col_index_map(cg, ox, oy)

    def imap(c):
        return base(c)

    return imap


_TABLES_2D = ("cut", "visc", "heat_D", "cut_heat", "sigma", "cut_tension",
              "cut_rho", "tsat")
_TABLES_1D = ("rho0", "tait_b", "c0", "gas_gamma", "color")


def pack_tables(tables: PairTables) -> jnp.ndarray:
    """Stack all coefficient tables into ((n_tabs)*8, 128) f32 — each table
    in an 8-row block (static sublane-aligned slicing in the kernel).
    1D tables are stored twice: as column 0 (for the i side) and as row 7
    (for the j side) so the kernel never transposes. Requires ntypes <= 6."""
    t1 = tables.ntypes + 1
    if t1 > 7:
        raise ValueError("pallas backend supports at most 6 particle types")
    blocks = []
    for name in _TABLES_2D:
        mat = jnp.zeros((8, 128), jnp.float32)
        mat = mat.at[:t1, :t1].set(jnp.asarray(getattr(tables, name),
                                               jnp.float32))
        blocks.append(mat)
    for name in _TABLES_1D:
        vec = jnp.asarray(getattr(tables, name), jnp.float32)
        mat = jnp.zeros((8, 128), jnp.float32)
        mat = mat.at[:t1, 0].set(vec)
        mat = mat.at[7, :t1].set(vec)
        blocks.append(mat)
    mat = jnp.concatenate(blocks, axis=0)
    scal = jnp.concatenate(
        [jnp.asarray(getattr(tables, n), jnp.float32)[1, 1][None]
         for n in _TABLES_2D]
        + [jnp.asarray(getattr(tables, n), jnp.float32)[1][None]
           for n in _TABLES_1D])
    return scal, mat


class PallasBackend:
    """Drop-in backend using the fused Pallas kernels for all three sweeps;
    grid lifecycle (init_aux / prepare) reuses CellGridBackend's logic via
    composition. Falls back to interpret mode off-TPU (tests)."""

    def __init__(self, geom: gridlib.GridGeometry, box: Box, ntypes: int,
                 rebuild_every: int = 0, interpret: bool | None = None):
        from tpusph.ops.cellgrid import CellGridBackend
        self.geom = geom
        self._cells = CellGridBackend(geom, rebuild_every=rebuild_every)
        self.colgrid = make_column_grid(geom, box)
        if interpret is None:
            interpret = jax.default_backend() != "tpu"
        self.interpret = interpret
        self.ntypes = ntypes
        self._calls = {}

    # grid lifecycle delegates
    def init_aux(self, state, box):
        return self._cells.init_aux(state, box)

    def prepare(self, state, aux, istep, box):
        return self._cells.prepare(state, aux, istep, box)

    def _call(self, spec: PhysicsSpec, sweep: str):
        key = (spec, sweep)
        if key not in self._calls:
            self._calls[key] = make_column_kernel(
                self.colgrid, spec, self.ntypes, sweep,
                interpret=self.interpret)
        return self._calls[key]

    def _sweep(self, state, tables, spec, box, aux, sweep, cgrad=None,
               rows=(OFX,)):
        # append a sentinel (all-dead) column for invalid edge neighbors
        dense, flat_pos, ok = pack_dense(state, aux, self.colgrid, cgrad=cgrad)
        sentinel = jnp.zeros((1,) + dense.shape[1:], jnp.float32)
        dense = jnp.concatenate([dense, sentinel], axis=0)
        tabs = pack_tables(tables)
        out = self._call(spec, sweep)(tabs, dense)
        return unpack_dense(out, flat_pos, ok, rows)

    def rho_summation(self, state, tables, spec, box, aux, **_):
        (rho,) = self._sweep(state, tables, spec, box, aux, "rho",
                             rows=(ORHO,))
        self_cut = tables.cut_rho[state.type, state.type]
        w0 = kernels.kernel_w(spec.kernel, spec.dim)(
            jnp.zeros_like(self_cut), jnp.maximum(self_cut, 1e-30))
        sm = 1.0 if spec.rhosum_nd else state.rmass
        rho = rho + jnp.where(state.alive & (self_cut > 0.0), sm * w0, 0.0)
        if spec.rhosum_nd:
            rho = rho * state.rmass
        return jnp.where(state.alive, rho, state.rho)

    def color_gradient(self, state, tables, spec, box, aux, **_):
        cgx, cgy, cgz = self._sweep(state, tables, spec, box, aux, "cgrad",
                                    rows=(OCGX, OCGY, ODE))
        cg = jnp.stack([cgx, cgy, cgz], axis=1)
        return jnp.where(state.alive[:, None], cg, 0.0)

    def force(self, state, tables, spec, box, aux, cg=None, **_):
        if spec.surface_tension and cg is None:
            cg = self.color_gradient(state, tables, spec, box, aux)
        rows = (OFX, OFY, OFZ, ODRHO, ODE)
        if spec.virial:
            rows = rows + (OVIR,)
        out = self._sweep(state, tables, spec, box, aux, "force", cgrad=cg,
                          rows=rows)
        fx, fy, fz, drho, de = out[:5]
        f = jnp.stack([fx, fy, fz], axis=1)
        alive = state.alive
        outs = (jnp.where(alive[:, None], f, 0.0),
                jnp.where(alive, drho, 0.0),
                jnp.where(alive, de, 0.0))
        if spec.virial:
            outs = outs + (jnp.where(alive, out[5], 0.0),)
        return outs

    def vapor_neighbor(self, state, box, vtype, cut, aux):
        return self._cells.vapor_neighbor(state, box, vtype, cut, aux)

    # -- fused force stage (single-device fast path) -------------------------

    def force_stage(self, state, tables, spec: PhysicsSpec, box, aux, istep):
        """The whole force stage with ONE pack and dense-to-dense rho / cg
        patches: the sweep kernels' outputs are already in the dense cell
        layout, so refreshed rho and color-gradient rows are copied straight
        into the packed input of the next kernel — no per-sweep scatters
        (XLA TPU scatters cost ~100 ns/row; this saves two of three).

        The dist path keeps the separate per-sweep methods (it must halo-
        refresh rho/cg between kernels)."""
        cg = self.colgrid
        dense, flat_pos, ok = pack_dense(state, aux, cg)
        sentinel = jnp.zeros((1,) + dense.shape[1:], jnp.float32)
        tabs = pack_tables(tables)

        def run(sweep, d):
            return self._call(spec, sweep)(
                tabs, jnp.concatenate([d, sentinel], axis=0))

        rho_state = state.rho
        if spec.rhosum_every > 0:
            out = run("rho", dense)
            rho_dense = out[:, :, ORHO, :]
            # self term m_i W(0): per-type scalar W0 selected densely
            type_dense = dense[:, :, RTYPE, :]
            m_dense = dense[:, :, RM, :]
            w_fn = kernels.kernel_w(spec.kernel, spec.dim)
            w0_sum = jnp.zeros_like(rho_dense)
            sm_dense = 1.0 if spec.rhosum_nd else m_dense
            for t in range(1, self.ntypes + 1):
                cut_t = tables.cut_rho[t, t]
                w0_t = jnp.where(cut_t > 0.0,
                                 w_fn(jnp.zeros(()), jnp.maximum(cut_t, 1e-30)),
                                 0.0)
                w0_sum = w0_sum + jnp.where(type_dense == t, sm_dense * w0_t,
                                            0.0)
            rho_dense = rho_dense + w0_sum
            if spec.rhosum_nd:
                rho_dense = rho_dense * m_dense
            recompute = (jnp.asarray(istep) % spec.rhosum_every) == 0
            old = dense[:, :, RRHO, :]
            alive_d = type_dense > 0.5
            new = jnp.where(recompute & alive_d, rho_dense, old)
            dense = dense.at[:, :, RRHO, :].set(new)
            # per-particle rho: slot order (col, z, rank) == flat_pos order
            safe = jnp.where(ok, flat_pos, 0)
            rho_state = jnp.where(ok, new.reshape(-1)[safe], state.rho)

        if spec.surface_tension:
            out = run("cgrad", dense)
            dense = dense.at[:, :, RCGX, :].set(out[:, :, OCGX, :])
            dense = dense.at[:, :, RCGY, :].set(out[:, :, OCGY, :])
            dense = dense.at[:, :, RCGZ, :].set(out[:, :, ODE, :])

        out = run("force", dense)
        rows = (OFX, OFY, OFZ, ODRHO, ODE)
        if spec.virial:
            rows = rows + (OVIR,)
        unpacked = unpack_dense(out, flat_pos, ok, rows)
        fx, fy, fz, drho, de = unpacked[:5]
        f = jnp.stack([fx, fy, fz], axis=1)
        alive = state.alive
        upd = dict(
            rho=rho_state,
            f=jnp.where(alive[:, None], f, 0.0),
            drho=jnp.where(alive, drho, 0.0),
            de=jnp.where(alive, de, 0.0),
        )
        if spec.virial:
            upd["vir"] = jnp.where(alive, unpacked[5], 0.0)
        state = dataclasses.replace(state, **upd)
        if spec.gravity:
            gmask = (state.alive & state.mobile)[:, None]
            state = dataclasses.replace(
                state,
                f=state.f + jnp.where(
                    gmask, state.rmass[:, None] * tables.gravity[None, :], 0.0))
        return state
