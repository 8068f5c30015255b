"""Strip Pallas TPU pair kernels over z-sorted dense columns — the
third-generation force path (same capability surface as ops/band_pair.py /
ops/pallas_pair.py: all SPH pair styles of SURVEY §2.2-2.3).

Why a third kernel shape
------------------------
Both earlier kernels bin particles into fixed-capacity cells, paying
(a) slot waste capacity/occupancy (~1.25-1.5x) and (b) a z-window quantized
to whole cells. The strip layout removes both:

1. **Dense z-sorted columns.** The plane (xy in 3D, x in 2D) is split into
   columns of side ~cutoff+skin, and particles are sorted by (column, z)
   with ONE u32-key sort at rebuild. Within a column, row rank IS z order —
   no per-cell capacity; dead slots only at the column tail.
2. **Rank-based j-windows.** An i-tile is TS=64 consecutive rows (a
   z-slab); its j-window in each of the 9 (3 in 2D) neighbor columns is
   the rank interval [TS*t - CH*mlo, TS*(t+1) + CH*mhi) — margins measured
   from the actual z-density at geometry-choice time so the window just
   covers cutoff+skin. Windows are built XLA-side from CH=32-row chunks
   via static rolls + stride-2 slices (no dynamic lane slicing, which
   Mosaic cannot do). A rebuild-time coverage check counts violations into
   the overflow counter (same surface-to-host contract as cell caps).
3. **Seam-ghost bands instead of wrapped windows.** A periodic column axis
   is handled by writing shifted copies of the seam particles into
   reserved head/tail bands of each column at rebuild (state rows with
   ``owned=False`` — the same ghost convention as the dist halo). The copy
   depth is 2x(cutoff+skin): the inner ghost shell (all any real particle
   ever sees) then has a complete neighborhood itself, so it evolves
   EXACTLY like its source between rebuilds by translation invariance; the
   outer shell's O(dt^2) drift reaches real particles only at O(dt^4) per
   step — far below f32 roundoff for any CFL-stable dt. This deletes every
   wrap special case from the window builder and the kernel.

Issued lane-ops per particle ~ 9 * 32*(mlo+2+mhi) ~ 2300 at the 1M bench
geometry vs ~4300 for the column kernel and ~5800 for the band.

The pair physics is ops/tile_physics.py (shared with the band kernel),
which mirrors ops/pair_terms.py term by term; equivalence tests
(tests/test_strip.py) enforce agreement with the cell-grid/dense oracles.

Reference analog: the sorted neighbor-bin machinery of src/neighbor.cpp +
the pair-style inner loops (SURVEY §2.5, §3.2 HOT #1), re-shaped for the
VPU's (8, 128) tiles instead of per-atom neighbor lists.
"""

from __future__ import annotations

import dataclasses
import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusph import grid as gridlib
from tpusph.ops.band_pair import (
    DEAD_X, BandBackend, _band_index_map, _neighbor_offsets, _plane_shift,
    _field_list, needs_rebuild,
)
from tpusph.ops.pallas_pair import (
    F_ROWS, RX, RY, RZ, RTYPE, RMIX, RSLOT,
    OFX, OFY, OFZ, ODRHO, ODE, ORHO, OCGX, OCGY,
)
from tpusph.params import PhysicsSpec
from tpusph.state import Box, ParticleState

TS = 64       # default i-tile rows (one z-slab of a column)
CH = 32       # default window chunk rows (window offsets are ch-aligned)


class StripGeometry(NamedTuple):
    """Static strip-kernel geometry (hashable, part of the jit cache key).
    Duck-types the BandGeometry fields _band_index_map/_plane_shift use
    (ncx, ncy, dim, periodic, lengths, ncols).

    ts/ch are chosen PER SYSTEM by choose_strip_geometry: issued window
    lanes quantize to 128 (vreg width), so smaller tiles with tight chunk
    margins can halve the per-particle lane cost (W 256 -> 128) whenever
    the measured rank margins fit — the r3 lane-cut lever
    (PERFORMANCE.md headroom #3)."""
    ncx: int
    ncy: int            # 1 in 2D
    col_cap: int        # slots per column, multiple of ts
    head: int           # reserved head rows (top-seam ghost band), ch-mult
    tail: int           # tail ghost budget rows (bottom-seam band), ch-mult
    mlo: int            # margin chunks (ch rows) below an i-tile's window
    mhi: int            # margin chunks above
    dim: int
    periodic: tuple     # box periodicity (3,)
    lengths: tuple      # global box lengths
    origin: tuple
    cell_xy: tuple      # column side along the plane axes
    margin_dist: float  # cutoff + skin the margins must cover
    skin: float
    ts: int = TS        # i-tile rows (sublane dim; multiple of 8)
    ch: int = CH        # window chunk rows (ch divides ts)
    # tiles per kernel program (fixed at geometry time: the per-rebuild
    # window-retarget tables are per BLOCK, so their shape is static)
    t_blk: int = 2

    @property
    def ncols(self) -> int:
        return self.ncx * self.ncy if self.dim == 3 else self.ncx

    @property
    def col_axis(self) -> int:
        return 2 if self.dim == 3 else 1

    @property
    def ntiles(self) -> int:
        return self.col_cap // self.ts

    @property
    def n32(self) -> int:
        """Chunks per column (historic name; chunk = ch rows)."""
        return self.col_cap // self.ch

    @property
    def stride(self) -> int:
        """Window chunks per tile (ts // ch)."""
        return self.ts // self.ch

    @property
    def n_slots(self) -> int:
        return self.ncols * self.col_cap

    @property
    def w(self) -> int:
        return self.ch * (self.mlo + self.stride + self.mhi)

    @property
    def nblocks(self) -> int:
        return self.ntiles // self.t_blk

    @property
    def block_rows(self) -> int:
        return self.t_blk * self.ts

    @property
    def nnbr(self) -> int:
        return 9 if self.dim == 3 else 3

    @property
    def col_periodic(self) -> bool:
        return bool(self.periodic[self.col_axis])

    @property
    def ghost_depth(self) -> float:
        """Seam copy depth: 2x margin_dist (see module docstring §3)."""
        return 2.0 * self.margin_dist


# per-tile fixed kernel cost in lane-equivalents (see the chooser's cost
# model; measured v5e @1M r3: beta ~= 5.7 us/tile at ~0.31 ns/lane)
_TILE_FIXED_LANES = float(os.environ.get("TPUSPH_STRIP_TILE_FIXED", "18000"))

# Widest window the chooser will accept, in rows. This is a COST heuristic
# (lanes/slot = 9*W; VMEM is nowhere near binding — a (16, 1152) force
# block is 72KB/offset), not a hardware limit. r5 raised it from 640:
# a transient violation that needs W>640 used to ABANDON strip for the
# whole run (the 500k bubble-rise settling wave measured a 503-row
# shortfall -> fallback backends that are strictly slower, and whose
# column kernel crashed the remote Mosaic helper at cap=800); with the
# margin-decay path a temporarily-huge W shrinks back after the transient,
# so accepting it is strictly better than abandonment.
STRIP_W_CAP = int(os.environ.get("TPUSPH_STRIP_W_CAP", "1152"))

DEFAULT_TS_CH = ((64, 32), (64, 16), (64, 8), (48, 16), (48, 8),
                 (32, 16), (32, 8), (16, 16), (16, 8))


def pad_window_to_vreg(ts: int, ch: int, mlo: int, mhi: int,
                       nch: int) -> tuple[int, int]:
    """Grow the window margins to fill the whole vreg multiple. Issued
    lanes are ceil128(W) no matter what, so the rows between W and the
    next 128-multiple are FREE drift tolerance — and an exact-128 lane
    dim avoids Mosaic's padded-lane masking on every window op. ch always
    divides 128 (8/16/32), so the pad splits into whole chunks."""
    stride = ts // ch
    w = ch * (mlo + stride + mhi)
    target = -(-w // 128) * 128
    extra = (target - w) // ch
    add_lo = min(extra // 2, max(nch - mlo, 0))
    mlo += add_lo
    mhi = min(mhi + (extra - add_lo), nch)
    return mlo, mhi


def choose_strip_geometry(box: Box, cutoff: float, dim: int, skin: float,
                          x: np.ndarray | None = None,
                          headroom: float = 1.08,
                          candidates=DEFAULT_TS_CH,
                          plane_nc=None,
                          drift: float = 1.0,
                          extra_rows: tuple = (0, 0)) -> StripGeometry | None:
    """Host-side geometry choice from the MEASURED particle distribution:
    column capacity from per-column counts (+ seam-ghost bands), window
    margins from the exact per-particle rank distance to the farthest
    same-column neighbor within cutoff+skin. Returns None when the box
    can't strip — callers fall back to the band/column kernels.

    ``drift`` sizes the allowance for rank-reach growth BETWEEN geometry
    choices: margins get an extra ``drift * skin * rows_per_z`` rows per
    side. The snapshot-exact margins alone are violated within tens of
    steps on any thermally agitated system (each violation freezes a
    step block and repays the Mosaic compile), so the chooser must
    anticipate the motion the skin already licenses.

    ``extra_rows`` = (below, above) ABSOLUTE margin-row floors — violation
    recovery passes (old margin rows + measured shortfall + slack,
    GridData.margin_short), the true need observed at the violation, so
    one re-choice restores coverage with margins sized by evidence. A
    floor (max), not an addend: the fresh re-measure already captures the
    evolved state, and stacking the shortfall on top double-counts
    (measured W 256->512 on the 1M dynamic bench, halving throughput)."""
    if x is None or len(x) == 0:
        return None
    lo = np.asarray(box.lo, np.float64)
    hi = np.asarray(box.hi, np.float64)
    length = hi - lo
    side = cutoff + skin
    if side <= 0:
        return None
    col_axis = 2 if dim == 3 else 1
    plane_axes = (0, 1) if dim == 3 else (0,)
    nc = {a: max(int(length[a] // side), 1) for a in plane_axes}
    ncols = int(np.prod([nc[a] for a in plane_axes]))
    if ncols >= (1 << 12):
        return None  # u32 sort key budget: 12 column bits + 20 z bits
    lz = float(length[col_axis])
    col_per = bool(box.periodic[col_axis])
    depth = 2.0 * side
    if col_per and lz < 2.0 * depth * (1.0 - 1e-6):
        # ghost bands would overlap across the column (the equality case is
        # fine — bands adjacent; the epsilon absorbs f32 cutoff rounding)
        return None

    # Measurement positions mirror build_strips BIT-FOR-BIT: f32 wrap
    # (Box.wrap), then f32 floor/mod column binning (column_id). The
    # measured margins are only exact if the emulated slot map equals the
    # runtime one — binning unwrapped f64 positions puts edge particles in
    # different columns, which lands the emulated windows in different
    # blocks entirely (the delta tables amplify a 1-slot shift to a whole
    # block of window offset).
    x32 = np.asarray(x, np.float32)
    xw = x32.copy()
    for a in range(x32.shape[1]):
        if box.periodic[a]:
            la = np.float32(lo[a])
            xw[:, a] = la + np.mod(x32[:, a] - la, np.float32(length[a]))
    x = xw
    SLACK = int(os.environ.get('TPUSPH_STRIP_SLACK', '4'))
    # TPUSPH_STRIP_DEBUG=1: report per-candidate kill reasons when the
    # chooser returns None (both r4 production incidents — the 2M boiling
    # worker crash and the 500k bubble-rise fallback — were silent
    # all-candidates-dead outcomes of this loop)
    dbg = os.environ.get('TPUSPH_STRIP_DEBUG', '') == '1'
    kills: list = []
    offsets = ([(ox, oy) for ox in (-1, 0, 1) for oy in (-1, 0, 1)]
               if dim == 3 else [(ox, 0) for ox in (-1, 0, 1)])

    def ceil128(v):
        return -(-v // 128) * 128

    def measure_nc(nc):
        """Measure per-row extreme rank reach (lo_rank, hi_rank, q_rank)
        plus occupancy stats for ONE plane-column count choice."""
        cols = None
        for a in plane_axes:
            cell = np.float32(length[a] / nc[a])
            cc = np.floor((x[:, a] - np.float32(lo[a])) / cell
                          ).astype(np.int64)
            cc = cc % nc[a] if box.periodic[a] else np.clip(cc, 0,
                                                            nc[a] - 1)
            cols = cc if cols is None else cols * nc[a] + cc
        z = np.clip(x[:, col_axis] - np.float32(lo[col_axis]),
                    np.float32(0.0), np.float32(lz * (1 - 1e-7)))
        ncols = int(np.prod([nc[a] for a in plane_axes]))
        counts = np.bincount(cols, minlength=ncols)
        nb2 = nt2 = 0
        if col_per:
            # seam-ghost band sizes: particles within `depth` of each face
            # (f32 compares, same as build_strips' band fill)
            nb2 = int(np.bincount(cols[z < np.float32(depth)],
                                  minlength=ncols).max())
            nt2 = int(np.bincount(cols[z > np.float32(lz - depth)],
                                  minlength=ncols).max())

        # ---- exact CROSS-COLUMN rank margins (RANK space) ---------------
        # A rank window indexed by i's tile must cover [z_i-side, z_i+side]
        # in every NEIGHBOR column's slot space, whose z->slot map differs
        # from the home column's wherever densities differ. Measured
        # exactly (every row): build the rank-space layout (ghost bands
        # included) and searchsorted every (i, neighbor-column) pair,
        # keeping per-row extreme rank reach. The per-candidate (ts, ch)
        # tile alignment is applied afterwards — the measurement itself is
        # tile-agnostic.
        order = np.lexsort((z, cols))
        kc, kz = cols[order], z[order]
        starts_r = np.concatenate([[0], np.cumsum(counts)])
        rank_r = np.arange(len(kz)) - starts_r[kc]
        ext_col = [kc]
        ext_z = [kz]
        ext_rank = [rank_r]
        if col_per:
            bot = kz < np.float32(depth)
            ext_col.append(kc[bot])
            ext_z.append(kz[bot] + lz)
            ext_rank.append(counts[kc[bot]] + rank_r[bot])
            top = kz > np.float32(lz - depth)
            ext_col.append(kc[top])
            ext_z.append(kz[top] - lz)
            ext_rank.append(-(counts[kc[top]] - rank_r[top]))
        ec = np.concatenate(ext_col)
        ez = np.concatenate(ext_z)
        er = np.concatenate(ext_rank).astype(np.float64)
        stride_key = 2.0 * lz + 2.0 * depth + 4.0
        eorder = np.argsort(ec * stride_key + ez, kind="stable")
        ec, ez, er = ec[eorder], ez[eorder], er[eorder]
        ekeys = ec * stride_key + ez
        # append a sentinel so searchsorted==len is addressable
        ec_s = np.concatenate([ec, [-1]])
        er_s = np.concatenate([er, [0.0]])

        if dim == 3:
            qcx, qcy = ec // nc[1], ec % nc[1]
        else:
            qcx, qcy = ec, np.zeros_like(ec)
        m_samp = len(ec)
        lo_ks, hi_ks = [], []    # PER-OFFSET reach (for delta emulation)
        col_valid, col_nbr = [], []   # per-column neighbor ids (for delta)
        cidx = np.arange(ncols)
        if dim == 3:
            ccx, ccy = cidx // nc[1], cidx % nc[1]
        else:
            ccx, ccy = cidx, np.zeros_like(cidx)
        for ox, oy in offsets:
            nx = qcx + ox
            ny = qcy + oy
            cnx = ccx + ox
            cny = ccy + oy
            if box.periodic[0]:
                nx = nx % nc[0]
                cnx = cnx % nc[0]
            if dim == 3 and box.periodic[1]:
                ny = ny % nc[1]
                cny = cny % nc[1]
            valid = (nx >= 0) & (nx < nc[0])
            cvalid = (cnx >= 0) & (cnx < nc[0])
            if dim == 3:
                valid &= (ny >= 0) & (ny < nc.get(1, 1))
                cvalid &= (cny >= 0) & (cny < nc.get(1, 1))
                ncq = nx * nc[1] + ny
                cnq = cnx * nc[1] + cny
            else:
                ncq = nx
                cnq = cnx
            ncq = np.where(valid, ncq, 0)
            col_nbr.append(np.where(cvalid, cnq, 0))
            col_valid.append(cvalid)
            # below: first neighbor slot with z >= z_i - side
            ilo = np.searchsorted(ekeys, ncq * stride_key + (ez - side))
            in_col = ec_s[ilo] == ncq
            lo_ks.append(np.where(in_col & valid, er_s[ilo],
                                  np.inf).astype(np.float32))
            # above: last neighbor slot with z <= z_i + side
            ihi = np.searchsorted(ekeys, ncq * stride_key + (ez + side),
                                  side="right") - 1
            in_col = ec_s[ihi] == ncq
            hi_ks.append(np.where(in_col & valid, er_s[ihi],
                                  -np.inf).astype(np.float32))
        # per-column contiguous rank range in the extended arrays
        colstart = np.searchsorted(ec, np.arange(ncols + 1))
        rmin = np.where(colstart[1:] > colstart[:-1],
                        er[np.minimum(colstart[:-1], m_samp - 1)], 0)
        rmax = np.where(colstart[1:] > colstart[:-1],
                        er[np.maximum(colstart[1:] - 1, 0)], 0)
        return dict(ec=ec, ez=ez, er=er, ekeys=ekeys, ec_s=ec_s, er_s=er_s,
                    stride_key=stride_key, lo_ks=lo_ks, hi_ks=hi_ks,
                    col_nbr=col_nbr, col_valid=col_valid,
                    colstart=colstart, rmin=rmin, rmax=rmax,
                    counts=counts, nb2=nb2, nt2=nt2, ncols=ncols)

    # ---- (column count) x (ts, ch) enumeration ---------------------------
    # Issued lanes quantize to 128-wide vregs: every window W in (128, 256]
    # costs 256 lanes. Two levers shrink W to ONE vreg: small tiles with
    # tight chunk margins, and COARSER plane columns — a column side
    # commensurate with the particle spacing equalizes per-column density
    # (the cross-column rank mismatch otherwise grows linearly with z and
    # blows the margins). Everything is MEASURED; min lane cost wins.
    # Margins keep >= SLACK rows of slack against runtime drift; the
    # rebuild-time coverage check backstops (overflow abort).
    nc0 = {a: max(int(length[a] // side), 1) for a in plane_axes}
    if plane_nc is not None:
        # forced column counts (dist mode: every brick must compile the
        # same program, so the lead brick's choice binds them all)
        nc_list = [{a: int(v) for a, v in zip(plane_axes, plane_nc)}]
    else:
        # pre-rank candidate column counts by a CHEAP mismatch proxy
        # (bincount only), then fully measure the best few: the proxy for
        # nc is the worst neighbor-pair margin need, margin_z*max_density
        # + |density difference|*lz (cross-column rank mismatch grows
        # linearly along the whole column)
        def proxy(nc):
            cols_p = None
            for a in plane_axes:
                cc = np.clip(((x[:, a] - lo[a]) / (length[a] / nc[a])
                              ).astype(np.int64), 0, nc[a] - 1)
                cols_p = cc if cols_p is None else cols_p * nc[a] + cc
            ncols_p = int(np.prod([nc[a] for a in plane_axes]))
            dens = np.bincount(cols_p, minlength=ncols_p) / max(lz, 1e-30)
            if dim == 3:
                d2 = dens.reshape(nc[0], nc[1])
            else:
                d2 = dens.reshape(nc[0], 1)
            worst = 0.0
            for ox in (-1, 0, 1):
                for oy in ((-1, 0, 1) if dim == 3 else (0,)):
                    dn = np.roll(np.roll(d2, ox, 0), oy, 1)
                    pair = side * np.maximum(d2, dn) + np.abs(d2 - dn) * lz
                    worst = max(worst, float(pair.max()))
            return worst

        lo_nc = {a: max(int(math.ceil(nc0[a] * 0.6)), 1) for a in plane_axes}
        opts = []
        for k in range(nc0[plane_axes[0]] - lo_nc[plane_axes[0]] + 1):
            nc = {a: max(nc0[a] - k, 1) for a in plane_axes}
            opts.append((proxy(nc), k, nc))
        opts.sort(key=lambda t: (t[0], t[1]))
        nc_list = [t[2] for t in opts[:4]]
        if nc0 not in nc_list:
            nc_list.append(dict(nc0))
    best = None
    seen_nc = set()
    for nc in nc_list:
        key_nc = tuple(sorted(nc.items()))
        if key_nc in seen_nc:
            continue
        seen_nc.add(key_nc)
        ncols = int(np.prod([nc[a] for a in plane_axes]))
        if ncols >= (1 << 12):
            continue  # u32 sort key budget: 12 column bits + 20 z bits
        M = measure_nc(nc)
        max_cnt = int(M["counts"].max())
        nb2, nt2 = M["nb2"], M["nt2"]
        er = M["er"]
        ec_i = M["ec"].astype(np.int64)
        noffs = len(offsets)
        tb_opts = []
        env_tb = int(os.environ.get("TPUSPH_STRIP_TBLK", "0"))
        for ts, ch in candidates:
            if env_tb:
                # hard pin for experiments: the pref path only ADDS the
                # env value as a candidate, and the cost model can still
                # out-vote it (head/tail round to blk multiples)
                tb_opts.append((ts, ch, env_tb))
                continue
            pref = _pref_t_blk(ts)
            for tb in {pref, max(pref // 2, 1), max(pref // 4, 1)}:
                tb_opts.append((ts, ch, tb))
        for ts, ch, t_blk in tb_opts:
            if ts % ch or ch > ts:
                continue
            B = ts * t_blk
            # lower-bound prune: even zero margins cannot beat the best
            # (cost model below: lanes + per-tile fixed cost, x per-program
            # overhead factor)
            if best is not None and \
                    (ceil128(ch * (2 + ts // ch)) + _TILE_FIXED_LANES / ts) \
                    * (1 + 6.0 / B) > best[0][0]:
                if dbg:
                    kills.append((ncols, ts, ch, B, "prune", 0, 0))
                continue
            head = int(math.ceil((nt2 * headroom + 4) / ch)) * ch \
                if col_per else 0
            tail = int(math.ceil((nb2 * headroom + 4) / ch)) * ch \
                if col_per else 0
            col_cap = int(math.ceil(
                (head + max_cnt * headroom + tail + ch) / B)) * B
            nblocks = col_cap // B
            # the delta tables are scalar-prefetched into SMEM (~1MB on
            # v5e): reject layouts whose PACKED table cannot fit. Entries
            # are block offsets clipped to (-nblocks, nblocks), packed
            # int8 x4 / int16 x2 per i32 word (_pack_delta) — at 2M the
            # unpacked i32 table was 1.15MB minimum and killed EVERY
            # candidate here (the r4 silent-fallback incident); packed it
            # is 287KB and the 2-4M binding scale strips again.
            smem_bytes = ncols * len(offsets) * nblocks \
                * (32 // _delta_pack(nblocks) // 8)
            if smem_bytes > 512 * 1024:
                if dbg:
                    kills.append((ncols, ts, ch, B, "smem", smem_bytes, 0))
                continue
            qslot = er + head
            tfloor = np.floor(qslot / ts) * ts

            # ---- emulate the per-rebuild delta tables for THIS layout ----
            # (mirrors build_strips: z at the clipped block-center slot,
            # neighbor rank at that z, rounded to blocks). Margins then
            # cover only the residual: local fluctuation + B/2 rounding.
            b_idx = np.arange(nblocks)
            rc = b_idx[None, :] * B + B // 2 - head          # rank space
            rc_c = np.clip(rc, M["rmin"][:, None], M["rmax"][:, None])
            pos = M["colstart"][:-1][:, None] + (rc_c - M["rmin"][:, None])
            pos = np.clip(pos, 0, len(M["ez"]) - 1).astype(np.int64)
            zc = M["ez"][pos]                                # (ncols, nb)
            blk_of = np.clip(((qslot) // B).astype(np.int64), 0, nblocks - 1)
            need_lo = 0.0
            need_hi = 0.0
            for k in range(noffs):
                ncq = M["col_nbr"][k][:, None]
                ilo = np.searchsorted(M["ekeys"],
                                      ncq * M["stride_key"] + zc)
                # clamp into the neighbor column's entry range: queries past
                # its z-extent must resolve to its edge rank, not fall out
                # (the runtime delta computation clamps the same way via
                # the +/-big slot fills)
                cs_n = M["colstart"][:-1][ncq[:, 0]][:, None]
                ce_n = M["colstart"][1:][ncq[:, 0]][:, None]
                ok = (ce_n > cs_n) & M["col_valid"][k][:, None]
                ilo = np.clip(ilo, cs_n, np.maximum(ce_n - 1, cs_n))
                r_nc = np.where(ok, M["er"][np.clip(ilo, 0, len(M["er"])
                                                    - 1)], rc_c)
                frac = (r_nc - rc_c) / B
                d = np.round(frac)
                # runtime rounding can flip near half-block boundaries
                # (f32 z vs this f64 emulation; z-quantization sort ties):
                # cover BOTH roundings for near-boundary blocks
                risky = np.abs(frac - np.floor(frac) - 0.5) < 0.1
                d_up = np.where(risky, np.floor(frac) + 1, d)
                d_dn = np.where(risky, np.floor(frac), d)

                def clipped(dv):
                    dv = np.clip(dv, -b_idx[None, :],
                                 nblocks - 1 - b_idx[None, :])
                    return np.where(M["col_valid"][k][:, None], dv, 0.0)

                ds_up = clipped(d_up)[ec_i, blk_of] * B
                ds_dn = clipped(d_dn)[ec_i, blk_of] * B
                need_lo = max(need_lo, float(np.max(
                    tfloor + ds_up - (M["lo_ks"][k] + head))))
                need_hi = max(need_hi, float(np.max(
                    (M["hi_ks"][k] + head) - (tfloor + ts - 1) - ds_dn)))
            need_lo = max(need_lo, 0.0)
            need_hi = max(need_hi, 0.0)
            # drift allowance: rank reach grows as particles use the motion
            # budget the skin licenses (and as an initial lattice mixes into
            # a fluid); without it the snapshot-exact margins violate within
            # tens of steps and every violation costs a frozen block + a
            # Mosaic recompile
            drift_rows = drift * skin * float(max_cnt) / max(lz, 1e-30)
            need_lo = max(need_lo + drift_rows, float(extra_rows[0]))
            need_hi = max(need_hi + drift_rows, float(extra_rows[1]))

            def chunks(need):
                nat = max(int(math.ceil(need / ch)), 1)
                # SLACK guards against knife-edge rounding of the MEASURED
                # margin; the drift allowance already cushions beyond it,
                # so only bump when drift does not subsume the slack —
                # otherwise a 56-row need at ch=8 pays a whole extra vreg
                if nat * ch - need < SLACK and drift_rows < SLACK:
                    nat += 1
                return nat

            nch = col_cap // ch
            mlo = min(chunks(need_lo), nch)
            mhi = min(chunks(need_hi), nch)
            w = ch * (mlo + ts // ch + mhi)
            if w > STRIP_W_CAP:
                if dbg:
                    kills.append((ncols, ts, ch, B, "wcap", w,
                                  (round(need_lo), round(need_hi))))
                continue
            # cost: issued lanes + the per-TILE fixed cost in lane
            # equivalents, x a per-program overhead factor (r2 data: 64-row
            # programs ran ~8% slower than 128-row ones). The fixed term is
            # MEASURED on v5e @1M: force stage 216 ms at (ts=64, W=256) vs
            # 503 ms at (ts=16, W=128) fits time/tile = alpha*ts*W + beta
            # with beta ~= 5.7 us/tile ~= 18k lane-equivalents — window
            # re-slicing + DMA issue per tile dwarfs the lane savings of
            # small tiles, so per-i-row cost is ceil128(W) + beta/ts.
            cost = (ceil128(w) + _TILE_FIXED_LANES / ts) * (1 + 6.0 / B)
            key = (cost, -ncols, -B, -ts, -ch)
            if best is None or key < best[0]:
                best = (key, dict(nc), ts, ch, head, tail, col_cap,
                        mlo, mhi, t_blk)
    if best is None:
        if dbg:
            print("choose_strip_geometry: no candidate survived; kills:")
            for row in kills:
                print("   ncols=%d ts=%d ch=%d B=%d %s %s %s" % row)
        return None  # density inhomogeneity too strong: band/column win
    _, nc, ts, ch, head, tail, col_cap, mlo, mhi, t_blk = best
    mlo, mhi = pad_window_to_vreg(ts, ch, mlo, mhi, col_cap // ch)

    if dim == 3:
        ncx, ncy = nc[0], nc[1]
        cell_xy = (length[0] / ncx, length[1] / ncy)
    else:
        ncx, ncy = nc[0], 1
        cell_xy = (length[0] / ncx, 0.0)
    return StripGeometry(
        ncx=int(ncx), ncy=int(ncy), col_cap=int(col_cap), head=int(head),
        tail=int(tail), mlo=mlo, mhi=mhi, dim=dim, periodic=box.periodic,
        lengths=tuple(float(v) for v in length),
        origin=tuple(float(v) for v in lo),
        cell_xy=tuple(float(v) for v in cell_xy),
        margin_dist=float(side), skin=float(skin), ts=int(ts), ch=int(ch),
        t_blk=int(t_blk))


# --------------------------------------------------------------------------
# rebuild: one u32 key sort into dense z-ordered columns + seam ghosts
# --------------------------------------------------------------------------

def _plane_neighbor_perm(geom: StripGeometry, ox: int, oy: int):
    """Host-side neighbor-column permutation for one plane offset:
    (perm (ncols,) int, valid (ncols,) bool). Mirrors _band_index_map."""
    cidx = np.arange(geom.ncols)
    if geom.dim == 3:
        cx, cy = cidx // geom.ncy, cidx % geom.ncy
        nx, ny = cx + ox, cy + oy
        if geom.periodic[0]:
            nx = nx % geom.ncx
        if geom.periodic[1]:
            ny = ny % geom.ncy
        valid = (nx >= 0) & (nx < geom.ncx) & (ny >= 0) & (ny < geom.ncy)
        perm = np.where(valid, nx * geom.ncy + ny, 0)
    else:
        nx = cidx + ox
        if geom.periodic[0]:
            nx = nx % geom.ncx
        valid = (nx >= 0) & (nx < geom.ncx)
        perm = np.where(valid, nx, 0)
    return perm, valid


def column_id(x: jax.Array, geom: StripGeometry):
    """(N, 3) positions -> (column id, z offset in [0, Lz))."""
    origin = jnp.asarray(geom.origin, jnp.float32)
    if geom.dim == 3:
        axes, ncs = (0, 1), (geom.ncx, geom.ncy)
        sizes = (geom.cell_xy[0], geom.cell_xy[1])
    else:
        axes, ncs = (0,), (geom.ncx,)
        sizes = (geom.cell_xy[0],)
    col = None
    for a, sz, n in zip(axes, sizes, ncs):
        cc = jnp.floor((x[:, a] - origin[a]) / sz).astype(jnp.int32)
        cc = jnp.mod(cc, n) if geom.periodic[a] else jnp.clip(cc, 0, n - 1)
        col = cc if col is None else col * n + cc
    ca = geom.col_axis
    lz = geom.lengths[ca]
    z = jnp.clip(x[:, ca] - origin[ca], 0.0, lz * (1.0 - 1e-7))
    return col, z


def build_strips(state: ParticleState, geom: StripGeometry, box: Box,
                 nbuilds=None, extra=None, keep_ghosts: bool = False,
                 return_seam: bool = False):
    """Sort owned particles into dense z-ordered columns (slot = col*cap +
    head + rank) and write the seam-ghost bands. The strip analog of
    grid.build; runs at rebuild cadence only. Positions wrap here
    (Domain::pbc semantics). Overflows (column fuller than its band, or a
    window that no longer covers cutoff+skin in z) are counted AND
    surfaced — never silently dropped.

    Movement strategy (TPU: arbitrary gathers/scatters cost ~15 ns/row, so
    14 per-field gathers + 3 scatter passes would dominate): carry every
    persistent field as a payload of the key sort, then PLACE rows with a
    second sort whose key is the explicit destination permutation (real
    row -> its slot, dead row -> the matching unused slot). f/drho/de are
    not persistent across a rebuild (the force stage recomputes them
    before final_integrate) and are zeroed instead of moved. Ghost bands
    are filled by a fixed-size gather/scatter over the static per-column
    ghost budget.

    Dist-mode extensions (strip-per-brick — r2 VERDICT #3): ``extra`` is a
    pytree of (n,)/(n, S) int32 marker arrays carried through both sorts
    (comm send/ghost bookkeeping, like grid.build's extra); ``keep_ghosts``
    sorts halo ghosts (owned=False) in as regular rows instead of dropping
    them; ``return_seam`` also returns the seam-band copy map
    (src (K,), dest (K,) with n = invalid, shift (K,)) so per-step comm can
    refresh seam copies of halo ghosts, which — unlike owned rows — do not
    self-evolve correctly between rebuilds."""
    n = state.capacity
    assert n == geom.n_slots, (n, geom.n_slots)
    cap = geom.col_cap
    head = geom.head
    ncols = geom.ncols
    ca = geom.col_axis
    lz = geom.lengths[ca]
    depth = geom.ghost_depth

    state = dataclasses.replace(state, x=box.wrap(state.x))
    # previous strip seam ghosts are dropped; in dist mode (keep_ghosts)
    # the caller already killed stale halo ghosts and merged fresh ones,
    # which must sort in as regular rows
    live = state.alive if keep_ghosts else (state.alive & state.owned)
    col, z = column_id(state.x, geom)
    zq = jnp.minimum((z * (float(1 << 20) / lz)).astype(jnp.uint32),
                     jnp.uint32((1 << 20) - 1))
    col_u = jnp.where(live, col, ncols).astype(jnp.uint32)
    key = col_u * jnp.uint32(1 << 20) + jnp.where(live, zq, 0)

    # ---- data movement: two 2-operand sorts + ONE wide row-gather --------
    # Carrying every persistent field as a lax.sort payload moves all ~21
    # operands through every bitonic merge stage (~10x the key sort's
    # traffic, measured ~1.7 s/rebuild at 1M); a row-gather moves each row
    # ONCE at ~15 ns/row regardless of width. So: sort (key, row) to rank,
    # sort (dest_slot, src_row) to place, then gather the packed (n, F)
    # field matrices by the composed permutation — the same fusion as
    # refresh_seam's (n, 8) copy (4x there).
    idx = jnp.arange(n, dtype=jnp.int32)
    key_s, perm1 = jax.lax.sort((key, idx), num_keys=1, is_stable=True)
    live_s = key_s < jnp.uint32(ncols) * jnp.uint32(1 << 20)
    col_s = jnp.minimum((key_s >> jnp.uint32(20)).astype(jnp.int32),
                        ncols - 1)

    # per-column counts WITHOUT an n-row scatter: col_s is sorted, so run
    # boundaries come from ncols binary searches, and per-row rank from a
    # run-start cummax (arbitrary n-row gathers cost ~15 ns/row on TPU)
    live_col = jnp.where(live_s, col_s, ncols)
    starts_c = jnp.searchsorted(live_col, jnp.arange(ncols + 1)
                                ).astype(jnp.int32)
    counts = starts_c[1:] - starts_c[:-1]
    budget = cap - head - geom.tail
    count_eff = jnp.minimum(counts, budget)
    overflow = jnp.sum(counts - count_eff)
    change = jnp.concatenate([
        jnp.ones(1, bool), live_col[1:] != live_col[:-1]])
    run_start = jax.lax.cummax(jnp.where(change, idx, 0))
    rank = idx - run_start
    ok = live_s & (rank < budget)
    slot = (col_s * cap + head + rank).astype(jnp.uint32)

    # destination permutation: dead/dropped rows take the unused slots in
    # ascending order (occupancy is a closed form — no scatter needed)
    pos_all = (idx % cap)
    count_rep = jnp.repeat(count_eff, cap, total_repeat_length=n)
    occ = (pos_all >= head) & (pos_all < head + count_rep)
    _, unused_sorted = jax.lax.sort(
        (occ.astype(jnp.uint32), idx), num_keys=1, is_stable=True)
    cumok = jnp.cumsum(ok.astype(jnp.int32))
    d = idx - cumok                      # ordinal among not-ok rows
    comp_dead = unused_sorted[jnp.clip(d, 0, n - 1)]
    comp = jnp.where(ok, slot, comp_dead.astype(jnp.uint32))

    # place: comp is a bijection (ok rows -> their slots, the rest -> the
    # unused slots in order), so sorting (comp, perm1) yields, for every
    # dest slot, its source row in ORIGINAL order — the composed
    # permutation, no intermediate gather needed.
    _, src0 = jax.lax.sort((comp, perm1), num_keys=1, is_stable=False)

    # packed field matrices, gathered ONCE by the composed permutation.
    # occ marks exactly the slots the ok rows land in (they fill
    # [head, head+count_eff) of each column bijectively), so the
    # dropped/dead-row type kill is a per-slot mask — no sorted-order
    # bookkeeping.
    fmat = jnp.concatenate(
        [state.x, state.v, state.vest,
         state.rho[:, None], state.e[:, None], state.cv[:, None],
         state.rmass[:, None], state.rho_c[:, None], state.e_c[:, None]],
        axis=1)[src0]
    imat = jnp.stack(
        [state.type, state.tag,
         state.owned.astype(jnp.int32), state.mobile.astype(jnp.int32)],
        axis=1)[src0]
    imat = imat.at[:, 0].set(jnp.where(occ, imat[:, 0], 0))
    # sentinel-fill dead slots BEFORE the seam copy (valid ghost-band rows
    # are then written over it): far positions make the kernels' distance
    # test the liveness test (tile_physics sentinel_dead); unit rho/cv/m
    # keep hoisted denominators finite (fmat columns: x 0:3, v 3:6,
    # vest 6:9, rho 9, e 10, cv 11, rmass 12, rho_c 13, e_c 14)
    dead_fill = jnp.array(
        [DEAD_X] * 3 + [0.0] * 6 + [1.0, 0.0, 1.0, 1.0, 0.0, 0.0],
        jnp.float32)
    fmat = jnp.where(occ[:, None], fmat, dead_fill[None, :])

    # extra marker columns (dist comm bookkeeping) take the same gather
    extra_out = None
    if extra is not None:
        extra_out = jax.tree_util.tree_map(lambda leaf: leaf[src0], extra)

    # ---- seam-ghost bands: ONE fused row copy per matrix -----------------
    # (18 narrow per-field gather/scatter pairs cost ~15 ns/row EACH; the
    # two (k, F) row ops below move the same data once)
    seam = (jnp.zeros(0, jnp.int32), jnp.zeros(0, jnp.int32),
            jnp.zeros(0, jnp.float32))
    if geom.col_periodic and (head or geom.tail):
        gb = head + geom.tail
        k = ncols * gb
        jj = jnp.arange(k, dtype=jnp.int32)
        gcol = jj // gb
        off = jj % gb
        cnt_k = count_eff[gcol]
        z_slot = fmat[:, ca] - geom.origin[ca]
        nb = jnp.zeros(ncols, jnp.int32).at[
            jnp.where(occ & (z_slot < depth), idx // cap, ncols)
        ].add(1, mode="drop")
        nt = jnp.zeros(ncols, jnp.int32).at[
            jnp.where(occ & (z_slot > lz - depth), idx // cap, ncols)
        ].add(1, mode="drop")
        is_top = off < head            # top band: slots [head-nt, head)
        dest = jnp.where(
            is_top,
            gcol * cap + off,
            gcol * cap + head + cnt_k + (off - head))
        src = jnp.where(is_top, dest + cnt_k, dest - cnt_k)
        valid = jnp.where(is_top,
                          off >= head - nt[gcol],
                          (off - head) < nb[gcol])
        # band capacity shortfalls are overflow (never silently dropped)
        overflow = overflow + jnp.sum(jnp.maximum(nt - head, 0))             + jnp.sum(jnp.maximum(nb - geom.tail, 0))
        src = jnp.clip(src, 0, n - 1)
        dest_w = jnp.where(valid, dest, n)
        shift = jnp.where(is_top, -lz, lz).astype(jnp.float32)

        g_f = fmat[src]
        g_f = g_f.at[:, ca].add(shift)          # x column-axis wrap image
        fmat = fmat.at[dest_w].set(g_f, mode="drop")
        g_i = imat[src]
        g_i = g_i.at[:, 2].set(0)               # ghost copies: owned=False
        imat = imat.at[dest_w].set(g_i, mode="drop")
        seam = (src, dest_w.astype(jnp.int32), shift)

    zeros3 = jnp.zeros((n, 3), jnp.float32)
    zn = jnp.zeros(n, jnp.float32)
    new_state = dataclasses.replace(
        state,
        x=fmat[:, 0:3], v=fmat[:, 3:6], vest=fmat[:, 6:9],
        rho=fmat[:, 9], e=fmat[:, 10], cv=fmat[:, 11], rmass=fmat[:, 12],
        rho_c=fmat[:, 13], e_c=fmat[:, 14],
        type=imat[:, 0], tag=imat[:, 1],
        owned=imat[:, 2] > 0, mobile=imat[:, 3] > 0,
        f=zeros3, drho=zn, de=zn, vir=zn)

    # ---- window-retarget tables (delta) ---------------------------------
    # Rank windows are indexed by the HOME tile; any cross-column density
    # difference (phase contrast, thermal noise, interface compression)
    # makes the same rank sit at a different z in the neighbor column —
    # growing linearly along the column for systematic differences. The
    # fix: per (column, neighbor, block) BLOCK offsets, recomputed at every
    # rebuild, scalar-prefetched by the kernels' window index maps, so each
    # fetched window is re-centered on the home block's z range. Margins
    # then only cover local fluctuation + the block-granularity rounding.
    zs = new_state.x[:, ca] - geom.origin[ca]
    alive_slot = new_state.alive
    big = jnp.float32(8.0 * lz + 8.0)
    stride = geom.stride
    B = geom.block_rows
    nblocks = geom.nblocks
    assert geom.ntiles % geom.t_blk == 0, (geom.ntiles, geom.t_blk)
    slot_pos = jnp.arange(n, dtype=jnp.int32) % cap
    # searchsorted-safe per-column z: live rows ascend by construction;
    # dead slots before the head band sit below everything, tail dead above
    zfill = jnp.where(slot_pos < head, -big, big)
    zcol = jnp.where(alive_slot, zs, zfill).reshape(ncols, cap)
    # z at the block-center slot, clipped into each column's live range —
    # the SAME center definition the geometry chooser emulates, so the
    # measured margins match the runtime offsets
    alive2 = alive_slot.reshape(ncols, cap)
    lo_live = jnp.argmax(alive2, axis=1)
    hi_live = cap - 1 - jnp.argmax(alive2[:, ::-1], axis=1)
    center_slot = jnp.arange(nblocks, dtype=jnp.int32) * B + B // 2
    cs = jnp.clip(center_slot[None, :], lo_live[:, None], hi_live[:, None])
    zc = jnp.take_along_axis(zcol, cs, axis=1)
    b_idx = jnp.arange(nblocks, dtype=jnp.int32)
    deltas = []
    for ox, oy in _neighbor_offsets(geom):
        perm, valid = _plane_neighbor_perm(geom, ox, oy)
        r_nc = jax.vmap(jnp.searchsorted)(zcol[jnp.asarray(perm)], zc)
        # delta is relative to the CLIPPED center slot (the actual home
        # slot of the queried z): the chooser emulates (r_nc - rc_c)/B in
        # rank space, which is exactly (r_nc - cs)/B shifted by head —
        # subtracting the unclipped center diverges on partially-filled
        # blocks by (center - cs)/B, far beyond the emulation's risky band
        d = jnp.round((r_nc - cs).astype(jnp.float32) / B).astype(jnp.int32)
        d = jnp.clip(d, -b_idx[None, :], nblocks - 1 - b_idx[None, :])
        deltas.append(jnp.where(jnp.asarray(valid)[:, None], d, 0))
    delta = jnp.stack(deltas, axis=1)    # (ncols, nnbr, nblocks)

    # --- window coverage check (the strip analog of the cell-cap bound) ---
    # The check is CROSS-COLUMN and rank-exact: a tile's delta-shifted rank
    # window [ts*t - ch*mlo + dB, ts*(t+1) + ch*mhi + dB) must contain every
    # neighbor-column slot whose z lies in [z_tile_min - ce, z_tile_max + ce].
    # searchsorted over the fill-padded per-column z gives the first/last
    # needed slot, so the SHORTFALL IN ROWS falls out for free — surfaced as
    # margin_short so a violation re-choice can size the new margins from
    # the measured overshoot instead of escalating a blind multiplier.
    zf = jnp.where(alive_slot, zs, big).reshape(ncols, geom.n32, geom.ch)
    zl = jnp.where(alive_slot, zs, -big).reshape(ncols, geom.n32, geom.ch)
    zfirst = jnp.min(zf, axis=2)     # (ncols, n32)
    zlast = jnp.max(zl, axis=2)
    t_idx = jnp.arange(geom.ntiles, dtype=jnp.int32)
    ce = geom.margin_dist
    tile_alive = zfirst[:, ::stride] < big * 0.5
    zf_self = zfirst[:, ::stride]                 # (ncols, ntiles) z extremes
    zl_self = zlast[:, stride - 1::stride]
    win_lo0 = t_idx[None, :] * geom.ts - geom.ch * geom.mlo
    win_hi0 = t_idx[None, :] * geom.ts + geom.ts - 1 + geom.ch * geom.mhi
    short_lo = jnp.zeros(zf_self.shape, jnp.int32)
    short_hi = jnp.zeros(zf_self.shape, jnp.int32)
    # unclipped worst need-minus-window (negative = slack in rows): the
    # margin-decay path (api._maybe_decay_margins) needs to SEE how much
    # of an escalated margin floor goes unused; margin_short clips at 0
    # and cannot distinguish "exactly covered" from "covered with 200
    # rows to spare"
    NO_NEED = jnp.int32(-(1 << 30))
    need_lo = jnp.full(zf_self.shape, NO_NEED, jnp.int32)
    need_hi = jnp.full(zf_self.shape, NO_NEED, jnp.int32)
    for kk, (ox, oy) in enumerate(_neighbor_offsets(geom)):
        perm, valid = _plane_neighbor_perm(geom, ox, oy)
        vmask = jnp.asarray(valid)[:, None] & tile_alive
        d_rows = jnp.repeat(delta[:, kk, :] * B, geom.t_blk, axis=1)
        zp = zcol[jnp.asarray(perm)]
        lo_need = jax.vmap(jnp.searchsorted)(zp, zf_self - ce
                                             ).astype(jnp.int32)
        hi_need = jax.vmap(
            lambda a, q: jnp.searchsorted(a, q, side="right"))(
                zp, zl_self + ce).astype(jnp.int32) - 1
        # Shortfall = number of NEEDED rows outside the window on each
        # side. Clamping the window edge into the needed band makes an
        # EMPTY needed range (hi_need < lo_need — empty or phase-separated
        # neighbor columns) yield <= 0 instead of a false violation, and
        # makes a window entirely past a band report the band's extent,
        # not the window-to-band distance (ADVICE r3).
        s_lo = jnp.minimum(win_lo0 + d_rows, hi_need + 1) - lo_need
        s_hi = hi_need - jnp.maximum(win_hi0 + d_rows, lo_need - 1)
        short_lo = jnp.maximum(short_lo, jnp.where(vmask, s_lo, 0))
        short_hi = jnp.maximum(short_hi, jnp.where(vmask, s_hi, 0))
        need_lo = jnp.maximum(need_lo, jnp.where(vmask, s_lo, NO_NEED))
        need_hi = jnp.maximum(need_hi, jnp.where(vmask, s_hi, NO_NEED))
    viol = jnp.sum(((short_lo > 0) | (short_hi > 0)).astype(jnp.int32))
    margin_short = jnp.stack([jnp.maximum(jnp.max(short_lo), 0),
                              jnp.maximum(jnp.max(short_hi), 0)])
    margin_need = jnp.stack([jnp.max(need_lo), jnp.max(need_hi)])
    overflow = (overflow + viol)[None]

    if nbuilds is None:
        nbuilds = jnp.zeros(1, jnp.int32)
    rows = jnp.arange(n, dtype=jnp.int32)
    data = gridlib.GridData(
        cell_id=jnp.where(new_state.alive, rows // cap, ncols),
        starts=jnp.arange(ncols + 1, dtype=jnp.int32) * cap,
        counts=counts,
        rank=rows % cap,
        x_ref=new_state.x,
        overflow=overflow,
        nbuilds=nbuilds + 1,
        delta=delta,
        seam_src=seam[0], seam_dest=seam[1], seam_shift=seam[2],
        margin_short=margin_short, margin_need=margin_need)
    ret = (new_state, data)
    if extra is not None:
        ret = ret + (extra_out,)
    if return_seam:
        ret = ret + (seam,)
    return ret


# --------------------------------------------------------------------------
# XLA-side packing: slot fields -> i-array and rank-window array
# --------------------------------------------------------------------------

def pack_i_strip(fields: dict, geom: StripGeometry) -> jax.Array:
    """(ncols, ntiles, ts, F): the i-tiles.

    Assembled FIELD-MAJOR first — (F, n_slots), minor dim n_slots, zero
    layout padding — then relayouted by ONE transpose. Stacking straight
    into the (..., ts, F) layout made XLA materialize every field as a
    separate (ncols, ntiles, ts, 1) temp in the kernel-facing T(8,128)
    tiling, where the minor dim F pads 16->128: ~10 live temps x 8-128x
    padding = 14.8GB of HLO scratch at 2M particles (measured OOM; the
    at-rest arguments were only 267MB). The kernel-facing layout itself
    keeps ts second-minor / F minor — tile_physics broadcasts i-columns
    (ts, 1) against j-rows (1, W), which needs i sublane-major."""
    cols = _field_list(fields)
    arr = jnp.stack(cols, axis=0)   # (F, n_slots): unpadded
    arr = jax.lax.optimization_barrier(arr)
    arr = arr.reshape(F_ROWS, geom.ncols, geom.ntiles, geom.ts)
    return jnp.moveaxis(arr, 0, 3)


def pack_window_strip(fields: dict, geom: StripGeometry) -> jax.Array:
    """(ncols + 1, ntiles, F, W): per (column, tile), the rank window
    [ts*t - ch*mlo, ts*(t+1) + ch*mhi) assembled lane-wise from ch-row
    chunks via static rolls + strided slices (window chunk stride*t+c is
    roll(-c)[::stride]). Out-of-column chunks are killed (type row zeroed)
    — the periodic seam is handled by the ghost bands, not by wrapping. A
    final all-dead sentinel column serves non-periodic plane edges."""
    cols = _field_list(fields)
    win = jnp.stack([window_row(f, r, geom) for r, f in enumerate(cols)],
                    axis=2)
    from tpusph.ops.band_pair import dead_lane_fill
    fill = jnp.array([dead_lane_fill(r) for r in range(F_ROWS)],
                     jnp.float32)
    sentinel = jnp.broadcast_to(fill[None, None, :, None],
                                (1,) + win.shape[1:])
    return jnp.concatenate([win, sentinel], axis=0)


def window_row(f, row_id: int, geom: StripGeometry) -> jax.Array:
    """One field row of the window array: (ncols, ntiles, W).

    One dead-filled PAD of the chunk axis replaces the per-piece roll of
    the earlier form: every window chunk is then a plain strided slice of
    the padded array, out-of-column chunks land on the pad (whose fill is
    the dead-lane contract — RX at the far sentinel so the distance test
    excludes them, rho/m/cv at 1 for safe denominators, type 0 for the
    vapor kernel's match), and no wrapped garbage ever enters the window
    (the periodic seam is handled by the ghost bands, not by wrapping)."""
    ncols, n32, ntiles = geom.ncols, geom.n32, geom.ntiles
    stride = geom.stride
    from tpusph.ops.band_pair import dead_lane_fill
    C = f.reshape(ncols, n32, geom.ch)
    P = jnp.pad(C, ((0, 0), (geom.mlo, geom.mhi), (0, 0)),
                constant_values=dead_lane_fill(row_id))
    pieces = []
    for k in range(geom.mlo + stride + geom.mhi):
        pieces.append(P[:, k::stride][:, :ntiles])
    return jnp.concatenate(pieces, axis=-1)


# --------------------------------------------------------------------------
# the kernel
# --------------------------------------------------------------------------

def _pref_t_blk(ts: int) -> int:
    """Tiles per program: amortizes per-program overhead (grid sequencing,
    DMA issue) over ~128 i-rows regardless of tile size. The chooser rounds
    col_cap so this divides ntiles. Override with TPUSPH_STRIP_TBLK. NEVER
    unroll the body — a t_blk-times unrolled body explodes Mosaic compile
    times; the kernels loop with lax.fori_loop instead (CLAUDE.md)."""
    env = int(__import__('os').environ.get('TPUSPH_STRIP_TBLK', '0'))
    if env:
        return env
    return max(128 // ts, 1)


def _delta_pack(nblocks: int) -> int:
    """Delta-table lanes per i32 SMEM word. Offsets are clipped to
    (-nblocks, nblocks) at build time, so int8 lanes (4/word) are exact
    whenever nblocks <= 120 (safety margin under +/-127); int16 (2/word)
    covers any realizable nblocks. Packing is what lets the table fit
    SMEM at the 2-4M binding scale — unpacked i32 it is >1MB there."""
    return 4 if nblocks <= 120 else 2


def _pack_delta(delta: jax.Array, nblocks: int) -> jax.Array:
    """Flatten + bit-pack the (ncols, nnbr, nblocks) i32 delta table into
    int8/int16 lanes of i32 words for SMEM prefetch (see _delta_pack).
    Lane bit-ranges are disjoint, so a sum assembles the word."""
    pack = _delta_pack(nblocks)
    flat = delta.reshape(-1).astype(jnp.int32)
    if pack == 1:
        return flat
    bits = 32 // pack
    pad = (-flat.shape[0]) % pack
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.int32)])
    lanes = flat.reshape(-1, pack) & jnp.int32((1 << bits) - 1)
    sh = jnp.arange(pack, dtype=jnp.int32) * bits
    return jnp.sum(lanes << sh[None, :], axis=1, dtype=jnp.int32)


def _delta_index_map(geom: StripGeometry, ox: int, oy: int, kk: int):
    """Window block index map with the per-(column, neighbor, block)
    retarget offset read from the scalar-prefetched delta table.

    The table is passed FLATTENED to 1D: Mosaic pads every minor dim of
    an SMEM-prefetched array (nnbr 9->16, nblocks->128), which inflated
    the (ncols, 9, nblocks) i32 table ~14x past the 1MB SMEM budget at
    1M particles (measured: u8[5120000] = 625x16x128x4 for a 360KB
    table). Flat, only the single trailing dim pads. Entries are further
    bit-packed (_pack_delta) — the scalar core unpacks with a shift+mask
    per block fetch, and the table shrinks 4x (2-4M fits SMEM)."""
    base = _band_index_map(geom, ox, oy)
    nblocks = geom.nblocks
    nnbr = len(_neighbor_offsets(geom))
    pack = _delta_pack(nblocks)
    bits = 32 // pack

    def imap(c, b, delta_ref):
        col, _, z0, z1 = base(c, b)
        idx = (c * nnbr + kk) * nblocks + b
        if pack == 1:
            off = delta_ref[idx]
        else:
            word = delta_ref[idx // pack]
            lane = jax.lax.shift_right_logical(
                word, ((idx % pack) * bits).astype(jnp.int32))
            lane = lane & jnp.int32((1 << bits) - 1)
            off = (lane ^ jnp.int32(1 << (bits - 1))) \
                - jnp.int32(1 << (bits - 1))
        bb = jnp.clip(b + off, 0, nblocks - 1)
        return (col, bb, z0, z1)

    return imap


def make_strip_kernel(geom: StripGeometry, spec: PhysicsSpec, ntypes: int,
                      sweep: str, interpret: bool = False):
    """pallas_call for one sweep over (ncols, ntiles) i-tiles; physics in
    ops/tile_physics.py (shared with the band kernel)."""
    from tpusph.ops import tile_physics

    W = geom.w
    ts = geom.ts
    T1 = ntypes + 1
    offs = _neighbor_offsets(geom)
    n_out = tile_physics.sweep_n_out(sweep, spec)
    t_blk = geom.t_blk

    def kernel(delta_ref, scal_ref, tabs_ref, i_ref, *refs):
        del delta_ref  # consumed by the window index maps
        out_ref = refs[-1]
        win_refs = refs[:-1]
        cidx = pl.program_id(0)
        tabs2d, vec_cols, vec_rows = tile_physics.unpack_tables(tabs_ref, T1)

        # loop (not unroll) the tiles of this program: the body compiles
        # once — a t_blk-times unrolled body made Mosaic compile times
        # explode. Dynamic indexing on the leading dims is allowed.
        def tile_body(tt, carry):
            i_tile = i_ref[0, tt]              # (ts, F)

            def _body(bspec=spec):
                lk = tile_physics.Lookups(scal_ref, tabs2d, vec_cols,
                                          vec_rows, bspec, T1)
                hoist = tile_physics.hoist_i(i_tile, lk, bspec, sweep,
                                             sentinel_dead=True)
                K = tile_physics.fold_width(W)
                accs = [jnp.zeros((ts, K), jnp.float32)
                        for _ in range(n_out)]
                for kk, (ox, oy) in enumerate(offs):
                    sx, sy = _plane_shift(geom, ox, oy, cidx)
                    j_tile = win_refs[kk][0, tt]   # (F, W)
                    parts = tile_physics.tile_part_sums(
                        i_tile, j_tile, (sx, sy), hoist, lk, bspec, sweep,
                        True, sentinel_dead=True)
                    accs = [a + p for a, p in zip(accs, parts)]

                out_rows = {"rho": (ORHO,), "cgrad": (OCGX, OCGY, ODE),
                            "force": (OFX, OFY, OFZ, ODRHO, ODE)}[sweep]
                if sweep == "force" and spec.virial:
                    out_rows = out_rows + (ORHO,)   # OVIR: rho row free here
                # the cross-lane tree runs ONCE per output per tile (the
                # per-window sums only fold — see tile_physics.fold_width)
                for row, acc in zip(out_rows, accs):
                    v = jnp.sum(acc, axis=1)
                    if sweep == "rho" and \
                            tile_physics.rho_self_in_kernel(spec):
                        # fold the rhosum self term here instead of an
                        # XLA pass over the pool (tile_physics.rho_self)
                        v = v + tile_physics.rho_self(i_tile, lk, spec)
                    out_ref[0, tt, :, row] = v

            alive_any = jnp.any(i_tile[:, RTYPE] > 0.5)
            if sweep == "cgrad":
                # single-phase neighborhoods have exactly-zero color
                # gradients: skip the window sweeps, write zeros (the out
                # block is uninitialized memory otherwise). RMIX is the
                # three-valued flag from _mixed_flags: cgrad needs the
                # full value 1.0 (candidate region itself is mixed).
                do = alive_any & jnp.any(i_tile[:, RMIX] > 0.75)

                def _zeros():
                    for row in (OCGX, OCGY, ODE):
                        out_ref[0, tt, :, row] = jnp.zeros((ts,), jnp.float32)

                pl.when(do)(_body)
                pl.when(jnp.logical_not(do))(_zeros)
            elif sweep == "force" and spec.surface_tension and \
                    not os.environ.get("TPUSPH_STRIP_NO_ST_SPLIT"):
                # TPUSPH_STRIP_NO_ST_SPLIT=1 collapses this split to ONE
                # full body: the split doubles the force-sweep body and
                # with it the (Mosaic or interpret-mode XLA) compile time
                # — compile-time-sensitive contexts (the multichip CPU
                # dryrun) trade the far-tile lane savings away.
                # ST-skip split (r4 ceiling work): the capillary-stress
                # terms are EXACTLY zero unless some candidate j (or an
                # i row) carries a nonzero color gradient, i.e. unless
                # the tile's RMIX >= 0.5 (the one-window dilation of the
                # mixed flag — _mixed_flags). Far tiles (~90% of a bubble
                # workload) run a body with surface_tension stripped,
                # dropping ~1/3 of the force sweep's per-lane ops; the
                # near-interface body is unchanged. Same-step exactness
                # holds under the neighbor-list skin contract: cg can
                # only become nonzero where the other phase moved within
                # reach, which the skin/2 rebuild trigger bounds.
                st_do = jnp.any(i_tile[:, RMIX] > 0.25)
                pl.when(alive_any & st_do)(lambda: _body(spec))
                pl.when(alive_any & jnp.logical_not(st_do))(
                    lambda: _body(spec._replace(surface_tension=False)))
            else:
                pl.when(alive_any)(_body)
            return carry

        if t_blk == 1:
            tile_body(0, 0)
        else:
            jax.lax.fori_loop(0, t_blk, tile_body, 0)

    # narrow window fetch: the rho/cgrad sweeps only read field rows < 8
    # (the R* ordering contract in pallas_pair), so their window block is
    # (8, W) — half the per-offset window DMA; force reads 14/16 rows and
    # fetches the full block. Index maps return F-block coord 0 either way.
    F_SUB = 8 if sweep in ("rho", "cgrad") else F_ROWS
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t_blk, ts, F_ROWS),
                             index_map=lambda c, t, d: (c, t, 0, 0),
                             memory_space=pltpu.VMEM)]
    for kk, (ox, oy) in enumerate(offs):
        in_specs.append(
            pl.BlockSpec((1, t_blk, F_SUB, W),
                         index_map=_delta_index_map(geom, ox, oy, kk),
                         memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, t_blk, ts, 8),
                            index_map=lambda c, t, d: (c, t, 0, 0),
                            memory_space=pltpu.VMEM)

    def call(tabs, i_arr, win, delta):
        scal, tab_mat = tabs
        # flat bit-packed 1D prefetch: see _delta_index_map
        args = [_pack_delta(delta, geom.nblocks), scal, tab_mat, i_arr] \
            + [win] * len(offs)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(geom.ncols, geom.nblocks),
                in_specs=in_specs,
                out_specs=out_spec),
            out_shape=jax.ShapeDtypeStruct(
                (geom.ncols, geom.ntiles, ts, 8), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*args)

    return call


def make_vapor_kernel(geom: StripGeometry, vtype: int, cut: float,
                      interpret: bool = False):
    """The fix phase_change interface query as a 4th strip sweep
    (SURVEY §3.5: the reference walks the neighbor list counting vapor
    neighbors and finding the nearest — here one masked window sweep):
    per i, (count of type-``vtype`` neighbors within ``cut``, slot of the
    nearest, its rsq). ``cut`` must be <= margin_dist (the rank windows only
    cover cutoff + skin); the caller enforces it. Output rows:
    ORHO = count, OCGX = nearest slot, OCGY = nearest rsq (BIG if none),
    OFX/OFY = nearest OWNED slot / rsq (grow mode must never target a ghost
    copy — its update is discarded by the next refresh while the liquid is
    debited). Ownedness rides the SIGN of the slot field: the caller packs
    slot for owned rows and -(slot+1) for ghosts."""
    W = geom.w
    ts = geom.ts
    offs = _neighbor_offsets(geom)
    BIG = 1e30  # plain float: a jnp scalar here would be a captured const
    assert cut <= geom.margin_dist + 1e-9, (cut, geom.margin_dist)
    t_blk = geom.t_blk

    def kernel(delta_ref, i_ref, *refs):
        del delta_ref  # consumed by the window index maps
        out_ref = refs[-1]
        win_refs = refs[:-1]
        cidx = pl.program_id(0)

        def tile_body(tt, carry):
            i_tile = i_ref[0, tt]              # (ts, F)

            def icol(r):
                return i_tile[:, r:r + 1]

            alive_i = icol(RTYPE) > 0.5
            acc_cnt = jnp.zeros((ts,), jnp.float32)
            acc_mn = jnp.full((ts,), BIG, jnp.float32)
            acc_sl = jnp.zeros((ts,), jnp.float32)
            acc_mn_o = jnp.full((ts,), BIG, jnp.float32)
            acc_sl_o = jnp.zeros((ts,), jnp.float32)
            for kk, (ox, oy) in enumerate(offs):
                sx, sy = _plane_shift(geom, ox, oy, cidx)
                j = win_refs[kk][0, tt]        # (F, W)
                dx0 = icol(RX) - (j[RX, :][None, :] + sx)
                dx1 = icol(RY) - (j[RY, :][None, :] + sy)
                dx2 = icol(RZ) - j[RZ, :][None, :]
                rsq = dx0 * dx0 + dx1 * dx1 + dx2 * dx2
                jt = j[RTYPE, :][None, :]
                isvap = (jt > vtype - 0.5) & (jt < vtype + 0.5)
                mask = alive_i & isvap & (rsq > 1e-12) & (rsq < cut * cut)
                acc_cnt = acc_cnt + jnp.sum(mask.astype(jnp.float32), axis=1)
                # slot sign encodes ownedness: slot_enc >= 0 <=> owned row
                sl_enc = j[RSLOT, :][None, :]
                sl_abs = jnp.where(sl_enc >= 0, sl_enc, -sl_enc - 1.0)
                big = jnp.where(mask, rsq, BIG)
                mn = jnp.min(big, axis=1)
                # slot of the per-row argmin: min slot among lanes achieving
                # the row min (two lane reductions, no argmin lowering)
                sl = jnp.min(jnp.where(big <= mn[:, None], sl_abs, BIG),
                             axis=1)
                take = mn < acc_mn
                acc_sl = jnp.where(take, sl, acc_sl)
                acc_mn = jnp.minimum(acc_mn, mn)
                big_o = jnp.where(mask & (sl_enc >= 0), rsq, BIG)
                mn_o = jnp.min(big_o, axis=1)
                sl_o = jnp.min(jnp.where(big_o <= mn_o[:, None], sl_abs, BIG),
                               axis=1)
                take_o = mn_o < acc_mn_o
                acc_sl_o = jnp.where(take_o, sl_o, acc_sl_o)
                acc_mn_o = jnp.minimum(acc_mn_o, mn_o)
            out_ref[0, tt, :, ORHO] = acc_cnt
            out_ref[0, tt, :, OCGX] = acc_sl
            out_ref[0, tt, :, OCGY] = acc_mn
            out_ref[0, tt, :, OFX] = acc_sl_o
            out_ref[0, tt, :, OFY] = acc_mn_o
            return carry

        if t_blk == 1:
            tile_body(0, 0)
        else:
            jax.lax.fori_loop(0, t_blk, tile_body, 0)

    in_specs = [pl.BlockSpec((1, t_blk, ts, F_ROWS),
                             index_map=lambda c, t, d: (c, t, 0, 0),
                             memory_space=pltpu.VMEM)]
    for kk, (ox, oy) in enumerate(offs):
        in_specs.append(
            # narrow fetch: the vapor query reads x/type/slot only — all
            # in the first 8 field rows (R* ordering in pallas_pair)
            pl.BlockSpec((1, t_blk, 8, W),
                         index_map=_delta_index_map(geom, ox, oy, kk),
                         memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, t_blk, ts, 8),
                            index_map=lambda c, t, d: (c, t, 0, 0),
                            memory_space=pltpu.VMEM)

    def call(i_arr, win, delta):
        # flat bit-packed 1D prefetch: see _delta_index_map
        args = [_pack_delta(delta, geom.nblocks), i_arr] + [win] * len(offs)
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(geom.ncols, geom.nblocks),
                in_specs=in_specs,
                out_specs=out_spec),
            out_shape=jax.ShapeDtypeStruct(
                (geom.ncols, geom.ntiles, ts, 8), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=interpret,
        )(*args)

    return call


# --------------------------------------------------------------------------
# backend
# --------------------------------------------------------------------------

class StripBackend(BandBackend):
    """Strip backend: BandBackend lifecycle with the strip layout, window
    packers, and kernel. Single device; the dist path keeps the column
    kernel."""

    def _call(self, spec: PhysicsSpec, sweep: str):
        key = (spec, sweep)
        if key not in self._calls:
            self._calls[key] = make_strip_kernel(
                self.geom, spec, self.ntypes, sweep,
                interpret=self.interpret)
        return self._calls[key]

    def _pack_i(self, fields):
        return pack_i_strip(fields, self.geom)

    def _pack_band(self, fields):
        return pack_window_strip(fields, self.geom)

    def _band_row(self, f, row_id: int):
        return window_row(f, row_id, self.geom)

    def _sweep_call(self, spec, sweep, tabs, i_arr, band, aux):
        return self._call(spec, sweep)(tabs, i_arr, band, aux.delta)

    def _mixed_flags(self, fields, aux=None):
        """(n_slots,) f32 three-valued flag:
          1.0  — the tile's FULL candidate region (its delta-shifted rank
                 windows across the 9 neighbor columns) contains more than
                 one phase: color gradients of its rows can be nonzero,
                 the cgrad sweep must run (kernel test RMIX > 0.75);
          0.5  — single-phase candidate region, but some CANDIDATE tile is
                 mixed: a candidate j can carry cg != 0, so the force
                 sweep's surface-tension terms must still run (RMIX >
                 0.25) while cgrad skips;
          0.0  — no mixed tile within one window reach: capillary terms
                 are exactly zero, the force sweep runs the ST-stripped
                 body.
        The 0.5 band is the one-window DILATION of the mixed flag: j's
        cut-ball is contained in j's own tile's candidate region, so
        mix(tile of j) = 0 implies cg_j = 0 exactly."""
        geom = self.geom
        stride = geom.stride
        bpc = geom.block_rows // geom.ch
        ty = fields["type_f"].reshape(geom.ncols, geom.n32, geom.ch)
        tmax_c = jnp.max(ty, axis=2)                     # (ncols, n32)
        tmin_c = jnp.min(jnp.where(ty > 0, ty, 99.0), axis=2)
        t_idx = jnp.arange(geom.ntiles)

        def win_reduce(arr_p, red, fill, dch):
            outs = []
            for cix in range(-geom.mlo, stride + geom.mhi):
                ci = stride * t_idx[None, :] + cix + dch
                oob = (ci < 0) | (ci >= geom.n32)
                v = jnp.take_along_axis(
                    arr_p, jnp.clip(ci, 0, geom.n32 - 1), axis=1)
                outs.append(jnp.where(oob, fill, v))
            return red(jnp.stack(outs), axis=0)

        def win_pass(cmax, cmin=None):
            """One window-reach reduction of chunk-level (max, min) phase
            ranges -> per-tile (gmax, gmin). ``cmin=None`` skips the min
            branch entirely — the ST dilation only consumes the max, and
            the discarded min cost a full window-min reduction (9 offsets
            x window chunks) per rebuild (ADVICE r4)."""
            maxs, mins = [], []
            for kk, (ox, oy) in enumerate(_neighbor_offsets(geom)):
                perm, valid = _plane_neighbor_perm(geom, ox, oy)
                vm = jnp.asarray(valid)[:, None]
                dch = jnp.repeat(aux.delta[:, kk, :] * bpc, geom.t_blk,
                                 axis=1)
                wmax = win_reduce(cmax[jnp.asarray(perm)], jnp.max, 0.0,
                                  dch)
                maxs.append(jnp.where(vm, wmax, 0.0))
                if cmin is not None:
                    wmin = win_reduce(cmin[jnp.asarray(perm)], jnp.min,
                                      99.0, dch)
                    mins.append(jnp.where(vm, wmin, 99.0))
            gmax = jnp.max(jnp.stack(maxs), axis=0)
            if cmin is None:
                return gmax, None
            return gmax, jnp.min(jnp.stack(mins), axis=0)

        gmax, gmin = win_pass(tmax_c, tmin_c)
        mixed = (gmax > gmin + 0.5) & (gmin < 90.0)      # (ncols, ntiles)
        # dilate by one more window reach for the ST skip: chunk-level
        # mixed (each chunk inherits its tile's flag), then the same
        # window max — 1 where any CANDIDATE tile is mixed
        mixed_c = jnp.repeat(mixed.astype(jnp.float32), stride, axis=1,
                             total_repeat_length=geom.n32)
        st_need, _ = win_pass(mixed_c)
        flag = jnp.maximum(mixed.astype(jnp.float32),
                           0.5 * (st_need > 0.5).astype(jnp.float32))
        return jnp.repeat(flag.reshape(-1), geom.ts,
                          total_repeat_length=geom.n_slots)

    def vapor_neighbor(self, state: ParticleState, box: Box, vtype: int,
                       cut: float, aux):
        """fix phase_change interface query over the strip windows:
        (count, nearest_row, nearest_rsq) of type-`vtype` neighbors within
        `cut` for every pool row. `cut` must fit inside the rank-window
        margin (cutoff + skin) — the geometry guarantees coverage there."""
        from tpusph.ops.band_pair import _state_fields
        geom = self.geom
        n = geom.n_slots
        cut = float(min(cut, geom.margin_dist))
        key = ("vapor", vtype, cut)
        if key not in self._calls:
            self._calls[key] = make_vapor_kernel(
                geom, vtype, cut, interpret=self.interpret)
        fields = _state_fields(state)
        # sign-encoded slot: >= 0 owned, -(slot+1) ghost (seam copies and
        # dist halo rows) — the kernel derives its owned-restricted argmin
        # from the sign alone, no extra packed field
        slot = jnp.arange(n, dtype=jnp.float32)
        fields["slot"] = jnp.where(state.owned, slot, -slot - 1.0)
        i_arr = self._pack_i(fields)
        win = self._pack_band(fields)
        out = self._calls[key](i_arr, win, aux.delta).reshape(n, 8)
        count = out[:, ORHO].astype(jnp.int32)
        nearest = jnp.clip(out[:, OCGX], 0, n - 1).astype(jnp.int32)
        rsq = jnp.where(count > 0, out[:, OCGY], jnp.inf)
        near_o = jnp.clip(out[:, OFX], 0, n - 1).astype(jnp.int32)
        rsq_o = jnp.where(out[:, OFY] < 1e29, out[:, OFY], jnp.inf)
        # seam ghosts are SAME-DEVICE copies: resolve them to their source
        # rows so grow mode targets the true owned particle (matching the
        # cellgrid oracle, which sees the periodic image of the owned row)
        if aux.seam_src is not None and aux.seam_src.shape[0] > 0:
            owner_of = jnp.arange(n, dtype=jnp.int32).at[
                aux.seam_dest].set(aux.seam_src, mode="drop")
            resolved = owner_of[nearest]
            better = state.owned[resolved] & (rsq < rsq_o)
            near_o = jnp.where(better, resolved, near_o)
            rsq_o = jnp.where(better, rsq, rsq_o)
        return count, nearest, rsq, near_o, rsq_o

    def init_aux(self, state: ParticleState, box: Box):
        state, aux = build_strips(self.resize(state), self.geom, box)
        return state, self._attach_mix(state, aux)

    def _attach_mix(self, state: ParticleState, aux: gridlib.GridData):
        """Compute the per-slot mixed-phase cgrad-skip flag ONCE PER
        REBUILD and carry it on the aux (GridData.mix). Types change only
        via phase-change insertion, which blows the displacement reference
        (ops/phase_change.py:134) so a rebuild always precedes the next
        force pass — the flag cannot go stale. Per-step recomputation was
        O(margin-chunks x 9 offsets) small gathers: measured ~1/3 of the
        dynamic force-stage glue at W=384 (PERFORMANCE.md r4)."""
        from tpusph.ops.band_pair import _state_fields
        mix = self._mixed_flags(_state_fields(state), aux)
        if mix is None:
            return aux
        return dataclasses.replace(aux, mix=mix)

    def refresh_seam(self, state: ParticleState, aux: gridlib.GridData):
        """Re-copy the seam-ghost bands from their source rows — the
        single-device forward_comm analog (src/comm.cpp), run EVERY step.
        Ghost copies do not self-evolve correctly between rebuilds: band-
        edge ghosts have truncated neighborhoods, an O(1) force error that
        walks their positions apart from their sources and breaks
        action-reaction at the seam (measured: Py drift growing ~t^3, 0.03
        momentum units over 16 steps on a 1600-particle quiescent-P
        system). Copies x (column axis shifted by +-L), vest, rho, e — the
        fields the pair sweeps read (same set as dist._FWD_FIELDS)."""
        src, dest_w, shift = aux.seam_src, aux.seam_dest, aux.seam_shift
        if src is None or src.shape[0] == 0:
            return state
        ca = self.geom.col_axis
        # ONE fused (n, 8) gather + scatter: TPU row ops cost ~15 ns/row
        # regardless of width, so eight narrow per-field copies ran 4x
        # slower than this (measured 42 ms/step at 1M / 160k seam rows)
        mat = jnp.concatenate([state.x, state.vest,
                               state.rho[:, None], state.e[:, None]], axis=1)
        g = mat[src]
        g = g.at[:, ca].add(shift)
        mat = mat.at[dest_w].set(g, mode="drop")
        return dataclasses.replace(state, x=mat[:, 0:3], vest=mat[:, 3:6],
                                   rho=mat[:, 6], e=mat[:, 7])

    def prepare(self, state: ParticleState, aux: gridlib.GridData, istep,
                box: Box):
        trigger = needs_rebuild(state, aux, self.geom.skin)
        if self.rebuild_every > 0:
            trigger = trigger | (jnp.asarray(istep) % self.rebuild_every == 0)

        def do_build(s):
            s2, a2 = build_strips(s, self.geom, box, nbuilds=aux.nbuilds)
            return s2, self._attach_mix(s2, a2)

        state, aux = jax.lax.cond(trigger, do_build, lambda s: (s, aux),
                                  state)
        # idempotent on rebuild steps (fresh bands are already exact copies)
        return self.refresh_seam(state, aux), aux
