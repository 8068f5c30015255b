"""Sorted cell grid — the TPU-native replacement for the reference's
neighbor machinery (src/neighbor.cpp, neigh_half_bin.cpp — SURVEY.md §2.6).

Design (SURVEY §7.2): NO explicit neighbor lists. Particles are kept sorted
by cell id (cells of side >= cutoff + skin); each sweep recomputes pair
candidates from the 27 (3D) / 9 (2D) neighbor-cell windows with a FIXED
per-cell capacity and masking. Rebuild (re-sort) happens at skin/2
displacement, mirroring Neighbor::decide(); between rebuilds the stale cell
assignment still covers all true neighbors because cells are skin-padded.

Static shapes everywhere: geometry (cell counts, capacity) is host-side and
hashable; occupancy overflow is counted on device and surfaced to the host
(the fixed-capacity analog of LAMMPS "dangerous builds" — SURVEY §5.2).
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from tpusph.state import Box, ParticleState


class GridGeometry(NamedTuple):
    """Static grid geometry (part of the jit cache key)."""
    ncells: Tuple[int, int, int]   # cells per axis (z=1 in 2D)
    cell_size: Tuple[float, float, float]
    origin: Tuple[float, float, float]
    cap: int                       # max particles per cell
    dim: int
    periodic: Tuple[bool, bool, bool]
    skin: float

    @property
    def total_cells(self) -> int:
        return self.ncells[0] * self.ncells[1] * self.ncells[2]

    @property
    def nstencil(self) -> int:
        return 27 if self.dim == 3 else 9


def make_geometry(box: Box, cutoff: float, dim: int, skin: float = 0.0,
                  cap: int | None = None, avg_per_cell: float | None = None
                  ) -> GridGeometry:
    """Host-side geometry construction (Neighbor::setup_bins equivalent).
    Cell side >= cutoff + skin; cap defaults to ~2.5x the expected occupancy
    if ``avg_per_cell`` is given, else 64 (3D) / 32 (2D)."""
    lo = np.asarray(box.lo)
    hi = np.asarray(box.hi)
    length = hi - lo
    side = cutoff + skin
    if side <= 0:
        raise ValueError("cutoff + skin must be positive")
    nc = np.maximum(np.floor(length / side).astype(int), 1)
    if dim == 2:
        nc[2] = 1
    # actual cell size stretches to tile the box exactly (periodic wrap needs it)
    size = length / nc
    if dim == 2:
        size[2] = max(length[2], 1.0)
    if cap is None:
        if avg_per_cell is not None:
            # 1.8x headroom over the mean occupancy; overflow is counted on
            # device and surfaced to the host (Simulation raises), so a
            # too-tight cap fails loudly rather than silently dropping pairs
            cap = int(math.ceil(avg_per_cell * 1.8 / 8.0) * 8)
        else:
            cap = 64 if dim == 3 else 32
    return GridGeometry(
        ncells=tuple(int(v) for v in nc),
        cell_size=tuple(float(v) for v in size),
        origin=tuple(float(v) for v in lo),
        cap=int(cap),
        dim=dim,
        periodic=box.periodic,
        skin=float(skin),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GridData:
    """Per-build device data over the SORTED particle order."""
    cell_id: jax.Array    # (N,) i32 cell of each sorted particle; dead -> ncells
    starts: jax.Array     # (ncells+1,) i32 first sorted row of each cell
    counts: jax.Array     # (ncells,) i32 occupancy
    rank: jax.Array       # (N,) i32 index within own cell
    x_ref: jax.Array      # (N, 3) positions at build time (skin trigger)
    overflow: jax.Array   # (1,) i32 particles beyond cap in any cell (dropped!)
    nbuilds: jax.Array    # (1,) i32 cumulative rebuild count (bench/thermo stat)
    # strip backend only: per-(column, neighbor, block) window-retarget
    # offsets (ops/strip_pair window delta tables), None elsewhere. Scalar-
    # prefetched by the strip kernels so rank windows track cross-column
    # density differences (re-computed each rebuild).
    delta: jax.Array | None = None
    # strip backend only: the seam-ghost band copy map (src row, dest row
    # with capacity = invalid, column-axis position shift). Ghost copies do
    # NOT self-evolve correctly between rebuilds (the band edge truncates
    # their neighborhoods, an O(1) force error that walks their positions
    # and leaks momentum through broken action-reaction at the seam), so
    # StripBackend.prepare re-copies them from their source rows EVERY
    # step — the single-device forward_comm analog (src/comm.cpp).
    seam_src: jax.Array | None = None
    seam_dest: jax.Array | None = None
    seam_shift: jax.Array | None = None
    # strip backend only: (2,) i32 worst coverage shortfall in ROWS
    # (below, above) across all tiles at the last rebuild — 0 when the
    # rank windows cover cutoff+skin everywhere. On a coverage violation
    # the host reads this to size the re-chosen margins EXACTLY (measured
    # overshoot + slack) instead of escalating a blind multiplier.
    margin_short: jax.Array | None = None
    # strip backend only: (2,) i32 UNCLIPPED worst need-minus-window in
    # rows (negative = slack) at the last rebuild. The margin-decay path
    # (api._maybe_decay_margins) reads this to detect a persistently
    # over-sized escalated floor and re-choose a leaner geometry — the
    # escalation ratchet's one-way W inflation was most of the r4
    # dynamic/ceiling gap (1.5x lanes at W=384 vs 256, PERFORMANCE.md).
    margin_need: jax.Array | None = None
    # strip backend only: per-slot mixed-phase-neighborhood flag for the
    # cgrad tile skip, computed ONCE PER REBUILD (types change only via
    # phase-change insertion, which forces a rebuild before the next force
    # pass). Computing it per step cost O(margin-chunks x offsets) small
    # gathers — measured as a large share of the dynamic force-stage glue
    # at W=384 (PERFORMANCE.md r4).
    mix: jax.Array | None = None


def cell_coords(x: jax.Array, geom: GridGeometry) -> jax.Array:
    """(..., 3) position -> (..., 3) integer cell coordinates, clamped on
    non-periodic axes, wrapped on periodic ones."""
    origin = jnp.asarray(geom.origin)
    size = jnp.asarray(geom.cell_size)
    nc = jnp.asarray(geom.ncells)
    c = jnp.floor((x - origin) / size).astype(jnp.int32)
    per = jnp.asarray(geom.periodic)
    return jnp.where(per, jnp.mod(c, nc), jnp.clip(c, 0, nc - 1))


def flat_cell_id(coords: jax.Array, geom: GridGeometry) -> jax.Array:
    ncx, ncy, ncz = geom.ncells
    return (coords[..., 0] * ncy + coords[..., 1]) * ncz + coords[..., 2]


def build(state: ParticleState, geom: GridGeometry, extra=None, nbuilds=None):
    """Sort particles by cell id and build the cell index (Neighbor::build +
    the atom sort). Dead slots get the sentinel cell (= total_cells) so they
    sort to the end and never appear as candidates.

    ``extra``: optional pytree of (N,)-leading arrays permuted identically
    (dist mode tracks halo bookkeeping through the sort with it). Returns
    (state, GridData) or (state, GridData, extra_permuted)."""
    n = state.capacity
    ncells = geom.total_cells
    cid = flat_cell_id(cell_coords(state.x, geom), geom)
    cid = jnp.where(state.alive, cid, ncells)
    perm = jnp.argsort(cid, stable=True)
    state = state.permute(perm)
    if extra is not None:
        extra = jax.tree_util.tree_map(lambda a: a[perm], extra)
    cid = cid[perm]

    counts = jnp.zeros(ncells + 1, jnp.int32).at[cid].add(1)[:ncells]
    starts = jnp.concatenate([
        jnp.zeros(1, jnp.int32), jnp.cumsum(counts).astype(jnp.int32)])
    rank = jnp.arange(n, dtype=jnp.int32) - starts[jnp.minimum(cid, ncells - 1)]
    rank = jnp.where(cid < ncells,
                     rank,
                     jnp.arange(n, dtype=jnp.int32) - starts[ncells])
    overflow = jnp.sum(jnp.maximum(counts - geom.cap, 0))[None]
    if nbuilds is None:
        nbuilds = jnp.zeros(1, jnp.int32)
    data = GridData(cell_id=cid, starts=starts, counts=counts,
                    rank=rank, x_ref=state.x, overflow=overflow,
                    nbuilds=nbuilds + 1)
    if extra is not None:
        return state, data, extra
    return state, data


def stencil_offsets(geom: GridGeometry) -> np.ndarray:
    """The (S, 3) neighbor-cell offsets: full 27 (3D) / 9 (2D) stencil —
    full, not half: no Newton halving on TPU (SURVEY §7.2)."""
    r = (-1, 0, 1)
    if geom.dim == 3:
        offs = [(i, j, k) for i in r for j in r for k in r]
    else:
        offs = [(i, j, 0) for i in r for j in r]
    return np.asarray(offs, np.int32)


def neighbor_cell_ids(geom: GridGeometry) -> tuple[np.ndarray, np.ndarray]:
    """Host-precomputed (ncells, S) neighbor cell ids + (ncells, S, 3) image
    shift vectors (for periodic minimum image across the wrap).
    Out-of-range neighbors on non-periodic axes map to the sentinel cell
    (ncells) with zero occupancy."""
    ncx, ncy, ncz = geom.ncells
    ncells = geom.total_cells
    offs = stencil_offsets(geom)                       # (S, 3)
    cx, cy, cz = np.meshgrid(np.arange(ncx), np.arange(ncy), np.arange(ncz),
                             indexing="ij")
    coords = np.stack([cx, cy, cz], axis=-1).reshape(-1, 3)  # (ncells, 3)
    nbr = coords[:, None, :] + offs[None, :, :]        # (ncells, S, 3)
    nc = np.array([ncx, ncy, ncz])
    per = np.array(geom.periodic)
    shift = np.zeros(nbr.shape, np.float32)            # box-length multiples
    wrapped = np.mod(nbr, nc)
    # shift = how many box lengths to ADD to the neighbor cell's particle
    # positions to bring them next to this cell
    shift = np.where(per, np.floor_divide(nbr, nc).astype(np.float32), 0.0)
    out_of_range = (~per) & ((nbr < 0) | (nbr >= nc))
    valid = ~np.any(out_of_range, axis=-1)             # (ncells, S)
    nbr_clamped = np.where(per, wrapped, np.clip(nbr, 0, nc - 1))
    flat = (nbr_clamped[..., 0] * ncy + nbr_clamped[..., 1]) * ncz + nbr_clamped[..., 2]
    flat = np.where(valid, flat, ncells).astype(np.int32)
    return flat, shift.astype(np.float32)


def needs_rebuild(state: ParticleState, data: GridData, geom: GridGeometry) -> jax.Array:
    """Neighbor::decide() displacement trigger: any particle moved more than
    skin/2 since the last build."""
    if geom.skin <= 0.0:
        return jnp.asarray(True)
    disp = state.x - data.x_ref
    # NB: across a periodic wrap raw displacement is huge -> triggers rebuild,
    # which is conservative and correct.
    maxd2 = jnp.max(jnp.where(state.alive[:, None], disp * disp, 0.0).sum(-1))
    return maxd2 > (0.5 * geom.skin) ** 2
