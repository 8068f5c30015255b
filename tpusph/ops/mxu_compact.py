"""MXU candidate-compaction force sweep — the r3 PERFORMANCE.md design
sketch, built and measured (r3 VERDICT #1).

The strip force kernel issues ``nnbr x ceil128(W)`` VPU lanes per i-row
(reference analog: the pair-style ``compute()`` inner loops, SURVEY §3.2
HOT #1). W carries the rank-window margins — drift allowance, density
contrast, vreg padding — so the PHYSICS cost scales with the margins even
though the true neighbor count does not. This kernel decouples them:

  1. per (tile, neighbor-column): a cheap ball-box candidate filter over
     the W window lanes (current positions vs the tile's column cell x
     z-extent, reach = max pair cutoff);
  2. lane positions for the survivors via an MXU prefix-sum
     ((1, W) @ upper-triangular (W, W));
  3. a one-hot (W x P) selection matrix contracts the window field matrix
     (F, W) onto a dense compacted candidate tile (F, P) on the MXU —
     the "one-hot gather" that replaces arbitrary row gathers (TPU
     ~15 ns/row) with matmul;
  4. the UNCHANGED tile physics (ops/tile_physics.tile_part_sums) runs on
     (ts, P) instead of nnbr x (ts, W).

P is the measured max union candidate count over tiles (+headroom, padded
to a 128-lane vreg multiple) — set by the ball geometry (~(cell+2c)^2 x
(ts_z+2c) x density), INDEPENDENT of the window margins. The economics
(see PERFORMANCE.md r4 table): physics lanes drop from nnbr*ceil128(W) to
P, but the one-hot construction costs nnbr*W*P compares and the gather
matmuls run at F/128 MXU row efficiency, so the design only pays when the
margins are wide (dynamic / density-contrast geometries) or the MXU:VPU
ratio is higher (v5p).

Prototype scope: the force sweep (the dominant one), no virial row, same
inputs as make_strip_kernel (windows + delta prefetch), output-compatible.
Not wired into production paths; tools/proto_mxu_compact.py measures it
against the production kernel and tests/test_mxu_compact.py gates
equivalence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpusph.ops.pallas_pair import (
    F_ROWS, RX, RY, RZ, RTYPE, OFX, OFY, OFZ, ODRHO, ODE,
)
from tpusph.ops import tile_physics
from tpusph.ops.band_pair import _plane_shift
from tpusph.ops.strip_pair import (
    StripGeometry, _neighbor_offsets, _delta_index_map, _pack_delta,
)
from tpusph.params import PhysicsSpec

# plain Python floats: jnp scalars built at trace time outside the kernel
# body would be captured as constants, which pallas_call rejects
BIG = 1e30
OCNT = 7  # output row: per-tile compaction overflow count (rows 5-7 free)


def measure_union_cap(x: np.ndarray, geom: StripGeometry, box, cut: float,
                      headroom: float = 1.3) -> int:
    """Host-side P: max over (column, tile z-slab) of the candidate-union
    count — particles within ``cut`` of the tile's column cell x z-extent
    box — x headroom, padded to a full 128-lane vreg multiple."""
    lo = np.asarray(box.lo, np.float64)
    x = np.asarray(x, np.float64)
    cellx, celly = geom.cell_xy
    cx = np.clip(((x[:, 0] - lo[0]) / cellx).astype(int), 0, geom.ncx - 1)
    if geom.dim == 3:
        cy = np.clip(((x[:, 1] - lo[1]) / celly).astype(int), 0,
                     geom.ncy - 1)
    else:
        cy = np.zeros(len(x), int)
    z = x[:, geom.col_axis] - lo[geom.col_axis]
    lz = geom.lengths[geom.col_axis]
    # z-extent of one tile at mean density
    rows_per_z = len(x) / max(geom.ncols, 1) / max(lz, 1e-30)
    tile_z = geom.ts / max(rows_per_z, 1e-30)
    nz = max(int(np.ceil(lz / max(tile_z, 1e-30))), 1)
    tz = np.clip((z / tile_z).astype(int), 0, nz - 1)
    # candidate membership via the REAL ball-box test against each tile
    # box (particle within `cut` of the box), evaluated by binning over
    # the 3x3 column x +-k slab reach. The distance test matters: adding
    # a particle to every box in reach regardless of distance overcounts
    # the union ~2-3x (measured P 4736 -> ~1500 at the 1M bench), and P
    # multiplies BOTH the gather MACs and the physics lanes.
    kx = int(np.ceil(cut / cellx)) if cellx > 0 else 0
    ky = int(np.ceil(cut / celly)) if geom.dim == 3 and celly > 0 else 0
    kz = int(np.ceil(cut / max(tile_z, 1e-30)))
    ncy = max(geom.ncy, 1)
    counts = np.zeros((geom.ncx, ncy, nz), np.int64)
    xp = x[:, 0] - lo[0]
    yp = (x[:, 1] - lo[1]) if geom.dim == 3 else np.zeros(len(x))
    cut2 = cut * cut

    def axdist(p, blo, size):
        return np.maximum(np.maximum(blo - p, p - (blo + size)), 0.0)

    for dx in range(-kx, kx + 1):
        for dy in range(-ky, ky + 1):
            for dz in range(-kz, kz + 1):
                tx, ty, tzz = cx + dx, cy + dy, tz + dz
                dxc = axdist(xp, tx * cellx, cellx)
                dyc = (axdist(yp, ty * celly, celly)
                       if geom.dim == 3 else 0.0)
                dzc = axdist(z, tzz * tile_z, tile_z)
                ok = dxc * dxc + dyc * dyc + dzc * dzc < cut2
                if geom.periodic[0]:
                    tx = tx % geom.ncx
                if geom.dim == 3 and geom.periodic[1]:
                    ty = ty % ncy
                if geom.col_periodic:
                    tzz = tzz % nz
                ok &= (tx >= 0) & (tx < geom.ncx) & (ty >= 0) \
                    & (ty < ncy) & (tzz >= 0) & (tzz < nz)
                np.add.at(counts, (tx[ok], ty[ok], tzz[ok]), 1)
    best = int(counts.max())
    return int(-(-int(best * headroom) // 128) * 128)


def make_compact_force_kernel(geom: StripGeometry, spec: PhysicsSpec,
                              ntypes: int, P: int, cut: float,
                              interpret: bool = False):
    """pallas_call over (ncols, nblocks) i-blocks: MXU-compacted candidates
    + the shared tile physics. Same calling convention as the production
    force sweep (make_strip_kernel(..., sweep='force'))."""
    W = geom.w
    ts = geom.ts
    T1 = ntypes + 1
    offs = _neighbor_offsets(geom)
    t_blk = geom.t_blk
    cut2 = float(cut * cut)

    def kernel(delta_ref, scal_ref, tabs_ref, i_ref, *refs):
        del delta_ref
        out_ref = refs[-1]
        win_refs = refs[:-1]
        cidx = pl.program_id(0)
        tabs2d, vec_cols, vec_rows = tile_physics.unpack_tables(tabs_ref, T1)
        # inclusive-prefix upper-triangular (W, W) — hoisted constant
        ia = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
        ib = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
        triu = (ia <= ib).astype(jnp.float32)
        iota_p = jax.lax.broadcasted_iota(
            jnp.int32, (1, P), 1).astype(jnp.float32)

        def tile_body(tt, carry):
            i_tile = i_ref[0, tt]              # (ts, F)

            def _body():
                lk = tile_physics.Lookups(scal_ref, tabs2d, vec_cols,
                                          vec_rows, spec, T1)
                hoist = tile_physics.hoist_i(i_tile, lk, spec, "force")
                # the tile's MEASURED bbox (current positions — no drift
                # assumption: a particle may sit outside its rebuild
                # column's cell by the skin it has used)
                al = i_tile[:, RTYPE:RTYPE + 1] > 0.5

                def ext(r):
                    v = i_tile[:, r:r + 1]
                    return (jnp.min(jnp.where(al, v, BIG)),
                            jnp.max(jnp.where(al, v, -BIG)))

                bx0, bx1 = ext(RX)
                by0, by1 = ext(RY)
                zmin, zmax = ext(RZ)
                # relativize positions to the tile bbox center: the MXU
                # gather runs as bf16-pass accumulation (~16-bit mantissa
                # at HIGHEST), so the error is proportional to |value| —
                # on absolute coordinates (~L) it would swamp dx; on
                # center-relative ones (<= cell + cut + skin) it is ~1e-4
                # absolute. The shift cancels EXACTLY in dx = xi - xj
                # because both i_tile and the gathered tile carry it.
                cx0 = 0.5 * (bx0 + bx1)
                cy0 = 0.5 * (by0 + by1)
                cz0 = 0.5 * (zmin + zmax)
                rowf = jax.lax.broadcasted_iota(jnp.int32, (ts, F_ROWS), 1)
                i_rel = (i_tile - jnp.where(rowf == RX, cx0, 0.0)
                         - jnp.where(rowf == RY, cy0, 0.0)
                         - jnp.where(rowf == RZ, cz0, 0.0))

                # ---- compaction: 9 windows -> one (F, P) candidate tile
                G = jnp.zeros((F_ROWS, P), jnp.float32)
                base = jnp.float32(0.0)
                kept_total = jnp.float32(0.0)
                for kk, (oxx, oyy) in enumerate(offs):
                    sx, sy = _plane_shift(geom, oxx, oyy, cidx)
                    X = win_refs[kk][0, tt]    # (F, W)
                    xj = X[RX, :] + sx
                    yj = X[RY, :] + sy
                    zj = X[RZ, :]
                    jt = X[RTYPE, :]
                    # ball-box distance: window lane vs tile bbox
                    dxc = jnp.maximum(jnp.maximum(bx0 - xj, xj - bx1), 0.0)
                    dyc = jnp.maximum(jnp.maximum(by0 - yj, yj - by1), 0.0)
                    dzc = jnp.maximum(jnp.maximum(zmin - zj, zj - zmax), 0.0)
                    keep = (jt > 0.5) & \
                        (dxc * dxc + dyc * dyc + dzc * dzc < cut2)
                    kf = keep.astype(jnp.float32)[None, :]      # (1, W)
                    # MXU prefix sum -> compacted lane position
                    pre = jnp.dot(kf, triu,
                                  preferred_element_type=jnp.float32)
                    pos = pre - 1.0 + base                      # (1, W)
                    cnt = jnp.sum(kf)
                    # one-hot (W, P) selection; out-of-range positions
                    # (> P-1) match no column -> dropped, counted below.
                    # kf.T (f32) multiplies instead of `keep[:, None] &`:
                    # Mosaic can't insert a minor dim on i1 vectors, and
                    # non-kept lanes alias their predecessor's prefix value
                    # so they must be zeroed
                    sel = (pos.T == iota_p).astype(jnp.float32) * kf.T
                    # bake the plane shift AND the bbox-center shift into
                    # the gathered positions — via an iota row mask
                    # (`.at[row].add` lowers to scatter-add, unimplemented
                    # in Mosaic)
                    rowi = jax.lax.broadcasted_iota(
                        jnp.int32, (F_ROWS, W), 0)
                    Xs = (X + jnp.where(rowi == RX, sx - cx0, 0.0)
                          + jnp.where(rowi == RY, sy - cy0, 0.0)
                          - jnp.where(rowi == RZ, cz0, 0.0))
                    # HIGHEST: bf16x3-pass accumulation — the gather must
                    # be value-faithful, default single-pass bf16 rounds
                    # the gathered values to 8 mantissa bits (measured
                    # 5e-2 relative force error at 1M)
                    G = G + jnp.dot(Xs, sel,
                                    preferred_element_type=jnp.float32,
                                    precision=jax.lax.Precision.HIGHEST)
                    base = base + cnt
                    kept_total = kept_total + cnt

                # ---- the unchanged physics, once, on (ts, P) lanes
                # (i_rel: positions center-relative, matching G; all other
                # rows identical to i_tile)
                parts = tile_physics.tile_part_sums(
                    i_rel, G, (jnp.float32(0.0), jnp.float32(0.0)),
                    hoist, lk, spec, "force", True)
                for row, acc in zip((OFX, OFY, OFZ, ODRHO, ODE), parts):
                    out_ref[0, tt, :, row] = jnp.sum(acc, axis=1)
                # compaction overflow: survivors that found no one-hot slot
                ov = jnp.maximum(kept_total - jnp.float32(P), 0.0)
                out_ref[0, tt, :, OCNT] = jnp.broadcast_to(ov, (ts,))

            def _zeros():
                for row in (OFX, OFY, OFZ, ODRHO, ODE, OCNT):
                    out_ref[0, tt, :, row] = jnp.zeros((ts,), jnp.float32)

            do = jnp.any(i_tile[:, RTYPE] > 0.5)
            pl.when(do)(_body)
            pl.when(jnp.logical_not(do))(_zeros)
            return carry

        if t_blk == 1:
            tile_body(0, 0)
        else:
            jax.lax.fori_loop(0, t_blk, tile_body, 0)

    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t_blk, ts, F_ROWS),
                             index_map=lambda c, t, d: (c, t, 0, 0),
                             memory_space=pltpu.VMEM)]
    for kk, (ox, oy) in enumerate(offs):
        in_specs.append(
            pl.BlockSpec((1, t_blk, F_ROWS, W),
                         index_map=_delta_index_map(geom, ox, oy, kk),
                         memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, t_blk, ts, 8),
                            index_map=lambda c, t, d: (c, t, 0, 0),
                            memory_space=pltpu.VMEM)

    def call(tabs, i_arr, win, delta):
        scal, tab_mat = tabs
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
