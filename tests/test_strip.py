"""Strip-kernel (ops/strip_pair) equivalence vs the XLA cell-grid backend
(itself validated against the dense O(N^2) oracle). Interpret mode on CPU;
the same kernels compile via Mosaic on TPU (TPUSPH_TEST_TPU=1).

The strip backend stores state z-SORTED per xy-column with seam-ghost bands
(owned=False rows), so comparisons join on particle tag over alive & OWNED
rows only."""

import numpy as np
import pytest
import jax

from tpusph import kernels
from tpusph.forces import compute_forces
from tpusph.ops.strip_pair import (
    StripBackend, build_strips, choose_strip_geometry)
from tpusph.ops.cellgrid import CellGridBackend
from tpusph import grid as gridlib
from tpusph.params import PhysicsSpec

from test_pallas import lattice_system

NSIDE = 12  # box must be at least 2x the seam-ghost depth along z


def by_tag(state, *fields):
    dev = jax.device_get(state)
    keep = (np.asarray(dev.type) > 0) & np.asarray(dev.owned)
    order = np.argsort(np.asarray(dev.tag)[keep], kind="stable")
    out = []
    for f in fields:
        arr = np.asarray(getattr(dev, f))
        out.append(arr[keep][order])
    return out


def run_cellgrid_stage(st, box, tables, spec):
    geom = gridlib.make_geometry(box, tables.max_cut(), spec.dim, skin=0.2,
                                 cap=64)
    cgb = CellGridBackend(geom)
    st_s, data = cgb.init_aux(st, box)
    assert int(data.overflow[0]) == 0
    return compute_forces(st_s, tables, spec, box, cgb, istep=0, aux=data)


def run_strip_stage(st, box, tables, spec, skin=0.2):
    x = np.asarray(st.x)[np.asarray(st.type) > 0]
    geom = choose_strip_geometry(box, tables.max_cut(), spec.dim, skin, x=x)
    assert geom is not None, "strip geometry must exist for this box"
    sb = StripBackend(geom, box, ntypes=tables.ntypes, interpret=True)
    st_b, data = sb.init_aux(st, box)
    assert int(data.overflow[0]) == 0
    return sb.force_stage(st_b, tables, spec, box, data, istep=0)


@pytest.mark.parametrize("dim", [2, 3])
@pytest.mark.parametrize("periodic", [True, False])
def test_strip_matches_cellgrid(dim, periodic):
    st, box, tables = lattice_system(dim, nside=NSIDE, periodic=periodic,
                                     seed=dim + 40)
    spec = PhysicsSpec(dim=dim, kernel=kernels.WENDLAND_C2, tait=True,
                       heatconduction=True, surface_tension=True,
                       rhosum_every=1)
    out_c = run_cellgrid_stage(st, box, tables, spec)
    out_s = run_strip_stage(st, box, tables, spec)

    (tc,) = by_tag(out_c, "tag")
    (ts,) = by_tag(out_s, "tag")
    np.testing.assert_array_equal(tc, ts)
    for field, rtol, atol in (("rho", 2e-5, 1e-6), ("f", 2e-4, 5e-4),
                              ("drho", 2e-4, 1e-4), ("de", 2e-4, 5e-4)):
        (a,) = by_tag(out_c, field)
        (b,) = by_tag(out_s, field)
        np.testing.assert_allclose(b, a, rtol=rtol, atol=atol,
                                   err_msg=field)


def test_strip_variants_match_cellgrid():
    st, box, tables = lattice_system(3, nside=NSIDE, seed=51)
    for spec in (
        PhysicsSpec(dim=3, kernel=kernels.LUCY, morris=True, tait=False),
        PhysicsSpec(dim=3, kernel=kernels.LUCY, ideal_gas=True, tait=False),
        PhysicsSpec(dim=3, kernel=kernels.LUCY, lj=True, tait=False),
    ):
        out_c = run_cellgrid_stage(st, box, tables, spec)
        out_s = run_strip_stage(st, box, tables, spec)
        for field in ("f", "de", "drho"):
            (a,) = by_tag(out_c, field)
            (b,) = by_tag(out_s, field)
            np.testing.assert_allclose(b, a, rtol=2e-4, atol=5e-4,
                                       err_msg=field)


@pytest.mark.slow
def test_strip_dynamics_matches_cellgrid():
    """A short dynamic run (rebuilds firing, seam ghosts re-made, particles
    crossing the periodic z seam) through the Simulation API must agree
    between strip and cellgrid backends."""
    from tpusph.api import Simulation

    def make(backend):
        sim = Simulation(dim=3, screen=False)
        sim.backend_name = backend
        rng = np.random.default_rng(7)
        side, dx = 14, 0.5
        ax = np.arange(side) * dx
        g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
        g = g + rng.uniform(-0.05, 0.05, g.shape)
        L = side * dx
        sim.create_box([0, 0, 0], [L, L, L], periodic=(True,) * 3, ntypes=1)
        v = rng.normal(0, 0.05, g.shape)
        v[:, 2] += 0.3   # net drift through the z seam
        sim.add_particles(g.astype(np.float32), 1, v=v.astype(np.float32),
                          rho=1.0, e=1.0, cv=1.0, rmass=0.125)
        sim.pair_rhosum(1)
        sim.pair_taitwater()
        sim.tables.set_taitwater(1, 1, rho0=1.0, c0=8.0, viscosity=0.3,
                                 h=2.2 * dx)
        sim.tables.set_rhosum(1, 1, h=2.2 * dx)
        sim.neighbor_skin = 0.25
        sim.dt = 5e-4
        sim.thermo(0)
        sim.run(40)
        return sim

    sim_s = make("strip")
    from tpusph.ops.strip_pair import StripBackend as SB
    assert isinstance(sim_s._backend_cache["backend"], SB)
    sim_c = make("cellgrid")
    for field in ("x", "v", "rho", "e"):
        a = sim_c.get(field)
        b = sim_s.get(field)
        np.testing.assert_allclose(b, a, rtol=5e-4, atol=5e-4, err_msg=field)


def test_strip_density_contrast_delta():
    """Systematic cross-column number-density contrast (8x): the rank
    mismatch between neighbor columns grows linearly along z, which only
    the per-(column, neighbor, block) window-retarget tables (GridData.
    delta, recomputed each rebuild) can absorb — r2's fixed rank windows
    rejected such systems outright. Gates: a geometry exists, the delta
    tables are actually nonzero, zero coverage violations, and the forces
    match the cell-grid oracle."""
    import jax.numpy as jnp
    from tpusph.state import ParticleState, Box
    from tpusph.params import PairTables

    rng = np.random.default_rng(9)
    ax16 = np.arange(16, dtype=np.float32)
    dense = np.stack(np.meshgrid(ax16[:8], ax16, ax16, indexing="ij"),
                     -1).reshape(-1, 3)
    ax8 = 8.0 + 2.0 * np.arange(4, dtype=np.float32)
    axc = 2.0 * np.arange(8, dtype=np.float32)
    sparse = np.stack(np.meshgrid(ax8, axc, axc, indexing="ij"),
                      -1).reshape(-1, 3)
    pts = np.concatenate([dense, sparse]).astype(np.float32)
    pts += rng.uniform(-0.05, 0.05, pts.shape).astype(np.float32)
    n = len(pts)
    st = ParticleState.from_arrays(
        pts, np.ones(n, np.int64), rmass=np.full(n, 0.5, np.float32),
        rho=np.ones(n, np.float32), e=np.ones(n, np.float32),
        capacity=((n + 127) // 128) * 128)
    box = Box.create([0, 0, 0], [16.0, 16.0, 16.0], (True,) * 3)
    tables = PairTables.zeros(1)
    tables.set_taitwater(1, 1, rho0=1.0, c0=10.0, viscosity=0.3, h=3.0)
    tables.set_rhosum(1, 1, h=3.0)
    spec = PhysicsSpec(dim=3, kernel=kernels.LUCY, tait=True, rhosum_every=1)

    geom = choose_strip_geometry(box, 3.0, 3, 0.5, x=pts)
    assert geom is not None, "contrast system must strip via delta tables"
    sb = StripBackend(geom, box, ntypes=1, interpret=True)
    st_b, data = sb.init_aux(st, box)
    assert int(np.asarray(data.overflow)[0]) == 0
    assert int(np.abs(np.asarray(data.delta)).max()) > 0, \
        "contrast must produce nonzero window retargets"
    out_s = sb.force_stage(st_b, tables, spec, box, data, istep=0)

    gg = gridlib.make_geometry(box, 3.0, 3, skin=0.5, cap=96)
    cgb = CellGridBackend(gg)
    st_c, data_c = cgb.init_aux(st, box)
    assert int(np.asarray(data_c.overflow)[0]) == 0
    out_c = compute_forces(st_c, tables, spec, box, cgb, istep=0, aux=data_c)
    (tc,) = by_tag(out_c, "tag")
    (ts_,) = by_tag(out_s, "tag")
    np.testing.assert_array_equal(tc, ts_)
    for field, rtol, atol in (("rho", 2e-5, 1e-6), ("f", 2e-4, 5e-4),
                              ("drho", 2e-4, 1e-4), ("de", 2e-4, 5e-4)):
        (a,) = by_tag(out_c, field)
        (b,) = by_tag(out_s, field)
        np.testing.assert_allclose(b, a, rtol=rtol, atol=atol, err_msg=field)


def test_strip_overflow_counts_and_drops():
    """A deliberately tiny column capacity must COUNT the overflow (the
    host check aborts) rather than silently mis-sum."""
    st, box, tables = lattice_system(3, nside=NSIDE, seed=3)
    x = np.asarray(st.x)[np.asarray(st.type) > 0]
    geom = choose_strip_geometry(box, tables.max_cut(), 3, 0.2, x=x)
    # enough total slots to resize, but per-column room far below the
    # measured occupancy + ghost bands (col_cap must stay a block multiple)
    blk = geom.ts * geom.t_blk
    tight = geom._replace(col_cap=blk * max(1, 128 // blk))
    sb = StripBackend(tight, box, ntypes=2, interpret=True)
    st_b = sb.resize(st)
    st_b, data = build_strips(st_b, tight, box)
    assert int(data.overflow[0]) > 0


def test_strip_window_violation_detected():
    """Margins that no longer cover cutoff+skin along z must raise the
    overflow counter (the coverage check), not silently miss pairs."""
    st, box, tables = lattice_system(3, nside=NSIDE, seed=3)
    x = np.asarray(st.x)[np.asarray(st.type) > 0]
    geom = choose_strip_geometry(box, tables.max_cut(), 3, 0.2, x=x)
    # squeeze ONLY the rank-window margins (mlo/mhi) — margin_dist also
    # sizes the seam ghost bands (ghost_depth = 2*margin_dist), and a
    # seam-capacity overflow is a different failure that margin widening
    # cannot and should not fix
    squeezed = geom._replace(mlo=1, mhi=1)
    sb = StripBackend(squeezed, box, ntypes=2, interpret=True)
    st_b = sb.resize(st)
    st_b, data = build_strips(st_b, squeezed, box)
    assert int(data.overflow[0]) > 0
    # the measured shortfall (rows missing below/above, GridData
    # margin_short) must be EXACT recovery evidence: widening the margins
    # by precisely that many rows (rounded up to whole chunks) restores
    # full coverage in one re-choice — no drift-ladder doubling needed
    short = np.asarray(jax.device_get(data.margin_short))
    assert short.max() > 0, short
    ch = squeezed.ch
    widened = squeezed._replace(mlo=1 + -(-int(short[0]) // ch),
                                mhi=1 + -(-int(short[1]) // ch))
    st_c = StripBackend(widened, box, ntypes=2, interpret=True).resize(st)
    _, data2 = build_strips(st_c, widened, box)
    assert int(data2.overflow[0]) == 0, int(data2.overflow[0])


def test_strip_seam_momentum_conserved():
    """Seam-ghost bands must be re-copied from their sources EVERY step
    (StripBackend.refresh_seam — the forward_comm analog). Ghost copies do
    not self-evolve correctly between rebuilds: band-edge ghosts have
    truncated neighborhoods, an O(1) force error that walks their positions
    and breaks action-reaction at the seam. Regression: the self-evolving
    design leaked ~2e-3 momentum units over 12 steps on this system; the
    per-step refresh holds it at f32 roundoff."""
    from tpusph.api import Simulation

    sim = Simulation(dim=2, screen=False)
    sim.backend_name = "strip"
    per = 24
    L = float(per)
    sim.create_box([0, 0, 0], [L, L, 1.0], periodic=(True, True, False),
                   ntypes=1)
    ax = np.arange(per, dtype=np.float32)
    g2 = np.stack(np.meshgrid(ax, ax, indexing="ij"), -1).reshape(-1, 2)
    g = np.concatenate([g2, np.zeros((len(g2), 1), np.float32)], 1)
    rng = np.random.default_rng(7)
    v = rng.normal(0, 0.35, g.shape).astype(np.float32)
    v[:, 2] = 0.0
    v -= v.mean(axis=0, keepdims=True)
    sim.add_particles(g, np.ones(len(g), np.int32), v=v, rho=1.0, e=1.0,
                      cv=1.0, rmass=1.0)
    sim.pair_rhosum(every=1)
    sim.pair_taitwater()
    sim.tables.set_taitwater(1, 1, rho0=1.0, c0=10.0, viscosity=0.3, h=3.0)
    sim.tables.set_rhosum(1, 1, h=3.0)
    sim.neighbor_skin = 0.5
    sim.dt = 5e-3
    sim.thermo(0)
    sim.run(12)
    assert isinstance(sim._ensure_runner().backend, StripBackend)
    vv = np.asarray(sim.get("v"), np.float64)
    assert np.abs(vv.sum(axis=0)).max() < 2e-4, vv.sum(axis=0)


def test_strip_empty_columns_no_false_violation():
    """Carved lattice with completely EMPTY xy-columns (the free-surface /
    boiling shape): a tile whose needed slot range in an empty neighbor
    column is EMPTY (hi_need < lo_need) must NOT fire the coverage check.
    Regression (ADVICE r3): the unclamped shortfall win_lo + dB - lo_need
    could be > 0 with zero truly missed rows, costing a spurious abort +
    frozen block + Mosaic recompile and permanently inflating the sticky
    _strip_extra margin floor. The clamped form bounds the shortfall by
    the needed extent, so empty ranges yield <= 0."""
    import jax.numpy as jnp
    from tpusph.state import ParticleState, Box
    from tpusph.params import PairTables

    rng = np.random.default_rng(17)
    ax16 = np.arange(16, dtype=np.float32)
    pts = np.stack(np.meshgrid(ax16, ax16, ax16, indexing="ij"),
                   -1).reshape(-1, 3)
    # carve: remove an x-slab of columns entirely (those xy columns are
    # EMPTY), and half-empty a y-slab so partially-empty columns appear too
    keep = ~((pts[:, 0] >= 6.0) & (pts[:, 0] < 10.0))
    half = (pts[:, 1] >= 12.0) & (pts[:, 2] >= 8.0)
    keep &= ~half
    pts = pts[keep].astype(np.float32)
    pts += rng.uniform(-0.05, 0.05, pts.shape).astype(np.float32)
    n = len(pts)
    st = ParticleState.from_arrays(
        pts, np.ones(n, np.int64), rmass=np.full(n, 0.5, np.float32),
        rho=np.ones(n, np.float32), e=np.ones(n, np.float32),
        capacity=((n + 127) // 128) * 128)
    box = Box.create([0, 0, 0], [16.0, 16.0, 16.0], (True,) * 3)

    geom = choose_strip_geometry(box, 3.0, 3, 0.5, x=pts)
    assert geom is not None, "carved system must still strip"
    sb = StripBackend(geom, box, ntypes=1, interpret=True)
    st_b, data = sb.init_aux(st, box)
    assert int(np.asarray(data.overflow)[0]) == 0, (
        int(np.asarray(data.overflow)[0]),
        np.asarray(jax.device_get(data.margin_short)))
    short = np.asarray(jax.device_get(data.margin_short))
    assert short.max() == 0, short

    # and the physics on the carved system still matches the cell grid
    tables = PairTables.zeros(1)
    tables.set_taitwater(1, 1, rho0=1.0, c0=10.0, viscosity=0.3, h=3.0)
    tables.set_rhosum(1, 1, h=3.0)
    spec = PhysicsSpec(dim=3, kernel=kernels.LUCY, tait=True, rhosum_every=1)
    out_s = sb.force_stage(st_b, tables, spec, box, data, istep=0)
    gg = gridlib.make_geometry(box, 3.0, 3, skin=0.5, cap=96)
    cgb = CellGridBackend(gg)
    st_c, data_c = cgb.init_aux(st, box)
    out_c = compute_forces(st_c, tables, spec, box, cgb, istep=0, aux=data_c)
    (tc,) = by_tag(out_c, "tag")
    (ts_,) = by_tag(out_s, "tag")
    np.testing.assert_array_equal(tc, ts_)
    for field, rtol, atol in (("rho", 2e-5, 1e-6), ("f", 2e-4, 5e-4)):
        (a,) = by_tag(out_c, field)
        (b,) = by_tag(out_s, field)
        np.testing.assert_allclose(b, a, rtol=rtol, atol=atol, err_msg=field)


@pytest.mark.parametrize("nblocks", [17, 300])
def test_delta_pack_roundtrip(nblocks):
    """The SMEM delta table is bit-packed (int8 x4 / int16 x2 per i32 word
    — what lets the 2-4M binding scale fit the ~1MB SMEM budget); the
    window index map's shift+mask unpack must reproduce every entry,
    including negative offsets and the lane that carries the sign bit."""
    from tpusph.ops.strip_pair import _pack_delta, _delta_pack

    rng = np.random.default_rng(3)
    ncols, nnbr = 7, 9
    lo, hi = -(nblocks - 1), nblocks - 1
    delta = rng.integers(lo, hi + 1,
                         size=(ncols, nnbr, nblocks)).astype(np.int32)
    pack = _delta_pack(nblocks)
    assert pack == (4 if nblocks <= 120 else 2)
    packed = np.asarray(jax.device_get(_pack_delta(jnp_asarray(delta),
                                                   nblocks)))
    bits = 32 // pack
    flat = delta.reshape(-1)
    for idx in rng.choice(flat.size, size=200, replace=False):
        word = packed[idx // pack]
        lane = (word >> (bits * (idx % pack))) & ((1 << bits) - 1)
        off = (int(lane) ^ (1 << (bits - 1))) - (1 << (bits - 1))
        assert off == flat[idx], (idx, off, flat[idx])


def jnp_asarray(a):
    import jax.numpy as jnp
    return jnp.asarray(a)


def test_strip_st_skip_slab_matches_cellgrid():
    """Spatially SEPARATED phases (z-slabs): the three-valued mix flag
    (strip_pair.StripBackend._mixed_flags) must produce far tiles at 0.0
    (force sweep runs the surface-tension-stripped body), dilation tiles
    at 0.5 (ST on, cgrad skipped), and interface tiles at 1.0 — and the
    strip force stage must still match cellgrid exactly on all of them.
    The random-type lattice tests mark every tile mixed, so only this
    test exercises the ST-skip branch of the strip force kernel."""
    rng = np.random.default_rng(3)
    dx = 0.5
    nxy, nz = 8, 48
    ax = np.arange(nxy) * dx
    az = np.arange(nz) * dx
    pts = np.stack(np.meshgrid(ax, ax, az, indexing="ij"),
                   -1).reshape(-1, 3)
    pts = pts + rng.uniform(-0.1 * dx, 0.1 * dx, pts.shape)
    n = len(pts)
    # phases split by z: interface planes at z = Lz/2 and (periodic) z = 0
    Lz = nz * dx
    types = np.where(pts[:, 2] < Lz / 2.0, 1, 2).astype(np.int32)
    v = rng.normal(0, 0.05, (n, 3)).astype(np.float32)

    from tpusph.state import ParticleState, Box
    from tpusph.params import PairTables
    st = ParticleState.from_arrays(
        pts.astype(np.float32), types, rmass=np.full(n, 0.1), v=v,
        rho=rng.uniform(0.9, 1.2, n).astype(np.float32),
        e=rng.uniform(0.5, 1.5, n).astype(np.float32),
        capacity=((n + 127) // 128) * 128)
    L = nxy * dx
    box = Box.create([0, 0, 0], [L, L, Lz], (True, True, True))
    tables = PairTables.zeros(2)
    h = 2.2 * dx
    for i in (1, 2):
        for j in range(i, 3):
            tables.set_taitwater(i, j, rho0=1.0, c0=6.0, viscosity=0.4,
                                 h=h)
            tables.set_rhosum(i, j, h=h)
            tables.set_heatconduction(i, j, d=0.15, h=0.9 * h)
    tables.set_surfacetension(1, 2, sigma=0.8, h=h)
    spec = PhysicsSpec(dim=3, kernel=kernels.WENDLAND_C2, tait=True,
                       heatconduction=True, surface_tension=True,
                       rhosum_every=1)

    geom = choose_strip_geometry(box, tables.max_cut(), 3, 0.2,
                                 x=pts.astype(np.float32))
    assert geom is not None
    sb = StripBackend(geom, box, ntypes=2, interpret=True)
    st_b, data = sb.init_aux(st, box)
    assert int(data.overflow[0]) == 0

    # the three-valued flag must actually exercise all three bands here
    vals = set(np.unique(np.asarray(data.mix)).tolist())
    assert 1.0 in vals, "interface tiles must be mixed"
    assert 0.0 in vals, (
        "slab test must contain far tiles (ST-stripped body) — "
        f"got flag values {vals}; enlarge nz")
    assert 0.5 in vals, "dilation band (ST on, cgrad skip) must appear"

    out_s = sb.force_stage(st_b, tables, spec, box, data, istep=0)
    out_c = run_cellgrid_stage(st, box, tables, spec)
    (tc,) = by_tag(out_c, "tag")
    (ts,) = by_tag(out_s, "tag")
    np.testing.assert_array_equal(tc, ts)
    for field, rtol, atol in (("rho", 2e-5, 1e-6), ("f", 2e-4, 5e-4),
                              ("drho", 2e-4, 1e-4), ("de", 2e-4, 5e-4)):
        (a,) = by_tag(out_c, field)
        (b,) = by_tag(out_s, field)
        np.testing.assert_allclose(b, a, rtol=rtol, atol=atol,
                                   err_msg=field)
