"""MXU candidate-compaction force sweep (ops/mxu_compact, r3 VERDICT #1):
must reproduce the production strip force sweep exactly up to f32 summation
order — the compaction reorders the per-pair partial sums but drops no pair
(ball-box filter with reach = max cutoff over CURRENT positions)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpusph import kernels
from tpusph.params import PairTables, PhysicsSpec
from tpusph.state import Box, ParticleState
from tpusph.ops.strip_pair import StripBackend, choose_strip_geometry
from tpusph.ops.band_pair import _state_fields
from tpusph.ops.pallas_pair import pack_tables, OFX, OFY, OFZ, ODRHO, ODE
from tpusph.ops.mxu_compact import (
    make_compact_force_kernel, measure_union_cap, OCNT,
)


def _system(seed=7, n_side=16):
    rng = np.random.default_rng(seed)
    ax = np.arange(n_side, dtype=np.float32)
    pts = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"),
                   -1).reshape(-1, 3)
    pts = (pts + rng.uniform(-0.2, 0.2, pts.shape)).astype(np.float32)
    n = len(pts)
    types = np.where(pts[:, 2] < n_side / 2, 1, 2).astype(np.int64)
    st = ParticleState.from_arrays(
        pts, types, rmass=np.full(n, 0.5, np.float32),
        v=rng.normal(0, 0.1, (n, 3)).astype(np.float32),
        rho=np.ones(n, np.float32),
        e=rng.uniform(1.0, 2.0, n).astype(np.float32),
        capacity=((n + 127) // 128) * 128)
    box = Box.create([0, 0, 0], [float(n_side)] * 3, (True,) * 3)
    tables = PairTables.zeros(2)
    for i in (1, 2):
        for j in range(i, 3):
            tables.set_taitwater(i, j, rho0=1.0 if i == 1 else 0.5, c0=10.0,
                                 viscosity=0.3, h=3.0)
            tables.set_heatconduction(i, j, d=0.1, h=3.0)
    spec = PhysicsSpec(dim=3, kernel=kernels.LUCY, tait=True,
                      heatconduction=True, continuity=True)
    return st, box, tables, spec


def test_compact_force_matches_strip():
    st, box, tables, spec = _system()
    x = np.asarray(st.x)[np.asarray(st.type) > 0]
    geom = choose_strip_geometry(box, tables.max_cut(), 3, 0.5, x=x)
    assert geom is not None
    sb = StripBackend(geom, box, ntypes=2, interpret=True)
    st_b, aux = sb.init_aux(st, box)

    fields = _state_fields(st_b)
    tabs = pack_tables(tables)
    i_arr = sb._pack_i(fields)
    win = sb._pack_band(fields)

    ref = sb._call(spec, "force")(tabs, i_arr, win, aux.delta)
    ref = np.asarray(ref.reshape(geom.n_slots, 8))

    cut = tables.max_cut()
    P = measure_union_cap(np.asarray(st_b.x)[np.asarray(st_b.type) > 0],
                          geom, box, cut)
    assert P >= 128
    call = make_compact_force_kernel(geom, spec, 2, P, cut, interpret=True)
    out = np.asarray(call(tabs, i_arr, win, aux.delta
                          ).reshape(geom.n_slots, 8))

    # no compaction overflow anywhere
    assert out[:, OCNT].max() == 0.0, out[:, OCNT].max()
    alive = np.asarray(st_b.type) > 0
    for row, name, tol in ((OFX, "fx", 5e-4), (OFY, "fy", 5e-4),
                           (OFZ, "fz", 5e-4), (ODRHO, "drho", 1e-4),
                           (ODE, "de", 5e-4)):
        np.testing.assert_allclose(out[alive, row], ref[alive, row],
                                   rtol=2e-4, atol=tol, err_msg=name)


def test_union_cap_reasonable():
    """P must land near the ball-geometry estimate, far below the window
    lane budget it replaces."""
    st, box, tables, spec = _system()
    x = np.asarray(st.x)[np.asarray(st.type) > 0]
    geom = choose_strip_geometry(box, tables.max_cut(), 3, 0.5, x=x)
    P = measure_union_cap(x, geom, box, tables.max_cut())
    lanes_now = geom.nnbr * (-(-geom.w // 128) * 128)
    assert P % 128 == 0
    assert P < lanes_now, (P, lanes_now)
