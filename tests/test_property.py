"""Hypothesis property tests: the cell-grid backend equals the dense O(N^2)
oracle on ARBITRARY random systems (SURVEY §4: property tests with the
brute-force pair reference as oracle)."""

import numpy as np
import pytest
from hypothesis import assume, given, settings, strategies as st

from tpusph import grid as gridlib
from tpusph import kernels
from tpusph.ops import dense
from tpusph.ops.cellgrid import CellGridBackend
from tpusph.params import PairTables, PhysicsSpec
from tpusph.state import Box, ParticleState


@settings(max_examples=12, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    n=st.integers(8, 80),
    dim=st.sampled_from([2, 3]),
    box_l=st.floats(1.5, 5.0),
    h=st.floats(0.4, 1.2),
    periodic=st.booleans(),
)
def test_cellgrid_equals_dense_property(seed, n, dim, box_l, h, periodic):
    # below 2 cutoffs of periodic box, the cell grid correctly sees
    # self-images that the dense minimum-image oracle CANNOT represent
    # (covered by test_cellgrid_small_periodic_box_self_image instead)
    assume(box_l > 2.3 * h)
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, box_l, size=(n, 3)).astype(np.float32)
    v = rng.normal(0, 0.1, size=(n, 3)).astype(np.float32)
    if dim == 2:
        x[:, 2] = 0.0
        v[:, 2] = 0.0
    st_ = ParticleState.from_arrays(
        x, rng.integers(1, 3, n), rmass=np.full(n, 0.2), v=v,
        rho=rng.uniform(0.8, 1.4, n).astype(np.float32),
        e=rng.uniform(0.5, 2.0, n).astype(np.float32),
        capacity=128)
    per = (periodic, periodic, periodic and dim == 3)
    box = Box.create([0, 0, 0], [box_l, box_l, box_l if dim == 3 else 1.0],
                     per)
    tables = PairTables.zeros(2)
    for i in (1, 2):
        for j in (i, 2):
            tables.set_taitwater(i, j, rho0=1.0, c0=5.0, viscosity=0.3, h=h)
            tables.set_heatconduction(i, j, d=0.1, h=h)
    spec = PhysicsSpec(dim=dim, kernel=kernels.LUCY, tait=True,
                       heatconduction=True)

    f_d, drho_d, de_d = dense.force(st_, tables, spec, box)

    geom = gridlib.make_geometry(box, tables.max_cut(), dim, skin=0.1,
                                 cap=128)
    be = CellGridBackend(geom)
    st_s, data = be.init_aux(st_, box)
    assert int(data.overflow[0]) == 0
    f_g, drho_g, de_g = be.force(st_s, tables, spec, box, aux=data)

    # map sorted outputs back to tag order
    tags_s = np.asarray(st_s.tag)
    tags_o = np.asarray(st_.tag)
    pos = {t: i for i, t in enumerate(tags_s)}
    idx = np.array([pos[t] for t in tags_o[:n]])

    scale = max(float(np.abs(np.asarray(f_d)).max()), 1e-3)
    np.testing.assert_allclose(np.asarray(f_g)[idx], np.asarray(f_d)[:n],
                               rtol=3e-4, atol=3e-4 * scale)
    de_scale = max(float(np.abs(np.asarray(de_d)).max()), 1e-3)
    np.testing.assert_allclose(np.asarray(de_g)[idx], np.asarray(de_d)[:n],
                               rtol=3e-4, atol=3e-4 * de_scale)
