"""Kernel-side pair physics on (ROWS, W) tiles — shared by the banded
(ops/band_pair) and strip (ops/strip_pair) Pallas kernels.

The statement of record for the physics is ops/pair_terms.py (SURVEY §2.2-2.3
pair styles); this module mirrors it term by term in the tile shape the TPU
kernels use: an i-side of (ROWS, 1) columns against a j-side of (1, W) rows,
with per-particle factors HOISTED out of the pair tiles (EOS p/rho^2, sound
speeds, 1/rho, tension stress norms). Any change to a pair term must land in
pair_terms.py AND here (CLAUDE.md invariant); the backend equivalence tests
(tests/test_band.py, tests/test_strip.py, tests/test_pallas.py) enforce
agreement.

Table layout contract (pack_tables in ops/pallas_pair.py): 2D tables are
8-row-aligned (T1, T1) blocks; 1D tables are one 8-row block each with the
column form in rows [0, T1) and the row form in row 7.
"""

from __future__ import annotations

import jax.numpy as jnp

from tpusph import kernels
from tpusph.ops.pallas_pair import (
    RX, RY, RZ, RVX, RVY, RVZ, RRHO, RE, RM, RTYPE, RCGX, RCGY, RCGZ, RCV,
    _TABLES_1D, _TABLES_2D, _onehot, _onehot_t,
)
from tpusph.params import PhysicsSpec

_ORDER = list(_TABLES_2D) + list(_TABLES_1D)


def unpack_tables(tabs_ref, T1: int):
    """Slice the packed coefficient matrix into 2D blocks and 1D col/row
    vectors (VMEM views, no copies)."""
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
    return tabs2d, vec_cols, vec_rows


class Lookups:
    """Coefficient lookups bound to one kernel invocation: scalar-folded
    tables read from SMEM, type-dependent ones via one-hot MXU contractions.
    """

    def __init__(self, scal_ref, tabs2d, vec_cols, vec_rows,
                 spec: PhysicsSpec, T1: int):
        self.scal_ref = scal_ref
        self.tabs2d = tabs2d
        self.vec_cols = vec_cols
        self.vec_rows = vec_rows
        self.spec = spec
        self.T1 = T1
        self.oh_i = None     # set by hoist_i

    def scal(self, name):
        return self.scal_ref[_ORDER.index(name)]

    def ci_1d(self, name):
        """(ROWS, 1) per-i coefficient."""
        if name in self.spec.scalar_tables:
            return self.scal(name)
        return jnp.dot(self.oh_i, self.vec_cols[name],
                       preferred_element_type=jnp.float32)

    def cj_1d(self, name, oh_jt):
        """(1, W) per-j coefficient."""
        if name in self.spec.scalar_tables:
            return self.scal(name)
        return jnp.dot(self.vec_rows[name], oh_jt,
                       preferred_element_type=jnp.float32)

    def c2d(self, name, oh_jt):
        """(ROWS, W) pairwise coefficient."""
        if name in self.spec.scalar_tables:
            return self.scal(name)
        return jnp.dot(
            jnp.dot(self.oh_i, self.tabs2d[name],
                    preferred_element_type=jnp.float32),
            oh_jt, preferred_element_type=jnp.float32)


def _eos_over_rhosq(rho, e, rmass, rho0, b, gamma, spec: PhysicsSpec):
    """p/rho^2 per particle — hoisted EOS; mirrors
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


def hoist_i(i_tile, lk: Lookups, spec: PhysicsSpec, sweep: str,
            sentinel_dead: bool = False):
    """Per-i quantities shared across all neighbor windows of one i-tile
    (sanitized for dead rows). Returns a dict consumed by tile_part_sums;
    sets lk.oh_i as a side effect.

    ``sentinel_dead``: the layout builder guarantees dead slots carry
    far-sentinel positions (band_pair.DEAD_X) and safe denominators
    (rho = m = cv = 1), so pair liveness is a pure DISTANCE test and the
    per-lane alive compares/selects are dropped (build_slots/build_strips
    contract; the mxu_compact prototype's zero-padded gather tiles keep
    the masked path)."""

    def icol(r):
        return i_tile[:, r:r + 1]

    lk.oh_i = _onehot(i_tile[:, RTYPE], lk.T1)

    h = {}
    if sentinel_dead:
        h["alive_i"] = None
        h["rho_i"] = icol(RRHO)
        h["m_i"] = icol(RM)
    else:
        it = icol(RTYPE)
        h["alive_i"] = it > 0.5
        h["rho_i"] = jnp.where(h["alive_i"], icol(RRHO), 1.0)
        h["m_i"] = jnp.where(h["alive_i"], icol(RM), 1.0)
    h["inv_rho_i"] = 1.0 / h["rho_i"]
    e_i = icol(RE)
    if sweep == "force" and (spec.tait or spec.morris
                             or spec.ideal_gas or spec.lj):
        h["fi"] = _eos_over_rhosq(
            h["rho_i"], e_i, h["m_i"], lk.ci_1d("rho0"), lk.ci_1d("tait_b"),
            lk.ci_1d("gas_gamma"), spec)
        if spec.lj or (spec.ideal_gas and not spec.tait):
            h["ci"] = _gas_sound_speed(h["rho_i"], e_i, h["m_i"],
                                       lk.ci_1d("gas_gamma"), spec)
        else:
            h["ci"] = lk.ci_1d("c0")
    if sweep == "force" and spec.surface_tension:
        cgx_i, cgy_i, cgz_i = icol(RCGX), icol(RCGY), icol(RCGZ)
        cg2_i = cgx_i * cgx_i + cgy_i * cgy_i + cgz_i * cgz_i
        inv_nr_i = 1.0 / (jnp.sqrt(jnp.maximum(cg2_i, 1e-12))
                          * h["rho_i"] * h["rho_i"])
        h["st"] = (cgx_i, cgy_i, cgz_i, cg2_i * inv_nr_i / spec.dim, inv_nr_i)
    if sweep == "cgrad":
        h["color"] = lk.ci_1d("color")
    return h


def fold_width(W: int) -> int:
    """Lane width of tile_part_sums' partial outputs. Full (ROWS, W) ->
    (ROWS,) cross-lane reductions are a ~7-step shuffle+add tree per vreg
    row — measured as the dominant per-tile FIXED cost of the strip kernel
    (~5.7 us/tile at 9 windows x 5-6 outputs). So per window the sums only
    FOLD to one 128-lane vreg (pure elementwise vreg adds); the caller
    accumulates (ROWS, K) across windows and pays the tree ONCE per output
    per tile (jnp.sum(acc, axis=1))."""
    return 128 if (W % 128 == 0) else W


def _fold(x):
    W = x.shape[1]
    if W % 128:
        return x
    out = x[:, 0:128]
    for k in range(1, W // 128):
        out = out + x[:, 128 * k:128 * (k + 1)]
    return out


def tile_part_sums(i_tile, j_tile, shift, hoist, lk: Lookups,
                   spec: PhysicsSpec, sweep: str, col_shift_baked: bool,
                   sentinel_dead: bool = False):
    """Physics of one (ROWS x W) neighbor tile; returns the per-sweep tuple
    of (ROWS, fold_width(W)) lane-folded partial sums (see fold_width).
    Mirrors ops/pair_terms term by term.

    ``shift`` is (sx, sy): plane-axis periodic image shifts for this
    neighbor column; the column-axis shift is baked into the window by the
    XLA-side band/window builder (``col_shift_baked`` documents it).
    ``sentinel_dead``: see hoist_i — pair liveness by distance alone."""
    del col_shift_baked
    w_fn = kernels.kernel_w(spec.kernel, spec.dim)
    wfd_fn = kernels.kernel_wfd(spec.kernel, spec.dim)
    rows = i_tile.shape[0]
    W = j_tile.shape[1]

    def icol(r):
        return i_tile[:, r:r + 1]       # (ROWS, 1)

    def jrow(r):
        return j_tile[r, :][None, :]    # (1, W)

    # LAZY one-hot: sweeps whose every table is scalar-folded (the rho
    # sweep with a uniform cut_rho — the common case) must not pay the
    # (T1, W) compare/convert per window; building it on first real
    # lookup makes that a structural guarantee instead of trusting DCE.
    _oh = []

    def oh_jt():
        if not _oh:
            _oh.append(_onehot_t(j_tile[RTYPE, :], lk.T1))   # (T1, W)
        return _oh[0]

    def c2d(name):
        if name in lk.spec.scalar_tables:
            return lk.scal(name)
        return lk.c2d(name, oh_jt())

    def cj_1d(name):
        if name in lk.spec.scalar_tables:
            return lk.scal(name)
        return lk.cj_1d(name, oh_jt())

    alive_i = hoist["alive_i"]
    rho_i = hoist["rho_i"]
    m_i = hoist["m_i"]
    inv_rho_i = hoist["inv_rho_i"]

    sx, sy = shift
    dx0 = icol(RX) - (jrow(RX) + sx)
    dx1 = icol(RY) - (jrow(RY) + sy)
    dx2 = icol(RZ) - jrow(RZ)
    rsq = dx0 * dx0 + dx1 * dx1 + dx2 * dx2
    if sentinel_dead:
        # dead slots sit at the far sentinel (rsq ~ 1e13 >> any cut^2) and
        # coinciding sentinels self-exclude via rsq > 1e-12: the distance
        # test IS the liveness test — no per-lane alive compares/selects
        mask = rsq > 1e-12
        rho_j = jrow(RRHO)
        m_j = m_j_raw = jrow(RM)
    else:
        alive_j = jrow(RTYPE) > 0.5
        mask = (alive_i & alive_j) & (rsq > 1e-12)
        m_j_raw = jrow(RM)
        rho_j = jnp.where(alive_j, jrow(RRHO), 1.0)
        m_j = jnp.where(alive_j, m_j_raw, 1.0)
    r = jnp.sqrt(jnp.maximum(rsq, 1e-30))
    inv_rho_j = 1.0 / rho_j
    # NOTE: rows >= 8 (RVX.., RE, RCG.., RCV) may only be read inside the
    # force branch — the rho/cgrad sweeps receive a narrow (8, W) window
    # block (see the F-row ordering comment in pallas_pair)

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
        mass = 1.0 if spec.rhosum_nd else m_j_raw
        return (_fold(jnp.where(live, mass * w, 0.0)),)

    if sweep == "cgrad":
        cut, live, wfd = term_ctx("cut_tension")
        coef = jnp.where(
            live,
            c2d("sigma") * (m_j * inv_rho_j)
            * (cj_1d("color") - hoist["color"]) * wfd,
            0.0)
        return (_fold(coef * dx0), _fold(coef * dx1), _fold(coef * dx2))

    # ---- force sweep ----
    f0 = f1 = f2 = drho = de = jnp.zeros((rows, W), jnp.float32)
    e_j = jrow(RE)
    dv0 = icol(RVX) - jrow(RVX)
    dv1 = icol(RVY) - jrow(RVY)
    dv2 = icol(RVZ) - jrow(RVZ)
    dvdr = dv0 * dx0 + dv1 * dx1 + dv2 * dx2

    if spec.tait or spec.morris or spec.ideal_gas or spec.lj:
        cut, live, wfd = term_ctx("cut")
        fi = hoist["fi"]                         # (ROWS, 1) hoisted
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
            ci = hoist["ci"]                     # (ROWS, 1) hoisted
            if spec.lj or (spec.ideal_gas and not spec.tait):
                cj = _gas_sound_speed(rho_j, e_j, m_j,
                                      cj_1d("gas_gamma"), spec)
            else:
                cj = cj_1d("c0")
            # mu and the Monaghan prefactor fused into ONE per-lane divide
            # (divides are the slow VPU op): matches pair_terms.force_pair
            # algebraically
            fvisc = jnp.where(
                dvdr < 0.0,
                -c2d("visc") * (ci + cj) * h_ij * dvdr
                / ((rsq + 0.01 * h_ij * h_ij) * (rho_i + rho_j)),
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
        cgx_i, cgy_i, cgz_i, a_i, b_i = hoist["st"]
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

    outs = (_fold(f0), _fold(f1), _fold(f2), _fold(drho), _fold(de))
    if spec.virial:
        # pair virial sum_j f_ij . r_ij — from the ACCUMULATED force tiles,
        # so every term (pressure/viscosity along dx and dv, capillary
        # stress) contributes exactly its f.r (mirrors pair_terms.force_pair)
        outs = outs + (_fold(f0 * dx0 + f1 * dx1 + f2 * dx2),)
    return outs


def rho_self_in_kernel(spec: PhysicsSpec) -> bool:
    """True when the tile kernels fold the rhosum SELF term m_i W(0,h)
    into the rho sweep's output write (band_pair.force_stage then skips
    its XLA per-type pass — measured stage glue, PERFORMANCE.md r4).
    Only the scalar-folded cut_rho case qualifies: a per-type self cut
    would need the DIAGONAL of the 2D table per i-row, which costs more
    in-kernel (two one-hot contractions) than the XLA pass it replaces."""
    return "cut_rho" in spec.scalar_tables


def rho_self(i_tile, lk: Lookups, spec: PhysicsSpec):
    """(ROWS,) rhosum self term under rho_self_in_kernel: m_i * W(0, h)
    for the mass form, W(0, h) for the multiphase number-density form
    (the x m_i happens once on the full sum outside — see
    band_pair.force_stage). Mirrors the XLA statement there; dead rows
    produce a nonzero value that the caller's alive mask discards."""
    w_fn = kernels.kernel_w(spec.kernel, spec.dim)
    cut = lk.scal("cut_rho")
    w0 = jnp.where(cut > 0.0,
                   w_fn(jnp.zeros(()), jnp.maximum(cut, 1e-30)), 0.0)
    if spec.rhosum_nd:
        return jnp.broadcast_to(w0, (i_tile.shape[0],))
    return i_tile[:, RM] * w0


SWEEP_N_OUT = {"rho": 1, "cgrad": 3, "force": 5}


def sweep_n_out(sweep: str, spec: PhysicsSpec) -> int:
    n = SWEEP_N_OUT[sweep]
    return n + 1 if (sweep == "force" and spec.virial) else n
