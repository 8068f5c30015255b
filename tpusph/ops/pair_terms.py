"""Per-pair SPH physics, stated once and shared by every backend.

Shape-polymorphic: the ``i`` side and ``j`` side are dicts of arrays with any
common broadcastable batch shape ``(...,)`` (vectors ``(..., 3)``). Backends
produce those batches differently — dense (N, N), cell grid (CAP, S*CAP),
Pallas tiles — but the physics below is identical.

Coefficients arrive as a ``coefs`` dict of PAIRWISE-shaped arrays (built by
``make_pair_coefs`` from integer type indexing in the XLA backends, or by
one-hot MXU contractions in the Pallas kernel where integer gathers don't
lower well).

Equation provenance (SURVEY.md §2.2–2.3; upstream USER-SPH pair styles):

  sph/rhosum              rho_i = sum_j m_j W(r_ij)   (self term included)
  sph/taitwater           Tait EOS P = B[(rho/rho0)^7 - 1], B = c0^2 rho0/7;
                          force -m_i m_j (P_i/rho_i^2 + P_j/rho_j^2 + Pi_ij) wfd dx
                          with Monaghan artificial viscosity Pi_ij for
                          approaching pairs; continuity drho_i += m_j v_ij.dx wfd;
                          viscous/compressive heating into de.
  sph/taitwater/morris    same EOS; Morris (1997) laminar viscosity along dv.
  sph/idealgas            P = (gamma - 1) rho (e / m).
  sph/heatconduction      de_i += (2 m_i m_j/(m_i+m_j)) ((rho_i+rho_j)/(rho_i rho_j))
                                  D (e_i - e_j) wfd      (Cleary–Monaghan form)
  sph/colorgradient       cg_i = sum_j sigma_ij (m_j/rho_j)(c_j - c_i) grad_i W
  sph/surfacetension      Hu & Adams (2006) capillary stress
                          Pi^{ab} = (|cg|^2 d^{ab}/dim - cg^a cg^b)/max(|cg|,eps)
                          f_i += m_i m_j (Pi_i/rho_i^2 + Pi_j/rho_j^2).dx wfd
                          (sigma folded into cg; sweep over ALL phase pairs)
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from tpusph import kernels
from tpusph.params import PairTables, PhysicsSpec

EPS_CG = 1e-6  # |colorgradient| floor for the capillary stress

# sph/lj EOS (pair_sph_lj.cpp — SURVEY §2.2): LJ-based gas pressure. We use
# the van-der-Waals form calibrated to the LJ critical point (Tc* = 1.312,
# rhoc* = 0.316 in reduced units, kB = m = 1): b = 1/(3 rhoc*),
# a = (9/8) Tc*/rhoc*. Parameter-free like the reference's fitted EOS;
# reduces toward ideal-gas at low density. T is derived from the internal
# energy via the gas_gamma table, as in sph/idealgas.
LJ_VDW_A = 4.6709
LJ_VDW_B = 1.0549
LJ_DENOM_FLOOR = 0.05  # (1 - b rho) floor: keeps P finite past packing

# which tables the force/cg sweeps need, by arity
PAIR_TABLES_2D = ("cut", "visc", "heat_D", "cut_heat", "sigma", "cut_tension",
                  "tsat")
PAIR_TABLES_1D = ("rho0", "tait_b", "c0", "gas_gamma", "color")


def make_pair_coefs(tables: PairTables, it, jt, spec: PhysicsSpec) -> Dict:
    """Pairwise coefficient arrays via integer type indexing (XLA backends).
    it/jt are broadcastable integer type arrays."""
    c = {}
    for name in PAIR_TABLES_2D:
        c[name] = getattr(tables, name)[it, jt]
    for name in PAIR_TABLES_1D:
        tab = getattr(tables, name)
        c[name + "_i"] = tab[it]
        c[name + "_j"] = tab[jt]
    return c


def make_pair_coefs_onehot(tables: PairTables, oh_i, oh_j,
                           spec: PhysicsSpec) -> Dict:
    """Pairwise coefficients via one-hot contractions — MXU-friendly for
    Pallas (no integer gathers). oh_i: (..., I, T+1); oh_j: (..., J, T+1);
    2D results have shape (..., I, J), 1D results (..., I, 1) / (..., 1, J).
    """
    c = {}
    for name in PAIR_TABLES_2D:
        tab = getattr(tables, name)
        c[name] = jnp.einsum("it,tu,ju->ij", oh_i, tab, oh_j,
                             preferred_element_type=jnp.float32)
    for name in PAIR_TABLES_1D:
        tab = getattr(tables, name)
        c[name + "_i"] = (oh_i @ tab)[..., :, None]
        c[name + "_j"] = (oh_j @ tab)[..., None, :]
    return c


def gather_fields(state, idx) -> Dict[str, jnp.ndarray]:
    """Gather the per-particle fields a pair sweep needs, at indices ``idx``."""
    return dict(
        x=state.x[idx],
        vest=state.vest[idx],
        rho=state.rho[idx],
        e=state.e[idx],
        cv=state.cv[idx],
        rmass=state.rmass[idx],
        type=state.type[idx],
    )


def eos_pressure_over_rhosq(rho, e, rmass, rho0, tait_b, gamma,
                            spec: PhysicsSpec):
    """P/rho^2 for the enabled EOS (Tait, ideal gas, or LJ). Inputs
    pre-sanitized (rho > 0 on dead slots is the caller's job)."""
    if spec.lj:
        t = (gamma - 1.0) * e / rmass
        denom = jnp.maximum(1.0 - LJ_VDW_B * rho, LJ_DENOM_FLOOR)
        p = rho * t / denom - LJ_VDW_A * rho * rho
    elif spec.ideal_gas and not spec.tait:
        p = (gamma - 1.0) * rho * e / rmass
    else:
        q = rho / rho0
        q3 = q * q * q
        p = tait_b * (q3 * q3 * q - 1.0)
    return p / (rho * rho), p


def lj_sound_speed(rho, e, rmass, gamma):
    """c = sqrt(max(gamma T/(1-b rho)^2 - 2 a rho, 0)) — the isothermal vdW
    stiffness with the adiabatic gamma factor, clamped past the spinodal."""
    t = (gamma - 1.0) * e / rmass
    denom = jnp.maximum(1.0 - LJ_VDW_B * rho, LJ_DENOM_FLOOR)
    return jnp.sqrt(jnp.maximum(gamma * t / (denom * denom)
                                - 2.0 * LJ_VDW_A * rho, 0.0))


def rho_summation_pair(pj, r, cut_ij, mask, spec: PhysicsSpec):
    """Contribution of j to rho_i: m_j W(r) (sph/rhosum), or W(r) under the
    multiphase number-density form (rho_i = m_i sum W — spec.rhosum_nd;
    the caller multiplies by m_i after adding the self term)."""
    w = kernels.kernel_w(spec.kernel, spec.dim)(r, jnp.maximum(cut_ij, 1e-30))
    mass = 1.0 if spec.rhosum_nd else pj["rmass"]
    return jnp.where(mask & (cut_ij > 0.0), mass * w, 0.0)


def color_gradient_pair(pi, pj, dx, r, coefs, mask, spec: PhysicsSpec):
    """sigma_ij (m_j/rho_j)(c_j - c_i) grad_i W contribution to cg_i,
    shape (..., 3). sigma is folded in here: it's only nonzero across phases,
    exactly where c_j - c_i is; the capillary stress is linear in |cg| so the
    force pass needs no further sigma factor."""
    cut_ij = coefs["cut_tension"]
    live = mask & (cut_ij > 0.0)
    wfd = kernels.kernel_wfd(spec.kernel, spec.dim)(r, jnp.maximum(cut_ij, 1e-30))
    rho_j = jnp.where(live, pj["rho"], 1.0)
    coef = jnp.where(
        live,
        coefs["sigma"] * (pj["rmass"] / rho_j)
        * (coefs["color_j"] - coefs["color_i"]) * wfd,
        0.0)
    return coef[..., None] * dx


def _capillary_stress_dot_dx(cg, dx, dim):
    """(Pi . dx) for Hu–Adams stress Pi = (|cg|^2 I/dim - cg cg^T)/max(|cg|, eps).
    cg: (..., 3); dx: (..., 3) -> (..., 3)."""
    cg2 = jnp.sum(cg * cg, axis=-1)
    norm = jnp.sqrt(jnp.maximum(cg2, EPS_CG * EPS_CG))
    cg_dot_dx = jnp.sum(cg * dx, axis=-1)
    return (cg2[..., None] * dx / dim - cg_dot_dx[..., None] * cg) / norm[..., None]


def force_pair(pi, pj, dx, rsq, mask, coefs, spec: PhysicsSpec,
               cg_i=None, cg_j=None):
    """All force-sweep pair terms fused: returns dict with
    f (..., 3), drho (...), de (...) — contributions TO particle i.

    ``dx = x_i - x_j`` (periodic image already applied), ``rsq = |dx|^2``.
    ``mask`` excludes self pairs and dead slots. No Newton halving: each side
    computes its own full sum (SURVEY.md §7.2 design decision — trades 2x
    FLOPs for deleting the reverse-comm scatter).
    """
    r = jnp.sqrt(jnp.maximum(rsq, 1e-30))

    f = jnp.zeros_like(dx)
    drho = jnp.zeros(rsq.shape, rsq.dtype)
    de = jnp.zeros(rsq.shape, rsq.dtype)

    wfd_fn = kernels.kernel_wfd(spec.kernel, spec.dim)

    mi, mj = pi["rmass"], pj["rmass"]
    dv = pi["vest"] - pj["vest"]
    dvdr = jnp.sum(dv * dx, axis=-1)

    if spec.tait or spec.morris or spec.ideal_gas or spec.lj:
        cut_ij = coefs["cut"]
        live = mask & (rsq < cut_ij * cut_ij) & (cut_ij > 0.0)
        wfd = jnp.where(live, wfd_fn(r, jnp.maximum(cut_ij, 1e-30)), 0.0)
        rho_i = jnp.where(live, pi["rho"], 1.0)
        rho_j = jnp.where(live, pj["rho"], 1.0)
        m_i = jnp.where(live, mi, 1.0)
        m_j = jnp.where(live, mj, 1.0)
        fi, _ = eos_pressure_over_rhosq(
            rho_i, pi["e"], m_i, coefs["rho0_i"], coefs["tait_b_i"],
            coefs["gas_gamma_i"], spec)
        fj, _ = eos_pressure_over_rhosq(
            rho_j, pj["e"], m_j, coefs["rho0_j"], coefs["tait_b_j"],
            coefs["gas_gamma_j"], spec)

        if spec.morris:
            # Morris laminar viscosity: force along dv, not dx.
            fvisc_coef = 2.0 * coefs["visc"] / (rho_i * rho_j)
            fvisc = jnp.where(live, m_i * m_j * fvisc_coef * wfd, 0.0)
            fpair = jnp.where(live, -m_i * m_j * (fi + fj) * wfd, 0.0)
            f = f + fpair[..., None] * dx + fvisc[..., None] * dv
            de = de + jnp.where(
                live,
                -0.5 * (fpair * dvdr + fvisc * jnp.sum(dv * dv, axis=-1)),
                0.0,
            )
        else:
            # Monaghan artificial viscosity for approaching pairs.
            h_ij = jnp.maximum(cut_ij, 1e-30)
            ci = coefs["c0_i"]
            cj = coefs["c0_j"]
            if spec.lj:
                gi, gj = coefs["gas_gamma_i"], coefs["gas_gamma_j"]
                ci = lj_sound_speed(rho_i, pi["e"], m_i, gi)
                cj = lj_sound_speed(rho_j, pj["e"], m_j, gj)
            elif spec.ideal_gas and not spec.tait:
                # idealgas style: c = sqrt(gamma(gamma-1) e/m)
                gi, gj = coefs["gas_gamma_i"], coefs["gas_gamma_j"]
                ci = jnp.sqrt(jnp.maximum(gi * (gi - 1.0) * pi["e"] / m_i, 0.0))
                cj = jnp.sqrt(jnp.maximum(gj * (gj - 1.0) * pj["e"] / m_j, 0.0))
            # mu = h dvdr/(rsq + 0.01 h^2) and the Monaghan prefactor
            # fused into ONE divide (kernel mirrors match this form)
            fvisc = jnp.where(
                dvdr < 0.0,
                -coefs["visc"] * (ci + cj) * h_ij * dvdr
                / ((rsq + 0.01 * h_ij * h_ij) * (rho_i + rho_j)),
                0.0,
            )
            fpair = jnp.where(live, -m_i * m_j * (fi + fj + fvisc) * wfd, 0.0)
            f = f + fpair[..., None] * dx
            de = de + jnp.where(live, -0.5 * fpair * dvdr, 0.0)

        if spec.continuity:
            drho = drho + jnp.where(live, m_j * dvdr * wfd, 0.0)

    if spec.heatconduction or spec.heat_phasechange:
        cut_h = coefs["cut_heat"]
        live = mask & (rsq < cut_h * cut_h) & (cut_h > 0.0)
        wfd = jnp.where(live, wfd_fn(r, jnp.maximum(cut_h, 1e-30)), 0.0)
        rho_i = jnp.where(live, pi["rho"], 1.0)
        rho_j = jnp.where(live, pj["rho"], 1.0)
        m_i = jnp.where(live, mi, 1.0)
        m_j = jnp.where(live, mj, 1.0)
        coef = (2.0 * m_i * m_j / (m_i + m_j)) * ((rho_i + rho_j) / (rho_i * rho_j))
        ediff = pi["e"] - pj["e"]
        if spec.heat_phasechange:
            # sph/heatconduction/phasechange (SURVEY §2.3 [M], expected
            # src/USER-SPH/pair_sph_heatconduction_phasechange.cpp): pairs
            # with tsat > 0 (set on the liquid/vapor cross pair) conduct
            # against the saturation point cv_i*T_sat instead of e_j —
            # pinning the interface to T_sat. The pairwise energy imbalance
            # is the latent-heat channel consumed by fix phase_change.
            tsat = coefs["tsat"]
            ediff = jnp.where(tsat > 0.0, pi["e"] - pi["cv"] * tsat, ediff)
        de = de + jnp.where(live, coef * coefs["heat_D"] * ediff * wfd, 0.0)

    if spec.surface_tension:
        cut_t = coefs["cut_tension"]
        live = mask & (rsq < cut_t * cut_t) & (cut_t > 0.0)
        wfd = jnp.where(live, wfd_fn(r, jnp.maximum(cut_t, 1e-30)), 0.0)
        rho_i = jnp.where(live, pi["rho"], 1.0)
        rho_j = jnp.where(live, pj["rho"], 1.0)
        m_i = jnp.where(live, mi, 1.0)
        m_j = jnp.where(live, mj, 1.0)
        # Hu & Adams inter-particle form (sigma already inside cg):
        #   f_i += m_i m_j (Pi_i/rho_i^2 + Pi_j/rho_j^2) . dx * wfd
        # summed over ALL pairs within cut_tension — the stress divergence
        # needs same-phase neighbors, not just cross-phase ones.
        pi_dx = _capillary_stress_dot_dx(cg_i, dx, spec.dim) / (rho_i * rho_i)[..., None]
        pj_dx = _capillary_stress_dot_dx(cg_j, dx, spec.dim) / (rho_j * rho_j)[..., None]
        f = f + jnp.where(live, m_i * m_j * wfd, 0.0)[..., None] * (pi_dx + pj_dx)

    out = dict(f=f, drho=drho, de=de)
    if spec.virial:
        # pair virial contribution to i: f_ij . r_ij over every term that
        # produced force (pressure/viscosity along dx AND dv, capillary
        # stress) — thermo pressure P = (sum m v^2 + 0.5 sum_i vir_i)/(dim V)
        out["vir"] = jnp.sum(f * dx, axis=-1)
    return out
