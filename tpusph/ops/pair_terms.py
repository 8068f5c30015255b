"""Per-pair SPH physics, stated once and shared by every backend.

Shape-polymorphic: the ``i`` side and ``j`` side are dicts of arrays with any
common broadcastable batch shape ``(...,)`` (vectors ``(..., 3)``). Backends
produce those batches differently — dense (N, N), neighbor list (N, K),
Pallas tiles (CAP, 27*CAP) — but the physics below is identical.

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
  sph/colorgradient       cg_i = sum_j (m_j/rho_j)(c_j - c_i) grad_i W
  sph/surfacetension      Hu & Adams (2006) capillary stress
                          Pi^{ab} = (|cg|^2 d^{ab}/dim - cg^a cg^b)/max(|cg|,eps)
                          f_i += sigma m_i m_j (Pi_i/rho_i^2 + Pi_j/rho_j^2).dx wfd
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp

from tpusph import kernels
from tpusph.params import PairTables, PhysicsSpec

EPS_CG = 1e-6  # |colorgradient| floor for the capillary stress


def gather_fields(state, idx) -> Dict[str, jnp.ndarray]:
    """Gather the per-particle fields a pair sweep needs, at indices ``idx``."""
    return dict(
        x=state.x[idx],
        vest=state.vest[idx],
        rho=state.rho[idx],
        e=state.e[idx],
        rmass=state.rmass[idx],
        type=state.type[idx],
    )


def eos_pressure_over_rhosq(rho, e, rmass, ptype, tables: PairTables, spec: PhysicsSpec):
    """P/rho^2 per particle for the enabled EOS (Tait or ideal gas).

    Inputs are pre-sanitized (rho > 0 on dead slots is the caller's job).
    """
    if spec.ideal_gas and not spec.tait:
        gamma = tables.gas_gamma[ptype]
        p = (gamma - 1.0) * rho * e / rmass
    else:
        rho0 = tables.rho0[ptype]
        b = tables.tait_b[ptype]
        q = rho / rho0
        q3 = q * q * q
        p = b * (q3 * q3 * q - 1.0)
    return p / (rho * rho), p


def rho_summation_pair(pj, r, cut_ij, mask, spec: PhysicsSpec):
    """m_j W(r) contribution of j to rho_i (sph/rhosum)."""
    w = kernels.kernel_w(spec.kernel, spec.dim)(r, jnp.maximum(cut_ij, 1e-30))
    return jnp.where(mask & (cut_ij > 0.0), pj["rmass"] * w, 0.0)


def color_gradient_pair(pi, pj, dx, r, tables: PairTables, mask, spec: PhysicsSpec):
    """(m_j/rho_j)(c_j - c_i) grad_i W contribution to cg_i, shape (..., 3)."""
    it, jt = pi["type"], pj["type"]
    cut_ij = tables.cut_tension[it, jt]
    live = mask & (cut_ij > 0.0)
    wfd = kernels.kernel_wfd(spec.kernel, spec.dim)(r, jnp.maximum(cut_ij, 1e-30))
    ci = tables.color[it]
    cj = tables.color[jt]
    rho_j = jnp.where(live, pj["rho"], 1.0)
    # sigma is folded into cg here (it's only nonzero across phases, exactly
    # where c_j - c_i is); the capillary stress Pi is linear in |cg| so the
    # force pass needs no further sigma factor.
    sig = tables.sigma[it, jt]
    coef = jnp.where(live, sig * (pj["rmass"] / rho_j) * (cj - ci) * wfd, 0.0)
    return coef[..., None] * dx


def _capillary_stress_dot_dx(cg, dx, dim):
    """(Pi . dx) for Hu–Adams stress Pi = (|cg|^2 I/dim - cg cg^T)/max(|cg|, eps).
    cg: (..., 3); dx: (..., 3) -> (..., 3)."""
    cg2 = jnp.sum(cg * cg, axis=-1)
    norm = jnp.sqrt(jnp.maximum(cg2, EPS_CG * EPS_CG))
    cg_dot_dx = jnp.sum(cg * dx, axis=-1)
    return (cg2[..., None] * dx / dim - cg_dot_dx[..., None] * cg) / norm[..., None]


def force_pair(pi, pj, dx, rsq, mask, tables: PairTables, spec: PhysicsSpec,
               cg_i=None, cg_j=None):
    """All force-sweep pair terms fused: returns dict with
    f (..., 3), drho (...), de (...) — contributions TO particle i.

    ``dx = x_i - x_j`` (minimum image already applied), ``rsq = |dx|^2``.
    ``mask`` excludes self pairs and dead slots. No Newton halving: each side
    computes its own full sum (SURVEY.md §7.2 design decision — trades 2x
    FLOPs for deleting the reverse-comm scatter).
    """
    it, jt = pi["type"], pj["type"]
    r = jnp.sqrt(jnp.maximum(rsq, 1e-30))

    f = jnp.zeros_like(dx)
    drho = jnp.zeros(rsq.shape, rsq.dtype)
    de = jnp.zeros(rsq.shape, rsq.dtype)

    wfd_fn = kernels.kernel_wfd(spec.kernel, spec.dim)

    mi, mj = pi["rmass"], pj["rmass"]
    dv = pi["vest"] - pj["vest"]
    dvdr = jnp.sum(dv * dx, axis=-1)

    if spec.tait or spec.morris or spec.ideal_gas:
        cut_ij = tables.cut[it, jt]
        live = mask & (rsq < cut_ij * cut_ij) & (cut_ij > 0.0)
        wfd = jnp.where(live, wfd_fn(r, jnp.maximum(cut_ij, 1e-30)), 0.0)
        rho_i = jnp.where(live, pi["rho"], 1.0)
        rho_j = jnp.where(live, pj["rho"], 1.0)
        m_i = jnp.where(live, mi, 1.0)
        m_j = jnp.where(live, mj, 1.0)
        fi, _ = eos_pressure_over_rhosq(rho_i, pi["e"], m_i, it, tables, spec)
        fj, _ = eos_pressure_over_rhosq(rho_j, pj["e"], m_j, jt, tables, spec)

        if spec.morris:
            # Morris laminar viscosity: force along dv, not dx.
            fvisc_coef = 2.0 * tables.visc[it, jt] / (rho_i * rho_j)
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
            mu = h_ij * dvdr / (rsq + 0.01 * h_ij * h_ij)
            ci = tables.c0[it]
            cj = tables.c0[jt]
            if spec.ideal_gas and not spec.tait:
                # idealgas style: soundspeed from EOS, c = sqrt(gamma(gamma-1) e/m)
                gi, gj = tables.gas_gamma[it], tables.gas_gamma[jt]
                ci = jnp.sqrt(jnp.maximum(gi * (gi - 1.0) * pi["e"] / m_i, 0.0))
                cj = jnp.sqrt(jnp.maximum(gj * (gj - 1.0) * pj["e"] / m_j, 0.0))
            fvisc = jnp.where(
                dvdr < 0.0,
                -tables.visc[it, jt] * (ci + cj) * mu / (rho_i + rho_j),
                0.0,
            )
            fpair = jnp.where(live, -m_i * m_j * (fi + fj + fvisc) * wfd, 0.0)
            f = f + fpair[..., None] * dx
            de = de + jnp.where(live, -0.5 * fpair * dvdr, 0.0)

        if spec.continuity:
            drho = drho + jnp.where(live, m_j * dvdr * wfd, 0.0)

    if spec.heatconduction:
        cut_h = tables.cut_heat[it, jt]
        live = mask & (rsq < cut_h * cut_h) & (cut_h > 0.0)
        wfd = jnp.where(live, wfd_fn(r, jnp.maximum(cut_h, 1e-30)), 0.0)
        rho_i = jnp.where(live, pi["rho"], 1.0)
        rho_j = jnp.where(live, pj["rho"], 1.0)
        m_i = jnp.where(live, mi, 1.0)
        m_j = jnp.where(live, mj, 1.0)
        d_ij = tables.heat_D[it, jt]
        coef = (2.0 * m_i * m_j / (m_i + m_j)) * ((rho_i + rho_j) / (rho_i * rho_j))
        de = de + jnp.where(live, coef * d_ij * (pi["e"] - pj["e"]) * wfd, 0.0)

    if spec.surface_tension:
        cut_t = tables.cut_tension[it, jt]
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

    return dict(f=f, drho=drho, de=de)
