"""Dense O(N^2) reference backend.

The correctness oracle every faster backend (cell grid, Pallas) is tested
against, and the engine for tiny configs. Chunked over i-rows with
``lax.map`` so memory stays O(block * N) instead of O(N^2) — usable up to a
few 10^4 particles.

Reference parity: semantically equals a LAMMPS run with an infinite neighbor
list (every pair visited, cutoff masking inside the style), i.e. the same
physics as the pair_sph_* styles minus the neighbor machinery (SURVEY §2.6).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpusph import kernels
from tpusph.ops import pair_terms
from tpusph.params import PairTables, PhysicsSpec
from tpusph.state import Box, ParticleState

_FIELD_KEYS = ("x", "vest", "rho", "e", "rmass", "type")


def prepare(state: ParticleState, aux, istep, box: Box):
    """Per-step hook (Domain::pbc equivalent): the dense backend has no cell
    topology to keep stale, so positions are wrapped every step."""
    import dataclasses
    return dataclasses.replace(state, x=box.wrap(state.x)), aux


def _state_fields(state: ParticleState):
    return dict(
        x=state.x, vest=state.vest, rho=state.rho, e=state.e,
        cv=state.cv, rmass=state.rmass, type=state.type,
    )


def _pick_block(n: int) -> int:
    for b in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if n % b == 0:
            return b
    return 1


def _rowwise(fn, state: ParticleState, box: Box, extra=None):
    """Map ``fn(pi_block, pj_all, dx, rsq, mask, extra_block)`` over i-row
    blocks. dx/rsq/mask have shape (B, N); returns stacked (N, ...) pytree."""
    n = state.capacity
    b = _pick_block(n)
    fields = _state_fields(state)
    alive = state.alive
    idx = jnp.arange(n, dtype=jnp.int32)

    def block_fn(args):
        pi, ii, extra_i = args
        dx = pi["x"][:, None, :] - fields["x"][None, :, :]
        dx = box.min_image(dx)
        rsq = jnp.sum(dx * dx, axis=-1)
        mask = (ii[:, None] != idx[None, :]) & (pi["type"] > 0)[:, None] & alive[None, :]
        return fn(pi, fields, dx, rsq, mask, extra_i)

    def reshape_blocks(a):
        return a.reshape((n // b, b) + a.shape[1:])

    pi_blocks = jax.tree_util.tree_map(reshape_blocks, fields)
    ii_blocks = reshape_blocks(idx)
    extra_blocks = jax.tree_util.tree_map(reshape_blocks, extra) if extra is not None else ii_blocks
    out = jax.lax.map(block_fn, (pi_blocks, ii_blocks, extra_blocks))
    return jax.tree_util.tree_map(lambda a: a.reshape((n,) + a.shape[2:]), out)


def rho_summation(state: ParticleState, tables: PairTables, spec: PhysicsSpec,
                  box: Box) -> jnp.ndarray:
    """sph/rhosum: rho_i = sum_j m_j W(r_ij), INCLUDING the self term
    (upstream pair_sph_rhosum seeds with m_i W(0) — SURVEY §2.2)."""

    def fn(pi, pj, dx, rsq, mask, _):
        cut_ij = tables.cut_rho[pi["type"][:, None], pj["type"][None, :]]
        r = jnp.sqrt(jnp.maximum(rsq, 0.0))
        m = mask & (rsq < cut_ij * cut_ij)
        contrib = pair_terms.rho_summation_pair(
            {k: v[None, :] for k, v in pj.items()}, r, cut_ij, m, spec)
        return jnp.sum(contrib, axis=1)

    rho = _rowwise(fn, state, box)
    # self term W(0) with the i-i cutoff (x m_i unless number-density,
    # whose m_i factors the WHOLE sum)
    self_cut = tables.cut_rho[state.type, state.type]
    w0 = kernels.kernel_w(spec.kernel, spec.dim)(
        jnp.zeros_like(self_cut), jnp.maximum(self_cut, 1e-30))
    sm = 1.0 if spec.rhosum_nd else state.rmass
    rho = rho + jnp.where(state.alive & (self_cut > 0.0), sm * w0, 0.0)
    if spec.rhosum_nd:
        rho = rho * state.rmass
    return jnp.where(state.alive, rho, state.rho)


def color_gradient(state: ParticleState, tables: PairTables, spec: PhysicsSpec,
                   box: Box) -> jnp.ndarray:
    """sph/colorgradient: per-atom CSF color gradient (SURVEY §2.3)."""

    def fn(pi, pj, dx, rsq, mask, _):
        r = jnp.sqrt(jnp.maximum(rsq, 1e-30))
        pi_b = {k: v[:, None] if v.ndim == 1 else v[:, None, :] for k, v in pi.items()}
        pj_b = {k: v[None, :] if v.ndim == 1 else v[None, :, :] for k, v in pj.items()}
        coefs = pair_terms.make_pair_coefs(
            tables, pi["type"][:, None], pj["type"][None, :], spec)
        contrib = pair_terms.color_gradient_pair(pi_b, pj_b, dx, r, coefs,
                                                 mask, spec)
        return jnp.sum(contrib, axis=1)

    cg = _rowwise(fn, state, box)
    return jnp.where(state.alive[:, None], cg, 0.0)


def force(state: ParticleState, tables: PairTables, spec: PhysicsSpec, box: Box,
          cg: jnp.ndarray | None = None):
    """The fused force sweep: (f, drho, de) for every alive particle."""
    if spec.surface_tension and cg is None:
        cg = color_gradient(state, tables, spec, box)
    extra = dict(cg=cg) if spec.surface_tension else None

    def fn(pi, pj, dx, rsq, mask, extra_i):
        pi_b = {k: v[:, None] if v.ndim == 1 else v[:, None, :] for k, v in pi.items()}
        pj_b = {k: v[None, :] if v.ndim == 1 else v[None, :, :] for k, v in pj.items()}
        kw = {}
        if spec.surface_tension:
            kw = dict(cg_i=extra_i["cg"][:, None, :], cg_j=cg[None, :, :])
        coefs = pair_terms.make_pair_coefs(
            tables, pi["type"][:, None], pj["type"][None, :], spec)
        out = pair_terms.force_pair(pi_b, pj_b, dx, rsq, mask, coefs, spec, **kw)
        return jax.tree_util.tree_map(lambda a: jnp.sum(a, axis=1), out)

    out = _rowwise(fn, state, box, extra=extra)
    alive = state.alive
    outs = (
        jnp.where(alive[:, None], out["f"], 0.0),
        jnp.where(alive, out["drho"], 0.0),
        jnp.where(alive, out["de"], 0.0),
    )
    if spec.virial:
        outs = outs + (jnp.where(alive, out["vir"], 0.0),)
    return outs
