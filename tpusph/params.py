"""Physics configuration: which pair terms are enabled (static, hashable)
and their coefficient tables (traced pytree).

Reference parity: this is the TPU-native shape of ``pair_style
hybrid/overlay sph/rhosum N sph/taitwater ... `` + per-style ``pair_coeff``
lines (SURVEY.md §2.2–2.3, §2.9). Instead of a list of style objects each
doing its own neighbor sweep, the enabled terms are FUSED into at most three
sweeps over the same neighbor structure:

  sweep 1 (full, every `rhosum_every` steps): rho_i = sum_j m_j W_ij
  sweep 2 (full, if surface tension on):      color gradient cg_i
  sweep 3 (full, every step):                 forces + drho + de (all styles)

Static structure lives in PhysicsSpec (a hashable NamedTuple — part of the
jit cache key); numeric coefficients live in PairTables (a pytree of
(ntypes+1,)- and (ntypes+1, ntypes+1)-shaped f32 arrays, 1-indexed by LAMMPS
type so table[itype, jtype] needs no offset arithmetic).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from tpusph import kernels


class PhysicsSpec(NamedTuple):
    """Static (hashable) physics switches. One per Simulation; changing any
    field recompiles the step — same cost model as editing a LAMMPS script."""

    dim: int = 3                 # `dimension` command
    kernel: int = kernels.LUCY   # smoothing kernel id (kernels.py)
    # pair styles in the overlay (SURVEY.md §2.2/2.3):
    rhosum_every: int = 0        # sph/rhosum N  (0 = continuity-only density)
    # sph/rhosum/multiphase: Hu & Adams (2006) NUMBER-density summation
    # rho_i = m_i * sum_j W_ij — each phase keeps its own density at any
    # mass ratio (plain mass summation inflates a light particle's rho by
    # ~the density ratio when heavy neighbors dominate its kernel support,
    # detonating its Tait EOS). The fork's density-ratio-10 bubble/boiling
    # configs need this form.
    rhosum_nd: bool = False
    tait: bool = False           # sph/taitwater (artificial viscosity)
    morris: bool = False         # sph/taitwater/morris (laminar viscosity)
    ideal_gas: bool = False      # sph/idealgas
    lj: bool = False             # sph/lj (vdW-form LJ gas EOS)
    heatconduction: bool = False  # sph/heatconduction
    # sph/heatconduction/phasechange: pairs whose tsat table entry is > 0
    # conduct against the saturation point cv*T_sat instead of the
    # neighbor's energy (interface pinning; the pairwise energy imbalance is
    # the latent-heat sink consumed by fix phase_change). Reference:
    # src/USER-SPH/pair_sph_heatconduction_phasechange.cpp (SURVEY §2.3 [M]).
    heat_phasechange: bool = False
    surface_tension: bool = False  # sph/colorgradient + sph/surfacetension
    phase_change: bool = False   # fix phase_change (evaporation)
    # density continuity term (accumulated by taitwater-family styles):
    continuity: bool = True
    # `fix gravity` body force (vector lives in PairTables.gravity):
    gravity: bool = False
    # perf flags derived from the CONCRETE coefficient tables at runner
    # build (api._ensure_runner): names of tables whose entries are uniform
    # over real types (kernel folds them to scalars instead of one-hot
    # matmuls), and whether all active cutoffs are one shared value
    # (kernel computes the kernel-derivative/mask once per slice).
    scalar_tables: tuple = ()
    shared_wfd: bool = False
    # accumulate the per-particle pair virial sum_j f_ij.r_ij in the force
    # sweep (thermo `press` — src/thermo.cpp pressure, SURVEY §2.8). Off by
    # default: it costs extra VPU ops per pair lane; Simulation enables it
    # when thermo_style requests `press`.
    virial: bool = False


def _t1(ntypes, fill=0.0):
    return np.full((ntypes + 1,), fill, np.float32)


def _t2(ntypes, fill=0.0):
    return np.full((ntypes + 1, ntypes + 1), fill, np.float32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class PairTables:
    """Per-type(-pair) coefficient tables, 1-indexed (row/col 0 unused).

    Mirrors the pair_coeff surface of the reference styles:
      sph/taitwater[/morris] I J rho0 c0 alpha|nu h  -> rho0, c0, visc, cut
      sph/rhosum I J h                               -> cut_rho
      sph/heatconduction I J D h                     -> heat_D, cut_heat
      sph/idealgas I J alpha h                       -> visc, cut (gas gamma)
      sph/colorgradient + sph/surfacetension I J sigma h -> sigma, cut_tension
    """

    rho0: jax.Array      # (T+1,)   equilibrium density per type
    c0: jax.Array        # (T+1,)   sound speed per type
    tait_b: jax.Array    # (T+1,)   Tait B = c0^2 rho0 / 7
    gas_gamma: jax.Array  # (T+1,)  ideal-gas heat-capacity ratio (default 1.4)
    visc: jax.Array      # (T+1,T+1) artificial-viscosity alpha OR Morris mu
    heat_D: jax.Array    # (T+1,T+1) heat diffusion coefficient
    sigma: jax.Array     # (T+1,T+1) surface-tension coefficient
    tsat: jax.Array      # (T+1,T+1) saturation T for interface-pinned
    #                      conduction (sph/heatconduction/phasechange);
    #                      0 = plain conduction for that pair
    color: jax.Array     # (T+1,)   phase color for CSF (default = type value)
    gravity: jax.Array   # (3,)     body acceleration (fix gravity)
    cut: jax.Array       # (T+1,T+1) support radius for the force sweep
    cut_rho: jax.Array   # (T+1,T+1) support radius for rhosum
    cut_heat: jax.Array  # (T+1,T+1) support radius for heat conduction
    cut_tension: jax.Array  # (T+1,T+1) support radius for colorgradient/tension

    @property
    def ntypes(self) -> int:
        return self.rho0.shape[0] - 1

    @staticmethod
    def zeros(ntypes: int) -> "PairTables":
        return PairTables(
            rho0=jnp.asarray(_t1(ntypes, 1.0)),
            c0=jnp.asarray(_t1(ntypes, 0.0)),
            tait_b=jnp.asarray(_t1(ntypes, 0.0)),
            gas_gamma=jnp.asarray(_t1(ntypes, 1.4)),
            visc=jnp.asarray(_t2(ntypes)),
            heat_D=jnp.asarray(_t2(ntypes)),
            sigma=jnp.asarray(_t2(ntypes)),
            tsat=jnp.asarray(_t2(ntypes)),
            color=jnp.asarray(np.arange(ntypes + 1, dtype=np.float32)),
            gravity=jnp.zeros(3, jnp.float32),
            cut=jnp.asarray(_t2(ntypes)),
            cut_rho=jnp.asarray(_t2(ntypes)),
            cut_heat=jnp.asarray(_t2(ntypes)),
            cut_tension=jnp.asarray(_t2(ntypes)),
        )

    def max_cut(self) -> float:
        """Largest support radius across all sweeps — sizes the cell grid.
        Host-side (concrete) value."""
        return float(
            max(
                jnp.max(self.cut),
                jnp.max(self.cut_rho),
                jnp.max(self.cut_heat),
                jnp.max(self.cut_tension),
            )
        )

    # -- pair_coeff-style setters (host side, numpy semantics) ---------------

    def _set2(self, name, i, j, value):
        arr = np.array(getattr(self, name))
        arr[i, j] = value
        arr[j, i] = value
        object.__setattr__(self, name, jnp.asarray(arr))

    def _set1(self, name, i, value):
        arr = np.array(getattr(self, name))
        arr[i] = value
        object.__setattr__(self, name, jnp.asarray(arr))

    def set_taitwater(self, i, j, rho0, c0, viscosity, h):
        """pair_coeff i j sph/taitwater rho0 c0 alpha h (also morris with nu)."""
        self._set1("rho0", i, rho0)
        self._set1("c0", i, c0)
        self._set1("tait_b", i, c0 * c0 * rho0 / 7.0)
        if i != j:
            self._set1("rho0", j, rho0)
            self._set1("c0", j, c0)
            self._set1("tait_b", j, c0 * c0 * rho0 / 7.0)
        self._set2("visc", i, j, viscosity)
        self._set2("cut", i, j, h)

    def set_idealgas(self, i, j, viscosity, h):
        self._set2("visc", i, j, viscosity)
        self._set2("cut", i, j, h)

    def set_lj(self, i, j, viscosity, h):
        """pair_coeff i j sph/lj nu h — the EOS itself is parameter-free in
        LJ reduced units (pair_terms.LJ_VDW_A/B)."""
        self._set2("visc", i, j, viscosity)
        self._set2("cut", i, j, h)

    def set_rhosum(self, i, j, h):
        self._set2("cut_rho", i, j, h)

    def set_heatconduction(self, i, j, d, h, tsat: float = 0.0):
        """pair_coeff i j sph/heatconduction D h — the /phasechange variant
        adds a saturation temperature: pair_coeff i j D h Tsat pins that
        pair's conduction to T_sat (set it on the liquid/vapor cross pair)."""
        self._set2("heat_D", i, j, d)
        self._set2("cut_heat", i, j, h)
        if tsat:
            self._set2("tsat", i, j, tsat)

    def set_surfacetension(self, i, j, sigma, h):
        """sigma applies to the i-j interface (folded into the color
        gradient); the capillary-stress force sweep must run over ALL pairs
        of the two phases (the stress divergence needs same-phase neighbors),
        so the cutoff is set for (i,i), (j,j) and (i,j)."""
        self._set2("sigma", i, j, sigma)
        self._set2("cut_tension", i, j, h)
        self._set2("cut_tension", i, i, h)
        self._set2("cut_tension", j, j, h)

    def set_color(self, i, color):
        self._set1("color", i, color)

    def set_gravity(self, g):
        object.__setattr__(self, "gravity",
                           jnp.asarray(np.asarray(g, np.float32)))
