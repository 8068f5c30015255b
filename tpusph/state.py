"""Particle state: the TPU-native equivalent of LAMMPS ``atom_style meso``.

Reference parity: ``src/USER-SPH/atom_vec_meso.{cpp,h}`` (SURVEY.md §2.2)
holds per-atom ``rho, drho, e, de, cv, vest[3]`` on top of the core
``x, v, f, type, tag, rmass``. Here the whole thing is a structure-of-arrays
pytree with a FIXED capacity and an alive mask, so phase-change birth/death
(SURVEY.md §3.5) is slot activation rather than reallocation — the idiomatic
static-shape design for XLA.

Positions/velocities are always stored (N, 3); 2D simulations keep z = 0.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Box:
    """Simulation box. lo/hi are (3,) float arrays; periodic is a static
    3-tuple of Python bools (part of the jit cache key, like LAMMPS
    ``boundary p p f``)."""

    lo: jax.Array
    hi: jax.Array
    periodic: Tuple[bool, bool, bool] = dataclasses.field(
        default=(True, True, True), metadata=dict(static=True)
    )

    @property
    def length(self) -> jax.Array:
        return self.hi - self.lo

    @staticmethod
    def create(lo, hi, periodic=(True, True, True)) -> "Box":
        return Box(
            lo=jnp.asarray(lo, jnp.float32),
            hi=jnp.asarray(hi, jnp.float32),
            periodic=tuple(bool(p) for p in periodic),
        )

    def min_image(self, dx: jax.Array) -> jax.Array:
        """Minimum-image displacement for the periodic directions.
        dx has shape (..., 3)."""
        if not any(self.periodic):
            return dx
        L = self.length
        wrapped = dx - L * jnp.round(dx / L)
        mask = jnp.asarray(self.periodic)
        return jnp.where(mask, wrapped, dx)

    def wrap(self, x: jax.Array) -> jax.Array:
        """Remap positions into the box along periodic directions
        (Domain::pbc equivalent)."""
        L = self.length
        wrapped = self.lo + jnp.mod(x - self.lo, L)
        mask = jnp.asarray(self.periodic)
        return jnp.where(mask, wrapped, x)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ParticleState:
    """SoA particle pool. Capacity-N arrays; slots with ``type == 0`` are
    dead (free for phase-change insertion). All floats are float32.

    Fields mirror atom_vec_meso's per-atom state:
      x, v, f       core position/velocity/force
      vest          extrapolated velocity at t+dt (used in pair forces)
      rho, drho     mass density and its rate (continuity)
      e, de         per-particle internal energy and its rate
      cv            per-particle heat capacity (T = e / cv)
      rmass         per-particle mass
      type          1-based LAMMPS type; 0 = dead slot
      tag           global particle id (stable across sorts/migration)
      mobile        False for fix meso/stationary particles (walls)
    """

    x: jax.Array      # (N, 3) f32
    v: jax.Array      # (N, 3) f32
    vest: jax.Array   # (N, 3) f32
    f: jax.Array      # (N, 3) f32
    rho: jax.Array    # (N,) f32
    drho: jax.Array   # (N,) f32
    e: jax.Array      # (N,) f32
    de: jax.Array     # (N,) f32
    cv: jax.Array     # (N,) f32
    rmass: jax.Array  # (N,) f32
    type: jax.Array   # (N,) i32, 0 = dead
    tag: jax.Array    # (N,) i32
    mobile: jax.Array  # (N,) bool
    owned: jax.Array   # (N,) bool; False = halo ghost (dist mode)
    # per-particle pair virial sum_j f_ij . r_ij from the last force stage
    # (filled only when PhysicsSpec.virial; thermo `press` reads it).
    # Recomputed every force stage like f/drho/de — never integrated.
    vir: jax.Array     # (N,) f32
    # Kahan compensation for the rho/e half-step ledgers (SURVEY §7.2: the
    # 1e-4 gate): fp32 `rho += dtf*drho` rounds at ulp(rho) ~ 1.2e-4 per
    # add — a random walk past 1e-3 relative over 5k steps. The two-sum
    # keeps the lost low bits. Carried through sorts, migration and ghost
    # packing (r3); a reset would be bounded by one ulp but re-seeds the
    # drift walk at every rebuild.
    rho_c: jax.Array   # (N,) f32
    e_c: jax.Array     # (N,) f32

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    @property
    def alive(self) -> jax.Array:
        return self.type > 0

    def nlocal(self) -> jax.Array:
        """Number of alive OWNED particles (device scalar) — ghosts are the
        neighbor brick's copies, not atoms (Atom::nlocal vs nghost)."""
        return jnp.sum((self.alive & self.owned).astype(jnp.int32))

    @staticmethod
    def zeros(capacity: int) -> "ParticleState":
        fz = lambda *shape: jnp.zeros(shape, jnp.float32)
        return ParticleState(
            x=fz(capacity, 3), v=fz(capacity, 3), vest=fz(capacity, 3),
            f=fz(capacity, 3), rho=fz(capacity), drho=fz(capacity),
            e=fz(capacity), de=fz(capacity), cv=jnp.ones((capacity,), jnp.float32),
            rmass=fz(capacity),
            type=jnp.zeros((capacity,), jnp.int32),
            tag=jnp.zeros((capacity,), jnp.int32),
            mobile=jnp.ones((capacity,), bool),
            owned=jnp.ones((capacity,), bool),
            vir=fz(capacity),
            rho_c=fz(capacity), e_c=fz(capacity),
        )

    @staticmethod
    def from_arrays(x, type, rmass, *, v=None, rho=None, e=None, cv=None,
                    tag=None, mobile=None, capacity=None, vest=None,
                    f=None, de=None, drho=None, rho_c=None,
                    e_c=None) -> "ParticleState":
        """Build a state from host arrays (read_data / create_atoms path).
        Pads to ``capacity`` with dead slots. The optional integrator-state
        fields (vest/f/de/drho + Kahan ledgers) let a mid-run geometry
        re-choice rebuild the pool WITHOUT losing the leapfrog half-step
        context (api.run recovery, LAMMPS `run pre no` semantics)."""
        x = np.asarray(x, np.float32)
        n = x.shape[0]
        if x.shape[1] == 2:  # 2D input
            x = np.concatenate([x, np.zeros((n, 1), np.float32)], axis=1)
        cap = int(capacity) if capacity is not None else n

        def pad(a, fill=0.0, dt=np.float32, vec=False):
            a = (np.asarray(a, dt) if a is not None
                 else np.full((n, 3) if vec else (n,), fill, dt))
            if vec and a.ndim == 1:
                a = np.broadcast_to(a[None, :], (n, 3)).copy()
            shape = (cap, 3) if vec else (cap,)
            out = np.full(shape, 0 if dt != np.float32 else 0.0, dt)
            out[:n] = a
            return jnp.asarray(out)

        xs = np.zeros((cap, 3), np.float32)
        xs[:n] = x
        return ParticleState(
            x=jnp.asarray(xs),
            v=pad(v, 0.0, vec=True),
            vest=pad(vest if vest is not None else v, 0.0, vec=True),
            f=pad(f, 0.0, vec=True),
            rho=pad(rho, 1.0),
            drho=pad(drho),
            e=pad(e, 0.0),
            de=pad(de),
            cv=pad(cv, 1.0),
            rmass=pad(rmass, 1.0),
            type=pad(type, 0, np.int32),
            tag=pad(tag if tag is not None else np.arange(1, n + 1), 0, np.int32),
            mobile=pad(mobile if mobile is not None else np.ones(n, bool), False, bool),
            owned=pad(np.ones(n, bool), False, bool),
            vir=pad(None),
            rho_c=pad(rho_c), e_c=pad(e_c),
        )

    def permute(self, perm: jax.Array) -> "ParticleState":
        """Reorder every per-particle array by ``perm`` (cell-sort support)."""
        return jax.tree_util.tree_map(lambda a: a[perm], self)
