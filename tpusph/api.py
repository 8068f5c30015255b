"""Python-first user API — the TPU-native equivalent of the reference's
C API (src/library.{cpp,h}) + ctypes wrapper (python/lammps.py), SURVEY §2.10,
plus the top-level object graph of src/lammps.cpp (SURVEY §1 L2).

``Simulation`` owns config, particle state, and the compiled step. The
input-script interpreter (tpusph.script) drives this same object, so LAMMPS
scripts and direct Python use share one engine. State setup is host-side
numpy (staged), the run loop is device-side jitted blocks (tpusph.runner).
"""

from __future__ import annotations

import dataclasses
import math
import time
from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from tpusph import kernels, lattice
from tpusph.io.thermo import ThermoWriter
from tpusph.params import PairTables, PhysicsSpec
from tpusph.runner import Runner, thermo_scalars
from tpusph.state import Box, ParticleState


class MarginDecay(RuntimeError):
    """Control-flow: the strip margin floor has measured, persistent slack
    and a leaner geometry re-choice is warranted (api.run catches this and
    continues the run exactly like a violation recovery, but with LOWER
    floors). The reference analog: re-neighboring carries no permanent
    penalty (SURVEY §3.2 rebuild branch) — without this path the violation
    ratchet's W inflation is forever."""


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _growth_bucket(natoms: int, prev: int) -> int:
    """Cache-key bucket for particle count: re-use the previous bucket while
    the count stays within [-20%, +25%] of it. Geometry/cap cache keys use
    this instead of the exact natoms so phase-change insertion batches do
    NOT recompile the kernels after every firing — the overflow guard plus
    the adaptive re-choose (api.run) cover occupancy outgrowing a stale
    measurement."""
    if prev and 0.8 * prev <= natoms <= 1.25 * prev:
        return prev
    return natoms


class Simulation:
    """One simulation: box + particles + physics + run loop."""

    def __init__(self, dim: int = 3, log: Optional[str] = None,
                 screen: bool = True):
        self.spec = PhysicsSpec(dim=dim)
        self.tables: Optional[PairTables] = None
        self.box: Optional[Box] = None
        self.state: Optional[ParticleState] = None
        self.dt: float = 0.005
        self.step_count: int = 0
        self.time_acc: float = 0.0
        self.backend_name: str = "auto"
        self.capacity_pad: int = 0      # extra dead slots (phase-change pool)
        self.neighbor_skin: Optional[float] = None  # `neighbor <skin> bin`
        self.reneigh_every: int = 0     # `neigh_modify every N` (0 = check)
        self.cell_cap: Optional[int] = None
        self._backend_cache: Dict = {}
        self.log_path = log
        self.screen = screen

        # staged host-side particle data (before first run)
        self._staged: Dict[str, np.ndarray] = {}
        self._ntypes: int = 0
        self._next_tag: int = 1
        self.groups: Dict[str, np.ndarray] = {}

        # output config
        self.thermo_every: int = 0
        self.thermo_columns: List[str] = ["step", "time", "ke"]
        # `thermo_modify norm yes`: print extensive columns (ke/pe/etotal)
        # per atom (src/thermo.cpp normalization). Default False = totals,
        # which is what the committed golden logs pin.
        self.thermo_norm: bool = False
        self.custom_columns: Dict[str, Callable] = {}
        self._thermo: Optional[ThermoWriter] = None
        self.dumps: list = []

        self._runner: Optional[Runner] = None
        self._runner_key = None
        # Modify::end_of_step registry (fix dispatch — SURVEY §2.7): named
        # hooks (state, tables, dt, istep, aux, backend, box)->(state, aux)
        # composed in insertion order into end_of_step_hook for the Runner.
        self._eos_hooks: Dict[str, Callable] = {}
        self.end_of_step_hook = None
        self.aux = None
        self.restart_schedule = None
        self.phase_change_config = None
        self.timer_detail = True  # measured Pair/Neigh/Modify split in the
        #                           run-end Timer table (one-time profile)

        # multi-device (dist) mode
        self.mesh = None            # jax.sharding.Mesh over "bricks"
        self.brick_spec = None
        self.local_cap = None

    def set_mesh(self, ndev: Optional[int] = None, axis_dim: int = 0,
                 devices=None, shape=None, axes=None):
        """Enable spatial domain decomposition over a device mesh
        (the `processors` command analog — SURVEY §2.5). Must be called
        before the first run. Default: 1D bricks along ``axis_dim``,
        falling back to an auto-chosen multi-axis procgrid when the 1D
        bricks would be thinner than the halo margin; pass ``shape`` (e.g.
        (4, 2)) and ``axes`` (e.g. (0, 1)) to force a decomposition."""
        from jax.sharding import Mesh
        from tpusph.dist import AXIS
        if devices is None:
            devices = jax.devices()[: (ndev or len(jax.devices()))]
        self.mesh = Mesh(np.asarray(devices), (AXIS,))
        self._mesh_axis_dim = axis_dim
        self._balance_cuts = None
        self._mesh_shape = tuple(shape) if shape is not None else None
        self._mesh_axes = tuple(axes) if axes is not None else None
        self._runner = None
        self.state = None
        self.aux = None
        self.local_cap = None

    def add_end_of_step_hook(self, name: str, hook: Callable):
        """Register a named Modify::end_of_step fix hook; hooks run in
        insertion order inside the jitted step."""
        self._eos_hooks[name] = hook
        self._compose_eos_hooks()

    def remove_end_of_step_hook(self, name: str):
        if name in self._eos_hooks:
            del self._eos_hooks[name]
            self._compose_eos_hooks()

    def _compose_eos_hooks(self):
        hooks = tuple(self._eos_hooks.values())
        if not hooks:
            self.end_of_step_hook = None
        elif len(hooks) == 1:
            self.end_of_step_hook = hooks[0]
        else:
            def composed(state, tables, dt, istep, aux, backend, box,
                         _hooks=hooks):
                for h in _hooks:
                    state, aux = h(state, tables, dt, istep, aux, backend,
                                   box)
                return state, aux
            self.end_of_step_hook = composed
        self._runner = None   # force recompile with the new hook chain

    def configure_phase_change(self, config):
        """fix phase_change: evaporation mass exchange (SURVEY §2.3, §3.5).
        Installs the end-of-step hook over the particle pool."""
        import dataclasses as _dc
        from tpusph.ops.phase_change import make_end_of_step_hook
        if config.cutoff <= 0.0 and self.tables is not None:
            config = _dc.replace(config, cutoff=self.tables.max_cut())
        if self.capacity_pad == 0 and config.mode == "insert":
            # reserve pool headroom for insertions (recompile-free growth)
            self.capacity_pad = max(len(self._staged.get("x", ())) // 4, 128)
        self.phase_change_config = config
        self.spec = self.spec._replace(phase_change=True)
        self.add_end_of_step_hook("phase_change",
                                  make_end_of_step_hook(config, self.spec))

    # ------------------------------------------------------------------ setup

    def set_dimension(self, dim: int):
        self.spec = self.spec._replace(dim=dim)

    def set_kernel(self, name: str):
        self.spec = self.spec._replace(kernel=kernels.kernel_id_from_name(name))

    def create_box(self, lo, hi, periodic=(True, True, True), ntypes: int = 1):
        self.box = Box.create(lo, hi, periodic)
        self._ntypes = ntypes
        self.tables = PairTables.zeros(ntypes)

    def add_particles(self, x: np.ndarray, type: int | np.ndarray,
                      v=None, rho=1.0, e=0.0, cv=1.0, rmass=1.0) -> np.ndarray:
        """Stage particles (create_atoms / read_data path). Returns the mask
        (over the staged arrays) of the newly added particles."""
        x = np.atleast_2d(np.asarray(x, np.float32))
        if x.shape[1] == 2:
            x = np.concatenate([x, np.zeros((len(x), 1), np.float32)], axis=1)
        n = len(x)

        def full(v, shape=()):
            a = np.asarray(v, np.float32)
            return np.broadcast_to(a, (n,) + shape).copy() if a.ndim <= len(shape) \
                else a.astype(np.float32)

        new = dict(
            x=x,
            v=full(v if v is not None else 0.0, (3,)),
            type=np.broadcast_to(np.asarray(type, np.int32), (n,)).copy(),
            rho=full(rho), e=full(e), cv=full(cv), rmass=full(rmass),
            tag=np.arange(self._next_tag, self._next_tag + n, dtype=np.int32),
            mobile=np.ones(n, bool),
        )
        self._next_tag += n
        if not self._staged:
            self._staged = new
        else:
            self._staged = {k: np.concatenate([self._staged[k], new[k]])
                            for k in new}
        nold = len(self._staged["x"]) - n
        mask = np.zeros(len(self._staged["x"]), bool)
        mask[nold:] = True
        self._sync_groups(n)
        return mask

    def _sync_groups(self, n_new: int):
        for k in list(self.groups):
            self.groups[k] = np.concatenate(
                [self.groups[k], np.zeros(n_new, bool)])

    def create_atoms_lattice(self, type: int, style: str, spacing: float,
                             region: lattice.Region, **fields) -> np.ndarray:
        """create_atoms via a lattice fill of a region (SURVEY §2.4)."""
        box_region = lattice.Block(lo=np.asarray(self.box.lo),
                                   hi=np.asarray(self.box.hi))
        pts = lattice.lattice_points(style, spacing, region,
                                     dim=self.spec.dim, box_region=box_region)
        return self.add_particles(pts, type, **fields)

    def define_group(self, name: str, mask: np.ndarray):
        self.groups[name] = np.asarray(mask, bool).copy()

    def group_mask(self, name: str) -> np.ndarray:
        if name == "all":
            return np.ones(len(self._staged["x"]), bool)
        return self.groups[name]

    def set_values(self, mask, **fields):
        """The `set` command: adjust per-particle values on staged data."""
        self._pull_state()
        mask = np.asarray(mask, bool)
        for k, v in fields.items():
            arr = self._staged[k]
            arr[mask] = v
            self._staged[k] = arr
        self.state = None  # invalidate device state

    def set_stationary(self, mask):
        """fix meso/stationary on these particles (walls)."""
        self._pull_state()
        self._staged["mobile"][np.asarray(mask, bool)] = False
        self.state = None

    # pair styles --------------------------------------------------------

    def pair_taitwater(self, morris: bool = False):
        self.spec = self.spec._replace(tait=not morris, morris=morris)

    def pair_idealgas(self):
        self.spec = self.spec._replace(ideal_gas=True, tait=False)

    def pair_lj(self):
        self.spec = self.spec._replace(lj=True, tait=False)

    def pair_rhosum(self, every: int = 1, number_density: bool = False):
        """sph/rhosum N, or the multiphase number-density form
        (sph/rhosum/multiphase: rho_i = m_i sum_j W — Hu & Adams 2006),
        which keeps each phase at its own density at any mass ratio."""
        self.spec = self.spec._replace(rhosum_every=every,
                                       rhosum_nd=bool(number_density))

    def pair_heatconduction(self, phasechange: bool = False):
        """sph/heatconduction, or the fork's /phasechange variant: pairs
        whose tsat table entry is > 0 conduct against cv*T_sat (interface
        pinning — SURVEY §2.3, pair_sph_heatconduction_phasechange.cpp)."""
        if phasechange:
            self.spec = self.spec._replace(heat_phasechange=True)
        else:
            self.spec = self.spec._replace(heatconduction=True)

    def pair_surfacetension(self):
        self.spec = self.spec._replace(surface_tension=True)

    # ------------------------------------------------------------- state sync

    def _build_state(self):
        s = self._staged
        n = len(s["x"])
        cap = _round_up(n + self.capacity_pad, 128)
        extras = {k: s[k] for k in ("vest", "f", "de", "drho",
                                    "rho_c", "e_c")
                  if k in s and len(s[k]) == n}
        self.state = ParticleState.from_arrays(
            s["x"], s["type"], rmass=s["rmass"], v=s["v"], rho=s["rho"],
            e=s["e"], cv=s["cv"], tag=s["tag"], mobile=s["mobile"],
            capacity=cap, **extras)
        self.local_cap = None  # single-device state: positions are global

    def _host_x(self, dev) -> np.ndarray:
        """Positions of the device-fetched state in GLOBAL coordinates.
        In dist mode positions are brick-local along the decomposition axis
        (dist.py design note); every host-side consumer (dump, restart,
        write_data, _pull_state) must go through this."""
        x = np.asarray(dev.x)
        # local_cap is set by partition_state and ONLY then are positions
        # brick-local; a state from _build_state (e.g. get() before the
        # first dist run) is global even when a mesh/brick_spec exists
        if (self.mesh is not None and self.brick_spec is not None
                and self.local_cap is not None):
            from tpusph.dist import globalize_positions
            x = globalize_positions(x, self.brick_spec, self.local_cap)
        return x

    def _pull_state(self):
        """Sync device state back into staged host arrays (after a run, so
        `set` and queries see current values). Vectorized — no Python loops
        over particles."""
        if self.state is None or not self._staged:
            return
        n = len(self._staged["x"])
        dev = jax.device_get(self.state)
        host_x = self._host_x(dev)
        alive = (dev.type > 0) & dev.owned
        idx = np.nonzero(alive)[0]
        tags = dev.tag[idx]
        staged_tags = self._staged["tag"]
        if len(idx) == n:
            # map pool rows to staged order by tag (vectorized join)
            order = np.argsort(tags, kind="stable")
            sorted_tags = tags[order]
            pos_in_sorted = np.searchsorted(sorted_tags, staged_tags)
            ok = (pos_in_sorted < len(sorted_tags)) & \
                (sorted_tags[np.clip(pos_in_sorted, 0, len(sorted_tags) - 1)]
                 == staged_tags)
            sel = idx[order[np.clip(pos_in_sorted, 0, len(sorted_tags) - 1)]]
            if not ok.all():
                sel = idx
                self._staged["tag"] = tags
        else:
            # particles were created/destroyed (phase change): rebuild staging
            sel = idx
            self._staged["tag"] = tags
        self._staged["x"] = host_x[sel]
        for k in ("v", "rho", "e", "cv", "rmass"):
            self._staged[k] = np.asarray(getattr(dev, k)[sel])
        self._staged["type"] = np.asarray(dev.type[sel])
        self._staged["mobile"] = np.asarray(dev.mobile[sel])
        # integrator-state extras: a mid-run geometry re-choice rebuilds the
        # pool from staged arrays; dropping vest/f/de + the Kahan ledgers
        # would silently change leapfrog half-step semantics (measured:
        # freshly-inserted vapor carries de=0 by reference Verlet semantics;
        # a setup force recompute replaced it with the live conduction value,
        # an extra dt/2*de per recovery — the r3 red equivalence gate)
        for k in ("vest", "f", "de", "drho", "rho_c", "e_c"):
            self._staged[k] = np.asarray(getattr(dev, k)[sel])

    # ------------------------------------------------------------------- run

    def _select_backend(self):
        from tpusph.ops import dense
        name = self.backend_name
        if name == "auto":
            # dense below ~2k particles; above on TPU: the strip kernel
            # (z-sorted dense columns, ops/strip_pair) with band -> column
            # fallbacks when the box can't strip/band or phase change needs
            # the particle pool; XLA cell grid elsewhere
            n = self.natoms
            if n <= 2048:
                name = "dense"
            elif jax.default_backend() == "tpu" and self.tables.ntypes <= 6:
                name = "strip"
            else:
                name = "cellgrid"
        if name == "dense":
            return dense
        if name == "strip":
            backend = self._select_strip_backend()
            if backend is not None:
                return backend
            # band has no vapor sweep — phase-change runs that can't strip
            # fall through to the column kernel's particle pool
            name = "pallas" if self.phase_change_config is not None \
                else "band"
        if name == "band":
            backend = self._select_band_backend()
            if backend is not None:
                return backend
            name = "pallas" if (jax.default_backend() == "tpu"
                                and self.tables.ntypes <= 6) else "cellgrid"
        if name in ("cellgrid", "pallas"):
            from tpusph import grid as gridlib
            cutoff = self.tables.max_cut()
            skin = self.neighbor_skin if self.neighbor_skin is not None \
                else 0.3 * cutoff
            if self.cell_cap is not None:
                cap = self.cell_cap
            else:
                # measuring pulls device state to host — do it once per
                # (cutoff, skin) and natoms GROWTH BUCKET, not on every
                # run() call and NOT on every phase-change insertion batch
                # (a natoms-exact key recompiled the kernels after every
                # firing; the overflow guard + adaptive re-choose already
                # cover occupancy outgrowing the measurement)
                mkey = (cutoff, skin, _growth_bucket(
                    self.natoms,
                    (getattr(self, "_mcap_key", None) or (0, 0, 0))[-1]))
                if getattr(self, "_mcap_key", None) != mkey:
                    self._mcap_key = mkey
                    self._mcap = self._measured_cell_cap(cutoff, skin)
                cap = self._mcap
            geom = gridlib.make_geometry(self.box, cutoff, self.spec.dim,
                                         skin=skin, cap=cap)
            key = (name, geom, self.reneigh_every)
            if self._backend_cache.get("key") != key:
                if name == "pallas":
                    from tpusph.ops.pallas_pair import PallasBackend
                    backend = PallasBackend(geom, self.box,
                                            ntypes=self.tables.ntypes,
                                            rebuild_every=self.reneigh_every)
                else:
                    from tpusph.ops.cellgrid import CellGridBackend
                    backend = CellGridBackend(
                        geom, rebuild_every=self.reneigh_every)
                self._backend_cache = dict(key=key, backend=backend)
                self.aux = None
            return self._backend_cache["backend"]
        raise ValueError(f"unknown backend '{name}'")

    def _select_strip_backend(self):
        """Strip backend (ops/strip_pair: z-sorted dense columns) — or None
        when the configuration can't strip (>6 types, or a box too small for
        the seam-ghost bands). Phase-change runs strip too (r2 VERDICT #2):
        insertion activates pool dead slots and forces a rebuild, which
        re-sorts into fresh strips; the vapor interface query is the strip
        vapor sweep; column headroom is widened so the growing vapor phase
        doesn't overflow the per-column budget between geometry choices."""
        if self.tables.ntypes > 6:
            return None
        from tpusph.ops.strip_pair import StripBackend, choose_strip_geometry
        cutoff = self.tables.max_cut()
        skin = self.neighbor_skin if self.neighbor_skin is not None \
            else 0.3 * cutoff
        headroom = 1.35 if self.phase_change_config is not None else 1.08
        # the drift allowance anticipates ordinary skin-licensed motion;
        # coverage-violation re-chooses (api.run's overflow catch) add the
        # MEASURED runtime shortfall (_strip_extra) so margins are sized by
        # evidence — the drift ladder only backstops unmeasured violations
        drift = getattr(self, "_strip_drift", 1.0)
        extra = getattr(self, "_strip_extra", (0, 0))
        gkey = ("strip", cutoff, skin,
                _growth_bucket(self.natoms,
                               (getattr(self, "_strip_geom_key", None)
                                or (0, 0, 0, 0))[3]),
                self.spec.dim, headroom, drift, extra)
        if getattr(self, "_strip_geom_key", None) != gkey:
            if self.state is not None:
                self._pull_state()
            x = np.asarray(self._staged["x"])
            self._strip_geom_key = gkey
            self._strip_geom = choose_strip_geometry(
                self.box, cutoff, self.spec.dim, skin, x=x,
                headroom=headroom, drift=drift, extra_rows=extra)
        geom = self._strip_geom
        if geom is None:
            if extra != (0, 0) or drift > 1.0:
                # Loud-failure contract covers geometry ABANDONMENT too
                # (ADVICE r3): an escalated margin floor pushing every
                # candidate past the width cap silently demotes the run to
                # the band/column backend — a large quiet perf cliff.
                # The retry observer (_maybe_retry_strip) re-attempts the
                # strip with FRESH measures once the transient that
                # escalated the floor has passed (r5: the 500k bubble-rise
                # settling wave escalated to extra=(503,292), abandoning
                # strip for the rest of the run).
                self._strip_abandoned = True
                import warnings
                warnings.warn(
                    "strip geometry abandoned: escalated margin floor "
                    f"extra_rows={extra} drift={drift} pushed all "
                    "candidates past the window-width cap; falling back "
                    "to a slower backend (will retry after the transient)",
                    RuntimeWarning, stacklevel=2)
            return None
        key = ("strip", geom, self.reneigh_every)
        if self._backend_cache.get("key") != key:
            backend = StripBackend(geom, self.box, ntypes=self.tables.ntypes,
                                   rebuild_every=self.reneigh_every)
            self._backend_cache = dict(key=key, backend=backend)
            self.aux = None
        return self._backend_cache["backend"]

    def _select_band_backend(self):
        """Banded slot-resident backend (ops/band_pair) — or None when the
        configuration can't band (phase-change pool, tiny box, >6 types)."""
        if self.phase_change_config is not None or self.tables.ntypes > 6:
            return None
        from tpusph.ops.band_pair import BandBackend, choose_band_geometry
        cutoff = self.tables.max_cut()
        skin = self.neighbor_skin if self.neighbor_skin is not None \
            else 0.3 * cutoff
        # choosing re-measures occupancy (pulls device state) and the choice
        # must stay STABLE across run() calls — a re-chosen geometry is a
        # full recompile. Re-choose only when the static inputs change.
        gkey = (cutoff, skin,
                _growth_bucket(self.natoms,
                               (getattr(self, "_band_geom_key", None)
                                or (0, 0, 0, 0))[2]),
                self.spec.dim)
        if getattr(self, "_band_geom_key", None) != gkey:
            if self.state is not None:
                self._pull_state()
            x = np.asarray(self._staged["x"])
            self._band_geom_key = gkey
            self._band_geom = choose_band_geometry(
                self.box, cutoff, self.spec.dim, skin, x=x)
        geom = self._band_geom
        if geom is None:
            return None
        key = ("band", geom, self.reneigh_every)
        if self._backend_cache.get("key") != key:
            backend = BandBackend(geom, self.box, ntypes=self.tables.ntypes,
                                  rebuild_every=self.reneigh_every)
            self._backend_cache = dict(key=key, backend=backend)
            self.aux = None
        return self._backend_cache["backend"]

    def _derive_perf_flags(self):
        """Inspect the concrete coefficient tables and set the static perf
        flags (scalar-table folding / shared cutoff) on the spec."""
        from tpusph.ops.pair_terms import PAIR_TABLES_1D, PAIR_TABLES_2D
        t = self.tables
        nt = t.ntypes
        scalar = []
        for name in PAIR_TABLES_2D + PAIR_TABLES_1D:
            arr = np.asarray(getattr(t, name))
            sub = arr[1:nt + 1, 1:nt + 1] if arr.ndim == 2 else arr[1:nt + 1]
            if sub.size and np.all(sub == sub.flat[0]):
                scalar.append(name)
        active_cuts = []
        if self.spec.tait or self.spec.morris or self.spec.ideal_gas \
                or self.spec.lj:
            active_cuts.append("cut")
        if self.spec.heatconduction or self.spec.heat_phasechange:
            active_cuts.append("cut_heat")
        if self.spec.surface_tension:
            active_cuts.append("cut_tension")
        shared = (all(c in scalar for c in active_cuts) and len(active_cuts) > 0
                  and len({float(np.asarray(getattr(t, c))[1, 1])
                           for c in active_cuts}) == 1)
        self.spec = self.spec._replace(scalar_tables=tuple(sorted(scalar)),
                                       shared_wfd=bool(shared))

    def _ensure_runner(self):
        self._derive_perf_flags()
        if self.mesh is not None:
            return self._ensure_dist_runner()
        backend = self._select_backend()
        key = (self.spec, self.box.periodic, id(backend),
               self.end_of_step_hook)
        if self._runner is None or self._runner_key != key:
            self._runner = Runner(self.spec, self.box, backend,
                                  end_of_step=self.end_of_step_hook)
            self._runner_key = key
        return self._runner

    def _ensure_dist_runner(self):
        from tpusph import dist
        key = (self.spec, self.box.periodic, self.mesh,
               self.end_of_step_hook)
        if self._runner is None or self._runner_key != key:
            if self.state is not None:
                # sync to host UNDER THE OLD brick_spec before it is
                # rebuilt below — _host_x de-localizes with the spec the
                # state was partitioned with
                self._pull_state()
                self.state = None
            cutoff = self.tables.max_cut()
            skin = self.neighbor_skin if self.neighbor_skin is not None \
                else 0.3 * cutoff
            ndev = self.mesh.devices.size
            self.brick_spec = dist.make_brick_spec(
                self.box, ndev, cutoff, skin, self.natoms,
                axis_dim=getattr(self, "_mesh_axis_dim", 0),
                shape=getattr(self, "_mesh_shape", None),
                axes=getattr(self, "_mesh_axes", None),
                # the overflow remedy ("raise the dist ghost/migrate
                # caps") — user-settable overrides of the measured-ratio
                # defaults; also the lever for shrinking the per-brick
                # pool when the surface-to-volume heuristic oversizes it
                ghost_cap=getattr(self, "dist_ghost_cap", None),
                migrate_cap=getattr(self, "dist_migrate_cap", None),
                cuts=getattr(self, "_balance_cuts", None))
            # strip-per-brick (r2 VERDICT #3): the fast kernel inside each
            # brick. Falls back to the column kernel / cell grid when the
            # local box can't strip.
            strip_geom = None
            self._dist_local_cap = None
            want_kernels = jax.default_backend() == "tpu" \
                or self.backend_name in ("strip", "pallas")
            if (self.backend_name in ("auto", "strip")
                    and want_kernels and self.tables.ntypes <= 6):
                if self.state is not None:
                    self._pull_state()
                strip_geom, self._dist_local_cap = \
                    dist.choose_strip_geometry_dist(
                        self.box, self.brick_spec, self.spec.dim, cutoff,
                        skin, np.asarray(self._staged["x"]),
                        headroom=(1.35 if self.phase_change_config is not None
                                  else 1.15),
                        drift=getattr(self, "_strip_drift", 1.0),
                        extra_rows=getattr(self, "_strip_extra", (0, 0)))
                if strip_geom is None and \
                        (getattr(self, "_strip_extra", (0, 0)) != (0, 0)
                         or getattr(self, "_strip_drift", 1.0) > 1.0):
                    # escalated floors killed every per-brick candidate:
                    # same abandonment-retry contract as the single path
                    self._strip_abandoned = True
                    import warnings
                    warnings.warn(
                        "dist strip geometry abandoned under escalated "
                        "margin floors; falling back (will retry after "
                        "the transient)", RuntimeWarning, stacklevel=2)
            use_pallas = (self.backend_name == "pallas"
                          or (self.backend_name == "auto"
                              and jax.default_backend() == "tpu"
                              and self.tables.ntypes <= 6))
            # measured cell cap, like the single-device path (a too-small
            # default cap would silently need the overflow abort); extra
            # headroom for ghost/migration churn at brick edges
            cap = self.cell_cap
            if cap is None and strip_geom is None:
                cap = max(self._measured_cell_cap(cutoff, skin, frac=1.6), 16)
            backend = dist.DistBackend(
                self.brick_spec, self.box, self.spec.dim, cutoff, skin,
                cap=cap, rebuild_every=self.reneigh_every,
                use_pallas=use_pallas, ntypes=self.tables.ntypes,
                strip_geom=strip_geom)
            self._runner = dist.DistRunner(self.spec, self.box, backend,
                                           self.mesh,
                                           end_of_step=self.end_of_step_hook)
            self._runner_key = key
            self.state = None  # force repartition
        return self._runner

    def balance(self):
        """Rebalance the brick decomposition to the current particle
        distribution — the ``balance`` command (balance.cpp shift balancer,
        SURVEY §2.5). Recomputes per-axis brick boundaries at the particle
        count quantiles, clamped to the halo margin, and repartitions the
        mesh on the next run. No-op on a single device."""
        if self.mesh is None:
            return None
        from tpusph import dist
        if self.state is not None:
            self._pull_state()
        if self.brick_spec is None:
            # derive axes/shape once so quantiles know the procgrid
            cutoff = self.tables.max_cut()
            skin = self.neighbor_skin if self.neighbor_skin is not None \
                else 0.3 * cutoff
            self.brick_spec = dist.make_brick_spec(
                self.box, self.mesh.devices.size, cutoff, skin, self.natoms,
                axis_dim=getattr(self, "_mesh_axis_dim", 0),
                shape=getattr(self, "_mesh_shape", None),
                axes=getattr(self, "_mesh_axes", None),
                ghost_cap=getattr(self, "dist_ghost_cap", None),
                migrate_cap=getattr(self, "dist_migrate_cap", None))
        spec = self.brick_spec
        x = np.asarray(self._staged["x"])
        self._balance_cuts = dist.compute_balance_cuts(
            x, self.box, spec.axes, spec.shape, spec.margin)
        # force respec + repartition on the next run
        self._runner = None
        self._runner_key = None
        self.state = None
        self.aux = None
        return self._balance_cuts

    def thermo(self, every: int):
        self.thermo_every = every

    def thermo_style(self, columns: List[str]):
        self.thermo_columns = list(columns)
        self._thermo = None
        # `press` needs the pair virial accumulated in the force sweep
        # (thermo.cpp pressure — SURVEY §2.8); flip the static spec flag so
        # the kernels grow the extra output (recompile, like LAMMPS would
        # re-init computes)
        want = "press" in self.thermo_columns
        if want != self.spec.virial:
            self.spec = self.spec._replace(virial=want)

    def add_thermo_column(self, name: str, fn: Callable):
        """fn(sim, scalars_dict, istep) -> float; referenced by name in
        thermo_style (the v_/c_ equation surface)."""
        self.custom_columns[name] = fn

    def _thermo_values(self, state: ParticleState, istep: int) -> Dict[str, float]:
        sc = jax.device_get(thermo_scalars(state))
        natoms = int(sc["natoms"])
        vals: Dict[str, float] = {}
        dim = self.spec.dim
        # thermo_modify norm: extensive columns divided by natoms
        norm_div = max(natoms, 1) if self.thermo_norm else 1
        for c in self.thermo_columns:
            if c == "step":
                vals[c] = istep
            elif c == "time":
                vals[c] = self.time_acc + (istep - self.step_count) * self.dt
            elif c == "dt":
                vals[c] = self.dt
            elif c == "atoms":
                vals[c] = natoms
            elif c == "ke":
                vals[c] = float(sc["ke"]) / norm_div
            elif c == "pe":
                # internal energy plays PE's role
                vals[c] = float(sc["ie"]) / norm_div
            elif c == "etotal":
                vals[c] = (float(sc["ke"]) + float(sc["ie"])) / norm_div
            elif c == "temp":
                vals[c] = 2.0 * float(sc["ke"]) / max(dim * natoms, 1)
            elif c == "density":
                vals[c] = float(sc["rho_avg"])
            elif c == "press":
                if self.spec.virial:
                    from tpusph.runner import thermo_virial_pressure
                    vals[c] = float(jax.device_get(thermo_virial_pressure(
                        state, self.box, self.spec.dim)))
                else:
                    from tpusph.runner import thermo_pressure
                    vals[c] = float(jax.device_get(
                        thermo_pressure(state, self.tables, self.spec)))
            elif c in self.custom_columns:
                vals[c] = float(self.custom_columns[c](self, sc, istep))
            else:
                raise ValueError(f"unknown thermo column '{c}'")
        return vals

    def _ensure_thermo(self) -> ThermoWriter:
        if self._thermo is None:
            self._thermo = ThermoWriter(self.thermo_columns,
                                        screen=self.screen,
                                        log_path=self.log_path)
        return self._thermo

    def run(self, nsteps: int):
        """Run nsteps. If a strip-geometry coverage overflow aborts the
        block (the fixed margins no longer fit the evolved density field —
        SURVEY §5.2's loud-failure contract), re-choose the geometry from
        the CURRENT state and continue: the adaptive analog of LAMMPS
        re-neighboring with bigger bins. Steps completed before the abort
        are kept (the violation counter fires at the first output boundary;
        a violated window can only have missed pairs at its edges).

        Works in dist (mesh) mode too (r3 VERDICT #5 — MPI re-neighboring
        never aborts): the state is pulled through _host_x (brick-local ->
        global), the shared strip geometry is re-chosen from the evolved
        per-brick views with the measured shortfall as a margin floor, and
        the mesh is repartitioned before continuing."""
        attempts = 0
        remaining = nsteps
        pre = True
        while True:
            try:
                return self._run_once(remaining, pre=pre)
            except MarginDecay:
                # de-escalation re-choice (the inverse of the violation
                # path below): _maybe_decay_margins already lowered the
                # floors after measuring persistent slack; keep executed
                # progress and re-choose the leaner geometry.
                self._strip_decays = getattr(self, "_strip_decays", 0) + 1
                done = self._continue_after_abort()
                attempts = 1 if done > 0 else attempts + 1
                if attempts > 2:
                    raise RuntimeError(
                        "strip margin decay made no progress twice — "
                        "decay logic bug, aborting instead of looping")
                remaining -= done
                pre = False
                if remaining <= 0:
                    return self
            except RuntimeError as err:
                if "capacity overflow" not in str(err) or attempts >= 2:
                    raise
                # first violation in the sim's life: re-measure from the
                # evolved state at the same drift (the usual cause is the
                # initial-lattice -> fluid transition, which changes the
                # measured margins structurally). Repeat violations escalate
                # the drift allowance so the re-chosen geometry is sticky,
                # not re-measured to the same knife edge.
                nviol = getattr(self, "_strip_violations", 0) + 1
                self._strip_violations = nviol
                short = getattr(self, "_margin_short", (0, 0))
                if short[0] > 0 or short[1] > 0:
                    # measured coverage shortfall: the TRUE need observed
                    # at the violation is (old margin rows + shortfall), so
                    # the re-choice takes that as an ABSOLUTE floor — the
                    # fresh re-measure already captures the evolved state,
                    # and adding the shortfall on top of it double-counts
                    # (measured: mlo 3->15, W 256->512, Pair 216->564 ms
                    # on the 1M dynamic bench) while the floor converges
                    # just as surely without the 2x drift ladder's blowup
                    g = getattr(self, "_strip_geom", None)
                    if g is None and self._runner is not None:
                        # dist mode keeps the shared per-brick geometry on
                        # the DistBackend, not on the sim
                        g = getattr(getattr(self._runner, "backend", None),
                                    "strip_geom", None)
                    base = ((g.mlo * g.ch, g.mhi * g.ch)
                            if g is not None else (0, 0))
                    prev = getattr(self, "_strip_extra", (0, 0))
                    self._strip_extra = (
                        max(prev[0], base[0] + short[0] + 4),
                        max(prev[1], base[1] + short[1] + 4))
                elif nviol > 1:
                    # violation without a measured window shortfall
                    # (column/band budget): fall back to the drift ladder
                    self._strip_drift = min(
                        getattr(self, "_strip_drift", 1.0) * 2.0, 8.0)
                self._margin_short = (0, 0)
                # a fresh violation episode re-arms (and resets) the
                # margin-decay observer — the new geometry invalidates
                # both its accumulated slack and any no-op block
                self._decay_obs = 0
                self._decay_need = None
                self._decay_blocked = False
                self._strip_retry_done = False
                self._retry_obs = 0
                done = self._continue_after_abort()
                # a growing phase (evaporation) legitimately outgrows the
                # measured caps MANY times over a long run; every re-choose
                # re-measures from the evolved state, so abort only on
                # CONSECUTIVE zero-progress re-chooses (a stuck geometry),
                # never on adaptation that is moving forward
                attempts = 1 if done > 0 else attempts + 1
                # and escalate the cell-cap headroom so the adaptation
                # CONVERGES in a re-choose or two (each one repays a
                # compile) instead of chasing the occupancy spike by
                # epsilon every time
                self._cap_boost = min(
                    getattr(self, "_cap_boost", 1.0) * 1.5, 4.0)
                remaining -= done
                # continuation keeps the leapfrog half-step context: the
                # staged arrays now carry vest/f/de/drho + Kahan ledgers, so
                # the re-run must NOT redo Verlet::setup's force recompute
                # (LAMMPS `run pre no`) — a recompute replaces a freshly
                # inserted particle's semantic de=0 with the live value, an
                # extra dt/2*de that broke strip/cellgrid equivalence (r3)
                pre = False
                if remaining <= 0:
                    return self

    def _continue_after_abort(self) -> int:
        """Shared mid-run continuation for geometry re-chooses (violation
        escalation AND margin decay): credit the executed steps, pull the
        state to host, and invalidate every geometry-derived cache so the
        next _ensure_runner re-measures from the evolved state. Returns
        the executed-step count."""
        start = self.step_count
        done = max(getattr(self, "_last_cb_step", start) - start, 0)
        # the runner freezes integration the step after a rebuild
        # surfaces an overflow, so the EXECUTED count (frozen steps
        # excluded) is the real progress — host chunk accounting
        # overcounts by the frozen tail
        done = min(done, getattr(self._runner, "ok_steps", done))
        self.time_acc += done * self.dt
        self.step_count += done
        self._pull_state()
        self._strip_geom_key = None
        self._band_geom_key = None
        self._mcap_key = None
        self._backend_cache = {}
        self._runner = None
        self._runner_key = None
        self.state = None
        self.aux = None
        # rebuild counters restart under the new runner
        self._decay_nbuilds = None
        self._retry_nbuilds = None
        return done

    def _current_strip_geom(self):
        g = getattr(self, "_strip_geom", None)
        if g is None and self._runner is not None:
            # dist mode keeps the shared per-brick geometry on the backend
            g = getattr(getattr(self._runner, "backend", None),
                        "strip_geom", None)
        return g

    _DECAY_K = 3          # consecutive rebuild observations with slack
    _DECAY_SAFETY = 4     # rows kept above the measured need

    def _maybe_decay_margins(self):
        """De-escalate the strip margin floor (the inverse of run()'s
        violation ratchet): _strip_extra/_strip_drift only ever grew, so
        one transient (e.g. the lattice->fluid mixing every run starts
        with) inflated W for the rest of the sim's life — at W=384 vs 256
        that is a permanent 1.5x lane tax on every sweep (PERFORMANCE.md
        r4). After _DECAY_K consecutive rebuilds whose measured UNCLIPPED
        need (GridData.margin_need) shows >= 1 chunk of slack on BOTH
        window sides, re-choose with the floors lowered to the measured
        need — but only if the vreg-padded window would actually shrink
        (a same-W re-choice is a pure recompile tax and blocks further
        decay attempts until the next violation episode)."""
        g = self._current_strip_geom()
        aux = self.aux
        if g is None:
            self._maybe_retry_strip(aux)
            return
        if aux is None:
            return
        prev_w = getattr(self, "_decay_prev_w", None)
        if prev_w is not None:
            # first observation under a decay re-choice: did it shrink?
            self._decay_prev_w = None
            if g.w >= prev_w:
                self._decay_blocked = True  # chooser re-measured same W
                return
        need = getattr(aux, "margin_need", None)
        nb = getattr(aux, "nbuilds", None)
        if need is None:
            grid = getattr(aux, "grid", None)
            need = getattr(grid, "margin_need", None)
            nb = getattr(grid, "nbuilds", None)
        if need is None or nb is None:
            return
        nb = int(np.asarray(jax.device_get(nb)).max())
        last = getattr(self, "_decay_nbuilds", None)
        self._decay_nbuilds = nb
        if last is not None and nb <= last:
            return  # no rebuild since the last observation — no new data
        arr = np.asarray(jax.device_get(need)).reshape(-1, 2)
        nlo, nhi = int(arr[:, 0].max()), int(arr[:, 1].max())
        if nlo > -g.ch or nhi > -g.ch:
            # tight fit (or violation pending) — restart the streak
            self._decay_obs = 0
            self._decay_need = None
            return
        prev = self._decay_need if getattr(self, "_decay_need", None) \
            else (nlo, nhi)
        self._decay_need = (max(prev[0], nlo), max(prev[1], nhi))
        self._decay_obs = getattr(self, "_decay_obs", 0) + 1
        if self._decay_obs < self._DECAY_K \
                or getattr(self, "_decay_blocked", False):
            return
        from tpusph.ops.strip_pair import pad_window_to_vreg
        rows_lo = max(g.mlo * g.ch + self._decay_need[0]
                      + self._DECAY_SAFETY, 0)
        rows_hi = max(g.mhi * g.ch + self._decay_need[1]
                      + self._DECAY_SAFETY, 0)
        mlo, mhi = pad_window_to_vreg(
            g.ts, g.ch, -(-rows_lo // g.ch), -(-rows_hi // g.ch),
            g.col_cap // g.ch)
        new_w = g.ts + g.ch * (mlo + mhi)
        if new_w >= g.w:
            # padding eats the slack — nothing to gain; stop watching
            # until a violation episode changes the geometry
            self._decay_blocked = True
            return
        self._strip_extra = (rows_lo, rows_hi)
        self._strip_drift = 1.0
        self._decay_obs = 0
        self._decay_need = None
        # if the re-choice's own fresh measure lands back at the same W,
        # the first post-re-choice observation blocks further attempts
        self._decay_prev_w = g.w
        raise MarginDecay(
            f"strip margin slack measured over {self._DECAY_K} rebuilds: "
            f"window {g.w} -> {new_w} rows (floors {rows_lo}/{rows_hi})")

    def _maybe_retry_strip(self, aux):
        """Strip-abandonment retry: when escalated floors pushed every
        strip candidate past the width cap (self._strip_abandoned), the
        run demoted to a slower backend — PERMANENTLY, before r5 (the
        500k bubble-rise settling wave cost the rest of the run). After
        _DECAY_K calm rebuilds on the fallback backend (calm = the
        overflow guard did not fire; _check_overflow runs first), retry
        the strip chooser with FRESH measures: the floors are reset and
        the re-measure from the evolved state decides. One retry per
        violation episode — a second abandonment stays abandoned until a
        new violation re-arms the observer."""
        if not getattr(self, "_strip_abandoned", False) or aux is None \
                or getattr(self, "_strip_retry_done", False):
            return
        nb = getattr(aux, "nbuilds", None)
        if nb is None:
            nb = getattr(getattr(aux, "grid", None), "nbuilds", None)
        if nb is None:
            return
        nb = int(np.asarray(jax.device_get(nb)).max())
        last = getattr(self, "_retry_nbuilds", None)
        self._retry_nbuilds = nb
        if last is None or nb <= last:
            return  # no rebuild since the last observation
        self._retry_obs = getattr(self, "_retry_obs", 0) + 1
        if self._retry_obs < self._DECAY_K:
            return
        self._strip_extra = (0, 0)
        self._strip_drift = 1.0
        self._strip_abandoned = False
        self._strip_retry_done = True
        self._retry_obs = 0
        raise MarginDecay(
            f"strip was abandoned under escalated floors; {self._DECAY_K} "
            "calm rebuilds since — re-choosing with fresh measures")

    def _restore_integrator_fields(self):
        """Scatter the staged f/de/drho snapshot back into the (re-sorted)
        pool rows by tag. Used by the `pre no` recovery continuation: the
        leapfrog's first initial_integrate after a mid-run geometry
        re-choice must see the SAME de it would have seen uninterrupted —
        in particular the semantic de=0 of freshly inserted particles
        (reference Verlet semantics; a setup force recompute instead gave
        them an extra dt/2*de, the r3 strip-vs-cellgrid ledger gap)."""
        s = self._staged
        if "de" not in s or self.state is None:
            return
        dev = jax.device_get(self.state)
        alive = (dev.type > 0) & dev.owned
        idx = np.nonzero(alive)[0]
        tags = dev.tag[idx]
        order = np.argsort(s["tag"], kind="stable")
        sorted_tags = s["tag"][order]
        pos = np.searchsorted(sorted_tags, tags)
        pos_c = np.clip(pos, 0, len(sorted_tags) - 1)
        ok = (pos < len(sorted_tags)) & (sorted_tags[pos_c] == tags)
        src = order[pos_c]
        upd = {}
        for k in ("f", "de", "drho"):
            arr = np.array(getattr(dev, k))
            arr[idx[ok]] = np.asarray(s[k])[src[ok]]
            upd[k] = jnp.asarray(arr)
        self.state = dataclasses.replace(self.state, **upd)
        # De-alias from aux: build_strips shares buffers between the state
        # and GridData (x_ref = state.x). The skipped Verlet::setup used to
        # de-alias implicitly (jit outputs are fresh buffers); without it
        # the donated run block would see the same buffer twice.
        self.state = jax.tree_util.tree_map(jnp.copy, self.state)

    def _run_once(self, nsteps: int, pre: bool = True):
        runner = self._ensure_runner()
        if self.state is None:
            if self.mesh is not None:
                from tpusph import dist
                staged = dict(self._staged)
                self.state, self.local_cap = dist.partition_state(
                    staged, self.brick_spec, self.mesh,
                    local_cap=getattr(self, "_dist_local_cap", None))
                self.aux = None
            else:
                self._build_state()
                self.aux = None
        if self.mesh is None and self.aux is None \
                and hasattr(runner.backend, "init_aux"):
            # initial sort + cell build (Verlet::setup's exchange/borders/
            # Neighbor::build — SURVEY §3.2)
            self.state, self.aux = runner.backend.init_aux(self.state, self.box)
            if not pre:
                # `run pre no` continuation: the strip/band sort zeroes
                # f/de/drho (harmless in-loop — they're consumed before any
                # rebuild — but here the first initial_integrate still needs
                # them). Restore by tag join from the staged snapshot; one
                # host round-trip per recovery, not a hot-path cost.
                self._restore_integrator_fields()
        tw = self._ensure_thermo() if self.thermo_every or nsteps else None

        # Verlet::setup: compute forces at the current step, thermo step 0.
        # pre=False (`run pre no`): a mid-run recovery continuation whose
        # state already carries valid f/de/drho (restored via _build_state)
        # must not recompute them — the recompute is idempotent for settled
        # particles but rewrites the semantic de=0 of freshly inserted ones.
        # Dist mode still needs setup (it also builds the halo aux).
        if pre or self.mesh is not None:
            self.state = runner.setup(self.state, self.tables,
                                      istep=self.step_count, aux=self.aux)
        if self.mesh is not None:
            self.aux = runner.aux

        # Output scheduler (src/output.cpp — SURVEY §2.8): thermo, each dump,
        # and the periodic restart fire at their OWN cadence. The run block is
        # chunked by the gcd of all active cadences so every output step is a
        # host-visible chunk boundary.
        start = self.step_count
        last = start + nsteps
        cadences = [self.thermo_every] + [d.every for d in self.dumps]
        if self.restart_schedule is not None:
            cadences.append(self.restart_schedule.every)
        cadences = [c for c in cadences if c and c > 0]
        every = math.gcd(*cadences) if cadences else nsteps
        output_time = [0.0]

        def callback(state, istep, aux=None):
            t0 = time.perf_counter()
            # the run block DONATES the previous state buffer — repoint
            # sim.state before any consumer (thermo vars, dumps, restart)
            # dereferences the dead one; aux likewise so the overflow check
            # sees THIS block's counters
            self.state = state
            if aux is not None:
                self.aux = aux
            self._last_cb_step = istep
            self._check_overflow()
            self._maybe_decay_margins()
            if tw is not None and (istep % max(self.thermo_every, 1) == 0
                                   or istep in (start, last)):
                tw.write_line(self._thermo_values(state, istep))
            for d in self.dumps:
                d.maybe_write(self, state, istep)
            rs = self.restart_schedule
            if rs is not None and istep > start and istep % rs.every == 0:
                from tpusph.io.restart import write_restart
                path = rs.path_template.replace("*", str(istep))
                # checkpoint at the CURRENT step (sim counters only
                # advance at run end)
                saved = (self.step_count, self.time_acc)
                self.step_count = istep
                self.time_acc = saved[1] + (istep - saved[0]) * self.dt
                write_restart(path, self)
                self.step_count, self.time_acc = saved
            output_time[0] += time.perf_counter() - t0

        if tw is not None:
            tw.write_header()
        callback(self.state, start, self.aux)

        t0 = runner.timings["loop"]
        self.state, self.aux = runner.run(
            self.state, self.tables, self.dt, nsteps,
            istep0=start, every=every,
            callback=callback, aux=self.aux)
        loop_time = runner.timings["loop"] - t0

        if tw is not None and (self.screen or self.log_path):
            sc = jax.device_get(thermo_scalars(self.state))
            tw.write_loop_summary(loop_time, jax.device_count(), nsteps,
                                  int(sc["natoms"]),
                                  breakdown=self._timer_breakdown(
                                      runner, loop_time, output_time[0]))
        self.time_acc += nsteps * self.dt
        self.step_count += nsteps
        return self

    def _timer_breakdown(self, runner, loop_time: float,
                         output_time: float) -> Dict[str, float]:
        """Truthful Pair/Neigh/Comm/Modify/Output split for the run-end
        Timer table (src/timer.cpp parity — SURVEY §5.1). Output is measured
        on the host; the device remainder is split by per-phase fractions
        measured once per compiled runner (Runner.phase_fractions;
        DistRunner.phase_fractions times each phase as its own jitted
        shard_map call, with Comm = the per-step forward halo refresh)."""
        out = min(output_time, loop_time)
        rest = max(loop_time - out, 0.0)
        breakdown = {"Output": out}
        if self.timer_detail and hasattr(runner, "phase_fractions"):
            frac = runner.phase_fractions(self.state, self.tables, self.dt,
                                          aux=self.aux, istep=self.step_count)
            breakdown["Pair"] = rest * frac.get("Pair", 1.0)
            breakdown["Neigh"] = rest * frac.get("Neigh", 0.0)
            breakdown["Modify"] = rest * frac.get("Modify", 0.0)
            if "Comm" in frac:
                breakdown["Comm"] = rest * frac["Comm"]
        else:
            breakdown["Pair"] = rest
        return breakdown

    def _measured_cell_cap(self, cutoff: float, skin: float,
                           frac: float | None = None) -> int:
        """Cell capacity from the MEASURED occupancy histogram of the current
        configuration (+25% headroom, 8-aligned). Tight caps are the main
        pair-sweep cost lever (cost scales with cap); the runtime overflow
        guard (_check_overflow) aborts loudly if dynamics outgrow it —
        raise Simulation.cell_cap then."""
        if self.state is not None:
            self._pull_state()
        x = np.asarray(self._staged["x"])
        lo = np.asarray(self.box.lo)
        length = np.asarray(self.box.hi) - lo
        side = cutoff + skin
        nc = np.maximum(np.floor(length / side).astype(int), 1)
        if self.spec.dim == 2:
            nc[2] = 1
        size = length / nc
        c = np.clip(((x - lo) // size).astype(int), 0, nc - 1)
        flat = (c[:, 0] * nc[1] + c[:, 1]) * nc[2] + c[:, 2]
        max_occ = int(np.bincount(flat).max()) if len(flat) else 8
        # headroom over the MEASURED max (overflow aborts loudly if dynamics
        # outgrow it); phase change inserts particles -> more. _cap_boost
        # escalates on every overflow re-choose (api.run) so violent cases
        # converge instead of re-overflowing by epsilon.
        if frac is None:
            frac = 1.6 if self.phase_change_config else 1.15
        frac *= getattr(self, "_cap_boost", 1.0)
        return int(math.ceil((max_occ * frac + 2) / 8.0) * 8)

    def _check_overflow(self):
        """Fixed-capacity overflow guard (the 'dangerous builds' analog,
        SURVEY §5.2): cell-cap or halo-buffer overflow means silently
        dropped interactions — abort with a remedy."""
        aux = self.aux
        ov = 0
        if aux is not None and hasattr(aux, "overflow"):
            ov = int(np.sum(np.asarray(jax.device_get(aux.overflow))))
        if ov > 0:
            ms = getattr(aux, "margin_short", None)
            if ms is None:
                # dist mode nests the per-brick GridData (which carries the
                # measured coverage shortfall) under aux.grid
                ms = getattr(getattr(aux, "grid", None), "margin_short", None)
            if ms is not None:
                arr = np.asarray(jax.device_get(ms)).reshape(-1, 2)
                self._margin_short = (int(arr[:, 0].max()),
                                      int(arr[:, 1].max()))
            raise RuntimeError(
                f"cell/halo capacity overflow ({ov} particles dropped from "
                "pair windows). Raise Simulation.cell_cap (cell capacity) "
                "or the dist ghost/migrate caps and rerun.")

    # ------------------------------------------------------------- accessors

    def get(self, field: str) -> np.ndarray:
        """Per-particle array for alive particles, in tag order
        (lammps_extract_atom equivalent)."""
        if self.state is None:
            self._build_state()
        dev = jax.device_get(self.state)
        alive = (dev.type > 0) & dev.owned
        order = np.argsort(dev.tag[alive], kind="stable")
        if field == "t":
            arr = dev.e / np.where(dev.cv > 0, dev.cv, 1.0)
        elif field == "x":
            arr = self._host_x(dev)
        else:
            arr = getattr(dev, field)
        return np.asarray(arr)[alive][order]

    @property
    def natoms(self) -> int:
        if self.state is None:
            return len(self._staged.get("x", ()))
        return int(jax.device_get(self.state.nlocal()))
