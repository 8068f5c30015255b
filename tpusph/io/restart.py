"""Checkpoint / resume — the write_restart / read_restart equivalent
(src/write_restart.cpp, read_restart.cpp — SURVEY.md §3.4, §5.4).

Format: a single .npz with the COMPACT particle set (alive owned particles
in global coordinates), box, step counter, dt, and the physics spec/tables.
Continuation is exact modulo reneighboring — the same guarantee as the
reference — because every derived field (f, drho, de, vest) is recomputed by
Verlet::setup from (x, v, rho, e) before its first use. Storing the compact
set (not the device pool) makes checkpoints mesh-independent: a run can
resume on a different brick count, which the reference cannot do.
Orbax-based async checkpointing for multi-host runs layers on top of the
same payload (tpusph.io.restart_orbax).
"""

from __future__ import annotations

import json
from typing import NamedTuple

import numpy as np

from tpusph.params import PairTables, PhysicsSpec
from tpusph.state import Box

FORMAT_VERSION = 2

_STAGED_FIELDS = ("x", "v", "type", "rho", "e", "cv", "rmass", "tag",
                  "mobile")


class RestartSchedule(NamedTuple):
    every: int
    path_template: str  # may contain '*' replaced by the step number


def write_restart(path: str, sim):
    """Dispatch by extension: ``.npz`` -> the native compressed format
    below; anything else -> the LAMMPS binary restart layout
    (io/lammps_restart.py; SURVEY §3.4 write_restart.cpp), matching the
    reference convention where restart paths carry no fixed suffix."""
    if not path.endswith(".npz"):
        from tpusph.io.lammps_restart import write_restart_lammps
        return write_restart_lammps(path, sim)
    import dataclasses
    import jax
    sim._pull_state()  # globalized, compact host copy of the current state
    payload = {f"staged_{k}": np.asarray(sim._staged[k])
               for k in _STAGED_FIELDS}
    tab = jax.device_get(sim.tables)
    for f in dataclasses.fields(PairTables):
        payload[f"tables_{f.name}"] = np.asarray(getattr(tab, f.name))
    meta = dict(
        version=FORMAT_VERSION,
        spec=sim.spec._asdict(),
        step_count=sim.step_count,
        time_acc=sim.time_acc,
        dt=sim.dt,
        box_lo=[float(v) for v in np.asarray(sim.box.lo)],
        box_hi=[float(v) for v in np.asarray(sim.box.hi)],
        periodic=list(sim.box.periodic),
        thermo_every=sim.thermo_every,
        thermo_columns=sim.thermo_columns,
        capacity_pad=sim.capacity_pad,
    )
    payload["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **payload)


def read_restart(path: str, sim):
    """Content-sniffing dispatch: LAMMPS binary restarts open with the
    magic tag string, .npz archives with the zip signature — so either
    format reads through this one entry point regardless of suffix."""
    with open(path, "rb") as fp:
        magic = fp.read(14)
    if magic.startswith(b"LammpS Restart"):
        from tpusph.io.lammps_restart import read_restart_lammps
        return read_restart_lammps(path, sim)
    import dataclasses
    import jax.numpy as jnp
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta_json"]).decode())
        if meta["version"] != FORMAT_VERSION:
            raise ValueError(f"restart version {meta['version']} != "
                             f"{FORMAT_VERSION}")
        staged = {k: np.asarray(z[f"staged_{k}"]) for k in _STAGED_FIELDS}
        tab_kwargs = {}
        for f in dataclasses.fields(PairTables):
            tab_kwargs[f.name] = jnp.asarray(z[f"tables_{f.name}"])
    spec_kw = dict(meta["spec"])
    # json turns tuples into lists; spec must stay hashable
    spec_kw["scalar_tables"] = tuple(spec_kw.get("scalar_tables", ()))
    sim.spec = PhysicsSpec(**spec_kw)
    sim.tables = PairTables(**tab_kwargs)
    sim.box = Box.create(meta["box_lo"], meta["box_hi"],
                         periodic=tuple(meta["periodic"]))
    sim.step_count = int(meta["step_count"])
    sim.time_acc = float(meta["time_acc"])
    sim.dt = float(meta["dt"])
    sim.thermo_every = int(meta["thermo_every"])
    sim.thermo_columns = list(meta["thermo_columns"])
    sim.capacity_pad = int(meta.get("capacity_pad", 0))
    sim._staged = staged
    sim.state = None   # rebuilt (and repartitioned, in dist mode) at next run
    sim.aux = None
    sim._runner = None
    sim._runner_key = None
    sim._next_tag = int(staged["tag"].max()) + 1 if len(staged["tag"]) else 1
