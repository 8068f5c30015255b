"""Checkpoint / resume — the write_restart / read_restart equivalent
(src/write_restart.cpp, read_restart.cpp — SURVEY.md §3.4, §5.4).

Format: a single .npz with the full particle pool (every meso field
including vest), box, step counter, dt, and the physics spec/tables — enough
for exact continuation modulo reneighboring, same guarantee as the
reference. Orbax-based async checkpointing for multi-host runs layers on
top of the same payload (tpusph.io.restart_orbax).
"""

from __future__ import annotations

import dataclasses
import json
from typing import NamedTuple

import jax
import numpy as np

from tpusph.params import PairTables, PhysicsSpec
from tpusph.state import Box, ParticleState

FORMAT_VERSION = 1


class RestartSchedule(NamedTuple):
    every: int
    path_template: str  # may contain '*' replaced by the step number


def write_restart(path: str, sim):
    state = sim.state
    if state is None:
        sim._build_state()
        state = sim.state
    dev = jax.device_get(state)
    payload = {f"state_{f.name}": np.asarray(getattr(dev, f.name))
               for f in dataclasses.fields(ParticleState)}
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
    )
    payload["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **payload)


def read_restart(path: str, sim):
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta_json"]).decode())
        if meta["version"] != FORMAT_VERSION:
            raise ValueError(f"restart version {meta['version']} != "
                             f"{FORMAT_VERSION}")
        state_kwargs = {}
        for f in dataclasses.fields(ParticleState):
            state_kwargs[f.name] = jax.numpy.asarray(z[f"state_{f.name}"])
        tab_kwargs = {}
        for f in dataclasses.fields(PairTables):
            tab_kwargs[f.name] = jax.numpy.asarray(z[f"tables_{f.name}"])
    spec_kw = dict(meta["spec"])
    # json turns tuples into lists; spec must stay hashable
    spec_kw["scalar_tables"] = tuple(spec_kw.get("scalar_tables", ()))
    sim.spec = PhysicsSpec(**spec_kw)
    sim.tables = PairTables(**tab_kwargs)
    sim.state = ParticleState(**state_kwargs)
    sim.box = Box.create(meta["box_lo"], meta["box_hi"],
                         periodic=tuple(meta["periodic"]))
    sim.step_count = int(meta["step_count"])
    sim.time_acc = float(meta["time_acc"])
    sim.dt = float(meta["dt"])
    sim.thermo_every = int(meta["thermo_every"])
    sim.thermo_columns = list(meta["thermo_columns"])
    sim.aux = None
    sim._runner = None
    sim._runner_key = None
    # rebuild staging from the restored pool so set/group keep working
    dev = jax.device_get(sim.state)
    alive = (dev.type > 0) & dev.owned
    sim._staged = dict(
        x=np.asarray(dev.x[alive]), v=np.asarray(dev.v[alive]),
        type=np.asarray(dev.type[alive]), rho=np.asarray(dev.rho[alive]),
        e=np.asarray(dev.e[alive]), cv=np.asarray(dev.cv[alive]),
        rmass=np.asarray(dev.rmass[alive]), tag=np.asarray(dev.tag[alive]),
        mobile=np.asarray(dev.mobile[alive]),
    )
    sim._next_tag = int(dev.tag.max()) + 1 if alive.any() else 1
