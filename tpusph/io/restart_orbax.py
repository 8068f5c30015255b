"""Orbax-based checkpointing (SURVEY §5.4's TPU-native equivalent of binary
restarts) — asynchronous-capable, multi-host-aware; complements the portable
.npz format in tpusph.io.restart (which remains the write_restart default
because it is dependency-light and diff-able)."""

from __future__ import annotations

import dataclasses
import json
import os

import jax
import numpy as np

from tpusph.params import PairTables, PhysicsSpec
from tpusph.state import Box, ParticleState


def save(path: str, sim) -> None:
    import orbax.checkpoint as ocp

    if sim.state is None:
        sim._build_state()
    payload = {
        "state": {f.name: getattr(sim.state, f.name)
                  for f in dataclasses.fields(ParticleState)},
        "tables": {f.name: getattr(sim.tables, f.name)
                   for f in dataclasses.fields(PairTables)},
    }
    meta = dict(
        spec=sim.spec._asdict(),
        step_count=sim.step_count, time_acc=sim.time_acc, dt=sim.dt,
        box_lo=[float(v) for v in np.asarray(sim.box.lo)],
        box_hi=[float(v) for v in np.asarray(sim.box.hi)],
        periodic=list(sim.box.periodic),
    )
    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(path, payload, force=True)
    with open(os.path.join(path, "tpusph_meta.json"), "w") as f:
        json.dump(meta, f)


def load(path: str, sim) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(path)
    with open(os.path.join(path, "tpusph_meta.json")) as f:
        meta = json.load(f)
    spec = dict(meta["spec"])
    spec["scalar_tables"] = tuple(spec.get("scalar_tables", ()))
    sim.spec = PhysicsSpec(**spec)
    sim.tables = PairTables(**{k: jax.numpy.asarray(v)
                               for k, v in payload["tables"].items()})
    sim.state = ParticleState(**{k: jax.numpy.asarray(v)
                                 for k, v in payload["state"].items()})
    sim.box = Box.create(meta["box_lo"], meta["box_hi"],
                         tuple(meta["periodic"]))
    sim.step_count = int(meta["step_count"])
    sim.time_acc = float(meta["time_acc"])
    sim.dt = float(meta["dt"])
    sim.aux = None
    sim._runner = None
    sim._runner_key = None
