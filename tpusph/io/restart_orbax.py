"""Orbax-based checkpointing (SURVEY §5.4's TPU-native equivalent of binary
restarts) — complements the portable .npz format in tpusph.io.restart (which
remains the write_restart default because it is dependency-light and
diff-able). Both store the same compact payload: alive owned particles in
GLOBAL coordinates, so checkpoints are mesh-independent (a run can resume on
a different brick count — the reference cannot)."""

from __future__ import annotations

import dataclasses
import json
import os

import jax.numpy as jnp
import numpy as np

from tpusph.io.restart import _STAGED_FIELDS
from tpusph.params import PairTables, PhysicsSpec
from tpusph.state import Box


def save(path: str, sim) -> None:
    import orbax.checkpoint as ocp

    sim._pull_state()
    payload = {
        "staged": {k: np.asarray(sim._staged[k]) for k in _STAGED_FIELDS},
        "tables": {f.name: getattr(sim.tables, f.name)
                   for f in dataclasses.fields(PairTables)},
    }
    meta = dict(
        spec=sim.spec._asdict(),
        step_count=sim.step_count, time_acc=sim.time_acc, dt=sim.dt,
        box_lo=[float(v) for v in np.asarray(sim.box.lo)],
        box_hi=[float(v) for v in np.asarray(sim.box.hi)],
        periodic=list(sim.box.periodic),
        capacity_pad=sim.capacity_pad,
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
    sim.tables = PairTables(**{k: jnp.asarray(v)
                               for k, v in payload["tables"].items()})
    staged = {k: np.asarray(payload["staged"][k]) for k in _STAGED_FIELDS}
    staged["type"] = staged["type"].astype(np.int32)
    staged["tag"] = staged["tag"].astype(np.int32)
    staged["mobile"] = staged["mobile"].astype(bool)
    sim._staged = staged
    sim.box = Box.create(meta["box_lo"], meta["box_hi"],
                         tuple(meta["periodic"]))
    sim.step_count = int(meta["step_count"])
    sim.time_acc = float(meta["time_acc"])
    sim.dt = float(meta["dt"])
    sim.capacity_pad = int(meta.get("capacity_pad", 0))
    sim.state = None
    sim.aux = None
    sim._runner = None
    sim._runner_key = None
    sim._next_tag = int(staged["tag"].max()) + 1 if len(staged["tag"]) else 1
