#!/usr/bin/env python
"""Regenerate the golden thermo logs under tests/golden/ (the reference's
committed log.<case> pattern — SURVEY §4.1). Run on CPU:

    python tools/generate_golden.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from tpusph.script import Interpreter  # noqa: E402

GOLDEN = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests", "golden")

CASES = {
    "heat_slab": dict(
        path="cases/heat_slab/in.heat_slab",
        var={"dx": "0.04"},
        pre=["thermo 20", "thermo_style custom step time pe"],
        run=100,
    ),
    "water_collapse": dict(
        path="cases/water_collapse/in.water_collapse",
        var={},
        pre=["variable dx2 equal 1", "thermo 40",
             "thermo_style custom step time ke pe"],
        run=200,
    ),
    "droplet": dict(
        path="cases/droplet/in.droplet",
        var={},
        pre=["thermo 40", "thermo_style custom step time ke density"],
        run=200,
    ),
    "bubble_rise": dict(
        path="cases/bubble_rise/in.bubble_rise",
        var={"dx": "0.08"},
        pre=["thermo 30", "thermo_style custom step time ke atoms"],
        run=150,
    ),
    "boiling": dict(
        path="cases/boiling/in.boiling",
        var={"dx": "0.08"},
        pre=["thermo 30", "thermo_style custom step time ke atoms"],
        run=150,
    ),
}


def generate(name, spec):
    log_path = os.path.join(GOLDEN, f"log.{name}")
    interp = Interpreter(variables=dict(spec["var"]))
    interp.sim.screen = False
    interp.sim.log_path = log_path
    text = open(spec["path"]).read()
    body = [l for l in text.splitlines()
            if not l.strip().startswith(("run", "dump", "thermo"))]
    interp.run_string("\n".join(body))
    for cmd in spec["pre"]:
        interp.command(cmd)
    interp.command(f"run {spec['run']}")
    print(f"golden {name}: {interp.sim.natoms} atoms -> {log_path}")


if __name__ == "__main__":
    os.makedirs(GOLDEN, exist_ok=True)
    for name, spec in CASES.items():
        generate(name, spec)
