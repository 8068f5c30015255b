"""Per-phase timer breakdown (Timer buckets, SURVEY §5.1) smoke test."""

import sys

sys.path.insert(0, "tests")


def test_profile_step_phases():
    from tpusph.runner import profile_step
    from tpusph.script import Interpreter
    from test_dist import PERIODIC_SCRIPT

    interp = Interpreter()
    interp.sim.screen = False
    interp.run_string(PERIODIC_SCRIPT.format(lx=3.2, lxf=3.15))
    sim = interp.sim
    sim.backend_name = "cellgrid"
    runner = sim._ensure_runner()
    sim._build_state()
    state, aux = runner.backend.init_aux(sim.state, sim.box)

    phases = profile_step(runner, state, sim.tables, sim.dt, aux=aux, reps=2)
    assert set(phases) == {"Modify", "Neigh", "Pair"}
    assert all(v > 0 for v in phases.values())
    # the pair sweeps dominate an SPH step (SURVEY §3.2 HOT #1)
    assert phases["Pair"] > phases["Modify"]
