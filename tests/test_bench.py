"""Benchmark harness smoke test (tiny, CPU): the driver-facing contract —
one JSON-able dict with metric/value/unit/vs_baseline."""

import json

from tpusph.bench import run_bench, build_bench_sim


def test_bench_contract_tiny():
    result = run_bench(n_particles=512, n_steps=4, dim=3, backend="cellgrid",
                       warmup_steps=2)
    assert result["unit"] == "particle-steps/s"
    assert result["value"] > 0
    assert result["vs_baseline"] > 0
    assert result["particles"] == 512
    json.dumps(result)  # serializable


def test_bench_sim_is_multiphase():
    sim = build_bench_sim(512, dim=3)
    types = sim._staged["type"]
    assert (types == 1).any() and (types == 2).any()
    assert sim.spec.tait and sim.spec.heatconduction
    assert sim.spec.surface_tension and sim.spec.rhosum_every == 1
