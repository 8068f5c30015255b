"""Boiling-mode block diagnostic: runs the bench's `boiling` config in
blocks and prints per-block wall time, violation/cap state, and natoms —
the tool used to chase strip+phase-change recompile/violation loops.

Usage: python tools/diag_boiling.py [n_particles] [blocks] [steps_per_block]
Env: TPUSPH_BENCH_BACKEND (default auto), JAX_PLATFORMS=cpu for local runs.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    blocks = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 25
    backend = os.environ.get("TPUSPH_BENCH_BACKEND", "auto")

    import jax
    from tpusph.bench import build_bench_sim

    sim = build_bench_sim(n, backend=backend, mode="boiling")
    print(f"backend: {backend} natoms: {sim.natoms}", flush=True)
    for b in range(blocks):
        t0 = time.perf_counter()
        sim.run(steps)
        jax.block_until_ready(sim.state.x)
        wall = time.perf_counter() - t0
        print(f"blk {b}: steps={(b + 1) * steps} natoms={sim.natoms} "
              f"violations={getattr(sim, '_strip_violations', 0)} "
              f"cap_boost={getattr(sim, '_cap_boost', 1.0):.2f} "
              f"mcap={getattr(sim, '_measured_cap', '?')} "
              f"wall={wall:.1f}s", flush=True)


if __name__ == "__main__":
    main()
