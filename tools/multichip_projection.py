"""Multi-chip perf projection inputs (r4 VERDICT #10).

Real multi-chip hardware is unavailable in this sandbox (one v5e chip via
a tunnel), so the v5p-8 projection in PERFORMANCE.md is assembled from
measurable proxies, each with stated limits:

  (a) CPU-mesh phase fractions  -- python tools/multichip_projection.py cpu
      DistRunner.phase_fractions on the 8-virtual-device CPU mesh: the
      per-step cost STRUCTURE (Comm = forward halo refresh vs Pair/Neigh/
      Modify). CPU relative costs are not TPU relative costs — the
      number that transfers is the comm VOLUME per step and its scaling
      (surface/volume), not the wall fraction.

  (b) dist-runner overhead on the real chip -- ... tpu
      The SAME workload through the plain single-chip runner vs the dist
      runner on a 1-brick mesh (all ppermutes are self-sends over ICI-
      less identity): isolates the dist machinery's fixed per-step cost
      (halo pack/merge rows, psum'd triggers, freeze predicates) from
      actual inter-chip traffic. Runs on the TPU — do not run while
      another jax process holds the tunnel.

Outputs one JSON line per mode; PERFORMANCE.md carries the projection
formula that combines them.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _cpu_mesh_fractions(n_particles: int = 32_768, ndev: int = 8):
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={ndev}").strip()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from tpusph import dist
    from tpusph.bench import build_bench_sim

    sim = build_bench_sim(n_particles, backend="cellgrid", mode="dynamic")
    sim.set_mesh(ndev, shape=(2, 2, 2), axes=(0, 1, 2))
    sim.thermo_every = 0
    runner = sim._ensure_runner()
    state, sim.local_cap = dist.partition_state(
        dict(sim._staged), sim.brick_spec, sim.mesh,
        local_cap=getattr(sim, "_dist_local_cap", None))
    state = runner.setup(state, sim.tables, istep=0, aux=None)
    frac = runner.phase_fractions(state, sim.tables, sim.dt,
                                  aux=runner.aux, istep=0)
    # comm volume per step: the forward halo is the (n_ghost x 8-field)
    # matrix per side — the number that DOES transfer to TPU projections
    aux = runner.aux
    n_ghost = np.asarray(jax.device_get(aux.n_ghost)).reshape(ndev, -1)
    per_brick_ghosts = n_ghost.sum(axis=1)
    bytes_per_step = int(per_brick_ghosts.max()) * 8 * 4  # (n,8) f32 fwd comm
    return {
        "mode": "cpu_mesh_fractions",
        "n_particles": int(sim.natoms),
        "ndev": ndev,
        "mesh": "(2,2,2)",
        "fractions": {k: round(v, 4) for k, v in frac.items()},
        "worst_brick_ghost_rows": int(per_brick_ghosts.max()),
        "fwd_comm_bytes_per_step_per_brick": bytes_per_step,
        "note": "CPU wall fractions are structural only; ghost-row volume "
                "is the transferable quantity",
    }


def _tpu_dist_overhead(n_particles: int = 250_000, n_steps: int = 20):
    """Plain runner vs 1-brick dist runner, same workload, real chip."""
    import jax
    import numpy as np
    from tpusph.bench import build_bench_sim

    out = {}
    for tag, mesh in (("plain", None), ("dist1", 1)):
        sim = build_bench_sim(n_particles, backend="auto", mode="dynamic")
        if mesh is not None:
            sim.set_mesh(mesh)
        sim.thermo_every = 0
        sim.run(n_steps)                      # compile + transient
        jax.block_until_ready(sim.state.x)
        sim.run(n_steps)                      # settle re-chooses
        jax.block_until_ready(sim.state.x)
        t0 = time.perf_counter()
        sim.run(n_steps)
        jax.block_until_ready(sim.state.x)
        dt = time.perf_counter() - t0
        out[tag] = {"wall_s": round(dt, 3),
                    "ms_per_step": round(1e3 * dt / n_steps, 2),
                    "psps": round(sim.natoms * n_steps / dt, 1)}
    out["dist_overhead_ms_per_step"] = round(
        out["dist1"]["ms_per_step"] - out["plain"]["ms_per_step"], 2)
    return {"mode": "tpu_dist_overhead", "n_particles": n_particles,
            "n_steps": n_steps, **out}


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "cpu"
    if which == "cpu":
        print(json.dumps(_cpu_mesh_fractions()))
    elif which == "tpu":
        print(json.dumps(_tpu_dist_overhead()))
    else:
        raise SystemExit(f"unknown mode {which!r} (cpu|tpu)")
