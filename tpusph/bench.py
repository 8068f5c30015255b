"""Throughput benchmark: particle-steps/sec/chip on the BASELINE.md
north-star configuration (3D multiphase: rhosum + taitwater + heat
conduction + CSF surface tension over a sorted cell grid).

The baseline denominator is the reference's estimated single-node LAMMPS
CPU throughput for this pair-style mix, 5e7 particle-steps/s/node
(BASELINE.md: O(1-5)e6 per core, O(1e7-1e8) per node; the repo publishes no
numbers — BASELINE.json "published": {}). vs_baseline = ours / 5e7; the
north-star target is >= 50.
"""

from __future__ import annotations

import json
import time

import numpy as np


BASELINE_NODE_PSPS = 5.0e7  # estimated reference single-node particle-steps/s


def build_bench_sim(n_particles: int, dim: int = 3, multiphase: bool = True,
                    backend: str = "auto"):
    """A periodic 3D two-phase block: a vapor sphere inside liquid."""
    import jax
    from tpusph.api import Simulation

    sim = Simulation(dim=dim, screen=False)
    sim.backend_name = backend

    # lattice sized to hit the particle budget
    per_side = int(round(n_particles ** (1.0 / dim)))
    dx = 1.0
    L = per_side * dx
    h = 3.0 * dx
    rho0 = 1.0
    m = rho0 * dx**dim

    per = (True, True, True) if dim == 3 else (True, True, False)
    sim.create_box([0, 0, 0], [L, L, L if dim == 3 else 1.0],
                   periodic=per, ntypes=2 if multiphase else 1)

    ax = np.arange(per_side, dtype=np.float32) * dx
    if dim == 3:
        g = np.stack(np.meshgrid(ax, ax, ax, indexing="ij"), -1).reshape(-1, 3)
    else:
        g2 = np.stack(np.meshgrid(ax, ax, indexing="ij"), -1).reshape(-1, 2)
        g = np.concatenate([g2, np.zeros((len(g2), 1), np.float32)], axis=1)

    types = np.ones(len(g), np.int32)
    if multiphase:
        c = L / 2.0
        r = np.linalg.norm(g - c, axis=1)
        types[r < L / 5.0] = 2
    sim.add_particles(g, types, rho=rho0, e=1.0, cv=1.0, rmass=m)

    sim.pair_rhosum(every=1)
    sim.pair_taitwater(morris=False)
    sim.pair_heatconduction()
    for i in (1, 2) if multiphase else (1,):
        for j in range(i, (2 if multiphase else 1) + 1):
            sim.tables.set_taitwater(i, j, rho0=rho0, c0=10.0,
                                     viscosity=0.3, h=h)
            sim.tables.set_rhosum(i, j, h=h)
            sim.tables.set_heatconduction(i, j, d=0.05, h=h)
    if multiphase:
        sim.pair_surfacetension()
        sim.tables.set_surfacetension(1, 2, sigma=0.05, h=h)

    # skin = 1 dx makes the cell side exactly 4 dx: uniform 64-particle
    # occupancy on the sc lattice (tight cap, no misalignment waste) and a
    # longer rebuild horizon
    sim.neighbor_skin = 1.0 * dx
    sim.dt = 2e-3
    sim.thermo(0)
    return sim


def _rebuild_count(sim) -> int:
    aux = sim.aux
    if aux is not None and hasattr(aux, "nbuilds"):
        import jax
        return int(np.sum(np.asarray(jax.device_get(aux.nbuilds))))
    return -1


def run_bench(n_particles: int = 1_000_000, n_steps: int = 50, dim: int = 3,
              multiphase: bool = True, backend: str = "auto",
              warmup_steps: int = 5, n_windows: int = 3) -> dict:
    """Median of ``n_windows`` timed windows of ``n_steps`` each, after one
    warmup window with the SAME chunk size (nsteps is a static jit arg: a
    different chunk would recompile inside the timed region). Rebuild counts
    per window are reported so the number is interpretable — a window that
    rebuilt more often is honestly slower, not noise."""
    import jax

    sim = build_bench_sim(n_particles, dim=dim, multiphase=multiphase,
                          backend=backend)
    n = sim.natoms

    sim.run(n_steps)  # warmup: compiles the run block + first rebuilds
    jax.block_until_ready(sim.state.x)

    walls, rebuilds = [], []
    for _ in range(n_windows):
        nb0 = _rebuild_count(sim)
        t0 = time.perf_counter()
        sim.run(n_steps)
        jax.block_until_ready(sim.state.x)
        walls.append(time.perf_counter() - t0)
        nb1 = _rebuild_count(sim)
        rebuilds.append(nb1 - nb0 if nb0 >= 0 and nb1 >= 0 else -1)

    dt_wall = float(np.median(walls))
    psps = n * n_steps / dt_wall
    return {
        "metric": f"particle-steps/sec/chip @ {n} particles "
                  f"({dim}D multiphase: rhosum+taitwater+heatcond+CSF, "
                  f"backend={backend})",
        "value": round(psps, 1),
        "unit": "particle-steps/s",
        # vs_baseline divides by an ESTIMATED reference single-node LAMMPS
        # CPU throughput (5e7 p-s/s) — the reference publishes no SPH
        # numbers (BASELINE.json "published": {}).
        "vs_baseline": round(psps / BASELINE_NODE_PSPS, 6),
        "wall_s": round(dt_wall, 3),
        "windows_s": [round(w, 3) for w in walls],
        "rebuilds_per_window": rebuilds,
        "steps": n_steps,
        "particles": int(n),
        "device": str(jax.devices()[0]),
    }


if __name__ == "__main__":
    print(json.dumps(run_bench()))
