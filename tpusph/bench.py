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
                    backend: str = "auto", mode: str = "dynamic"):
    """A periodic 3D two-phase block: a vapor sphere inside liquid.

    Modes (TPUSPH_BENCH_MODE; r2 VERDICT #8 — the quiescent number alone is
    a kernel ceiling, not the production workload):
      uniform — both phases at rho0=1, zero velocities: the kernel-ceiling
                datapoint (timed windows contain ~no rebuilds).
      dynamic — real mass-density contrast (vapor rho0 = 0.1 via
                sph/rhosum/multiphase number-density summation) + thermal
                velocity field sized so the production rebuild cadence
                falls inside every timed window.
      boiling — dynamic + sph/heatconduction/phasechange + fix
                phase_change: the BASELINE config-5 north-star workload
                (insertions force rebuilds).
    """
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
    contrast = mode in ("dynamic", "boiling")
    rho_v = 0.1 if contrast else rho0

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
    vap = types == 2
    v = None
    if mode in ("dynamic", "boiling"):
        # thermal velocity field (Mach ~0.06): max displacement reaches
        # skin/2 every ~40-60 steps -> >= 1 rebuild per 50-step window
        rng = np.random.default_rng(7)
        v = rng.normal(0.0, 0.35, g.shape).astype(np.float32)
        if dim == 2:
            v[:, 2] = 0.0
        v -= v.mean(axis=0, keepdims=True)
    sim.add_particles(g, types, v=v,
                      rho=np.where(vap, rho_v, rho0).astype(np.float32),
                      e=1.0, cv=1.0,
                      rmass=np.where(vap, rho_v * dx**dim, m
                                     ).astype(np.float32))

    sim.pair_rhosum(every=1, number_density=contrast)
    sim.pair_taitwater(morris=False)
    if mode == "boiling":
        sim.pair_heatconduction(phasechange=True)
    else:
        sim.pair_heatconduction()
    pairs = [(i, j) for i in ((1, 2) if multiphase else (1,))
             for j in range(i, (2 if multiphase else 1) + 1)]
    # cross pair first: set_taitwater writes rho0/c0 for BOTH types
    for i, j in sorted(pairs, key=lambda p: p[0] == p[1]):
        sim.tables.set_taitwater(i, j, rho0=rho_v if i == j == 2 else rho0,
                                 c0=10.0, viscosity=0.3, h=h)
        sim.tables.set_rhosum(i, j, h=h)
        tsat = 1.5 if (mode == "boiling" and i != j) else 0.0
        sim.tables.set_heatconduction(i, j, d=0.05, h=h, tsat=tsat)
    if multiphase:
        sim.pair_surfacetension()
        sim.tables.set_surfacetension(1, 2, sigma=0.05, h=h)
    if mode == "boiling":
        from tpusph.ops.phase_change import PhaseChangeConfig
        # hot interface shell: T above threshold there, latent-throttled
        hot = ~vap & (r < L / 4.0)
        e0 = np.where(hot, 2.5, 1.0).astype(np.float32)
        sim._staged["e"][:] = e0
        sim.configure_phase_change(PhaseChangeConfig(
            t_threshold=2.0, latent=20.0, dm=0.05 * m, liquid_type=1,
            vapor_type=2, every=10, prob=0.05, insert_offset=0.5 * dx,
            cutoff=h, vapor_rho=rho_v))

    # skin 1.0 dx: with the measured per-tile fixed cost in the chooser
    # (strip_pair._TILE_FIXED_LANES) the one-vreg W=128/ts=16 geometry is
    # a LOSS (4x the tiles, ~5.7 us fixed each — measured 503 ms vs 216 ms
    # force stage @1M), so both skins land (ts=64, W=256) and the larger
    # skin halves the rebuild cadence. TPUSPH_BENCH_SKIN overrides (r5:
    # the post-transition W=384 window carries ~45 rows of measured slack
    # — extra skin rides it free while stretching the rebuild cadence).
    import os as _os
    sim.neighbor_skin = float(_os.environ.get("TPUSPH_BENCH_SKIN", "1.0")) * dx
    sim.dt = 2e-3 if mode == "uniform" else 5e-3
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
              warmup_steps: int = 5, n_windows: int = 3,
              mode: str = "dynamic") -> dict:
    """Median of ``n_windows`` timed windows of ``n_steps`` each, after one
    warmup window with the SAME chunk size (nsteps is a static jit arg: a
    different chunk would recompile inside the timed region). Rebuild counts
    per window are reported so the number is interpretable — a window that
    rebuilt more often is honestly slower, not noise."""
    import jax

    sim = build_bench_sim(n_particles, dim=dim, multiphase=multiphase,
                          backend=backend, mode=mode)
    n = sim.natoms

    def _rechoices():
        # escalations (violation recovery) + de-escalations (margin decay)
        return (getattr(sim, "_strip_violations", 0)
                + getattr(sim, "_strip_decays", 0))

    sim.run(n_steps)  # warmup: compiles the run block + first rebuilds
    jax.block_until_ready(sim.state.x)
    warmup_windows = 1
    if mode in ("dynamic", "boiling"):
        # ADAPTIVE warmup (r4 VERDICT weak #3: a fixed second window let a
        # re-choice leak into the first timed window): the initial lattice
        # mixes into a fluid over the first ~n_steps, which can escalate
        # the strip margins (violation recovery), and a few windows later
        # the margin DECAY re-chooses a leaner geometry once the transient
        # slack is measured. Keep running warmup windows until one passes
        # with NO geometry re-choice, so every escalation/decay recompile
        # lands outside the timed region.
        import os
        cap = int(os.environ.get("TPUSPH_BENCH_WARMUP_MAX", "8"))
        prev = -1
        while warmup_windows < cap and _rechoices() != prev:
            prev = _rechoices()
            sim.run(n_steps)
            jax.block_until_ready(sim.state.x)
            warmup_windows += 1

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
    styles = {"uniform": "rhosum+taitwater+heatcond+CSF, quiescent",
              "dynamic": "rhosum/multiphase+taitwater+heatcond+CSF, "
                         "density contrast 10x + thermal field",
              "boiling": "rhosum/multiphase+taitwater+heatcond/phasechange"
                         "+CSF+fix phase_change"}[mode]
    return {
        "metric": f"particle-steps/sec/chip @ {n} particles "
                  f"({dim}D multiphase: {styles}, backend={backend})",
        "mode": mode,
        "value": round(psps, 1),
        "unit": "particle-steps/s",
        # vs_baseline divides by an ESTIMATED reference single-node LAMMPS
        # CPU throughput (5e7 p-s/s) — the reference publishes no SPH
        # numbers (BASELINE.json "published": {}). The estimate carries a
        # real uncertainty band (r3 VERDICT #9): per-core O(1-5)e6 x 16-32
        # cores spans [2e7, 1e8]; vs_baseline_range states the multiple at
        # both ends so the north-star verdict never rests on one constant.
        "vs_baseline": round(psps / BASELINE_NODE_PSPS, 6),
        "baseline_range": [2.0e7, 1.0e8],
        "vs_baseline_range": [round(psps / 1.0e8, 6),
                              round(psps / 2.0e7, 6)],
        "wall_s": round(dt_wall, 3),
        "windows_s": [round(w, 3) for w in walls],
        "rebuilds_per_window": rebuilds,
        # strip geometry re-chooses over the whole run: escalations
        # (coverage violations) + margin decays. The adaptive warmup keeps
        # them out of the timed windows; warmup_windows says how many it
        # took to stabilize.
        "geometry_rechoices": _rechoices(),
        "geometry_decays": getattr(sim, "_strip_decays", 0),
        "warmup_windows": warmup_windows,
        "strip_w": (lambda g: g.w if g is not None else None)(
            sim._current_strip_geom()),
        "steps": n_steps,
        "particles": int(n),
        "device": str(jax.devices()[0]),
    }


if __name__ == "__main__":
    print(json.dumps(run_bench()))
