"""Window-level cost split for the dynamic bench: runs bench-identical
warmup then K windows of 50 steps, records (wall, rebuilds, geometry,
violations) per window, and least-squares the per-step vs per-rebuild
cost (wall = a*steps + b*rebuilds). Ends with a phase profile at the WARM
geometry (profile_1M profiled the cold, pre-mixing geometry — the numbers
disagreed with the bench by the geometry escalation, not by overhead).
Usage: python tools/diag_windows.py [n] [mode] [nwindows] [nsteps]."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402


def geom_line(sim):
    g = getattr(sim._runner.backend, "geom", None)
    if g is None or not hasattr(g, "ts"):
        return None
    return dict(ts=g.ts, ch=g.ch, mlo=g.mlo, mhi=g.mhi, W=g.w, t_blk=g.t_blk,
                ncols=g.ncols, col_cap=g.col_cap, skin=g.skin,
                drift=getattr(sim, "_strip_drift", 1.0),
                viol=getattr(sim, "_strip_violations", 0))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "dynamic"
    nwin = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    nsteps = int(sys.argv[4]) if len(sys.argv) > 4 else 50
    from tpusph.bench import build_bench_sim, _rebuild_count

    t0 = time.perf_counter()
    sim = build_bench_sim(n, mode=mode)
    sim.run(nsteps)
    jax.block_until_ready(sim.state.x)
    print("warmup1_s: %.1f" % (time.perf_counter() - t0), geom_line(sim),
          flush=True)
    t0 = time.perf_counter()
    sim.run(nsteps)
    jax.block_until_ready(sim.state.x)
    print("warmup2_s: %.1f" % (time.perf_counter() - t0), geom_line(sim),
          flush=True)

    walls, rebuilds = [], []
    for w in range(nwin):
        nb0 = _rebuild_count(sim)
        t0 = time.perf_counter()
        sim.run(nsteps)
        jax.block_until_ready(sim.state.x)
        wall = time.perf_counter() - t0
        nb = _rebuild_count(sim) - nb0
        walls.append(wall)
        rebuilds.append(nb)
        print("window %d: %.2f s  rebuilds=%d  %s"
              % (w, wall, nb, geom_line(sim)), flush=True)

    A = np.stack([np.full(nwin, nsteps), np.array(rebuilds)], axis=1)
    coef, *_ = np.linalg.lstsq(A.astype(np.float64), np.array(walls),
                               rcond=None)
    print("lstsq: steady %.1f ms/step, rebuild %.1f ms each"
          % (coef[0] * 1e3, coef[1] * 1e3), flush=True)
    psps = n * nsteps / np.median(walls)
    print("median window p-s/s: %.3gM" % (psps / 1e6), flush=True)

    from tpusph.runner import profile_step
    ph = profile_step(sim._runner, sim.state, sim.tables, sim.dt,
                      aux=sim.aux, reps=5)
    print("warm phases_ms:", {k: round(v * 1e3, 2) for k, v in ph.items()},
          flush=True)


if __name__ == "__main__":
    main()
