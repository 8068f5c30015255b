"""Time individual steps of the dynamic bench to expose the true in-loop
rebuild cost (profile_step times the no-rebuild branch only). Usage:
python tools/diag_rebuild_cost.py [n] [mode] [nsteps]."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import numpy as np  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "dynamic"
    nsteps = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    from tpusph.bench import build_bench_sim

    sim = build_bench_sim(n, mode=mode)
    # bench-equivalent warmup: two 50-step windows (lattice mixes, one
    # geometry re-choice absorbed)
    sim.run(50)
    jax.block_until_ready(sim.state.x)
    sim.run(50)
    jax.block_until_ready(sim.state.x)
    g = getattr(sim._runner.backend, "geom", None)
    if g is not None and hasattr(g, "ts"):
        print("geom:", dict(ts=g.ts, ch=g.ch, mlo=g.mlo, mhi=g.mhi, W=g.w,
                            t_blk=g.t_blk, ncols=g.ncols, col_cap=g.col_cap,
                            skin=g.skin), flush=True)

    # single-step blocks (compiles once for nsteps=1, then timed)
    sim.run(1)
    jax.block_until_ready(sim.state.x)
    times = []
    nb_prev = None
    aux = sim.aux
    if aux is not None and hasattr(aux, "nbuilds"):
        nb_prev = int(np.sum(np.asarray(jax.device_get(aux.nbuilds))))
    marks = []
    for _ in range(nsteps):
        t0 = time.perf_counter()
        sim.run(1)
        jax.block_until_ready(sim.state.x)
        times.append(time.perf_counter() - t0)
        if nb_prev is not None:
            nb = int(np.sum(np.asarray(jax.device_get(sim.aux.nbuilds))))
            marks.append(nb > nb_prev)
            nb_prev = nb
        else:
            marks.append(False)
    times = np.array(times) * 1e3
    marks = np.array(marks)
    print(f"steps={nsteps} rebuilds={int(marks.sum())}", flush=True)
    print("no-rebuild ms: median %.1f  mean %.1f  (n=%d)"
          % (np.median(times[~marks]), times[~marks].mean(),
             (~marks).sum()), flush=True)
    if marks.any():
        print("rebuild    ms: median %.1f  mean %.1f  max %.1f (n=%d)"
              % (np.median(times[marks]), times[marks].mean(),
                 times[marks].max(), marks.sum()), flush=True)
    print("all step ms:", np.round(times, 1).tolist(), flush=True)


if __name__ == "__main__":
    main()
