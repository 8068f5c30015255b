"""Per-phase profile of the strip backend at bench scale on the live
device. Usage: python tools/profile_1M.py [n] [mode]; writes one line per
measurement. Companion to PERFORMANCE.md's strip-backend profile tables."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "uniform"
    from tpusph.bench import build_bench_sim
    from tpusph.runner import profile_step

    sim = build_bench_sim(n, mode=mode)
    sim.run(5)
    jax.block_until_ready(sim.state.x)
    runner = sim._runner
    g = getattr(runner.backend, "geom", None)
    if g is not None and hasattr(g, "ts"):
        print("geom:", dict(ts=g.ts, ch=g.ch, mlo=g.mlo, mhi=g.mhi, W=g.w,
                            t_blk=g.t_blk, ncols=g.ncols, col_cap=g.col_cap,
                            ntiles=g.ntiles, skin=g.skin), flush=True)
    ph = profile_step(runner, sim.state, sim.tables, sim.dt, aux=sim.aux,
                      reps=5)
    print("phases_ms:", {k: round(v * 1e3, 2) for k, v in ph.items()},
          flush=True)

    be = runner.backend
    if hasattr(be, "refresh_seam"):
        seam = jax.jit(lambda s, a: be.refresh_seam(s, a))
        out = seam(sim.state, sim.aux)
        jax.block_until_ready(out.x)
        t0 = time.perf_counter()
        for _ in range(10):
            out = seam(sim.state, sim.aux)
        jax.block_until_ready(out.x)
        print("refresh_seam_ms:", round((time.perf_counter() - t0) / 10 * 1e3,
                                        2), flush=True)
        src = sim.aux.seam_src
        print("seam_rows:", 0 if src is None else int(src.shape[0]),
              flush=True)

    t0 = time.perf_counter()
    sim.run(50)
    jax.block_until_ready(sim.state.x)
    print("full_ms_per_step:", round((time.perf_counter() - t0) / 50 * 1e3, 1),
          flush=True)


if __name__ == "__main__":
    main()
