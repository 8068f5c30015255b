"""Within-Pair breakdown of the strip backend at bench scale: geometry
dump, window-pack cost, and per-kernel (rho / cgrad / force) time on the
live device. Companion to tools/profile_1M.py (whole-phase split).

Usage: python tools/profile_strip_kernels.py [n] [mode]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402


def timeit(label, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{label}: {(time.perf_counter() - t0) / reps * 1e3:.2f} ms",
          flush=True)
    return out


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "uniform"
    from tpusph.bench import build_bench_sim
    from tpusph.ops import strip_pair
    from tpusph.ops.band_pair import _state_fields

    sim = build_bench_sim(n, mode=mode)
    # dynamic/boiling: run past the lattice-transition geometry re-choice
    # (bench.py warms up 2 x 50 steps for the same reason) so the profile
    # measures the PRODUCTION margin-floor geometry, not the lattice one
    sim.run(5 if mode == "uniform" else 100)
    jax.block_until_ready(sim.state.x)
    be = sim._runner.backend
    g = be.geom
    print(f"geom: ncols={g.ncols} cap={g.col_cap} ts={g.ts} ch={g.ch} "
          f"mlo={g.mlo} mhi={g.mhi} W={g.ts + g.ch * (g.mlo + g.mhi)} "
          f"stride={g.stride} t_blk={g.t_blk} head={g.head} tail={g.tail} "
          f"n_slots={g.n_slots}", flush=True)

    state, aux = sim.state, sim.aux

    fields = _state_fields(state)
    pack_i = jax.jit(lambda s: be._pack_i(_state_fields(s)))
    pack_w = jax.jit(lambda s: be._pack_band(_state_fields(s)))
    timeit("pack_i", pack_i, state)
    timeit("pack_window", pack_w, state)

    # rebuild (sort + place + ghosts + delta)
    bld = jax.jit(lambda s: strip_pair.build_strips(s, g, sim.box))
    timeit("build_strips", bld, state)

    # per-step non-force costs (the dynamic-gap remainder): seam-ghost
    # forward-comm, the rebuild trigger check, the integrate halves
    from tpusph import integrate
    seam = jax.jit(lambda s, a: be.refresh_seam(s, a))
    timeit("refresh_seam", seam, state, aux)
    trg = jax.jit(lambda s, a: strip_pair.needs_rebuild(s, a, g.skin))
    timeit("needs_rebuild", trg, state, aux)
    dtj = jax.numpy.asarray(sim.dt, jax.numpy.float32)
    ii = jax.jit(lambda s: integrate.initial_integrate(s, dtj, sim.box))
    timeit("initial_integrate", ii, state)
    fi = jax.jit(lambda s: integrate.final_integrate(s, dtj))
    timeit("final_integrate", fi, state)

    # full force stage (rho + cgrad + force incl. packs)
    from tpusph.forces import compute_forces
    frc = jax.jit(lambda s, a: compute_forces(
        s, sim.tables, sim.spec, sim.box, be, istep=1, aux=a))
    timeit("compute_forces(all)", frc, state, aux)

    # per-sweep kernel times (r3 VERDICT #2/#3: the per-piece table) —
    # same packed inputs, one pallas_call each
    from tpusph.ops.pallas_pair import pack_tables
    fields = _state_fields(state)
    mix = be._mixed_flags(fields, aux)
    if mix is not None:
        fields["mix"] = mix
    tabs = pack_tables(sim.tables)
    i_arr = jax.block_until_ready(be._pack_i(fields))
    band = jax.block_until_ready(be._pack_band(fields))
    for sweep in ("rho", "cgrad", "force"):
        fn = jax.jit(lambda ia, bd, sw=sweep: be._sweep_call(
            sim.spec, sw, tabs, ia, bd, aux))
        timeit(f"kernel[{sweep}]", fn, i_arr, band)
    upd = jax.jit(lambda ia, bd, r: be._update_rows(
        ia, bd, {"rho": r}, (11,)))  # RRHO row patch between sweeps
    try:
        from tpusph.ops.pallas_pair import RRHO
        upd = jax.jit(lambda ia, bd, r: be._update_rows(
            ia, bd, {"rho": r}, (RRHO,)))
    except Exception:
        pass
    timeit("row_patch[rho]", upd, i_arr, band, state.rho)

    lanes = 9 * g.w if g.dim == 3 else 3 * g.w
    print(f"lanes/slot: {lanes} (W={g.w}); slots={g.n_slots} "
          f"alive={int(jax.device_get(state.nlocal()))}")


if __name__ == "__main__":
    main()
