"""Force-stage ablation at bench scale: time the FUSED force_stage under
spec ablations (no surface tension / no rhosum / full) and the raw kernels,
so the row-patch + misc overhead (stage minus kernels) is measured rather
than inferred. Decides whether kernel-signature refactors (separate rho/cg
window inputs) are worth their risk (r3 VERDICT #3).

Usage: python tools/diag_stage_split.py [n] [mode]
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
    from tpusph.forces import compute_forces

    sim = build_bench_sim(n, mode=mode)
    sim.run(5 if mode == "uniform" else 100)
    jax.block_until_ready(sim.state.x)
    be = sim._runner.backend
    state, aux = sim.state, sim.aux
    spec = sim.spec

    variants = {
        "full": spec,
        "no_tension": spec._replace(surface_tension=False),
        "no_rhosum": spec._replace(rhosum_every=0),
        "force_only": spec._replace(surface_tension=False, rhosum_every=0),
    }
    for name, sp in variants.items():
        fn = jax.jit(lambda s, a, sp=sp: compute_forces(
            s, sim.tables, sp, sim.box, be, istep=1, aux=a))
        timeit(f"force_stage[{name}]", fn, state, aux)

    # full one-step (integrate + prepare + stage + integrate), the
    # production composition, for the loop-extras remainder
    from tpusph import integrate
    dtj = jax.numpy.asarray(sim.dt, jax.numpy.float32)

    def one_step(s, a):
        s = integrate.initial_integrate(s, dtj, sim.box)
        s, a = be.prepare(s, a, 1, sim.box)
        s = compute_forces(s, sim.tables, spec, sim.box, be, istep=1, aux=a)
        return integrate.final_integrate(s, dtj), a

    timeit("one_step[full]", jax.jit(one_step), state, aux)


if __name__ == "__main__":
    main()
