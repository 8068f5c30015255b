"""Measure the force-stage XLA glue at bench scale: everything
force_stage does BESIDES the three Pallas kernels (mixed flags, row
patches, rho self-term, output assembly), each as its own jitted call.
The r4 dynamic profile found stage-total minus kernels+packs ~ 186 ms
@1M W=384 — this splits it without recompiling any Mosaic kernel.

Usage: python tools/diag_stage_overhead.py [n] [mode]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


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
    mode = sys.argv[2] if len(sys.argv) > 2 else "dynamic"
    from tpusph.bench import build_bench_sim
    from tpusph.ops.band_pair import _state_fields
    from tpusph.ops.pallas_pair import RRHO, RCGX, RCGY, RCGZ
    from tpusph import kernels

    sim = build_bench_sim(n, mode=mode)
    sim.run(5 if mode == "uniform" else 100)
    jax.block_until_ready(sim.state.x)
    be = sim._runner.backend
    state, aux = sim.state, sim.aux
    nslots = be.geom.n_slots

    fields = _state_fields(state)
    i_arr = jax.block_until_ready(be._pack_i(fields))
    band = jax.block_until_ready(be._pack_band(fields))
    print(f"band bytes: {band.size * 4 / 1e6:.0f} MB, "
          f"i_arr: {i_arr.size * 4 / 1e6:.0f} MB", flush=True)

    timeit("mixed_flags", jax.jit(
        lambda s: be._mixed_flags(_state_fields(s), aux)), state)

    timeit("patch[rho x1]", jax.jit(
        lambda ia, bd, r: be._update_rows(ia, bd, {"rho": r}, (RRHO,))),
        i_arr, band, state.rho)
    timeit("patch[cg x3]", jax.jit(
        lambda ia, bd, c: be._update_rows(
            ia, bd, {"cg0": c, "cg1": c, "cg2": c}, (RCGX, RCGY, RCGZ))),
        i_arr, band, state.rho)

    def self_term(s, rho_sum):
        w_fn = kernels.kernel_w(sim.spec.kernel, sim.spec.dim)
        sm = 1.0 if sim.spec.rhosum_nd else s.rmass
        w0 = jnp.zeros(nslots, jnp.float32)
        for t in range(1, be.ntypes + 1):
            cut_t = sim.tables.cut_rho[t, t]
            w0_t = jnp.where(cut_t > 0.0,
                             w_fn(jnp.zeros(()), jnp.maximum(cut_t, 1e-30)),
                             0.0)
            w0 = w0 + jnp.where(s.type == t, sm * w0_t, 0.0)
        total = rho_sum + w0
        if sim.spec.rhosum_nd:
            total = total * s.rmass
        return jnp.where(s.alive, total, s.rho)

    timeit("rho_self_term", jax.jit(self_term), state, state.rho)

    out = jnp.zeros((nslots, 8), jnp.float32)

    def assemble(s, o):
        import dataclasses
        f = jnp.stack([o[:, 0], o[:, 1], o[:, 2]], axis=1)
        return dataclasses.replace(
            s, f=jnp.where(s.alive[:, None], f, 0.0),
            drho=jnp.where(s.alive, o[:, 3], 0.0),
            de=jnp.where(s.alive, o[:, 4], 0.0))

    timeit("output_assembly", jax.jit(assemble), state, out)


if __name__ == "__main__":
    main()
