"""Measure the MXU candidate-compaction force sweep (ops/mxu_compact)
against the production strip force kernel at bench scale on the live
device (r3 VERDICT #1: "a running kernel + a PERFORMANCE.md table —
lanes/particle, ms/step, achieved op/s — and an updated, evidence-based
50x verdict").

Both kernels consume the SAME packed inputs (i-tiles + rank windows +
delta prefetch), so the comparison isolates the inner-sweep economics:
  production: physics on nnbr x ceil128(W) lanes per i-row
  compact:    ball-box filter + MXU one-hot gather, physics on P lanes

Usage: python tools/proto_mxu_compact.py [n] [mode] [headroom]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402


def timeit(label, fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / reps * 1e3
    print(f"{label}: {ms:.2f} ms", flush=True)
    return out, ms


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    mode = sys.argv[2] if len(sys.argv) > 2 else "uniform"
    headroom = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    from tpusph.bench import build_bench_sim
    from tpusph.ops.band_pair import _state_fields
    from tpusph.ops.pallas_pair import pack_tables, OFX, ODRHO
    from tpusph.ops.mxu_compact import (
        make_compact_force_kernel, measure_union_cap, OCNT)

    sim = build_bench_sim(n, mode=mode)
    sim.run(5)
    jax.block_until_ready(sim.state.x)
    be = sim._runner.backend
    g = be.geom
    state, aux = sim.state, sim.aux
    cut = sim.tables.max_cut()

    fields = _state_fields(state)
    mix = be._mixed_flags(fields, aux)
    if mix is not None:
        fields["mix"] = mix
    tabs = pack_tables(sim.tables)
    i_arr = jax.block_until_ready(be._pack_i(fields))
    win = jax.block_until_ready(be._pack_band(fields))

    alive = int(jax.device_get(state.nlocal()))
    w128 = -(-g.w // 128) * 128
    lanes_prod = g.nnbr * w128
    print(f"geom: W={g.w} (ceil128 {w128}) nnbr={g.nnbr} ts={g.ts} "
          f"n_slots={g.n_slots} alive={alive}", flush=True)

    prod = jax.jit(lambda ia, wd: be._call(sim.spec, "force")(
        tabs, ia, wd, aux.delta))
    ref, ms_prod = timeit("force[production]", prod, i_arr, win)

    x_alive = np.asarray(jax.device_get(state.x))[
        np.asarray(jax.device_get(state.type)) > 0]
    P = measure_union_cap(x_alive, g, sim.box, cut, headroom=headroom)
    print(f"P={P} (headroom {headroom}); physics lanes {lanes_prod} -> {P} "
          f"({lanes_prod / P:.1f}x cut)", flush=True)

    call = make_compact_force_kernel(g, sim.spec, sim.tables.ntypes, P, cut)
    comp = jax.jit(lambda ia, wd: call(tabs, ia, wd, aux.delta))
    t0 = time.perf_counter()
    out, ms_comp = timeit("force[mxu-compact]", comp, i_arr, win)
    print(f"(first call incl. compile: {time.perf_counter() - t0:.1f} s)",
          flush=True)

    ref_h = np.asarray(jax.device_get(ref)).reshape(g.n_slots, 8)
    out_h = np.asarray(jax.device_get(out)).reshape(g.n_slots, 8)
    ov = out_h[:, OCNT].max()
    msk = np.asarray(jax.device_get(state.type)) > 0
    for row, name in ((OFX, "fx"), (ODRHO, "drho")):
        a, b = ref_h[msk, row], out_h[msk, row]
        scale = np.abs(a).max() + 1e-12
        print(f"max|d{name}|/max|{name}| = "
              f"{np.abs(b - a).max() / scale:.2e}", flush=True)
    print(f"compaction overflow rows: {ov:.0f}")
    print(f"summary: production {ms_prod:.2f} ms vs compact "
          f"{ms_comp:.2f} ms ({ms_prod / ms_comp:.2f}x)")


if __name__ == "__main__":
    main()
