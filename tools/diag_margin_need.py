"""Margin-decay diagnostics on the live device (r5): after the dynamic
bench's lattice->fluid escalation, how much measured slack do the rank
windows actually carry? Prints per-window GridData.margin_need (unclipped
need-minus-window, negative = slack), margin_short, the geometry, and the
decay observer's state — the data deciding whether W can decay (e.g.
384 -> 256 needs ~8 chunks of slack at ch=16).

Usage: python tools/diag_margin_need.py [n] [windows] [steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    windows = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    import jax
    from tpusph.bench import build_bench_sim

    sim = build_bench_sim(n, backend="auto", mode="dynamic")
    for k in range(windows):
        t0 = time.perf_counter()
        sim.run(steps)
        jax.block_until_ready(sim.state.x)
        dt = time.perf_counter() - t0
        aux = sim.aux
        need = getattr(aux, "margin_need", None)
        if need is None:
            need = getattr(getattr(aux, "grid", None), "margin_need", None)
        short = getattr(aux, "margin_short", None)
        nb = getattr(aux, "nbuilds", None)
        g = sim._current_strip_geom()
        print(f"window {k}: {dt:.1f}s  "
              f"need={np.asarray(jax.device_get(need)).reshape(-1).tolist() if need is not None else None}  "
              f"short={np.asarray(jax.device_get(short)).reshape(-1).tolist() if short is not None else None}  "
              f"nbuilds={int(np.asarray(jax.device_get(nb)).max()) if nb is not None else None}  "
              f"geom={'None' if g is None else (g.ts, g.ch, g.mlo, g.mhi, g.w)}  "
              f"decay_obs={getattr(sim, '_decay_obs', 0)} "
              f"blocked={getattr(sim, '_decay_blocked', False)} "
              f"decays={getattr(sim, '_strip_decays', 0)} "
              f"viol={getattr(sim, '_strip_violations', 0)}",
              flush=True)


if __name__ == "__main__":
    main()
