"""Config-5 single-chip size-wall audit (r4 VERDICT #7): where does the
strip pipeline hit the HBM wall between 2M (proven, r4) and 4M?

Prints the ANALYTIC budget table from the chooser's actual geometry
(window array is the big consumer: ncols*ntiles*F*W*4), then attempts a
short boiling run at the requested size and reports the device's own
memory stats (or the OOM error verbatim).

Usage: python tools/audit_hbm_4m.py [n] [steps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    import jax
    from tpusph.bench import build_bench_sim

    sim = build_bench_sim(n, backend="auto", mode="boiling")
    runner = sim._ensure_runner()
    g = getattr(sim, "_strip_geom", None)
    rows = []
    if g is not None:
        slots = g.n_slots
        win = g.ncols * g.ntiles * 16 * g.w * 4
        win8 = g.ncols * g.ntiles * 8 * g.w * 4
        i_arr = slots * 16 * 4
        out = g.ncols * g.ntiles * g.ts * 8 * 4
        # ParticleState pool: 4x (n,3) vectors + 12 scalars + 2 ledgers
        state_b = slots * (4 * 3 + 14) * 4
        sort_scratch = slots * (16 + 2) * 4 * 2  # payload sort double-buffer
        rows = [("geometry", f"ts={g.ts} ch={g.ch} W={g.w} ncols={g.ncols} "
                             f"col_cap={g.col_cap} slots={slots}"),
                ("state pool", state_b),
                ("i-array (slots,16)", i_arr),
                ("window array (16,W)", win),
                ("narrow window view (8,W)", win8),
                ("sweep outputs x3", 3 * out),
                ("sort scratch (est)", sort_scratch)]
        total = state_b + i_arr + win + 3 * out + sort_scratch
        rows.append(("TOTAL (est, excl. XLA temps)", total))
    for k, v in rows:
        print(f"  {k}: {v/1e9:.2f} GB" if isinstance(v, (int, float))
              else f"  {k}: {v}", flush=True)

    try:
        t0 = time.perf_counter()
        sim.run(steps)
        jax.block_until_ready(sim.state.x)
        wall = time.perf_counter() - t0
        print(f"RAN {steps} steps at n={sim.natoms}: {wall:.1f}s "
              f"({sim.natoms * steps / wall / 1e6:.2f}M p-s/s)", flush=True)
        try:
            ms = jax.local_devices()[0].memory_stats()
            for key in ("bytes_in_use", "peak_bytes_in_use",
                        "bytes_limit"):
                if ms and key in ms:
                    print(f"  {key}: {ms[key]/1e9:.2f} GB")
        except Exception as err:
            print("  (no memory_stats on this backend:", err, ")")
    except Exception as err:
        print(f"FAILED at n={n}: {type(err).__name__}: "
              f"{str(err)[:600]}", flush=True)
        sys.exit(1)


if __name__ == "__main__":
    main()
