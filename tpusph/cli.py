"""Command-line entry point: ``python -m tpusph.cli run in.script [-var k v]``.

Reference parity: src/main.cpp + the lammps.cpp CLI switches -in, -var,
-log, -screen, -echo (SURVEY.md §5.6). ``-partition``/``-suffix`` have no
TPU analog and are rejected with a clear message.
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    parser = argparse.ArgumentParser(
        prog="tpusph",
        description="TPU-native multiphase SPH engine (LAMMPS USER-SPH "
                    "capability surface)")
    sub = parser.add_subparsers(dest="cmd", required=True)

    run_p = sub.add_parser("run", help="run a LAMMPS-style input script")
    run_p.add_argument("script", help="input script path (or '-' for stdin)")
    run_p.add_argument("-var", nargs=2, action="append", default=[],
                       metavar=("NAME", "VALUE"),
                       help="define an index variable (like lmp -var)")
    run_p.add_argument("-log", default=None, help="mirror thermo to this file")
    run_p.add_argument("-screen", default=None,
                       help="'none' to silence stdout thermo")
    run_p.add_argument("-echo", default=None, choices=["none", "screen"],
                       help="echo input lines")
    run_p.add_argument("--backend", default=None,
                       choices=["auto", "dense", "cellgrid", "pallas",
                                "band", "strip"],
                       help="force a compute backend")
    run_p.add_argument("--mesh", type=int, default=0,
                       help="decompose over N devices (shard_map bricks)")
    run_p.add_argument("--profile", default=None, metavar="DIR",
                       help="capture a jax.profiler trace (TensorBoard/"
                            "Perfetto) of the run into DIR")
    run_p.add_argument("--platform", default=None,
                       choices=["cpu", "tpu"],
                       help="pin the jax platform (overrides any "
                            "sitecustomize/env default; 'cpu' avoids "
                            "claiming the TPU for small runs)")

    bench_p = sub.add_parser("bench", help="run the throughput benchmark")
    bench_p.add_argument("--particles", type=int, default=1_000_000)
    bench_p.add_argument("--steps", type=int, default=200)
    bench_p.add_argument("--dim", type=int, default=3)

    args = parser.parse_args(argv)

    if args.cmd == "run" and args.platform:
        # Must land before any jax import; env alone is overridden by a
        # sitecustomize in some sandboxes, so set the config knob too.
        import jax
        jax.config.update("jax_platforms", args.platform)

    if args.cmd == "run":
        from tpusph.api import Simulation
        from tpusph.script import Interpreter

        sim = Simulation(log=args.log, screen=args.screen != "none")
        if args.backend:
            sim.backend_name = args.backend
        if args.mesh:
            sim.set_mesh(args.mesh)
        interp = Interpreter(sim=sim,
                             variables={k: v for k, v in args.var})
        if args.script == "-":
            text = sys.stdin.read()
        else:
            try:
                text = open(args.script).read()
            except FileNotFoundError:
                print(f"tpusph: input script not found: {args.script}",
                      file=sys.stderr)
                return 2
        if args.echo == "screen":
            for line in text.splitlines():
                print(f"> {line}")
        if args.profile:
            import jax
            with jax.profiler.trace(args.profile):
                interp.run_string(text)
        else:
            interp.run_string(text)
        return 0

    if args.cmd == "bench":
        from tpusph.bench import run_bench
        result = run_bench(n_particles=args.particles, n_steps=args.steps,
                           dim=args.dim)
        print(result)
        return 0


if __name__ == "__main__":
    sys.exit(main())
