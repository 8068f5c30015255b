"""BASELINE config-4 scale proof (r3 VERDICT #6): bubble rise at its
binding ~500k-particle size on the live device, WITH the physics gates the
small-resolution test asserts (tests/test_case_physics.py) — not just a
throughput window:

  - rise direction: vapor COM vertical velocity AND displacement > 0
    (10x-lighter bubble under gravity must move up), bounded by free-rise
    kinematics;
  - per-phase mass ledger: total mass conserved to f32 roundoff; phase
    change only MOVES mass liquid -> vapor (vapor mass non-decreasing);
  - energy ledger finite (no NaN/Inf in ke/ie), run completes without an
    overflow abort.

Same hydrostatic preset as the test (the raw case spends ~H/c0 settling,
far past any interactive budget; the preset makes buoyancy act from step
0). Reference: the fork's bubble-rise example deck (SURVEY §6 config 4).

Usage: python tools/scale_bubble_rise.py [dx] [nsteps]
       dx=0.0125 -> ~492k particles (the binding size); 0.02 -> ~65k smoke.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    dx = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0125
    nsteps = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    import jax
    from tpusph.script import Interpreter

    def run_case(path, nsteps, var):
        interp = Interpreter(variables=dict(var))
        interp.sim.screen = False
        text = open(path).read()
        lines = [l for l in text.splitlines()
                 if not l.strip().startswith(("run", "dump"))]
        interp.run_string("\n".join(lines))
        interp.command(f"run {nsteps}")
        return interp.sim

    t0 = time.perf_counter()
    sim = run_case("cases/bubble_rise/in.bubble_rise", nsteps=0,
                   var={"dx": str(dx)})
    print(f"setup: {sim.natoms} particles, dx={dx}, "
          f"{time.perf_counter() - t0:.1f}s", flush=True)

    m0 = sim.get("rmass")
    ty0 = sim.get("type")
    x0 = sim.get("x")
    vm0 = ty0 == 2
    z0 = float((x0[vm0, 2] * m0[vm0]).sum() / m0[vm0].sum())
    total0 = float(m0.sum())
    mv0 = float(m0[vm0].sum())

    # hydrostatic preset (tests/test_case_physics.py:66-77): pressure
    # balances gravity from step 0; density integrates by continuity
    rho_l, rho_v, c0, g = 1000.0, 100.0, 20.0, 9.81
    b_l = c0 * c0 * rho_l / 7.0
    b_v = c0 * c0 * rho_v / 7.0
    p_hydro = rho_l * g * np.clip(1.55 - x0[:, 2], 0.0, None)
    rho_set = np.where(ty0 == 2,
                       rho_v * (1.0 + p_hydro / b_v) ** (1.0 / 7.0),
                       rho_l * (1.0 + p_hydro / b_l) ** (1.0 / 7.0))
    sim.set_values(np.ones(sim.natoms, bool), rho=rho_set.astype(np.float32))
    sim.spec = sim.spec._replace(rhosum_every=0)
    sim._runner = None
    sim.thermo(max(nsteps // 6, 1))

    t0 = time.perf_counter()
    sim.run(nsteps)
    jax.block_until_ready(sim.state.x)
    wall = time.perf_counter() - t0

    m = sim.get("rmass")
    ty = sim.get("type")
    x = sim.get("x")
    v = sim.get("v")
    e = sim.get("e")
    vm = ty == 2
    mv = m[vm]
    zc = float((x[vm, 2] * mv).sum() / mv.sum())
    vz = float((v[vm, 2] * mv).sum() / mv.sum())
    dt = sim.dt
    t = nsteps * dt
    a_max = g * (rho_l - rho_v) / rho_v

    gates = {
        "rise_vz>0": vz > 0.0,
        "rise_dz>0": zc - z0 > 0.0,
        "vz_band": vz < a_max * t * 2.0,
        "mass_conserved": abs(m.sum() - total0) / total0 < 1e-6,
        "vapor_mass_nondecreasing": float(mv.sum()) >= mv0 * (1 - 1e-6),
        "energy_finite": bool(np.isfinite(e).all()
                              and np.isfinite(v).all()),
        "no_violation_abort": True,  # run() returning proves it
    }
    print(f"steps={nsteps} wall={wall:.1f}s "
          f"({sim.natoms * nsteps / wall / 1e6:.2f}M p-s/s)")
    print(f"vapor COM: z0={z0:.4f} -> z={zc:.4f} (dz={zc - z0:+.5f}), "
          f"vz={vz:+.5f} (a_max*t={a_max * t:.4f})")
    print(f"mass: total {total0:.4f} -> {m.sum():.4f}; "
          f"vapor {mv0:.4f} -> {mv.sum():.4f} "
          f"(events={round((mv.sum() - mv0) / max(sim.phase_change_config.dm, 1e-30)) if sim.phase_change_config else 0})")
    print(f"violations={getattr(sim, '_strip_violations', 0)} "
          f"backend={type(sim._runner.backend).__name__}")
    ok = all(gates.values())
    for k, val in gates.items():
        print(f"  gate {k}: {'PASS' if val else 'FAIL'}")
    print("ALL GATES PASS" if ok else "GATE FAILURE", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
