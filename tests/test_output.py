"""Output-manager behavior (src/output.cpp parity — SURVEY §2.8):
dump/restart cadences independent of thermo, dist-mode dumps in global
coordinates, periodic restart schedule, and the overflow guard's loud path."""

import glob
import os

import jax
import numpy as np
import pytest

from tpusph.script import Interpreter

SCRIPT = """
dimension      2
units          si
atom_style     meso
boundary       p p p
region         box block 0 3.2 0 1.6 -0.05 0.05 units box
create_box     1 box
lattice        sq 0.2
region         fill block 0.0 3.15 0.0 1.55 -0.1 0.1 units box
create_atoms   1 region fill
mass           1 0.01
set            group all meso/rho 1.0 meso/e 1.0 meso/cv 1.0
pair_style     hybrid/overlay sph/rhosum 3 sph/taitwater
pair_coeff     * * sph/rhosum 0.4
pair_coeff     * * sph/taitwater 1.0 5.0 0.4 0.4
fix            integrate all meso
velocity       all set 0.15 0.05 0
neighbor       0.12 bin
timestep       2.0e-4
"""


def make_interp():
    interp = Interpreter()
    interp.sim.screen = False
    interp.run_string(SCRIPT)
    return interp


def count_frames(path):
    return open(path).read().count("ITEM: TIMESTEP")


def test_dump_cadence_independent_of_thermo(tmp_path):
    """dump every=10 with thermo=100: one frame per 10 steps (the reference
    schedules each output at its own cadence; a thermo-slaved scheduler
    would write 1 frame per 100)."""
    interp = make_interp()
    path = str(tmp_path / "dump.every10")
    interp.command("thermo 100")
    interp.command(f"dump d1 all custom 10 {path} id x y")
    interp.command("run 100")
    assert count_frames(path) == 11  # steps 0, 10, ..., 100


def test_restart_schedule_fires(tmp_path):
    """`restart N file*` writes checkpoints at N, 2N, ... (src/output.cpp
    restart scheduling; VERDICT r1 missing #3)."""
    interp = make_interp()
    tpl = str(tmp_path / "restart.*.npz")
    interp.command(f"restart 50 {tpl}")
    interp.command("run 100")
    files = sorted(glob.glob(str(tmp_path / "restart.*.npz")))
    steps = sorted(int(os.path.basename(f).split(".")[1]) for f in files)
    assert steps == [50, 100]
    # the checkpoint is resumable and lands at the right step
    interp2 = Interpreter()
    interp2.sim.screen = False
    interp2.command(f"read_restart {tmp_path / 'restart.50.npz'}")
    assert interp2.sim.step_count == 50
    interp2.command("run 10")
    assert interp2.sim.step_count == 60


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >= 4 devices")
def test_dump_under_mesh_globalizes_positions(tmp_path):
    """Dist-mode dumps must write GLOBAL coordinates (positions are
    brick-local on device — ADVICE r1 high)."""
    interp = make_interp()
    sim = interp.sim
    sim.set_mesh(4)
    path = str(tmp_path / "dump.mesh")
    interp.command(f"dump d1 all custom 20 {path} id x y")
    interp.command("run 20")
    # parse the LAST frame
    lines = open(path).read().splitlines()
    starts = [i for i, l in enumerate(lines) if l.startswith("ITEM: ATOMS")]
    rows = np.array([[float(v) for v in l.split()]
                     for l in lines[starts[-1] + 1:]])
    rows = rows[np.argsort(rows[:, 0])]           # by id
    x_get = sim.get("x")                          # tag-ordered, globalized
    np.testing.assert_allclose(rows[:, 1], x_get[:, 0], atol=1e-5)
    np.testing.assert_allclose(rows[:, 2], x_get[:, 1], atol=1e-5)
    # global spread: particles cover the whole box, not one brick's width
    assert rows[:, 1].max() - rows[:, 1].min() > 2.0


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >= 4 devices")
def test_restart_under_mesh_is_mesh_independent(tmp_path):
    """write_restart from a 4-brick run resumes correctly on 1 device with
    globalized coordinates."""
    interp = make_interp()
    interp.sim.set_mesh(4)
    interp.command("run 20")
    x_mesh = interp.sim.get("x")
    path = str(tmp_path / "restart.mesh.npz")
    interp.command(f"write_restart {path}")

    interp2 = Interpreter()
    interp2.sim.screen = False
    interp2.command(f"read_restart {path}")
    s2 = interp2.sim
    np.testing.assert_allclose(s2.get("x"), x_mesh, atol=1e-6)
    s2.backend_name = "cellgrid"
    s2.run(5)  # continuation on a single device works
    assert s2.step_count == 25


def test_cell_overflow_aborts_loudly():
    """A deliberately tiny cell cap must raise the remedy error, not
    silently drop pairs (the failure mode the counters exist for —
    VERDICT r1 weak #7)."""
    interp = make_interp()
    sim = interp.sim
    sim.backend_name = "cellgrid"
    sim.cell_cap = 2   # measured occupancy is far above this
    with pytest.raises(RuntimeError, match="overflow"):
        sim.run(2)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >= 4 devices")
def test_dist_cell_overflow_aborts_loudly():
    """Same loud-abort guarantee per brick in dist mode (ADVICE r1 medium:
    grid overflow must fold into DistAux.overflow)."""
    interp = make_interp()
    sim = interp.sim
    sim.cell_cap = 2
    sim.set_mesh(4)
    with pytest.raises(RuntimeError, match="overflow"):
        sim.run(2)


def test_lammps_binary_restart_roundtrip(tmp_path):
    """`write_restart f.restart` (no .npz suffix) emits the LAMMPS binary
    restart layout (io/lammps_restart.py; SURVEY §3.4 write_restart.cpp /
    read_restart.cpp — the r3 VERDICT's last partial inventory row), and
    `read_restart` content-sniffs it back: full state, spec, tables, and a
    bit-identical continuation vs the uninterrupted run."""
    interp = make_interp()
    interp.command("run 40")
    path = str(tmp_path / "cp.restart")
    interp.command(f"write_restart {path}")
    interp.command("run 20")                 # uninterrupted 40 + 20
    x_ref = interp.sim.get("x")

    with open(path, "rb") as fp:
        assert fp.read(14) == b"LammpS Restart"   # the magic tag

    interp2 = Interpreter()
    interp2.sim.screen = False
    interp2.command(f"read_restart {path}")
    s2 = interp2.sim
    assert s2.step_count == 40
    assert s2.dt == interp.sim.dt
    assert s2.tables.ntypes == interp.sim.tables.ntypes
    interp2.command("run 20")
    np.testing.assert_allclose(s2.get("x"), x_ref, atol=2e-6)
    np.testing.assert_allclose(s2.get("rho"), interp.sim.get("rho"),
                               rtol=2e-6)


def test_lammps_binary_restart_without_spec_section(tmp_path):
    """A binary restart missing the tpusph SPEC_JSON extension (i.e. what a
    reference-written file carries) still restores box + atoms + step; the
    pair configuration comes from the input script, the same contract the
    reference's read_restart has with pair_style re-issuance."""
    import tpusph.io.lammps_restart as lr

    interp = make_interp()
    interp.command("run 10")
    path = str(tmp_path / "noext.restart")
    orig = lr._write_char

    def drop_spec(fp, flag, s):
        if flag != lr.SPEC_JSON:
            orig(fp, flag, s)

    lr._write_char = drop_spec
    try:
        interp.command(f"write_restart {path}")
    finally:
        lr._write_char = orig

    interp2 = Interpreter()
    interp2.sim.screen = False
    interp2.run_string(SCRIPT.split("region         box")[0])  # style prelude
    interp2.command(f"read_restart {path}")
    s2 = interp2.sim
    assert s2.step_count == 10
    np.testing.assert_allclose(np.sort(s2._staged["tag"]),
                               np.sort(interp.sim.get("tag")))
    np.testing.assert_allclose(
        np.asarray(s2.box.hi), np.asarray(interp.sim.box.hi), atol=1e-12)
