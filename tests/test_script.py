"""Input-script interpreter tests: command coverage, variable substitution,
data-file roundtrip, dump output, restart roundtrip (SURVEY §2.9, §3.3/3.4)."""

import numpy as np
import pytest

from tpusph.script import Interpreter, ScriptError


SMALL_SCRIPT = """
dimension      2
units          si
atom_style     meso
boundary       p p p

variable       dx equal 0.1
variable       rho0 equal 1.0

region         box block 0 1.2 0 1.2 -0.05 0.05 units box
create_box     1 box
lattice        sq ${dx}
region         fill block 0.0 1.15 0.0 1.15 -0.1 0.1 units box
create_atoms   1 region fill
mass           1 0.01

set            group all meso/rho ${rho0} meso/e 1.0 meso/cv 1.0

pair_style     hybrid/overlay sph/rhosum 2 sph/taitwater
pair_coeff     * * sph/rhosum 0.3
pair_coeff     * * sph/taitwater 1.0 5.0 0.2 0.3

fix            integrate all meso
timestep       1.0e-4
thermo         10
thermo_style   custom step time ke density
"""


def test_script_builds_and_runs(tmp_path, capsys):
    interp = Interpreter()
    interp.sim.screen = False
    interp.run_string(SMALL_SCRIPT)
    sim = interp.sim
    assert sim.natoms == 144  # 12x12 lattice
    assert sim.spec.tait and sim.spec.rhosum_every == 2
    assert float(sim.tables.cut[1, 1]) == pytest.approx(0.3)
    assert float(sim.tables.tait_b[1]) == pytest.approx(25.0 / 7.0)
    interp.command("run 20")
    assert sim.step_count == 20
    # density stays near rho0 on a quiet lattice
    rho = sim.get("rho")
    np.testing.assert_allclose(rho, 1.0, rtol=0.05)


def test_variable_substitution_and_expressions():
    interp = Interpreter()
    interp.command("variable a equal 3.0")
    interp.command("variable b equal 2*v_a+1")
    assert interp.var_value("b") == pytest.approx(7.0)
    interp.command("variable name string hello")
    assert interp.var_value("name") == "hello"


def test_unknown_command_raises():
    interp = Interpreter()
    with pytest.raises(ScriptError, match="unknown command"):
        interp.command("frobnicate 1 2")


def test_ignored_commands_warn_once():
    interp = Interpreter()
    with pytest.warns(UserWarning, match="ignoring command"):
        interp.command("processors 2 2 1")


def test_data_file_roundtrip(tmp_path):
    interp = Interpreter()
    interp.sim.screen = False
    interp.run_string(SMALL_SCRIPT)
    path = str(tmp_path / "data.out")
    interp.command(f"write_data {path}")

    interp2 = Interpreter()
    interp2.sim.screen = False
    interp2.run_string("""
dimension 2
units si
atom_style meso
boundary p p p
""")
    interp2.command(f"read_data {path}")
    s1, s2 = interp.sim, interp2.sim
    assert s2.natoms == s1.natoms
    np.testing.assert_allclose(s2.get("x"), s1.get("x"), atol=1e-6)
    np.testing.assert_allclose(s2.get("rho"), s1.get("rho"), rtol=1e-6)
    np.testing.assert_allclose(s2.get("rmass"), s1.get("rmass"), rtol=1e-6)


def test_dump_custom_output(tmp_path):
    interp = Interpreter()
    interp.sim.screen = False
    interp.run_string(SMALL_SCRIPT)
    path = str(tmp_path / "dump.sph")
    interp.command("compute trho all meso/rho/atom")
    interp.command(f"dump d1 all custom 10 {path} id type x y rho c_trho")
    interp.command("run 10")
    text = open(path).read()
    assert "ITEM: TIMESTEP" in text
    assert "ITEM: ATOMS id type x y rho c_trho" in text
    # one snapshot at step 0 and one at step 10
    assert text.count("ITEM: TIMESTEP") == 2


def test_restart_roundtrip(tmp_path):
    interp = Interpreter()
    interp.sim.screen = False
    interp.run_string(SMALL_SCRIPT)
    interp.command("run 10")
    path = str(tmp_path / "restart.tpusph.npz")
    interp.command(f"write_restart {path}")
    x1 = interp.sim.get("x")
    rho1 = interp.sim.get("rho")

    interp2 = Interpreter()
    interp2.sim.screen = False
    interp2.command(f"read_restart {path}")
    s2 = interp2.sim
    assert s2.step_count == 10
    np.testing.assert_allclose(s2.get("x"), x1, atol=1e-7)
    np.testing.assert_allclose(s2.get("rho"), rho1, rtol=1e-7)
    # continuation runs
    interp2.command("run 5")
    assert s2.step_count == 15


def test_water_collapse_script_parses():
    """The config-2 case script parses end-to-end (build only, no run)."""
    interp = Interpreter()
    interp.sim.screen = False
    text = open("cases/water_collapse/in.water_collapse").read()
    # strip the run so the test stays fast; the physics runs in
    # test_dam_break.py at reduced resolution
    text = text.replace("run            2000", "")
    interp.run_string(text)
    sim = interp.sim
    assert sim.natoms > 1200
    assert sim.spec.morris and sim.spec.rhosum_every == 1
    assert sim.spec.gravity
    # walls are stationary
    walls = sim.group_mask("walls")
    assert not sim._staged["mobile"][walls].any()
    assert sim._staged["mobile"][~walls].all()


def test_dump_xyz(tmp_path):
    interp = Interpreter()
    interp.sim.screen = False
    interp.run_string(SMALL_SCRIPT)
    path = str(tmp_path / "dump.xyz")
    interp.command(f"dump dx all xyz 10 {path}")
    interp.command("run 10")
    lines = open(path).read().splitlines()
    assert lines[0] == "144"
    assert lines[1].startswith("Atoms. Timestep:")
    assert len(lines[2].split()) == 4


def test_orbax_restart_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from tpusph.io import restart_orbax

    interp = Interpreter()
    interp.sim.screen = False
    interp.run_string(SMALL_SCRIPT)
    interp.command("run 5")
    path = str(tmp_path / "ckpt")
    restart_orbax.save(path, interp.sim)

    from tpusph.api import Simulation
    sim2 = Simulation(screen=False)
    restart_orbax.load(path, sim2)
    assert sim2.step_count == 5
    np.testing.assert_allclose(sim2.get("x"), interp.sim.get("x"), atol=1e-7)
    sim2.run(3)
    assert sim2.step_count == 8


def test_velocity_create_and_press_column(tmp_path):
    interp = Interpreter()
    interp.sim.screen = False
    interp.run_string(SMALL_SCRIPT)
    interp.command("velocity all create 0.01 4928459")
    v = interp.sim._staged["v"]
    m = interp.sim._staged["rmass"]
    # zero net momentum, roughly the requested temperature
    assert np.abs((v * m[:, None]).sum(0)).max() < 1e-6
    ke_per = 0.5 * (m[:, None] * v**2).sum() / len(m)
    assert 0.5 * 2 * 0.01 * 0.5 < ke_per < 0.5 * 2 * 0.01 * 2.0  # dim=2
    # press thermo column runs and is finite
    interp.command("thermo_style custom step press")
    interp.command("thermo 5")
    interp.sim.log_path = str(tmp_path / "log.press")
    interp.command("run 5")
    txt = open(tmp_path / "log.press").read()
    assert "Press" in txt


def test_safe_eval_ast_whitelist():
    """The expression evaluator is a whitelisted AST walker, not eval():
    LAMMPS operators work, arbitrary Python does not (VERDICT r1 #10)."""
    interp = Interpreter()
    interp.command("variable a equal 2^3")            # ^ is power
    assert interp.var_value("a") == pytest.approx(8.0)
    interp.command("variable b equal (v_a>4)&&(v_a<9)")
    assert interp.var_value("b") == pytest.approx(1.0)
    interp.command("variable c equal sqrt(v_a+1)*!(v_a>100)")
    assert interp.var_value("c") == pytest.approx(3.0)
    for bad in ("__import__('os')", "().__class__", "[1,2]", "'x'*3",
                "open('/etc/passwd')"):
        interp.command(f"variable bad equal {bad}")
        with pytest.raises(ScriptError):
            interp.var_value("bad")
        interp.command("variable bad delete")


def test_atom_variable_dump_column(tmp_path):
    """atom-style variables evaluate per-atom and feed v_ dump columns
    (src/variable.cpp atom style — VERDICT r1 missing #7)."""
    interp = Interpreter()
    interp.sim.screen = False
    interp.run_string(SMALL_SCRIPT)
    interp.command("variable vsq atom vx*vx+vy*vy+vz*vz")
    interp.command("variable ekin atom 0.5*mass*v_vsq")
    path = str(tmp_path / "dump.atomvar")
    interp.command(f"dump d1 all custom 10 {path} id vx vy mass v_ekin")
    interp.command("velocity all set 0.3 0.4 0")
    interp.command("run 0")
    lines = open(path).read().splitlines()
    hdr = [i for i, l in enumerate(lines) if l.startswith("ITEM: ATOMS")][0]
    rows = np.array([[float(v) for v in l.split()] for l in lines[hdr + 1:]])
    # v_ekin == 0.5 m (vx^2+vy^2): 0.5 * 0.01 * 0.25 = 1.25e-3
    np.testing.assert_allclose(rows[:, 4],
                               0.5 * rows[:, 3] * (rows[:, 1]**2 + rows[:, 2]**2),
                               rtol=1e-6)
    np.testing.assert_allclose(rows[0, 4], 1.25e-3, rtol=1e-5)
    # atom-style vars cannot be read as scalars
    with pytest.raises(ScriptError, match="per-atom"):
        interp.var_value("vsq")


def test_thermo_modify_norm(tmp_path):
    # `thermo_modify norm yes` divides extensive columns by natoms
    # (src/thermo.cpp normalization); default prints totals
    interp = Interpreter()
    interp.sim.screen = False
    interp.run_string(SMALL_SCRIPT)
    sim = interp.sim
    interp.command("velocity all create 1.0 4928459")
    if sim.state is None:
        sim._build_state()
    totals = sim._thermo_values(sim.state, 0)
    interp.command("thermo_modify norm yes")
    per_atom = sim._thermo_values(sim.state, 0)
    assert per_atom["ke"] == pytest.approx(totals["ke"] / sim.natoms)
    with pytest.raises(ScriptError, match="norm"):
        interp.command("thermo_modify norm maybe")


def test_log_command(tmp_path):
    interp = Interpreter()
    interp.sim.screen = False
    interp.run_string(SMALL_SCRIPT)
    log = tmp_path / "log.case"
    interp.command(f"log {log}")
    interp.command("run 10")
    text = log.read_text()
    assert "Step" in text and "KinEng" in text or "ke" in text.lower()
    # `log none` closes the mirror for subsequent runs
    interp.command("log none")
    assert interp.sim.log_path is None


def test_dump_modify_sort(tmp_path):
    interp = Interpreter()
    interp.sim.screen = False
    interp.run_string(SMALL_SCRIPT)
    out = tmp_path / "d.lammpstrj"
    interp.command(f"dump d1 all atom 10 {out}")
    interp.command("dump_modify d1 sort id")   # satisfied: always tag-ordered
    with pytest.raises(ScriptError, match="sort"):
        interp.command("dump_modify d1 sort x")
