"""Native C++ data-file parser: correctness vs numpy, error paths, and a
performance sanity factor (SURVEY §2.11 item 7)."""

import io
import time

import numpy as np
import pytest

from tpusph import native


@pytest.fixture(scope="module")
def lib_available():
    if native.get_lib() is None:
        pytest.skip("g++ unavailable; numpy fallback covers this path")
    return True


def test_parse_matches_numpy(lib_available):
    rng = np.random.default_rng(0)
    mat = rng.normal(size=(500, 8)).astype(np.float32)
    rows = []
    for i, r in enumerate(mat):
        line = " ".join(f"{v:.8g}" for v in r)
        if i % 50 == 3:
            line += "  # trailing comment"
        rows.append(line)
        if i % 97 == 0:
            rows.append("")          # blank line
        if i % 61 == 0:
            rows.append("# full-line comment")
    text = "\n".join(rows)
    got = native.parse_table(text, 500, 8)
    ref = np.loadtxt(io.StringIO(text), comments="#")
    np.testing.assert_allclose(got, ref.astype(np.float32), rtol=1e-6)


def test_parse_malformed_raises(lib_available):
    with pytest.raises(ValueError, match="malformed|expected"):
        native.parse_table("1 2 3\n4 banana 6\n", 2, 3)
    with pytest.raises(ValueError, match="expected 3 data rows"):
        native.parse_table("1 2 3\n", 3, 3)


def test_parse_speed_factor(lib_available):
    """The native parser must beat numpy.loadtxt clearly (it's the reason
    it exists). Loose 3x gate to stay robust on loaded CI machines."""
    rng = np.random.default_rng(1)
    mat = rng.normal(size=(60_000, 8))
    text = "\n".join(" ".join(f"{v:.8g}" for v in r) for r in mat)

    t0 = time.perf_counter()
    native.parse_table(text, 60_000, 8)
    t_native = time.perf_counter() - t0

    t0 = time.perf_counter()
    np.loadtxt(io.StringIO(text))
    t_numpy = time.perf_counter() - t0

    assert t_native < t_numpy / 3.0, (t_native, t_numpy)
