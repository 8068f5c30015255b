"""Golden-log regression: rerun the reduced cases and diff the thermo table
against the committed logs (the reference's log.<date>.<case> pattern,
SURVEY §4.1). Columns must match to f32 run-to-run reproducibility."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")


def parse_log(path):
    rows = []
    header = None
    for line in open(path):
        toks = line.split()
        if not toks:
            continue
        if toks[0] == "Step":
            header = toks
            rows = []
            continue
        if header and len(toks) == len(header):
            try:
                rows.append([float(v) for v in toks])
            except ValueError:
                header = None
        elif line.startswith("Loop time"):
            header = None
    return np.asarray(rows)


@pytest.mark.parametrize("case", ["heat_slab", "water_collapse", "droplet",
                                  "bubble_rise", "boiling"])
@pytest.mark.slow
def test_golden_log(case, tmp_path):
    from generate_golden import CASES, generate, GOLDEN as GOLD_DIR
    import generate_golden

    gold_path = os.path.join(GOLDEN, f"log.{case}")
    if not os.path.exists(gold_path):
        pytest.skip("golden log missing (run tools/generate_golden.py)")
    gold = parse_log(gold_path)

    generate_golden.GOLDEN = str(tmp_path)
    generate(case, CASES[case])
    new = parse_log(str(tmp_path / f"log.{case}"))

    assert new.shape == gold.shape
    # column-wise relative compare with a per-column absolute floor
    for col in range(gold.shape[1]):
        floor = 1e-5 * max(float(np.abs(gold[:, col]).max()), 1e-8)
        np.testing.assert_allclose(new[:, col], gold[:, col], rtol=2e-3,
                                   atol=floor, err_msg=f"column {col}")
