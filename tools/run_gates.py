#!/usr/bin/env python
"""One-command slow-gate runner (r3 VERDICT #10).

The 14 `slow`-marked tests are the ONLY place configs 3/4/5 physics is
checked (accuracy gate, dist x phase-change, strip dynamics, case physics),
and r3 shipped with one of them red because they sit outside the 12-min
quick path. This runs them un-skippably and records a machine-readable
stamp so every round's HEAD can prove the gates were green:

    python tools/run_gates.py            # slow gates only (~15-20 min)
    python tools/run_gates.py --all      # quick suite + slow gates

Output: human log to stdout, one JSON line appended to
tools/gates_log.jsonl {ts, git_head, cmd, passed, failed, wall_s}.
"""

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def run(selector_args):
    cmd = [sys.executable, "-m", "pytest", "tests/", "-q"] + selector_args
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=ROOT, capture_output=True, text=True)
    wall = time.time() - t0
    tail = (proc.stdout or "") + (proc.stderr or "")
    print(tail[-4000:])
    # parse "N passed" / "N failed" from the summary line
    passed = failed = 0
    for tok_line in tail.splitlines()[::-1]:
        if "passed" in tok_line or "failed" in tok_line:
            parts = tok_line.replace(",", " ").split()
            for i, p in enumerate(parts):
                if p.startswith("passed") and i > 0 and parts[i-1].isdigit():
                    passed = int(parts[i - 1])
                if p.startswith("failed") and i > 0 and parts[i-1].isdigit():
                    failed = int(parts[i - 1])
            if passed or failed:
                break
    return proc.returncode, passed, failed, wall


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--all", action="store_true",
                    help="run the quick suite too, not just the slow gates")
    args = ap.parse_args()

    selector = [] if args.all else ["-m", "slow"]
    rc, passed, failed, wall = run(selector)

    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"], cwd=ROOT,
                          capture_output=True, text=True).stdout.strip()
    stamp = dict(ts=time.time(), git_head=head,
                 cmd=("all" if args.all else "slow"),
                 passed=passed, failed=failed, wall_s=round(wall, 1))
    with open(ROOT / "tools" / "gates_log.jsonl", "a") as fh:
        fh.write(json.dumps(stamp) + "\n")
    print(json.dumps(stamp))
    sys.exit(rc)


if __name__ == "__main__":
    main()
