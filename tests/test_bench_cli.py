"""bench.py is the driver-facing scoreboard: a flag/API drift that only
shows up when the script runs (round-4 shipped an inverted emitter default
this way) should fail CI, not the recorded bench.  Runs the real CLI on CPU
at toy shape and checks the one-line JSON contract.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_cli_cpu_toy():
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--cpu",
         "--batch", "8", "--T", "30", "--max-iter", "25", "--repeats", "1"],
        capture_output=True, text=True, timeout=540, env=env, cwd=REPO,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"expected ONE JSON line on stdout: {lines}"
    rec = json.loads(lines[0])
    assert rec["metric"] == "carparking_batched_solves_per_s_per_chip"
    assert rec["unit"] == "solves/s"
    assert rec["value"] > 0
    assert rec["vs_baseline"] > 0
    assert 0 <= rec["solved_pct"] <= 100
