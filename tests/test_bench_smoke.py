"""bench.py must never ship broken: BENCH_r02 was lost to an import-time
NameError that only surfaced when the driver ran the bench. This test runs
``bench.py --smoke`` (one query per family at sf0.001, no warmup pass) in a
subprocess — the same entrypoint the driver invokes — so an import error,
a registry typo, or a plan-time failure in ANY family fails CI."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_smoke_runs_and_emits_json():
    env = {
        **os.environ,
        "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.001",
        "SPARK_GRAFT_CPUS": "4",
    }
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), "--smoke"],
        capture_output=True,
        text=True,
        cwd=REPO,
        env=env,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # last stdout line is the single JSON record
    line = proc.stdout.strip().splitlines()[-1]
    rec = json.loads(line)
    assert rec["metric"] == "smoke_queries_total"
    assert rec["queries"], "smoke ran zero queries"
    assert all(v >= 0 for v in rec["queries"].values())
