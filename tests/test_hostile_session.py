"""Conf-independence: a representative query slice must match the DuckDB
oracle even on a deliberately hostile SparkSession — local[5]/7 shuffle
partitions (different parallelism and partition boundaries), session
timezone America/New_York, ANSI flipped, whole-stage codegen off. Runs
tools/full_gate.py --hostile in a subprocess because the hostile session
needs its own JVM confs, which must not leak into the shared test session.

The slice covers the conf-sensitive surfaces: float aggregation (q1),
interval RANGE windows over timestamps (window_range_7day_sum), IEEE rate
math (sample_temperature_mix), md5 fingerprints (dedup_exact), date
arithmetic (scalar_date_funcs), running-sum windows (pack_sequences), and
the flagship wordcount.
"""

from __future__ import annotations

import os
import subprocess
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SLICE = [
    "q1_pricing_summary",
    "window_range_7day_sum",
    "sample_temperature_mix",
    "dedup_exact",
    "scalar_date_funcs",
    "pack_sequences",
    "wordcount",
]


def test_hostile_session_gate():
    env = dict(os.environ)
    env["SPARK_GRAFT_GATE_SF"] = "/root/testdata/sf0.001"
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "tools", "full_gate.py"), "--hostile", *_SLICE],
        cwd=_REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout[-3000:] + proc.stderr[-2000:]
    assert "0 FAIL" in proc.stdout, proc.stdout[-3000:]
