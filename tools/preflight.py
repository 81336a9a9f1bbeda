#!/usr/bin/env python3
"""Standing end-of-round pre-flight: one command that runs everything the
driver's gates will, in order, and stops at the first failure.

    python tools/preflight.py            # full ritual (~15 min)
    python tools/preflight.py --quick    # window gate + bench only (~4 min)

Steps (each also runnable by hand; see each tool's docstring):
  1. window gate    — full_gate --window=50 at sf0.01 (what the driver
                      certifies this round)
  2. hostile sweep  — full_gate --hostile over ALL queries (robustness of
                      every standing row; skipped by --quick)
  3. plain sweep    — full_gate over ALL queries (skipped by --quick)
  4. bench          — bench.py at sf0.01 (CLI surface smoke; the judged
                      sf0.1 two-run is a separate, manual protocol —
                      see BENCH_NOTES.md for the noise-band rules)

pytest is deliberately NOT run here (it's 8 minutes and has its own
entry point); run `python -m pytest tests/ -q` alongside.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(label: str, argv: list[str], env: dict | None = None) -> None:
    print(f"== {label}: {' '.join(argv)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(argv, cwd=REPO, env={**os.environ, **(env or {})})
    dt = time.time() - t0
    if proc.returncode != 0:
        print(f"PREFLIGHT FAIL at step '{label}' ({dt:.0f}s)", flush=True)
        sys.exit(proc.returncode)
    print(f"== {label} ok ({dt:.0f}s)\n", flush=True)


def main() -> None:
    quick = "--quick" in sys.argv
    py = sys.executable
    # ONE sf-dir knob for every step, so the gate and the bench smoke can
    # never silently run against different datasets: SPARK_GRAFT_GATE_SF
    # (full_gate's own knob) wins if set, else the generic
    # SPARK_GRAFT_SF_DIR, else the sf0.01 default. The caller's value is
    # honored, never overridden.
    sf = (
        os.environ.get("SPARK_GRAFT_GATE_SF")
        or os.environ.get("SPARK_GRAFT_SF_DIR")
        or "/root/testdata/sf0.01"
    )
    env = {"SPARK_GRAFT_GATE_SF": sf, "SPARK_GRAFT_SF_DIR": sf}
    run("window gate", [py, "tools/full_gate.py", "--window=50"], env=env)
    if not quick:
        run(
            "hostile sweep (all queries)",
            [py, "tools/full_gate.py", "--hostile"],
            env=env,
        )
        run("plain sweep (all queries)", [py, "tools/full_gate.py"], env=env)
    run(f"bench smoke ({sf})", [py, "bench.py"], env=env)
    print("PREFLIGHT GREEN" + (" (quick)" if quick else ""))


if __name__ == "__main__":
    main()
