#!/usr/bin/env python3
"""Standing end-of-round pre-flight: one command that runs everything the
driver's gates will, in order, and stops at the first failure.

    python tools/preflight.py                 # full ritual (~15 min)
    python tools/preflight.py --quick         # window gate + bench (~4 min)
    python tools/preflight.py --log-round=10  # full + tee hostile sweep to
                                              # hostile_gate_r10.log + verify
                                              # the log's HEAD stamp is fresh

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


def run(
    label: str,
    argv: list[str],
    env: dict | None = None,
    tee_to: str | None = None,
) -> None:
    print(f"== {label}: {' '.join(argv)}", flush=True)
    t0 = time.time()
    if tee_to:
        with open(os.path.join(REPO, tee_to), "w") as fh:
            proc = subprocess.Popen(
                argv, cwd=REPO, env={**os.environ, **(env or {})},
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            for line in proc.stdout:
                sys.stdout.write(line)
                fh.write(line)
            proc.wait()
    else:
        proc = subprocess.run(argv, cwd=REPO, env={**os.environ, **(env or {})})
    dt = time.time() - t0
    if proc.returncode != 0:
        print(f"PREFLIGHT FAIL at step '{label}' ({dt:.0f}s)", flush=True)
        sys.exit(proc.returncode)
    print(f"== {label} ok ({dt:.0f}s)\n", flush=True)


USAGE = """\
usage: python tools/preflight.py [--quick] [--log-round=N]

  --quick        window gate + bench smoke only (skip the full sweeps)
  --log-round=N  tee the hostile sweep to hostile_gate_rNN.log

env: SPARK_GRAFT_GATE_SF / SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.01)
"""


def main() -> None:
    # Guard unknown flags — a typo must not silently launch the ~25-minute
    # full ritual (same guard as full_gate.py, verdict r12 note 1).
    if "--help" in sys.argv or "-h" in sys.argv:
        print(USAGE, end="")
        return
    for a in sys.argv[1:]:
        if a != "--quick" and not a.startswith("--log-round="):
            print(f"unknown argument: {a}\n{USAGE}", end="", file=sys.stderr)
            sys.exit(2)
    quick = "--quick" in sys.argv
    log_round = None
    for a in sys.argv[1:]:
        if a.startswith("--log-round="):
            log_round = int(a.split("=", 1)[1])
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
        log = f"hostile_gate_r{log_round:02d}.log" if log_round else None
        run(
            "hostile sweep (all queries)",
            [py, "tools/full_gate.py", "--hostile"],
            env=env,
            tee_to=log,
        )
        run("plain sweep (all queries)", [py, "tools/full_gate.py"], env=env)
    run(f"bench smoke ({sf})", [py, "bench.py"], env=env)
    if not quick and log_round:
        # Round-close invariant: the sweep log must stamp the tree it ran
        # on, and that tree must be HEAD (rounds 8/9 shipped stale sweeps).
        run("gate-log freshness", [py, "tools/gate_freshness.py", log])
    print("PREFLIGHT GREEN" + (" (quick)" if quick else ""))


if __name__ == "__main__":
    main()
