#!/usr/bin/env python3
"""Round-close freshness check for gate logs.

A round may only close on a hostile sweep that ran on the FINAL tree.
``full_gate.py`` stamps every run with ``GATE_TREE: head=<sha>
dirty=<bool>``; this tool refuses (exit 1) when the newest (or named)
``hostile_gate_r*.log`` is missing the stamp, was run on a dirty tree,
was run on a commit other than the current ``git rev-parse HEAD``, or is
missing the closing ``GATE: … 0 FAIL`` summary line (the stamp is printed
before the sweep runs, so a crashed/truncated sweep would otherwise pass).

    python tools/gate_freshness.py                       # newest r-log
    python tools/gate_freshness.py hostile_gate_r10.log  # specific log

Wire-up: ``preflight.py --log-round=N`` tees the hostile sweep into
``hostile_gate_rN.log`` and runs this check last, so the standing
end-of-round ritual cannot produce a stale log silently (rounds 8 and 9
both shipped sweeps that predated the final operator commits).
"""

from __future__ import annotations

import glob
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def newest_gate_log() -> str | None:
    logs = glob.glob(os.path.join(REPO, "hostile_gate_r*.log"))
    if not logs:
        return None

    def round_no(p: str) -> int:
        m = re.search(r"hostile_gate_r(\d+)\.log$", p)
        return int(m.group(1)) if m else -1

    return max(logs, key=round_no)


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else newest_gate_log()
    if not path:
        print("gate_freshness: no hostile_gate_r*.log found")
        return 1
    if not os.path.isabs(path):
        path = os.path.join(REPO, path)
    text = open(path, errors="replace").read()
    m = re.search(r"GATE_TREE: head=([0-9a-f]{7,40}|unknown) dirty=(\w+)", text)
    if not m:
        print(f"gate_freshness: {os.path.basename(path)} carries no "
              "GATE_TREE stamp (pre-round-10 log, or output truncated) — "
              "re-run the sweep on the final tree")
        return 1
    stamped, dirty = m.group(1), m.group(2) == "true"
    # The GATE_TREE stamp is printed BEFORE the sweep runs, so a crashed or
    # truncated run would still carry a valid-looking stamp.  Require the
    # closing summary line too, and require it to report 0 FAIL — a log
    # without it is not round-close evidence.
    g = re.search(r"^GATE: (\d+) pass, (\d+) no_oracle, (\d+) FAIL", text, re.M)
    if not g:
        print(f"gate_freshness FAIL: {os.path.basename(path)} has no closing "
              "'GATE: … FAIL' summary line — the sweep crashed or the log was "
              "truncated; re-run it to completion")
        return 1
    if int(g.group(3)) != 0:
        print(f"gate_freshness FAIL: {os.path.basename(path)} closing summary "
              f"reports {g.group(3)} FAIL — a failing sweep cannot close the "
              "round")
        return 1
    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], capture_output=True, text=True, cwd=REPO
    ).stdout.strip()
    # The sweep commonly runs on a clean tree and the log itself is then
    # committed, so HEAD may be AHEAD of the stamp by commits that touch
    # only the log/notes. Accept the stamp if it is HEAD, or if every
    # commit after it touches no engine/test/entry source.
    if stamped == head and not dirty:
        print(f"gate_freshness OK: {os.path.basename(path)} ran on HEAD "
              f"{head[:12]} (clean tree)")
        return 0
    if dirty:
        print(f"gate_freshness FAIL: {os.path.basename(path)} ran on a "
              f"DIRTY tree at {stamped[:12]}")
        return 1
    diff = subprocess.run(
        ["git", "diff", "--name-only", f"{stamped}..HEAD"],
        capture_output=True, text=True, cwd=REPO,
    )
    if diff.returncode != 0:
        print(f"gate_freshness FAIL: stamped commit {stamped[:12]} not in "
              f"history (HEAD {head[:12]})")
        return 1
    src = [
        f for f in diff.stdout.split()
        if f.startswith(("mapreduce_infrastructure_spark/", "tests/", "tools/"))
        or f in ("__spark_entry__.py", "bench.py")
    ]
    if src:
        print(f"gate_freshness FAIL: {os.path.basename(path)} ran on "
              f"{stamped[:12]} but HEAD {head[:12]} changed source since: "
              f"{src[:10]}{' …' if len(src) > 10 else ''}")
        return 1
    print(f"gate_freshness OK: {os.path.basename(path)} ran on "
          f"{stamped[:12]}; only non-source files changed to HEAD "
          f"{head[:12]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
