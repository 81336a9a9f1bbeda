"""Strict local emulation of the driver's CORRECTNESS gate.

Runs every ``queries()`` entry against its ``oracle_sql()`` via DuckDB at a
given SF dir and compares row counts plus an order-insensitive, columns-
sorted-by-name value multiset — **type-sensitively**: ``Decimal(2)`` does NOT
equal ``2`` here, because the driver's value hash distinguishes them (round-1
lesson: DuckDB SUM(INTEGER) -> HUGEINT -> Arrow decimal128 -> Python Decimal
hash-mismatches Spark's int64 even when plain ``==`` passes).

Usage:
    python tools/full_gate.py                 # all queries, sf0.01
    python tools/full_gate.py q1 q2 ...       # subset
    SPARK_GRAFT_GATE_SF=/root/testdata/sf0.001 python tools/full_gate.py
    python tools/full_gate.py --window 50     # only the first N (driver cap)
    python tools/full_gate.py --hostile q1 …  # hostile session (see below)

``--hostile`` runs the gate on a deliberately adversarial session instead
of ``get_spark()``: ``local[5]`` with 7 shuffle partitions (exposes any
partitioning/parallelism dependence), session timezone America/New_York
and ANSI mode flipped from the default at BUILD time (``tune()`` must
re-pin the dynamic confs it owns), and whole-stage codegen off (results
must not depend on the codegen path). Queries whose results survive this
session unchanged are partitioning- and conf-independent — the property
that makes them reproducible on an arbitrary production cluster.
"""

from __future__ import annotations

import math
import os
import sys
import time
from collections import Counter
from datetime import date, datetime
from decimal import Decimal

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def _norm_cell(v):
    """Normalize a cell to a (type-tag, value) pair the way a type-sensitive
    hash would see it. numpy scalars are unwrapped (both engines may hand
    them back through Arrow), floats are bucketed to a repr that keeps NaN
    stable; everything else keeps its concrete Python type as the tag."""
    try:  # unwrap numpy scalar types without importing numpy at module level
        import numpy as np

        if isinstance(v, np.generic):
            v = v.item()
    except ImportError:  # pragma: no cover
        pass
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, Decimal):
        return ("Decimal", str(v))
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "nan")
        return ("float", repr(v))
    if isinstance(v, datetime):
        return ("datetime", v.isoformat())
    if isinstance(v, date):
        return ("date", v.isoformat())
    if isinstance(v, (list, tuple)):
        return ("list", tuple(_norm_cell(x) for x in v))
    if isinstance(v, dict):
        return ("dict", tuple(sorted((k, _norm_cell(x)) for k, x in v.items())))
    if v is None:
        return ("null", None)
    return (type(v).__name__, v)


def _multiset(cols: list[str], rows: list[tuple]) -> Counter:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return Counter(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def _diag(spark_ms: Counter, oracle_ms: Counter) -> str:
    only_s = list((spark_ms - oracle_ms).items())[:2]
    only_o = list((oracle_ms - spark_ms).items())[:2]
    return f"spark-only={only_s} oracle-only={only_o}"


USAGE = """\
usage: python tools/full_gate.py [--window[=N]] [--hostile] [query ...]

  --window[=N]  gate only the first N (default 50) CERTIFIED_FIRST queries
  --hostile     adversarial session: local[5]/7 shuffle partitions,
                America/New_York, ANSI flipped, codegen off
  query ...     subset of registered query names (default: all)

env: SPARK_GRAFT_GATE_SF=<sf dir>  (default /root/testdata/sf0.01)
"""


def main() -> int:
    argv = sys.argv[1:]
    # Unknown flags must not silently start a 25-minute full sweep
    # (observed with --help in round 12): print usage instead.
    if "--help" in argv or "-h" in argv:
        print(USAGE, end="")
        return 0
    for a in argv:
        if a.startswith("--") and a not in ("--hostile",) and not (
            a == "--window" or a.startswith("--window=")
        ):
            print(f"unknown flag: {a}\n{USAGE}", end="", file=sys.stderr)
            return 2
    window = None
    hostile = "--hostile" in argv
    skip = set()
    for i, a in enumerate(argv):
        if a.startswith("--window"):
            if "=" in a:
                window = int(a.split("=", 1)[1])
            elif i + 1 < len(argv) and argv[i + 1].isdigit():
                # "--window 50": consume the count so it isn't mistaken
                # for a query-name filter (which silently matches nothing)
                window = int(argv[i + 1])
                skip.add(i + 1)
            else:
                window = 50
    args = [
        a
        for i, a in enumerate(argv)
        if not a.startswith("--") and i not in skip
    ]

    import duckdb

    import __spark_entry__ as entry
    from mapreduce_infrastructure_spark.session import get_spark

    # Freshness stamp: every gate run records the exact tree it certified,
    # so a round-end log can be mechanically checked against HEAD
    # (tools/gate_freshness.py). Two consecutive rounds shipped a hostile
    # sweep that predated the final operator commits; the stamp makes that
    # staleness detectable instead of remembered.
    import subprocess

    try:
        head = subprocess.run(
            ["git", "rev-parse", "HEAD"],
            capture_output=True, text=True, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
        ).stdout.strip()
        # "dirty" means SOURCE dirt only: the sweep's own teed log
        # (hostile_gate_r*.log, created while the sweep runs) and other
        # doc/status files must not make every --log-round run self-dirty.
        status = subprocess.run(
            ["git", "status", "--porcelain"],
            capture_output=True, text=True, cwd=os.path.dirname(
                os.path.dirname(os.path.abspath(__file__))),
        ).stdout.splitlines()
        src_prefixes = ("mapreduce_infrastructure_spark/", "tests/", "tools/")
        src_files = ("__spark_entry__.py", "bench.py")
        dirty = any(
            p.startswith(src_prefixes) or p in src_files
            for p in (line[3:].strip() for line in status if len(line) > 3)
        )
    except OSError:  # pragma: no cover - git always present in this env
        head, dirty = "unknown", True
    print(f"GATE_TREE: head={head} dirty={str(dirty).lower()} "
          f"hostile={str(hostile).lower()}")

    sf = os.environ.get("SPARK_GRAFT_GATE_SF", "/root/testdata/sf0.01")
    if hostile:
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("hostile-gate")
            .master("local[5]")
            .config("spark.sql.shuffle.partitions", "7")
            .config("spark.sql.session.timeZone", "America/New_York")
            .config("spark.sql.ansi.enabled", "false")
            .config("spark.sql.codegen.wholeStage", "false")
            .config("spark.ui.enabled", "false")
            .config("spark.ui.showConsoleProgress", "false")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
    else:
        spark = get_spark()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )

    queries = entry.queries()
    oracles = entry.oracle_sql()
    names = list(queries)
    if window is not None:
        names = names[:window]
    if args:
        names = [n for n in names if n in set(args)]

    n_pass = n_fail = n_noracle = 0
    failures: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            failures.append(f"{name}: SPARK ERROR {exc}")
            print(f"FAIL {name}: spark error {exc}")
            continue
        sql = oracles.get(name)
        if sql is None:
            n_noracle += 1
            print(f"  ok {name}: no_oracle rows={len(srows)} "
                  f"({time.time() - t0:.1f}s)")
            continue
        try:
            cur = con.execute(sql)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as exc:  # noqa: BLE001
            n_fail += 1
            failures.append(f"{name}: ORACLE ERROR {exc}")
            print(f"FAIL {name}: oracle error {exc}")
            continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rows {len(srows)} vs {len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols {sorted(scols)} vs {sorted(ocols)}")
        else:
            sm, om = _multiset(scols, srows), _multiset(ocols, orows)
            if sm != om:
                problems.append(f"values: {_diag(sm, om)}")
        dec_cols = [
            ocols[i]
            for i in range(len(ocols))
            if any(isinstance(r[i], Decimal) for r in orows[:100])
        ]
        if dec_cols:
            problems.append(f"oracle Decimal cols {dec_cols}")
        if problems:
            n_fail += 1
            failures.append(f"{name}: " + "; ".join(problems))
            print(f"FAIL {name}: " + "; ".join(problems))
        else:
            n_pass += 1
            print(f"  ok {name}: rows={len(srows)} ({time.time() - t0:.1f}s)")

    print(
        f"\nGATE: {n_pass} pass, {n_noracle} no_oracle, {n_fail} FAIL "
        f"(of {len(names)} at {sf})"
    )
    for f in failures:
        print("  " + f)
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
