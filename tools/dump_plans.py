#!/usr/bin/env python3
"""Dump `.explain("formatted")` for named queries to plans/<out_dir>/.

    python tools/dump_plans.py <out_dir> <suffix> <query> [<query> ...]

Writes plans/<out_dir>/<query>_<suffix>.txt for each query, built against
$SPARK_GRAFT_SF_DIR (default sf0.1). Used for the optimization rounds'
before/after plan evidence (guide §1: capture the plan shape — Exchange
count, join strategy, PushedFilters/ReadSchema, codegen spans — for every
query you touch).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_infrastructure_spark.plans.checks import explain_str  # noqa: E402
from mapreduce_infrastructure_spark.registry import all_queries  # noqa: E402
from mapreduce_infrastructure_spark.session import get_spark  # noqa: E402


def main() -> None:
    out_dir, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="mri-spark-plandump")
    queries = all_queries()
    dest = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", out_dir)
    os.makedirs(dest, exist_ok=True)
    for name in names:
        df = queries[name].fn(spark, sf_dir)
        path = os.path.join(dest, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(explain_str(df, mode="formatted"))
        print(f"wrote {path}", flush=True)


if __name__ == "__main__":
    main()
