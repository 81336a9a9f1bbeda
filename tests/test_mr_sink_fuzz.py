"""Property-based fuzz of the MR text sink round-trip.

The sink's line format is the reference's ``key, value``
(``src/mr_tasks.h:112-115``) — a format that cannot represent newlines
(line terminator) or a comma inside the key (first ``", "`` is the
separator). Within that representable domain, write_sorted_text must
round-trip EXACTLY for arbitrary pairs, arbitrary R, and arbitrary
duplicates: multiset of pairs preserved, keys globally sorted across the
R files in file order, exactly R files present.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings, strategies as st

from mapreduce_infrastructure_spark.mr.runner import write_sorted_text

# Representable in the "key, value" line format: printable, no newlines,
# no comma in keys (values MAY contain ", " — parse splits on the first).
_key = st.text(
    alphabet=st.characters(
        blacklist_categories=("Cs", "Cc", "Zl", "Zp"), blacklist_characters=","
    ),
    min_size=1,
    max_size=12,
).filter(lambda s: s == s.strip())
_val = st.text(
    alphabet=st.characters(blacklist_categories=("Cs", "Cc", "Zl", "Zp")),
    min_size=0,
    max_size=12,
).filter(lambda s: s == s.strip())


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(st.tuples(_key, _val), min_size=0, max_size=25),
    r=st.integers(min_value=1, max_value=5),
)
def test_sink_roundtrip_sorted_exactly_r(spark, tmp_path_factory, pairs, r):
    out = str(tmp_path_factory.mktemp("mr_sink"))
    df = spark.createDataFrame(pairs or [("__sentinel__", "")], "key string, value string")
    if not pairs:
        df = df.limit(0)
    files = write_sorted_text(df, out, r)
    assert len(files) == r
    assert [os.path.basename(f) for f in files] == [f"output_{i}" for i in range(r)]
    got = []
    for f in files:
        with open(f, encoding="utf-8") as fh:
            for line in fh.read().splitlines():
                k, _, v = line.partition(", ")
                got.append((k, v))
    assert sorted(got) == sorted(pairs)
    # global order: keys non-decreasing across files in file order
    keys = [k for k, _ in got]
    assert keys == sorted(keys)
