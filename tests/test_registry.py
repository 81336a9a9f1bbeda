"""Registry-contract tests: the driver certifies only the first 50 entries
of ``queries()`` iteration order, so the window must be an explicit, curated
prefix — and every name in it must resolve."""

from __future__ import annotations

from mapreduce_infrastructure_spark.registry import CERTIFIED_FIRST, all_queries


def test_window_is_exact_prefix():
    names = list(all_queries())
    assert names[: len(CERTIFIED_FIRST)] == list(CERTIFIED_FIRST)


def test_window_fits_driver_cap():
    assert len(CERTIFIED_FIRST) <= 50
    assert len(set(CERTIFIED_FIRST)) == len(CERTIFIED_FIRST)


def test_window_queries_exist_and_mostly_oracle_backed():
    qs = all_queries()
    missing = [n for n in CERTIFIED_FIRST if n not in qs]
    assert not missing
    # Rows-only (no-oracle) entries are allowed but should stay a small
    # minority of the certified window — approximate operators only.
    no_oracle = [n for n in CERTIFIED_FIRST if qs[n].oracle is None]
    assert len(no_oracle) <= 10, no_oracle
