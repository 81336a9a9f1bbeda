from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_infrastructure_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# Enforce documented-only preconditions (bucketed_prefix_sum order-key
# uniqueness) on every call the suite makes — a violating call site fails
# loudly in CI instead of flaking (ADVICE r10). Bench/production paths
# leave this unset and pay nothing.
os.environ.setdefault("SPARK_GRAFT_CHECK_PRECONDITIONS", "1")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark(app_name="mri-spark-tests", master="local[4]", shuffle_partitions=4)
    yield spark


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_DIR
