"""Shared pytest fixtures.

One session-scoped SparkSession (local[4]) for every Spark-backed test —
session startup dominates test wall time otherwise. Shuffle partitions are
kept tiny: correctness is partition-count-invariant by design (every
ordering the engine relies on is explicit, never partition order).
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from crawler_spark.session import get_spark

    s = get_spark(app_name="crawler_spark_tests", parallelism=4, shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
