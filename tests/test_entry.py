"""Driver-contract smoke tests for __spark_entry__: entry() runs, every
queries() entry returns a DataFrame, and a representative subset matches
its DuckDB oracle exactly (the full sweep lives in
scripts/oracle_check.py and the driver's own harness).
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from scripts.oracle_check import TABLES, compare

SF_DIR = "/root/testdata/sf0.001"
SUBSET = [
    "q_schedule_epoch", "q_coord_parse", "q_cosine_topk",
    "q_semver_latest", "q_langid", "q_media_decode",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "pop_index" in df.columns


def test_every_query_has_callable_and_oracle_keys_subset():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs)  # every oracle belongs to a query
    # non-oracled queries are exactly the xxhash64-based ones
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "q_minhash_near_dups", "q_simhash_near_dups", "q_lsh_buckets",
        "q_ivf_topk", "q_winnow_fingerprints", "q_embed_near_pairs_lsh",
    }


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_duckdb_oracle(spark, ddb, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    res = ddb.execute(entrymod.oracle_sql()[name])
    cols = [d[0] for d in res.description]
    err = compare(name, df, res.fetchall(), cols)
    assert err is None, err
