"""Structured-Streaming harvest consumer: file-source pickup of snapshot
commits, watermarked windowed aggregation, incremental batch arrival.
"""

from __future__ import annotations

import datetime

import pytest

from crawler_spark.storage.snapshots import SnapshotStore
from crawler_spark.streaming.harvest_stream import run_to_memory

BASE = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _harvest_rows(epoch: int, n: int, doc_type: str):
    ts = BASE + datetime.timedelta(seconds=epoch * 5)
    return [(f"cd:/npm/npmjs/-/d{epoch}-{i}/1.0", doc_type, epoch, ts) for i in range(n)]


@pytest.fixture()
def store(spark, tmp_path):
    st = SnapshotStore(spark, str(tmp_path))
    schema = "doc_id string, doc_type string, epoch int, event_ts timestamp"
    st.commit(0, append={"harvest_events": spark.createDataFrame(_harvest_rows(0, 4, "npm"), schema)})
    st.commit(1, append={"harvest_events": spark.createDataFrame(
        _harvest_rows(1, 2, "npm") + _harvest_rows(1, 3, "licensee"), schema)})
    return st


def test_windowed_counts_over_committed_epochs(spark, store):
    q = run_to_memory(spark, store.path, query_name="hc_test")
    try:
        q.processAllAvailable()
        rows = {(r["window_start"], r["doc_type"]): (r["n_docs"], r["n_unique"])
                for r in spark.sql("select * from hc_test").collect()}
        # epochs 0 (t=0s) and 1 (t=5s) share the first 10s window
        assert rows[(BASE, "npm")] == (6, 6)
        assert rows[(BASE, "licensee")] == (3, 3)
    finally:
        q.stop()


def test_stream_picks_up_new_commits_incrementally(spark, store):
    q = run_to_memory(spark, store.path, query_name="hc_inc")
    try:
        q.processAllAvailable()
        n0 = spark.sql("select sum(n_docs) s from hc_inc").collect()[0]["s"]
        assert n0 == 9
        # a later epoch lands in a NEW 10 s window (epoch 3 → t=15s)
        schema = "doc_id string, doc_type string, epoch int, event_ts timestamp"
        store.commit(3, append={"harvest_events": spark.createDataFrame(_harvest_rows(3, 5, "scancode"), schema)})
        q.processAllAvailable()
        rows = {(r["window_start"], r["doc_type"]): r["n_docs"]
                for r in spark.sql("select * from hc_inc").collect()}
        assert rows[(BASE + datetime.timedelta(seconds=10), "scancode")] == 5
        assert sum(rows.values()) == 14
    finally:
        q.stop()


def test_stateful_first_seen_dedup(spark, store, tmp_path):
    """applyInPandasWithState cuckoo dedup: doc_ids re-emitted in later
    triggers (re-crawls) are suppressed; first occurrences pass."""
    from crawler_spark.streaming.harvest_stream import harvest_event_stream
    from crawler_spark.streaming.stateful_dedup import first_seen_stream

    out = first_seen_stream(harvest_event_stream(spark, store.path))
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("first_seen").option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = {r["doc_id"] for r in spark.sql("select * from first_seen").collect()}
        # 9 events but d1-0/d1-1 appear under two doc_types → 7 unique doc_ids
        assert len(first) == 7
        # re-crawl: epoch 5 re-emits epoch-0 docs plus one new doc
        schema = "doc_id string, doc_type string, epoch int, event_ts timestamp"
        dup_rows = [(d, "npm", 5, BASE + datetime.timedelta(seconds=25))
                    for d in sorted(first)[:4]]
        new_row = [("cd:/npm/npmjs/-/brand-new/1.0", "npm", 5, BASE + datetime.timedelta(seconds=25))]
        store.commit(5, append={"harvest_events": spark.createDataFrame(dup_rows + new_row, schema)})
        q.processAllAvailable()
        rows = [r["doc_id"] for r in spark.sql("select * from first_seen").collect()]
        assert len(rows) == len(set(rows)) == 8  # only the new doc added, no dup re-emits
        assert "cd:/npm/npmjs/-/brand-new/1.0" in rows
    finally:
        q.stop()
