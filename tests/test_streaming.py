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


def test_batch_mirror_equals_real_stream(spark, tmp_path):
    """batch_windows.windowed_counts_with_late_exclusion is pinned to a
    REAL readStream/withWatermark/append-mode query: same micro-batched
    fixture (one file per trigger, mtime-ordered), same watermark delay,
    same tumbling window → identical finalized windows, including the
    dropped-late-row behavior (two rows land behind the watermark)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from crawler_spark.streaming.batch_windows import (
        finalized_windows,
        windowed_counts_with_late_exclusion,
    )

    T0 = BASE
    m = datetime.timedelta
    batches = []
    for k in range(4):
        rows = []
        for i in range(8):
            eid = k * 8 + i
            ts = T0 + m(minutes=k * 20 + i * 2)
            if eid == 9:
                ts = T0 + m(minutes=1)  # late but window still open -> kept
            if eid == 17:
                # late; window end 00:10 <= max(b0,b1)-15min BUT the late
                # filter lags one trigger (uses max(b0)-15min) -> KEPT and
                # emitted in the same batch's eviction — the exact case that
                # distinguishes the lagged filter from the naive model
                ts = T0 + m(minutes=2)
            if eid == 27:
                ts = T0 + m(minutes=5)  # window [0,10) finalized -> dropped
            rows.append((eid, ts, "a" if eid % 2 == 0 else "b", float(eid) + 0.25))
        batches.append(rows)
    batches.append([(32, T0 + m(hours=24), "zz_sentinel", 0.0)])  # pushes the final watermark

    src = tmp_path / "stream_src"
    src.mkdir()
    for k, rows in enumerate(batches):
        tbl = pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "event_type": pa.array([r[2] for r in rows]),
                "value": pa.array([r[3] for r in rows], pa.float64()),
            }
        )
        path = str(src / f"batch-{k:03d}.parquet")
        pq.write_table(tbl, path)
        os.utime(path, (1_700_000_000 + k, 1_700_000_000 + k))  # force trigger order

    schema = "event_id long, ts timestamp, event_type string, value double"
    cents = F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias("value_cents")
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(src))
        .withWatermark("ts", "15 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), cents)
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "value_cents")
    )
    q = (
        stream.writeStream.outputMode("append").format("memory")
        .queryName("bw_stream").option("checkpointLocation", str(tmp_path / "ckpt_bw"))
        .start()
    )
    try:
        q.processAllAvailable()
        got_stream = {
            (r["window_start"], r["event_type"]): (r["n_events"], r["value_cents"])
            for r in spark.sql("select * from bw_stream").collect()
            if r["event_type"] != "zz_sentinel"
        }
    finally:
        q.stop()

    flat = [r for rows in batches for r in rows]
    df = spark.createDataFrame(flat, schema)
    mirror = windowed_counts_with_late_exclusion(
        df, ts_col="ts", seq_col="event_id", keys=["event_type"],
        aggs=[F.count("*").alias("n_events"), cents],
        window="10 minutes", delay_seconds=900, batch_size=8,
    )
    final = finalized_windows(mirror, df, "ts", "10 minutes", 900)
    got_batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["value_cents"])
        for r in final.collect()
        if r["event_type"] != "zz_sentinel"
    }
    assert got_batch == got_stream
    assert len(got_stream) > 0
    # the mirror really excluded the watermark-dropped row (event 27) and
    # really kept the lagged-filter row (event 17)
    n_included = mirror.agg(F.sum("n_events")).collect()[0][0]
    assert n_included == len(flat) - 1


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


def test_batch_mirror_matches_python_simulator_randomized(spark):
    """Property pin for the closed form beyond the single real-stream
    fixture above: 6 seeded random arrival patterns (out-of-order and
    late rows, varying batch size / watermark delay) against a pure-
    Python simulator of the documented append-mode semantics — rows
    micro-batched by floor(seq/batch_size); batch k's late filter uses
    max event time over the previous-two-TRIGGERS-back prefix minus the
    delay (the one-trigger lag, batch_windows.py docstring); a row merges
    iff its tumbling window is not yet finalized."""
    import random

    from pyspark.sql import functions as F

    from crawler_spark.streaming.batch_windows import windowed_counts_with_late_exclusion

    WINDOW_SEC = 600

    def simulate(rows, batch_size, delay):
        # rows: (seq, ts_offset_sec, key)
        batches = {}
        for seq, off, key in rows:
            batches.setdefault(seq // batch_size, []).append((off, key))
        merged = {}
        ordered = sorted(batches)
        for pos, b in enumerate(ordered):
            prefix = [off for p in ordered[:max(pos - 1, 0)] for off, _ in batches[p]]
            wm = max(prefix) - delay if prefix else None
            for off, key in batches[b]:
                wstart = (off // WINDOW_SEC) * WINDOW_SEC
                if wm is None or wstart + WINDOW_SEC > wm:
                    k = (wstart, key)
                    merged[k] = merged.get(k, 0) + 1
        return merged

    rng = random.Random(20260818)
    for case in range(6):
        n = rng.randint(12, 60)
        batch_size = rng.choice([3, 5, 8])
        delay = rng.choice([300, 900, 1800])
        rows = [
            (seq, rng.randint(0, 7200), rng.choice("ab"))
            for seq in range(n)
        ]
        df = spark.createDataFrame(
            [(seq, BASE + datetime.timedelta(seconds=off), key) for seq, off, key in rows],
            "seq long, ts timestamp, key string",
        )
        got = {
            (int((r["window_start"] - BASE).total_seconds()), r["key"]): r["n"]
            for r in windowed_counts_with_late_exclusion(
                df, ts_col="ts", seq_col="seq", keys=["key"],
                aggs=[F.count("*").alias("n")],
                window="10 minutes", delay_seconds=delay, batch_size=batch_size,
            ).collect()
        }
        want = simulate(rows, batch_size, delay)
        assert got == want, f"case {case}: batch={batch_size} delay={delay} n={n}"
