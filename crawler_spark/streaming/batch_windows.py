"""Batch-form mirror of Structured Streaming's watermarked windowed
aggregation — the closed-form twin of `harvest_stream.windowed_harvest_counts`
that a SQL oracle (and the driver's DuckDB harness) can reproduce exactly.

Semantics modeled (Spark Structured Streaming, append-mode state handling):

* rows arrive in micro-batches of `batch_size` consecutive sequence
  numbers (`seq_col` is the arrival order — in the harvest delta stream
  that is the append sequence; for the driver's `events` table it is
  `event_id`);
* a row is MERGED into its window's state iff the window has not been
  finalized, i.e. ``window_end > watermark``; Spark evicts (and from
  then on drops late rows for) exactly the windows with
  ``window_end <= watermark``. Late rows inside still-open windows
  aggregate normally; only late rows for finalized windows drop.
* the watermark FILTERING micro-batch k's input lags one trigger behind
  the max-event-time bookkeeping: it is
  ``max(event_time over batches 0..k-2) − delay``. Spark computes the
  new watermark from batch k−1's event-time stats at that batch's END,
  but the stateful operator applies the PREVIOUS trigger's value when
  filtering batch k's late input (verified empirically against pyspark
  4.1 in tests/test_streaming.py::test_batch_mirror_equals_real_stream:
  a late row whose window end ≤ max(0..k-1)−delay but > max(0..k-2)−delay
  is still merged — and emitted in the same batch's eviction). The
  initial watermark admits everything.

tests/test_streaming.py pins batch ≡ stream equality: this closed form
and a real `readStream`/`withWatermark`/append-mode query produce the
same windows on the same micro-batched fixture.

Scale: the watermark table is one row per micro-batch — its unpartitioned
running-max window is over that tiny table, never over data rows; data
rows see one broadcast join + one hash aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def micro_batch_watermarks(
    df: DataFrame, ts_col: str, seq_col: str, batch_size: int, delay_seconds: int
) -> DataFrame:
    """(_b, _wm) per micro-batch: the watermark the stateful operator
    applies to batch _b's INPUT — max event time of batches 0.._b-2 minus
    the delay (the one-trigger filter lag, see module docstring); NULL
    for the first two batches (initial watermark admits everything)."""
    bmax = (
        df.withColumn("_b", F.floor(F.col(seq_col) / batch_size).cast("long"))
        .groupBy("_b")
        .agg(F.max(ts_col).alias("_bm"))
    )
    prev_max = F.max("_bm").over(
        Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -2)
    )
    return bmax.select(
        "_b",
        (prev_max - F.expr(f"INTERVAL {int(delay_seconds)} SECOND")).alias("_wm"),
    )


def windowed_counts_with_late_exclusion(
    df: DataFrame,
    ts_col: str,
    seq_col: str,
    keys: list[str],
    aggs: list[Column],
    window: str = "1 hour",
    delay_seconds: int = 1800,
    batch_size: int = 500,
) -> DataFrame:
    """Tumbling-window aggregation with Structured-Streaming late-row
    exclusion (see module docstring). Returns
    (window_start, *keys, *aggs) over the rows a watermarked append-mode
    stream would actually have merged."""
    w = F.window(F.col(ts_col), window)
    base = df.withColumn(
        "_b", F.floor(F.col(seq_col) / batch_size).cast("long")
    ).withColumn("_wend", w["end"])
    wm = micro_batch_watermarks(df, ts_col, seq_col, batch_size, delay_seconds)
    included = base.join(F.broadcast(wm), "_b").filter(
        F.col("_wm").isNull() | (F.col("_wend") > F.col("_wm"))
    )
    return included.groupBy(
        F.window(F.col(ts_col), window)["start"].alias("window_start"), *keys
    ).agg(*aggs)


def finalized_windows(
    result: DataFrame, df: DataFrame, ts_col: str, window: str, delay_seconds: int
) -> DataFrame:
    """Restrict a `windowed_counts_with_late_exclusion` result to windows
    an append-mode sink would have EMITTED by end-of-stream: those whose
    window end ≤ final watermark (max event time overall − delay)."""
    final_wm = df.agg(
        (F.max(ts_col) - F.expr(f"INTERVAL {int(delay_seconds)} SECOND")).alias("_fw")
    )
    wend = F.window(F.col("window_start"), window)["end"]
    return (
        result.crossJoin(F.broadcast(final_wm))
        .filter(wend <= F.col("_fw"))
        .drop("_fw")
    )
