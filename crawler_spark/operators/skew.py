"""Skew handling: salted two-phase top-k per group.

The politeness budget and FIFO ranking windows partition by `host` /
`(scope, queue)`. At 10^10 frontier rows a hot host (Zipf head) makes a
single window partition arbitrarily large — the classic straggler. The
standard fix (north rule: "hot-host salting"): split each group into
`n_salts` deterministic sub-partitions, take the per-salt top-k (correct
because the global top-k by any total order is a subset of the union of
per-salt top-k), then rank the ≤ k·n_salts survivors exactly.

Phase-1 partitions are (group, salt) — bounded at |group|/n_salts rows;
phase-2 partitions are (group) but hold at most k·n_salts rows. Both
windows therefore have bounded partition size regardless of skew.

The result is IDENTICAL to `row_number() OVER (PARTITION BY group ORDER
BY order)` filtered to ≤ k — verified by the engine parity tests, which
run the full crawl through this path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def spread_small_input(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition when the scan produced fewer partitions
    than the session's parallelism.

    CPU-heavy per-row pipelines (shingling, MinHash signatures, media
    decode) sit UPSTREAM of their first exchange, so they inherit the
    scan's parallelism — and a small parquet file is one split, i.e. one
    core doing all the work. This helper is a no-op whenever the input
    already has ≥ min_partitions splits (at corpus scale a scan has
    thousands), so it never coalesces and never adds a shuffle to a big
    input; for the small-file case it trades one cheap shuffle of the raw
    rows for full-cluster parallelism on the expensive projection.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def salted_topk_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_cols: list[Column | str],
    k: int,
    n_salts: int = 16,
    salt_on: str | None = None,
    rank_col: str = "_rank",
) -> tuple[DataFrame, DataFrame]:
    """(topk, overflow): `topk` carries `rank_col` = the exact global
    rank within its group (1-based, ≤ k); `overflow` is every other row
    (no rank — by construction it ranks > k).

    `salt_on`: column whose hash spreads rows across salts (must be
    ~unique per row; defaults to the first order column). The salt is
    derived, deterministic, and never leaves this function.
    """
    salt_src = salt_on or (order_cols[0] if isinstance(order_cols[0], str) else None)
    if salt_src is None:
        raise ValueError("salt_on required when order_cols[0] is an expression")
    salted = df.withColumn("_salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(n_salts)))

    w1 = Window.partitionBy(*group_cols, "_salt").orderBy(*order_cols)
    phase1 = salted.withColumn("_r1", F.row_number().over(w1))
    survivors = phase1.filter(F.col("_r1") <= k)
    overflow1 = phase1.filter(F.col("_r1") > k).drop("_salt", "_r1")

    w2 = Window.partitionBy(*group_cols).orderBy(*order_cols)
    phase2 = survivors.withColumn(rank_col, F.row_number().over(w2)).drop("_salt", "_r1")
    topk = phase2.filter(F.col(rank_col) <= k)
    overflow2 = phase2.filter(F.col(rank_col) > k).drop(rank_col)
    return topk, overflow1.unionByName(overflow2)


def grouped_topk_threshold(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    n_buckets: int = 4096,
    bucket_expr: Column | None = None,
) -> DataFrame:
    """Exact per-group top-k (smallest `key_col`, unique keys) WITHOUT
    shuffling the data rows — the 10^10-scale budget gate.

    A window/sort implementation shuffles and sorts ALL N rows to keep
    k·|groups| of them; at scale that shuffle is the job. Instead:

    1. histogram pass — `groupBy(group, bucket(key)).count()`: map-side
       combined, shuffles only |groups|·n_buckets tiny count rows;
    2. per group, a running sum over its (tiny) histogram finds the
       bucket containing the k-th smallest key and the number of rows
       `below` it (exact — histograms are exact counts);
    3. decision pass — rows in buckets below the threshold pass outright;
       rows in the single boundary bucket (≈ group_count/n_buckets rows)
       are exactly ranked with a window and topped up to k.

    Two O(N) scans with only map-side aggregation + a window over the
    small boundary slice. Result = exactly the per-group top-k set
    (membership; ranks are not attached — callers that need global order
    re-rank the selected minority).
    """
    if bucket_expr is not None:
        # caller-supplied monotone bucketing — REQUIRED when the key is
        # piecewise-clustered (e.g. category bits in the high word): an
        # equi-width histogram would drop every cluster into one bucket
        # and the boundary slice degenerates to the whole cluster. The
        # expression must be non-decreasing in key_col with values in
        # [0, n_buckets).
        bucket = bucket_expr
    else:
        stats = df.agg(F.min(key_col).alias("lo"), F.max(key_col).alias("hi")).collect()[0]
        lo, hi = stats["lo"], stats["hi"]
        if lo is None or hi is None:
            return df  # empty input
        span = max(int(hi) - int(lo) + 1, 1)
        bucket = ((F.col(key_col) - F.lit(int(lo))).cast("double") / F.lit(span) * n_buckets).cast("int")
        bucket = F.least(bucket, F.lit(n_buckets - 1))

    hist = df.groupBy(F.col(group_col), bucket.alias("_b")).agg(F.count("*").alias("_c"))
    w_cum = (
        Window.partitionBy(group_col).orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = hist.withColumn("_below", F.coalesce(F.sum("_c").over(w_cum), F.lit(0)))
    # threshold bucket: first bucket where below + count ≥ k
    thresh = (
        marked.filter(F.col("_below") + F.col("_c") >= k)
        .groupBy(group_col)
        .agg(F.min("_b").alias("_tb"))
    )
    # groups with < k rows entirely: no threshold bucket → keep everything
    info = (
        hist.groupBy(group_col).agg(F.sum("_c").alias("_total"))
        .join(thresh, group_col, "left")
        .join(marked.select(group_col, F.col("_b").alias("_tb"), F.col("_below").alias("_tb_below")),
              [group_col, "_tb"], "left")
    )
    binfo = F.broadcast(info)  # |groups| rows

    tagged = df.withColumn("_b", bucket).join(binfo, group_col, "left")
    below = tagged.filter(F.col("_tb").isNull() | (F.col("_b") < F.col("_tb")))
    boundary = tagged.filter(F.col("_b") == F.col("_tb"))
    w_bound = Window.partitionBy(group_col).orderBy(key_col)
    bound_take = (
        boundary.withColumn("_r", F.row_number().over(w_bound))
        .filter(F.col("_r") + F.col("_tb_below") <= k)
        .drop("_r")
    )
    drop_cols = ["_b", "_tb", "_total", "_tb_below"]
    return below.unionByName(bound_take).drop(*drop_cols)


def sampled_topk_per_group(
    df: DataFrame,
    group_col: str,
    key_col: str,
    k: int,
    sample_mod: int = 64,
    margin: float = 1.4,
) -> DataFrame:
    """Exact per-group top-k (smallest unique `key_col`) via sampled
    thresholds — the cheapest scale shape of the three top-k operators.

    Where the histogram variant's `groupBy(group, bucket)` explodes into
    |groups|·n_buckets aggregation groups (Spark falls back to sort-based
    aggregation and quietly sorts everything), this one never creates
    more than |groups| aggregation groups:

    1. per-group totals (`groupBy(group).count()` — tiny);
       groups with ≤ k rows pass whole, untouched;
    2. a deterministic 1/sample_mod hash-sample of the big groups gets an
       exact in-sample rank (window over the small sample); the
       per-group threshold is the sample key at rank
       `margin · k · m_g / n_g` — an over-estimate of the true k-th key
       with high probability (TeraSort-style range estimation);
    3. big-group rows under their threshold (≈ margin·k per group) are
       exactly ranked and cut at k. A verify count catches sample
       undershoot and falls back to an exact window for the (rare)
       affected groups — exactness never rests on the sample.

    Three O(N) scans (agg / filter / filter), windows only over
    sample-sized and margin·k-sized slices. Deterministic: the sample is
    a hash of the key, not rand().
    """
    # ONE aggregation pass produces both the totals and the per-group
    # sorted key sample (map-side combinable); the threshold is then a
    # pure array projection on the tiny per-group result — a single
    # broadcast barrier instead of three (totals, sample-rank, threshold).
    sampled_key = F.when(
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(sample_mod)) == 0, F.col(key_col)
    )
    info = df.groupBy(group_col).agg(
        F.count("*").alias("_n"),
        F.sort_array(F.collect_list(sampled_key)).alias("_samp"),
    )
    target = F.least(
        F.greatest(F.ceil(F.lit(margin) * k * F.size("_samp") / F.col("_n")), F.lit(1)),
        F.size("_samp"),
    )
    info = info.withColumn(
        "_thresh", F.when(F.size("_samp") > 0, F.try_element_at("_samp", target.cast("int")))
    ).drop("_samp")
    # ONE broadcast subtree serves the small-group anti-join AND the
    # candidate join (identical plan → ReusedExchange; the old shape
    # broadcast two different projections of `big`, evaluating the full
    # aggregation twice — a measured extra barrier per epoch)
    big = F.broadcast(info.filter(F.col("_n") > k))
    small_rows = df.join(big, group_col, "left_anti")

    cand = df.join(big, group_col).filter(
        F.col("_thresh").isNull() | (F.col(key_col) <= F.col("_thresh"))
    )
    w_exact = Window.partitionBy(group_col).orderBy(key_col)
    # undershoot detection as a WINDOW over the already-ranked candidates
    # (≤ margin·k rows per group) instead of an agg+join: a group came up
    # short iff its max rank < k — every cand row is from `big` (_n > k),
    # so max_r < k already implies the group has more rows than the
    # sample threshold admitted.
    cand_ranked = cand.withColumn("_r", F.row_number().over(w_exact)).withColumn(
        "_short", F.max("_r").over(Window.partitionBy(group_col)) < k
    )
    helpers = ["_n", "_thresh", "_r", "_short"]
    topk_big = cand_ranked.filter((F.col("_r") <= k) & ~F.col("_short")).drop(*helpers)
    # verify/redo path stays IN the plan (no eager count — a driver-side
    # branch would execute the whole selection DAG once extra): when no
    # group undershot, `short` is empty and the redo window is a no-op
    # over an empty broadcast. Exactness never rests on the sample.
    short = cand_ranked.filter(F.col("_short")).select(group_col).distinct()
    redo = (
        df.join(F.broadcast(short), group_col)
        .withColumn("_r", F.row_number().over(w_exact))
        .filter(F.col("_r") <= k)
        .drop("_r")
    )
    return small_rows.unionByName(topk_big).unionByName(redo)


def global_topk_by_key(
    df: DataFrame,
    key_col: str,
    k: int,
    rank_col: str = "pop_index",
    rel_err: float = 0.001,
) -> DataFrame:
    """Exact global top-k by a UNIQUE ascending long key, at any scale.

    Salting cannot help when k itself is large (per-salt top-k prunes
    nothing once k ≥ rows/salt, and the merge sort of k·n_salts rows
    serializes). Instead: selection by threshold —

    1. one O(N) pass counts N (map-side partial agg);
    2. `approxQuantile` (Greenwald-Khanna, one O(N) pass, merged
       sketches) finds a cutoff t with a slack factor so that
       |{key ≤ t}| ≥ k with overwhelming probability; a verify count
       retries with more slack on undershoot (exactness never depends
       on the sketch — only the candidate-set size does);
    3. the ≤ k·(1+slack) survivors get an exact row_number in ONE
       bounded partition (bounded by the slack, not by N).

    Wall-clock = 2–3 parallel scans + one ~k-row sort. Deterministic
    because the key is unique — the returned set and ranks are exactly
    the global top-k regardless of which cutoff the sketch produced.
    """
    # 2-3 passes over the same input (count/sketch/filter). localCheckpoint,
    # not persist: the returned plan still references the materialized
    # input, so an in-function unpersist is impossible and a persist
    # would leak one CacheManager entry per call; checkpoint blocks are
    # ContextCleaner-freed once the result is garbage-collected.
    df = df.localCheckpoint(eager=False)
    n = df.count()
    if n <= k:
        w = Window.orderBy(key_col)
        return df.withColumn(rank_col, F.row_number().over(w))
    slack = 1.15
    for _ in range(3):
        q = min(1.0, k / n * slack + rel_err)
        cutoff = df.stat.approxQuantile(key_col, [q], rel_err)[0]
        cand = df.filter(F.col(key_col) <= cutoff)
        if q >= 1.0 or cand.count() >= k:
            break
        slack *= 1.5
    else:
        cand = df  # sketch kept undershooting — exactness over speed
    w = Window.orderBy(key_col)
    return cand.withColumn(rank_col, F.row_number().over(w)).filter(F.col(rank_col) <= k)


def dense_global_seq(
    df: DataFrame,
    order_cols: list[Column | str],
    seq_col: str,
    start: int = 0,
) -> DataFrame:
    """Assign a dense 0..n-1 sequence (+`start`) in the global order of
    `order_cols` WITHOUT a single-partition window — the scalable form of
    `row_number().over(Window.orderBy(...))` for frontier enqueue seq
    assignment (queue tail order must match the reference's sequential
    push order exactly; `order_cols` must be a per-row total order, which
    the attenuation dedup guarantees upstream).

    Plan: range-repartition on the key (range partitioner assigns
    CONTIGUOUS key ranges to increasing partition ids), rank within each
    partition (bounded ~n/P rows per sort), count rows per partition
    (map-side-combined aggregate, P rows), turn counts into exclusive
    prefix offsets with a window over those P rows (trivially small),
    broadcast-join the offsets back. No driver action of its own — the
    range-partitioned batch materializes lazily (localCheckpoint, see
    below) at the caller's first action, so rank and offsets are
    guaranteed to read ONE partitioning.

    Scale: largest sort is one partition's slice; the only global
    structure is the P-row offset table. At 10^8-row enqueue batches with
    P=1024 that is ~10^5-row per-partition sorts plus a 1 KB broadcast —
    vs the old single-task 10^8-row sort.
    """
    okey = [F.col(c) if isinstance(c, str) else c for c in order_cols]
    # MATERIALIZED once (non-eager localCheckpoint): `part` feeds both the
    # local-rank and the offset-count subtrees, which column pruning makes
    # NON-identical — ReuseExchange cannot fire, so without this boundary
    # each subtree would run its own range shuffle with its own
    # RangePartitioner SAMPLING (seeded per RDD id). On inputs large
    # enough that the sampler no longer reads every row, the two
    # samplings can pick different partition boundaries, and offsets
    # would credit pid N with counts from a different row set than the
    # one local ranked there — duplicate/missing seq values. Tiny inputs
    # (exhaustively sampled) mask it; the checkpoint pins ONE
    # partitioning for both consumers at any scale.
    part = (
        df.repartitionByRange(*okey)
        .withColumn("_dgs_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    local = part.withColumn(
        "_dgs_rank",
        F.row_number().over(Window.partitionBy("_dgs_pid").orderBy(*okey)),
    )
    offsets = (
        part.groupBy("_dgs_pid")
        .agg(F.count(F.lit(1)).alias("_dgs_cnt"))
        .withColumn(
            "_dgs_off",
            F.coalesce(
                F.sum("_dgs_cnt").over(
                    Window.orderBy("_dgs_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_dgs_pid", "_dgs_off")
    )
    return (
        local.join(F.broadcast(offsets), "_dgs_pid")
        .withColumn(
            seq_col,
            (F.col("_dgs_off") + F.col("_dgs_rank") - 1 + F.lit(start)).cast("long"),
        )
        .drop("_dgs_pid", "_dgs_rank", "_dgs_off")
    )
