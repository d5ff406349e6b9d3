"""Round-5 profiling: where does full_epoch_from_table's wall time go?
Times each prefix of the epoch DAG separately (noop writes, warm),
plus the raw operator pieces, at the bench config.
Usage: python scripts/profile_epoch.py [n] [cpus]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from crawler_spark.session import get_spark


def t(label, df, spark):
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    sec = time.time() - t0
    print(f"{label:40s} {sec:7.3f}s")
    spark.catalog.clearCache()
    return sec


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    spark = get_spark("prof", parallelism=cpus, shuffle_partitions=cpus,
                      extra_conf={"spark.local.dir": "/dev/shm/spark-bench"})
    from bench import BATCH_BUDGET, HOST_BUDGET, full_epoch_from_table, materialize_frontier
    from crawler_spark.data.generators import frontier_full_from_core
    from crawler_spark.functions.coordinates import to_urn, with_parsed_coordinates_fast
    from crawler_spark.operators.skew import grouped_topk_threshold, sampled_topk_per_group

    table = f"/dev/shm/frontier_bench_{n}"
    if not os.path.exists(os.path.join(table, "_SUCCESS")):
        materialize_frontier(spark, n, table)

    # warm full epoch (codegen/JIT)
    t("warm full_epoch", full_epoch_from_table(spark, table, batch=BATCH_BUDGET, seq_bound=n), spark)

    slim = spark.read.parquet(table).select(
        "enqueued_seq", "host_id", "queue_code", "scope_code", "rev_minor",
        "attempt_count", "not_before_epoch", "parent_epoch",
    )
    eligible = slim.filter((F.col("not_before_epoch") <= 0) & (F.col("parent_epoch") < 0))
    kdf = eligible.withColumn(
        "_key", F.shiftleft(F.col("scope_code").cast("long"), 51) + F.col("enqueued_seq")
    )
    t("scan+filter only", kdf, spark)

    offered = sampled_topk_per_group(kdf, "host_id", "_key", max(HOST_BUDGET, BATCH_BUDGET // 500))
    t("sampled_topk (offered)", offered, spark)

    offered_p = sampled_topk_per_group(kdf, "host_id", "_key", max(HOST_BUDGET, BATCH_BUDGET // 500)).persist()
    pop_key = (
        F.shiftleft(F.col("scope_code").cast("long"), 50)
        + F.shiftleft(F.col("queue_code").cast("long"), 46)
        + F.col("enqueued_seq")
    )
    pop_bucket = (
        (F.col("scope_code") * 4 + F.col("queue_code")) * 512
        + F.least((F.col("enqueued_seq") * 512 / F.lit(n)).cast("int"), F.lit(511))
    ).cast("int")
    winners = grouped_topk_threshold(
        offered_p.withColumn("_pop_key", pop_key).withColumn("_one", F.lit(1)),
        "_one", "_pop_key", BATCH_BUDGET, n_buckets=8 * 512, bucket_expr=pop_bucket,
    )
    t("... + batch cut (winners)", winners, spark)

    full = frontier_full_from_core(winners.select(
        "enqueued_seq", "host_id", "queue_code", "scope_code", "rev_minor",
        "attempt_count", "not_before_epoch", "parent_epoch",
    ))
    # dedup BEFORE parse/hash — the exact r5 full_epoch_from_table DAG
    # order (bench.py), so these prefix timings decompose the same plan
    # the "full_epoch (timed)" rows below execute
    deduped = full.select(
        "url", F.col("url_hash").alias("uh"), F.col("enqueued_seq").alias("_seq")
    ).dropDuplicates(["uh"])
    parsed = with_parsed_coordinates_fast(deduped)
    content = F.repeat(F.concat(F.col("canonical_url"), F.lit("|artifact-bytes|")), 24)
    processed = parsed.select(
        F.col("_seq").alias("pop_key"),
        F.col("uh").alias("url_hash"),
        to_urn(F.col("type"), F.col("provider"), F.col("namespace"),
               F.col("name"), F.col("revision")).alias("urn"),
        F.sha1(content).alias("sha1_hex"),
        F.sha2(content, 256).alias("sha256_hex"),
        F.xxhash64(F.concat(F.col("type"), F.lit("@"), F.col("canonical_url"))).alias("seen_hash"),
    )
    t("... + dedup/process/hash (full)", processed, spark)
    offered_p.unpersist()

    t("full_epoch (timed)", full_epoch_from_table(spark, table, batch=BATCH_BUDGET, seq_bound=n), spark)
    t("full_epoch (timed 2)", full_epoch_from_table(spark, table, batch=BATCH_BUDGET, seq_bound=n), spark)
    spark.stop()


if __name__ == "__main__":
    main()
