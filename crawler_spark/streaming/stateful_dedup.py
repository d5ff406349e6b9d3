"""Custom stateful streaming operator: exactly-first-seen dedup of the
harvest delta stream via `applyInPandasWithState`.

Downstream consumers of the harvest stream (indexers, notification
fan-out — the reference's webhook/azqueue subscribers) want each doc_id
ONCE even though re-crawls (reprocess policies, storage-first re-serves)
re-emit it. A stateless `dropDuplicates` on a stream needs unbounded
state held by Spark; this operator instead keeps a compact cuckoo-filter
digest per hash-partition group as EXPLICIT state (GroupState), giving:

* bounded, serializable state (the filter bytes, not the key set);
* vectorized per-batch work (numpy over Arrow batches — no per-row
  Python beyond the cuckoo kick loops);
* deletion support if a retraction stream is ever merged in.

Caveat (documented, inherent to a digest): cuckoo false positives
(~1e-3 at 16-bit fingerprints) can suppress a never-seen doc_id. For
the notification fan-out use case that tradeoff is standard; consumers
needing exactness join the `documents` table instead.

State schema: (n_buckets long, table binary). Groups are
`pmod(xxhash64(doc_id), n_partitions)` — the same partitioning as the
batch seen-set (operators/seenset.py), so digests are interchangeable.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from crawler_spark.operators.seenset import CuckooFilter, _h1_h2

STATE_SCHEMA = "n_buckets long, tbl binary"
OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("pid", T.IntegerType()),
        T.StructField("doc_id", T.StringType()),
        T.StructField("doc_type", T.StringType()),
        T.StructField("epoch", T.IntegerType()),
    ]
)
_CAPACITY = 1 << 16  # per-partition digest capacity (grow n_partitions at scale)


def _dedup_group(
    key: Any, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    if state.exists:
        n_buckets, tbl = state.get
        ck = CuckooFilter(
            int(n_buckets),
            np.frombuffer(tbl, dtype=np.uint16).reshape(-1, 4).copy(),
        )
    else:
        ck = CuckooFilter.for_capacity(_CAPACITY)
    for pdf in pdfs:
        if not len(pdf):
            continue
        keys = pdf["_key"].to_numpy(dtype=np.int64).view(np.uint64)
        fresh_mask = ~ck.contains_many(keys)
        # within-batch first occurrence only (stable order within batch)
        out_rows = []
        batch_new = set()
        for i in np.nonzero(fresh_mask)[0]:
            k = int(keys[i])
            if k in batch_new:
                continue
            batch_new.add(k)
            out_rows.append(i)
        if batch_new:
            ck.insert_many(np.array(sorted(batch_new), dtype=np.uint64))
        if out_rows:
            yield pdf.iloc[out_rows][["pid", "doc_id", "doc_type", "epoch"]]
    state.update((ck.n_buckets, ck.to_bytes()))


def first_seen_stream(events: DataFrame, n_partitions: int = 8) -> DataFrame:
    """events (streaming DF with doc_id/doc_type/epoch) → only each
    doc_id's first occurrence across ALL triggers, cuckoo state per
    hash-partition group."""
    keyed = events.select(
        F.pmod(F.xxhash64("doc_id"), F.lit(n_partitions)).cast("int").alias("pid"),
        "doc_id", "doc_type", "epoch",
        F.xxhash64("doc_id").alias("_key"),
    )
    return keyed.groupBy("pid").applyInPandasWithState(
        _dedup_group,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
