"""K2 large-document path: span-array chunking + reassembly.

The reference's blob store routes documents by serialized size
(ghcrawler/providers/storage/storageDocStore.js:46-58): ≤100 MB uploads
atomically in one call; larger documents stream in 8 MiB blocks. The
Spark-native analogue keeps a document's interleaved span array row-bounded:
a row whose spans exceed `max_bytes` is split into multiple chunk rows of
~`block_bytes` each (whole spans only — a block boundary rounds up to the
next span; a single span larger than a block gets its own chunk), while
small documents stay one atomic row. `reassemble_documents` inverts it
exactly.

Everything is JVM-side higher-order functions — the chunk assignment is a
narrow projection (no shuffle); reassembly is one uniform-keyed doc_id
shuffle. That is what keeps the path viable at 10^10 docs: oversized rows
never hit a single parquet row-group / shuffle block, and the split cost
is O(spans) per document.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ATOMIC_MAX_BYTES = 100 << 20  # storageDocStore.js:47 SIZE_THRESHOLD
STREAM_BLOCK_BYTES = 8 << 20  # storageDocStore.js:55 uploadStream(_, 8<<20, 5)


def span_bytes(s: Column) -> Column:
    """Deterministic per-span byte measure (reference measures
    `JSON.stringify(document).length`; this uses explicit field arithmetic
    so the DuckDB oracle can reproduce it without JSON-escaping drift):
    payload octets + 16 bytes of fixed framing (offset int + kind/ref
    delimiters)."""
    return (
        F.octet_length(s["kind"])
        + F.octet_length(F.coalesce(s["text"], F.lit("")))
        + F.octet_length(F.coalesce(s["media_ref"], F.lit("")))
        + F.lit(16)
    ).cast("long")


def chunk_document_spans(
    docs: DataFrame,
    max_bytes: int = ATOMIC_MAX_BYTES,
    block_bytes: int = STREAM_BLOCK_BYTES,
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame:
    """One row per (document, chunk): `(id, chunk_seq, n_chunks, spans)`.

    Documents whose total span bytes ≤ `max_bytes` take the atomic path —
    exactly one chunk. Larger documents are greedily packed: a span goes
    to chunk ``floor(bytes_before_it / block_bytes)`` and chunk ids are
    then renumbered densely, so `chunk_seq` is always 0..n_chunks-1 and
    ordered by span position. Spans keep their original relative order;
    other columns are dropped (chunk rows are a storage representation,
    not a query surface).
    """
    spans = F.col(spans_col)
    sizes = F.transform(spans, span_bytes)
    total = F.aggregate(sizes, F.lit(0).cast("long"), lambda a, x: a + x)
    # prefix_before[i] = sum(sizes[:i]) — sequential fold, O(spans)
    prefix_before = F.aggregate(
        sizes,
        F.struct(
            F.lit(0).cast("long").alias("acc"),
            F.array().cast("array<long>").alias("pre"),
        ),
        lambda a, x: F.struct(
            (a["acc"] + x).alias("acc"),
            F.concat(a["pre"], F.array(a["acc"])).alias("pre"),
        ),
        lambda a: a["pre"],
    )
    raw_ids = F.transform(prefix_before, lambda b: F.floor(b / F.lit(block_bytes)))
    # dense renumber (a span wider than a block skips raw ids)
    dense = F.array_distinct(raw_ids)
    pairs = F.zip_with(spans, raw_ids, lambda s, c: F.struct(c.alias("c"), s.alias("s")))
    packed = F.transform(
        dense,
        lambda d: F.transform(F.filter(pairs, lambda p: p["c"] == d), lambda p: p["s"]),
    )
    chunks = F.when(total <= F.lit(max_bytes), F.array(spans)).otherwise(packed)
    return (
        docs.withColumn("_chunks", chunks)
        .select(
            F.col(id_col),
            F.size("_chunks").alias("n_chunks"),
            F.posexplode("_chunks").alias("chunk_seq", spans_col),
        )
        .select(id_col, "chunk_seq", "n_chunks", spans_col)
    )


def reassemble_documents(
    chunks: DataFrame, id_col: str = "doc_id", spans_col: str = "spans"
) -> DataFrame:
    """Exact inverse of `chunk_document_spans`: `(id, spans)` with the
    original span order (collect_list order is nondeterministic, so the
    sort key is the explicit chunk_seq, never partition order)."""
    return chunks.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct(F.col("chunk_seq"), F.col(spans_col)))),
                lambda c: c[spans_col],
            )
        ).alias(spans_col)
    )


def chunk_spans_py(
    spans: list[dict], max_bytes: int = ATOMIC_MAX_BYTES, block_bytes: int = STREAM_BLOCK_BYTES
) -> list[list[dict]]:
    """Pure-Python mirror of `chunk_document_spans` for parity tests."""

    def nbytes(s: dict) -> int:
        return (
            len(s["kind"].encode())
            + len((s.get("text") or "").encode())
            + len((s.get("media_ref") or "").encode())
            + 16
        )

    sizes = [nbytes(s) for s in spans]
    if sum(sizes) <= max_bytes:
        return [list(spans)]
    out: dict[int, list[dict]] = {}
    acc = 0
    for s, z in zip(spans, sizes):
        out.setdefault(acc // block_bytes, []).append(s)
        acc += z
    return [out[k] for k in sorted(out)]
