"""Top-package seed expansion paging (P21) — providers/process/top.js.

The reference turns a {start, end} window into page fetches whose
offset arithmetic differs per registry, then queues every package on
every fetched page — which can queue MORE than [start, end): the last
page always queues whole, and npm additionally aligns the FIRST offset
down to a multiple of 36. These slice/paging quirks are the
parity-relevant behavior:

* npm    — 36/page, initialOffset = floor(start/36)*36, offsets stepping
           36 while < end (top.js:87-114)
* crates — 100/page, page = offset/100 + 1, offsets from start stepping
           100 while < end (top.js:155-181)
* nuget  — 20/page, offsets from start stepping 20 while < end
           (top.js:332-355); requests are versionLESS (component
           resolution happens later)

Expressed as a pure filter + projection over a 0-based `rank` column of
a ranked package table (rank = the registry's popularity ordering the
pages enumerate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGE_SIZES = {"npm": 36, "crates": 100, "nuget": 20}
ALIGN_INITIAL = {"npm": True, "crates": False, "nuget": False}


def page_window(kind: str, start: int, end: int) -> tuple[int, int]:
    """[first_rank, end_rank) actually queued for a {start, end} request —
    the reference's loop `for offset = initial; offset < end; offset += ps`
    queues each page whole."""
    if not start or start < 0:
        start = 0
    if not end or end - start <= 0:
        end = start + 1000
    ps = PAGE_SIZES[kind]
    initial = (start // ps) * ps if ALIGN_INITIAL[kind] else start
    n_pages = 0
    off = initial
    while off < end:
        n_pages += 1
        off += ps
    return initial, initial + n_pages * ps


def top_seed_requests(
    ranked: DataFrame, kind: str, start: int, end: int,
    rank_col: str = "rank", name_col: str = "name", version_col: str = "version",
) -> DataFrame:
    """The queued request set for one top-{kind} crawl request: every
    package whose rank falls on a fetched page, with its page offset and
    the request URL the reference builds (npm/crates carry the version,
    nuget does not — top.js:108,176,349)."""
    lo, hi = page_window(kind, start, end)
    ps = PAGE_SIZES[kind]
    rank = F.col(rank_col)
    provider = {"npm": "npm/npmjs", "crates": "crate/cratesio", "nuget": "nuget/nuget"}[kind]
    if kind == "nuget":
        url = F.concat(F.lit(f"cd:/{provider}/-/"), F.col(name_col))
    else:
        url = F.concat(
            F.lit(f"cd:/{provider}/-/"), F.col(name_col), F.lit("/"), F.col(version_col)
        )
    return ranked.filter((rank >= lo) & (rank < hi)).select(
        rank.alias("rank"),
        (F.lit(lo) + F.floor((rank - lo) / ps) * ps).cast("long").alias("page_offset"),
        F.lit(kind).alias("kind"),
        url.alias("url"),
    )
