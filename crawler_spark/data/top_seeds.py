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

from pyspark.sql import DataFrame, Window
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
    elif kind == "npm":
        # top.js:103-106: a scoped package name splits on '/' into
        # namespace/name (`@babel/core` → cd:/npm/npmjs/@babel/core/{v});
        # unscoped names take namespace '-'
        scoped = F.col(name_col).contains("/")
        ns = F.when(scoped, F.split_part(F.col(name_col), F.lit("/"), F.lit(1))).otherwise(F.lit("-"))
        nm = F.when(scoped, F.split_part(F.col(name_col), F.lit("/"), F.lit(2))).otherwise(F.col(name_col))
        url = F.concat(
            F.lit(f"cd:/{provider}/"), ns, F.lit("/"), nm, F.lit("/"), F.col(version_col)
        )
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


# ---------------------------------------------------------------------------
# slice-based top providers (top.js:195-245 conda, 286-318 maven CSV,
# 365-390 github org repos, 404-452 debian) — these don't page; they
# enumerate a full coordinate list and python-slice [start, end) out of it.
# The parity-relevant behavior is each provider's default/clamp arithmetic
# and its coordinate rendering.
# ---------------------------------------------------------------------------


def _clamp_start_end(start: int | None, end: int | None, default_span: int) -> tuple[int, int]:
    """top.js's shared guard: falsy/negative start → 0; end missing or
    ≤ start → start + default_span (1000 for conda, 100 for debian)."""
    if not start or start < 0:
        start = 0
    if not end or end - start <= 0:
        end = start + default_span
    return start, end


def conda_top_requests(
    listed: DataFrame, provider: str, start: int | None, end: int | None,
    mode: str = "conda",
) -> DataFrame:
    """_processTopConda (top.js:195-245). `listed` is the enumeration the
    reference walks — for mode='conda' the per-subdir repodata packages in
    subdir order (columns rank, subdir, name, version, build), for
    mode='condasrc' the channelData packages (columns rank, name,
    version). `rank` is the 0-based enumeration position; the reference's
    early subdir break is an IO optimization that cannot change the
    slice, so the queued set is exactly rank ∈ [start, end) after the
    shared clamp. Request type is 'package' for conda, 'source' for
    condasrc (top.js:241)."""
    start, end = _clamp_start_end(start, end, 1000)
    rank = F.col("rank")
    if mode == "conda":
        url = F.concat(
            F.lit(f"cd:/conda/{provider}/"), F.col("subdir"), F.lit("/"),
            F.col("name"), F.lit("/"), F.col("version"), F.lit("-"), F.col("build"),
            F.lit("/"),
        )
        rtype = "package"
    elif mode == "condasrc":
        url = F.concat(
            F.lit(f"cd:/condasrc/{provider}/-/"), F.col("name"), F.lit("/"),
            F.col("version"), F.lit("/"),
        )
        rtype = "source"
    else:
        raise ValueError(f"unknown conda top mode {mode!r}")
    return listed.filter((rank >= start) & (rank < end)).select(
        rank.alias("rank"), F.lit(mode).alias("kind"),
        F.lit(rtype).alias("rtype"), url.alias("url"),
    )


def maven_csv_top_requests(
    lines: DataFrame, target: str, start: int | None, end: int | None,
    n_lines: int | None = None,
) -> DataFrame:
    """_processTopMavenCentrals / _processTopMavenGoogle
    (top.js:286-318): the bundled mvn1.5k.csv sliced with JS-truthy
    arithmetic — start=0 is FALSY, so rawStart ∈ {None, 0, <0} all become
    line 1 (skipping only the header); otherwise start = rawStart+1.
    end = rawEnd+1 when truthy-positive, else the whole file. Lines parse
    as csv [rank, "groupId", "artifactId"] with the quotes stripped by
    position; requests are versionless package coordinates.

    `lines` columns: line_idx (0 = header), raw_line. `n_lines` defaults
    to a count() of the df (the reference uses fileLines.length)."""
    s = start + 1 if (start and start >= 0) else 1
    if end and end > 0:
        e = end + 1
    else:
        e = n_lines if n_lines is not None else lines.count()
    li = F.col("line_idx")
    group_id = F.regexp_replace(F.split(F.col("raw_line"), ",")[1], '^"|"$', "")
    artifact_id = F.regexp_replace(F.split(F.col("raw_line"), ",")[2], '^"|"$', "")
    return lines.filter((li >= s) & (li < e)).select(
        (li - 1).cast("long").alias("rank"),
        F.lit(f"maven-{target}").alias("kind"),
        F.lit("package").alias("rtype"),
        F.concat(
            F.lit(f"cd:/maven/{target}/"), group_id, F.lit("/"), artifact_id
        ).alias("url"),
    )


def debian_package_map_entries(kv: DataFrame) -> DataFrame:
    """The debian package-map fold (top.js:430-452): blank-line-separated
    'Key: value' blocks; a block emits a coordinate iff Architecture,
    Binary and Binary-Version are all present. `kv` columns: block_idx,
    key, value. Emitted coordinates keep enumeration order via a dense
    rank over block_idx (the package map is a bounded registry artifact —
    ~10^5 blocks — so the single ordering window is fine; it never sees
    corpus-scale data). The reference's entry-reset quirk (an incomplete
    block leaks its keys into the next) is not modeled: real package maps
    have complete blocks, and the synthetic fixtures keep them complete
    or wholly-missing a key."""
    pivoted = kv.groupBy("block_idx").agg(
        *[
            F.max(F.when(F.col("key") == k, F.col("value"))).alias(a)
            for k, a in [
                ("Architecture", "architecture"), ("Binary", "binary"),
                ("Binary-Version", "binary_version"),
            ]
        ]
    )
    complete = pivoted.filter(
        F.col("architecture").isNotNull()
        & F.col("binary").isNotNull()
        & F.col("binary_version").isNotNull()
    )
    w = Window.orderBy("block_idx")
    return complete.withColumn("rank", F.row_number().over(w) - 1)


def debian_top_requests(
    entries: DataFrame, start: int | None, end: int | None
) -> DataFrame:
    """_processTopDebians (top.js:404-429): shared clamp with a 100
    default span (not 1000), slice over the emitted coordinate list,
    request type 'package'. `entries` from debian_package_map_entries."""
    start, end = _clamp_start_end(start, end, 100)
    rank = F.col("rank")
    return entries.filter((rank >= start) & (rank < end)).select(
        rank.cast("long").alias("rank"),
        F.lit("debian").alias("kind"),
        F.lit("package").alias("rtype"),
        F.concat(
            F.lit("cd:/deb/debian/-/"), F.col("binary"), F.lit("/"),
            F.col("binary_version"), F.lit("_"), F.col("architecture"),
        ).alias("url"),
    )


def github_org_repo_requests(repos: DataFrame, commits: DataFrame) -> DataFrame:
    """_processAllGitHubOrgRepos (top.js:365-390): every repo of the org
    whose commit list is non-empty queues a 'source' request at the
    LATEST commit (commits[0] of the API listing — here min commit_idx).
    No slicing. `repos` columns: org, repo; `commits` columns: org, repo,
    commit_idx, sha. Inner join drops commit-less repos, exactly like the
    reference's `commits.length > 0` guard."""
    latest = commits.groupBy("org", "repo").agg(
        F.min_by("sha", F.col("commit_idx")).alias("sha")
    )
    return repos.join(latest, ["org", "repo"]).select(
        F.col("org"), F.col("repo"),
        F.lit("github").alias("kind"),
        F.lit("source").alias("rtype"),
        F.concat(
            F.lit("cd:/git/github/"), F.col("org"), F.lit("/"), F.col("repo"),
            F.lit("/"), F.col("sha"),
        ).alias("url"),
    )
