"""P16-P19 file-tree ops, maven parent-POM merge (F6), top.js paging
(P21) and ScopedQueueSets.publish (S5) unit tests.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from crawler_spark.data.top_seeds import page_window, top_seed_requests
from crawler_spark.functions.providers import maven_merged_poms
from crawler_spark.operators.files import (
    file_hashes,
    file_summary,
    interesting_attachments,
    is_interestingly_named,
    licensee_merge,
)
from crawler_spark.operators.ops import publish_local
from crawler_spark.storage.snapshots import SnapshotStore


# -- interesting-name rules (abstractClearlyDefinedProcessor.js:56-79) -------

NAME_CASES = [
    ("LICENSE", True),
    ("license", True),               # uppercased before matching
    ("src/deep/LICENSE", True),      # basename matters, not depth
    ("LICENSE.md", True),
    ("NOTICE.TXT", True),
    ("NOTICES.html", True),
    ("COPYING", True),
    ("PATENTS", True),
    ("LICENSE-MIT", True),
    ("LICENSE-APACHE", True),
    ("LICENSE-APACHE-2.0", False),   # extension '.0' not allow-listed
    ("LICENSE.rst", False),          # extension not allow-listed
    ("README.md", False),            # base not a pattern
    ("UNLICENSE", True),
    ("CONTRIBUTORS", True),
    ("LICENSES", False),
    ("some/path/notice", True),
]


def test_is_interestingly_named(spark):
    df = spark.createDataFrame([(p,) for p, _ in NAME_CASES], "path string")
    got = {
        r["path"]: r["m"]
        for r in df.select("path", is_interestingly_named(F.col("path")).alias("m")).collect()
    }
    for path, want in NAME_CASES:
        assert got[path] == want, path


def test_file_summary_and_hashes(spark):
    files = spark.createDataFrame(
        [
            ("d1", "a.py", "x" * 1000),
            ("d1", "sub/b.py", "y" * 600),
            ("d1", ".git/config", "z" * 10_000),   # excluded
            ("d1", "v/.git/HEAD", "z"),            # excluded
            ("d2", "LICENSE", "mit text"),
        ],
        "doc_id string, path string, content string",
    )
    summ = {r["doc_id"]: (r["count"], r["k"]) for r in file_summary(files).collect()}
    assert summ["d1"] == (2, round(1600 / 1024))
    assert summ["d2"] == (1, 0)
    h = {(r["doc_id"], r["path"]): (r["sha1"], r["sha256"]) for r in file_hashes(files).collect()}
    assert h[("d2", "LICENSE")] == (
        hashlib.sha1(b"mit text").hexdigest(), hashlib.sha256(b"mit text").hexdigest()
    )
    att = {(r["doc_id"], r["path"]): r["token"] for r in interesting_attachments(files).collect()}
    assert att == {("d2", "LICENSE"): hashlib.sha256(b"mit text").hexdigest()}


def test_licensee_merge_first_wins(spark):
    rows = [
        ("d1", 0, "MIT", "LICENSE"),
        ("d1", 1, "MIT", "sub/LICENSE"),      # dup spdx → dropped
        ("d1", 1, "Apache-2.0", "sub/LIC2"),
        ("d2", 2, "GPL-2.0", "x"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, folder_idx int, spdx_id string, matched_path string")
    got = {(r["doc_id"], r["spdx_id"]): r["matched_path"] for r in licensee_merge(df).collect()}
    assert got == {
        ("d1", "MIT"): "LICENSE",
        ("d1", "Apache-2.0"): "sub/LIC2",
        ("d2", "GPL-2.0"): "x",
    }


# -- maven parent-POM chain (mavenBasedFetch.js:124-173) ----------------------


def test_maven_three_level_chain(spark):
    poms = spark.createDataFrame(
        [
            # (group, artifact, version, pgroup, partifact, pversion, license, url, desc)
            ("g", "root", "1", None, None, None, "Apache-2.0", "http://root", "root pom"),
            ("g", "mid", "2", "g", "root", "1", None, "http://mid", None),
            ("g", "leaf", "3", "g", "mid", "2", None, None, "leaf desc"),
            ("g", "orphan", "9", "g", "ghost", "0", None, None, None),  # dangling parent
        ],
        "group_id string, artifact_id string, version string, parent_group string, "
        "parent_artifact string, parent_version string, license string, url string, description string",
    )
    got = {
        r["artifact_id"]: (r["license"], r["url"], r["description"])
        for r in maven_merged_poms(poms, ["license", "url", "description"]).collect()
    }
    # nearest descendant wins; missing fields walk up the chain
    assert got["root"] == ("Apache-2.0", "http://root", "root pom")
    assert got["mid"] == ("Apache-2.0", "http://mid", "root pom")
    assert got["leaf"] == ("Apache-2.0", "http://mid", "leaf desc")
    assert got["orphan"] == (None, None, None)


# -- top.js paging (top.js:87-114, 155-181, 332-355) --------------------------


def test_page_windows():
    assert page_window("npm", 50, 130) == (36, 144)     # aligned down, last page whole
    assert page_window("npm", 0, 1000) == (0, 1008)     # 28 pages of 36
    assert page_window("npm", 0, 0) == (0, 1008)        # end defaults to start+1000
    assert page_window("npm", -5, 10) == (0, 36)        # start clamped
    assert page_window("crates", 150, 420) == (150, 450)
    assert page_window("nuget", 10, 75) == (10, 90)


def test_top_seed_requests(spark):
    ranked = spark.range(200).select(
        F.col("id").alias("rank"),
        F.concat(F.lit("p"), F.col("id").cast("string")).alias("name"),
        F.lit("1.0.0").alias("version"),
    )
    rows = top_seed_requests(ranked, "npm", 50, 130).collect()
    ranks = sorted(r["rank"] for r in rows)
    assert ranks == list(range(36, 144))
    offs = {r["rank"]: r["page_offset"] for r in rows}
    assert offs[36] == 36 and offs[71] == 36 and offs[72] == 72 and offs[143] == 108
    assert all(r["url"] == f"cd:/npm/npmjs/-/p{r['rank']}/1.0.0" for r in rows)
    nuget = top_seed_requests(ranked, "nuget", 0, 25).collect()
    assert all(r["url"] == f"cd:/nuget/nuget/-/p{r['rank']}" for r in nuget)  # versionless
    assert sorted(r["rank"] for r in nuget) == list(range(0, 40))


# -- ScopedQueueSets.publish (scopedQueueSets.js:82-104) ----------------------


def test_publish_local(spark, tmp_path):
    store = SnapshotStore(spark, str(tmp_path))
    rows = [
        # url,type,spec,prov,ns,name,rev,host,queue,scope,policy,att,nb,pe,seq,hash
        ("u1", "licensee", "npm", "npmjs", None, "n1", "1", "h", "normal", "local", "default:x", 0, 0, 0, 10, 1),
        ("u2", "scancode", "npm", "npmjs", None, "n2", "1", "h", "immediate", "local", "default:x", 2, 5, 0, 11, 2),
        ("u3", "npm", "npm", "npmjs", None, "n3", "1", "h", "soon", "global", "default", 0, 0, 0, 12, 3),
        ("u4", "reuse", "npm", "npmjs", None, "n4", "1", "h", "normal", "local", "default:x", 0, 0, 0, 9, 4),
    ]
    schema = (
        "url string, type string, spec_type string, provider string, namespace string, "
        "name string, revision string, host string, queue string, scope string, policy string, "
        "attempt_count int, not_before_epoch int, parent_epoch int, enqueued_seq long, url_hash long"
    )
    store.commit(epoch=0, replace={"frontier": spark.createDataFrame(rows, schema)},
                 meta={"next_seq": 13})
    n = publish_local(store, epoch=1)
    assert n == 3
    out = {r["url"]: r for r in store.read("frontier").collect()}
    assert all(r["scope"] == "global" for r in out.values())
    # queue-set order (immediate first), then local FIFO; global rows untouched
    assert out["u2"]["enqueued_seq"] == 13  # immediate
    assert out["u4"]["enqueued_seq"] == 14  # normal, seq 9
    assert out["u1"]["enqueued_seq"] == 15  # normal, seq 10
    assert out["u3"]["enqueued_seq"] == 12
    # requeuable preserves attempt + backoff gate (request.createRequeuable)
    assert out["u2"]["attempt_count"] == 2 and out["u2"]["not_before_epoch"] == 5
    assert int(store.snapshot().meta["next_seq"]) == 16


# -- slice-based top providers (top.js:195-245, 286-318, 365-390, 404-452) ----


def test_maven_csv_start_zero_is_falsy(spark):
    """top.js:289-290: `rawStart && rawStart >= 0` — 0 is falsy, so
    start=0 and start=None both slice from line 1 (header skip only)."""
    from crawler_spark.data.top_seeds import maven_csv_top_requests

    lines = spark.createDataFrame(
        [(i, 'rank,"groupId","artifactId"' if i == 0 else f'{i},"g{i}","a{i}"')
         for i in range(12)],
        "line_idx int, raw_line string",
    )
    for start in (0, None, -2):
        got = maven_csv_top_requests(lines, "mavencentral", start, 5).collect()
        assert sorted(r["rank"] for r in got) == [0, 1, 2, 3, 4]
    # truthy start shifts by one for the header; end falsy → whole file
    got = maven_csv_top_requests(lines, "mavengoogle", 3, None).collect()
    assert sorted(r["rank"] for r in got) == list(range(3, 11))
    assert all(r["url"] == f"cd:/maven/mavengoogle/g{r['rank']+1}/a{r['rank']+1}" for r in got)


def test_debian_default_span_and_incomplete_blocks(spark):
    """Debian top defaults end=start+100 (not 1000); blocks missing any
    of Architecture/Binary/Binary-Version never emit a coordinate."""
    from crawler_spark.data.top_seeds import (
        debian_package_map_entries, debian_top_requests,
    )

    kv = []
    for b in range(150):
        kv.append((b, "Architecture", "amd64"))
        kv.append((b, "Binary", f"b{b}"))
        if b % 5 != 2:  # every 5th block lacks the version → skipped
            kv.append((b, "Binary-Version", f"1.{b}"))
    entries = debian_package_map_entries(
        spark.createDataFrame(kv, "block_idx int, key string, value string")
    )
    # emitted ranks are dense over the COMPLETE blocks only
    got = debian_top_requests(entries, None, None).collect()
    assert sorted(r["rank"] for r in got) == list(range(0, 100))  # default span 100
    by_rank = {r["rank"]: r["url"] for r in got}
    assert by_rank[0] == "cd:/deb/debian/-/b0/1.0_amd64"
    assert by_rank[2] == "cd:/deb/debian/-/b3/1.3_amd64"  # block 2 skipped


def test_conda_slice_and_github_latest_commit(spark):
    from crawler_spark.data.top_seeds import (
        conda_top_requests, github_org_repo_requests,
    )

    listed = spark.createDataFrame(
        [(r, "linux-64" if r < 5 else "noarch", f"n{r}", "1.0", "b0") for r in range(20)],
        "rank int, subdir string, name string, version string, build string",
    )
    got = conda_top_requests(listed, "conda-forge", 3, 7, mode="conda").collect()
    assert sorted(r["rank"] for r in got) == [3, 4, 5, 6]
    assert {r["rtype"] for r in got} == {"package"}
    assert any(r["url"] == "cd:/conda/conda-forge/linux-64/n4/1.0-b0/" for r in got)
    assert any(r["url"] == "cd:/conda/conda-forge/noarch/n6/1.0-b0/" for r in got)

    repos = spark.createDataFrame(
        [("o", "r1"), ("o", "r2"), ("o", "r-empty")], "org string, repo string"
    )
    commits = spark.createDataFrame(
        [("o", "r1", 0, "sha-r1-new"), ("o", "r1", 1, "sha-r1-old"),
         ("o", "r2", 0, "sha-r2")],
        "org string, repo string, commit_idx int, sha string",
    )
    got = {r["repo"]: r for r in github_org_repo_requests(repos, commits).collect()}
    assert set(got) == {"r1", "r2"}  # commit-less repo dropped
    assert got["r1"]["url"] == "cd:/git/github/o/r1/sha-r1-new"
    assert all(r["rtype"] == "source" for r in got.values())


def test_npm_top_seed_scoped_package_namespace(spark):
    """top.js:103-106: a scoped npm name splits into namespace/name in
    the request url; unscoped names keep namespace '-'; crates treats a
    '/' name as opaque."""
    from crawler_spark.data.top_seeds import top_seed_requests

    ranked = spark.createDataFrame(
        [(0, "@babel/core", "7.0.0"), (1, "lodash", "4.17.21")],
        "rank long, name string, version string",
    )
    got = {r["rank"]: r["url"] for r in top_seed_requests(ranked, "npm", 0, 2).collect()}
    assert got[0] == "cd:/npm/npmjs/@babel/core/7.0.0"
    assert got[1] == "cd:/npm/npmjs/-/lodash/4.17.21"
    crates = {r["rank"]: r["url"] for r in top_seed_requests(ranked, "crates", 0, 2).collect()}
    assert crates[0] == "cd:/crate/cratesio/-/@babel/core/7.0.0"
