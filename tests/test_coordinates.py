"""Coordinate algebra tests — entitySpec semantics
(/root/reference/lib/entitySpec.js:10-75) across all three
implementations: JVM built-ins, Arrow/pandas UDF, pure-Python simulator.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.coordinates import (
    canonicalize_udf,
    with_parsed_coordinates,
)
from crawler_spark.simulator import canonicalize_py, coord_url, coord_urn

CASES = [
    # (url, type, provider, namespace, name, revision, tool, tool_version)
    ("cd:/npm/npmjs/-/redie/0.3.0", "npm", "npmjs", None, "redie", "0.3.0", None, None),
    ("cd:/NPM/NPMJS/-/redie/0.3.0", "npm", "npmjs", None, "redie", "0.3.0", None, None),  # casing
    ("cd:/maven/mavencentral/org.apache/commons/1.2", "maven", "mavencentral", "org.apache", "commons", "1.2", None, None),
    ("cd:/npm/npmjs/-/redie", "npm", "npmjs", None, "redie", None, None, None),  # no revision
    ("cd:/git/github/microsoft/vscode/deadbeef", "git", "github", "microsoft", "vscode", "deadbeef", None, None),
]


def test_canonicalize_python():
    for url, typ, prov, ns, name, rev, tool, tv in CASES:
        c = canonicalize_py(url)
        assert (c["type"], c["provider"], c["namespace"], c["name"], c["revision"]) == (
            typ, prov, ns, name, rev,
        )


def test_url_rendering_roundtrip_python():
    # toUrl (entitySpec.js:64-66): canonical render, '-' for null namespace
    c = canonicalize_py("cd:/NPM/npmjs/-/redie/0.3.0")
    assert c["canonical_url"] == "cd:/npm/npmjs/-/redie/0.3.0"
    c2 = canonicalize_py(c["canonical_url"])
    assert c2 == c  # canonical form is a fixed point


def test_urn_rendering_python():
    # toUrn (entitySpec.js:55-62) — matches requestTests.js:13-26 link URNs
    c = canonicalize_py("cd:/npm/npmjs/-/redie/0.3.0")
    assert coord_urn(c) == "urn:npm:npmjs:-:redie:revision:0.3.0"
    assert coord_urn(c, tool="scancode") == "urn:npm:npmjs:-:redie:revision:0.3.0:tool:scancode"
    c_ns = canonicalize_py("cd:/maven/mavencentral/org.x/lib/1.0")
    assert coord_urn(c_ns) == "urn:maven:mavencentral:org.x:lib:revision:1.0"


def test_builtin_matches_python(spark):
    urls = [u for (u, *_rest) in CASES]
    df = with_parsed_coordinates(spark.createDataFrame([(u,) for u in urls], "url string"))
    rows = {r["url"]: r for r in df.collect()}
    for u in urls:
        py = canonicalize_py(u)
        r = rows[u]
        for k in ("type", "provider", "namespace", "name", "revision"):
            assert r[k] == py[k], (u, k)
        assert r["canonical_url"] == py["canonical_url"]


def test_arrow_udf_matches_builtin(spark):
    urls = [u for (u, *_rest) in CASES] + ["cd:/npm/npmjs/-/x/1.0/tool/ScanCode/32.1.0"]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    a = with_parsed_coordinates(df).select("url", "canonical_url", "type", "namespace")
    b = df.select("url", canonicalize_udf("url").alias("c")).select(
        "url", F.col("c.canonical_url").alias("canonical_url"),
        F.col("c.type").alias("type"), F.col("c.namespace").alias("namespace"),
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_tool_spec_parsing(spark):
    # entitySpec.js:13 — '/tool/{name}/{version}', both lowercased
    url = "cd:/npm/npmjs/-/redie/0.3.0/tool/ScanCode/32.1.0"
    df = with_parsed_coordinates(spark.createDataFrame([(url,)], "url string"))
    r = df.collect()[0]
    assert (r["tool"], r["tool_version"]) == ("scancode", "32.1.0")
    assert r["canonical_url"] == "cd:/npm/npmjs/-/redie/0.3.0/tool/scancode/32.1.0"
    py = canonicalize_py(url)
    assert (py["tool"], py["tool_version"]) == ("scancode", "32.1.0")


def test_url_hash_is_stable_and_keyed_on_canonical(spark):
    df = with_parsed_coordinates(
        spark.createDataFrame(
            [("cd:/npm/npmjs/-/a/1.0",), ("cd:/NPM/NPMJS/-/a/1.0",)], "url string"
        )
    )
    hashes = [r["url_hash"] for r in df.collect()]
    assert hashes[0] == hashes[1]  # same canonical form → same 64-bit key


@pytest.mark.parametrize("bad", ["", "not a url", "cd:/onlytype"])
def test_malformed_urls_yield_null_coordinates(spark, bad):
    # pre-filter semantics: malformed → deadletter (crawler.js:660-673)
    df = with_parsed_coordinates(spark.createDataFrame([(bad,)], "url string"))
    r = df.collect()[0]
    assert r["type"] is None or r["name"] is None or canonicalize_py(bad) is None
