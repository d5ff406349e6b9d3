"""Maven-family fetch decision kernels (mavenBasedFetch.js and the three
concrete providers) — each branch against hand-stated expectations."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from crawler_spark.functions.mavenfetch import (
    maven_artifact_extension,
    maven_artifact_url,
    maven_cased_spec,
    maven_fetch_outcome,
    maven_latest_version,
    maven_release_date,
)


def test_latest_version_routes_by_provider(spark):
    rows = [
        # provider, metadata_release, solr_latest, want
        (0, "mavencentral", "2.0", "3.0", "3.0"),  # central → solrsearch
        (1, "mavengoogle", "2.0", "3.0", "2.0"),  # google → metadata release
        (2, "gradleplugin", "2.0", None, "2.0"),
        (3, "mavencentral", "2.0", None, None),  # solr has no answer → skip later
        (4, "npmjs", "2.0", "3.0", None),  # not a maven provider
    ]
    df = spark.createDataFrame(
        [r[:4] for r in rows], "i int, provider string, meta string, solr string"
    )
    got = {
        r["i"]: r["v"]
        for r in df.select(
            "i", maven_latest_version(F.col("provider"), F.col("meta"), F.col("solr")).alias("v")
        ).collect()
    }
    for i, *_, want in rows:
        assert got[i] == want, (i, got[i], want)


def test_artifact_extension_priority(spark):
    rows = [
        # type, has_sources, has_jar, has_aar, want
        (0, "sourcearchive", True, True, True, "-sources.jar"),
        (1, "sourcearchive", False, True, True, None),  # sources missing → no fallback
        (2, "maven", True, True, True, ".jar"),
        (3, "maven", True, False, True, ".aar"),  # jar 404 → aar
        (4, "maven", True, False, False, None),  # nothing → markSkip
    ]
    df = spark.createDataFrame(
        [r[:5] for r in rows], "i int, t string, s boolean, j boolean, a boolean"
    )
    got = {
        r["i"]: r["e"]
        for r in df.select(
            "i",
            maven_artifact_extension(F.col("t"), F.col("s"), F.col("j"), F.col("a")).alias("e"),
        ).collect()
    }
    for i, *_, want in rows:
        assert got[i] == want, (i, got[i], want)


def test_artifact_url_and_outcome(spark):
    df = spark.createDataFrame(
        [(0, "gradleplugin", "com.example.gradle", "plug", "1.2", ".jar")],
        "i int, p string, ns string, n string, r string, e string",
    )
    [row] = df.select(
        maven_artifact_url(F.col("p"), F.col("ns"), F.col("n"), F.col("r"), F.col("e")).alias("u")
    ).collect()
    assert row["u"] == "https://plugins.gradle.org/m2/com/example/gradle/plug/1.2/plug-1.2.jar"

    rows = [
        # ns, resolved, n_poms, ext, want
        (0, None, "1.0", 2, ".jar", "Skipped"),  # no namespace
        (1, "g", None, 2, ".jar", "Skipped"),  # unresolvable revision
        (2, "g", "1.0", 0, ".jar", "Skipped"),  # no poms
        (3, "g", "1.0", 2, None, "Skipped"),  # no artifact
        (4, "g", "1.0", 2, ".aar", "Fetched"),
    ]
    df = spark.createDataFrame(
        [r[:5] for r in rows], "i int, ns string, rev string, np int, e string"
    )
    got = {
        r["i"]: r["o"]
        for r in df.select(
            "i",
            maven_fetch_outcome(F.col("ns"), F.col("rev"), F.col("np"), F.col("e")).alias("o"),
        ).collect()
    }
    for i, *_, want in rows:
        assert got[i] == want, (i, got[i], want)


def test_cased_spec_override(spark):
    rows = [
        # summary_group, summary_artifact, want_ns, want_name
        (0, "Org.Cased", "Art", "Org.Cased", "Art"),
        (1, None, "Art", "org.plain", "Art"),  # group absent → spec ns kept
        (2, "Org.Cased", None, "Org.Cased", "art"),
        (3, None, None, "org.plain", "art"),  # no summary → untouched
    ]
    df = spark.createDataFrame([r[:3] for r in rows], "i int, sg string, sa string")
    got = {
        r["i"]: (r["c"]["namespace"], r["c"]["name"])
        for r in df.select(
            "i",
            maven_cased_spec(
                F.lit("org.plain"), F.lit("art"), F.col("sg"), F.col("sa")
            ).alias("c"),
        ).collect()
    }
    for i, _, _, wns, wname in rows:
        assert got[i] == (wns, wname), (i, got[i])


def test_release_date_chain(spark):
    manifest = dt.datetime(2016, 1, 15, 12, 0, 0)
    anyfile = dt.datetime(2017, 2, 20, 8, 30, 0)
    rows = [
        # provider, solr_ms, lines, manifest, want
        # central with a solr timestamp: epoch-ms wins over everything
        (0, "mavencentral", 1425329214000, ["#2015-03-02T10:00:00Z"], manifest,
         dt.datetime(2015, 3, 2, 20, 46, 54)),
        # google never consults solr even when the column is set
        (1, "mavengoogle", 1425329214000, ["#2015-03-02T10:00:00Z"], manifest,
         dt.datetime(2015, 3, 2, 10, 0, 0)),
        # pom.properties: first char of each line sliced before the parse;
        # non-stamp lines become garbage and fall through
        (2, "mavencentral", None, ["version=1.0", "#2015-03-02T10:00:00Z"], manifest,
         dt.datetime(2015, 3, 2, 10, 0, 0)),
        # no parseable line → MANIFEST.MF mtime
        (3, "gradleplugin", None, ["version=1.0"], manifest, manifest),
        # no manifest → any file's mtime
        (4, "gradleplugin", None, ["version=1.0"], None, anyfile),
    ]
    df = spark.createDataFrame(
        [r[:5] for r in rows],
        "i int, p string, ms long, lines array<string>, manifest timestamp",
    )
    got = {
        r["i"]: r["d"]
        for r in df.select(
            "i",
            maven_release_date(
                F.col("p"), F.col("ms"), F.col("lines"), F.col("manifest"),
                F.lit(anyfile), "2026-01-01 00:00:00",
            ).alias("d"),
        ).collect()
    }
    for i, *_, want in rows:
        assert got[i] == want, (i, got[i], want)
