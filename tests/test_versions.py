"""Version algebra tests — latest-version resolution
(/root/reference/lib/baseHandler.js:83-101) and NuGet normalization
(/root/reference/providers/fetch/nugetFetch.js:81-85).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.functions.versions import (
    is_prerelease,
    latest_version_agg,
    nuget_normalize,
    semver_key,
)
from crawler_spark.simulator import latest_version_py, semver_key_py


def _latest_spark(spark, versions):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(versions)], "ord long, version string"
    )
    return df.agg(
        latest_version_agg(F.col("version"), F.col("ord")).alias("latest")
    ).collect()[0]["latest"]


def test_latest_excludes_prereleases(spark):
    # semver.prerelease(v) !== null skipped in the reduce (baseHandler.js:89-95)
    versions = ["1.0.0", "2.0.0-beta.1", "1.5.3"]
    assert _latest_spark(spark, versions) == "1.5.3"
    assert latest_version_py(versions) == "1.5.3"


def test_latest_plain_max(spark):
    versions = ["0.9.0", "0.10.0", "0.2.5"]  # semver order, not lexical
    assert _latest_spark(spark, versions) == "0.10.0"
    assert latest_version_py(versions) == "0.10.0"


def test_all_prerelease_returns_list_head(spark):
    # the reference's reduce returns its SEED versions[0] when the filter
    # leaves nothing — the list head, not the max prerelease
    versions = ["1.0.0-alpha", "1.0.0-beta"]
    assert _latest_spark(spark, versions) == latest_version_py(versions) == "1.0.0-alpha"


def test_prerelease_seed_wins_when_it_outranks_stable(spark):
    # the seed is UNFILTERED and participates: semver.gt('2.0.0',
    # '3.0.0-alpha') is false, so the reference resolves the prerelease
    # head (baseHandler.js:95 — reduce(..., versions[0]))
    versions = ["3.0.0-alpha", "1.0.0", "2.0.0"]
    assert _latest_spark(spark, versions) == latest_version_py(versions) == "3.0.0-alpha"
    # ...but a stable version at the same triple DOES outrank the seed
    versions2 = ["3.0.0-alpha", "3.0.0", "2.0.0"]
    assert _latest_spark(spark, versions2) == latest_version_py(versions2) == "3.0.0"


def test_semver_key_parity_and_order(spark):
    versions = ["1.2.3", "v2.0.0", "10.0.1", "1.2", "3", "1.2.3-rc.1+build5"]
    df = spark.createDataFrame([(v,) for v in versions], "version string")
    rows = {r["version"]: r["k"] for r in df.select("version", semver_key(F.col("version")).alias("k")).collect()}
    for v in versions:
        assert rows[v] == semver_key_py(v), v
    assert rows["10.0.1"] > rows["v2.0.0"] > rows["1.2.3"] > rows["1.2"]


def test_is_prerelease(spark):
    df = spark.createDataFrame(
        [("1.0.0",), ("1.0.0-beta.1",), ("1.0.0+build",), ("2.0.0-rc.1+b2",)], "v string"
    )
    got = [r["p"] for r in df.select(is_prerelease(F.col("v")).alias("p")).collect()]
    assert got == [False, True, False, True]


def test_nuget_normalize(spark):
    # nugetFetch.js:81-85: trim leading zeros per part, drop 4th part == 0,
    # keep prerelease suffix
    cases = {
        "1.00": "1.0",
        "1.01.1": "1.1.1",
        "1.00.0.1": "1.0.0.1",
        "1.0.01.0": "1.0.1",
        "1.00.1-Beta": "1.0.1-Beta",
        "2.3.4": "2.3.4",
        # the reference's `trimmed[3] === '0'` check fires on ANY length
        # and slice(0,3) drops everything past part 3
        "1.2.3.0.5": "1.2.3",
        "1.2.3.4.5": "1.2.3.4.5",
        # `.filter(x => x).join('-')` collapses empty dash segments
        "1.00.1-": "1.0.1",
        "1.0.0-beta--x": "1.0.0-beta-x",
    }
    df = spark.createDataFrame([(k,) for k in cases], "v string")
    got = {r["v"]: r["n"] for r in df.select("v", nuget_normalize(F.col("v")).alias("n")).collect()}
    assert got == cases
