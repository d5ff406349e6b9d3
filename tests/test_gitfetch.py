"""GitCloner decision kernels (gitCloner.js) — revision normalization
precedence, github case-folding, count-objects size parse."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.functions.gitfetch import (
    git_cased_spec,
    git_repo_size_kb,
    git_resolve_revision,
)

HEAD = "0001" + "a" * 36
TAG = "0001" + "b" * 36


def _resolve(spark, revision):
    specs = spark.createDataFrame([(0, "r1", revision)], "spec_id int, repo string, revision string")
    refs = spark.createDataFrame(
        [("r1", "HEAD", HEAD), ("r1", "main", HEAD), ("r1", "v1.0", TAG)],
        "repo string, ref string, sha string",
    )
    [row] = git_resolve_revision(specs, refs).collect()
    return row["sha"]


def test_revision_normalization_precedence(spark):
    assert _resolve(spark, None) == HEAD  # absent → clone default HEAD
    assert _resolve(spark, "main") == HEAD  # branch name
    assert _resolve(spark, "v1.0") == TAG  # tag name
    assert _resolve(spark, TAG.upper()) == TAG  # full sha normalizes to lower
    assert _resolve(spark, "0001a") == HEAD  # unique 5-char prefix
    assert _resolve(spark, "0001") is None  # head+tag share it → ambiguous
    assert _resolve(spark, "feature/x") is None  # unknown ref
    # a ref name that is also a plausible hex prefix: ref wins
    specs = spark.createDataFrame([(0, "r1", "beef")], "spec_id int, repo string, revision string")
    refs = spark.createDataFrame(
        [("r1", "beef", TAG), ("r1", "HEAD", HEAD)], "repo string, ref string, sha string"
    )
    assert git_resolve_revision(specs, refs).collect()[0]["sha"] == TAG


def test_cased_spec_and_size(spark):
    df = spark.createDataFrame(
        [
            (0, "github", "OctoCat", "Hello-World"),
            (1, "gitlab", "GrOuP", "PrOj"),
        ],
        "i int, p string, ns string, n string",
    )
    got = {
        r["i"]: (r["c"]["namespace"], r["c"]["name"])
        for r in df.select(
            "i", git_cased_spec(F.col("p"), F.col("ns"), F.col("n")).alias("c")
        ).collect()
    }
    assert got[0] == ("octocat", "hello-world")
    assert got[1] == ("GrOuP", "PrOj")

    sz = spark.createDataFrame(
        [
            (0, "count: 10\nsize: 4\nsize-pack: 237\nprune-packable: 0\n"),
            (1, "garbage with no marker"),
        ],
        "i int, out string",
    )
    got = {
        r["i"]: r["kb"]
        for r in sz.select("i", git_repo_size_kb(F.col("out")).alias("kb")).collect()
    }
    assert got == {0: 237, 1: None}
