"""P4-P13 manifest candidate-URL extraction + fallback source specs.

Hand-stated expectations come straight from the reference processors'
field-priority lists (npmExtract.js:60-80, gemExtract.js:42-55,
crateExtract.js:44-49, composerExtract.js:61-88, podExtract.js:46-58,
condaExtract.js:37-45, nugetExtract.js:77-103, mavenExtract.js:42-63,
debExtract.js:54-65, pypiExtract.js:38-50) — independent of both the
Spark implementation and its pure-Python twin.
"""

from __future__ import annotations

import json

import pyspark.sql.functions as F
import pytest

from crawler_spark.functions.manifests import (
    candidate_source_urls,
    candidate_source_urls_py,
    debsrc_source_py,
    debsrc_sources,
    extract_and_discover,
    fallback_source_py,
    fallback_source_struct,
)

# (provider, manifest, registry, expected) — expected per reference docs
CASES = [
    (
        "npmjs",
        {"repository": {"url": "https://github.com/a/b"}, "url": "https://u",
         "homepage": ["https://h1", "https://h2"], "bugs": "https://bugs"},
        {"homepage": "https://rh", "bugs": {"url": "https://rb"}},
        ["https://github.com/a/b", "https://u", "https://h1", "https://bugs",
         "https://rh", "https://rb"],
    ),
    # bugs string NOT starting with http is dropped; empty homepage array too
    ("npmjs", {"bugs": "mailto:x@y", "homepage": []}, None, []),
    (
        "mavencentral",
        None,
        {"summary": {"scm": [{"url": ["https://github.com/m/s"]}]}},
        ["https://github.com/m/s"],
    ),
    ("mavencentral", None, {"summary": {}}, []),
    (
        "pypi", None,
        {"info": {"home_page": "https://hp", "docs_url": "https://d",
                  "release_url": "https://rel"}},
        ["https://d", "https://hp", "https://rel"],  # bugtrack,docs,download,home,package,project,release
    ),
    (
        "rubygems", None,
        {"source_code_uri": "https://s", "bug_tracker_uri": "https://b",
         "gem_uri": "https://g"},
        ["https://b", "https://g", "https://s"],
    ),
    (
        "cratesio",
        {"repository": "https://r", "documentation": "https://d"},
        None,
        ["https://r", "https://d"],
    ),
    (
        "packagist",
        {"source": {"url": "https://ms"}, "bugs": "not-a-url"},
        {"dist": {"url": "https://rd"}, "homepage": "https://rh"},
        ["https://ms", "https://rd", "https://rh"],
    ),
    ("cocoapods", None, {"source": {"git": "https://g.git"}}, ["https://g.git"]),
    ("cocoapods", None, {"source": {"http": "https://h.zip"}}, ["https://h.zip"]),
    (
        "condaforge", None,
        {"channelData": {"home": "https://home", "source_url": "https://src",
                         "doc_url": "https://doc"}},
        ["https://src", "https://home", "https://doc"],
    ),
    (
        # nuspec (registry) candidates come BEFORE the catalog manifest's
        "nuget",
        {"projectUrl": "https://mp"},
        {"repository": {"url": "https://nr"}, "licenseUrl": "https://nl"},
        ["https://nr", "https://nl", "https://mp"],
    ),
    ("golang", {"whatever": 1}, {"x": 2}, []),
    ("debian", None, None, []),
]


def _js(d):
    return json.dumps(d) if d is not None else None


def test_candidates_expected_and_twin(spark):
    rows = [
        (i, prov, _js(m), _js(r))
        for i, (prov, m, r, _) in enumerate(CASES)
    ]
    df = spark.createDataFrame(rows, "i int, provider string, m string, r string")
    got = {
        r.i: list(r.c)
        for r in df.select(
            "i", candidate_source_urls(F.col("provider"), F.col("m"), F.col("r")).alias("c")
        ).collect()
    }
    for i, (prov, m, r, expected) in enumerate(CASES):
        assert got[i] == expected, f"spark case {i} ({prov})"
        assert candidate_source_urls_py(prov, _js(m), _js(r)) == expected, f"py case {i} ({prov})"


def test_nuget_latest_nuspec_extra_doc(spark):
    m, r, x = ({"projectUrl": "https://mp"}, {"licenseUrl": "https://nl"},
               {"repository": {"url": "https://latest"}})
    expected = ["https://nl", "https://mp", "https://latest"]
    df = spark.createDataFrame([(_js(m), _js(r), _js(x))], "m string, r string, x string")
    out = df.select(candidate_source_urls(
        F.lit("nuget"), F.col("m"), F.col("r"), F.col("x")).alias("c")).head()
    assert list(out.c) == expected
    assert candidate_source_urls_py("nuget", _js(m), _js(r), _js(x)) == expected


FALLBACK_CASES = [
    # (provider, namespace, name, revision, expected dict or None)
    ("mavencentral", "org.apache", "commons-io", "2.11.0",
     {"source_type": "sourcearchive", "source_provider": "mavencentral",
      "source_namespace": "org.apache", "source_name": "commons-io",
      "source_revision": "2.11.0"}),
    ("condaforge", "ignored", "numpy", "1.26.4-py312h8813227_0",
     {"source_type": "condasrc", "source_provider": "condaforge",
      "source_namespace": None, "source_name": "numpy",
      "source_revision": "1.26.4"}),
    ("npmjs", None, "left-pad", "1.3.0", None),
    ("rubygems", None, "rails", "7.0.0", None),
]


def test_fallback_struct_expected_and_twin(spark):
    rows = [(i, p, ns, n, rev) for i, (p, ns, n, rev, _) in enumerate(FALLBACK_CASES)]
    df = spark.createDataFrame(rows, "i int, p string, ns string, n string, rev string")
    got = {
        r.i: (None if r.fb is None else r.fb.asDict())
        for r in df.select(
            "i",
            fallback_source_struct(F.col("p"), F.col("ns"), F.col("n"), F.col("rev")).alias("fb"),
        ).collect()
    }
    for i, (p, ns, n, rev, expected) in enumerate(FALLBACK_CASES):
        assert got[i] == expected, f"spark fallback {i} ({p})"
        assert fallback_source_py(p, ns, n, rev) == expected, f"py fallback {i} ({p})"


def test_debsrc_match(spark):
    specs = spark.createDataFrame(
        [(1, "curl", "7.88.1-10_amd64"), (2, "curl", "7.88.1-10_arm64"),
         (3, "libfoo", "1.0_amd64"), (4, "nosuch", "1.0_amd64")],
        "spec_id int, name string, revision string",
    )
    entries = spark.createDataFrame(
        [("curl", "amd64", "curl-src"), ("curl", "arm64", None),
         ("libfoo", "all", "foo")],
        "name string, architecture string, source string",
    )
    out = {r.spec_id: r.asDict() for r in debsrc_sources(specs, entries).collect()}
    # only spec 1 resolves: arm64 entry has no Source, libfoo arch mismatch
    assert set(out) == {1}
    assert out[1]["source_type"] == "debsrc"
    assert out[1]["source_name"] == "curl-src"  # source name differs from binary
    assert out[1]["source_revision"] == "7.88.1-10"
    entries_py = [
        {"name": "curl", "architecture": "amd64", "source": "curl-src"},
        {"name": "curl", "architecture": "arm64", "source": None},
        {"name": "libfoo", "architecture": "all", "source": "foo"},
    ]
    assert debsrc_source_py("curl", "7.88.1-10_amd64", entries_py) == {
        "source_type": "debsrc", "source_provider": "debian",
        "source_namespace": None, "source_name": "curl-src",
        "source_revision": "7.88.1-10",
    }
    assert debsrc_source_py("curl", "7.88.1-10_arm64", entries_py) is None
    assert debsrc_source_py("nosuch", "1.0_amd64", entries_py) is None


def test_extract_and_discover_end_to_end(spark):
    """manifest JSON -> candidates -> tag match -> fallback, one pass.

    doc 1 (npm): repository.url hits a tagged repo -> git/github spec.
    doc 2 (npm): no candidate resolves -> all source_* null.
    doc 3 (maven): scm miss -> fabricated sourcearchive spec.
    doc 4 (maven): scm hit -> git spec (discovery wins over fallback).
    """
    docs = spark.createDataFrame(
        [
            (1, "npmjs", None, "a-pkg", "1.2.3",
             _js({"repository": {"url": "https://github.com/good/repo"}}), None),
            (2, "npmjs", None, "b-pkg", "9.9.9",
             _js({"homepage": "https://example.com/nope"}), None),
            (3, "mavencentral", "com.x", "art", "0.5.0",
             None, _js({"summary": {"scm": [{"url": ["https://github.com/no/tags"]}]}})),
            (4, "mavencentral", "com.y", "art2", "2.0.0",
             None, _js({"summary": {"scm": [{"url": ["https://github.com/good/repo2"]}]}})),
        ],
        "doc_id int, provider string, namespace string, name string, version string,"
        " manifest_json string, registry_json string",
    )
    tags = spark.createDataFrame(
        [("good", "repo", "v1.2.3", "sha-aaa"), ("good", "repo2", "2.0.0^{}", "sha-bbb"),
         ("no", "other", "v0.5.0", "sha-ccc")],
        "owner string, name string, tag string, sha string",
    )
    out = {r.doc_id: r.asDict() for r in extract_and_discover(docs, tags).collect()}
    assert len(out) == 4
    assert (out[1]["source_type"], out[1]["source_namespace"], out[1]["source_name"],
            out[1]["source_revision"]) == ("git", "good", "repo", "sha-aaa")
    assert out[2]["source_type"] is None and out[2]["source_revision"] is None
    assert (out[3]["source_type"], out[3]["source_namespace"], out[3]["source_name"],
            out[3]["source_revision"]) == ("sourcearchive", "com.x", "art", "0.5.0")
    assert (out[4]["source_type"], out[4]["source_provider"],
            out[4]["source_revision"]) == ("git", "github", "sha-bbb")


@pytest.mark.parametrize("bad", ['{"truncated":', "not json at all", "[1,2]"])
def test_malformed_json_yields_no_candidates(spark, bad):
    """Malformed manifests must not error the pipeline (get_json_object
    returns null on parse failure — crawl robustness at 100 TB)."""
    df = spark.createDataFrame([(bad,)], "m string")
    out = df.select(candidate_source_urls(
        F.lit("cratesio"), F.col("m"), F.lit(None).cast("string")).alias("c")).head()
    assert list(out.c) == []
