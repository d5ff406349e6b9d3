"""Source discovery (P22, lib/sourceDiscovery.js) — Spark operator vs
pure-Python twin equivalence on tricky URL forms, plus end-to-end engine
parity: a registry row whose source is NOT pre-resolved gets its
has_source edge from candidate-URL discovery against the tags dim.
"""

from __future__ import annotations

import pytest

from crawler_spark.data.generators import _spans_py, registry_df, seeds_df, tags_df
from crawler_spark.operators.discovery import (
    discover_source_py,
    discover_sources,
    resolve_registry_sources,
    resolve_registry_sources_py,
)
from crawler_spark.operators.epoch import CrawlEngine
from crawler_spark.simulator import CrawlSimulator
from crawler_spark.storage.snapshots import SnapshotStore

import random

_rng = random.Random(99)

TRICKY = [
    # (version, candidate_urls) — mirrors parse-github-url edge cases
    ("1.2.3", ["https://github.com/owner1/repo1"]),
    ("1.2.3", ["git@github.com:owner1/repo1.git"]),  # ssh form, .git suffix
    ("1.2.3", ["https://www.github.com/owner1/repo1#readme"]),  # fragment
    ("2.0.0", ["https://gitlab.com/owner1/repo1"]),  # non-github → no hit
    ("1.2.3", ["https://github.com/owner1"]),  # no repo segment → no hit
    ("1.2.3", [None, "", "https://github.com/owner1/repo1?tab=tags"]),
    # first candidate misses (no tags), second hits; duplicates collapse
    ("3.1.0", ["https://github.com/other/nothing",
               "https://github.com/owner2/repo2",
               "https://github.com/owner2/repo2.git"]),
    # both candidates have tags → FIRST candidate wins even with a
    # lower-priority pattern (candidate order beats pattern order)
    ("4.0.0", ["https://github.com/owner3/low-pattern",
               "https://github.com/owner4/high-pattern"]),
    # host-agnostic uniqWith: a gitlab URL with the SAME (owner, name)
    # ahead of the github twin REMOVES it as a duplicate, and the gitlab
    # survivor fails the github-only provider check → resolves nothing
    # even though the tag exists (sourceDiscovery.js:29-64)
    ("1.2.3", ["https://gitlab.com/owner1/repo1",
               "https://github.com/owner1/repo1"]),
    # ...but a DIFFERENT-(owner, name) gitlab URL shadows nothing
    ("1.2.3", ["https://gitlab.com/owner9/other",
               "https://github.com/owner1/repo1"]),
]

TAGS = [
    {"owner": "owner1", "name": "repo1", "tag": "v1.2.3", "sha": "a" * 40},
    {"owner": "owner1", "name": "repo1", "tag": "1.2.3^{}", "sha": "b" * 40},  # higher priority
    {"owner": "owner2", "name": "repo2", "tag": "rel/v3.1.0", "sha": "c" * 40},
    {"owner": "owner3", "name": "low-pattern", "tag": "v4.0.0.0", "sha": "d" * 40},  # pattern 8
    {"owner": "owner4", "name": "high-pattern", "tag": "4.0.0^{}", "sha": "e" * 40},  # pattern 1
]


def test_spark_matches_python_twin(spark):
    reqs = spark.createDataFrame(
        [(i, v, c) for i, (v, c) in enumerate(TRICKY)],
        "request_id long, version string, candidate_urls array<string>",
    )
    got = {
        r["request_id"]: (r["owner"], r["name"], r["sha"])
        for r in discover_sources(reqs, tags_df(spark, TAGS)).collect()
    }
    tags_by_repo: dict = {}
    for t in TAGS:
        tags_by_repo.setdefault((t["owner"], t["name"]), {})[t["tag"]] = t["sha"]
    want = {}
    for i, (v, c) in enumerate(TRICKY):
        d = discover_source_py(v, c, tags_by_repo)
        if d:
            want[i] = (d["source_namespace"], d["source_name"], d["source_revision"])
    assert got == want
    # the semantics themselves, not just twin-equality:
    assert got[0] == ("owner1", "repo1", "b" * 40)  # '{v}^{}' beats 'v{v}'
    assert 3 not in got and 4 not in got
    assert got[6] == ("owner2", "repo2", "c" * 40)
    assert got[7] == ("owner3", "low-pattern", "d" * 40)  # candidate order wins
    assert 8 not in got  # gitlab shadow: same-(owner,name) twin removed
    assert got[9] == ("owner1", "repo1", "b" * 40)  # different repo: no shadow


def _reg_row(name, candidate_urls):
    return {
        "provider": "npmjs", "namespace": None, "name": name, "version": "1.0.0",
        "is_prerelease": False, "release_seq": 0, "status": 200, "fail_attempts": 0,
        "etag": None, "source_type": None, "source_provider": None,
        "source_namespace": None, "source_name": None, "source_revision": None,
        "candidate_urls": candidate_urls,
        "payload_spans": _spans_py(f"npmjs/-/{name}/1.0.0", _rng),
    }


ENGINE_REGISTRY = [
    _reg_row("disc-a", ["https://gitlab.com/x/y", "https://github.com/acme/disc-a.git"]),
    _reg_row("disc-b", ["https://github.com/acme/unknown-repo"]),  # discovery fails
]
ENGINE_TAGS = [{"owner": "acme", "name": "disc-a", "tag": "v1.0.0", "sha": "f" * 40}]
ENGINE_SEEDS = [
    {"seed_id": 0, "type": "component", "url": "cd:/npm/npmjs/-/disc-a/1.0.0",
     "queue": "normal", "policy": "default"},
    {"seed_id": 1, "type": "component", "url": "cd:/npm/npmjs/-/disc-b/1.0.0",
     "queue": "normal", "policy": "default"},
]


def test_engine_discovery_parity(spark, tmp_path_factory):
    """The discovered source feeds the has_source edge: disc-a schedules a
    `source` child at the discovered sha; disc-b (no matching tag) does
    not. Engine and simulator agree on the full log."""
    sim = CrawlSimulator(ENGINE_REGISTRY, host_budget=4, batch_budget=8,
                         tags_rows=ENGINE_TAGS)
    sres = sim.run(ENGINE_SEEDS, max_epochs=12)
    store = SnapshotStore(spark, str(tmp_path_factory.mktemp("disc")))
    eng = CrawlEngine(spark, store, registry_df(spark, ENGINE_REGISTRY),
                      host_budget=4, batch_budget=8,
                      tags=tags_df(spark, ENGINE_TAGS))
    eng.run(seeds_df(spark, ENGINE_SEEDS), max_epochs=12)

    def key(r):
        return (r["epoch"], r["pop_index"], r["type"], r["url"], r["outcome"], r["origin"])

    spark_log = [key(r) for r in store.read("schedule_log").orderBy("epoch", "pop_index", "url").collect()]
    sim_log = [key(r) for r in sorted(sres.schedule_log, key=lambda r: (r["epoch"], r["pop_index"], r["url"]))]
    assert spark_log == sim_log
    src = [r for r in sres.schedule_log if r["type"] == "source"]
    assert {r["url"] for r in src} == {"cd:/git/github/acme/disc-a/" + "f" * 40}


def test_resolve_registry_sources_twin(spark):
    resolved_py = resolve_registry_sources_py(ENGINE_REGISTRY, ENGINE_TAGS)
    by_name = {r["name"]: r for r in resolved_py}
    assert by_name["disc-a"]["source_revision"] == "f" * 40
    assert by_name["disc-a"]["source_namespace"] == "acme"
    assert by_name["disc-b"]["source_type"] is None
    resolved_spark = {
        r["name"]: (r["source_type"], r["source_namespace"], r["source_name"], r["source_revision"])
        for r in resolve_registry_sources(
            registry_df(spark, ENGINE_REGISTRY), tags_df(spark, ENGINE_TAGS)
        ).collect()
    }
    assert resolved_spark["disc-a"] == ("git", "acme", "disc-a", "f" * 40)
    assert resolved_spark["disc-b"] == (None, None, None, None)
