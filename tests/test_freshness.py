"""Freshness-policy matrix scenarios (P24) — the TraversalPolicy
shouldProcess gates match / version / N-epochs / matchOrVersion
(/root/reference/ghcrawler/lib/traversalPolicy.js:211-231) plus the F1
remainder: the 8h fetched-cache TTL (config/cdConfig.js:22,
providers/fetch/dispatcher.js:77-114) and etag-conditional refetch
(ghcrawler/lib/crawler.js:426-443).

Two-phase drive, Spark engine vs pure-Python simulator in exact parity:

phase 1 (epochs 0..9)  — organic crawl of two packages under `default`
                         policy; docs land with etag/fetchedAt/version.
phase 2 (epochs 12..~18) — upstream mutates (mut-a gets a new etag +
                         payload), a tool processor version is bumped,
                         and external re-submissions exercise each gate:
  reload  mut-a  → stored doc stale + etag changed  → origin refetch, Processed
  reload  ver-b  → stored doc stale + etag matches  → 304, storage, match → Traversed
  reprocess licensee(ver-b) → tool doc version 1 < 2 → Processed (re-run)
  reprocess scancode(ver-b) → tool doc version 1 = 1 → Excluded
  refresh3 ver-b (custom: originStorage, N=3 epochs) → processedAt stale → Processed from storage
"""

from __future__ import annotations

import pytest

from crawler_spark.data.generators import _spans_py, registry_df, seeds_df
from crawler_spark.operators.epoch import CrawlEngine
from crawler_spark.simulator import CrawlSimulator
from crawler_spark.storage.snapshots import SnapshotStore

import random

_rng = random.Random(13)

SPANS_A1 = _spans_py("npmjs/-/mut-a/1.0.0", _rng)
SPANS_A2 = [{"kind": "text", "text": "mut-a revised upstream", "media_ref": None, "offset": 0}]
SPANS_B = _spans_py("npmjs/-/ver-b/1.0.0", _rng)


def _reg(name, spans, etag):
    return {
        "provider": "npmjs", "namespace": None, "name": name, "version": "1.0.0",
        "is_prerelease": False, "release_seq": 0, "status": 200, "fail_attempts": 0,
        "etag": etag, "source_type": None, "source_provider": None,
        "source_namespace": None, "source_name": None, "source_revision": None,
        "payload_spans": spans,
    }


REGISTRY_1 = [_reg("mut-a", SPANS_A1, 'W/"etag-a1"'), _reg("ver-b", SPANS_B, 'W/"etag-b1"')]
# phase 2: mut-a mutated upstream (new etag + payload); ver-b unchanged
REGISTRY_2 = [_reg("mut-a", SPANS_A2, 'W/"etag-a2"'), _reg("ver-b", SPANS_B, 'W/"etag-b1"')]

SEEDS_1 = [
    {"seed_id": 0, "type": "component", "url": "cd:/npm/npmjs/-/mut-a/1.0.0",
     "queue": "normal", "policy": "default"},
    {"seed_id": 1, "type": "component", "url": "cd:/npm/npmjs/-/ver-b/1.0.0",
     "queue": "normal", "policy": "default"},
]
SEEDS_2 = [
    {"seed_id": 100, "type": "npm", "url": "cd:/npm/npmjs/-/mut-a/1.0.0",
     "queue": "normal", "policy": "reload"},
    {"seed_id": 101, "type": "npm", "url": "cd:/npm/npmjs/-/ver-b/1.0.0",
     "queue": "normal", "policy": "reload"},
    {"seed_id": 102, "type": "licensee", "url": "cd:/npm/npmjs/-/ver-b/1.0.0",
     "queue": "normal", "policy": "reprocess"},
    {"seed_id": 103, "type": "scancode", "url": "cd:/npm/npmjs/-/ver-b/1.0.0",
     "queue": "normal", "policy": "reprocess"},
    {"seed_id": 104, "type": "npm", "url": "cd:/npm/npmjs/-/ver-b/1.0.0",
     "queue": "soon", "policy": "refresh3"},
]

CUSTOM_POLICIES = {"refresh3": ("originStorage", 3)}  # N-epoch freshness axis
BUMPED_VERSIONS = {"licensee": 2}
PHASE1_EPOCHS = 10
PHASE2_START = 12  # > fetch epoch + TTL(8): stored docs are cache-stale
PHASE2_EPOCHS = 6
HOST_BUDGET, BATCH_BUDGET = 8, 8


@pytest.fixture(scope="module")
def runs(spark, tmp_path_factory):
    # -- simulator (golden)
    sim = CrawlSimulator(REGISTRY_1, host_budget=HOST_BUDGET, batch_budget=BATCH_BUDGET,
                         policies=CUSTOM_POLICIES)
    sim.seed(SEEDS_1, epoch=0)
    for epoch in range(PHASE1_EPOCHS):
        sim.run_epoch(epoch)
    sim.set_registry(REGISTRY_2)
    sim.processor_versions.update(BUMPED_VERSIONS)
    sim.seed(SEEDS_2, epoch=PHASE2_START)
    for epoch in range(PHASE2_START, PHASE2_START + PHASE2_EPOCHS):
        sim.run_epoch(epoch)

    # -- Spark engine over one store, phase-2 engine rebuilt with the new
    # registry dim + bumped processor versions (the redeploy flow)
    store = SnapshotStore(spark, str(tmp_path_factory.mktemp("freshness")))
    eng1 = CrawlEngine(spark, store, registry_df(spark, REGISTRY_1),
                       host_budget=HOST_BUDGET, batch_budget=BATCH_BUDGET,
                       policies=CUSTOM_POLICIES)
    eng1.bootstrap(seeds_df(spark, SEEDS_1))
    for epoch in range(PHASE1_EPOCHS):
        eng1.run_epoch(epoch)
    eng2 = CrawlEngine(spark, store, registry_df(spark, REGISTRY_2),
                       host_budget=HOST_BUDGET, batch_budget=BATCH_BUDGET,
                       policies=CUSTOM_POLICIES, processor_versions=BUMPED_VERSIONS)
    eng2.submit_requests(seeds_df(spark, SEEDS_2), epoch=PHASE2_START)
    for epoch in range(PHASE2_START, PHASE2_START + PHASE2_EPOCHS):
        eng2.run_epoch(epoch)
    return sim.res, store


def _key(r):
    return (r["epoch"], r["pop_index"], r["type"], r["url"], r["queue"], r["scope"],
            r["outcome"], r["attempt"], r["origin"])


def _phase2_rows(log, url, rtype):
    return [r for r in log if r["url"] == url and r["type"] == rtype
            and r["epoch"] >= PHASE2_START]


def test_full_log_parity(runs):
    sres, store = runs
    spark_log = [_key(r) for r in store.read("schedule_log").orderBy("epoch", "pop_index", "url").collect()]
    sim_log = [_key(r) for r in sorted(sres.schedule_log, key=lambda r: (r["epoch"], r["pop_index"], r["url"]))]
    assert spark_log == sim_log


def test_etag_mismatch_refetches_origin(runs):
    """reload + stale cache + changed origin etag → full origin fetch,
    Processed, doc updated to the new payload/etag."""
    sres, store = runs
    rows = _phase2_rows(sres.schedule_log, "cd:/npm/npmjs/-/mut-a/1.0.0", "npm")
    assert [(r["outcome"], r["origin"]) for r in rows] == [("Processed", "origin")]
    doc = sres.documents["cd:/npm/npmjs/-/mut-a/1.0.0"]
    assert doc["etag"] == 'W/"etag-a2"'
    assert [s["text"] for s in doc["spans"]] == ["mut-a revised upstream"]
    assert doc["fetched_at"] >= PHASE2_START
    # engine agrees on the landed doc
    latest = max(
        (r for r in store.read("documents").collect() if r["doc_id"] == "cd:/npm/npmjs/-/mut-a/1.0.0"),
        key=lambda r: r["epoch"],
    )
    assert latest["etag"] == 'W/"etag-a2"'


def test_etag_match_is_304_traverse(runs):
    """reload + stale cache + matching etag → served from storage (304),
    freshness 'match' says don't process → Traversed, doc NOT re-landed."""
    sres, _ = runs
    rows = _phase2_rows(sres.schedule_log, "cd:/npm/npmjs/-/ver-b/1.0.0", "npm")
    reload_rows = [r for r in rows if r["queue"] == "normal"]
    assert [(r["outcome"], r["origin"]) for r in reload_rows] == [("Traversed", "storage")]
    doc = sres.documents["cd:/npm/npmjs/-/ver-b/1.0.0"]
    assert doc["etag"] == 'W/"etag-b1"'


def test_version_gate_reprocesses_only_bumped_tool(runs):
    """'version' freshness: licensee bumped 1→2 reprocesses; scancode
    still at 1 is Excluded (stored version not behind)."""
    sres, _ = runs
    lic = _phase2_rows(sres.schedule_log, "cd:/npm/npmjs/-/ver-b/1.0.0", "licensee")
    scan = _phase2_rows(sres.schedule_log, "cd:/npm/npmjs/-/ver-b/1.0.0", "scancode")
    assert [(r["outcome"], r["origin"]) for r in lic] == [("Processed", "storage")]
    assert [(r["outcome"], r["origin"]) for r in scan] == [("Excluded", "storage")]
    urn = "urn:npm:npmjs:-:ver-b:revision:1.0.0:tool:licensee"
    assert sres.documents[urn]["version"] == 2
    assert sres.documents[urn]["processed_at"] >= PHASE2_START
    urn_scan = "urn:npm:npmjs:-:ver-b:revision:1.0.0:tool:scancode"
    assert sres.documents[urn_scan]["version"] == 1
    assert sres.documents[urn_scan]["processed_at"] < PHASE1_EPOCHS


def test_n_epoch_freshness_reprocesses_stale_doc(runs):
    """Custom (originStorage, N=3) policy: the stored doc's processedAt is
    > 3 epochs old → Processed from storage; fetchedAt preserved,
    processedAt updated (crawler.js:439-441 metadata overlay)."""
    sres, _ = runs
    rows = _phase2_rows(sres.schedule_log, "cd:/npm/npmjs/-/ver-b/1.0.0", "npm")
    refresh_rows = [r for r in rows if r["queue"] == "soon"]
    assert [(r["outcome"], r["origin"]) for r in refresh_rows] == [("Processed", "storage")]
    doc = sres.documents["cd:/npm/npmjs/-/ver-b/1.0.0"]
    assert doc["processed_at"] >= PHASE2_START
    assert doc["fetched_at"] < PHASE1_EPOCHS  # storage-served: fetchedAt kept


def test_document_metadata_parity(runs):
    """Engine and simulator agree on every doc's final metadata stamps."""
    sres, store = runs
    latest = {}
    for r in store.read("documents").collect():
        if r["doc_id"] not in latest or r["epoch"] > latest[r["doc_id"]]["epoch"]:
            latest[r["doc_id"]] = r
    spark_meta = {
        k: (r["etag"], r["fetched_at_epoch"], r["processed_at_epoch"], r["version"])
        for k, r in latest.items()
    }
    sim_meta = {
        k: (v["etag"], v["fetched_at"], v["processed_at"], v["version"])
        for k, v in sres.documents.items()
    }
    assert spark_meta == sim_meta
