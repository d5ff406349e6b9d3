"""Pure-Python reference simulator — the golden oracle for crawl semantics.

Implements, request-at-a-time, the reference's scheduling/fetch/process
loop (SURVEY.md §2/§3) over the same fixture inputs the Spark engine
consumes:

- weighted queue rotation + local-first pop (queueSet.js:60-98,
  scopedQueueSets.js:51-60) via the shared `poporder` kernel,
- per-host politeness budget + robots gate (north rule; batch analogue of
  crawler.js:92-105),
- retry/backoff/deadletter (crawler.js:330-342, cdConfig.js:21),
- attenuated duplicate pushes (attenuatedQueue.js:36-69),
- URL-seen filtering keyed `type@url` (request.js:117-121, 382-384),
- latest-version resolution excluding prereleases (baseHandler.js:83-101),
- visitor-map traversal expansion with parent-before-child epoch ordering
  (request.js:247-251; children durably enqueued before parent ack,
  crawler.js:272-298 → children eligible from parent_epoch+1),
- document landing as interleaved span arrays.

The Spark engine (operators/epoch.py) must reproduce this simulator's
schedule log, seen set, and document spans EXACTLY — that is the
crawl-order / URL-seen-set / span-sequence parity the north rule demands.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from crawler_spark.config import (
    DEFAULT_BATCH_BUDGET,
    DEFAULT_HOST_BUDGET,
    MAX_REQUEUE_ATTEMPTS,
    PROVIDER_HOSTS,
    QUEUE_NAMES,
    REQUEUE_DELAY_EPOCHS,
    UNKNOWN_HOST,
)
from crawler_spark.data.visitor_map import (
    PACKAGE_SPEC_TYPES,
    SOURCE_SPEC_TYPES,
    TERMINAL_TYPES,
    visitor_edges_py,
)
from crawler_spark.poporder import epoch_rng, pop_schedule

_COORD_RE = re.compile(r".*:/*([^/]+)/([^/]+)/([^/]+)/([^/]+)/?([^/]+)?(/tool/.+)?")
_SEMVER_RE = re.compile(r"^v?(\d+)(?:\.(\d+))?(?:\.(\d+))?(?:-([0-9A-Za-z.\-]+))?(?:\+.*)?$")


def canonicalize_py(url: str) -> dict | None:
    """entitySpec.js:10-53 canonicalization (python twin of
    functions/coordinates.py; parity-tested)."""
    m = _COORD_RE.match(url or "")
    if not m:
        return None
    type_, provider, namespace, name, revision, tool_spec = m.groups()
    tool = tool_version = None
    if tool_spec:
        parts = tool_spec.split("/")
        tool = parts[2].lower() if len(parts) > 2 else None
        tool_version = parts[3].lower() if len(parts) > 3 else None
    out = {
        "type": type_.lower(),
        "provider": provider.lower(),
        "namespace": None if namespace == "-" else namespace,
        "name": name,
        "revision": revision,
        "tool": tool,
        "tool_version": tool_version,
    }
    out["canonical_url"] = coord_url(out)
    return out


def coord_url(c: dict) -> str:
    """entitySpec.js:64-75."""
    s = f"cd:/{c['type']}/{c['provider']}/{c['namespace'] or '-'}/{c['name']}"
    if c.get("revision"):
        s += f"/{c['revision']}"
    if c.get("tool"):
        s += f"/tool/{c['tool']}"
    if c.get("tool_version"):
        s += f"/{c['tool_version']}"
    return s


def coord_urn(c: dict, tool: str | None = None) -> str:
    """entitySpec.js:55-62."""
    s = f"urn:{c['type']}:{c['provider']}:{c['namespace'] or '-'}:{c['name']}"
    if c.get("revision"):
        s += f":revision:{c['revision']}"
    t = tool or c.get("tool")
    if t:
        s += f":tool:{t}"
    if c.get("tool_version"):
        s += f":{c['tool_version']}"
    return s


def semver_key_py(version: str) -> int:
    """Twin of functions/versions.py::semver_key (parity-tested)."""
    m = _SEMVER_RE.match(version or "")
    if not m:
        return 0
    cap = (1 << 20) - 1
    maj = min(int(m.group(1)), cap)
    mino = min(int(m.group(2) or 0), cap)
    pat = min(int(m.group(3) or 0), cap)
    return (maj << 40) | (mino << 20) | pat


def is_prerelease_py(version: str) -> bool:
    m = _SEMVER_RE.match(version or "")
    return bool(m and m.group(4))


def latest_version_py(versions: list[str]) -> str | None:
    """baseHandler.js:83-101: max non-prerelease by semver; deterministic
    fallback max(raw) when all are prereleases (see latest_version_agg)."""
    if not versions:
        return None
    stable = [v for v in versions if not is_prerelease_py(v)]
    if stable:
        return max(stable, key=lambda v: (semver_key_py(v), v))
    return max(versions)


def tool_output_span(tool_type: str, subject_url: str) -> list[dict]:
    """Deterministic stand-in for a tool run's stored output (scancode/
    licensee/reuse/clearlydefined CLI execution is out of sandbox scope;
    /root/reference/providers/process/scancode.js:29-66)."""
    return [
        {"kind": "text", "text": f"{tool_type} output for {subject_url}", "media_ref": None, "offset": 0}
    ]


FETCHABLE_TYPES = set(PACKAGE_SPEC_TYPES)  # concrete package types consult the registry


@dataclass
class SimResult:
    schedule_log: list[dict] = field(default_factory=list)  # epoch,pop_index,type,url,queue,scope,outcome,attempt
    seen: dict[str, int] = field(default_factory=dict)  # 'type@url' -> first_seen_epoch
    documents: dict[str, list[dict]] = field(default_factory=dict)  # doc_id -> spans
    deadletters: list[dict] = field(default_factory=list)
    metrics: list[dict] = field(default_factory=list)
    epochs_run: int = 0


class CrawlSimulator:
    def __init__(
        self,
        registry_rows: list[dict],
        robots_rows: list[dict] | None = None,
        host_budget: int = DEFAULT_HOST_BUDGET,
        batch_budget: int = DEFAULT_BATCH_BUDGET,
        rng_seed: int | None = None,
    ):
        self.registry: dict[tuple, list[dict]] = {}
        for r in registry_rows:
            self.registry.setdefault((r["provider"], r["namespace"], r["name"]), []).append(r)
        self.robots = [(r["host"], r["disallow_prefix"]) for r in (robots_rows or [])]
        self.host_budget = host_budget
        self.batch_budget = batch_budget
        self.rng_seed = rng_seed
        self.edges_by_parent: dict[str, list[dict]] = {}
        for e in visitor_edges_py():
            self.edges_by_parent.setdefault(e["parent_type"], []).append(e)
        self.frontier: list[dict] = []
        self.next_seq = 0
        self.res = SimResult()

    # -- enqueue ---------------------------------------------------------------
    def _host_of(self, provider: str) -> str:
        return PROVIDER_HOSTS.get(provider, UNKNOWN_HOST)

    def enqueue_batch(self, entries: list[dict], epoch: int) -> dict:
        """Attenuation + seen-filter + frontier insert; returns counters.

        Attenuation key includes attempt count (attenuatedQueue.js:66-69);
        the URL-seen set is keyed 'type@url' (request.js:382-384). The seen
        set admits a coordinate once, globally — the batch-engine semantic
        for the reference's per-traversal history + attenuated cross-pushes
        (SURVEY.md S2/S3)."""
        counters = {"attenuated": 0, "seen_filtered": 0, "enqueued": 0}
        batch_keys: set[tuple] = set()
        for e in entries:
            # attenuation key includes the policy short form, matching the
            # reference cache key t:{attempt}:{type}@{url}:{policy}
            # (attenuatedQueue.js:66-69)
            policy_root = (e.get("policy") or "default").split(":")[0]
            akey = (e.get("attempt_count", 0), e["type"], e["url"], policy_root)
            if akey in batch_keys:
                counters["attenuated"] += 1
                continue
            batch_keys.add(akey)
            skey = f"{e['type']}@{e['url']}"
            if e.get("attempt_count", 0) == 0:
                if skey in self.res.seen:
                    # explicit re-crawl policies (reprocess*/always/
                    # reharvest*) revisit despite history
                    # (traversalPolicy.js:124-171)
                    if not policy_root.startswith(("reprocess", "always", "reharvest")):
                        counters["seen_filtered"] += 1
                        continue
                else:
                    self.res.seen[skey] = epoch
            e = dict(e)
            e["enqueued_seq"] = self.next_seq
            self.next_seq += 1
            self.frontier.append(e)
            counters["enqueued"] += 1
        return counters

    def seed(self, seeds: list[dict]) -> dict:
        entries = []
        for s in seeds:
            c = canonicalize_py(s["url"])
            entries.append(
                {
                    "type": s["type"],
                    "url": c["canonical_url"],
                    "coord": c,
                    "queue": s.get("queue") or "normal",
                    "scope": "global",
                    "policy": s.get("policy") or "default",
                    "attempt_count": 0,
                    "not_before_epoch": int(s.get("not_before") or 0),
                    "parent_epoch": -1,
                    "host": self._host_of(c["provider"]),
                }
            )
        return self.enqueue_batch(entries, epoch=0)

    # -- one epoch ---------------------------------------------------------------
    def run_epoch(self, epoch: int) -> dict:
        log = self.res.schedule_log
        m = {"epoch": epoch, "robots_excluded": 0, "scheduled": 0, "processed": 0, "skipped": 0,
             "requeued": 0, "deadlettered": 0, "attenuated": 0, "seen_filtered": 0, "enqueued": 0}

        # 1. eligibility: politeness/backoff gate + parent-before-child
        eligible, rest = [], []
        for e in self.frontier:
            (eligible if e["not_before_epoch"] <= epoch and e["parent_epoch"] < epoch else rest).append(e)

        # 2. robots gate (north rule): disallowed coordinate prefixes never scheduled
        allowed = []
        for e in eligible:
            if any(e["host"] == h and e["coord"]["name"].startswith(p) for h, p in self.robots):
                m["robots_excluded"] += 1
                log.append(dict(epoch=epoch, pop_index=-1, type=e["type"], url=e["url"],
                                queue=e["queue"], scope=e["scope"], outcome="RobotsExcluded",
                                attempt=e["attempt_count"], origin="-"))
            else:
                allowed.append(e)

        # 3. per-host politeness budget: first `budget` per host by (scope, seq)
        by_host: dict[str, list[dict]] = {}
        for e in allowed:
            by_host.setdefault(e["host"], []).append(e)
        offered, deferred = [], []
        for h, rows in by_host.items():
            rows.sort(key=lambda e: (0 if e["scope"] == "local" else 1, e["enqueued_seq"]))
            offered.extend(rows[: self.host_budget])
            deferred.extend(rows[self.host_budget:])

        # 4. weighted-rotation pop order over the offered set
        fifo: dict[tuple, list[dict]] = {}
        for e in offered:
            fifo.setdefault((e["scope"], e["queue"]), []).append(e)
        for rows in fifo.values():
            rows.sort(key=lambda e: e["enqueued_seq"])
        counts = {k: len(v) for k, v in fifo.items()}
        self._docs_at_epoch_start = set(self.res.documents)
        rng = epoch_rng(epoch) if self.rng_seed is None else epoch_rng(epoch, self.rng_seed)
        order = pop_schedule(counts, self.batch_budget, rng)
        popped_keys = set()
        children: list[dict] = []
        requeues: list[dict] = []
        for pop_index, (scope, queue, rank) in enumerate(order):
            e = fifo[(scope, queue)][rank]
            popped_keys.add(id(e))
            m["scheduled"] += 1
            outcome, origin = self._process_one(e, epoch, pop_index, children, requeues)
            log.append(dict(epoch=epoch, pop_index=pop_index, type=e["type"], url=e["url"],
                            queue=e["queue"], scope=e["scope"], outcome=outcome,
                            attempt=e["attempt_count"], origin=origin))
            key = {"Processed": "processed", "Skipped": "skipped",
                   "Requeued": "requeued", "Deadletter": "deadlettered"}[outcome]
            m[key] += 1

        # 5. frontier update: unscheduled survivors + requeues + accepted children
        leftovers = [e for e in offered if id(e) not in popped_keys]
        self.frontier = rest + deferred + leftovers
        c1 = self.enqueue_batch(requeues, epoch)
        c2 = self.enqueue_batch(children, epoch)
        for k in ("attenuated", "seen_filtered", "enqueued"):
            m[k] = c1[k] + c2[k]
        self.res.metrics.append(m)
        return m

    # -- request processing -------------------------------------------------------
    def _process_one(self, e: dict, epoch: int, pop_index: int,
                     children: list[dict], requeues: list[dict]) -> tuple[str, str]:
        c = e["coord"]
        rtype = e["type"]
        reg_row = None
        origin = "origin"
        policy_root = (e.get("policy") or "default").split(":")[0]
        if rtype in FETCHABLE_TYPES:
            rows = self.registry.get((c["provider"], c["namespace"], c["name"]))
            # fetch policy (traversalPolicy.js:4-11, 124-171):
            #   default family  → storage-first, origin on miss (mutables)
            #   reprocess family→ storageOnly: storage miss ⇒ markSkip
            #   always/reharvest→ originOnly: ignore storage, fetch origin
            storage_allowed = not policy_root.startswith(("always", "reharvest"))
            storage_only = policy_root.startswith("reprocess")
            if (storage_allowed and c["revision"]
                    and c["canonical_url"] in self._docs_at_epoch_start):
                origin = "storage"
                reg_row = next((r for r in (rows or []) if r["version"] == c["revision"]), None)
                self._expand_children(e, c, reg_row, epoch, children)
                return "Processed", origin
            if storage_only:
                return "Skipped", origin  # storageOnly miss → markSkip (dispatcher shouldFetchMissing=false)
            if not rows:
                return "Skipped", origin  # markSkip 'Missing' (baseHandler.js:103-105)
            if rows[0]["status"] == 404:
                return "Skipped", origin
            if e["attempt_count"] < rows[0]["fail_attempts"]:
                # 429 throttle → requeue w/ backoff or deadletter (goFetch.js:68-75,
                # crawler.js:330-342)
                new_attempt = e["attempt_count"] + 1
                if new_attempt > MAX_REQUEUE_ATTEMPTS:
                    self.res.deadletters.append(dict(url=e["url"], type=rtype, epoch=epoch,
                                                     reason="Throttled", attempts=new_attempt))
                    return "Deadletter", origin
                r = dict(e)
                r["attempt_count"] = new_attempt
                r["scope"] = "global"  # repush lands global (scopedQueueSets.js:62-76)
                r["not_before_epoch"] = epoch + 1 + new_attempt * REQUEUE_DELAY_EPOCHS
                r["parent_epoch"] = e["parent_epoch"]
                requeues.append(r)
                return "Requeued", origin
            # resolve revision: absent → latest non-prerelease (baseHandler.js:83-96)
            if not c["revision"]:
                latest = latest_version_py([r["version"] for r in rows])
                c = dict(c, revision=latest)
                c["canonical_url"] = coord_url(c)
            reg_row = next((r for r in rows if r["version"] == c["revision"]), None)
            if reg_row is None:
                return "Skipped", origin
            self.res.documents[c["canonical_url"]] = reg_row["payload_spans"]
        elif rtype in TERMINAL_TYPES:
            # tool task: storage-first fetch of already-landed content, run tool,
            # store under the tool URN (abstractProcessor.js:224-227)
            self.res.documents[coord_urn(c, tool=rtype)] = tool_output_span(rtype, e["url"])
            self._expand_children(e, c, reg_row, epoch, children)
            return "Processed", origin

        self._expand_children(e, c, reg_row, epoch, children)
        return "Processed", origin

    def _expand_children(self, e: dict, c: dict, reg_row, epoch: int, children: list[dict]):
        """Visitor-map expansion (component/package/source routing + tool
        fan-out) — shared by origin-fetched and storage-served requests."""
        rtype = e["type"]
        for edge in self.edges_by_parent.get(rtype, []):
            cond = edge["condition"]
            if cond == "spec_source" and c["type"] not in SOURCE_SPEC_TYPES:
                continue
            if cond == "spec_package" and c["type"] not in PACKAGE_SPEC_TYPES:
                continue
            if cond == "has_source" and (reg_row is None or not reg_row.get("source_type")):
                continue
            child_type = c["type"] if edge["child_type"] == "$spec" else edge["child_type"]
            if cond == "has_source":
                cc = {
                    "type": reg_row["source_type"],
                    "provider": reg_row["source_provider"],
                    "namespace": reg_row["source_namespace"],
                    "name": reg_row["source_name"],
                    "revision": reg_row["source_revision"],
                    "tool": None,
                    "tool_version": None,
                }
                cc["canonical_url"] = coord_url(cc)
            else:
                cc = dict(c)
            children.append(
                {
                    "type": child_type,
                    "url": cc["canonical_url"],
                    "coord": cc,
                    "queue": e["queue"],  # children inherit origin queue (request.js:272-274)
                    "scope": edge["child_scope"],
                    "policy": f"{e['policy'].split(':')[0]}:{edge['child_name']}",
                    "attempt_count": 0,
                    "not_before_epoch": 0,
                    "parent_epoch": epoch,
                    "host": self._host_of(cc["provider"]),
                }
            )

    def run(self, seeds: list[dict], max_epochs: int = 50) -> SimResult:
        self.seed(seeds)
        epoch = 0
        while self.frontier and epoch < max_epochs:
            self.run_epoch(epoch)
            epoch += 1
        self.res.epochs_run = epoch
        return self.res
