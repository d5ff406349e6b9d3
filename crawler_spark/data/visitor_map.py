"""Traversal-expansion edge table (the crawl-graph program).

Edges reflect the *actual queueing behavior* of the reference processors,
not just the declarative map (/root/reference/config/map.js:19-184):

- `component` routes to `source` or `package` by coordinate type
  (/root/reference/providers/process/component.js:17-26).
- `package` re-dispatches as the concrete package type
  (/root/reference/providers/process/package.js:18-24).
- concrete package types queue local tool tasks {licensee, scancode,
  reuse} — fossology commented out in addLocalToolTasks
  (/root/reference/providers/process/abstractProcessor.js:243-246) — plus
  a `source` request when source discovery succeeds
  (/root/reference/providers/process/npmExtract.js:41-45).
- `source` queues {clearlydefined, licensee, scancode, reuse} on
  scope='local' (/root/reference/providers/process/source.js:18-23).
- tool types are terminals (config/map.js:5-17, visitorMap.js:94-105).

`condition` values gate edge applicability at expansion time:
  always      — unconditional
  spec_source — coordinate type ∈ SOURCE_SPEC_TYPES
  spec_package— coordinate type ∈ PACKAGE_SPEC_TYPES
  has_source  — fetched document discovered a source location
`child_type='$spec'` means "the coordinate's own type" (package.js:22).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# /root/reference/providers/process/source.js:5
SOURCE_SPEC_TYPES: tuple[str, ...] = ("git", "sourcearchive", "debsrc", "condasrc")
# /root/reference/providers/process/package.js:6
PACKAGE_SPEC_TYPES: tuple[str, ...] = (
    "npm", "conda", "crate", "maven", "nuget", "gem", "go", "pod", "pypi", "composer", "deb",
)
# abstractProcessor.js:243-246 (fossology excluded)
TOOL_TASKS: tuple[str, ...] = ("licensee", "scancode", "reuse")
TERMINAL_TYPES: tuple[str, ...] = ("licensee", "scancode", "reuse", "clearlydefined", "fossology")

VISITOR_EDGES: list[tuple[str, str, str, str, str]] = (
    # (parent_type, child_name, child_type, child_scope, condition)
    [
        ("component", "source", "source", "global", "spec_source"),
        ("component", "package", "package", "global", "spec_package"),
        ("package", "dispatch", "$spec", "global", "spec_package"),
    ]
    + [(t, "source", "source", "global", "has_source") for t in PACKAGE_SPEC_TYPES]
    + [(t, tool, tool, "local", "always") for t in PACKAGE_SPEC_TYPES for tool in TOOL_TASKS]
    + [("source", "clearlydefined", "clearlydefined", "local", "always")]
    + [("source", tool, tool, "local", "always") for tool in TOOL_TASKS]
)

# Types with outgoing edges — VisitorMap.hasNextStep
# (/root/reference/ghcrawler/lib/visitorMap.js:94-105): an unprocessed
# request of one of these types is still traversed (crawler.js:495-499);
# the rest are terminals → markSkip('Excluded').
TRAVERSABLE_TYPES: tuple[str, ...] = tuple(sorted({p for (p, _n, _t, _s, _c) in VISITOR_EDGES}))

VISITOR_MAP_SCHEMA = "parent_type string, child_name string, child_type string, child_scope string, condition string"


def visitor_map_df(spark: SparkSession) -> DataFrame:
    """Tiny static dim — always broadcast into the expansion join."""
    return spark.createDataFrame(VISITOR_EDGES, schema=VISITOR_MAP_SCHEMA)


def visitor_edges_py() -> list[dict]:
    """Same edges for the pure-Python reference simulator."""
    return [
        dict(parent_type=p, child_name=n, child_type=t, child_scope=s, condition=c)
        for (p, n, t, s, c) in VISITOR_EDGES
    ]
