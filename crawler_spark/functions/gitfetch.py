"""GitCloner decision algebra (providers/fetch/gitCloner.js). The clone
itself is byte-level I/O (simulated by design — sandbox, no network);
what the fetcher DECIDES is modeled relationally:

* revision normalization (gitCloner.js:71-83 `_getRevision` — git
  rev-parse after the reset): a shortened commit hash, a tag/branch
  name, 'HEAD', or an absent revision all normalize to the full commit
  sha recorded in the harvested output. Re-expressed as a resolve
  against a per-repo refs dimension (ref name → sha), with git's own
  precedence: a full 40-hex revision is already normal (lowercased); a
  ref-name match wins over a hash-prefix interpretation (git rev-parse
  warns but prefers refs); otherwise a hex prefix ≥4 chars resolves only
  when it matches exactly ONE object (ambiguity errors out → null).
* casedSpec (gitCloner.js:37-41): github coordinates are case-folded to
  lowercase; gitlab's are left as-is.
* repo size (gitCloner.js:85-88 `_getRepoSize`): `size-pack: N` parsed
  out of `git count-objects -v` output, in KB.

Scale note: refs is a dimension keyed by repo (bounded refs per repo);
the resolve is one equi-join on repo + an aggregation over the matched
candidates — broadcast when the dim is small, shuffle-keyed otherwise.
No inequality join: prefix matching happens AFTER the repo-key join,
inside the aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_FULL_SHA = r"^[0-9a-fA-F]{40}$"
_HEX_PREFIX = r"^[0-9a-fA-F]{4,39}$"


def git_resolve_revision(specs: DataFrame, refs: DataFrame) -> DataFrame:
    """Normalize `specs.revision` against a refs dimension.

    specs columns: spec_id, repo, revision (nullable — null means clone
    default HEAD). refs columns: repo, ref (branch/tag name, plus one
    'HEAD' row per repo for the default branch), sha (40-hex, lower).
    Output: (spec_id, repo, revision, sha) — sha null when unresolvable.
    """
    j = specs.join(refs, "repo", "left")
    is_prefix = F.col("revision").rlike(_HEX_PREFIX)
    ref_hit = F.when(F.col("ref") == F.coalesce(F.col("revision"), F.lit("HEAD")), F.col("sha"))
    prefix_hit = F.when(
        is_prefix & F.col("sha").startswith(F.lower(F.col("revision"))), F.col("sha")
    )
    # ref names are unique per repo → at most one non-null ref_hit per
    # group; max() picks it deterministically
    agg = j.groupBy("spec_id", "repo", "revision").agg(
        F.max(ref_hit).alias("_ref_sha"),
        F.collect_set(prefix_hit).alias("_prefix_shas"),
    )
    return agg.select(
        "spec_id", "repo", "revision",
        F.when(F.col("revision").rlike(_FULL_SHA), F.lower(F.col("revision")))
        .when(F.col("_ref_sha").isNotNull(), F.col("_ref_sha"))
        .when(F.size("_prefix_shas") == 1, F.get("_prefix_shas", 0))
        .alias("sha"),
    )


def git_cased_spec(provider: Column, namespace: Column, name: Column) -> Column:
    """github → lowercase both coordinate parts; every other git host
    keeps the spec's casing (gitCloner.js:37-41)."""
    is_gh = provider == "github"
    return F.struct(
        F.when(is_gh, F.lower(namespace)).otherwise(namespace).alias("namespace"),
        F.when(is_gh, F.lower(name)).otherwise(name).alias("name"),
    )


def git_repo_size_kb(count_objects_out: Column) -> Column:
    """`size-pack: N` (KB) out of `git count-objects -v` output.
    The trailing-\\n requirement is REFERENCE-FAITHFUL: gitCloner.js:85-88
    matches `'size-pack: (.*)\\n'` too (git's own output always ends each
    stat line with \\n, and the reference would throw on a no-match where
    this returns null — strictly more robust, same accepted inputs)."""
    ex = F.regexp_extract(count_objects_out, r"size-pack: (\d+)\n", 1)
    return F.when(ex != "", ex.cast("long"))
