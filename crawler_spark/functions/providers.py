"""Per-provider fetch-protocol algebra (F2–F15 fidelity layer).

Each function re-expresses one provider-specific decode/match rule from
/root/reference/providers/fetch/*.js as JVM-side column expressions or a
small relational plan — no Python in any hot path, everything
DuckDB-mirrorable for the oracle harness.

* packagist `__unset` delta-decode — packagistFetch.js:64-91
* golang lexical-last version      — goFetch.js:86-95
* cocoapods md5-prefix shard path  — podFetch.js:160-181
* conda (name, version, build-prefix) match — condaFetch.js:85-114
* debian copyright License-line parse       — debianFetch.js:346-385
* rubygems gem URL / skip algebra / metadata date chain — rubyGemsFetch.js
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# packagist: versioned-manifest delta fold (packagistFetch.js:64-91)
# ---------------------------------------------------------------------------


def packagist_effective_manifest(
    deltas: DataFrame,
    target_version: str,
    package_col: str = "package",
    idx_col: str = "idx",
    version_col: str = "version",
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """Effective manifest per package at `target_version`.

    The reference walks version objects 0..targetIndex, spreading each
    into an accumulator and DELETING keys whose value is the literal
    '__unset' (packagistFetch.js:80-89). Because only the LAST write of a
    key ≤ target survives that fold, the fold is exactly a relational
    arg-max: effective[key] = max_by(value, idx) over idx ≤ target_idx,
    dropped when that winning value is '__unset'. Packages whose version
    list lacks the target (both '{v}' and 'v{v}' forms tried,
    packagistFetch.js:70-75) produce no rows (targetIndex === -1 → null).

    One shuffle keyed (package, key) with map-side partial max_by.
    """
    pk, idx, ver = F.col(package_col), F.col(idx_col), F.col(version_col)
    target_idx = (
        deltas.filter((ver == target_version) | (ver == f"v{target_version}"))
        .groupBy(package_col)
        .agg(F.min(idx).alias("_target_idx"))
    )
    j = deltas.join(target_idx, package_col).filter(idx <= F.col("_target_idx"))
    eff = (
        j.groupBy(package_col, key_col)
        .agg(F.max_by(F.col(value_col), idx).alias(value_col))
        .filter(F.col(value_col) != "__unset")
    )
    return eff


# ---------------------------------------------------------------------------
# golang: lexical version sort, take last (goFetch.js:86-95)
# ---------------------------------------------------------------------------


def go_latest_agg(version: Column) -> Column:
    """The proxy.golang.org @v/list resolution: plain string sort of the
    newline list, last element — i.e. a lexical max, NOT semver
    (goFetch.js:91 `versions.sort(); versions[versions.length-1]`)."""
    return F.max(version)


# ---------------------------------------------------------------------------
# cocoapods: master-repo md5 shard path (podFetch.js:160-181)
# ---------------------------------------------------------------------------


def pod_path_fragment(
    name: Column, revision: Column | None = None, prefix_lengths: tuple[int, ...] = (1, 1, 1)
) -> Column:
    """CocoaPods CDN path fragment: successive md5(name) hex prefixes of
    the configured lengths, then the name, then the revision —
    '/'-joined (the rubydoc path_fragment port, podFetch.js:161-180)."""
    h = F.md5(name)
    parts: list[Column] = []
    off = 1
    for ln in prefix_lengths:
        parts.append(F.substring(h, off, ln))
        off += ln
    parts.append(name)
    if revision is not None:
        parts.append(revision)
    return F.concat_ws("/", *parts)


# ---------------------------------------------------------------------------
# conda: repodata package match (condaFetch.js:85-114)
# ---------------------------------------------------------------------------


def conda_match_packages(
    specs: DataFrame,
    repodata: DataFrame,
    spec_id_col: str = "spec_id",
) -> DataFrame:
    """Vectorized _matchPackage: for each spec row (spec_id, name,
    version?, build_prefix?) pick the repodata row (name, version, build,
    timestamp, package_file) where name matches, version matches when
    given, build startswith build_prefix when given — newest timestamp
    first with `timestamp || 0` NULL-handling (condaFetch.js:112 sort: a
    match with no timestamp still matches, it just sorts last). Returns
    (spec_id, package_file, resolved_revision='{version}-{build}').

    The reference's stable sort keeps repodata enumeration order on
    equal timestamps; enumeration order has no column here, so ties
    break deterministically by package_file ascending instead of
    partition order.

    Hash join on name (uniform); one min_by per spec."""
    s = specs.select(
        F.col(spec_id_col),
        F.col("name"),
        F.col("version").alias("_want_version"),
        F.col("build_prefix").alias("_want_build"),
    )
    j = s.join(repodata, "name").filter(
        (F.col("_want_version").isNull() | (F.col("_want_version") == F.col("version")))
        & (F.col("_want_build").isNull() | F.col("build").startswith(F.col("_want_build")))
    )
    key = F.struct(
        (F.lit(0) - F.coalesce(F.col("timestamp"), F.lit(0))).alias("t"),
        F.col("package_file").alias("f"),
    )
    return (
        j.groupBy(spec_id_col)
        .agg(
            F.min_by(F.struct("package_file", "version", "build"), key).alias("_w")
        )
        .select(
            F.col(spec_id_col),
            F.col("_w.package_file").alias("package_file"),
            F.concat(F.col("_w.version"), F.lit("-"), F.col("_w.build")).alias("resolved_revision"),
        )
    )


# ---------------------------------------------------------------------------
# maven: parent-POM chain walk + first-wins merge (mavenBasedFetch.js:124-173)
# ---------------------------------------------------------------------------


def maven_merged_poms(
    poms: DataFrame,
    fields: list[str],
    max_depth: int = 5,
) -> DataFrame:
    """_getPoms walks child → parent recursively, then _mergePoms spreads
    [root-ancestor … child] in order so for every field the NEAREST
    DESCENDANT that defines it wins (later spreads override; absent keys
    keep the ancestor's value). Null models 'absent', so the merged field
    is coalesce(child, parent, grandparent, …) up the chain.

    `poms` columns: group_id, artifact_id, version, parent_group,
    parent_artifact, parent_version + `fields`. The recursion becomes
    `max_depth` bounded self-joins on the (group, artifact, version) key
    (the reference recurses until a POM has no <parent>; real chains are
    ≤4-5 deep). Each join is a plain equi-hash-join — broadcast when the
    POM dim is small, shuffle-keyed on the coordinate otherwise.
    """
    key = ["group_id", "artifact_id", "version"]
    eff = poms.select(
        *key,
        F.col("parent_group").alias("_pg"),
        F.col("parent_artifact").alias("_pa"),
        F.col("parent_version").alias("_pv"),
        *[F.col(f) for f in fields],
    )
    for _ in range(max_depth):
        parent = poms.select(
            F.col("group_id").alias("_pg"),
            F.col("artifact_id").alias("_pa"),
            F.col("version").alias("_pv"),
            F.col("parent_group").alias("_ppg"),
            F.col("parent_artifact").alias("_ppa"),
            F.col("parent_version").alias("_ppv"),
            *[F.col(f).alias(f"_p_{f}") for f in fields],
        )
        eff = eff.join(parent, ["_pg", "_pa", "_pv"], "left").select(
            *key,
            F.col("_ppg").alias("_pg"),
            F.col("_ppa").alias("_pa"),
            F.col("_ppv").alias("_pv"),
            *[F.coalesce(F.col(f), F.col(f"_p_{f}")).alias(f) for f in fields],
        )
    return eff.select(*key, *fields)


# ---------------------------------------------------------------------------
# debian: copyright-file License-line parse (debianFetch.js:346-385)
# ---------------------------------------------------------------------------


def _replace_first(col: Column, find: str, repl: str) -> Column:
    """JS String.replace(str, str) replaces only the FIRST occurrence;
    Spark regexp_replace replaces all — splice manually via instr."""
    pos = F.instr(col, F.lit(find))
    return F.when(
        pos > 0,
        F.concat(
            F.substring(col, F.lit(1), pos - 1),
            F.lit(repl),
            F.substring(col, pos + len(find), F.lit(2147483647)),
        ),
    ).otherwise(col)


def debian_declared_licenses(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, license) rows from a debian/copyright body — the reference's
    _parseDeclaredLicenses including its documented over-simplifications:

    * only lines starting 'License: ' count (debianFetch.js:349-351)
    * CPL→CPL-1.0 unless RSCPL; /expat/i→MIT (first occurrence, 353-361)
    * 'A or B'            → '(A OR B)' (with ' and '→' AND ' inside)
    * 'A or B, and C'     → '(A OR B)' + 'C'
    * 'A and B'           → 'A' + 'B'
    * results are a set (uniqued)
    """
    lines = F.filter(
        F.split(F.col(text_col), "\n"), lambda ln: ln.startswith("License: ")
    )
    ids = F.transform(lines, lambda ln: F.trim(F.regexp_replace(ln, r"^License:", "")))

    def normalize(lid: Column) -> Column:
        cpl = F.when(
            lid.contains("CPL") & ~lid.contains("RSCPL"), _replace_first(lid, "CPL", "CPL-1.0")
        ).otherwise(lid)
        # /expat/i first occurrence → MIT: lower() spans the whole id, so
        # locate on the lowercased copy and splice the original
        low = F.lower(cpl)
        pos = F.instr(low, F.lit("expat"))
        return F.when(
            pos > 0,
            F.concat(
                F.substring(cpl, F.lit(1), pos - 1),
                F.lit("MIT"),
                F.substring(cpl, pos + 5, F.lit(2147483647)),
            ),
        ).otherwise(cpl)

    def branch(lid: Column) -> Column:
        has_or = lid.contains(" or ")
        has_comma = lid.contains(",")
        has_and = lid.contains(" and ")
        simple_or = F.array(
            F.concat(
                F.lit("("),
                _replace_first(_replace_first(lid, " or ", " OR "), " and ", " AND "),
                F.lit(")"),
            )
        )
        or_comma = F.transform(
            F.split(_replace_first(lid, " or ", " OR "), " and "),
            lambda part: F.when(
                part.contains("OR") & part.endswith(","),
                F.concat(F.lit("("), _replace_first(part, ",", ")")),
            ).otherwise(part),
        )
        and_split = F.split(lid, " and ")
        return (
            F.when(has_or & ~has_comma, simple_or)
            .when(has_or & has_comma, or_comma)
            .when(has_and, and_split)
            .otherwise(F.array(lid))
        )

    out = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.flatten(F.transform(ids, lambda ln: branch(normalize(ln))))).alias("license"),
    )
    return out.distinct()


# ---------------------------------------------------------------------------
# rubygems: gem URL / revision fallback / metadata date chain
# (rubyGemsFetch.js:24-50, 62-64, 100-115)
# ---------------------------------------------------------------------------


def gem_url(namespace: Column, name: Column, revision: Column) -> Column:
    """`https://rubygems.org/gems/<fullName>-<revision>.gem` where
    fullName prefixes the optional namespace with '/'
    (rubyGemsFetch.js:62-64)."""
    full = F.when(
        namespace.isNotNull(), F.concat(namespace, F.lit("/"), name)
    ).otherwise(name)
    return F.concat(F.lit("https://rubygems.org/gems/"), full, F.lit("-"), revision, F.lit(".gem"))


def gem_fetch_outcome(has_registry: Column, resolved_revision: Column) -> Column:
    """handle()'s skip algebra (rubyGemsFetch.js:26-33): no registryData
    → Skipped; revision (spec's or the registry's `version` fallback)
    still missing → Skipped; else Fetched."""
    return (
        F.when(~has_registry, "Skipped")
        .when(resolved_revision.isNull(), "Skipped")
        .otherwise("Fetched")
    )


def gem_release_date(
    metadata_txt: Column, metadata_mtime: Column, now: Column | str
) -> Column:
    """_extractReleaseDate (rubyGemsFetch.js:100-115): the decompressed
    gemspec metadata is scanned for `/date:\\s\\d{4}-\\d{1,2}-\\d{1,2}/`;
    the captured date goes through extractDate, and any failure — no
    match, or a NON-ZERO-PADDED date, which every luxon branch rejects
    ('2015-3-9' is invalid fromISO/fromSQL; Spark's lenient cast would
    accept it, so the pad-check keeps the twins aligned) — falls back to
    metadata.gz's mtime. A null metadata_txt means no metadata.txt was
    extracted: the reference returns undefined (no mtime fallback)."""
    from crawler_spark.functions.dates import extract_date

    m = F.regexp_extract(metadata_txt, r"date:\s(\d{4}-\d{1,2}-\d{1,2})", 1)
    parsed = F.when(m.rlike(r"^\d{4}-\d{2}-\d{2}$"), extract_date(m, now))
    return F.when(metadata_txt.isNotNull(), F.coalesce(parsed, metadata_mtime))
