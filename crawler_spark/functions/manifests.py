"""Per-ecosystem manifest candidate-URL extraction (P4-P13) and fallback
source-spec fabrication.

The reference's per-ecosystem extract processors each walk their manifest /
registry JSON in a fixed field-priority order to produce the ordered
candidate-URL list fed to sourceDiscovery:

* npm      — providers/process/npmExtract.js:60-80: for manifest THEN
             registry manifest: repository.url, url, homepage (first element
             if an array), bugs (the string itself when it starts with http,
             else bugs.url).
* maven    — providers/process/mavenExtract.js:42-46: summary.scm[0].url[0];
             no hit => fabricated `sourcearchive` spec of the same
             coordinates (mavenExtract.js:57-63).
* pypi     — providers/process/pypiExtract.js:38-50: info.bugtrack_url,
             docs_url, download_url, home_page, package_url, project_url,
             release_url.
* rubygems — providers/process/gemExtract.js:42-55: bug_tracker_uri,
             changelog_uri, documentation_uri, gem_uri, homepage_uri,
             mailing_list_uri, source_code_uri.
* cratesio — providers/process/crateExtract.js:44-49: manifest.repository,
             homepage, documentation.
* packagist— providers/process/composerExtract.js:61-88: for manifest THEN
             registry manifest: source.url, dist.url, homepage, bugs (same
             string-vs-object rule as npm).
* cocoapods— providers/process/podExtract.js:46-58: source.http then
             source.git (mutually exclusive in real podspecs).
* conda    — providers/process/condaExtract.js:37-45: channelData.source_url,
             source_git_url, home, dev_url, doc_url, doc_source_url; no hit
             => `condasrc` spec, namespace null, revision before the first
             '-' (condaExtract.js:52-57).
* nuget    — providers/process/nugetExtract.js:77-103: for nuspec
             package.metadata THEN catalog manifest THEN latest nuspec:
             repository.url, projectUrl, licenseUrl.
* debian   — providers/process/debExtract.js:54-65: no URL discovery; the
             registry entry whose Architecture matches the spec's revision
             suffix supplies a Source name => `debsrc` spec (name may
             differ from the binary package, revision drops the arch).
* golang   — providers/process/goExtract.js: registryData passthrough, no
             source discovery.

Spark shape: everything here is a pure JVM projection (`get_json_object`
per fixed path — whole-stage codegen, no shuffle, no UDF). The candidate
array then feeds operators/discovery.py::discover_sources, whose only
shuffles key on (owner, name) and the request id. At 100 TB the extraction
cost is a per-row constant; field paths are static so Catalyst folds the
path literals.

Pure-Python twins (`*_py`) mirror each function for simulator parity.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# candidate-URL extraction
# ---------------------------------------------------------------------------


def _npm_style(doc: Column) -> list[Column]:
    """repository.url, url, homepage (first if array), bugs — npmExtract.js:60-80."""
    gjo = lambda p: F.get_json_object(doc, p)  # noqa: E731
    raw_home = gjo("$.homepage")
    homepage = F.when(raw_home.startswith("["), gjo("$.homepage[0]")).otherwise(raw_home)
    raw_bugs = gjo("$.bugs")
    bugs = F.when(raw_bugs.startswith("http"), raw_bugs).otherwise(gjo("$.bugs.url"))
    return [gjo("$.repository.url"), gjo("$.url"), homepage, bugs]


def _composer_style(doc: Column) -> list[Column]:
    """source.url, dist.url, homepage, bugs — composerExtract.js:61-77."""
    gjo = lambda p: F.get_json_object(doc, p)  # noqa: E731
    raw_bugs = gjo("$.bugs")
    bugs = F.when(raw_bugs.startswith("http"), raw_bugs).otherwise(gjo("$.bugs.url"))
    return [gjo("$.source.url"), gjo("$.dist.url"), gjo("$.homepage"), bugs]


def _nuget_style(doc: Column) -> list[Column]:
    """repository.url, projectUrl, licenseUrl — nugetExtract.js:88-103."""
    gjo = lambda p: F.get_json_object(doc, p)  # noqa: E731
    return [gjo("$.repository.url"), gjo("$.projectUrl"), gjo("$.licenseUrl")]


def _paths(doc: Column, paths: list[str]) -> list[Column]:
    return [F.get_json_object(doc, p) for p in paths]


_PYPI_PATHS = [
    "$.info.bugtrack_url", "$.info.docs_url", "$.info.download_url",
    "$.info.home_page", "$.info.package_url", "$.info.project_url",
    "$.info.release_url",
]
_GEM_PATHS = [
    "$.bug_tracker_uri", "$.changelog_uri", "$.documentation_uri",
    "$.gem_uri", "$.homepage_uri", "$.mailing_list_uri", "$.source_code_uri",
]
_CRATE_PATHS = ["$.repository", "$.homepage", "$.documentation"]
_POD_PATHS = ["$.source.http", "$.source.git"]
_CONDA_PATHS = [
    "$.channelData.source_url", "$.channelData.source_git_url",
    "$.channelData.home", "$.channelData.dev_url", "$.channelData.doc_url",
    "$.channelData.doc_source_url",
]


def candidate_source_urls(
    provider: Column,
    manifest: Column,
    registry: Column,
    extra: Column | None = None,
) -> Column:
    """Ordered candidate-URL array for one (provider, manifest docs) row.

    `manifest` / `registry` / `extra` are JSON *strings* (the reference's
    package manifest, registry response, and — for nuget — the latest
    nuspec). Unknown providers and golang/debian yield an empty array.
    Nulls are filtered after ordering, exactly like the reference's
    `.filter(e => e)`.
    """
    if extra is None:
        extra = F.lit(None).cast("string")
    arr = (
        F.when(provider == "npmjs", F.array(*_npm_style(manifest), *_npm_style(registry)))
        .when(provider == "mavencentral", F.array(*_paths(registry, ["$.summary.scm[0].url[0]"])))
        .when(provider == "pypi", F.array(*_paths(registry, _PYPI_PATHS)))
        .when(provider == "rubygems", F.array(*_paths(registry, _GEM_PATHS)))
        .when(provider == "cratesio", F.array(*_paths(manifest, _CRATE_PATHS)))
        .when(provider == "packagist", F.array(*_composer_style(manifest), *_composer_style(registry)))
        .when(provider == "cocoapods", F.array(*_paths(registry, _POD_PATHS)))
        .when(provider == "condaforge", F.array(*_paths(registry, _CONDA_PATHS)))
        .when(provider == "nuget", F.array(*_nuget_style(registry), *_nuget_style(manifest), *_nuget_style(extra)))
        .otherwise(F.array().cast("array<string>"))
    )
    # `.filter(e => e)` is a TRUTHINESS filter: empty strings drop too
    # (matching candidate_source_urls_py's `if c`)
    return F.filter(arr, lambda x: x.isNotNull() & (x != ""))


# ---------------------------------------------------------------------------
# fallback source specs (discovery found nothing)
# ---------------------------------------------------------------------------


def fallback_source_struct(
    provider: Column, namespace: Column, name: Column, revision: Column
) -> Column:
    """struct(source_type, source_provider, source_namespace, source_name,
    source_revision) for providers that fabricate a spec when GitHub
    discovery fails; null struct for everyone else.

    * mavencentral -> sourcearchive, same coordinates (mavenExtract.js:57-63)
    * condaforge   -> condasrc, namespace null, revision before first '-'
                      (condaExtract.js:52-57)
    debian's debsrc fallback needs the registry entries relation — see
    `debsrc_sources`.
    """
    st = lambda t, p, ns, n, r: F.struct(  # noqa: E731
        t.alias("source_type"), p.alias("source_provider"),
        ns.alias("source_namespace"), n.alias("source_name"),
        r.alias("source_revision"),
    )
    return (
        F.when(
            provider == "mavencentral",
            st(F.lit("sourcearchive"), provider, namespace, name, revision),
        ).when(
            provider == "condaforge",
            st(F.lit("condasrc"), provider, F.lit(None).cast("string"), name,
               F.split(revision, "-")[0]),
        )
    )


def debsrc_sources(specs: DataFrame, entries: DataFrame) -> DataFrame:
    """debExtract.js:54-65 — spec revision is '<version>_<architecture>';
    the registry entry with matching Architecture supplies the Source
    (source package name may differ from the binary). Emits one row per
    spec that resolved: (spec_id, source_type, source_provider,
    source_namespace, source_name, source_revision).

    `specs`: (spec_id, name, revision);  `entries`: (name, architecture,
    source — nullable). Equi-join on (name, architecture): uniform keys,
    entries side is the registry dim (broadcast when small).
    """
    parts = F.split("revision", "_")
    s = specs.select(
        "spec_id", "name",
        F.try_element_at(parts, F.lit(1)).alias("_rev"),
        F.try_element_at(parts, F.lit(2)).alias("_arch"),
    )
    j = s.join(
        entries.select(
            F.col("name"), F.col("architecture").alias("_arch"),
            F.col("source").alias("_src"),
        ),
        ["name", "_arch"],
    ).filter(F.col("_src").isNotNull())
    return j.select(
        "spec_id",
        F.lit("debsrc").alias("source_type"),
        F.lit("debian").alias("source_provider"),
        F.lit(None).cast("string").alias("source_namespace"),
        F.col("_src").alias("source_name"),
        F.col("_rev").alias("source_revision"),
    )


def extract_and_discover(
    docs: DataFrame,
    tags: DataFrame,
    id_col: str = "doc_id",
    provider_col: str = "provider",
    version_col: str = "version",
    manifest_col: str = "manifest_json",
    registry_col: str = "registry_json",
) -> DataFrame:
    """End-to-end P4-P13: manifest JSON -> ordered candidates -> tag-match
    discovery -> per-provider fallback spec. One row per input doc;
    source_* columns null when neither discovery nor a fallback applies
    (no `source` child edge, abstractClearlyDefinedProcessor flow)."""
    from crawler_spark.operators.discovery import discover_sources

    base = docs.withColumn(
        "_cands",
        candidate_source_urls(
            F.col(provider_col), F.col(manifest_col), F.col(registry_col)
        ),
    )
    found = discover_sources(
        base.select(
            F.col(id_col).alias("request_id"),
            F.col(version_col).alias("version"),
            F.col("_cands").alias("candidate_urls"),
        ),
        tags,
    ).select(
        F.col("request_id").alias(id_col),
        F.lit("git").alias("_d_type"), F.lit("github").alias("_d_provider"),
        F.col("owner").alias("_d_ns"), F.col("name").alias("_d_name"),
        F.col("sha").alias("_d_rev"),
    )
    out = base.join(found, id_col, "left")
    fb = fallback_source_struct(
        F.col(provider_col),
        F.col("namespace") if "namespace" in docs.columns else F.lit(None).cast("string"),
        F.col("name") if "name" in docs.columns else F.lit(None).cast("string"),
        F.col(version_col),
    )
    return out.select(
        *[F.col(c) for c in docs.columns],
        F.coalesce(F.col("_d_type"), fb["source_type"]).alias("source_type"),
        F.coalesce(F.col("_d_provider"), fb["source_provider"]).alias("source_provider"),
        F.coalesce(F.col("_d_ns"), fb["source_namespace"]).alias("source_namespace"),
        F.coalesce(F.col("_d_name"), fb["source_name"]).alias("source_name"),
        F.coalesce(F.col("_d_rev"), fb["source_revision"]).alias("source_revision"),
    )


# ---------------------------------------------------------------------------
# pure-Python twins (simulator / fixture parity)
# ---------------------------------------------------------------------------


def _get(d: Any, path: list[Any]) -> Any:
    cur = d
    for k in path:
        if cur is None:
            return None
        if isinstance(k, int):
            cur = cur[k] if isinstance(cur, list) and len(cur) > k else None
        else:
            cur = cur.get(k) if isinstance(cur, dict) else None
    return cur


def _npm_style_py(doc: dict | None) -> list:
    if not doc:
        return []
    out = [_get(doc, ["repository", "url"]), doc.get("url")]
    homepage = doc.get("homepage")
    if isinstance(homepage, list):
        homepage = homepage[0] if homepage else None
    out.append(homepage)
    bugs = doc.get("bugs")
    if bugs:
        if isinstance(bugs, str):
            out.append(bugs if bugs.startswith("http") else None)
        else:
            out.append(bugs.get("url") if isinstance(bugs, dict) else None)
    return out


def _composer_style_py(doc: dict | None) -> list:
    if not doc:
        return []
    out = [_get(doc, ["source", "url"]), _get(doc, ["dist", "url"]), doc.get("homepage")]
    bugs = doc.get("bugs")
    if bugs:
        if isinstance(bugs, str):
            out.append(bugs if bugs.startswith("http") else None)
        else:
            out.append(bugs.get("url") if isinstance(bugs, dict) else None)
    return out


def _nuget_style_py(doc: dict | None) -> list:
    if not doc:
        return []
    return [_get(doc, ["repository", "url"]), doc.get("projectUrl"), doc.get("licenseUrl")]


def candidate_source_urls_py(
    provider: str, manifest: str | None, registry: str | None, extra: str | None = None
) -> list[str]:
    m = json.loads(manifest) if manifest else None
    r = json.loads(registry) if registry else None
    x = json.loads(extra) if extra else None
    if provider == "npmjs":
        cands = _npm_style_py(m) + _npm_style_py(r)
    elif provider == "mavencentral":
        cands = [_get(r, ["summary", "scm", 0, "url", 0])]
    elif provider == "pypi":
        cands = [_get(r, ["info", k]) for k in (
            "bugtrack_url", "docs_url", "download_url", "home_page",
            "package_url", "project_url", "release_url")]
    elif provider == "rubygems":
        cands = [_get(r, [k]) for k in (
            "bug_tracker_uri", "changelog_uri", "documentation_uri",
            "gem_uri", "homepage_uri", "mailing_list_uri", "source_code_uri")]
    elif provider == "cratesio":
        cands = [_get(m, [k]) for k in ("repository", "homepage", "documentation")]
    elif provider == "packagist":
        cands = _composer_style_py(m) + _composer_style_py(r)
    elif provider == "cocoapods":
        cands = [_get(r, ["source", "http"]), _get(r, ["source", "git"])]
    elif provider == "condaforge":
        cands = [_get(r, ["channelData", k]) for k in (
            "source_url", "source_git_url", "home", "dev_url", "doc_url",
            "doc_source_url")]
    elif provider == "nuget":
        cands = _nuget_style_py(r) + _nuget_style_py(m) + _nuget_style_py(x)
    else:
        cands = []
    return [c for c in cands if c]


def fallback_source_py(
    provider: str, namespace: str | None, name: str, revision: str
) -> dict | None:
    if provider == "mavencentral":
        return {
            "source_type": "sourcearchive", "source_provider": provider,
            "source_namespace": namespace, "source_name": name,
            "source_revision": revision,
        }
    if provider == "condaforge":
        return {
            "source_type": "condasrc", "source_provider": provider,
            "source_namespace": None, "source_name": name,
            "source_revision": revision.split("-")[0],
        }
    return None


def debsrc_source_py(name: str, revision: str, entries: list[dict]) -> dict | None:
    parts = revision.split("_")
    rev, arch = parts[0], (parts[1] if len(parts) > 1 else None)
    match = next(
        (e for e in entries
         if e.get("name") == name and e.get("architecture") == arch and e.get("source")),
        None,
    )
    if not match:
        return None
    return {
        "source_type": "debsrc", "source_provider": "debian",
        "source_namespace": None, "source_name": match["source"],
        "source_revision": rev,
    }
