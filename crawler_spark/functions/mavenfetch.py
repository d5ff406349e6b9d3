"""Maven-family fetch algebra (mavenBasedFetch.js + the three concrete
providers mavencentralFetch.js / mavenGoogleFetch.js / gradlePluginFetch.js).

The byte-level side (jar download, decompress, hash) is simulated by
design (SURVEY §8.4 — sandbox, no network); what these kernels model is
every DECISION the fetcher makes, as pure column expressions:

* latest-version resolution routes by provider — mavencentral asks
  solrsearch and takes `response.docs[0].latestVersion`
  (mavencentralFetch.js:17-22); mavengoogle/gradleplugin read
  `maven-metadata.xml` and take `metadata.versioning[0].release[0]`
  (mavenBasedFetch.js:77-88). NOT a max-semver — the repository's own
  "release" pointer wins.
* artifact resolution tries extensions in priority order and takes the
  first that exists: sourcearchive → ['-sources.jar'], everything else →
  ['.jar', '.aar'] (mavenBasedFetch.js:100-122); none found → markSkip.
* handle() skip algebra: missing namespace or unresolvable revision →
  markSkip; zero POMs → markSkip; no artifact → markSkip
  (mavenBasedFetch.js:40-57).
* casedSpec: the merged POM summary's groupId/artifactId override the
  spec's casing when present (mavenBasedFetch.js:66-71).
* release-date chain: central first consults the solrsearch `timestamp`
  (epoch-ms, mavencentralFetch.js:24-34), then every provider falls back
  to pom.properties (each line's FIRST CHARACTER sliced off before the
  extractDate parse — the stamp line starts with '#',
  mavenBasedFetch.js:174-183), then MANIFEST.MF mtime, then any file's
  mtime (mavenBasedFetch.js:184-197).

Scale note: all kernels are expression-only (whole-stage codegen, no
UDFs, no shuffle); the pom.properties scan is an array HOF over a
lines column, bounded by file size.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawler_spark.functions.dates import extract_date

MAVEN_BASES = {
    "mavencentral": "https://search.maven.org/remotecontent?filepath=",
    "mavengoogle": "https://dl.google.com/android/maven2/",
    "gradleplugin": "https://plugins.gradle.org/m2/",
}


def maven_latest_version(
    provider: Column, metadata_release: Column, solr_latest: Column
) -> Column:
    """Provider-routed latest: central → solrsearch latestVersion;
    google/gradleplugin → repository-metadata release pointer. Null when
    the routed source has no answer (handle() then markSkips)."""
    return F.when(provider == "mavencentral", solr_latest).when(
        provider.isin("mavengoogle", "gradleplugin"), metadata_release
    )


def maven_artifact_extension(
    spec_type: Column, has_sources_jar: Column, has_jar: Column, has_aar: Column
) -> Column:
    """First-success extension per _getArtifact's priority list; null =
    no artifact anywhere = markSkip."""
    return F.when(
        spec_type == "sourcearchive", F.when(has_sources_jar, "-sources.jar")
    ).otherwise(F.when(has_jar, ".jar").when(has_aar, ".aar"))


def slashed_ns(namespace: Column) -> Column:
    """`namespace.replace(/\\./g, '/')` — the maven groupId path form."""
    return F.replace(namespace, F.lit("."), F.lit("/"))


def maven_artifact_url(
    provider: Column, namespace: Column, name: Column, revision: Column,
    extension: Column,
    bases: dict[str, str] | None = None,
) -> Column:
    """THE maven `_buildUrl` template: `{base}{ns .→/}/{name}/{rev}/
    {name}-{rev}{ext}` (mavenBasedFetch.js:91-98; the `spec.namespace?.`
    JS quirk renders a missing namespace as the literal 'undefined').
    The reference shares one _buildUrl across fetchers with per-fetcher
    provider→base maps, and sourceSpec.toUrl delegates to them
    (sourceSpec.js:48-51) — `bases` mirrors that: fetch paths use the
    full 3-provider map, source rendering passes its own."""
    bases = MAVEN_BASES if bases is None else bases
    base = F.coalesce(
        *[F.when(provider == p, F.lit(b)) for p, b in bases.items()]
    )
    return F.concat(
        base,
        F.coalesce(slashed_ns(namespace), F.lit("undefined")),
        F.lit("/"), name, F.lit("/"), revision, F.lit("/"),
        name, F.lit("-"), revision, extension,
    )


def maven_cased_spec(
    namespace: Column, name: Column, summary_group: Column, summary_artifact: Column
) -> Column:
    """fetchResult.casedSpec (mavenBasedFetch.js:66-71): when the merged
    POM summary carries a groupId OR artifactId, each field overrides the
    spec's value when present (the other coalesces back)."""
    has_summary = summary_group.isNotNull() | summary_artifact.isNotNull()
    return F.struct(
        F.when(has_summary, F.coalesce(summary_group, namespace))
        .otherwise(namespace)
        .alias("namespace"),
        F.when(has_summary, F.coalesce(summary_artifact, name))
        .otherwise(name)
        .alias("name"),
    )


def maven_release_date(
    provider: Column,
    solr_timestamp_ms: Column,
    pom_props_lines: Column,
    manifest_mtime: Column,
    any_file_mtime: Column,
    now: Column | str,
) -> Column:
    """The four-step fallback chain. Only the pom.properties branch goes
    through extractDate's validity window (the reference passes the solr
    timestamp and the mtimes straight to toISOString)."""
    props_dates = F.filter(
        F.transform(
            pom_props_lines,
            lambda line: extract_date(F.substring(line, 2, 1_000_000), now),
        ),
        lambda d: d.isNotNull(),
    )
    first_props = F.when(F.size(props_dates) > 0, F.get(props_dates, 0))
    return F.coalesce(
        F.when(provider == "mavencentral", F.timestamp_millis(solr_timestamp_ms)),
        first_props,
        manifest_mtime,
        any_file_mtime,
    )


def maven_fetch_outcome(
    namespace: Column, resolved_revision: Column, n_poms: Column,
    artifact_extension: Column,
) -> Column:
    """handle()'s skip algebra in evaluation order
    (mavenBasedFetch.js:40-57)."""
    return (
        F.when(namespace.isNull() | resolved_revision.isNull(), "Skipped")
        .when(F.coalesce(n_poms, F.lit(0)) == 0, "Skipped")
        .when(artifact_extension.isNull(), "Skipped")
        .otherwise("Fetched")
    )
