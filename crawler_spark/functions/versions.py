"""Version algebra: semver keys, latest-version resolution, normalization.

Reference semantics:
- latest = max over non-prerelease versions by semver order
  (/root/reference/lib/baseHandler.js:83-101); prerelease = semver with a
  `-suffix` (baseHandler.js:99-101).
- nuget normalization: strip leading zeros per numeric part, drop the 4th
  part when it is 0, keep prerelease suffix
  (/root/reference/providers/fetch/nugetFetch.js:81-85).
- golang version list: lexical sort, take last (goFetch.js:91).

All JVM-side built-ins — no Python in the hot path. The semver sort key
packs major/minor/patch into one bigint (20 bits each) so `max_by` gives
the reference's semver.gt reduce in a single partial-aggregable pass
(map-side combine; no shuffle beyond the groupBy).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# major.minor.patch with optional -prerelease and +build
_SEMVER_RE = r"^v?(\d+)(?:\.(\d+))?(?:\.(\d+))?(?:-([0-9A-Za-z.-]+))?(?:\+.*)?$"


def semver_part(version: Column, i: int) -> Column:
    p = F.nullif(F.regexp_extract(version, _SEMVER_RE, i), F.lit(""))
    return F.coalesce(p.cast("long"), F.lit(0))


def is_prerelease(version: Column) -> Column:
    """semver.prerelease(v) !== null (baseHandler.js:99-101)."""
    return F.nullif(F.regexp_extract(version, _SEMVER_RE, 4), F.lit("")).isNotNull()


def semver_key(version: Column) -> Column:
    """Orderable bigint: (major<<40) | (minor<<20) | patch.

    20 bits per component (components capped at 2^20-1 — beyond any
    registry's real version numbers).
    """
    cap = F.lit((1 << 20) - 1)
    maj = F.least(semver_part(version, 1), cap)
    mino = F.least(semver_part(version, 2), cap)
    pat = F.least(semver_part(version, 3), cap)
    return (
        F.shiftleft(maj, 40) + F.shiftleft(mino, 20) + pat
    )


def semver_cmp_key(version: Column) -> Column:
    """Comparison key mirroring semver.gt for the seed/stable comparisons
    the reference's reduce performs: the packed (major,minor,patch) with a
    release bit below it, so a release outranks a prerelease of the SAME
    triple (semver.gt('3.0.0','3.0.0-alpha') is true). Prerelease
    IDENTIFIER ordering never matters here: the filtered reduce only ever
    compares a stable version against the (possibly prerelease) seed."""
    rel = F.when(is_prerelease(version), F.lit(0)).otherwise(F.lit(1))
    return F.shiftleft(semver_key(version), 1) + rel


def latest_version_agg(version: Column, order: Column) -> Column:
    """Aggregate: the reference's latest-version resolution, exactly
    (baseHandler.js:83-96):

        versions.filter(v => !isPreRelease(v))
                .reduce((max, cur) => semver.gt(cur, max) ? cur : max,
                        versions[0])

    The seed is the UNFILTERED head of the registry's version list
    (`order` — release_seq in the registry dim) and PARTICIPATES in the
    comparisons: a prerelease head that semver-outranks every stable
    version wins, and when every version is prerelease the head itself is
    returned (NOT the max prerelease). Strict gt means the earliest of
    semver-equal versions wins — hence the (-order) tiebreak on max_by.

    Usage: df.groupBy(...).agg(latest_version_agg(F.col('version'),
    F.col('release_seq'))).
    """
    seed = F.min_by(version, order)
    stable_key = F.when(
        ~is_prerelease(version),
        F.struct(semver_cmp_key(version).alias("k"), (F.lit(0) - order).alias("o")),
    )
    best_stable = F.max_by(version, stable_key)
    return F.when(
        best_stable.isNotNull()
        & (semver_cmp_key(best_stable) > semver_cmp_key(seed)),
        best_stable,
    ).otherwise(seed)


def nuget_normalize(version: Column) -> Column:
    """NuGet normalized version — an exact mirror of nugetFetch.js:81-85:

        parts   = version.split('-')
        trimmed = parts[0].split('.').map(p => trimStart(p, '0') || '0')
        [(trimmed[3] === '0' ? trimmed.slice(0, 3) : trimmed).join('.'),
         ...parts.slice(1)].filter(x => x).join('-')

    Three consequences the obvious reading misses, all mirrored here:
    * `trimmed[3] === '0'` checks INDEX 3 on any length, and slice(0,3)
      then drops EVERYTHING past part 3 ('1.2.3.0.5' → '1.2.3');
    * `.filter(x => x)` collapses empty dash segments ('1.00.1-' →
      '1.0.1', '1.0.0-beta--x' → '1.0.0-beta-x');
    * leading zeros strip per numeric part ('01.02.03' → '1.2.3').
    """
    dash_parts = F.split(version, "-")
    parts = F.split(F.element_at(dash_parts, 1), r"\.")
    trimmed = F.transform(
        parts, lambda p: F.coalesce(F.nullif(F.regexp_replace(p, r"^0+", ""), F.lit("")), F.lit("0"))
    )
    drop4 = F.when(
        (F.size(trimmed) >= 4) & (F.element_at(trimmed, 4) == "0"),
        F.slice(trimmed, 1, 3),
    ).otherwise(trimmed)
    rebuilt = F.concat(
        F.array(F.array_join(drop4, ".")),
        F.slice(dash_parts, 2, F.greatest(F.size(dash_parts) - 1, F.lit(0))),
    )
    return F.array_join(F.filter(rebuilt, lambda x: x != ""), "-")
