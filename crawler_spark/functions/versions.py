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


def latest_version_agg(version: Column) -> Column:
    """Aggregate: latest non-prerelease version (baseHandler.js:83-96).

    Usage: df.groupBy(...).agg(latest_version_agg(F.col('version'))).
    `max_by` over a null-keyed row ignores prereleases; falls back to the
    lexically-max raw version when *all* versions are prerelease (the
    reference's reduce seeds with versions[0]; with every candidate
    filtered the reduce returns the seed — we pin a deterministic
    fallback instead of an arbitrary element).
    """
    key = F.when(~is_prerelease(version), semver_key(version))
    return F.coalesce(F.max_by(version, key), F.max(version))


def nuget_normalize(version: Column) -> Column:
    """NuGet normalized version (nugetFetch.js:81-85).

    Strip leading zeros from each numeric part ('01.02.03' → '1.2.3'),
    drop a 4th part equal to 0 ('1.0.01.0' → '1.0.1'), keep the
    prerelease suffix ('1.00.1-Beta' → '1.0.1-Beta').
    """
    base = F.split_part(version, F.lit("-"), F.lit(1))
    suffix = F.substring(version, F.length(base) + 1, F.lit(2147483647))
    parts = F.split(base, r"\.")
    trimmed = F.transform(
        parts, lambda p: F.coalesce(F.nullif(F.regexp_replace(p, r"^0+", ""), F.lit("")), F.lit("0"))
    )
    drop4 = F.when(
        (F.size(trimmed) == 4) & (F.element_at(trimmed, 4) == "0"),
        F.slice(trimmed, 1, 3),
    ).otherwise(trimmed)
    return F.concat(F.array_join(drop4, "."), suffix)
