"""Per-provider protocol algebra (crawler_spark/functions/providers.py)
vs direct Python reimplementations of the reference's imperative loops —
packagist _extractManifest (packagistFetch.js:64-91), conda _matchPackage
(condaFetch.js:85-114), debian _parseDeclaredLicenses
(debianFetch.js:346-385), pod path_fragment (podFetch.js:160-181).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.functions.providers import (
    conda_match_packages,
    debian_declared_licenses,
    packagist_effective_manifest,
    pod_path_fragment,
)

# -- packagist ---------------------------------------------------------------

VERSIONS = [
    # (version, {key: value}) in registry order — the fold input
    ("1.0.0", {"license": "MIT", "homepage": "a.example", "keep": "yes"}),
    ("v1.1.0", {"license": "GPL-2.0", "extra": "x"}),
    ("1.2.0", {"extra": "__unset", "homepage": "b.example"}),
    ("1.3.0", {"license": "__unset"}),  # beyond target for target=1.2.0
]


def _reference_fold(versions, target):
    """packagistFetch.js:70-90, verbatim semantics."""
    idx = next(
        (i for i, (v, _) in enumerate(versions) if v == target or v == f"v{target}"), None
    )
    if idx is None:
        return None
    combined: dict = {}
    for i in range(idx + 1):
        for k, v in versions[i][1].items():
            if v == "__unset":
                combined.pop(k, None)
            else:
                combined[k] = v
    return combined


def test_packagist_fold_matches_reference(spark):
    rows = [
        ("p", i, v, k, val)
        for i, (v, kv) in enumerate(VERSIONS)
        for k, val in kv.items()
    ]
    deltas = spark.createDataFrame(
        rows, "package string, idx int, version string, key string, value string"
    )
    for target in ("1.0.0", "1.1.0", "1.2.0", "1.3.0", "9.9.9"):
        got = {
            r["key"]: r["value"]
            for r in packagist_effective_manifest(deltas, target).collect()
        }
        want = _reference_fold(VERSIONS, target) or {}
        assert got == want, (target, got, want)
    # spot-check the interesting target: delete applied, override applied
    eff = _reference_fold(VERSIONS, "1.2.0")
    assert eff == {"license": "GPL-2.0", "homepage": "b.example", "keep": "yes"}


# -- conda -------------------------------------------------------------------

REPODATA = [
    ("numpy", "1.13.0", "py36_0", 100, "numpy-a.conda"),
    ("numpy", "1.13.0", "py37_1", 300, "numpy-b.conda"),
    ("numpy", "1.14.0", "py36_0", 200, "numpy-c.conda"),
    ("scipy", "1.0.0", "py36_0", 50, "scipy-a.conda"),
]


def _reference_match(name, version, build_prefix):
    """condaFetch.js:85-114: filter then sort timestamp desc, first."""
    hits = [
        r for r in REPODATA
        if r[0] == name
        and (not version or version == r[1])
        and (not build_prefix or r[2].startswith(build_prefix))
    ]
    hits.sort(key=lambda r: -r[3])
    return hits[0] if hits else None


def test_conda_match_matches_reference(spark):
    repodata = spark.createDataFrame(
        REPODATA, "name string, version string, build string, timestamp long, package_file string"
    )
    spec_rows = [
        (0, "numpy", None, None),          # newest overall → numpy-b
        (1, "numpy", "1.13.0", None),      # newest 1.13.0 → numpy-b
        (2, "numpy", "1.13.0", "py36"),    # build-prefix pin → numpy-a
        (3, "numpy", None, "py36"),        # newest py36 → numpy-c
        (4, "scipy", "9.9.9", None),       # no match → absent
    ]
    specs = spark.createDataFrame(
        spec_rows, "spec_id int, name string, version string, build_prefix string"
    )
    got = {
        r["spec_id"]: (r["package_file"], r["resolved_revision"])
        for r in conda_match_packages(specs, repodata).collect()
    }
    for sid, name, v, b in spec_rows:
        ref = _reference_match(name, v, b)
        if ref is None:
            assert sid not in got
        else:
            assert got[sid] == (ref[4], f"{ref[1]}-{ref[2]}")


# -- pod ---------------------------------------------------------------------


def test_pod_path_fragment(spark):
    import hashlib

    df = spark.createDataFrame([("AFNetworking", "4.0.1")], "name string, rev string")
    got = df.select(
        pod_path_fragment(F.col("name"), F.col("rev")).alias("p")
    ).first()["p"]
    h = hashlib.md5(b"AFNetworking").hexdigest()
    # podFetch.js:163-173: successive slices of the md5 hex
    assert got == f"{h[0]}/{h[1]}/{h[2]}/AFNetworking/4.0.1"
    no_rev = df.select(pod_path_fragment(F.col("name")).alias("p")).first()["p"]
    assert no_rev == f"{h[0]}/{h[1]}/{h[2]}/AFNetworking"


# -- debian ------------------------------------------------------------------


def _reference_parse(text):
    """debianFetch.js:346-385, verbatim semantics (first-occurrence
    replaces, set dedupe)."""
    licenses = [
        ln.replace("License:", "", 1).strip()
        for ln in text.split("\n")
        if ln.startswith("License: ")
    ]
    out = []
    for lid in licenses:
        if "CPL" in lid and "RSCPL" not in lid:
            lid = lid.replace("CPL", "CPL-1.0", 1)
        low = lid.lower()
        if "expat" in low:
            i = low.index("expat")
            lid = lid[:i] + "MIT" + lid[i + 5:]
        if " or " in lid and "," not in lid:
            lid2 = lid.replace(" or ", " OR ", 1).replace(" and ", " AND ", 1)
            out.append(f"({lid2})")
        elif " or " in lid and "," in lid:
            lid2 = lid.replace(" or ", " OR ", 1)
            for part in lid2.split(" and "):
                if "OR" in part and part.endswith(","):
                    out.append("(" + part.replace(",", ")", 1))
                else:
                    out.append(part)
        elif " and " in lid:
            out.extend(lid.split(" and "))
        else:
            out.append(lid)
    seen, uniq = set(), []
    for x in out:
        if x not in seen:
            seen.add(x)
            uniq.append(x)
    return uniq


TEXTS = [
    "License: MIT\nFiles: *\nLicense: MIT\n",  # dedupe
    "License: GPL-2.0 or Artistic\n",
    "License: GPL-2.0 or Artistic, and BSD-3\n",
    "License: Apache-2.0 and CPL\n",
    "License: Expat\nLicense: expat or MIT\n",
    "License: RSCPL\n",
    "Comment: no license lines here\n",
    "License: A or B and C\n",  # or-branch rewrites the and too
]


def test_debian_parse_matches_reference(spark):
    df = spark.createDataFrame(list(enumerate(TEXTS)), "doc int, text string")
    got: dict[int, set] = {}
    for r in debian_declared_licenses(df, "doc", "text").collect():
        got.setdefault(r["id"], set()).add(r["license"])
    for i, t in enumerate(TEXTS):
        want = set(_reference_parse(t))
        assert got.get(i, set()) == want, (i, got.get(i), want)


def test_gem_fetch_kernels(spark):
    """rubyGemsFetch.js algebra: URL build with optional namespace, skip
    algebra, and the metadata date chain (padded date parses; unpadded /
    missing / out-of-window dates fall to mtime; no metadata.txt → null)."""
    from pyspark.sql import functions as F

    from crawler_spark.functions.providers import (
        gem_fetch_outcome,
        gem_release_date,
        gem_url,
    )

    df = spark.createDataFrame(
        [
            (1, None, "rails", "7.0.1", True, "date: 2015-03-09\nname: rails"),
            (2, "org", "tool", "1.2", True, "date: 2015-3-9"),      # unpadded → mtime
            (3, None, "gemx", None, True, "no date line"),          # registry gave no version
            (4, None, "gemy", "2.0", False, None),                  # no registryData
            (5, None, "gemz", "3.0", True, None),                   # no metadata.txt
            (6, None, "gemw", "4.0", True, "date: 1949-01-01"),     # out of window → mtime
        ],
        "id int, ns string, name string, rev string, has_reg boolean, meta string",
    )
    mtime = F.to_timestamp(F.lit("2016-02-02 10:00:00"))
    out = df.select(
        "id",
        gem_fetch_outcome(F.col("has_reg"), F.col("rev")).alias("outcome"),
        gem_url(F.col("ns"), F.col("name"), F.col("rev")).alias("url"),
        gem_release_date(F.col("meta"), mtime, "2026-01-01 00:00:00").alias("dt"),
    )
    got = {r["id"]: (r["outcome"], r["url"], str(r["dt"])) for r in out.collect()}
    assert got[1] == ("Fetched", "https://rubygems.org/gems/rails-7.0.1.gem", "2015-03-09 00:00:00")
    assert got[2] == ("Fetched", "https://rubygems.org/gems/org/tool-1.2.gem", "2016-02-02 10:00:00")
    assert got[3][0] == "Skipped"
    assert got[4][0] == "Skipped"
    assert got[5] == ("Fetched", "https://rubygems.org/gems/gemz-3.0.gem", "None")
    assert got[6][2] == "2016-02-02 10:00:00"


def test_conda_match_null_timestamp_and_tie(spark):
    """condaFetch.js:112 sorts with `timestamp || 0`: a match whose only
    candidates have NULL timestamps still matches (it sorts as 0), and
    equal timestamps break deterministically (package_file asc stands in
    for the reference's stable enumeration order)."""
    from crawler_spark.functions.providers import conda_match_packages

    repodata = spark.createDataFrame(
        [
            ("a", "1.0.0", "py39_0", None, "a-null-1.conda"),
            ("a", "1.0.0", "py39_1", None, "a-null-2.conda"),
            ("b", "1.0.0", "py39_0", 5, "b-tie-1.conda"),
            ("b", "1.0.0", "py39_1", 5, "b-tie-2.conda"),
            ("b", "1.0.0", "py39_2", 3, "b-old.conda"),
        ],
        "name string, version string, build string, timestamp long, package_file string",
    )
    specs = spark.createDataFrame(
        [(0, "a", None, None), (1, "b", None, None)],
        "spec_id long, name string, version string, build_prefix string",
    )
    got = {r["spec_id"]: r["package_file"] for r in conda_match_packages(specs, repodata).collect()}
    assert got[0] == "a-null-1.conda"  # NULL timestamps: still matched
    assert got[1] == "b-tie-1.conda"  # tie at ts=5: deterministic winner
