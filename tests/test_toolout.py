"""Tool-output semantics (P17/P19), date parse chain, and SourceSpec URL
rendering — fixture-level unit tests; the entry queries carry the
closed-form DuckDB oracles."""

from __future__ import annotations

from pyspark.sql import functions as F

from crawler_spark.functions.dates import extract_date
from crawler_spark.functions.sourcespec import source_url
from crawler_spark.operators.toolout import (
    reuse_license_entries,
    reuse_spdx_records,
    scancode_attachment_paths,
    scancode_has_real_errors,
)


def test_scancode_attachments_rules(spark):
    files = spark.createDataFrame(
        [
            (1, "LICENSE", "file", True, []),
            (1, "pkg", "directory", False, [("package.json",)]),
            (1, "", "directory", False, [("setup.py",)]),  # empty dir path: no slash
            (1, "src/a.js", "file", False, [(None,)]),  # non-manifest entry → own path
            (1, "dir2", "directory", False, [(None,)]),  # dir WITHOUT manifest_path → own path
            (2, "x", "file", False, []),
        ],
        "doc int, path string, ftype string, is_license_text boolean, "
        "package_data array<struct<manifest_path:string>>",
    )
    got = {(r["doc"], r["kind"], r["attach_path"]) for r in scancode_attachment_paths(files).collect()}
    assert got == {
        (1, "license", "LICENSE"),
        (1, "package", "pkg/package.json"),
        (1, "package", "setup.py"),
        (1, "package", "src/a.js"),
        (1, "package", "dir2"),
    }


def test_scancode_error_triage(spark):
    files = spark.createDataFrame(
        [
            (1, ["ERROR: Processing interrupted: timeout after 120s"]),
            (1, ["ValueError: boom", "UnicodeDecodeError: bad byte"]),
            (2, ["Something exploded entirely"]),
            (3, []),
            (4, None),
        ],
        "doc int, scan_errors array<string>",
    )
    got = {r["doc"]: r["has_real_errors"] for r in scancode_has_real_errors(files).collect()}
    assert got == {1: False, 2: True, 3: False, 4: False}


def test_reuse_spdx_fixups(spark):
    text = (
        "SPDXVersion: SPDX-2.1\n"
        "Creator: Tool: reuse-0.15.0\n"
        "Relationship: SPDXRef-DOCUMENT DESCRIBES SPDXRef-a\n"
        "\n"
        "FileName: ./a.c\n"
        "FileCopyrightText: SPDX-FileCopyrightText: 2024 Me\n"
        "\n"
        "FileName: b.c\n"
        "FileCopyrightText: <text>2023 You</text>"
    )
    df = spark.createDataFrame([(7, text)], "doc int, spdx string")
    rows = reuse_spdx_records(df, "doc", "spdx").collect()
    recs = {(r["section_idx"], r["key"]): (r["scope"], r["value"]) for r in rows}
    assert recs[(0, "SPDXVersion")] == ("metadata", "SPDX-2.1")
    assert recs[(0, "CreatorTool")] == ("metadata", "reuse-0.15.0")  # secondary key concat
    assert (0, "Relationship") not in recs  # dropped
    assert recs[(1, "FileName")] == ("file", "a.c")  # './' stripped
    assert recs[(1, "FileCopyrightText")] == ("file", "2024 Me")  # prefix stripped
    assert recs[(2, "FileName")] == ("file", "b.c")
    assert recs[(2, "FileCopyrightText")] == ("file", "2023 You")  # markup stripped


def test_reuse_license_spdxid_quirk(spark):
    listing = spark.createDataFrame(
        [(1, "MIT.txt"), (1, "GPL-3.0.txt.bak"), (1, "README")],
        "doc int, file_name string",
    )
    got = {r["file_path"]: r["spdx_id"] for r in reuse_license_entries(listing).collect()}
    assert got == {
        "LICENSES/MIT.txt": "MIT",
        "LICENSES/GPL-3.0.txt.bak": "GPL-3.0",  # FIRST '.txt' occurrence
        "LICENSES/README": "",  # indexOf -1 → substring(0,-1) → ''
    }


def test_sourceextract_clearly_yaml(spark):
    """Root-only clearly.yaml → long-format description rows; nested
    copies, comments, blank lines and non-mapping lines are ignored;
    quotes stripped (sourceExtract.js:24-31)."""
    from crawler_spark.operators.toolout import sourceextract_description

    files = spark.createDataFrame(
        [
            (1, "clearly.yaml", '# hdr\ndescribed: "repo-a"\nlicense: MIT\n\nfacets.dev: src\nnot a mapping'),
            (2, "vendored/clearly.yaml", "license: MIT"),  # nested → ignored
            (3, "clearly.yaml", "'quoted_key_is_not': kept\nplain: 'v1'"),
        ],
        "doc int, path string, content string",
    )
    got = {(r["doc"], r["key"]): r["value"] for r in sourceextract_description(files).collect()}
    assert got == {
        (1, "described"): "repo-a",
        (1, "license"): "MIT",
        (1, "facets.dev"): "src",
        (3, "plain"): "v1",
    }


def test_extract_date_branches_and_window(spark):
    cases = [
        ("2023-04-15T10:30:00Z", "2023-04-15 10:30:00"),
        ("2021-03-05", "2021-03-05 00:00:00"),
        ("Tue, 01 Nov 2011 10:15:30 +0200", "2011-11-01 08:15:30"),
        ("Sun, 06 Nov 1994 08:49:37 GMT", "1994-11-06 08:49:37"),
        ("2017-05-15 09:24:11", "2017-05-15 09:24:11"),
        ("Mon Mar 2 20:46:54 GMT+01:00 2015", "2015-03-02 19:46:54"),
        ("not-a-date", None),
        ("1910-01-01", None),  # before 1950 window start
        ("2100-01-01T00:00:00", None),  # beyond now+30d
        (None, None),
    ]
    df = spark.createDataFrame([(i, c[0]) for i, c in enumerate(cases)], "i int, raw string")
    got = {
        r["i"]: r["d"] and r["d"].strftime("%Y-%m-%d %H:%M:%S")
        for r in df.select("i", extract_date(F.col("raw"), "2026-08-17 00:00:00").alias("d")).collect()
    }
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i], got[i])


def test_extract_date_spark_python_twin_parity(spark):
    """The engine stamps release_date with the Spark chain; the parity
    simulator with extract_date_py — they must agree on every wire format
    the registry generator emits (and on the null-ing failure modes)."""
    import datetime as dt
    import random

    from crawler_spark.data.generators import _release_date_raw_py
    from crawler_spark.functions.dates import extract_date_py

    rng = random.Random(123)
    raws = [_release_date_raw_py(rng) for _ in range(200)]
    now = dt.datetime(2026, 1, 1)
    py = [extract_date_py(r, now) for r in raws]
    df = spark.createDataFrame(list(enumerate(raws)), "i int, raw string")
    sp = {
        r["i"]: r["d"]
        for r in df.select("i", extract_date(F.col("raw"), "2026-01-01 00:00:00").alias("d")).collect()
    }
    assert [sp[i] for i in range(len(raws))] == py
    assert any(p is not None for p in py) and any(p is None for p in py)


def test_source_url_builders(spark):
    rows = [
        # provider, ns, name, rev, override
        (0, "github", "octo.cat", "repo", "1.0", None),
        (1, "gitlab", "grp", "proj", None, None),
        (2, "mavencentral", "com.example.lib", "art", "2.3", None),
        (3, "mavencentral", None, "art", "2.3", None),  # JS 'undefined' quirk
        (4, "mavengoogle", "androidx.core", "core", "1.1", None),
        (5, "npmjs", None, "left-pad", "1.0", None),  # unroutable → null
        (6, "github", "o", "n", "1", "https://given.example/override"),
    ]
    df = spark.createDataFrame(rows, "i int, provider string, ns string, name string, rev string, override string")
    got = {
        r["i"]: r["u"]
        for r in df.select(
            "i",
            source_url(
                F.col("provider"), F.col("ns"), F.col("name"), F.col("rev"), url=F.col("override")
            ).alias("u"),
        ).collect()
    }
    assert got[0] == "https://github.com/octo/cat/repo.git"  # dots → slashes
    assert got[1] == "https://gitlab.com/grp/proj.git"
    assert got[2] == "https://search.maven.org/remotecontent?filepath=com/example/lib/art/2.3/art-2.3.jar"
    assert got[3] == "https://search.maven.org/remotecontent?filepath=undefined/art/2.3/art-2.3.jar"
    assert got[4] == "https://dl.google.com/android/maven2/androidx/core/core/1.1/core-1.1.jar"
    assert got[5] is None
    assert got[6] == "https://given.example/override"


def test_extract_date_rfc2822_offset_fuzz_parity(spark):
    """Spark chain == python twin on fuzzed RFC-2822 strings: arbitrary
    (even wrong) weekday tokens, the full ±14:00 offset grid, 1/2-digit
    days, and instants straddling both window boundaries (utils.js:70-97:
    luxon validates neither the weekday nor the offset sign against the
    date; the window applies to the UTC instant)."""
    import datetime as dt
    import random

    from crawler_spark.functions.dates import extract_date_py

    months = ["Jan", "Feb", "Mar", "Apr", "May", "Jun",
              "Jul", "Aug", "Sep", "Oct", "Nov", "Dec"]
    now = dt.datetime(2026, 1, 1)
    rng = random.Random(20260817)
    raws = []
    for _ in range(300):
        # cluster instants around the window edges + a broad middle band
        base = rng.choice([
            dt.datetime(1950, 1, 1), now + dt.timedelta(days=30),
            dt.datetime(1949 + rng.randrange(79), 1 + rng.randrange(12),
                        1 + rng.randrange(28)),
        ])
        instant = base + dt.timedelta(minutes=rng.randrange(-1500, 1500),
                                      seconds=rng.randrange(60))
        off = rng.randrange(-14 * 4, 14 * 4 + 1) * 15
        sign = "+" if off >= 0 else "-"
        hh, mm = divmod(abs(off), 60)
        dow = "".join(rng.choice("QWERTYUIOPASDFGHJKLZXCVBNM") for _ in range(3))
        day = f"{instant.day:02d}" if rng.random() < 0.5 else str(instant.day)
        raws.append(f"{dow}, {day} {months[instant.month - 1]} {instant.year} "
                    f"{instant:%H:%M:%S} {sign}{hh:02d}{mm:02d}")

    py = [extract_date_py(r, now) for r in raws]
    df = spark.createDataFrame(list(enumerate(raws)), "i int, raw string")
    sp = {
        r["i"]: r["d"]
        for r in df.select("i", extract_date(F.col("raw"), "2026-01-01 00:00:00").alias("d")).collect()
    }
    assert [sp[i] for i in range(len(raws))] == py
    # non-vacuous: both kept and windowed-out examples occur
    assert any(p is not None for p in py) and any(p is None for p in py)


def test_fossology_document_algebra(spark):
    """P20 fossology.js semantics over hand-built rows: skip/error
    routing, the observable DOUBLE location-strip in nomos, the
    copyright drop rules (null stdout / empty stdout / parse failure),
    and monk's walk-order chunking with empty chunks dropped."""
    from crawler_spark.operators.toolout import fossology_document

    runs_schema = "doc long, location string, disabled boolean, version_detected boolean, nomos_raw string"
    runs = spark.createDataFrame(
        [
            (1, "tmp/d1", True, True, "x"),            # disabled wins
            (2, "tmp/d2", False, False, "x"),          # unconfigured
            (3, "tmp/d3", False, True, None),          # nomos spawn error
            # double-strip observable: 'tmp/d4tmp/d4//L: MIT' -> pass1
            # removes the second 'tmp/d4/' -> 'tmp/d4/L: MIT' -> pass2 -> 'L: MIT'
            (4, "tmp/d4", False, True, "tmp/d4/a.c: GPL\ntmp/d4tmp/d4//L: MIT\n"),
            (5, "tmp/d5", False, True, ""),            # attached, no files
        ],
        runs_schema,
    )
    files_schema = "doc long, file_idx long, path string, copyright_json string, monk_text string"
    files = spark.createDataFrame(
        [
            (4, 0, "a.c", '{"holders": ["x"]}', "tmp/d4/a.c matches MIT\n"),
            (4, 1, "b.c", "{broken", ""),              # parse throw -> dropped
            (4, 2, "c.c", None, "c.c matches GPL\n"),  # agent error -> dropped
            (4, 3, "d.c", "", ""),                     # empty stdout -> dropped
            (4, 4, "e.c", '{"holders": []}', ""),
            (3, 0, "z.c", '{"holders": ["y"]}', "zzz"),  # erroring doc: no output rows
        ],
        files_schema,
    )
    rows = {
        (r["doc"], r["section"], r["idx"], r["path"]): r["content"]
        for r in fossology_document(runs, files, chunk_size=2).collect()
    }
    fates = {d: rows[(d, "fate", 0, None)] for d in (1, 2, 3, 4, 5)}
    assert fates == {
        1: "skip:disabled", 2: "skip:unconfigured", 3: "error:nomos",
        4: "attached", 5: "attached",
    }
    assert rows[(4, "nomos", 0, None)] == "a.c: GPL\nL: MIT\n"
    assert rows[(5, "nomos", 0, None)] == ""
    # copyright: only a.c and e.c kept, idx re-ranked over kept files
    assert rows[(4, "copyright", 0, "a.c")] == '{"holders": ["x"]}'
    assert rows[(4, "copyright", 1, "e.c")] == '{"holders": []}'
    # monk chunks of 2 over ALL files in walk order: chunk0 = a.c+b.c
    # (stripped -> 'a.c matches MIT\n'), chunk1 = c.c+d.c, chunk2 = e.c
    # (empty -> dropped)
    assert rows[(4, "monk", 0, None)] == "a.c matches MIT\n"
    assert rows[(4, "monk", 1, None)] == "c.c matches GPL\n"
    assert (4, "monk", 2, None) not in rows
    # doc 3 errored before any agent output; doc 5 has no files
    assert not any(d == 3 and s != "fate" for d, s, _, _ in rows)
    assert not any(d == 5 and s in ("copyright", "monk") for d, s, _, _ in rows)
    assert len(rows) == 5 + 2 + 2 + 2
