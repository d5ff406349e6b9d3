"""Driver-contract smoke tests for __spark_entry__: entry() runs, every
queries() entry returns a DataFrame, and a representative subset matches
its DuckDB oracle exactly (the full sweep lives in
scripts/oracle_check.py and the driver's own harness).
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

import __spark_entry__ as entrymod
from scripts.oracle_check import TABLES, compare

SF_DIR = "/root/testdata/sf0.001"
SUBSET = [
    "q_schedule_epoch", "q_coord_parse", "q_cosine_topk",
    "q_semver_latest", "q_langid", "q_media_decode",
    "q_span_chunking",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def test_entry_returns_rows(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "pop_index" in df.columns


def test_every_query_has_callable_and_oracle_keys_subset():
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert len(qs) >= 25
    assert set(oracles) <= set(qs)  # every oracle belongs to a query
    # round 5: EVERY query carries a value oracle — the six xxhash64-based
    # ones are restated as invariant-oracled entries (no rows-only left)
    assert set(qs) == set(oracles)


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_duckdb_oracle(spark, ddb, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    res = ddb.execute(entrymod.oracle_sql()[name])
    cols = [d[0] for d in res.description]
    err = compare(name, df, res.fetchall(), cols)
    assert err is None, err


def test_oracle_stopword_fallback_in_sync():
    """oracle_sql()'s pyspark-free constant copy must track textstats."""
    from crawler_spark.operators.textstats import LANGS, STOPWORDS

    assert entrymod._ORACLE_STOPWORDS == STOPWORDS
    assert entrymod._ORACLE_LANGS == LANGS


def test_entry_loaded_from_copied_file_in_foreign_cwd(spark, tmp_path):
    """Driver handshake hardening: the driver may COPY __spark_entry__.py
    out of the repo and import the copy from an arbitrary cwd, where
    dirname(__file__) no longer contains crawler_spark. The hardcoded
    repo-root sys.path pin must keep every lazy import working."""
    import importlib.util
    import shutil
    import sys

    copy = tmp_path / "__driver_copy_entry__.py"
    shutil.copy("/root/repo/__spark_entry__.py", copy)

    saved_path = list(sys.path)
    saved_cwd = os.getcwd()
    # strip every path that could resolve crawler_spark, and unload it
    saved_mods = {
        k: sys.modules.pop(k) for k in list(sys.modules)
        if k == "crawler_spark" or k.startswith("crawler_spark.")
    }
    try:
        sys.path = [
            p for p in sys.path
            if not os.path.isdir(os.path.join(p or ".", "crawler_spark"))
        ]
        os.chdir(str(tmp_path))
        spec = importlib.util.spec_from_file_location("__driver_copy_entry__", copy)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        # a query with a lazy crawler_spark import must run end-to-end
        df = mod.queries()["q_semver_latest"](spark, SF_DIR)
        assert df.count() > 0
        assert len(mod.oracle_sql()) >= 40
    finally:
        os.chdir(saved_cwd)
        sys.path = saved_path
        sys.modules.update(saved_mods)


def test_entry_exec_without_file(tmp_path):
    """Driver handshake hardening, mode 3: `exec(source)` with no
    __file__ in globals (runpy-less string exec). The NameError fallback
    must still pin /root/repo so lazy imports resolve."""
    import sys

    src = open("/root/repo/__spark_entry__.py").read()
    saved_cwd = os.getcwd()
    try:
        os.chdir(str(tmp_path))
        g = {"__name__": "__driver_exec_entry__"}  # note: no __file__
        exec(compile(src, "<driver-exec>", "exec"), g)
        assert set(g["oracle_sql"]()) <= set(g["queries"]())
    finally:
        os.chdir(saved_cwd)


def test_self_runner_emits_json_lines(tmp_path):
    """`python __spark_entry__.py <sf> <query>` prints a digest line per
    query + a summary — the executable fallback for the driver."""
    import json
    import subprocess

    out = subprocess.run(
        [sys.executable, "/root/repo/__spark_entry__.py", SF_DIR, "q_scan_project"],
        capture_output=True, text=True, timeout=300, cwd=str(tmp_path),
    )
    lines = [json.loads(l) for l in out.stdout.splitlines() if l.startswith("{")]
    assert out.returncode == 0, out.stderr[-2000:]
    assert lines[0]["query"] == "q_scan_project" and lines[0]["rows"] > 0
    assert len(lines[0]["value_hash"]) == 64
    assert lines[-1]["result"] == "OK"


def test_queries_pin_session_timezone_to_utc(spark):
    """A driver-created session may not be UTC; absolute-instant queries
    (epoch-ms timestamps, 'Z' ISO parses) would collect shifted local
    datetimes and hash-mismatch the TZ-less DuckDB oracle. queries()
    wraps every callable to pin UTC at call time."""
    saved = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = entrymod.queries()["q_date_parse"](spark, SF_DIR)
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        df.limit(1).collect()
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)


def test_entry_python_workers_without_pythonpath(tmp_path):
    """The strongest driver-simulation: copied entry file, foreign cwd,
    NO PYTHONPATH, hostile session conf. Python workers (mapInPandas in
    q_media_decode) must still import crawler_spark — the entry wrapper
    ships the package zip via addPyFile (the --py-files mechanism);
    driver-side sys.path pins alone cannot fix workers."""
    import subprocess
    import sys

    script = tmp_path / "driver_sim.py"
    script.write_text(
        "import importlib.util, shutil, os\n"
        "shutil.copy('/root/repo/__spark_entry__.py', 'entry_copy.py')\n"
        "spec = importlib.util.spec_from_file_location('entry_copy', 'entry_copy.py')\n"
        "mod = importlib.util.module_from_spec(spec); spec.loader.exec_module(mod)\n"
        "from pyspark.sql import SparkSession\n"
        "spark = (SparkSession.builder.master('local[2]')\n"
        "  .config('spark.sql.session.timeZone', 'America/New_York')\n"
        "  .config('spark.sql.shuffle.partitions', '2')\n"
        "  .config('spark.ui.enabled', 'false').getOrCreate())\n"
        "n = mod.queries()['q_media_decode'](spark, '/root/testdata/sf0.001').count()\n"
        "assert n > 0, n\n"
        "print('WORKER-IMPORT-OK', n)\n"
        "spark.stop()\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    out = subprocess.run(
        [sys.executable, str(script)], capture_output=True, text=True,
        timeout=300, cwd=str(tmp_path), env=env,
    )
    assert out.returncode == 0, (out.stdout[-1000:], out.stderr[-2000:])
    assert "WORKER-IMPORT-OK" in out.stdout
