"""Local stand-in for the driver's correctness harness: run every
__spark_entry__ query on Spark AND its DuckDB oracle, compare row count,
column-name set, and the order-insensitive multiset of row values
(strict equality — stronger than the driver's hash compare).

Usage: python scripts/oracle_check.py [sfname] [query ...]
       sfname default sf0.001
"""

from __future__ import annotations

import datetime
import decimal
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from crawler_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def _norm(v):
    if isinstance(v, decimal.Decimal):
        return ("dec", str(v.normalize()))
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "nan")
        return ("f", repr(round(v, 9)))
    if isinstance(v, datetime.datetime):
        return ("ts", v.replace(tzinfo=None).isoformat())
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def compare(name, spark_df, ddb_rows, ddb_cols):
    s_cols = sorted(spark_df.columns)
    d_cols = sorted(ddb_cols)
    if s_cols != d_cols:
        return f"SCHEMA MISMATCH spark={s_cols} duckdb={d_cols}"
    order = [spark_df.columns.index(c) for c in s_cols]
    d_order = [list(ddb_cols).index(c) for c in s_cols]
    # sort by repr: a deterministic total order that (a) never throws on
    # mixed None/str columns and (b) assigns equal keys to equal
    # normalized rows, so multiset equality is preserved
    s_rows = sorted((tuple(_norm(r[i]) for i in order) for r in spark_df.collect()), key=repr)
    d_rows = sorted((tuple(_norm(r[i]) for i in d_order) for r in ddb_rows), key=repr)
    if len(s_rows) != len(d_rows):
        return f"ROWCOUNT MISMATCH spark={len(s_rows)} duckdb={len(d_rows)}"
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        if a != b:
            return f"VALUE MISMATCH at sorted row {i}:\n  spark={a}\n  duck ={b}"
    return None


def main():
    sfname = sys.argv[1] if len(sys.argv) > 1 else "sf0.001"
    only = set(sys.argv[2:])
    sf_dir = f"/root/testdata/{sfname}"
    print(f"# oracle_check {sfname} ({len(entrymod.oracle_sql())} oracles)")
    spark = get_spark("oracle_check", parallelism=8, shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            if name not in oracles:
                n = df.count()
                print(f"{name:28s} ROWS-ONLY rows={n}")
                continue
            res = con.execute(oracles[name])
            cols = [d[0] for d in res.description]
            err = compare(name, df, res.fetchall(), cols)
            if err:
                n_fail += 1
                print(f"{name:28s} FAIL: {err}")
            else:
                print(f"{name:28s} OK rows={df.count()}")
        except Exception as e:
            n_fail += 1
            print(f"{name:28s} ERROR: {str(e).splitlines()[0][:300]}")
    print("RESULT:", "FAIL" if n_fail else "OK", f"({n_fail} failures)")
    spark.stop()
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
