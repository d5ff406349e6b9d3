"""Plan audit: print `.explain("formatted")` for the headline queries and
grep-check the properties that matter at 100 TB:

* parquet scans carry PushedFilters / pruned ReadSchema (Catalyst pushdown)
* small dims join via BroadcastHashJoin (visitor map, nation/region)
* no CartesianProduct outside the intentionally-pairwise queries
* WholeStageCodegen spans cover the hot projections

Usage: python scripts/explain_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from crawler_spark.session import get_spark

PAIRWISE = {"q_ngram_jaccard", "q_embed_near_pairs", "q_minhash_near_dups", "q_simhash_near_dups"}


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("explain_audit", parallelism=8, shuffle_partitions=8)
    problems = []
    for name, fn in entrymod.queries().items():
        if only and name not in only:
            continue
        p = plan_of(fn(spark, sf_dir))
        checks = []
        if "Scan parquet" in p and "PushedFilters" not in p:
            checks.append("no PushedFilters on parquet scan")
        if "CartesianProduct" in p and name not in PAIRWISE and name != "q_cosine_topk":
            checks.append("unexpected CartesianProduct")
        if name == "q_visitor_expand" and "BroadcastHashJoin" not in p:
            checks.append("dim join not broadcast")
        if "WholeStageCodegen" not in p:
            checks.append("no WholeStageCodegen span")
        status = "OK" if not checks else "WARN: " + "; ".join(checks)
        print(f"{name:28s} {status}")
        if checks:
            problems.append(name)
        if only:
            print(p)
    print("AUDIT:", "CLEAN" if not problems else f"{len(problems)} flagged: {problems}")
    spark.stop()


if __name__ == "__main__":
    main()
