"""Plan audit: print `.explain("formatted")` for the entry queries and
check the plan properties that matter at 100 TB — each check applied only
where it's meaningful:

* parquet scans carry PushedFilters + pruned ReadSchema — for queries
  that filter base-table columns (a full-table transform legitimately
  has nothing to push);
* small dims join via BroadcastHashJoin (visitor map, nation/region);
* no CartesianProduct outside the intentionally-pairwise queries
  (the constant-predicate pair joins and constant-query cosine scans
  are cartesian BY DESIGN — exact baselines).

Usage: python scripts/explain_audit.py [sf_dir] [query ...]
(pass a query name to also dump its full formatted plan)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from crawler_spark.session import get_spark

# queries whose base-table filters must reach the parquet scan
PUSHDOWN_EXPECTED = {"q_scan_project", "q_politeness_gate", "q_scope_publish"}
# queries whose dim join must be broadcast
BROADCAST_EXPECTED = {"q_visitor_expand", "q_fetch_join"}
# queries that are pairwise/constant-vector by design (cartesian allowed)
PAIRWISE = {
    "q_ngram_jaccard", "q_embed_near_pairs", "q_minhash_near_dups",
    "q_simhash_near_dups", "q_cosine_topk", "q_ivf_topk", "q_lsh_buckets",
}


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
        if name in PUSHDOWN_EXPECTED and "PushedFilters: [" not in p:
            checks.append("filter not pushed to parquet scan")
        if name in BROADCAST_EXPECTED and "BroadcastHashJoin" not in p:
            checks.append("dim join not broadcast")
        if "CartesianProduct" in p and name not in PAIRWISE:
            checks.append("unexpected CartesianProduct")
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
