"""Pure-CPU scaling calibration: what strong-scaling efficiency can ANY
job reach on this one-socket VM? A sha256 chain over synthesized longs —
zero scan, zero shuffle, no Python — measured at two parallelism levels
in fresh pinned JVMs. The epoch's 8→32 plateau (BASELINE.md) is judged
against THIS ceiling, not against a perfect 1.0.

Usage: python scripts/cpu_calibration.py [n_rows] [small] [big]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import json, sys, time
from pyspark.sql import functions as F
sys.path.insert(0, %(repo)r)
from crawler_spark.session import get_spark

n, cpus = %(n)d, %(cpus)d
spark = get_spark("cpu_cal", parallelism=cpus, shuffle_partitions=cpus,
                  extra_conf={"spark.driver.extraJavaOptions": f"-XX:ActiveProcessorCount={cpus}"})
def job():
    df = spark.range(0, n, 1, cpus * 4).select(F.col("id").cast("string").alias("s"))
    h = F.col("s")
    for _ in range(8):
        h = F.sha2(h, 256)
    return df.select(h.alias("h")).select(F.max("h"))
job().collect()  # warm (JIT + codegen)
reps = []
for _ in range(3):
    t0 = time.time(); job().collect(); reps.append(time.time() - t0)
reps.sort()
print(json.dumps({"cpus": cpus, "sec": reps[1], "reps": reps}))
spark.stop()
"""


def run(n: int, cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, "-c", _CHILD % {"repo": REPO, "n": n, "cpus": cpus}],
        capture_output=True, text=True, check=True, env=dict(os.environ, PYTHONPATH=REPO),
    )
    return json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32_000_000
    small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    big = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    a, b = run(n, small), run(n, big)
    print(json.dumps(a)); print(json.dumps(b))
    eff = (a["sec"] / b["sec"]) / (big / small)
    print(json.dumps({"n": n, "pair": f"{small}->{big}",
                      "speedup": round(a["sec"] / b["sec"], 3),
                      "ceiling_efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
