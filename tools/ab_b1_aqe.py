"""Interleaved A/B: produce() append with AQE on vs off.

The produce plan is scan -> fused envelope mint -> explicit
REPARTITION(n, partition) -> offset window -> partitioned write. AQE
cannot improve that shape (no joins; the explicit repartition is exempt
from partition coalescing; skew handling applies only to joins) but it
does add a query-stage boundary: the shuffle map stage materializes as
its own job, plus re-planning time. This measures both variants
interleaved on the same JVM.

Usage: SPARK_GRAFT_CPUS=32 python tools/ab_b1_aqe.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pulsar_spark import get_spark
    from pulsar_spark.sources import load_table
    from pulsar_spark.sources.topics import produce

    spark = get_spark("ab-b1-aqe")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    st = sc.statusTracker()
    events = load_table(spark, sf_dir, "events")
    n = events.count()
    tasks = max(1, min(32, n // 6250))
    tmp = tempfile.mkdtemp(prefix="ab_b1_")

    def run(tag: str, aqe: str, i: int) -> float:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)
        before = set(st.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        produce(events, f"{tmp}/{tag}_{i}", key_col="user_id",
                num_partitions=32, mode="append", write_tasks=tasks)
        dt = time.perf_counter() - t0
        jobs = [j for j in (st.getJobIdsForGroup(None) or [])
                if j not in before]
        print(f"  {tag} run {i}: {dt:.3f}s jobs={len(jobs)}", flush=True)
        return dt

    # warm the JIT with full-size appends (same protocol as bench.py)
    for wi in range(4):
        produce(events, f"{tmp}/warm_{wi}", key_col="user_id",
                num_partitions=32, mode="append", write_tasks=tasks)

    a, b = [], []
    for i in range(6):
        a.append(run("aqe_on", "true", i))
        b.append(run("aqe_off", "false", i))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    print(f"AQE on  min={min(a):.3f} median={sorted(a)[3]:.3f}")
    print(f"AQE off min={min(b):.3f} median={sorted(b)[3]:.3f}")
    print(f"rows/s best: on={n/min(a):,.0f} off={n/min(b):,.0f}")
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
