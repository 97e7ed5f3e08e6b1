"""Interleaved A/B: x5 bench lambda with vs without the r11
fan_out+localCheckpoint pin of the scrubbed sample (VERDICT r11 #3:
the driver read the pinned variant flat-to-worse; re-prove >=1.1x or
revert).

Usage: SPARK_GRAFT_CPUS=32 python tools/ab_x5_pin.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from pulsar_spark import get_spark
    from pulsar_spark.functions import dup_span_fraction, hash_sample, redact_pii
    from pulsar_spark.sources import fan_out, load_table

    spark = get_spark("ab-x5-pin")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    st = sc.statusTracker()
    docs = load_table(spark, sf_dir, "documents")
    docs.count()

    def pinned():
        d = fan_out(hash_sample(docs, 0.5, key_col="doc_id", seed=1)).select(
            "doc_id", redact_pii(F.col("text")).alias("text")
        ).localCheckpoint()
        return dup_span_fraction(d, n=5).count()

    def unpinned():
        d = hash_sample(docs, 0.5, key_col="doc_id", seed=1).select(
            "doc_id", redact_pii(F.col("text")).alias("text")
        )
        return dup_span_fraction(d, n=5).count()

    def run(tag, fn, i):
        before = set(st.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        n = fn()
        dt = time.perf_counter() - t0
        jobs = [j for j in (st.getJobIdsForGroup(None) or [])
                if j not in before]
        print(f"  {tag} run {i}: {dt:.3f}s rows={n} jobs={len(jobs)}",
              flush=True)
        return dt

    # warmup both shapes once
    pinned(); unpinned()
    a, b = [], []
    for i in range(6):
        a.append(run("pinned  ", pinned, i))
        b.append(run("unpinned", unpinned, i))
    print(f"pinned   min={min(a):.3f} median={sorted(a)[3]:.3f}")
    print(f"unpinned min={min(b):.3f} median={sorted(b)[3]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
