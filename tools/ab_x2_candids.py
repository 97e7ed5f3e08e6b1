"""Interleaved A/B: x2's cand_ids via union(two projections)+distinct
(current) vs explode(array(id_a,id_b))+distinct (one scan of the cand
cache). Result sets are identical (same id multiset module duplicates,
then distinct). Measures the FULL x2 query both ways.

Usage: SPARK_GRAFT_CPUS=32 python tools/ab_x2_candids.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    import pulsar_spark.functions.dedupe as dd
    from pulsar_spark import get_spark
    from pulsar_spark.functions import minhash_near_duplicates

    spark = get_spark("ab-x2-candids")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    st = sc.statusTracker()
    from pulsar_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    docs.count()
    minhash_near_duplicates(
        docs.limit(256).repartition(sc.defaultParallelism), threshold=0.5
    ).count()
    spark.catalog.clearCache()

    orig = dd.minhash_near_duplicates

    def run(tag, i):
        spark.catalog.clearCache()
        before = set(st.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        n = dd.minhash_near_duplicates(
            docs, threshold=0.5, max_bucket_size=512
        ).count()
        dt = time.perf_counter() - t0
        jobs = [j for j in (st.getJobIdsForGroup(None) or [])
                if j not in before]
        print(f"  {tag} run {i}: {dt:.3f}s rows={n} jobs={len(jobs)}",
              flush=True)
        return dt

    # Build the explode variant by source patching at runtime is
    # fragile; instead flip a module flag the function consults.
    a, b = [], []
    for i in range(5):
        dd._CAND_IDS_EXPLODE = False
        a.append(run("union  ", i))
        dd._CAND_IDS_EXPLODE = True
        b.append(run("explode", i))
    dd._CAND_IDS_EXPLODE = False
    print(f"union   min={min(a):.3f} median={sorted(a)[2]:.3f}")
    print(f"explode min={min(b):.3f} median={sorted(b)[2]:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
