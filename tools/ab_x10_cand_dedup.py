"""Interleaved A/B: the x10 history-probe candidate dedup.

Variants (all result-identical — the drop set feeds a left_anti join,
which ignores duplicate keys; duplicates only multiply verify work):
  distinct — current: distinct over (id, signature array, _fp)
  bykey    — dropDuplicates([id, _fp]) (id -> signature is functional,
             so same surviving rows, but the exchange hashes two
             bigints instead of a 64-element array)
  none     — no dedup: <=16 duplicate rows per (id,_fp) (one per
             matching band) flow into the broadcast build + verify

Usage: SPARK_GRAFT_CPUS=32 python tools/ab_x10_cand_dedup.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    import pulsar_spark.functions.dedupe as dd
    from pulsar_spark import get_spark
    from pulsar_spark.sources import load_table

    spark = get_spark("ab-x10-cand")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    st = sc.statusTracker()
    docs = load_table(spark, sf_dir, "documents")
    docs.count()
    dd.minhash_near_duplicates(
        docs.limit(256).repartition(sc.defaultParallelism), threshold=0.5
    ).count()
    spark.catalog.clearCache()

    store = tempfile.mkdtemp(prefix="ab_x10c_") + "/store"
    dd.commit_near_fingerprints(
        docs.crossJoin(spark.range(2).withColumnRenamed("id", "rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
        .drop("rep").select("doc_id", "text"), store, epoch=1)
    probe = docs.select((F.col("doc_id") + 999_000_000).alias("doc_id"), "text")

    def run(tag, i):
        before = set(st.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        n = dd.incremental_near_dedup(
            probe, store, threshold=0.7, update_store=False, epoch=2
        ).count()
        dt = time.perf_counter() - t0
        jobs = [j for j in (st.getJobIdsForGroup(None) or [])
                if j not in before]
        print(f"  {tag:<9s} run {i}: {dt:.3f}s rows={n} jobs={len(jobs)}",
              flush=True)
        return dt

    res = {}
    for i in range(5):
        for mode in ("distinct", "bykey", "none"):
            dd._CAND_DEDUP = mode
            res.setdefault(mode, []).append(run(mode, i))
    dd._CAND_DEDUP = "distinct"
    for mode, xs in res.items():
        print(f"{mode:<9s} min={min(xs):.3f} median={sorted(xs)[2]:.3f}")
    import shutil
    shutil.rmtree(os.path.dirname(store), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
