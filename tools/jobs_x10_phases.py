"""Stepwise job/task counts for incremental_near_dedup's internals (x10),
mirroring the CURRENT function body so each phase is separately counted.

Usage: SPARK_GRAFT_CPUS=32 python tools/jobs_x10_phases.py [sf_dir]
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

    from pulsar_spark import get_spark
    from pulsar_spark.functions.dedupe import (
        _near_store_dirs,
        _near_store_sigs,
        _read_stored_bands,
        _recover_store_swap,
        _unpersist_pin,
        commit_near_fingerprints,
        minhash_near_duplicates,
        minhash_signatures,
        near_dup_clusters,
    )
    from pulsar_spark.sources import load_table

    spark = get_spark("jobs-x10-phases")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    docs = load_table(spark, sf_dir, "documents")
    docs.count()
    minhash_near_duplicates(
        docs.limit(256).repartition(sc.defaultParallelism), threshold=0.5
    ).count()

    store = tempfile.mkdtemp(prefix="jobs_x10_") + "/store"
    commit_near_fingerprints(
        docs.crossJoin(spark.range(2).withColumnRenamed("id", "rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
        .drop("rep").select("doc_id", "text"), store, epoch=1)
    probe = docs.select((F.col("doc_id") + 999_000_000).alias("doc_id"), "text")

    def t(name, fn):
        before = set(tracker.getJobIdsForGroup(None) or [])
        t0 = time.perf_counter()
        r = fn()
        dt = round(time.perf_counter() - t0, 3)
        time.sleep(0.1)
        jobs = [j for j in (tracker.getJobIdsForGroup(None) or []) if j not in before]
        ntasks = 0
        for j in jobs:
            ji = tracker.getJobInfo(j)
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si:
                    ntasks += si.numTasks
        print(f"  {name:<46s} {dt}s jobs={len(jobs):2d} tasks={ntasks}", flush=True)
        return r

    num_perm, k, bands, threshold, id_col, text_col = 64, 3, 16, 0.7, "doc_id", "text"
    for it in range(3):
        print(f"--- iteration {it} ---", flush=True)
        new_docs = probe

        t("0 recover+scratch (py4j FS)", lambda: _recover_store_swap(spark, store))

        sigs_all = t("1 sigs_all ckpt (+shingle_hashes)", lambda: (
            minhash_signatures(new_docs, text_col, id_col, num_perm, k, bands=bands)
            .select(id_col, "signature", "band_hashes",
                    F.transform("shingles", lambda s: F.xxhash64(s))
                    .alias("shingle_hashes"))
            .localCheckpoint()))

        pairs = minhash_near_duplicates(
            new_docs, threshold, text_col, id_col, num_perm, k, bands,
            max_bucket_size=512, sigs=sigs_all)
        clusters = t("2a near_dup_clusters prefer_driver", lambda:
                     near_dup_clusters(pairs, "id_a", "id_b", prefer_driver=True))
        for _pin in getattr(pairs, "_psk_pins", []):
            _pin.unpersist(False)
        losers = clusters.where(F.col("id") != F.col("cluster_id")).select(
            F.col("id").alias(id_col))
        losers_b = F.broadcast(losers)
        batch = new_docs.join(losers_b, on=id_col, how="left_anti")

        sigs = _near_store_sigs(batch, text_col, id_col, num_perm, k, bands,
                                sigs=sigs_all)
        band_dirs = t("3x band dir listing (py4j)", lambda:
                      _near_store_dirs(spark, store, "bands", 2))
        sig_dirs = _near_store_dirs(spark, store, "sigs", 2)
        probe_f = sigs.select(F.col(id_col), F.col("signature"),
                              F.posexplode("band_hashes").alias("band_idx", "band_hash"))
        stored_bands = t("3a _read_stored_bands", lambda:
                         _read_stored_bands(spark, band_dirs, probe=probe_f))
        cand = (stored_bands.join(F.broadcast(probe_f), on=["band_idx", "band_hash"])
                .select(id_col, "signature", "_fp").distinct())
        stored_sigs = spark.read.schema(
            "_fp BIGINT, signature ARRAY<BIGINT>").parquet(*sig_dirs)
        agree = F.size(F.filter(
            F.zip_with("signature", "old_signature", lambda a, b: a == b),
            lambda x: x)) / F.lit(num_perm)
        dropped = (cand.join(stored_sigs.withColumnRenamed("signature", "old_signature"),
                             on="_fp")
                   .where(agree >= threshold).select(id_col))
        dropped = t("4a dropped ckpt (history probe)", lambda: dropped.localCheckpoint())
        batch = batch.join(F.broadcast(dropped), on=id_col, how="left_anti")
        t("4b final.count (scan + 2 anti-joins)", lambda: batch.count())
        _unpersist_pin(sigs_all)

    spark.stop()


if __name__ == "__main__":
    main()
