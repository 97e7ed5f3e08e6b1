"""Per-phase job accounting for incremental_near_dedup (x10): mirrors
the function body (like tools/profile_x10.py) with a setJobGroup per
phase, printing jobs/stages/tasks each phase issued. Steal-immune.
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
        _clean_scratch,
        commit_near_fingerprints,
        minhash_near_duplicates,
        minhash_signatures,
        near_dup_clusters,
    )
    from pulsar_spark.sources import load_table

    spark = get_spark("jobs-x10-phases")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    st = sc.statusTracker()
    docs = load_table(spark, sf_dir, "documents")
    docs.count()
    minhash_near_duplicates(docs.limit(256).repartition(32), threshold=0.5).count()

    store = tempfile.mkdtemp(prefix="jobs_x10p_") + "/store"
    commit_near_fingerprints(
        docs.crossJoin(spark.range(2).withColumnRenamed("id", "rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
        .drop("rep").select("doc_id", "text"), store, epoch=1)
    probe = docs.select((F.col("doc_id") + 999_000_000).alias("doc_id"), "text")

    num_perm, k, bands, threshold, id_col, text_col = 64, 3, 16, 0.7, "doc_id", "text"

    seq = [0]

    def ph(name, fn):
        seq[0] += 1
        g = f"ph{seq[0]}"
        sc.setJobGroup(g, name)
        t0 = time.perf_counter()
        r = fn()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jids = sorted(st.getJobIdsForGroup(g))
        ntasks = sum(
            getattr(st.getStageInfo(s), "numTasks", 0) or 0
            for j in jids for s in st.getJobInfo(j).stageIds
        )
        print(f"  {name:<46s} {dt:7.3f}s jobs={len(jids):2d} tasks={ntasks}",
              flush=True)
        return r

    for it in range(3):
        print(f"--- iteration {it} ---", flush=True)
        new_docs = probe

        ph("0 recover+scratch (py4j FS)", lambda: (
            _recover_store_swap(spark, store),
            _clean_scratch(spark, f"{store}/_scratch")))

        sigs_all = ph("1 sigs_all localCheckpoint", lambda: minhash_signatures(
            new_docs, text_col, id_col, num_perm, k, bands=bands
        ).select(id_col, "signature", "band_hashes").localCheckpoint())

        pairs = minhash_near_duplicates(
            new_docs, threshold, text_col, id_col, num_perm, k, bands,
            max_bucket_size=None, sigs=sigs_all)
        clusters = ph("2a near_dup_clusters",
                      lambda: near_dup_clusters(pairs, "id_a", "id_b"))
        losers = clusters.where(F.col("id") != F.col("cluster_id")).select(
            F.col("id").alias(id_col))
        if getattr(clusters, "_psk_local", False):
            losers_b = F.broadcast(losers)
            print("  2b losers: LocalRelation fast path (no pin)")
        else:
            losers = ph("2b losers localCheckpoint", lambda: losers.localCheckpoint())
            losers_b = losers
        batch = new_docs.join(losers_b, on=id_col, how="left_anti")

        sigs = _near_store_sigs(
            batch, text_col, id_col, num_perm, k, bands,
            sigs=sigs_all.join(losers_b, on=id_col, how="left_anti"))
        band_dirs = ph("3x band+sig dir listings (py4j)", lambda: (
            _near_store_dirs(spark, store, "bands", 2)))
        sig_dirs = _near_store_dirs(spark, store, "sigs", 2)
        probe_b = sigs.select(
            F.col(id_col), F.col("signature"),
            F.posexplode("band_hashes").alias("band_idx", "band_hash"))
        stored_bands = ph("3a _read_stored_bands",
                          lambda: _read_stored_bands(spark, band_dirs, probe=probe_b))
        cand = (stored_bands.join(F.broadcast(probe_b), on=["band_idx", "band_hash"])
                .select(id_col, "signature", "_fp").distinct())
        stored_sigs = spark.read.schema(
            "_fp BIGINT, signature ARRAY<BIGINT>").parquet(*sig_dirs)
        agree = F.size(F.filter(
            F.zip_with("signature", "old_signature", lambda a, b: a == b),
            lambda x: x)) / F.lit(num_perm)
        dropped = (cand.join(
            stored_sigs.withColumnRenamed("signature", "old_signature"), on="_fp")
            .where(agree >= threshold).select(id_col))
        final = batch.join(F.broadcast(dropped), on=id_col, how="left_anti")
        ph("4 final.count (history probe + anti-joins)", lambda: final.count())

    import shutil
    shutil.rmtree(os.path.dirname(store), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
