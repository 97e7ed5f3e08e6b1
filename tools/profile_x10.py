"""Stepwise timing of incremental_near_dedup's internals (x10) —
mirrors the r11 function body (localCheckpoint pins, loser-id anti-join,
prefix-pruned store probe) so each phase is a separately-timed action.

Usage: SPARK_GRAFT_CPUS=32 python tools/profile_x10.py [sf_dir]
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
        commit_near_fingerprints,
        minhash_near_duplicates,
        minhash_signatures,
        near_dup_clusters,
    )
    from pulsar_spark.sources import load_table

    spark = get_spark("profile-x10")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()
    # Arrow warmup
    minhash_near_duplicates(docs.limit(256).repartition(32), threshold=0.5).count()

    store = tempfile.mkdtemp(prefix="prof_x10_") + "/store"
    commit_near_fingerprints(
        docs.crossJoin(spark.range(2).withColumnRenamed("id", "rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
        .drop("rep").select("doc_id", "text"), store, epoch=1)
    probe = docs.select((F.col("doc_id") + 999_000_000).alias("doc_id"), "text")

    def t(name, fn):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        r = fn()
        dt = round(time.perf_counter() - t0, 3)
        print(f"  {name:<44s} {dt}s", flush=True)
        return r

    num_perm, k, bands, threshold, id_col, text_col = 64, 3, 16, 0.7, "doc_id", "text"
    for it in range(3):
        print(f"--- iteration {it} ---", flush=True)
        new_docs = probe

        t("0 recover+scratch (py4j FS)", lambda: (
            _recover_store_swap(spark, store)))

        sigs_all = t("1 sigs_all localCheckpoint", lambda: minhash_signatures(
            new_docs, text_col, id_col, num_perm, k, bands=bands
        ).select(id_col, "signature", "band_hashes").localCheckpoint())

        pairs = minhash_near_duplicates(
            new_docs, threshold, text_col, id_col, num_perm, k, bands,
            max_bucket_size=512, sigs=sigs_all)
        clusters = t("2a near_dup_clusters (pairs collect)",
                     lambda: near_dup_clusters(pairs, "id_a", "id_b"))
        losers = clusters.where(F.col("id") != F.col("cluster_id")).select(
            F.col("id").alias(id_col))
        if not getattr(clusters, "_psk_local", False):
            losers = t("2b losers localCheckpoint", lambda: losers.localCheckpoint())
        else:
            print("  2b losers: LocalRelation fast path (no pin)")
        batch = new_docs.join(F.broadcast(losers), on=id_col, how="left_anti")

        sigs = _near_store_sigs(
            batch, text_col, id_col, num_perm, k, bands,
            sigs=sigs_all.join(F.broadcast(losers), on=id_col, how="left_anti"))
        band_dirs = t("3x band+sig dir listings (py4j)", lambda: (
            _near_store_dirs(spark, store, "bands", 2)))
        sig_dirs = _near_store_dirs(spark, store, "sigs", 2)
        probe_b = sigs.select(
            F.col(id_col), F.col("signature"),
            F.posexplode("band_hashes").alias("band_idx", "band_hash"))
        stored_bands = t("3a _read_stored_bands (prefix collect)",
                         lambda: _read_stored_bands(spark, band_dirs, probe=probe_b))
        print(f"     stored_bands scan partitions: "
              f"{stored_bands.rdd.getNumPartitions()}", flush=True)
        cand = (stored_bands.join(F.broadcast(probe_b), on=["band_idx", "band_hash"])
                .select(id_col, "signature", "_fp").distinct())
        t("3b cand.count (store scan+join)", lambda: cand.count())
        stored_sigs = spark.read.parquet(*sig_dirs)
        agree = F.size(F.filter(
            F.zip_with("signature", "old_signature", lambda a, b: a == b),
            lambda x: x)) / F.lit(num_perm)
        dropped = (cand.join(
            stored_sigs.withColumnRenamed("signature", "old_signature"), on="_fp")
            .where(agree >= threshold).select(id_col).distinct())
        t("3c dropped.count (sig verify)", lambda: dropped.count())
        final = batch.join(F.broadcast(dropped), on=id_col, how="left_anti")
        t("4 final.count", lambda: final.count())
        t("5 FULL incremental_near_dedup", lambda: __import__(
            "pulsar_spark.functions.dedupe", fromlist=["incremental_near_dedup"]
        ).incremental_near_dedup(
            new_docs, store, threshold=threshold, update_store=False, epoch=2
        ).count())

    import shutil
    shutil.rmtree(os.path.dirname(store), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
