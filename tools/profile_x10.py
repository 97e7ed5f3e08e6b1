"""Stepwise timing of incremental_near_dedup's internals (x10) —
mirrors the function body so each phase is a separately-timed action.

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
        _band_pfx,
        _near_store_dirs,
        _near_store_sigs,
        _read_stored_bands,
        commit_near_fingerprints,
        dedup_keep_representatives,
        minhash_near_duplicates,
        minhash_signatures,
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

    for it in range(2):
        print(f"--- iteration {it} ---", flush=True)
        scratch = tempfile.mkdtemp(prefix=f"prof_x10_scratch_{it}_")
        num_perm, k, bands, threshold, id_col, text_col = 64, 3, 16, 0.7, "doc_id", "text"

        t("1 sig write", lambda: minhash_signatures(
            probe, text_col, id_col, num_perm, k, bands=bands
        ).select(id_col, "signature", "band_hashes").write.mode("overwrite").parquet(f"{scratch}/sigs"))
        sigs_all = spark.read.parquet(f"{scratch}/sigs")

        pairs = minhash_near_duplicates(
            probe, threshold, text_col, id_col, num_perm, k, bands,
            max_bucket_size=512, sigs=sigs_all)
        t("2a pairs.count (cand+verify)", lambda: pairs.count())
        t("2b keep_reps write", lambda: dedup_keep_representatives(
            probe, pairs, id_col).write.mode("overwrite").parquet(f"{scratch}/batch"))
        batch = spark.read.parquet(f"{scratch}/batch")

        sigs = _near_store_sigs(
            batch, text_col, id_col, num_perm, k, bands,
            sigs=sigs_all.join(batch.select(id_col), on=id_col, how="left_semi"))
        band_dirs = _near_store_dirs(spark, store, "bands", 2)
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
        import shutil
        shutil.rmtree(scratch, ignore_errors=True)

    import shutil
    shutil.rmtree(os.path.dirname(store), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
