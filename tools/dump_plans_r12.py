"""Dump .explain('formatted') for the queries round 12 touches.

Usage: python tools/dump_plans_r12.py before|after [query ...]
Writes plans/r12/<query>_<tag>.txt
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import functions as F

    from pulsar_spark import get_spark
    from pulsar_spark.functions.dedupe import (
        commit_near_fingerprints,
        incremental_near_dedup,
        minhash_near_duplicates,
    )
    from pulsar_spark.sources import load_table

    spark = get_spark("plans-r12")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)

    def dump(name: str, df) -> None:
        if only and name not in only:
            return
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        p = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(p, "w") as fh:
            fh.write(txt)
        n_ex = txt.count("Exchange")
        print(f"wrote {p}  ({len(txt.splitlines())} lines, {n_ex} Exchange refs)")

    # x10: the returned probe frame (store prebuilt like bench.py)
    if not only or "x10_incremental_near" in only:
        store = tempfile.mkdtemp(prefix="plans_x10_") + "/store"
        commit_near_fingerprints(
            docs.crossJoin(spark.range(2).withColumnRenamed("id", "rep"))
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
            .drop("rep").select("doc_id", "text"), store, epoch=1)
        probe = docs.select((F.col("doc_id") + 999_000_000).alias("doc_id"), "text")
        dump("x10_incremental_near", incremental_near_dedup(
            probe, store, threshold=0.7, update_store=False, epoch=2))
        import shutil
        shutil.rmtree(os.path.dirname(store), ignore_errors=True)

    # x2: the near-dup pair frame as benched
    dump("x2_minhash_dedup", minhash_near_duplicates(
        docs, threshold=0.5, max_bucket_size=512))

    # x8: the pHash near-dup frame as benched (fixture -> fused
    # decode+hash -> banded join)
    if not only or "x8_media_phash" in only:
        import __spark_entry__ as _e
        from pulsar_spark.functions.phash import (
            perceptual_hash_media,
            phash_near_dups,
        )

        n_docs = docs.count()
        media = _e._phash_media_fixture(
            spark, sf_dir, perturb=True, n_patterns=max(37, n_docs // 10)
        )
        dump("x8_media_phash", phash_near_dups(perceptual_hash_media(media)))

    # b1: the produce envelope frame (captured via writer stub)
    if not only or "b1_produce" in only:
        from pulsar_spark.sources.topics import produce
        import pyspark.sql.readwriter as RW

        events = load_table(spark, sf_dir, "events")
        n = events.count()
        cap = {}
        orig = RW.DataFrameWriter.parquet
        RW.DataFrameWriter.parquet = lambda self, p, **kw: cap.setdefault(
            "df", self._df)
        try:
            tmp = tempfile.mkdtemp(prefix="plans_b1_")
            produce(events, f"{tmp}/t", key_col="user_id", num_partitions=32,
                    mode="append", write_tasks=max(1, min(32, n // 6250)))
        finally:
            RW.DataFrameWriter.parquet = orig
        # r12: produce executes its write with AQE disabled (the plan
        # has no join and a coalescing-exempt explicit repartition), so
        # the "after" dump explains under that conf — the executed plan
        # has no AdaptiveSparkPlan wrapper / query-stage boundary.
        if tag == "after":
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            dump("b1_produce", cap["df"])
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", "true")

    spark.stop()


if __name__ == "__main__":
    main()
