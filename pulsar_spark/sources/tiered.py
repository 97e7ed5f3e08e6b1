"""Tiered storage — offload sealed/old data to a cold tier with
read-through.

Reference semantics (SURVEY.md §2.1): sealed ledgers past an age/size
threshold move to S3/GCS/filesystem via LedgerOffloader
(managed-ledger/.../LedgerOffloader.java; tiered-storage/jcloud,
tiered-storage/file-system); reads transparently stitch hot + cold.

Spark-first: offload = move parquet files whose max publish_time is
older than the cutoff into the cold directory (a different bucket /
storage class in production); the read-through view is a UNION ALL of
both tiers — Catalyst prunes whichever side a time predicate excludes.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def offload_partitions(
    spark: SparkSession,
    hot_path: str,
    cold_path: str,
    cutoff_ts: str,
    time_col: str = "publish_time",
) -> dict[str, int]:
    """Move rows older than ``cutoff_ts`` to the cold tier.

    Rewrites per topic-partition: cold rows append to the cold dir, hot
    dir is rewritten without them (the reference offloads whole sealed
    ledgers; parquet's unit is the file/row-group, so the rewrite is the
    honest equivalent).

    Crash ordering: the hot rewrite lands in a side directory FIRST,
    then cold rows are appended, then the directory swap happens last.
    A failure before the swap leaves the original hot dir intact (the
    cold tier may hold a duplicate copy of the offloaded rows, which
    ``tiered_view`` readers should treat as at-least-once until the next
    successful offload re-runs — same contract as the reference's
    offload-then-trim, where the ledger stays readable in BookKeeper
    until offload completes and trimming is a separate step). The
    ``_topic.json`` metadata sidecar is copied into the rewrite dir
    before the swap so topic identity survives.
    """
    hot = spark.read.parquet(hot_path)
    cutoff = F.lit(cutoff_ts).cast("timestamp")
    cold_rows = hot.where(F.col(time_col) < cutoff)
    keep_rows = hot.where(F.col(time_col) >= cutoff)

    n_cold = cold_rows.count()
    if n_cold == 0:
        return {"offloaded": 0, "hot": keep_rows.count()}

    tmp = hot_path.rstrip("/") + "__rewrite"
    keep_rows.repartition("partition").write.mode("overwrite").partitionBy("partition").parquet(tmp)
    sidecar = os.path.join(hot_path, "_topic.json")
    if os.path.exists(sidecar):
        shutil.copy2(sidecar, os.path.join(tmp, "_topic.json"))
    cold_rows.repartition("partition").write.mode("append").partitionBy("partition").parquet(
        cold_path
    )
    shutil.rmtree(hot_path)
    os.rename(tmp, hot_path)
    return {"offloaded": n_cold, "hot": spark.read.parquet(hot_path).count()}


def tiered_view(spark: SparkSession, hot_path: str, cold_path: str) -> DataFrame:
    """Read-through union of hot + cold tiers (time predicates prune
    whole tiers via partition/file statistics)."""
    hot = spark.read.parquet(hot_path)
    try:
        cold = spark.read.parquet(cold_path)
    except Exception:
        return hot
    return hot.unionByName(cold)
