"""Streaming TableView — continuously folded key -> latest-value map.

Reference semantics: TableViewImpl folds every message into a
ConcurrentMap (latest per key, null value deletes) and notifies
listeners (pulsar-client/.../impl/TableViewImpl.java:49-55, :170, :208).

Two Spark forms:
- ``table_view_stream``: update-mode streaming aggregation
  ``groupBy(key).agg(max_by(...))`` — emits changed keys each
  micro-batch (the listener feed).
- ``table_view_merge_sink``: foreachBatch merge into a keyed parquet
  table — the queryable materialized map, applying tombstone deletes.
  (With a Delta/Iceberg sink this would be a MERGE; plain parquet
  rewrites, which is fine for a view-sized table: #keys << #messages.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_view_stream(messages_stream: DataFrame, value_cols: list[str]) -> DataFrame:
    """Update-mode streaming fold: latest (by offset) value per key.
    Tombstoned keys surface with ``tombstone = true`` so a downstream
    listener can delete them."""
    picked = F.max_by(
        F.struct(*[F.col(c) for c in value_cols], F.col("tombstone")), F.struct("publish_time", "offset")
    ).alias("_v")
    return (
        messages_stream.where(F.col("key").isNotNull())
        .groupBy("key")
        .agg(picked)
        .select("key", "_v.*")
    )


def table_view_merge_sink(view_path: str, value_cols: list[str]):
    """foreachBatch callback maintaining the materialized key->value
    table at ``view_path`` (upsert + tombstone delete per batch)."""

    def merge(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        updates = (
            batch_df.where(F.col("key").isNotNull())
            .groupBy("key")
            .agg(
                F.max_by(
                    F.struct(*[F.col(c) for c in value_cols], F.col("tombstone")),
                    F.struct("publish_time", "offset"),
                ).alias("_v")
            )
            .select("key", "_v.*")
        )
        try:
            current = spark.read.parquet(view_path)
            merged = (
                current.join(updates.select("key"), on="key", how="left_anti")
                .unionByName(updates.where(~F.col("tombstone")))
            )
        except Exception:
            merged = updates.where(~F.col("tombstone"))
        # write via temp-then-swap is unnecessary locally; a real deploy
        # would use a table format with atomic MERGE
        merged.persist()
        merged.count()
        merged.write.mode("overwrite").parquet(view_path)
        merged.unpersist()

    return merge
