"""TableView — materialized key -> latest-value map.

Reference semantics: TableViewImpl maintains a ConcurrentMap folded
continuously from the log — latest value per key, null value removes
the key (pulsar-client/.../impl/TableViewImpl.java:49-55, handleMessage
:208). It is exactly publish-order compaction exposed as a table.

Spark-first: batch = compaction agg; streaming = update-mode
``groupBy(key).agg(max_by(...))`` or foreachBatch merge (see
pulsar_spark.streaming.tableview_stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from pulsar_spark.operators.compaction import compact_publish_order


def table_view(
    messages: DataFrame,
    key_col: str = "key",
    value_cols: list[str] | None = None,
    offset_col: str = "offset",
    tombstone_col: str = "tombstone",
) -> DataFrame:
    """Materialize the key -> latest value view (tombstones delete)."""
    compacted = compact_publish_order(messages, key_col, offset_col, tombstone_col)
    if value_cols:
        return compacted.select(key_col, *value_cols)
    return compacted
