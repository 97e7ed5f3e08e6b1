"""pulsar_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of Apache Pulsar (reference: /root/reference).

Pulsar is a distributed, partitioned, schematized append-only log with
log-relational operators layered on top (SURVEY.md):

- keyed compaction (latest-value-per-key, tombstones)
- TableView (materialized key -> latest value)
- sequence-based deduplication (effectively-once)
- delayed / scheduled delivery, TTL / retention / expiry
- time-indexed seek, peek/skip, backlog stats
- four subscription disciplines (Exclusive/Failover/Shared/Key_Shared)
- Functions compute layer: map/flatMap + stateful counters +
  tumbling/sliding count- and time-windows with watermarks + late data
- connector framework (IO source/sink), transactions, tiered storage

This package re-expresses each of those as idiomatic PySpark
(DataFrame/SQL + Structured Streaming), NOT as a port of the reference's
Java/C++ execution engine: the logical plan is declared with the
DataFrame API and Catalyst/Tungsten pick the physical strategy.
"""

from pulsar_spark.session import get_spark
from pulsar_spark.envelope import ENVELOPE_FIELDS, events_to_messages, messages_oracle_cte

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "ENVELOPE_FIELDS",
    "events_to_messages",
    "messages_oracle_cte",
    "__version__",
]
