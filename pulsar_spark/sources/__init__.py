from pulsar_spark.sources.loader import load_table, TIMESTAMP_NS_COLUMNS
from pulsar_spark.sources.topics import (
    produce,
    write_topic,
    read_topic,
    route_partition,
    write_topic_bucketed,
    read_topic_table,
    create_topic,
    topic_metadata,
    update_partitions,
)

__all__ = [
    "load_table",
    "TIMESTAMP_NS_COLUMNS",
    "produce",
    "write_topic",
    "write_topic_bucketed",
    "read_topic_table",
    "read_topic",
    "route_partition",
    "create_topic",
    "topic_metadata",
    "update_partitions",
]
