from pulsar_spark.sources.loader import load_table, TIMESTAMP_NS_COLUMNS
from pulsar_spark.sources.topics import produce, write_topic, read_topic, route_partition

__all__ = [
    "load_table",
    "TIMESTAMP_NS_COLUMNS",
    "produce",
    "write_topic",
    "read_topic",
    "route_partition",
]
