from pulsar_spark.sources.loader import load_table, TIMESTAMP_NS_COLUMNS

__all__ = ["load_table", "TIMESTAMP_NS_COLUMNS"]
