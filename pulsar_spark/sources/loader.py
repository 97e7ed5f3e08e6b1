"""Test-data loaders.

The driver's parquet tables store timestamps as INT64 TIMESTAMP(NANOS)
which Spark does not support natively ([PARQUET_TYPE_ILLEGAL]). We read
them with ``spark.sql.legacy.parquet.nanosAsLong`` (nanos surface as
BIGINT) and normalize to TimestampType at microsecond precision, which
is lossless for this data (generated at micro precision) and matches
what DuckDB sees.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: table -> columns stored as TIMESTAMP(NANOS) in the driver parquet.
TIMESTAMP_NS_COLUMNS: dict[str, list[str]] = {
    "events": ["ts"],
    "lineitem": ["l_shipdate"],
    "orders": ["o_orderdate"],
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table, normalizing nano timestamps to TimestampType."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in TIMESTAMP_NS_COLUMNS.get(name, []):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df
