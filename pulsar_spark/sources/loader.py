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


def fan_out(df: DataFrame, min_parallelism: int | None = None) -> DataFrame:
    """Scale-adaptive input fan-out (optimization guide §2.5, input
    skew): when a frame's partition count is below the session's core
    count — a single-file, single-row-group input is unsplittable, so
    EVERY narrow stage above it (tokenization, regex, Arrow/pandas
    signature UDFs) runs on ONE core — round-robin repartition to
    ``defaultParallelism`` so per-row compute uses the whole machine.

    A NO-OP whenever the input already has enough partitions, which is
    the 100 TB case (thousands of scan splits): this never adds an
    exchange to a well-laid-out input, so it is an input-shape repair,
    not a local-mode tuning constant. Callers must be row-order
    insensitive downstream (every consumer here aggregates by key,
    joins, or sorts grouped arrays); keep it away from
    ``monotonically_increasing_id`` / ``spark_partition_id`` lineages
    (the produce envelope path), where a repartition changes minted
    values.

    Also a NO-OP on any frame whose physical plan already contains an
    Exchange (r11 review fix): first, such a frame is redistributed by
    its own shuffle, so there is no single-file input shape to repair;
    second — the load-bearing reason — probing ``df.rdd`` under AQE
    calls ``getFinalPhysicalPlan()``, which EXECUTES every upstream
    shuffle stage just to answer ``getNumPartitions()``, and the
    caller's real action then re-plans and re-executes them. The plan
    string check below is pure Catalyst planning (``sparkPlan`` is the
    pre-adaptive physical plan, cached on the frame's QueryExecution),
    so the scan-shaped inputs this helper exists for never pay an
    extra job."""
    if df.isStreaming:
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism if min_parallelism is None else min_parallelism
    # Match SHUFFLE exchanges specifically (r12, advisor fix): the
    # former bare "Exchange" substring also matched BroadcastExchange,
    # conflating two different situations. A shuffle in the plan means
    # the frame is redistributed by its own exchange (no single-file
    # shape left to repair) AND that probing df.rdd under AQE would
    # execute that shuffle — bail without touching df.rdd. A
    # BROADCAST-only plan is different: the probe side may still be a
    # single-partition scan, but probing df.rdd would still build the
    # broadcast stage under AQE (executeBroadcast submits its job), and
    # that work is thrown away when the caller's real action re-plans —
    # so we still skip the repair there, now as a DOCUMENTED trade-off
    # (fan_out callers in this engine hand it bare scans; a caller that
    # needs the repair under a broadcast join should repartition
    # explicitly) rather than an accident of substring matching.
    plan = df._jdf.queryExecution().sparkPlan().toString()
    shuffle_markers = (
        "Exchange hashpartitioning",
        "Exchange rangepartitioning",
        "Exchange RoundRobinPartitioning",
        "Exchange SinglePartition",
    )
    if any(m in plan for m in shuffle_markers) or "BroadcastExchange" in plan:
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


#: (absolute table path, table mtime) -> inferred file schema. Parquet
#: schema INFERENCE is a 1-task footer-read job plus ~100 ms of driver
#: time per spark.read call (measured r11, warm), and pipelines that
#: rebuild their plan per action (the bench's x-queries, the oracle
#: harness) re-paid it on every build. Driver tables are immutable
#: fixtures, so the first load's schema is cached and later loads
#: declare it — METADATA caching only (exactly what a catalog/metastore
#: provides); every load still reads the parquet DATA itself fresh.
#: r12 (advisor fix): the key carries the path's mtime, so a fixture
#: REWRITTEN in-session with a different schema re-infers instead of
#: silently reading with the stale one (dropped/renamed columns coming
#: back as nulls). A local path that cannot be stat'ed falls back to a
#: sentinel (cache still keyed by path alone there — remote fixture
#: stores are append-only by this engine's contract).
_SCHEMA_CACHE: dict = {}


def _table_mtime(path: str):
    import os

    try:
        return os.stat(path).st_mtime_ns
    except OSError:
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one driver table, normalizing nano timestamps to TimestampType.

    Also applies the engine's session-safe optimizer settings when the
    caller's session lacks them (the external driver calls the contract
    with a plain SparkSession): InferFiltersFromGenerate re-evaluates
    expensive generator expressions per row (see pulsar_spark.session).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    excluded = spark.conf.get("spark.sql.optimizer.excludedRules", None) or ""
    rule = "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    if rule not in excluded:
        spark.conf.set("spark.sql.optimizer.excludedRules", ",".join(filter(None, [excluded, rule])))
    path = f"{sf_dir}/{name}.parquet"
    key = (path, _table_mtime(path))
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    for col in TIMESTAMP_NS_COLUMNS.get(name, []):
        if dict(df.dtypes).get(col) == "bigint":
            df = df.withColumn(col, F.timestamp_micros(F.expr(f"`{col}` div 1000")))
    return df
