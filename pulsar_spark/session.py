"""SparkSession factory tuned for the engine.

Local testing runs on local[$SPARK_GRAFT_CPUS]; the configuration is
chosen to also be sane on a large cluster (AQE on, skew-join handling,
zstd parquet, Arrow for the Python boundary). Nothing here is
local-mode-specific except the master default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pulsar-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    Scale notes (100 TB target):
      - AQE handles runtime coalescing + skew-join splitting, so static
        ``shuffle.partitions`` only needs to be an upper bound (set it to
        ~2-3x total cores on a real cluster).
      - ``files.maxPartitionBytes`` 128 MiB keeps scan tasks memory-bounded
        regardless of input size.
      - Broadcast threshold 64 MiB: every dim table in the star schema
        (region/nation/customer/supplier/part) broadcasts; fact-fact joins
        shuffle on their keys and AQE re-plans skew.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    n_shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(n_shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Without this, a .persist() anywhere in a plan pins the cached
        # subtree's output partitioning and AQE stops re-planning it —
        # the LSH candidate cache (dedupe.py) would otherwise run its
        # band-bucket shuffle with no runtime coalescing. Output
        # partitioning of cached frames is not load-bearing anywhere in
        # this engine (caches are consumed by joins/aggs that re-shuffle
        # as needed).
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Topic parquet must round-trip publish_time/event_time as
        # TIMESTAMP (with zone), never TIMESTAMP_NTZ: withWatermark
        # rejects NTZ (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE), which would
        # poison every streaming watermark path on re-read.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # InferFiltersFromGenerate inlines the full generator expression
        # into a pre-explode filter; with higher-order-function pipelines
        # (shingling, tokenization) that re-evaluates an O(n^2) expression
        # per row (measured 10x slowdown). The inferred filter is redundant
        # for explode (outer=false already drops empty arrays).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # v2 commit skips the job-level rename pass (task outputs commit
        # directly): measured ~20% off small partitioned appends locally,
        # and the right default for HDFS-like stores. (Object-store
        # deployments swap in their own committer anyway.)
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        # Nothing in the engine reads _SUCCESS markers (topic presence =
        # partition=/segment= dirs, store presence = part- files), so
        # skip the driver-side marker create each job commit pays:
        # interleaved A/B at sf0.1 measured min 0.609 vs 0.721 s on the
        # 32-partition append (4/6 rounds faster at equal sentinel).
        .config("spark.hadoop.mapreduce.fileoutputcommitter.marksuccessfuljobs", "false")
        # Hadoop's ChecksumFileSystem shadows every file:// write with a
        # .crc sidecar — double the file count and fsync traffic on the
        # partitioned topic layout (one parquet file per partition per
        # append). Raw local FS drops that: measured ~15-20% off the
        # produce path. Only file:// URIs are affected; HDFS/S3 paths
        # on a cluster carry their own integrity layers.
        .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
        # Spark falls back to a DISTRIBUTED listing job once a read
        # resolves more than this many partition directories (default
        # 32). The near-dup band store is hive-partitioned 256 ways
        # (dedupe.BAND_PFX_MOD), so every history probe was paying a
        # 256-task listing JOB — pure scheduling fixed cost, measured
        # as the single largest job of the x10 probe flow — to list
        # directories a driver thread walks in milliseconds on a
        # local/HDFS-fast filesystem. 1024 keeps every engine layout
        # (topics <=32 partition dirs, band store 256 dirs, epoch
        # stores) on the driver thread; deployments on slow object
        # stores with many-thousand-directory stores can lower it via
        # the env knob to get the distributed listing back.
        .config(
            "spark.sql.sources.parallelPartitionDiscovery.threshold",
            os.environ.get("SPARK_GRAFT_PAR_DISCOVERY_THRESHOLD", "1024"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
