"""Eager materialization of small intermediate results.

Several train-and-score operators (``classifier.logreg_fit_predict``,
``sampling.dsir_select``, ``clustering.semantic_dedup``) compute a
bounded per-row result from an expensive cached upstream frame and want
to release that cache immediately. They materialize the result first so
the returned DataFrame no longer references the cache.

Fault-tolerance note for real clusters: ``localCheckpoint`` truncates
lineage into *executor-local* storage — if an executor is lost, its
checkpointed partitions are unrecoverable and the job fails (Spark
cannot recompute truncated lineage). That is acceptable in local mode
and for short-lived results, but at 100 TB-cluster scale a reliable
checkpoint is the right call. :func:`materialize` therefore prefers
``df.checkpoint()`` (HDFS/object-store backed, survives executor loss)
whenever the session has ``spark.sparkContext.setCheckpointDir``
configured, and only falls back to ``localCheckpoint`` when it doesn't.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize(df: DataFrame) -> DataFrame:
    """Eagerly compute ``df`` and cut its lineage so upstream caches can
    be unpersisted. Uses a reliable checkpoint when a checkpoint dir is
    configured (executor-loss safe), else ``localCheckpoint`` (see
    module docstring for the trade-off)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
