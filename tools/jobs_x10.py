"""Job/task accounting for one incremental_near_dedup call (x10) —
steal-immune evidence: statusTracker job/stage/task counts per phase,
with setJobGroup isolation. Usage:
  SPARK_GRAFT_CPUS=32 python tools/jobs_x10.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from pulsar_spark import get_spark
    from pulsar_spark.functions.dedupe import (
        commit_near_fingerprints,
        incremental_near_dedup,
        minhash_near_duplicates,
    )
    from pulsar_spark.sources import load_table

    spark = get_spark("jobs-x10")
    sc = spark.sparkContext
    sc.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents")
    docs.count()
    minhash_near_duplicates(docs.limit(256).repartition(32), threshold=0.5).count()

    store = tempfile.mkdtemp(prefix="jobs_x10_") + "/store"
    commit_near_fingerprints(
        docs.crossJoin(spark.range(2).withColumnRenamed("id", "rep"))
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
        .drop("rep").select("doc_id", "text"), store, epoch=1)
    probe = docs.select((F.col("doc_id") + 999_000_000).alias("doc_id"), "text")

    st = sc.statusTracker()

    for it in range(3):
        group = f"x10_call_{it}"
        sc.setJobGroup(group, "x10 full call")
        t0 = time.perf_counter()
        n = incremental_near_dedup(
            probe, store, threshold=0.7, update_store=False, epoch=2
        ).count()
        dt = time.perf_counter() - t0
        sc.setJobGroup(None, None)
        jids = sorted(st.getJobIdsForGroup(group))
        ntasks = 0
        nstages = 0
        for j in jids:
            ji = st.getJobInfo(j)
            for s in ji.stageIds:
                si = st.getStageInfo(s)
                if si is not None:
                    nstages += 1
                    ntasks += si.numTasks
        print(f"iter {it}: rows={n} wall={dt:.3f}s jobs={len(jids)} "
              f"stages={nstages} tasks={ntasks}", flush=True)
        if it == 2:
            for j in jids:
                ji = st.getJobInfo(j)
                stasks = [(s, getattr(st.getStageInfo(s), 'numTasks', '?'))
                          for s in ji.stageIds]
                print(f"  job {j}: stages {stasks}")

    import shutil
    shutil.rmtree(os.path.dirname(store), ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
