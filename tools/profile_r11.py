"""Round-11 optimization profiler: per-stage timings + formatted plans
for the expensive bench lines (guide §1: measure first, noop sink,
labelled jobs).

Usage: SPARK_GRAFT_CPUS=32 python tools/profile_r11.py [sf_dir] [which ...]

``which`` selects sections (default: all): plans x10 x2 x6 x7 x5 x9 b6
Writes plans to plans/r11/<query>_before.txt (or _after.txt with
SPARK_GRAFT_PLAN_SUFFIX=after).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timeit(spark, name, fn, n=2):
    """Run fn() n times; print every wall time (first is warm-up)."""
    ts = []
    for i in range(n):
        spark.sparkContext.setJobDescription(f"{name} [{i}]")
        t0 = time.perf_counter()
        fn()
        ts.append(round(time.perf_counter() - t0, 3))
    spark.sparkContext.setJobDescription(None)
    print(f"  {name:<42s} {ts}", flush=True)
    return ts


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    which = set(sys.argv[2:]) or {"plans", "x10", "x2", "x6", "x7", "x5", "b6"}
    suffix = os.environ.get("SPARK_GRAFT_PLAN_SUFFIX", "before")

    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from pulsar_spark import events_to_messages, get_spark
    from pulsar_spark.sources import load_table, write_topic

    spark = get_spark("profile-r11")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents")
    events = load_table(spark, sf_dir, "events")
    n_docs = docs.count()
    print(f"sf_dir={sf_dir} docs={n_docs}", flush=True)

    tmp = tempfile.mkdtemp(prefix="profile_r11_")
    write_topic(events_to_messages(events), f"{tmp}/topic", repartition=False, codec="snappy")
    messages = spark.read.parquet(f"{tmp}/topic").cache()
    messages.count()

    # Arrow worker warmup (mirrors bench.py)
    from pulsar_spark.functions import minhash_near_duplicates
    minhash_near_duplicates(docs.limit(256).repartition(32), threshold=0.5).count()

    plans_dir = os.path.join(REPO, "plans", "r11")
    os.makedirs(plans_dir, exist_ok=True)

    def save_plan(name, df):
        p = os.path.join(plans_dir, f"{name}_{suffix}.txt")
        with open(p, "w") as fh:
            fh.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
        print(f"  wrote {p}", flush=True)

    # ---------------- plans for the bench query set ----------------
    if "plans" in which:
        from pulsar_spark.operators import (
            compact_publish_order, dedup_messages, sliding_window,
            ttl_filter, user_visible, visible_messages,
        )
        q_b2 = user_visible(visible_messages(
            ttl_filter(messages, "2024-01-10 00:00:00"), "2024-01-25 00:00:00"))
        save_plan("b2_scan_filter", q_b2)
        save_plan("b3_compaction", compact_publish_order(messages))
        save_plan("b4_wordcount", docs.select(
            F.explode(F.split("text", " ")).alias("w"))
            .where(F.col("w") != "").groupBy("w").count())
        save_plan("b5_window", sliding_window(
            messages, "1 hour", "15 minutes", [F.count("*").alias("cnt")]))
        save_plan("b6_dedup", dedup_messages(messages, order_col="event_id"))
        qs = entry.queries()
        save_plan("x4_training_select", qs["training_set_select"](spark, sf_dir))
        save_plan("x4b_training_select_scalable",
                  qs["training_set_select_scalable"](spark, sf_dir))
        save_plan("x6_pretraining_to_shards",
                  qs["pretraining_pipeline_v3"](spark, sf_dir))
        save_plan("x7_curation_v4", qs["pretraining_pipeline_v4"](spark, sf_dir))
        save_plan("x2_minhash_dedup", minhash_near_duplicates(
            docs, threshold=0.5, max_bucket_size=512))
        from pulsar_spark.functions import dup_span_fraction, hash_sample, redact_pii
        d5 = hash_sample(docs, 0.5, key_col="doc_id", seed=1).select(
            "doc_id", redact_pii(F.col("text")).alias("text"))
        save_plan("x5_corpus_hygiene", dup_span_fraction(d5, n=5))

    # ---------------- x10 stage breakdown ----------------
    if "x10" in which:
        print("x10_incremental_near stages:", flush=True)
        from pulsar_spark.functions.dedupe import (
            commit_near_fingerprints, incremental_near_dedup,
            minhash_signatures,
        )
        store = tempfile.mkdtemp(prefix="prof_near_") + "/store"
        commit_near_fingerprints(
            docs.crossJoin(spark.range(2).withColumnRenamed("id", "rep"))
            .withColumn("doc_id", F.col("doc_id") + F.col("rep") * 10_000_000)
            .drop("rep").select("doc_id", "text"), store, epoch=1)
        probe = docs.select((F.col("doc_id") + 999_000_000).alias("doc_id"), "text")

        sigs = minhash_signatures(probe, "text", "doc_id", 64, 3, bands=16)
        timeit(spark, "x10.sig_pipeline(noop, all cols)", lambda: noop(
            sigs.select("doc_id", "signature", "band_hashes")), 3)
        # shingle-only cost
        from pulsar_spark.functions.dedupe import with_shingles
        timeit(spark, "x10.shingles_only(noop)", lambda: noop(
            with_shingles(probe, "text", 3).select("doc_id", "shingles")), 2)
        # hash arrays only (JVM side)
        base = (with_shingles(probe, "text", 3).select("doc_id", "shingles")
                .withColumn("_h1", F.transform("shingles", lambda s: F.hash(s).cast("bigint")))
                .withColumn("_h2", F.transform("shingles", lambda s: F.hash(s, F.lit(1)).cast("bigint")))
                .drop("shingles"))
        timeit(spark, "x10.hash_arrays_only(noop)", lambda: noop(base), 2)

        def full():
            return incremental_near_dedup(
                probe, store, threshold=0.7, update_store=False, epoch=2).count()
        timeit(spark, "x10.full", full, 3)
        import shutil
        shutil.rmtree(os.path.dirname(store), ignore_errors=True)

    # ---------------- x2 stage breakdown ----------------
    if "x2" in which:
        print("x2_minhash_dedup stages:", flush=True)
        from pulsar_spark.functions.dedupe import (
            minhash_lsh_candidates, minhash_signatures,
        )
        sigs = minhash_signatures(docs, "text", "doc_id", 64, 3, bands=16)
        timeit(spark, "x2.signatures(noop)", lambda: noop(sigs), 3)
        cands = minhash_lsh_candidates(sigs, "doc_id", 16, 4, 512)
        timeit(spark, "x2.candidates(noop)", lambda: noop(cands), 2)

        def full():
            spark.catalog.clearCache()
            return minhash_near_duplicates(docs, threshold=0.5, max_bucket_size=512).count()
        timeit(spark, "x2.full(clear cache)", full, 3)

    # ---------------- x6 stage breakdown ----------------
    if "x6" in which:
        print("x6_pretraining_to_shards stages:", flush=True)
        from pulsar_spark.functions import (
            deterministic_shuffle, exact_dedup, materialize_packed_shards,
            per_group_cap, quality_metrics, remove_duplicated_chunks,
            select_by_token_budget,
        )
        dd = docs.select("doc_id", "text", "source")
        corpus = exact_dedup(dd.where(F.col("doc_id") % 97 != 0))
        timeit(spark, "x6.1 exact_dedup(noop)", lambda: noop(corpus), 2)
        cleaned = remove_duplicated_chunks(
            corpus.select("doc_id", "text"), chunk_words=10, min_docs=2)
        timeit(spark, "x6.2 +chunk_dedup(noop)", lambda: noop(cleaned), 2)
        with_src = cleaned.join(corpus.select("doc_id", "source"), "doc_id").withColumn(
            "n_chars", F.length("text"))
        capped = per_group_cap(with_src, "source", cap=50, order_col="n_chars")
        timeit(spark, "x6.3 +source_cap(noop)", lambda: noop(capped), 2)
        q = quality_metrics(capped.select("doc_id", "text")).where(F.col("n_tokens") >= 5)
        scored = q.withColumn("score", F.round(
            F.col("distinct_ratio") * (1 - F.col("stopword_ratio")), 6))
        timeit(spark, "x6.4 +quality+score(noop)", lambda: noop(scored), 2)
        selected = select_by_token_budget(scored, budget=15000)
        timeit(spark, "x6.5 +budget_select(noop)", lambda: noop(selected), 2)
        chosen = selected.select("doc_id").join(capped.select("doc_id", "text"), "doc_id")
        shuffled = deterministic_shuffle(chosen, key_col="doc_id", seed=13, num_shards=8)
        packed = materialize_packed_shards(shuffled, seq_len=512,
                                           shard_col="shard", id_col="position")
        timeit(spark, "x6.6 full(noop)", lambda: noop(packed), 2)
        timeit(spark, "x6.7 full(count)", lambda: packed.count(), 2)

    # ---------------- x7 stage breakdown ----------------
    if "x7" in which:
        print("x7_curation_v4 stages:", flush=True)
        from pulsar_spark.functions.classifier import logreg_fit_predict
        from pulsar_spark.functions.packing import materialize_packed_shards
        from pulsar_spark.functions.sampling import deterministic_shuffle, temperature_mix
        from pulsar_spark.functions.text import gopher_rules

        d4 = docs.select("doc_id", "text", "source", "n_chars")
        gate = gopher_rules(d4).where("gopher_pass").select("doc_id")
        timeit(spark, "x7.1 gopher_gate(noop)", lambda: noop(gate), 2)
        gated = d4.join(gate, "doc_id")
        label = F.col("n_chars") >= 400
        scored = logreg_fit_predict(gated, label, iters=2, lr=4.0)
        timeit(spark, "x7.2 +logreg(noop)", lambda: noop(scored), 2)
        kept = gated.join(scored.where("pred").select("doc_id"), "doc_id")
        mixed = temperature_mix(kept, temperature=2.0, total_rows=150, seed=17)
        timeit(spark, "x7.3 +temp_mix(noop)", lambda: noop(mixed), 2)
        shuffled = deterministic_shuffle(mixed.select("doc_id", "text"),
                                         key_col="doc_id", seed=19, num_shards=4)
        packed = materialize_packed_shards(shuffled, seq_len=256,
                                           shard_col="shard", id_col="position")
        timeit(spark, "x7.4 full(noop)", lambda: noop(packed), 2)

    # ---------------- x5 stage breakdown ----------------
    if "x5" in which:
        print("x5_corpus_hygiene stages:", flush=True)
        from pulsar_spark.functions import dup_span_fraction, hash_sample, redact_pii
        d = hash_sample(docs, 0.5, key_col="doc_id", seed=1).select(
            "doc_id", redact_pii(F.col("text")).alias("text"))
        timeit(spark, "x5.1 sample+pii(noop)", lambda: noop(d), 2)
        timeit(spark, "x5.2 full(noop)", lambda: noop(dup_span_fraction(d, n=5)), 3)

    # ---------------- b6 vs b2 ----------------
    if "b6" in which:
        print("b6 vs b2:", flush=True)
        from pulsar_spark.operators import (
            dedup_messages, ttl_filter, user_visible, visible_messages,
        )
        q_b2 = user_visible(visible_messages(
            ttl_filter(messages, "2024-01-10 00:00:00"), "2024-01-25 00:00:00"))
        q_b6 = dedup_messages(messages, order_col="event_id")
        timeit(spark, "b2.count", lambda: q_b2.count(), 4)
        timeit(spark, "b6.count", lambda: q_b6.count(), 4)

    import shutil
    shutil.rmtree(tmp, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
