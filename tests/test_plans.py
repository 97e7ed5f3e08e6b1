"""Plan-audit helpers: the checks that keep Catalyst honest at scale."""

from pyspark.sql import functions as F

from pulsar_spark.plans import (
    broadcast_join_count,
    codegen_span_count,
    exchange_count,
    plan_summary,
    pushed_filters,
)


class TestPlanAudit:
    def test_exchange_and_codegen_counts(self, spark):
        df = spark.range(1000).groupBy((F.col("id") % 10).alias("k")).count()
        df.collect()  # materialize THIS plan so AQE finalizes it
        assert exchange_count(df) == 1
        assert codegen_span_count(df) >= 1

        narrow = spark.range(1000).select((F.col("id") * 2).alias("x"))
        narrow.collect()
        assert exchange_count(narrow) == 0

    def test_broadcast_join_not_counted_as_exchange(self, spark):
        small = spark.range(10).withColumnRenamed("id", "k")
        big = spark.range(10000).withColumn("k", F.col("id") % 10)
        joined = big.join(F.broadcast(small), on="k")
        joined.collect()
        assert broadcast_join_count(joined) == 1
        assert exchange_count(joined) == 0  # broadcast is the cheap kind

    def test_pushed_filters_reach_parquet(self, spark, tmp_path):
        p = str(tmp_path / "t")
        spark.range(1000).withColumn("v", F.col("id") * 2).write.parquet(p)
        df = spark.read.parquet(p).where(F.col("id") > 500)
        assert any("id" in f for f in pushed_filters(df))

    def test_plan_summary_flags_python_stage(self, spark):
        from pulsar_spark.functions.dedupe import minhash_signatures

        docs = spark.createDataFrame(
            [(1, "a b c d e"), (2, "b c d e f")], ["doc_id", "text"]
        )
        sigs = minhash_signatures(docs, num_perm=8)
        sigs.collect()
        s = plan_summary(sigs)
        assert s["python_stages"] >= 1  # the vectorized signature UDF
        assert s["exchanges"] == 0  # signatures are embarrassingly parallel


class TestCorpusOpPlanBudgets:
    """Exchange budgets for the corpus-hygiene operators — regressions
    here mean an accidental extra shuffle at 100 TB."""

    def test_hash_sample_is_narrow(self, spark, documents):
        from pulsar_spark.functions import hash_sample

        df = hash_sample(documents, 0.25, seed=7)
        df.collect()
        assert exchange_count(df) == 0

    def test_redact_pii_is_narrow(self, spark, documents):
        from pulsar_spark.functions import redact_pii

        df = documents.select(redact_pii(F.col("text")).alias("t"))
        df.collect()
        assert exchange_count(df) == 0

    def test_contamination_single_corpus_shuffle(self, spark, documents):
        from pulsar_spark.functions import contamination_check

        bench = documents.where("doc_id % 97 = 0")
        corpus = documents.where("doc_id % 97 != 0")
        df = contamination_check(corpus, bench, n=5)
        df.collect()
        # 1 tiny bench-distinct + 1 doc-keyed agg; bench side broadcasts
        assert exchange_count(df) <= 2
        assert broadcast_join_count(df) == 1

    def test_packing_shuffles_once_per_window(self, spark, documents):
        from pulsar_spark.functions import packing_stats

        df = packing_stats(documents, seq_len=512)
        df.collect()
        # window by shard + final group; AQE may fuse to the same exchange
        assert exchange_count(df) <= 2


class TestRound3PlanBudgets:
    """Exchange budgets for the round-3 additions."""

    def test_deterministic_shuffle_one_exchange(self, spark, documents):
        from pulsar_spark.functions import deterministic_shuffle

        df = deterministic_shuffle(documents, seed=7, num_shards=16)
        df.collect()
        assert exchange_count(df) == 1  # the per-shard window, nothing else

    def test_consistent_hash_assignment_is_narrow(self, spark):
        from pulsar_spark.operators import consistent_hash_assignment

        base = spark.range(2000).select(F.col("id").cast("string").alias("key"))
        df = consistent_hash_assignment(
            base, ["ca", "cb", "cc"], 16, deterministic_mod=True
        )
        df.collect()
        assert exchange_count(df) == 0  # ring lookup rides the scan

    def test_backlog_quota_budget(self, spark, messages):
        from pulsar_spark.operators import backlog_quota_evict

        cursors = spark.range(8).select(
            F.col("id").cast("int").alias("partition"),
            F.lit(20).cast("bigint").alias("cursor_offset"),
        )
        df = backlog_quota_evict(messages, cursors, limit_rows=50)
        df.collect()
        # window shuffle + agg + the tiny distinct for the full
        # partition-set join (the one-row-per-partition contract)
        assert exchange_count(df) <= 3
        # two broadcasts of the same 8-row cursor frame: the backlog
        # join and the quota-already-holds rejoin — both driver-bounded
        assert broadcast_join_count(df) == 2

    def test_sketch_stats_single_shuffle(self, spark, documents):
        from pulsar_spark.functions import sketch_token_stats

        df = sketch_token_stats(documents, group_col="source")
        df.collect()
        assert exchange_count(df) == 1  # map-side partials -> one group agg

    def test_pack_materialize_budget(self, spark, documents):
        from pulsar_spark.functions import materialize_packed_shards

        df = materialize_packed_shards(documents, seq_len=512)
        df.collect()
        # window cumsum + (shard,bin) agg; agg may reuse the window's
        # hash partitioning but gets its own exchange when keys widen
        assert exchange_count(df) <= 2


class TestRound5PlanBudgets:
    """Exchange budgets for the round-5 corpus operators — regressions
    here mean an accidental extra shuffle at 100 TB."""

    def test_gopher_rules_is_narrow(self, spark, documents):
        from pulsar_spark.functions.text import gopher_rules

        df = gopher_rules(documents)
        df.collect()
        assert exchange_count(df) == 0

    def test_bpe_encode_is_narrow(self, spark, documents):
        from pulsar_spark.functions.text import bpe_encode_counts

        df = bpe_encode_counts(documents, [("a", "b"), ("c", "d")])
        df.collect()
        assert exchange_count(df) == 0

    def test_pq_encode_is_narrow(self, spark):
        from pulsar_spark.functions.clustering import product_quantize
        from pulsar_spark.sources import load_table

        from tests.conftest import SF_DIR

        emb = load_table(spark, SF_DIR, "embeddings")
        df = product_quantize(emb, m=4, codes=8, iters=1)
        df.collect()
        # the encode projection itself: 0 shuffles, no Python
        assert exchange_count(df) == 0
        assert plan_summary(df)["python_stages"] == 0

    def test_temperature_mix_row_pass_is_broadcast_join(self, spark, documents):
        from pulsar_spark.functions import temperature_mix

        df = temperature_mix(documents, temperature=2.0, total_rows=200, seed=3)
        df.collect()
        # the per-group rate model is computed driver-side (bounded,
        # like kmeans centroids); the returned row pass is a broadcast
        # literal-rate join with ZERO corpus shuffles
        assert broadcast_join_count(df) >= 1
        assert exchange_count(df) == 0
