"""Round-11 optimization-round focused tests: each optimization that
changed an operator's INTERNALS gets a behavioral pin here (outputs
were already re-verified against the DuckDB oracle; these cover the
edges the oracle fixtures don't isolate)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


@pytest.fixture(scope="module")
def spark():
    from pulsar_spark import get_spark

    return get_spark("test-r11-opt")


class TestChunkDedupFusedAggregate:
    def test_all_chunks_removed_doc_keeps_total(self, spark):
        # Both docs share their single 3-word chunk -> every chunk is
        # boilerplate. The fused aggregate must still report the TOTAL
        # chunk count (count(*) over the nd join preserves all rows)
        # while the rebuilt text collapses to ''.
        from pulsar_spark.functions.dedupe import remove_duplicated_chunks

        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "a b c")], ["doc_id", "text"]
        )
        out = {
            r["doc_id"]: r
            for r in remove_duplicated_chunks(docs, chunk_words=3).collect()
        }
        for i in (1, 2):
            assert out[i]["text"] == ""
            assert out[i]["n_chunks"] == 1
            assert out[i]["n_removed"] == 1

    def test_mixed_doc_counts_and_order(self, spark):
        # doc 1: chunk A (shared) + chunk B (unique) -> B survives, in
        # original position order; totals count both.
        from pulsar_spark.functions.dedupe import remove_duplicated_chunks

        docs = spark.createDataFrame(
            [(1, "x y z u v w"), (2, "x y z q r s")], ["doc_id", "text"]
        )
        out = {
            r["doc_id"]: r
            for r in remove_duplicated_chunks(docs, chunk_words=3).collect()
        }
        assert out[1]["text"] == "u v w" and out[1]["n_chunks"] == 2
        assert out[1]["n_removed"] == 1
        assert out[2]["text"] == "q r s" and out[2]["n_removed"] == 1

    def test_chunkless_doc_survives_with_zero_totals(self, spark):
        from pulsar_spark.functions.dedupe import remove_duplicated_chunks

        docs = spark.createDataFrame([(7, "")], ["doc_id", "text"])
        [r] = remove_duplicated_chunks(docs, chunk_words=3).collect()
        assert (r["text"], r["n_chunks"], r["n_removed"]) == ("", 0, 0)


class TestUnionFindLimitCollectBoundary:
    def _clusters(self, spark, pairs, max_edges):
        from pulsar_spark.functions.dedupe import near_dup_clusters

        df = spark.createDataFrame(pairs, ["id_a", "id_b"])
        return near_dup_clusters(df, driver_union_find_max_edges=max_edges)

    def test_at_threshold_uses_fast_path(self, spark):
        # 2 pairs -> 4 symmetric edges == max_edges: fast path, marked
        # driver-local.
        out = self._clusters(spark, [(1, 2), (3, 4)], max_edges=4)
        assert getattr(out, "_psk_local", False) is True
        rows = {r["id"]: r for r in out.collect()}
        assert rows[2]["cluster_id"] == 1 and rows[4]["cluster_id"] == 3

    def test_above_threshold_distributed_path_same_labels(self, spark):
        # 4 symmetric edges > max_edges=3: distributed loop; identical
        # canonical labels, and NOT marked local.
        out = self._clusters(spark, [(1, 2), (3, 4)], max_edges=3)
        assert getattr(out, "_psk_local", False) is False
        rows = {r["id"]: r for r in out.collect()}
        assert rows[2]["cluster_id"] == 1 and rows[4]["cluster_id"] == 3
        assert all(r["cluster_size"] == 2 for r in rows.values())


class TestIncrementalNearNoScratch:
    def test_probe_writes_no_scratch_and_cleans_legacy(self, spark, tmp_path):
        import os

        from pulsar_spark.functions.dedupe import (
            commit_near_fingerprints,
            incremental_near_dedup,
        )

        store = str(tmp_path / "store")
        docs = spark.createDataFrame(
            [(i, f"alpha beta gamma delta {i} epsilon zeta") for i in range(8)],
            ["doc_id", "text"],
        )
        commit_near_fingerprints(docs, store, epoch=1)
        # plant TWO legacy scratch dirs: one ABANDONED (mtime past the
        # grace window — must be collected) and one FRESH (a pre-r11
        # process may still hold a live lazy result over it during a
        # rolling upgrade — must survive; r12 advisor fix)
        old = os.path.join(store, "_scratch", "probe-deadbeef")
        fresh = os.path.join(store, "_scratch", "probe-cafebabe")
        os.makedirs(old)
        os.makedirs(fresh)
        stale_t = 1_000_000_000  # 2001 — far past any grace window
        os.utime(old, (stale_t, stale_t))
        probe = docs.select((F.col("doc_id") + 100).alias("doc_id"), "text")
        out = incremental_near_dedup(
            probe, store, threshold=0.9, update_store=False, epoch=2
        )
        out.count()
        assert not os.path.exists(old)
        assert os.path.exists(fresh)
        # a second probe after the grace window would collect the rest:
        # simulate by aging the fresh dir and probing again
        os.utime(fresh, (stale_t, stale_t))
        incremental_near_dedup(
            probe, store, threshold=0.9, update_store=False, epoch=2
        ).count()
        assert not os.path.exists(os.path.join(store, "_scratch"))

    def test_survivors_keep_all_input_columns(self, spark, tmp_path):
        # the loser-id anti-join must return the caller's FULL rows
        # (the pre-r11 scratch spill did; the re-attach join must too)
        from pulsar_spark.functions.dedupe import incremental_near_dedup

        store = str(tmp_path / "store2")
        docs = spark.createDataFrame(
            [(1, "one two three four five six", "web"),
             (2, "seven eight nine ten eleven twelve", "web")],
            ["doc_id", "text", "source"],
        )
        out = incremental_near_dedup(docs, store, threshold=0.9, epoch=0)
        assert sorted(out.columns) == ["doc_id", "source", "text"]
        assert out.count() == 2


class TestBandPruneSizeGate:
    """r11: the probe-prefix partition prune pays a driver collect job,
    so it is gated on the estimated partitioned-store size
    (SPARK_GRAFT_BAND_PRUNE_MIN_BYTES, default 256 MiB)."""

    def _store(self, spark, tmp_path):
        from pulsar_spark.functions.dedupe import commit_near_fingerprints

        store = str(tmp_path / "store")
        docs = spark.createDataFrame(
            [(i, " ".join(f"t{i}w{j}" for j in range(20))) for i in range(30)],
            ["doc_id", "text"],
        )
        commit_near_fingerprints(docs, store, epoch=0)
        return store, docs

    def _probe(self, docs):
        from pulsar_spark.functions.dedupe import minhash_signatures

        return minhash_signatures(docs.limit(3), bands=16).select(
            "doc_id",
            "signature",
            F.posexplode("band_hashes").alias("band_idx", "band_hash"),
        )

    def test_small_store_skips_prune(self, spark, tmp_path, monkeypatch):
        from pulsar_spark.functions.dedupe import _read_stored_bands
        from pulsar_spark.plans.audit import partition_filters

        monkeypatch.delenv("SPARK_GRAFT_BAND_PRUNE_MIN_BYTES", raising=False)
        store, docs = self._store(spark, tmp_path)
        out = _read_stored_bands(
            spark, [f"{store}/bands/batch_id=0"], probe=self._probe(docs)
        )
        # tiny store: no prefix filter in the plan (the collect job was
        # skipped), and the full band set is readable
        pf = partition_filters(out)
        assert not any("band_pfx" in f for f in (pf or []))
        assert out.count() == 30 * 16

    def test_big_store_threshold_prunes(self, spark, tmp_path, monkeypatch):
        from pulsar_spark.functions.dedupe import _read_stored_bands
        from pulsar_spark.plans.audit import partition_filters

        monkeypatch.setenv("SPARK_GRAFT_BAND_PRUNE_MIN_BYTES", "1")
        store, docs = self._store(spark, tmp_path)
        probe = self._probe(docs)
        out = _read_stored_bands(
            spark, [f"{store}/bands/batch_id=0"], probe=probe
        )
        pf = partition_filters(out)
        assert pf and any("band_pfx" in f for f in pf)
        # lossless for the join: every stored row whose band_hash the
        # probe carries survives the prune
        full = _read_stored_bands(spark, [f"{store}/bands/batch_id=0"])
        hashes = {r.band_hash for r in probe.collect()}
        want = {
            (r._fp, r.band_idx, r.band_hash)
            for r in full.collect()
            if r.band_hash in hashes
        }
        got = {(r._fp, r.band_idx, r.band_hash) for r in out.collect()}
        assert want <= got


class TestSymmetrizeExplode:
    """r11: near_dup_clusters symmetrizes by explode (pairs evaluated
    once) and drops the redundant distinct — both consumers are
    multiplicity-insensitive, so duplicate / both-direction pair lists
    must still produce identical canonical clusters on BOTH paths."""

    def _run(self, spark, rows, max_edges):
        from pulsar_spark.functions.dedupe import near_dup_clusters

        pairs = spark.createDataFrame(rows, ["id_a", "id_b"])
        out = near_dup_clusters(pairs, driver_union_find_max_edges=max_edges)
        return {r["id"]: (r["cluster_id"], r["cluster_size"]) for r in out.collect()}

    def test_duplicate_and_reversed_pairs_fast_path(self, spark):
        rows = [(1, 2), (1, 2), (2, 1), (3, 4)]  # dup + reversed noise
        got = self._run(spark, rows, max_edges=500)
        assert got == {1: (1, 2), 2: (1, 2), 3: (3, 2), 4: (3, 2)}

    def test_duplicate_and_reversed_pairs_distributed_path(self, spark):
        rows = [(1, 2), (1, 2), (2, 1), (3, 4)]
        got = self._run(spark, rows, max_edges=0)  # pin the loop path
        assert got == {1: (1, 2), 2: (1, 2), 3: (3, 2), 4: (3, 2)}


class TestDriverSideListing:
    def test_partition_discovery_threshold_covers_band_store(self, spark):
        # r11: Spark's default parallelPartitionDiscovery.threshold (32)
        # made every probe of the 256-dir band_pfx store pay a 256-task
        # DISTRIBUTED listing job (measured: 795 -> 539 tasks per x10
        # probe once lifted). The session default must keep every engine
        # layout — topics (<=32 partition dirs) and the band store
        # (BAND_PFX_MOD=256 dirs) — on the driver-thread listing path.
        from pulsar_spark.functions.dedupe import BAND_PFX_MOD

        thr = int(
            spark.conf.get("spark.sql.sources.parallelPartitionDiscovery.threshold")
        )
        assert thr >= BAND_PFX_MOD

class TestLoadTableSchemaCache:
    def test_second_load_pays_no_job_and_same_schema(self, spark, tmp_path):
        # r11: load_table caches the inferred file schema (metadata
        # only — data is re-read every load). The second load of the
        # same table must schedule ZERO jobs and produce an identical
        # schema and row set.
        import pulsar_spark.sources.loader as loader
        from pulsar_spark.sources import load_table

        sf = str(tmp_path)
        spark.range(5).selectExpr("id AS doc_id", "'t' AS text").write.parquet(
            f"{sf}/documents.parquet"
        )
        d1 = load_table(spark, sf, "documents")
        s1, n1 = d1.schema, d1.count()
        # r12: the cache key carries the table mtime (stale-schema guard)
        assert any(
            k[0] == f"{sf}/documents.parquet" for k in loader._SCHEMA_CACHE
        )
        sc = spark.sparkContext
        sc.setJobGroup("schema-cache-probe", "schema-cache-probe")
        d2 = load_table(spark, sf, "documents")
        ids = sc.statusTracker().getJobIdsForGroup("schema-cache-probe")
        assert len(ids) == 0
        assert d2.schema == s1
        assert d2.count() == n1


class TestDropSetNoDistinct:
    def test_history_drop_set_correct_without_distinct(self, spark, tmp_path):
        # r11: `dropped` lost its .distinct() (left_anti ignores dup
        # keys). A probe doc colliding with TWO stored near-dups — the
        # duplicate-drop-row case — must still drop exactly once, and
        # non-matching docs must survive.
        from pulsar_spark.functions.dedupe import (
            commit_near_fingerprints,
            incremental_near_dedup,
        )

        base = " ".join(f"w{j}" for j in range(40))
        store = str(tmp_path / "store")
        stored = spark.createDataFrame(
            [(1, base + " tailone"), (2, base + " tailtwo")],
            ["doc_id", "text"],
        )
        commit_near_fingerprints(stored, store, epoch=0)
        probe = spark.createDataFrame(
            [(10, base + " tailthree"), (11, "unrelated " * 20)],
            ["doc_id", "text"],
        )
        out = incremental_near_dedup(
            probe, store, threshold=0.7, update_store=False, epoch=1
        )
        assert [r.doc_id for r in out.collect()] == [11]
