"""Dataset-card reporting: the per-source corpus summary a curation
pipeline publishes next to a training-data release (doc/token counts,
length quantiles, language mix, duplicate rate).

The reference has no analog (it is a log engine); this is part of the
extended LLM-pipeline surface (SURVEY.md §7 step 11), the natural next
query after the capstone curation recipes: "what did I just build?".

Determinism contract (oracle-checkable like the rest of the family):

- every count/sum is integer; the only doubles are final ratios,
  rounded to 6dp after a single bigint/bigint true division (identical
  in Spark and DuckDB);
- length quantiles are **nearest-rank on the exact integer length**
  (value at 0-based index ``(n-1)*q`` of the sorted lengths), computed
  from a per-group length histogram + cumulative count — no
  interpolation, no floating-point percentile algorithm to match
  across engines;
- the top language tie-breaks deterministically (max count, then
  lexicographically smallest language).

Scale shape (the 100 TB reading): the corpus is touched by THREE
narrow projections feeding map-side-combinable aggregations —
``groupBy(source)`` scalars, a ``groupBy(source, length)`` histogram
(bounded by distinct lengths, NOT corpus size), and
``groupBy(source, lang)`` / ``groupBy(source, md5)`` count tables.
Every post-aggregate join is on the bounded per-source key and
broadcast. There is no corpus-wide sort and no multi-distinct expand
(each COUNT(DISTINCT) is restated as a count over its own pre-grouped
table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pulsar_spark.functions.text import token_count

#: nearest-rank quantiles reported on doc length, in percent
QUANTILES = (25, 50, 75, 90)


def corpus_report(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """One dataset-card row per ``group_col``:

    ``(source, n_docs, n_tokens, total_chars, mean_doc_tokens,
    p25_chars, p50_chars, p75_chars, p90_chars, n_langs, top_lang,
    top_lang_frac, dup_rate)``

    - ``pNN_chars``: nearest-rank quantile of ``length(text)`` — the
      value at 0-based index ``((n_docs - 1) * NN) div 100`` of the
      group's sorted lengths (exact integers, engine-stable).
    - ``top_lang`` / ``top_lang_frac``: the most common ``lang_col``
      value and its share (ties -> lexicographically smallest lang).
    - ``dup_rate``: fraction of docs whose exact text (md5) appears
      more than once in the group, counting all but one copy of each
      duplicate set: ``(n_docs - distinct_texts) / n_docs``.
    """
    g = F.col(group_col)
    base = docs.select(
        g.alias(group_col),
        F.length(text_col).cast("bigint").alias("_len"),
        token_count(F.col(text_col)).cast("bigint").alias("_ntok"),
        F.md5(F.col(text_col)).alias("_h"),
        F.col(lang_col).alias("_lang"),
    )

    scalars = base.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.sum("_ntok").alias("n_tokens"),
        F.sum("_len").alias("total_chars"),
    )

    # length histogram -> cumulative counts -> nearest-rank quantiles.
    # The window runs over the HISTOGRAM (bounded by distinct lengths
    # per group), never the corpus.
    hist = base.groupBy(group_col, "_len").agg(F.count("*").alias("_c"))
    # NULLS LAST explicitly: Spark default-sorts NULLs FIRST ascending,
    # DuckDB LAST — a NULL-text doc would otherwise shift every
    # cumulative count by one and break quantile parity
    wcum = (
        Window.partitionBy(group_col)
        .orderBy(F.col("_len").asc_nulls_last())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("_cum", F.sum("_c").over(wcum)).join(
        F.broadcast(scalars.select(group_col, "n_docs")), group_col
    )
    quantiles = cum.groupBy(group_col).agg(
        *[
            F.min(
                F.when(
                    F.col("_cum")
                    >= F.expr(f"((n_docs - 1) * {q}) div 100") + F.lit(1),
                    F.col("_len"),
                )
            ).alias(f"p{q}_chars")
            for q in QUANTILES
        ]
    )

    # language mix from its own pre-grouped count table (no
    # multi-distinct expand in the scalar agg)
    lang_counts = base.groupBy(group_col, "_lang").agg(F.count("*").alias("_lc"))
    # same NULLS LAST rationale for the language tie-break
    wtop = Window.partitionBy(group_col).orderBy(
        F.desc("_lc"), F.col("_lang").asc_nulls_last()
    )
    top_lang = (
        lang_counts.withColumn("_rn", F.row_number().over(wtop))
        .where(F.col("_rn") == 1)
        .select(group_col, F.col("_lang").alias("top_lang"), F.col("_lc").alias("_topc"))
    )
    n_langs = lang_counts.groupBy(group_col).agg(F.count("*").alias("n_langs"))

    # exact-dup rate from the md5 count table
    distinct_texts = (
        base.groupBy(group_col, "_h")
        .agg(F.count("*").alias("_hc"))
        .groupBy(group_col)
        .agg(F.count("*").alias("_n_distinct"))
    )

    return (
        scalars.join(F.broadcast(quantiles), group_col)
        .join(F.broadcast(n_langs), group_col)
        .join(F.broadcast(top_lang), group_col)
        .join(F.broadcast(distinct_texts), group_col)
        .select(
            group_col,
            "n_docs",
            "n_tokens",
            "total_chars",
            F.round(F.col("n_tokens") / F.col("n_docs"), 6).alias("mean_doc_tokens"),
            *[f"p{q}_chars" for q in QUANTILES],
            "n_langs",
            "top_lang",
            F.round(F.col("_topc") / F.col("n_docs"), 6).alias("top_lang_frac"),
            F.round((F.col("n_docs") - F.col("_n_distinct")) / F.col("n_docs"), 6).alias(
                "dup_rate"
            ),
        )
    )


def corpus_report_sketch(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    accuracy: int = 1000,
) -> DataFrame:
    """Mergeable-sketch twin of :func:`corpus_report`'s quantile block
    — the shape a 100 TB dataset card actually computes. Spark's
    built-in ``percentile_approx`` is a Greenwald-Khanna rank sketch
    (QuantileSummaries): mergeable across partitions, one map-side-
    combinable aggregation, O(accuracy) state per group, deterministic
    ``±n/accuracy`` rank-error bound. It replaces the exact
    length-histogram path, whose state is bounded only because integer
    char lengths have few distinct values — for a continuous column
    (quality score, perplexity) the histogram is corpus-sized and the
    sketch is the only shape that survives scale.

    Returns ``(source, n_docs, p25_chars, p50_chars, p75_chars,
    p90_chars)`` where each pNN is an ACTUAL stored length whose rank
    is within ``n/accuracy`` of the target — the GK guarantee the
    error-bound test pins. Rows-only by design: sketch internals are
    engine-specific, so there is no cross-engine value hash; the
    guarantee, not the bytes, is the contract."""
    base = docs.select(
        F.col(group_col).alias(group_col),
        F.length(text_col).cast("bigint").alias("_len"),
    )
    probs = [0.25, 0.50, 0.75, 0.90]
    q = base.groupBy(group_col).agg(
        F.count("*").alias("n_docs"),
        F.percentile_approx("_len", probs, accuracy).alias("_q"),
    )
    return q.select(
        group_col,
        "n_docs",
        *[
            F.element_at("_q", i + 1).alias(f"p{int(p * 100)}_chars")
            for i, p in enumerate(probs)
        ],
    )
