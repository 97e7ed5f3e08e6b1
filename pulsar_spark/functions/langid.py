"""Trained character-n-gram language identification — deterministic
multinomial Naive Bayes over character bigrams.

The marker-word heuristic (functions/text.py ``language_id``) only
knows the five profile languages' stopwords; a multilingual 100 TB
crawl needs a TRAINED identifier (fasttext-style lid.176 in production
curation stacks). This is its deterministic twin: multinomial NB with
Laplace smoothing over character n-grams, trained on any labeled
corpus column — the same weak-supervision shape as
functions/classifier.py, and the same determinism contract so a
closed-form DuckDB oracle can replay training AND scoring bit-for-bit:

- every log-probability is rounded to integer MICRO-UNITS
  (``round(ln(p) * 1e6)`` as bigint) at model-build time, so scoring
  sums are exact integer arithmetic — order-independent across Spark's
  partial aggregates vs the oracle's single-threaded sum;
- Laplace counts are integers; both engines see identical ratios;
- argmax tie-break is (score, lang) max — ties go to the
  lexicographically LAST language, matching ``ORDER BY score DESC,
  lang DESC`` in SQL.

Scale shape: training is one explode + one bounded groupBy
(langs x char-bigram vocabulary — charset-squared, NOT corpus-sized)
plus a driver collect of that bounded table; scoring is one broadcast
join of the pivoted log-prob table onto the exploded document grams
and one groupBy(doc) — a single shuffle whose width is the document
count, never the corpus text. The per-language profile table is the
reference's per-message Function state rendered as a broadcast literal
(pulsar-functions/api-java/.../Function.java:34).

VOCABULARY BOUND: the ``char`` default is driver-safe unconditionally
(charset² grams). ``analyzer='word'`` vocabulary is corpus-sized
(Heaps-law growth) — on a large multilingual crawl an uncapped
``counts.collect()`` is a driver-killer. ``langid_fit`` therefore
takes ``min_count`` / ``top_k_per_lang``: both are applied INSIDE the
distributed aggregation (a count filter and a per-language
``row_number`` over ``(count DESC, gram ASC)`` — fully deterministic),
so the driver collect is bounded by ``top_k_per_lang × langs``
regardless of corpus size. This mirrors fasttext lid's min-count /
hash-bucket vocabulary cap. Word mode REQUIRES ``top_k_per_lang``;
passing None raises rather than silently risking the driver.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000.0


def _round_micro(x: float) -> int:
    """Half-away-from-zero micro-unit rounding — Spark HALF_UP and
    DuckDB round() agree on this; Python's banker's round would not."""
    return int(math.copysign(math.floor(abs(x) * MICRO + 0.5), x))


def char_ngrams(text: Column, n: int = 2) -> Column:
    """All overlapping character n-grams of ``text``, in order — the
    SQL twin is ``substr(text, i, n)`` over ``range(1, len - n + 2)``.
    Empty array for texts shorter than ``n``."""
    return F.when(
        F.length(text) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(text) - (n - 1)),
            lambda i: text.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _features(text: Column, n: int, analyzer: str) -> Column:
    """Feature extraction column: character n-grams (default — robust
    for unsegmented scripts) or whitespace word tokens (``analyzer=
    'word'`` — the fasttext-style unigram mode, stronger when language
    signal lives in whole function words)."""
    if analyzer == "char":
        return char_ngrams(text, n)
    if analyzer == "word":
        from pulsar_spark.functions.text import tokenize

        return tokenize(text)
    raise ValueError(f"unknown analyzer: {analyzer!r} (want 'char' or 'word')")


def langid_fit(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    n: int = 2,
    analyzer: str = "char",
    min_count: int = 1,
    top_k_per_lang: int | None = None,
) -> dict:
    """Train the NB model on labeled rows. Returns the bounded model:
    ``langs`` (sorted), ``prior`` / ``default`` micro-log-prob per
    language, and ``table`` — {gram: {lang: micro_lp}} for grams seen
    in training (missing (gram, lang) pairs score the language's
    ``default``, the Laplace-smoothed zero count).

    ``min_count`` drops (lang, gram) cells with fewer than that many
    occurrences; ``top_k_per_lang`` keeps only each language's k most
    frequent grams (ties broken gram-ascending — deterministic, exact
    in SQL as ``row_number() OVER (PARTITION BY lang ORDER BY c DESC,
    g ASC)``). Both run INSIDE the distributed aggregation, so the
    driver collect is bounded by ``k × langs`` even when the raw
    vocabulary is corpus-sized. ``analyzer='word'`` REQUIRES
    ``top_k_per_lang`` for exactly that reason (word vocabulary grows
    with the corpus — Heaps' law); the char default is charset²-bounded
    and needs no cap. Laplace totals and the smoothing vocabulary are
    computed over the RETAINED cells — the model is self-contained
    in what it collects, so the SQL twin replays it from the same
    capped table."""
    if analyzer == "word" and top_k_per_lang is None:
        raise ValueError(
            "analyzer='word' has a corpus-sized vocabulary; pass "
            "top_k_per_lang to bound the driver collect (see module docstring)"
        )
    grams = docs.select(
        F.col(label_col).alias("lang"),
        F.explode(_features(F.col(text_col), n, analyzer)).alias("g"),
    )
    counts = grams.groupBy("lang", "g").agg(F.count("*").alias("c"))
    if int(min_count) > 1:
        counts = counts.where(F.col("c") >= int(min_count))
    if top_k_per_lang is not None:
        from pyspark.sql import Window

        w = Window.partitionBy("lang").orderBy(F.col("c").desc(), F.col("g").asc())
        counts = (
            counts.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= int(top_k_per_lang))
            .drop("_rn")
        )
    # bounded collects: langs x vocab — charset^n for char mode,
    # top_k_per_lang x langs when capped; word mode cannot reach here
    # uncapped (guard above)
    rows = counts.collect()
    if not rows:
        # reachable with ordinary data once min_count/top_k_per_lang
        # filtering is on (every gram rarer than min_count): without the
        # guard the smoothing denominator log(1/(tot+v)) divides by zero
        raise ValueError(
            "langid_fit: vocabulary is empty after min_count/top_k_per_lang "
            "filtering (or the training text produced no grams) — lower "
            "min_count or supply more training text"
        )
    by_lang_docs = {
        r["lang"]: r["nd"]
        for r in docs.groupBy(label_col).agg(F.count("*").alias("nd"))
        .withColumnRenamed(label_col, "lang").collect()
    }
    # the per-language doc counts already sum to the training size —
    # no separate count() pass
    n_docs = sum(by_lang_docs.values())
    langs = sorted(by_lang_docs)
    vocab = {r.g for r in rows}
    v = len(vocab)
    tot = {lang: 0 for lang in langs}
    for r in rows:
        tot[r.lang] += int(r.c)
    prior = {
        lang: _round_micro(math.log(by_lang_docs[lang] / n_docs)) for lang in langs
    }
    default = {
        lang: _round_micro(math.log(1.0 / (tot[lang] + v))) for lang in langs
    }
    table: dict[str, dict[str, int]] = {}
    for r in rows:
        table.setdefault(r.g, {})[r.lang] = _round_micro(
            math.log((int(r.c) + 1.0) / (tot[r.lang] + v))
        )
    return {
        "n": n,
        "analyzer": analyzer,
        "langs": langs,
        "prior": prior,
        "default": default,
        "table": table,
        "min_count": int(min_count),
        "top_k_per_lang": top_k_per_lang,
    }


def langid_predict(
    docs: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Score every document under the trained model: per language,
    sum of the doc's gram micro-log-probs (broadcast join against the
    bounded model table; unseen grams take the language's smoothed
    default) plus the prior; argmax with (score, lang) tie-break.
    Returns ``(doc_id, lang_pred, micro_score)``. Documents shorter
    than ``n`` characters carry no grams and are dropped — mirror of
    the SQL twin's inner gram join."""
    spark = docs.sparkSession
    langs = model["langs"]
    lp_rows = [
        tuple([g] + [model["table"][g].get(lang) for lang in langs])
        for g in sorted(model["table"])
    ]
    schema = ", ".join(["g string"] + [f"`{lang}` bigint" for lang in langs])
    lp = spark.createDataFrame(lp_rows, schema)
    dg = docs.select(
        F.col(id_col),
        F.explode(
            _features(F.col(text_col), model["n"], model.get("analyzer", "char"))
        ).alias("g"),
    )
    joined = dg.join(F.broadcast(lp), on="g", how="left")
    sums = joined.groupBy(id_col).agg(
        *[
            F.sum(
                F.coalesce(F.col(f"`{lang}`"), F.lit(int(model["default"][lang])))
            ).alias(f"s_{lang}")
            for lang in langs
        ]
    )
    scored = F.array(
        *[
            F.struct(
                (F.col(f"s_{lang}") + F.lit(int(model["prior"][lang])))
                .cast("bigint")
                .alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang in langs
        ]
    )
    best = F.array_max(scored)
    return sums.select(
        id_col,
        best["lang"].alias("lang_pred"),
        best["score"].alias("micro_score"),
    )


def langid_fit_predict(
    docs: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    train_filter: Column | None = None,
    analyzer: str = "char",
    min_count: int = 1,
    top_k_per_lang: int | None = None,
) -> DataFrame:
    """Train on ``train_filter`` rows (default: all) and score ALL
    documents — the standard held-out evaluation shape. One call =
    one bounded training aggregate + one broadcast-scored pass."""
    train = docs.where(train_filter) if train_filter is not None else docs
    model = langid_fit(
        train, label_col, text_col, n, analyzer, min_count, top_k_per_lang
    )
    return langid_predict(docs, model, text_col, id_col)
