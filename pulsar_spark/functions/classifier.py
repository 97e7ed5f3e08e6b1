"""Distributed trained quality classifier — fixed-iteration full-batch
logistic regression over cheap engineered text features, the
fasttext-style "model-based quality filter" stage of a pretraining
pipeline (score every document with a trained linear model, keep the
high-scoring tail). The label here is weak supervision (is the doc in
the target language) — swap in any deterministic label expression.

Determinism contract (what makes a closed-form DuckDB oracle possible,
same philosophy as clustering.kmeans_fit_predict):

- weights start at zero and update for a FIXED number of full-batch
  gradient-descent iterations (no convergence test, no RNG, no
  shuffling — full batch means iteration order cannot matter);
- every per-row feature is rounded to 6 decimals at construction, so
  both engines feed identical doubles into identical left-to-right
  dot products;
- the gradient is summed in INTEGER MICRO-UNITS: each row's
  contribution ``(p - y) * x_j`` is scaled by 1e6, rounded, and cast
  to bigint BEFORE the aggregate, so the distributed sum is exact and
  order-independent — no fp-summation-order hazard between Spark's
  partial aggregates and DuckDB's single-threaded sum;
- probabilities are rounded to 6 decimals after the sigmoid, absorbing
  the <=1-ulp divergence between ``java.lang.Math.exp`` and libm
  ``exp``.

Scale shape: each iteration is ONE narrow map (the d literal weights
ride the scan, JVM-side expressions only) plus ONE global aggregate
that reduces to a single d-column row — partial aggregation combines
map-side, the driver collects d numbers, never data. Total cost for
100 TB = ``iters + 1`` scans of a 6-column projection, like k-means.

Reference framing: the reference ships user-code Functions for exactly
this shape of per-message model scoring (pulsar-functions/api-java/
src/main/java/org/apache/pulsar/functions/api/Function.java:34); this
operator is the trained variant a curation pipeline needs, expressed
as Catalyst expressions instead of a per-row runtime.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pulsar_spark.functions.text import STOPWORDS, tokenize
from pulsar_spark.functions.materialize import materialize

#: feature names in model order; x0 is the bias term
FEATURES = ("x0", "x1", "x2", "x3", "x4")


def doc_features(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, y, x0..x4): bias, tokens/100, mean token length/10,
    stopword ratio, distinct-token ratio — every value rounded to 6
    decimals so both engines see identical doubles. Empty docs are
    dropped (no denominators)."""
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n = F.size("_toks").cast("double")
    return (
        docs.select(
            F.col(id_col),
            # NULL labels (e.g. a predicate over a NULL column) train as
            # negatives rather than silently dropping out of the
            # gradient sums — the CASE ... ELSE 0.0 the SQL twin writes
            F.coalesce(label.cast("double"), F.lit(0.0)).alias("y"),
            tokenize(F.col(text_col)).alias("_toks"),
        )
        .where(F.size("_toks") > 0)
        .select(
            id_col,
            "y",
            F.lit(1.0).alias("x0"),
            F.round(n / 100.0, 6).alias("x1"),
            F.round(
                # total token chars via one codegen'd concat+length,
                # not an interpreted per-element HOF fold (text.py:55)
                F.length(F.concat_ws("", F.col("_toks"))).cast("double")
                / n
                / 10.0,
                6,
            ).alias("x2"),
            F.round(
                F.size(
                    F.filter(F.col("_toks"), lambda t: F.array_contains(stop_arr, t))
                ).cast("double")
                / n,
                6,
            ).alias("x3"),
            F.round(F.size(F.array_distinct(F.col("_toks"))).cast("double") / n, 6).alias(
                "x4"
            ),
        )
    )


def _z(weights: list[float]) -> Column:
    """Left-to-right literal dot product — the same association order
    the SQL twin writes out."""
    z: Column = F.lit(weights[0]) * F.col(FEATURES[0])
    for w, name in zip(weights[1:], FEATURES[1:]):
        z = z + F.lit(w) * F.col(name)
    return z


def _prob(weights: list[float]) -> Column:
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-_z(weights))), 6)


def _fit(feats: DataFrame, iters: int, lr: float) -> list[float]:
    # The row count rides the FIRST gradient aggregate (r11): a
    # standalone count() was a whole extra job over the corpus whose
    # only purpose was the n_rows divisor and the emptiness check —
    # the first gradient pass needs neither as input (its p is the
    # constant 0.5), so one fused select produces count + sums.
    n_rows: int | None = None
    weights = [0.0] * len(FEATURES)
    for _ in range(iters):
        # p under the current literal weights; w=0 on the first pass
        # makes p identically 0.5 (both engines agree exactly)
        p = _prob(weights)
        sums = [
            F.sum(
                F.round((p - F.col("y")) * F.col(name) * 1000000.0, 0).cast(
                    "bigint"
                )
            ).alias(name)
            for name in FEATURES
        ]
        if n_rows is None:
            grad_row = feats.select(F.count(F.lit(1)).alias("_n"), *sums).head()
            n_rows = int(grad_row["_n"])
        else:
            grad_row = feats.select(*sums).head()
        if n_rows == 0:
            raise ValueError("logistic regression: no non-empty documents")
        # half-away-from-zero 6dp, matching Spark HALF_UP and DuckDB
        # round() — Python's round() is banker's and would diverge on
        # an exact 6dp midpoint of the update
        weights = [
            _round6_half_away(w - lr * ((int(grad_row[name]) / 1000000.0) / n_rows))
            for w, name in zip(weights, FEATURES)
        ]
    if n_rows is None:  # iters == 0: still enforce the emptiness contract
        if feats.count() == 0:
            raise ValueError("logistic regression: no non-empty documents")
    return weights


def _round6_half_away(x: float) -> float:
    return math.copysign(math.floor(abs(x) * 1_000_000.0 + 0.5), x) / 1_000_000.0


def fitted_weights(
    docs: DataFrame,
    label: Column,
    iters: int = 2,
    lr: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[float]:
    """The trained weight vector alone (for inspection / reuse on a
    different corpus without retraining)."""
    feats = doc_features(docs, label, text_col, id_col).persist()
    try:
        return _fit(feats, iters, lr)
    finally:
        feats.unpersist()


def logreg_fit_predict(
    docs: DataFrame,
    label: Column,
    iters: int = 2,
    lr: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train-and-score: returns (id, score, pred, label) where
    ``score`` is the final-model probability (rounded to 6 decimals)
    and ``pred = score >= 0.5``."""
    # persist: tokenization + feature engineering feed the count, every
    # gradient pass AND the final scoring — without it each pass would
    # re-derive the features from the raw corpus
    feats = doc_features(docs, label, text_col, id_col).persist()
    weights = _fit(feats, iters, lr)
    score = _prob(weights)
    out = feats.select(
        id_col,
        score.alias("score"),
        (score >= 0.5).alias("pred"),
        F.col("y").cast("int").alias("label"),
    )
    # materialize the small scored result so the cache can be released
    # now (same rationale as clustering.semantic_dedup)
    out = materialize(out)
    feats.unpersist()
    return out


#: default threshold grid for :func:`pr_curve`
PR_THRESHOLDS = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)


def pr_curve(
    scored: DataFrame,
    thresholds: tuple[float, ...] = PR_THRESHOLDS,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Precision/recall/F1 threshold sweep over a scored frame (the
    output of :func:`logreg_fit_predict`, or any (score, label) pair) —
    turns the trained gate's fixed 0.5 cut into a tunable operator,
    matching how fasttext-style quality filters are actually deployed
    (pick the threshold from the PR trade-off, then filter).

    Returns one row per threshold:
    ``(threshold, n_pred_pos, tp, fp, fn, precision, recall, f1)``
    with NULL precision/recall/f1 where the denominator is zero (no
    predicted positives / no actual positives), guarded so ANSI mode
    never divides by zero.

    Determinism: tp/fp/fn are integer conditional counts; each ratio is
    one bigint/bigint true division rounded to 6dp (identical across
    engines); ``score >= threshold`` compares the 6dp-rounded score to
    the same literal double both engines parse.

    Scale shape: a 9x row explode immediately absorbed by a map-side
    partial aggregate on the 9 threshold keys — each task emits at most
    ``len(thresholds)`` rows, one tiny exchange.
    """
    per = scored.select(
        F.col(score_col).alias("_s"),
        F.col(label_col).cast("int").alias("_y"),
        F.explode(F.array(*[F.lit(float(t)) for t in thresholds])).alias("threshold"),
    )
    # NULL scores never pass any threshold: coalesce to false so a
    # NULL-score positive-label row counts as a FALSE NEGATIVE instead
    # of silently vanishing from the recall denominator (a bare
    # three-valued `pos` would make both when(pos) and when(~pos) take
    # otherwise(0))
    pos = F.coalesce(F.col("_s") >= F.col("threshold"), F.lit(False))
    y1 = F.col("_y") == 1
    agg = per.groupBy("threshold").agg(
        F.sum(F.when(pos, 1).otherwise(0)).alias("n_pred_pos"),
        F.sum(F.when(pos & y1, 1).otherwise(0)).alias("tp"),
        F.sum(F.when(pos & ~y1, 1).otherwise(0)).alias("fp"),
        F.sum(F.when(~pos & y1, 1).otherwise(0)).alias("fn"),
    )
    tp, fp, fn = F.col("tp"), F.col("fp"), F.col("fn")
    return agg.select(
        "threshold",
        "n_pred_pos",
        "tp",
        "fp",
        "fn",
        F.when(tp + fp > 0, F.round(tp / (tp + fp), 6)).alias("precision"),
        F.when(tp + fn > 0, F.round(tp / (tp + fn), 6)).alias("recall"),
        F.when(
            F.lit(2) * tp + fp + fn > 0,
            F.round(F.lit(2) * tp / (F.lit(2) * tp + fp + fn), 6),
        ).alias("f1"),
    )


def calibration_bins(
    scored: DataFrame,
    n_bins: int = 10,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Reliability-diagram table for a scored frame: equal-width score
    bins with per-bin count, positive count, mean predicted score and
    empirical positive rate — the calibration check run next to the PR
    sweep before trusting a trained filter's threshold (a well-
    calibrated gate has ``pos_rate ~= mean_score`` per bin).

    Returns ``(bin, bin_lo, n, n_pos, mean_score, pos_rate)`` with
    ``bin = min(floor(score * n_bins), n_bins - 1)`` (scores of exactly
    1.0 land in the top bin).

    Determinism: scores are already 6dp-rounded, so ``score * 1e6`` is
    an exact integer — summed as bigint (order-independent), with the
    mean as one division chain rounded to 6dp; counts are integers;
    the bin floor applies the same IEEE multiply in both engines.

    Scale shape: one map-side-combinable aggregate on ``n_bins`` keys —
    each task emits at most ``n_bins`` rows."""
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(int(n_bins) - 1)
    )
    agg = (
        scored.select(
            b.alias("bin"),
            F.round(F.col(score_col) * 1_000_000.0, 0).cast("bigint").alias("_su"),
            F.col(label_col).cast("int").alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum("_y").alias("n_pos"),
            F.sum("_su").alias("_sum_u"),
        )
    )
    return agg.select(
        "bin",
        F.round(F.col("bin").cast("double") / n_bins, 6).alias("bin_lo"),
        "n",
        "n_pos",
        F.round(F.col("_sum_u").cast("double") / 1_000_000.0 / F.col("n"), 6).alias(
            "mean_score"
        ),
        F.round(F.col("n_pos") / F.col("n"), 6).alias("pos_rate"),
    )


def sigmoid(z: float) -> float:
    """Driver-side reference sigmoid for tests."""
    return 1.0 / (1.0 + math.exp(-z))
