"""Training-set selection under a token budget.

The pretraining-pipeline "greedy best-score-first until the token
budget is spent" selection. Two implementations with IDENTICAL output:

- ``select_by_token_budget_exact``: the textbook global ordered cumsum
  (``Window.orderBy(score desc, doc_id)``). One task sorts the whole
  corpus — fine as an oracle at test scale, a scale-killer at 100 TB.
- ``select_by_token_budget``: the scale path. Because scores are
  ROUNDED (6 decimals -> at most ~1e6 distinct values in [0, 1]), the
  ordered cumsum runs over per-score GROUPS, not rows: one bounded-size
  aggregate carries the cross-group running total, and the boundary
  tie-break (doc_id order within the cutoff score) is a window
  PARTITIONED by score — fully parallel. No global row sort anywhere;
  the only unpartitioned window is over <=1e6 score-group rows.

Reference anchor: BASELINE.json north star — quality-gate + budget
selection over the documents table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def select_by_token_budget_exact(
    scored: DataFrame,
    budget: int,
    score_col: str = "score",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Oracle variant: global ordered cumulative sum (single-task sort).

    Keeps rows whose inclusive running token total, in (score desc,
    id asc) order, stays within ``budget``.
    """
    w = Window.orderBy(F.desc(score_col), F.col(id_col))
    return (
        scored.withColumn("cum_tokens", F.sum(token_col).over(w))
        .where(F.col("cum_tokens") <= budget)
        .select(id_col, token_col, score_col, "cum_tokens")
    )


def select_by_token_budget(
    scored: DataFrame,
    budget: int,
    score_col: str = "score",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Scale variant: same selection, no global row sort.

    Plan shape: one hash aggregate (score -> group token total), one
    tiny ordered window over the score groups (bounded cardinality —
    scores are rounded), a join back on score (AQE broadcasts the
    admitted-group side when small), and a per-score-partitioned window
    for the boundary tie-break. Every corpus-sized stage is keyed and
    parallel.
    """
    # Cross-group running total: tokens in STRICTLY better score groups.
    per_score = scored.groupBy(score_col).agg(F.sum(token_col).alias("_grp_tokens"))
    wg = Window.orderBy(F.desc(score_col))
    cum = per_score.withColumn(
        "_cum_before", F.sum("_grp_tokens").over(wg) - F.col("_grp_tokens")
    )
    # Groups whose better-scored predecessors already exhausted the
    # budget contribute nothing — prune them before the corpus join.
    # <= (not <): a group whose predecessors hit the budget EXACTLY can
    # still contribute zero-token rows (cum == budget passes the final
    # filter), matching the exact variant at the boundary.
    admitted = cum.where(F.col("_cum_before") <= budget).select(
        F.col(score_col).alias("_adm_score"), "_cum_before"
    )

    # Within-group running total in id order (partitioned window —
    # parallel), offset by the cross-group total: identical inclusive
    # cum_tokens to the exact global-sort variant. Null-safe join so
    # null-scored rows (sorted last by the exact variant's DESC NULLS
    # LAST window) are not silently dropped by equi-join null semantics.
    ww = Window.partitionBy(score_col).orderBy(F.col(id_col))
    return (
        scored.join(
            admitted, on=F.col(score_col).eqNullSafe(F.col("_adm_score")), how="inner"
        )
        .drop("_adm_score")
        .withColumn(
            "cum_tokens", F.col("_cum_before") + F.sum(token_col).over(ww)
        )
        .where(F.col("cum_tokens") <= budget)
        .select(id_col, token_col, score_col, "cum_tokens")
    )
