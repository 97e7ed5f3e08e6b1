"""Text analysis for large-scale training-data pipelines.

All hot-path expressions are built-in pyspark.sql.functions (JVM-side,
whole-stage codegen) — no Python UDFs. Language-ID is a stopword-profile
heuristic expressed as array intersections, so it also stays JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it"]

#: tiny per-language marker-word profiles for the language-ID heuristic.
#: (The driver's synthetic documents are English-ish word soup with a
#: lang label; real profiles would be char-n-gram tables. The operator
#: shape — score per language, argmax — is the real thing.)
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["的", "是", "了", "在", "我"],
}


def tokenize(text: Column) -> Column:
    """Whitespace tokenization with empty-token removal (BPE-ish regex
    splitting would go here; whitespace keeps the oracle exact)."""
    return F.filter(F.split(text, " "), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokenize(text))


def quality_metrics(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality scores: token count, distinct-token ratio,
    stopword ratio, mean token length — the usual cheap filters in a
    pretraining pipeline. Tokens are materialized once per row (a
    lambda referencing an outer expression would re-split per element).
    All ratios rounded to 6dp for cross-engine comparability."""
    toks = F.col("_toks")
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    return docs.withColumn("_toks", tokenize(F.col(text_col))).select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        F.round(F.size(F.array_distinct(toks)) / n, 6).alias("distinct_ratio"),
        F.round(n_stop / n, 6).alias("stopword_ratio"),
        # total token chars via one codegen'd concat+length, not an
        # interpreted per-element HOF fold
        F.round(F.length(F.concat_ws("", toks)).cast("bigint") / n, 6).alias(
            "mean_token_len"
        ),
    )


def gopher_rules(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher quality-filter rules (Rae et al. 2021, arXiv:2112.11446,
    Appendix A.1.1) — the word-level subset that applies to a
    whitespace corpus: word count in [50, 100k], mean word length in
    [3, 10], symbol-to-word ratio (``#`` and ``...``) below 0.1, at
    least 80% of words containing an alphabetic character, and at
    least 2 distinct stopwords present. (The line-level rules —
    bullet/ellipsis line fractions, duplicate-line fractions — need
    newline structure this corpus doesn't carry; the repetition family
    is covered separately by ``repetition_stats``.)

    Returns per doc every rule input plus the composite
    ``gopher_pass``, so downstream pipelines can both filter on the
    composite and audit which rule fired. Ratios are rounded to 6dp
    BEFORE the threshold comparisons so pass/fail is engine-stable.

    Empty documents (zero words) are dropped, like ``doc_features`` and
    ``bpe_encode_counts`` — they have no denominators, and under ANSI
    mode an unguarded 0-division would fail the whole job on one bad
    row.

    Scale shape: one narrow codegen'd projection riding the scan — no
    shuffle, no Python, no joins."""
    toks = F.col("_toks")
    n = F.size(toks)
    nd = n.cast("double")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    text = F.col(text_col)
    mean_len = F.round(F.length(F.concat_ws("", toks)) / nd, 6)
    alpha_frac = F.round(
        F.size(F.filter(toks, lambda t: t.rlike("[a-zA-Z]"))) / nd, 6
    )
    n_hash = F.length(text) - F.length(F.replace(text, F.lit("#")))
    n_ellipsis = (
        F.length(text) - F.length(F.replace(text, F.lit("...")))
    ) / F.lit(3)
    symbol_ratio = F.round((n_hash + n_ellipsis) / nd, 6)
    n_stop = F.size(F.array_intersect(toks, stop_arr))
    out = docs.withColumn("_toks", tokenize(text)).where(n > 0).select(
        "doc_id",
        n.cast("bigint").alias("n_words"),
        mean_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        symbol_ratio.alias("symbol_ratio"),
        n_stop.cast("bigint").alias("n_stop_distinct"),
    )
    gopher_pass = (
        F.col("n_words").between(50, 100_000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("symbol_ratio") < 0.1)
        & (F.col("alpha_frac") >= 0.8)
        & (F.col("n_stop_distinct") >= 2)
    )
    return out.withColumn("gopher_pass", gopher_pass)


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: score = count of profile marker words
    present; argmax over languages (ties -> lexicographically last).
    Returns (doc_id, lang_pred, lang_score)."""
    toks = F.col("_toks")
    scores = F.array(
        *[
            F.struct(
                F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(LANG_PROFILES.items())
        ]
    )
    best = F.array_max(scores)
    return docs.withColumn("_toks", F.array_distinct(tokenize(F.col(text_col)))).select(
        "doc_id",
        best["lang"].alias("lang_pred"),
        best["score"].cast("bigint").alias("lang_score"),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 128,
    overlap_tokens: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RAG-style overlapping chunking: split each document into
    ``chunk_tokens``-token windows advancing by ``chunk_tokens -
    overlap_tokens`` (so consecutive chunks share ``overlap_tokens``);
    the final chunk may be short. Output one row per chunk with a
    stable ``(doc_id, chunk_index)`` identity, the chunk text, its
    token count, and an md5 content hash (the dedup/index key).

    Scale shape: tokenize + sequence + explode + slice — all built-in
    expressions riding the scan; the only multiplication is the explode
    (rows x chunks-per-doc), exactly the output size. No shuffle, no
    UDF, no state."""
    stride = chunk_tokens - overlap_tokens
    if stride <= 0:
        raise ValueError("overlap_tokens must be smaller than chunk_tokens")
    toks = docs.select(
        F.col(id_col),
        tokenize(F.col(text_col)).alias("_toks"),
    ).withColumn("_n", F.size("_toks"))
    return (
        toks.where(F.col("_n") > 0)
        .select(
            id_col,
            "_toks",
            "_n",
            F.explode(
                F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
            ).alias("_start"),
        )
        # drop a trailing start whose window adds no new tokens (when
        # n mod stride lands inside the overlap the previous chunk
        # already covers it; emitting it would index duplicate content
        # under a fresh chunk_hash)
        .where(
            (F.col("_start") == 0)
            | (F.col("_n") - F.col("_start") > F.lit(overlap_tokens))
        )
        .select(
            F.col(id_col),
            (F.col("_start") / stride).cast("int").alias("chunk_index"),
            F.array_join(
                F.slice(F.col("_toks"), F.col("_start") + 1, chunk_tokens), " "
            ).alias("chunk_text"),
            F.least(F.lit(chunk_tokens), F.col("_n") - F.col("_start")).cast(
                "int"
            ).alias("n_chunk_tokens"),
        )
        .withColumn("chunk_hash", F.md5(F.col("chunk_text")))
    )


def fingerprint(text: Column) -> Column:
    """Deterministic 128-bit document fingerprint (md5 of lowercase,
    space-normalized text) — exact-dup key and cache key."""
    return F.md5(F.lower(F.trim(text)))


#: GPT-2-ish pretokenizer pattern, restricted to constructs with
#: identical semantics in java.util.regex and RE2 (no lookarounds):
#: common contractions, letter runs, digit runs, punctuation runs.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d|[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def bpe_tokenize(text: Column) -> Column:
    """BPE-style pretokenization (contractions / letter runs / digit
    runs / punctuation runs) via ``regexp_extract_all`` — JVM-side, no
    UDF. The real byte-pair merges happen in a trainer's tokenizer;
    pipelines use this split for token-budget estimation."""
    return F.regexp_extract_all(text, F.lit(BPE_PATTERN), 0)


def bpe_token_count(text: Column) -> Column:
    return F.size(bpe_tokenize(text))


ROLLING_HASH_BASE = 31
ROLLING_HASH_MOD = 1_000_000_007


def rolling_fingerprint(text: Column) -> Column:
    """Polynomial rolling hash (Rabin-Karp accumulator) over unicode
    codepoints: acc = (acc*31 + cp) mod 1e9+7. Order-sensitive — unlike
    the md5 ``fingerprint`` it can be updated incrementally and compared
    across substrings; modulus keeps every intermediate < 2^35 so the
    arithmetic is exact in any engine's 64-bit integers."""
    cps = F.transform(
        F.filter(F.split(text, ""), lambda ch: ch != ""),
        lambda ch: F.ascii(ch).cast("bigint"),
    )
    return F.aggregate(
        cps,
        F.lit(0).cast("bigint"),
        lambda acc, cp: (acc * ROLLING_HASH_BASE + cp) % ROLLING_HASH_MOD,
    )


# PII redaction patterns, applied in order (email first — it contains
# dots and digits that the later patterns would otherwise bite into).
# Patterns are deliberately restricted to syntax that behaves
# identically in java.util.regex (Spark) and RE2 (DuckDB oracle): no
# lookaround, no backrefs.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "[EMAIL]"),
    ("ipv4", r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", "[IP]"),
    ("phone", r"\d{3}-\d{4}", "[PHONE]"),
]


def redact_pii(text: Column) -> Column:
    """Scrub common PII shapes (emails, IPv4s, phone-like digit runs)
    from a text column — the pre-training corpus hygiene pass. Pure
    chained ``regexp_replace``: JVM-side, codegen'd, no shuffle; at
    100 TB this rides the scan stage like any projection."""
    out = text
    for _, pat, rep in PII_PATTERNS:
        out = F.regexp_replace(out, pat, rep)
    return out


def remove_repeated_lines(
    docs: DataFrame,
    sep: str = "\n",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Within-document repeated-line removal — the C4 cleaning rule
    ("we deduplicated repeated lines within a page", Raffel et al.
    2020 §2.2; RefinedWeb applies the same line-level rule): every
    line after its first occurrence IN THE SAME document is dropped,
    survivors keep their original order. The within-doc sibling of the
    cross-doc family (``remove_duplicated_chunks`` /
    ``remove_duplicated_spans``).

    Implementation is a single narrow projection — ``array_distinct``
    preserves FIRST-occurrence order, so keep-first dedup plus ordered
    reassembly is one expression with ZERO shuffles; at 100 TB this
    rides the scan stage like any projection. Returns
    ``(id, text_clean, n_lines_before, n_lines_removed)``.
    """
    import re

    # F.split takes a REGEX — escape the literal separator
    lines = F.split(F.col(text_col), re.escape(sep))
    kept = F.array_distinct(lines)
    return docs.select(
        id_col,
        F.array_join(kept, sep).alias("text_clean"),
        F.size(lines).cast("bigint").alias("n_lines_before"),
        (F.size(lines) - F.size(kept)).cast("bigint").alias("n_lines_removed"),
    )


def repetition_metrics(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Within-document repetition signals (the Gopher-rule family of
    quality filters: documents dominated by repeated fragments are
    boilerplate/spam): for n in {1, 2, 3}, ``dup_ngram_frac_n`` = the
    fraction of the doc's word n-grams that are repeats of an n-gram
    already seen in the same doc (1 - distinct/total).

    All built-in array expressions over one tokenization — no shuffle,
    no Python; rides the scan at any corpus size. Returns
    (id, n_tokens, dup_ngram_frac_1..3).
    """
    toks = F.col("_toks")

    def frac(n: int):
        if n == 1:
            grams = toks
        else:
            grams = F.expr(
                f"transform(sequence(1, greatest(size(_toks) - {n - 1}, 1)),"
                f" i -> concat_ws(' ', slice(_toks, i, {n})))"
            )
        total = F.size(grams)
        return F.when(
            total > 0,
            F.round(1 - F.size(F.array_distinct(grams)) / total, 6),
        ).otherwise(0.0)

    return docs.withColumn("_toks", tokenize(F.col(text_col))).select(
        id_col,
        F.size(toks).cast("bigint").alias("n_tokens"),
        frac(1).alias("dup_ngram_frac_1"),
        frac(2).alias("dup_ngram_frac_2"),
        frac(3).alias("dup_ngram_frac_3"),
    )


def sketch_token_stats(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    lg_k: int = 12,
) -> DataFrame:
    """Per-group corpus statistics with MERGEABLE distinct-count
    sketches: total tokens plus an HLL (Apache DataSketches) estimate
    of distinct tokens per group, and each group's binary sketch for
    later union.

    This is the 100 TB shape for corpus accounting: an exact
    ``count(DISTINCT token)`` shuffles every token once per grouping
    you ever ask for, while a sketch is built in one pass with
    map-side partial aggregation (the HLL buffer merges
    associatively), is a few KB per group, and unions across groups /
    days / shards without touching the data again
    (``sketch_union_distinct``). Standard error at lg_k=12 is ~1.6%.
    """
    toks = docs.select(
        F.col(group_col), F.explode(tokenize(F.col(text_col))).alias("tok")
    )
    return (
        toks.groupBy(group_col)
        .agg(
            F.count("*").alias("total_tokens"),
            F.hll_sketch_agg("tok", F.lit(int(lg_k))).alias("sketch"),
        )
        .select(
            group_col,
            "total_tokens",
            F.hll_sketch_estimate("sketch").alias("approx_distinct_tokens"),
            "sketch",
        )
    )


def sketch_union_distinct(per_group: DataFrame, sketch_col: str = "sketch") -> DataFrame:
    """Union per-group HLL sketches into one corpus-wide distinct
    estimate WITHOUT re-scanning the corpus — the mergeability that
    makes sketches the right answer at scale (per-shard sketches roll
    up to any coarser grain for free)."""
    return per_group.agg(
        F.hll_sketch_estimate(F.hll_union_agg(sketch_col)).alias("approx_distinct_total")
    )


def unigram_model(
    docs: DataFrame,
    text_col: str = "text",
    max_vocab: int = 50_000,
    alpha: float = 0.5,
    min_count: int | None = None,
) -> DataFrame:
    """Train an add-alpha-smoothed unigram LM over the corpus — the
    model half of CCNet-style perplexity filtering. Returns
    (tok, logprob) for the ``max_vocab`` most frequent tokens (ties
    break on the token for determinism); everything else scores as a
    single OOV event at count 0.

    Capping the vocabulary is what makes scoring scale-safe: the model
    broadcasts (a few MB) instead of shuffle-joining every token
    occurrence against an unbounded vocabulary with Zipf skew.

    Vocabulary selection: pass ``min_count`` for the corpus-scale path
    — a narrow ``n >= min_count`` filter, no sort anywhere. The
    default top-``max_vocab`` ranking is exact and deterministic (ties
    break on the token) but its window sorts the VOCABULARY table in
    one task; fine up to millions of distinct tokens, not at web-corpus
    vocabulary sizes — use ``min_count`` there.
    """
    from pyspark.sql.window import Window

    toks = docs.select(F.explode(tokenize(F.col(text_col))).alias("tok"))
    counts = toks.groupBy("tok").agg(F.count("*").alias("n"))
    if min_count is not None:
        vocab = counts.where(F.col("n") >= min_count)
    else:
        w = Window.orderBy(F.col("n").desc(), F.col("tok"))
        vocab = counts.withColumn("_rk", F.row_number().over(w)).where(
            F.col("_rk") <= max_vocab
        )
    # totals come from the already-aggregated counts frame (one row per
    # distinct token): sum(n) = occurrences, count(*) = full vocabulary
    # — no second pass over the corpus. A tiny eager collect turns them
    # into literals so the OOV logprob (true add-alpha count-0
    # probability) travels on the model frame.
    import math

    t, v = counts.agg(F.sum("n"), F.count("*")).collect()[0]
    denom = float(t) + alpha * (float(v) + 1)
    oov = round(math.log(alpha / denom), 6)
    return vocab.select(
        "tok",
        F.round(F.log((F.col("n") + F.lit(alpha)) / F.lit(denom)), 6).alias("logprob"),
        F.lit(oov).alias("oov_logprob"),
    )


def perplexity_scores(
    docs: DataFrame,
    model: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_vocab: int = 50_000,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document mean negative log-likelihood under the unigram LM —
    the CCNet quality proxy (low = fluent/common text, high = garbage
    or very rare vocabulary). Pass a pre-trained ``model`` (from
    ``unigram_model``, possibly trained on a different reference
    corpus, as CCNet trains on Wikipedia) or let it default to
    self-training on ``docs``.

    Scale shape: one explode + one BROADCAST join against the capped
    vocabulary + one per-doc agg. OOV tokens take the count-0 smoothed
    probability. Empty documents score NULL.
    """
    if model is None:
        model = unigram_model(docs, text_col, max_vocab, alpha)
    # explode_outer keeps empty/whitespace-only documents in the output
    # (one NULL-token row); they aggregate to n_tokens=0, nll=NULL
    toks = docs.select(
        F.col(id_col), F.explode_outer(tokenize(F.col(text_col))).alias("tok")
    )
    # OOV tokens take the model's true count-0 add-alpha probability,
    # carried on the model frame by unigram_model
    oov = model.agg(F.max("oov_logprob").alias("f"))
    scored = (
        toks.join(F.broadcast(model.select("tok", "logprob")), on="tok", how="left")
        .crossJoin(F.broadcast(oov))
        .withColumn(
            "logprob",
            F.when(F.col("tok").isNotNull(), F.coalesce("logprob", F.col("f"))),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(F.round(-F.avg("logprob"), 6).alias("nll"), F.count("tok").alias("n_tokens"))
    )


def bm25_scores(
    docs: DataFrame,
    queries: list[tuple[str, list[str]]],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int | None = 10,
) -> DataFrame:
    """BM25 relevance ranking of the corpus against a small query set —
    the retrieval scorer a RAG/data-curation pipeline runs next to the
    embedding ANN (functions/similarity.py). Okapi BM25 (Robertson et
    al., TREC-3; the +1-smoothed idf Lucene uses so df=N terms never go
    negative):

        idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
        score(d, q) = sum_t idf(t) * tf * (k1+1)
                            / (tf + k1 * (1 - b + b * dl / avgdl))

    Returns (query_id, rank, doc_id, score) with rank 1..top_k per
    query (ties broken by doc_id on the 6dp-rounded score; pass
    top_k=None for all matches).

    Scale shape: one explode filtered to the query vocabulary (a
    broadcast literal — the scan never materializes non-query tokens
    past the filter), ONE shuffle to the (doc, term) tf agg, then
    broadcast joins for idf / query expansion / corpus stats; the final
    per-query rank is a window over query_id — as many partitions as
    queries, each holding only docs that matched, which is the
    invariant that keeps it bounded at 100 TB (queries are few, matches
    are filtered).
    """
    from pyspark.sql.window import Window

    vocab = sorted({t for _, terms in queries for t in terms})
    spark = docs.sparkSession
    qmap = spark.createDataFrame(
        [(qid, t) for qid, terms in queries for t in terms],
        "query_id string, term string",
    )
    dl = token_count(F.col(text_col)).cast("double")
    toks = docs.select(
        F.col(id_col), dl.alias("dl"), F.explode(tokenize(F.col(text_col))).alias("term")
    ).where(F.col("term").isin(vocab))
    tf = toks.groupBy(id_col, "dl", "term").agg(F.count("*").cast("double").alias("tf"))
    stats = docs.agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg(dl).alias("avgdl"),
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count("*").cast("double").alias("df"))  # tf rows are distinct per doc
        .crossJoin(F.broadcast(stats))
        .select(
            "term",
            F.log1p((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)).alias("idf"),
            "avgdl",
        )
    )
    contrib = F.col("idf") * F.col("tf") * (k1 + 1) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    # per-term contributions quantized to integer micro-units BEFORE the
    # cross-term sum (the determinism contract classifier/DSIR/
    # temperature_mix use): integer sums are order-independent, so
    # Spark partial-agg order vs a single-threaded oracle can't differ
    # in the last ulp and flip a rank tie-break
    contrib_u = F.round(contrib * 1_000_000.0, 0).cast("bigint")
    scored = (
        tf.join(F.broadcast(idf), "term")
        .join(F.broadcast(qmap), "term")
        .groupBy("query_id", id_col)
        .agg((F.sum(contrib_u).cast("double") / 1_000_000.0).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.col(id_col))
    ranked = scored.select(
        "query_id", F.row_number().over(w).alias("rank"), id_col, "score"
    )
    # top_k=0 means "no rows", only None means "all matches"
    return ranked.where(F.col("rank") <= top_k) if top_k is not None else ranked


#: unit-separator control char — the symbol boundary in the BPE merge
#: string representation (never appears in natural tokens; words
#: containing it are excluded defensively)
BPE_SEP = "\x1f"


def bpe_learn_merges(
    docs: DataFrame,
    num_merges: int = 3,
    text_col: str = "text",
    passes: int = 2,
) -> DataFrame:
    """Distributed BPE tokenizer training (Sennrich et al. 2016,
    arXiv:1508.07909): learn the top ``num_merges`` byte-pair merges
    from corpus word frequencies. Returns the merge table
    (step, left_sym, right_sym, merged, pair_count) — the model a
    tokenizer ships, in merge-priority order.

    Algorithm: classic BPE on the word-frequency table. Words start as
    character sequences; each round counts adjacent symbol pairs
    weighted by word frequency, picks the most frequent pair
    (ties -> lexicographically smallest), and merges it everywhere.

    Engine-parity representation: a word's symbol sequence is stored as
    a single string with every symbol wrapped in unit separators
    (``\\x1f a \\x1f b \\x1f``), and a merge is ``passes`` applications
    of plain ``replace(s, sep+l+sep+r+sep, sep+lr+sep)`` — Spark and
    DuckDB share exact left-to-right non-overlapping replace semantics,
    so the oracle is closed-form. (On runs of >=5 identical symbols the
    two-pass rewrite can merge one fewer pair than canonical
    left-to-right BPE; natural-language words don't hit this, and BOTH
    engines implement the identical rewrite, which is what the oracle
    checks.)

    Scale shape: ONE corpus-wide shuffle builds the word-frequency
    table (vocabulary-sized, cached); each merge round then runs over
    the vocabulary only — an adjacent-pair explode + weighted count
    whose argmax is a TakeOrdered(1) (no global sort), plus a narrow
    string rewrite. The driver ever holds num_merges single rows; at
    100 TB the corpus is scanned exactly once."""
    words = (
        docs.select(F.explode(tokenize(F.col(text_col))).alias("w"))
        .where(~F.col("w").contains(BPE_SEP))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.concat(
                F.lit(BPE_SEP), F.array_join(F.split("w", ""), BPE_SEP), F.lit(BPE_SEP)
            ).alias("s"),
            "cnt",
        )
        .persist()
    )
    merges: list[tuple] = []
    cur = words
    try:
        for step in range(1, num_merges + 1):
            syms = F.filter(F.split("s", BPE_SEP), lambda x: x != "")
            pair = F.explode(
                F.arrays_zip(
                    F.slice(syms, 1, F.size(syms) - 1),
                    F.slice(syms, 2, F.size(syms) - 1),
                )
            )
            top = (
                cur.select("cnt", pair.alias("p"))
                .select("cnt", F.col("p")["0"].alias("l"), F.col("p")["1"].alias("r"))
                .groupBy("l", "r")
                .agg(F.sum("cnt").alias("c"))
                .orderBy(F.desc("c"), "l", "r")
                .limit(1)
                .collect()
            )
            if not top:
                break
            l, r, c = top[0]["l"], top[0]["r"], int(top[0]["c"])
            merges.append((step, l, r, l + r, c))
            pat = F.lit(BPE_SEP + l + BPE_SEP + r + BPE_SEP)
            rep = F.lit(BPE_SEP + l + r + BPE_SEP)
            s = F.col("s")
            for _ in range(passes):
                s = F.replace(s, pat, rep)
            cur = cur.select(s.alias("s"), "cnt")
    finally:
        words.unpersist()
    return docs.sparkSession.createDataFrame(
        merges,
        "step int, left_sym string, right_sym string, merged string, pair_count bigint",
    )


def bpe_encode_counts(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    passes: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Encode the corpus with a learned BPE merge table (the second
    half of train-tokenizer -> encode-corpus): per document, the
    character-symbol count before merging, the BPE symbol count after
    applying ``merges`` in priority order, and the compression ratio.
    ``merges`` is the (left, right) list ``bpe_learn_merges`` returns —
    a bounded model that rides into the plan as literals.

    Scale shape: a single 0-shuffle narrow map — per word the same
    unit-separator string rewrite as training (``passes`` x len(merges)
    engine-identical ``replace`` calls), all inside one codegen'd
    projection riding the scan. Words containing the separator are
    excluded exactly as in training."""
    toks = F.filter(
        tokenize(F.col(text_col)), lambda w: ~w.contains(BPE_SEP)
    )

    def word_syms(w: Column) -> Column:
        s = F.concat(
            F.lit(BPE_SEP), F.array_join(F.split(w, ""), BPE_SEP), F.lit(BPE_SEP)
        )
        for l, r in merges:
            pat = F.lit(BPE_SEP + l + BPE_SEP + r + BPE_SEP)
            rep = F.lit(BPE_SEP + l + r + BPE_SEP)
            for _ in range(passes):
                s = F.replace(s, pat, rep)
        return F.size(F.filter(F.split(s, BPE_SEP), lambda x: x != ""))

    return (
        docs.select(F.col(id_col), toks.alias("_toks"))
        .where(F.size("_toks") > 0)
        .select(
            id_col,
            # total token chars via one codegen'd concat+length, not an
            # interpreted per-element HOF fold (same form as
            # quality_metrics above)
            F.length(F.concat_ws("", F.col("_toks")))
            .cast("bigint")
            .alias("n_char_tokens"),
            F.aggregate(
                F.transform(F.col("_toks"), word_syms),
                F.lit(0),
                lambda a, x: a + x,
            )
            .cast("bigint")
            .alias("n_bpe_tokens"),
        )
        .withColumn(
            "compression",
            F.round(F.col("n_bpe_tokens") / F.col("n_char_tokens"), 6),
        )
    )
