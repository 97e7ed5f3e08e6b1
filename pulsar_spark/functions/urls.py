"""URL canonicalization and URL-keyed document dedup.

Crawl pipelines dedup by canonical URL before any content hashing: the
same page is fetched as ``http://WWW.Site.com/a/?b=2&a=1&utm_source=x``
and ``http://site.com:80/a?a=1&b=2`` and must collapse. The rules here
are the standard public set (RFC 3986 normalization + the common crawl
conventions): lowercase scheme and host, strip a leading ``www.``,
strip default ports (:80 for http, :443 for https), drop the fragment,
drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``), sort the
remaining query parameters, and strip trailing slashes from the path.

Everything is a JVM-side expression chain (split/regexp/array_sort —
whole-stage codegen, no UDF), so canonicalization rides the scan and
the dedup is one hash-partitioned window, the same keep-one shape as
exact text dedup. The reference repo has no URL operators (it is a
messaging system); this module is part of the training-data-pipeline
extension.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query parameters dropped during canonicalization (tracking noise)
TRACKING_PARAM_RE = "^(utm_[a-z0-9_]+|fbclid|gclid)="


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL, as one codegen
    expression chain. Idempotent: canonicalize(canonicalize(u)) ==
    canonicalize(u) (property-tested)."""
    u = F.trim(url)
    scheme = F.lower(F.substring_index(u, "://", 1))
    rest = F.substring_index(u, "://", -1)
    hostport = F.substring_index(rest, "/", 1)
    # host: lowercase, strip leading www., strip the default ports
    host = F.regexp_replace(
        F.regexp_replace(F.lower(hostport), r"^www\.", ""), r":(80|443)$", ""
    )
    # everything after the host
    path_q = F.substring(rest, F.length(hostport) + 1, F.lit(1 << 30))
    path_q = F.substring_index(path_q, "#", 1)  # drop fragment
    path = F.substring_index(path_q, "?", 1)
    query = F.when(
        path_q.contains("?"), F.substring_index(path_q, "?", -1)
    ).otherwise(F.lit(""))
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    sorted_q = F.array_join(F.array_sort(params), "&")
    path = F.regexp_replace(path, "/+$", "")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(sorted_q != "", F.concat(F.lit("?"), sorted_q)).otherwise(F.lit("")),
    )


def url_dedup(
    docs: DataFrame, url_col: str = "url", id_col: str = "doc_id"
) -> DataFrame:
    """Keep-one-per-canonical-URL mapping: every document mapped to the
    smallest id sharing its canonical URL — the same one-window shape
    as exact text dedup and phash_exact_groups. Returns
    ``(id, canonical_url, canonical_id, group_size, is_dup)``.
    """
    from pyspark.sql.window import Window

    canon = docs.select(
        F.col(id_col),
        canonicalize_url(F.col(url_col)).alias("canonical_url"),
    )
    w = Window.partitionBy("canonical_url")
    return canon.select(
        id_col,
        "canonical_url",
        F.min(id_col).over(w).alias("canonical_id"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("group_size"),
        (F.col(id_col) != F.min(id_col).over(w)).alias("is_dup"),
    )
