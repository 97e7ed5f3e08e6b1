"""URL canonicalization and URL-keyed document dedup.

Crawl pipelines dedup by canonical URL before any content hashing: the
same page is fetched as ``http://WWW.Site.com/a/?b=2&a=1&utm_source=x``
and ``http://site.com:80/a?a=1&b=2`` and must collapse. The rules here
are the standard public set (RFC 3986 normalization + the common crawl
conventions): lowercase scheme and host, strip a leading ``www.``,
strip the scheme's OWN default port (:80 for http, :443 for https —
never the other's), drop the fragment, drop tracking parameters
(``utm_*``, ``fbclid``, ``gclid``, case-insensitively), sort the
remaining query parameters, and strip trailing slashes from the path.

Parsing is position-exact per RFC 3986: the authority ends at the
FIRST of ``/``, ``?`` or ``#`` (so ``http://a.com?b=1`` and
``http://a.com#f`` normalize like any other URL), the query starts at
the FIRST ``?`` and the fragment at the FIRST ``#`` — never
last-occurrence splits, which would mis-parse redirect-style URLs that
EMBED another URL in a parameter value
(``/redirect?url=http://b.com``).

Everything is a JVM-side expression chain (split/regexp/array_sort —
whole-stage codegen, no UDF), so canonicalization rides the scan and
the dedup is one hash-partitioned window, the same keep-one shape as
exact text dedup. NULL urls stay NULL and are never grouped with each
other. The reference repo has no URL operators (it is a messaging
system); this module is part of the training-data-pipeline extension.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: query parameters dropped during canonicalization (tracking noise);
#: case-insensitive — crawls see `UTM_Source=` as often as `utm_source=`
TRACKING_PARAM_RE = "(?i)^(utm_[a-z0-9_]+|fbclid|gclid)="


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL, as one codegen
    expression chain. Idempotent: canonicalize(canonicalize(u)) ==
    canonicalize(u) (property-tested). NULL in, NULL out."""
    # NO module-level Column constants: constructing a Column calls
    # into the JVM, and this module is imported inside Python UDF
    # WORKERS (via the functions package __init__) where no gateway
    # exists — a module-level F.lit would crash every pandas-UDF stage
    # in the engine
    _BIG = F.lit(1 << 30)
    u = F.trim(url)
    # scheme = before the FIRST '://'; rest = after it (instr finds the
    # first occurrence, so an URL embedded in a parameter value cannot
    # hijack the split)
    sep = F.instr(u, "://")
    scheme = F.lower(u.substr(F.lit(1), sep - 1))
    rest = u.substr(sep + 3, _BIG)
    # authority ends at the FIRST of / ? # (RFC 3986)
    hostport = F.regexp_extract(rest, r"^([^/?#]*)", 1)
    tail = rest.substr(F.length(hostport) + 1, _BIG)
    # host: lowercase, strip leading www., strip the scheme's OWN
    # default port only (https://a.com:80 is a REAL non-default origin)
    host = F.regexp_replace(F.lower(hostport), r"^www\.", "")
    default_port = F.when(scheme == "http", F.lit(":80")).when(
        scheme == "https", F.lit(":443")
    )
    host = F.when(
        default_port.isNotNull() & host.endswith(default_port),
        host.substr(F.lit(1), F.length(host) - F.length(default_port)),
    ).otherwise(host)
    # fragment starts at the FIRST '#'; query at the FIRST '?'
    tail = F.substring_index(tail, "#", 1)
    qpos = F.instr(tail, "?")
    path = F.when(qpos > 0, tail.substr(F.lit(1), qpos - 1)).otherwise(tail)
    query = F.when(qpos > 0, tail.substr(qpos + 1, _BIG)).otherwise(F.lit(""))
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
    as exact text dedup and phash_exact_groups. Documents whose URL is
    NULL form singleton groups (a missing URL says nothing about
    identity — grouping all NULLs together would delete unrelated
    documents). Returns
    ``(id, canonical_url, canonical_id, group_size, is_dup)``.
    """
    from pyspark.sql.window import Window

    canon = docs.select(
        F.col(id_col),
        canonicalize_url(F.col(url_col)).alias("canonical_url"),
    )
    # NULL canonical urls get a per-row sentinel partition key so the
    # window can't fold them into one "NULL page"
    part = F.coalesce(
        F.col("canonical_url"),
        F.concat(F.lit("\x00null:"), F.col(id_col).cast("string")),
    )
    w = Window.partitionBy(part)
    return canon.select(
        id_col,
        "canonical_url",
        F.min(id_col).over(w).alias("canonical_id"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("group_size"),
        (F.col(id_col) != F.min(id_col).over(w)).alias("is_dup"),
    )
