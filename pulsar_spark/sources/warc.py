"""WARC crawl ingestion — the raw-crawl-to-documents stage of a
training-data pipeline.

WARC (ISO 28500, public; the Common Crawl container) is a sequence of
records: a header block (``WARC/1.0\\r\\n`` + ``Name: value`` lines +
blank line), a Content-Length-sized content block, and a two-CRLF
separator. Crawl archives store one GZIP MEMBER PER RECORD
(multistream .warc.gz) so readers can split without decompressing the
whole file — both the plain and the multistream-gzip forms parse here
via stdlib zlib.

``response`` records carry an HTTP/1.x response as content; the HTTP
status line, headers, and body split off here too (no external HTTP
library — the format is a dozen lines of framing).

Spark shape (100 TB): ``read_warc`` uses the ``binaryFile`` source —
one task per WARC file (crawl archives are ~1 GiB each, the natural
split unit since gzip members are not seekable without an index), and
record parsing + HTTP splitting run FUSED in one Arrow pass; payloads
never shuffle. ``warc_to_documents`` continues the fusion: charset
decode + HTML text extraction happen in the same pass, so the only
thing that ever leaves the executor is the extracted text row, not the
raw crawl bytes.

Fixture tier: ``encode_warc`` mints genuine (multistream-gzip) WARC
bytes so the oracle query can round-trip documents.text through
WARC -> gzip -> HTTP -> HTML -> extraction and value-hash-match the
original table.
"""

from __future__ import annotations

import gzip
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "encode_warc",
    "parse_warc",
    "iter_warc_records",
    "split_http_response",
    "read_warc",
    "warc_to_documents",
    "wet_to_documents",
]


def _fetch_date():
    """``warc_date`` header -> ``fetch_date`` timestamp. WARC 1.0 dates
    are second-granularity ``yyyy-MM-ddTHH:mm:ssZ``, but WARC 1.1 /
    real Common Crawl records frequently carry fractional seconds
    (``2024-02-01T00:00:00.123Z``) — coalesce over the fraction-trimmed
    form so those parse instead of turning into silent NULLs.
    try_to_timestamp keeps one malformed header from failing the whole
    scan under the driver's ANSI session."""
    from pyspark.sql import functions as F

    pat = F.lit("yyyy-MM-dd'T'HH:mm:ssX")
    return F.coalesce(
        F.try_to_timestamp(F.col("warc_date"), pat),
        F.try_to_timestamp(
            F.regexp_replace("warc_date", r"\.\d+", ""), pat
        ),
    )


def encode_warc(records, gzip_members: bool = True) -> bytes:
    """Record dicts -> WARC bytes (one gzip member per record when
    ``gzip_members``, like Common Crawl). Each record needs
    ``warc_type``; optional ``target_uri``, ``date``, ``record_id``,
    ``content_type``, ``payload`` (bytes)."""
    out = bytearray()
    for i, r in enumerate(records):
        payload = bytes(r.get("payload", b""))
        head = [
            "WARC/1.0",
            f"WARC-Type: {r['warc_type']}",
            f"WARC-Record-ID: <{r.get('record_id', f'urn:uuid:rec-{i}')}>",
            f"WARC-Date: {r.get('date', '2024-01-01T00:00:00Z')}",
            f"Content-Length: {len(payload)}",
        ]
        if r.get("target_uri"):
            head.append(f"WARC-Target-URI: {r['target_uri']}")
        if r.get("content_type"):
            head.append(f"Content-Type: {r['content_type']}")
        rec = ("\r\n".join(head) + "\r\n\r\n").encode() + payload + b"\r\n\r\n"
        out += gzip.compress(rec) if gzip_members else rec
    return bytes(out)


def _iter_plaintext(buf: bytes):
    """Multistream gzip -> plaintext CHUNKS, decompressed incrementally
    (``zlib.decompressobj(wbits=31)``) so the full plaintext of a
    ~1 GiB crawl archive is never resident at once; plain input yields
    itself. Failure parity with ``gzip.decompress``: a truncated member
    raises EOFError, trailing non-gzip garbage raises BadGzipFile — a
    cut archive must FAIL, not silently lose its tail records."""
    buf = bytes(buf)
    if buf[:2] != b"\x1f\x8b":
        yield buf
        return
    view = memoryview(buf)
    chunk_sz = 1 << 20
    pos = 0
    while pos < len(view):
        if bytes(view[pos : pos + 2]) != b"\x1f\x8b":
            raise gzip.BadGzipFile("trailing garbage after gzip member")
        d = zlib.decompressobj(31)
        while not d.eof and pos < len(view):
            fed = bytes(view[pos : pos + chunk_sz])
            pos += len(fed)
            out = d.decompress(fed)
            if out:
                yield out
        if not d.eof:
            raise EOFError("truncated gzip member")
        tail = d.flush()
        if tail:
            yield tail
        pos -= len(d.unused_data)  # rewind to the next member boundary


def parse_warc(payload: bytes) -> list[dict]:
    """WARC bytes (plain or multistream gzip) -> record dicts
    ``{"warc_type", "record_id", "target_uri", "date", "content_type",
    "payload"}``. Total over arbitrary bytes: malformed input raises
    ValueError. Materializes every record — scan paths should consume
    ``iter_warc_records`` instead."""
    return list(iter_warc_records(payload))


def iter_warc_records(payload: bytes):
    """Streaming WARC record iterator: gzip members decompress
    incrementally and the parse window holds at most one record's
    header + payload at a time, so per-task peak memory is
    O(largest record), not O(archive) (the shape a ~1 GiB
    one-task-per-archive crawl read needs). Total over arbitrary
    bytes: malformed input raises ValueError mid-iteration."""
    try:
        yield from _iter_warc_records(payload)
    except (
        IndexError,
        UnicodeDecodeError,
        zlib.error,
        EOFError,
        gzip.BadGzipFile,
    ) as exc:
        raise ValueError(f"truncated or corrupt WARC: {exc}") from exc


def _iter_warc_records(payload: bytes):
    chunks = _iter_plaintext(payload)
    window = bytearray()
    done = False

    def pull() -> bool:
        nonlocal done
        if done:
            return False
        try:
            window.extend(next(chunks))
            return True
        except StopIteration:
            done = True
            return False

    while True:
        # tolerate inter-record padding
        i = 0
        while True:
            while i < len(window) and window[i] in (0x0D, 0x0A):
                i += 1
            if i < len(window) or not pull():
                break
        del window[:i]
        if not window:
            return
        while len(window) < 5 and pull():
            pass
        if not bytes(window[:5]) == b"WARC/":
            raise ValueError("expected WARC/ version line")
        while True:
            head_end = window.find(b"\r\n\r\n")
            if head_end >= 0:
                break
            if not pull():
                raise ValueError("unterminated WARC header block")
        headers: dict[str, str] = {}
        lines = bytes(window[:head_end]).decode("utf-8", "replace").split("\r\n")
        for line in lines[1:]:
            k, _, v = line.partition(":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC record missing a valid Content-Length")
        body_start = head_end + 4
        while len(window) < body_start + length:
            if not pull():
                raise ValueError("WARC content block runs past the payload")
        yield {
            "warc_type": headers.get("warc-type", ""),
            "record_id": headers.get("warc-record-id", "").strip("<>"),
            "target_uri": headers.get("warc-target-uri"),
            "date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "payload": bytes(window[body_start : body_start + length]),
        }
        del window[: body_start + length]


def split_http_response(payload: bytes):
    """HTTP/1.x response bytes -> (status int, headers dict lowercased,
    body bytes). The framing the WARC ``response`` record carries."""
    sep = payload.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("HTTP response missing header terminator")
    head = payload[:sep].decode("iso-8859-1")
    lines = head.split("\r\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/"):
        raise ValueError(f"not an HTTP status line: {lines[0]!r}")
    status = int(parts[1])
    headers: dict[str, str] = {}
    for line in lines[1:]:
        k, _, v = line.partition(":")
        headers[k.strip().lower()] = v.strip()
    return status, headers, payload[sep + 4 :]


def _valid_codec(cs: str) -> str | None:
    """Codec name if Python knows it, else None — validated by LOOKUP
    only: probing with a sample decode would reject valid multibyte
    codecs like utf-16 whose units span several bytes."""
    import codecs

    try:
        codecs.lookup(cs)
        return cs
    except LookupError:
        return None


def _http_charset(content_type: str | None, body: bytes = b"") -> str:
    """Document charset: the Content-Type header's charset token
    (values are case-insensitive per RFC 9110) or, when the header
    omits it, the WHATWG fallback — sniff ``charset=`` out of a
    ``<meta>`` tag in the first 1024 bytes (the prefix the standard
    says must contain the declaration). utf-8 otherwise."""
    ct = (content_type or "").lower()
    if "charset=" in ct:
        cs = ct.split("charset=", 1)[1].split(";")[0].strip().strip('"')
        got = _valid_codec(cs)
        if got:
            return got
    if body:
        import re

        m = re.search(
            rb"""<meta[^>]{0,200}charset\s*=\s*["']?([a-zA-Z0-9_\-]{2,20})""",
            body[:1024],
            re.IGNORECASE,
        )
        if m:
            got = _valid_codec(m.group(1).decode("ascii", "replace").lower())
            if got:
                return got
    return "utf-8"


_RECORD_SCHEMA = (
    "warc_file string, record_id string, warc_type string, "
    "target_uri string, warc_date string, content_type string, "
    "http_status int, http_content_type string, body binary"
)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files -> one row per record, HTTP responses pre-split.

    ``binaryFile`` source (one task per archive — the gzip members of
    a .warc.gz are not independently seekable, so whole-file is the
    correct split; crawl pipelines size archives ~1 GiB for exactly
    this reason) + fused Arrow parse. Non-response records carry their
    raw content in ``body`` with null http columns; malformed records
    in a file raise (a crawl file that does not parse is an input
    error, not data)."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                for rec in iter_warc_records(bytes(content)):
                    status = h_ct = None
                    body = rec["payload"]
                    if rec["warc_type"] == "response":
                        try:
                            status, hh, body = split_http_response(body)
                            h_ct = hh.get("content-type")
                        except ValueError:
                            pass  # unframable response: raw content row
                    rows.append(
                        (path_, rec["record_id"], rec["warc_type"],
                         rec["target_uri"], rec["date"], rec["content_type"],
                         status, h_ct, body)
                    )
            yield pd.DataFrame(
                rows,
                columns=["warc_file", "record_id", "warc_type", "target_uri",
                         "warc_date", "content_type", "http_status",
                         "http_content_type", "body"],
            )

    files = spark.read.format("binaryFile").load(path).select("path", "content")
    return files.mapInPandas(run, _RECORD_SCHEMA)


def warc_to_documents(
    spark: SparkSession,
    path: str,
    min_chars: int = 1,
) -> DataFrame:
    """The crawl-ingestion capstone: WARC archives -> the engine's
    ``documents`` shape ``(doc_id, url, source, text, n_chars,
    fetch_date)``.

    Keeps HTTP 200 HTML responses, decodes the charset the server
    declared (utf-8 fallback), extracts text with the real HTML parser
    (functions/html.py: script/style/comment removal, entity decode,
    block-level whitespace), and keys ``doc_id`` as the xxhash64 of the
    record id — deterministic across re-reads. One fused Arrow pass
    from crawl bytes to text rows; the raw bytes never shuffle."""
    from pyspark.sql import functions as F

    from pulsar_spark.functions.html import html_to_text

    recs = read_warc(spark, path).where(
        (F.col("warc_type") == "response")
        & (F.col("http_status") == 200)
        # media types are case-insensitive (RFC 9110): real hosts
        # serve 'Text/HTML'
        & F.lower("http_content_type").startswith("text/html")
    )

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            texts = []
            for body, ct in zip(pdf["body"], pdf["http_content_type"]):
                body = bytes(body)
                cs = _http_charset(ct, body)
                texts.append(html_to_text(body.decode(cs, "replace")))
            pdf = pdf[["record_id", "target_uri", "warc_date"]].copy()
            pdf["text"] = texts
            yield pdf

    out = recs.mapInPandas(
        extract,
        "record_id string, target_uri string, warc_date string, text string",
    )
    host = F.parse_url("target_uri", F.lit("HOST"))
    return (
        out.select(
            F.xxhash64("record_id").alias("doc_id"),
            F.col("target_uri").alias("url"),
            F.coalesce(host, F.lit("unknown")).alias("source"),
            "text",
            F.length("text").alias("n_chars"),
            _fetch_date().alias("fetch_date"),
        )
        .where(F.col("n_chars") >= min_chars)
    )


def wet_to_documents(
    spark: SparkSession,
    path: str,
    min_chars: int = 1,
) -> DataFrame:
    """Common Crawl WET archives -> the ``documents`` shape.

    WET files are WARC containers whose ``conversion`` records carry
    ALREADY-extracted plain text (Content-Type text/plain, utf-8) — the
    sibling of ``warc_to_documents`` for pipelines that start from the
    crawl's pre-extracted tier instead of raw HTML. Same fused-Arrow /
    binaryFile shape; whitespace-normalizes the text the same way
    html_to_text would so both entry points feed dedup identically."""
    from pyspark.sql import functions as F

    recs = read_warc(spark, path).where(F.col("warc_type") == "conversion")

    def decode(batches: Iterator) -> Iterator:
        for pdf in batches:
            pdf = pdf[["record_id", "target_uri", "warc_date", "body"]].copy()
            pdf["text"] = [
                "\n".join(
                    " ".join(line.split())
                    for line in bytes(b).decode("utf-8", "replace").splitlines()
                    if line.strip()
                )
                for b in pdf["body"]
            ]
            yield pdf.drop(columns=["body"])

    out = recs.mapInPandas(
        decode,
        "record_id string, target_uri string, warc_date string, text string",
    )
    host = F.parse_url("target_uri", F.lit("HOST"))
    return (
        out.select(
            F.xxhash64("record_id").alias("doc_id"),
            F.col("target_uri").alias("url"),
            F.coalesce(host, F.lit("unknown")).alias("source"),
            "text",
            F.length("text").alias("n_chars"),
            _fetch_date().alias("fetch_date"),
        )
        .where(F.col("n_chars") >= min_chars)
    )
