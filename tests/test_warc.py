"""WARC crawl ingestion (sources/warc.py) + HTML text extraction
(functions/html.py): container roundtrips, HTTP splitting, charset
handling, extractor semantics, and the Spark end-to-end."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pulsar_spark.functions.html import extract_title, html_to_text
from pulsar_spark.sources.warc import (
    encode_warc,
    parse_warc,
    split_http_response,
)


class TestHtmlToText:
    def test_full_document(self):
        h = (
            "<html><head><title>T &amp; t</title><style>p{}</style>"
            '<script>var x = "<p>no</p>";</script></head>'
            "<body><p>Hello &amp; welcome</p><div>line <b>two</b></div>"
            "<!-- c --><ul><li>a</li><li>b</li></ul></body></html>"
        )
        assert html_to_text(h) == "T & t\nHello & welcome\nline two\na\nb"
        assert extract_title(h) == "T & t"

    def test_block_breaks_and_collapse(self):
        assert html_to_text("<p>a</p><p>b</p>") == "a\nb"
        assert html_to_text("x<br/>y") == "x\ny"
        assert html_to_text("a   b\n\t c") == "a b c"
        assert html_to_text("<span>a</span><span>b</span>") == "ab"

    def test_nested_skip_subtrees(self):
        h = "<div>keep<script>drop<style>more</style>drop</script>2</div>"
        assert html_to_text(h) == "keep2"

    def test_entities_and_charrefs(self):
        assert html_to_text("&lt;tag&gt; &#233; &eacute;") == "<tag> é é"

    def test_tag_soup_is_data(self):
        out = html_to_text("<p>broken <b attr=>soup</x></p> &nosuch; <")
        assert "broken" in out and "soup" in out
        assert html_to_text("") == ""
        assert html_to_text(None) == ""


class TestWarcContainer:
    RECS = [
        {"warc_type": "warcinfo", "payload": b"software: x"},
        {
            "warc_type": "response",
            "record_id": "urn:doc:1",
            "target_uri": "http://a.example.com/1",
            "date": "2024-01-02T03:04:05Z",
            "content_type": "application/http;msgtype=response",
            "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>hi</p>",
        },
        {"warc_type": "request", "payload": b"GET / HTTP/1.1\r\n\r\n"},
    ]

    @pytest.mark.parametrize("gz", [False, True])
    def test_roundtrip(self, gz):
        out = parse_warc(encode_warc(self.RECS, gzip_members=gz))
        assert [r["warc_type"] for r in out] == ["warcinfo", "response", "request"]
        assert out[1]["record_id"] == "urn:doc:1"
        assert out[1]["target_uri"] == "http://a.example.com/1"
        st_, hh, body = split_http_response(out[1]["payload"])
        assert (st_, body) == (200, b"<p>hi</p>")
        assert hh["content-type"] == "text/html"

    def test_multistream_members_split_correctly(self):
        # 50 single-record members: the member walk must consume
        # unused_data exactly, not resync by guesswork
        recs = [
            {"warc_type": "resource", "payload": bytes([i]) * (i + 1)}
            for i in range(50)
        ]
        out = parse_warc(encode_warc(recs, gzip_members=True))
        assert len(out) == 50
        assert all(out[i]["payload"] == bytes([i]) * (i + 1) for i in range(50))

    def test_malformed(self):
        with pytest.raises(ValueError):
            parse_warc(b"NOTWARC/1.0\r\n\r\n")
        good = encode_warc(self.RECS, gzip_members=False)
        with pytest.raises(ValueError):
            parse_warc(good[: len(good) // 2])  # content runs past payload
        with pytest.raises(ValueError):
            split_http_response(b"HTTP/1.1 200 OK\r\nno-terminator")
        with pytest.raises(ValueError):
            split_http_response(b"GOPHER nope\r\n\r\nx")

    @settings(max_examples=50, deadline=None)
    @given(pos=st.integers(0, 400), bit=st.integers(0, 7), cut=st.integers(0, 60))
    def test_mutation_totality(self, pos, bit, cut):
        payload = bytearray(encode_warc(self.RECS, gzip_members=True))
        payload[pos % len(payload)] ^= 1 << bit
        data = bytes(payload[: len(payload) - cut % len(payload)])
        try:
            parse_warc(data)
        except ValueError:
            pass  # the only acceptable failure mode


class TestSparkEndToEnd:
    def test_warc_to_documents(self, spark, tmp_path):
        from pulsar_spark.sources.warc import warc_to_documents

        html_utf8 = "<html><head><title>Té</title></head><body><p>hello world</p></body></html>"
        html_lat1 = "<html><body><p>café menu</p></body></html>"
        recs = [
            {"warc_type": "warcinfo", "payload": b"software: t"},
            {
                "warc_type": "response",
                "record_id": "urn:a",
                "target_uri": "http://one.example.com/a",
                "date": "2024-03-04T05:06:07Z",
                "content_type": "application/http;msgtype=response",
                "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
                + html_utf8.encode("utf-8"),
            },
            {
                "warc_type": "response",
                "record_id": "urn:b",
                "target_uri": "http://two.example.com/b",
                "content_type": "application/http;msgtype=response",
                "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=iso-8859-1\r\n\r\n"
                + html_lat1.encode("iso-8859-1"),
            },
            {  # 404: dropped
                "warc_type": "response",
                "target_uri": "http://gone.example.com/x",
                "payload": b"HTTP/1.1 404 Not Found\r\nContent-Type: text/html\r\n\r\ngone",
            },
            {  # non-HTML 200: dropped
                "warc_type": "response",
                "target_uri": "http://api.example.com/j",
                "payload": b'HTTP/1.1 200 OK\r\nContent-Type: application/json\r\n\r\n{"a": 1}',
            },
        ]
        (tmp_path / "f.warc.gz").write_bytes(encode_warc(recs))
        out = {
            r["url"]: r
            for r in warc_to_documents(spark, str(tmp_path / "*.warc.gz")).collect()
        }
        assert set(out) == {"http://one.example.com/a", "http://two.example.com/b"}
        a = out["http://one.example.com/a"]
        assert a["text"] == "Té\nhello world"
        assert a["source"] == "one.example.com"
        assert a["n_chars"] == len("Té\nhello world")
        assert a["fetch_date"] is not None
        b = out["http://two.example.com/b"]
        assert b["text"] == "café menu"  # latin-1 decoded correctly
        # the fixture encoder stamps the mandatory WARC-Date default
        assert str(b["fetch_date"]).startswith("2024-01-01")

    def test_read_warc_record_shape(self, spark, tmp_path):
        from pulsar_spark.sources.warc import read_warc

        (tmp_path / "g.warc.gz").write_bytes(
            encode_warc(TestWarcContainer.RECS)
        )
        rows = read_warc(spark, str(tmp_path / "*.warc.gz")).collect()
        by_type = {r["warc_type"]: r for r in rows}
        assert set(by_type) == {"warcinfo", "response", "request"}
        assert by_type["response"]["http_status"] == 200
        assert bytes(by_type["response"]["body"]) == b"<p>hi</p>"
        assert by_type["warcinfo"]["http_status"] is None
        assert bytes(by_type["warcinfo"]["body"]) == b"software: x"


class TestReviewFindingsWarc:
    def test_truncated_gzip_raises(self):
        gz = encode_warc(TestWarcContainer.RECS, gzip_members=True)
        for cut in (5, len(gz) // 2, len(gz) - 3):
            with pytest.raises(ValueError):
                parse_warc(gz[:cut])

    def test_utf16_charset_is_handled(self, spark, tmp_path):
        from pulsar_spark.sources.warc import warc_to_documents

        html = "<html><body><p>wide chars</p></body></html>"
        recs = [{
            "warc_type": "response",
            "record_id": "urn:u16",
            "target_uri": "http://wide.example.com/u",
            "content_type": "application/http;msgtype=response",
            "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-16\r\n\r\n"
            + html.encode("utf-16"),
        }]
        (tmp_path / "u.warc.gz").write_bytes(encode_warc(recs))
        rows = warc_to_documents(spark, str(tmp_path / "*.warc.gz")).collect()
        assert len(rows) == 1 and rows[0]["text"] == "wide chars"

    def test_content_type_case_insensitive(self, spark, tmp_path):
        from pulsar_spark.sources.warc import warc_to_documents

        recs = [{
            "warc_type": "response",
            "record_id": "urn:iis",
            "target_uri": "http://legacy.example.com/p",
            "content_type": "application/http;msgtype=response",
            "payload": b"HTTP/1.1 200 OK\r\nContent-Type: Text/HTML; Charset=UTF-8\r\n\r\n"
            b"<p>old server</p>",
        }]
        (tmp_path / "c.warc.gz").write_bytes(encode_warc(recs))
        rows = warc_to_documents(spark, str(tmp_path / "*.warc.gz")).collect()
        assert len(rows) == 1 and rows[0]["text"] == "old server"

    def test_escaped_body_roundtrips_specials(self):
        # the fixture escape path: '&'/'<' in source text must survive
        # the HTML wrap + extraction verbatim
        import html as html_mod

        text = "AT&T sells <widgets> & more"
        page = f"<html><body><p>{html_mod.escape(text)}</p></body></html>"
        assert html_to_text(page) == text


class TestWet:
    def test_wet_to_documents(self, spark, tmp_path):
        from pulsar_spark.sources.warc import wet_to_documents

        recs = [
            {"warc_type": "warcinfo", "payload": b"software: wet"},
            {
                "warc_type": "conversion",
                "record_id": "urn:wet:1",
                "target_uri": "http://a.example.com/p",
                "content_type": "text/plain",
                "payload": "line one\n\n  spaced   line  \n".encode(),
            },
            {  # raw response records are NOT conversion rows: ignored
                "warc_type": "response",
                "target_uri": "http://b.example.com/q",
                "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n<p>x</p>",
            },
        ]
        (tmp_path / "w.warc.wet.gz").write_bytes(encode_warc(recs))
        rows = wet_to_documents(spark, str(tmp_path / "*.wet.gz")).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["url"] == "http://a.example.com/p"
        assert r["text"] == "line one\nspaced line"
        assert r["source"] == "a.example.com"


class TestMetaCharsetSniff:
    def test_meta_charset_fallback(self, spark, tmp_path):
        # no charset in the HTTP header: the WHATWG 1024-byte meta
        # sniff must find <meta charset=iso-8859-1> and decode é
        from pulsar_spark.sources.warc import warc_to_documents

        html = ('<html><head><meta charset="iso-8859-1"></head>'
                "<body><p>café sniffé</p></body></html>").encode("iso-8859-1")
        recs = [{
            "warc_type": "response",
            "record_id": "urn:sniff",
            "target_uri": "http://m.example.com/s",
            "content_type": "application/http;msgtype=response",
            "payload": b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html,
        }]
        (tmp_path / "m.warc.gz").write_bytes(encode_warc(recs))
        rows = warc_to_documents(spark, str(tmp_path / "*.warc.gz")).collect()
        assert rows[0]["text"] == "café sniffé"

    def test_header_charset_wins_over_meta(self):
        from pulsar_spark.sources.warc import _http_charset

        body = b'<meta charset="iso-8859-1">'
        assert _http_charset("text/html; charset=utf-8", body) == "utf-8"
        assert _http_charset("text/html", body) == "iso-8859-1"
        assert _http_charset("text/html", b"<meta charset=nosuchcs>") == "utf-8"
        # sniff only looks at the first 1024 bytes, per the standard
        far = b" " * 1100 + b'<meta charset="iso-8859-1">'
        assert _http_charset("text/html", far) == "utf-8"
