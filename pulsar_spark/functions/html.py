"""HTML -> text extraction — the boilerplate-stripping stage between
raw crawl HTML and the ``documents.text`` column.

Real parser, not regex: the stdlib ``html.parser.HTMLParser`` (an
actual HTML5-ish tokenizer) drives a small extraction state machine —
``<script>``/``<style>``/``<template>``/``<noscript>`` subtrees and
comments are dropped wholly, character/entity references decode
(``&amp;`` -> ``&``; the stdlib parser does this with the full HTML5
named-entity table, convert_charrefs=True), block-level elements
introduce line breaks so "<p>a</p><p>b</p>" does not fuse into "ab",
and whitespace collapses the way a text renderer would (runs of
space/tab/newline inside a line -> one space; blank lines between
blocks preserved as a single newline).

Spark shape: the extractor is pure Python per document and runs inside
the SAME Arrow pass as WARC parsing + charset decode
(sources/warc.py warc_to_documents) — crawl bytes in, text rows out,
nothing else ever shuffles.
"""

from __future__ import annotations

from html.parser import HTMLParser

__all__ = ["html_to_text", "extract_title"]

#: subtrees a text renderer never shows
_SKIP = {"script", "style", "template", "noscript", "iframe", "svg"}

#: elements that imply a line break around their content
_BLOCK = {
    "p", "div", "br", "li", "ul", "ol", "table", "tr", "td", "th",
    "h1", "h2", "h3", "h4", "h5", "h6", "blockquote", "pre", "section",
    "article", "header", "footer", "nav", "aside", "main", "figure",
    "figcaption", "hr", "form", "fieldset", "dl", "dt", "dd",
}


class _Extractor(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        self.skip_depth = 0
        self.title_parts: list[str] = []
        self.in_title = False

    #: block-boundary sentinel: source-text newlines are ordinary
    #: whitespace (they collapse to spaces, as a renderer would), so
    #: parser-inserted breaks need a character that cannot occur in
    #: parsed character data
    BREAK = "\x00"

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP:
            self.skip_depth += 1
        elif tag in _BLOCK or tag == "title":
            self.parts.append(self.BREAK)
        if tag == "title":
            self.in_title = True

    def handle_endtag(self, tag):
        if tag in _SKIP and self.skip_depth:
            self.skip_depth -= 1
        elif tag in _BLOCK or tag == "title":
            self.parts.append(self.BREAK)
        if tag == "title":
            self.in_title = False

    def handle_startendtag(self, tag, attrs):
        if tag in _BLOCK:
            self.parts.append(self.BREAK)

    def handle_data(self, data):
        if self.skip_depth:
            return
        data = data.replace(self.BREAK, "")  # a source NUL is not a break
        if self.in_title:
            # the title is document text (extractors keep it as the
            # leading line) AND separately addressable via
            # extract_title
            self.title_parts.append(data)
        self.parts.append(data)


def _collapse(parts: list[str]) -> str:
    """Whitespace normalization: within a block, runs of whitespace
    (including source newlines) collapse to one space; block
    boundaries become single newlines; empty blocks vanish."""
    text = "".join(parts)
    lines = []
    for segment in text.split(_Extractor.BREAK):
        line = " ".join(segment.split())
        if line:
            lines.append(line)
    return "\n".join(lines)


def html_to_text(html: str) -> str:
    """Rendered-ish text of an HTML document (see module docstring).
    Total: any string input produces a string output — the stdlib
    parser recovers from malformed markup the way browsers do, so a
    100 TB crawl's tag soup is data, not an exception."""
    ex = _Extractor()
    try:
        ex.feed(html or "")
        ex.close()
    except Exception:
        # pathological soup: keep whatever was extracted before the
        # parser gave up — same bad-bytes-are-data contract as
        # decode_media
        pass
    return _collapse(ex.parts)


def extract_title(html: str) -> str:
    """The <title> text of an HTML document ('' when absent)."""
    ex = _Extractor()
    try:
        ex.feed(html or "")
        ex.close()
    except Exception:
        pass
    return " ".join("".join(ex.title_parts).split())
