"""Deterministic pure-Python HTML extraction (the pinned parser spec).

Reproduces the reference's lxml/BeautifulSoup title-body extraction
semantics (north_star; SURVEY.md §2 O12/O13/O14) with ONLY the stdlib
``html.parser`` (lxml/bs4 are absent in the sandbox — SURVEY.md §7.0):

- title: first ``<title>`` text, entities unescaped, whitespace collapsed
- text:  ``'\\n\\n'``-joined per-``<p>`` text (document order, empties dropped)
- links: raw ``<a href>`` values in document order
- lang:  ``<html lang>`` attr, lowercased, first 2 chars

This function is THE spec: the fixture generator stores its output as the
golden ``text`` column, the Spark pandas UDF applies it per Arrow batch,
and the oracle crawler calls it directly — which is what makes the
"byte-identical extracted text per url" invariant (BASELINE.json
input_hint) testable end-to-end. Pure function of ``html_bytes``: no
state, no randomness, no environment reads.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from nlnieuwscrawler_spark.spec import EXTRACT_META_SCAN_BYTES

_WS_RE = re.compile(r"\s+")
_CHARSET_RE = re.compile(
    rb"""charset\s*=\s*["']?\s*([A-Za-z0-9_\-]+)""", re.IGNORECASE
)
_SUPPORTED = {
    "utf-8": "utf-8",
    "utf8": "utf-8",
    "iso-8859-1": "iso-8859-1",
    "latin-1": "iso-8859-1",
    "latin1": "iso-8859-1",
    "windows-1252": "cp1252",
    "cp1252": "cp1252",
    "ascii": "ascii",
    "us-ascii": "ascii",
}


def detect_encoding(html_bytes: bytes) -> str:
    if html_bytes.startswith(b"\xef\xbb\xbf"):
        return "utf-8"
    m = _CHARSET_RE.search(html_bytes[:EXTRACT_META_SCAN_BYTES])
    if m:
        return _SUPPORTED.get(m.group(1).decode("ascii", "replace").lower(), "utf-8")
    return "utf-8"


class _Extractor(HTMLParser):
    """Single-pass extractor; tolerant of unclosed/malformed tags."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.title_parts: list[str] = []
        self.title_done = False
        self.in_title = False
        self.paragraphs: list[list[str]] = []
        self.p_depth = 0
        self.links: list[str] = []
        self.lang: str | None = None
        self.saw_html = False

    def handle_starttag(self, tag, attrs):
        if tag == "html" and not self.saw_html:
            self.saw_html = True
            for k, v in attrs:
                if k == "lang" and v:
                    self.lang = v.lower()[:2]
        elif tag == "title" and not self.title_done:
            self.in_title = True
        elif tag == "p":
            # HTML spec: <p> cannot nest; an open <p> is implicitly closed
            self.p_depth = 1
            self.paragraphs.append([])
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v is not None:
                    self.links.append(v)
                    break

    def handle_endtag(self, tag):
        if tag == "title":
            self.in_title = False
            self.title_done = True
        elif tag == "p":
            self.p_depth = 0

    def handle_data(self, data):
        if self.in_title:
            self.title_parts.append(data)
        elif self.p_depth > 0:
            self.paragraphs[-1].append(data)


def _collapse(s: str) -> str:
    return _WS_RE.sub(" ", s).strip()


def extract_html(html_bytes: bytes) -> tuple[str, str, list[str], str | None]:
    """(title, text, links, lang) per the pinned spec. Never raises."""
    if html_bytes is None:
        return "", "", [], None
    if isinstance(html_bytes, memoryview):
        html_bytes = bytes(html_bytes)
    enc = detect_encoding(html_bytes)
    raw = html_bytes.decode(enc, errors="replace")
    if raw.startswith("﻿"):
        raw = raw[1:]
    parser = _Extractor()
    try:
        parser.feed(raw)
        parser.close()
    except Exception:
        pass  # keep whatever was extracted before the failure (deterministic)
    title = _collapse("".join(parser.title_parts))
    paras = [_collapse("".join(p)) for p in parser.paragraphs]
    text = "\n\n".join(p for p in paras if p)
    # HTMLParser already entity-unescapes attribute values — use links as-is
    return title, text, list(parser.links), parser.lang
