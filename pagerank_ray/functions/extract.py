"""Deterministic HTML → (text, outlinks) extractor.

This is the "reference extractor" of the byte-identical-per-url invariant
(BASELINE.json input_hint; spec pinned in FIXTURES.md §3). Pure
stdlib (html.parser + urllib), order-preserving, no network:

1. ``html.decode("utf-8", errors="replace")``.
2. Outlinks: every ``href`` attribute of ``<a>`` tags in document order;
   ``urljoin(page_url, href)``; keep only http(s) schemes; strip the
   fragment; NO dedup here (dedup happens at the edge table, SURVEY.md §2.7).
3. Text: drop ``<script>``/``<style>`` subtrees, strip all tags, unescape
   character references (done inline by html.parser's convert_charrefs),
   collapse whitespace runs to single spaces, strip ends.

The synthetic page generator stores this function's output in the ``text``
column, so tests can assert byte-identical extraction per url across runs.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from urllib.parse import urldefrag, urljoin

import pyarrow as pa

_WS = re.compile(r"\s+")
_SKIP_SUBTREES = frozenset({"script", "style"})


class _Extractor(HTMLParser):
    def __init__(self, page_url: str):
        super().__init__(convert_charrefs=True)
        self.page_url = page_url
        self.parts: list[str] = []
        self.hrefs: list[str] = []
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if tag in _SKIP_SUBTREES:
            self._skip_depth += 1
        elif tag == "a":
            for name, value in attrs:
                if name == "href" and value is not None:
                    self.hrefs.append(value)

    def handle_endtag(self, tag):
        if tag in _SKIP_SUBTREES and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data):
        if self._skip_depth == 0:
            self.parts.append(data)


def extract_page(url: str, html_bytes: bytes) -> tuple[str, list[str]]:
    """Extract (text, out_urls) from one page. Deterministic, stdlib-only."""
    raw = html_bytes.decode("utf-8", errors="replace")
    parser = _Extractor(url)
    parser.feed(raw)
    parser.close()
    text = _WS.sub(" ", "".join(parser.parts)).strip()
    out_urls: list[str] = []
    for href in parser.hrefs:
        try:
            absolute = urljoin(url, href)
        except ValueError:
            continue
        if not (absolute.startswith("http://") or absolute.startswith("https://")):
            continue
        out_urls.append(urldefrag(absolute)[0])
    return text, out_urls


def extract_batch(batch: pa.Table) -> pa.Table:
    """``map_batches`` body: pages batch → EXTRACTED batch.

    Stateless task stage (SURVEY.md §3.4 Phase 1). The per-row Python parse is
    unavoidable (stdlib HTML parsing is not vectorizable); the heavy ``html``
    binary column is dropped from the output so it never travels further.
    """
    urls = batch.column("url").to_pylist()
    htmls = batch.column("html").to_pylist()
    texts: list[str] = []
    outs: list[list[str]] = []
    for url, html_bytes in zip(urls, htmls):
        text, out_urls = extract_page(url, html_bytes)
        texts.append(text)
        outs.append(out_urls)
    return pa.table(
        {
            "url": batch.column("url"),
            "text": pa.array(texts, type=pa.string()),
            "out_urls": pa.array(outs, type=pa.list_(pa.string())),
        }
    )
