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


# ---------------------------------------------------------------------------
# fast scanner path
#
# html.parser's goahead loop is pure Python (~1.8 ms/page on the synthetic
# crawl) and dominates BOTH the build's extraction phase and the synthetic
# generator. The scanner below does one compiled-regex pass and produces
# byte-identical (text, hrefs) on the unambiguous-HTML subset; any construct
# whose html.parser treatment the scanner does not replicate exactly
# (comments, declarations, processing instructions, unmatchable '<'-tags)
# falls back to the html.parser reference path for THAT page. Equivalence is
# differential-tested in tests/test_extract.py over thousands of pages.
# ---------------------------------------------------------------------------

_TAG = re.compile(
    r"""<(?P<close>/?)(?P<name>[a-zA-Z][a-zA-Z0-9.\-_:]*)"""
    r"""(?P<attrs>(?:\s+[^\s/>=]+(?:\s*=\s*(?:"[^"]*"|'[^']*'|[^\s>]*))?)*)"""
    r"""\s*(?P<selfclose>/?)>"""
)
_ATTR = re.compile(
    r"""\s+(?P<name>[^\s/>=]+)(?:\s*=\s*(?P<value>"[^"]*"|'[^']*'|[^\s>]*))?"""
)
# html.parser's CDATA close is tolerant (`</ script >`, `</script foo>` all
# close the element); the scanner only handles the strict form and falls back
# whenever a tolerant-only candidate appears first.
_SCRIPT_ANY = {
    "script": re.compile(r"</\s*script", re.IGNORECASE),
    "style": re.compile(r"</\s*style", re.IGNORECASE),
}
_SCRIPT_END = {
    "script": re.compile(r"</script\s*>", re.IGNORECASE),
    "style": re.compile(r"</style\s*>", re.IGNORECASE),
}


def _fast_scan(raw: str) -> tuple[list[str], list[str]] | None:
    """One-pass scanner: returns (text_parts, hrefs) or None when the page
    contains anything outside the proven-equivalent subset."""
    from html import unescape

    parts: list[str] = []
    hrefs: list[str] = []
    pos = 0
    n = len(raw)
    while True:
        lt = raw.find("<", pos)
        if lt < 0:
            if pos < n:
                parts.append(unescape(raw[pos:]))
            break
        if lt > pos:
            parts.append(unescape(raw[pos:lt]))
        nxt = raw[lt + 1 : lt + 2]
        if nxt in ("!", "?"):
            return None  # comments / declarations / PIs: html.parser territory
        m = _TAG.match(raw, lt)
        if not m:
            # html.parser emits a lone '<' as data when no tag can start here;
            # replicating its full recovery rules is not worth it — fall back
            return None
        name = m.group("name").lower()
        is_close = m.group("close") == "/"
        is_selfclose = m.group("selfclose") == "/"
        pos = m.end()
        if is_close:
            continue  # end tags of non-skip subtrees carry no state here
        if name == "a":
            for am in _ATTR.finditer(m.group("attrs")):
                if am.group("name").lower() == "href":
                    v = am.group("value")
                    if v is None:
                        continue
                    if v[:1] in ("'", '"'):
                        v = v[1:-1]
                    hrefs.append(unescape(v))
        elif name in _SKIP_SUBTREES and not is_selfclose:
            # html.parser enters CDATA mode: everything until the matching
            # close tag is raw data (skipped by the reference extractor)
            any_m = _SCRIPT_ANY[name].search(raw, pos)
            if any_m is None:
                break  # unterminated: rest of document is (skipped) data
            em = _SCRIPT_END[name].match(raw, any_m.start())
            if em is None:
                return None  # tolerant-only close form: html.parser territory
            pos = em.end()
    return parts, hrefs


# href → out_url resolution is the other hot loop (urljoin+urldefrag are
# ~8 µs each and a crawl page has ~100 hrefs). Results are memoized with the
# NARROWEST key that still determines the answer exactly:
#   * scheme'd hrefs "http(s)://<nonslash>…": urljoin depends on the base only
#     through scheme equality → key (base_scheme, href)
#   * path-absolute hrefs "/…": result is scheme://netloc + resolved path →
#     key (base scheme+netloc, href)
#   * anything else (relative paths, "//…", odd schemes): full (base, href)
# Absolute hrefs repeat heavily ACROSS pages and path-absolute ones across a
# host's pages, so the shared cache converts the per-href cost into a dict hit.
_ABS_HREF = re.compile(r"https?://[^/]")


def _resolve_cached(cache: dict, key, base: str, href: str) -> str | None:
    hit = cache.get(key, False)
    if hit is not False:
        return hit
    try:
        absolute = urljoin(base, href)
    except ValueError:
        cache[key] = None
        return None
    if not (absolute.startswith("http://") or absolute.startswith("https://")):
        cache[key] = None
        return None
    out = urldefrag(absolute)[0]
    cache[key] = out
    return out


_HREF_CACHE: dict = {}
_HREF_CACHE_MAX = 1 << 18


def _resolve_hrefs(url: str, raw_hrefs: list[str]) -> list[str]:
    cache = _HREF_CACHE
    if len(cache) > _HREF_CACHE_MAX:
        cache.clear()
    scheme_end = url.find("://")
    bscheme = url[:scheme_end] if scheme_end > 0 else ""
    path_start = url.find("/", scheme_end + 3) if scheme_end > 0 else -1
    bhost = url[:path_start] if path_start > 0 else url
    out_urls: list[str] = []
    for href in raw_hrefs:
        if _ABS_HREF.match(href):
            key = (0, bscheme, href)
        elif href.startswith("/") and not href.startswith("//") and scheme_end > 0:
            key = (1, bhost, href)
        else:
            key = (2, url, href)
        resolved = _resolve_cached(cache, key, url, href)
        if resolved is not None:
            out_urls.append(resolved)
    return out_urls


def extract_page(url: str, html_bytes: bytes) -> tuple[str, list[str]]:
    """Extract (text, out_urls) from one page. Deterministic, stdlib-only."""
    raw = html_bytes.decode("utf-8", errors="replace")
    scanned = _fast_scan(raw)
    if scanned is not None:
        parts, raw_hrefs = scanned
    else:  # reference path: html.parser semantics are the spec
        parser = _Extractor(url)
        parser.feed(raw)
        parser.close()
        parts, raw_hrefs = parser.parts, parser.hrefs
    text = _WS.sub(" ", "".join(parts)).strip()
    return text, _resolve_hrefs(url, raw_hrefs)


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
