"""Extractor unit tests (FIXTURES.md §3 spec; golden cases)."""

import pyarrow as pa

from pagerank_ray.functions.extract import extract_batch, extract_page
from pagerank_ray.functions.urls import normalize_url

PAGE = "https://sitea.example/dir/page.html"


def test_text_strips_tags_and_collapses_whitespace():
    html = b"<html><body><p>Hello   <b>world</b></p>\n\n<div>again</div></body></html>"
    text, _ = extract_page(PAGE, html)
    assert text == "Hello world again"


def test_script_and_style_subtrees_dropped():
    html = b"<body>keep<script>var x=1;</script><style>.a{}</style> this</body>"
    text, _ = extract_page(PAGE, html)
    assert text == "keep this"


def test_entities_unescaped():
    html = b"<p>a &amp; b &lt;c&gt;</p>"
    text, _ = extract_page(PAGE, html)
    assert text == "a & b <c>"


def test_outlinks_document_order_no_dedup():
    html = (
        b'<a href="https://x.example/1">one</a>'
        b'<a href="https://x.example/2">two</a>'
        b'<a href="https://x.example/1">one again</a>'
    )
    _, outs = extract_page(PAGE, html)
    assert outs == ["https://x.example/1", "https://x.example/2", "https://x.example/1"]


def test_relative_urls_resolved_against_page_url():
    html = b'<a href="/abs">a</a><a href="rel.html">r</a><a href="../up">u</a>'
    _, outs = extract_page(PAGE, html)
    assert outs == [
        "https://sitea.example/abs",
        "https://sitea.example/dir/rel.html",
        "https://sitea.example/up",
    ]


def test_fragment_stripped_and_non_http_dropped():
    html = (
        b'<a href="https://x.example/p#frag">f</a>'
        b'<a href="mailto:a@b.c">m</a>'
        b'<a href="javascript:void(0)">j</a>'
        b'<a href="ftp://x/y">ftp</a>'
    )
    _, outs = extract_page(PAGE, html)
    assert outs == ["https://x.example/p"]


def test_bad_utf8_replaced_not_raised():
    text, _ = extract_page(PAGE, b"<p>ok \xff\xfe</p>")
    assert text.startswith("ok ")


def test_deterministic_across_runs():
    html = b'<body><p>x</p><a href="/y">y</a></body>'
    assert extract_page(PAGE, html) == extract_page(PAGE, html)


def test_extract_batch_schema():
    batch = pa.table(
        {
            "url": [PAGE],
            "html": [b'<a href="/z">z</a>text'],
        }
    )
    out = extract_batch(batch)
    assert out.column_names == ["url", "text", "out_urls"]
    assert out.column("out_urls")[0].as_py() == ["https://sitea.example/z"]
    assert out.column("text")[0].as_py() == "ztext"


def test_normalize_url():
    assert normalize_url("HTTPS://SiteA.Example/Path?Q=1#frag") == "https://sitea.example/Path?Q=1"
    assert normalize_url("http://Host:8080/p") == "http://host:8080/p"


def test_fast_scanner_matches_htmlparser_reference():
    """The compiled-regex fast path must be byte-identical to the html.parser
    reference on synthetic pages AND fall back (not diverge) on constructs
    outside its subset — differential test over both."""
    from urllib.parse import urldefrag, urljoin

    import pagerank_ray.functions.extract as ex
    from pagerank_ray.sources.pages import generate_row

    def reference(url, html_bytes):
        raw = html_bytes.decode("utf-8", errors="replace")
        p = ex._Extractor(url)
        p.feed(raw)
        p.close()
        text = ex._WS.sub(" ", "".join(p.parts)).strip()
        outs = []
        for h in p.hrefs:
            try:
                a = urljoin(url, h)
            except ValueError:
                continue
            if not (a.startswith("http://") or a.startswith("https://")):
                continue
            outs.append(urldefrag(a)[0])
        return text, outs

    for i in range(0, 1500, 3):
        r = generate_row(i, 5000, 23, seed=91)
        assert ex.extract_page(r["url"], r["html"]) == reference(r["url"], r["html"])

    adversarial = [
        ("https://h.ex/a/b", b"<html><!-- c > --><a href='x'>t</a>&amp; <3 </html>"),
        ("https://h.ex/a/b", b"<script>if(a<b){'</div>'}</script><a href=/p>t</a>"),
        ("https://h.ex/a/b", b"<script></ script></script><a href='q'>t</a>"),
        ("https://h.ex/a/b", b"<a href='../u'>r</a><a href='//p.ex/x'>pp</a><a href='?q'>q</a>"),
        ("https://h.ex/a/b", b"<A HREF='HTTP://X.EX/'>c</A><a href='' >e</a><a>none</a>"),
        ("http://h.ex/a", b"<a href='https://c.ex/p?'>cross</a><style>.x{}</style>done"),
        ("notaurl", b"\xff<p>bad base</p><a href='https://ok.ex/y'>y</a>"),
    ]
    for url, html in adversarial:
        assert ex.extract_page(url, html) == reference(url, html)
