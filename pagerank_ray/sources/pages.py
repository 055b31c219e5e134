"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md §1).

Generates the exact BASELINE.json ``input_hint`` schema:
``url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string``.

Every row is derived from ``(seed, row_index)`` only — the per-row RNG is
``np.random.default_rng([seed, i])`` — so output is bit-identical for a given
(seed, n_pages) regardless of batch sizes, block splits or parallelism.
No wall clock, no external data.

Link structure mirrors the reference's skew focus (degree bins,
``/root/reference/kernel_acsr.cu:419-451``):
- out-degree ~ Zipf(1.1) clipped to [0, 200]; ~8% dangling pages
  (the ``bookmark`` vertices, ``kernel_acsr.cu:403-406``);
- targets are power-law skewed toward low row indices → hub dst vertices;
- ~5% duplicate (src,dst) links and ~1% self-links (exercise edge dedup);
- ~3% of hrefs point at urls outside the crawl (dst-only vertices);
- same-host targets are sometimes emitted as relative hrefs.

The ``text`` column stores the output of the engine's own deterministic
extractor (FIXTURES.md §3) on the generated ``html``, which is what gives the
byte-identical-per-url invariant something to bite on.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pyarrow as pa

from pagerank_ray.functions.extract import extract_page

_EPOCH = _dt.datetime(2025, 1, 1, 0, 0, 0)

_WORDS = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor "
    "incididunt ut labore et dolore magna aliqua enim ad minim veniam quis nostrud "
    "exercitation ullamco laboris nisi aliquip ex ea commodo consequat duis aute irure "
    "in reprehenderit voluptate velit esse cillum eu fugiat nulla pariatur excepteur "
    "sint occaecat cupidatat non proident sunt culpa qui officia deserunt mollit anim "
    "id est laborum graph rank crawl link node edge web page data"
).split()

_LANGS = ("en", "de", "zh")
_LANG_P = (0.90, 0.06, 0.04)


def page_url(i: int, n_hosts: int) -> str:
    return f"https://site{i % n_hosts}.example/p/{i}"


def _pick_target(rng: np.random.Generator, n_pages: int, i: int) -> tuple[str, bool]:
    """Return (href, is_internal). Power-law preference for low row indices."""
    r = rng.random()
    if r < 0.03:  # external url, not in the crawl
        j = int(rng.integers(0, max(1, n_pages // 10)))
        return f"https://ext{j % 7}.example/x/{j}", False
    if r < 0.04:  # self link
        return str(i), True  # sentinel; caller substitutes i
    if rng.random() < 0.30:
        j = int(rng.integers(0, n_pages))
    else:
        j = int(n_pages * rng.random() ** 4.0)  # in-degree ∝ rank^(-3/4): hubs at low ids
        j = min(j, n_pages - 1)
    return str(j), True


def _paragraph(rng: np.random.Generator) -> str:
    n_words = int(rng.integers(8, 40))
    words = [_WORDS[int(k)] for k in rng.integers(0, len(_WORDS), n_words)]
    if rng.random() < 0.2:  # entity references exercise unescaping
        words.append("a &amp; b &lt;tag&gt;")
    return " ".join(words)


def generate_row(i: int, n_pages: int, n_hosts: int, seed: int) -> dict:
    rng = np.random.default_rng([seed, i])
    url = page_url(i, n_hosts)
    host = i % n_hosts

    if rng.random() < 0.08:
        out_deg = 0  # dangling
    else:
        out_deg = int(min(200, max(1, rng.zipf(1.1))))

    anchors: list[str] = []
    prev_href: str | None = None
    for _ in range(out_deg):
        if prev_href is not None and rng.random() < 0.05:
            href = prev_href  # duplicate (src,dst) link
        else:
            tgt, internal = _pick_target(rng, n_pages, i)
            if internal:
                j = int(tgt)
                if j == i or tgt == str(i):
                    j = i
                if (j % n_hosts) == host and rng.random() < 0.5:
                    href = f"/p/{j}"  # relative href, resolves against page url
                else:
                    href = page_url(j, n_hosts)
            else:
                href = tgt
        prev_href = href
        anchors.append(f'<a href="{href}">{_WORDS[int(rng.integers(0, len(_WORDS)))]}</a>')

    n_paras = int(rng.integers(1, 4))
    body = [f"<p>{_paragraph(rng)}</p>" for _ in range(n_paras)]
    # interleave anchors across paragraphs deterministically
    chunks: list[str] = []
    per = max(1, (len(anchors) + n_paras - 1) // n_paras) if anchors else 0
    ai = 0
    for p in range(n_paras):
        chunks.append(body[p])
        if per:
            chunks.extend(anchors[ai : ai + per])
            ai += per
    chunks.extend(anchors[ai:])
    if rng.random() < 0.15:
        chunks.append("<script>var x = 1 &amp;&amp; 2; // stripped</script>")
    if rng.random() < 0.10:
        chunks.append("<style>.c { color: red; }</style>")

    html = (
        f"<html><head><title>Page {i} on site{host}</title></head><body>"
        + "".join(chunks)
        + "</body></html>"
    ).encode("utf-8")

    lang = _LANGS[int(rng.choice(len(_LANGS), p=_LANG_P))]
    text, _ = extract_page(url, html)
    return {
        "url": url,
        "warc_ts": _EPOCH + _dt.timedelta(seconds=i),
        "html": html,
        "text": text,
        "lang": lang,
    }


class GenPages:
    """Actor-pool ``map_batches`` stage: row-index batch → pages batch.

    Stateful per SURVEY.md §2.3 idiom: constants bound once per actor in
    ``__init__``; per-batch work in ``__call__``.
    """

    def __init__(self, n_pages: int, seed: int = 42, n_hosts: int | None = None):
        self.n_pages = n_pages
        self.seed = seed
        self.n_hosts = n_hosts or max(2, int(np.sqrt(n_pages)))

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [
            generate_row(int(i), self.n_pages, self.n_hosts, self.seed)
            for i in batch.column("id").to_numpy()
        ]
        return pa.table(
            {
                "url": pa.array([r["url"] for r in rows], pa.string()),
                "warc_ts": pa.array([r["warc_ts"] for r in rows], pa.timestamp("us")),
                "html": pa.array([r["html"] for r in rows], pa.binary()),
                "text": pa.array([r["text"] for r in rows], pa.string()),
                "lang": pa.array([r["lang"] for r in rows], pa.string()),
            }
        )


def synth_pages_dataset(n_pages: int, seed: int = 42, *, concurrency: int | None = None):
    """Lazy Dataset of n_pages synthetic pages (deterministic in (seed, n))."""
    import ray.data as rd

    from pagerank_ray.stages.joins import pool_size as _pool_size

    gen = GenPages(n_pages, seed)
    ds = rd.range(n_pages, override_num_blocks=max(16, 4 * (concurrency or 8)))
    return ds.map_batches(
        GenPages,
        fn_constructor_kwargs={"n_pages": n_pages, "seed": seed, "n_hosts": gen.n_hosts},
        batch_format="pyarrow",
        batch_size=2048,
        concurrency=_pool_size(concurrency or 8),
        num_cpus=1,
    )


def generate_pages(out_dir: str, n_pages: int, seed: int = 42, *, concurrency: int | None = None) -> str:
    """Materialize synthetic pages to a parquet directory; returns the path."""
    synth_pages_dataset(n_pages, seed, concurrency=concurrency).write_parquet(out_dir)
    return out_dir
