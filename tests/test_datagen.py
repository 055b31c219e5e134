"""Synthetic page generator tests (FIXTURES.md §1)."""

import numpy as np

from pagerank_ray import schemas
from pagerank_ray.functions.extract import extract_page
from pagerank_ray.sources.pages import GenPages, generate_row, synth_pages_dataset


def test_row_determinism_independent_of_batching():
    a = [generate_row(i, 300, 17, 42) for i in range(20)]
    b = [generate_row(i, 300, 17, 42) for i in range(20)]
    assert a == b


def test_seed_changes_output():
    assert generate_row(3, 300, 17, 42)["html"] != generate_row(3, 300, 17, 43)["html"]


def test_text_column_is_extractor_output():
    for i in (0, 7, 42):
        row = generate_row(i, 300, 17, 42)
        text, _ = extract_page(row["url"], row["html"])
        assert text == row["text"]  # byte-identical invariant


def test_structure_statistics():
    rows = [generate_row(i, 400, 20, 42) for i in range(400)]
    outdegs = []
    n_external = 0
    for r in rows:
        _, outs = extract_page(r["url"], r["html"])
        outdegs.append(len(outs))
        n_external += sum(1 for u in outs if ".example/x/" in u)
    outdegs = np.array(outdegs)
    dangling_frac = (outdegs == 0).mean()
    assert 0.04 < dangling_frac < 0.2  # ~8% dangling
    assert outdegs.max() <= 200
    assert n_external > 0  # some dst-only vertices


def test_dataset_schema_and_determinism(ray_session):
    ds = synth_pages_dataset(100, seed=7, concurrency=2)
    table = ds.take_batch(100, batch_format="pyarrow")
    schemas.validate(table, schemas.PAGES, "pages")
    # same rows regardless of concurrency/batching
    gen = GenPages(100, 7)
    row = generate_row(5, 100, gen.n_hosts, 7)
    urls = table.column("url").to_pylist()
    idx = urls.index(row["url"])
    assert table.column("html")[idx].as_py() == row["html"]
    assert set(table.column("lang").to_pylist()) <= {"en", "de", "zh"}
