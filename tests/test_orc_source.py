"""ORC custom connector (sources/orc.py): write→read round-trip, column
pruning, multi-file distribution. q_orc_source's oracle parity runs in
test_entry.py's parametrized sweep."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from pagerank_ray.sources.orc import read_orc, write_orc


def _table(n: int = 1000, seed: int = 3) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.integers(0, 100, n), pa.int64()),
        "s": pa.array([f"row{i % 17}" for i in range(n)]),
    })


def test_roundtrip(ray_session, tmp_path):
    t = _table()
    write_orc(rd.from_arrow(t).repartition(4), str(tmp_path / "out"))
    back = read_orc(str(tmp_path / "out")).to_pandas().sort_values("k")
    pd.testing.assert_frame_equal(
        back.reset_index(drop=True), t.to_pandas(), check_dtype=False)


def test_multiple_files_written(ray_session, tmp_path):
    write_orc(rd.from_arrow(_table()).repartition(4), str(tmp_path / "out"))
    files = [p for p in (tmp_path / "out").iterdir() if p.suffix == ".orc"]
    assert len(files) >= 2  # distributed write: one file per block


def test_column_pruning(ray_session, tmp_path):
    write_orc(rd.from_arrow(_table()), str(tmp_path / "out"))
    ds = read_orc(str(tmp_path / "out"), columns=["k"])
    df = ds.to_pandas()
    assert list(df.columns) == ["k"]
    assert len(df) == 1000


def test_non_orc_files_ignored(ray_session, tmp_path):
    (tmp_path / "out").mkdir()
    (tmp_path / "out" / "junk.txt").write_text("not orc")
    import pyarrow.orc as po
    po.write_table(_table(50), str(tmp_path / "out" / "good.orc"))
    assert read_orc(str(tmp_path / "out")).count() == 50
