"""Arrow IPC custom connector (sources/ipc.py): write→read round-trip,
column pruning, multi-file distribution. q_ipc_source's oracle parity runs
in the sweep."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pagerank_ray.sources.ipc import read_ipc, write_ipc


def _table(n: int = 1000, seed: int = 3) -> pa.Table:
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.integers(0, 100, n), pa.int64()),
        "s": pa.array([f"row{i % 17}" for i in range(n)]),
    })


def test_roundtrip(ray_session, tmp_path):
    t = _table()
    write_ipc(rd.from_arrow(t).repartition(4), str(tmp_path / "out"))
    back = read_ipc(str(tmp_path / "out")).to_pandas().sort_values("k")
    pd.testing.assert_frame_equal(
        back.reset_index(drop=True), t.to_pandas(), check_dtype=False)


def test_multiple_files_written(ray_session, tmp_path):
    write_ipc(rd.from_arrow(_table()).repartition(4), str(tmp_path / "out"))
    files = [p for p in (tmp_path / "out").iterdir() if p.suffix == ".arrow"]
    assert len(files) >= 2  # distributed write: one file per block


def test_column_pruning(ray_session, tmp_path):
    write_ipc(rd.from_arrow(_table()), str(tmp_path / "out"))
    df = read_ipc(str(tmp_path / "out"), columns=["k"]).to_pandas()
    assert list(df.columns) == ["k"]
    assert len(df) == 1000


def test_non_ipc_files_ignored(ray_session, tmp_path):
    (tmp_path / "out").mkdir()
    (tmp_path / "out" / "junk.txt").write_text("not ipc")
    t = _table(50)
    with pa.ipc.new_file(str(tmp_path / "out" / "good.arrow"), t.schema) as w:
        w.write_table(t)
    assert read_ipc(str(tmp_path / "out")).count() == 50


def test_streams_batches_not_whole_file(ray_session, tmp_path):
    # a multi-batch file yields multiple tables from one read stream
    t = _table(400)
    path = tmp_path / "out"; path.mkdir()
    with pa.ipc.new_file(str(path / "multi.arrow"), t.schema) as w:
        for i in range(0, 400, 100):
            w.write_table(t.slice(i, 100))
    assert read_ipc(str(path)).count() == 400
