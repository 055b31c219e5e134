"""Driver-contract check: every queries() entry runs; SQL-paired entries match
their DuckDB oracle on row count, sorted column names and values (mirroring
the driver's CORRECTNESS harness)."""

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"
# the converged-pagerank oracle unrolls the NumPy-oracle iteration count of
# the sf dir the compare runs at — point it at this harness's sf BEFORE
# oracle_sql() is first called (pytest parametrization below)
os.environ["PAGERANK_ORACLE_SF"] = SF_DIR

import __ray_entry__ as entrymod  # noqa: E402
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _to_df(result) -> pd.DataFrame:
    if isinstance(result, pd.DataFrame):
        return result
    if hasattr(result, "to_pandas"):
        return result.to_pandas()
    raise TypeError(type(result))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(ray_session, name):
    q = entrymod.queries()[name]
    got = _canon(_to_df(q(SF_DIR)))
    con = _duck(SF_DIR)
    want = _canon(con.sql(entrymod.oracle_sql()[name]).df())
    import os as _os
    if _os.environ.get("DUMP_DIR"):
        got.to_parquet(_os.environ["DUMP_DIR"] + f"/{name}_got.parquet")
        want.to_parquet(_os.environ["DUMP_DIR"] + f"/{name}_want.parquet")
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    assert len(got) == len(want)
    for col in got.columns:
        a, b = got[col].to_numpy(), want[col].to_numpy()
        # dtype KIND must agree (int result vs float oracle would fail the
        # driver's stringified value hash even when values are numerically equal)
        kind = lambda d: "i" if d.kind in "iu" else d.kind
        assert kind(a.dtype) == kind(b.dtype), (col, a.dtype, b.dtype)
        if a.dtype.kind == "f":
            np.testing.assert_allclose(a, b.astype(float), atol=1e-9)
        else:
            assert (a == b).all(), col


def test_every_query_has_an_oracle(ray_session):
    """As of r5 EVERY queries() entry is value-checked: SQL oracles for all
    relational/graph/text operators, and a golden-parquet oracle for the
    multimodal decode (whose codec core SQL cannot express). Rows-only
    entries would silently weaken the driver's correctness gate — keep the
    set empty."""
    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    rows_only = [k for k in qs if k not in sqls]
    assert rows_only == [], f"entries without an oracle: {rows_only}"


def test_entry_smoke(ray_session):
    df = _to_df(entrymod.entry())
    assert len(df) > 0
    assert set(df.columns) == {"id", "rank"}
    assert np.isfinite(df["rank"]).all()
