"""Full local oracle sweep — the driver's CORRECTNESS gate, runnable locally.

Runs every queries() entry over $GRAFT_SF_DIR (default sf0.01), compares
row count / sorted column names / dtype kinds / values against oracle_sql()
via DuckDB (mirroring the driver harness), prints one line per query and a
final SWEEP summary; JSON details to /tmp/sweep_oracle.json.
"""
import json
import os
import sys
import time

SF = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
os.environ["PAGERANK_ORACLE_SF"] = SF
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import ray

ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

import __ray_entry__ as entry

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def duck():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def canon(df):
    df = df[sorted(df.columns)]
    # sort rows by the integer/string key columns FIRST: a float score as the
    # primary sort key lets 1-ulp engine-vs-oracle noise (inside the compare
    # tolerance) reorder rows differently on each side and misalign the
    # row-wise compare (r4 review finding)
    keys = [c for c in df.columns if df[c].dtype.kind in "iuO"] + [
        c for c in df.columns if df[c].dtype.kind not in "iuO"
    ]
    return df.sort_values(keys).reset_index(drop=True)


qs = entry.queries()
if len(sys.argv) > 1:  # optional: sweep only the named queries
    sel = set(sys.argv[1:])
    qs = {k: v for k, v in qs.items() if k in sel}
sqls = entry.oracle_sql()
con = duck()
results = {}
for name, fn in qs.items():
    t0 = time.perf_counter()
    try:
        got = fn(SF)
        if hasattr(got, "to_pandas"):
            got = got.to_pandas()
        dt = time.perf_counter() - t0
        if name not in sqls:
            results[name] = {"ok": True, "rows": len(got), "sec": round(dt, 1),
                             "note": "rows_only"}
            print(name, "ROWS_ONLY", len(got), f"{dt:.1f}s", flush=True)
            continue
        want = con.sql(sqls[name]).df()
        g, w = canon(got), canon(want)
        ok = list(g.columns) == list(w.columns) and len(g) == len(w)
        if ok:
            for c in g.columns:
                a, b = g[c].to_numpy(), w[c].to_numpy()
                kind = lambda d: "i" if d.kind in "iu" else d.kind
                if kind(a.dtype) != kind(b.dtype):
                    ok = False; break
                if a.dtype.kind == "f":
                    if not np.allclose(a, b.astype(float), atol=1e-9, equal_nan=True):
                        ok = False; break
                elif not (pd.Series(a).fillna("<NA>") == pd.Series(b).fillna("<NA>")).all():
                    ok = False; break
        results[name] = {"ok": bool(ok), "rows": len(g), "sec": round(dt, 1)}
        print(name, "OK" if ok else "FAIL", len(g), f"{dt:.1f}s", flush=True)
    except Exception as ex:
        results[name] = {"ok": False, "err": repr(ex)[:200]}
        print(name, "ERROR", repr(ex)[:200], flush=True)

bad = [k for k, v in results.items() if not v["ok"]]
print("SWEEP", len(results), "queries,", len(bad), "bad:", bad)
json.dump(results, open("/tmp/sweep_oracle.json", "w"), indent=1)
ray.shutdown()
