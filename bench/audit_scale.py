"""Scale datapoints for the late-r5 warehouse/corpus-audit family:
changelog_compact, interarrival_stats, user_primary_type, table_profile.

Deterministic synthetic tables, pure function of the row id (fmix64 mixing,
same convention as the other scale harnesses):
  events: event_id = id+1, user_id = id % n_users, ts = epoch + id seconds
          (strictly increasing), event_type = t<fmix(id)%5>.
  orders: o_orderkey = id+1 (unique), o_custkey = id % 1000,
          o_totalprice = (fmix(id) % 10_000_000) / 100, o_orderdate from id,
          o_orderstatus/o_orderpriority small enums.

Planted truth checked per run:
  - changelog_compact: user u's last event id is the largest id < N with
    id % n_users == u, so last_ts == epoch + last_id seconds for EVERY user;
    n_versions == size of the residue class.
  - interarrival_stats: every same-user gap is exactly n_users seconds, so
    mean_gap_s == max_gap_s == n_users for every event type.
  - user_primary_type: recomputed from the generator formula for 100 users.
  - table_profile(orders): n_rows == N/4, zero nulls, distinct(o_orderkey)
    == N/4, distinct(o_custkey) == 1000.

Two sizes (4x apart) in fresh processes -> wall ratio evidences the
corpus-linear combiner shapes (per-batch partials, O(users) exchange).

Usage: python bench/audit_scale.py  (env: GRAFT_AUDIT_EVENTS base size,
default 2_000_000; RAY_GRAFT_CPUS, default 32)
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BASE = int(float(os.environ.get("GRAFT_AUDIT_EVENTS", 2_000_000)))
NCPU = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
EPOCH = np.datetime64("2026-01-01T00:00:00", "us")


def _fmix(h: np.ndarray) -> np.ndarray:
    h = h.copy()
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


def gen_tables(work: str, n_events: int) -> None:
    import pyarrow as pa
    import ray.data as rd

    n_users = n_events // 20

    def make_events(batch) -> "pa.Table":
        ids = batch["id"].astype(np.int64)
        with np.errstate(over="ignore"):
            tcode = (_fmix(ids.astype(np.uint64)) % np.uint64(5)).astype(np.int64)
        ts = EPOCH + ids.astype("timedelta64[s]").astype("timedelta64[us]")
        types = np.array(["t0", "t1", "t2", "t3", "t4"], dtype=object)[tcode]
        return pa.table({
            "event_id": pa.array(ids + 1, pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array(ids % n_users, pa.int64()),
            "event_type": pa.array(types, pa.string()),
            "value": pa.array(np.zeros(len(ids)), pa.float64()),
            "props": pa.array(["{}"] * len(ids), pa.string()),
        })

    def make_orders(batch) -> "pa.Table":
        ids = batch["id"].astype(np.int64)
        with np.errstate(over="ignore"):
            cents = (_fmix(ids.astype(np.uint64) + np.uint64(7)) % np.uint64(10_000_000)).astype(np.int64)
        dates = EPOCH + (ids % 3650).astype("timedelta64[D]").astype("timedelta64[us]")
        return pa.table({
            "o_orderkey": pa.array(ids + 1, pa.int64()),
            "o_custkey": pa.array(ids % 1000, pa.int64()),
            "o_orderstatus": pa.array(np.array(["O", "F", "P"], dtype=object)[ids % 3]),
            "o_totalprice": pa.array(cents / 100.0, pa.float64()),
            "o_orderdate": pa.array(dates, pa.timestamp("us")),
            "o_orderpriority": pa.array(np.array(["1-URGENT", "2-HIGH"], dtype=object)[ids % 2]),
        })

    rd.range(n_events, override_num_blocks=4 * NCPU).map_batches(
        make_events, batch_size=65536, batch_format="numpy"
    ).write_parquet(os.path.join(work, "events.parquet"))
    rd.range(n_events // 4, override_num_blocks=4 * NCPU).map_batches(
        make_orders, batch_size=65536, batch_format="numpy"
    ).write_parquet(os.path.join(work, "orders.parquet"))


def run_one(n_events: int) -> dict:
    import ray

    ray.init(address="local", num_cpus=NCPU, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from pagerank_ray.pipelines.tabular import (
        q_changelog_compact, q_interarrival_stats, q_table_profile,
        q_user_primary_type,
    )

    work = f"/tmp/audit_scale_{n_events}"
    if not os.path.exists(os.path.join(work, "events.parquet")):
        gen_tables(work, n_events)
    n_users = n_events // 20
    out = {"n_events": n_events, "n_users": n_users, "ncpu": NCPU}

    t0 = time.perf_counter()
    cc = q_changelog_compact(work)
    out["changelog_sec"] = round(time.perf_counter() - t0, 2)
    last_id = np.arange(n_users, dtype=np.int64) + (
        (n_events - 1 - np.arange(n_users, dtype=np.int64)) // n_users
    ) * n_users
    exp_ts = EPOCH + last_id.astype("timedelta64[s]").astype("timedelta64[us]")
    cc = cc.sort_values("user_id")
    ok = (
        len(cc) == n_users
        and (cc["last_ts"].to_numpy() == exp_ts).all()
        and (cc["n_versions"].to_numpy() == np.bincount(
            np.arange(n_events, dtype=np.int64) % n_users, minlength=n_users)).all()
    )
    out["changelog_ok"] = bool(ok)

    t0 = time.perf_counter()
    ia = q_interarrival_stats(work)
    out["interarrival_sec"] = round(time.perf_counter() - t0, 2)
    out["interarrival_ok"] = bool(
        (ia["mean_gap_s"] == float(n_users)).all()
        and (ia["max_gap_s"] == float(n_users)).all()
    )

    t0 = time.perf_counter()
    pt = q_user_primary_type(work)
    out["primary_type_sec"] = round(time.perf_counter() - t0, 2)
    sample = np.linspace(0, n_users - 1, 100).astype(np.int64)
    ok = len(pt) == n_users
    pt_idx = pt.set_index("user_id")
    for u in sample:
        ids = np.arange(u, n_events, n_users, dtype=np.int64)
        with np.errstate(over="ignore"):
            tc = (_fmix(ids.astype(np.uint64)) % np.uint64(5)).astype(np.int64)
        cnt = np.bincount(tc, minlength=5)
        best = int(np.argmax(cnt))  # argmax ties -> lowest code == lexic. smallest
        row = pt_idx.loc[int(u)]
        ok = ok and row["primary_type"] == f"t{best}" and row["n_primary"] == cnt[best]
    out["primary_type_ok"] = bool(ok)

    t0 = time.perf_counter()
    tp = q_table_profile(work)
    out["table_profile_sec"] = round(time.perf_counter() - t0, 2)
    rec = {r.col_name: (r.n_rows, r.n_null, r.n_distinct) for r in tp.itertuples()}
    out["table_profile_ok"] = bool(
        rec["o_orderkey"] == (n_events // 4, 0, n_events // 4)
        and rec["o_custkey"] == (n_events // 4, 0, 1000)
        and rec["o_orderstatus"][2] == 3
    )
    ray.shutdown()
    return out


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        print(json.dumps(run_one(int(float(sys.argv[2])))))
        sys.exit(0)
    results = []
    for n in (BASE, 4 * BASE):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--one", str(n)],
            capture_output=True, text=True,
        )
        line = r.stdout.strip().splitlines()[-1]
        results.append(json.loads(line))
        print(line, flush=True)
    a, b = results
    ratio = {
        k.replace("_sec", "_wall_ratio"): round(b[k] / a[k], 2)
        for k in a if k.endswith("_sec") and a[k] > 0
    }
    summary = {"base": a, "x4": b, **ratio}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "audit_scale_r5.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(ratio))
