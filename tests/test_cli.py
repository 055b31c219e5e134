"""CLI smoke test — the `ray job submit` surface, driven as a subprocess
(the CLI owns its own Ray session, so it must not share the test session)."""

import json
import os
import subprocess
import sys

import pytest


@pytest.mark.slow
def test_cli_gen_build_pagerank(tmp_path):
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    pages = str(tmp_path / "pages")
    work = str(tmp_path / "work")

    def run(*args):
        out = subprocess.run(
            [sys.executable, "-m", "pagerank_ray.cli", "--num-cpus", "4", *args],
            env=env, capture_output=True, text=True, timeout=300,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    gen = run("gen-pages", "--out", pages, "--n-pages", "300")
    assert gen["n_pages"] == 300
    arts = run("build", "--pages", pages, "--work-dir", work, "--n-parts", "8")
    assert arts["n_vertices"] > 0 and arts["n_edges"] > 0
    res = run("pagerank", "--work-dir", work, "--n-workers", "2", "--max-iters", "100")
    assert res["converged"] and res["iterations"] > 0
    assert os.path.isdir(res["out"])
    # resume path: second invocation restores from the checkpoint written above
    res2 = run("pagerank", "--work-dir", work, "--n-workers", "2", "--max-iters", "100", "--resume")
    assert res2["converged"]


@pytest.mark.slow
def test_cli_training_data_ops(tmp_path):
    """dedup / jaccard / sessionize subcommands run end-to-end over the sf0.001
    tables and write parquet."""
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    def run(*args):
        out = subprocess.run(
            [sys.executable, "-m", "pagerank_ray.cli", "--num-cpus", "4", *args],
            env=env, capture_output=True, text=True, timeout=300,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    sf = "/root/testdata/sf0.001"
    j = run("jaccard", "--docs", f"{sf}/documents.parquet", "--out", str(tmp_path / "jacc"))
    assert j["pairs"] >= 0 and os.path.isdir(j["out"])
    s = run("sessionize", "--events", f"{sf}/events.parquet", "--out", str(tmp_path / "sess"))
    assert os.path.isdir(s["out"])
    d = run("dedup", "--docs", f"{sf}/documents.parquet", "--out", str(tmp_path / "dedup"))
    assert d["docs"] > 0 and d["clusters"] <= d["docs"]


@pytest.mark.slow
def test_cli_hits_kcore(tmp_path):
    """hits / kcore subcommands over built graph artifacts."""
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    pages = str(tmp_path / "pages")
    work = str(tmp_path / "work")

    def run(*args):
        out = subprocess.run(
            [sys.executable, "-m", "pagerank_ray.cli", "--num-cpus", "4", *args],
            env=env, capture_output=True, text=True, timeout=300,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    run("gen-pages", "--out", pages, "--n-pages", "300")
    run("build", "--pages", pages, "--work-dir", work, "--n-parts", "8")
    h = run("hits", "--work-dir", work, "--n-workers", "2", "--iters", "3")
    assert h["iterations"] == 3 and h["n_vertices"] > 0
    assert os.path.isdir(os.path.join(h["out"], "authorities"))
    assert os.path.isdir(os.path.join(h["out"], "hubs"))
    kc = run("kcore", "--work-dir", work, "--k", "2")
    assert kc["rounds"] >= 0 and os.path.isdir(kc["out"])


@pytest.mark.slow
def test_cli_bfs(tmp_path):
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    pages = str(tmp_path / "pages")
    work = str(tmp_path / "work")

    def run(*args):
        out = subprocess.run(
            [sys.executable, "-m", "pagerank_ray.cli", "--num-cpus", "4", *args],
            env=env, capture_output=True, text=True, timeout=300,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    run("gen-pages", "--out", pages, "--n-pages", "300")
    run("build", "--pages", pages, "--work-dir", work, "--n-parts", "8")
    b = run("bfs", "--work-dir", work, "--seeds", "0,1,2", "--n-workers", "2")
    assert b["converged"] and os.path.isdir(b["out"])
    # ADVICE r3: the CLI must honor bfs_levels' "callers map ∞ to -1"
    # contract — no raw 2^62 sentinel may reach the output parquet
    import pyarrow.parquet as pq

    dist = pq.read_table(b["out"]).column("dist").to_numpy()
    assert int(dist.max()) < (1 << 62) and int(dist.min()) >= -1


def test_cli_scc(tmp_path):
    env = dict(os.environ, PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    pages = str(tmp_path / "pages")
    work = str(tmp_path / "work")

    def run(*args):
        out = subprocess.run(
            [sys.executable, "-m", "pagerank_ray.cli", "--num-cpus", "4", *args],
            env=env, capture_output=True, text=True, timeout=300,
        )
        assert out.returncode == 0, out.stderr[-2000:]
        return json.loads(out.stdout.strip().splitlines()[-1])

    run("gen-pages", "--out", pages, "--n-pages", "300")
    run("build", "--pages", pages, "--work-dir", work, "--n-parts", "8")
    s = run("scc", "--work-dir", work, "--n-workers", "2")
    assert s["rounds"] >= 1 and os.path.isdir(s["out"])
    import pyarrow.parquet as pq

    t = pq.read_table(s["out"])
    assert t.num_rows == s["n_vertices"]
    # second invocation resumes the recorded rounds and reproduces the labels
    s2 = run("scc", "--work-dir", work, "--n-workers", "2")
    t2 = pq.read_table(s2["out"])
    import numpy as np

    a = t.to_pandas().sort_values("id")["scc"].to_numpy()
    b = t2.to_pandas().sort_values("id")["scc"].to_numpy()
    np.testing.assert_array_equal(a, b)
    assert s2["rounds"] == s["rounds"]
