"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship link-graph pipeline over sf0.001 (lineitem-derived
edge table → CSR shards → converged PageRank). ``queries()`` exposes one entry
per implemented operator family from SURVEY.md §2; SQL-expressible ones have a
matching ``oracle_sql()`` DuckDB string with IDENTICAL column names; iterative
graph algorithms (PageRank, CC) are registered rows-only — their correctness
gate is the NumPy-oracle pytest suite (tests/test_pagerank.py etc.).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pagerank_ray.pipelines import tabular  # noqa: E402


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: build the deduplicated
    lineitem edge graph, shard CSR, run PageRank to convergence."""
    return tabular.q_pagerank("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        # graph build operators (SURVEY.md §2.2/§2.5/§2.7)
        "edges_dedup": tabular.q_edges_dedup,
        "out_degree": tabular.q_out_degree,
        "in_degree_topk": tabular.q_in_degree_topk,
        "dangling_vertices": tabular.q_dangling,
        "degree_histogram": tabular.q_degree_histogram,
        # iterative graph algorithms (rows-only; pytest oracles are the gate)
        "pagerank": tabular.q_pagerank,
        "connected_components": tabular.q_connected_components,
        # relational operators (groupby/agg, join, sort/limit, window)
        "lineitem_agg": tabular.q_lineitem_agg,
        "top_customers": tabular.q_top_customers,
        "events_window": tabular.q_events_window,
        # documents: text analysis + dedup
        "token_counts": tabular.q_token_counts,
        "lang_distribution": tabular.q_lang_distribution,
        "exact_dedup_docs": tabular.q_exact_dedup_docs,
        # training-data ops (near-dup suite, similarity search, quality, multimodal)
        "minhash_dedup_docs": tabular.q_minhash_dedup,
        "simhash_pairs": tabular.q_simhash_pairs,
        "doc_quality": tabular.q_doc_quality,
        "knn_bruteforce": tabular.q_knn_bruteforce,
        "knn_ivf": tabular.q_knn_ivf,
        "embedding_near_dups": tabular.q_embedding_near_dups,
        "multimodal_image_features": tabular.q_multimodal_features,
    }


def oracle_sql() -> dict[str, str]:
    edges = "(SELECT DISTINCT l_orderkey AS src_id, l_partkey AS dst_id FROM lineitem)"
    return {
        "edges_dedup": f"SELECT src_id, dst_id FROM {edges} e",
        "out_degree": (
            f"SELECT src_id, COUNT(*)::BIGINT AS out_deg FROM {edges} e GROUP BY src_id"
        ),
        "in_degree_topk": (
            f"SELECT dst_id, COUNT(*)::BIGINT AS in_deg FROM {edges} e "
            "GROUP BY dst_id ORDER BY in_deg DESC, dst_id LIMIT 20"
        ),
        "dangling_vertices": (
            f"WITH e AS {edges}, "
            "v AS (SELECT src_id AS id FROM e UNION SELECT dst_id FROM e) "
            "SELECT id FROM v WHERE id NOT IN (SELECT src_id FROM e)"
        ),
        "degree_histogram": (
            f"WITH e AS {edges}, "
            "d AS (SELECT dst_id, COUNT(*)::DOUBLE AS in_deg FROM e GROUP BY dst_id) "
            "SELECT (FLOOR(LOG2(in_deg)) + 1)::BIGINT AS bin, COUNT(*)::BIGINT AS n_vertices "
            "FROM d GROUP BY 1 ORDER BY bin"
        ),
        "lineitem_agg": (
            "SELECT l_returnflag, l_linestatus, "
            "ROUND(SUM(l_quantity), 2) AS sum_qty, "
            "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_revenue, "
            "COUNT(*)::BIGINT AS n_rows "
            "FROM lineitem GROUP BY l_returnflag, l_linestatus "
            "ORDER BY l_returnflag, l_linestatus"
        ),
        "top_customers": (
            "SELECT o_custkey, c_name, ROUND(SUM(o_totalprice), 2) AS total_price, "
            "COUNT(*)::BIGINT AS n_orders "
            "FROM orders JOIN customer ON o_custkey = c_custkey "
            "GROUP BY o_custkey, c_name "
            "ORDER BY SUM(o_totalprice) DESC, o_custkey LIMIT 25"
        ),
        "events_window": (
            "SELECT event_type, (epoch_us(ts) // 3600000000)::BIGINT AS hour_bucket, "
            "COUNT(*)::BIGINT AS n_events, ROUND(SUM(value), 4) AS sum_value "
            "FROM events GROUP BY event_type, hour_bucket "
            "ORDER BY event_type, hour_bucket"
        ),
        "token_counts": (
            "SELECT doc_id, (CASE WHEN TRIM(text) = '' THEN 0 "
            "ELSE LEN(regexp_split_to_array(TRIM(text), '\\s+')) END)::BIGINT AS n_tokens "
            "FROM documents"
        ),
        "lang_distribution": (
            "SELECT lang, COUNT(*)::BIGINT AS n_docs FROM documents GROUP BY lang ORDER BY lang"
        ),
        "exact_dedup_docs": (
            "SELECT md5(text) AS h, MIN(doc_id)::BIGINT AS keep_id, "
            "COUNT(*)::BIGINT AS n_copies FROM documents GROUP BY md5(text) ORDER BY h"
        ),
        "knn_bruteforce": (
            "WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings "
            "WHERE vec_id < 5), "
            "s AS (SELECT q.query_id, e.vec_id, "
            "list_cosine_similarity(e.embedding::DOUBLE[], q.qe::DOUBLE[]) AS sim "
            "FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.query_id), "
            "r AS (SELECT query_id, vec_id, sim, ROW_NUMBER() OVER "
            "(PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rank FROM s) "
            "SELECT query_id, vec_id, ROUND(sim, 6) AS cosine, rank::BIGINT AS rank "
            "FROM r WHERE rank <= 10"
        ),
    }
