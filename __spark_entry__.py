"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()[name]`` runs an imtag_spark engine operator over the
driver testdata; ``oracle_sql()[name]`` is the equivalent ANSI SQL DuckDB
runs on the same parquet. Column names/aliases match exactly on both sides;
float outputs are rounded identically (6dp unless noted).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from imtag_spark.operators.cc import connected_components  # noqa: E402
from imtag_spark.operators.dedup import exact_duplicates  # noqa: E402
from imtag_spark.operators.pagerank import pagerank  # noqa: E402
from imtag_spark.operators.similarity import knn_bruteforce  # noqa: E402
from imtag_spark.operators.stats import degrees  # noqa: E402
from imtag_spark.operators.text import with_doc_stats  # noqa: E402
from imtag_spark.operators.triangles import triangle_count  # noqa: E402
from imtag_spark.sources.tables import (  # noqa: E402
    ORDER_OFFSET,
    customer_order_edges,
    load,
    nation_chain_edges,
    part_cooccurrence_edges,
)

# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: distributed CC over the customer↔order graph at sf0.001,
    then component stats (size + total order value)."""
    sf_dir = "/root/testdata/sf0.001"
    edges = customer_order_edges(spark, sf_dir)
    labels = connected_components(edges)
    orders = load(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") + F.lit(ORDER_OFFSET)).alias("vertex"),
        F.col("o_totalprice"),
    )
    return (
        labels.join(orders, "vertex", "left")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return customer_order_edges(spark, sf_dir)


def _q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    return degrees(customer_order_edges(spark, sf_dir))


def _q_cc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return connected_components(customer_order_edges(spark, sf_dir))


def _q_cc_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    return connected_components(nation_chain_edges(spark, sf_dir))


def _q_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = connected_components(customer_order_edges(spark, sf_dir))
    return labels.groupBy("component").agg(F.count(F.lit(1)).alias("n_vertices"))


def _q_component_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = connected_components(customer_order_edges(spark, sf_dir))
    orders = load(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") + F.lit(ORDER_OFFSET)).alias("vertex"), "o_totalprice"
    )
    return (
        labels.join(orders, "vertex")
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 3).alias("total_value"),
        )
    )


def _q_pagerank5(spark: SparkSession, sf_dir: str) -> DataFrame:
    pr = pagerank(
        customer_order_edges(spark, sf_dir),
        directed=False,
        tol=0.0,
        max_iter=5,
    )
    return pr.select("vertex", F.round("rank", 7).alias("rank_r"))


def _q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangle_count(part_cooccurrence_edges(spark, sf_dir, keep_mod=4))


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_duplicates(load(spark, sf_dir, "documents"))


def _q_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return with_doc_stats(docs).select(
        "doc_id", "n_chars_c", "n_tokens", "punct_ratio", "upper_ratio", "avg_token_len"
    )


def _q_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_chars"), 6).alias("avg_chars"),
    )


def _q_knn(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 20)
    return knn_bruteforce(emb, queries, k=1).select(
        "query_id", "neighbor_id", F.col("sim").alias("sim_r")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "edges_customer_orders": _q_edges,
        "degrees_customer_orders": _q_degrees,
        "cc_customer_orders": _q_cc_orders,
        "cc_nation_chains": _q_cc_chains,
        "component_sizes": _q_component_sizes,
        "component_stats": _q_component_stats,
        "pagerank5_customer_orders": _q_pagerank5,
        "triangles_parts": _q_triangles,
        "dedup_exact_documents": _q_dedup_exact,
        "doc_stats": _q_doc_stats,
        "lang_stats": _q_lang_stats,
        "knn_top1_embeddings": _q_knn,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_EDGES_CTE = f"""
WITH edges AS (
  SELECT DISTINCT o_custkey AS src, o_orderkey + {ORDER_OFFSET} AS dst
  FROM orders
)
"""

# 5 unrolled PageRank iterations (undirected customer-order graph; every
# vertex has out-edges, so no dangling term). alpha=0.85.
_PAGERANK5_SQL = f"""
WITH edges AS (
  SELECT DISTINCT o_custkey AS src, o_orderkey + {ORDER_OFFSET} AS dst FROM orders
),
sym AS (
  SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges
),
deg AS (SELECT src AS vertex, count(*) AS out_deg FROM sym GROUP BY src),
verts AS (SELECT vertex FROM deg),
n AS (SELECT count(*)::DOUBLE AS n FROM verts),
r0 AS (SELECT vertex, (SELECT 1.0 / n FROM n) AS rank FROM verts),
{{iters}}
SELECT vertex, round(rank, 7) AS rank_r FROM r5
"""


def _pagerank_iter_sql(i: int) -> str:
    return f"""r{i} AS (
  SELECT v.vertex,
         (SELECT (1 - 0.85) / n FROM n)
         + 0.85 * coalesce(sum(r.rank / d.out_deg), 0.0) AS rank
  FROM verts v
  LEFT JOIN sym e ON e.dst = v.vertex
  LEFT JOIN r{i - 1} r ON r.vertex = e.src
  LEFT JOIN deg d ON d.vertex = e.src
  GROUP BY v.vertex
)"""


def oracle_sql() -> dict[str, str]:
    pr_iters = ",\n".join(_pagerank_iter_sql(i) for i in range(1, 6))
    return {
        "edges_customer_orders": f"""
            SELECT DISTINCT o_custkey AS src, o_orderkey + {ORDER_OFFSET} AS dst
            FROM orders
        """,
        "degrees_customer_orders": _EDGES_CTE
        + """
            SELECT vertex, count(*) AS degree FROM (
              SELECT src AS vertex FROM edges
              UNION ALL
              SELECT dst AS vertex FROM edges
            ) GROUP BY vertex
        """,
        # the customer-order graph is a disjoint union of stars whose
        # minimum vertex is the customer key (orders are offset by 1e9),
        # so CC labels are expressible in closed form
        "cc_customer_orders": f"""
            SELECT DISTINCT o_custkey AS vertex, o_custkey AS component FROM orders
            UNION ALL
            SELECT o_orderkey + {ORDER_OFFSET} AS vertex, o_custkey AS component
            FROM orders
        """,
        # per-nation supplier chains: component = min suppkey of the nation
        # (nations with a single supplier contribute no edges/vertices)
        "cc_nation_chains": """
            SELECT s_suppkey AS vertex,
                   min(s_suppkey) OVER (PARTITION BY s_nationkey) AS component
            FROM supplier
            WHERE s_nationkey IN (
              SELECT s_nationkey FROM supplier GROUP BY s_nationkey
              HAVING count(*) > 1
            )
        """,
        "component_sizes": """
            SELECT o_custkey AS component, count(*) + 1 AS n_vertices
            FROM (SELECT DISTINCT o_custkey, o_orderkey FROM orders)
            GROUP BY o_custkey
        """,
        "component_stats": """
            SELECT o_custkey AS component,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 3) AS total_value
            FROM orders GROUP BY o_custkey
        """,
        "pagerank5_customer_orders": _PAGERANK5_SQL.format(iters=pr_iters),
        "triangles_parts": """
            WITH li AS (
              SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
              WHERE l_partkey % 4 = 0
            ),
            edges AS (
              SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
              FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
              WHERE a.l_partkey < b.l_partkey
            ),
            tris AS (
              SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
              FROM edges e1
              JOIN edges e2 ON e2.src = e1.src AND e2.dst > e1.dst
              JOIN edges e3 ON e3.src = e1.dst AND e3.dst = e2.dst
            ),
            per AS (
              SELECT v, count(*) AS t FROM (
                SELECT x AS v FROM tris
                UNION ALL SELECT y FROM tris
                UNION ALL SELECT z FROM tris
              ) GROUP BY v
            ),
            verts AS (
              SELECT src AS v FROM edges UNION SELECT dst FROM edges
            )
            SELECT verts.v AS vertex, coalesce(per.t, 0) AS triangles
            FROM verts LEFT JOIN per ON per.v = verts.v
        """,
        "dedup_exact_documents": """
            SELECT sha256(text) AS text_sha,
                   count(*) AS n_copies,
                   min(doc_id) AS representative
            FROM documents GROUP BY sha256(text)
        """,
        "doc_stats": """
            SELECT doc_id,
                   length(text) AS n_chars_c,
                   (CASE WHEN length(trim(text)) = 0 THEN 0
                         ELSE length(regexp_split_to_array(trim(text), '\\s+'))
                    END) AS n_tokens,
                   round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                         / greatest(length(text), 1)::DOUBLE, 6) AS punct_ratio,
                   round((length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))
                         / greatest(length(text), 1)::DOUBLE, 6) AS upper_ratio,
                   round(length(text)::DOUBLE /
                         greatest(CASE WHEN length(trim(text)) = 0 THEN 0
                                  ELSE length(regexp_split_to_array(trim(text), '\\s+'))
                                  END, 1), 6) AS avg_token_len
            FROM documents
        """,
        "lang_stats": """
            SELECT lang, count(*) AS n_docs, round(avg(n_chars), 6) AS avg_chars
            FROM documents GROUP BY lang
        """,
        "knn_top1_embeddings": """
            WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 20),
            sims AS (
              SELECT q.vec_id AS query_id, b.vec_id AS neighbor_id,
                     list_cosine_similarity(q.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS sim
              FROM q JOIN embeddings b ON b.vec_id != q.vec_id
            ),
            ranked AS (
              SELECT query_id, neighbor_id, sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, neighbor_id ASC) AS rk
              FROM sims
            )
            SELECT query_id, neighbor_id, round(sim, 6) AS sim_r
            FROM ranked WHERE rk = 1
        """,
    }
