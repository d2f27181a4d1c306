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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from imtag_spark.operators.cc import connected_components  # noqa: E402
from imtag_spark.functions.polyhash import (  # noqa: E402
    M31,
    band_weights,
    id_mix_sql,
    label_color_sql,
    minhash_coeffs,
    plane_weight_sql,
    shingle_hash_sql,
    token_weight_sql,
    deterministic_planes,
)
from imtag_spark.operators.dedup import (  # noqa: E402
    exact_duplicates,
    exact_jaccard,
    minhash_dedup_clusters_sql,
    shingle_hashes,
    simhash_candidates,
    simhash_signatures_sql,
)
from imtag_spark.operators.lpa import label_propagation  # noqa: E402
from imtag_spark.operators.morphology import complement_runs, dilate  # noqa: E402
from imtag_spark.operators.multimodal import attach_blob_meta  # noqa: E402
from imtag_spark.operators.pagerank import pagerank  # noqa: E402
from imtag_spark.operators.rle import grid_to_runs, with_scan_order_ids  # noqa: E402
from imtag_spark.operators.similarity import (  # noqa: E402
    cosine_pairs_lsh,
    ivf_index,
    knn_bruteforce,
    knn_ivf,
)
from imtag_spark.operators.label_image import colorize_runs  # noqa: E402
from imtag_spark.operators.relabel import dense_component_ranks  # noqa: E402
from imtag_spark.operators.stats import (  # noqa: E402
    component_stats,
    degrees,
    filter_components_by_size,
    remove_components,
)
from imtag_spark.operators.text import (  # noqa: E402
    fingerprint,
    language_id,
    quality_score,
    with_doc_stats,
)
from imtag_spark.operators.triangles import triangle_count  # noqa: E402
from imtag_spark.plans.pipelines import (  # noqa: E402
    hole_adjacencies,
    label_runs,
)
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
# deterministic CCL grid (computable identically in Spark and plain SQL)
# ---------------------------------------------------------------------------

GRID_R = GRID_C = 24
# foreground iff (3r² + 5c² + rc) mod 13 < 6 — nonlinear, so blobs are
# irregular: 166 runs / 98 edges / 68 components on the 24×24 grid
_MASK_SQL = (
    "((i // {c}) * (i // {c}) * 3 + (i % {c}) * (i % {c}) * 5"
    " + (i // {c}) * (i % {c})) % 13 < 6"
).format(c=GRID_C)


def _grid_cells(spark: SparkSession) -> DataFrame:
    r, c = F.col("row"), F.col("col")
    return (
        spark.range(GRID_R * GRID_C)
        .select(
            (F.col("id") / GRID_C).cast("int").alias("row"),
            (F.col("id") % GRID_C).cast("int").alias("col"),
        )
        .where((r * r * 3 + c * c * 5 + r * c) % 13 < 6)
    )


# The driver gate runs every queries() entry in one session; six of them
# share the same grid RLE + CCL pipeline. Compute each (runs, labels-per-
# connectivity) once per SparkSession and hold the localCheckpointed result
# — pure latency optimization, no query's output changes. Keyed by the
# session's applicationId (NOT id(spark): CPython reuses freed object ids,
# so a restarted session could alias a stale entry bound to a stopped
# SparkContext); entries from any other session are evicted on access, so
# dead sessions' checkpointed RDDs never accumulate.
_GRID_CACHE: dict[tuple[str, str], DataFrame] = {}


def _session_cached(spark: SparkSession, name: str, build) -> DataFrame:
    ns = spark.sparkContext.applicationId
    for k in [k for k in _GRID_CACHE if k[0] != ns]:
        del _GRID_CACHE[k]
    key = (ns, name)
    if key not in _GRID_CACHE:
        _GRID_CACHE[key] = build()
    return _GRID_CACHE[key]


def _grid_runs(spark: SparkSession) -> DataFrame:
    return _session_cached(
        spark,
        "__runs__",
        lambda: grid_to_runs(_grid_cells(spark)).localCheckpoint(eager=True),
    )


def _grid_labels(spark: SparkSession, connectivity: str) -> DataFrame:
    return _session_cached(
        spark,
        f"labels:{connectivity}",
        lambda: label_runs(
            _grid_runs(spark), connectivity, cells_hint=GRID_R * GRID_C
        ).localCheckpoint(eager=True),
    )


def _grid_runs_labeled(spark: SparkSession, connectivity: str = "cross") -> DataFrame:
    """Grid runs joined with their dense labels (id, row, col_begin, col_end,
    dense_label) — the shared prefix of the stats/filter/removal queries."""
    return _grid_runs(spark).join(
        _grid_labels(spark, connectivity).select(
            F.col("vertex").alias("id"), "dense_label"
        ),
        "id",
    )


def _as_long(df: DataFrame, *cols: str) -> DataFrame:
    return df.select(*[F.col(c).cast("long").alias(c) for c in cols])


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def _q_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return customer_order_edges(spark, sf_dir)


def _q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    return degrees(customer_order_edges(spark, sf_dir))


def _cc_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CC labels over the customer↔order graph, once per (session, sf_dir)."""
    return _session_cached(
        spark,
        f"cc_orders:{sf_dir}",
        # already localCheckpointed by the operator
        lambda: connected_components(customer_order_edges(spark, sf_dir)),
    )


def _q_cc_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _cc_customer_orders(spark, sf_dir)


def _q_cc_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    return connected_components(nation_chain_edges(spark, sf_dir))


def _q_component_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = _cc_customer_orders(spark, sf_dir)
    return labels.groupBy("component").agg(F.count(F.lit(1)).alias("n_vertices"))


def _q_component_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels = _cc_customer_orders(spark, sf_dir)
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


_STREAM_QUERY_SEQ = [0]
#: per-process staging dirs for the file-stream fixture, keyed by source path
_STREAM_STAGE_DIRS: dict[str, str] = {}


def _cleanup_stream_stage_dirs() -> None:
    # the mkdtemp stages live for the process (the stream source may re-list
    # them across gate queries); remove them on exit so repeated gate runs
    # don't leak one temp dir + symlink per (process, sf_dir)
    import shutil

    for stage in _STREAM_STAGE_DIRS.values():
        shutil.rmtree(stage, ignore_errors=True)
    _STREAM_STAGE_DIRS.clear()


import atexit as _atexit  # noqa: E402

_atexit.register(_cleanup_stream_stage_dirs)


def _q_streaming_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 Structured Streaming at the gate: drain the events table
    through the incremental watermarked-window plan (readStream →
    availableNow → memory sink) and return the final aggregate — in
    complete mode this must equal the batch GROUP BY, which is exactly
    what the SQL oracle computes. Window starts as epoch seconds and
    value sums as micro-unit integers keep the comparison bit-stable."""
    from imtag_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
        windowed_event_counts,
    )

    # the file-stream source requires a DIRECTORY; the fixture is a single
    # parquet file — stage a symlink dir once per (process, sf_dir). The
    # stage lives under a mkdtemp-created 0700 directory owned by this
    # process, never a predictable world-shared /tmp name: on a multi-user
    # host a guessable path could be pre-created (or symlinked) by another
    # user to feed arbitrary parquet into the gate query.
    import os as _os
    import tempfile as _tf

    src = _os.path.abspath(f"{sf_dir}/events.parquet")
    stage = _STREAM_STAGE_DIRS.get(src)
    if stage is None:
        stage = _tf.mkdtemp(prefix="imtag_stream_events_")
        _os.symlink(src, _os.path.join(stage, "events.parquet"))
        _STREAM_STAGE_DIRS[src] = stage
    stream = read_events_stream(spark, stage)
    agg = windowed_event_counts(stream, window="1 hour", watermark="2 hours")
    _STREAM_QUERY_SEQ[0] += 1
    name = f"gate_stream_counts_{_STREAM_QUERY_SEQ[0]}"
    run_stream_to_memory(agg, name, "complete")
    return spark.table(name).select(
        F.col("window_start").cast("long").alias("window_start_s"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.round(F.col("total_value") * 1e6).cast("long").alias("total_value_u"),
    )


def _q_ccl_grid_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    joined = _grid_runs_labeled(spark, "cross")
    return _as_long(joined, "id", "row", "col_begin", "col_end", "dense_label")


def _q_ccl_grid_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    rl = _grid_runs_labeled(spark, "cross")
    st = component_stats(rl, label_col="dense_label")
    return st.select(
        F.col("dense_label").cast("long").alias("dense_label"),
        F.col("n_runs").cast("long").alias("n_runs"),
        F.col("npixels").cast("long").alias("npixels"),
        F.col("bbox_left").cast("long").alias("bbox_left"),
        F.col("bbox_top").cast("long").alias("bbox_top"),
        F.col("bbox_right").cast("long").alias("bbox_right"),
        F.col("bbox_bottom").cast("long").alias("bbox_bottom"),
        # micro-unit integer centroids: bit-stable across engines (Spark
        # F.round routes through BigDecimal, DuckDB rounds the double — same
        # 6dp text, different last ulp; integers dodge float identity)
        F.col("centroid_col_u"),
        F.col("centroid_row_u"),
    )


def _q_ccl_grid_labels_eight(spark: SparkSession, sf_dir: str) -> DataFrame:
    joined = _grid_runs_labeled(spark, "eight_way")
    return _as_long(joined, "id", "row", "col_begin", "col_end", "dense_label")


def _q_component_filter_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    # P3 HAVING-filter: keep runs of components ≥ 6 pixels
    rl = _grid_runs_labeled(spark, "cross")
    kept = filter_components_by_size(rl, 6, label_col="dense_label")
    return _as_long(kept, "id", "row", "col_begin", "col_end", "dense_label")


def _q_remove_renumber_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    # M3+P4 chain (reference test/imtag_test.cpp:130-152 →
    # src/morphology.cpp:190-232): explicit removal of the small components
    # (anti-join on the bad-label list) followed by a DENSE renumber of the
    # survivors 1..M — the compressed_freeze-after-removal pipeline.
    rl = _grid_runs_labeled(spark, "cross")
    st = component_stats(rl, label_col="dense_label")
    bad = st.where(F.col("npixels") < 6).select("dense_label")
    kept = remove_components(rl, bad, label_col="dense_label")
    ranks = dense_component_ranks(
        kept.select("dense_label"), component_col="dense_label",
        rank_col="new_label", base=1,
    )
    out = kept.join(F.broadcast(ranks), "dense_label")
    return _as_long(out, "id", "row", "col_begin", "col_end", "new_label")


def _q_rgba_label_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S7 to_rgba_label_image analog: broadcast-join with the color dimension
    rl = _grid_runs_labeled(spark, "cross")
    colored = colorize_runs(rl, label_col="dense_label")
    return _as_long(
        colored, "id", "row", "col_begin", "col_end", "dense_label",
        "r", "g", "b", "a",
    )


def _q_mask_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    # S6 to_mask_image analog (src/morphology.cpp:95-99): runs re-densified
    # to foreground cells, labels dropped, constant 0xFF per cell. The Spark
    # side round-trips through the engine's RLE (cells → runs → cells); the
    # oracle recomputes cells from the closed-form grid directly, so the
    # query also differentially checks the RLE round-trip.
    from imtag_spark.operators.label_image import mask_cells

    return _as_long(mask_cells(_grid_runs(spark)), "row", "col", "mask")


def _q_invert_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    runs = _grid_runs(spark)
    inv = with_scan_order_ids(complement_runs(runs, GRID_R, GRID_C))
    return _as_long(inv, "id", "row", "col_begin", "col_end")


def _q_dilate_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    runs = _grid_runs(spark)
    return _as_long(
        dilate(runs, 1, 1, GRID_R, GRID_C), "row", "col_begin", "col_end"
    )


def _q_hole_adjacency_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    runs = _grid_runs(spark)
    adj = hole_adjacencies(
        runs, GRID_R, GRID_C, "cross", land_labels=_grid_labels(spark, "cross")
    )
    return _as_long(adj, "component", "hole")


def _q_lpa2_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    return label_propagation(nation_chain_edges(spark, sf_dir), max_iter=2)


def _q_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return quality_score(docs).select("doc_id", "quality")


def _q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return language_id(docs).select("doc_id", "lang_guess", "lang_score")


def _q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return fingerprint(docs).select("doc_id", "text_sha")


def _q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs40 = load(spark, sf_dir, "documents").where(F.col("doc_id") < 40)
    sh = shingle_hashes(docs40, k=5)
    ids_a = docs40.select(F.col("doc_id").alias("a"))
    ids_b = docs40.select(F.col("doc_id").alias("b"))
    pairs = ids_a.crossJoin(ids_b).where(F.col("a") < F.col("b"))
    return exact_jaccard(sh, pairs).select(
        "a", "b", F.round("jaccard", 6).alias("jaccard")
    )


def _q_blob_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("blob")
    )
    return attach_blob_meta(docs).select("doc_id", "blob_bytes", "blob_sha")


# --- dedup/ANN queries on the SQL-expressible deterministic profile -------
# (closed-form polynomial hashes instead of xxhash64/NumPy RNG, so the full
# MinHash/SimHash/IVF/LSH pipelines are oracle-checked end to end)


def _q_minhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return minhash_dedup_clusters_sql(docs, threshold=0.8)


def _q_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load(spark, sf_dir, "documents")
    return simhash_candidates(
        simhash_signatures_sql(docs), max_hamming=3, n_blocks=4, block_bits=8
    )


def _q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load(spark, sf_dir, "embeddings")
    cents, assigned = ivf_index(emb, n_centroids=32)
    q = emb.where(F.col("vec_id") < 20)
    return knn_ivf(assigned, cents, q, k=5, n_probe=4)


def _q_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # testdata embeddings top out around cosine 0.46 pairwise; 6 planes /
    # 0.3 keeps the LSH bucket join selective while returning real pairs
    emb = load(spark, sf_dir, "embeddings")
    return cosine_pairs_lsh(
        emb, threshold=0.3, planes=deterministic_planes(6, 64)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "ccl_grid_labels": _q_ccl_grid_labels,
        "ccl_grid_labels_eight": _q_ccl_grid_labels_eight,
        "ccl_grid_stats": _q_ccl_grid_stats,
        "component_filter_grid": _q_component_filter_grid,
        "remove_renumber_grid": _q_remove_renumber_grid,
        "rgba_label_grid": _q_rgba_label_grid,
        "mask_grid_cells": _q_mask_grid,
        "invert_grid_runs": _q_invert_grid,
        "dilate_grid_runs": _q_dilate_grid,
        "hole_adjacency_grid": _q_hole_adjacency_grid,
        "lpa2_chains": _q_lpa2_chains,
        "quality_documents": _q_quality,
        "language_id_documents": _q_language_id,
        "fingerprint_documents": _q_fingerprint,
        "ngram_jaccard_pairs": _q_ngram_jaccard,
        "blob_meta_documents": _q_blob_meta,
        "minhash_clusters_documents": _q_minhash_clusters,
        "simhash_candidates_documents": _q_simhash_candidates,
        "knn_ivf_embeddings": _q_knn_ivf,
        "cosine_pairs_embeddings": _q_cosine_pairs,
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
        "streaming_window_counts": _q_streaming_window_counts,
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


# --- grid CCL oracle building blocks (same deterministic 24×24 grid) -------

_GRID_CELLS = f"""
cells AS (
  SELECT (i // {GRID_C}) AS row, (i % {GRID_C}) AS col
  FROM generate_series(0, {GRID_R * GRID_C - 1}) AS t(i)
  WHERE {_MASK_SQL}
)"""

_GRID_BGCELLS = f"""
bgcells AS (
  SELECT (i // {GRID_C}) AS row, (i % {GRID_C}) AS col
  FROM generate_series(0, {GRID_R * GRID_C - 1}) AS t(i)
  WHERE NOT ({_MASK_SQL})
)"""


def _islands_rle(src: str, prefix: str) -> str:
    """Gaps-and-islands RLE of a cell table + scan-order run ids."""
    return f"""
{prefix}runs0 AS (
  SELECT row, col,
         col - row_number() OVER (PARTITION BY row ORDER BY col) AS island
  FROM {src}
),
{prefix}runs AS (
  SELECT row, min(col) AS col_begin, max(col) + 1 AS col_end
  FROM {prefix}runs0 GROUP BY row, island
),
{prefix}ids AS (
  SELECT row, col_begin, col_end,
         row_number() OVER (ORDER BY row, col_begin) - 1 AS id
  FROM {prefix}runs
)"""


def _cc_sql(prefix: str, strict: bool = True) -> str:
    """Adjacent-row overlap edges + recursive min-label reachability."""
    lt = "<" if strict else "<="
    return f"""
{prefix}edges AS (
  SELECT a.id AS src, b.id AS dst
  FROM {prefix}ids a JOIN {prefix}ids b ON b.row = a.row + 1
   AND a.col_begin {lt} b.col_end AND b.col_begin {lt} a.col_end
),
{prefix}sym AS (
  SELECT src, dst FROM {prefix}edges
  UNION SELECT dst AS src, src AS dst FROM {prefix}edges
),
{prefix}reach AS (
  SELECT id AS v, id AS lbl FROM {prefix}ids
  UNION
  SELECT s.dst AS v, r.lbl FROM {prefix}reach r
  JOIN {prefix}sym s ON s.src = r.v
),
{prefix}comp AS (SELECT v, min(lbl) AS component FROM {prefix}reach GROUP BY v),
{prefix}labeled AS (
  SELECT i.id, i.row, i.col_begin, i.col_end,
         dense_rank() OVER (ORDER BY c.component) AS dense_label
  FROM {prefix}ids i JOIN {prefix}comp c ON c.v = i.id
)"""


_CCL_GRID_LABELS_SQL = (
    "WITH RECURSIVE " + _GRID_CELLS + "," + _islands_rle("cells", "") + ","
    + _cc_sql("")
    + "\nSELECT id, row, col_begin, col_end, dense_label FROM labeled"
)

_CCL_GRID_LABELS_EIGHT_SQL = (
    "WITH RECURSIVE " + _GRID_CELLS + "," + _islands_rle("cells", "") + ","
    + _cc_sql("", strict=False)
    + "\nSELECT id, row, col_begin, col_end, dense_label FROM labeled"
)

_COMPONENT_FILTER_GRID_SQL = (
    "WITH RECURSIVE " + _GRID_CELLS + "," + _islands_rle("cells", "") + ","
    + _cc_sql("")
    + """
SELECT id, row, col_begin, col_end, dense_label FROM labeled
WHERE dense_label IN (
  SELECT dense_label FROM labeled
  GROUP BY dense_label HAVING sum(col_end - col_begin) >= 6
)"""
)

_CCL_GRID_STATS_SQL = (
    "WITH RECURSIVE " + _GRID_CELLS + "," + _islands_rle("cells", "") + ","
    + _cc_sql("")
    + """
SELECT dense_label,
       count(*) AS n_runs,
       CAST(sum(col_end - col_begin) AS BIGINT) AS npixels,
       min(col_begin) AS bbox_left,
       min(row) AS bbox_top,
       max(col_end) AS bbox_right,
       max(row) + 1 AS bbox_bottom,
       CAST((sum((col_end - 1) * col_end - (col_begin - 1) * col_begin) * 1000000
        + sum(col_end - col_begin)) // (2 * sum(col_end - col_begin))
         AS BIGINT) AS centroid_col_u,
       CAST((sum((col_end - col_begin) * row) * 2000000
        + sum(col_end - col_begin)) // (2 * sum(col_end - col_begin))
         AS BIGINT) AS centroid_row_u
FROM labeled GROUP BY dense_label"""
)

_REMOVE_RENUMBER_GRID_SQL = (
    "WITH RECURSIVE " + _GRID_CELLS + "," + _islands_rle("cells", "") + ","
    + _cc_sql("")
    + """,
surv AS (
  SELECT dense_label FROM labeled
  GROUP BY dense_label HAVING sum(col_end - col_begin) >= 6
),
ranks AS (
  SELECT dense_label,
         dense_rank() OVER (ORDER BY dense_label) AS new_label
  FROM surv
)
SELECT l.id, l.row, l.col_begin, l.col_end, r.new_label
FROM labeled l JOIN ranks r USING (dense_label)"""
)

_RGBA_LABEL_GRID_SQL = (
    "WITH RECURSIVE " + _GRID_CELLS + "," + _islands_rle("cells", "") + ","
    + _cc_sql("")
    + f"""
SELECT id, row, col_begin, col_end, dense_label,
       c // 65536 AS r, (c // 256) % 256 AS g, c % 256 AS b, 255 AS a
FROM (
  SELECT *, {label_color_sql('dense_label')} AS c
  FROM labeled
)"""
)

_INVERT_GRID_SQL = (
    "WITH " + _GRID_BGCELLS + "," + _islands_rle("bgcells", "")
    + "\nSELECT id, row, col_begin, col_end FROM ids"
)

_MASK_GRID_SQL = (
    "WITH " + _GRID_CELLS
    + "\nSELECT row, col, CAST(255 AS BIGINT) AS mask FROM cells"
)

_DILATE_GRID_SQL = (
    "WITH " + _GRID_CELLS + ","
    + f"""
dcells AS (
  SELECT DISTINCT c.row + dr.d AS row, c.col + dc.d AS col
  FROM cells c, (VALUES (-1), (0), (1)) AS dr(d), (VALUES (-1), (0), (1)) AS dc(d)
  WHERE c.row + dr.d BETWEEN 0 AND {GRID_R - 1}
    AND c.col + dc.d BETWEEN 0 AND {GRID_C - 1}
),""" + _islands_rle("dcells", "")
    + "\nSELECT row, col_begin, col_end FROM ids"
)

_HOLE_ADJ_GRID_SQL = (
    "WITH RECURSIVE " + _GRID_CELLS + "," + _GRID_BGCELLS + ","
    + _islands_rle("cells", "land_") + "," + _cc_sql("land_") + ","
    + _islands_rle("bgcells", "water_") + "," + _cc_sql("water_")
    + """
SELECT DISTINCT l.dense_label AS component, w.dense_label AS hole
FROM land_labeled l JOIN water_labeled w ON w.row = l.row
 AND l.col_begin <= w.col_end AND w.col_begin <= l.col_end"""
)

# two unrolled synchronous LPA rounds on the supplier chains: adopt the most
# frequent neighbor label, min label on ties (matches operators/lpa.py)
_LPA2_CHAINS_SQL = """
WITH chains AS (
  SELECT s_nationkey, s_suppkey,
         lag(s_suppkey) OVER (PARTITION BY s_nationkey ORDER BY s_suppkey) AS prev
  FROM supplier
),
edges AS (
  SELECT prev AS src, s_suppkey AS dst FROM chains WHERE prev IS NOT NULL
),
sym AS (SELECT src, dst FROM edges UNION SELECT dst AS src, src AS dst FROM edges),
verts AS (SELECT DISTINCT src AS vertex FROM sym),
l0 AS (SELECT vertex, vertex AS label FROM verts),
f1 AS (
  SELECT s.dst AS vertex, l.label, count(*) AS cnt
  FROM sym s JOIN l0 l ON l.vertex = s.src GROUP BY s.dst, l.label
),
b1 AS (
  SELECT vertex, label,
         row_number() OVER (PARTITION BY vertex ORDER BY cnt DESC, label ASC) AS rk
  FROM f1
),
l1 AS (
  SELECT v.vertex, coalesce(b.label, v.vertex) AS label
  FROM verts v LEFT JOIN (SELECT vertex, label FROM b1 WHERE rk = 1) b
    ON b.vertex = v.vertex
),
f2 AS (
  SELECT s.dst AS vertex, l.label, count(*) AS cnt
  FROM sym s JOIN l1 l ON l.vertex = s.src GROUP BY s.dst, l.label
),
b2 AS (
  SELECT vertex, label,
         row_number() OVER (PARTITION BY vertex ORDER BY cnt DESC, label ASC) AS rk
  FROM f2
)
SELECT v.vertex, coalesce(b.label, v.vertex) AS label
FROM verts v LEFT JOIN (SELECT vertex, label FROM b2 WHERE rk = 1) b
  ON b.vertex = v.vertex
"""

_STOPWORD_SQL = {
    "en": "['the','and','of','to','in','is','that','it','for','was']",
    "de": "['der','die','das','und','ist','nicht','ein','mit','auf','zu']",
    "fr": "['le','la','les','et','est','pas','une','des','dans','pour']",
    "es": "['el','la','los','que','y','es','en','un','por','con']",
}

_LANGUAGE_ID_SQL = (
    """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
  FROM documents
),
s AS (
  SELECT doc_id,
"""
    + ",\n".join(
        f"    len(list_filter(toks, x -> list_contains({words}, x)))"
        f" / greatest(len(toks), 1)::DOUBLE AS s_{lang}"
        for lang, words in _STOPWORD_SQL.items()
    )
    + """
  FROM t
)
SELECT doc_id,
       CASE WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'unknown'
            WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en'
            WHEN s_de >= greatest(s_fr, s_es) THEN 'de'
            WHEN s_fr >= s_es THEN 'fr'
            ELSE 'es' END AS lang_guess,
       round(greatest(s_en, s_de, s_fr, s_es), 6) AS lang_score
FROM s
"""
)


# --- dedup/ANN oracles: the deterministic-profile pipelines in pure SQL ----
# (hash fragments shared verbatim with the Spark operators via polyhash)


def _minhash_clusters_oracle(
    threshold: float = 0.8, k: int = 5, num_hashes: int = 32, bands: int = 8
) -> str:
    a, b = minhash_coeffs(num_hashes)
    rpb = num_hashes // bands
    w = band_weights(rpb)
    sig_cols = ",\n    ".join(
        f"min((sh * {a[j]} + {b[j]}) % {M31}) AS mh{j}" for j in range(num_hashes)
    )
    band_selects = "\n  UNION ALL\n".join(
        "  SELECT doc_id, {bi} AS band, ({terms}) % {m} AS bh FROM sig".format(
            bi=bi,
            m=M31,
            terms=" + ".join(
                f"(mh{bi * rpb + r} * {w[r]}) % {M31}" for r in range(rpb)
            ),
        )
        for bi in range(bands)
    )
    return f"""
WITH RECURSIVE d AS (
  SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS t
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id, {shingle_hash_sql('t', 'i', k)} AS sh
  FROM d, LATERAL unnest(generate_series(1, greatest(length(t) - {k - 1}, 1))) AS u(i)
),
sig AS (
  SELECT doc_id,
    {sig_cols}
  FROM sh GROUP BY doc_id
),
banded AS (
{band_selects}
),
cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bh = y.bh AND x.doc_id < y.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.a, c.b, count(*) AS ni
  FROM cand c
  JOIN sh x ON x.doc_id = c.a
  JOIN sh y ON y.doc_id = c.b AND y.sh = x.sh
  GROUP BY c.a, c.b
),
verified AS (
  SELECT i.a, i.b
  FROM inter i
  JOIN sizes sa ON sa.doc_id = i.a
  JOIN sizes sb ON sb.doc_id = i.b
  WHERE i.ni / (sa.n + sb.n - i.ni)::DOUBLE >= {threshold}
),
sym AS (
  SELECT a AS src, b AS dst FROM verified
  UNION SELECT b AS src, a AS dst FROM verified
),
verts AS (SELECT DISTINCT src AS v FROM sym),
reach AS (
  SELECT v, v AS lbl FROM verts
  UNION
  SELECT s.dst AS v, r.lbl FROM reach r JOIN sym s ON s.src = r.v
)
SELECT v AS id, min(lbl) AS cluster FROM reach GROUP BY v
"""


def _simhash_candidates_oracle(
    max_hamming: int = 3, n_bits: int = 32, n_blocks: int = 4, block_bits: int = 8
) -> str:
    return f"""
WITH d AS (
  SELECT doc_id,
         regexp_split_to_array(
           regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ') AS toks
  FROM documents
),
tok AS (
  SELECT doc_id, i AS ti, toks[i] AS tok
  FROM d, LATERAL unnest(generate_series(1, len(toks))) AS u(i)
),
chars AS (
  SELECT doc_id, ti,
         (CAST(ascii(substring(tok, i, 1)) AS BIGINT)
          * ({token_weight_sql('i - 1')})) % {M31} AS term
  FROM tok, LATERAL unnest(generate_series(1, greatest(length(tok), 1))) AS c(i)
),
th AS (SELECT doc_id, ti, sum(term) % {M31} AS th FROM chars GROUP BY doc_id, ti),
bits AS (
  SELECT doc_id, p,
         CASE WHEN sum(((th >> p) & 1) * 2 - 1) > 0 THEN 1 ELSE 0 END AS bit
  FROM th, generate_series(0, {n_bits - 1}) AS g(p)
  GROUP BY doc_id, p
),
sigs AS (
  SELECT doc_id AS id, sum(bit * (CAST(1 AS BIGINT) << p)) AS simhash
  FROM bits GROUP BY doc_id
),
blocks AS (
  SELECT id, simhash, blk,
         (simhash >> (blk * {block_bits})) & {(1 << block_bits) - 1} AS bh
  FROM sigs, generate_series(0, {n_blocks - 1}) AS b(blk)
),
cand AS (
  SELECT DISTINCT x.id AS a, y.id AS b,
         bit_count(xor(x.simhash, y.simhash)) AS hamming
  FROM blocks x JOIN blocks y
    ON x.blk = y.blk AND x.bh = y.bh AND x.id < y.id
)
SELECT a, b, hamming FROM cand WHERE hamming <= {max_hamming}
"""


def _knn_ivf_oracle(
    n_centroids: int = 32, k: int = 5, n_probe: int = 4, n_queries: int = 20
) -> str:
    return f"""
WITH cents AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS cemb,
         row_number() OVER (ORDER BY {id_mix_sql('vec_id')}, vec_id) - 1 AS cidx
  FROM embeddings
  ORDER BY {id_mix_sql('vec_id')}, vec_id
  LIMIT {n_centroids}
),
assign AS (
  SELECT b.vec_id, b.embedding, c.cidx,
         row_number() OVER (
           PARTITION BY b.vec_id
           ORDER BY list_cosine_similarity(b.embedding::DOUBLE[], c.cemb) DESC,
                    c.cidx ASC) AS rk
  FROM embeddings b CROSS JOIN cents c
),
assigned AS (SELECT vec_id, embedding, cidx FROM assign WHERE rk = 1),
q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qemb
  FROM embeddings WHERE vec_id < {n_queries}
),
probes AS (
  SELECT query_id, cidx FROM (
    SELECT q.query_id, c.cidx,
           row_number() OVER (
             PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(q.qemb, c.cemb) DESC,
                      c.cidx ASC) AS rk
    FROM q CROSS JOIN cents c
  ) WHERE rk <= {n_probe}
),
cand AS (
  SELECT p.query_id, a.vec_id, a.embedding
  FROM probes p JOIN assigned a ON a.cidx = p.cidx
),
sims AS (
  SELECT c.query_id, c.vec_id AS neighbor_id,
         list_cosine_similarity(q.qemb, c.embedding::DOUBLE[]) AS sim
  FROM cand c JOIN q ON q.query_id = c.query_id
  WHERE c.vec_id != c.query_id
),
ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY sim DESC, neighbor_id ASC) AS rk
  FROM sims
)
SELECT query_id, neighbor_id, round(sim, 6) AS sim
FROM ranked WHERE rk <= {k}
"""


def _cosine_pairs_oracle(
    n_planes: int = 6, dim: int = 64, threshold: float = 0.3
) -> str:
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings),
bits AS (
  SELECT e.vec_id, p.p,
         CASE WHEN sum(e.emb[d.d + 1]
                       * ({plane_weight_sql('p.p', 'd.d')})) > 0
              THEN 1 ELSE 0 END AS bit
  FROM e, generate_series(0, {n_planes - 1}) AS p(p),
       generate_series(0, {dim - 1}) AS d(d)
  GROUP BY e.vec_id, p.p
),
buckets AS (
  SELECT vec_id, sum(bit * (CAST(1 AS BIGINT) << p)) AS bucket
  FROM bits GROUP BY vec_id
),
pairs AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM buckets x JOIN buckets y
    ON x.bucket = y.bucket AND x.vec_id < y.vec_id
),
sims AS (
  SELECT a, b, round(list_cosine_similarity(ea.emb, eb.emb), 6) AS sim
  FROM pairs
  JOIN e ea ON ea.vec_id = a
  JOIN e eb ON eb.vec_id = b
)
SELECT a, b, sim FROM sims WHERE sim >= {threshold}
"""


def oracle_sql() -> dict[str, str]:
    pr_iters = ",\n".join(_pagerank_iter_sql(i) for i in range(1, 6))
    return {
        "ccl_grid_labels": _CCL_GRID_LABELS_SQL,
        "ccl_grid_labels_eight": _CCL_GRID_LABELS_EIGHT_SQL,
        "ccl_grid_stats": _CCL_GRID_STATS_SQL,
        "component_filter_grid": _COMPONENT_FILTER_GRID_SQL,
        "remove_renumber_grid": _REMOVE_RENUMBER_GRID_SQL,
        "rgba_label_grid": _RGBA_LABEL_GRID_SQL,
        "mask_grid_cells": _MASK_GRID_SQL,
        "invert_grid_runs": _INVERT_GRID_SQL,
        "dilate_grid_runs": _DILATE_GRID_SQL,
        "hole_adjacency_grid": _HOLE_ADJ_GRID_SQL,
        "lpa2_chains": _LPA2_CHAINS_SQL,
        "quality_documents": """
            WITH d AS (
              SELECT doc_id,
                     CASE WHEN length(trim(text)) = 0 THEN 0
                          ELSE length(regexp_split_to_array(trim(text), '\\s+'))
                     END AS nt,
                     round((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
                           / greatest(length(text), 1)::DOUBLE, 6) AS pr,
                     round((length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))
                           / greatest(length(text), 1)::DOUBLE, 6) AS ur
              FROM documents
            )
            SELECT doc_id,
                   round(0.5 * (CASE WHEN nt BETWEEN 5 AND 100000 THEN 1.0 ELSE 0.3 END)
                       + 0.25 * (CASE WHEN pr <= 0.2 THEN 1.0 ELSE 0.5 END)
                       + 0.25 * (CASE WHEN ur <= 0.3 THEN 1.0 ELSE 0.5 END), 6) AS quality
            FROM d
        """,
        "language_id_documents": _LANGUAGE_ID_SQL,
        "minhash_clusters_documents": _minhash_clusters_oracle(),
        "simhash_candidates_documents": _simhash_candidates_oracle(),
        "knn_ivf_embeddings": _knn_ivf_oracle(),
        "cosine_pairs_embeddings": _cosine_pairs_oracle(),
        "fingerprint_documents": """
            SELECT doc_id, sha256(text) AS text_sha FROM documents
        """,
        "ngram_jaccard_pairs": """
            WITH d AS (
              SELECT doc_id, regexp_replace(lower(text), '\\s+', ' ', 'g') AS t
              FROM documents WHERE doc_id < 40
            ),
            sh AS (
              SELECT DISTINCT doc_id, substring(t, i::INT, 5) AS s
              FROM d, LATERAL unnest(generate_series(1, greatest(length(t) - 4, 1))) AS u(i)
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT x.doc_id AS a, y.doc_id AS b, count(*) AS ni
              FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
              GROUP BY x.doc_id, y.doc_id
            )
            SELECT i.a, i.b,
                   round(i.ni / (sa.n + sb.n - i.ni)::DOUBLE, 6) AS jaccard
            FROM inter i
            JOIN sizes sa ON sa.doc_id = i.a
            JOIN sizes sb ON sb.doc_id = i.b
        """,
        "blob_meta_documents": """
            SELECT doc_id,
                   octet_length(encode(text)) AS blob_bytes,
                   sha256(text) AS blob_sha
            FROM documents
        """,
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
        # the streaming plan in complete mode must equal the batch GROUP BY
        # over the same events — that equivalence IS the oracle. Tumbling
        # 1h windows floor epoch seconds; micro-unit sums avoid float ulps.
        "streaming_window_counts": """
            SELECT CAST(FLOOR(epoch(ts) / 3600) * 3600 AS BIGINT) AS window_start_s,
                   event_type,
                   count(*) AS n_events,
                   CAST(round(round(sum(value), 6) * 1000000) AS BIGINT)
                     AS total_value_u
            FROM events
            GROUP BY 1, 2
        """,
    }
