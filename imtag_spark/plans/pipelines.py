"""Composed end-to-end pipelines (the reference's entry points, §3 SURVEY.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imtag_spark.operators.cc import SMALL_GRAPH_EDGE_LIMIT, connected_components
from imtag_spark.operators.interval_join import interval_join, adjacent_row_edges
from imtag_spark.operators.morphology import complement_runs
from imtag_spark.operators.relabel import densely_relabel
from imtag_spark.operators.rle import grid_to_runs, with_scan_order_ids


def label_runs(
    runs: DataFrame,
    connectivity: str = "cross",
    base: int = 1,
    metrics_out: dict | None = None,
    cells_hint: int | None = None,
) -> DataFrame:
    """``bwlabel`` analog (reference entry point 1, src/imtag.cpp:13-22):
    run table → edges → CC → labels for ALL runs (isolated runs are their
    own components) → dense relabel per the §2.4 contract.

    ``cells_hint`` — static upper bound on the grid's cell count
    (n_rows * n_cols), when the caller knows it. Adjacencies are bounded
    by cells, so a small hint routes CC through its single-partition
    fast path (one union-find pass instead of per-round scheduling —
    the regime where the reference's single-address-space pass wins on
    overhead). Large/unknown grids take the distributed path unchanged.

    Returns (vertex, component, dense_label) with dense labels ``base..``.
    """
    edges = adjacent_row_edges(runs, connectivity)
    small = cells_hint is not None and cells_hint <= SMALL_GRAPH_EDGE_LIMIT
    # scan-order run ids carry spatial locality — range partitioning lets
    # the partition-local union-find collapse whole image regions round 1
    labels = connected_components(
        edges,
        range_partition=not small,
        single_partition=small,
        # run ids are scan-order ≤ cell count: a static int32 bound lets
        # the Arrow contractions take the half-width transit even on the
        # paths that run before/without the init measurement
        narrow_ids=cells_hint is not None and cells_hint < 2**31,
        metrics_out=metrics_out,
    )
    all_vert = runs.select(F.col("id").alias("vertex"))
    full = all_vert.join(labels, "vertex", "left").select(
        "vertex", F.coalesce("component", "vertex").alias("component")
    )
    return densely_relabel(full, base=base)


def label_cells(
    cells: DataFrame,
    connectivity: str = "cross",
    metrics_out: dict | None = None,
    cells_hint: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """cells → (runs, dense labels) — full two-pass CCL."""
    runs = grid_to_runs(cells).localCheckpoint(eager=True)
    return runs, label_runs(
        runs, connectivity, metrics_out=metrics_out, cells_hint=cells_hint
    )


def invert(
    runs: DataFrame, n_rows: int, n_cols: int
) -> tuple[DataFrame, DataFrame]:
    """M1 full pipeline (reference morphology.cpp:101-142): per-row interval
    complement, then re-CCL of the complement — the reference always labels
    the inverted image with CROSS connectivity (morphology.cpp:139).

    Returns (water_runs with scan-order ids, dense labels for them).
    """
    water = with_scan_order_ids(
        complement_runs(runs, n_rows, n_cols)
    ).localCheckpoint(eager=True)
    return water, label_runs(water, "cross", cells_hint=n_rows * n_cols)


def hole_adjacencies(
    runs: DataFrame,
    n_rows: int,
    n_cols: int,
    connectivity: str = "cross",
    land_labels: DataFrame | None = None,
) -> DataFrame:
    """M4 (reference entry point 2, src/imtag.cpp:106-112 →
    src/morphology.cpp:264-312): which holes border which components.

    The reference's positional interleave pairing (J2) is replaced by a
    plain same-row non-strict interval join between land runs and water
    runs — identical output (SURVEY.md §2.3 J2), one equi-join on ``row``
    with a band predicate instead of 49 lines of off-by-one cases.

    Returns the bipartite edge DataFrame (component BIGINT, hole BIGINT)
    over dense 1-based labels — the scalable analog of the reference's
    dense ``adjacency_matrix`` (include/imtag.hpp:121-146).

    ``land_labels`` — pass precomputed ``label_runs(runs, connectivity)``
    output to reuse an already-run land CCL (callers that label and then
    ask for adjacencies shouldn't pay the CC twice).
    """
    if land_labels is None:
        land_labels = label_runs(runs, connectivity, cells_hint=n_rows * n_cols)
    land = runs.join(
        land_labels.select(F.col("vertex").alias("id"), "dense_label"), "id"
    ).select("row", "col_begin", "col_end", F.col("dense_label").alias("component"))

    water_runs, water_labels = invert(runs, n_rows, n_cols)
    water = water_runs.join(
        water_labels.select(F.col("vertex").alias("id"), "dense_label"), "id"
    ).select("row", "col_begin", "col_end", F.col("dense_label").alias("hole"))

    paired = interval_join(
        land.select("row", "col_begin", "col_end", "component"),
        water.select("row", "col_begin", "col_end", "hole"),
        strict=False,
    )
    return paired.select("component", F.col("hole_r").alias("hole")).distinct()
