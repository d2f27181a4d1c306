"""Composed end-to-end pipelines (the reference's entry points, §3 SURVEY.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from imtag_spark.operators.cc import connected_components
from imtag_spark.operators.interval_join import adjacent_row_edges
from imtag_spark.operators.relabel import densely_relabel
from imtag_spark.operators.rle import grid_to_runs


def label_runs(
    runs: DataFrame,
    connectivity: str = "cross",
    base: int = 1,
    metrics_out: dict | None = None,
) -> DataFrame:
    """``bwlabel`` analog (reference entry point 1, src/imtag.cpp:13-22):
    run table → edges → CC → labels for ALL runs (isolated runs are their
    own components) → dense relabel per the §2.4 contract.

    Returns (vertex, component, dense_label) with dense labels ``base..``.
    """
    edges = adjacent_row_edges(runs, connectivity)
    labels = connected_components(edges, metrics_out=metrics_out)
    all_vert = runs.select(F.col("id").alias("vertex"))
    full = all_vert.join(labels, "vertex", "left").select(
        "vertex", F.coalesce("component", "vertex").alias("component")
    )
    return densely_relabel(full, base=base)


def label_cells(
    cells: DataFrame,
    connectivity: str = "cross",
    metrics_out: dict | None = None,
) -> tuple[DataFrame, DataFrame]:
    """cells → (runs, dense labels) — full two-pass CCL."""
    runs = grid_to_runs(cells).localCheckpoint(eager=True)
    return runs, label_runs(runs, connectivity, metrics_out=metrics_out)
